"""CI wrapper for the 2-process jax.distributed dry run (ROADMAP
multi-host item) — spawns real coordinator + worker processes."""

import os
import subprocess
import sys


def test_two_process_dryrun():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["MULTIHOST_DRYRUN_PORT"] = "8489"  # avoid collisions
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "multihost_dryrun.py")],
        capture_output=True,
        text=True,
        timeout=550,
        cwd=repo,
        env=env,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "MULTIHOST DRYRUN OK" in out.stdout
