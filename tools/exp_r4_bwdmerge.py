#!/usr/bin/env python
"""Round-4 batch #5: merged one-pass large-N attention backward vs the
two-kernel K1/K2 design, e2e train step at B=16 (interleaved x2 each).
"""
import importlib.util
import json
import os
import subprocess
import sys
import time


def log(**kw):
    print(json.dumps(kw), flush=True)


def run(merged: bool):
    import geoguessr_ai_tpu.ops.window_attention as wa
    wa.BWD_MERGED = merged
    spec = importlib.util.spec_from_file_location(
        "exp_r4_remat",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "exp_r4_remat.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._train_case(16)


def main():
    if len(sys.argv) > 1:
        run(sys.argv[1] == "merged")
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    for name in ("two_kernel", "merged", "two_kernel", "merged"):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            cwd=repo, env=env, capture_output=True, text=True, timeout=2400,
        )
        wall = round(time.time() - t0, 1)
        for line in proc.stdout.splitlines():
            try:
                log(case=name, **json.loads(line))
            except (json.JSONDecodeError, TypeError):
                log(case=name, raw=line[:200])
        if proc.returncode != 0:
            log(case=name, result="CRASH", rc=proc.returncode, wall_s=wall,
                stderr_tail=proc.stderr[-600:])


if __name__ == "__main__":
    main()
