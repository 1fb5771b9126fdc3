#!/usr/bin/env python
"""Round-5 train-backward campaign (VERDICT r4 #2) + TRAIN.json artifact
(VERDICT r4 #4b).

A/B: HANDROLLED_FB_BWD — the hand-rolled fused-block backwards that stop
re-tracing discarded primal pieces (the stage-2 no-proj bwd's XLA
attention forward recompute = the round-4b profile's 53.4 ms line, and
the stage-1/3 bwd's final proj GEMM).  Numerics pinned equal on CPU by
tests/test_window_attention.py::test_handrolled_fb_bwds_match_vjp_path.

Interleaved 2x per setting at B=16 (fresh subprocess per case: the knob
is trace-time and the relay has no cross-process compile cache anyway),
then the accum case at the winning setting.  Writes data/out/TRAIN.json
with the winner's measured numbers (train_panos_s_b16,
train_accum_panos_s) so the driver's bench record carries the production
train workload (reference main_coordinator_idun.py:224-489).
"""
import importlib.util
import json
import os
import subprocess
import sys
import time


def log(**kw):
    print(json.dumps(kw), flush=True)


def run_case(handrolled: bool, B: int, accum: int):
    import geoguessr_ai_tpu.ops.window_attention as wa

    wa.HANDROLLED_FB_BWD = handrolled
    spec = importlib.util.spec_from_file_location(
        "exp_r4_remat",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "exp_r4_remat.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._train_case(B, accum=accum)


def main():
    if len(sys.argv) > 1:
        name = sys.argv[1]
        handrolled = "hand" in name
        B, accum = (64, 4) if "accum" in name else (16, 1)
        run_case(handrolled, B, accum)
        return
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    results = {}

    def launch(name):
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name],
            cwd=repo, env=env, capture_output=True, text=True,
            timeout=3000,
        )
        wall = round(time.time() - t0, 1)
        for line in proc.stdout.splitlines():
            try:
                d = json.loads(line)
                log(case=name, **d)
                if d.get("result") == "ok":
                    results.setdefault(name, []).append(d)
            except (json.JSONDecodeError, TypeError):
                log(case=name, raw=line[:200])
        if proc.returncode != 0:
            log(case=name, result="CRASH", rc=proc.returncode,
                wall_s=wall, stderr_tail=proc.stderr[-600:])

    for name in ("b16_base", "b16_hand", "b16_base", "b16_hand"):
        launch(name)

    def best(prefix):
        runs = [r for k, v in results.items() if k == prefix for r in v]
        return max((r["panos_s"] for r in runs), default=0.0)

    base, hand = best("b16_base"), best("b16_hand")
    winner_hand = hand >= base
    log(ab=dict(b16_base=base, b16_hand=hand,
                winner="handrolled" if winner_hand else "vjp"))

    accum_name = "accum_hand" if winner_hand else "accum_base"
    launch(accum_name)
    accum = best(accum_name)

    train = {
        "train_panos_s_b16": round(max(base, hand), 1),
        "train_accum_panos_s": round(accum, 1),
        "train_bwd_mode": "handrolled" if winner_hand else "vjp",
        "train_bwd_ab": {"b16_base": base, "b16_hand": hand},
        "train_note": (
            "SuperGuessr+TinyViT-21m-512 train step, real v5e chip; "
            "accum = B=64 via 4x scanned micro-16"
        ),
    }
    out = os.path.join(repo, "data", "out", "TRAIN.json")
    with open(out, "w") as f:
        json.dump(train, f, indent=1)
    log(done=True, wrote=out, **{k: v for k, v in train.items()
                                 if not isinstance(v, dict)})


if __name__ == "__main__":
    main()
