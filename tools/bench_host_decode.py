#!/usr/bin/env python
"""Host decode microbenchmark (round-2 VERDICT #9).

Measures JPEG decode+resize throughput per core — native libjpeg
(data/native, DCT-domain downscale + bilinear) vs PIL — and projects
host capacity for real TPU hosts (this box has 1 core; production v5e
hosts have 100+).  The device side absorbs ~705 img/s (bench.py), so the
table answers: how many cores until the host feeds the chip?

Writes data/out/HOST_DECODE.json and a markdown row for
docs/performance.md.
"""

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np  # noqa: E402


def make_jpeg(size=640, quality=87, seed=0) -> bytes:
    """Street-view-like 640x640 JPEG (the acquisition format,
    reference google_api/street_view.py fov-90 640x640)."""
    import io

    from PIL import Image

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.stack(
        [
            120 + 80 * np.sin(7 * xx + 3 * yy),
            100 + 70 * np.cos(5 * yy),
            90 + 60 * np.sin(4 * xx * yy),
        ],
        -1,
    )
    img = np.clip(img + rng.normal(0, 12, img.shape), 0, 255).astype(
        np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def bench(fn, blobs, seconds=4.0):
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        fn(blobs[n % len(blobs)])
        n += 1
    return n / (time.perf_counter() - t0)


def proc_worker(seconds: float) -> float:
    """Decode loop for the multi-process scaling probe (top level: spawn
    workers must pickle it)."""
    from geoguessr_ai_tpu.data.native import jpeg as nj
    from geoguessr_ai_tpu.data.pipeline import _pil_decode as pd

    blobs_l = [make_jpeg(seed=i) for i in range(4)]
    if nj.available():
        fn = lambda b: nj.decode_resize(b, 512)  # noqa: E731
    else:
        fn = lambda b: pd(b, 512)  # noqa: E731
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        fn(blobs_l[n % 4])
        n += 1
    return n / (time.perf_counter() - t0)


def main() -> None:
    from geoguessr_ai_tpu.data.pipeline import _pil_decode
    from geoguessr_ai_tpu.data.native import jpeg as native_jpeg

    target = 512
    blobs = [make_jpeg(seed=i) for i in range(16)]
    results = {"jpeg_px": 640, "target_px": target}

    results["pil_img_per_s_per_core"] = round(
        bench(lambda b: _pil_decode(b, target), blobs), 1
    )
    if native_jpeg.available():
        results["native_img_per_s_per_core"] = round(
            bench(lambda b: native_jpeg.decode_resize(b, target), blobs), 1
        )
        # batch API amortizes ctypes overhead; single thread here
        def batch(b):
            native_jpeg.decode_batch([b] * 8, target, n_threads=1)

        results["native_batch8_img_per_s_per_core"] = round(
            bench(batch, blobs) * 8, 1
        )
    # Multi-PROCESS probe (round-3 VERDICT weak #5): on this 1-core box
    # the many-core projection assumes per-process overhead ~0.  N worker
    # processes time-share one core; if aggregate throughput holds at
    # the 1-process rate, process overhead is negligible and the
    # per-core rate extrapolates linearly with cores.
    import concurrent.futures as cf
    import multiprocessing as mp

    scaling = {}
    ctx = mp.get_context("spawn")
    for nproc in (1, 2, 4):
        with cf.ProcessPoolExecutor(nproc, mp_context=ctx) as pool:
            rates = list(pool.map(proc_worker, [4.0] * nproc))
        scaling[str(nproc)] = round(sum(rates), 1)
    results["multiprocess_aggregate_img_per_s"] = scaling
    results["process_overhead_frac"] = round(
        1.0 - scaling["4"] / max(scaling["1"], 1e-9), 3
    )
    results["note"] = (
        "cores_to_saturate_device is a PROJECTION from the 1-core rate; "
        "the multiprocess probe bounds per-process overhead"
    )

    device_img_per_s = 705.0  # measured bench.py forward capacity
    per_core = results.get(
        "native_img_per_s_per_core",
        results["pil_img_per_s_per_core"],
    )
    results["device_img_per_s"] = device_img_per_s
    results["cores_to_saturate_device"] = round(
        device_img_per_s / per_core, 1
    )
    print(json.dumps(results, indent=1))
    os.makedirs("data/out", exist_ok=True)
    with open("data/out/HOST_DECODE.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
