"""ServingEngine tests on CPU with the test-size backbone."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def engine():
    import jax.numpy as jnp

    import geoguessr_ai_tpu.train.coordinator as coord
    from geoguessr_ai_tpu.config import (
        TINYVIT_NORM_MEAN,
        TINYVIT_NORM_STD,
    )
    from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
    from geoguessr_ai_tpu.serving.engine import ServingEngine

    orig = coord.build_backbone

    def tiny(cfg):
        tv = TinyViTConfig.test_tiny(dtype=jnp.float32)
        return TinyViT(tv), TINYVIT_NORM_MEAN, TINYVIT_NORM_STD, tv.image_size

    coord.build_backbone = tiny
    try:
        yield ServingEngine(backbone="tinyvit")
    finally:
        coord.build_backbone = orig


def test_predict_images_four(engine, fixtures_dir):
    paths = [
        os.path.join(fixtures_dir, f"heading={h:03d}.jpg")
        for h in (0, 90, 180, 270)
    ]
    r = engine.predict_images(paths)
    assert -90 <= r.lat <= 90 and -180 <= r.lon <= 180
    assert len(r.top_ids) == 5
    assert abs(sum(r.top_probs) - sum(sorted(r.top_probs))) < 1e-6
    assert r.top_probs == sorted(r.top_probs, reverse=True)
    assert all(isinstance(c, str) for c in r.top_countries)
    # prediction must equal the top-1 cell centroid
    np.testing.assert_allclose(
        [r.lon, r.lat],
        engine.table.centroids[r.top_ids[0]],
        atol=1e-4,
    )


def test_predict_images_single_replicates(engine, fixtures_dir):
    p = os.path.join(fixtures_dir, "heading=000.jpg")
    r = engine.predict_images([p])
    assert len(r.top_ids) == 5
    with pytest.raises(ValueError):
        engine.predict_images([p, p])  # 2 images invalid (must be 1 or 4)


def test_predict_batch_deterministic(engine, fixtures_dir):
    from geoguessr_ai_tpu.data.pipeline import decode_jpeg

    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    views = np.stack(
        [
            np.stack([decode_jpeg(blob, engine.image_size)] * 4)
            for _ in range(2)
        ]
    )
    r1, r2 = engine.predict_batch(views)
    assert r1.top_ids == r2.top_ids
    np.testing.assert_allclose(r1.embedding, r2.embedding, atol=1e-5)


def test_micro_batcher_coalesces_and_maps_results():
    """Concurrent predicts share device batches (bucketed shapes) and
    each caller gets ITS result back."""
    import concurrent.futures as cf
    import threading

    import numpy as np

    from geoguessr_ai_tpu.serving.engine import MicroBatcher

    calls = []
    release = threading.Event()

    class FakeEngine:
        def predict_batch(self, views, view_mask=None):
            release.wait(5)  # hold the first batch so others queue up
            calls.append(views.shape[0])
            return [
                # identify each request by its views' fill value
                int(views[b, 0, 0, 0, 0]) for b in range(views.shape[0])
            ]

    mb = MicroBatcher(FakeEngine(), max_batch=8, max_wait_ms=30)

    def submit(i):
        v = np.full((4, 2, 2, 3), i, np.uint8)
        return mb.predict(v)

    with cf.ThreadPoolExecutor(8) as pool:
        futs = [pool.submit(submit, i) for i in range(8)]
        import time

        time.sleep(0.2)  # let all 8 enqueue
        release.set()
        results = [f.result(timeout=10) for f in futs]
    assert sorted(results) == list(range(8))
    # everything ran in at most 2 device batches, bucket-padded
    assert len(calls) <= 2 and all(c in (1, 4, 8, 16) for c in calls), calls


def test_micro_batcher_propagates_errors():
    import numpy as np
    import pytest as _pytest

    from geoguessr_ai_tpu.serving.engine import MicroBatcher

    class Boom:
        def predict_batch(self, views, view_mask=None):
            raise RuntimeError("device on fire")

    mb = MicroBatcher(Boom(), max_wait_ms=1)
    with _pytest.raises(RuntimeError, match="device on fire"):
        mb.predict(np.zeros((4, 2, 2, 3), np.uint8))


def test_micro_batcher_warmup_compiles_buckets():
    import numpy as np

    from geoguessr_ai_tpu.serving.engine import MicroBatcher

    seen = []

    class Recorder:
        image_size = 8

        def predict_batch(self, views, view_mask=None):
            seen.append(views.shape)
            assert view_mask is not None
            return [None] * views.shape[0]

    mb = MicroBatcher(Recorder(), buckets=(1, 4, 8, 16))
    mb.warmup()
    assert [s[0] for s in seen] == [1, 4, 8, 16]
    assert all(s[1:] == (4, 8, 8, 3) for s in seen)


def test_micro_batcher_linger_coalesces_staggered_arrivals():
    """Arrivals staggered past the base window (but within linger_ms of
    each other) still coalesce into ONE batch — the rolling deadline
    extends per arrival up to the hard cap."""
    import concurrent.futures as cf
    import time

    import numpy as np

    from geoguessr_ai_tpu.serving.engine import MicroBatcher

    calls = []

    class FakeEngine:
        def predict_batch(self, views, view_mask=None):
            calls.append(views.shape[0])
            return [
                int(views[b, 0, 0, 0, 0]) for b in range(views.shape[0])
            ]

    # base window 5 ms < the 30 ms stagger; linger 250 ms bridges it
    # (wide margins: this 1-host-core box under load can delay thread
    # wakeups by tens of ms — the feature needs stagger < linger with
    # room for scheduling noise on both sides)
    mb = MicroBatcher(
        FakeEngine(), max_batch=8, max_wait_ms=5, linger_ms=250
    )

    def submit(i):
        time.sleep(0.03 * i)  # stagger arrivals by 30 ms
        v = np.full((4, 2, 2, 3), i, np.uint8)
        return mb.predict(v)

    with cf.ThreadPoolExecutor(4) as pool:
        futs = [pool.submit(submit, i) for i in range(4)]
        results = [f.result(timeout=10) for f in futs]
    assert sorted(results) == list(range(4))
    assert calls and calls[0] == 4, calls  # one coalesced batch of 4


def test_micro_batcher_linger_hard_cap_bounds_latency():
    """A continuous arrival stream cannot extend collection past the
    hard cap (max(max_wait, 8*linger)) — the batch dispatches."""
    import threading
    import time

    import numpy as np

    from geoguessr_ai_tpu.serving.engine import MicroBatcher

    done = threading.Event()
    calls = []

    class FakeEngine:
        def predict_batch(self, views, view_mask=None):
            calls.append((time.perf_counter(), views.shape[0]))
            return [0] * views.shape[0]

    mb = MicroBatcher(
        FakeEngine(), max_batch=64, buckets=(64,),
        max_wait_ms=5, linger_ms=30,
    )

    def flood():
        while not done.is_set():
            try:
                mb.predict(np.zeros((4, 2, 2, 3), np.uint8), timeout=5)
            except Exception:
                return

    threads = [threading.Thread(target=flood, daemon=True) for _ in range(3)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(1.0)
    done.set()
    for t in threads:
        t.join(timeout=5)
    assert calls, "no batch ever dispatched under continuous arrivals"
    # first dispatch within hard cap (8*30 ms = 240 ms) + scheduling slack
    assert calls[0][0] - t0 < 0.8, calls[0][0] - t0
