"""Bulk Street View collection loop.

Reference behavior: data/street_view_images_collection/main.py — for each
sampled point fetch a 4-heading block at a random yaw seed, upload batches
to the object store, append collected/failed ledgers (resumable via
setdiff), and hard-stop on 403 rate limiting (:182-187 — the reference
os._exit(1)s; here the RateLimitError propagates after flushing state).
"""

from __future__ import annotations

import random
from typing import Optional, Sequence

import numpy as np

from geoguessr_ai_tpu.acquisition.sampling import CollectionLedger
from geoguessr_ai_tpu.acquisition.street_view import (
    RateLimitError,
    fetch_block,
)
from geoguessr_ai_tpu.utils.logging import logger


def collect_points(
    points_lnglat: np.ndarray,
    store,
    api_key: str,
    secret: Optional[str] = None,
    ledger: Optional[CollectionLedger] = None,
    batch_size: int = 25,
    seed: Optional[int] = None,
    session=None,
    fetch_fn=None,
) -> dict:
    """Collect panoramas for sampled points into the object store.

    Args:
      points_lnglat: (N, 2) candidate points.
      store: data.s3.ObjectStore receiving images + manifests.
      ledger: resumable bookkeeping; already-collected/failed points are
        skipped (reference main.py:245-263).
      batch_size: points per manifest batch (reference: 25, main.py:193).
      fetch_fn: override for fetch_block (tests) with the same signature.

    Returns:
      {"collected": n, "failed": n, "batches": n}
    """
    fetch = fetch_fn or fetch_block
    rng = random.Random(seed)
    points = np.asarray(points_lnglat, np.float64)
    if ledger is not None:
        points = ledger.remaining(points)

    collected = failed = batches = 0
    batch_items = []

    def flush():
        nonlocal batches, batch_items
        if not batch_items:
            return
        manifest = store.upload_images(batch_items)
        store.write_manifest(manifest)
        batches += 1
        batch_items = []

    try:
        for lon, lat in points:
            try:
                meta, images = fetch(
                    float(lat),
                    float(lon),
                    api_key,
                    secret,
                    yaw_seed=rng.uniform(0, 360),
                    session=session,
                )
            except RateLimitError:
                # flush what we have, record nothing for this point, and
                # surface the rate limit to the caller (reference
                # hard-exits; we let the scheduler decide).
                flush()
                logger.error("rate limited (403) — stopping collection")
                raise
            if len(images) == 4:
                for heading, blob in images:
                    batch_items.append(
                        (float(lat), float(lon), int(round(heading)), blob)
                    )
                collected += 1
                if ledger is not None:
                    ledger.record(float(lat), float(lon), ok=True)
            else:
                failed += 1
                if ledger is not None:
                    ledger.record(float(lat), float(lon), ok=False)
            if collected and collected % batch_size == 0:
                flush()
    finally:
        flush()
    logger.info(
        f"collection done: {collected} collected, {failed} failed, "
        f"{batches} manifest batches"
    )
    return {"collected": collected, "failed": failed, "batches": batches}
