"""Streaming datasets over the object store.

Re-design of the reference's fsspec-streaming datasets (backend/data.py):
``GeoImageIterableDataset`` (:57) streams single images straight from the
snapshot manifest, ``PanoramaIterableDataset`` (:181) groups 4-heading
panoramas so a panorama never splits across workers.  Behaviors preserved:

  * local file cache in front of the store (reference ./.s3cache filecache),
  * shard-by-worker/host round-robin (here: jax process index, or an
    explicit (shard, num_shards)),
  * 3-retry image fetch with a black-placeholder fallback so batches never
    contain holes (:135-156),
  * panoramas require exactly 4 headings (:206-234).

Yields numpy uint8 images + target dicts; compose with
pipeline.prefetch_to_device for the device side.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from geoguessr_ai_tpu.data.pipeline import decode_jpeg
from geoguessr_ai_tpu.data.s3 import ObjectStore, image_key
from geoguessr_ai_tpu.utils.logging import logger


class _CachedFetcher:
    """store.read_bytes with a local content cache + retry/fallback."""

    def __init__(
        self,
        store: ObjectStore,
        cache_dir: str = "./.s3cache",
        retries: int = 3,
    ):
        self.store = store
        self.cache_dir = cache_dir
        self.retries = retries
        os.makedirs(cache_dir, exist_ok=True)

    def fetch(self, key: str) -> Optional[bytes]:
        cpath = os.path.join(
            self.cache_dir, hashlib.sha1(key.encode()).hexdigest()
        )
        if os.path.exists(cpath):
            with open(cpath, "rb") as f:
                return f.read()
        for attempt in range(self.retries):
            try:
                blob = self.store.read_bytes(key)
                tmp = cpath + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, cpath)
                return blob
            except Exception as e:
                if attempt == self.retries - 1:
                    logger.warning(f"fetch failed after retries: {key} ({e})")
        return None


def _shard_params(
    shard: Optional[int], num_shards: Optional[int]
) -> Tuple[int, int]:
    if shard is not None and num_shards is not None:
        return shard, num_shards
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


class GeoImageStream:
    """Iterates (image_u8 (S,S,3), target dict) over snapshot rows.

    Reference: GeoImageIterableDataset (backend/data.py:57-178).
    """

    def __init__(
        self,
        store: ObjectStore,
        image_size: int,
        snapshot_df=None,
        holdout: bool = False,
        cache_dir: str = "./.s3cache",
        shard: Optional[int] = None,
        num_shards: Optional[int] = None,
    ):
        self.store = store
        self.df = (
            snapshot_df
            if snapshot_df is not None
            else store.load_latest_snapshot_df(holdout)
        )
        self.image_size = image_size
        self.fetcher = _CachedFetcher(store, cache_dir)
        self.shard, self.num_shards = _shard_params(shard, num_shards)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, Dict]]:
        for i, row in enumerate(self.df.itertuples()):
            if i % self.num_shards != self.shard:
                continue
            blob = self.fetcher.fetch(
                image_key(row.location_id, int(row.heading))
            )
            if blob is None:
                img = np.zeros(
                    (self.image_size, self.image_size, 3), np.uint8
                )  # black placeholder (reference :135-156)
            else:
                try:
                    img = decode_jpeg(blob, self.image_size)
                except Exception:
                    img = np.zeros(
                        (self.image_size, self.image_size, 3), np.uint8
                    )
            yield img, {
                "lat": float(row.lat),
                "lon": float(row.lon),
                "location_id": row.location_id,
                "heading": int(row.heading),
                "capture_date": getattr(row, "capture_date", None),
            }


def snapshot_panorama_table(
    store: ObjectStore,
    holdout: bool = False,
    cache_dir: str = "./.s3cache",
):
    """Build a panorama table whose ``images`` entries are store KEYS plus
    the matching fetch_fn — feed both to PanoramaBatchIterator to train
    straight off the object store without a local SQLite (reference
    main_coordinator.py, SURVEY.md §2.2).

    Returns (pano_df, fetch_fn).
    """
    import pandas as pd

    df = store.load_latest_snapshot_df(holdout)
    fetcher = _CachedFetcher(store, cache_dir)
    records = []
    for location_id, group in df.groupby("location_id", sort=True):
        group = group.sort_values("heading")
        first = group.iloc[0]
        records.append(
            {
                "location_id": location_id,
                "lat": float(first["lat"]),
                "lon": float(first["lon"]),
                "headings": group["heading"].tolist(),
                "images": [
                    image_key(location_id, int(h)) for h in group["heading"]
                ],
            }
        )
    return pd.DataFrame.from_records(records), fetcher.fetch


class PanoramaStream:
    """Iterates ((4, S, S, 3) u8, target) over complete panoramas; a
    panorama never crosses shards (reference PanoramaIterableDataset,
    backend/data.py:181-281)."""

    def __init__(
        self,
        store: ObjectStore,
        image_size: int,
        snapshot_df=None,
        holdout: bool = False,
        cache_dir: str = "./.s3cache",
        shard: Optional[int] = None,
        num_shards: Optional[int] = None,
    ):
        self.store = store
        df = (
            snapshot_df
            if snapshot_df is not None
            else store.load_latest_snapshot_df(holdout)
        )
        # exactly-4-heading groups, sharded by group
        self.groups = [
            g.sort_values("heading")
            for _, g in df.groupby("location_id", sort=True)
            if len(g) == 4
        ]
        self.image_size = image_size
        self.fetcher = _CachedFetcher(store, cache_dir)
        self.shard, self.num_shards = _shard_params(shard, num_shards)

    def __len__(self) -> int:
        n = len(self.groups)
        return (n - self.shard + self.num_shards - 1) // self.num_shards

    def __iter__(self) -> Iterator[Tuple[np.ndarray, Dict]]:
        for i, group in enumerate(self.groups):
            if i % self.num_shards != self.shard:
                continue
            views = np.zeros(
                (4, self.image_size, self.image_size, 3), np.uint8
            )
            for v, row in enumerate(group.itertuples()):
                blob = self.fetcher.fetch(
                    image_key(row.location_id, int(row.heading))
                )
                if blob is not None:
                    try:
                        views[v] = decode_jpeg(blob, self.image_size)
                    except Exception:
                        pass
            first = group.iloc[0]
            yield views, {
                "lat": float(first["lat"]),
                "lon": float(first["lon"]),
                "location_id": first["location_id"],
                "headings": group["heading"].tolist(),
            }
