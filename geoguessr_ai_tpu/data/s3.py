"""Object-store backend: content-addressed images, manifests, snapshots,
dataset pointers, and the model-checkpoint registry.

Re-design of /root/reference/backend/s3bucket.py (1565 LoC of boto3-specific
code) on top of **fsspec**, so the same logic runs against s3:// (via s3fs),
file:// (tests, air-gapped dev), or any other fsspec protocol.  The on-bucket
layout is preserved exactly so both stacks can share a bucket:

  v1/images/location_id=<id>/heading=<XXX>.jpg        (content-addressed)
  v1/manifest/run_ts=<ts>/batch-<n>.parquet           (ingestion manifests)
  v1/snapshots/snapshot_ts=<ts>/part-0.parquet        (dedup'd snapshot)
  v1/snapshots/_latest.json                           (pointer)
  v1/sqlite/<name>/_latest.json                       (dataset pointers)
  v1/saved_models/run_ts=<ts>/...  + _latest.json     (checkpoint registry)

Content addressing: location_id = sha1("geo:v1:" + packed 1e-7°-quantized
lat/lon)[:12] (reference s3bucket.py:84-94).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import struct
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from geoguessr_ai_tpu import config as C
from geoguessr_ai_tpu.utils.logging import logger

V1 = "v1"
HOLDOUT_PREFIX = "holdout_dataset"


def quantize_coord(value: float) -> int:
    """Quantize degrees to 1e-7° integer steps (reference s3bucket.py:
    _Q = 10_000_000)."""
    return int(round(float(value) * 1e7))


def location_id(lat: float, lon: float, hex_len: int = 12) -> str:
    """sha1("geo:v1:" + >ii-packed (lat, lon))[:12] content address —
    byte-exact with the reference (make_location_id, s3bucket.py:85-95) so
    both stacks address the same objects on a shared bucket."""
    if not (-90 <= lat <= 90 and -180 <= lon <= 180):
        raise ValueError("lat/lon out of bounds")
    if lat == 0.0:
        lat = 0.0  # normalize -0.0
    if lon == 0.0:
        lon = 0.0
    payload = b"geo:v1:" + struct.pack(
        ">ii", quantize_coord(lat), quantize_coord(lon)
    )
    return hashlib.sha1(payload).hexdigest()[:hex_len]


def image_key(loc_id: str, heading: int) -> str:
    return f"{V1}/images/location_id={loc_id}/heading={int(heading):03d}.jpg"


class ObjectStore:
    """fsspec-backed store rooted at <base_url> (e.g. s3://bucket or
    file:///data/bucket)."""

    def __init__(self, base_url: Optional[str] = None):
        import fsspec

        base_url = base_url or os.environ.get(
            "GEO_TPU_STORE_URL", f"s3://{C.S3_BUCKET}"
        )
        self.base_url = base_url.rstrip("/")
        self.fs, self.root = fsspec.core.url_to_fs(self.base_url)

    # -- low-level ------------------------------------------------------

    def _p(self, key: str) -> str:
        return f"{self.root}/{key}"

    def exists(self, key: str) -> bool:
        return self.fs.exists(self._p(key))

    def read_bytes(self, key: str) -> bytes:
        with self.fs.open(self._p(key), "rb") as f:
            return f.read()

    def write_bytes(self, key: str, data: bytes) -> None:
        parent = os.path.dirname(self._p(key))
        try:
            self.fs.makedirs(parent, exist_ok=True)
        except Exception:
            pass
        with self.fs.open(self._p(key), "wb") as f:
            f.write(data)

    def read_json(self, key: str) -> Dict:
        return json.loads(self.read_bytes(key).decode())

    def write_json(self, key: str, obj: Dict) -> None:
        self.write_bytes(key, json.dumps(obj, indent=1).encode())

    def list(self, prefix: str) -> List[str]:
        try:
            return [
                p[len(self.root) + 1 :]
                for p in self.fs.find(self._p(prefix))
            ]
        except FileNotFoundError:
            return []

    def read_parquet(self, key: str) -> pd.DataFrame:
        return pd.read_parquet(io.BytesIO(self.read_bytes(key)))

    def write_parquet(self, key: str, df: pd.DataFrame) -> None:
        buf = io.BytesIO()
        df.to_parquet(buf, index=False)
        self.write_bytes(key, buf.getvalue())

    def read_parquet_prefix(self, prefix: str) -> pd.DataFrame:
        """Concatenate every parquet under a prefix (s3bucket.py:328)."""
        parts = [
            self.read_parquet(k)
            for k in self.list(prefix)
            if k.endswith(".parquet")
        ]
        if not parts:
            raise FileNotFoundError(f"no parquet under {prefix}")
        return pd.concat(parts, ignore_index=True)

    # -- images ---------------------------------------------------------

    def upload_images(
        self,
        items: Sequence[Tuple[float, float, int, bytes]],
        threads: int = 32,
    ) -> pd.DataFrame:
        """Threaded upload of (lat, lon, heading, jpeg) -> manifest rows
        (reference upload_batch, s3bucket.py:120-155)."""

        def put(item):
            lat, lon, heading, blob = item
            lid = location_id(lat, lon)
            key = image_key(lid, heading)
            self.write_bytes(key, blob)
            return {
                "location_id": lid,
                "lat": lat,
                "lon": lon,
                "heading": int(heading),
                "image_path": f"{self.base_url}/{key}",
                "batch_date": time.strftime("%Y-%m-%d"),
            }

        with ThreadPoolExecutor(threads) as pool:
            rows = list(pool.map(put, items))
        return pd.DataFrame(rows)

    def ingest_local_folder(
        self, folder: str, threads: int = 32, holdout: bool = False
    ) -> int:
        """Ingest a local folder of ``streetview_<lat>_<lon>_heading_<h>.jpg``
        files: threaded upload + manifest (reference parse-and-upload,
        s3bucket.py:243-282 with STREETVIEW_RE :65-68).

        Returns images ingested.
        """
        import re

        pattern = re.compile(
            r"^streetview_([-+]?\d+(?:\.\d+)?)_([-+]?\d+(?:\.\d+)?)"
            r"_heading_(\d{1,3})\.jpg$",
            re.IGNORECASE,
        )
        items = []
        for fname in sorted(os.listdir(folder)):
            m = pattern.match(fname)
            if not m:
                continue
            lat, lon, heading = (
                float(m.group(1)),
                float(m.group(2)),
                int(m.group(3)),
            )
            with open(os.path.join(folder, fname), "rb") as f:
                items.append((lat, lon, heading, f.read()))
        if not items:
            return 0
        manifest = self.upload_images(items, threads=threads)
        self.write_manifest(manifest, holdout=holdout)
        return len(items)

    @staticmethod
    def _manifest_prefix(holdout: bool) -> str:
        # Holdout data lives under a fully separate prefix tree, so the
        # holdout snapshot can never absorb training manifests (reference
        # HOLDOUT_PREFIX = "holdout_dataset", s3bucket.py:58-59).
        return f"{HOLDOUT_PREFIX}/manifest" if holdout else f"{V1}/manifest"

    @staticmethod
    def _snapshot_prefix(holdout: bool) -> str:
        return (
            f"{HOLDOUT_PREFIX}/snapshot" if holdout else f"{V1}/snapshot"
        )

    def write_manifest(
        self,
        df: pd.DataFrame,
        run_ts: Optional[str] = None,
        holdout: bool = False,
    ):
        run_ts = run_ts or time.strftime("%Y%m%dT%H%M%S")
        key = (
            f"{self._manifest_prefix(holdout)}/run_ts={run_ts}/"
            "batch-0.parquet"
        )
        self.write_parquet(key, df)
        return key

    # -- snapshots ------------------------------------------------------

    def merge_snapshot(self, holdout: bool = False) -> str:
        """Merge all manifests into a dedup'd snapshot keyed
        (location_id, heading) + write the _latest.json pointer
        (reference s3bucket.py:206-240).  Pointer schema matches the
        reference: {"s3": "s3://bucket/<prefix>/"} read back via
        read_parquet_prefix, so both stacks can read each other's
        snapshots."""
        manifests = self.read_parquet_prefix(
            f"{self._manifest_prefix(holdout)}/"
        )
        try:
            prev = self.load_latest_snapshot_df(holdout)
            merged = pd.concat([prev, manifests], ignore_index=True)
        except FileNotFoundError:
            merged = manifests
        merged = merged.drop_duplicates(
            subset=["location_id", "heading"], keep="last"
        ).reset_index(drop=True)
        ts = time.strftime("%Y%m%dT%H%M%S")
        snap_prefix = f"{self._snapshot_prefix(holdout)}/snapshot_ts={ts}"
        self.write_parquet(f"{snap_prefix}/part-0.parquet", merged)
        self.write_json(
            f"{self._snapshot_prefix(holdout)}/_latest.json",
            {"s3": f"{self.base_url}/{snap_prefix}/", "rows": len(merged)},
        )
        return snap_prefix

    def load_latest_snapshot_df(self, holdout: bool = False) -> pd.DataFrame:
        """Reference load_latest_snapshot_df / holdout variant
        (s3bucket.py:166-191): resolve the {"s3": ...} pointer and read
        every parquet part under it."""
        pointer_key = f"{self._snapshot_prefix(holdout)}/_latest.json"
        if not self.exists(pointer_key):
            raise FileNotFoundError(f"{pointer_key} missing")
        pointer = self.read_json(pointer_key)
        if "s3" in pointer:
            prefix = pointer["s3"]
            # strip the base url (ours, or any s3://bucket/ the reference
            # stack wrote)
            if prefix.startswith(self.base_url + "/"):
                prefix = prefix[len(self.base_url) + 1 :]
            elif "://" in prefix:
                prefix = prefix.split("://", 1)[1].split("/", 1)[1]
            return self.read_parquet_prefix(prefix.rstrip("/") + "/")
        # legacy single-part pointer written by earlier versions
        return self.read_parquet(pointer["key"])

    def download_random_panorama(
        self, out_dir: str, holdout: bool = True, seed: Optional[int] = None
    ) -> Tuple[List[str], float, float]:
        """Fetch one complete 4-heading panorama for demos (reference
        s3bucket.py:418-502).  Returns (paths, lat, lon)."""
        df = self.load_latest_snapshot_df(holdout)
        groups = [
            g for _, g in df.groupby("location_id") if len(g) == 4
        ]
        rng = np.random.default_rng(seed)
        g = groups[int(rng.integers(len(groups)))]
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for row in g.sort_values("heading").itertuples():
            key = image_key(row.location_id, row.heading)
            p = os.path.join(out_dir, f"heading={row.heading:03d}.jpg")
            with open(p, "wb") as f:
                f.write(self.read_bytes(key))
            paths.append(p)
        first = g.iloc[0]
        return paths, float(first["lat"]), float(first["lon"])

    # -- snapshot -> SQLite dataset build --------------------------------

    def build_sqlite_from_snapshot(
        self,
        out_path: str,
        holdout: bool = False,
        fetch_threads: int = 64,
        window: int = 10_000,
        publish: bool = False,
        log_fn=None,
    ) -> int:
        """Build the raw-JPEG training SQLite from the latest snapshot:
        windowed threaded GETs feeding a single batched writer (reference
        create_and_upload_sqlite_from_latest_snapshot, s3bucket.py:549-783;
        the reference keeps the file local rather than uploading,
        :746-753 — `publish=True` restores the upload+pointer behavior).

        Returns rows written.
        """
        from concurrent.futures import ThreadPoolExecutor

        from geoguessr_ai_tpu.data.pipeline import ThroughputMeter
        from geoguessr_ai_tpu.data.sqlite_dataset import (
            create_sqlite_from_records,
        )

        df = self.load_latest_snapshot_df(holdout)
        meter = ThroughputMeter("build_sqlite_raw", len(df), log_fn)

        def fetch(row):
            try:
                blob = self.read_bytes(
                    image_key(row.location_id, int(row.heading))
                )
            except Exception:
                return None
            return {
                "location_id": row.location_id,
                "lat": float(row.lat),
                "lon": float(row.lon),
                "heading": int(row.heading),
                "capture_date": getattr(row, "capture_date", None),
                "pano_id": getattr(row, "pano_id", None),
                "batch_date": getattr(row, "batch_date", None),
                "image": blob,
            }

        def record_stream():
            rows = list(df.itertuples())
            with ThreadPoolExecutor(fetch_threads) as pool:
                for start in range(0, len(rows), window):
                    chunk = rows[start : start + window]
                    for rec in pool.map(fetch, chunk):
                        if rec is not None:
                            yield rec
                    meter.update(len(chunk), phase="fetch+insert")

        written = create_sqlite_from_records(out_path, record_stream())
        logger.info(f"built {written} rows -> {out_path}")
        if publish:
            self.publish_sqlite(out_path, "raw")
        return written

    # -- dataset pointers ----------------------------------------------

    def publish_sqlite(self, local_path: str, name: str = "raw") -> str:
        ts = time.strftime("%Y%m%dT%H%M%S")
        key = f"{V1}/sqlite/{name}/run_ts={ts}/dataset.sqlite"
        with open(local_path, "rb") as f:
            self.write_bytes(key, f.read())
        self.write_json(
            f"{V1}/sqlite/{name}/_latest.json", {"run_ts": ts, "key": key}
        )
        return key

    def download_latest_sqlite(self, name: str, out_path: str) -> str:
        pointer = self.read_json(f"{V1}/sqlite/{name}/_latest.json")
        with open(out_path, "wb") as f:
            f.write(self.read_bytes(pointer["key"]))
        return out_path

    def download_climate_file(
        self,
        path: str = "koppen_geiger_climatezones_1991_2020_1km.tif",
    ) -> str:
        """Fetch the Köppen-Geiger GeoTIFF the pretrain caption
        enrichment samples climate zones from (reference
        backend/s3bucket.py:1399-1404, consumed at
        pretrain_idun.py:329-338).  Idempotent: a non-empty local copy
        short-circuits the download."""
        if os.path.isfile(path) and os.path.getsize(path) > 0:
            return path
        key = f"{V1}/climate/{os.path.basename(path)}"
        with open(path, "wb") as f:
            f.write(self.read_bytes(key))
        return path

    # -- checkpoint registry -------------------------------------------

    def upload_model_checkpoint(self, local_dir_or_file: str) -> str:
        """Upload a checkpoint + update _latest.json (reference
        s3bucket.py:1407-1446)."""
        ts = time.strftime("%Y%m%dT%H%M%S")
        base = f"{V1}/saved_models/run_ts={ts}"
        if os.path.isdir(local_dir_or_file):
            for dirpath, _, files in os.walk(local_dir_or_file):
                for fn in files:
                    full = os.path.join(dirpath, fn)
                    rel = os.path.relpath(full, local_dir_or_file)
                    with open(full, "rb") as f:
                        self.write_bytes(f"{base}/{rel}", f.read())
        else:
            fn = os.path.basename(local_dir_or_file)
            with open(local_dir_or_file, "rb") as f:
                self.write_bytes(f"{base}/{fn}", f.read())
        self.write_json(
            f"{V1}/saved_models/_latest.json", {"run_ts": ts, "key": base}
        )
        return base

    def list_model_checkpoints(self) -> List[str]:
        """run_ts prefixes, newest first."""
        keys = self.list(f"{V1}/saved_models/")
        runs = sorted(
            {
                k.split("/")[2]
                for k in keys
                if k.startswith(f"{V1}/saved_models/run_ts=")
            },
            reverse=True,
        )
        return runs

    def download_model_checkpoint(
        self, out_dir: str, nth_most_recent: int = 0
    ) -> str:
        """Download the latest (or Nth-most-recent) checkpoint (reference
        s3bucket.py:1449-1536)."""
        runs = self.list_model_checkpoints()
        if not runs:
            raise FileNotFoundError("no checkpoints in registry")
        run = runs[min(nth_most_recent, len(runs) - 1)]
        base = f"{V1}/saved_models/{run}"
        os.makedirs(out_dir, exist_ok=True)
        for key in self.list(base):
            rel = key[len(base) + 1 :]
            dst = os.path.join(out_dir, rel)
            os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
            with open(dst, "wb") as f:
                f.write(self.read_bytes(key))
        return out_dir


# ---------------------------------------------------------------------------
# Module-level conveniences used by entry points
# ---------------------------------------------------------------------------


def download_random_panorama(out_dir: str = "/tmp/geo_tpu_pano") -> List[str]:
    store = ObjectStore()
    paths, lat, lon = store.download_random_panorama(out_dir)
    logger.info(f"panorama at lat={lat} lon={lon}")
    return paths


def download_nth_model_checkpoint(
    n: int, out_dir: str = "/tmp/geo_tpu_ckpt"
) -> str:
    return ObjectStore().download_model_checkpoint(out_dir, n)
