"""SQLite panorama dataset: reader + builder.

The training-data format of the reference (backend/s3bucket.py:549-783,
training/load_sqlite_dataset.py): a single ``samples`` table of JPEG blobs
keyed (location_id, heading), grouped into per-location 4-heading panoramas.

Reader semantics preserved: strict read-only connections (WAL-safe), full
table scan to pandas, heading-sorted grouping with <=4 views per location.
The builder keeps the reference's single-writer batched-insert discipline.
"""

from __future__ import annotations

import os
import sqlite3
from typing import Dict, Iterable, List, Sequence

import numpy as np
import pandas as pd

SCHEMA = """
CREATE TABLE IF NOT EXISTS samples (
  location_id TEXT NOT NULL,
  lat REAL NOT NULL,
  lon REAL NOT NULL,
  heading INTEGER NOT NULL,
  capture_date TEXT,
  pano_id TEXT,
  batch_date TEXT,
  image BLOB NOT NULL,
  PRIMARY KEY (location_id, heading)
) WITHOUT ROWID;
"""

EMBEDDING_SCHEMA = """
CREATE TABLE IF NOT EXISTS samples (
  location_id TEXT NOT NULL,
  lat REAL NOT NULL,
  lon REAL NOT NULL,
  heading INTEGER NOT NULL,
  capture_date TEXT,
  pano_id TEXT,
  batch_date TEXT,
  embedding BLOB NOT NULL,
  embedding_dim INTEGER NOT NULL,
  PRIMARY KEY (location_id, heading)
) WITHOUT ROWID;
"""


def open_readonly(path: str) -> sqlite3.Connection:
    """Read-only connection that can never write WAL state
    (reference: load_sqlite_dataset.py:53-60)."""
    conn = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    conn.execute("PRAGMA query_only=1;")
    return conn


def load_sqlite_dataset(path: str) -> pd.DataFrame:
    """Full-table read into a per-image DataFrame (blobs as bytes)."""
    with open_readonly(path) as conn:
        df = pd.read_sql_query("SELECT * FROM samples", conn)
    blob_col = "image" if "image" in df.columns else "embedding"
    df[blob_col] = df[blob_col].map(
        lambda b: bytes(b) if isinstance(b, memoryview) else b
    )
    return df


def build_panorama_table(df: pd.DataFrame) -> pd.DataFrame:
    """Per-image rows -> one row per location with heading-sorted views.

    Columns out: location_id, lat, lon, headings (list), images (list[bytes]).
    Reference semantics: load_sqlite_dataset.py:104-150.
    """
    required = {"location_id", "lat", "lon", "heading"}
    missing = required.difference(df.columns)
    if missing:
        raise ValueError(f"missing columns: {missing}")
    blob_col = "image" if "image" in df.columns else "embedding"
    d = df.sort_values(["location_id", "heading"])
    records: List[Dict] = []
    for location_id, group in d.groupby("location_id", sort=True):
        group = group[group[blob_col].notna()]
        if group.empty:
            continue
        first = group.iloc[0]
        records.append(
            {
                "location_id": location_id,
                "lat": float(first["lat"]),
                "lon": float(first["lon"]),
                "headings": group["heading"].tolist(),
                "images": group[blob_col].tolist(),
            }
        )
    if not records:
        raise ValueError("no panorama records in dataset")
    return pd.DataFrame.from_records(records)


def load_sqlite_panorama_dataset(path: str) -> pd.DataFrame:
    """Reference entry point (load_sqlite_dataset.py:153)."""
    return build_panorama_table(load_sqlite_dataset(path))


def split_train_val(
    pano_df: pd.DataFrame, val_fraction: float = 0.1
) -> tuple:
    """Reference split: first (1-f) train, last f val==test, no shuffle
    (main_coordinator_idun.py:133-139, run_benchmark.py:168-174)."""
    n = len(pano_df)
    n_train = int(n * (1.0 - val_fraction))
    return pano_df.iloc[:n_train], pano_df.iloc[n_train:]


def create_sqlite_from_records(
    path: str,
    records: Iterable[Dict],
    batch_size: int = 1000,
    embedding: bool = False,
) -> int:
    """Single-writer batched builder with the reference's WAL pragmas
    (s3bucket.py:593-613).  Each record is a dict with the schema columns.

    Returns number of rows written.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    conn = sqlite3.connect(path)
    try:
        cur = conn.cursor()
        cur.execute("PRAGMA journal_mode=WAL;")
        cur.execute("PRAGMA synchronous=NORMAL;")
        cur.execute("PRAGMA temp_store=MEMORY;")
        cur.executescript(EMBEDDING_SCHEMA if embedding else SCHEMA)
        conn.commit()

        if embedding:
            cols = (
                "location_id lat lon heading capture_date pano_id "
                "batch_date embedding embedding_dim"
            ).split()
        else:
            cols = (
                "location_id lat lon heading capture_date pano_id "
                "batch_date image"
            ).split()
        sql = (
            f"INSERT OR REPLACE INTO samples ({', '.join(cols)}) "
            f"VALUES ({', '.join('?' * len(cols))})"
        )
        total = 0
        buf: List[Sequence] = []
        for rec in records:
            buf.append(tuple(rec.get(c) for c in cols))
            if len(buf) >= batch_size:
                cur.executemany(sql, buf)
                conn.commit()
                total += len(buf)
                buf = []
        if buf:
            cur.executemany(sql, buf)
            conn.commit()
            total += len(buf)
        return total
    finally:
        conn.close()


def read_embeddings(path: str) -> pd.DataFrame:
    """Read an embedding SQLite (float32 blobs) into a DataFrame with a
    decoded ``embedding`` ndarray column."""
    df = load_sqlite_dataset(path)
    if "embedding_dim" not in df.columns:
        raise ValueError("not an embedding dataset")
    df["embedding"] = [
        np.frombuffer(b, dtype=np.float32, count=int(d))
        for b, d in zip(df["embedding"], df["embedding_dim"])
    ]
    return df
