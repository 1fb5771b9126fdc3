"""Host input pipeline: decode -> batch -> prefetch to HBM.

Replaces the reference's torch DataLoader workers (LocalGeoMapDataset,
main_coordinator_idun_s3.py:26-138) with a thread-pooled JPEG decode stage
feeding double-buffered ``jax.device_put`` prefetch.  Panoramas with fewer
than 4 views are padded with zero images + a view mask (static shapes for
XLA; reference pads with zero tensors too, :107-128).

Decode backend: the native libjpeg decoder (data/native) when built,
otherwise PIL.  Both decode straight to the model's square target size so
the device-side fused preprocess skips its resize branch.
"""

from __future__ import annotations

import concurrent.futures as cf
import io
import threading
from typing import Dict, Iterator

import numpy as np

from geoguessr_ai_tpu.config import NUM_PANORAMA_VIEWS


def _pil_decode(blob: bytes, size: int) -> np.ndarray:
    from PIL import Image

    with Image.open(io.BytesIO(blob)) as im:
        im = im.convert("RGB")
        if im.size != (size, size):
            im = im.resize((size, size), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


def decode_jpeg(blob: bytes, size: int) -> np.ndarray:
    """Decode one JPEG to (size, size, 3) uint8.

    Native libjpeg first; any native failure (grayscale/CMYK/corrupt
    stream) falls back to PIL, which converts exotic color spaces."""
    try:
        from geoguessr_ai_tpu.data.native import jpeg as native_jpeg

        if native_jpeg.available():
            return native_jpeg.decode_resize(blob, size)
    except Exception:
        pass
    return _pil_decode(blob, size)


class PanoramaBatchIterator:
    """Yields host batches from a panorama DataFrame.

    Each batch dict:
      pixel_values: (B, V, size, size, 3) uint8
      view_mask:    (B, V) float32 — 1 for real views, 0 for padding
      coords:       (B, 2) float32 (lng, lat)
      location_id:  list[str]
    The final short batch is padded up to batch_size by repeating the last
    sample (static shapes), with ``num_real`` recording the true count.
    """

    def __init__(
        self,
        pano_df,
        batch_size: int,
        image_size: int,
        num_views: int = NUM_PANORAMA_VIEWS,
        shuffle: bool = False,
        seed: int = 0,
        decode_threads: int = 8,
        drop_remainder: bool = False,
        fetch_fn=None,
    ):
        """fetch_fn maps an entry of a row's ``images`` list to JPEG bytes
        (identity for in-memory blobs; an object-store fetcher for
        streaming rows that carry keys instead of bytes)."""
        self.df = pano_df.reset_index(drop=True)
        self.batch_size = batch_size
        self.image_size = image_size
        self.num_views = num_views
        self.shuffle = shuffle
        self.seed = seed
        self.decode_threads = decode_threads
        self.drop_remainder = drop_remainder
        self.fetch_fn = fetch_fn
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.df)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _decode_row(self, row):
        views = np.zeros(
            (self.num_views, self.image_size, self.image_size, 3), np.uint8
        )
        mask = np.zeros((self.num_views,), np.float32)
        for v, blob in enumerate(row.images[: self.num_views]):
            if self.fetch_fn is not None:
                blob = self.fetch_fn(blob)
            if blob is None:
                continue  # black placeholder (fetch failed)
            try:
                views[v] = decode_jpeg(blob, self.image_size)
                mask[v] = 1.0
            except Exception:
                pass  # undecodable view -> black placeholder, mask 0
        return views, mask

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.df))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1

        with cf.ThreadPoolExecutor(self.decode_threads) as pool:
            for start in range(0, len(order), self.batch_size):
                idx = order[start : start + self.batch_size]
                num_real = len(idx)
                if num_real < self.batch_size:
                    if self.drop_remainder:
                        break
                    idx = np.concatenate(
                        [idx, np.repeat(idx[-1:], self.batch_size - num_real)]
                    )
                rows = [self.df.iloc[i] for i in idx]
                decoded = list(pool.map(self._decode_row, rows))
                views = np.stack([d[0] for d in decoded])
                masks = np.stack([d[1] for d in decoded])
                coords = np.array(
                    [[r.lon, r.lat] for r in rows], dtype=np.float32
                )
                yield {
                    "pixel_values": views,
                    "view_mask": masks,
                    "coords": coords,
                    "location_id": [r.location_id for r in rows],
                    "num_real": num_real,
                }


class EmbeddingBatchIterator:
    """Yields host batches from a panorama DataFrame whose ``images``
    entries are float32 embedding blobs (an embedding SQLite grouped by
    build_panorama_table) — the input side of embedding-only head
    training (reference finetune_on_embeddings, train_modes.py:132-160).

    Each batch dict:
      embedding:  (B, V, D) float32 — zero rows for missing views
      view_mask:  (B, V) float32
      coords:     (B, 2) float32 (lng, lat)
    """

    def __init__(
        self,
        pano_df,
        batch_size: int,
        embed_dim: int,
        num_views: int = NUM_PANORAMA_VIEWS,
        shuffle: bool = False,
        seed: int = 0,
        drop_remainder: bool = False,
    ):
        self.df = pano_df.reset_index(drop=True)
        self.batch_size = batch_size
        self.embed_dim = embed_dim
        self.num_views = num_views
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.df)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _row(self, row):
        emb = np.zeros((self.num_views, self.embed_dim), np.float32)
        mask = np.zeros((self.num_views,), np.float32)
        for v, blob in enumerate(row.images[: self.num_views]):
            if blob is None:
                continue
            vec = (
                np.asarray(blob, np.float32)
                if not isinstance(blob, (bytes, memoryview))
                else np.frombuffer(blob, np.float32)
            )
            emb[v, : vec.shape[-1]] = vec[: self.embed_dim]
            mask[v] = 1.0
        return emb, mask

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.df))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        self._epoch += 1
        for start in range(0, len(order), self.batch_size):
            idx = order[start : start + self.batch_size]
            num_real = len(idx)
            if num_real < self.batch_size:
                if self.drop_remainder:
                    break
                idx = np.concatenate(
                    [idx, np.repeat(idx[-1:], self.batch_size - num_real)]
                )
            rows = [self.df.iloc[i] for i in idx]
            packed = [self._row(r) for r in rows]
            yield {
                "embedding": np.stack([p[0] for p in packed]),
                "view_mask": np.stack([p[1] for p in packed]),
                "coords": np.array(
                    [[r.lon, r.lat] for r in rows], dtype=np.float32
                ),
                "location_id": [r.location_id for r in rows],
                "num_real": num_real,
            }


def prefetch_to_device(
    iterator: Iterator[Dict],
    device=None,
    depth: int = 2,
    keys=("pixel_values", "view_mask", "coords", "embedding"),
):
    """Double-buffered host->HBM prefetch.

    Transfers the next `depth` batches while the device computes, hiding
    PCIe latency behind the model step (the role of the reference's
    DataLoader prefetching + .to(device), main_coordinator_idun.py:320-341).
    Non-array batch entries pass through on the host.

    `device` may be a Device or a Sharding (e.g. the mesh batch sharding)
    so batches land directly in their final layout — transferring to one
    device and re-sharding inside the step loop would double the traffic.
    """
    import jax

    if device is None:
        device = jax.devices()[0]

    def transfer(batch):
        out = dict(batch)
        for k in keys:
            if k in out:
                out[k] = jax.device_put(out[k], device)
        return out

    import collections

    queue = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(depth):
            queue.append(transfer(next(it)))
    except StopIteration:
        pass
    while queue:
        batch = queue.popleft()
        try:
            queue.append(transfer(next(it)))
        except StopIteration:
            pass
        yield batch


class ThroughputMeter:
    """Telemetry matching the reference's builder logs (s3bucket.py:679-689):
    mode, processed, total, throughput_img_per_s, phase."""

    def __init__(self, mode: str, total: int, log_fn=None):
        import time

        self.mode = mode
        self.total = total
        self.processed = 0
        self._t0 = time.perf_counter()
        self._log = log_fn or (lambda d: None)
        self._lock = threading.Lock()

    def update(self, n: int, phase: str = "run") -> Dict:
        import time

        with self._lock:
            self.processed += n
            dt = max(time.perf_counter() - self._t0, 1e-9)
            rec = {
                "mode": self.mode,
                "processed": self.processed,
                "total": self.total,
                "throughput_img_per_s": self.processed / dt,
                "phase": phase,
            }
        self._log(rec)
        return rec
