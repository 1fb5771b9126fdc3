"""ProtoRefiner: prototype-based guess refinement, fully vectorized.

TPU re-design of /root/reference/models/proto_refiner.py, which loops
per-sample and per-candidate in Python with a hardcoded "cuda" device and a
broken ``self.dataset`` dependency (SURVEY.md §7 hard-part 4).  Here the
prototypes live in a fixed-shape bank and one jitted program refines the
whole batch:

  bank.embeddings: (num_cells, P, D)  — per-cell cluster prototypes, padded
  bank.coords:     (num_cells, P, 2)  — (lng, lat) per prototype
  bank.mask:       (num_cells, P)     — 1 for real prototypes

For each sample and each of its top-k candidate cells, the best-matching
prototype is found by (negative) euclidean distance; candidate affinities go
through the reference's temperature softmax (T=1.6) and multiply with the
geocell probabilities; the refined guess is rejected when it moves more than
``max_refinement`` km from the initial prediction (reference :216-223).

Behavioral fixes over the reference (documented deviations):
  * within-cluster refinement picks the *closest* member embedding — the
    reference argmaxes raw distance (proto_refiner.py:264-267), selecting
    the furthest image; and its `self.dataset` is commented out so the path
    crashes.  Here member-level refinement is an optional second stage via
    `member_bank`.
  * cells with no prototypes fall back to affinity -1e5, like the
    reference's None-proto branch (:183-188).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from geoguessr_ai_tpu.geo import haversine

DEFAULT_TOPK = 5
DEFAULT_MAX_REFINEMENT_KM = 1000.0
DEFAULT_TEMPERATURE = 1.6
_NO_PROTO_AFFINITY = -1.0e5


@dataclasses.dataclass
class PrototypeBank:
    """Fixed-shape prototype store (one row per geocell)."""

    embeddings: np.ndarray  # (num_cells, P, D) float32
    coords: np.ndarray  # (num_cells, P, 2) float32 (lng, lat)
    mask: np.ndarray  # (num_cells, P) float32

    @property
    def num_cells(self) -> int:
        return self.embeddings.shape[0]

    @property
    def max_protos(self) -> int:
        return self.embeddings.shape[1]

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            embeddings=self.embeddings,
            coords=self.coords,
            mask=self.mask,
        )

    @staticmethod
    def load(path: str) -> "PrototypeBank":
        with np.load(path) as z:
            return PrototypeBank(
                embeddings=z["embeddings"],
                coords=z["coords"],
                mask=z["mask"],
            )


@dataclasses.dataclass
class MemberBank:
    """Fixed-shape per-(cell, prototype) member store.

    TPU re-design of the reference's within-cluster refinement
    (proto_refiner.py:239-269 `_within_cluster_refinement`), which loads
    ragged member lists from a HF dataset per query.  Here members are
    capped at M per prototype and padded into dense arrays so one gather
    per batch serves the whole top-k candidate set; embeddings are
    optionally dim-reduced with a seeded orthonormal random projection
    (Johnson-Lindenstrauss: pairwise distances approximately preserved)
    to keep the bank device-resident.
    """

    embeddings: np.ndarray  # (num_cells, P, M, Dr) float16/32
    coords: np.ndarray  # (num_cells, P, M, 2) float32 (lng, lat)
    mask: np.ndarray  # (num_cells, P, M) float32
    projection: Optional[np.ndarray] = None  # (D, Dr) or None (Dr == D)

    @property
    def max_members(self) -> int:
        return self.embeddings.shape[2]

    def save(self, path: str) -> None:
        arrs = dict(
            embeddings=self.embeddings,
            coords=self.coords,
            mask=self.mask,
        )
        if self.projection is not None:
            arrs["projection"] = self.projection
        np.savez_compressed(path, **arrs)

    @staticmethod
    def load(path: str) -> "MemberBank":
        with np.load(path) as z:
            return MemberBank(
                embeddings=z["embeddings"],
                coords=z["coords"],
                mask=z["mask"],
                projection=z["projection"] if "projection" in z else None,
            )


def make_projection(
    embed_dim: int, reduce_dim: int, seed: int = 0
) -> Optional[np.ndarray]:
    """Seeded orthonormal (columns) Gaussian projection, or None if no
    reduction is needed."""
    if reduce_dim >= embed_dim:
        return None
    rng = np.random.default_rng(seed)
    g = rng.normal(size=(embed_dim, reduce_dim))
    q, _ = np.linalg.qr(g)
    return np.ascontiguousarray(q, np.float32)


def build_prototype_bank(
    proto_df,
    embeddings_by_index: Dict[int, np.ndarray],
    coords_by_index: Dict[int, Tuple[float, float]],
    num_cells: int,
    embed_dim: int,
    max_protos: int = 8,
) -> PrototypeBank:
    """Build the bank from proto_df clusters + an embedding lookup.

    Each (cell, cluster) row becomes one prototype: the mean embedding of
    its member images (reference load_prototypes, proto_refiner.py:271-311)
    with the cluster's member-coordinate centroid.  Cells with more than
    `max_protos` clusters keep the largest ones.

    Args:
      proto_df: DataFrame with geocell_index / cluster_id / indices /
        centroid_lat / centroid_lng (geocells.manager.generate_proto_df).
      embeddings_by_index: dataset-row-index -> (D,) embedding.
      coords_by_index: dataset-row-index -> (lng, lat).
    """
    import ast

    emb = np.zeros((num_cells, max_protos, embed_dim), np.float32)
    coords = np.zeros((num_cells, max_protos, 2), np.float32)
    mask = np.zeros((num_cells, max_protos), np.float32)

    for cell_idx, group in proto_df.groupby("geocell_index"):
        rows = sorted(
            group.itertuples(), key=lambda r: -int(r.count)
        )[:max_protos]
        for p, row in enumerate(rows):
            idxs = row.indices
            if isinstance(idxs, str):
                idxs = ast.literal_eval(idxs)
            members = [
                embeddings_by_index[i]
                for i in idxs
                if i in embeddings_by_index
            ]
            member_coords = [
                coords_by_index[i] for i in idxs if i in coords_by_index
            ]
            if members:
                emb[cell_idx, p] = np.mean(members, axis=0)
                mask[cell_idx, p] = 1.0
            if member_coords:
                coords[cell_idx, p] = np.mean(member_coords, axis=0)
            else:
                coords[cell_idx, p] = (
                    float(row.centroid_lng),
                    float(row.centroid_lat),
                )
    return PrototypeBank(embeddings=emb, coords=coords, mask=mask)


def refine(
    bank_embeddings: jax.Array,  # (num_cells, P, D)
    bank_coords: jax.Array,  # (num_cells, P, 2)
    bank_mask: jax.Array,  # (num_cells, P)
    query_emb: jax.Array,  # (B, D) fused panorama embedding
    topk_ids: jax.Array,  # (B, K) int32
    topk_probs: jax.Array,  # (B, K)
    initial_lnglat: jax.Array,  # (B, 2)
    temperature: float = DEFAULT_TEMPERATURE,
    max_refinement_km: float = DEFAULT_MAX_REFINEMENT_KM,
    member_emb: Optional[jax.Array] = None,  # (num_cells, P, M, Dr)
    member_coords: Optional[jax.Array] = None,  # (num_cells, P, M, 2)
    member_mask: Optional[jax.Array] = None,  # (num_cells, P, M)
    projection: Optional[jax.Array] = None,  # (D, Dr)
):
    """Vectorized refinement.  Returns (refined_lnglat, refined_cell,
    changed_mask) — all (B, ...) arrays; jit/pjit friendly.

    When a member bank is supplied, each candidate's guess is the
    coordinates of the *closest* member image in its best-matching
    cluster (the reference's within-cluster refinement,
    proto_refiner.py:239-269 — which argmaxes raw distance, i.e. the
    furthest image, and crashes on its commented-out ``self.dataset``;
    both fixed here), replacing the cluster centroid before candidate
    selection and the max-refinement gate.
    """
    # Gather candidate banks: (B, K, P, D/2/1)
    cand_emb = bank_embeddings[topk_ids]
    cand_coords = bank_coords[topk_ids]
    cand_mask = bank_mask[topk_ids]

    # Distance of the query to every prototype of every candidate cell.
    diff = cand_emb - query_emb[:, None, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)  # (B, K, P)
    neg_d = -jnp.sqrt(jnp.maximum(d2, 1e-12))
    neg_d = jnp.where(cand_mask > 0, neg_d, _NO_PROTO_AFFINITY)

    # Best prototype per candidate cell -> its affinity + coords.
    best_p = jnp.argmax(neg_d, axis=-1)  # (B, K)
    affinity = jnp.max(neg_d, axis=-1)  # (B, K)
    best_coords = jnp.take_along_axis(
        cand_coords, best_p[..., None, None], axis=2
    )[:, :, 0, :]  # (B, K, 2)
    has_proto = jnp.any(cand_mask > 0, axis=-1)  # (B, K)

    if member_emb is not None:
        # Member-level second stage: closest member of the chosen cluster.
        q = query_emb
        if projection is not None:
            q = q @ projection  # (B, Dr)
        cand_members = member_emb[topk_ids]  # (B, K, P, M, Dr)
        cand_members = jnp.take_along_axis(
            cand_members, best_p[..., None, None, None], axis=2
        )[:, :, 0]  # (B, K, M, Dr)
        cand_mcoords = jnp.take_along_axis(
            member_coords[topk_ids], best_p[..., None, None, None], axis=2
        )[:, :, 0]  # (B, K, M, 2)
        cand_mmask = jnp.take_along_axis(
            member_mask[topk_ids], best_p[..., None, None], axis=2
        )[:, :, 0]  # (B, K, M)
        mdiff = cand_members.astype(jnp.float32) - q[:, None, None, :]
        md2 = jnp.sum(mdiff * mdiff, axis=-1)  # (B, K, M)
        md2 = jnp.where(cand_mmask > 0, md2, jnp.inf)
        best_m = jnp.argmin(md2, axis=-1)  # (B, K)
        m_coords = jnp.take_along_axis(
            cand_mcoords, best_m[..., None, None], axis=2
        )[:, :, 0, :]  # (B, K, 2)
        has_member = jnp.any(cand_mmask > 0, axis=-1)
        # Clusters without stored members keep the prototype centroid,
        # like the reference's count==0 branch (:251-252).
        best_coords = jnp.where(has_member[..., None], m_coords, best_coords)

    # Candidates without prototypes fall back to the initial prediction's
    # coordinates so a forced selection cannot fly to (0, 0).
    best_coords = jnp.where(
        has_proto[..., None], best_coords, initial_lnglat[:, None, :]
    )

    # Temperature softmax over candidates x geocell probs
    # (reference :205-210, :378-389).
    proto_probs = jax.nn.softmax(affinity / temperature, axis=-1)
    final_probs = topk_probs * proto_probs

    initial_choice = jnp.argmax(topk_probs, axis=-1)
    refined_choice = jnp.argmax(final_probs, axis=-1)
    refined_coords = jnp.take_along_axis(
        best_coords, refined_choice[:, None, None], axis=1
    )[:, 0, :]

    # Reject refinements that moved too far (reference :216-223).
    dist = haversine(initial_lnglat, refined_coords)
    too_far = dist > max_refinement_km
    final_choice = jnp.where(too_far, initial_choice, refined_choice)
    final_coords = jnp.where(
        too_far[:, None], initial_lnglat, refined_coords
    )
    final_cell = jnp.take_along_axis(
        topk_ids, final_choice[:, None], axis=1
    )[:, 0]
    changed = final_choice != initial_choice
    return final_coords, final_cell, changed


class ProtoRefiner:
    """Stateful wrapper pairing a PrototypeBank with the jitted refine()."""

    def __init__(
        self,
        bank: PrototypeBank,
        topk: int = DEFAULT_TOPK,
        max_refinement: float = DEFAULT_MAX_REFINEMENT_KM,
        temperature: float = DEFAULT_TEMPERATURE,
        member_bank: Optional[MemberBank] = None,
    ):
        self.bank = bank
        self.member_bank = member_bank
        self.topk = topk
        self.max_refinement = float(max_refinement)
        self.temperature = float(temperature)
        self._emb = jnp.asarray(bank.embeddings)
        self._coords = jnp.asarray(bank.coords)
        self._mask = jnp.asarray(bank.mask)
        mkw = {}
        if member_bank is not None:
            mkw = dict(
                member_emb=jnp.asarray(member_bank.embeddings),
                member_coords=jnp.asarray(member_bank.coords),
                member_mask=jnp.asarray(member_bank.mask),
                projection=(
                    None
                    if member_bank.projection is None
                    else jnp.asarray(member_bank.projection)
                ),
            )
        self._refine = jax.jit(
            lambda q, ids, probs, init: refine(
                self._emb,
                self._coords,
                self._mask,
                q,
                ids,
                probs,
                init,
                temperature=self.temperature,
                max_refinement_km=self.max_refinement,
                **mkw,
            )
        )

    def __call__(
        self,
        query_emb: np.ndarray,
        topk_ids: np.ndarray,
        topk_probs: np.ndarray,
        initial_lnglat: np.ndarray,
    ):
        coords, cells, changed = self._refine(
            jnp.asarray(query_emb, jnp.float32),
            jnp.asarray(topk_ids, jnp.int32)[:, : self.topk],
            jnp.asarray(topk_probs, jnp.float32)[:, : self.topk],
            jnp.asarray(initial_lnglat, jnp.float32),
        )
        return np.asarray(coords), np.asarray(cells), np.asarray(changed)


_DEFAULT_REFINER: Optional[ProtoRefiner] = None


def try_refine(result) -> Optional[Tuple[float, float]]:
    """Engine hook: refine one InferenceResult if a default bank exists.

    Returns (lat, lon) or None when no bank artifact is available.
    """
    global _DEFAULT_REFINER
    import os

    from geoguessr_ai_tpu import config as C

    bank_path = os.path.join(C.GEOCELL_DIR, "prototype_bank.npz")
    member_path = os.path.join(C.GEOCELL_DIR, "prototype_member_bank.npz")
    if _DEFAULT_REFINER is None:
        if not os.path.exists(bank_path):
            return None
        members = (
            MemberBank.load(member_path)
            if os.path.exists(member_path)
            else None
        )
        _DEFAULT_REFINER = ProtoRefiner(
            PrototypeBank.load(bank_path), member_bank=members
        )
    emb = result.embedding
    if emb.ndim == 2:  # (V, D) views -> fused
        emb = emb.mean(axis=0)
    coords, cells, changed = _DEFAULT_REFINER(
        emb[None],
        np.asarray(result.top_ids)[None],
        np.asarray(result.top_probs)[None],
        np.array([[result.lon, result.lat]], np.float32),
    )
    return float(coords[0, 1]), float(coords[0, 0])
