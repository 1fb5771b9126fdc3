"""Embedding-builder end-to-end test on the CPU backend with a tiny
backbone."""

import os

import numpy as np
import pytest

from geoguessr_ai_tpu.config import BackboneConfig, EmbedBuildConfig
from geoguessr_ai_tpu.data.embed_builder import Embedder, build_embedding_sqlite
from geoguessr_ai_tpu.data.sqlite_dataset import (
    create_sqlite_from_records,
    read_embeddings,
)


@pytest.fixture(scope="module")
def raw_sqlite(tmp_path_factory, fixtures_dir):
    path = str(tmp_path_factory.mktemp("db") / "raw.sqlite")
    with open(os.path.join(fixtures_dir, "heading=000.jpg"), "rb") as f:
        blob = f.read()
    records = []
    for i in range(10):
        records.append(
            {
                "location_id": f"loc{i}",
                "lat": float(i),
                "lon": float(-i),
                "heading": 0,
                "image": blob,
            }
        )
    create_sqlite_from_records(path, records)
    return path


class _TinyEmbedder(Embedder):
    """Embedder over the test-size TinyViT (CPU-fast)."""

    def __init__(self):
        import jax
        import jax.numpy as jnp

        from geoguessr_ai_tpu.config import (
            TINYVIT_NORM_MEAN,
            TINYVIT_NORM_STD,
        )
        from geoguessr_ai_tpu.models import TinyViT, TinyViTConfig
        from geoguessr_ai_tpu.ops.preprocess import fused_preprocess

        cfg = TinyViTConfig.test_tiny(dtype=jnp.float32)
        module = TinyViT(cfg)
        self.image_size = cfg.image_size
        self.embed_dim = cfg.embed_dim
        self.variables = module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        )

        def embed(variables, images_u8):
            x = fused_preprocess(
                images_u8,
                TINYVIT_NORM_MEAN,
                TINYVIT_NORM_STD,
                cfg.image_size,
                dtype=jnp.float32,
            )
            return module.apply(variables, x)

        self._embed = jax.jit(embed)


def test_build_embedding_sqlite_roundtrip(raw_sqlite, tmp_path):
    out = str(tmp_path / "emb.sqlite")
    telemetry = []
    written = build_embedding_sqlite(
        raw_sqlite,
        out,
        EmbedBuildConfig(batch_size=4, fetch_threads=2),
        embedder=_TinyEmbedder(),
        log_fn=telemetry.append,
    )
    assert written == 10
    df = read_embeddings(out)
    assert len(df) == 10
    emb = np.stack(df["embedding"].to_list())
    assert emb.shape == (10, 80)
    assert np.isfinite(emb).all()
    # identical inputs -> identical embeddings (deterministic, padded batch
    # does not contaminate real rows)
    assert np.allclose(emb[0], emb[9], atol=1e-5)
    # telemetry carries the reference's fields
    assert telemetry and {"mode", "processed", "total",
                          "throughput_img_per_s", "phase"} <= set(
        telemetry[0]
    )
    assert telemetry[-1]["processed"] == 10


def test_build_embedding_sqlite_predecoded_matches(raw_sqlite, tmp_path):
    """predecoded=True (in-memory uint8 mode, VERDICT #9) writes the same
    embeddings as the streaming path."""
    emb = _TinyEmbedder()
    out_a = str(tmp_path / "emb_stream.sqlite")
    out_b = str(tmp_path / "emb_pre.sqlite")
    cfg = EmbedBuildConfig(batch_size=4, fetch_threads=2)
    assert build_embedding_sqlite(raw_sqlite, out_a, cfg, embedder=emb) == 10
    assert (
        build_embedding_sqlite(
            raw_sqlite, out_b, cfg, embedder=emb, predecoded=True
        )
        == 10
    )
    a = read_embeddings(out_a).sort_values("location_id")
    b = read_embeddings(out_b).sort_values("location_id")
    for ea, eb in zip(a["embedding"], b["embedding"]):
        np.testing.assert_allclose(ea, eb, atol=1e-6)


def test_builder_resume_skips_done_rows(tmp_path, raw_sqlite):
    """A killed build restarts where it stopped: the second invocation
    embeds only the rows missing from the output SQLite."""
    import sqlite3

    from geoguessr_ai_tpu.config import EmbedBuildConfig
    from geoguessr_ai_tpu.data.embed_builder import build_embedding_sqlite

    out = str(tmp_path / "emb_resume.sqlite")
    cfg = EmbedBuildConfig(batch_size=4, fetch_threads=2, quant_mode="none")
    tiny_embedder = _TinyEmbedder()
    # first pass: only 5 rows
    n1 = build_embedding_sqlite(
        raw_sqlite, out, cfg, embedder=tiny_embedder, limit=5
    )
    assert n1 == 5
    # second pass over everything resumes past the 5
    n2 = build_embedding_sqlite(
        raw_sqlite, out, cfg, embedder=tiny_embedder
    )
    with sqlite3.connect(out) as c:
        total = c.execute("SELECT COUNT(*) FROM samples").fetchone()[0]
    assert n2 == total - 5
    # a third run is a no-op
    n3 = build_embedding_sqlite(
        raw_sqlite, out, cfg, embedder=tiny_embedder
    )
    assert n3 == 0


def test_mesh_sharded_embedder_matches_single_device(raw_sqlite, tmp_path):
    """Mesh-sharded batch embedding (the device-parallel analog of the
    reference's Accelerate embed extraction, preprocessing/embed.py:36-38)
    produces the same embeddings as the single-device path on the
    8-virtual-device CPU mesh."""
    import jax
    import numpy as np

    from geoguessr_ai_tpu.config import EmbedBuildConfig
    from geoguessr_ai_tpu.data.embed_builder import build_embedding_sqlite
    from geoguessr_ai_tpu.data.sqlite_dataset import read_embeddings
    from geoguessr_ai_tpu.parallel.mesh import create_mesh
    from geoguessr_ai_tpu.config import MeshConfig

    assert len(jax.devices()) == 8
    mesh = create_mesh(MeshConfig(data_parallel=8, model_parallel=1))

    emb_single = _TinyEmbedder()
    emb_mesh = _TinyEmbedder()
    # re-jit the mesh variant through the production ctor logic by
    # grafting the sharded step: use the public Embedder API instead
    from geoguessr_ai_tpu.parallel.mesh import batch_sharding, replicated
    import jax.numpy as jnp

    emb_mesh.variables = jax.device_put(emb_mesh.variables, replicated(mesh))
    inner = emb_mesh._embed
    emb_mesh._embed = jax.jit(
        lambda v, x: inner(v, x),
        in_shardings=(None, batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh),
    )

    cfg = EmbedBuildConfig(batch_size=8, fetch_threads=2, quant_mode="none")
    out_a = str(tmp_path / "single.sqlite")
    out_b = str(tmp_path / "mesh.sqlite")
    assert build_embedding_sqlite(
        raw_sqlite, out_a, cfg, embedder=emb_single
    ) == 10
    assert build_embedding_sqlite(
        raw_sqlite, out_b, cfg, embedder=emb_mesh
    ) == 10
    a = read_embeddings(out_a).sort_values(["location_id", "heading"])
    b = read_embeddings(out_b).sort_values(["location_id", "heading"])
    for ea, eb in zip(a["embedding"], b["embedding"]):
        np.testing.assert_allclose(ea, eb, rtol=1e-5, atol=1e-5)
