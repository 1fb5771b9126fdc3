"""CLIP BPE tokenizer parity: HF CLIPTokenizer is the oracle.

Instantiated from the SAME vendored vocab.json/merges.txt (local files —
no network), HF's slow CLIPTokenizer must produce token-for-token
identical ids, so a real OpenAI vocabulary dropped into the asset dir
interoperates exactly with real CLIP text checkpoints (round-2 VERDICT
#7; reference tokenization: pretrain_idun.py:205-217)."""

import os
import random

import numpy as np
import pytest

from geoguessr_ai_tpu.train.captions import CLIMATE_DICT, select_caption
from geoguessr_ai_tpu.train.clip_bpe import (
    CLIPBPETokenizer,
    asset_dir,
    default_tokenize_fn,
    load_default_tokenizer,
)

ASSETS = asset_dir()
VOCAB = os.path.join(ASSETS, "vocab.json")
MERGES = os.path.join(ASSETS, "merges.txt")

pytestmark = pytest.mark.skipif(
    not os.path.exists(VOCAB), reason="BPE assets not built"
)


def _hf_tokenizer():
    from transformers import CLIPTokenizer

    return CLIPTokenizer(VOCAB, MERGES)


def _caption_battery():
    rng = random.Random(7)
    climates = list(CLIMATE_DICT.values())
    texts = []
    for country in ("Norway", "United States Of America", "Japan",
                    "the Philippines", "Curaçao", "Côte d'Ivoire"):
        for _ in range(4):
            texts.append(
                select_caption(
                    {
                        "country": country,
                        "region": "Trøndelag",
                        "town": "Hell",
                        "climate_zone": rng.choice(climates),
                        "drive_right": rng.random() > 0.5,
                        "month": "December",
                    },
                    rng,
                )
            )
    texts += [
        "A Street View photo.",
        "A Street View photo taken around latitude 63.430, "
        "longitude 10.395.",
        "",
        "  WEIRD   spacing\tand\nnewlines  ",
        "punctuation!?: yes... (really) #1 100% - it's fine",
        "ALL CAPS TEXT",
        "unicode: naïve café señor Zürich",
        "word " * 200,  # forces truncation at 77
    ]
    return texts


def test_exact_parity_with_hf():
    ours = CLIPBPETokenizer(VOCAB, MERGES, max_length=77)
    hf = _hf_tokenizer()
    texts = _caption_battery()
    got = ours(texts)
    want = hf(
        texts,
        padding="max_length",
        truncation=True,
        max_length=77,
        return_tensors="np",
    )["input_ids"]
    np.testing.assert_array_equal(got, np.asarray(want, np.int32))


def test_single_text_unpadded_parity():
    ours = CLIPBPETokenizer(VOCAB, MERGES)
    hf = _hf_tokenizer()
    for t in _caption_battery()[:10]:
        assert ours.encode(t) == hf(t, truncation=True, max_length=77)[
            "input_ids"
        ], t


def test_vocab_structure_is_openai_order():
    """256 byte tokens, 256 </w> tokens, merges, then the 2 specials —
    so eos is the global max id (argmax pooling in the text tower
    depends on it) and pad == eos."""
    tok = load_default_tokenizer()
    assert tok.eos_id == tok.vocab_size - 1
    assert tok.bos_id == tok.vocab_size - 2
    assert tok.decoder[0] == "!"
    assert tok.decoder[256] == "!</w>"
    ids = tok(["A Street View photo in Norway."])
    # padded with eos; first eos is the sequence terminator
    assert ids.shape == (1, 77)
    assert ids[0, 0] == tok.bos_id
    assert (ids[0] == tok.eos_id).sum() >= 1
    assert int(ids[0].max()) == tok.eos_id


def test_default_tokenize_fn_prefers_bpe():
    fn = default_tokenize_fn()
    assert isinstance(fn, CLIPBPETokenizer)
    out = fn(["hello world", "another caption"])
    assert out.shape == (2, 77)
    assert out.dtype == np.int32


def test_learned_vocab_covers_caption_words_compactly():
    """Common caption words tokenize to few pieces (the point of
    learning merges from the caption corpus)."""
    tok = load_default_tokenizer()
    for word in ("street", "view", "photo", "norway", "climate"):
        pieces = tok.tokenize(word)
        assert len(pieces) <= 2, (word, pieces)


def test_vendored_assets_token_goldens():
    """Frozen token ids for fixed captions: the vendored vocab/merges are
    a model-facing contract (a pretrained text tower is bound to them) —
    regenerating the assets must be a deliberate act that updates these
    goldens (tools/build_clip_bpe.py + rerun this file's writer)."""
    import json

    golden_path = os.path.join(
        os.path.dirname(__file__), "goldens", "clip_bpe_goldens.json"
    )
    golden = json.load(open(golden_path))
    tok = load_default_tokenizer()
    assert tok.vocab_size == golden["vocab_size"]
    texts = [
        "A Street View photo in Norway.",
        "A Street View photo in the region of Oslo in the United States.",
        "This location has tropical rainforest climate.",
        "The photo was taken in December.",
    ]
    np.testing.assert_array_equal(tok(texts), np.asarray(golden["ids"]))


def test_decode_roundtrip():
    tok = load_default_tokenizer()
    # HF convention: punctuation decodes with a preceding space
    cases = {
        "a street view photo in norway.": "a street view photo in norway .",
        "hello world": "hello world",
        "unicode caf\u00e9": "unicode caf\u00e9",
    }
    for text, want in cases.items():
        assert tok.decode(tok.encode(text)) == want, text
