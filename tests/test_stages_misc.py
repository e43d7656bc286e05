"""Chunk-stage and multimodal-stage plumbing tests."""

from __future__ import annotations

import pyarrow as pa
import pytest

from llm_food_ray.config import ChunkConfig
from llm_food_ray.stages.chunk import ChunkStage, chunk_dataset
from llm_food_ray.stages.multimodal import (
    FakeCodec,
    FrameSampleStage,
    MediaProbeStage,
    MediaResizeStage,
    RealCodec,
    media_probe_dataset,
)


def test_chunk_stage_flat_map(ray_session):
    from helpers import dataset_from_items

    ds = dataset_from_items([
        {"url": "u1", "markdown": " ".join(f"w{i}" for i in range(20))},
        {"url": "u2", "markdown": "short text"},
        {"url": "u3", "markdown": ""},
    ])
    cfg = ChunkConfig(strategy="token", chunk_size=8, chunk_overlap=0)
    out = chunk_dataset(ds, cfg).to_pandas()
    assert set(out["url"]) == {"u1", "u2"}            # empty doc → no chunks
    u1 = out[out["url"] == "u1"].sort_values("chunk_index")
    assert list(u1["chunk_index"]) == [0, 1, 2]
    assert u1["chunk_text"].iloc[0] == " ".join(f"w{i}" for i in range(8))
    assert (out["strategy"] == "token").all()


def test_chunk_stage_texts_column_joiner():
    # /be semantics: pages joined with "\n" before chunking (app.py:530)
    batch = pa.table({
        "url": ["u"],
        "texts": [[" ".join(f"a{i}" for i in range(6)),
                   " ".join(f"b{i}" for i in range(6))]],
    })
    cfg = ChunkConfig(strategy="token", chunk_size=12, chunk_overlap=0)
    out = ChunkStage(cfg, text_column="texts")(batch).to_pylist()
    assert len(out) == 1
    assert out[0]["chunk_text"].split() == [f"a{i}" for i in range(6)] + [f"b{i}" for i in range(6)]


def test_media_probe_deterministic_metadata(ray_session):
    from helpers import dataset_from_items

    ds = dataset_from_items([
        {"url": "png", "payload": b"\x89PNG\r\n" + b"x" * 100},
        {"url": "jpg", "payload": b"\xff\xd8\xff\xe0" + b"y" * 50},
        {"url": "wav", "payload": b"RIFF1234WAVEdata" + b"z" * 10},
        {"url": "mp4", "payload": b"\x00\x00\x00\x18ftypmp42" + b"q" * 30},
        {"url": "other", "payload": b"hello"},
    ])
    out = media_probe_dataset(ds).to_pandas().set_index("url")
    assert out.loc["png", "media_type"] == "image/png"
    assert out.loc["jpg", "media_type"] == "image/jpeg"
    assert out.loc["wav", "media_type"] == "audio/wav"
    assert out.loc["mp4", "media_type"] == "video/mp4"
    assert out.loc["other", "media_type"] == "application/octet-stream"
    n = int(out.loc["other", "n_bytes"])
    assert n == 5
    assert int(out.loc["other", "width"]) == 320 + (n % 320)
    assert int(out.loc["other", "height"]) == 240 + (n % 240)


def test_media_resize_fake_codec():
    batch = pa.table({"url": ["a"], "payload": [b"imagebytes"]})
    out = MediaResizeStage(64, 48)(batch).to_pylist()[0]
    assert len(out["resized"]) == 24          # 16-byte hash + 2×4-byte dims
    # deterministic
    again = MediaResizeStage(64, 48)(batch).to_pylist()[0]
    assert out["resized"] == again["resized"]


def test_real_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        RealCodec().probe(b"x")
    with pytest.raises(NotImplementedError):
        RealCodec().resize(b"x", 1, 1)


def test_frame_sampling_evenly_spaced():
    payload = b"v" * 100          # fake codec → n_frames = 100 % 32 = 4
    batch = pa.table({"url": ["v1"], "payload": [payload]})
    out = FrameSampleStage(2)(batch).to_pylist()
    n_frames = FakeCodec().probe(payload)["n_frames"]
    assert n_frames == 4
    assert [r["frame_index"] for r in out] == [0, 2]   # int(i*4/2)
    # zero-frame payloads produce no rows
    empty = FrameSampleStage(2)(pa.table({"url": ["e"], "payload": [b"v" * 32]}))
    assert empty.num_rows == 0


def test_media_feature_stage(ray_session):
    """Feature extraction through the codec seam: 16-bin nibble histogram
    (sums to ~1) + byte entropy, deterministic."""
    import math

    import pyarrow as pa

    from llm_food_ray.stages.multimodal import MediaFeatureStage
    from tests.helpers import dataset_from_items

    rows = [{"k": 0, "payload": b"\x00" * 64},
            {"k": 1, "payload": bytes(range(256))},
            {"k": 2, "payload": b""}]
    out = (dataset_from_items(rows)
           .map_batches(MediaFeatureStage(), batch_format="pyarrow")
           .to_pandas().set_index("k"))
    # uniform payload: all mass in one bin, zero entropy
    assert out.loc[0, "features"][0] == 1.0
    assert out.loc[0, "byte_entropy"] == 0.0
    # all 256 byte values once: uniform histogram, entropy 8 bits
    assert all(abs(v - 1 / 16) < 1e-9 for v in out.loc[1, "features"])
    assert math.isclose(out.loc[1, "byte_entropy"], 8.0)
    # empty payload: zero vector
    assert list(out.loc[2, "features"]) == [0.0] * 16
    # determinism
    out2 = (dataset_from_items(rows)
            .map_batches(MediaFeatureStage(), batch_format="pyarrow")
            .to_pandas().set_index("k"))
    assert (out["byte_entropy"] == out2["byte_entropy"]).all()


def test_media_profile_dedup_identical_histograms(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.dedup import dedup_exact

    import numpy as np
    import pyarrow as pa

    def profile(payload: bytes) -> str:
        arr = np.frombuffer(payload, np.uint8)
        counts = np.bincount(arr >> 4, minlength=16)
        return (str(len(payload)) + ":"
                + ":".join(str(int(c)) for c in counts))

    # 2 is a byte-permutation of 1 (same histogram, same length) and
    # 3 shares 1's nibble histogram at a DIFFERENT length; 4 sits in
    # another nibble bin entirely; 5 is empty
    rows = [
        {"doc_id": 1, "profile": profile(b"abcabc")},
        {"doc_id": 2, "profile": profile(b"ccbbaa")},
        {"doc_id": 3, "profile": profile(b"abc")},
        {"doc_id": 4, "profile": profile(b"ABCABC")},
        {"doc_id": 5, "profile": profile(b"")},
    ]
    kept = sorted(r["doc_id"] for r in
                  dedup_exact(dataset_from_items(rows),
                              "doc_id", "profile")
                  .select_columns(["doc_id"]).take_all())
    assert kept == [1, 3, 4, 5]


def test_dhash_local_edit_changes_only_its_row():
    from llm_food_ray.stages.multimodal import dhash64, fake_gray_grid

    base = "a" * 80
    # change chars inside segment 3 only (chars 30-39) — same length
    edited = base[:32] + "ZZZ" + base[35:]
    h1 = dhash64(fake_gray_grid(base))
    h2 = dhash64(fake_gray_grid(edited))
    diff = h1 ^ h2
    # only bits 24..31 (row 3) may differ
    assert diff != 0
    assert diff & ~(0xFF << 24) == 0


def test_dhash_gradient_bits():
    from llm_food_ray.stages.multimodal import dhash64

    # a grid of explicit hex rows: '01234567 8' ascending → all 8 bits
    asc = "012345678"
    desc = "987654321"
    h = dhash64([asc] * 8)
    assert h == (1 << 64) - 1
    assert dhash64([desc] * 8) == 0


def test_media_phash_pairs_recalls_retouch(ray_session):
    from helpers import dataset_from_items

    from llm_food_ray.stages.multimodal import media_phash_pairs

    texts = {i: f"asset {i} " + "payload " * 20 + f"tail {i}"
             for i in range(6)}
    rows = [{"doc_id": i, "text": t} for i, t in texts.items()]
    # planted retouch of asset 2: same length, head overwritten
    t2 = texts[2]
    rows.append({"doc_id": 100, "text": "x" * 10 + t2[10:]})
    out = (media_phash_pairs(dataset_from_items(rows), "doc_id", "text",
                             max_hamming=7)
           .to_pandas())
    pairs = set(zip(out["a"], out["b"]))
    assert (2, 100) in pairs
    ham = out.set_index(["a", "b"]).loc[(2, 100), "hamming"]
    assert 0 < ham <= 7   # head edit flips only row-0 gradient bits


def test_hash64_band_pairs_guards(ray_session):
    import pytest
    from helpers import dataset_from_items

    from llm_food_ray.stages.dedup import hash64_band_pairs

    ds = dataset_from_items([{"k": 1, "h": 0}])
    with pytest.raises(ValueError):
        hash64_band_pairs(ds, "k", "h", max_hamming=4, num_bands=4)
    with pytest.raises(ValueError):
        hash64_band_pairs(ds, "k", "h", max_hamming=2, num_bands=7)
