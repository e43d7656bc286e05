"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages.

The container has no image/audio libraries (no PIL/ffmpeg), so the codec
boundary is explicit: ``MediaCodec`` is the pluggable decode seam.  The
default ``FakeCodec`` derives deterministic metadata from the payload
bytes (so the Ray-side plumbing — schema, batch size, actor signature,
output layout — is real and fully tested); ``RealCodec`` raises
``NotImplementedError`` until a codec library exists in the environment.

Stages:
- MediaProbeStage:   payload → (n_bytes, media_type, width, height,
                     duration_ms, n_frames) metadata columns
- MediaResizeStage:  decode → resize → re-encode (stubbed through the
                     codec seam; batch/actor plumbing real)
- FrameSampleStage:  video payload → one row per sampled frame
                     (deterministic evenly-spaced indices, mirroring the
                     reference's PDF page-sampling pattern,
                     llm_food/pdf_utils.py:33-38)

Sizing note (scale): media payloads are large — run these pools with
small ``batch_size`` (e.g. 8-32) and bounded ``concurrency`` so
batch_size × concurrency × payload fits the worker heap; blocks of
binary columns stay in Arrow (zero-copy) end to end.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


class MediaCodec:
    """Decode seam. Replace with a real implementation when codec
    libraries are available."""

    def probe(self, payload: bytes) -> dict:
        raise NotImplementedError

    def resize(self, payload: bytes, width: int, height: int) -> bytes:
        raise NotImplementedError


class RealCodec(MediaCodec):
    """STUB: requires PIL/ffmpeg, which this environment does not ship."""

    def probe(self, payload: bytes) -> dict:
        raise NotImplementedError("no codec libraries in this environment")

    def resize(self, payload: bytes, width: int, height: int) -> bytes:
        raise NotImplementedError("no codec libraries in this environment")


class FakeCodec(MediaCodec):
    """Deterministic metadata derived from payload bytes alone — keeps
    every downstream contract testable without a codec library."""

    def probe(self, payload: bytes) -> dict:
        n = len(payload)
        return {
            "n_bytes": n,
            "media_type": self.sniff(payload),
            "width": 320 + (n % 320),
            "height": 240 + (n % 240),
            "duration_ms": (n % 1000) * 40,
            "n_frames": n % 32,
        }

    def resize(self, payload: bytes, width: int, height: int) -> bytes:
        # deterministic fake: content hash + target dims
        h = hashlib.sha256(payload).digest()[:16]
        return h + width.to_bytes(4, "big") + height.to_bytes(4, "big")

    @staticmethod
    def sniff(payload: bytes) -> str:
        if payload.startswith(b"\x89PNG"):
            return "image/png"
        if payload.startswith(b"\xff\xd8\xff"):
            return "image/jpeg"
        if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
            return "audio/wav"
        if payload[4:8] == b"ftyp":
            return "video/mp4"
        return "application/octet-stream"


class MediaProbeStage:
    """Actor-pool stage: codec built once per actor in __init__."""

    META_FIELDS = ("n_bytes", "media_type", "width", "height",
                   "duration_ms", "n_frames")

    def __init__(self, payload_column: str = "payload",
                 codec: MediaCodec | None = None):
        self.payload_column = payload_column
        self.codec = codec or FakeCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [p or b"" for p in batch.column(self.payload_column).to_pylist()]
        metas = [self.codec.probe(p) for p in payloads]
        out = batch
        for f in self.META_FIELDS:
            typ = pa.string() if f == "media_type" else pa.int64()
            out = out.append_column(f, pa.array([m[f] for m in metas], typ))
        return out


class MediaFeatureStage:
    """Actor-pool feature extraction: payload → fixed-width numeric
    feature vector through the codec seam.  FakeCodec emits a
    deterministic 16-bin byte-nibble histogram (L1-normalized) plus a
    byte-entropy scalar, so the downstream contract — a dense
    ``list<float>`` feature column feeding the similarity/dedup stages —
    is real and tested; a real codec would put decoded-image embeddings
    here."""

    def __init__(self, payload_column: str = "payload",
                 codec: MediaCodec | None = None):
        self.payload_column = payload_column
        self.codec = codec or FakeCodec()

    @staticmethod
    def _features(payload: bytes) -> tuple[list[float], float]:
        import math

        n = len(payload)
        if n == 0:
            return [0.0] * 16, 0.0
        counts = [0] * 16
        byte_counts: dict[int, int] = {}
        for b in payload:
            counts[b >> 4] += 1
            byte_counts[b] = byte_counts.get(b, 0) + 1
        hist = [round(c / n, 6) for c in counts]
        ent = -sum((c / n) * math.log2(c / n) for c in byte_counts.values())
        return hist, round(ent, 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [p or b"" for p in batch.column(self.payload_column).to_pylist()]
        feats = [self._features(p) for p in payloads]
        return batch.append_column(
            "features", pa.array([f[0] for f in feats], pa.list_(pa.float64()))
        ).append_column(
            "byte_entropy", pa.array([f[1] for f in feats], pa.float64())
        )


class MediaResizeStage:
    def __init__(self, width: int, height: int,
                 payload_column: str = "payload",
                 codec: MediaCodec | None = None):
        self.width = width
        self.height = height
        self.payload_column = payload_column
        self.codec = codec or FakeCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = [p or b"" for p in batch.column(self.payload_column).to_pylist()]
        resized = [self.codec.resize(p, self.width, self.height) for p in payloads]
        return batch.append_column("resized", pa.array(resized, pa.binary()))


class FrameSampleStage:
    """Flat-map: one output row per sampled frame; evenly-spaced indices
    ``int(i * n_frames / n_samples)`` (same deterministic rule as the PDF
    classifier's page sampling, llm_food/pdf_utils.py:33-38)."""

    def __init__(self, n_samples: int, key_column: str = "url",
                 payload_column: str = "payload",
                 codec: MediaCodec | None = None):
        self.n_samples = n_samples
        self.key_column = key_column
        self.payload_column = payload_column
        self.codec = codec or FakeCodec()

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_column).to_pylist()
        payloads = [p or b"" for p in batch.column(self.payload_column).to_pylist()]
        out_key, out_frame = [], []
        for k, p in zip(keys, payloads):
            n_frames = self.codec.probe(p)["n_frames"]
            if n_frames <= 0:
                continue
            n = min(self.n_samples, n_frames)
            for idx in sorted({int(i * n_frames / n) for i in range(n)}):
                out_key.append(k)
                out_frame.append(idx)
        return pa.Table.from_arrays(
            [pa.array(out_key), pa.array(out_frame, pa.int64())],
            names=[self.key_column, "frame_index"],
        )


def media_probe_dataset(ds, payload_column: str = "payload", *,
                        concurrency=None, batch_size: int = 32):
    """Probe stage as an actor pool (small batches: binary payloads)."""
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        return ds.map_batches(
            MediaProbeStage, fn_constructor_kwargs={"payload_column": payload_column},
            concurrency=concurrency, **kwargs,
        )
    return ds.map_batches(MediaProbeStage(payload_column), **kwargs)


def fake_gray_grid(text: str, rows: int = 8, cols: int = 9) -> list:
    """Codec-seam fake decode → a deterministic ``rows × cols``
    "grayscale" grid: the payload (decoded text) splits into ``rows``
    equal character segments and row *r*'s pixels are the first
    ``cols`` hex digits of ``md5(segment_r)``.  A REAL codec would
    produce this grid by decoding + downscaling the image (the dHash
    preprocessing step); the fake preserves the property the hash
    needs — LOCAL payload edits change LOCAL pixel rows — while
    staying reproducible in SQL (substr + md5)."""
    s = text or ""
    n = len(s)
    grid = []
    for r in range(rows):
        seg = s[(r * n) // rows:((r + 1) * n) // rows]
        h = hashlib.md5(seg.encode("utf-8")).hexdigest()
        grid.append(h[:cols])
    return grid


def dhash64(grid) -> int:
    """Difference hash (dHash) over an 8×9 grid — the REAL perceptual
    hash math: bit ``r·8 + c`` set iff ``grid[r][c] < grid[r][c+1]``
    (horizontal gradient sign).  Hex-digit pixels compare as
    characters — '0'-'9' < 'a'-'f' in ASCII, so the char compare IS
    the numeric compare (and the SQL twin's substr comparison)."""
    h = 0
    for r, row in enumerate(grid):
        for c in range(8):
            if row[c] < row[c + 1]:
                h |= 1 << (r * 8 + c)
    return h


def media_phash_pairs(ds, key_column: str = "doc_id",
                      text_column: str = "text", *,
                      max_hamming: int = 7):
    """Perceptual-hash near-dup pairs over media assets: dHash-style
    64-bit signature per asset (8 pixel rows × 8 horizontal-gradient
    bits via :func:`fake_gray_grid` + :func:`dhash64`), then the shared
    banded-Hamming plan :func:`stages.dedup.hash64_band_pairs` with
    8×8-bit bands — pigeonhole-exact for hamming ≤ 7, so the operator
    EQUALS the brute-force "all pairs within 7 bits" rule (re-encoded /
    lightly-retouched asset detection, the near-dup sibling of
    ``media_dedup``'s exact profile rule).

    Band/structure alignment: one pixel row = one 8-bit band, so an
    edit confined to k payload segments flips at most k bands —
    single-segment retouches are always recalled.  At real media
    scale, raise the signature width / band width (8-bit bands bucket
    n/256 assets per band value; the banding knob is
    ``hash64_band_pairs(num_bands=…)``) — documented, not silent.
    → (a, b, hamming), a < b by key."""
    import numpy as np

    from .dedup import hash64_band_pairs

    def sign(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_column).to_pylist()
        sigs = np.fromiter(
            (dhash64(fake_gray_grid(t)) for t in texts),
            dtype=np.uint64, count=len(texts))
        return pa.table({key_column: batch.column(key_column),
                         "phash": pa.array(sigs)})

    signed = ds.map_batches(sign, batch_format="pyarrow")
    return hash64_band_pairs(signed, key_column, "phash",
                             max_hamming=max_hamming, num_bands=8)
