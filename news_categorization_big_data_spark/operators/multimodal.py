"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column next to typed metadata (mime, byte length, content
hash, width/height/duration …), keep ALL relational work on the metadata
(pruning/joins/dedup never touch bytes), and decode only at the edge via
Arrow-batched ``mapInPandas`` — the single place Python touches data.

The decode codecs themselves are STUBS here (no image/audio libs in this
environment): ``decode_image_batch`` raises ``NotImplementedError``
unless given a codec, and ``fake_codec`` provides a deterministic stand-
in so the Spark-side plumbing — schema, batch shape, partition behavior
— is fully real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the decode stage (DDL, mapInPandas contract).
DECODED_SCHEMA = "doc_id long, mime string, n_bytes int, width int, height int, ok boolean"

Codec = Callable[[bytes], tuple[int, int]]


def pack_payload(df: DataFrame, id_col: str, text_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Build the canonical multimodal row: (id, payload binary, metadata).

    Text stands in for real media bytes in the testdata; the schema and
    all downstream plumbing are identical for real payloads.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
        F.md5(F.col(text_col)).alias("content_hash"),
    )


def fake_codec(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in decoder: 'dimensions' derived from content
    bytes. Replace with PIL/cv2/ffmpeg in a real deployment."""
    if not payload:
        raise ValueError("empty payload")
    return (len(payload) % 640 + 1, payload[0] % 480 + 1)


def decode_batches(codec: Codec | None):
    """mapInPandas decode stage: Arrow-batched, per-partition codec reuse,
    row-level error containment (ok=False rows instead of task failure —
    the reference's fallback semantics, news_categorization_streaming
    .py:98-104, applied to media decode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec is None:
            raise NotImplementedError(
                "no media codec available in this environment; pass a codec "
                "(e.g. PIL-based) or use fake_codec for plumbing tests"
            )
        for batch in batches:
            # The codec call is inherently per-payload (opaque bytes in,
            # dimensions out); everything else — the bookkeeping columns —
            # passes through as whole Arrow arrays, no iterrows/per-row
            # Series construction.
            dims = []
            for payload in batch["payload"]:
                try:
                    width, height = codec(bytes(payload))
                    dims.append((width, height, True))
                except Exception:
                    dims.append((0, 0, False))
            width, height, ok = (
                map(list, zip(*dims)) if dims else ([], [], [])
            )
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(),
                    "mime": batch["mime"].to_numpy(),
                    "n_bytes": batch["n_bytes"].to_numpy().astype("int32"),
                    "width": pd.array(width, dtype="int32"),
                    "height": pd.array(height, dtype="int32"),
                    "ok": pd.array(ok, dtype="bool"),
                }
            )

    return run


def decode_payloads(packed: DataFrame, codec: Codec | None = None) -> DataFrame:
    """Run the decode stage over packed payload rows."""
    return packed.mapInPandas(decode_batches(codec), DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# resize / frame-sample / feature-extract — same plumbing pattern as decode:
# Arrow-batched mapInPandas, per-row codec with error containment, typed
# metadata out. Codecs are stubs (no media libs here); the deterministic
# fakes keep schema/batch/partition behavior fully testable.
# ---------------------------------------------------------------------------

#: (payload, target_w, target_h) → resized payload bytes.
ResizeCodec = Callable[[bytes, int, int], bytes]

#: payload → list of frame payloads (video → frames).
FrameCodec = Callable[[bytes], list[bytes]]

#: payload → fixed-dim feature vector.
FeatureCodec = Callable[[bytes], list[float]]

RESIZED_SCHEMA = "doc_id long, payload binary, width int, height int, ok boolean"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame binary, ok boolean"
FEATURES_SCHEMA = "doc_id long, feature array<float>, ok boolean"

#: Feature-vector width of the fake extractor (matches the testdata
#: embeddings table's layout conventions, not its 64-dim size).
FAKE_FEATURE_DIM = 8


def fake_resize_codec(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in: truncate/pad payload to w*h bytes."""
    if not payload:
        raise ValueError("empty payload")
    target = max(w * h, 1)
    return (payload * (target // len(payload) + 1))[:target]


def fake_frame_codec(payload: bytes) -> list[bytes]:
    """Deterministic stand-in: split payload into ≤4 'frames'."""
    if not payload:
        raise ValueError("empty payload")
    n = min(4, len(payload))
    step = len(payload) // n
    return [payload[i * step : (i + 1) * step] for i in range(n)]


def fake_feature_codec(payload: bytes) -> list[float]:
    """Deterministic stand-in: byte-histogram moments as a unit-free vec."""
    if not payload:
        raise ValueError("empty payload")
    return [float(payload[i % len(payload)] % 97) / 97.0 for i in range(FAKE_FEATURE_DIM)]


def resize_payloads(
    packed: DataFrame, width: int, height: int, codec: ResizeCodec | None = None
) -> DataFrame:
    """Resize stage: (doc_id, payload, width, height, ok). Failed rows
    keep a null payload with ok=False — containment, not task failure."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec is None:
            raise NotImplementedError("no resize codec; use fake_resize_codec for tests")
        for batch in batches:
            payloads, oks = [], []
            for payload in batch["payload"]:
                try:
                    payloads.append(codec(bytes(payload), width, height))
                    oks.append(True)
                except Exception:
                    payloads.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(),
                    "payload": payloads,
                    "width": pd.array([width] * len(batch), dtype="int32"),
                    "height": pd.array([height] * len(batch), dtype="int32"),
                    "ok": pd.array(oks, dtype="bool"),
                }
            )

    return packed.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(packed: DataFrame, codec: FrameCodec | None = None) -> DataFrame:
    """Frame-sampling stage: one output row per extracted frame (the
    set-returning mapInPandas shape — a batch in, a longer batch out).
    Failed rows emit a single (frame_idx=-1, ok=False) marker row so
    provenance survives."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec is None:
            raise NotImplementedError("no frame codec; use fake_frame_codec for tests")
        for batch in batches:
            ids, idxs, frames, oks = [], [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                try:
                    for i, frame in enumerate(codec(bytes(payload))):
                        ids.append(doc_id), idxs.append(i), frames.append(frame), oks.append(True)
                except Exception:
                    ids.append(doc_id), idxs.append(-1), frames.append(None), oks.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                    "ok": pd.array(oks, dtype="bool"),
                }
            )

    return packed.mapInPandas(run, FRAMES_SCHEMA)


def extract_features(packed: DataFrame, codec: FeatureCodec | None = None) -> DataFrame:
    """Feature-extraction stage: payload → array<float> embedding column,
    ready for the similarity/ANN operators (operators/similarity.py)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if codec is None:
            raise NotImplementedError("no feature codec; use fake_feature_codec for tests")
        for batch in batches:
            feats, oks = [], []
            for payload in batch["payload"]:
                try:
                    feats.append([float(v) for v in codec(bytes(payload))])
                    oks.append(True)
                except Exception:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].to_numpy(),
                    "feature": feats,
                    "ok": pd.array(oks, dtype="bool"),
                }
            )

    return packed.mapInPandas(run, FEATURES_SCHEMA)
