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
