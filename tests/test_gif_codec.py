"""GIF89a codec (operators/codecs.py): exact round-trips, general
LZW decode against an independent growing-dictionary encoder, and the
frame-sampling stage over real container bytes."""

from __future__ import annotations

import random
import struct

import pytest

from news_categorization_big_data_spark.operators.codecs import (
    GIF_PALETTE,
    _lzw_decode,
    gif_decode,
    gif_encode,
    gif_frames_raw,
)


def test_gif_roundtrip_exact_many_shapes():
    rng = random.Random(7)
    for _ in range(25):
        w, h, k = rng.randint(1, 40), rng.randint(1, 30), rng.randint(1, 6)
        frames = [
            bytes(rng.randrange(len(GIF_PALETTE)) for _ in range(w * h))
            for _ in range(k)
        ]
        payload = gif_encode(w, h, frames)
        dw, dh, palette, decoded = gif_decode(payload)
        assert (dw, dh) == (w, h)
        assert decoded == frames
        assert tuple(palette[: len(GIF_PALETTE)]) == GIF_PALETTE
        assert gif_frames_raw(payload) == frames


def _real_lzw_encode(indices: bytes, min_code: int) -> bytes:
    """Independent textbook LZW with a GROWING dictionary — the stream
    shape real-world GIF encoders emit, which the flat fixture encoder
    never produces. Validates the decoder's variable-width path."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table = {bytes([i]): i for i in range(clear)}
    nxt = end + 1
    out, acc, nbits = bytearray(), 0, 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    buf = b""
    for i in indices:
        cand = buf + bytes([i])
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = nxt
        nxt += 1
        if nxt - 1 == (1 << width) and width < 12:
            width += 1
        buf = bytes([i])
    if buf:
        emit(table[buf])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_decode_handles_growing_dictionaries():
    rng = random.Random(3)
    for _ in range(15):
        data = bytes(rng.randrange(4) for _ in range(rng.randint(1, 4000)))
        assert _lzw_decode(_real_lzw_encode(data, 2), 2) == data


def test_gif_decode_rejects_garbage_and_interlace():
    with pytest.raises(ValueError):
        gif_decode(b"not a gif at all")
    payload = bytearray(gif_encode(4, 3, [bytes(12)]))
    # flip the interlace bit in the image descriptor's packed byte
    idx = payload.index(0x2C, 13)
    packed_pos = idx + 9
    assert payload[packed_pos] == 0
    payload[packed_pos] = 0x40
    with pytest.raises(ValueError, match="interlaced"):
        gif_decode(bytes(payload))
    # truncated LZW stream
    with pytest.raises(ValueError):
        gif_decode(gif_encode(4, 3, [bytes(12)])[:-6] + b"\x00\x3b")


def test_gif_header_fields_are_spec_shaped():
    payload = gif_encode(5, 7, [bytes(35), bytes(35)])
    assert payload[:6] == b"GIF89a"
    w, h = struct.unpack("<HH", payload[6:10])
    assert (w, h) == (5, 7)
    assert payload[-1] == 0x3B
    # two image descriptors, one per frame
    assert payload.count(b"\x2c\x00\x00\x00\x00") == 2


def test_sample_frames_stage_over_real_gifs(spark):
    import pandas as pd  # noqa: F401

    from news_categorization_big_data_spark.operators.multimodal import (
        sample_frames,
    )

    rows = []
    for d in range(8):
        w, h, k = d % 5 + 1, d % 3 + 1, d % 4 + 1
        frames = [bytes((d + fi) % 4 for _ in range(w * h)) for fi in range(k)]
        rows.append((d, gif_encode(w, h, frames)))
    # one corrupted payload: containment, not task failure
    rows.append((99, b"\x00corrupt"))
    packed = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = sample_frames(packed, codec=gif_frames_raw).collect()
    good = [r for r in got if r["ok"]]
    bad = [r for r in got if not r["ok"]]
    assert len(bad) == 1 and bad[0]["doc_id"] == 99 and bad[0]["frame_idx"] == -1
    by_doc = {}
    for r in good:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, frames in by_doc.items():
        assert sorted(r["frame_idx"] for r in frames) == list(
            range(d % 4 + 1)
        )
        assert all(
            len(r["frame"]) == (d % 5 + 1) * (d % 3 + 1) for r in frames
        )
