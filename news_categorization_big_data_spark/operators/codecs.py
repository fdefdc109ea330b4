"""REAL media codecs built on the Python standard library only.

The sandbox has no PIL/cv2/ffmpeg (imports attempted and documented in
SCALE.md), but three widely-used container formats are fully decodable
with stdlib primitives, because their specs are public and simple:

- **PNG** (RFC 2083 / ISO 15948): length-prefixed chunks; IHDR carries
  width/height/bit-depth/color-type, IDAT carries zlib-compressed
  scanlines with 5 possible per-row predictive filters. ``zlib`` +
  ``struct`` decode it exactly — these are real pixels from real PNG
  files, not a deterministic fake.
- **WAV** (RIFF): plain struct-packed header; ``wave`` in the stdlib
  parses channels/sample-rate/frame-count.
- **GIF89a** (the video/animation container): logical screen
  descriptor + color tables + per-frame variable-width LZW index
  streams — decoded below with a full growing-dictionary LZW.

These plug into the ``operators/multimodal.py`` stages (decode /
resize / feature-extract), replacing the fake codecs with real ones
for `image/png`, `audio/wav`, and `image/gif` (frame-sampling)
payloads while other mimes keep the documented stub-or-injected-codec
behavior. The encoder side writes
valid PNGs (filter 0, fixed zlib level) so round-trip tests need no
external fixtures.

Scale posture: codecs are pure ``bytes -> python`` functions executed
inside Arrow-batched ``mapInPandas`` workers (operators/multimodal.py);
nothing here touches the driver, and per-partition cost is linear in
payload bytes. ≙ reference parity: the reference pipeline has no media
path at all (it is text-only); this tier is part of the engine's
LLM-data-pipeline surface (SURVEY.md §2.13 / BASELINE.json north star).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: bytes-per-pixel for the color types this decoder supports at
#: bit-depth 8: greyscale, truecolor (RGB), greyscale+alpha, RGBA.
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from a PNG's IHDR — the decode-stage codec
    contract (operators/multimodal.py:Codec). Raises ValueError on
    non-PNG input, which the decode stage contains as ok=False."""
    if len(payload) < 24 or payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    length, ctype = struct.unpack(">I4s", payload[8:16])
    if ctype != b"IHDR" or length < 13:
        raise ValueError("PNG missing IHDR")
    width, height = struct.unpack(">II", payload[16:24])
    if not (0 < width and 0 < height):
        raise ValueError("invalid PNG dimensions")
    return width, height


def _paeth(a: int, b: int, c: int) -> int:
    """PNG filter-4 predictor (spec §6.6): closest of left/up/up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(payload: bytes) -> tuple[int, int, int, bytearray]:
    """Full PNG pixel decode: (width, height, channels, raw pixels).

    Supports the common subset: bit depth 8, color types 0/2/4/6, no
    interlace — which covers what the engine's own encoder and most
    tooling-produced thumbnails emit. The five per-scanline filters
    (None/Sub/Up/Average/Paeth) are all implemented per spec.
    """
    width, height = png_dims(payload)
    bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
        ">BBBBB", payload[24:29]
    )
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={bit_depth} color={color_type} "
            f"interlace={interlace}); supported: depth 8, types 0/2/4/6, "
            "no interlace"
        )
    channels = _CHANNELS[color_type]
    # Walk chunks, concatenating IDAT payloads (spec allows splitting).
    pos, idat = 8, bytearray()
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + CRC
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline data length mismatch")
    out = bytearray(stride * height)
    prev_row_start = -1
    for y in range(height):
        fpos = y * (stride + 1)
        filt = raw[fpos]
        line = raw[fpos + 1 : fpos + 1 + stride]
        o = y * stride
        if filt == 0:  # None
            out[o : o + stride] = line
        elif filt == 1:  # Sub
            for x in range(stride):
                left = out[o + x - channels] if x >= channels else 0
                out[o + x] = (line[x] + left) & 0xFF
        elif filt == 2:  # Up
            for x in range(stride):
                up = out[prev_row_start + x] if y else 0
                out[o + x] = (line[x] + up) & 0xFF
        elif filt == 3:  # Average
            for x in range(stride):
                left = out[o + x - channels] if x >= channels else 0
                up = out[prev_row_start + x] if y else 0
                out[o + x] = (line[x] + (left + up) // 2) & 0xFF
        elif filt == 4:  # Paeth
            for x in range(stride):
                left = out[o + x - channels] if x >= channels else 0
                up = out[prev_row_start + x] if y else 0
                ul = out[prev_row_start + x - channels] if (y and x >= channels) else 0
                out[o + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter {filt}")
        prev_row_start = o
    return width, height, channels, out


def png_encode(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal valid PNG writer (filter 0 rows, one IDAT): the
    fixture-free counterpart of png_decode for tests and the resize
    stage's re-encode. channels ∈ {1, 2, 3, 4} per _CHANNELS."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(pixels[y * stride : (y + 1) * stride])
        for y in range(height)
    )
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def png_resize(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Real image resize: decode → nearest-neighbor resample → re-encode.
    Matches the ResizeCodec contract (operators/multimodal.py:108)."""
    width, height, channels, pixels = png_decode(payload)
    if out_w <= 0 or out_h <= 0:
        raise ValueError("target dimensions must be positive")
    stride = width * channels
    out = bytearray(out_w * out_h * channels)
    for y in range(out_h):
        src_y = y * height // out_h
        row = src_y * stride
        o = y * out_w * channels
        for x in range(out_w):
            src_x = (x * width // out_w) * channels
            out[o : o + channels] = pixels[row + src_x : row + src_x + channels]
            o += channels
    return png_encode(out_w, out_h, channels, bytes(out))


#: Fixed feature width: per-channel mean/std for up to 4 channels.
PNG_FEATURE_DIM = 8


def png_features(payload: bytes) -> list[float]:
    """Real image features: per-channel mean and std over actual pixel
    values, zero-padded to PNG_FEATURE_DIM (FeatureCodec contract) —
    enough signal for the embedding dedup/ANN operators to exercise a
    real image path end-to-end."""
    _w, _h, channels, pixels = png_decode(payload)
    n = len(pixels) // channels
    feats: list[float] = []
    for c in range(channels):
        chan = pixels[c::channels]
        mean = sum(chan) / n
        var = sum((v - mean) ** 2 for v in chan) / n
        feats.extend([mean / 255.0, var**0.5 / 255.0])
    feats.extend(0.0 for _ in range(PNG_FEATURE_DIM - len(feats)))
    return feats[:PNG_FEATURE_DIM]


def wav_info(payload: bytes) -> tuple[int, int, int]:
    """Real audio metadata via stdlib ``wave``: (n_channels, sample_rate,
    n_frames). ValueError on non-WAV input (contained as ok=False)."""
    try:
        with wave.open(io.BytesIO(payload)) as w:
            return w.getnchannels(), w.getframerate(), w.getnframes()
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"not a WAV payload: {exc}") from None


def wav_dims(payload: bytes) -> tuple[int, int]:
    """WAV adapter for the decode-stage (w, h) Codec contract: width =
    sample rate, height = channels — typed metadata, same plumbing."""
    channels, rate, _frames = wav_info(payload)
    return rate, channels


# ---------------------------------------------------------------------------
# GIF89a (the video/animation container): pure-stdlib encode + decode
# ---------------------------------------------------------------------------
#
# GIF is the third public-and-simple container (after PNG and WAV) that
# needs nothing beyond ``struct`` and bit twiddling: a logical screen
# descriptor, a global color table, and per-frame LZW-compressed index
# streams in length-prefixed sub-blocks. The DECODER implements the full
# variable-width LZW (codes grow 3..12 bits, dictionary resets on clear)
# so it reads real-world non-interlaced GIFs; the ENCODER uses the
# classic "clear-code-per-literal" technique (emit a clear code after
# every pixel code so the dictionary never grows) — byte-inefficient
# but spec-valid, which is all a round-trip fixture needs.

GIF_MAGIC_89 = b"GIF89a"
GIF_MAGIC_87 = b"GIF87a"

#: Fixed 4-entry palette for encoded fixtures (min LZW code size 2).
GIF_PALETTE: tuple[tuple[int, int, int], ...] = (
    (0, 0, 0),
    (255, 0, 0),
    (0, 255, 0),
    (255, 255, 255),
)


def _lzw_encode_flat(indices: bytes, min_code: int) -> bytes:
    """LZW stream that keeps the dictionary empty: CLEAR after every
    literal, so code width stays min_code+1 throughout. Valid per the
    GIF spec (a decoder may receive CLEAR at any time)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
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
    for i in indices:
        emit(i)
        emit(clear)
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code: int) -> bytes:
    """Full variable-width GIF LZW decode (handles growing dictionaries
    from real encoders, not just this module's flat streams)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    nxt = end + 1
    out = bytearray()
    prev: bytes | None = None
    acc, nbits = 0, 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = {i: bytes([i]) for i in range(clear)}
                nxt, width, prev = end + 1, min_code + 1, None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code in table:
                entry = table[code]
                table[nxt] = prev + entry[:1]
                nxt += 1
            elif code == nxt:
                entry = prev + prev[:1]
                table[nxt] = entry
                nxt += 1
            else:
                raise ValueError("corrupt LZW stream")
            if prev is not None and nxt == (1 << width) and width < 12:
                width += 1
            out.extend(entry)
            prev = entry
    raise ValueError("LZW stream ended without END code")


def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes into GIF's ≤255-byte length-prefixed sub-blocks."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def gif_encode(width: int, height: int, frames: list[bytes]) -> bytes:
    """Animated GIF89a from per-frame palette-index buffers (each
    ``width*height`` bytes of indices < len(GIF_PALETTE))."""
    if not frames:
        raise ValueError("need at least one frame")
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame size mismatch")
        if any(i >= len(GIF_PALETTE) for i in f):
            raise ValueError("index out of palette")
    out = bytearray(GIF_MAGIC_89)
    # logical screen descriptor: GCT present, 2-bit color depth
    out += struct.pack("<HHBBB", width, height, 0x80 | 0x01, 0, 0)
    for r, g, b in GIF_PALETTE:
        out += bytes((r, g, b))
    min_code = 2
    for frame in frames:
        # graphic control extension (zero delay, no transparency)
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode_flat(frame, min_code))
    out += b"\x3b"
    return bytes(out)


def gif_decode(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int]], list[bytes]]:
    """(width, height, palette, frames) — frames are palette-index
    buffers. Raises ValueError on non-GIF, truncated, or interlaced
    input (the frame stage contains that as ok=False)."""
    if len(payload) < 13 or payload[:6] not in (GIF_MAGIC_89, GIF_MAGIC_87):
        raise ValueError("not a GIF payload")
    try:
        return _gif_decode_body(payload)
    except (IndexError, struct.error) as exc:  # ran off the end mid-block
        raise ValueError(f"truncated GIF: {exc}") from exc


def _gif_decode_body(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int]], list[bytes]]:
    width, height, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        for i in range(n):
            r, g, b = payload[pos + 3 * i : pos + 3 * i + 3]
            palette.append((r, g, b))
        pos += 3 * n
    frames: list[bytes] = []
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, fw, fh, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
            pos += 9
            if ipacked & 0x40:
                raise ValueError("interlaced GIF not supported")
            if ipacked & 0x80:  # local color table overrides
                n = 2 << (ipacked & 0x07)
                palette = [
                    tuple(payload[pos + 3 * i : pos + 3 * i + 3]) for i in range(n)
                ]
                pos += 3 * n
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            indices = _lzw_decode(bytes(data), min_code)
            if len(indices) != fw * fh:
                raise ValueError("frame pixel count mismatch")
            frames.append(indices)
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image frames")
    return width, height, palette, frames


def gif_frames_raw(payload: bytes) -> list[bytes]:
    """FrameCodec contract (operators/multimodal.py): GIF payload →
    list of per-frame palette-index buffers."""
    _w, _h, _palette, frames = gif_decode(payload)
    return frames
