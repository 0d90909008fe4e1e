"""Multimodal (image/audio/video) column plumbing (X6).

Media are opaque ``binary`` columns with a typed metadata struct — the
Spark-side contract (schema, partitioning, Arrow batch shape) is real
and tested. All three declared kinds have REAL reference decoders for
public formats parseable without codec libraries: P6 PPM and — round
9 — PNG images (chunk parse + stdlib zlib inflate + full scanline
un-filtering: gray/RGB/RGBA/palette, all five filter types),
uncompressed 24/32-bit BMP, TIFF (II/MM; strip + tiled layouts;
chunky + separate planes; none/LZW/PackBits compression with the
horizontal-differencing predictor — rounds 10-11), and GIF87a/89a
(full variable-width LZW
decode + 4-pass interlace reordering, first frame + round-10 GCE
animation compositing), RIFF/WAV
16-bit PCM audio, YUV4MPEG2 raw video. Baseline JPEG decodes for
real too (round 9, :mod:`._jpeg` — Huffman + dequant + vectorized
IDCT + 4:2:0 upsampling, pinned against CPython's independently
encoded test JPEG), round 10 added PROGRESSIVE JPEG (SOF2 —
spectral selection + successive approximation, pinned bit-exact
against the baseline decode of the same coefficients), and round 11
added LOSSLESS JPEG (SOF3 — Annex H predictors 1-7, point transform,
2-16-bit precision, round-trip-exact against a test-side spec
encoder) plus 12-bit extended-sequential DCT (SOF1), which decodes
for real. Round 12 added CCITT GROUP 4 bilevel TIFF (compression 4,
ITU-T T.6 via :mod:`._ccitt` — the scanned-document corpus
encoding); only psychoacoustic/video codecs (MP3/H.264) and the
remaining exotic JPEG modes (arithmetic-coded, 12-bit progressive,
hierarchical) fall back to the clearly-marked deterministic stub,
the one piece that changes on a real cluster (final per-format
disposition: SURVEY.md §2.10 codec stub ledger).

Scale design: media rows are huge, so the pipeline uses
``mapInPandas`` (Arrow batches, bounded memory via
spark.sql.execution.arrow.maxRecordsPerBatch) and keeps metadata-only
operations (filter by width/duration, partition routing) on pruned
columns so Parquet never materializes the payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", LongType()),
        StructField("meta_format", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", LongType()),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """STUB — real image/audio decode is unavailable in this container.

    Deterministic fake: 8 floats derived from payload bytes, so tests
    can assert the full pipeline (schema, batching, ordering) without
    codec libraries. Replace with PIL/torchaudio/ffmpeg on a real
    cluster; everything around it is production plumbing.
    """
    if payload is None:
        raise NotImplementedError("media decode requires codec libs; payload missing")
    h = 1469598103934665603
    for b in payload[:64]:
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return [float((h >> (8 * i)) & 0xFF) / 255.0 for i in range(8)]


def decode_ppm_image(payload: bytes) -> list[float]:
    """REAL decoder for binary PPM (P6) images — a public uncompressed
    format parseable without codec libraries, used to interface-test the
    decoder slot-in end to end. Returns the 8-float feature contract:
    [mean_r, mean_g, mean_b, std_intensity, width/4096, height/4096,
    aspect/8, 1.0] (color stats normalized to [0, 1])."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: "P6\n<width> <height>\n<maxval>\n" then raw RGB bytes.
    # Tokenize up to 4 header fields, skipping '#' comment lines.
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        tokens.append(payload[start:i])
    width, height, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        # spec-valid but 2-bytes-per-sample; decoding it as uint8 would
        # produce silent garbage — refuse (sniffing_decoder falls back)
        raise ValueError(f"16-bit PPM (maxval={maxval}) unsupported")
    px = np.frombuffer(payload[i + 1 : i + 1 + width * height * 3], dtype=np.uint8)
    rgb = px.reshape(height, width, 3).astype(np.float64) / maxval
    return [
        float(rgb[..., 0].mean()),
        float(rgb[..., 1].mean()),
        float(rgb[..., 2].mean()),
        float(rgb.mean(axis=2).std()),
        width / 4096.0,
        height / 4096.0,
        (width / height) / 8.0,
        1.0,
    ]


def _ulaw_to_linear16(codes):
    """G.711 mu-law decode, vectorized from the spec formula (no
    table files): 8-bit code -> int16. Bias 0x84 (132), 3-bit segment
    exponent, 4-bit mantissa, ones-complemented on the wire."""
    import numpy as np

    u = (~np.asarray(codes, dtype=np.uint8)).astype(np.int64) & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    t = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -t, t).astype(np.int16)


def _alaw_to_linear16(codes):
    """G.711 A-law decode, vectorized from the spec formula: 8-bit
    code -> int16. Even bits inverted on the wire (XOR 0x55); segment
    0 is linear, segments 1-7 place an implicit leading 1; the A-law
    sign bit is 1 for POSITIVE values (opposite of mu-law's
    complemented convention) — pinned against stdlib audioop over all
    256 codes in tests."""
    import numpy as np

    a = (np.asarray(codes, dtype=np.uint8).astype(np.int64)) ^ 0x55
    sign = (a & 0x80) != 0
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    t = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1))
    return np.where(sign, t, -t).astype(np.int16)


def _parse_wav_chunks(payload: bytes):
    """Manual RIFF/WAVE chunk walk for the formats stdlib ``wave``
    rejects: returns (fmt_code, channels, rate, bits, data bytes).
    Chunks are little-endian sized and word-aligned."""
    if not (payload.startswith(b"RIFF") and payload[8:12] == b"WAVE"):
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt " and len(body) >= 16:
            fmt = (
                int.from_bytes(body[0:2], "little"),
                int.from_bytes(body[2:4], "little"),
                int.from_bytes(body[4:8], "little"),
                int.from_bytes(body[14:16], "little"),
            )
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    code, nch, rate, bits = fmt
    if nch < 1 or rate < 1:
        raise ValueError("WAV: invalid fmt fields")
    return code, nch, rate, bits, data


def _parse_aiff(payload: bytes):
    """AIFF (EA IFF 85 / Apple AIFF 1.3 — public spec) parse: COMM
    (channels, frames, bits, 80-bit extended-float rate) + SSND
    big-endian PCM. Returns (samples int64 (n, nch), rate, bits).
    AIFF-C is accepted only with compression 'NONE' (anything else —
    sowt/ima4/ulaw variants — raises so the sniffer falls back rather
    than mis-decoding byte order). Chunks are big-endian sized and
    word-aligned."""
    import numpy as np

    if not (payload.startswith(b"FORM") and payload[8:12] in (b"AIFF", b"AIFC")):
        raise ValueError("not an AIFF payload")
    is_aifc = payload[8:12] == b"AIFC"
    pos, comm, ssnd = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = int.from_bytes(payload[pos + 4:pos + 8], "big")
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND" and len(body) >= 8:
            off = int.from_bytes(body[0:4], "big")
            ssnd = body[8 + off:]
        pos += 8 + sz + (sz & 1)
    if comm is None or ssnd is None or len(comm) < 18:
        raise ValueError("AIFF: missing COMM/SSND chunk")
    nch = int.from_bytes(comm[0:2], "big")
    nframes = int.from_bytes(comm[2:6], "big")
    bits = int.from_bytes(comm[6:8], "big")
    # 80-bit IEEE 754 extended: 1 sign + 15 exponent + 64 mantissa
    # (explicit integer bit); value = mant * 2^(exp - 16383 - 63)
    se = int.from_bytes(comm[8:10], "big")
    mant = int.from_bytes(comm[10:18], "big")
    exp = se & 0x7FFF
    # any real sample rate has an exponent within a few dozen of the
    # bias; the range guard keeps the float conversion from raising
    # OverflowError (a non-contractual exception type) on corrupt COMM
    if mant == 0 or not 16000 <= exp <= 16500:
        raise ValueError("AIFF: invalid sample rate")
    rate = int(round(mant * 2.0 ** (exp - 16383 - 63)))
    if se & 0x8000 or rate < 1 or nch < 1:
        raise ValueError("AIFF: invalid COMM fields")
    if is_aifc and comm[18:22] != b"NONE":
        raise ValueError("AIFF-C: compressed variants unsupported")
    if bits not in (8, 16, 24):
        raise ValueError(f"AIFF: {bits}-bit PCM unsupported")
    bw = bits // 8
    n = min(nframes * nch, len(ssnd) // bw)
    raw = np.frombuffer(ssnd, dtype=np.uint8, count=n * bw).reshape(n, bw)
    val = np.zeros(n, dtype=np.int64)
    for b in range(bw):  # big-endian bytes, MSB first
        val = (val << 8) | raw[:, b].astype(np.int64)
    val = np.where(val >= (1 << (bits - 1)), val - (1 << bits), val)
    n_frames_eff = n // nch
    return val[: n_frames_eff * nch].reshape(-1, nch), rate, bits


def _audio_samples(payload: bytes):
    """Shared PCM parse for the audio family (round 10): sniff RIFF/WAV
    (stdlib ``wave``, 16-bit PCM), FLAC (:mod:`._flac`, any supported
    depth), AIFF/AIFF-C-NONE big-endian PCM (round 11), or G.711
    mu-law/A-law RIFF payloads (round 11, format codes 7/6 — the
    telephony-corpus codecs, decoded from the spec formulas) and
    return (x, rate) with x an (n, channels) float64 array normalized
    to [-1, 1). Raises on anything else — callers keep their own
    NULL-degradation contracts."""
    import io
    import wave

    import numpy as np

    if payload.startswith(b"fLaC"):
        from ._flac import decode_flac_pcm

        samples, rate, bps = decode_flac_pcm(payload)
        return samples.astype(np.float64) / float(1 << (bps - 1)), rate
    if payload.startswith(b"FORM"):
        samples, rate, bits = _parse_aiff(payload)
        return samples.astype(np.float64) / float(1 << (bits - 1)), rate
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(
                    f"only 16-bit PCM supported (got {8 * w.getsampwidth()}-bit)"
                )
            rate, nframes, nch = (
                w.getframerate(), w.getnframes(), w.getnchannels()
            )
            samples = np.frombuffer(w.readframes(nframes), dtype=np.int16)
    except wave.Error:
        # stdlib wave only reads PCM; walk the chunks ourselves for
        # the G.711 companded formats
        code, nch, rate, bits, raw = _parse_wav_chunks(payload)
        if code == 7 and bits == 8:
            samples = _ulaw_to_linear16(np.frombuffer(raw, dtype=np.uint8))
        elif code == 6 and bits == 8:
            samples = _alaw_to_linear16(np.frombuffer(raw, dtype=np.uint8))
        else:
            raise ValueError(f"WAV: format code {code}/{bits}-bit unsupported")
        samples = samples[: (len(samples) // nch) * nch]
    return samples.astype(np.float64).reshape(-1, nch) / 32768.0, rate


def decode_wav_audio(payload: bytes) -> list[float]:
    """REAL decoder for RIFF/WAV 16-bit PCM — stdlib-parseable, same
    interface-test role as :func:`decode_ppm_image`. Round 10: also
    accepts FLAC payloads through the shared :func:`_audio_samples`
    parse (lossless, so a FLAC of the same samples produces the
    IDENTICAL feature vector — the cross-codec audio near-dup case).
    Round 11: AIFF big-endian PCM (16-bit AIFF of the same samples is
    feature-identical to the WAV — the endianness twin) and G.711
    mu-law/A-law RIFF payloads through the same shared parse.
    Features: [mean_abs, rms, zero_cross_rate, peak, rate/96k,
    seconds/600, channels/8, 1.0]."""
    import numpy as np

    xs, rate = _audio_samples(payload)
    nframes, nch = xs.shape
    x = xs.reshape(-1)  # feature stats are over the interleaved stream
    zc = float(np.mean(np.abs(np.diff(np.signbit(x)))) if x.size > 1 else 0.0)
    return [
        float(np.mean(np.abs(x))),
        float(np.sqrt(np.mean(x * x))),
        zc,
        float(np.max(np.abs(x)) if x.size else 0.0),
        rate / 96000.0,
        (nframes / rate) / 600.0 if rate else 0.0,
        nch / 8.0,
        1.0,
    ]



_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass —
# PNG spec 8.2; each pass is an independently-filtered reduced image.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, width: int, height: int, channels: int,
                  sample_bytes: int = 1, pos: int = 0):
    """Reverse the per-scanline PNG filters (spec 9, filter method 0:
    None/Sub/Up/Average/Paeth) on one (sub-)image of ``width`` x
    ``height`` pixels starting at byte ``pos`` of the inflated stream
    — filtering operates on BYTES, so 16-bit samples just widen the
    pixel to ``channels * sample_bytes`` filter bytes (spec 9.2).
    Returns ((height, width, channels * sample_bytes) uint8 array,
    next stream position) so Adam7 decodes can chain the seven passes.
    Pure numpy: each row is one vectorized pass except Sub/Paeth's
    intra-row prefix dependency, which is a per-pixel-column loop
    bounded by the row WIDTH — decode cost stays O(pixels), no
    Python-per-byte work across rows."""
    import numpy as np

    stride = width * channels * sample_bytes
    if len(raw) - pos < height * (stride + 1):
        raise ValueError("PNG: truncated inflated stream")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels * sample_bytes  # filter distance in bytes (spec 9.2)
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                # int() avoids numpy's uint8-overflow warning; the sum
                # is modular by spec
                row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF
        elif ftype == 2:  # Up
            row = (row.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(row[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (int(row[i]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = row
    return out.reshape(height, width, channels * sample_bytes), pos


def _png_rgb(payload: bytes):
    """REAL decoder for PNG (RFC 2083 / ISO 15948 — public): chunk
    parse + stdlib zlib inflate + scanline un-filtering, no codec
    libraries. Closes most of the "compressed codecs are stubbed" gap
    for images: the container's own DEFLATE compression is handled by
    the stdlib, so only transform-coded formats (JPEG/MP3/MP4) remain
    stub-backed. Returns the shared 8-float feature contract
    ([mean_r, mean_g, mean_b, std_intensity, w/4096, h/4096,
    aspect/8, 1.0] — identical to :func:`decode_ppm_image`, pinned by
    a same-pixels cross-decoder test).

    Supported: bit depths 1/2/4 (round 11 — packed MSB-first samples,
    gray or palette, filter distance one byte per spec 9.2, exact
    255/(2^d-1) gray expansion), 8 and 16 (16-bit reduces to 8 by high
    byte — the probe contract is 8-bit features), color types 0
    (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), both
    non-interlaced and Adam7-interlaced (round 10: seven
    independently-filtered reduced images on the spec 8.2 pass grid;
    sub-byte passes unfilter at their own byte strides)."""
    import struct
    import zlib

    import numpy as np

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # skip CRC; integrity is the reader's gate upstream
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: no IHDR")
    if bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"PNG: bit depth {bit_depth} unsupported")
    if interlace not in (0, 1):
        raise ValueError(f"PNG: interlace method {interlace} unknown")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"PNG: color type {color_type} unsupported")
    if bit_depth == 16 and color_type == 3:
        raise ValueError("PNG: 16-bit palette images are illegal")
    if bit_depth < 8 and color_type not in (0, 3):
        raise ValueError("PNG: sub-8-bit depth is gray/palette only")
    raw = zlib.decompress(bytes(idat))
    if bit_depth < 8:
        # packed sub-byte samples (round 11): filtering operates on the
        # PACKED bytes with a filter distance of one byte (spec 9.2),
        # so each (sub-)image unfilters at its byte stride and then
        # unpacks MSB-first into one sample per pixel. Gray scales by
        # the exact expansion 255/(2^d - 1) (an integer for d=1/2/4);
        # palette indices are used as-is.
        def _unpack(sub_bytes, pw):
            a = sub_bytes[..., 0]
            bits_ = np.unpackbits(a, axis=1)
            if bit_depth == 1:
                vals = bits_
            else:
                g = bits_.reshape(a.shape[0], -1, bit_depth)
                weights = 1 << np.arange(bit_depth - 1, -1, -1)
                vals = (g * weights).sum(axis=2)
            return vals[:, :pw][..., None].astype(np.uint8)

        if interlace == 0:
            wb = (width * bit_depth + 7) // 8
            pxb, _ = _png_unfilter(raw, wb, height, 1, 1)
            px = _unpack(pxb, width)
        else:
            px = np.zeros((height, width, 1), dtype=np.uint8)
            pos2 = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = (width - x0 + dx - 1) // dx
                ph = (height - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue
                wb = (pw * bit_depth + 7) // 8
                sub, pos2 = _png_unfilter(raw, wb, ph, 1, 1, pos2)
                px[y0::dy, x0::dx] = _unpack(sub, pw)
        if color_type == 0:
            px = (px.astype(np.uint16) * (255 // ((1 << bit_depth) - 1))
                  ).astype(np.uint8)
        sb = 1
    else:
        sb = bit_depth // 8
        if interlace == 0:
            px, _ = _png_unfilter(raw, width, height, channels, sb)
        else:
            # Adam7 (round 10): seven independently-filtered reduced
            # images, scattered back on the pass grid; empty passes (a
            # dimension rounds to zero) contribute no bytes at all.
            px = np.zeros((height, width, channels * sb), dtype=np.uint8)
            pos2 = 0
            for x0, y0, dx, dy in _ADAM7:
                pw = (width - x0 + dx - 1) // dx
                ph = (height - y0 + dy - 1) // dy
                if pw <= 0 or ph <= 0:
                    continue
                sub, pos2 = _png_unfilter(raw, pw, ph, channels, sb, pos2)
                px[y0::dy, x0::dx] = sub
    if sb == 2:
        # 16-bit samples are big-endian; the feature/signature probe
        # reduces to 8-bit by the high byte (floor(v / 257) differs by
        # at most 1 LSB — the probe contract is 8-bit features)
        px = px.reshape(px.shape[0], px.shape[1], channels, 2)[..., 0]
    if color_type == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        rgb = plte[px[..., 0]]
    elif color_type == 0:
        rgb = np.repeat(px, 3, axis=2)
    elif color_type == 4:
        rgb = np.repeat(px[..., :1], 3, axis=2)  # drop alpha
    elif color_type == 6:
        rgb = px[..., :3]  # drop alpha
    else:  # color_type == 2
        rgb = px
    return rgb.astype(np.float64)


def decode_png_image(payload: bytes) -> list[float]:
    """Feature projection of :func:`_png_rgb` — shared 8-float
    contract (see the top of the decoder family)."""
    rgb = _png_rgb(payload) / 255.0
    height, width = rgb.shape[0], rgb.shape[1]
    return [
        float(rgb[..., 0].mean()),
        float(rgb[..., 1].mean()),
        float(rgb[..., 2].mean()),
        float(rgb.mean(axis=2).std()),
        width / 4096.0,
        height / 4096.0,
        (width / height) / 8.0,
        1.0,
    ]



def _bmp_rle_indices(payload, data_offset, width, height, rle4):
    """Decode a BI_RLE8/BI_RLE4 stream into an (height, width) palette
    index grid in FILE row order (bottom-up; caller flips). Escapes
    per the public DIB spec: (n>0, v) = run of n pixels (RLE4
    alternates v's high/low nibbles); (0,0) = end of line; (0,1) = end
    of bitmap; (0,2,dx,dy) = delta; (0,n>=3) = absolute mode (n literal
    pixels, storage word-aligned). Unwritten pixels stay index 0."""
    import numpy as np

    idx = np.zeros((height, width), dtype=np.uint8)
    pos = data_offset
    x = y = 0
    end = len(payload)
    while pos + 2 <= end:
        c, v = payload[pos], payload[pos + 1]
        pos += 2
        if c > 0:  # encoded run
            if y >= height:
                raise ValueError("BMP: RLE run outside image")
            n = min(c, width - x)
            if rle4:
                pair = np.array([v >> 4, v & 0x0F], dtype=np.uint8)
                idx[y, x:x + n] = np.tile(pair, (c + 1) // 2 + 1)[:n]
            else:
                idx[y, x:x + n] = v
            x += n
        elif v == 0:  # end of line
            x, y = 0, y + 1
        elif v == 1:  # end of bitmap
            return idx
        elif v == 2:  # delta
            if pos + 2 > end:
                raise ValueError("BMP: truncated RLE delta")
            x += payload[pos]
            y += payload[pos + 1]
            pos += 2
            if x > width or y > height:
                raise ValueError("BMP: RLE delta outside image")
        else:  # absolute mode: v literal pixels, word-aligned storage
            if y >= height:
                raise ValueError("BMP: RLE absolute run outside image")
            nbytes = (v + 1) // 2 if rle4 else v
            nbytes += nbytes & 1  # pad to 16-bit boundary
            raw = payload[pos:pos + nbytes]
            if len(raw) != nbytes:
                raise ValueError("BMP: truncated RLE absolute run")
            pos += nbytes
            if rle4:
                a = np.frombuffer(raw, dtype=np.uint8)
                vals = np.empty(a.size * 2, dtype=np.uint8)
                vals[0::2] = a >> 4
                vals[1::2] = a & 0x0F
                vals = vals[:v]
            else:
                vals = np.frombuffer(raw, dtype=np.uint8)[:v]
            n = min(v, width - x)
            idx[y, x:x + n] = vals[:n]
            x += n
    raise ValueError("BMP: RLE stream missing end-of-bitmap")


def _bmp_rgb(payload: bytes):
    """REAL decoder for BMP (Windows DIB, public): 24/32-bit BI_RGB,
    32-bit BI_BITFIELDS with byte-aligned channel masks (the
    BITMAPV4/V5 form every screenshot tool emits), 8-bit palette, and
    — round 11 — BI_RLE8/BI_RLE4 run-length palette images (run,
    absolute, end-of-line, delta and end-of-bitmap escapes; skipped
    pixels read as palette index 0, matching the common
    implementations' zero-fill of the undefined-by-spec gaps) — fixed
    headers, BGR(A) samples, 4-byte row padding, bottom-up (or
    top-down via negative height; RLE is bottom-up only per spec) row
    order. Same 8-float feature contract as
    :func:`decode_ppm_image`/:func:`decode_png_image` (cross-pinned on
    identical pixels). 1/2/4-bit uncompressed, 16-bit, and
    non-byte-aligned masks raise; ``sniffing_decoder`` falls back to
    the stub."""
    import struct

    import numpy as np

    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    if len(payload) < 54:
        raise ValueError("BMP: truncated header")
    data_offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"BMP: core header (size {hdr_size}) unsupported")
    width, height = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    compression = struct.unpack("<I", payload[30:34])[0]
    clr_used = struct.unpack("<I", payload[46:50])[0]

    def _palette():
        n = clr_used or (1 << bpp)
        raw = payload[14 + hdr_size:14 + hdr_size + 4 * n]
        if len(raw) != 4 * n:
            raise ValueError("BMP: truncated color table")
        # BGRA entries -> RGB table, padded to full index range
        tbl = np.zeros((1 << bpp, 3), dtype=np.uint8)
        ent = np.frombuffer(raw, dtype=np.uint8).reshape(n, 4)
        tbl[:n] = ent[:, [2, 1, 0]]
        return tbl

    if compression in (1, 2):  # BI_RLE8 / BI_RLE4
        if (compression == 1) != (bpp == 8) or (compression == 2) != (bpp == 4):
            raise ValueError("BMP: RLE compression/bit-depth mismatch")
        if height < 0:
            raise ValueError("BMP: top-down RLE is illegal")
        idx = _bmp_rle_indices(
            payload, data_offset, width, height, rle4=compression == 2
        )
        return _palette()[idx[::-1]].astype(np.float64)

    chan_order = "bgr"  # BI_RGB little-endian sample order
    if compression == 3:
        # BI_BITFIELDS (V4/V5 headers carry RGB masks right after the
        # 40-byte core). Accept the byte-aligned masks only; anything
        # else would need bit gymnastics a feature probe doesn't owe.
        if bpp != 32 or hdr_size < 52:
            raise ValueError("BMP: bitfields only supported for 32-bit V4/V5")
        masks = struct.unpack("<III", payload[54:66])
        shifts = []
        for m in masks:
            if m not in (0xFF, 0xFF00, 0xFF0000, 0xFF000000):
                raise ValueError(f"BMP: non-byte-aligned mask 0x{m:08x}")
            shifts.append((m.bit_length() - 8) // 8)  # byte index of channel
        chan_order = shifts  # byte index per R,G,B
    elif compression != 0:
        raise ValueError(f"BMP: compression {compression} unsupported")
    if bpp == 8:  # uncompressed palette (round 11)
        top_down = height < 0
        height = abs(height)
        stride = (width + 3) & ~3
        if len(payload) < data_offset + stride * height:
            raise ValueError("BMP: truncated pixel data")
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * height, offset=data_offset
        ).reshape(height, stride)[:, :width]
        if not top_down:
            rows = rows[::-1]
        return _palette()[rows].astype(np.float64)
    if bpp not in (24, 32):
        raise ValueError(f"BMP: {bpp}-bit unsupported")
    top_down = height < 0
    height = abs(height)
    nbytes = bpp // 8
    stride = (width * nbytes + 3) & ~3  # rows pad to 4 bytes
    need = data_offset + stride * height
    if len(payload) < need:
        raise ValueError("BMP: truncated pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)[:, : width * nbytes].reshape(height, width, nbytes)
    if not top_down:
        rows = rows[::-1]
    if chan_order == "bgr":
        rgb = rows[..., :3][..., ::-1].astype(np.float64)
    else:
        r_i, g_i, b_i = chan_order
        rgb = np.dstack(
            [rows[..., r_i], rows[..., g_i], rows[..., b_i]]
        ).astype(np.float64)
    return rgb


def decode_bmp_image(payload: bytes) -> list[float]:
    """Feature projection of :func:`_bmp_rgb` — shared 8-float
    contract."""
    rgb = _bmp_rgb(payload) / 255.0
    height, width = rgb.shape[0], rgb.shape[1]
    return [
        float(rgb[..., 0].mean()),
        float(rgb[..., 1].mean()),
        float(rgb[..., 2].mean()),
        float(rgb.mean(axis=2).std()),
        width / 4096.0,
        height / 4096.0,
        (width / height) / 8.0,
        1.0,
    ]



def _tiff_lzw_decode(data: bytes) -> bytes:
    """TIFF-flavor LZW (TIFF 6.0 spec section 13, public): MSB-first
    bit packing, ClearCode 256 / EOI 257, first table entry 258,
    9->12-bit variable width with the spec's EARLY code-width change.
    Width timing derived from the spec's normative encoder rule
    ("when NextCode equals 511 begin writing 10-bit codes"): the
    encoder's emission k is 10-bit from k=254 on, and the decoder's
    table lags the encoder's by exactly one entry, so the decoder
    switches after ITS NextCode reaches 510/1022/2046 — i.e. at
    (1 << width) - 2. A legacy "late change" writer (the historical
    interop wart this boundary is famous for) would desync exactly one
    code after a width boundary and surface as a bad-code ValueError,
    never silent mis-decode."""
    out = bytearray()
    bitpos, nbits = 0, len(data) * 8
    CLEAR, EOI = 256, 257

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return EOI  # spec: strips may end without an explicit EOI
        v = 0
        for _ in range(width):
            v = (v << 1) | ((data[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        return v

    table: list[bytes] | None = None
    width = 9
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == EOI:
            break
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width, prev = 9, None
            continue
        if table is None:
            raise ValueError("TIFF: LZW stream must begin with a clear code")
        if prev is None:
            if code >= 256:
                raise ValueError(f"TIFF: bad first LZW code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"TIFF: bad LZW code {code}")
        out += entry
        prev = entry
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        if len(table) > 4095:
            raise ValueError("TIFF: LZW table overflow (missing clear)")
    return bytes(out)


def _tiff_unpackbits(strip: bytes) -> bytearray:
    """PackBits RLE (TIFF 6.0 spec section 9)."""
    data = bytearray()
    i = 0
    while i < len(strip):
        n = strip[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            data.extend(strip[i:i + n + 1])
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            data.extend(strip[i:i + 1] * (257 - n))
            i += 1
        # n == 128: no-op per spec
    return data


def _tiff_jpeg_rgb(payload, tags, e, width, height, photometric,
                   planar, predictor, depth, tiled):
    """New-style JPEG-in-TIFF decode (TIFF Technical Note 2): every
    strip/tile is its own SOI..EOI JPEG; when tag 347 (JPEGTables)
    exists its DQT/DHT payload (an abbreviated SOI..EOI stream) is
    spliced after each segment's SOI so abbreviated streams decode
    with the shared tables. Reuses :mod:`._jpeg` wholesale — the
    segment geometry comes from each JPEG's own SOF, pasted at the
    strip/tile origin and cropped to the image."""
    import numpy as np

    from ._jpeg import decode_jpeg_rgb

    if photometric not in (0, 1, 6):
        raise ValueError(
            f"TIFF: photometric {photometric} with JPEG compression unsupported"
        )
    if planar != 1 or predictor != 1 or depth != 8:
        raise ValueError("TIFF: JPEG compression needs 8-bit chunky, no predictor")
    tables = bytes(tags[347]) if 347 in tags else b""
    if tables and (
        not tables.startswith(b"\xff\xd8") or not tables.endswith(b"\xff\xd9")
    ):
        raise ValueError("TIFF: malformed JPEGTables")

    def seg_rgb(off: int, cnt: int) -> "np.ndarray":
        seg = payload[off:off + cnt]
        if len(seg) != cnt:
            raise ValueError("TIFF: truncated strip/tile")
        if not seg.startswith(b"\xff\xd8"):
            raise ValueError("TIFF: JPEG strip without SOI")
        if tables:
            seg = b"\xff\xd8" + tables[2:-2] + seg[2:]
        arr = decode_jpeg_rgb(seg) * 255.0
        return np.rint(arr).astype(np.uint8)

    img = np.zeros((height, width, 3), dtype=np.uint8)
    if tiled:
        tw = tags.get(322, [None])[0]
        th = tags.get(323, [None])[0]
        offsets, counts = tags.get(324), tags.get(325)
        if not tw or not th or not offsets or not counts:
            raise ValueError("TIFF: missing tile layout")
        ta = -(-width // tw)
        for t in range(len(offsets)):
            arr = seg_rgb(offsets[t], counts[t])
            ty, tx = divmod(t, ta)
            y0, x0 = ty * th, tx * tw
            ys = min(arr.shape[0], height - y0)
            xs = min(arr.shape[1], width - x0)
            if ys <= 0 or xs <= 0:
                raise ValueError("TIFF: tile outside image")
            img[y0:y0 + ys, x0:x0 + xs] = arr[:ys, :xs]
    else:
        offsets, counts = tags.get(273), tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: missing strip layout")
        rps = tags.get(278, [height])[0]
        if rps == 0 or rps == 0xFFFFFFFF:
            rps = height
        for s in range(len(offsets)):
            arr = seg_rgb(offsets[s], counts[s])
            y0 = s * rps
            ys = min(arr.shape[0], height - y0)
            xs = min(arr.shape[1], width)
            if ys <= 0:
                raise ValueError("TIFF: strip outside image")
            img[y0:y0 + ys, :xs] = arr[:ys, :xs]
    if photometric in (0, 1):
        g = img[..., 0]
        if photometric == 0:  # WhiteIsZero
            g = 255 - g
        img = np.repeat(g[..., None], 3, axis=2)
    return img.astype(np.float64)


def _tiff_g4_rgb(payload, tags, width, height, photometric, bits, spp,
                 planar, predictor):
    """CCITT Group 4 strips/tiles -> the shared RGB float contract
    (round 12). Each strip/tile is an independently-coded T.6 block
    (TIFF 6.0 section 11); FillOrder 2 streams are bit-reversed before
    decode; T6Options uncompressed mode (tag 293 bit 1) raises to the
    stub boundary, as do G4 files that are not plain 1-bit bilevel.
    Ink bits map through PhotometricInterpretation: 0 (WhiteIsZero,
    the fax convention) displays ink as black; 1 inverts."""
    import numpy as np

    from ._ccitt import g4_decode, reverse_fill_order

    if bits != [1] or spp != 1:
        raise ValueError("TIFF: G4 requires 1-bit single-sample data")
    if photometric not in (0, 1):
        raise ValueError("TIFF: G4 photometric must be bilevel (0/1)")
    if planar != 1:
        raise ValueError("TIFF: G4 with separate planes unsupported")
    if predictor != 1:
        raise ValueError("TIFF: G4 with a predictor unsupported")
    if tags.get(293, [0])[0] & 2:
        raise ValueError("TIFF: G4 uncompressed mode unsupported")
    fill = tags.get(266, [1])[0]
    if fill not in (1, 2):
        raise ValueError("TIFF: reserved FillOrder")

    def block(off, cnt, w, r):
        seg = payload[off:off + cnt]
        if len(seg) != cnt:
            raise ValueError("TIFF: truncated strip/tile")
        if fill == 2:
            seg = reverse_fill_order(seg)
        return g4_decode(seg, w, r)

    ink = np.zeros((height, width), dtype=np.uint8)
    if 322 in tags or 323 in tags:
        if 322 not in tags or 323 not in tags:
            raise ValueError("TIFF: incomplete tile geometry")
        tw, th = tags[322][0], tags[323][0]
        if tw <= 0 or th <= 0:
            raise ValueError("TIFF: non-positive tile geometry")
        offsets, counts = tags.get(324), tags.get(325)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: missing tile layout")
        ta, td = -(-width // tw), -(-height // th)
        if len(offsets) != ta * td:
            raise ValueError("TIFF: tile count mismatch")
        for t in range(len(offsets)):
            tile = block(offsets[t], counts[t], tw, th)
            ty, tx = divmod(t, ta)
            y0, x0 = ty * th, tx * tw
            ys, xs = min(th, height - y0), min(tw, width - x0)
            ink[y0:y0 + ys, x0:x0 + xs] = tile[:ys, :xs]
    else:
        offsets, counts = tags.get(273), tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: missing strip layout")
        rps = tags.get(278, [height])[0]
        if rps <= 0 or len(offsets) != -(-height // rps):
            raise ValueError("TIFF: strip count mismatch")
        for s in range(len(offsets)):
            y0 = s * rps
            r = min(rps, height - y0)
            ink[y0:y0 + r] = block(offsets[s], counts[s], width, r)
    g = (255 - ink * 255) if photometric == 0 else ink * 255
    return np.repeat(g[..., None], 3, axis=2).astype(np.float64)



def _tiff_rgb(payload: bytes):
    """REAL decoder for TIFF (TIFF 6.0, public spec): both byte orders
    (II little / MM big), first IFD, 8- and 16-bit gray
    (PhotometricInterpretation 0/1, including 0's inverted scale) and
    RGB(A) (16-bit reduces to the high byte after un-differencing —
    the PNG16 probe contract), strip AND tile layouts (round 11),
    chunky (planar 1) AND separate-plane (planar 2, round 11)
    configurations, Compression 1 (none), 5 (LZW, spec section 13 —
    round 11), 8/32946 (zlib deflate — round 11), 32773 (PackBits RLE,
    spec section 9), and the horizontal-differencing Predictor (tag
    317 value 2, spec section 14 — round 11), which real LZW/deflate
    writers almost always pair with. Scanned-document corpora are
    TIFF-heavy, which is why the format earns a real decoder (round
    10). Palette-color (photometric 3, 8-bit indices, the ColorMap's
    16-bit values reduced v>>8) decodes for real too (round 11), and
    so does new-style JPEG-in-TIFF (compression 7 incl. shared
    JPEGTables — :func:`_tiff_jpeg_rgb`, round 11) and CCITT GROUP 4
    bilevel (compression 4, T.6 — :func:`_tiff_g4_rgb`, round 12);
    old-style JPEG (compression 6) tag-soup forms, G3, and other
    depths raise so :func:`sniffing_decoder` falls back to the stub
    (the PPM-maxval rule)."""
    import struct

    import numpy as np

    if payload.startswith(b"II*\x00"):
        e = "<"
    elif payload.startswith(b"MM\x00*"):
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack(e + "I", payload[4:8])
    (n_entries,) = struct.unpack(e + "H", payload[ifd_off:ifd_off + 2])
    # type -> (byte size, struct code) for the value kinds we read
    # (7 = UNDEFINED raw bytes — carries tag 347 JPEGTables)
    sizes = {1: (1, "B"), 3: (2, "H"), 4: (4, "I"), 7: (1, "B")}
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ = struct.unpack(e + "HH", payload[off:off + 4])
        (count,) = struct.unpack(e + "I", payload[off + 4:off + 8])
        if typ not in sizes:
            continue  # rationals etc. — not needed for the baseline set
        sz, code = sizes[typ]
        total = sz * count
        # bound BEFORE building the count-sized format string: a
        # corrupted 32-bit count would otherwise allocate a GB-scale
        # struct format (round-11 fuzz finding — decoder bomb, not
        # just a bad decode)
        if count > len(payload):
            raise ValueError("TIFF: tag count overruns payload")
        if total <= 4:
            raw = payload[off + 8:off + 8 + total]
        else:
            (voff,) = struct.unpack(e + "I", payload[off + 8:off + 12])
            raw = payload[voff:voff + total]
        if len(raw) != total:
            raise ValueError("TIFF: tag value overruns payload")
        tags[tag] = list(struct.unpack(e + code * count, raw))

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF: missing required tag {tag}")
            return default
        return v[0]

    width, height = one(256), one(257)
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    planar = one(284, 1)
    predictor = one(317, 1)
    if compression == 4:
        # CCITT Group 4 (T.6) bilevel — the scanned-document corpus
        # encoding (round 12, from-spec _ccitt module); G3
        # (compressions 2/3) stays an honest raise below.
        return _tiff_g4_rgb(
            payload, tags, width, height, photometric, bits, spp, planar,
            predictor,
        )
    if compression in (2, 3):
        # CCITT G3 (1D MH / T.4 2D) — deliberately stubbed: archival
        # fax corpora are overwhelmingly G4 (SURVEY §2.10 ledger);
        # raise with the honest reason instead of the bits message
        raise ValueError(
            f"TIFF: CCITT G3 (compression {compression}) unsupported"
        )
    if len(set(bits)) != 1 or bits[0] not in (8, 16):
        raise ValueError(f"TIFF: only uniform 8/16-bit samples (got {bits})")
    depth = bits[0]
    sw = depth // 8  # bytes per sample
    if planar not in (1, 2):
        raise ValueError(f"TIFF: reserved planar configuration {planar}")
    if compression in (6, 7):
        # JPEG-in-TIFF (round 11). Compression 7 is the TechNote-2
        # new-style form: each strip/tile an SOI..EOI JPEG stream,
        # optionally abbreviated with shared tables in tag 347
        # (JPEGTables). Compression 6 is the deprecated old-style
        # form whose tag soup (JPEGProc/JPEGQTables/...) this decoder
        # does NOT interpret — but the dominant surviving old-style
        # files (early libtiff) store one self-contained JFIF stream
        # per strip, which _tiff_jpeg_rgb verifies by requiring SOI at
        # every segment start; anything else raises to the stub
        # rather than mis-decoding. The JPEG stream self-describes
        # depth/sampling, so the honest envelope is: 8-bit, chunky, no
        # predictor, photometric grayscale (0/1) or YCbCr (6 — the
        # JFIF transform decode_jpeg_rgb already applies). Photometric
        # 2 (RGB-coded JPEG) raises: the stream would still look
        # 3-component and silently get the YCbCr matrix (the
        # PPM-maxval rule).
        if compression == 6 and 347 in tags:
            raise ValueError("TIFF: old-style JPEG with JPEGTables unsupported")
        return _tiff_jpeg_rgb(
            payload, tags, e, width, height, photometric, planar,
            predictor, depth, tiled=322 in tags or 323 in tags,
        )
    if compression not in (1, 5, 8, 32946, 32773):
        raise ValueError(f"TIFF: compression {compression} unsupported")
    if photometric not in (0, 1, 2, 3):
        raise ValueError(f"TIFF: photometric {photometric} unsupported")
    if predictor not in (1, 2):
        raise ValueError(f"TIFF: predictor {predictor} unsupported")
    colormap = None
    if photometric == 3:  # palette-color (spec: ColorMap is REQUIRED)
        cm = tags.get(320)
        if depth != 8 or spp != 1:
            raise ValueError("TIFF: only 8-bit single-sample palettes")
        if not cm or len(cm) != 3 * (1 << depth):
            raise ValueError("TIFF: palette image without a valid ColorMap")
        # ColorMap values are 16-bit (0 = black, 65535 = white); reduce
        # to the 8-bit probe contract like every other 16-bit sample
        colormap = (
            np.array(cm, dtype=np.uint32).reshape(3, 1 << depth).T >> 8
        ).astype(np.uint8)

    def segment(off: int, cnt: int) -> bytes:
        seg = payload[off:off + cnt]
        if len(seg) != cnt:
            raise ValueError("TIFF: truncated strip/tile")
        if compression == 1:
            return seg
        if compression == 5:
            return _tiff_lzw_decode(seg)
        if compression in (8, 32946):  # Adobe / old-style deflate
            import zlib

            try:
                return zlib.decompress(seg)
            except zlib.error as exc:
                raise ValueError(f"TIFF: bad deflate stream ({exc})") from None
        return bytes(_tiff_unpackbits(seg))

    def grid(raw: bytes, rows: int, cols: int):
        # raw segment bytes -> (rows, cols, ch) at the probe's 8-bit
        # contract: 16-bit samples follow the file byte order and
        # reduce to their high byte AFTER un-differencing (same
        # reduction the PNG16 path uses)
        a = np.frombuffer(raw, dtype=np.uint8 if sw == 1 else e + "u2")
        a = a.reshape(rows, cols, ch)
        if predictor == 2:
            # Predictor 2 (spec section 14): horizontal differencing
            # per scanline per channel at the SAMPLE width; decode =
            # cumulative sum mod 2^depth. Rows restart, so applying
            # per assembled segment is exact.
            a = (a.astype(np.uint64).cumsum(axis=1) % (1 << depth)).astype(
                np.uint16 if sw == 2 else np.uint8
            )
        return (a >> 8).astype(np.uint8) if sw == 2 else a

    nplanes = spp if planar == 2 else 1
    ch = 1 if planar == 2 else spp
    tiled = 322 in tags or 323 in tags
    if tiled:
        tw, th = one(322), one(323)
        offsets, counts = tags.get(324), tags.get(325)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: missing tile layout")
        ta, td = -(-width // tw), -(-height // th)
        per_plane = ta * td
        if len(offsets) != per_plane * nplanes:
            raise ValueError("TIFF: tile count mismatch")
        planes = []
        for p in range(nplanes):
            img = np.zeros((height, width, ch), dtype=np.uint8)
            for t in range(per_plane):
                seg = segment(
                    offsets[p * per_plane + t], counts[p * per_plane + t]
                )
                need = tw * th * ch * sw
                if len(seg) < need:
                    raise ValueError("TIFF: tile short of declared geometry")
                tile = grid(seg[:need], th, tw)
                ty, tx = divmod(t, ta)
                y0, x0 = ty * th, tx * tw
                ys, xs = min(th, height - y0), min(tw, width - x0)
                img[y0:y0 + ys, x0:x0 + xs] = tile[:ys, :xs]
            planes.append(img)
    else:
        offsets, counts = tags.get(273), tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF: missing strip layout")
        per_plane = len(offsets) // nplanes
        if per_plane * nplanes != len(offsets):
            raise ValueError("TIFF: strip count not divisible by planes")
        planes = []
        for p in range(nplanes):
            data = bytearray()
            for s in range(per_plane):
                data.extend(
                    segment(offsets[p * per_plane + s],
                            counts[p * per_plane + s])
                )
            need = width * height * ch * sw
            if len(data) < need:
                raise ValueError("TIFF: pixel data short of declared geometry")
            planes.append(grid(bytes(data[:need]), height, width))
    px = planes[0] if nplanes == 1 else np.concatenate(planes, axis=2)
    if photometric == 2:
        if spp < 3:
            raise ValueError("TIFF: RGB photometric with <3 samples")
        rgb = px[..., :3]  # extra samples (alpha) dropped
    elif photometric == 3:
        rgb = colormap[px[..., 0]]
    else:
        g = px[..., 0]
        if photometric == 0:  # WhiteIsZero: inverted grayscale
            g = 255 - g
        rgb = np.repeat(g[..., None], 3, axis=2)
    return rgb.astype(np.float64)


def decode_tiff_image(payload: bytes) -> list[float]:
    """Feature projection of :func:`_tiff_rgb` — shared 8-float
    contract."""
    rgb = _tiff_rgb(payload) / 255.0
    height, width = rgb.shape[0], rgb.shape[1]
    return [
        float(rgb[..., 0].mean()),
        float(rgb[..., 1].mean()),
        float(rgb[..., 2].mean()),
        float(rgb.mean(axis=2).std()),
        width / 4096.0,
        height / 4096.0,
        (width / height) / 8.0,
        1.0,
    ]


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """GIF-flavor LZW (GIF89a spec appendix F, public): variable-width
    LSB-first codes 3..12 bits with CLEAR/END control codes. Pure
    Python per-code loop — decode cost is O(pixels); acceptable for
    the slot-in decoder role (a production cluster swaps in a native
    codec; this is the reference implementation the plumbing tests
    ride on)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError(f"GIF: bad LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table.append(prev + [entry[0]])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out[:n_pixels]


def _gif_rgb(payload: bytes):
    """REAL decoder for GIF87a/89a (public spec): logical-screen parse,
    global/local color tables, extension-block skipping, full LZW
    decompression (:func:`_gif_lzw_decode`) and Adam-style 4-pass
    interlace reordering. FIRST frame only, rect-sized — the feature
    contract is per-image; ANIMATION rides :func:`_gif_frames`
    (round 10: GCE compositing with transparency + disposal), which
    :func:`frame_sample` uses to explode animated GIFs into the image
    pipeline. Same 8-float contract as the other image decoders,
    cross-pinned on identical pixels in pytest."""
    import numpy as np

    if not (payload.startswith(b"GIF87a") or payload.startswith(b"GIF89a")):
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _left, _top, idx, ct, pos = _gif_image_block(payload, pos, gct)
            return ct[idx].astype(np.float64)
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
    raise ValueError(f"GIF: no image data (screen {sw}x{sh})")


def _gif_image_block(payload: bytes, pos: int, gct):
    """Parse ONE image descriptor (block 0x2C) at ``pos``: rect
    geometry, local color table, LZW decode, interlace reorder.
    Returns (left, top, idx HxW int array, color table, next pos) —
    shared by the first-frame decoder and the animation walk."""
    import numpy as np

    left = int.from_bytes(payload[pos + 1:pos + 3], "little")
    top = int.from_bytes(payload[pos + 3:pos + 5], "little")
    w = int.from_bytes(payload[pos + 5:pos + 7], "little")
    h = int.from_bytes(payload[pos + 7:pos + 9], "little")
    ipacked = payload[pos + 9]
    interlaced = bool(ipacked & 0x40)
    pos += 10
    ct = gct
    if ipacked & 0x80:
        n = 2 ** ((ipacked & 0x07) + 1)
        ct = np.frombuffer(
            payload, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    if ct is None:
        raise ValueError("GIF: no color table")
    min_code = payload[pos]
    pos += 1
    lzw = bytearray()
    while payload[pos] != 0:
        ln = payload[pos]
        lzw += payload[pos + 1:pos + 1 + ln]
        pos += 1 + ln
    pos += 1
    idx = np.array(
        _gif_lzw_decode(bytes(lzw), min_code, w * h), dtype=np.int32
    ).reshape(h, w)
    if interlaced:
        de = np.empty_like(idx)
        rows = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        de[rows] = idx
        idx = de
    return left, top, idx, ct, pos


def _gif_frames(payload: bytes):
    """Animated-GIF frame walk (round 10, GIF89a spec + the GCE
    animation model): yields each frame COMPOSITED onto the logical
    screen — sub-rect placement, transparency holes (transparent-index
    pixels leave the underlying canvas), and disposal methods 0/1
    (leave), 2 (restore rect to background color), 3 (restore rect to
    the pre-draw canvas). The canvas starts as the background color
    (GCT's background index) or black without a GCT. Returns a list of
    (sh, sw, 3) uint8 arrays, one per image descriptor."""
    import numpy as np

    if not (payload.startswith(b"GIF87a") or payload.startswith(b"GIF89a")):
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    bg_rgb = (
        gct[bg_index] if gct is not None and bg_index < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).astype(np.uint8).copy()
    frames: list = []
    disposal, transparent = 0, None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension
            label = payload[pos + 1]
            if label == 0xF9 and payload[pos + 2] == 4:
                gpacked = payload[pos + 3]
                disposal = (gpacked >> 2) & 0x07
                transparent = payload[pos + 6] if gpacked & 0x01 else None
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            left, top, idx, ct, pos = _gif_image_block(payload, pos, gct)
            h, w = idx.shape
            # clip defensively to the logical screen
            h = min(h, sh - top)
            w = min(w, sw - left)
            if h <= 0 or w <= 0:
                raise ValueError("GIF: frame rect outside logical screen")
            idx = idx[:h, :w]
            region = canvas[top:top + h, left:left + w]
            saved = region.copy() if disposal == 3 else None
            rect = ct[idx].astype(np.uint8)
            if transparent is not None:
                mask = idx != transparent
                region[mask] = rect[mask]
            else:
                region[:] = rect
            frames.append(canvas.copy())
            if disposal == 2:
                region[:] = bg_rgb
            elif disposal == 3:
                region[:] = saved
            disposal, transparent = 0, None  # GCE scopes one image
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"GIF: unexpected block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF: no image data")
    return frames


def decode_gif_image(payload: bytes) -> list[float]:
    """Feature projection of :func:`_gif_rgb` — shared 8-float
    contract."""
    rgb = _gif_rgb(payload) / 255.0
    height, width = rgb.shape[0], rgb.shape[1]
    return [
        float(rgb[..., 0].mean()),
        float(rgb[..., 1].mean()),
        float(rgb[..., 2].mean()),
        float(rgb.mean(axis=2).std()),
        width / 4096.0,
        height / 4096.0,
        (width / height) / 8.0,
        1.0,
    ]



def decode_jpeg_image(payload: bytes) -> list[float]:
    """REAL decoder for baseline AND progressive JPEG (ITU-T T.81,
    public spec), implemented in :mod:`._jpeg` — marker parse,
    canonical Huffman entropy decode (sequential scans, and Annex G
    progressive DC/AC first + refinement scans with EOB runs), dequant
    + vectorized separable IDCT, generic sampling-factor upsampling
    (4:4:4/4:2:2/4:2:0), DRI/RSTn restarts, JFIF BT.601 color
    transform. This closes the image half of the "compressed codecs
    are stubbed" gap: PPM/PNG/BMP/GIF/JPEG-baseline/JPEG-progressive
    all decode for real; only the psychoacoustic/video codecs
    (MP3/H.264) remain stub-backed. Round 11 adds LOSSLESS (SOF3,
    Annex H predictive coding — 3-component lossless is taken as RGB,
    not YCbCr, since T.81 lossless has no color-transform contract).
    Round 11 also decodes 12-bit extended-sequential (SOF1) for
    real; only arithmetic-coded, 12-bit PROGRESSIVE, and hierarchical
    JPEGs raise so :func:`sniffing_decoder` falls back to the stub
    (the PPM-maxval rule). Same 8-float
    feature contract; pinned against an independently-encoded CPython
    test JPEG (4:2:0) to match the PPM ground truth within DCT
    quantization loss, against a test-side spec encoder for exactness
    structure, and progressive-vs-baseline BIT-EXACT on shared
    coefficients (tests/test_extensions.py round 10)."""
    from ._jpeg import decode_jpeg_rgb

    rgb = decode_jpeg_rgb(payload)
    height, width = rgb.shape[0], rgb.shape[1]
    return [
        float(rgb[..., 0].mean()),
        float(rgb[..., 1].mean()),
        float(rgb[..., 2].mean()),
        float(rgb.mean(axis=2).std()),
        width / 4096.0,
        height / 4096.0,
        (width / height) / 8.0,
        1.0,
    ]


def decode_y4m_video(payload: bytes, max_frames: int = 16) -> list[float]:
    """REAL decoder for YUV4MPEG2 (.y4m) uncompressed video — the
    public raw-video interchange format (plain-text header + planar
    YUV frames), parseable without codec libraries; completes the
    third media kind next to :func:`decode_ppm_image` and
    :func:`decode_wav_audio`. Features (8-float contract):
    [mean_luma, std_luma, mean_abs_temporal_diff, n_frames/1024,
    width/4096, height/4096, fps/120, 1.0].

    Frame sampling, not full scan: luma statistics come from an
    evenly-strided sample of at most ``max_frames`` frames, the shape a
    production frame-sampler uses so a 2-hour clip costs the same as a
    2-second one. Supported chroma modes: C420*, C444, Cmono (the
    common raw layouts); anything else raises and the caller falls back.
    """
    import numpy as np

    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    width = height = 0
    fps = 0.0
    chroma = "420"
    for tok in payload[9:nl].split():
        tag, val = tok[:1], tok[1:].decode("ascii", "replace")
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"F":
            num, den = val.split(":")
            fps = int(num) / int(den) if int(den) else 0.0
        elif tag == b"C":
            chroma = val
    if width <= 0 or height <= 0:
        raise ValueError("y4m header missing W/H")
    luma = width * height
    if chroma.startswith("420"):
        frame_bytes = luma + luma // 2
    elif chroma == "444":
        frame_bytes = 3 * luma
    elif chroma == "mono":
        frame_bytes = luma
    else:
        raise ValueError(f"unsupported y4m chroma mode C{chroma}")

    # index frame offsets first (cheap — header scan only), then decode
    # only the strided sample
    offsets: list[int] = []
    i = nl + 1
    while i < len(payload):
        if payload[i : i + 5] != b"FRAME":
            raise ValueError("corrupt y4m: FRAME marker missing")
        j = payload.index(b"\n", i)
        offsets.append(j + 1)
        i = j + 1 + frame_bytes
    if not offsets:
        raise ValueError("y4m payload has no frames")
    stride = max(1, len(offsets) // max_frames)
    sample = offsets[::stride][:max_frames]
    planes = [
        np.frombuffer(payload[o : o + luma], dtype=np.uint8).astype(np.float64)
        / 255.0
        for o in sample
    ]
    y = np.stack(planes)
    tdiff = float(np.mean(np.abs(np.diff(y, axis=0)))) if len(planes) > 1 else 0.0
    return [
        float(y.mean()),
        float(y.std()),
        tdiff,
        len(offsets) / 1024.0,
        width / 4096.0,
        height / 4096.0,
        fps / 120.0,
        1.0,
    ]


def sniffing_decoder(payload: bytes, kind: str) -> list[float]:
    """Magic-byte dispatch: P6 -> PPM decode, PNG signature -> PNG
    decode (round 9 — stdlib zlib handles the container's DEFLATE, so
    only transform-coded formats remain stubbed), RIFF/WAVE -> WAV
    decode, YUV4MPEG2 -> raw-video decode, else the deterministic stub
    (for compressed codecs genuinely unavailable here). This is the
    production ``decoder=`` slot-in shape: pure
    ``(payload, kind) -> 8 floats``, no per-row Spark calls.

    Containers the magic bytes *resemble* but the decoders can't handle
    (AVI/WebP share the RIFF prefix; 16-bit-maxval PPMs; non-16-bit-PCM
    WAVs) fall back to the stub rather than failing the Spark task —
    one undecodable payload must not abort a whole extract batch."""
    try:
        if payload is not None and payload.startswith(b"P6"):
            return decode_ppm_image(payload)
        if payload is not None and payload.startswith(_PNG_SIG):
            return decode_png_image(payload)
        if payload is not None and payload.startswith(b"BM"):
            return decode_bmp_image(payload)
        if payload is not None and payload.startswith((b"GIF87a", b"GIF89a")):
            return decode_gif_image(payload)
        if payload is not None and payload.startswith(b"\xff\xd8"):
            return decode_jpeg_image(payload)
        if payload is not None and payload.startswith((b"II*\x00", b"MM\x00*")):
            return decode_tiff_image(payload)
        # RIFF alone is a container family (AVI, WebP, ...); require the
        # WAVE format tag at offset 8 before trying the WAV decoder
        if (
            payload is not None
            and payload.startswith(b"RIFF")
            and payload[8:12] == b"WAVE"
        ):
            return decode_wav_audio(payload)
        if payload is not None and payload.startswith(b"fLaC"):
            # round 10: real FLAC decode (._flac) through the shared
            # PCM parse — same 8-float audio feature contract
            return decode_wav_audio(payload)
        if (
            payload is not None
            and payload.startswith(b"FORM")
            and payload[8:12] in (b"AIFF", b"AIFC")
        ):
            # round 11: AIFF big-endian PCM through the shared parse
            # (AIFF-C compressed variants raise inside -> stub)
            return decode_wav_audio(payload)
        if payload is not None and payload.startswith(b"YUV4MPEG2"):
            return decode_y4m_video(payload)
    except Exception:  # noqa: BLE001 — malformed media: fall back, don't fail the task
        pass
    return _decode_stub(payload, kind)


def extract_features(media: DataFrame, decoder=None) -> DataFrame:
    """Decode + feature-extract media rows via Arrow-batched mapInPandas.

    ``decoder`` is the slot-in point: any pure
    ``(payload: bytes, kind: str) -> list[float]`` callable (e.g.
    :func:`sniffing_decoder`, or a PIL/torchaudio wrapper on a real
    cluster). Defaults to the deterministic stub. The batch function is
    pure and per-partition; no state crosses batches, so the same code
    runs under Structured Streaming.
    """
    decode = decoder or _decode_stub

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [
                        decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def binary_meta(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Typed metadata extraction over an opaque binary column via
    Arrow-batched ``mapInPandas`` — the exact plumbing a real decode
    step rides on (schema declared up front, per-batch pure function,
    payload column pruned away in the output)."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_bytes", LongType()),
            StructField("first_byte", IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "first_byte": [
                        int(p[0]) if p is not None and len(p) > 0 else None
                        for p in payloads
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def synthetic_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fixture generator for tests (payload = id bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        (F.col("id") % 1920).cast("int").alias("meta_width"),
        (F.col("id") % 1080).cast("int").alias("meta_height"),
        (F.col("id") * 1000).cast("long").alias("meta_duration_ms"),
        F.lit("synthetic").alias("meta_format"),
    )


def synthetic_image_corpus(spark, n: int = 96) -> DataFrame:
    """Deterministic P6-PPM image corpus for perceptual-hash evidence
    (q103): ``n`` 64x64 grayscale gradients in groups of 4 — variant 0
    is the group's base gradient, variant 1 a near-duplicate (one pixel
    in ~97 nudged by +1, the same perturbation the X57 unit test uses),
    variants 2/3 visually distinct (inverted / steeper slope). Every
    payload is a pure function of ``media_id``, so Spark and any
    re-reader regenerate byte-identical images. Built executor-side via
    ``mapInPandas`` over ``spark.range`` — no driver-side byte blobs,
    the generation distributes like any other scan. The range is
    pinned to 8 partitions: at the fixed evidence size (n=96, ~12 KB
    payloads) the default 32 slices mean 32 Python-worker invocations
    for milliseconds of real work per stage — measured 2-5x suite
    noise from worker churn (round 12); real corpora enter from
    parquet and keep their own partitioning."""
    out_schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def _ppm(media_id: int) -> bytes:
        import numpy as np

        group, variant = divmod(media_id, 4)
        w = h = 64
        x = np.arange(w, dtype=np.int64)[None, :]
        y = np.arange(h, dtype=np.int64)[:, None]
        a, b = 2 + (group % 5), 1 + (group % 3)
        v = (a * x + b * y + 7 * group) % 256
        if variant == 1:
            v = (v + ((x + y) % 97 == 0)) % 256
        elif variant == 2:
            v = 255 - v
        elif variant == 3:
            v = (3 * a * x + b * y + 11 * group) % 256
        rgb = np.repeat(v.astype(np.uint8)[:, :, None], 3, axis=2)
        return f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].astype("int64")
            yield pd.DataFrame(
                {"media_id": ids, "payload": [_ppm(int(i)) for i in ids]}
            )

    return spark.range(0, n, 1, 8).mapInPandas(batches, schema=out_schema)


def ahash64_ppm(payload: bytes) -> int | None:
    """X57 — 64-bit average-hash (aHash) perceptual fingerprint of any
    REAL-decodable image (PPM fast path; PNG/BMP/GIF/baseline-JPEG via
    :func:`_parse_gray`, round 9): grayscale -> 8x8 block-mean
    downsample -> one bit per
    cell (above/below the 64-cell mean). Near-identical images (resize,
    slight re-encode, small edits) land within a few bits of Hamming
    distance; the public baseline perceptual hash (pHash's DCT variant
    drops in behind the same signature). Returns None for undecodable
    payloads — a corrupt image must not abort the batch."""
    import numpy as np

    try:
        gray = _parse_gray(payload)
        if gray is None:
            return None
        height, width = gray.shape
        if width < 8 or height < 8:
            return None
        # 8x8 block means via truncate-to-multiple then reshape (exact,
        # no interpolation -> deterministic across platforms)
        bh, bw = height // 8, width // 8
        g = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
        bits = (g > g.mean()).flatten()
        h = 0
        for b in bits:
            h = (h << 1) | int(b)
        # keep within signed int64 for Spark LongType
        return h - (1 << 64) if h >= (1 << 63) else h
    except Exception:  # noqa: BLE001 — malformed image: signature absent
        return None


def image_ahash(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """X57 — perceptual-hash projection over an opaque binary column:
    Arrow-batched ``mapInPandas``, payload pruned from the output, one
    64-bit signature per decodable image (NULL otherwise). Stateless and
    per-batch pure, so it runs unchanged under Structured Streaming —
    the ingest-time shape that lets a 100 TB image corpus be
    near-dup-checked without ever re-reading raw bytes."""
    out_schema = StructType(
        [StructField(id_col, LongType()), StructField("ahash", LongType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "ahash": [ahash64_ppm(p) for p in pdf[payload_col]],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def signature_bands(
    sigs: DataFrame,
    n_bands: int,
    sig_col: str = "ahash",
    id_col: str = "media_id",
) -> DataFrame:
    """Shared X57/X85/X86/X87 banding projection: split a 64-bit
    signature into ``n_bands`` equal-width band keys — (id, __sig,
    band, key) rows, one narrow posexplode, streaming-safe (pure
    row-local)."""
    assert 64 % n_bands == 0, "n_bands must divide 64"
    width = 64 // n_bands
    mask = (1 << width) - 1
    s = sigs.filter(F.col(sig_col).isNotNull()).select(
        F.col(id_col).alias("id"), F.col(sig_col).alias("__sig")
    )
    return s.select(
        "id",
        "__sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("__sig"), width * b)
                    .bitwiseAND(F.lit(mask))
                    .cast("long")
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "key"),
    )


def ahash_near_dup_pairs(
    sigs: DataFrame,
    max_hamming: int = 6,
    n_bands: int | None = None,
    id_col: str = "media_id",
    sig_col: str = "ahash",
) -> DataFrame:
    """X57 — image near-dup pairs from 64-bit perceptual signatures
    (aHash by default; pass ``sig_col="phash"`` for the X85 DCT
    variant — the banding/verify contract is signature-agnostic): banded
    exact-match candidate generation, then exact Hamming verify via
    ``bit_count(a XOR b)``.

    Recall guarantee (pigeonhole, stated precisely): splitting 64 bits
    into ``n_bands`` equal bands, a pair at Hamming distance d can
    differ in at most d bands, so it MUST agree on at least one whole
    band whenever ``d < n_bands`` — candidate generation is exhaustive
    for ``max_hamming < n_bands`` and the verified output is then
    EXACTLY the brute-force pair set. For ``max_hamming >= n_bands``
    the banding is a high-recall heuristic only: a pair whose differing
    bits touch every band is silently missed (never a false positive —
    the verify is exact either way). Default ``n_bands=None``
    auto-selects the smallest divisor of 64 strictly greater than
    ``max_hamming`` (e.g. max_hamming=6 -> 8 bands of 8 bits), keeping
    the exhaustive regime; pass a smaller explicit ``n_bands`` (wider
    bands, 2^width buckets, stronger pruning) only when approximate
    recall is acceptable.

    Scale: the q47/q73 banding contract — candidates ride a narrow
    (id, band, band-key) self-join, signatures never expand to per-bit
    rows, verify is one codegen popcount per candidate pair. Band width
    trades pruning against recall: 8-bit bands give 256 buckets per
    band (fan-out ~n^2/256 per band on a corpus with no structure), so
    at very large n prefer raising ``max_hamming``'s band width via an
    explicit ``n_bands`` plus a secondary partition key, or pre-bucket
    by a coarse content key.
    """
    if n_bands is None:
        n_bands = next(nb for nb in (1, 2, 4, 8, 16, 32, 64) if nb > max_hamming)
    bands = signature_bands(sigs, n_bands, sig_col=sig_col, id_col=id_col)
    a = bands.select(
        F.col("id").alias("id_a"), F.col("__sig").alias("h_a"), "band", "key"
    )
    b = bands.select(
        F.col("id").alias("id_b"), F.col("__sig").alias("h_b"), "band", "key"
    )
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )



def _rgb_of(payload: bytes):
    """Format-sniffing RGB parse (the color twin of :func:`_parse_gray`):
    HxWx3 float64 in [0, 255] via whichever REAL decoder matches the
    magic bytes, or None. Audio/video and undecodable payloads return
    None."""
    if payload is None:
        return None
    try:
        import numpy as np

        if payload.startswith(b"P6"):
            gray_like = _parse_ppm_gray(payload)  # validates header
            if gray_like is None:
                return None
            # re-parse as RGB (cheap: same token walk inside the decoder)
            tokens: list[bytes] = []
            i = 0
            while len(tokens) < 4 and i < len(payload):
                while i < len(payload) and payload[i : i + 1].isspace():
                    i += 1
                if payload[i : i + 1] == b"#":
                    while i < len(payload) and payload[i : i + 1] != b"\n":
                        i += 1
                    continue
                start = i
                while i < len(payload) and not payload[i : i + 1].isspace():
                    i += 1
                tokens.append(payload[start:i])
            w, h = int(tokens[1]), int(tokens[2])
            px = np.frombuffer(payload[i + 1 : i + 1 + w * h * 3], dtype=np.uint8)
            return px.reshape(h, w, 3).astype(np.float64)
        if payload.startswith(_PNG_SIG):
            return _png_rgb(payload)
        if payload.startswith(b"BM"):
            return _bmp_rgb(payload)
        if payload.startswith((b"GIF87a", b"GIF89a")):
            return _gif_rgb(payload)
        if payload.startswith(b"\xff\xd8"):
            from ._jpeg import decode_jpeg_rgb

            return decode_jpeg_rgb(payload) * 255.0
        if payload.startswith((b"II*\x00", b"MM\x00*")):
            return _tiff_rgb(payload)
    except Exception:  # noqa: BLE001 — malformed image: no pixels
        return None
    return None


def transcode_ppm(payload: bytes) -> bytes | None:
    """Decode ANY real-decodable image format and re-emit canonical
    binary P6 PPM — the ingest normalization that turns a mixed-codec
    crawl (PNG originals, JPEG re-encodes, GIF thumbnails, BMP
    screenshots) into ONE uncompressed representation every downstream
    stage (resize/aHash/pHash/dHash/near-dup) already consumes on its
    fast path. Lossless inputs round-trip pixel-exact; JPEG carries its
    decode result verbatim. None for undecodable payloads."""
    import numpy as np

    rgb = _rgb_of(payload)
    if rgb is None:
        return None
    h, w = rgb.shape[0], rgb.shape[1]
    body = np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()
    return b"P6\n%d %d\n255\n" % (w, h) + body


def transcode_images(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """X6 (transcode stage, round 9) — mixed-codec corpus -> canonical
    P6 PPM payloads as an Arrow ``mapInPandas`` projection: (id,
    payload) -> (id, ppm payload, width, height, src_format), NULL row
    values for undecodable inputs (same degradation contract as
    :func:`image_ahash`; batch shape unchanged, streaming-safe). At
    100 TB this runs once at ingest so every downstream image stage
    reads one format off its fast path instead of sniffing per call."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("src_format", StringType()),
        ]
    )

    def _fmt(p) -> str | None:
        if p is None:
            return None
        if p.startswith(b"P6"):
            return "ppm"
        if p.startswith(_PNG_SIG):
            return "png"
        if p.startswith(b"BM"):
            return "bmp"
        if p.startswith((b"GIF87a", b"GIF89a")):
            return "gif"
        if p.startswith(b"\xff\xd8"):
            return "jpeg"
        if p.startswith((b"II*\x00", b"MM\x00*")):
            return "tiff"
        return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs = [transcode_ppm(p) for p in pdf[payload_col]]
            ws, hs = [], []
            for o in outs:
                if o is None:
                    ws.append(None)
                    hs.append(None)
                else:
                    head = o.split(b"\n", 3)
                    w_, h_ = head[1].split(b" ")
                    ws.append(int(w_))
                    hs.append(int(h_))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": outs,
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "src_format": [_fmt(p) for p in pdf[payload_col]],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def transcode_wav(payload: bytes) -> bytes | None:
    """Audio twin of :func:`transcode_ppm` (round 10): any decodable
    audio payload (RIFF/WAV 16-bit PCM, FLAC at any supported depth,
    and — round 11 — AIFF/AIFF-C-NONE big-endian PCM and G.711
    mu-law/A-law RIFF payloads) -> a canonical 16-bit PCM RIFF/WAV
    payload. FLAC at 16 bits and AIFF at 16 bits are lossless, so
    transcode->features equals the direct decode exactly; other depths
    scale to 16 bits (arithmetic shift — documented, deterministic);
    G.711 expands by the spec formulas. None for undecodable
    inputs."""
    import io
    import wave

    import numpy as np

    try:
        if payload is None:
            return None
        if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
            try:
                with wave.open(io.BytesIO(payload), "rb") as w:
                    ok = w.getsampwidth() == 2
                # already canonical; re-emit as-is (idempotent stage);
                # PCM at other depths stays None (unchanged contract)
                return bytes(payload) if ok else None
            except wave.Error:
                # stdlib wave only reads PCM: companded G.711 payloads
                code, nch, rate, bits, raw = _parse_wav_chunks(payload)
                if code == 7 and bits == 8:
                    flat = _ulaw_to_linear16(np.frombuffer(raw, dtype=np.uint8))
                elif code == 6 and bits == 8:
                    flat = _alaw_to_linear16(np.frombuffer(raw, dtype=np.uint8))
                else:
                    return None
                samples = (
                    flat[: (len(flat) // nch) * nch]
                    .astype(np.int64)
                    .reshape(-1, nch)
                )
        elif payload.startswith(b"FORM"):
            samples, rate, bits = _parse_aiff(payload)
            if bits > 16:
                samples = samples >> (bits - 16)
            elif bits < 16:
                samples = samples << (16 - bits)
        elif payload.startswith(b"fLaC"):
            from ._flac import decode_flac_pcm

            samples, rate, bps = decode_flac_pcm(payload)
            if bps > 16:
                samples = samples >> (bps - 16)
            elif bps < 16:
                samples = samples << (16 - bps)
        else:
            return None
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(samples.shape[1])
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(samples.astype("<i2").tobytes())
        return buf.getvalue()
    except Exception:  # noqa: BLE001 — malformed audio: no payload
        return None


def transcode_audio(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """X6 (audio transcode stage, round 10) — mixed-codec audio corpus
    -> canonical 16-bit PCM WAV payloads, the audio parallel of
    :func:`transcode_images`: (id, payload) -> (id, wav payload,
    sample_rate, n_channels, src_format), NULL row values for
    undecodable inputs. At 100 TB this runs once at ingest so every
    downstream audio stage (loudness, fingerprint, trim) reads one
    format off its fast path."""
    import io
    import wave

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("payload", BinaryType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_channels", IntegerType()),
            StructField("src_format", StringType()),
        ]
    )

    def _fmt(p) -> str | None:
        if p is None:
            return None
        if p.startswith(b"RIFF") and p[8:12] == b"WAVE":
            try:
                code = _parse_wav_chunks(p)[0]
            except ValueError:
                return "wav"
            return {1: "wav", 6: "wav_alaw", 7: "wav_ulaw"}.get(code, "wav")
        if p.startswith(b"fLaC"):
            return "flac"
        if p.startswith(b"FORM") and p[8:12] in (b"AIFF", b"AIFC"):
            return "aiff"
        return None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs = [transcode_wav(p) for p in pdf[payload_col]]
            rates, chans = [], []
            for o in outs:
                if o is None:
                    rates.append(None)
                    chans.append(None)
                else:
                    with wave.open(io.BytesIO(o), "rb") as w:
                        rates.append(w.getframerate())
                        chans.append(w.getnchannels())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": outs,
                    "sample_rate": pd.Series(rates, dtype="Int32"),
                    "n_channels": pd.Series(chans, dtype="Int32"),
                    "src_format": [_fmt(p) for p in pdf[payload_col]],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def resize_ppm(payload: bytes, out_w: int, out_h: int) -> bytes | None:
    """REAL resize for P6 PPM payloads: exact block-mean downsample to
    (out_w, out_h) — the same interpolation-free arithmetic as
    :func:`ahash64_ppm`'s 8x8 stage, so results are byte-deterministic
    across platforms. Input dimensions must be >= the target;
    non-multiple edges are truncated to the largest covered multiple
    (documented, deterministic). Returns a re-encoded P6 payload, or
    None for undecodable/too-small inputs."""
    import numpy as np

    try:
        if payload is None or not payload.startswith(b"P6"):
            return None
        tokens: list[bytes] = []
        i = 0
        while len(tokens) < 4 and i < len(payload):
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
                continue
            start = i
            while i < len(payload) and not payload[i : i + 1].isspace():
                i += 1
            tokens.append(payload[start:i])
        width, height, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
        if maxval > 255 or width < out_w or height < out_h:
            return None
        px = np.frombuffer(
            payload[i + 1 : i + 1 + width * height * 3], dtype=np.uint8
        ).reshape(height, width, 3)
        bh, bw = height // out_h, width // out_w
        small = (
            px[: bh * out_h, : bw * out_w]
            .reshape(out_h, bh, out_w, bw, 3)
            .mean(axis=(1, 3))
            .round()
            .astype(np.uint8)
        )
        return f"P6\n{out_w} {out_h}\n255\n".encode() + small.tobytes()
    except Exception:  # noqa: BLE001 — malformed image: no output payload
        return None


def resize_images(
    media: DataFrame,
    out_w: int = 16,
    out_h: int = 16,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """X6 (resize stage) — opaque-binary image resize as an Arrow
    ``mapInPandas`` projection: (id, payload) -> (id, resized payload,
    out dims), NULL for undecodable inputs, batch shape unchanged
    (streaming-safe, same contract as :func:`image_ahash`). At 100 TB
    this is the thumbnail/normalization pass that runs once at ingest
    so downstream feature extraction reads fixed-size payloads."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [resize_ppm(p, out_w, out_h) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": resized,
                    "width": [out_w if r is not None else None for r in resized],
                    "height": [out_h if r is not None else None for r in resized],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def frame_sample(
    media: DataFrame,
    max_frames: int = 4,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """X6 (frame-sample stage) — first-class evenly-strided frame
    sampling from YUV4MPEG2 video payloads AND animated GIFs (round
    10): each input row EXPLODES to at most ``max_frames`` rows (id,
    frame_idx, frame payload as a P6 PPM — grayscale from the luma
    plane for Y4M, full color for composited GIF frames — width,
    height). The shape that makes a video/animation corpus feed the
    image pipeline (ahash near-dup, resize, feature extraction)
    without a codec dependency. GIF frames are composited per the
    GCE animation model (:func:`_gif_frames`) so each sampled frame is
    what a viewer would show, not a bare sub-rect.

    Arrow ``mapInPandas`` with a row-multiplying yield — the sanctioned
    fan-out shape (the output row count is bounded by
    rows x max_frames); corrupt payloads contribute zero rows rather
    than failing the batch."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def _pick(n: int) -> list[int]:
        return sorted({
            int(round(i * (n - 1) / max(1, max_frames - 1)))
            for i in range(min(max_frames, n))
        })

    def _frames(payload: bytes) -> list[tuple[int, bytes, int, int]]:
        import numpy as np

        try:
            if payload is not None and payload.startswith((b"GIF87a", b"GIF89a")):
                gframes = _gif_frames(payload)
                gh, gw = gframes[0].shape[:2]
                header = f"P6\n{gw} {gh}\n255\n".encode()
                return [
                    (fi, header + gframes[fi].tobytes(), gw, gh)
                    for fi in _pick(len(gframes))
                ]
            if payload is None or not payload.startswith(b"YUV4MPEG2"):
                return []
            nl = payload.index(b"\n")
            width = height = 0
            chroma = "420"
            for tok in payload[9:nl].split():
                tag, val = tok[:1], tok[1:].decode("ascii", "replace")
                if tag == b"W":
                    width = int(val)
                elif tag == b"H":
                    height = int(val)
                elif tag == b"C":
                    chroma = val
            if width <= 0 or height <= 0:
                return []
            luma = width * height
            if chroma.startswith("420"):
                fsize = luma + luma // 2
            elif chroma.startswith("444"):
                fsize = luma * 3
            elif chroma.startswith("mono"):
                fsize = luma
            else:
                return []
            body = payload[nl + 1 :]
            frames = []
            pos = 0
            while pos < len(body):
                fh = body.index(b"\n", pos)
                frames.append(body[fh + 1 : fh + 1 + fsize])
                pos = fh + 1 + fsize
            if not frames:
                return []
            idxs = _pick(len(frames))
            out = []
            header = f"P6\n{width} {height}\n255\n".encode()
            for fi in idxs:
                y = np.frombuffer(frames[fi][:luma], dtype=np.uint8).reshape(
                    height, width
                )
                rgb = np.repeat(y[:, :, None], 3, axis=2)
                out.append((fi, header + rgb.tobytes(), width, height))
            return out
        except Exception:  # noqa: BLE001 — corrupt clip: contribute no rows
            return []

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fidx, pays, ws, hs = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                for fi, fp, w, h in _frames(payload):
                    ids.append(mid)
                    fidx.append(fi)
                    pays.append(fp)
                    ws.append(w)
                    hs.append(h)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "payload": pays,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                }
            )

    return media.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def _parse_ppm_gray(payload: bytes):
    """Parse a P6 PPM payload to a float64 grayscale matrix, or None
    for undecodable input (shared by the X57 aHash and X85 pHash
    signatures; identical token walk to the original ahash parser)."""
    import numpy as np

    if payload is None or not payload.startswith(b"P6"):
        return None
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        tokens.append(payload[start:i])
    width, height, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval > 255:
        return None
    px = np.frombuffer(
        payload[i + 1 : i + 1 + width * height * 3], dtype=np.uint8
    )
    if px.size < width * height * 3:
        return None
    return px.reshape(height, width, 3).astype(np.float64).mean(axis=2)


def _parse_gray(payload: bytes):
    """Format-sniffing grayscale parse for the perceptual-hash family
    (round 9): PPM keeps its original fast path (bit-identical hashes
    for the declared q103/q122/q184 corpora), and every other REAL
    decoder's RGB core — PNG, BMP, GIF, baseline JPEG — feeds the same
    0..255 channel-mean gray. None for undecodable payloads (hash
    absent, the established degradation)."""
    import numpy as np  # noqa: F401 — sibling parsers use it

    if payload is None:
        return None
    try:
        if payload.startswith(b"P6"):
            return _parse_ppm_gray(payload)
        if payload.startswith(_PNG_SIG):
            return _png_rgb(payload).mean(axis=2)
        if payload.startswith(b"BM"):
            return _bmp_rgb(payload).mean(axis=2)
        if payload.startswith((b"GIF87a", b"GIF89a")):
            return _gif_rgb(payload).mean(axis=2)
        if payload.startswith(b"\xff\xd8"):
            from ._jpeg import decode_jpeg_rgb

            return decode_jpeg_rgb(payload).mean(axis=2) * 255.0
        if payload.startswith((b"II*\x00", b"MM\x00*")):
            return _tiff_rgb(payload).mean(axis=2)
    except Exception:  # noqa: BLE001 — malformed image: signature absent
        return None
    return None


def phash64_ppm(payload: bytes) -> int | None:
    """X85 — 64-bit DCT perceptual hash (pHash; the public algorithm
    behind the pHash library): grayscale -> exact 32x32 block-mean
    downsample -> orthonormal 2-D DCT-II -> top-left 8x8 coefficient
    block -> one bit per coefficient (above/below the median of the 63
    AC coefficients; the DC term is excluded and its bit forced 0).
    Captures low-frequency image STRUCTURE: affine intensity changes
    (brightness shift moves only the excluded DC term; contrast
    scaling multiplies every AC coefficient AND their median by the
    same positive factor) leave all 64 bits untouched, and
    high-frequency noise (the corpus's one-pixel nudges) lands in
    coefficients outside the kept 8x8 block. A global inversion
    negates the AC coefficients and flips every bit — by design:
    a negative is a DIFFERENT image. The
    DCT is a plain matrix triple product (no scipy/FFT dependency);
    all arithmetic is float64 numpy — deterministic on one platform,
    and the oracle reads the Spark-written signature parquet, so
    cross-engine bit parity is never assumed. None for undecodable or
    sub-32x32 payloads."""
    import numpy as np

    try:
        gray = _parse_gray(payload)
        if gray is None or gray.shape[0] < 32 or gray.shape[1] < 32:
            return None
        h, w = gray.shape
        bh, bw = h // 32, w // 32
        g = gray[: bh * 32, : bw * 32].reshape(32, bh, 32, bw).mean(axis=(1, 3))
        k = np.arange(32)[:, None]
        n = np.arange(32)[None, :]
        d = np.cos(np.pi * (2 * n + 1) * k / 64) * np.sqrt(2.0 / 32)
        d[0, :] = np.sqrt(1.0 / 32)
        coeffs = d @ g @ d.T
        block = coeffs[:8, :8].flatten()
        ac = block[1:]
        med = np.median(ac)
        bits = [False] + [bool(c > med) for c in ac]
        v = 0
        for b in bits:
            v = (v << 1) | int(b)
        return v - (1 << 64) if v >= (1 << 63) else v
    except Exception:  # noqa: BLE001 — malformed image: signature absent
        return None


def image_phash(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """X85 — DCT perceptual-hash projection: identical plumbing to
    :func:`image_ahash` (Arrow mapInPandas, payload pruned, NULL on
    corrupt input, streaming-safe), different signature column
    (``phash``)."""
    out_schema = StructType(
        [StructField(id_col, LongType()), StructField("phash", LongType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "phash": [phash64_ppm(p) for p in pdf[payload_col]],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def synthetic_audio_corpus(spark, n: int = 96) -> DataFrame:
    """Deterministic 16-bit PCM WAV corpus for audio-fingerprint
    evidence (q123) — the audio twin of :func:`synthetic_image_corpus`:
    ``n`` half-second 8 kHz mono clips in groups of 4 — variant 0 a
    two-tone chord (frequencies a function of the group), variant 1 a
    near-duplicate (the same chord at 1% lower amplitude plus a tiny
    deterministic third tone 40 dB down), variants 2/3 audibly distinct
    (transposed chord / different chord shape). Payloads are pure
    functions of ``media_id`` — byte-identical on regeneration,
    executor-side via ``mapInPandas`` (8-partition range: the
    synthetic_image_corpus worker-churn note applies)."""
    out_schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def _wav(media_id: int) -> bytes:
        import io
        import wave

        import numpy as np

        group, variant = divmod(media_id, 4)
        rate, secs = 8000, 0.5
        t = np.arange(int(rate * secs), dtype=np.float64) / rate
        f1, f2 = 220.0 + 15.0 * (group % 7), 440.0 + 20.0 * (group % 5)
        if variant == 2:
            f1, f2 = f1 * 1.5, f2 * 1.5
        elif variant == 3:
            f2 = f1 * 1.25
        x = 0.45 * np.sin(2 * np.pi * f1 * t) + 0.35 * np.sin(2 * np.pi * f2 * t)
        if variant == 1:
            x = 0.99 * x + 0.005 * np.sin(2 * np.pi * (f1 * 3.01) * t)
        pcm = np.clip(x * 32767.0, -32768, 32767).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf["id"].astype("int64")
            yield pd.DataFrame(
                {"media_id": ids, "payload": [_wav(int(i)) for i in ids]}
            )

    return spark.range(0, n, 1, 8).mapInPandas(batches, schema=out_schema)


def afp64_wav(payload: bytes) -> int | None:
    """X86 — 64-bit audio fingerprint from band-energy structure (the
    Haitsma-Kalker band-energy family, Philips ISMIR 2002 — public;
    simplified to an absolute hot-band indicator, which is the stable
    statistic for steady-state content where H-K's temporal derivative
    degenerates to float noise): mono samples -> 4 fixed 1000-sample
    frames -> per-frame energies in 16 linear bands over 180-820 Hz
    (|rFFT|^2 partial sums) -> one bit per (frame, band): is the band
    HOT (energy > frame_total / 16)? 4 x 16 = 64 bits.

    Robust to gain changes (the hot criterion is a ratio) and to
    additive content far below the band energies; transposition moves
    energy across bands and flips the hot set. None for undecodable or
    too-short (< 4000 samples) payloads."""
    import numpy as np

    try:
        xs, rate = _audio_samples(payload)
        x = xs.mean(axis=1)  # mono mix
        n_frames, frame_len, n_bands = 4, 1000, 16
        if x.size < n_frames * frame_len or rate <= 0:
            return None
        edges = np.linspace(180.0, 820.0, n_bands + 1)
        freqs = np.fft.rfftfreq(frame_len, d=1.0 / rate)
        bits = []
        for f in range(n_frames):
            seg = x[f * frame_len : (f + 1) * frame_len]
            spec = np.abs(np.fft.rfft(seg * np.hanning(frame_len))) ** 2
            band_e = np.array(
                [
                    spec[(freqs >= edges[b]) & (freqs < edges[b + 1])].sum()
                    for b in range(n_bands)
                ]
            )
            thresh = band_e.sum() / n_bands
            bits.extend(bool(e > thresh) for e in band_e)
        v = 0
        for bit in bits:
            v = (v << 1) | int(bit)
        return v - (1 << 64) if v >= (1 << 63) else v
    except Exception:  # noqa: BLE001 — malformed audio: signature absent
        return None


def audio_fingerprint(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """X86 — audio-fingerprint projection: identical Arrow mapInPandas
    plumbing to :func:`image_ahash`/:func:`image_phash`, signature
    column ``afp``; near-dup pairs reuse the signature-agnostic banded
    contract (``ahash_near_dup_pairs(sig_col='afp')``)."""
    out_schema = StructType(
        [StructField(id_col, LongType()), StructField("afp", LongType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "afp": [afp64_wav(p) for p in pdf[payload_col]],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def synthetic_padded_audio_corpus(spark, n: int = 64) -> DataFrame:
    """Deterministic WAV corpus WITH silence structure for the X134
    loudness/trim evidence: ``n`` one-second 8 kHz mono clips; clip i
    carries ``(i % 5) * 50`` ms of leading and ``(i % 7) * 30`` ms of
    trailing digital silence around a fixed-amplitude tone whose
    frequency is a function of the group. Payloads are pure functions
    of ``media_id`` — byte-identical on regeneration, executor-side
    via ``mapInPandas`` (the synthetic_audio_corpus contract)."""
    out_schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def _wav(media_id: int) -> bytes:
        import io
        import wave

        import numpy as np

        rate = 8000
        lead = int(rate * (media_id % 5) * 0.050)
        trail = int(rate * (media_id % 7) * 0.030)
        body_n = rate - lead - trail
        t = np.arange(body_n, dtype=np.float64) / rate
        f = 220.0 + 10.0 * (media_id // 4 % 9)
        body = 0.5 * np.sin(2 * np.pi * f * t)
        x = np.concatenate([np.zeros(lead), body, np.zeros(trail)])
        pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    ids = spark.range(0, n, 1, 8).select(F.col("id").alias("media_id"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [_wav(int(i)) for i in pdf["media_id"]],
                }
            )

    return ids.mapInPandas(batches, schema=out_schema)


def audio_profile_wav(payload: bytes, silence_db: float = -40.0) -> dict | None:
    """X134 — loudness / silence profile of one WAV payload: sample
    count, RMS and peak in dBFS, silent-frame fraction (10 ms frames
    under ``silence_db``), and the leading/trailing silence runs in
    milliseconds — the trim points a speech-data pipeline cuts before
    tokenizing audio. None for undecodable payloads (the X6 NULL
    degradation contract)."""
    import math

    import numpy as np

    try:
        xs, rate = _audio_samples(payload)
        x = xs.mean(axis=1)  # mono mix
        if x.size == 0 or rate <= 0:
            return None
        frame = max(1, rate // 100)          # 10 ms
        n_frames = x.size // frame
        if n_frames == 0:
            return None
        fr = x[: n_frames * frame].reshape(n_frames, frame)
        fr_rms = np.sqrt((fr * fr).mean(axis=1))
        thresh = 10.0 ** (silence_db / 20.0)
        silent = fr_rms < thresh
        lead = int(np.argmax(~silent)) if not silent.all() else n_frames
        trail = int(np.argmax(~silent[::-1])) if not silent.all() else n_frames
        rms = float(np.sqrt((x * x).mean()))
        peak = float(np.abs(x).max())
        to_db = lambda v: -120.0 if v <= 1e-6 else 20.0 * math.log10(v)  # noqa: E731
        return {
            "n_samples": int(x.size),
            "rms_db": round(to_db(rms), 4),
            "peak_db": round(to_db(peak), 4),
            "silence_fraction": round(float(silent.mean()), 4),
            "lead_silence_ms": int(lead * frame * 1000 / rate),
            "trail_silence_ms": int(trail * frame * 1000 / rate),
        }
    except Exception:  # noqa: BLE001 — malformed audio: profile absent
        return None


def audio_profile(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """X134 — audio loudness/silence projection: identical Arrow
    mapInPandas plumbing to :func:`audio_fingerprint`; one row per
    payload with the trim/loudness stats (NULLs for undecodable)."""
    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_samples", LongType()),
            StructField("rms_db", DoubleType()),
            StructField("peak_db", DoubleType()),
            StructField("silence_fraction", DoubleType()),
            StructField("lead_silence_ms", LongType()),
            StructField("trail_silence_ms", LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                prof = audio_profile_wav(p) or {}
                rows.append(
                    {
                        id_col: mid,
                        "n_samples": prof.get("n_samples"),
                        "rms_db": prof.get("rms_db"),
                        "peak_db": prof.get("peak_db"),
                        "silence_fraction": prof.get("silence_fraction"),
                        "lead_silence_ms": prof.get("lead_silence_ms"),
                        "trail_silence_ms": prof.get("trail_silence_ms"),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return media.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def dhash64_ppm(payload: bytes) -> int | None:
    """X151 — 64-bit difference-hash (dHash) perceptual fingerprint of
    any REAL-decodable image (PPM fast path; PNG/BMP/GIF/baseline-JPEG
    via :func:`_parse_gray`, round 9): grayscale -> 8x9 block-mean grid
    -> one bit per horizontal neighbor pair (left > right). The GRADIENT-structure
    member of the perceptual trio (aHash = brightness vs mean, pHash =
    DCT spectrum, dHash = local gradients — public imagehash family):
    immune to global brightness/contrast shifts that flip aHash bits,
    cheaper than pHash's DCT. Returns None for undecodable payloads
    (the X57 contract); identical header parsing and exact block-mean
    downsample (truncate-to-multiple, no interpolation)."""
    import numpy as np

    try:
        gray = _parse_gray(payload)
        if gray is None:
            return None
        height, width = gray.shape
        if width < 9 or height < 8:
            return None
        bh, bw = height // 8, width // 9
        g = gray[: bh * 8, : bw * 9].reshape(8, bh, 9, bw).mean(axis=(1, 3))
        bits = (g[:, :-1] > g[:, 1:]).flatten()
        h = 0
        for b in bits:
            h = (h << 1) | int(b)
        return h - (1 << 64) if h >= (1 << 63) else h
    except Exception:  # noqa: BLE001 — malformed image: signature absent
        return None


def image_dhash(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """X151 — dHash projection: identical Arrow mapInPandas plumbing
    to :func:`image_ahash`; signature column ``dhash``; near-dup pairs
    reuse the signature-agnostic banded contract
    (``ahash_near_dup_pairs(sig_col='dhash')``)."""
    out_schema = StructType(
        [StructField(id_col, LongType()), StructField("dhash", LongType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "dhash": [dhash64_ppm(p) for p in pdf[payload_col]],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)
