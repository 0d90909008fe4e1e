"""FLAC audio decoder (public format spec — RFC 9639 / the xiph FLAC
format document), pure Python + numpy, no codec libraries.

Scope: STREAMINFO parse, frame decode for all four subframe types
(CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32), Rice-coded
residuals (RICE and RICE2 with escape-to-raw partitions, partition
orders 0-15), wasted bits, all stereo decorrelation modes
(independent, left/side, right/side, mid/side), 8/16/24-bit sample
sizes, multi-frame streams. CRCs (frame-header CRC-8, frame CRC-16,
STREAMINFO MD5) are parsed past but not verified — integrity is the
storage layer's job in this engine; a flipped bit surfaces as a
decode error or a feature delta, not silent corruption of other rows.

Performance contract: same as :mod:`._jpeg` — this is the REFERENCE
decoder for the multimodal audio slot-in. Entropy decode (Rice) is a
per-sample Python loop; the predictor reconstruction is a per-sample
loop too (FLAC predictors have a serial dependency). A production
cluster replaces the callable with a native codec; the Arrow plumbing
around it is the product.

Decoder structure follows the spec, not any library: metadata block
walk -> frame header (UTF-8-coded frame index, block-size/sample-rate
code tables) -> per-channel subframe headers -> warmup + residual ->
fixed/LPC reconstruction -> inter-channel undecorrelation ->
interleaved int32 samples.
"""

from __future__ import annotations

import numpy as np


class _FBits:
    """MSB-first bit reader over the whole stream."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def bits(self, n: int) -> int:
        v = 0
        bp = self.bitpos
        data = self.data
        for _ in range(n):
            v = (v << 1) | ((data[bp >> 3] >> (7 - (bp & 7))) & 1)
            bp += 1
        self.bitpos = bp
        return v

    def sbits(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        n = 0
        bp = self.bitpos
        data = self.data
        while not (data[bp >> 3] >> (7 - (bp & 7))) & 1:
            n += 1
            bp += 1
        self.bitpos = bp + 1
        return n

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


_BLOCK_SIZE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
               8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
               13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                11: 96000}
_SAMPLE_SIZE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# fixed-predictor coefficients by order (spec: polynomial predictors)
_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _read_utf8_number(bits: _FBits) -> int:
    """The frame header's UTF-8-style coded frame/sample number."""
    b0 = bits.bits(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (bits.bits(8) & 0x3F)
    return v


def _decode_residual(bits: _FBits, block_size: int, order: int) -> list[int]:
    method = bits.bits(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = bits.bits(4)
    nparts = 1 << part_order
    if block_size % nparts:
        raise ValueError("FLAC: partition order doesn't divide block size")
    out: list[int] = []
    for p in range(nparts):
        n = block_size >> part_order
        if p == 0:
            n -= order
        param = bits.bits(plen)
        if param == escape:
            raw = bits.bits(5)
            for _ in range(n):
                out.append(bits.sbits(raw) if raw else 0)
        else:
            for _ in range(n):
                q = bits.unary()
                u = (q << param) | bits.bits(param)
                out.append((u >> 1) ^ -(u & 1))  # zigzag
    return out


def _decode_subframe(bits: _FBits, block_size: int, bps: int) -> list[int]:
    if bits.bits(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = bits.bits(6)
    wasted = 0
    if bits.bits(1):
        wasted = bits.unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = bits.sbits(bps)
        samples = [v] * block_size
    elif stype == 1:  # VERBATIM
        samples = [bits.sbits(bps) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED, order = stype - 8
        order = stype - 8
        warm = [bits.sbits(bps) for _ in range(order)]
        resid = _decode_residual(bits, block_size, order)
        coefs = _FIXED[order]
        samples = list(warm)
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(pred + r)
    elif stype >= 32:  # LPC, order = stype - 31
        order = stype - 31
        warm = [bits.sbits(bps) for _ in range(order)]
        prec = bits.bits(4)
        if prec == 0x0F:
            raise ValueError("FLAC: invalid LPC precision")
        prec += 1
        shift = bits.sbits(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [bits.sbits(prec) for _ in range(order)]
        resid = _decode_residual(bits, block_size, order)
        samples = list(warm)
        for r in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs)) >> shift
            samples.append(pred + r)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac_pcm(payload: bytes):
    """Decode a FLAC stream to (samples, sample_rate, bits_per_sample)
    with samples an (n_samples, n_channels) int32 array — lossless
    PCM, so a FLAC of a 16-bit WAV's samples reproduces them EXACTLY
    (the pytest pin).

    Exception contract: corrupt/truncated input raises ValueError,
    never IndexError — the bit reader indexes past a truncated buffer,
    so overruns are converted here rather than bounds-checking the
    per-bit hot loop (round-10 ADVICE)."""
    try:
        return _decode_flac_pcm(payload)
    except IndexError:
        raise ValueError("FLAC: truncated stream") from None


def _decode_flac_pcm(payload: bytes):
    if not payload.startswith(b"fLaC"):
        raise ValueError("not a FLAC payload")
    pos = 4
    rate = channels = bps_stream = None
    total = 0
    # metadata block walk
    while True:
        hdr = payload[pos]
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1:pos + 4], "big")
        body = payload[pos + 4:pos + 4 + blen]
        pos += 4 + blen
        if btype == 0:  # STREAMINFO
            b = _FBits(body)
            b.bits(16)  # min block size
            b.bits(16)  # max block size
            b.bits(24)  # min frame size
            b.bits(24)  # max frame size
            rate = b.bits(20)
            channels = b.bits(3) + 1
            bps_stream = b.bits(5) + 1
            total = b.bits(36)
        if hdr & 0x80:  # last metadata block
            break
    if rate is None:
        raise ValueError("FLAC: no STREAMINFO")

    chans: list[list[int]] = [[] for _ in range(channels)]
    bits = _FBits(payload, pos)
    nbits_total = len(payload) * 8
    while bits.bitpos + 32 <= nbits_total and (total == 0 or len(chans[0]) < total):
        sync = bits.bits(14)
        if sync != 0x3FFE:
            if total == 0 and chans[0]:
                # STREAMINFO total_samples unknown (0): the frame loop
                # can only stop on a failed sync, so trailing padding or
                # an appended tag after the last decoded frame is
                # end-of-stream, not corruption (round-10 ADVICE)
                break
            raise ValueError("FLAC: lost frame sync")
        bits.bits(1)  # reserved
        bits.bits(1)  # blocking strategy
        bs_code = bits.bits(4)
        sr_code = bits.bits(4)
        ch_code = bits.bits(4)
        ss_code = bits.bits(3)
        bits.bits(1)  # reserved
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 6:
            block_size = bits.bits(8) + 1
        elif bs_code == 7:
            block_size = bits.bits(16) + 1
        else:
            block_size = _BLOCK_SIZE[bs_code]
        if sr_code == 12:
            bits.bits(8)
        elif sr_code in (13, 14):
            bits.bits(16)
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        if ss_code == 0:
            bps = bps_stream  # "get from STREAMINFO"
        elif ss_code in _SAMPLE_SIZE:
            bps = _SAMPLE_SIZE[ss_code]
            if bps != bps_stream:
                # the frame would decode at its own depth, but every
                # caller normalizes amplitudes by the STREAMINFO bps
                # (_audio_samples division, transcode_wav shift) — raise,
                # don't silently mis-scale (raise-don't-misdecode
                # contract; round-10 ADVICE)
                raise ValueError(
                    f"FLAC: frame bps {bps} != STREAMINFO bps {bps_stream}"
                )
        else:
            # reserved code (3): raise, don't guess — a wrong bps
            # misaligns every later bit (module raise-don't-misdecode
            # contract; round-10 review)
            raise ValueError(f"FLAC: reserved sample size code {ss_code}")
        bits.bits(8)  # header CRC-8 (not verified; see module docstring)

        if ch_code < 8:
            nch = ch_code + 1
            if nch != channels:
                raise ValueError("FLAC: frame/stream channel mismatch")
            sub = [_decode_subframe(bits, block_size, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("FLAC: stereo decorrelation in non-stereo stream")
            # the SIDE channel carries one extra bit (spec)
            if ch_code == 8:  # left/side
                left = _decode_subframe(bits, block_size, bps)
                side = _decode_subframe(bits, block_size, bps + 1)
                right = [l - s for l, s in zip(left, side)]
            elif ch_code == 9:  # right/side (side first)
                side = _decode_subframe(bits, block_size, bps + 1)
                right = _decode_subframe(bits, block_size, bps)
                left = [r + s for r, s in zip(right, side)]
            else:  # mid/side
                mid = _decode_subframe(bits, block_size, bps)
                side = _decode_subframe(bits, block_size, bps + 1)
                left, right = [], []
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
            sub = [left, right]
        else:
            raise ValueError(f"FLAC: reserved channel assignment {ch_code}")
        bits.align()
        bits.bits(16)  # frame CRC-16 (not verified)
        for c in range(channels):
            chans[c].extend(sub[c])

    n = min(len(c) for c in chans)
    if total:
        n = min(n, total)
    out = np.empty((n, channels), dtype=np.int32)
    for c in range(channels):
        out[:, c] = chans[c][:n]
    return out, rate, bps_stream
