"""Baseline + progressive JPEG decoder (ITU-T T.81 / JFIF — public
spec), pure Python + numpy, no codec libraries.

Scope: baseline sequential DCT (SOF0/1), progressive DCT (SOF2,
round 10 — spectral selection AND successive approximation, DC/AC
first and refinement scans per Annex G.2, EOB runs, interleaved DC
scans, per-scan DHT redefinition), and LOSSLESS mode (SOF3, round 11
— Annex H predictive coding: predictors 1-7, point transform,
2-16-bit precision, modulo-2^16 reconstruction, category-16
diff=32768 case; sampling factors other than 1x1 and restart
intervals in lossless scans raise honestly). Sequential DCT frames
decode at 8-bit AND 12-bit precision (round 11 — pq=1 16-bit quant
tables, 2^(P-1) level shift, exact chroma-center handling); the
progressive scan logic is 8-bit-validated only, so 12-bit SOF2
raises. Huffman entropy coding, grayscale or YCbCr with any JFIF
sampling factors (4:4:4, 4:2:2, 4:2:0 — generic h/v factor handling),
DRI/RSTn restart intervals, 0xFF00 byte-stuffing. Arithmetic coding
and hierarchical modes raise ValueError so
``multimodal.sniffing_decoder`` falls back to the stub rather than
mis-decoding (the PPM-maxval rule).

Performance contract: this is the REFERENCE decoder for the
multimodal slot-in — entropy decode is a per-symbol Python loop
(O(coefficients), fine at test scale); the IDCT and color transform
are vectorized numpy over all blocks at once. A production cluster
replaces the whole callable with a native codec; everything around it
(Arrow batching, schema, NULL degradation) is the real plumbing.

Decoder structure follows the spec, not any library: marker segment
parse -> canonical Huffman tables (code lengths + symbols, MSB-first)
-> MCU scan with per-component DC predictors -> dequant + zigzag ->
separable IDCT (8x8 DCT-III basis matmul) -> plane upsample ->
BT.601/JFIF YCbCr->RGB.
"""

from __future__ import annotations

import numpy as np

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# 8x8 IDCT basis: spatial = A @ coeff @ A.T with
# A[x, u] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.array([
    [
        (np.sqrt(0.5) if u == 0 else 1.0) / 2.0
        * np.cos((2 * x + 1) * u * np.pi / 16.0)
        for u in range(8)
    ]
    for x in range(8)
])


class _Bits:
    """MSB-first bit reader over the entropy-coded segment with
    0xFF00 un-stuffing; RSTn markers are consumed by the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker reached: the spec pads with 1-bits; feeding
                # 0xFF without consuming keeps any trailing reads legal
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> None:
        self.acc = 0
        self.n = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman: {(length, code) -> symbol} (T.81 Annex C)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(bits: _Bits, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude-category sign extension (T.81 F.2.2.1)."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_planes(payload: bytes, with_mode: bool = False):
    """Decode a baseline (SOF0/1), progressive (SOF2), or lossless
    (SOF3) JPEG to per-component float planes in [0, 255] at full
    image resolution (chroma nearest-upsampled; lossless samples
    scaled by 255/(2^P - 1) so every precision lands on the shared
    plane contract). Returns (planes, width, height) with planes a
    list of HxW float64 arrays; with_mode=True appends the coding mode
    ('dct' | 'dct12' | 'lossless') so downstream color-space decisions
    can tell a YCbCr DCT scan (and its exact chroma center) from a
    lossless scan (which T.81 leaves color-space-free)."""
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    progressive = False
    lossless = False
    precision = 8
    seen_scan = False
    data = payload

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad the space
        # before a marker code — consume them so a padded stream doesn't
        # mis-parse the fill byte as the marker (ADVICE r9).
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7):
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(data[pos:pos + 2], "big")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq not in (0, 1):
                    raise ValueError("JPEG: invalid quant table precision")
                # pq=1: 16-bit big-endian table values (12-bit frames)
                tbl = np.frombuffer(
                    seg, dtype=np.uint8 if pq == 0 else ">u2",
                    count=64, offset=i + 1,
                ).astype(np.float64)
                q = np.zeros(64, dtype=np.float64)
                q[ZIGZAG] = tbl
                qt[tq] = q.reshape(8, 8)
                i += 65 + 64 * pq
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                counts = list(seg[i + 1:i + 17])
                nsym = sum(counts)
                syms = seg[i + 17:i + 17 + nsym]
                tbl = _build_huffman(counts, syms)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                i += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1/2 DCT, SOF3 lossless
            lossless = marker == 0xC3
            precision = seg[0]
            progressive = marker == 0xC2
            if lossless:
                if not 2 <= precision <= 16:
                    raise ValueError("JPEG: lossless precision out of range")
            elif precision == 12:
                # 12-bit extended sequential (SOF1) decodes for real
                # (round 11); progressive scan logic is 8-bit-validated
                # only, so 12-bit SOF2 stays an honest raise
                if progressive:
                    raise ValueError("JPEG: 12-bit progressive unsupported")
            elif precision != 8:
                raise ValueError(
                    f"JPEG: {precision}-bit DCT precision unsupported"
                )
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            if lossless and any(c["h"] != 1 or c["v"] != 1 for c in comps):
                raise ValueError("JPEG: lossless sampling factors unsupported")
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"JPEG: SOF{marker - 0xC0} (non-baseline) unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            scan_ids = [
                (seg[1 + 2 * s], seg[2 + 2 * s] >> 4, seg[2 + 2 * s] & 0x0F)
                for s in range(ns)
            ]
            if lossless:
                if len(scan_ids) != len(comps):
                    raise ValueError("JPEG: lossless multi-scan unsupported")
                if restart_interval:
                    raise ValueError(
                        "JPEG: lossless restart intervals unsupported"
                    )
                sel = seg[1 + 2 * ns]  # Ss field = predictor selector
                pt = seg[3 + 2 * ns] & 0x0F  # Al field = point transform
                tabs = {cs: d for cs, d, _a in scan_ids}
                planes = _decode_lossless_scan(
                    data, pos + seglen, comps, tabs, huff_dc,
                    width, height, precision, sel, pt,
                )
                res = (planes, width, height)
                return (*res, "lossless") if with_mode else res
            if not progressive:
                scan_map = {cs: (d, a) for cs, d, a in scan_ids}
                pos += seglen
                res = _decode_scan(
                    data, pos, comps, scan_map, qt, huff_dc, huff_ac,
                    width, height, restart_interval, precision,
                )
                mode = "dct12" if precision == 12 else "dct"
                return (*res, mode) if with_mode else res
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if "coef" not in comps[0]:
                _init_progressive_coefs(comps, width, height)
            by_id = {c["id"]: c for c in comps}
            scan_comps = []
            for cs, d, a in scan_ids:
                c = by_id[cs]
                c["dc_tab"], c["ac_tab"] = d, a
                scan_comps.append(c)
            pos = _decode_progressive_scan(
                data, pos + seglen, scan_comps, ss, se,
                ahal >> 4, ahal & 0x0F, huff_dc, huff_ac, restart_interval,
            )
            seen_scan = True
            continue
        # APPn/COM and anything else: skip
        pos += seglen

    if progressive and seen_scan:
        # zigzag int coefficients -> natural-order float blocks
        for c in comps:
            bh, bw = c["coef"].shape[:2]
            nat = np.zeros((bh, bw, 64), dtype=np.float64)
            nat[..., ZIGZAG] = c["coef"]
            c["coef"] = nat.reshape(bh, bw, 8, 8)
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        res = _planes_from_coefs(comps, qt, width, height, hmax, vmax)
        return (*res, "dct") if with_mode else res
    raise ValueError("JPEG: no SOS marker")


LOSSLESS_MAX_SAMPLES = 2_000_000


def _decode_lossless_scan(data, pos, comps, tabs, huff_dc,
                          width, height, precision, sel, pt):
    """Decode a lossless (SOF3) scan per T.81 Annex H: one
    Huffman-coded difference per sample (DC-class tables; category 16
    means diff=32768 with NO extra bits, H.2), prediction in the
    point-transformed domain — default 2^(P-Pt-1) for the scan's first
    sample, left (Ra) along the first line, above (Rb) down the first
    column, the selected predictor 1-7 elsewhere — and modulo-2^16
    reconstruction (H.1.2.1). Components interleave one sample per MCU
    (all sampling factors are 1x1, enforced at SOF). Returns planes
    scaled to the shared [0, 255] float contract."""
    if not 1 <= sel <= 7:
        raise ValueError("JPEG: invalid lossless predictor")
    # Perf envelope (ADVICE r11): this scan is a per-sample Python
    # Huffman loop, unlike the vectorized DCT path — a multi-megapixel
    # lossless payload would stall a mapInPandas batch for minutes.
    # Cap at ~2M samples (seconds at worst); larger images raise so
    # sniffing_decoder degrades to the deterministic stub instead.
    if height * width * len(comps) > LOSSLESS_MAX_SAMPLES:
        raise ValueError("JPEG: lossless image exceeds decode size cap")
    bits = _Bits(data, pos)
    try:
        tables = [huff_dc[tabs[c["id"]]] for c in comps]
    except KeyError as exc:
        raise ValueError("JPEG: lossless scan references missing table") from exc
    planes = [np.zeros((height, width), dtype=np.int64) for _ in comps]
    default = 1 << (precision - pt - 1)
    for y in range(height):
        for x in range(width):
            for ci, table in enumerate(tables):
                p = planes[ci]
                t = _huff_decode(bits, table)
                if t == 16:
                    diff = 32768
                elif t:
                    diff = _extend(bits.bits(t), t)
                else:
                    diff = 0
                if y == 0:
                    px = default if x == 0 else int(p[0, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    ra = int(p[y, x - 1])
                    rb = int(p[y - 1, x])
                    rc = int(p[y - 1, x - 1])
                    if sel == 1:
                        px = ra
                    elif sel == 2:
                        px = rb
                    elif sel == 3:
                        px = rc
                    elif sel == 4:
                        px = ra + rb - rc
                    elif sel == 5:
                        px = ra + ((rb - rc) >> 1)
                    elif sel == 6:
                        px = rb + ((ra - rc) >> 1)
                    else:
                        px = (ra + rb) >> 1
                p[y, x] = (px + diff) & 0xFFFF
    maxval = (1 << precision) - 1
    return [
        np.clip((p << pt).astype(np.float64) * (255.0 / maxval), 0.0, 255.0)
        for p in planes
    ]


def _init_progressive_coefs(comps, width, height):
    """Allocate per-component coefficient storage (zigzag order,
    integer — successive-approximation refinement is bitwise) plus the
    block-grid geometry both scan orders need: the MCU-padded grid for
    interleaved scans and the component's own ceil(size/8) grid for
    non-interleaved ones (T.81 A.2.2/A.2.3 — non-interleaved scans do
    NOT cover MCU padding blocks)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    for c in comps:
        c["coef"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
        cw = -(-(width * c["h"]) // hmax)   # component pixel width
        ch = -(-(height * c["v"]) // vmax)  # component pixel height
        c["nbx"] = -(-cw // 8)
        c["nby"] = -(-ch // 8)
        c["mcux"], c["mcuy"] = mcux, mcuy


def _scan_units(scan_comps):
    """Yield the scan's data units in T.81 order: interleaved scans
    walk the MCU grid with h*v blocks per component per MCU;
    single-component scans walk the component's own block grid in
    raster order, one block per unit (each unit is one restart
    interval's counting step either way)."""
    if len(scan_comps) > 1:
        mcux, mcuy = scan_comps[0]["mcux"], scan_comps[0]["mcuy"]
        for my in range(mcuy):
            for mx in range(mcux):
                yield [
                    (c, my * c["v"] + by, mx * c["h"] + bx)
                    for c in scan_comps
                    for by in range(c["v"])
                    for bx in range(c["h"])
                ]
    else:
        c = scan_comps[0]
        for by in range(c["nby"]):
            for bx in range(c["nbx"]):
                yield [(c, by, bx)]


def _decode_progressive_scan(data, pos, scan_comps, ss, se, ah, al,
                             huff_dc, huff_ac, restart_interval):
    """Decode ONE progressive scan's entropy-coded segment into the
    components' zigzag integer coefficient arrays (T.81 Annex G.2) and
    return the position of the marker that ends the segment. DC scans
    (Ss=Se=0) may interleave components; AC scans (Ss>=1) are
    single-component by spec. Ah=0 is a first scan at approximation
    level Al; Ah>0 is a refinement adding bit Al."""
    if ss == 0:
        if se != 0:
            raise ValueError("JPEG: invalid progressive DC scan (Se != 0)")
    else:
        if len(scan_comps) != 1 or se < ss or se > 63:
            raise ValueError("JPEG: invalid progressive AC scan")

    bits = _Bits(data, pos)
    for c in scan_comps:
        c["pred"] = 0
    eobrun = 0
    unit_count = 0
    for unit in _scan_units(scan_comps):
        if restart_interval and unit_count and unit_count % restart_interval == 0:
            bits.align_to_marker()
            if not (0xD0 <= bits.data[bits.pos + 1] <= 0xD7):
                raise ValueError("JPEG: expected RSTn marker")
            bits.pos += 2
            for c in scan_comps:
                c["pred"] = 0
            eobrun = 0
        for c, by, bx in unit:
            coef = c["coef"][by, bx]
            if ss == 0:
                if ah == 0:  # DC first scan (G.2.1)
                    t = _huff_decode(bits, huff_dc[c["dc_tab"]])
                    diff = _extend(bits.bits(t), t) if t else 0
                    c["pred"] += diff
                    coef[0] = c["pred"] << al
                else:  # DC refinement: one bit per block
                    if bits.bit():
                        coef[0] |= 1 << al
            elif ah == 0:  # AC first scan (G.2.2)
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                act = huff_ac[c["ac_tab"]]
                while k <= se:
                    rs = _huff_decode(bits, act)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1  # includes current block
                        if r:
                            eobrun += bits.bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG: AC run overflow")
                    coef[k] = _extend(bits.bits(s), s) << al
                    k += 1
            else:  # AC refinement (G.2.2, successive approximation)
                eobrun = _ac_refine_block(
                    bits, huff_ac[c["ac_tab"]], coef, ss, se, al, eobrun
                )
        unit_count += 1

    # the entropy segment ends at the first marker that is neither a
    # stuffed 0x00 nor an RSTn (robust to the bit reader's lookahead)
    p = pos
    while p + 1 < len(data):
        if (
            data[p] == 0xFF
            and data[p + 1] != 0x00
            and not (0xD0 <= data[p + 1] <= 0xD7)
        ):
            break
        p += 1
    return p


def _ac_refine_block(bits, act, coef, ss, se, al, eobrun):
    """One block of an AC successive-approximation refinement scan
    (T.81 G.2.2 / figure G.7 semantics): already-nonzero coefficients
    consume a correction bit wherever the scan passes over them;
    zero-history coefficients are created with magnitude 1 at bit Al.
    The sign conventions are two's complement — Python ints share C's
    bitwise behavior here, so (v & p1) tests "bit Al already set" for
    negative values too."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(bits, act)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + (bits.bits(r) if r else 0)
                    break
                # r == 15 (ZRL): pass over 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("JPEG: refinement magnitude must be 1")
                newval = p1 if bits.bit() else m1
            while k <= se:
                v = int(coef[k])
                if v != 0:
                    if bits.bit() and (v & p1) == 0:
                        coef[k] = v + (p1 if v >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                coef[k] = newval
            k += 1
    if eobrun > 0:
        # the block's remaining coefficients still carry correction
        # bits for every nonzero-history position
        while k <= se:
            v = int(coef[k])
            if v != 0:
                if bits.bit() and (v & p1) == 0:
                    coef[k] = v + (p1 if v >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(data, pos, comps, scan_map, qt, huff_dc, huff_ac,
                 width, height, restart_interval, precision=8):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    for c in comps:
        bw = mcux * c["h"]
        bh = mcuy * c["v"]
        c["coef"] = np.zeros((bh, bw, 8, 8), dtype=np.float64)
        c["dc_tab"], c["ac_tab"] = scan_map[c["id"]]
        c["pred"] = 0

    bits = _Bits(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bits.align_to_marker()
                m = bits.data[bits.pos + 1]
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError("JPEG: expected RSTn marker")
                bits.pos += 2
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                dct = huff_dc[c["dc_tab"]]
                act = huff_ac[c["ac_tab"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.float64)
                        t = _huff_decode(bits, dct)
                        diff = _extend(bits.bits(t), t) if t else 0
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(bits, act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC run overflow")
                            blk[k] = _extend(bits.bits(s), s)
                            k += 1
                        out = np.zeros(64, dtype=np.float64)
                        out[ZIGZAG] = blk
                        c["coef"][
                            my * c["v"] + by, mx * c["h"] + bx
                        ] = out.reshape(8, 8)
            mcu_count += 1

    return _planes_from_coefs(comps, qt, width, height, hmax, vmax, precision)


def _planes_from_coefs(comps, qt, width, height, hmax, vmax, precision=8):
    """Shared tail of both decode modes: dequant, vectorized separable
    IDCT over every block at once, JFIF nearest upsample, MCU-padding
    crop. ``comps[i]["coef"]`` is (bh, bw, 8, 8) natural-order float."""
    # level shift is 2^(P-1) (T.81 A.3.1); planes land on the shared
    # [0, 255] float contract — 12-bit scales by 255/4095, 8-bit is
    # untouched (bit-compatible with the pre-round-11 path)
    center = float(1 << (precision - 1))
    maxval = float((1 << precision) - 1)
    planes = []
    for c in comps:
        coef = c["coef"] * qt[c["tq"]]  # dequant, broadcast over blocks
        spatial = np.einsum("xu,bcuv,yv->bcxy", _A, coef, _A) + center
        bh, bw = coef.shape[:2]
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        plane = np.clip(plane[:height, :width], 0.0, maxval)
        if precision != 8:
            plane = plane * (255.0 / maxval)
        planes.append(plane)
    return planes, width, height


def decode_jpeg_rgb(payload: bytes) -> np.ndarray:
    """JPEG -> HxWx3 float64 RGB in [0, 1]. DCT 3-component scans are
    JFIF full-range BT.601 YCbCr; LOSSLESS 3-component scans are taken
    as RGB directly (T.81 lossless carries no color-transform contract
    — component-wise identity is the DNG/Adobe-transform-0 convention,
    and applying the YCbCr matrix to RGB samples would silently
    mis-color, the exact failure the PPM-maxval rule forbids).
    Grayscale replicates either way."""
    planes, width, height, mode = decode_jpeg_planes(payload, with_mode=True)
    if len(planes) == 1:
        y = planes[0]
        rgb = np.dstack([y, y, y])
    elif len(planes) == 3:
        if mode == "lossless":
            rgb = np.dstack(planes)
        else:
            # chroma neutral is 2^(P-1) in the native range; the planes
            # are already scaled to [0,255], so the 12-bit center maps
            # to 2048 * 255/4095, not exactly 128
            cc = 128.0 if mode == "dct" else 2048.0 * 255.0 / 4095.0
            y, cb, cr = planes
            r = y + 1.402 * (cr - cc)
            g = y - 0.344136 * (cb - cc) - 0.714136 * (cr - cc)
            b = y + 1.772 * (cb - cc)
            rgb = np.clip(np.dstack([r, g, b]), 0.0, 255.0)
    else:
        raise ValueError(f"JPEG: {len(planes)}-component scans unsupported")
    return rgb / 255.0
