"""CCITT Group 4 (ITU-T T.6, "MMR") bilevel decoder — pure from-spec
implementation for TIFF Compression 4, the encoding scanned-document
corpora overwhelmingly use (every fax-era archival TIFF).

Public sources: ITU-T Recommendation T.6 (two-dimensional coding
scheme), ITU-T T.4 (the white/black run-length code tables G4 reuses
for horizontal mode), and TIFF 6.0 section 11 (how G4 blocks sit in
strips/tiles). No reference-repo parity: the reference engine
(aws-samples/emr-trino-autoscale) has no media path at all; this module
extends the engine's multimodal tier (SURVEY.md §2.10, X6).

Decoding model (T.6 §2): every line is coded against the line above it
(the first line against an imaginary all-white line) as a sequence of
vertical (a1 within ±3 of b1), pass (a0 jumps to b2), and horizontal
(two explicit T.4 run lengths) modes over CHANGING ELEMENTS —
positions where the line flips color. Cost is therefore proportional
to ink transitions, not pixels: a mostly-blank A4 page decodes in
microseconds even in Python, which is why this decoder (unlike the
lossless-JPEG per-sample path) needs no size cap.

The decoder returns a uint8 {0,1} matrix with 1 = BLACK ink; the TIFF
layer maps that through PhotometricInterpretation (0 = WhiteIsZero is
the fax convention)."""

from __future__ import annotations

import numpy as np

# --- T.4 run-length code tables (terminating 0-63, makeup 64-1728,
# shared extended makeup 1792-2560). Written from the published
# tables; each entry is (bit_length, code_value) -> run.

_WHITE_CODES: dict[tuple[int, int], int] = {}
_BLACK_CODES: dict[tuple[int, int], int] = {}


def _load(table: dict, spec: str) -> None:
    for line in spec.strip().splitlines():
        run, code = line.split()
        table[(len(code), int(code, 2))] = int(run)


_load(_WHITE_CODES, """
0 00110101
1 000111
2 0111
3 1000
4 1011
5 1100
6 1110
7 1111
8 10011
9 10100
10 00111
11 01000
12 001000
13 000011
14 110100
15 110101
16 101010
17 101011
18 0100111
19 0001100
20 0001000
21 0010111
22 0000011
23 0000100
24 0101000
25 0101011
26 0010011
27 0100100
28 0011000
29 00000010
30 00000011
31 00011010
32 00011011
33 00010010
34 00010011
35 00010100
36 00010101
37 00010110
38 00010111
39 00101000
40 00101001
41 00101010
42 00101011
43 00101100
44 00101101
45 00000100
46 00000101
47 00001010
48 00001011
49 01010010
50 01010011
51 01010100
52 01010101
53 00100100
54 00100101
55 01011000
56 01011001
57 01011010
58 01011011
59 01001010
60 01001011
61 00110010
62 00110011
63 00110100
64 11011
128 10010
192 010111
256 0110111
320 00110110
384 00110111
448 01100100
512 01100101
576 01101000
640 01100111
704 011001100
768 011001101
832 011010010
896 011010011
960 011010100
1024 011010101
1088 011010110
1152 011010111
1216 011011000
1280 011011001
1344 011011010
1408 011011011
1472 010011000
1536 010011001
1600 010011010
1664 011000
1728 010011011
""")

_load(_BLACK_CODES, """
0 0000110111
1 010
2 11
3 10
4 011
5 0011
6 0010
7 00011
8 000101
9 000100
10 0000100
11 0000101
12 0000111
13 00000100
14 00000111
15 000011000
16 0000010111
17 0000011000
18 0000001000
19 00001100111
20 00001101000
21 00001101100
22 00000110111
23 00000101000
24 00000010111
25 00000011000
26 000011001010
27 000011001011
28 000011001100
29 000011001101
30 000001101000
31 000001101001
32 000001101010
33 000001101011
34 000011010010
35 000011010011
36 000011010100
37 000011010101
38 000011010110
39 000011010111
40 000001101100
41 000001101101
42 000011011010
43 000011011011
44 000001010100
45 000001010101
46 000001010110
47 000001010111
48 000001100100
49 000001100101
50 000001010010
51 000001010011
52 000000100100
53 000000110111
54 000000111000
55 000000100111
56 000000101000
57 000001011000
58 000001011001
59 000000101011
60 000000101100
61 000001011010
62 000001100110
63 000001100111
64 0000001111
128 000011001000
192 000011001001
256 000001011011
320 000000110011
384 000000110100
448 000000110101
512 0000001101100
576 0000001101101
640 0000001001010
704 0000001001011
768 0000001001100
832 0000001001101
896 0000001110010
960 0000001110011
1024 0000001110100
1088 0000001110101
1152 0000001110110
1216 0000001110111
1280 0000001010010
1344 0000001010011
1408 0000001010100
1472 0000001010101
1536 0000001011010
1600 0000001011011
1664 0000001100100
1728 0000001100101
""")

# extended makeup codes (T.4 table 3: shared by both colors)
for _tbl in (_WHITE_CODES, _BLACK_CODES):
    _load(_tbl, """
1792 00000001000
1856 00000001100
1920 00000001101
1984 000000010010
2048 000000010011
2112 000000010100
2176 000000010101
2240 000000010110
2304 000000010111
2368 000000011100
2432 000000011101
2496 000000011110
2560 000000011111
""")

_MAX_CODE_LEN = 13

# byte bit-reversal table for TIFF FillOrder 2 (LSB-first fill)
_REVERSE = bytes(int(f"{b:08b}"[::-1], 2) for b in range(256))


class _Bits:
    """MSB-first bit reader with explicit exhaustion errors."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def peek(self, k: int) -> int:
        """Next k bits left-aligned into an int, zero-padded past the
        end (safe: every real code is validated by table lookup)."""
        out = 0
        for i in range(k):
            p = self.pos + i
            if p < self.n:
                out = (out << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
            else:
                out <<= 1
        return out

    def take(self, k: int) -> None:
        self.pos += k

    def exhausted(self) -> bool:
        return self.pos >= self.n


def _read_run(bits: _Bits, table: dict) -> int:
    """One complete T.4 run length: zero or more makeup codes, then a
    terminating code (< 64)."""
    total = 0
    while True:
        for ln in range(2, _MAX_CODE_LEN + 1):
            run = table.get((ln, bits.peek(ln)))
            if run is not None:
                bits.take(ln)
                total += run
                if run < 64:
                    return total
                break
        else:
            raise ValueError("G4: invalid run-length code")


def g4_decode(data: bytes, width: int, rows: int) -> np.ndarray:
    """Decode one T.6-coded block (a TIFF strip or tile) into a
    (rows, width) uint8 matrix, 1 = black. ``data`` must be MSB-first
    (TIFF FillOrder 1); callers with FillOrder 2 pre-reverse via
    :func:`reverse_fill_order`. Decoding stops at EOFB or after
    ``rows`` lines, whichever comes first; missing EOFB is tolerated
    (TIFF writers routinely omit it — spec says readers should not
    require it)."""
    if width <= 0 or rows <= 0:
        raise ValueError("G4: non-positive geometry")
    bits = _Bits(data)
    out = np.zeros((rows, width), dtype=np.uint8)
    # reference line as its changing-element positions (alternating
    # white->black, black->white), terminated by two sentinels
    ref = [width, width]
    for y in range(rows):
        cur: list[int] = []
        a0 = -1
        color = 0  # 0 = white, 1 = black
        ri = 0  # index into ref of the next transition > a0 with
        #         the right parity (white->black at even positions)
        while a0 < width:
            if bits.exhausted():
                if y == 0 and not cur and a0 <= 0:
                    raise ValueError("G4: empty coded block")
                # tolerate truncation at a line boundary: remaining
                # lines stay white (real-world scanner behavior)
                break
            # locate b1: first changing element on the reference line
            # STRICTLY right of a0 (at line start a0 = -1, so a
            # transition at 0 qualifies) that changes TO the color
            # opposite a0's color — even ref indices are white->black,
            # odd are black->white, so the parity is just `color`
            ri = color
            while ri < len(ref) and ref[ri] <= a0:
                ri += 2
            b1 = ref[ri] if ri < len(ref) else width
            b2 = ref[ri + 1] if ri + 1 < len(ref) else width
            # mode decode (T.6 table 1), longest-prefix-unambiguous
            if bits.peek(1) == 1:  # V0
                bits.take(1)
                a1 = b1
            elif bits.peek(3) == 0b011:  # VR1
                bits.take(3)
                a1 = b1 + 1
            elif bits.peek(3) == 0b010:  # VL1
                bits.take(3)
                a1 = b1 - 1
            elif bits.peek(3) == 0b001:  # horizontal
                bits.take(3)
                first = _read_run(bits, _BLACK_CODES if color else _WHITE_CODES)
                second = _read_run(bits, _WHITE_CODES if color else _BLACK_CODES)
                start = a0 if a0 > 0 else 0
                a1 = start + first
                a2 = a1 + second
                cur.append(min(a1, width))
                cur.append(min(a2, width))
                a0 = a2
                continue
            elif bits.peek(4) == 0b0001:  # pass
                bits.take(4)
                a0 = b2
                continue
            elif bits.peek(6) == 0b000011:  # VR2
                bits.take(6)
                a1 = b1 + 2
            elif bits.peek(6) == 0b000010:  # VL2
                bits.take(6)
                a1 = b1 - 2
            elif bits.peek(7) == 0b0000011:  # VR3
                bits.take(7)
                a1 = b1 + 3
            elif bits.peek(7) == 0b0000010:  # VL3
                bits.take(7)
                a1 = b1 - 3
            elif bits.peek(12) == 0b000000000001:  # EOL -> EOFB
                # two EOLs terminate the block (T.6 EOFB); anything
                # else starting 000000000001 is out of spec here
                bits.take(12)
                if bits.peek(12) == 0b000000000001:
                    bits.take(12)
                return out
            else:
                raise ValueError("G4: invalid mode code")
            if a1 < 0 or a1 > width:
                raise ValueError("G4: changing element out of bounds")
            cur.append(a1)
            a0 = a1
            color ^= 1
        # paint the decoded line: transitions alternate white->black
        for i in range(0, len(cur) - (len(cur) % 2), 2):
            s = cur[i]
            e = cur[i + 1] if i + 1 < len(cur) else width
            if s < width:
                out[y, s:min(e, width)] = 1
        if len(cur) % 2 == 1 and cur[-1] < width:
            out[y, cur[-1]:] = 1
        ref = cur + [width, width]
    return out


def reverse_fill_order(data: bytes) -> bytes:
    """TIFF FillOrder 2 stores bits LSB-first within each byte;
    reverse to the MSB-first order the decoder consumes."""
    return bytes(_REVERSE[b] for b in data)
