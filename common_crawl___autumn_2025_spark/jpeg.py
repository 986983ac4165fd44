"""Pure-stdlib/numpy JPEG codec (baseline + progressive, subsampled).

A 100 TB image corpus is dominated by JPEG, and this runtime ships no
image library (no Pillow/opencv/libjpeg binding), so the engine
implements the subset real crawls actually contain:

- **encode**: sequential DCT (SOF0) or progressive DCT (SOF2), 8-bit,
  YCbCr at 4:4:4, 4:2:2 or 4:2:0 chroma subsampling, standard Annex-K
  quantization tables scaled by a libjpeg-style quality factor, JFIF
  container. Sequential streams use the standard Annex-K Huffman
  tables; progressive streams use per-scan optimal Huffman tables
  (two-pass frequency gathering) because Annex-K tables have no
  codes for the EOBn run-length symbols progressive scans emit.
- **decode**: any Huffman-coded 8-bit DCT stream — baseline (SOF0),
  extended sequential (SOF1) and progressive (SOF2); 1 or 3
  components; arbitrary integer sampling factors (4:4:4 / 4:2:2 /
  4:2:0 / ...); interleaved and non-interleaved (multi-scan) scans;
  spectral selection + successive approximation with EOB runs;
  restart markers. Arithmetic coding, 12-bit precision, lossless and
  hierarchical processes raise ``ValueError`` — callers flag the row
  (see ``operators/multimodal.py``) rather than crash. Truncated or
  corrupt streams raise ``ValueError`` (never IndexError): every
  entropy-segment read is bounds-checked.

All table constants are from the public JPEG spec (ITU-T T.81,
Annex K); the progressive coding procedures follow T.81 Annexes F/G.
The DCT runs as one numpy matrix product over all blocks of a
component at once; only the entropy coding is a Python loop, which is
fine for the engine's Arrow-batched, per-image use (decode work is
per-row inside ``mapInPandas``, never driver-side).

Reference analog: the reference stores fetched binary payloads
verbatim (``response.content``, ``Data Modelling/Scrape_Utils.py:60``)
and never decodes; decoding with a per-row PSNR invariant is
engine-new surface required by ``BASELINE.json:input_hint``.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
UNZIGZAG = np.argsort(ZIGZAG)

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)

QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32,
    dtype=np.float64,
)

DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# orthonormal 8x8 DCT-II basis: DCT = A @ X @ A.T, IDCT = A.T @ X @ A
_k = np.arange(8).reshape(-1, 1)
_n = np.arange(8).reshape(1, -1)
DCT_A = np.sqrt(2.0 / 8.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
DCT_A[0, :] = np.sqrt(1.0 / 8.0)

#: per-component (Hi, Vi) sampling factors by common name
SAMPLINGS = {
    "444": ((1, 1), (1, 1), (1, 1)),
    "422": ((2, 1), (1, 1), (1, 1)),
    "420": ((2, 2), (1, 1), (1, 1)),
}


def scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of a base table (natural order)."""
    quality = min(100, max(1, int(quality)))
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    return np.clip(np.floor((base * scale + 50.0) / 100.0), 1.0, 255.0)


# ---------------------------------------------------------------------------
# color + blocking
# ---------------------------------------------------------------------------

def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) multiple-of-8 plane -> (n_blocks, 8, 8), raster order."""
    hh, ww = plane.shape
    return (
        plane.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, hh: int, ww: int) -> np.ndarray:
    return (
        blocks.reshape(hh // 8, ww // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(hh, ww)
    )


# ---------------------------------------------------------------------------
# huffman
# ---------------------------------------------------------------------------

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG construction."""
    out, code, idx = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


def _optimal_table(freq: np.ndarray) -> tuple[list[int], list[int]]:
    """Length-limited (<=16 bit) canonical Huffman table from symbol
    frequencies — the T.81 Annex K.2 / libjpeg ``jchuff`` procedure,
    including the reserved pseudo-symbol that keeps the all-ones code
    unassigned. Returns (bits[16], vals)."""
    n = 257
    f = [0] * n
    for i, v in enumerate(freq):
        f[i] = int(v)
    f[256] = 1  # pseudo-symbol: reserves the all-1s code
    codesize = [0] * n
    others = [-1] * n
    while True:
        c1, v1 = -1, None
        for i in range(n):
            if f[i] > 0 and (v1 is None or f[i] <= v1):
                v1, c1 = f[i], i
        c2, v2 = -1, None
        for i in range(n):
            if f[i] > 0 and i != c1 and (v2 is None or f[i] <= v2):
                v2, c2 = f[i], i
        if c2 < 0:
            break
        f[c1] += f[c2]
        f[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(n):
        if codesize[i]:
            if codesize[i] > 32:
                raise ValueError("huffman code length overflow")
            bits[codesize[i]] += 1
    for i in range(32, 16, -1):  # limit code lengths to 16
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the pseudo-symbol's slot
    vals = [
        sym
        for size in range(1, 17)
        for sym in range(256)
        if codesize[sym] == size
    ]
    return bits[1:17], vals


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


class _BitReader:
    """Reads one entropy-coded segment with 0xFF00 unstuffing; restart
    markers (FFD0-FFD7) reset the reader to a byte boundary via
    ``sync_restart``; any other marker ends the scan. All reads are
    bounds-checked: a stream that ends mid-scan raises ``ValueError``
    ("truncated JPEG"), never IndexError."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG: scan data ends without a marker")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG: dangling 0xFF at end of scan")
            nxt = d[self.pos + 1]
            if nxt == 0x00:  # stuffed data byte
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                self.marker = nxt
                raise _ScanEnd()
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def sync_restart(self) -> None:
        """Consume an expected RSTn marker and realign."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if self.marker is None:
            # marker not yet hit while draining pad bits — find it
            while True:
                if self.pos + 1 >= len(d):
                    raise ValueError(
                        "truncated JPEG: restart marker expected"
                    )
                if d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
                    break
                self.pos += 1
            self.marker = d[self.pos + 1]
            self.pos += 2
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError("expected restart marker")
        self.marker = None


class _ScanEnd(Exception):
    pass


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


# ---------------------------------------------------------------------------
# encoder — coefficient preparation shared by sequential + progressive
# ---------------------------------------------------------------------------

def _component_coeffs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) multiple-of-8 float plane -> (n_by, n_bx, 64) int32
    quantized coefficients in zigzag order."""
    hh, ww = plane.shape
    blocks = _to_blocks(plane) - 128.0
    coeffs = np.einsum("ij,njk,lk->nil", DCT_A, blocks, DCT_A)
    quantized = np.round(coeffs / q.reshape(8, 8)).astype(np.int32)
    return quantized.reshape(hh // 8, ww // 8, 64)[:, :, ZIGZAG]


class _Counter:
    """Symbol-frequency gathering emitter (progressive pass 1)."""

    def __init__(self):
        self.freq: dict[int, np.ndarray] = {}

    def symbol(self, tid: int, sym: int) -> None:
        tab = self.freq.get(tid)
        if tab is None:
            tab = self.freq[tid] = np.zeros(256, dtype=np.int64)
        tab[sym] += 1

    def bits(self, v: int, n: int) -> None:
        pass


class _ScanWriter:
    """Bit-writing emitter over per-table canonical code maps."""

    def __init__(self, codes: dict[int, dict[int, tuple[int, int]]]):
        self.bw = _BitWriter()
        self.codes = codes

    def symbol(self, tid: int, sym: int) -> None:
        code, length = self.codes[tid][sym]
        self.bw.write(code, length)

    def bits(self, v: int, n: int) -> None:
        if n:
            self.bw.write(v, n)


def _encode_block(bw: _BitWriter, zz, pred: int, dct_tab, act_tab) -> int:
    """Sequential full-band block encode; returns the new DC predictor."""
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    s = _category(diff)
    code, length = dct_tab[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = np.nonzero(zz[1:])[0]
    end = (last_nz[-1] + 2) if len(last_nz) else 1
    for k in range(1, end):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = act_tab[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = act_tab[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if end < 64:
        code, length = act_tab[0x00]  # EOB
        bw.write(code, length)
    return pred


def _mcu_block_order(comps, samp, mcus_y: int, mcus_x: int):
    """Interleaved MCU traversal: yields (ci, zz) in scan order."""
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (hi, vi) in enumerate(samp):
                for by in range(vi):
                    for bx in range(hi):
                        yield ci, comps[ci][my * vi + by, mx * hi + bx]


# --- progressive scan encoders (T.81 Annex G; cf. libjpeg jcphuff) ---------

def _enc_dc_first(em, order, tids, al: int, nc: int) -> None:
    pred = [0] * nc
    for ci, zz in order:
        v = int(zz[0]) >> al  # arithmetic shift, negatives round to -inf
        diff = v - pred[ci]
        pred[ci] = v
        s = _category(diff)
        em.symbol(tids[ci], s)
        if s:
            em.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _enc_dc_refine(em, order, al: int) -> None:
    for _, zz in order:
        em.bits((int(zz[0]) >> al) & 1, 1)


def _enc_ac_first(em, blocks, tid: int, ss: int, se: int, al: int) -> None:
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            em.symbol(tid, nbits << 4)
            em.bits(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0

    for zz in blocks:
        r = 0
        for k in range(ss, se + 1):
            t = int(zz[k])
            t2 = (-t if t < 0 else t) >> al
            if t2 == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                em.symbol(tid, 0xF0)
                r -= 16
            s = t2.bit_length()
            em.symbol(tid, (r << 4) | s)
            em.bits(t2 if t >= 0 else -t2 + (1 << s) - 1, s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine(em, blocks, tid: int, ss: int, se: int, al: int) -> None:
    eobrun = 0
    pend: list[int] = []  # correction bits owned by the pending EOB run

    def flush_eob():
        nonlocal eobrun, pend
        if eobrun > 0:
            nbits = eobrun.bit_length() - 1
            em.symbol(tid, nbits << 4)
            em.bits(eobrun & ((1 << nbits) - 1), nbits)
            eobrun = 0
        for b in pend:
            em.bits(b, 1)
        pend = []

    for zz in blocks:
        absv = [0] * (se + 1)
        eob = 0
        for k in range(ss, se + 1):
            t = int(zz[k])
            t = (-t if t < 0 else t) >> al
            absv[k] = t
            if t == 1:
                eob = k  # last newly-nonzero coefficient
        r = 0
        br_bits: list[int] = []  # correction bits since the last symbol
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            # ZRLs only when they cannot fold into the EOB run
            while r > 15 and k <= eob:
                flush_eob()
                em.symbol(tid, 0xF0)
                r -= 16
                for b in br_bits:
                    em.bits(b, 1)
                br_bits = []
            if t > 1:  # previously nonzero: correction bit only
                br_bits.append(t & 1)
                continue
            flush_eob()
            em.symbol(tid, (r << 4) | 1)
            em.bits(1 if int(zz[k]) >= 0 else 0, 1)
            for b in br_bits:
                em.bits(b, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            eobrun += 1
            pend.extend(br_bits)
            if eobrun == 0x7FFF or len(pend) > 937:
                flush_eob()
    flush_eob()


#: libjpeg-style progression script for 3 components:
#: (kind, comp, Ss, Se, Ah, Al) — comp None = all, interleaved
_PROGRESSION = [
    ("dc_first", None, 0, 0, 0, 1),
    ("ac_first", 0, 1, 5, 0, 2),
    ("ac_first", 1, 1, 63, 0, 1),
    ("ac_first", 2, 1, 63, 0, 1),
    ("ac_first", 0, 6, 63, 0, 2),
    ("ac_refine", 0, 1, 63, 2, 1),
    ("dc_refine", None, 0, 0, 1, 0),
    ("ac_refine", 0, 1, 63, 1, 0),
    ("ac_refine", 1, 1, 63, 1, 0),
    ("ac_refine", 2, 1, 63, 1, 0),
]


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _dht_seg(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    return _seg(0xFFC4, bytes([(tc << 4) | th] + bits) + bytes(vals))


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 98,
    subsampling: str = "444",
    progressive: bool = False,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a JFIF JPEG.

    ``subsampling``: "444" (default — favors fidelity over size for
    the small crawl payloads), "422" or "420" (the dominant real-web
    layout). ``progressive=True`` emits an SOF2 stream with the
    libjpeg-style 10-scan progression and per-scan optimal Huffman
    tables; the decoded pixels are bit-identical to the sequential
    encoding at the same quality/subsampling (same quantized
    coefficients, lossless entropy layer).

    Default quality 98: the engine's synthetic payloads carry
    Gaussian texture noise (sigma ~12), and 98 is the lowest standard
    scaling that keeps the decode-verify invariant's PSNR >= 40 dB
    with margin (measured min 43.3 dB over the record corpus; 95
    lands ~35.5 dB on this noise-heavy content)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8")
    if subsampling not in SAMPLINGS:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    samp = SAMPLINGS[subsampling]
    hmax = max(hi for hi, _ in samp)
    vmax = max(vi for _, vi in samp)
    h, w = pixels.shape[:2]
    qy = scaled_quant(QUANT_LUMA, quality)
    qc = scaled_quant(QUANT_CHROMA, quality)

    # pad to MCU multiples by edge replication, convert, downsample
    ph = -(-h // (8 * vmax)) * 8 * vmax
    pw = -(-w // (8 * hmax)) * 8 * hmax
    padded = np.pad(
        pixels.astype(np.float64), ((0, ph - h), (0, pw - w), (0, 0)), mode="edge"
    )
    ycc = _rgb_to_ycbcr(padded)
    comps = []
    for ci, ((hi, vi), q) in enumerate(zip(samp, (qy, qc, qc))):
        fy, fx = vmax // vi, hmax // hi
        plane = ycc[..., ci]
        if fy > 1 or fx > 1:  # box-mean chroma downsample
            plane = plane.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        comps.append(_component_coeffs(plane, q))
    mcus_y, mcus_x = ph // (8 * vmax), pw // (8 * hmax)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, b"\x00" + qy.astype(np.uint8)[ZIGZAG].tobytes())
    out += _seg(0xFFDB, b"\x01" + qc.astype(np.uint8)[ZIGZAG].tobytes())
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci, (hi, vi) in enumerate(samp):
        sof += struct.pack(">BBB", ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1)
    out += _seg(0xFFC2 if progressive else 0xFFC0, sof)

    if not progressive:
        dc_y = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        ac_y = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
        dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
        for tc_th, bits, vals in (
            (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
            (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ):
            out += _dht_seg(tc_th >> 4, tc_th & 0x0F, bits, vals)
        sos = b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
        out += _seg(0xFFDA, sos)
        tables = [(dc_y, ac_y), (dc_c, ac_c), (dc_c, ac_c)]
        bw = _BitWriter()
        pred = [0, 0, 0]
        for ci, zz in _mcu_block_order(comps, samp, mcus_y, mcus_x):
            pred[ci] = _encode_block(bw, zz, pred[ci], *tables[ci])
        out += bw.flush()
        out += b"\xff\xd9"
        return bytes(out)

    # progressive: per-scan optimal tables via a counting pass
    # non-interleaved AC scans cover only the component's true block
    # grid (ceil(ceil(dim*fi/fmax)/8)) — the MCU-padding blocks are
    # coded in the interleaved DC scan only (T.81 A.2.2/A.2.3)
    ac_grids = []
    for hi, vi in samp:
        yi = -(-h * vi // vmax)  # ceil(h*vi/vmax): component pixel dims
        xi = -(-w * hi // hmax)
        ac_grids.append((-(-yi // 8), -(-xi // 8)))
    for sc in _PROGRESSION:
        kind, ci, ss, se, ah, al = sc
        if kind.startswith("dc"):
            order = list(_mcu_block_order(comps, samp, mcus_y, mcus_x))
            tids = [0, 1, 1]
            if kind == "dc_first":
                cnt = _Counter()
                _enc_dc_first(cnt, order, tids, al, 3)
                tabs, dhts = {}, b""
                for tid in (0, 1):
                    bits, vals = _optimal_table(
                        cnt.freq.get(tid, np.zeros(256, np.int64))
                    )
                    tabs[tid] = _canonical_codes(bits, vals)
                    dhts += _dht_seg(0, tid, bits, vals)
                out += dhts
                em = _ScanWriter(tabs)
                _enc_dc_first(em, order, tids, al, 3)
                data = em.bw.flush()
            else:
                em = _ScanWriter({})
                _enc_dc_refine(em, order, al)
                data = em.bw.flush()
            sos = b"\x03" + bytes([1, 0x00, 2, 0x10, 3, 0x10])
            sos += bytes([ss, se, (ah << 4) | al])
        else:
            nby, nbx = ac_grids[ci]
            blocks = [
                comps[ci][by, bx]
                for by in range(nby)
                for bx in range(nbx)
            ]
            enc = _enc_ac_first if kind == "ac_first" else _enc_ac_refine
            cnt = _Counter()
            enc(cnt, blocks, 0, ss, se, al)
            bits, vals = _optimal_table(cnt.freq.get(0, np.zeros(256, np.int64)))
            out += _dht_seg(1, 0, bits, vals)
            em = _ScanWriter({0: _canonical_codes(bits, vals)})
            enc(em, blocks, 0, ss, se, al)
            data = em.bw.flush()
            sos = b"\x01" + bytes([ci + 1, 0x00])
            sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xFFDA, sos)
        out += data
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _Comp:
    """Per-component decode state: geometry + coefficient grid."""

    __slots__ = ("cid", "hi", "vi", "tq", "bx", "by", "bx_pad", "by_pad",
                 "coeff")

    def __init__(self, cid, hi, vi, tq):
        self.cid, self.hi, self.vi, self.tq = cid, hi, vi, tq


def _dec_dc_diff(br, dt) -> int:
    """Read one DC category + magnitude; category > 15 is corrupt."""
    s = br.read_symbol(dt)
    if s > 15:
        raise ValueError("bad DC category")
    return _extend(br.read(s), s) if s else 0


def _dec_block_full(br, zz, dt, at) -> int:
    """Sequential full-band block: returns the DC diff (caller predicts)."""
    diff = _dec_dc_diff(br, dt)
    k = 1
    while k < 64:
        rs = br.read_symbol(at)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC index overrun")
        zz[k] = _extend(br.read(s), s)
        k += 1
    return diff


def _dec_ac_first(br, zz, at, ss, se, al, eobrun) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.read_symbol(at)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.read(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC index overrun")
        zz[k] = _extend(br.read(s), s) << al
        k += 1
    return 0


def _dec_ac_refine(br, zz, at, ss, se, al, eobrun) -> int:
    """AC successive-approximation refinement (T.81 G.1.2.3 / jdphuff)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.read_symbol(at)
            r, s = rs >> 4, rs & 0x0F
            if s:
                if s != 1:
                    raise ValueError("bad newly-nonzero size in AC refine")
                newval = p1 if br.read(1) else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                newval = 0  # ZRL: skip 16 zero-history positions
            # advance over r zero coefficients, refining nonzero ones
            while k <= se:
                cur = int(zz[k])
                if cur != 0:
                    if br.read(1) and (cur & p1) == 0:
                        zz[k] = cur + (p1 if cur >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:  # rest of block: correction bits only
            cur = int(zz[k])
            if cur != 0 and br.read(1) and (cur & p1) == 0:
                zz[k] = cur + (p1 if cur >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _up2_axis(a: np.ndarray, axis: int) -> np.ndarray:
    """Factor-2 triangular ("fancy") upsample along one axis with the
    JFIF centered-sample positions: out[2i] = (3*p[i] + p[i-1]) / 4,
    out[2i+1] = (3*p[i] + p[i+1]) / 4, edges replicated — the
    libjpeg h2v1/h2v2 filter, ~3 dB better than replication on
    smooth chroma."""
    m = np.moveaxis(a, axis, 0)
    prev = np.concatenate([m[:1], m[:-1]], axis=0)
    nxt = np.concatenate([m[1:], m[-1:]], axis=0)
    out = np.empty((m.shape[0] * 2,) + m.shape[1:], dtype=np.float64)
    out[0::2] = (3.0 * m + prev) / 4.0
    out[1::2] = (3.0 * m + nxt) / 4.0
    return np.moveaxis(out, 0, axis)


def _find_marker(data: bytes, pos: int) -> int:
    """Position of the next non-RST, non-stuffed marker's 0xFF byte."""
    while pos + 1 < len(data):
        if (
            data[pos] == 0xFF
            and data[pos + 1] != 0x00
            and not (0xD0 <= data[pos + 1] <= 0xD7)
        ):
            return pos
        pos += 1
    raise ValueError("truncated JPEG: no marker after scan")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline or progressive JPEG to (h, w, 3) uint8 RGB
    (grayscale streams are replicated across channels). Supports
    arbitrary integer sampling factors (4:4:4/4:2:2/4:2:0/...),
    multi-scan sequential, spectral selection, successive
    approximation, EOB runs and restart markers. Raises ValueError on
    non-Huffman-DCT processes (arithmetic, lossless, hierarchical,
    12-bit) and on truncated/corrupt streams."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[_Comp] = []
    h = w = 0
    progressive = False
    restart_interval = 0
    mcus_x = mcus_y = 0
    hmax = vmax = 1
    saw_scan = False

    while True:
        if pos + 1 >= len(data):
            raise ValueError("truncated JPEG: no EOI")
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        while data[pos + 1] == 0xFF:  # optional fill bytes
            pos += 1
            if pos + 1 >= len(data):
                raise ValueError("truncated JPEG: fill bytes at end")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG: segment length missing")
        (length,) = struct.unpack(">H", data[pos : pos + 2])
        if length < 2 or pos + length > len(data):
            raise ValueError("truncated JPEG: segment exceeds data")
        payload = data[pos + 2 : pos + length]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                if p + 65 > len(payload):
                    raise ValueError("truncated DQT")
                tbl = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.float64)
                quant[tq] = tbl[UNZIGZAG]  # store natural order
                p += 65
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF{marker - 0xC0}); only "
                "Huffman-coded sequential/progressive DCT is implemented"
            )
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            if comps:
                raise ValueError("multiple frames not supported")
            progressive = marker == 0xC2
            if len(payload) < 6:
                raise ValueError("truncated SOF")
            precision, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError("only 1- or 3-component JPEG supported")
            if h == 0 or w == 0:
                raise ValueError("DNL-deferred dimensions not supported")
            for i in range(nc):
                cid, sf, tq = payload[6 + 3 * i : 9 + 3 * i]
                hi, vi = sf >> 4, sf & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("invalid sampling factors")
                comps.append(_Comp(cid, hi, vi, tq))
            hmax = max(c.hi for c in comps)
            vmax = max(c.vi for c in comps)
            for c in comps:
                if hmax % c.hi or vmax % c.vi:
                    raise ValueError("fractional sampling not supported")
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for c in comps:
                xi = -(-w * c.hi // hmax)  # ceil: component pixel dims
                yi = -(-h * c.vi // vmax)
                c.bx = -(-xi // 8)  # non-interleaved (true) block grid
                c.by = -(-yi // 8)
                c.bx_pad = mcus_x * c.hi
                c.by_pad = mcus_y * c.vi
                c.coeff = np.zeros((c.by_pad * c.bx_pad, 64), dtype=np.int32)
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                if p + 17 + nv > len(payload):
                    raise ValueError("truncated DHT")
                vals = list(payload[p + 17 : p + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            if len(payload) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — decode one scan, then keep parsing
            if not comps:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            if len(payload) < 4 + 2 * ns:
                raise ValueError("truncated SOS")
            scan_comps = []
            for i in range(ns):
                cs, tdta = payload[1 + 2 * i], payload[2 + 2 * i]
                idx = next(
                    (j for j, c in enumerate(comps) if c.cid == cs), None
                )
                if idx is None:
                    raise ValueError("scan references unknown component")
                scan_comps.append((idx, tdta >> 4, tdta & 0x0F))
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            pos = _decode_scan(
                data, pos + length, comps, scan_comps, huff_dc, huff_ac,
                ss, se, ah, al, progressive, restart_interval,
                mcus_x, mcus_y,
            )
            saw_scan = True
            continue
        pos += length
    if not saw_scan:
        raise ValueError("no scan found")

    planes = []
    for c in comps:
        if c.tq not in quant:
            raise ValueError("missing quantization table")
        natural = c.coeff[:, UNZIGZAG].astype(np.float64) * quant[c.tq].reshape(1, 64)
        blocks = natural.reshape(-1, 8, 8)
        spatial = np.einsum("ji,njk,kl->nil", DCT_A, blocks, DCT_A) + 128.0
        full = _from_blocks(spatial, c.by_pad * 8, c.bx_pad * 8)
        yi = -(-h * c.vi // vmax)
        xi = -(-w * c.hi // hmax)
        plane = full[:yi, :xi]
        fy, fx = vmax // c.vi, hmax // c.hi
        # upsample subsampled chroma: triangular filter for the
        # ubiquitous factor-2, replication for exotic factors
        if fy == 2:
            plane = _up2_axis(plane, 0)
        elif fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx == 2:
            plane = _up2_axis(plane, 1)
        elif fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    rgb = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_scan(
    data, start, comps, scan_comps, huff_dc, huff_ac,
    ss, se, ah, al, progressive, ri, mcus_x, mcus_y,
):
    """Decode one entropy-coded scan into the components' coefficient
    grids; returns the position of the marker that follows the scan."""
    interleaved = len(scan_comps) > 1
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("invalid progressive scan (DC with Se != 0)")
        if ss > 0 and interleaved:
            raise ValueError("progressive AC scan must be non-interleaved")
        if ss > se or se > 63:
            raise ValueError("invalid spectral band")
        is_dc = ss == 0
        refine = ah != 0
    else:
        is_dc, refine = True, False
        ss, se, al = 0, 63, 0

    # resolve tables, validating only what this scan kind needs:
    # sequential -> DC + AC; progressive DC-first -> DC; DC-refine ->
    # none (raw bits); progressive AC -> AC
    need_dc = (not progressive) or (is_dc and not refine)
    need_ac = (not progressive) or (not is_dc)
    resolved = []
    for idx, td, ta in scan_comps:
        dt = huff_dc.get(td) if need_dc else None
        at = huff_ac.get(ta) if need_ac else None
        if need_dc and dt is None:
            raise ValueError("missing DC Huffman table")
        if need_ac and at is None:
            raise ValueError("missing AC Huffman table")
        resolved.append((idx, dt, at))

    if interleaved:
        units = mcus_x * mcus_y
    else:
        c = comps[scan_comps[0][0]]
        units = c.by * c.bx

    br = _BitReader(data, start)
    preds = [0] * len(comps)
    eobrun = 0
    try:
        for u in range(units):
            if ri and u and u % ri == 0:
                br.sync_restart()
                preds = [0] * len(comps)
                eobrun = 0
            if interleaved:
                my, mx = divmod(u, mcus_x)
                for idx, dt, at in resolved:
                    c = comps[idx]
                    for by in range(c.vi):
                        for bx in range(c.hi):
                            bidx = (
                                (my * c.vi + by) * c.bx_pad + (mx * c.hi + bx)
                            )
                            zz = c.coeff[bidx]
                            if not progressive:
                                preds[idx] += _dec_block_full(br, zz, dt, at)
                                zz[0] = preds[idx]
                            elif not refine:
                                preds[idx] += _dec_dc_diff(br, dt)
                                zz[0] = preds[idx] << al
                            else:
                                if br.read(1):
                                    zz[0] = int(zz[0]) | (1 << al)
            else:
                idx, dt, at = resolved[0]
                c = comps[idx]
                by, bx = divmod(u, c.bx)
                zz = c.coeff[by * c.bx_pad + bx]
                if not progressive:
                    preds[idx] += _dec_block_full(br, zz, dt, at)
                    zz[0] = preds[idx]
                elif is_dc:
                    if not refine:
                        preds[idx] += _dec_dc_diff(br, dt)
                        zz[0] = preds[idx] << al
                    elif br.read(1):
                        zz[0] = int(zz[0]) | (1 << al)
                elif not refine:
                    eobrun = _dec_ac_first(br, zz, at, ss, se, al, eobrun)
                else:
                    eobrun = _dec_ac_refine(br, zz, at, ss, se, al, eobrun)
    except _ScanEnd:
        raise ValueError("truncated JPEG scan") from None
    except OverflowError:  # corrupt stream walked a value past int32
        raise ValueError("coefficient overflow in corrupt scan") from None
    return _find_marker(data, br.pos)
