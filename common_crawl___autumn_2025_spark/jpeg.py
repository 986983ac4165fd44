"""Pure-stdlib/numpy baseline JPEG codec.

A 100 TB image corpus is dominated by JPEG, and this runtime ships no
image library (no Pillow/opencv/libjpeg binding), so the engine
implements the subset it emits and consumes itself:

- **encode**: baseline sequential DCT (SOF0), 8-bit, YCbCr 4:4:4
  (no chroma subsampling — favors fidelity over size for the small
  crawl payloads), standard Annex-K quantization tables scaled by a
  libjpeg-style quality factor, standard Annex-K Huffman tables,
  JFIF container.
- **decode**: any baseline (SOF0) 8-bit stream with 1 or 3
  components, 4:4:4 sampling, arbitrary conformant quant/Huffman
  tables, restart markers supported. Progressive (SOF2), arithmetic
  coding, 12-bit precision, and subsampled streams raise
  ``ValueError`` — callers flag the row (see
  ``operators/multimodal.py``) rather than crash.

All table constants are from the public JPEG spec (ITU-T T.81,
Annex K). The DCT runs as one numpy matrix product over all blocks
of a component at once; only the entropy coding is a Python loop,
which is fine for the engine's Arrow-batched, per-image use (decode
work is per-row inside ``mapInPandas``, never driver-side).

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
    """Reads the entropy-coded segment with 0xFF00 unstuffing; restart
    markers (FFD0-FFD7) reset the reader to a byte boundary via
    ``sync_restart``; any other marker ends the scan."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
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
        if self.marker is None:
            # marker not yet hit while draining pad bits — find it
            while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
                self.pos += 1
            self.marker = self.data[self.pos + 1]
            self.pos += 2
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError("expected restart marker")
        self.marker = None


class _ScanEnd(Exception):
    pass


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def encode_jpeg(pixels: np.ndarray, quality: int = 98) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a baseline 4:4:4 JFIF JPEG.

    Default quality 98: the engine's synthetic payloads carry
    Gaussian texture noise (sigma ~12), and 98 is the lowest standard
    scaling that keeps the decode-verify invariant's PSNR >= 40 dB
    with margin (measured min 43.3 dB over the record corpus; 95
    lands ~35.5 dB on this noise-heavy content)."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    qy = scaled_quant(QUANT_LUMA, quality)
    qc = scaled_quant(QUANT_CHROMA, quality)

    # pad to 8x8 multiples by edge replication, convert, block, DCT
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(
        pixels.astype(np.float64), ((0, ph - h), (0, pw - w), (0, 0)), mode="edge"
    )
    ycc = _rgb_to_ycbcr(padded)
    comp_coeffs = []
    for ci, q in ((0, qy), (1, qc), (2, qc)):
        blocks = _to_blocks(ycc[..., ci]) - 128.0
        coeffs = np.einsum("ij,njk,lk->nil", DCT_A, blocks, DCT_A)
        quantized = np.round(coeffs / q.reshape(8, 8)).astype(np.int32)
        comp_coeffs.append(quantized.reshape(-1, 64)[:, ZIGZAG])

    dc_y = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    tables = [(dc_y, ac_y), (dc_c, ac_c), (dc_c, ac_c)]

    bw = _BitWriter()
    pred = [0, 0, 0]
    for b in range(comp_coeffs[0].shape[0]):  # interleaved 4:4:4 MCUs
        for ci in range(3):
            zz = comp_coeffs[ci][b]
            dct_tab, act_tab = tables[ci]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
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
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + qy.astype(np.uint8)[ZIGZAG].tobytes())
    out += seg(0xFFDB, b"\x01" + qc.astype(np.uint8)[ZIGZAG].tobytes())
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += struct.pack(">BBB", cid, 0x11, tq)  # 1x1 sampling = 4:4:4
    out += seg(0xFFC0, sof)
    for tc_th, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += seg(0xFFC4, bytes([tc_th] + bits) + bytes(vals))
    sos = b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG to (h, w, 3) uint8 RGB (grayscale
    streams are replicated across channels). Raises ValueError on
    non-baseline features (progressive, subsampling, 12-bit)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[tuple[int, int, int]] = []  # (id, sampling, tq)
    h = w = 0
    restart_interval = 0
    scan_pos = None
    scan_comps: list[tuple[int, int, int]] = []  # (comp_idx, dc_id, ac_id)

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        while data[pos + 1] == 0xFF:  # optional fill bytes
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + length]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                tbl = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.float64)
                quant[tq] = tbl[UNZIGZAG]  # store natural order
                p += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF{marker - 0xC0}); "
                "only baseline sequential (SOF0) is implemented"
            )
        elif marker == 0xC0:  # SOF0
            precision, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError("only 1- or 3-component JPEG supported")
            for i in range(nc):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling not supported (4:4:4 only)"
                    )
                comps.append((cid, samp, tq))
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            if ns != len(comps):
                # a non-interleaved / multi-scan baseline stream
                # (legal per T.81) would need further scans we do not
                # parse — refuse rather than return a desaturated
                # image with all-zero chroma planes
                raise ValueError(
                    "non-interleaved (multi-scan) JPEG not supported"
                )
            for i in range(ns):
                cs, tdta = payload[1 + 2 * i], payload[2 + 2 * i]
                idx = next(
                    j for j, (cid, _, _) in enumerate(comps) if cid == cs
                )
                scan_comps.append((idx, tdta >> 4, tdta & 0x0F))
            scan_pos = pos + length
            break
        pos += length
    if scan_pos is None or not comps:
        raise ValueError("no scan found")

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    n_blocks = (ph // 8) * (pw // 8)
    coeff = [
        np.zeros((n_blocks, 64), dtype=np.float64) for _ in comps
    ]
    br = _BitReader(data, scan_pos)
    pred = [0] * len(comps)
    mcu = 0
    try:
        while mcu < n_blocks:
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.sync_restart()
                pred = [0] * len(comps)
            for idx, dc_id, ac_id in scan_comps:
                dt, at = huff_dc[dc_id], huff_ac[ac_id]
                s = br.read_symbol(dt)
                diff = _extend(br.read(s), s) if s else 0
                pred[idx] += diff
                zz = coeff[idx][mcu]
                zz[0] = pred[idx]
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
            mcu += 1
    except _ScanEnd:
        if mcu < n_blocks:
            raise ValueError("truncated JPEG scan") from None

    planes = []
    for idx, (_, _, tq) in enumerate(comps):
        natural = coeff[idx][:, UNZIGZAG] * quant[tq].reshape(1, 64)
        blocks = natural.reshape(-1, 8, 8)
        spatial = np.einsum("ji,njk,kl->nil", DCT_A, blocks, DCT_A) + 128.0
        planes.append(_from_blocks(spatial, ph, pw)[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    rgb = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
