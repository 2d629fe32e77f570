"""Pure-numpy baseline JPEG codec (ITU T.81 sequential DCT, JFIF).

Zero extra dependencies: everything here is the public JPEG standard —
the Annex K quantization + Huffman tables, zigzag order, level-shifted
8×8 DCT-II, and the category/extend entropy coding of sequential
baseline mode. Together with stages/multimodal.py's WAV/PPM/BMP codecs
this closes the image-decode seam for the most common web-image format
without PIL (reference analogue: the image payloads graphiti passes to
multimodal LLMs as base64 JPEG, graphiti_core/llm_client; here the
pipeline decodes them itself).

Supported:
- decode: baseline sequential (SOF0), 8-bit, grayscale or 3-component
  YCbCr with any of the common sampling layouts (4:4:4, 4:2:2, 4:2:0 —
  the general Hi×Vi MCU loop), restart intervals (DRI / RSTn), multiple
  DQT/DHT segments per marker.
- encode: grayscale or RGB, 4:4:4 or 4:2:0, libjpeg-style quality
  scaling of the Annex K tables. The encoder exists so tests and
  fixtures can synthesize real JPEG payloads deterministically inside
  the sandbox (no network, no binary fixtures in git).

Not supported (raise ValueError): progressive (SOF2), arithmetic
coding, 12-bit precision, CMYK. Those remain the documented PIL seam.

The hot path is the per-block Huffman loop — Python-level, fine for the
thumbnail-sized payloads a feature/near-dup stage decodes (decode is
O(coded bits); a 64×64 image is ~1 k symbols). The DCT/IDCT, color
transform, and upsampling are vectorized numpy over all blocks at once.
"""

from __future__ import annotations

import numpy as np

# --- Annex K tables (ITU T.81, public standard) -------------------------------

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# Huffman table specs: (BITS[1..16] code-length counts, HUFFVAL symbol list)
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

# --- DCT basis ----------------------------------------------------------------

_x = np.arange(8)
_DCT = 0.5 * np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16)
_DCT[0, :] *= 1 / np.sqrt(2)  # orthogonal: F = A @ s @ A.T, s = A.T @ F @ A


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial → (n, 8, 8) DCT coefficients (vectorized)."""
    return np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT, optimize=True)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("xu,nuv,yv->nxy", _DCT.T, coefs, _DCT.T, optimize=True)


# --- Huffman code construction (T.81 Annex C) ---------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length). Canonical JPEG code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, the inverse table the bit reader probes."""
    return {(l, c): s for s, (c, l) in _build_codes(bits, vals).items()}


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of an Annex K table (public
    formula: scale = 5000/q below 50, 200-2q above; clamp [1, 255])."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


# --- bit I/O -------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    """Reads the entropy-coded segment after 0xFF00 unstuffing."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self, need: int) -> None:
        while self.nbits < need:
            b = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill(n)
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 17:
            code = (code << 1) | self.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan data")


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _extend(r: int, s: int) -> int:
    """T.81 F.12: recover a signed value from its s received bits."""
    if s == 0:
        return 0
    return r if r >= (1 << (s - 1)) else r - (1 << s) + 1


# --- color transforms (JFIF) ----------------------------------------------------


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i].astype(np.float64) for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(np.uint8)


# --- encoder --------------------------------------------------------------------


def _plane_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-pad a plane to 8×8 multiples and return (n, 8, 8) blocks in
    raster order plus blocks-per-row/col."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    H, W = padded.shape
    by, bx = H // 8, W // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, by, bx


def _encode_plane_coefs(plane: np.ndarray, qtab: np.ndarray) -> tuple:
    blocks, by, bx = _plane_blocks(plane)
    coefs = _fdct_blocks(blocks - 128.0)
    quant = np.round(coefs / qtab[None]).astype(np.int64)
    return quant, by, bx


def _emit_block(
    bw: _BitWriter,
    zz: np.ndarray,
    prev_dc: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    diff = int(zz[0]) - prev_dc
    s = _category(diff)
    bw.write(*dc_codes[s])
    if s:
        bits = diff if diff > 0 else diff + (1 << s) - 1
        bw.write(bits, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_codes[0xF0])
            run -= 16
        s = _category(v)
        bw.write(*ac_codes[(run << 4) | s])
        bits = v if v > 0 else v + (1 << s) - 1
        bw.write(bits, s)
        run = 0
    if last < 63:
        bw.write(*ac_codes[0x00])  # EOB
    return int(zz[0])


def _marker(tag: int, payload: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    return bytes([tc_th]) + bytes(bits) + bytes(vals)


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) grayscale → baseline JFIF JPEG bytes.

    ``subsampling``: "444" (no chroma subsampling; every MCU is 1+1+1
    blocks) or "420" (2×2 box-averaged chroma; MCU = 4 luma + 1 Cb +
    1 Cr — the web default). ``restart_interval`` > 0 emits DRI + RSTn
    markers every N MCUs (what web encoders do for error resilience —
    and the decoder path worth exercising)."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = arr.ndim == 2
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[:2]
    qy = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    # header segments
    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(
        0xDB, b"\x00" + bytes(qy.reshape(-1)[ZIGZAG].astype(np.uint8))
    )
    if not gray:
        out += _marker(
            0xDB, b"\x01" + bytes(qc.reshape(-1)[ZIGZAG].astype(np.uint8))
        )
    hs, vs = (2, 2) if (subsampling == "420" and not gray) else (1, 1)
    ncomp = 1 if gray else 3
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(ncomp)
    sof += bytes([1, (hs << 4) | vs, 0])
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += _marker(0xC0, bytes(sof))
    out += _marker(0xC4, _dht_segment(0x00, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _marker(0xC4, _dht_segment(0x10, AC_LUMA_BITS, AC_LUMA_VALS))
    if not gray:
        out += _marker(0xC4, _dht_segment(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out += _marker(0xC4, _dht_segment(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS))
    if restart_interval:
        out += _marker(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([ncomp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += _marker(0xDA, bytes(sos))

    # planes
    if gray:
        planes = [arr.astype(np.float64)]
        qtabs = [qy]
    else:
        ycc = rgb_to_ycbcr(arr)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsampling == "420":
            # pad to even dims, then 2×2 box average
            pe = ((0, h % 2), (0, w % 2))
            cb = np.pad(cb, pe, mode="edge")
            cr = np.pad(cr, pe, mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
        planes = [y, cb, cr]
        qtabs = [qy, qc, qc]

    quants, dims = [], []
    for p, q in zip(planes, qtabs):
        qz, by, bx = _encode_plane_coefs(p, q)
        quants.append(qz.reshape(by, bx, 64))
        dims.append((by, bx))

    dc_codes = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_codes = [_build_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        dc_codes += [_build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)] * 2
        ac_codes += [_build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)] * 2

    # MCU walk (interleaved scan order, T.81 A.2.3)
    comp_hv = [(hs, vs)] + ([(1, 1), (1, 1)] if not gray else [])
    hmax = max(hv[0] for hv in comp_hv)
    vmax = max(hv[1] for hv in comp_hv)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    bw = _BitWriter()
    prev_dc = [0] * ncomp
    mcu_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                out += bw.flush()
                out += bytes([0xFF, 0xD0 + (mcu_n // restart_interval - 1) % 8])
                bw = _BitWriter()
                prev_dc = [0] * ncomp
            mcu_n += 1
            for c in range(ncomp):
                ch, cv = comp_hv[c]
                by, bx = dims[c]
                for dy in range(cv):
                    for dx in range(ch):
                        ry = min(my * cv + dy, by - 1)
                        rx = min(mx * ch + dx, bx - 1)
                        zz = quants[c][ry, rx][ZIGZAG]
                        prev_dc[c] = _emit_block(
                            bw, zz, prev_dc[c], dc_codes[c], ac_codes[c]
                        )
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder --------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF JPEG bytes → uint8 (h, w, 3) RGB (or (h, w) gray).

    Sequential DCT only — progressive (SOF2) / arithmetic / 12-bit raise
    ValueError (the documented PIL seam)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → decode table
    frame = None  # (h, w, [(cid, hh, vv, tq)])
    scan_comps = None  # [(comp_index, dc_id, ac_id)]
    restart_interval = 0
    scan_data = None

    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        tag = payload[pos + 1]
        if tag in (0xD8, 0x01) or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        if tag == 0xD9:  # EOI
            break
        seglen = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        seg = payload[pos + 4 : pos + 2 + seglen]
        if tag == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tab = np.frombuffer(seg[p + 1 : p + 65], np.uint8).astype(np.int64)
                qtabs[tq] = tab[UNZIGZAG].reshape(8, 8)
                p += 65
        elif tag == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_decoder(bits, vals)
                p += 17 + n
        elif tag in (0xC0, 0xC1):  # SOF0/1 (baseline/extended sequential)
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            fh = int.from_bytes(seg[1:3], "big")
            fw = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (fh, fw, comps)
        elif tag in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (SOF marker 0xFF{tag:02X}); only "
                "baseline sequential decodes here — the PIL seam covers the rest"
            )
        elif tag == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[:2], "big")
        elif tag == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan_comps = []
            cids = [c[0] for c in frame[2]]
            for s in range(ns):
                cs, tables = seg[1 + 2 * s], seg[2 + 2 * s]
                scan_comps.append((cids.index(cs), tables >> 4, tables & 0xF))
            # entropy-coded segment runs to the next non-RST marker
            start = pos + 2 + seglen
            end = start
            while end < len(payload) - 1:
                if payload[end] == 0xFF and payload[end + 1] not in (0x00,) and not (
                    0xD0 <= payload[end + 1] <= 0xD7
                ):
                    break
                end += 1
            scan_data = payload[start:end]
            pos = end
            continue
        pos += 2 + seglen

    if frame is None or scan_data is None:
        raise ValueError("truncated JPEG (no frame/scan)")

    fh, fw, comps = frame
    ncomp = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    n_mcus = mcux * mcuy

    # split on restart markers, unstuff each segment
    segments: list[bytes] = []
    cur = bytearray()
    i = 0
    while i < len(scan_data):
        b = scan_data[i]
        if b == 0xFF and i + 1 < len(scan_data):
            nxt = scan_data[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    # per-component coefficient grids (in MCU-padded block units)
    grids = [
        np.zeros((mcuy * c[2], mcux * c[1], 64), dtype=np.int64) for c in comps
    ]
    mcu_idx = 0
    for seg_i, segment in enumerate(segments):
        br = _BitReader(segment)
        prev_dc = [0] * ncomp
        limit = (
            min(mcu_idx + restart_interval, n_mcus)
            if restart_interval
            else n_mcus
        )
        while mcu_idx < limit:
            my, mx = divmod(mcu_idx, mcux)
            for ci, dc_id, ac_id in scan_comps:
                _, ch, cv, _tq = comps[ci]
                dct = huff[(0, dc_id)]
                act = huff[(1, ac_id)]
                for dy in range(cv):
                    for dx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        s = br.decode_symbol(dct)
                        prev_dc[ci] += _extend(br.read(s), s)
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            rs = br.decode_symbol(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overrun")
                            zz[k] = _extend(br.read(s), s)
                            k += 1
                        grids[ci][my * cv + dy, mx * ch + dx] = zz
            mcu_idx += 1
        if mcu_idx >= n_mcus:
            break

    # dequantize + IDCT + reassemble planes, vectorized per component
    planes = []
    for (cid, ch, cv, tq), grid in zip(comps, grids):
        by, bx, _ = grid.shape
        coefs = grid.reshape(-1, 64)[:, UNZIGZAG].reshape(-1, 8, 8).astype(
            np.float64
        ) * qtabs[tq][None]
        spatial = _idct_blocks(coefs) + 128.0
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # upsample to full MCU-padded frame resolution, then crop
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if ncomp == 1:
        return np.clip(planes[0] + 0.5, 0, 255).astype(np.uint8)
    if ncomp != 3:
        raise ValueError(f"unsupported component count: {ncomp}")
    return ycbcr_to_rgb(np.stack(planes, axis=-1))
