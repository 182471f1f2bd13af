"""Baseline-sequential JPEG codec, pure numpy + stdlib — closes the last
pixel-decode stub in the multimodal family (BMP/PNG/GIF/WAV are already
real; see operators/multimodal.py).

Decoder scope (decode_jpeg_pixels): baseline DCT (SOF0), Huffman entropy
coding (DHT), 8-bit samples, 1 component (grayscale) or 3 components
(JFIF YCbCr) at any integer sampling factors up to 2x2 (4:4:4, 4:2:2,
4:2:0), restart intervals (DRI/RSTn), 0xFF00 byte stuffing, multiple
DQT/DHT segments. Progressive (SOF2), arithmetic coding, 12-bit and
hierarchical modes return None (header metadata still comes from
multimodal.parse_image_header). That is the same honest-subset contract
as the GIF decoder (87a/89a, no animation compositing).

Encoder scope (encode_jpeg_gray / encode_jpeg_color): the test/fixture
counterpart — forward DCT, quantization against an explicit table,
standard Annex K.3.3 Huffman tables, optional 2x2-subsampled color. With
the all-ones quant table and CONSTANT 8x8 blocks, encode→decode is
EXACTLY lossless (all AC coefficients are zero, the DC coefficient is an
exact multiple of 8, and the IDCT of a DC-only block is a constant with
no rounding ambiguity) — which is what lets a SQL oracle verify the
registered x115 query's decoded-pixel statistics in closed form, the
same trick the BMP/GIF fixtures use with genuinely lossless codecs.

Everything here is public knowledge: ITU-T T.81 (the JPEG spec, incl.
Annex F sequential coding, Annex K reference tables) and the JFIF 1.02
color conversion.
"""

from __future__ import annotations

import numpy as np

# Annex A zig-zag scan order: ZIGZAG[i] = block index (row*8+col) of the
# i-th coefficient in transmission order.
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

#: 8x8 DCT-II basis: M[u, x] = C(u)/2 * cos((2x+1) u pi / 16). Forward
#: DCT of block B is M @ B @ M.T; inverse is M.T @ F @ M.
def _dct_matrix() -> np.ndarray:
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2)
    return m


_M = _dct_matrix()


def idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """Batched 2-D inverse DCT: (N, 8, 8) dequantized coefficients →
    (N, 8, 8) float spatial samples (level shift NOT applied)."""
    return np.einsum("ux,nuv,vy->nxy", _M, coeffs.astype(np.float64), _M)


def fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """Batched forward DCT: (N, 8, 8) level-shifted samples → coeffs."""
    return np.einsum("ux,nxy,vy->nuv", _M, blocks.astype(np.float64), _M)


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


class HuffTable:
    """Canonical JPEG Huffman table from a DHT payload: 16 length counts
    then the symbols in code order. Decode map: (length, code) → symbol."""

    def __init__(self, counts, symbols):
        self.decode_map: dict[tuple[int, int], int] = {}
        self.encode_map: dict[int, tuple[int, int]] = {}  # sym → (code, len)
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                sym = symbols[k]
                self.decode_map[(length, code)] = sym
                self.encode_map[sym] = (code, length)
                code += 1
                k += 1
            code <<= 1


# Annex K.3.3.1/K.3.3.2 typical luminance tables (public reference
# tables; also the tables every libjpeg-encoded baseline file carries).
DC_LUM_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_SYMBOLS = list(range(12))
AC_LUM_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# ---------------------------------------------------------------------------
# Bit I/O over the entropy-coded segment
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader with JPEG byte unstuffing (FF 00 → literal
    FF). A 0xFF followed by anything else is a marker: reading stops
    there (``marker`` holds it) until :meth:`restart` consumes an RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.marker is not None or self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        self.cur = (self.cur << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("jpeg: bit stream exhausted")
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.decode_map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")

    def restart(self) -> None:
        """Byte-align and consume the pending RSTn marker."""
        self.nbits = 0
        if self.marker is None:
            # marker not yet hit (padding bits remain) — scan to it
            while self.marker is None and self._fill():
                pass
            self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None
        else:
            raise ValueError("jpeg: expected restart marker")


def _extend(v: int, t: int) -> int:
    """F.2.2.1 EXTEND: map the t-bit magnitude v to its signed value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg_pixels(b: bytes):
    """Decode a baseline-sequential JPEG. Returns a (h, w) uint8 array
    for 1-component images, (h, w, 3) uint8 RGB for 3-component JFIF
    YCbCr, or None when ``b`` is not a JPEG this decoder supports (not a
    JPEG at all, progressive, arithmetic, 12-bit, >2x sampling)."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], HuffTable] = {}  # (class, id)
    frame = None  # (H, W, [(comp_id, h, v, tq), ...])
    restart_interval = 0
    i = 2
    try:
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xD9:  # EOI before any scan
                return None
            seglen = int.from_bytes(b[i + 2:i + 4], "big")
            seg = b[i + 4:i + 2 + seglen]
            if marker == 0xDB:  # DQT — possibly several tables
                j = 0
                while j < len(seg):
                    prec, tid = seg[j] >> 4, seg[j] & 0x0F
                    j += 1
                    n = 64 * (2 if prec else 1)
                    raw = seg[j:j + n]
                    vals = (
                        np.frombuffer(raw, ">u2") if prec
                        else np.frombuffer(raw, np.uint8)
                    ).astype(np.int64)
                    tab = np.zeros(64, np.int64)
                    tab[ZIGZAG] = vals  # de-zigzag to natural order
                    qt[tid] = tab.reshape(8, 8)
                    j += n
            elif marker == 0xC4:  # DHT — possibly several tables
                j = 0
                while j + 17 <= len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 0x0F
                    counts = list(seg[j + 1:j + 17])
                    nsym = sum(counts)
                    syms = list(seg[j + 17:j + 17 + nsym])
                    huff[(tc, th)] = HuffTable(counts, syms)
                    j += 17 + nsym
            elif marker == 0xC0:  # SOF0 baseline
                if seg[0] != 8:
                    return None  # 12-bit
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                ncomp = seg[5]
                if ncomp not in (1, 3):
                    return None
                comps = []
                for c in range(ncomp):
                    cid = seg[6 + 3 * c]
                    hv = seg[7 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 0x0F, seg[8 + 3 * c]))
                frame = (h, w, comps)
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # progressive/arithmetic/hierarchical
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS
                if frame is None:
                    return None
                ns = seg[0]
                scan_tabs = {}
                for c in range(ns):
                    cs = seg[1 + 2 * c]
                    tt = seg[2 + 2 * c]
                    scan_tabs[cs] = (tt >> 4, tt & 0x0F)
                return _decode_scan(
                    b, i + 2 + seglen, frame, scan_tabs, qt, huff,
                    restart_interval,
                )
            i += 2 + seglen
    except (ValueError, IndexError, KeyError, OverflowError):
        # malformed/corrupted input: a decoder in a 100 TB pipeline must
        # degrade to None (quarantine), never crash the task
        return None
    return None


def _decode_scan(b, pos, frame, scan_tabs, qt, huff, restart_interval):
    H, W, comps = frame
    if any(cid not in scan_tabs for cid, *_ in comps):
        return None  # multi-scan files are out of the baseline subset
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2 or hmax < 1 or vmax < 1:
        return None
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    reader = _BitReader(b, pos)
    # per component: coefficient store (n_blocks, 8, 8) in MCU order
    stores = [
        np.zeros((mcuy * v * 8, mcux * h * 8), np.uint8)
        for _, h, v, _ in comps
    ]
    coef_lists: list[list] = [[] for _ in comps]
    preds = [0] * len(comps)
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            reader.restart()
            preds = [0] * len(comps)
        for ci, (cid, ch, cv, tq) in enumerate(comps):
            dc_tab = huff[(0, scan_tabs[cid][0])]
            ac_tab = huff[(1, scan_tabs[cid][1])]
            q = qt[tq]
            for _ in range(ch * cv):
                zz = np.zeros(64, np.int64)
                t = reader.decode_huff(dc_tab)
                if t > 11:  # spec bound for 8-bit DC magnitude category
                    raise ValueError("jpeg: DC size out of range")
                diff = _extend(reader.receive(t), t)
                preds[ci] += diff
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = reader.decode_huff(ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("jpeg: AC run past block end")
                    zz[k] = _extend(reader.receive(s), s)
                    k += 1
                blk = np.zeros(64, np.int64)
                blk[ZIGZAG] = zz
                coef_lists[ci].append(blk.reshape(8, 8) * q)
    # batched IDCT + level shift per component, then MCU reassembly
    planes = []
    for ci, (cid, ch, cv, _tq) in enumerate(comps):
        spatial = idct_blocks(np.stack(coef_lists[ci]))
        samples = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        plane = stores[ci]
        bi = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        plane[y0:y0 + 8, x0:x0 + 8] = samples[bi]
                        bi += 1
        # nearest-neighbor chroma upsample to full grid, crop to H x W
        plane = plane.repeat(vmax // cv, axis=0).repeat(hmax // ch, axis=1)
        planes.append(plane[:H, :W])
    if len(planes) == 1:
        return planes[0]
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    bl = y + 1.772 * (cb - 128)
    return np.clip(
        np.round(np.stack([r, g, bl], axis=-1)), 0, 255
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (test/fixture side)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (spec convention)."""
        while self.nbits:
            self.write(1, 1)


def _magnitude(v: int) -> tuple[int, int]:
    """(size t, t-bit code) for a signed coefficient value (F.1.2.1.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, v if v > 0 else v + (1 << t) - 1


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt_seg(q: np.ndarray) -> bytes:
    zz = q.reshape(64)[ZIGZAG]
    if (zz > 255).any() or (zz < 1).any():
        # The encoder only emits 8-bit-precision DQTs; a silent uint8 cast
        # would wrap entries > 255 into a valid-looking but wrong table
        # (ADVICE r7). The decoder handles 16-bit DQTs; the encoder
        # deliberately does not produce them.
        raise ValueError(
            "quant table entries must be in [1, 255] for an 8-bit DQT; "
            f"got range [{int(zz.min())}, {int(zz.max())}]"
        )
    return _seg(0xDB, bytes([0x00]) + zz.astype(np.uint8).tobytes())


def _dht_seg() -> bytes:
    payload = (
        bytes([0x00]) + bytes(DC_LUM_COUNTS) + bytes(DC_LUM_SYMBOLS)
        + bytes([0x10]) + bytes(AC_LUM_COUNTS) + bytes(AC_LUM_SYMBOLS)
    )
    return _seg(0xC4, payload)


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc: HuffTable, ac: HuffTable) -> int:
    """Entropy-encode one zig-zag-ordered quantized block; returns the new
    DC predictor."""
    diff = int(zz[0]) - pred
    t, code = _magnitude(diff)
    hcode, hlen = dc.encode_map[t]
    w.write(hcode, hlen)
    if t:
        w.write(code, t)
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    run = 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zcode, zlen = ac.encode_map[0xF0]
            w.write(zcode, zlen)
            run -= 16
        t, code = _magnitude(v)
        hcode, hlen = ac.encode_map[(run << 4) | t]
        w.write(hcode, hlen)
        w.write(code, t)
        run = 0
    if last < 63:
        ecode, elen = ac.encode_map[0x00]
        w.write(ecode, elen)
    return int(zz[0])


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H, W multiples of 8 → (N, 8, 8) blocks in raster
    order, level-shifted."""
    h, w = plane.shape
    return (
        plane.astype(np.float64)
        .reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        - 128.0
    )


def _quantized_zigzag(blocks: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward DCT + quantization → (N, 64) ints in transmission
    (zig-zag) order: position i carries natural index ZIGZAG[i]."""
    coeffs = np.round(fdct_blocks(blocks) / q).astype(np.int64).reshape(-1, 64)
    return coeffs[:, ZIGZAG]


#: module-level encoder table singletons (the canonical build is cheap
#: but pays off across thousands of per-document fixture encodes)
_LUM_TABLES = (
    HuffTable(DC_LUM_COUNTS, DC_LUM_SYMBOLS),
    HuffTable(AC_LUM_COUNTS, AC_LUM_SYMBOLS),
)


def encode_jpeg_gray(arr: np.ndarray, q: np.ndarray | None = None) -> bytes:
    """Encode a (H, W) uint8 grayscale array (dims multiples of 8) as a
    baseline JPEG using the Annex K luminance Huffman tables. With the
    default all-ones quant table, constant 8x8 blocks round-trip
    exactly (module docstring)."""
    h, w = arr.shape
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg_gray: dims must be multiples of 8")
    q = np.ones((8, 8), np.int64) if q is None else np.asarray(q, np.int64)
    if (q > 255).any() or (q < 1).any():
        # checked BEFORE quantization: a zero entry divides by zero and an
        # oversized one would silently wrap in the 8-bit DQT (ADVICE r7)
        raise ValueError(
            "quant table entries must be in [1, 255] for an 8-bit DQT; "
            f"got range [{int(q.min())}, {int(q.max())}]"
        )
    dc, ac = _LUM_TABLES
    zz = _quantized_zigzag(_plane_blocks(arr), q)
    bw = _BitWriter()
    pred = 0
    for blk in zz:
        pred = _encode_block(bw, blk, pred, dc, ac)
    bw.flush()
    sof = _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([1, 1, 0x11, 0]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + _dqt_seg(q) + sof + _dht_seg() + sos
            + bytes(bw.out) + b"\xff\xd9")


def encode_jpeg_color(y: np.ndarray, cb: np.ndarray, cr: np.ndarray,
                      sampling: tuple[int, int] = (2, 2)) -> bytes:
    """Encode explicit YCbCr planes as a 3-component baseline JPEG
    (test-side: exercises the decoder's interleaved-MCU, subsampling and
    color paths). ``y`` is (H, W); ``cb``/``cr`` are the ALREADY
    subsampled chroma planes, (H/v, W/h) for sampling (h, v); all dims
    must align to whole MCUs. All components share quant table 0
    (all-ones) and the luminance Huffman tables — spec-valid, if not
    what a size-optimizing encoder would pick."""
    hs, vs = sampling
    H, W = y.shape
    if H % (8 * vs) or W % (8 * hs):
        raise ValueError("encode_jpeg_color: dims must align to MCUs")
    if cb.shape != (H // vs, W // hs) or cr.shape != cb.shape:
        raise ValueError("encode_jpeg_color: chroma plane shape mismatch")
    q = np.ones((8, 8), np.int64)
    dc, ac = _LUM_TABLES
    zz = [_quantized_zigzag(_plane_blocks(p), q) for p in (y, cb, cr)]
    mcux, mcuy = W // (8 * hs), H // (8 * vs)
    bw = _BitWriter()
    preds = [0, 0, 0]
    bpr = [W // 8, W // hs // 8, W // hs // 8]  # blocks per plane row
    samp = [(hs, vs), (1, 1), (1, 1)]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                ch, cv = samp[ci]
                for by in range(cv):
                    for bx in range(ch):
                        bi = (my * cv + by) * bpr[ci] + (mx * ch + bx)
                        preds[ci] = _encode_block(
                            bw, zz[ci][bi], preds[ci], dc, ac
                        )
    bw.flush()
    sof = _seg(0xC0, bytes([8]) + H.to_bytes(2, "big") + W.to_bytes(2, "big")
               + bytes([3,
                        1, (hs << 4) | vs, 0,
                        2, 0x11, 0,
                        3, 0x11, 0]))
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return (b"\xff\xd8" + _dqt_seg(q) + sof + _dht_seg() + sos
            + bytes(bw.out) + b"\xff\xd9")
