"""Baseline-sequential JPEG codec, pure numpy + stdlib — closes the last
pixel-decode stub in the multimodal family (BMP/PNG/GIF/WAV are already
real; see operators/multimodal.py).

Decoder scope (decode_jpeg_pixels): baseline DCT (SOF0) per Annex F and
— since r12 — PROGRESSIVE DCT (SOF2) per Annex G (spectral selection,
successive approximation, DC/AC first and refinement scans, end-of-band
runs), Huffman entropy coding (DHT), 8-bit samples, 1 component
(grayscale) or 3 components (JFIF YCbCr) at any integer sampling factors
up to 2x2 (4:4:4, 4:2:2, 4:2:0), restart intervals (DRI/RSTn), 0xFF00
byte stuffing, multiple DQT/DHT segments. Arithmetic coding, 12-bit and
hierarchical modes return None (header metadata still comes from
multimodal.parse_image_header). That is the same honest-subset contract
as the GIF decoder (87a/89a, no animation compositing).

Encoder scope (encode_jpeg_gray / encode_jpeg_color /
encode_jpeg_gray_progressive / encode_jpeg_color_progressive): the
test/fixture counterpart — forward DCT, quantization against an explicit
table, standard Annex K.3.3 Huffman tables (plus a fixed-length
canonical AC table for progressive scans, which need EOBn symbols the
baseline table lacks), optional 2x2-subsampled color, and a
libjpeg-style multi-scan progression script. With the all-ones quant
table and CONSTANT 8x8 blocks, encode→decode is EXACTLY lossless through
BOTH entropy paths (all AC coefficients are zero, the DC coefficient is
an exact multiple of 8 that the point transform + refinement bits
reassemble exactly, and the IDCT of a DC-only block is a constant with
no rounding ambiguity) — which is what lets a SQL oracle verify the
registered x115/x193 queries' decoded-pixel statistics in closed form,
the same trick the BMP/GIF fixtures use with genuinely lossless codecs.

Everything here is public knowledge: ITU-T T.81 (the JPEG spec, incl.
Annex F sequential coding, Annex G progressive coding, Annex K reference
tables) and the JFIF 1.02 color conversion.
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
            elif marker == 0xC2:  # SOF2 progressive — the multi-scan engine
                return _decode_progressive(b)
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # arithmetic/hierarchical/12-bit extended
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
# Progressive decoder (ITU-T T.81 Annex G: spectral selection +
# successive approximation, Huffman entropy coding) — a SEPARATE parser
# so the proven baseline path above stays byte-identical. Coefficients
# accumulate across scans in transmission (zig-zag) order per block;
# dequantization + IDCT run once after the last scan.
# ---------------------------------------------------------------------------


def _decode_progressive(b: bytes):
    """Decode a progressive (SOF2) JPEG: multiple SOS scans, each either
    a DC scan (Ss=Se=0; interleaved over all components or single) or a
    single-component AC band scan (1 <= Ss <= Se <= 63), first pass
    (Ah=0) or successive-approximation refinement (Ah>0). Returns the
    same shapes as the baseline decoder, or None outside the supported
    subset (8-bit, 1 or 3 components, sampling <= 2x2). A baseline
    entropy segment behind a rewritten SOF2 marker fails here on the
    scan-header validation (Ss=0 with Se=63 is not a legal progressive
    scan), which is exactly the honest behavior the x178 funnel needs."""
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], HuffTable] = {}
    frame = None
    restart_interval = 0
    stores = None  # per comp: (hb_pad, wb_pad, 64) int32 zig-zag coeffs
    geom = None
    i = 2
    try:
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xD9:  # EOI — all scans consumed
                break
            seglen = int.from_bytes(b[i + 2:i + 4], "big")
            seg = b[i + 4:i + 2 + seglen]
            if marker == 0xDB:
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
                    tab[ZIGZAG] = vals
                    qt[tid] = tab.reshape(8, 8)
                    j += n
            elif marker == 0xC4:
                j = 0
                while j + 17 <= len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 0x0F
                    counts = list(seg[j + 1:j + 17])
                    nsym = sum(counts)
                    syms = list(seg[j + 17:j + 17 + nsym])
                    huff[(tc, th)] = HuffTable(counts, syms)
                    j += 17 + nsym
            elif marker == 0xC2:
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
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if hmax > 2 or vmax > 2 or hmax < 1 or vmax < 1:
                    return None
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                frame = (h, w, comps, hmax, vmax, mcux, mcuy)
                stores = [
                    np.zeros((mcuy * v, mcux * ch, 64), np.int32)
                    for _, ch, v, _ in comps
                ]
                # non-interleaved block grid per comp (G.1: actual comp
                # dims, NOT MCU-padded)
                geom = []
                for _, ch, v, _tq in comps:
                    cw = -(-w * ch // hmax)  # ceil(w * ch / hmax)
                    chh = -(-h * v // vmax)
                    geom.append((-(-cw // 8), -(-chh // 8)))  # (wb, hb)
            elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # wrong frame type for this parser
            elif marker == 0xDD:
                restart_interval = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:
                if frame is None:
                    return None
                i = _decode_progressive_scan(
                    b, i + 2 + seglen, seg, frame, stores, geom, huff,
                    restart_interval,
                )
                continue  # i already points at the next marker
            i += 2 + seglen
    except (ValueError, IndexError, KeyError, OverflowError):
        return None
    if frame is None or stores is None:
        return None
    return _assemble_progressive(frame, stores, qt)


def _decode_progressive_scan(b, pos, seg, frame, stores, geom, huff,
                             restart_interval):
    """Decode one progressive SOS; returns the byte offset of the next
    marker segment. Raises ValueError on any structural violation."""
    H, W, comps, hmax, vmax, mcux, mcuy = frame
    ns = seg[0]
    sel = []  # (comp_index, td, ta)
    for c in range(ns):
        cs = seg[1 + 2 * c]
        tt = seg[2 + 2 * c]
        ci = next(
            (k for k, comp in enumerate(comps) if comp[0] == cs), None
        )
        if ci is None:
            raise ValueError("jpeg: scan component not in frame")
        sel.append((ci, tt >> 4, tt & 0x0F))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    a = seg[3 + 2 * ns]
    ah, al = a >> 4, a & 0x0F
    if ss == 0:
        if se != 0:
            raise ValueError("jpeg: progressive DC scan must have Se=0")
        dc_scan = True
    else:
        if ns != 1 or se < ss or se > 63:
            raise ValueError("jpeg: invalid progressive AC scan header")
        dc_scan = False
    reader = _BitReader(b, pos)
    if dc_scan:
        _scan_dc(reader, comps, sel, stores, ah, al, mcux, mcuy, huff,
                 restart_interval, geom, ns)
    else:
        _scan_ac(reader, sel[0], stores, geom, ss, se, ah, al, huff,
                 restart_interval)
    # advance to the next marker segment (skip padding + any RSTn)
    p = reader.pos
    while p + 1 < len(b):
        if b[p] == 0xFF and b[p + 1] != 0x00:
            if 0xD0 <= b[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return len(b)


def _scan_dc(reader, comps, sel, stores, ah, al, mcux, mcuy, huff,
             restart_interval, geom, ns):
    preds = [0] * len(sel)
    if ns > 1:  # interleaved MCU order over the padded grid
        nmcu = mcux * mcuy
        for m in range(nmcu):
            if restart_interval and m and m % restart_interval == 0:
                reader.restart()
                preds = [0] * len(sel)
            for si, (ci, td, _ta) in enumerate(sel):
                _, ch, cv, _ = comps[ci]
                my, mx = divmod(m, mcux)
                for by in range(cv):
                    for bx in range(ch):
                        blk = stores[ci][my * cv + by, mx * ch + bx]
                        _dc_block(reader, blk, preds, si, huff, td, ah, al)
    else:  # single-component DC scan: raster over the actual block grid
        ci, td, _ta = sel[0]
        wb, hb = geom[ci]
        n = 0
        for by in range(hb):
            for bx in range(wb):
                if restart_interval and n and n % restart_interval == 0:
                    reader.restart()
                    preds = [0] * len(sel)
                _dc_block(reader, stores[ci][by, bx], preds, 0, huff, td,
                          ah, al)
                n += 1


def _dc_block(reader, blk, preds, si, huff, td, ah, al):
    if ah == 0:  # first pass: diff coding of the point-transformed DC
        t = reader.decode_huff(huff[(0, td)])
        if t > 11:
            raise ValueError("jpeg: DC size out of range")
        diff = _extend(reader.receive(t), t)
        preds[si] += diff
        blk[0] = preds[si] << al
    else:  # refinement: one bit per block
        if reader.read_bit():
            blk[0] |= 1 << al


def _scan_ac(reader, sel0, stores, geom, ss, se, ah, al, huff,
             restart_interval):
    ci, _td, ta = sel0
    ac_tab = huff[(1, ta)]
    wb, hb = geom[ci]
    eobrun = 0
    n = 0
    for by in range(hb):
        for bx in range(wb):
            if restart_interval and n and n % restart_interval == 0:
                reader.restart()
                eobrun = 0
            blk = stores[ci][by, bx]
            if ah == 0:
                eobrun = _ac_first_block(reader, blk, ac_tab, ss, se, al,
                                         eobrun)
            else:
                eobrun = _ac_refine_block(reader, blk, ac_tab, ss, se, al,
                                          eobrun)
            n += 1


def _ac_first_block(reader, blk, ac_tab, ss, se, al, eobrun):
    """G.1.2.2: first pass over an AC band — run/size coding of the
    point-transformed coefficients, with end-of-band (EOBn) runs."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huff(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("jpeg: AC run past band end")
        blk[k] = _extend(reader.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, blk, ac_tab, ss, se, al, eobrun):
    """G.1.2.3: successive-approximation refinement of an AC band —
    newly-significant coefficients arrive as run/1 symbols whose runs
    count zero-HISTORY positions only; every nonzero-history coefficient
    passed (and every one inside an EOB run) gets a correction bit.
    ``eobrun`` counts blocks REMAINING in the pending end-of-band run
    (this block excluded); both entry paths consume exactly one block."""
    p1 = 1 << al
    m1 = -1 << al

    def _correct(k):
        if reader.read_bit() and (blk[k] & p1) == 0:
            blk[k] += p1 if blk[k] >= 0 else m1

    if eobrun > 0:  # inside a pending run: corrections only
        for k in range(ss, se + 1):
            if blk[k] != 0:
                _correct(k)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huff(ac_tab)
        r, s = rs >> 4, rs & 0x0F
        val = 0
        if s == 0:
            if r < 15:  # EOBn: total run = (1 << r) + appended bits
                eobrun = 1 << r
                if r:
                    eobrun += reader.receive(r)
                break  # tail corrections of THIS block read below
            # r == 15: ZRL — skip 16 zero-history coefficients
        else:
            if s != 1:
                raise ValueError("jpeg: AC refine size must be 1")
            val = p1 if reader.read_bit() else m1
        while k <= se:
            if blk[k] != 0:
                _correct(k)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if val and k <= se:
            blk[k] = val
        k += 1
    if eobrun > 0:  # EOBn consumed this block: read its tail corrections
        while k <= se:
            if blk[k] != 0:
                _correct(k)
            k += 1
        return eobrun - 1
    return 0


def _assemble_progressive(frame, stores, qt):
    """Dequantize the accumulated zig-zag coefficients, IDCT, reassemble
    planes and color-convert — the baseline tail applied to the
    progressive coefficient store."""
    H, W, comps, hmax, vmax, mcux, mcuy = frame
    planes = []
    for ci, (_cid, ch, cv, tq) in enumerate(comps):
        hb_pad, wb_pad, _ = stores[ci].shape
        zz = stores[ci].reshape(-1, 64).astype(np.int64)
        nat = np.zeros_like(zz)
        nat[:, ZIGZAG] = zz
        coeffs = nat.reshape(-1, 8, 8) * qt[tq]
        spatial = idct_blocks(coeffs)
        samples = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        # (hb*wb, 8, 8) raster blocks → (hb*8, wb*8) plane
        plane = (
            samples.reshape(hb_pad, wb_pad, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(hb_pad * 8, wb_pad * 8)
        )
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


# ---------------------------------------------------------------------------
# Progressive encoder (test/fixture side) — the forward-DCT machinery
# above emitting a spec-valid multi-scan SOF2 stream, so the progressive
# decoder's every path (DC first/refine, AC first with EOB runs, AC
# successive-approximation refinement with buffered correction bits) is
# exercised by fixtures the SQL oracle can still verify in closed form.
# ---------------------------------------------------------------------------

#: Default scan script: spectral selection (bands 1-5 / 6-63) crossed
#: with successive approximation (Al 2 → 1 → 0 for AC, 1 → 0 for DC) —
#: the libjpeg-style progression shape, so refinement scans are real,
#: not degenerate.
DEFAULT_PROGRESSION = (
    (0, 0, 0, 1),
    (1, 5, 0, 2), (6, 63, 0, 2),
    (1, 5, 2, 1), (6, 63, 2, 1),
    (0, 0, 1, 0),
    (1, 5, 1, 0), (6, 63, 1, 0),
)


#: AC table for progressive scans: the Annex K baseline AC table has no
#: EOBn symbols (0x10..0xE0 — baseline never emits an end-of-band RUN),
#: so progressive streams need their own table, exactly why libjpeg
#: always emits custom DHTs in progressive mode. This one is the
#: simplest spec-valid canonical code: every needed symbol (EOB0..EOB14,
#: ZRL, and run/size for sizes 1..10) at length 8 — 176 codes < 255, so
#: the forbidden all-ones codeword is never assigned. Compression is a
#: fixture non-goal; decodability by ANY conformant decoder is.
PROG_AC_SYMBOLS = (
    [r << 4 for r in range(15)] + [0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
PROG_AC_COUNTS = [0] * 16
PROG_AC_COUNTS[7] = len(PROG_AC_SYMBOLS)  # all codes 8 bits long

_PROG_AC_TABLE = HuffTable(PROG_AC_COUNTS, PROG_AC_SYMBOLS)


def _dht_prog_seg() -> bytes:
    """DHT for the progressive AC table, registered as (class 1, id 1)."""
    return _seg(
        0xC4,
        bytes([0x11]) + bytes(PROG_AC_COUNTS) + bytes(PROG_AC_SYMBOLS),
    )


class _ProgACState:
    """Per-AC-scan entropy state: the pending end-of-band run and the
    correction bits it owns (flushed together — run-level bits precede
    the next symbol; the caller flushes each block's own buffered bits
    separately after its significance symbol, matching the decoder's
    read order)."""

    def __init__(self, w: _BitWriter, ac: HuffTable):
        self.w = w
        self.ac = ac
        self.eobrun = 0
        self.run_bits: list[int] = []

    def emit_symbol(self, sym: int) -> None:
        code, ln = self.ac.encode_map[sym]
        self.w.write(code, ln)

    def emit_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.emit_symbol(nbits << 4)
            if nbits:
                self.w.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
            for bit in self.run_bits:
                self.w.write(bit, 1)
            self.run_bits = []

    def end_block(self, deferred: bool, cur_bits: list[int]) -> None:
        """Close one block: if its band tail was not explicitly coded,
        it joins the pending EOB run (carrying its buffered correction
        bits); a full run flushes."""
        if deferred:
            self.eobrun += 1
            self.run_bits.extend(cur_bits)
            if self.eobrun == 0x7FFF:
                self.emit_eobrun()


def _enc_ac_first_block(st: _ProgACState, blk, ss: int, se: int,
                        al: int) -> None:
    """First AC pass over a band (G.1.2.2 encoder side): run/size coding
    of the point-transformed coefficients with end-of-band runs."""
    r = 0
    coded_to_end = False
    for k in range(ss, se + 1):
        t = int(blk[k])
        a = (abs(t) >> al)
        if a == 0:
            r += 1
            coded_to_end = False
            continue
        st.emit_eobrun()
        while r > 15:
            st.emit_symbol(0xF0)
            r -= 16
        v = a if t > 0 else -a
        nbits, code = _magnitude(v)
        st.emit_symbol((r << 4) | nbits)
        st.w.write(code & ((1 << nbits) - 1), nbits)
        r = 0
        coded_to_end = True
    st.end_block(deferred=not coded_to_end or r > 0, cur_bits=[])


def _enc_ac_refine_block(st: _ProgACState, blk, ss: int, se: int,
                         al: int) -> None:
    """AC refinement pass (G.1.2.3 encoder side): newly-significant
    coefficients as run/1 symbols whose runs count zero-history
    positions; already-nonzero coefficients contribute buffered
    correction bits, emitted after the next symbol (or with the EOB
    run that absorbs them)."""
    absv = {}
    eob = ss - 1  # last newly-significant position
    for k in range(ss, se + 1):
        a = abs(int(blk[k])) >> al
        absv[k] = a
        if a == 1:
            eob = k
    r = 0
    cur_bits: list[int] = []
    for k in range(ss, se + 1):
        a = absv[k]
        if a == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            st.emit_eobrun()
            st.emit_symbol(0xF0)
            r -= 16
            for bit in cur_bits:
                st.w.write(bit, 1)
            cur_bits = []
        if a > 1:  # nonzero history: one correction bit, run unchanged
            cur_bits.append(a & 1)
            continue
        st.emit_eobrun()
        st.emit_symbol((r << 4) | 1)
        st.w.write(1 if int(blk[k]) > 0 else 0, 1)
        for bit in cur_bits:
            st.w.write(bit, 1)
        cur_bits = []
        r = 0
    st.end_block(deferred=r > 0 or bool(cur_bits), cur_bits=cur_bits)


def _sof2_seg(h: int, w: int, ncomp: int) -> bytes:
    payload = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    payload += bytes([ncomp])
    for c in range(ncomp):
        payload += bytes([c + 1, 0x11, 0])  # 1x1 sampling, quant table 0
    return _seg(0xC2, payload)


def _encode_progressive_planes(planes: list, scans) -> bytes:
    """Shared SOF2 emitter over 1x1-sampled planes (1 = grayscale, 3 =
    YCbCr). DC scan entries (ss == 0) run interleaved over all
    components; AC entries expand to one single-component scan each, in
    component order — both exactly the structures the decoder's scan
    dispatch handles."""
    H, W = planes[0].shape
    q = np.ones((8, 8), np.int64)
    dc, _ = _LUM_TABLES
    ac = _PROG_AC_TABLE
    zz = [_quantized_zigzag(_plane_blocks(p), q) for p in planes]
    ncomp = len(planes)
    out = bytearray(b"\xff\xd8" + _dqt_seg(q) + _sof2_seg(H, W, ncomp)
                    + _dht_seg() + _dht_prog_seg())
    for ss, se, ah, al in scans:
        if ss == 0:  # DC scan, interleaved (1x1 sampling: MCU = 1 block/comp)
            bw = _BitWriter()
            if ah == 0:
                preds = [0] * ncomp
                for bi in range(zz[0].shape[0]):
                    for ci in range(ncomp):
                        v = int(zz[ci][bi][0]) >> al
                        t, code = _magnitude(v - preds[ci])
                        preds[ci] = v
                        hcode, hlen = dc.encode_map[t]
                        bw.write(hcode, hlen)
                        if t:
                            bw.write(code, t)
            else:
                for bi in range(zz[0].shape[0]):
                    for ci in range(ncomp):
                        bw.write((int(zz[ci][bi][0]) >> al) & 1, 1)
            bw.flush()
            hdr = bytes([ncomp])
            for c in range(ncomp):
                hdr += bytes([c + 1, 0x00])
            out += _seg(0xDA, hdr + bytes([ss, se, (ah << 4) | al]))
            out += bytes(bw.out)
        else:  # AC scans: one per component
            for ci in range(ncomp):
                bw = _BitWriter()
                st = _ProgACState(bw, ac)
                for bi in range(zz[ci].shape[0]):
                    if ah == 0:
                        _enc_ac_first_block(st, zz[ci][bi], ss, se, al)
                    else:
                        _enc_ac_refine_block(st, zz[ci][bi], ss, se, al)
                st.emit_eobrun()
                bw.flush()
                out += _seg(0xDA, bytes([1, ci + 1, 0x01,  # Ta = 1 (prog AC)
                                         ss, se, (ah << 4) | al]))
                out += bytes(bw.out)
    return bytes(out) + b"\xff\xd9"


def encode_jpeg_gray_progressive(
    arr: np.ndarray, scans=DEFAULT_PROGRESSION
) -> bytes:
    """Encode a (H, W) uint8 grayscale array (dims multiples of 8) as a
    spec-valid PROGRESSIVE JPEG (SOF2) with the default libjpeg-style
    scan script. With the all-ones quant table, constant 8x8 blocks
    round-trip exactly through every progressive pass (DC point
    transform + refinement reassemble the exact DC; all AC are zero, so
    the AC scans are pure end-of-band runs) — the closed-form-oracle
    property of encode_jpeg_gray extended to the multi-scan stream."""
    h, w = arr.shape
    if h % 8 or w % 8:
        raise ValueError(
            "encode_jpeg_gray_progressive: dims must be multiples of 8"
        )
    return _encode_progressive_planes([arr], scans)


def encode_jpeg_color_progressive(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, scans=DEFAULT_PROGRESSION
) -> bytes:
    """Encode explicit full-resolution YCbCr planes (1x1 sampling) as a
    3-component progressive JPEG — exercises the decoder's interleaved
    DC scans and per-component AC band scans."""
    if y.shape != cb.shape or cb.shape != cr.shape:
        raise ValueError("encode_jpeg_color_progressive: plane mismatch")
    h, w = y.shape
    if h % 8 or w % 8:
        raise ValueError(
            "encode_jpeg_color_progressive: dims must be multiples of 8"
        )
    return _encode_progressive_planes([y, cb, cr], scans)
