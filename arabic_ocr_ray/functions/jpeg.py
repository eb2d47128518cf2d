"""Baseline JPEG codec — stdlib+numpy only, no PIL/libjpeg.

Closes the LAST decode stub (multimodal's image path handled PNG
only; JPEG was absent "because the sandbox stdlib has no DCT codec").
The DCT is an 8×8 orthonormal matrix product (``F = M f Mᵀ``),
vectorized with one ``einsum`` over ALL blocks of a component, so the
only per-symbol Python is the entropy (huffman) layer — the same
honesty trade-off as the PNG unfilter loop in ``codecs.py``.

Implements ITU-T T.81 baseline sequential DCT:

- **encoder** ``jpeg_encode``: grayscale or RGB (JFIF YCbCr), 4:4:4
  or 4:2:0 chroma subsampling, IJG-style quality scaling of the
  Annex K quantization tables, Annex K huffman tables, DC DPCM,
  run/size AC coding with ZRL/EOB, 0xFF byte stuffing, optional
  restart intervals (DRI + RSTn).
- **decoder** ``jpeg_decode``: marker walk (APPn/COM skipped, DQT
  8/16-bit, DHT multi-table segments, DRI), baseline SOF0/SOF1 only
  (progressive SOF2 rejected loudly), entropy decode via a flat
  16-bit peek LUT (the fast equivalent of the spec's F.16
  mincode/maxcode walk, cached per table spec), restart-segment
  DC-predictor reset, vectorized dequant + inverse DCT, chroma
  upsample, YCbCr→RGB.

Exactness contract used by the ``mm_jpeg_stats`` oracle: an image
whose every 8×8 block is FLAT with gray ``128 + Q00·k`` quantizes to
a DC-only block with zero rounding error (DC = 8·Q00·k, AC ≡ 0), so
encode→decode round-trips byte-exactly and a closed-form SQL twin can
verify the whole container + huffman + DPCM + IDCT path.

Reference analog: the reference reads its page images through
``cv2.imread`` (segment_words.py:215); here the byte-level codec is
real instead of a binding.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K — public tables) -------------------------

#: zigzag position k → raster index (T.81 figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

#: Annex K.1 luminance / K.2 chrominance quantization tables (raster)
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3–K.6 huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
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
    0xF9, 0xFA])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
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
    0xF9, 0xFA])

#: orthonormal 8×8 DCT-II matrix: F = M f Mᵀ gives T.81 scaling
#: (flat block of value Δ → DC = 8Δ)
_M = np.array([[
    (np.sqrt(0.5) if u == 0 else 1.0) * 0.5
    * np.cos((2 * x + 1) * u * np.pi / 16)
    for x in range(8)] for u in range(8)])


def quant_table(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg formula): 1..100 →
    scaled Annex K table, clamped to [1, 255]."""
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# --- huffman ----------------------------------------------------------------

def _encode_codes(bits, vals):
    """Canonical code assignment → {symbol: (code, length)}."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return codes


#: spec-table → decode-LUT cache.  Streams from non-optimizing
#: encoders reuse the four Annex K tables, but libjpeg -optimize /
#: mozjpeg output carries per-image tables, so a long-lived decoder
#: actor would otherwise accumulate one ~0.5 MB list per distinct
#: spec forever — bounded by clear-on-full (same policy as the
#: extract label cache): the common-table hit rate is what matters,
#: and those re-enter the cache immediately after a clear.
_LUT_CACHE: dict = {}
_LUT_CACHE_MAX = 64


def _decode_table(bits, vals):
    """Flat 16-bit lookup decoder (faster equivalent of the spec's
    F.16 mincode/maxcode walk): entry[peek16] = (length << 8) | symbol,
    0 = invalid prefix.  Built with one numpy slice-fill per code and
    converted to a Python list for O(30 ns) scalar lookups; cached by
    the raw (BITS, HUFFVAL) spec since every scan of a corpus
    typically carries the same four tables."""
    key = bytes(bits) + bytes(vals)
    lut = _LUT_CACHE.get(key)
    if lut is None:
        arr = np.zeros(1 << 16, np.int32)
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                arr[lo:lo + (1 << (16 - length))] = (length << 8) | vals[k]
                k += 1
                code += 1
            code <<= 1
        if len(_LUT_CACHE) >= _LUT_CACHE_MAX:
            _LUT_CACHE.clear()
        lut = _LUT_CACHE[key] = arr.tolist()
    return lut


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (spec convention)."""
        if self.n:
            byte = ((self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1))
            self.buf.append(byte & 0xFF)
            if (byte & 0xFF) == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.n = 0


def _extend(bits: int, size: int) -> int:
    """Signed-magnitude extension (T.81 F.12)."""
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _decode_mcu_run(db: bytes, order, dc_tabs, ac_tabs, zz_store,
                    mcu: int, end: int, mcus_x: int) -> int:
    """Entropy-decode one restart segment's MCUs ``[mcu, end)`` into
    ``zz_store``; returns the next MCU index.

    This is the codec's only per-symbol hot loop, so the bit reader is
    fully inlined as local ints: whole bytes roll into an accumulator,
    each huffman symbol is ONE 16-bit peek + LUT hit (``_decode_table``)
    instead of the spec's per-bit F.16 walk, and the T.81 F.12 signed
    extension is folded into the value read.  The peek 1-pads past the
    stream end (pad bits may complete a peek but never a consumed code
    — the length check raises "truncated" before over-consuming).
    DC predictors reset per call, per the restart-marker contract."""
    nbytes = len(db)
    bytepos = 0
    acc = 0
    nb = 0                           # valid bits in acc
    preds = [0] * len(order)
    while mcu < end:
        my, mx = divmod(mcu, mcus_x)
        for ci, hs, vs, tq, td, ta in order:
            dc_lut, ac_lut = dc_tabs[td], ac_tabs[ta]
            store = zz_store[ci]
            row_w = mcus_x * hs
            for by in range(vs):
                for bx in range(hs):
                    zz = [0] * 64
                    k = 0                          # 0 ⇒ next is DC
                    while k < 64:
                        while nb < 16 and bytepos < nbytes:
                            acc = (acc << 8) | db[bytepos]
                            bytepos += 1
                            nb += 8
                        if nb >= 16:
                            p = (acc >> (nb - 16)) & 0xFFFF
                        else:
                            p = ((acc << (16 - nb))
                                 | ((1 << (16 - nb)) - 1)) & 0xFFFF
                        e = (dc_lut if k == 0 else ac_lut)[p]
                        if e == 0:
                            raise ValueError("invalid huffman code")
                        length = e >> 8
                        if length > nb:
                            raise ValueError("truncated entropy segment")
                        nb -= length
                        acc &= (1 << nb) - 1
                        sym = e & 0xFF
                        if k == 0:
                            size = sym
                            if size > 11:  # T.81 table F.1: DC SSSS 0..11
                                raise ValueError("bad DC symbol")
                        else:
                            if sym == 0x00:            # EOB
                                break
                            run, size = sym >> 4, sym & 15
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16                # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run overflow")
                        if size:
                            while nb < size:
                                if bytepos >= nbytes:
                                    raise ValueError(
                                        "truncated entropy segment")
                                acc = (acc << 8) | db[bytepos]
                                bytepos += 1
                                nb += 8
                            nb -= size
                            v = (acc >> nb) & ((1 << size) - 1)
                            acc &= (1 << nb) - 1
                            if v < (1 << (size - 1)):  # T.81 F.12
                                v -= (1 << size) - 1
                        else:
                            v = 0
                        if k == 0:
                            preds[ci] += v
                            zz[0] = preds[ci]
                        else:
                            zz[k] = v
                        k += 1
                    store[(my * vs + by) * row_w + mx * hs + bx] = zz
        mcu += 1
    return mcu


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --- encoder ----------------------------------------------------------------

def _rgb_to_ycbcr(a: np.ndarray):
    r, g, b = (a[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _zz_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Level-shifted plane (multiple-of-8 dims) → quantized zigzag
    coefficients, shape (bh, bw, 64) — ONE einsum for every block."""
    h, w = plane.shape
    bh, bw = h // 8, w // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coeffs = _M @ blocks @ _M.T          # F = M f Mᵀ, broadcast

    q = np.round(coeffs / qtab.reshape(8, 8)).astype(np.int64)
    return q.reshape(bh, bw, 64)[:, :, ZIGZAG]


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = int(nz[-1]) + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]          # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]              # EOB
        bw.write(code, length)
    return dc


def jpeg_encode(arr: np.ndarray, quality: int = 50,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → baseline JFIF bytes.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2×2
    chroma average, the web default).  ``restart_interval`` > 0 emits
    DRI + RSTn markers every that-many MCUs (the error-resilience
    feature real crawl JPEGs carry)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError("expected (h,w) gray or (h,w,3) RGB")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError("image exceeds JPEG's 16-bit dimension limit")

    qt_l = quant_table(QT_LUM, quality)
    sub = 2 if (not gray and subsampling == "420") else 1
    mh = -(-h // (8 * sub)) * (8 * sub)
    mw = -(-w // (8 * sub)) * (8 * sub)

    def pad(p):
        return np.pad(p, ((0, mh - h), (0, mw - w)), mode="edge")

    comps = []   # (id, hs, vs, tq, td/ta, zz_blocks)
    if gray:
        qts = [qt_l]
        comps.append((1, 1, 1, 0, 0,
                      _zz_blocks(pad(a.astype(np.float64)) - 128.0, qt_l)))
    else:
        qt_c = quant_table(QT_CHR, quality)
        qts = [qt_l, qt_c]
        y, cb, cr = _rgb_to_ycbcr(a)
        y, cb, cr = pad(y), pad(cb), pad(cr)
        if sub == 2:
            cb = cb.reshape(mh // 2, 2, mw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(mh // 2, 2, mw // 2, 2).mean(axis=(1, 3))
        comps.append((1, sub, sub, 0, 0, _zz_blocks(y - 128.0, qt_l)))
        comps.append((2, 1, 1, 1, 1, _zz_blocks(cb - 128.0, qt_c)))
        comps.append((3, 1, 1, 1, 1, _zz_blocks(cr - 128.0, qt_c)))

    out = bytearray(b"\xff\xd8")                               # SOI
    out += (b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00"
            b"\x00\x01\x00\x01\x00\x00")                       # APP0
    for tq, qt in enumerate(qts):                              # DQT
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(x) for x in qt[ZIGZAG])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * len(comps),
                                     8, h, w, len(comps))          # SOF0
    for cid, hs, vs, tq, _, _ in comps:
        out += struct.pack("BBB", cid, (hs << 4) | vs, tq)
    huff_specs = [(0x00, _DC_LUM), (0x10, _AC_LUM)]
    if not gray:
        huff_specs += [(0x01, _DC_CHR), (0x11, _AC_CHR)]
    for tc_th, (bits, vals) in huff_specs:                     # DHT
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comps),
                                     len(comps))               # SOS
    for cid, _, _, _, t, _ in comps:
        out += struct.pack("BB", cid, (t << 4) | t)
    out += b"\x00\x3f\x00"                                     # Ss/Se/AhAl

    dc_lum = _encode_codes(*_DC_LUM)
    ac_lum = _encode_codes(*_AC_LUM)
    dc_tabs = [dc_lum, _encode_codes(*_DC_CHR)]
    ac_tabs = [ac_lum, _encode_codes(*_AC_CHR)]

    mcus_x, mcus_y = mw // (8 * sub), mh // (8 * sub)
    bw_ = _BitWriter()
    preds = [0] * len(comps)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw_.flush()
                out += bw_.buf
                bw_.buf = bytearray()
                out += bytes([0xFF, 0xD0 +
                              ((mcu // restart_interval - 1) % 8)])
                preds = [0] * len(comps)
            for ci, (_, hs, vs, _, t, zz) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        preds[ci] = _encode_block(
                            bw_, zz[my * vs + by, mx * hs + bx],
                            preds[ci], dc_tabs[t], ac_tabs[t])
            mcu += 1
    bw_.flush()
    out += bw_.buf
    out += b"\xff\xd9"                                         # EOI
    return bytes(out)


# --- decoder ----------------------------------------------------------------

def _split_scan(data: bytes, pos: int):
    """Entropy-coded bytes from ``pos`` → (destuffed restart segments,
    position of the terminating marker)."""
    segs, cur = [], bytearray()
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        if pos + 1 >= n:
            raise ValueError("truncated scan")
        m = data[pos + 1]
        if m == 0x00:                      # stuffed 0xFF data byte
            cur.append(0xFF)
            pos += 2
        elif 0xD0 <= m <= 0xD7:            # restart marker
            segs.append(bytes(cur))
            cur = bytearray()
            pos += 2
        else:                              # EOI or next real marker
            segs.append(bytes(cur))
            return segs, pos
    raise ValueError("scan ran past end of data")


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes → (h, w) uint8 gray or (h, w, 3) RGB.

    Raises ``ValueError`` on ANY malformed input — non-JPEG,
    truncated, progressive (SOF2), corrupt segment lengths, short
    DHT/SOF/SOS tables — never ``struct.error``/``IndexError``: the
    decoder is a crawl-facing surface and PixelDecoder's per-row
    error isolation catches ``ValueError`` only."""
    try:
        return _jpeg_decode_impl(data)
    except (struct.error, IndexError, OverflowError) as e:
        raise ValueError(f"corrupt JPEG: {type(e).__name__}: {e}") from e


def _jpeg_decode_impl(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, tuple] = {}
    ac_tabs: dict[int, tuple] = {}
    frame = None
    ri = 0
    scan = None
    while scan is None:
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG (no SOS)")
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        m = data[pos + 1]
        pos += 2
        if m == 0xD9:
            raise ValueError("EOI before any scan")
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue                                    # parameterless
        seg_len = struct.unpack_from(">H", data, pos)[0]
        seg = data[pos + 2:pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated segment")
        if m == 0xDB:                                   # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    vals = np.frombuffer(seg[i:i + 64],
                                         np.uint8).astype(np.int64)
                    i += 64
                else:
                    vals = np.frombuffer(seg[i:i + 128],
                                         ">u2").astype(np.int64)
                    i += 128
                qt = np.zeros(64, np.int64)
                qt[ZIGZAG] = vals
                qts[tq] = qt
        elif m == 0xC4:                                 # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = \
                    _decode_table(bits, vals)
                i += 17 + nv
        elif m in (0xC0, 0xC1):                         # SOF0/SOF1
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            if fh == 0 or fw == 0 or not 1 <= nc <= 4:
                raise ValueError("bad SOF dimensions/component count")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * c)
                h_s, v_s = hv >> 4, hv & 15
                if not (1 <= h_s <= 4 and 1 <= v_s <= 4):
                    raise ValueError("bad SOF sampling factors")
                comps.append([cid, h_s, v_s, tq])
            frame = (fh, fw, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                   0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported SOF marker 0x%02X (progressive/extended "
                "JPEG — baseline only)" % m)
        elif m == 0xDD:                                 # DRI
            ri = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:                                 # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 15))
            scan = (scan_comps, pos + seg_len)
        pos += seg_len

    fh, fw, comps = frame
    scan_comps, spos = scan
    if len(scan_comps) != len(comps):
        # A T.81-legal baseline file may carry one scan per component
        # (non-interleaved).  This decoder handles the single
        # interleaved scan only — decoding just the first scan would
        # return a one-plane image with status "ok", silently wrong.
        raise ValueError(
            f"scan covers {len(scan_comps)}/{len(comps)} components "
            f"(non-interleaved multi-scan JPEG unsupported)")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    order = []                 # per-MCU block emission order
    for cs, td, ta in scan_comps:
        match = [c for c in comps if c[0] == cs]
        if not match:
            raise ValueError("scan references unknown component")
        cid, hs, vs, tq = match[0]
        if tq not in qts or td not in dc_tabs or ta not in ac_tabs:
            raise ValueError("missing quant/huffman table")
        order.append((len(order), hs, vs, tq, td, ta))
    zz_store = [np.zeros((mcus_y * vs * mcus_x * hs, 64), np.int64)
                for _, hs, vs, _, _, _ in order]

    segs, _ = _split_scan(data, spos)
    mcu = 0
    for seg_bytes in segs:
        if mcu >= n_mcus:
            break
        end = min(n_mcus, mcu + ri) if ri else n_mcus
        mcu = _decode_mcu_run(seg_bytes, order, dc_tabs, ac_tabs,
                              zz_store, mcu, end, mcus_x)
    if mcu < n_mcus:
        raise ValueError(f"decoded {mcu}/{n_mcus} MCUs (truncated)")

    planes = []
    for (ci, hs, vs, tq, _, _), zz in zip(order, zz_store):
        flat = np.zeros_like(zz)
        flat[:, ZIGZAG] = zz
        deq = (flat * qts[tq][None, :]).reshape(-1, 8, 8)
        px = _M.T @ deq.astype(np.float64) @ _M      # f = Mᵀ F M
        px = np.clip(np.round(px + 128.0), 0, 255).astype(np.uint8)
        gh, gw = mcus_y * vs, mcus_x * hs
        plane = (px.reshape(gh, gw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(gh * 8, gw * 8))
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                          hmax // hs, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        return planes[0]
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.stack([np.clip(np.round(x), 0, 255).astype(np.uint8)
                     for x in (r, g, b)], axis=-1)


def probe_jpeg(p: bytes) -> dict:
    """Header-only dims probe (marker walk to SOF), for HeaderDecoder.
    Like :func:`jpeg_decode`, corrupt input raises ``ValueError`` only."""
    try:
        return _probe_jpeg_impl(p)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt JPEG: {type(e).__name__}: {e}") from e


def _probe_jpeg_impl(p: bytes) -> dict:
    if len(p) < 4 or p[:2] != b"\xff\xd8":
        raise ValueError("bad jpeg header")
    pos = 2
    while pos + 4 <= len(p):
        if p[pos] != 0xFF:
            raise ValueError("bad jpeg marker stream")
        m = p[pos + 1]
        pos += 2
        if m == 0x01 or 0xD0 <= m <= 0xD9:
            continue
        seg_len = struct.unpack_from(">H", p, pos)[0]
        if m in (0xC0, 0xC1, 0xC2, 0xC3):
            _, fh, fw, nc = struct.unpack_from(">BHHB", p, pos + 2)
            return {"width": fw, "height": fh, "channels": nc,
                    "frames": 1, "sample_rate": 0}
        pos += seg_len
    raise ValueError("no SOF in jpeg")
