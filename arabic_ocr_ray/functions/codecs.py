"""Real pixel/sample codecs — stdlib-only PNG and WAV, no PIL/ffmpeg.

The r1–r4 multimodal stage probed real container HEADERS but stubbed
bulk decode ("StubDecoder", the one weak item in the r4 review).
This module closes that gap for the two formats the sandbox's stdlib
can genuinely handle:

- **PNG** (public RFC 2083 / W3C spec): chunk walk → zlib-decompress
  the IDAT stream → per-scanline UNFILTER (all five filter types:
  None/Sub/Up/Average/Paeth) → (h, w, c) uint8 array.  The encoder
  emits real zlib IDAT and deliberately alternates None/Up filters so
  the decoder's unfilter paths are exercised by every synthetic
  corpus, not just the trivial filter-0 row.
- **WAV** (RIFF PCM): stdlib ``wave`` module + ``np.frombuffer`` →
  (frames, channels) int16 array, and the inverse.

Scale/honesty note: the unfilter inner loop for Sub/Average/Paeth has
a true x-recurrence, so those rows cost a Python loop over width —
fine for thumbnails/test corpora; a production deployment swaps this
module for PIL/libpng behind the same PixelDecoder interface
(multimodal.py).  Up/None rows are fully vectorized.

Reference analog: the actual pixel work the reference does through
OpenCV (``cv2.imread``, segment_words.py:215); here it is the real
byte-level codec instead of a binding.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type → samples/px (8-bit)


def _corrupt_guard(fn):
    """Decoders are crawl-facing: corrupt bytes must surface as the
    ValueError that PixelDecoder's per-row isolation catches, never a
    stdlib internal — struct.error from a short unpack, IndexError
    from a short slice, RuntimeError from wave's chunk seek on a
    mangled RIFF, OverflowError from an absurd declared size — any of
    which would kill the whole map_batches task."""
    import functools

    @functools.wraps(fn)
    def wrapped(data, *a, **kw):
        try:
            return fn(data, *a, **kw)
        except (struct.error, IndexError,
                OverflowError, RuntimeError) as e:
            raise ValueError(
                f"corrupt payload: {type(e).__name__}: {e}") from e
    return wrapped


def png_encode(arr: np.ndarray, level: int = 6) -> bytes:
    """(h, w) or (h, w, c) uint8 → real PNG bytes (8-bit depth).

    Scanline filters alternate None (even rows) / Up (odd rows): both
    encode AND decode stay vectorized, and round-trip tests cover two
    filter paths for free."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">II5B", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.uint8)
    for y in range(h):
        row = a[y].reshape(-1)
        if y % 2 == 0:
            raw.append(0)                      # filter None
            raw += row.tobytes()
        else:
            raw.append(2)                      # filter Up
            raw += ((row.astype(np.int16) - prev) % 256).astype(
                np.uint8).tobytes()
        prev = row
    idat = zlib.compress(bytes(raw), level)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


@_corrupt_guard
def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, c) uint8.  8-bit non-interlaced only (the
    standard web/thumbnail case); anything else raises ValueError."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("bad png signature")
    pos, n = 8, len(data)
    w = h = 0
    bit_depth = color_type = interlace = -1
    idat = bytearray()
    while pos + 8 <= n:
        (clen,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + clen]
        if len(body) < clen:
            raise ValueError("truncated chunk")
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + clen  # len + tag + body + crc
    if w == 0 or h == 0:
        raise ValueError("missing IHDR")
    if bit_depth != 8 or interlace != 0:
        raise ValueError(f"unsupported png (depth={bit_depth}, "
                         f"interlace={interlace})")
    c = _CHANNELS.get(color_type)
    if c is None:
        raise ValueError(f"unsupported color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("idat size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = c  # bytes per pixel at 8-bit depth
    for y in range(h):
        f = int(filters[y])
        cur = rows[y, 1:]
        if f == 0:                      # None
            line = cur.copy()
        elif f == 2:                    # Up — vectorized
            line = cur + prev           # uint8 wraps mod 256
        elif f == 1:                    # Sub — x-recurrence
            line = cur.copy()
            for x in range(bpp, stride):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
        elif f == 3:                    # Average
            line = cur.copy()
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) \
                    & 0xFF
        elif f == 4:                    # Paeth
            line = cur.copy()
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                line[x] = (int(cur[x]) + _paeth(a, b, cc)) & 0xFF
        else:
            raise ValueError(f"bad filter {f} at row {y}")
        out[y] = line
        prev = line
    return out.reshape(h, w, c)


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(frames,) or (frames, channels) int16 → canonical PCM WAV."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(s.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(s.tobytes())
    return buf.getvalue()


@_corrupt_guard
def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → ((frames, channels) int16, sample_rate).
    16-bit PCM only (the canonical synthetic/web-audio case)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError(f"unsupported width {f.getsampwidth()}")
        ch = f.getnchannels()
        sr = f.getframerate()
        pcm = f.readframes(f.getnframes())
    a = np.frombuffer(pcm, dtype="<i2")
    a = a.reshape(-1, ch) if ch > 1 else a[:, None]
    return a, sr


def avi_encode(frames: np.ndarray, fps: int = 30) -> bytes:
    """(f, h, w, 3) uint8 RGB → real uncompressed RIFF AVI.

    Canonical 'DIB ' layout (public AVI/BITMAPINFOHEADER spec): one
    ``00db`` chunk per frame, 24-bit BGR scanlines stored BOTTOM-UP
    and row-padded to 4 bytes, plus a proper ``idx1`` index and
    AVIF_HASINDEX flag — the same byte layout VfW writes for
    BI_RGB video, so any standard player/probe reads it."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim != 4 or a.shape[3] != 3:
        raise ValueError("expected (f, h, w, 3) uint8")
    f, h, w, _ = a.shape
    stride = (3 * w + 3) & ~3
    # RGB → BGR, flip rows bottom-up, pad each row to the DIB stride
    bgr = a[:, ::-1, :, ::-1]
    rows = np.zeros((f, h, stride), dtype=np.uint8)
    rows[:, :, :3 * w] = bgr.reshape(f, h, 3 * w)
    frame_bytes = rows.reshape(f, -1)
    sz = h * stride

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) % 2 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<14I", 1000000 // max(1, fps), sz * fps, 0, 0x10,  # HASINDEX
        f, 0, 1, sz, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB "
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, f, sz,
                          0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, sz,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"movi" + b"".join(
        chunk(b"00db", frame_bytes[i].tobytes()) for i in range(f))
    movi = chunk(b"LIST", movi_body)
    # idx1 offsets are relative to the 'movi' fourcc position
    idx = b"".join(
        struct.pack("<4sIII", b"00db", 0x10, 4 + i * (8 + sz + (sz % 2)),
                    sz)
        for i in range(f))
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_corrupt_guard
def avi_decode_frames(data: bytes) -> np.ndarray:
    """Uncompressed RIFF AVI bytes → (f, h, w, 3) uint8 RGB.

    Proper RIFF chunk walk (no substring scanning — payload bytes may
    contain any fourcc): hdrl → strf BITMAPINFOHEADER for dimensions,
    movi LIST → every ``00db``/``00dc`` chunk unpadded, flipped
    top-down, BGR→RGB.  24-bit BI_RGB only (the canonical
    uncompressed case); anything else raises ValueError."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("bad avi signature")
    w = h = -1
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h
        while pos + 8 <= end:
            tag = data[pos:pos + 4]
            (clen,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            body_end = body_start + clen
            if body_end > end:
                raise ValueError("truncated avi chunk")
            if tag == b"LIST":
                walk(body_start + 4, body_end)     # skip list kind
            elif tag == b"strf":
                if clen < 20:
                    raise ValueError("short strf")
                _, bw, bh, _, bits, comp = struct.unpack_from(
                    "<IiiHHI", data, body_start)
                if comp != 0 or bits != 24:
                    raise ValueError(
                        f"unsupported avi (bits={bits}, comp={comp})")
                w, h = bw, abs(bh)
            elif tag in (b"00db", b"00dc"):
                if w <= 0 or h <= 0:
                    raise ValueError("frame before strf")
                stride = (3 * w + 3) & ~3
                if clen != h * stride:
                    raise ValueError("frame size mismatch")
                rows = np.frombuffer(
                    data, dtype=np.uint8, count=clen, offset=body_start
                ).reshape(h, stride)
                frames.append(rows[::-1, :3 * w].reshape(h, w, 3)
                              [:, :, ::-1])
            pos = body_end + (clen % 2)            # chunks are word-aligned

    walk(12, len(data))
    if w <= 0:
        raise ValueError("missing strf")
    if not frames:
        return np.zeros((0, h, w, 3), dtype=np.uint8)
    return np.stack(frames)


def resize_box(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Integer nearest-index resample (h, w, c) → (th, tw, c) — the
    deterministic thumbnail kernel behind ``multimodal.resize_plan``'s
    integer dimension plan.  Index map ``src = (dst * size) // target``
    (pure integers, no float rounding ambiguity)."""
    h, w, _ = img.shape
    ys = (np.arange(th, dtype=np.int64) * h) // th
    xs = (np.arange(tw, dtype=np.int64) * w) // tw
    return img[ys][:, xs]
