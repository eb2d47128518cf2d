"""Multimodal column plumbing — opaque binary payloads with typed
metadata, processed by actor-pool stages.

Two decode layers:

- :class:`HeaderDecoder` — a REAL pure-python container prober
  (ffprobe-lite): parses PNG IHDR, canonical WAV headers and RIFF-AVI
  ``avih`` main headers with struct reads, no external libraries.
  This is the metadata path a 100 TB ingest actually runs per object
  before any pixel work, and it is oracle-checkable: the synthetic
  corpus writes genuine format headers whose fields derive from the
  source text by integer formulas a SQL twin reproduces, so
  ``mm_decode_meta`` verifies a full synthesize→parse round trip.

- :class:`PixelDecoder` — REAL bulk decode for PNG (zlib IDAT +
  scanline unfilter), WAV PCM, and uncompressed RIFF-AVI video
  (bottom-up BGR ``00db`` frames) via the stdlib-only codecs in
  ``functions/codecs.py``; integer content stats (sum_px, sum_abs,
  peak_abs) that a SQL twin reproduces in closed form.
  :class:`FrameSampler` is the per-frame flat-map on the same codec.

Every kind decodes for REAL: PNG/WAV/AVI via ``functions/codecs.py``
and baseline ITU-T T.81 JPEG via ``functions/jpeg.py`` (huffman
entropy layer + vectorized 8×8 DCT).  The only undecodable family is
inter-frame compressed video, which the AVI codec rejects loudly
per row (status column) instead of stubbing.

Payload rows are ``(item_id, kind, payload:binary, meta:string)``;
``payload_table_from_documents`` manufactures the deterministic
corpus from any text table for tests/benches.
"""

from __future__ import annotations

import json
import struct
from wave import Error as wave_Error
from zlib import error as zlib_error

import numpy as np
import pyarrow as pa

KINDS = ("image", "audio", "video")

_META_KEYS = ("width", "height", "channels", "frames", "sample_rate")

#: every 97th item ships an empty payload — the truncated-file hazard
CORRUPT_EVERY = 97


# --- deterministic synthetic payloads --------------------------------------
#
# Field formulas (integer, SQL-twinned in __ray_entry__.oracle_sql):
# nb = octet_length(utf-8 text)
#   image (PNG):  w = 16+nb%241   h = 16+(nb*7)%199  ch=3 fr=1  sr=0
#   audio (WAV):  ch = 1+nb%2     fr = 1000+nb%9000  sr=16000
#   video (AVI):  w = 320+nb%321  h = 240+nb%241     fr = 1+nb%120 ch=3

def make_png(width: int, height: int, body: bytes = b"") -> bytes:
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    import zlib

    return (b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)) + body)


def make_wav(channels: int, sample_rate: int, frames: int,
             body: bytes = b"") -> bytes:
    data_size = frames * channels * 2          # 16-bit samples
    byte_rate = sample_rate * channels * 2
    hdr = (b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels,
                                   sample_rate, byte_rate,
                                   channels * 2, 16)
           + b"data" + struct.pack("<I", data_size))
    return hdr + body


def make_avi(width: int, height: int, frames: int,
             body: bytes = b"") -> bytes:
    avih = struct.pack("<10I", 33333, 0, 0, 0, frames, 0, 1, 0,
                       width, height) + b"\x00" * 16      # 56 bytes
    inner = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", len(inner)) + inner
    return (b"RIFF" + struct.pack("<I", 4 + len(lst) + len(body))
            + b"AVI " + lst + body)


def payload_table_from_documents(docs: pa.Table) -> pa.Table:
    """Deterministic fake corpus with REAL container headers: metadata
    fields derive from the text length by the integer formulas above;
    the utf-8 text bytes ride along as the opaque body.  Every
    ``CORRUPT_EVERY``-th item is an empty payload (truncated-file
    hazard → per-row error status)."""
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    kinds, payloads = [], []
    for i, t in zip(ids, texts):
        kind = KINDS[i % len(KINDS)]
        kinds.append(kind)
        if i % CORRUPT_EVERY == 0:
            payloads.append(b"")
            continue
        body = (t or "").encode()
        nb = len(body)
        if kind == "image":
            payloads.append(
                make_png(16 + nb % 241, 16 + (nb * 7) % 199, body))
        elif kind == "audio":
            payloads.append(
                make_wav(1 + nb % 2, 16000, 1000 + nb % 9000, body))
        else:
            payloads.append(
                make_avi(320 + nb % 321, 240 + nb % 241,
                         1 + nb % 120, body))
    return pa.table({
        "item_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array([json.dumps({"src": "documents"})] * len(ids),
                         pa.string()),
    })


# --- real header probing ---------------------------------------------------

def probe_png(p: bytes) -> dict:
    if len(p) < 33 or not p.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("bad png header")
    w, h = struct.unpack_from(">II", p, 16)
    color_type = p[25]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 0)
    return {"width": w, "height": h, "channels": channels,
            "frames": 1, "sample_rate": 0}


def probe_wav(p: bytes) -> dict:
    if len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("bad wav header")
    channels, sample_rate = struct.unpack_from("<HI", p, 22)
    bits = struct.unpack_from("<H", p, 34)[0]
    data_size = struct.unpack_from("<I", p, 40)[0]
    bpf = max(1, channels * bits // 8)
    return {"width": 0, "height": 0, "channels": channels,
            "frames": data_size // bpf, "sample_rate": sample_rate}


def probe_avi(p: bytes) -> dict:
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
        raise ValueError("bad avi header")
    pos = p.find(b"avih")
    if pos < 0 or len(p) < pos + 8 + 40:
        raise ValueError("truncated avi header")
    payload = pos + 8
    frames = struct.unpack_from("<I", p, payload + 16)[0]
    w, h = struct.unpack_from("<II", p, payload + 32)
    return {"width": w, "height": h, "channels": 3,
            "frames": frames, "sample_rate": 0}


def _probe_jpeg(p: bytes) -> dict:
    from .jpeg import probe_jpeg
    return probe_jpeg(p)


_PROBES = {"image": probe_png, "audio": probe_wav, "video": probe_avi,
           "jpeg": _probe_jpeg}


class HeaderDecoder:
    """Actor-pool metadata decoder: real struct-level header parsing
    per row, per-row status instead of the reference's silent
    bare-except swallow (train_recognition.py:364-367)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rows: dict = {k: [] for k in
                      (*_META_KEYS, "payload_bytes", "status")}
        for p, kd in zip(payloads, kinds):
            p = p or b""
            try:
                if not p:
                    raise ValueError("empty payload")
                meta = _PROBES[kd](p)
                rows["status"].append("ok")
            except (ValueError, KeyError) as e:
                meta = dict.fromkeys(_META_KEYS, 0)
                rows["status"].append(f"error: {e}")
            for k in _META_KEYS:
                rows[k].append(meta[k])
            rows["payload_bytes"].append(len(p))
        cols = {"item_id": batch.column("item_id"),
                "kind": batch.column("kind")}
        for k in (*_META_KEYS, "payload_bytes"):
            cols[k] = pa.array(rows[k], pa.int64())
        cols["status"] = pa.array(rows["status"], pa.string())
        return pa.table(cols)


def decode_metadata(ds, concurrency: int = 4, batch_size: int = 16,
                    decoder=HeaderDecoder):
    """The multimodal stage: actor pool, SMALL batch size (large binary
    rows × batch_size bounds worker heap), Arrow end to end."""
    return ds.map_batches(
        decoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


# --- REAL bulk decode (PNG pixels / WAV PCM; stdlib codecs) ----------------
#
# Closes the r4 "StubDecoder" weakness: every payload kind decodes for
# real — PNG/WAV/uncompressed-AVI via functions/codecs.py, baseline
# JPEG via functions/jpeg.py.  Inter-frame compressed video is the one
# thing rejected (loudly, per row) rather than decoded.
#
# Synthetic-corpus content formulas (integer, SQL-twinned):
# nb = octet_length(utf-8 text), r = nb % 256
#   image (even doc_id): w = 8+nb%120  h = 8+(nb*7)%90  c = 3
#       px(y, x, ch) = (nb + x) % 256        (constant in y and ch)
#       ⇒ sum_px = 3·h·(w·r + w(w−1)/2 − 256·max(0, r+w−256))
#         (closed form: w < 256 so the mod wraps at most once)
#   audio (odd doc_id):  ch = 1+nb%2  sr = 16000  frames = 500+nb%1500
#       flat sample i (i < frames·ch): s[i] = (nb·31 + i·17) % 65536 − 32768
#       ⇒ sum_abs / peak_abs over generate_series(frames·ch)

def pixel_payload_table_from_documents(docs: pa.Table) -> pa.Table:
    """Deterministic REAL-decodable corpus: genuine PNG pixel data
    (zlib IDAT, alternating None/Up filters — the decoder's unfilter
    paths are exercised, not just filter 0) and genuine WAV PCM.
    Every ``CORRUPT_EVERY``-th doc ships an empty payload (the
    truncated-file hazard → per-row error status)."""
    from .codecs import png_encode, wav_encode

    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    kinds, payloads = [], []
    for i, t in zip(ids, texts):
        kind = "image" if i % 2 == 0 else "audio"
        kinds.append(kind)
        if i % CORRUPT_EVERY == 0:
            payloads.append(b"")
            continue
        nb = len((t or "").encode())
        if kind == "image":
            w, h = 8 + nb % 120, 8 + (nb * 7) % 90
            row = ((nb + np.arange(w, dtype=np.int64)) % 256
                   ).astype(np.uint8)
            arr = np.broadcast_to(row[None, :, None], (h, w, 3))
            payloads.append(png_encode(arr))
        else:
            ch, frames = 1 + nb % 2, 500 + nb % 1500
            s = ((np.arange(frames * ch, dtype=np.int64) * 17 + nb * 31)
                 % 65536 - 32768).astype(np.int16)
            payloads.append(wav_encode(s.reshape(frames, ch), 16000))
    return pa.table({
        "item_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array([json.dumps({"src": "documents-real"})]
                         * len(ids), pa.string()),
    })


def jpeg_payload_table_from_documents(docs: pa.Table) -> pa.Table:
    """Deterministic REAL-decodable JPEG corpus (``functions/jpeg.py``,
    baseline ITU-T T.81).  Exactness contract: every 8×8 block is FLAT
    at gray ``128 + 16·k`` — at quality 50 the Annex K luma quant step
    Q00 is 16, so each block quantizes to a DC-only coefficient with
    zero rounding error and encode→decode round-trips byte-exactly
    through the huffman + DPCM + DCT path.

    Integer content formulas (SQL-twinned in ``mm_jpeg_stats``):
    nb = octet_length(utf-8 text)
      bw = 2 + nb % 6   bh = 2 + (nb*3) % 5   (blocks; w = 8·bw …)
      block j (row-major): k = ((nb + j) % 7) − 3, value 128 + 16·k
      ⇒ block pixel sum = 64·(128+16k) = 5120 + 1024·((nb+j) % 7)
      ⇒ sum_px = c · Σ_j (5120 + 1024·((nb+j) % 7)),  c = channels

    Even doc_id → grayscale with restart intervals (DRI + RSTn every
    1+nb%4 MCUs — the error-resilience markers real crawl JPEGs
    carry); odd doc_id → equal-channel RGB through the full JFIF
    YCbCr + 4:2:0 subsample path (exact for flat equal channels:
    Cb=Cr=128, chroma quantizes to 0).  Every ``CORRUPT_EVERY``-th
    doc ships an empty payload."""
    from .jpeg import jpeg_encode

    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    payloads = []
    for i, t in zip(ids, texts):
        if i % CORRUPT_EVERY == 0:
            payloads.append(b"")
            continue
        nb = len((t or "").encode())
        bw, bh = 2 + nb % 6, 2 + (nb * 3) % 5
        j = np.arange(bh * bw, dtype=np.int64).reshape(bh, bw)
        v = (128 + 16 * ((nb + j) % 7 - 3)).astype(np.uint8)
        img = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1)
        if i % 2 == 0:
            payloads.append(jpeg_encode(img, quality=50,
                                        restart_interval=1 + nb % 4))
        else:
            rgb = np.stack([img, img, img], axis=-1)
            payloads.append(jpeg_encode(rgb, quality=50,
                                        subsampling="420"))
    return pa.table({
        "item_id": pa.array(ids, pa.int64()),
        "kind": pa.array(["jpeg"] * len(ids), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array([json.dumps({"src": "documents-jpeg"})]
                         * len(ids), pa.string()),
    })


def video_payload_table_from_documents(docs: pa.Table) -> pa.Table:
    """Deterministic REAL-decodable video corpus: genuine uncompressed
    RIFF-AVI payloads (24-bit bottom-up BGR ``00db`` frames + idx1)
    built by the stdlib codec.  Integer content formulas (SQL-twinned
    in ``mm_video_frames``):

    nb = octet_length(utf-8 text)
      w = 8 + nb % 24   h = 8 + (nb*5) % 18   f = 2 + nb % 6
      px(t, y, x, ch) = (nb + 3t + x) % 256   (constant in y and ch)
      ⇒ frame_sum(t) = 3·h·(w·r + w(w−1)/2 − 256·max(0, r+w−256)),
        r = (nb + 3t) % 256  (w < 256 so the mod wraps at most once)

    Every ``CORRUPT_EVERY``-th doc ships an empty payload."""
    from .codecs import avi_encode

    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    payloads = []
    for i, t in zip(ids, texts):
        if i % CORRUPT_EVERY == 0:
            payloads.append(b"")
            continue
        nb = len((t or "").encode())
        w, h, f = 8 + nb % 24, 8 + (nb * 5) % 18, 2 + nb % 6
        t_ = np.arange(f, dtype=np.int64)[:, None]
        x_ = np.arange(w, dtype=np.int64)[None, :]
        plane = ((nb + 3 * t_ + x_) % 256).astype(np.uint8)  # (f, w)
        arr = np.broadcast_to(plane[:, None, :, None], (f, h, w, 3))
        payloads.append(avi_encode(np.ascontiguousarray(arr)))
    return pa.table({
        "item_id": pa.array(ids, pa.int64()),
        "kind": pa.array(["video"] * len(ids), pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array([json.dumps({"src": "documents-video"})]
                         * len(ids), pa.string()),
    })


class PixelDecoder:
    """REAL bulk decoder actor: PNG → pixel array (zlib + unfilter),
    JPEG → pixel array (huffman + dequant + inverse DCT, baseline
    T.81 via ``functions/jpeg.py``), WAV → PCM samples, uncompressed
    AVI → frame stack, integer content stats per row.  Same
    actor-pool shape and per-row-status contract as
    :class:`HeaderDecoder`; all four kinds decode for real (the r4
    StubDecoder placeholder is gone)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .codecs import avi_decode_frames, png_decode, wav_decode
        from .jpeg import jpeg_decode

        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        cols = {k: [] for k in ("width", "height", "channels", "frames",
                                "sample_rate", "sum_px", "sum_abs",
                                "peak_abs", "status")}
        zero = dict.fromkeys(cols, 0)
        for p, kd in zip(payloads, kinds):
            p = p or b""
            row = dict(zero)
            try:
                if not p:
                    raise ValueError("empty payload")
                if kd == "image":
                    arr = png_decode(p)
                    h, w, c = arr.shape
                    row.update(width=w, height=h, channels=c, frames=1,
                               sum_px=int(arr.sum(dtype=np.int64)))
                elif kd == "jpeg":
                    arr = jpeg_decode(p)
                    h, w = arr.shape[:2]
                    c = arr.shape[2] if arr.ndim == 3 else 1
                    row.update(width=w, height=h, channels=c, frames=1,
                               sum_px=int(arr.sum(dtype=np.int64)))
                elif kd == "audio":
                    s, sr = wav_decode(p)
                    a = np.abs(s.astype(np.int64))
                    row.update(channels=s.shape[1], frames=s.shape[0],
                               sample_rate=sr,
                               sum_abs=int(a.sum()),
                               peak_abs=int(a.max()) if a.size else 0)
                else:
                    arr = avi_decode_frames(p)
                    f, h, w = arr.shape[:3]
                    row.update(width=w, height=h, channels=3, frames=f,
                               sum_px=int(arr.sum(dtype=np.int64)))
                row["status"] = "ok"
            except (ValueError, EOFError, zlib_error, wave_Error) as e:
                row = dict(zero)
                row["status"] = f"error: {e}"[:200]
            for k, v in row.items():
                cols[k].append(v)
        out = {"item_id": batch.column("item_id"),
               "kind": batch.column("kind")}
        for k in ("width", "height", "channels", "frames", "sample_rate",
                  "sum_px", "sum_abs", "peak_abs"):
            out[k] = pa.array(cols[k], pa.int64())
        out["status"] = pa.array(cols["status"], pa.string())
        return pa.table(out)


def frame_sample_indices(n_frames: int, every: int = 10) -> np.ndarray:
    """Deterministic frame-sampling plan (video path plumbing)."""
    if n_frames <= 0:
        return np.zeros(0, dtype=np.int64)
    return np.arange(0, n_frames, every, dtype=np.int64)


def resize_plan(meta_ds, target: int = 224):
    """Decoded image metadata → integer thumbnail dimensions (fit the
    longer side to ``target``, preserve aspect, floor division, min 1)
    — the resize stage's PLAN, all-integer so a SQL twin reproduces it
    exactly; the pixel resample itself belongs to the stubbed decoder.
    → Dataset(item_id, thumb_w, thumb_h)."""
    def plan(b: pa.Table) -> pa.Table:
        kinds = b.column("kind").to_pylist()
        status = b.column("status").to_pylist()
        w = np.asarray(b.column("width"), dtype=np.int64)
        h = np.asarray(b.column("height"), dtype=np.int64)
        ids = np.asarray(b.column("item_id"), dtype=np.int64)
        keep = np.array([k == "image" and s == "ok"
                         for k, s in zip(kinds, status)], dtype=bool)
        w, h, ids = w[keep], h[keep], ids[keep]
        long_side = np.maximum(w, h)
        long_side[long_side == 0] = 1
        tw = np.maximum(1, (w * target) // long_side)
        th = np.maximum(1, (h * target) // long_side)
        return pa.table({
            "item_id": pa.array(ids, pa.int64()),
            "thumb_w": pa.array(tw, pa.int64()),
            "thumb_h": pa.array(th, pa.int64()),
        })

    return meta_ds.map_batches(plan, batch_format="pyarrow")


class FrameSampler:
    """REAL video frame-extract actor: decode every AVI payload with
    the stdlib codec, keep every ``every``-th frame, emit one row per
    sampled frame with its integer pixel sum — the flat-map stage a
    multimodal training pipeline runs before per-frame featurization
    (resize / embed).  Undecodable rows emit nothing here; the
    per-item status surface is :class:`PixelDecoder`'s job."""

    def __init__(self, every: int = 2):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .codecs import avi_decode_frames

        ids = batch.column("item_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id: list[int] = []
        out_idx: list[int] = []
        out_w: list[int] = []
        out_h: list[int] = []
        out_sum: list[int] = []
        for i, p in zip(ids, payloads):
            if not p:
                continue
            try:
                arr = avi_decode_frames(p)
            except ValueError:
                continue
            idxs = frame_sample_indices(arr.shape[0], self.every)
            if not len(idxs):
                continue
            sums = arr[idxs].sum(axis=(1, 2, 3), dtype=np.int64)
            out_id.extend([i] * len(idxs))
            out_idx.extend(idxs.tolist())
            out_w.extend([arr.shape[2]] * len(idxs))
            out_h.extend([arr.shape[1]] * len(idxs))
            out_sum.extend(sums.tolist())
        return pa.table({
            "item_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_idx, pa.int64()),
            "width": pa.array(out_w, pa.int64()),
            "height": pa.array(out_h, pa.int64()),
            "frame_sum": pa.array(out_sum, pa.int64()),
        })


def frame_sample_plan(meta_ds, every: int = 10):
    """Video decode metadata → flat frame-sampling plan: one row per
    sampled frame index (every ``every``-th frame of every ok video).
    → Dataset(item_id, frame_idx).  Vectorized repeat/concat inside
    ``map_batches`` — the flat-map shape a video frame-extract stage
    consumes (each plan row = one decode task downstream)."""
    def explode(b: pa.Table) -> pa.Table:
        kinds = b.column("kind").to_pylist()
        status = b.column("status").to_pylist()
        frames = np.asarray(b.column("frames"), dtype=np.int64)
        ids = np.asarray(b.column("item_id"), dtype=np.int64)
        keep = np.array([k == "video" and s == "ok"
                         for k, s in zip(kinds, status)], dtype=bool)
        ids, frames = ids[keep], frames[keep]
        counts = (frames + every - 1) // every       # ceil(frames/every)
        out_ids = np.repeat(ids, counts)
        out_idx = np.concatenate(
            [np.arange(0, f, every, dtype=np.int64) for f in frames]
        ) if len(frames) else np.zeros(0, dtype=np.int64)
        return pa.table({
            "item_id": pa.array(out_ids, pa.int64()),
            "frame_idx": pa.array(out_idx, pa.int64()),
        })

    return meta_ds.map_batches(explode, batch_format="pyarrow")
