"""Real PNG/WAV codecs (functions/codecs.py) and the PixelDecoder
stage: round trips, all five PNG filter types, formula parity,
corrupt-row status."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from arabic_ocr_ray.functions import multimodal
from arabic_ocr_ray.functions.codecs import (
    avi_decode_frames,
    avi_encode,
    png_decode,
    png_encode,
    resize_box,
    wav_decode,
    wav_encode,
)


@pytest.mark.parametrize("shape", [(1, 1, 1), (7, 5, 3), (64, 64, 3),
                                   (33, 17, 4), (10, 10, 1), (2, 300, 2)])
def test_png_round_trip(shape):
    rng = np.random.default_rng(shape[0] * 1000 + shape[1])
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = png_decode(png_encode(arr))
    assert out.shape == shape
    assert (out == arr).all()


def _encode_with_filter(arr: np.ndarray, f: int) -> bytes:
    """Spec-conformant PNG encoder applying filter ``f`` to EVERY row —
    an independent implementation (straight from RFC 2083 §6), so the
    decoder's Sub/Average/Paeth unfilter paths are tested against the
    spec, not against our own encoder."""
    h, w, c = arr.shape
    bpp = c
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        row = arr[y].reshape(-1).astype(np.int64)
        raw.append(f)
        for x in range(w * c):
            left = row[x - bpp] if x >= bpp else 0
            up = prev[x]
            ul = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = (left if pa_ <= pb_ and pa_ <= pc_
                        else up if pb_ <= pc_ else ul)
            raw.append(int((row[x] - pred) % 256))
        prev = row
    ihdr = struct.pack(">II5B", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(bytes(raw))

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_png_decode_every_filter(f):
    rng = np.random.default_rng(900 + f)
    arr = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    assert (png_decode(_encode_with_filter(arr, f)) == arr).all()


def test_png_decode_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")
    with pytest.raises(ValueError):
        png_decode(b"\x89PNG\r\n\x1a\n" + b"\x00" * 10)  # no IHDR


@pytest.mark.parametrize("ch", [1, 2])
def test_wav_round_trip(ch):
    rng = np.random.default_rng(7 + ch)
    s = rng.integers(-32768, 32768, size=(777, ch)).astype(np.int16)
    out, sr = wav_decode(wav_encode(s, 22050))
    assert sr == 22050
    assert out.shape == (777, ch)
    assert (out == s).all()


def test_resize_box():
    img = np.arange(4 * 6 * 1, dtype=np.uint8).reshape(4, 6, 1)
    out = resize_box(img, 3, 2)
    assert out.shape == (2, 3, 1)
    # src index map (dst*size)//target: rows [0,2], cols [0,2,4]
    assert (out[:, :, 0] == img[[0, 2]][:, [0, 2, 4], 0]).all()


def _docs_table(n=30):
    texts = [f"doc {i} " + "lorem ipsum " * (i % 13) for i in range(n)]
    return pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_pixel_decoder_formula_parity():
    """PixelDecoder's decoded stats match the closed-form integer
    formulas the SQL twin uses — through a REAL encode→decode cycle."""
    docs = _docs_table(30)
    payloads = multimodal.pixel_payload_table_from_documents(docs)
    out = multimodal.PixelDecoder()(payloads).to_pandas().set_index(
        "item_id")
    for i in range(30):
        row = out.loc[i]
        if i % multimodal.CORRUPT_EVERY == 0:
            assert row["status"].startswith("error")
            continue
        nb = len(docs.column("text")[i].as_py().encode())
        assert row["status"] == "ok"
        if i % 2 == 0:  # image
            w, h, r = 8 + nb % 120, 8 + (nb * 7) % 90, nb % 256
            assert (row["width"], row["height"]) == (w, h)
            exp = 3 * h * (w * r + w * (w - 1) // 2
                           - 256 * max(0, r + w - 256))
            assert row["sum_px"] == exp
        else:  # audio
            ch, frames = 1 + nb % 2, 500 + nb % 1500
            assert (row["channels"], row["frames"]) == (ch, frames)
            s = (np.arange(frames * ch, dtype=np.int64) * 17
                 + nb * 31) % 65536 - 32768
            assert row["sum_abs"] == int(np.abs(s).sum())
            assert row["peak_abs"] == int(np.abs(s).max())


def test_pixel_decoder_corrupt_video_is_marked_error():
    """Truncated AVI (headers only, no strf) → per-row error status,
    never an exception out of the actor."""
    b = pa.table({
        "item_id": pa.array([1], pa.int64()),
        "kind": pa.array(["video"], pa.string()),
        "payload": pa.array([b"RIFFxxxxAVI "], pa.binary()),
        "meta": pa.array(["{}"], pa.string()),
    })
    out = multimodal.PixelDecoder()(b)
    assert out.column("status").to_pylist()[0].startswith("error")


@pytest.mark.parametrize("shape", [(1, 1, 1), (3, 5, 7), (7, 25, 31),
                                   (2, 16, 4), (4, 9, 13)])
def test_avi_round_trip(shape):
    f, h, w = shape
    rng = np.random.default_rng(f * 100 + h * 10 + w)
    arr = rng.integers(0, 256, size=(f, h, w, 3), dtype=np.uint8)
    out = avi_decode_frames(avi_encode(arr))
    assert out.shape == arr.shape
    assert (out == arr).all()


def test_avi_probe_compat():
    """The real encoder's headers satisfy the independent header
    prober (multimodal.probe_avi reads avih fields by offset)."""
    arr = np.zeros((5, 10, 12, 3), dtype=np.uint8)
    meta = multimodal.probe_avi(avi_encode(arr))
    assert meta == {"width": 12, "height": 10, "channels": 3,
                    "frames": 5, "sample_rate": 0}


def test_avi_decode_rejects_garbage():
    enc = avi_encode(np.zeros((2, 4, 4, 3), dtype=np.uint8))
    for bad in (b"", b"not avi", b"RIFF\x00\x00\x00\x00AVI ",
                enc[:50], enc[:-7]):
        with pytest.raises(ValueError):
            if avi_decode_frames(bad).shape[0] == 0:
                raise ValueError("no frames")  # header-only is also bad


def test_avi_odd_width_padding():
    """Widths whose 3w is not a multiple of 4 exercise the DIB row
    padding on both sides of the codec."""
    for w in (1, 2, 3, 5, 6, 7):
        arr = (np.arange(2 * 3 * w * 3, dtype=np.uint8)
               .reshape(2, 3, w, 3))
        assert (avi_decode_frames(avi_encode(arr)) == arr).all()


def test_frame_sampler_matches_full_decode():
    """FrameSampler's per-frame sums equal slicing the full decode at
    the deterministic sample indices; corrupt rows emit nothing."""
    docs = _docs_table(30)
    payloads = multimodal.video_payload_table_from_documents(docs)
    out = multimodal.FrameSampler(every=2)(payloads).to_pandas()
    seen_ids = set(out["item_id"])
    assert 0 not in seen_ids  # doc 0 is the corrupt row (0 % 97 == 0)
    from arabic_ocr_ray.functions.codecs import avi_decode_frames as dec
    for i in range(1, 30):
        p = payloads.column("payload")[i].as_py()
        arr = dec(p)
        idxs = multimodal.frame_sample_indices(arr.shape[0], 2)
        sub = out[out["item_id"] == i].sort_values("frame_idx")
        assert list(sub["frame_idx"]) == idxs.tolist()
        exp = arr[idxs].sum(axis=(1, 2, 3), dtype=np.int64)
        assert list(sub["frame_sum"]) == exp.tolist()
        assert (sub["width"] == arr.shape[2]).all()
        assert (sub["height"] == arr.shape[1]).all()


def test_pixel_decoder_video_totals():
    """PixelDecoder's video branch: per-item frame count and total
    pixel sum match the synth formulas through the real codec."""
    docs = _docs_table(20)
    payloads = multimodal.video_payload_table_from_documents(docs)
    out = multimodal.PixelDecoder()(payloads).to_pandas().set_index(
        "item_id")
    for i in range(1, 20):
        nb = len(docs.column("text")[i].as_py().encode())
        w, h, f = 8 + nb % 24, 8 + (nb * 5) % 18, 2 + nb % 6
        row = out.loc[i]
        assert row["status"] == "ok"
        assert (row["width"], row["height"], row["frames"]) == (w, h, f)
        exp = sum(
            3 * h * (w * r + w * (w - 1) // 2
                     - 256 * max(0, r + w - 256))
            for r in (((nb + 3 * t) % 256) for t in range(f)))
        assert row["sum_px"] == exp


def test_corrupt_bytes_never_escape_isolation_exceptions():
    """Byte-flip fuzz across all three codecs and their probes:
    corrupt input must raise only exceptions PixelDecoder /
    HeaderDecoder's per-row isolation catches (ValueError, EOFError,
    zlib.error, wave.Error, KeyError) — a struct.error / IndexError /
    RuntimeError escape would kill the whole map_batches task."""
    import wave

    from arabic_ocr_ray.functions.codecs import (avi_decode_frames,
                                                 avi_encode, wav_encode)
    from arabic_ocr_ray.functions.multimodal import (probe_avi,
                                                     probe_png,
                                                     probe_wav)

    ok = (ValueError, EOFError, zlib.error, wave.Error, KeyError)
    rng0 = np.random.default_rng(7)
    png = png_encode(rng0.integers(0, 256, size=(20, 30, 3),
                                   dtype=np.uint8))
    wav = wav_encode(rng0.integers(-32768, 32767, size=(800, 2))
                     .astype(np.int16), 16000)
    avi = avi_encode(rng0.integers(0, 256, size=(3, 16, 20, 3),
                                   dtype=np.uint8))
    cases = [(png_decode, png), (wav_decode, wav),
             (avi_decode_frames, avi),
             (probe_png, png), (probe_wav, wav), (probe_avi, avi)]
    for seed in range(120):
        rng = np.random.default_rng(seed)
        for fn, good in cases:
            bad = bytearray(good)
            for p in rng.integers(2, len(bad), size=4):
                bad[int(p)] = int(rng.integers(0, 256))
            try:
                fn(bytes(bad))
            except ok:
                pass
