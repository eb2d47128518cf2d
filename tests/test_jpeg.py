"""Baseline JPEG codec (functions/jpeg.py, ITU-T T.81) and its
PixelDecoder integration: flat-block exactness (the oracle contract),
lossy round-trip closeness, restart-interval parity, 4:2:0 color,
header probe, loud rejection of progressive/truncated input."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from arabic_ocr_ray.functions import multimodal
from arabic_ocr_ray.functions.jpeg import (
    QT_LUM,
    jpeg_decode,
    jpeg_encode,
    probe_jpeg,
    quant_table,
)

Q00 = int(quant_table(QT_LUM, 50)[0])  # == 16 (Annex K at quality 50)


def _flat_block_image(nb: int, bw: int, bh: int) -> np.ndarray:
    """The synthetic-corpus image: flat 8x8 blocks at 128 + 16k."""
    j = np.arange(bh * bw, dtype=np.int64).reshape(bh, bw)
    v = (128 + Q00 * ((nb + j) % 7 - 3)).astype(np.uint8)
    return np.repeat(np.repeat(v, 8, axis=0), 8, axis=1)


def test_quality50_q00_is_16():
    assert Q00 == 16  # the oracle formula hard-codes 1024 = 64*16


@pytest.mark.parametrize("nb,bw,bh", [(0, 2, 2), (17, 7, 6), (255, 3, 5)])
def test_flat_gray_exact(nb, bw, bh):
    img = _flat_block_image(nb, bw, bh)
    out = jpeg_decode(jpeg_encode(img, quality=50))
    assert out.dtype == np.uint8 and out.shape == img.shape
    assert (out == img).all()


def test_flat_rgb_420_exact():
    img = _flat_block_image(13, 5, 4)
    rgb = np.stack([img, img, img], axis=-1)
    out = jpeg_decode(jpeg_encode(rgb, quality=50, subsampling="420"))
    assert out.shape == rgb.shape
    assert (out == rgb).all()


def test_restart_interval_parity_and_markers():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
    plain = jpeg_encode(img, quality=85)
    with_rst = jpeg_encode(img, quality=85, restart_interval=3)
    assert b"\xff\xdd" in with_rst and b"\xff\xdd" not in plain
    assert any(bytes([0xFF, 0xD0 + i]) in with_rst for i in range(8))
    assert np.array_equal(jpeg_decode(plain), jpeg_decode(with_rst))


@pytest.mark.parametrize("shape,sub", [((33, 41), "444"),
                                       ((24, 31, 3), "444"),
                                       ((24, 31, 3), "420")])
def test_lossy_round_trip_close(shape, sub):
    """Non-flat content is lossy but must stay close at high quality
    (smooth gradient so chroma subsampling loses almost nothing)."""
    yy = np.arange(shape[0])[:, None] * 2 % 256
    xx = np.arange(shape[1])[None, :] * 3 % 256
    base = ((yy + xx) // 2).astype(np.uint8)
    img = (base if len(shape) == 2
           else np.stack([base, base[::-1], base], axis=-1))
    out = jpeg_decode(jpeg_encode(img, quality=95, subsampling=sub))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 3.0


def test_probe_matches_encode():
    img = np.zeros((40, 56, 3), dtype=np.uint8)
    m = probe_jpeg(jpeg_encode(img, quality=50, subsampling="420"))
    assert (m["width"], m["height"], m["channels"]) == (56, 40, 3)


def test_rejects_garbage_truncated_progressive():
    with pytest.raises(ValueError):
        jpeg_decode(b"")
    with pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG\r\n\x1a\n")
    good = jpeg_encode(np.full((16, 16), 99, np.uint8), quality=50)
    with pytest.raises(ValueError):
        jpeg_decode(good[: len(good) // 2])
    # flip SOF0 -> SOF2 (progressive): must reject loudly, not garble
    sof = good.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="progressive|SOF"):
        jpeg_decode(good[:sof] + b"\xff\xc2" + good[sof + 2:])
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((0, 4), np.uint8))
    with pytest.raises(ValueError):
        jpeg_encode(np.zeros((4, 4, 2), np.uint8))


@settings(max_examples=20, deadline=None)
@given(h=st.integers(1, 40), w=st.integers(1, 40),
       q=st.sampled_from([50, 75, 90]), seed=st.integers(0, 2**16))
def test_fuzz_any_dims_round_trip(h, w, q, seed):
    """Arbitrary (non-multiple-of-8) dims: decode must return the
    exact requested shape and in-range pixels, never crash."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=q))
    assert out.shape == (h, w) and out.dtype == np.uint8


@settings(max_examples=12, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24),
       sub=st.sampled_from(["444", "420"]), seed=st.integers(0, 2**16))
def test_fuzz_rgb_round_trip(h, w, sub, seed):
    """RGB through both chroma modes on arbitrary dims: exact shape,
    uint8, no crash — the color-path twin of the gray fuzz."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=80, subsampling=sub))
    assert out.shape == (h, w, 3) and out.dtype == np.uint8


def test_rejects_oversized_dims():
    with pytest.raises(ValueError, match="16-bit"):
        jpeg_encode(np.zeros((1, 70000), np.uint8))


def test_pixel_decoder_jpeg_rows_and_corrupt_status():
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 97 * 2], pa.int64()),
        "text": pa.array(["abc", "a" * 300, "", "x" * 50], pa.string()),
    })
    pay = multimodal.jpeg_payload_table_from_documents(docs)
    assert pay.column("kind").to_pylist() == ["jpeg"] * 4
    meta = multimodal.PixelDecoder()(pay)
    status = meta.column("status").to_pylist()
    assert status[:3] == ["ok"] * 3
    assert status[3].startswith("error")
    # per-row formula parity on the ok rows
    for row in meta.filter(pc.equal(meta.column("status"),
                                    "ok")).to_pylist():
        doc = docs.filter(pc.equal(docs.column("doc_id"),
                                   row["item_id"])).to_pylist()[0]
        nb = len(doc["text"].encode())
        bw, bh = 2 + nb % 6, 2 + (nb * 3) % 5
        c = 1 if row["item_id"] % 2 == 0 else 3
        want = c * sum(5120 + 1024 * ((nb + j) % 7)
                       for j in range(bw * bh))
        assert (row["width"], row["height"]) == (8 * bw, 8 * bh)
        assert row["channels"] == c
        assert row["sum_px"] == want


def test_header_decoder_probes_jpeg_kind():
    docs = pa.table({"doc_id": pa.array([4], pa.int64()),
                     "text": pa.array(["hello world"], pa.string())})
    pay = multimodal.jpeg_payload_table_from_documents(docs)
    meta = multimodal.HeaderDecoder()(pay)
    r = meta.to_pylist()[0]
    nb = len(b"hello world")
    assert r["status"] == "ok"
    assert r["width"] == 8 * (2 + nb % 6)
    assert r["height"] == 8 * (2 + (nb * 3) % 5)


def test_corrupt_segments_raise_valueerror_not_struct_error():
    """Corrupt (non-truncated) input must raise ValueError — the only
    exception PixelDecoder/HeaderDecoder's per-row isolation catches —
    never struct.error / IndexError (which would kill the whole task)."""
    good = jpeg_encode(np.full((16, 16), 99, np.uint8), quality=50)
    # SOF0 segment length shrunk to 4: too short for the >BHHB unpack
    sof = good.index(b"\xff\xc0")
    bad = bytearray(good)
    bad[sof + 2:sof + 4] = (4).to_bytes(2, "big")
    with pytest.raises(ValueError):
        jpeg_decode(bytes(bad))
    # DHT shrunk mid-BITS: bits[length-1] would IndexError
    dht = good.index(b"\xff\xc4")
    bad = bytearray(good)
    bad[dht + 2:dht + 4] = (10).to_bytes(2, "big")
    with pytest.raises(ValueError):
        jpeg_decode(bytes(bad))
    # SOS claiming 200 scan components: seg[1+2*c] out of range
    sos = good.index(b"\xff\xda")
    bad = bytearray(good)
    bad[sos + 4] = 200
    with pytest.raises(ValueError):
        jpeg_decode(bytes(bad))
    # probe on a payload truncated right after SOF marker + length
    with pytest.raises(ValueError):
        probe_jpeg(b"\xff\xd8\xff\xc0\x00\x20\x08\x00")


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**32 - 1))
def test_corrupt_bytes_never_escape_valueerror(seed):
    """Byte-flip fuzz over a real stream (restart markers + 4:2:0):
    decode/probe either succeed or raise ValueError — nothing else."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    good = jpeg_encode(img, quality=75, subsampling="420",
                       restart_interval=2)
    bad = bytearray(good)
    for p in rng.integers(2, len(bad), size=4):
        bad[int(p)] = int(rng.integers(0, 256))
    for fn in (jpeg_decode, probe_jpeg):
        try:
            fn(bytes(bad))
        except ValueError:
            pass


def test_lut_cache_is_bounded():
    """Per-image optimized Huffman tables must not grow decoder-actor
    RSS without bound: the LUT cache clears on full."""
    from arabic_ocr_ray.functions import jpeg as J

    J._LUT_CACHE.clear()
    bits = [0, 1] + [0] * 14              # one code of length 2
    for v in range(J._LUT_CACHE_MAX + 9):
        J._decode_table(bits, [v])        # 73 distinct table specs
    assert 0 < len(J._LUT_CACHE) <= J._LUT_CACHE_MAX
    J._LUT_CACHE.clear()


def test_non_interleaved_multiscan_rejected_loudly():
    """A scan covering fewer components than SOF declares (T.81-legal
    non-interleaved layout) must raise, not silently decode one plane
    with status ok."""
    sof = (b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
           + (8).to_bytes(2, "big") + (8).to_bytes(2, "big") + b"\x03"
           + b"\x01\x11\x00" + b"\x02\x11\x00" + b"\x03\x11\x00")
    sos = (b"\xff\xda" + (8).to_bytes(2, "big") + b"\x01"
           + b"\x01\x00" + b"\x00\x3f\x00")
    with pytest.raises(ValueError, match="non-interleaved|components"):
        jpeg_decode(b"\xff\xd8" + sof + sos + b"\xff\xd9")
