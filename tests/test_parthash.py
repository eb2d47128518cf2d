"""Vectorized partition hashing (functions/parthash.py) — the
within-run shuffle-key map shared by hash_join / grouped_topk / the
dedup pair partitions."""

import numpy as np
import pyarrow as pa
import pytest

from arabic_ocr_ray.functions import parthash as ph


def test_batch_and_chunk_invariance():
    a = pa.array(["", "a", "ab", "ba", "hello", "x" * 500, None,
                  "abc\x00", "abc"])
    h = ph.column_hash64(a)
    # chunk layout must not change hashes
    ca = pa.chunked_array([a[:3], a[3:]])
    assert (ph.column_hash64(ca) == h).all()
    # slices (non-zero array offset) must not change hashes
    assert (ph.column_hash64(a.slice(1, 5)) == h[1:6]).all()
    # a key's hash is independent of which batch it appears in
    assert ph.column_hash64(pa.array(["hello"]))[0] == h[4]


def test_long_and_short_paths_agree():
    a = pa.array(["", "k", "key", "x" * 500, "y" * 50])
    h = ph.column_hash64(a)
    old = ph._LONG_KEY
    try:
        ph._LONG_KEY = 0       # force per-byte segmented-sum path
        assert (ph.column_hash64(a) == h).all()
        ph._LONG_KEY = 10 ** 9  # force per-position loop
        assert (ph.column_hash64(a) == h).all()
    finally:
        ph._LONG_KEY = old


def test_nulls_empty_and_types():
    s = ph.column_hash64(pa.array(["", None, "a"]))
    assert s[1] == 0 and s[0] != 0 and s[0] != s[2]
    b = ph.column_hash64(pa.array([b"abc", b"", None], pa.binary()))
    assert b[2] == 0 and b[1] != 0
    i = ph.column_hash64(pa.array([1, 2, None]))
    assert i[0] != i[1]
    assert i[2] == ph._mix64(np.array([0], np.uint64))[0]


def test_distinct_keys_spread():
    urls = pa.array(["https://s%03d.example/p/%d" % (i % 97, i)
                     for i in range(20_000)])
    pk = np.asarray(ph.partition_ids(urls, 64))
    counts = np.bincount(pk, minlength=64)
    assert counts.min() > 0.5 * counts.mean()
    assert counts.max() < 2.0 * counts.mean()


def test_multi_column_order_sensitive():
    a = pa.array(["x", "y"])
    b = pa.array(["y", "x"])
    hab = ph.combined_hash64([a, b])
    hba = ph.combined_hash64([b, a])
    assert hab[0] != hba[0]  # ("x","y") != ("y","x")
    assert hab[0] == hba[1]  # ("x","y") same key either way round


def test_pows_wrap_silently():
    with np.errstate(over="raise"):  # cumprod must not raise/warn
        ph._POWS = np.array([1], dtype=np.uint64)
        ph._pows_to(600)
    assert len(ph._POWS) >= 600
    assert ph._POWS[1] == np.uint64(1099511628211)
