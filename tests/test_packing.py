"""Sequence-packing plan + DSIR importance weights — brute-force
oracles, partitioning-invariance, and typed-empty edges."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

_WS = re.compile(r"[^ \t\n\r\f\v]+")


def _docs_table(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})


def _brute_pack(texts, seq_len):
    """Driver-side reimplementation of the pack law from scratch."""
    rows = []
    for i, t in enumerate(texts):
        n = len(_WS.findall(t or ""))
        h = ((i % 2**31) * 1103515245 + 12345) % 2**31
        rows.append((h, i, n))
    rows.sort()
    off = 0
    out = {}
    for h, i, n in rows:
        if n:
            out[i] = (n, off, off // seq_len, (off + n - 1) // seq_len)
        else:
            out[i] = (n, off, -1, -1)
        off += n
    return out


TEXTS = (["alpha beta gamma", "", "one", "a b c d e f g h i j",
          "x " * 50, "  spaced\tout\ndoc  ", "tail"]
         + [f"doc {i} body words here {'pad ' * (i % 7)}"
            for i in range(40)])


@pytest.mark.usefixtures("ray_session")
def test_pack_plan_matches_brute_oracle():
    import ray.data as rd

    from arabic_ocr_ray.functions.packing import pack_plan

    seq_len = 8
    got = (pack_plan(rd.from_arrow(_docs_table(TEXTS)), seq_len=seq_len,
                     n_buckets=16)
           .to_pandas().set_index("doc_id").sort_index())
    want = _brute_pack(TEXTS, seq_len)
    assert len(got) == len(TEXTS)
    for i, (n, off, first, last) in want.items():
        row = got.loc[i]
        assert (row["n_tokens"], row["tok_offset"], row["chunk_first"],
                row["chunk_last"]) == (n, off, first, last), i


@pytest.mark.usefixtures("ray_session")
def test_pack_plan_partitioning_invariant():
    import ray.data as rd

    from arabic_ocr_ray.functions.packing import pack_plan

    a = (pack_plan(rd.from_arrow(_docs_table(TEXTS)), seq_len=16)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (pack_plan(rd.from_arrow(_docs_table(TEXTS)).repartition(7),
                   seq_len=16)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # offsets are a permutation-complete prefix sum: total == Σ n
    assert (a["tok_offset"] + a["n_tokens"]).max() == a["n_tokens"].sum()


@pytest.mark.usefixtures("ray_session")
def test_pack_chunk_stats_full_chunks():
    import ray.data as rd

    from arabic_ocr_ray.functions.packing import (
        pack_chunk_stats,
        pack_plan,
    )

    seq_len = 8
    plan = pack_plan(rd.from_arrow(_docs_table(TEXTS)), seq_len=seq_len)
    st = (pack_chunk_stats(plan, seq_len=seq_len)
          .to_pandas().sort_values("chunk_id").reset_index(drop=True))
    total = sum(len(_WS.findall(t)) for t in TEXTS)
    n_chunks = (total + seq_len - 1) // seq_len
    assert list(st["chunk_id"]) == list(range(n_chunks))
    assert st["n_tokens"].sum() == total
    # every chunk is exactly full except possibly the last
    assert (st["n_tokens"].iloc[:-1] == seq_len).all()
    last = total - seq_len * (n_chunks - 1)
    assert st["n_tokens"].iloc[-1] == last
    # a doc spanning k chunks contributes k rows: Σ n_docs ≥ docs
    assert st["n_docs"].sum() >= sum(
        1 for t in TEXTS if _WS.findall(t))


@pytest.mark.usefixtures("ray_session")
def test_pack_plan_rejects_bad_buckets_and_handles_all_empty():
    import ray.data as rd

    from arabic_ocr_ray.functions.packing import pack_plan

    with pytest.raises(ValueError):
        pack_plan(rd.from_arrow(_docs_table(["x"])), n_buckets=100)
    got = (pack_plan(rd.from_arrow(_docs_table(["", "  ", "\t\n"])))
           .to_pandas())
    assert len(got) == 3
    assert (got["n_tokens"] == 0).all()
    assert (got["chunk_first"] == -1).all()
    assert (got["tok_offset"] == 0).all()


def _brute_dsir(texts, tgt_ids, n_buckets):
    def grams(t):
        toks = _WS.findall((t or "").lower())
        return toks + [a + " " + z for a, z in zip(toks, toks[1:])]

    def bkt(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets

    ct = np.zeros(n_buckets, np.int64)
    cr = np.zeros(n_buckets, np.int64)
    for i, t in enumerate(texts):
        for g in grams(t):
            cr[bkt(g)] += 1
            if i in tgt_ids:
                ct[bkt(g)] += 1
    out = {}
    for i, t in enumerate(texts):
        gs = grams(t)
        w = sum(int(ct[bkt(g)] + 1).bit_length()
                - int(cr[bkt(g)] + 1).bit_length() for g in gs)
        out[i] = (len(gs), w)
    return out


@pytest.mark.usefixtures("ray_session")
def test_dsir_weights_match_brute_oracle():
    import ray

    import ray.data as rd

    from arabic_ocr_ray.functions.text import (
        dsir_weight_stats,
        hashed_gram_hist,
    )

    n_buckets = 64  # small domain → real collisions exercised
    texts = TEXTS + ["ALPHA BETA gamma"]  # casefold shared with doc 0
    ds = rd.from_arrow(_docs_table(texts))
    tgt_ids = {i for i in range(len(texts)) if i % 3 == 0}

    def tgt_only(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        return b.filter(pa.array(ids % 3 == 0))

    ct = hashed_gram_hist(
        ds.map_batches(tgt_only, batch_format="pyarrow"),
        n_buckets=n_buckets)
    cr = hashed_gram_hist(ds, n_buckets=n_buckets)
    got = (dsir_weight_stats(ds, ray.put((ct, cr)),
                             n_buckets=n_buckets)
           .to_pandas().set_index("doc_id").sort_index())
    want = _brute_dsir(texts, tgt_ids, n_buckets)
    assert len(got) == len(texts)
    for i, (ng, w) in want.items():
        assert (got.loc[i, "n_grams"], got.loc[i, "weight_bits"]) \
            == (ng, w), i
    # target docs should skew positive vs non-target on this corpus
    tgt_mean = got.loc[sorted(tgt_ids), "weight_bits"].mean()
    other_mean = got.drop(index=sorted(tgt_ids))["weight_bits"].mean()
    assert tgt_mean > other_mean


@pytest.mark.usefixtures("ray_session")
def test_dsir_models_one_pass_equals_two_hists():
    import numpy as np

    import ray.data as rd

    from arabic_ocr_ray.functions.text import (
        dsir_models,
        hashed_gram_hist,
    )

    ds = rd.from_arrow(_docs_table(TEXTS)).repartition(5)

    def tgt_mask(b):
        return np.asarray(b.column("doc_id"), dtype=np.int64) % 3 == 0

    def tgt_only(b):
        return b.filter(pa.array(tgt_mask(b)))

    ct, cr = dsir_models(ds, tgt_mask)
    ct2 = hashed_gram_hist(
        ds.map_batches(tgt_only, batch_format="pyarrow"))
    cr2 = hashed_gram_hist(ds)
    assert (ct == ct2).all() and (cr == cr2).all()
    assert cr.sum() > ct.sum() > 0


@pytest.mark.usefixtures("ray_session")
def test_dsir_empty_target_and_empty_docs():
    import ray

    import ray.data as rd

    from arabic_ocr_ray.functions.text import (
        DSIR_BUCKETS,
        dsir_weight_stats,
        hashed_gram_hist,
    )

    ds = rd.from_arrow(_docs_table(["", "two words"]))
    empty = rd.from_arrow(_docs_table([]))
    ct = hashed_gram_hist(empty)
    assert ct.shape == (DSIR_BUCKETS,) and ct.sum() == 0
    cr = hashed_gram_hist(ds)
    got = (dsir_weight_stats(ds, ray.put((ct, cr)))
           .to_pandas().set_index("doc_id").sort_index())
    assert got.loc[0, "n_grams"] == 0 and got.loc[0, "weight_bits"] == 0
    # vs empty target every gram weight = bitlen(1) - bitlen(cr+1) ≤ 0
    assert got.loc[1, "weight_bits"] <= 0
