"""Retrieval family: BM25 top-k, conjunctive term search, and the
materialized token-bucketed postings index.

Laws under test (retrieval.py module docstring):
  * token law shared with tfidf: lower → [a-z0-9]+ runs;
  * BM25 integer law: idf = (2(N−df)+1)/(2df+1), tf term cleared to
    22·tf·T / (10·tf·T + 3T + 9·dl·N), ONE floor per term at e6;
  * conjunctive search = docs containing EVERY query term;
  * postings_search ≡ term_search but reading ONLY the query terms'
    bucket dirs (IO pruning, the IVF-gate convention).
"""

import numpy as np
import pyarrow as pa
import pytest

from arabic_ocr_ray.functions import retrieval as rt


def _docs_table(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


CORPUS = [
    (1, "cat dog cat bird"),
    (2, "dog dog dog"),
    (3, "cat fish"),
    (4, ""),                       # dl = 0: counts toward N, not T
    (5, None),                     # null text == empty
    (6, "CAT Dog cat!dog"),        # case-fold + punctuation split
    (7, "zebra " * 50 + "cat dog"),  # long doc: dl penalty bites
]


def _brute_bm25(rows, terms, k):
    import re

    tok = re.compile(r"[a-z0-9]+")
    docs = {i: tok.findall((t or "").lower()) for i, t in rows}
    n = len(docs)
    t_total = sum(len(v) for v in docs.values())
    df = {q: sum(1 for v in docs.values() if q in v) for q in terms}
    scores = {}
    for i, v in docs.items():
        s = 0
        for q in terms:
            tf = v.count(q)
            if not tf:
                continue
            s += ((2 * (n - df[q]) + 1) * 22 * tf * t_total
                  * 10 ** 6) // (
                (2 * df[q] + 1)
                * (10 * tf * t_total + 3 * t_total + 9 * len(v) * n))
        if s:
            scores[i] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


@pytest.mark.parametrize("nparts", [1, 4])
def test_bm25_matches_brute_oracle(ray_session, nparts):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table(CORPUS)).repartition(nparts)
    out = rt.bm25_topk(ds, ["cat", "dog"], k=6)
    want = _brute_bm25(CORPUS, ["cat", "dog"], 6)
    assert list(zip(out["doc_id"], out["score_e6"])) == want
    assert out["rank"].tolist() == list(range(1, len(want) + 1))
    # doc 2 (pure dog, short) must outrank doc 7 (diluted by zebras)
    ids = out["doc_id"].tolist()
    assert ids.index(2) < ids.index(7)


def test_bm25_rare_term_outweighs_common(ray_session):
    """idf bites: a doc with only the rare term beats a doc with
    only the common one at equal tf/dl."""
    import ray.data as rd

    rows = [(i, "common filler") for i in range(1, 9)]
    rows += [(20, "rare filler"), (21, "common filler")]
    ds = rd.from_arrow(_docs_table(rows))
    out = rt.bm25_topk(ds, ["rare", "common"], k=2)
    assert out["doc_id"].tolist()[0] == 20


def test_bm25_empty_and_guards(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table([(1, ""), (2, None)]))
    out = rt.bm25_topk(ds, ["cat"], k=3)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "score_e6", "rank"]
    with pytest.raises(ValueError):
        rt.bm25_topk(ds, ["Not A Token"], k=1)
    with pytest.raises(ValueError):
        rt.term_search(ds, [])


def test_term_search_conjunctive(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table(CORPUS))
    out = rt.term_search(ds, ["cat", "dog"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # docs with BOTH: 1 (2+1), 6 (2+2), 7 (1+1); 2/3 miss one term
    assert list(zip(out["doc_id"], out["n_hits"])) == [
        (1, 3), (6, 4), (7, 2)]


def test_postings_index_equals_scan_and_prunes_io(ray_session,
                                                  tmp_path):
    """postings_search ≡ term_search on the same corpus, AND the
    index serves it reading only the query terms' bucket dirs."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(60)] + ["needle", "thread"]
    rows = []
    for i in range(300):
        words = list(rng.choice(vocab[:60], size=12))
        if i % 7 == 0:
            words += ["needle"]
        if i % 3 == 0:
            words += ["thread"]
        rows.append((i, " ".join(words)))
    ds = rd.from_arrow(_docs_table(rows))
    idx = str(tmp_path / "postings")
    rt.build_postings_index(ds, idx, n_buckets=32)

    terms = ["needle", "thread"]
    got = rt.postings_search(idx, terms, n_buckets=32).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = rt.term_search(ds, terms).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)
    assert len(got) == len([i for i in range(300)
                            if i % 21 == 0])

    # IO gate: rows in the ≤ 2 read bucket dirs ≪ index total
    bucket_rows = {
        int(d.split("=")[1]): sum(
            pq.read_metadata(os.path.join(idx, d, f)).num_rows
            for f in os.listdir(os.path.join(idx, d))
            if f.endswith(".parquet"))
        for d in os.listdir(idx) if d.startswith("tok_bucket=")}
    read = sum(bucket_rows.get(b, 0)
               for b in rt.term_buckets(terms, 32))
    assert read < sum(bucket_rows.values()) // 4, (
        read, sum(bucket_rows.values()))


def test_postings_search_unindexed_term(ray_session, tmp_path):
    """A term that never occurred still answers (empty or pruned):
    missing bucket dirs are provably zero-hit, not an error."""
    import ray.data as rd

    ds = rd.from_arrow(_docs_table([(1, "only this")]))
    idx = str(tmp_path / "p2")
    rt.build_postings_index(ds, idx, n_buckets=8)
    out = rt.postings_search(idx, ["absent"], n_buckets=8) \
        .to_pandas()
    assert len(out) == 0
    out2 = rt.postings_search(idx, ["only", "absent"], n_buckets=8) \
        .to_pandas()
    assert len(out2) == 0
