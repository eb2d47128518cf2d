"""Ranked and boolean retrieval over the documents corpus — BM25
top-k, conjunctive term search, and a materialized token-bucketed
postings index (the search-engine access path).

Reference scope note: the reference engine has no retrieval family
(its corpus ops stop at per-image prediction); this module is part of
the beyond-reference LLM-data-pipeline surface — the query side of
the anchor-text / link-graph index a crawl pipeline builds
(``links.py``), and the standard way a curation team samples "docs
about X" from a 100 TB corpus.

Token law (shared with :func:`text.tfidf_top_terms` so one corpus
tokenization serves both): ``lower(text)`` → ``[a-z0-9]+`` runs.
Query terms must already be tokens under that law (validated).

BM25 (Robertson–Walker, k1 = 6/5, b = 3/4) in EXACT integer
arithmetic so the DuckDB twin hash-matches:

* idf is the log-free rational ``(2(N−df)+1) / (2df+1)`` — the
  classic ``(N−df+0.5)/(df+0.5)`` with denominators cleared (log-free
  keeps the oracle exact; same convention as ``tfidf_top_terms``'s
  log-free idf).
* the tf-saturation term ``tf(k1+1) / (tf + k1(1−b+b·dl/avgdl))``
  with ``avgdl = T/N`` clears to ``22·tf·T / (10·tf·T + 3T + 9·dl·N)``
  (multiply through by ``10·T``, substitute ``k1 = 6/5``,
  ``b = 3/4``), where ``dl`` = doc token count, ``T`` = corpus token
  count, ``N`` = corpus doc count.
* per-term ``score_e6 = (2(N−df)+1)·22·tf·T·10⁶
  // ((2df+1)·(10·tf·T + 3T + 9·dl·N))`` — ONE floor division per
  term (documented; the twin uses HUGEINT, the engine python ints, so
  neither side ever wraps), doc score = Σ over query terms present.

Scale shape (the 100 TB contract):

* ``bm25_topk`` / ``term_search`` are index-free corpus scans — the
  intrinsic cost of ad-hoc retrieval.  ONE streaming pass projects
  each doc to ≤ ``1 + |terms|`` tiny rows (text never shuffles); the
  corpus aggregates (N, T) fold from that projection, df is a
  ≤ |terms|-row driver lookup, scoring is a pure map over hit rows,
  and top-k is the tree combine (no global sort).
* ``build_postings_index`` materializes the classic inverted index as
  token-hash-bucketed parquet (``tok_bucket=<b>/`` dirs — the
  ``ann.build_ivf_index`` pattern): ONE corpus pass + ONE
  bucket-keyed shuffle of (token, doc_id, tf) rows, write once, query
  forever.  ``postings_search`` reads ONLY the buckets its query
  terms hash to — IO ∝ hit lists, never the corpus (the pytest gate
  asserts the pruned read like the IVF one does).
"""

from __future__ import annotations

import os
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_Q_RE = re.compile(r"[a-z0-9]+")
_TERM_OK = re.compile(r"^[a-z0-9]+$")

#: fixed-point scale of BM25 scores (score_e6 = floor(score · 10⁶))
BM25_SCALE = 10 ** 6
POSTINGS_BUCKETS = 64


def _check_terms(terms) -> list[str]:
    out = sorted(set(terms))
    if not out:
        raise ValueError("query needs at least one term")
    for t in out:
        if not _TERM_OK.match(t):
            raise ValueError(
                f"query term {t!r} is not a [a-z0-9]+ token — "
                f"lowercase/tokenize the query under the corpus law")
    return out


def doc_term_proj_batch(batch: pa.Table, terms: frozenset,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> pa.Table:
    """→ (doc_id, dl, term, tf): ONE ``term=''`` base row per doc
    (carrying dl for the corpus N/T fold — '' can never be a
    ``[a-z0-9]+`` token) plus one row per query term present.  A row
    is a whole document, so the projection is complete in-batch."""
    ids = batch.column(id_col)
    take: list = []
    out_dl: list = []
    out_t: list = []
    out_tf: list = []
    for i, t in enumerate(batch.column(text_col).to_pylist()):
        toks = _Q_RE.findall((t or "").lower())
        take.append(i)
        out_dl.append(len(toks))
        out_t.append("")
        out_tf.append(0)
        c = Counter(tok for tok in toks if tok in terms)
        for tok in sorted(c):
            take.append(i)
            out_dl.append(len(toks))
            out_t.append(tok)
            out_tf.append(c[tok])
    return pa.table({
        "doc_id": ids.take(pa.array(take, pa.int64())),
        "dl": pa.array(out_dl, pa.int64()),
        "term": pa.array(out_t, pa.string()),
        "tf": pa.array(out_tf, pa.int64()),
    })


def bm25_score_e6(tf: int, df: int, dl: int, n: int, t: int) -> int:
    """One query term's BM25 contribution (module-docstring law).
    Python ints — never wraps."""
    num = (2 * (n - df) + 1) * 22 * tf * t * BM25_SCALE
    den = (2 * df + 1) * (10 * tf * t + 3 * t + 9 * dl * n)
    return num // den


def bm25_topk(ds, terms, k: int = 10, id_col: str = "doc_id",
              text_col: str = "text", num_partitions: int = 16):
    """→ pandas DataFrame(doc_id, score_e6, rank) — global BM25
    top-k (score desc, doc_id asc ties), ≤ k rows on the driver.

    Shuffle inventory: the corpus scan is the only pass over text;
    the (doc_id, dl, term, tf) projection (≤ (1+|terms|)·32 B/doc)
    materializes once because THREE consumers fold from it (N/T, df,
    scoring); then one doc-keyed Sum over hit rows and the tree-
    combined top-k.  df is ≤ |terms| rows — a driver lookup, shipped
    back inside the scoring closure (bytes, not a shuffle)."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    from .topk import topk

    tset = frozenset(_check_terms(terms))
    proj = (ds.map_batches(
                lambda b: doc_term_proj_batch(b, tset, id_col,
                                              text_col),
                batch_format="pyarrow")
            .repartition(num_partitions).materialize())

    def base_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("term"), ""))

    def hits_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(pc.equal(b.column("term"), "")))

    stats = proj.map_batches(base_only, batch_format="pyarrow") \
        .aggregate(Count(alias_name="n"), Sum("dl", alias_name="t"))
    n_docs = int(stats["n"] or 0)
    t_toks = int(stats["t"] or 0)
    empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "score_e6": pd.Series([], dtype="int64"),
        "rank": pd.Series([], dtype="int64")})
    if n_docs == 0 or t_toks == 0:
        return empty  # no scoreable corpus (T=0 ⇒ every dl=0)

    hit_ds = proj.map_batches(hits_only, batch_format="pyarrow")
    df_rows = (hit_ds.select_columns(["term", "doc_id"])
               .groupby("term").aggregate(Count(alias_name="df"))
               .take_all())  # bounded: ≤ |terms| rows
    dfmap = {r["term"]: int(r["df"]) for r in df_rows}
    if not dfmap:
        return empty

    def score(b: pa.Table) -> pa.Table:
        s = [bm25_score_e6(int(tf), dfmap[tm], int(dl), n_docs,
                           t_toks)
             for tm, tf, dl in zip(b.column("term").to_pylist(),
                                   b.column("tf").to_pylist(),
                                   b.column("dl").to_pylist())]
        return pa.table({"doc_id": b.column("doc_id"),
                         "score_e6": pa.array(s, pa.int64())})

    summed = (hit_ds.map_batches(score, batch_format="pyarrow")
              .groupby("doc_id")
              .aggregate(Sum("score_e6", alias_name="score_e6")))
    out = topk(summed, "score_e6", k, descending=True,
               tie_cols=("doc_id",))
    out = out.reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def term_search_batch(batch: pa.Table, terms: frozenset,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> pa.Table:
    """→ (doc_id, n_hits) for in-batch docs containing EVERY query
    term (n_hits = total query-term occurrences)."""
    ids = batch.column(id_col)
    take: list = []
    hits: list = []
    nt = len(terms)
    for i, t in enumerate(batch.column(text_col).to_pylist()):
        c = Counter(tok for tok in _Q_RE.findall((t or "").lower())
                    if tok in terms)
        if len(c) == nt:
            take.append(i)
            hits.append(sum(c.values()))
    return pa.table({
        "doc_id": ids.take(pa.array(take, pa.int64())),
        "n_hits": pa.array(hits, pa.int64()),
    })


def term_search(ds, terms, id_col: str = "doc_id",
                text_col: str = "text"):
    """Conjunctive (AND) boolean retrieval by corpus scan →
    Dataset(doc_id, n_hits).  Pure streaming map — ZERO shuffles
    (a row is a whole doc, so the conjunction is in-batch)."""
    tset = frozenset(_check_terms(terms))
    return ds.map_batches(
        lambda b: term_search_batch(b, tset, id_col, text_col),
        batch_format="pyarrow")


# --- materialized postings index --------------------------------------------

def postings_rows_batch(batch: pa.Table, n_buckets: int,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> pa.Table:
    """→ (token, doc_id, tf, tok_bucket) — the full-vocabulary
    postings rows for in-batch docs, bucketed by the shared
    deterministic token hash (``parthash.partition_ids``)."""
    from .parthash import partition_ids

    ids = batch.column(id_col)
    take: list = []
    out_t: list = []
    out_tf: list = []
    for i, t in enumerate(batch.column(text_col).to_pylist()):
        c = Counter(_Q_RE.findall((t or "").lower()))
        for tok in sorted(c):
            take.append(i)
            out_t.append(tok)
            out_tf.append(c[tok])
    tab = pa.table({
        "token": pa.array(out_t, pa.string()),
        "doc_id": ids.take(pa.array(take, pa.int64())),
        "tf": pa.array(out_tf, pa.int64()),
    })
    return tab.append_column(
        "tok_bucket", pc.cast(partition_ids([tab.column("token")],
                                            n_buckets), pa.int64()))


def build_postings_index(ds, index_dir: str,
                         n_buckets: int = POSTINGS_BUCKETS,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> None:
    """Materialize the inverted index as token-bucketed parquet
    (``index_dir/tok_bucket=<b>/`` — the ``ann.build_ivf_index``
    layout, incl. its overwrite-on-rebuild rule).  ONE corpus pass,
    NO shuffle (the partitioned write groups rows by bucket at the
    file level — bucket-local search never needs co-location beyond
    that); a bucket dir is the query-time pruning unit AND the
    resume/shard unit (hive dirs, never one giant file)."""
    os.makedirs(index_dir, exist_ok=True)
    (ds.map_batches(
        lambda b: postings_rows_batch(b, n_buckets, id_col, text_col),
        batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["tok_bucket"],
                    mode="overwrite"))


def term_buckets(terms, n_buckets: int = POSTINGS_BUCKETS) -> list:
    """Bucket ids a query's terms hash to (the dirs a search reads)."""
    from .parthash import partition_ids

    arr = pa.array(sorted(set(terms)), pa.string())
    return sorted({int(b.as_py())
                   for b in partition_ids([arr], n_buckets)})


def postings_search(index_dir: str, terms,
                    n_buckets: int = POSTINGS_BUCKETS):
    """Conjunctive search THROUGH the materialized index →
    Dataset(doc_id, n_hits) ≡ :func:`term_search` on the indexed
    corpus — but reading ONLY the ≤ |terms| bucket dirs the query
    terms hash to (IO ∝ hit lists, never corpus).  One doc-keyed
    fold over the pruned postings does the AND."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    tlist = _check_terms(terms)
    # expand bucket dirs to files: read_parquet opens LIST entries as
    # files; a bucket no token hashed to has no dir — provably 0 hits
    paths = []
    for b in term_buckets(tlist, n_buckets):
        p = os.path.join(index_dir, f"tok_bucket={b}")
        if os.path.isdir(p):
            paths.extend(sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.endswith(".parquet")))
    if not paths:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_hits": pa.array([], pa.int64())}))
    tset = pa.array(tlist, pa.string())

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("token"),
                                 value_set=tset))

    nt = len(tlist)

    def conj(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("n_terms"), nt)
        return b.filter(m).select(["doc_id", "n_hits"])

    return (ray.data.read_parquet(paths,
                                  columns=["token", "doc_id", "tf"])
            .map_batches(keep, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Count(alias_name="n_terms"),
                       Sum("tf", alias_name="n_hits"))
            .map_batches(conj, batch_format="pyarrow"))
