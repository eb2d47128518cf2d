"""Sequence-packing plan — the GPT-style concat-and-chunk final stage
of a training-data pipeline: every document is assigned a global token
offset in a deterministic pseudo-shuffled order, and the fixed-length
training sequences are the ``seq_len``-token chunks of the implied
concatenation.  The output is a PLAN (per-doc offset + chunk span),
not the token stream itself: at 100 TB the plan is a fixed-width
row per doc (40 B) while the stream is the corpus — downstream shard
writers consume the plan and materialize only their own chunk range.

Determinism contract (mirrored exactly by the SQL twin):

* order key  ``h = ((doc_id % 2^31) * 1103515245 + 12345) % 2^31``
  (ties → ``doc_id``) — an LCG pseudo-shuffle, so packing order is
  decorrelated from crawl/id order (the property training wants) while
  both engines compute it with exact int64 arithmetic (the ``% 2^31``
  pre-reduction keeps every product < 2^61, overflow-free on both).
* ``tok_offset(d) = Σ n_tokens(d')`` over all ``d'`` strictly before
  ``d`` in ``(h, doc_id)`` order; tokens are whitespace runs (the
  ``doc_token_count`` convention).
* chunks: ``chunk_first = tok_offset // seq_len``,
  ``chunk_last = (tok_offset + n_tokens - 1) // seq_len``; a
  zero-token doc occupies no chunk (both = -1).

Scale shape — a global ordered prefix-sum WITHOUT a global sort:
the order key's top bits define ``n_buckets`` contiguous key ranges,
so per-bucket token sums (ONE tiny keyed Sum over per-batch partials,
≤ blocks × n_buckets rows) give exact exclusive bucket offsets on the
driver (n_buckets ints, broadcast in a closure); in-bucket offsets are
a per-bucket sort + cumsum inside ``groupby(bucket).map_groups`` over
the (id, n, h) PROJECTION — 24 B/doc; document text never shuffles.
Reference analog: the reference walks images in listdir order
(/root/reference/segment_words.py:254); here the "order" is an
explicit, engine-independent law so a 256-node run and the SQL twin
agree byte-for-byte.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[^ \t\n\r\f\v]+"
PACK_MULT = 1103515245
PACK_ADD = 12345
PACK_MOD = 2_147_483_648  # 2^31


def _order_key(ids: np.ndarray) -> np.ndarray:
    """LCG pseudo-shuffle key, exact int64 (ids pre-reduced mod 2^31
    so the product stays < 2^61)."""
    return ((ids % PACK_MOD) * PACK_MULT + PACK_ADD) % PACK_MOD


def pack_plan(ds, col: str = "text", id_col: str = "doc_id",
              seq_len: int = 2048, n_buckets: int = 256):
    """→ Dataset(doc_id, n_tokens, tok_offset, chunk_first,
    chunk_last) — the concat-and-chunk packing plan (module
    docstring has the exact law).  ``n_buckets`` must divide 2^31."""
    if PACK_MOD % n_buckets:
        raise ValueError(f"n_buckets={n_buckets} must divide 2^31")
    bucket_width = PACK_MOD // n_buckets

    def project(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), dtype=np.int64)
        n = np.asarray(
            pc.count_substring_regex(b.column(col),
                                     pattern=TOKEN_RE).fill_null(0),
            dtype=np.int64)
        h = _order_key(ids)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "h": pa.array(h, pa.int64()),
            "bkt": pa.array(h // bucket_width, pa.int64())})

    proj = (ds.select_columns([id_col, col])
            .map_batches(project, batch_format="pyarrow")
            .materialize())  # 24 B/doc; scanned twice below

    # pass 1: exact per-bucket token sums — per-batch bincount
    # partials (≤ n_buckets rows/block) → ONE tiny keyed Sum.
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        s = np.bincount(np.asarray(b.column("bkt")),
                        weights=np.asarray(b.column("n_tokens"),
                                           dtype=np.float64),
                        minlength=n_buckets).astype(np.int64)
        nz = np.flatnonzero(s)
        return pa.table({"bkt": pa.array(nz, pa.int64()),
                         "c": pa.array(s[nz], pa.int64())})

    sums = np.zeros(n_buckets, dtype=np.int64)
    for r in (proj.map_batches(partials, batch_format="pyarrow")
              .groupby("bkt").aggregate(Sum("c", alias_name="c"))
              .take_all()):  # ≤ n_buckets rows by construction
        sums[r["bkt"]] = r["c"]
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))  # exclusive

    # pass 2: in-bucket order + cumsum; bucket offset from the
    # broadcast array (n_buckets ints — rides the closure).
    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", id_col], kind="mergesort")
        n = g["n_tokens"].to_numpy()
        off = (int(offsets[int(g["bkt"].iat[0])])
               + np.concatenate(([0], np.cumsum(n)[:-1])))
        first = off // seq_len
        last = (off + n - 1) // seq_len
        empty = n == 0
        first[empty] = -1
        last[empty] = -1
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "n_tokens": n,
            "tok_offset": off,
            "chunk_first": first,
            "chunk_last": last})

    return proj.groupby("bkt").map_groups(assign, batch_format="pandas")


def pack_chunk_stats(plan, seq_len: int = 2048):
    """→ Dataset(chunk_id, n_docs, n_tokens) — per-training-sequence
    occupancy of a :func:`pack_plan` (how many docs contribute to each
    ``seq_len``-token chunk and how many of its token slots they
    fill).  Every chunk is full (= seq_len) except the last; n_docs
    counts cross-chunk stragglers correctly because a doc spanning
    chunks [f..l] contributes to every one of them.

    Shape: vectorized per-batch interval explode (a doc spans ≤
    ⌈n/seq_len⌉+1 chunks, so the exploded rows are ∝ total tokens /
    seq_len, not docs × span) → ONE chunk-keyed Sum."""
    from ray.data.aggregate import Sum

    def explode(b: pa.Table) -> pa.Table:
        first = np.asarray(b.column("chunk_first"), dtype=np.int64)
        last = np.asarray(b.column("chunk_last"), dtype=np.int64)
        off = np.asarray(b.column("tok_offset"), dtype=np.int64)
        n = np.asarray(b.column("n_tokens"), dtype=np.int64)
        keep = n > 0
        first, last, off, n = first[keep], last[keep], off[keep], n[keep]
        span = last - first + 1
        if span.size == 0:
            return pa.table({"chunk_id": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64())})
        doc_ix = np.repeat(np.arange(first.size), span)
        chunk = first[doc_ix] + (
            np.arange(span.sum()) -
            np.repeat(np.concatenate(([0], np.cumsum(span)[:-1])), span))
        lo = np.maximum(off[doc_ix], chunk * seq_len)
        hi = np.minimum(off[doc_ix] + n[doc_ix], (chunk + 1) * seq_len)
        return pa.table({
            "chunk_id": pa.array(chunk, pa.int64()),
            "n_docs": pa.array(np.ones(chunk.size, np.int64)),
            "n_tokens": pa.array(hi - lo, pa.int64())})

    return (plan.map_batches(explode, batch_format="pyarrow")
            .groupby("chunk_id")
            .aggregate(Sum("n_docs", alias_name="n_docs"),
                       Sum("n_tokens", alias_name="n_tokens")))
