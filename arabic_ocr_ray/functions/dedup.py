"""Deduplication operators — exact and near-duplicate, at corpus scale.

The reference's only dedup is the prototype set-insert (D1,
integrator.py:157-159) = exact dedup on a composite key; the engine
generalizes it to the operators a 100 TB training-data pipeline needs.

Scale shapes (the groupby keys are the shuffle keys):

  exact        content hash per batch → groupby(hash) → min(id)
  MinHash-LSH  shingles → K minhashes → B bands → explode (band,
               band_hash, id) rows → groupby((band, band_hash)) →
               candidate pairs inside buckets → exact-Jaccard verify
               (pair volume bounded by bucket sizes, never n²)
  SimHash      64-bit simhash per doc → split into 4×16-bit bands →
               same banded groupby → verify Hamming ≤ k
  embedding    normalized vectors → sign-LSH buckets (random
               hyperplanes, seeded) → in-bucket cosine verify

All hash seeds are fixed constants → bit-deterministic across runs
and cluster layouts.
"""

from __future__ import annotations

import hashlib
import os
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .arrowout import arrow_clean
from .joins import _pa_type as _joins_pa_type
from .parthash import partition_ids

_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")  # explicit ASCII ws class — matches the RE2 oracles (see text.py)

# --- exact dedup ----------------------------------------------------------


def content_hash_batch(batch: pa.Table, col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """String OR binary content column → sha1 hex (nulls hash as
    empty; bytes hash raw — the html-diff path never decodes)."""
    vals = batch.column(col).to_pylist()
    h = [hashlib.sha1(
            v if isinstance(v, bytes) else (v or "").encode()
         ).hexdigest() for v in vals]
    return pa.table({
        id_col: batch.column(id_col),
        "content_hash": pa.array(h, pa.string()),
    })


def dedup_exact(ds, col: str = "text", id_col: str = "doc_id"):
    """→ Dataset(content_hash, doc_id=min id, n_copies).  The D1
    pattern: hash-partition + per-group first/min."""
    from ray.data.aggregate import Count, Min

    hashed = ds.map_batches(
        lambda b: content_hash_batch(b, col, id_col), batch_format="pyarrow")
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col),
        Count(alias_name="n_copies"),
    )


# --- shingles + MinHash ---------------------------------------------------

N_HASHES = 64
N_BANDS = 16          # 16 bands × 4 rows ≈ s-curve threshold ~0.55
ROWS_PER_BAND = N_HASHES // N_BANDS
# Mersenne-31 modulus keeps every product < 2^62 → exact int64 math,
# fully vectorized (no object/bigint arithmetic in the hot path).
_M31 = (1 << 31) - 1
_RNG = np.random.RandomState(0x5EED)
_A = _RNG.randint(1, _M31, size=N_HASHES, dtype=np.int64)
_B = _RNG.randint(0, _M31, size=N_HASHES, dtype=np.int64)


def shingles(text: str, k: int = 3) -> set[int]:
    toks = _TOKEN_RE.findall((text or "").lower())
    if len(toks) < k:
        return {zlib.crc32(" ".join(toks).encode())} if toks else set()
    return {zlib.crc32(" ".join(toks[i:i + k]).encode())
            for i in range(len(toks) - k + 1)}


def minhash_signature(sh: set[int]) -> np.ndarray:
    if not sh:
        return np.zeros(N_HASHES, dtype=np.int64)
    x = np.fromiter(sh, dtype=np.int64, count=len(sh)) % _M31
    vals = (x[None, :] * _A[:, None] + _B[:, None]) % _M31  # int64-exact
    return np.min(vals, axis=1)


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


#: Docs with fewer distinct shingles than this are excluded from LSH
#: banding: near-identical SHORT texts (1-word pages, empty pages)
#: produce identical signatures in huge classes and explode the
#: candidate space quadratically, while carrying no shingle evidence —
#: exact dedup (dedup_exact) is the right operator for them.
MIN_SHINGLES = 5


#: process-level token → crc32 cache for the shingle fast path (same
#: Zipf argument as the simhash token cache)
_TOKEN_CRC: dict[str, int] = {}
_TOKEN_CRC_CAP = 1 << 20

#: odd mixing constants for combining 3 token hashes into one shingle
#: hash (wraparound int64 arithmetic — vectorized, collision odds ~
#: crc32's).  Distinct trigram strings map to distinct hashes w.h.p.;
#: identical trigrams always agree, which is all LSH needs — the FINAL
#: pair set is exact-Jaccard verified either way.
_SH_C1 = np.int64(-8663945395140668459)
_SH_C2 = np.int64(5871781006564002453)


def _token_crc_array(toks: list[str]) -> np.ndarray:
    cache = _TOKEN_CRC
    get = cache.get
    crc = zlib.crc32
    grow = len(cache) < _TOKEN_CRC_CAP
    vals: list[int] = []
    app = vals.append
    for t in toks:
        h = get(t)
        if h is None:
            h = crc(t.encode())
            if grow:
                cache[t] = h
        app(h)
    # one bulk list→array conversion beats per-element numpy stores
    return np.array(vals, dtype=np.int64)


def shingle_hashes_fast(text: str, k: int = 3) -> np.ndarray:
    """Distinct shingle hashes for one doc, vectorized: cached per-token
    crc32 → arithmetic trigram combine → np.unique.  The semantic twin
    of :func:`shingles` (distinct token k-grams), under a different —
    equally collision-resistant — hash of each k-gram."""
    toks = _TOKEN_RE.findall((text or "").lower())
    if len(toks) < k:
        if not toks:
            return np.empty(0, dtype=np.int64)
        return np.array([zlib.crc32(" ".join(toks).encode())],
                        dtype=np.int64)
    h = _token_crc_array(toks)
    with np.errstate(over="ignore"):
        combo = (h[:-2] * _SH_C1) ^ (h[1:-1] * _SH_C2) ^ h[2:]
    return np.unique(combo)


def _band_rows_batch(batch: pa.Table, col: str, id_col: str) -> pa.Table:
    """doc → N_BANDS (band, band_hash, id) rows — batch-vectorized:
    shingle arrays are concatenated and ALL docs' 64 minhashes come
    from N_HASHES `np.minimum.reduceat` passes (no per-doc python
    signature loop); band hashes are an FNV-style vectorized fold over
    each band's rows."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(col).to_pylist()
    sh_arrays: list[np.ndarray] = []
    keep_rows: list[int] = []
    bounds = [0]
    for row, t in enumerate(texts):
        sh = shingle_hashes_fast(t)
        if len(sh) < MIN_SHINGLES:
            continue
        sh_arrays.append(sh)
        keep_rows.append(row)
        bounds.append(bounds[-1] + len(sh))
    id_type = batch.schema.field(id_col).type
    if not keep_rows:
        return pa.table({
            # typed empty — an all-skipped batch must not emit a
            # null-typed column (block schema mismatch)
            id_col: pa.array([], type=id_type),
            "band": pa.array([], pa.int32()),
            "band_hash": pa.array([], pa.int64()),
        })
    x = np.concatenate(sh_arrays) % _M31
    starts = np.asarray(bounds[:-1])
    n = len(keep_rows)
    sigs = np.empty((n, N_HASHES), dtype=np.int64)
    for hi in range(N_HASHES):
        vals = (x * _A[hi] + _B[hi]) % _M31   # int64-exact (M31 modulus)
        sigs[:, hi] = np.minimum.reduceat(vals, starts)
    # vectorized FNV-ish band hash over each band's ROWS_PER_BAND sigs
    band_hash = np.empty((n, N_BANDS), dtype=np.int64)
    with np.errstate(over="ignore"):
        for b in range(N_BANDS):
            chunk = sigs[:, b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
            acc = np.full(n, np.int64(-3750763034362895579))
            for j in range(ROWS_PER_BAND):
                acc = (acc ^ chunk[:, j]) * np.int64(1099511628211)
            band_hash[:, b] = acc
    # band-major layout: ids repeated per band, band_hash.T flattened
    kept = (batch.take(pa.array(keep_rows, pa.int64()))
            .column(id_col).combine_chunks())
    return pa.table({
        id_col: pa.concat_arrays([kept] * N_BANDS),
        "band": pa.array(
            np.repeat(np.arange(N_BANDS, dtype=np.int32), n)),
        "band_hash": pa.array(band_hash.T.reshape(-1), pa.int64()),
    })


MAX_BUCKET = 200  # cap pathological LSH buckets (logged, not scanned)
# MUST stay a multiple of 4: simhash_dup_pairs packs the band index
# into the partition key as (band_val*4 + band_idx) % _PAIR_PARTITIONS,
# so 4 | P makes every partition band-pure (pk mod 4 == band_idx) and
# the in-partition drop_duplicates can never collapse two different
# band records of the same pair (the min-uncapped-band global dedup
# relies on every band's discovery row surviving).
_PAIR_PARTITIONS = 64


def _log_capped(g, sizes, cap: int, op: str) -> None:
    """No silent caps: a bucket over the cap is dropped from pair
    generation (exact dedup covers identical docs) but LOGGED so a
    truncated sweep never reads as full coverage."""
    over = sizes[sizes > cap]
    if len(over):
        import logging

        logging.getLogger("arabic_ocr_ray").warning(
            "%s: %d row(s) in buckets over MAX_BUCKET=%d skipped "
            "(largest=%d)", op, int(len(over)), cap, int(sizes.max()))


def minhash_candidates(ds, col: str = "text", id_col: str = "doc_id",
                       distinct: bool = True):
    """→ Dataset(a, b) candidate pairs (a < b), deduped.

    Shuffle shape: band rows are hash-partitioned on (band, band_hash)
    into a FIXED number of partitions and each partition generates its
    buckets' pairs with one vectorized pandas self-merge — NOT one
    map_groups call per bucket: almost every bucket is a singleton, so
    per-group dispatch costs 3 orders of magnitude more python calls
    than partitions do (measured 33s → ~4s at 60k docs).

    ``distinct=False`` skips the global pair-dedup shuffle and returns
    up to one copy of a pair per agreeing band (16 | _PAIR_PARTITIONS
    makes partitions band-pure, so in-partition dedup never collapses
    across bands).  :func:`near_dup_pairs` uses this: the verify stage
    already co-locates all copies of a pair (vp = parthash(a,b)), so its
    group dedup is free and the extra all-to-all pass over pair rows
    is pure overhead."""
    rows = ds.map_batches(
        lambda b: _band_rows_batch(b, col, id_col), batch_format="pyarrow")

    def add_pk(b: pa.Table) -> pa.Table:
        bh = np.asarray(b.column("band_hash"), dtype=np.int64)
        bd = np.asarray(b.column("band"), dtype=np.int64)
        pk = (bh * 16 + bd) % _PAIR_PARTITIONS
        return b.append_column("pk", pa.array(pk, pa.int32()))

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        key = ["band", "band_hash"]
        sizes = g.groupby(key)[id_col].transform("size")
        _log_capped(g, sizes, MAX_BUCKET, "minhash_candidates")
        g2 = g.loc[(sizes >= 2) & (sizes <= MAX_BUCKET),
                   key + [id_col]]
        if g2.empty:
            return pd.DataFrame({"a": g2[id_col], "b": g2[id_col]})
        m = g2.merge(g2, on=key, suffixes=("_x", "_y"))
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        out = m[[f"{id_col}_x", f"{id_col}_y"]].drop_duplicates()
        out.columns = ["a", "b"]
        return out

    cand = (rows.map_batches(add_pk, batch_format="pyarrow")
            .groupby("pk").map_groups(arrow_clean(pairs_part),
                                      batch_format="pandas"))
    if not distinct:
        return cand

    # a pair can surface from several bands/partitions → global distinct,
    # again via fixed hash partitions + vectorized drop_duplicates
    def add_ppk(b: pa.Table) -> pa.Table:
        pk = partition_ids([b.column("a"), b.column("b")], 32)
        return b.append_column("ppk", pk)

    return (cand.map_batches(add_ppk, batch_format="pyarrow")
            .groupby("ppk")
            .map_groups(arrow_clean(
                lambda g: g.drop_duplicates(["a", "b"])[["a", "b"]]),
                        batch_format="pandas"))


_VERIFY_PARTITIONS = 64


def verify_pairs_jaccard(cand_ds, docs_ds, threshold: float,
                         col: str = "text", id_col: str = "doc_id",
                         num_partitions: int = _VERIFY_PARTITIONS):
    """Exact n-gram Jaccard verification of candidate pairs —
    SHUFFLE-SIDE (no driver text materialization; the r1 broadcast of
    a candidate-text dict was a driver OOM at a realistic 100 TB dup
    rate):

      1. each pair gets a verify-partition key ``vp = parthash(a,b) % V``
         (vectorized — never a per-pair Python crc32 loop);
      2. each pair emits its two doc ids as (id, vp) "need" rows
         (locally deduped);
      3. the corpus is hash-joined to the need rows via
         :func:`~arabic_ocr_ray.functions.joins.hash_join` (the
         union+groupby shape — NOT ``Dataset.join``, whose pyarrow
         aggregator dies on the schemaless empty blocks that the
         candidate map_groups shuffle emits when pairs are sparse;
         deterministic crash at num_cpus=32 / sf0.01 in r2) →
         (id, text, vp): a doc's text is replicated once per
         verify-partition that needs it, bounded by 2 × pairs — never
         the corpus;
      4. union(tagged pair rows, tagged doc rows) → groupby(vp) → one
         vectorized verify per partition with a per-doc shingle cache.

    Jaccard is integer math end to end (``inter*1000 // union``; keep
    iff ``inter*1000 ≥ thr_x1000*union``) so a DuckDB oracle computing
    the same trigram sets can never diverge on float rounding."""
    thr_x1000 = int(round(threshold * 1000))
    sch = docs_ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]

    # pair ids are tiny (never the corpus); pinning them avoids
    # recomputing the whole LSH banding for the two consumers below
    cand_ds = cand_ds.materialize()

    if cand_ds.count() == 0:
        # zero candidates (a clean corpus) is a normal outcome: return
        # a TYPED empty so downstream consumers (connected components,
        # keep-best, unions) see the same schema as a non-empty run
        # instead of a schemaless dataset that crashes plan-time
        # schema fetches.  count() is metadata-only post-materialize.
        import ray.data as rd
        it = _joins_pa_type(id_type)
        return rd.from_arrow(pa.table({
            "a": pa.array([], it),
            "b": pa.array([], it),
            "jaccard_x1000": pa.array([], pa.int64())}))

    def tag_pairs(b: pa.Table) -> pa.Table:
        vp = partition_ids([b.column("a"), b.column("b")],
                           num_partitions)
        return pa.table({
            "vp": vp,
            "kind": pa.array([0] * b.num_rows, pa.int8()),
            "a": b.column("a"),
            "b": b.column("b"),
            id_col: pa.nulls(b.num_rows, id_type),
            col: pa.nulls(b.num_rows, pa.string()),
        })

    pairs_t = cand_ds.map_batches(tag_pairs, batch_format="pyarrow")

    def need_rows(b: pa.Table) -> pa.Table:
        ids = (b.column("a").to_pylist() + b.column("b").to_pylist())
        vps = b.column("vp").to_pylist() * 2
        seen = set()
        out_id, out_vp = [], []
        for i, v in zip(ids, vps):  # local dedup only — global dedup
            if (i, v) not in seen:  # happens inside the verify group
                seen.add((i, v))
                out_id.append(i)
                out_vp.append(v)
        return pa.table({
            id_col: pa.array(out_id, id_type),
            "vp": pa.array(out_vp, pa.int32()),
        })

    need = pairs_t.map_batches(need_rows, batch_format="pyarrow")

    from .joins import hash_join

    # right_distinct: duplicate (id, vp) need rows (a doc in several
    # pairs, or duplicate candidate copies when the caller skipped the
    # candidate-dedup shuffle) must not fan the doc's text out once per
    # copy — the join partition dedups them globally for free
    docs_needed = hash_join(
        docs_ds.select_columns([id_col, col]), need,
        on=id_col, how="inner", num_partitions=num_partitions,
        right_distinct=True,
        # static hint: skips the plan-time fetch-by-execution of the
        # need-rows map chain
        right_schema=pa.schema([(id_col, _joins_pa_type(id_type)),
                                ("vp", pa.int32())]))

    def tag_docs(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "vp": b.column("vp"),
            "kind": pa.array([1] * n, pa.int8()),
            "a": pa.nulls(n, id_type),
            "b": pa.nulls(n, id_type),
            id_col: b.column(id_col),
            col: b.column(col),
        })

    docs_t = docs_needed.map_batches(tag_docs, batch_format="pyarrow")

    def verify_group(g: pa.Table) -> pa.Table:
        # Arrow end to end: a pandas group frame would coerce the
        # nullable id columns to float64 (loses 64-bit ids, emits
        # schema-mismatched empty blocks)
        import pyarrow.compute as pc

        dd = g.filter(pc.equal(g.column("kind"), 1))
        texts = dict(zip(dd.column(id_col).to_pylist(),
                         dd.column(col).to_pylist()))
        pp = g.filter(pc.equal(g.column("kind"), 0))
        cache: dict = {}

        def sh(doc_id):
            s = cache.get(doc_id)
            if s is None:
                s = cache[doc_id] = shingles(texts.get(doc_id))
            return s

        out_a, out_b, out_j = [], [], []
        seen_pairs: set = set()  # global dedup: every copy of a pair
        for x, y in zip(pp.column("a").to_pylist(),  # shares this vp
                        pp.column("b").to_pylist()):
            if (x, y) in seen_pairs:
                continue
            seen_pairs.add((x, y))
            sa, sb = sh(x), sh(y)
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union == 0:
                continue  # both shingle-less: not LSH-verifiable
            if inter * 1000 >= thr_x1000 * union:
                out_a.append(x)
                out_b.append(y)
                out_j.append(inter * 1000 // union)
        return pa.table({
            "a": pa.array(out_a, id_type),
            "b": pa.array(out_b, id_type),
            "jaccard_x1000": pa.array(out_j, pa.int64()),
        })

    return (pairs_t.union(docs_t)
            .groupby("vp")
            .map_groups(verify_group, batch_format="pyarrow"))


def near_dup_pairs(ds, threshold: float = 0.8,
                   col: str = "text", id_col: str = "doc_id"):
    """MinHash-LSH candidates + exact Jaccard verify → verified pairs.

    Candidates flow in WITHOUT their own dedup shuffle
    (``distinct=False``): all copies of a pair share the verify
    partition key, so the verify group dedups them for free — one
    fewer all-to-all pass over the pair stream."""
    return verify_pairs_jaccard(
        minhash_candidates(ds, col, id_col, distinct=False),
        ds, threshold, col, id_col)


# --- exact n-gram-Jaccard similarity self-join (prefix filter) ------------

def _prefix_filter_candidates(ds, threshold: float, col: str,
                              id_col: str, k: int = 3,
                              num_partitions: int = _PAIR_PARTITIONS):
    """→ Dataset(a, b) candidate pairs, EXACT recall.

    All-Pairs / PPJoin-style prefix filtering (Bayardo et al., WWW'07;
    Xiao et al., WWW'08 — public algorithms): order each doc's distinct
    k-gram shingles by GLOBAL document frequency ascending (rarest
    first), keep only the first ``n - ceil(t*n) + 1`` shingles (the
    prefix), and hash-partition prefix rows by shingle.  Any pair with
    true Jaccard ≥ t shares at least one shingle in both prefixes, so
    the shingle-keyed self-merge has 100% recall — no LSH probability.
    A length filter (``min(n_a,n_b) ≥ t·max(n_a,n_b)``) prunes the
    merge output before the exact verify.

    Shuffle shape (every stage a fixed-partition fold, no per-key
    dispatch): explode (doc, shingle) → df groupby → df hash_join back
    → per-doc prefix fold → shingle-keyed pair merge.  The df ordering
    is what keeps prefix buckets small at scale: a shingle shared by
    many docs has high df, so it lands in a prefix only for docs where
    ~everything is common.  Buckets over MAX_BUCKET are processed
    anyway (exactness contract) but logged.

    Row width (r5, measured at the sf1 scale-proof): string doc ids
    (urls, ~50 B) repeated per shingle row tripled every all-to-all
    and blew the single-node spill disk at 1.2M docs.  String ids now
    ride the WIDE legs as int64 ``column_hash64`` values; the original
    strings are restored by two hash_joins over the TINY pair stream
    and pairs re-canonicalized (a < b on the original id).  Collision
    tolerance is the module's documented 64-bit-fold contract
    (birthday bound ~1e-8 at 1M docs).  Integer ids skip the remap.
    """
    import pyarrow.compute as pc

    from .parthash import column_hash64

    thr_x1000 = int(round(threshold * 1000))
    orig_id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]
    hashed_ids = not pa.types.is_integer(orig_id_type)

    def _idh(arr) -> pa.Array:
        return pa.array(column_hash64(arr).view(np.int64), pa.int64())

    def explode(b: pa.Table) -> pa.Table:
        ids_col = b.column(id_col)
        texts = b.column(col).to_pylist()
        if hashed_ids:
            ids = np.asarray(_idh(ids_col))
            id_type = pa.int64()
        else:
            ids = ids_col.to_pylist()
            id_type = b.schema.field(id_col).type
        out_ids: list = []
        sh_arrays: list[np.ndarray] = []
        for i, t in zip(ids, texts):
            toks = _TOKEN_RE.findall((t or "").lower())
            if len(toks) < k:
                continue  # no k-grams — matches the SQL twin exactly
            h = _token_crc_array(toks)
            with np.errstate(over="ignore"):
                combo = (h[:-2] * _SH_C1) ^ (h[1:-1] * _SH_C2) ^ h[2:]
            sh = np.unique(combo)
            out_ids.extend([i] * len(sh))
            sh_arrays.append(sh)
        shv = (np.concatenate(sh_arrays) if sh_arrays
               else np.empty(0, dtype=np.int64))
        return pa.table({
            id_col: pa.array(out_ids, id_type),
            "sh": pa.array(shv, pa.int64()),
        })

    ex = ds.select_columns([id_col, col]).map_batches(
        explode, batch_format="pyarrow")
    # the explode feeds two consumers (df count + join-back); pin it so
    # the shingle scan does not run twice
    ex = ex.materialize()

    def add_spk(b: pa.Table) -> pa.Table:
        return b.append_column(
            "spk", partition_ids([b.column("sh")], num_partitions))

    def df_fold(g: pa.Table) -> pa.Table:
        t = (g.select(["sh", "spk"]).group_by("sh")
             .aggregate([("spk", "count")]))
        return pa.table({"sh": t.column("sh"),
                         "df": t.column("spk_count").cast(pa.int64())})

    df_tbl = (ex.map_batches(add_spk, batch_format="pyarrow")
              .groupby("spk").map_groups(df_fold, batch_format="pyarrow"))

    from .joins import hash_join

    eff_id_type = (pa.int64() if hashed_ids
                   else _joins_pa_type(orig_id_type))
    # static hints: df_tbl is a map_groups fold — without them the
    # plan-time schema probe re-runs its shuffle (and dies on an
    # all-short corpus where ex is legitimately empty)
    with_df = hash_join(
        ex, df_tbl, on="sh", num_partitions=num_partitions,
        left_schema=pa.schema([(id_col, eff_id_type),
                               ("sh", pa.int64())]),
        right_schema=pa.schema([("sh", pa.int64()),
                                ("df", pa.int64())]))

    def add_dpk(b: pa.Table) -> pa.Table:
        return b.append_column(
            "dpk", partition_ids([b.column(id_col)], num_partitions))

    def prefix_fold(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            g, sort_keys=[(id_col, "ascending"), ("df", "ascending"),
                          ("sh", "ascending")])
        g = g.take(idx)
        ids = np.asarray(g.column(id_col).to_pandas())
        if len(ids) == 0:
            return pa.table({"sh": pa.array([], pa.int64()),
                             id_col: g.column(id_col),
                             "n": pa.array([], pa.int64()),
                             "r": pa.array([], pa.int64())})
        # run-length boundaries over the id-sorted rows (order-agnostic,
        # works for string ids too); integer-exact prefix length
        # n - ceil(t*n) + 1
        change = np.empty(len(ids), dtype=bool)
        change[0] = True
        change[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, len(ids)))
        p = counts - (thr_x1000 * counts + 999) // 1000 + 1
        rank = np.arange(len(ids)) - np.repeat(starts, counts)
        keep = rank < np.repeat(p, counts)
        kept = g.filter(pa.array(keep))
        return pa.table({
            "sh": kept.column("sh"),
            id_col: kept.column(id_col),
            "n": pa.array(np.repeat(counts, counts)[keep], pa.int64()),
            # position of the shingle in the doc's full (df, sh)-ordered
            # list — (df, sh) is a total order shared by every doc, so
            # ranks are comparable across docs (PPJoin positional filter)
            "r": pa.array(rank[keep], pa.int64()),
        })

    prefixes = (with_df.map_batches(add_dpk, batch_format="pyarrow")
                .groupby("dpk")
                .map_groups(prefix_fold, batch_format="pyarrow"))

    def add_ppk(b: pa.Table) -> pa.Table:
        return b.append_column(
            "ppk", partition_ids([b.column("sh")], num_partitions))

    def pair_fold(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("sh")[id_col].transform("size")
        # exactness contract: oversized buckets are processed, not
        # dropped — but logged so a skew blowup is visible
        _log_capped(g, sizes, MAX_BUCKET,
                    "prefix_filter (processed, not dropped)")
        g2 = g.loc[sizes >= 2, ["sh", id_col, "n", "r"]]
        if g2.empty:
            return pd.DataFrame({"a": g2[id_col], "b": g2[id_col]})
        m = g2.merge(g2, on="sh", suffixes=("_x", "_y"))
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        # length filter: J ≥ t ⟹ min(n_a,n_b) ≥ t·max(n_a,n_b)
        lo = np.minimum(m["n_x"], m["n_y"])
        hi = np.maximum(m["n_x"], m["n_y"])
        m = m[lo * 1000 >= thr_x1000 * hi]
        # positional filter (PPJoin, Xiao et al. WWW'08): with both
        # docs' shingles in the SAME global (df, sh) order, a common
        # shingle at ranks (r_x, r_y) bounds the overlap by
        # min(r_x, r_y) common shingles strictly before it plus
        # min(n_x-r_x, n_y-r_y) at-or-after it.  J ≥ t needs overlap
        # ≥ ceil(t(n_x+n_y)/(1+t)); a TRUE pair satisfies the bound at
        # EVERY common shingle, so per-copy pruning keeps exact recall
        # (a pair reaches verify if any one of its copies survives).
        alpha = -(-(thr_x1000 * (m["n_x"] + m["n_y"]))
                  // (1000 + thr_x1000))
        ubound = (np.minimum(m["r_x"], m["r_y"])
                  + np.minimum(m["n_x"] - m["r_x"], m["n_y"] - m["r_y"]))
        m = m[ubound >= alpha]
        out = (m[[f"{id_col}_x", f"{id_col}_y"]]
               .drop_duplicates())
        out.columns = ["a", "b"]
        return out

    cand = (prefixes.map_batches(add_ppk, batch_format="pyarrow")
            .groupby("ppk")
            .map_groups(arrow_clean(pair_fold),
                        batch_format="pandas"))
    if not hashed_ids:
        return cand

    # restore original ids over the TINY pair stream (two joins, each
    # bounded by the pair count — never the exploded shingle volume),
    # then re-canonicalize a < b on the ORIGINAL id ordering
    idmap = ds.select_columns([id_col]).map_batches(
        lambda b: pa.table({"idh": _idh(b.column(id_col)),
                            "orig": b.column(id_col)}),
        batch_format="pyarrow").materialize()  # feeds BOTH joins: pin
    # so the id-column scan + hash does not re-execute per consumer
    # static hints: cand is the tail of the whole prefix-filter chain
    # — a plan-time schema probe would re-run it (and return None on a
    # pair-free corpus)
    oid = _joins_pa_type(orig_id_type)
    j1 = hash_join(cand, idmap, on="a", right_on="idh",
                   num_partitions=32,
                   left_schema=pa.schema([("a", pa.int64()),
                                          ("b", pa.int64())]))

    def keep_b(b: pa.Table) -> pa.Table:
        return pa.table({"b": b.column("b"),
                         "a_orig": b.column("orig")})

    j2 = hash_join(j1.map_batches(keep_b, batch_format="pyarrow"),
                   idmap, on="b", right_on="idh", num_partitions=32,
                   left_schema=pa.schema([("b", pa.int64()),
                                          ("a_orig", oid)]))

    def canon(b: pa.Table) -> pa.Table:
        x, y = b.column("a_orig"), b.column("orig")
        lt = pc.less(x, y)
        return pa.table({"a": pc.if_else(lt, x, y),
                         "b": pc.if_else(lt, y, x)})

    return j2.map_batches(canon, batch_format="pyarrow")


def minhash_candidates_bipartite(new_ds, base_ds, col: str = "text",
                                 id_col: str = "doc_id"):
    """→ Dataset(a=base id, b=new id) CROSS-corpus candidate pairs —
    the incremental-dedup shape (new snapshot vs existing corpus):
    both sides band identically, union with a side tag, and each
    bucket emits only base×new pairs (never in-side pairs).  Bucket
    partitioning, caps and logging are shared with
    :func:`minhash_candidates`; the verify stage dedups pair copies
    globally, so no distinct shuffle here (same contract as
    ``distinct=False``)."""

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column(
                "side", pa.array(np.full(b.num_rows, side, np.int8)))
        return f

    rows = (base_ds.map_batches(
                lambda b: _band_rows_batch(b, col, id_col),
                batch_format="pyarrow")
            .map_batches(tag(0), batch_format="pyarrow")
            .union(new_ds.map_batches(
                lambda b: _band_rows_batch(b, col, id_col),
                batch_format="pyarrow")
                .map_batches(tag(1), batch_format="pyarrow")))
    return _bipartite_pairs_from_rows(rows, id_col,
                                      "minhash_candidates_bipartite")


def _bipartite_pairs_from_rows(rows, id_col: str, op_name: str):
    """Side-tagged (id, band, band_hash, side) rows → (a=side-0 id,
    b=side-1 id) candidate pairs.  Shared by the two-dataset banding
    path and the materialized-index probe path — one pair-generation
    law, two feeders."""
    def add_pk(b: pa.Table) -> pa.Table:
        bh = np.asarray(b.column("band_hash"), dtype=np.int64)
        bd = np.asarray(b.column("band"), dtype=np.int64)
        pk = (bh * 16 + bd) % _PAIR_PARTITIONS
        return b.append_column("pk", pa.array(pk, pa.int32()))

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        key = ["band", "band_hash"]
        sizes = g.groupby(key)[id_col].transform("size")
        _log_capped(g, sizes, MAX_BUCKET, op_name)
        g2 = g.loc[(sizes >= 2) & (sizes <= MAX_BUCKET),
                   key + [id_col, "side"]]
        gb = g2.loc[g2["side"] == 0, key + [id_col]]
        gn = g2.loc[g2["side"] == 1, key + [id_col]]
        if gb.empty or gn.empty:
            e = gb.head(0)
            return pd.DataFrame({"a": e[id_col], "b": e[id_col]})
        m = gb.merge(gn, on=key, suffixes=("_x", "_y"))
        out = m[[f"{id_col}_x", f"{id_col}_y"]].drop_duplicates()
        out.columns = ["a", "b"]
        return out

    return (rows.map_batches(add_pk, batch_format="pyarrow")
            .groupby("pk").map_groups(arrow_clean(pairs_part),
                                      batch_format="pandas"))


def near_dup_pairs_bipartite(new_ds, base_ds, threshold: float = 0.8,
                             col: str = "text", id_col: str = "doc_id"):
    """Incremental near-dedup: (a=base doc, b=new doc, jaccard_x1000)
    for every cross-corpus pair with Jaccard ≥ threshold — "which docs
    of the NEW snapshot already exist (nearly) in the base corpus".
    In-side duplicates are deliberately NOT reported (run
    :func:`near_dup_pairs` per side for those).  Verification reads
    texts from both sides through the same shuffle-side exact-Jaccard
    path as the self-join, with ids NAMESPACED by side ("0|" base /
    "1|" new) end to end — the same id appearing in BOTH snapshots (a
    url recrawled with changed content, the normal incremental case)
    is verified against each side's OWN text, never last-write-wins."""
    cand = minhash_candidates_bipartite(new_ds, base_ds, col, id_col)
    return _verify_bipartite(cand, new_ds, base_ds, threshold, col,
                             id_col)


def _verify_bipartite(cand, new_ds, base_ds, threshold: float,
                      col: str, id_col: str):
    """Shared verify tail of the bipartite paths: namespace ids by
    side ('0|' base / '1|' new) so a url recrawled with changed
    content verifies against each side's OWN text, exact-Jaccard
    verify, strip the namespace back off."""
    import pyarrow.compute as pc

    sch = new_ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]

    def _ns(arr, tag: str):
        s = arr if pa.types.is_string(arr.type) else arr.cast(pa.string())
        return pc.binary_join_element_wise(tag, s, "")

    def ns_pairs(b: pa.Table) -> pa.Table:
        return pa.table({"a": _ns(b.column("a"), "0|"),
                         "b": _ns(b.column("b"), "1|")})

    def ns_docs(tag: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({id_col: _ns(b.column(id_col), tag),
                             col: b.column(col)})
        return f

    docs = (base_ds.select_columns([id_col, col])
            .map_batches(ns_docs("0|"), batch_format="pyarrow")
            .union(new_ds.select_columns([id_col, col])
                   .map_batches(ns_docs("1|"), batch_format="pyarrow")))
    verified = verify_pairs_jaccard(
        cand.map_batches(ns_pairs, batch_format="pyarrow"),
        docs, threshold, col, id_col)

    def strip_ns(b: pa.Table) -> pa.Table:
        return pa.table({
            "a": pc.utf8_slice_codeunits(b.column("a"), 2).cast(id_type),
            "b": pc.utf8_slice_codeunits(b.column("b"), 2).cast(id_type),
            "jaccard_x1000": b.column("jaccard_x1000"),
        })

    return verified.map_batches(strip_ns, batch_format="pyarrow")


# --- materialized MinHash-LSH index (build once, probe every crawl) --------
#: the production incremental-dedup path: signatures of the BASE
#: corpus are computed ONCE and materialized as band-hash-bucketed
#: parquet (the ann.build_ivf_index / retrieval postings layout); each
#: crawl increment then bands only ITSELF and reads only the index
#: buckets its band hashes land in.  What the index saves at 100 TB is
#: the base-side tokenize→shingle→minhash recompute (the dominant
#: cost of `near_dup_pairs_bipartite`, paid per refresh there);
#: verification still reads both sides' TEXTS (exact Jaccard is the
#: contract — signatures alone never confirm a pair).
MINHASH_INDEX_BUCKETS = 64


def build_minhash_index(ds, index_dir: str, col: str = "text",
                        id_col: str = "doc_id",
                        n_buckets: int = MINHASH_INDEX_BUCKETS) -> None:
    """Materialize the base corpus' LSH band rows as
    ``index_dir/bh_bucket=<k>/`` parquet (ONE corpus pass, no shuffle
    — the partitioned write groups rows at the file level; a probe
    never needs co-location beyond the bucket dir).  Overwrite on
    rebuild (the IVF rule: a partial build must not leave stale
    fragments).  ``_meta.json`` pins n_buckets — probe-side bucket
    math MUST match the build's."""
    import json

    def rows(b: pa.Table) -> pa.Table:
        t = _band_rows_batch(b, col, id_col)
        bh = np.asarray(t.column("band_hash"), dtype=np.int64)
        return t.append_column(
            "bh_bucket", pa.array(bh % n_buckets, pa.int64()))

    os.makedirs(index_dir, exist_ok=True)
    (ds.map_batches(rows, batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["bh_bucket"],
                    mode="overwrite"))
    with open(os.path.join(index_dir, "_meta.json"), "w") as f:
        json.dump({"n_buckets": int(n_buckets), "id_col": id_col},
                  f)


def minhash_probe(index_dir: str, new_ds, base_ds,
                  threshold: float = 0.8, col: str = "text",
                  id_col: str = "doc_id"):
    """→ Dataset(a=base id, b=new id, jaccard_x1000) ≡
    :func:`near_dup_pairs_bipartite` on (new_ds, base corpus the
    index was built from) — the index is an ACCESS PATH, not a
    semantics.  The new increment bands once (materialized: bucket
    discovery + pair generation both read it); the index contributes
    only the bucket dirs the increment's band hashes land in (IO ∝
    increment, never base).  ``base_ds`` supplies TEXTS for the
    exact-Jaccard verify — pruned to [id_col, col] and touched only
    there."""
    import json

    import ray.data

    with open(os.path.join(index_dir, "_meta.json")) as f:
        meta = json.load(f)
    n_buckets = int(meta["n_buckets"])
    if meta["id_col"] != id_col:
        raise ValueError(
            f"index built with id_col={meta['id_col']!r}, probe "
            f"asked for {id_col!r}")

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            return b.append_column(
                "side", pa.array(np.full(b.num_rows, side, np.int8)))
        return f

    new_rows = (new_ds.map_batches(
        lambda b: _band_rows_batch(b, col, id_col),
        batch_format="pyarrow").materialize())

    # bucket discovery: ≤ n_buckets distinct values — a driver set
    def bks(b: pa.Table) -> pa.Table:
        bh = np.asarray(b.column("band_hash"), dtype=np.int64)
        return pa.table({"bk": pa.array(
            np.unique(bh % n_buckets), pa.int64())})

    need = sorted({int(r["bk"]) for r in
                   new_rows.map_batches(bks, batch_format="pyarrow")
                   .take_all()})
    paths: list = []
    for k in need:
        p = os.path.join(index_dir, f"bh_bucket={k}")
        if os.path.isdir(p):
            paths.extend(sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.endswith(".parquet")))
    if not paths:
        # nothing indexed in any probed bucket → provably no pairs
        sch = new_ds.schema()
        id_type = dict(zip(sch.names, sch.types))[id_col]
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], id_type), "b": pa.array([], id_type),
            "jaccard_x1000": pa.array([], pa.int64())}))

    base_rows = ray.data.read_parquet(
        paths, columns=[id_col, "band", "band_hash"])
    rows = (base_rows.map_batches(tag(0), batch_format="pyarrow")
            .union(new_rows.map_batches(tag(1),
                                        batch_format="pyarrow")))
    cand = _bipartite_pairs_from_rows(rows, id_col, "minhash_probe")
    return _verify_bipartite(cand, new_ds, base_ds, threshold, col,
                             id_col)


# --- benchmark decontamination --------------------------------------------

_FNV_P = np.int64(1099511628211)


def ngram_hashes(text: str, k: int = 8) -> np.ndarray:
    """Distinct k-gram hashes for one doc — cached per-token crc32,
    vectorized FNV fold over the k-token window.  Docs with fewer than
    k tokens have no k-grams (matches the SQL twin's generate_series)."""
    toks = _TOKEN_RE.findall((text or "").lower())
    m = len(toks) - k + 1
    if m <= 0:
        return np.empty(0, dtype=np.int64)
    h = _token_crc_array(toks)
    with np.errstate(over="ignore"):
        acc = h[0:m].copy()
        for j in range(1, k):
            acc = acc * _FNV_P ^ h[j:j + m]
    return np.unique(acc)


def _gram_rows(b: pa.Table, col: str, k: int) -> pa.Table:
    out = [ngram_hashes(t, k) for t in b.column(col).to_pylist()]
    g = np.unique(np.concatenate(out)) if out else np.empty(0, np.int64)
    return pa.table({"g": pa.array(g, pa.int64())})


def benchmark_gram_ref(bench_ds, k: int = 8, col: str = "text"):
    """Benchmark suite → ray.put'd SORTED array of its distinct k-gram
    hashes.  BOUNDED-SMALL-SIDE CONTRACT: a benchmark/eval suite is
    thousands of docs — its gram set (≤ tokens count) fits comfortably
    in the object store and is broadcast ONCE (ray.put), never
    re-shipped per batch.  The corpus side streams."""
    import ray

    parts = (bench_ds.map_batches(lambda b: _gram_rows(b, col, k),
                                  batch_format="pyarrow")
             .take_all())
    vals = np.asarray([r["g"] for r in parts], dtype=np.int64)
    return ray.put(np.unique(vals))


def contamination_hits(ds, bench_gram_ref, k: int = 8,
                       col: str = "text", id_col: str = "doc_id"):
    """→ Dataset(doc_id, n_hits): corpus docs sharing ≥ 1 distinct
    k-gram with the benchmark suite, with the count of distinct
    contaminated grams — the standard train/test decontamination sweep
    (n-gram collision against held-out benchmarks).  Pure streaming
    map: the benchmark gram set arrives via the object store
    (zero-copy numpy view in every task), membership is one
    searchsorted per doc.  Hash-collision tolerance is the same
    documented contract as the Jaccard operators (64-bit fold)."""
    import ray

    def f(b: pa.Table) -> pa.Table:
        grams = ray.get(bench_gram_ref)  # local object-store hit
        ids = b.column(id_col)
        id_type = b.schema.field(id_col).type
        out_id, out_n = [], []
        for i, t in zip(ids.to_pylist(), b.column(col).to_pylist()):
            dg = ngram_hashes(t, k)
            if len(dg) == 0 or len(grams) == 0:
                continue
            pos = np.searchsorted(grams, dg)
            pos[pos == len(grams)] = 0
            n = int(np.count_nonzero(grams[pos] == dg))
            if n:
                out_id.append(i)
                out_n.append(n)
        return pa.table({id_col: pa.array(out_id, id_type),
                         "n_hits": pa.array(out_n, pa.int64())})

    return ds.select_columns([id_col, col]).map_batches(
        f, batch_format="pyarrow")


def decontaminate(ds, bench_gram_ref, k: int = 8, col: str = "text",
                  id_col: str = "doc_id"):
    """→ ds minus contaminated docs (full schema preserved), streaming:
    each batch drops its own contaminated rows — no shuffle, no join."""
    import ray

    def f(b: pa.Table) -> pa.Table:
        grams = ray.get(bench_gram_ref)
        keep = []
        for t in b.column(col).to_pylist():
            dg = ngram_hashes(t, k)
            if len(dg) == 0 or len(grams) == 0:
                keep.append(True)
                continue
            pos = np.searchsorted(grams, dg)
            pos[pos == len(grams)] = 0
            keep.append(not bool(np.any(grams[pos] == dg)))
        return b.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(f, batch_format="pyarrow")


def jaccard_dup_pairs(ds, threshold: float = 0.7,
                      col: str = "text", id_col: str = "doc_id"):
    """EXACT n-gram Jaccard similarity self-join → (a, b,
    jaccard_x1000), every pair with Jaccard ≥ threshold, guaranteed
    (prefix-filter candidates have 100% recall — the deterministic
    alternative to :func:`near_dup_pairs`' probabilistic MinHash-LSH;
    use it when a dedup sweep must be provably complete).  No minimum
    shingle-count gate: every doc with ≥ 3 tokens participates.

    Same verified-pair contract as near_dup_pairs: candidates flow to
    :func:`verify_pairs_jaccard` without their own dedup shuffle (the
    verify partition co-locates all copies of a pair).

    Scale envelope (measured, sf1 scale-proof in BASELINE.md): the
    100%-recall prefix filter prunes by shingle df; on flat-df corpora
    (small vocabulary — e.g. synthetic text) candidate volume grows
    ~n² per hot prefix partition and stragglers dominate past ~100k
    docs.  Intended use at scale is exact passes over bounded
    partitions (per LSH bucket, per shard, per domain); whole-corpus
    sweeps belong to :func:`near_dup_pairs`."""
    return verify_pairs_jaccard(
        _prefix_filter_candidates(ds, threshold, col, id_col),
        ds, threshold, col, id_col)


def _ngram_hash_all(h: np.ndarray, k: int) -> np.ndarray:
    """Token-hash array → per-POSITION k-gram hashes (FNV fold; same
    hash as :func:`ngram_hashes` but without the distinct)."""
    m = h.size - k + 1
    if m <= 0:
        return np.empty(0, dtype=np.int64)
    with np.errstate(over="ignore"):
        acc = h[0:m].copy()
        for j in range(1, k):
            acc = acc * _FNV_P ^ h[j:j + m]
    return acc


def _id_pa_type(ds, id_col: str) -> pa.DataType:
    """Input dataset's id column type as a normalized Arrow type (the
    schema-hint currency of :func:`~.joins.hash_join`)."""
    sch = ds.schema()
    return _joins_pa_type(sch.types[sch.names.index(id_col)])


def _substr_gram_doc_fn(col: str, id_col: str, k: int,
                        num_partitions: int, casefold: bool):
    """(gram, doc, pk) DISTINCT rows per doc — the vocabulary side of
    both ExactSubstr operators; ``casefold`` is the ONLY divergence
    between the spans (lowercased stats) and dedup (raw-byte action)
    variants, so it is a parameter, not a copy."""
    def gram_doc_rows(b: pa.Table) -> pa.Table:
        gs, take = [], []
        for i, t in enumerate(b.column(col).to_pylist()):
            t = (t or "")
            toks = _TOKEN_RE.findall(t.lower() if casefold else t)
            g = np.unique(_ngram_hash_all(_token_crc_array(toks), k))
            if g.size:
                gs.append(g)
                take.append(np.full(g.size, i, np.int64))
        if not gs:
            return pa.table({
                "g": pa.array([], pa.int64()),
                id_col: pa.array([], b.schema.field(id_col).type),
                "pk": pa.array([], pa.int32())})
        g = np.concatenate(gs)
        ids = b.column(id_col).take(
            pa.array(np.concatenate(take), pa.int64()))
        t = pa.table({"g": pa.array(g, pa.int64()), id_col: ids})
        return t.append_column(
            "pk", partition_ids([t.column("g")], num_partitions))
    return gram_doc_rows


def _substr_gram_pos_fn(col: str, id_col: str, k: int, casefold: bool):
    """(gram, doc, pos) per-POSITION rows — the join probe side of
    both ExactSubstr operators (same casefold contract as above)."""
    def gram_pos_rows(b: pa.Table) -> pa.Table:
        gs, ps, take = [], [], []
        for i, t in enumerate(b.column(col).to_pylist()):
            t = (t or "")
            toks = _TOKEN_RE.findall(t.lower() if casefold else t)
            g = _ngram_hash_all(_token_crc_array(toks), k)
            if g.size:
                gs.append(g)
                ps.append(np.arange(g.size, dtype=np.int64))
                take.append(np.full(g.size, i, np.int64))
        if not gs:
            return pa.table({
                "g": pa.array([], pa.int64()),
                id_col: pa.array([], b.schema.field(id_col).type),
                "pos": pa.array([], pa.int64())})
        ids = b.column(id_col).take(
            pa.array(np.concatenate(take), pa.int64()))
        return pa.table({
            "g": pa.array(np.concatenate(gs), pa.int64()),
            id_col: ids,
            "pos": pa.array(np.concatenate(ps), pa.int64())})
    return gram_pos_rows


def exact_substring_spans(ds, k: int = 8, col: str = "text",
                          id_col: str = "doc_id",
                          num_partitions: int = 64):
    """ExactSubstr-style duplicated-span detection (the suffix-array
    dedup of Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", re-expressed as k-gram co-location): a
    token position is DUPLICATED when some k-token gram starting
    there also appears in at least one OTHER document.  Every shared
    verbatim span of ≥ k tokens is found exactly — each of its
    length-k windows is a shared gram — without building a suffix
    array.  → Dataset(id, n_dup_positions = gram starts whose gram is
    cross-doc shared, n_covered_tokens = tokens under the union of
    those k-windows, i.e. the total length of the maximal duplicated
    spans); docs with no shared gram don't appear (inner-join twin).

    Scale shape (three bounded exchanges, corpus text never moves):
      1. distinct (gram, doc) rows → groupby(gram-hash partition) →
         grams seen in ≥ 2 docs.  Shuffle ∝ corpus token count;
         per-partition fold is one vectorized value_counts.
      2. per-position (gram, doc, pos) rows semi-joined against the
         dup-gram table on gram — re-tokenizing here is deliberate:
         cheaper than carrying every position through exchange 1.
      3. surviving (doc, pos) rows — bounded by the DUPLICATED
         volume, not the corpus — fold per doc-hash partition into
         interval-union lengths (sorted-diff, vectorized).
    Hashes are the same crc32+FNV fold as :func:`ngram_hashes`
    (collision odds documented there); the SQL twin joins on gram
    STRINGS."""
    from .joins import hash_join

    id_type = _id_pa_type(ds, id_col)

    def dup_fold(g: pd.DataFrame) -> pd.DataFrame:
        # rows are distinct per (g, doc) ⇒ size == distinct-doc count
        sizes = g["g"].value_counts()
        return pd.DataFrame({"g": sizes.index[sizes >= 2].to_numpy()})

    dup = (ds.map_batches(
               _substr_gram_doc_fn(col, id_col, k, num_partitions,
                                   casefold=True),
               batch_format="pyarrow")
           .groupby("pk").map_groups(arrow_clean(dup_fold),
                                     batch_format="pandas"))

    # static schema hints: the dup side is a map_groups output whose
    # fetch-by-execution schema probe would RUN the whole gram-count
    # shuffle a second time (and return None on a legitimately empty
    # result — a corpus with no ≥k-token doc must yield empty, not
    # crash)
    hits = hash_join(
        ds.map_batches(
            _substr_gram_pos_fn(col, id_col, k, casefold=True),
            batch_format="pyarrow"),
        dup, on="g", how="semi",
        num_partitions=num_partitions,
        left_schema=pa.schema([("g", pa.int64()), (id_col, id_type),
                               ("pos", pa.int64())]),
        right_schema=pa.schema([("g", pa.int64())])
    ).drop_columns(["g"])

    def add_dk(b: pa.Table) -> pa.Table:
        return b.append_column(
            "dk", partition_ids([b.column(id_col)], num_partitions))

    def cover_fold(g: pd.DataFrame) -> pd.DataFrame:
        g2 = g.sort_values([id_col, "pos"], kind="stable")
        ids = g2[id_col].to_numpy()
        pos = g2["pos"].to_numpy()
        d = np.empty(len(pos), dtype=np.int64)
        if len(pos):
            d[0] = k
            np.minimum(pos[1:] - pos[:-1], k, out=d[1:])
            d[np.r_[True, ids[1:] != ids[:-1]]] = k
        out = (pd.DataFrame({id_col: ids, "c": d})
               .groupby(id_col, sort=False)["c"]
               .agg(n_dup_positions="size", n_covered_tokens="sum")
               .reset_index())
        return out

    return (hits.map_batches(add_dk, batch_format="pyarrow")
            .groupby("dk").map_groups(arrow_clean(cover_fold),
                                      batch_format="pandas"))


def exact_substring_dedup(ds, k: int = 8, col: str = "text",
                          id_col: str = "doc_id",
                          num_partitions: int = 64):
    """The ExactSubstr dedup ACTION (Lee et al. 2022): remove every
    duplicated ≥k-token span from all but its first occurrence.
    Keep-first rule, position-local and deterministic: token position
    p of doc d is dropped iff some k-gram window covering p also
    appears in a document with a SMALLER id — so exactly one copy
    (the min-id doc's) of every shared span survives corpus-wide.
    Tokens are case-SENSITIVE original tokens (the paper dedups raw
    bytes; the spans operator's lowercased stats are a different
    surface).  → Dataset(id, text) for CHANGED docs only, text =
    kept tokens joined by single spaces (token-normalized — a
    rewritten doc has no original whitespace to preserve); docs whose
    every token is covered vanish (nothing left to emit).

    Scale shape: same three bounded exchanges as
    :func:`exact_substring_spans` (per-gram min-id fold instead of
    the ≥2-distinct filter; grams seen in one doc only are dropped
    before the join — they can never produce a hit), then ONE
    id-keyed join of the packed hit-start lists against the corpus —
    the only stage that moves document text, bounded by the CHANGED
    doc set."""
    from .joins import hash_join

    id_type = _id_pa_type(ds, id_col)

    def min_fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby("g", sort=False)[id_col]
               .agg(m="min", nd="size").reset_index())
        # single-doc grams can never satisfy doc > min(doc): drop
        # them here so the position join ships only actionable grams
        agg = agg.loc[agg["nd"] >= 2, ["g", "m"]]
        return agg

    mn = (ds.map_batches(
              _substr_gram_doc_fn(col, id_col, k, num_partitions,
                                  casefold=False),
              batch_format="pyarrow")
          .groupby("pk").map_groups(arrow_clean(min_fold),
                                    batch_format="pandas"))

    # static schema hints: see exact_substring_spans — without them
    # the mn side's plan-time schema probe re-runs the min_fold
    # shuffle and crashes on an all-short corpus
    joined = hash_join(
        ds.map_batches(
            _substr_gram_pos_fn(col, id_col, k, casefold=False),
            batch_format="pyarrow"),
        mn, on="g", num_partitions=num_partitions,
        left_schema=pa.schema([("g", pa.int64()), (id_col, id_type),
                               ("pos", pa.int64())]),
        right_schema=pa.schema([("g", pa.int64()), ("m", id_type)]))

    def later_copies(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.greater(b.column(id_col), b.column("m"))
        out = b.filter(keep).select([id_col, "pos"])
        return out.append_column(
            "dk", partition_ids([out.column(id_col)], num_partitions))

    def pack_starts(g: pd.DataFrame) -> pa.Table:
        g2 = g.sort_values([id_col, "pos"], kind="stable")
        ids = g2[id_col].to_numpy()
        pos = g2["pos"].to_numpy()
        uniq, first = np.unique(ids, return_index=True)
        # int64-LE blobs, not list<int64>: Acero hash joins reject
        # nested payload types, binary rides through untouched
        return pa.table({
            id_col: pa.array(uniq),
            "starts": pa.array(
                [s.astype("<i8").tobytes()
                 for s in np.split(pos, first[1:])],
                pa.binary())})

    packed = (joined.map_batches(later_copies, batch_format="pyarrow")
              .groupby("dk").map_groups(arrow_clean(pack_starts),
                                        batch_format="pandas"))

    docs_joined = hash_join(
        ds.select_columns([id_col, col]), packed,
        on=id_col, num_partitions=num_partitions,
        right_schema=pa.schema([(id_col, id_type),
                                ("starts", pa.binary())]))

    def rebuild(b: pa.Table) -> pa.Table:
        ids_out, texts_out = [], []
        starts_col = b.column("starts").to_pylist()
        ids_col = b.column(id_col).to_pylist()
        for i, t in enumerate(b.column(col).to_pylist()):
            toks = _TOKEN_RE.findall(t or "")
            n = len(toks)
            diff = np.zeros(n + 1, dtype=np.int64)
            s = np.frombuffer(starts_col[i], dtype="<i8")
            np.add.at(diff, s, 1)
            np.add.at(diff, np.minimum(s + k, n), -1)
            covered = np.cumsum(diff[:n]) > 0
            kept = [tok for tok, c in zip(toks, covered) if not c]
            if kept:
                ids_out.append(ids_col[i])
                texts_out.append(" ".join(kept))
        return pa.table({
            id_col: pa.array(ids_out, b.schema.field(id_col).type),
            col: pa.array(texts_out, pa.string())})

    return docs_joined.map_batches(rebuild, batch_format="pyarrow")


def near_dup_keep_best(ds, threshold: float = 0.8, col: str = "text",
                       id_col: str = "doc_id"):
    """Quality-aware cluster representative election — the keep-one
    step of a FineWeb-style dedup sweep, but keeping the RICHEST
    member (longest text; ties → smallest id) instead of an arbitrary
    min-id: near-dup pairs → connected components → per-cluster
    argmax.  → Dataset(cluster_id, kept_doc_id, n_members).

    Scale shape: only the pair GRAPH and one (id, n_chars) row per
    clustered doc shuffle — the length column is computed with one
    vectorized ``utf8_length`` over a pruned read, joined to the
    component table on id, and elected with one cluster-keyed fold;
    corpus text never moves beyond the shingling already inside
    :func:`near_dup_pairs`."""
    import pyarrow.compute as pc

    from .joins import hash_join

    id_type = _id_pa_type(ds, id_col)
    pairs = near_dup_pairs(ds, threshold, col, id_col)
    comps = dedup_connected_components(pairs)

    def lens(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b.column(id_col),
            "n_chars": pc.utf8_length(b.column(col)).cast(pa.int64())})

    # static hints: comps is the tail of the whole pairs→CC chain —
    # a plan-time schema probe would re-run it end to end
    j = hash_join(comps,
                  ds.select_columns([id_col, col])
                    .map_batches(lens, batch_format="pyarrow"),
                  on="doc_id", right_on=id_col,
                  left_schema=pa.schema([("doc_id", id_type),
                                         ("cluster_id", id_type)]),
                  right_schema=pa.schema([(id_col, id_type),
                                          ("n_chars", pa.int64())]))

    def add_ck(b: pa.Table) -> pa.Table:
        return b.append_column(
            "ck", partition_ids([b.column("cluster_id")], 64))

    def elect_fold(g: pd.DataFrame) -> pd.DataFrame:
        # whole hash partition at once: sort puts each cluster's
        # (longest, then smallest-id) member first; one drop_duplicates
        # elects every cluster in the partition — never a Python call
        # per cluster (the per-key map_groups anti-pattern)
        g2 = g.sort_values(["cluster_id", "n_chars", "doc_id"],
                           ascending=[True, False, True],
                           kind="stable")
        sizes = g2.groupby("cluster_id", sort=False).size()
        first = g2.drop_duplicates("cluster_id")
        return pd.DataFrame({
            "cluster_id": first["cluster_id"].to_numpy(),
            "kept_doc_id": first["doc_id"].to_numpy(),
            "n_members": sizes.loc[first["cluster_id"]].to_numpy()})

    return (j.map_batches(add_ck, batch_format="pyarrow")
            .groupby("ck").map_groups(arrow_clean(elect_fold),
                                      batch_format="pandas"))


#: Pair graphs at or below this many (directed) edges are solved with
#: one driver-side union-find instead of the distributed loop: ONE
#: Ray sort-shuffle round costs more wall-clock than scanning 2M edges
#: locally (measured 21 s/round at 32 CPUs for a 50-edge graph), and
#: 2M edges ≈ tens of MB — the same bounded-small-side contract as a
#: broadcast join.  Above it, the distributed min-label loop runs.
LOCAL_CC_MAX_EDGES = 2_000_000


def _local_union_find(edges_tbl: pa.Table):
    """(s, t) edge table → (doc_id, cluster_id=min id in component),
    driver-side.  Type-agnostic (int or string ids)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:   # path compression
            parent[x], x = root, parent[x]
        return root

    ss = edges_tbl.column("s").to_pylist()
    ts = edges_tbl.column("t").to_pylist()
    for a, b in zip(ss, ts):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    roots = {x: find(x) for x in parent}
    cluster_min: dict = {}
    for x, r in roots.items():
        m = cluster_min.get(r)
        if m is None or x < m:
            cluster_min[r] = x
    ids = sorted(roots)
    id_type = edges_tbl.schema.field("s").type
    return pa.table({
        "doc_id": pa.array(ids, id_type),
        "cluster_id": pa.array([cluster_min[roots[i]] for i in ids],
                               id_type),
    })


def dedup_connected_components(pairs_ds, num_partitions: int = 8,
                               max_iters: int = 50,
                               local_max_edges: int = LOCAL_CC_MAX_EDGES):
    """Near-dup PAIRS → duplicate CLUSTERS — the step a real corpus
    dedup ends with (keep ``min(cluster)``, drop the rest).

    Distributed min-label propagation (the connected-components shape
    of GraphX/Pregel, expressed in Ray Data): every round shuffles
    only the pair GRAPH (bounded by the dup rate, never the corpus) —
    messages = edges ⋈ labels (hash join on the edge target) →
    ``groupby(node).min``.  Works for int AND string ids (min = the
    lexicographically smallest url); the fixed point is detected by a
    type-agnostic crc32 checksum over (id, lab) assignments (labels
    only decrease, so an unchanged checksum ⇒ converged).  Rounds
    needed = graph diameter (near-dup clusters are shallow).
    → Dataset(doc_id, cluster_id = min id in the component);
    singleton docs don't appear (no pairs → no cluster), matching the
    SQL twin.
    """
    import ray
    from ray.data.aggregate import Count, Min, Sum

    cpus = int(ray.cluster_resources().get("CPU", 4)) \
        if ray.is_initialized() else 4
    nparts = max(2, min(num_partitions, cpus))

    def to_edges(b: pa.Table) -> pa.Table:
        a = b.column("a").combine_chunks()
        bb = b.column("b").combine_chunks()
        return pa.table({"s": pa.concat_arrays([a, bb]),
                         "t": pa.concat_arrays([bb, a])})

    edges = (pairs_ds.select_columns(["a", "b"])
             .map_batches(to_edges, batch_format="pyarrow")
             .materialize())

    if edges.count() <= local_max_edges:
        # small-graph fast path: see LOCAL_CC_MAX_EDGES
        import ray.data as rd

        tbls = [t for t in ray.get(edges.to_arrow_refs())
                if t.num_rows]
        if not tbls:
            # typed empty from the INPUT's id type (string-id graphs
            # must not emit an int64-schema empty that mismatches
            # non-empty runs for union/join consumers)
            sch = pairs_ds.schema()
            id_type = sch.types[sch.names.index("a")]
            if not isinstance(id_type, pa.DataType):
                from .joins import _pa_type
                id_type = _pa_type(id_type)
            return rd.from_arrow(pa.table({
                "doc_id": pa.array([], id_type),
                "cluster_id": pa.array([], id_type)}))
        return rd.from_arrow(
            _local_union_find(pa.concat_tables(tbls)))

    nodes = (edges.groupby("s")
             .aggregate(Count(alias_name="_n")).drop_columns(["_n"]))
    labels = nodes.map_batches(
        lambda b: pa.table({"id": b.column("s"), "lab": b.column("s")}),
        batch_format="pyarrow").materialize()

    def checksum_part(b: pa.Table) -> pa.Table:
        s = 0
        for i, l in zip(b.column("id").to_pylist(),
                        b.column("lab").to_pylist()):
            s += zlib.crc32(f"{i}|{l}".encode())
        return pa.table({"s": pa.array([s], pa.int64())})

    from .joins import hash_join

    prev_sum = None
    converged = False
    for _ in range(max_iters):
        # union+groupby hash join — NOT Dataset.join: the pair graph
        # comes out of map_groups shuffles whose empty partitions are
        # schemaless zero-column blocks, which break the pyarrow join
        # aggregator (r2 crash at num_cpus=32 / sf0.01)
        msgs = hash_join(edges, labels, on="t", right_on="id",
                         how="inner", num_partitions=nparts)
        cand = msgs.map_batches(
            lambda b: pa.table({"id": b.column("s"),
                                "lab": b.column("lab")}),
            batch_format="pyarrow")
        labels = (cand.union(labels)
                  .groupby("id", num_partitions=nparts)
                  .aggregate(Min("lab", alias_name="lab"))
                  .materialize())
        cur = (labels.map_batches(checksum_part,
                                  batch_format="pyarrow")
               .aggregate(Sum("s", alias_name="s"))["s"])
        if cur == prev_sum:
            converged = True
            break
        prev_sum = cur

    if not converged:
        # no silent caps: a graph with diameter > max_iters (chained
        # document revisions) would otherwise yield split clusters
        # with no signal
        import logging

        logging.getLogger("arabic_ocr_ray").warning(
            "dedup_connected_components: label propagation did not "
            "reach a fixed point within max_iters=%d rounds — "
            "clusters may be split; raise max_iters", max_iters)

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b.column("id"),
                            "cluster_id": b.column("lab")}),
        batch_format="pyarrow")


# --- SimHash --------------------------------------------------------------
#
# Token hash = first 8 bytes (big-endian) of md5(token) — chosen over
# blake2b because DuckDB's ``md5()`` makes the whole sketch
# SQL-replicable, turning simhash_dup_pairs into a hash-verified oracle
# row (pigeonhole makes 4×16-bit banding EXACT for hamming ≤ 3, so the
# engine and the all-pairs SQL agree deterministically).
#
# The per-token Python loop of r1 (89 s / 360k docs) is replaced by a
# batch pipeline: tokens of the whole batch → np.unique → md5 only for
# unique tokens missing from a process-level cache (Zipf ⇒ high hit
# rate) → one gather + np.add.reduceat fold per batch.

_SHIFTS64 = np.arange(64, dtype=np.uint64)

#: process-level token → ±1-bit-row cache (worker processes are reused
#: across tasks; correctness never depends on it).  ``_TOKEN_MAT`` is a
#: preallocated arena grown geometrically — the r3 implementation
#: ``np.concatenate``d the full matrix on every batch that introduced a
#: new token, an O(vocab²)-bytes cold-start (39.7 s cold vs 20.5 s warm
#: in BASELINE.md); amortized-O(1) growth removes it.
_TOKEN_BITS: dict[str, int] = {}
_TOKEN_MAT = np.empty((0, 64), dtype=np.int8)
_TOKEN_N = 0
_TOKEN_CACHE_CAP = 1 << 20


def _md5_u64(tokens: list) -> np.ndarray:
    """md5(token)[:8] big-endian per token → (n,) uint64, one
    digest-concat + ``np.frombuffer`` pass (no per-token int.from_bytes)."""
    md5 = hashlib.md5
    buf = b"".join([md5(t.encode()).digest() for t in tokens])
    return (np.frombuffer(buf, dtype=np.uint8).reshape(-1, 16)[:, :8]
            .copy().view(">u8").ravel().astype(np.uint64))


def _bit_rows(hs: np.ndarray) -> np.ndarray:
    """(n,) uint64 hashes → (n, 64) int8 ±1 rows."""
    bits = ((hs[:, None] >> _SHIFTS64[None, :]) & np.uint64(1))
    return (2 * bits.astype(np.int8) - 1)


def simhash_many(texts: list) -> np.ndarray:
    """Vectorized simhash for a batch → (n,) uint64.

    Token ids come straight from the process-level cache dict (one
    ``dict.get`` per occurrence) — the r3 path materialized every
    occurrence as a Python string array and ``np.unique``d it, whose
    object-dtype argsort was ~40 % of the stage's core-seconds.  Only
    genuinely NEW tokens pay md5 (batched digest-concat)."""
    global _TOKEN_MAT, _TOKEN_N
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    tb_get = _TOKEN_BITS.get
    findall = _TOKEN_RE.findall
    ids_list: list[int] = []
    app = ids_list.append
    bounds = np.empty(n + 1, dtype=np.int64)
    bounds[0] = 0
    miss: dict[str, int] = {}
    m_get = miss.get
    total = 0
    for di, t in enumerate(texts):
        toks = findall((t or "").lower())
        total += len(toks)
        bounds[di + 1] = total
        for tok in toks:
            i = tb_get(tok)
            if i is None:
                i = m_get(tok)
                if i is None:  # provisional negative id
                    i = miss[tok] = -len(miss) - 1
            app(i)
    if total == 0:
        return out
    ids = np.array(ids_list, dtype=np.int64)
    if miss:
        mtoks = list(miss.keys())
        rows_miss = _bit_rows(_md5_u64(mtoks))
        if _TOKEN_N + len(mtoks) <= _TOKEN_CACHE_CAP:
            need = _TOKEN_N + len(mtoks)
            # a non-writeable matrix is treated like an undersized
            # one: when the package is registered pickle-by-VALUE
            # (the __ray_entry__ driver contract), a warm DRIVER
            # cache ships with the UDF and Ray's zero-copy numpy
            # deserialization hands the worker a READ-ONLY array —
            # inserting in place raised ValueError until the first
            # growth, killing the whole simhash stage
            if (need > len(_TOKEN_MAT)
                    or not _TOKEN_MAT.flags.writeable):
                # geometric growth — the r3
                # full-matrix np.concatenate per batch was an
                # O(vocab²)-bytes cold start (39.7 vs 20.5 s warm)
                grown = np.empty(
                    (max(need, 2 * len(_TOKEN_MAT), 4096), 64),
                    dtype=np.int8)
                grown[:_TOKEN_N] = _TOKEN_MAT[:_TOKEN_N]
                _TOKEN_MAT = grown
            _TOKEN_MAT[_TOKEN_N:need] = rows_miss
            _TOKEN_BITS.update(zip(mtoks, range(_TOKEN_N, need)))
            _TOKEN_N = need
            M = _TOKEN_MAT[:_TOKEN_N]
        else:  # cache full: serve without inserting
            M = (np.concatenate([_TOKEN_MAT[:_TOKEN_N], rows_miss])
                 if _TOKEN_N else rows_miss)
        # provisional -k-1 → _TOKEN_N_before + k (= M row index)
        base = M.shape[0] - len(mtoks)
        neg = ids < 0
        ids[neg] = base + (-ids[neg] - 1)
    else:
        M = _TOKEN_MAT[:_TOKEN_N]
    lens = np.diff(bounds)
    nz = lens > 0
    # collapse repeated (doc, token) occurrences to counts first —
    # stopword repetition roughly halves the expensive add pass —
    # then one weighted cumsum-diff segmented sum (np.add.reduceat on
    # the per-occurrence matrix measured ~10× slower)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    stride = np.int64(M.shape[0] if M.shape[0] else 1)
    ukey, ucount = np.unique(doc_idx * stride + ids,
                             return_counts=True)
    rows = (M[ukey % stride].astype(np.int32)
            * ucount[:, None].astype(np.int32))   # (D, 64)
    udoc = ukey // stride
    # per-doc segment boundaries inside the sorted (doc, token) rows
    seg_starts = np.searchsorted(udoc, np.arange(n))
    seg_ends = np.searchsorted(udoc, np.arange(n) + 1)
    csum = np.zeros((len(rows) + 1, 64), dtype=np.int32)
    np.cumsum(rows, axis=0, dtype=np.int32, out=csum[1:])
    acc = csum[seg_ends[nz]] - csum[seg_starts[nz]]
    bits = (acc > 0).astype(np.uint64)             # tie (0) → bit 0
    out[nz] = (bits << _SHIFTS64[None, :]).sum(axis=1, dtype=np.uint64)
    return out


def simhash64(text: str) -> int:
    """Single-doc surface (tests / notebooks); same definition as
    :func:`simhash_many`."""
    return int(simhash_many([text])[0])


def simhash_batch(batch: pa.Table, col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    texts = batch.column(col).to_pylist()
    hs = simhash_many(texts)
    cols = {id_col: batch.column(id_col),
            "simhash": pa.array(hs.view(np.int64))}
    # 4 × 16-bit bands for hamming-LSH (≤3 differing bits ⇒ at least
    # one identical band, pigeonhole)
    for band in range(4):
        cols[f"sh_band{band}"] = pa.array(
            ((hs >> np.uint64(16 * band)) & np.uint64(0xFFFF))
            .astype(np.int32), pa.int32())
    return pa.table(cols)


def simhash_dup_pairs(ds, max_hamming: int = 3,
                      col: str = "text", id_col: str = "doc_id"):
    """→ Dataset(a, b, hamming) with hamming ≤ max_hamming.

    Same fixed-partition shape as :func:`minhash_candidates`: each doc
    emits 4 (band_idx, band_val, id, simhash) rows; rows are
    hash-partitioned on the band key and every partition resolves its
    buckets with ONE vectorized self-merge + numpy popcount — never a
    python call per bucket (16-bit bands make ~65k mostly-singleton
    buckets per band at corpus scale).

    Global pair dedup (a pair collides in one bucket per AGREEING
    band) is done WITHOUT a shuffle (r3; the r2 ppk groupby over the
    ~4M discovery rows plus a per-pair python crc32 loop dominated the
    360k-doc sweep): every discovery carries its ``band_idx`` and the
    pair's simhash, each partition also reports its over-MAX_BUCKET
    (band, val) buckets, and a final broadcast filter keeps a
    discovery iff its band is the pair's MINIMUM agreeing band whose
    bucket is uncapped — exactly one survivor per pair, and identical
    pair coverage to scanning every uncapped bucket."""
    sh = ds.map_batches(lambda b: simhash_batch(b, col, id_col),
                        batch_format="pyarrow")

    def explode(b: pa.Table) -> pa.Table:
        n = b.num_rows
        ids = b.column(id_col).combine_chunks()
        hashes = b.column("simhash").combine_chunks()
        bval = np.concatenate([
            np.asarray(b.column(f"sh_band{band}"), dtype=np.int64)
            for band in range(4)])
        bidx = np.repeat(np.arange(4, dtype=np.int64), n)
        pk = (bval * 4 + bidx) % _PAIR_PARTITIONS
        return pa.table({
            id_col: pa.concat_arrays([ids] * 4),
            "band_idx": pa.array(bidx.astype(np.int32)),
            "band_val": pa.array(bval.astype(np.int32)),
            "simhash": pa.concat_arrays([hashes] * 4),
            "pk": pa.array(pk.astype(np.int32)),
        })

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        key = ["band_idx", "band_val"]
        sizes = g.groupby(key)[id_col].transform("size")
        _log_capped(g, sizes, MAX_BUCKET, "simhash_dup_pairs")
        g2 = g.loc[(sizes >= 2) & (sizes <= MAX_BUCKET)]
        if g2.empty:
            out = pd.DataFrame({
                "a": g2[id_col], "b": g2[id_col],
                "hamming": pd.Series(dtype="int64"),
                "band_idx": pd.Series(dtype="int64"),
                "hx": pd.Series(dtype="int64"),
                "hy": pd.Series(dtype="int64")})
            over = g.loc[sizes > MAX_BUCKET, key].drop_duplicates()
            if len(over):
                ph = g[id_col].iloc[0]
                out = pd.concat([out, pd.DataFrame({
                    "a": pd.Series([ph] * len(over),
                                   dtype=g[id_col].dtype),
                    "b": pd.Series([ph] * len(over),
                                   dtype=g[id_col].dtype),
                    "hamming": np.full(len(over), -1, dtype=np.int64),
                    "band_idx": over["band_idx"].to_numpy()
                    .astype(np.int64),
                    "hx": over["band_val"].to_numpy()
                    .astype(np.int64),
                    "hy": np.zeros(len(over), dtype=np.int64),
                })], ignore_index=True)
            return out
        m = g2.merge(g2, on=key, suffixes=("_x", "_y"))
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        hx = m[f"simhash_x"].to_numpy().astype(np.uint64)
        hy = m[f"simhash_y"].to_numpy().astype(np.uint64)
        xor = hx ^ hy
        bits = xor.view(np.uint8).reshape(-1, 8)
        ham = np.unpackbits(bits, axis=1).sum(axis=1).astype(np.int64)
        keep = ham <= max_hamming
        out = pd.DataFrame({
            "a": m[f"{id_col}_x"].to_numpy()[keep],
            "b": m[f"{id_col}_y"].to_numpy()[keep],
            "hamming": ham[keep],
            "band_idx": m["band_idx"].to_numpy()[keep],
            "hx": hx[keep].astype(np.int64),
            "hy": hy[keep].astype(np.int64),
        }).drop_duplicates(["a", "b"])
        # capped-bucket report rows (band_idx keeps the band, hx the
        # band value, hamming = -1 marks the kind)
        over = g.loc[sizes > MAX_BUCKET, key].drop_duplicates()
        if len(over):
            ph = g[id_col].iloc[0]  # dtype-correct placeholder id
            out = pd.concat([out, pd.DataFrame({
                "a": pd.Series([ph] * len(over),
                               dtype=g[id_col].dtype),
                "b": pd.Series([ph] * len(over),
                               dtype=g[id_col].dtype),
                "hamming": np.full(len(over), -1, dtype=np.int64),
                "band_idx": over["band_idx"].to_numpy()
                .astype(np.int64),
                "hx": over["band_val"].to_numpy().astype(np.int64),
                "hy": np.zeros(len(over), dtype=np.int64),
            })], ignore_index=True)
        return out

    disc = (sh.map_batches(explode, batch_format="pyarrow")
            .groupby("pk").map_groups(arrow_clean(pairs_part),
                                      batch_format="pandas")
            .materialize())

    # tiny: the over-cap (band, val) buckets (logged above)
    import ray

    def capped_rows(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = b.filter(pc.equal(b.column("hamming"), -1))
        return t.select(["band_idx", "hx"])

    capped_tbl = (disc.map_batches(capped_rows, batch_format="pyarrow")
                  .take_all())
    capped = {(int(r["band_idx"]), int(r["hx"]) & 0xFFFF)
              for r in capped_tbl}
    capped_ref = ray.put(capped)

    def final_filter(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.greater_equal(b.column("hamming"), 0))
        if b.num_rows == 0:
            return b.select(["a", "b", "hamming"])
        cp = ray.get(capped_ref)
        cp_by_band = {band: np.array(sorted(v for bb, v in cp
                                            if bb == band),
                                     dtype=np.int64)
                      for band in range(4)}
        hx = np.asarray(b.column("hx"), dtype=np.int64).astype(np.uint64)
        hy = np.asarray(b.column("hy"), dtype=np.int64).astype(np.uint64)
        band_idx = np.asarray(b.column("band_idx"), dtype=np.int64)
        xor = hx ^ hy
        # min agreeing band whose bucket is uncapped
        min_band = np.full(len(xor), -1, dtype=np.int64)
        for band in (3, 2, 1, 0):
            win = ((xor >> np.uint64(16 * band))
                   & np.uint64(0xFFFF)) == 0
            cvals = cp_by_band[band]
            if len(cvals):
                vals = ((hx >> np.uint64(16 * band))
                        & np.uint64(0xFFFF)).astype(np.int64)
                win = win & ~np.isin(vals, cvals)
            min_band = np.where(win, band, min_band)
        return b.filter(pa.array(band_idx == min_band)).select(
            ["a", "b", "hamming"])

    return disc.map_batches(final_filter, batch_format="pyarrow")


# --- embedding near-dup ---------------------------------------------------


def _mix_pair_keys(a_col, b_col, mod: int) -> np.ndarray:
    """(a, b) int64 pair → stable partition key, vectorized (no
    per-pair python hash loop).  64-bit multiply-xor mix of both ids;
    numpy ``%`` follows python sign semantics so the result is always
    in [0, mod)."""
    a = np.asarray(a_col, dtype=np.int64)
    bb = np.asarray(b_col, dtype=np.int64)
    with np.errstate(over="ignore"):
        h = ((a * np.int64(-7046029254386353131))
             ^ (bb * np.int64(0x9E3779B97F4A7C15 - (1 << 64))))
    return ((h >> np.int64(32)) % mod).astype(np.int32)


def embedding_near_dup_pairs(ds, threshold: float = 0.95, dim: int = 64,
                             n_planes: int = 8, n_tables: int = 4,
                             id_col: str = "vec_id",
                             col: str = "embedding",
                             max_bucket: int = 4096,
                             gather: bool = False):
    """Sign-LSH buckets + cosine verify → Dataset(a, b, cos_x1000).

    Recall math: a cosine-0.95 pair disagrees on one hyperplane with
    p = arccos(0.95)/π ≈ 0.10, so one 8-plane table catches it with
    0.9^8 ≈ 0.43; 4 independent tables (seeded 0xC05+t) lift that to
    ≈ 0.9.  Each doc emits n_tables (table, bucket) rows; the shuffle
    key is (table, bucket).

    ``gather`` picks which payload crosses the LSH shuffle:

    * ``False`` (default): each row carries its embedding into the
      bucket shuffle — vectors are replicated ``n_tables``× through
      the all-to-all, verify is free inside the bucket group.  Right
      at fixture scale and whenever embedding_bytes × n_tables is
      cheap relative to a second shuffle's latency.
    * ``True``: only (id, table, bucket) rows cross the LSH shuffle
      (8–24 bytes/row instead of the embedding); co-bucket candidate
      PAIRS come back id-only, and vectors are then gathered to
      verify partitions via the same semi-join shape as
      :func:`verify_pairs_jaccard` — each needed vector ships ONCE
      per verify partition, bounded by 2 × candidate pairs, never
      ``n_tables`` × corpus.

    Crossover rule (measured, see BASELINE.md r3): default moves
    ``n_tables × payload`` bytes per vector; gather moves
    ``~24 × n_tables`` bytes per vector PLUS ``≤ 2 × payload`` bytes
    per CANDIDATE pair — so gather wins iff candidate pairs ≪
    ``n_vectors × n_tables / 2``, i.e. when bucket occupancy is O(1)
    (``n_planes ≳ log2(n)``) and candidates are dominated by true
    duplicates.  At dense-bucket geometry the candidate set explodes
    quadratically per bucket and IN-BUCKET is strictly better: it
    verifies co-bucketed pairs as one in-place matmul, moving
    nothing (408k×256-dim gaussians @ 8 planes: in-bucket 40.5 s,
    gather emitted ~1e9 candidate rows — unusable).  Size
    ``n_planes`` with the corpus before choosing gather."""
    planes = [np.random.RandomState(0xC05 + t).randn(n_planes, dim)
              for t in range(n_tables)]

    if gather:
        cand = _embedding_lsh_candidates(ds, planes, id_col, col,
                                         max_bucket)
        return verify_pairs_cosine(cand, ds, threshold, col=col,
                                   id_col=id_col)

    def bucketize(batch: pa.Table) -> pa.Table:
        # zero-copy Arrow child buffer → matrix (no Python list
        # round-trip; r2's main per-batch overhead in vector ops)
        from .ann import vectors_matrix

        E = vectors_matrix(batch.column(col))
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        En = E / norms
        n = batch.num_rows
        id_arr = batch.column(id_col).combine_chunks()
        emb_arr = batch.column(col).combine_chunks()
        buckets = np.empty((n_tables, n), dtype=np.int64)
        for t, P in enumerate(planes):
            sig = (En @ P.T > 0).astype(np.int64)
            buckets[t] = (sig * (1 << np.arange(n_planes))).sum(axis=1)
        tables = np.repeat(np.arange(n_tables, dtype=np.int64), n)
        flat_b = buckets.reshape(-1)
        pk = (flat_b * n_tables + tables) % _PAIR_PARTITIONS
        return pa.table({
            id_col: pa.concat_arrays([id_arr] * n_tables),
            "table": pa.array(tables.astype(np.int32)),
            "bucket": pa.array(flat_b, pa.int64()),
            col: pa.concat_arrays([emb_arr] * n_tables),
            "pk": pa.array(pk.astype(np.int32)),
        })

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        """One fixed hash partition of (table, bucket) rows — NOT one
        python call per bucket.  Size-filter first (mostly singletons),
        cap pathological buckets at ``max_bucket`` (a degenerate
        all-equal-sign bucket is otherwise O(n²) in the table size),
        then one vectorized upper-triangle cosine per surviving bucket.

        ``max_bucket`` must stay ≫ n_vectors / 2^n_planes (the MEAN
        bucket): a cap at the text-LSH level (200) silently skipped
        every bucket of a 100k-vector table and cut recall to ~10% —
        capped buckets are LOGGED, never silently dropped."""
        key = ["table", "bucket"]
        sizes = g.groupby(key)[id_col].transform("size")
        over = g.loc[sizes > max_bucket, key].drop_duplicates()
        if len(over):
            import logging

            logging.getLogger("arabic_ocr_ray").warning(
                "embedding_near_dup: %d bucket(s) over max_bucket=%d "
                "skipped (largest=%d) — raise max_bucket or n_planes",
                len(over), max_bucket, int(sizes.max()))
        g2 = g.loc[(sizes >= 2) & (sizes <= max_bucket)]
        out_a: list = []
        out_b: list = []
        out_c: list = []
        for _, gb in g2.groupby(key, sort=False):
            E = np.array(list(gb[col]), dtype=np.float64)
            norms = np.linalg.norm(E, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            En = E / norms
            S = En @ En.T
            iu = np.triu_indices(len(gb), 1)
            vals = S[iu]
            m = vals >= threshold
            if not m.any():
                continue
            ids = gb[id_col].to_numpy()
            x, y = ids[iu[0][m]], ids[iu[1][m]]
            out_a.extend(np.minimum(x, y).tolist())
            out_b.extend(np.maximum(x, y).tolist())
            out_c.extend(
                np.round(vals[m] * 1000).astype(np.int64).tolist())
        return pd.DataFrame({
            "a": pd.Series(out_a, dtype="int64"),
            "b": pd.Series(out_b, dtype="int64"),
            "cos_x1000": pd.Series(out_c, dtype="int64"),
        })

    cand = (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("pk").map_groups(arrow_clean(pairs_part),
                                      batch_format="pandas"))

    # a pair surfaces once per agreeing table → fixed-partition global
    # distinct (same shape as minhash_candidates, no per-pair dispatch);
    # vec ids are int64 so the pair key is a vectorized integer mix,
    # not a per-pair python crc32 loop
    def add_ppk(b: pa.Table) -> pa.Table:
        pk = _mix_pair_keys(b.column("a"), b.column("b"), 32)
        return b.append_column("ppk", pa.array(pk))

    return (cand.map_batches(add_ppk, batch_format="pyarrow")
            .groupby("ppk")
            .map_groups(arrow_clean(
                lambda g: g.drop_duplicates(["a", "b"])[
                    ["a", "b", "cos_x1000"]]),
                batch_format="pandas"))


def _embedding_lsh_candidates(ds, planes, id_col: str, col: str,
                              max_bucket: int):
    """Id-only sign-LSH candidate pairs: the bucket shuffle carries
    (id, table, bucket, pk) rows — never the embedding payload.
    Returns Dataset(a, b) with a < b; a pair may surface once per
    agreeing table (copies share the verify partition key downstream,
    so the verify group's dedup is free — same contract as
    ``minhash_candidates(distinct=False)``)."""
    n_tables = len(planes)
    n_planes = planes[0].shape[0]

    def bucketize_ids(batch: pa.Table) -> pa.Table:
        from .ann import vectors_matrix

        E = vectors_matrix(batch.column(col))
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        En = E / norms
        n = batch.num_rows
        id_arr = batch.column(id_col).combine_chunks()
        buckets = np.empty((n_tables, n), dtype=np.int64)
        for t, P in enumerate(planes):
            sig = (En @ P.T > 0).astype(np.int64)
            buckets[t] = (sig * (1 << np.arange(n_planes))).sum(axis=1)
        tables = np.repeat(np.arange(n_tables, dtype=np.int64), n)
        flat_b = buckets.reshape(-1)
        pk = (flat_b * n_tables + tables) % _PAIR_PARTITIONS
        return pa.table({
            id_col: pa.concat_arrays([id_arr] * n_tables),
            "table": pa.array(tables.astype(np.int32)),
            "bucket": pa.array(flat_b, pa.int64()),
            "pk": pa.array(pk.astype(np.int32)),
        })

    def cand_part(g: pd.DataFrame) -> pd.DataFrame:
        key = ["table", "bucket"]
        sizes = g.groupby(key)[id_col].transform("size")
        _log_capped(g, sizes, max_bucket, "embedding_near_dup[gather]")
        g2 = g.loc[(sizes >= 2) & (sizes <= max_bucket)]
        out_a: list = []
        out_b: list = []
        for _, gb in g2.groupby(key, sort=False):
            ids = gb[id_col].to_numpy(dtype=np.int64)
            iu = np.triu_indices(len(ids), 1)
            x, y = ids[iu[0]], ids[iu[1]]
            out_a.append(np.minimum(x, y))
            out_b.append(np.maximum(x, y))
        if out_a:
            df = pd.DataFrame({"a": np.concatenate(out_a),
                               "b": np.concatenate(out_b)})
            # local (in-partition) dedup only: buckets of different
            # tables land in one pk partition, so same-partition
            # duplicate pairs collapse here for free
            return df.drop_duplicates()
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})

    return (ds.map_batches(bucketize_ids, batch_format="pyarrow")
            .groupby("pk").map_groups(arrow_clean(cand_part),
                                      batch_format="pandas"))


def verify_pairs_cosine(cand_ds, vec_ds, threshold: float,
                        col: str = "embedding", id_col: str = "vec_id",
                        num_partitions: int = _VERIFY_PARTITIONS):
    """Exact cosine verification of candidate (a, b) pairs with
    shuffle-side vector gather — the vector twin of
    :func:`verify_pairs_jaccard` (same 4-step shape, same
    ``hash_join`` union+groupby semi-join; see that docstring for why
    not ``Dataset.join``).  Ids must be integers (vec ids).  Each
    needed vector ships once per verify partition — bounded by
    2 × pairs, never the corpus.  Output: Dataset(a, b, cos_x1000),
    globally deduped (every copy of a pair shares its vp)."""
    sch = vec_ds.schema()
    types = dict(zip(sch.names, sch.types))
    id_type = types[id_col]
    emb_type = types[col]

    # pair ids are tiny (never the corpus); pinning them avoids
    # recomputing the LSH banding for the two consumers below
    cand_ds = cand_ds.materialize()

    def tag_pairs(b: pa.Table) -> pa.Table:
        n = b.num_rows
        vp = _mix_pair_keys(b.column("a"), b.column("b"),
                            num_partitions)
        return pa.table({
            "vp": pa.array(vp),
            "kind": pa.array(np.zeros(n, dtype=np.int8)),
            "a": b.column("a"),
            "b": b.column("b"),
            id_col: pa.nulls(n, id_type),
            col: pa.nulls(n, emb_type),
        })

    pairs_t = cand_ds.map_batches(tag_pairs, batch_format="pyarrow")

    def need_rows(b: pa.Table) -> pa.Table:
        vp = _mix_pair_keys(b.column("a"), b.column("b"),
                            num_partitions).astype(np.int64)
        ids = np.concatenate([np.asarray(b.column("a"), np.int64),
                              np.asarray(b.column("b"), np.int64)])
        vps = np.concatenate([vp, vp])
        u = np.unique(np.stack([ids, vps], axis=1), axis=0)
        return pa.table({
            id_col: pa.array(u[:, 0], id_type),
            "vp": pa.array(u[:, 1].astype(np.int32)),
        })

    need = pairs_t.map_batches(need_rows, batch_format="pyarrow")

    # gather = manual union+groupby inner join on id: Acero rejects
    # list<float> non-key columns ("Data type list<item: float> is
    # not supported in join non-key field"), so hash_join can't carry
    # the embedding payload — instead vector rows and need rows meet
    # in a hash partition and the vectors are replicated per needed
    # vp with a vectorized searchsorted + take (list columns are fine
    # through take)
    from .joins import _jk_for

    def tag_vec_jk(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "jk": _jk_for(b.column(id_col), num_partitions),
            "vkind": pa.array(np.ones(n, dtype=np.int8)),
            id_col: b.column(id_col),
            "vp": pa.nulls(n, pa.int32()),
            col: b.column(col),
        })

    def tag_need_jk(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "jk": _jk_for(b.column(id_col), num_partitions),
            "vkind": pa.array(np.zeros(n, dtype=np.int8)),
            id_col: b.column(id_col),
            "vp": b.column("vp"),
            col: pa.nulls(n, emb_type),
        })

    def gather_part(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        def _empty_g() -> pa.Table:
            return pa.table({
                id_col: pa.array([], id_type),
                "vp": pa.array([], pa.int32()),
                col: pa.array([], emb_type),
            })

        vv = g.filter(pc.equal(g.column("vkind"), 1))
        nn = g.filter(pc.equal(g.column("vkind"), 0))
        if vv.num_rows == 0 or nn.num_rows == 0:
            return _empty_g()
        vids = np.asarray(vv.column(id_col), dtype=np.int64)
        order = np.argsort(vids)
        svid = vids[order]
        # all copies of a (id, vp) need row share this jk → np.unique
        # here IS the global need dedup (one shipped vector per
        # needed verify partition)
        u = np.unique(np.stack(
            [np.asarray(nn.column(id_col), np.int64),
             np.asarray(nn.column("vp"), np.int64)], axis=1), axis=0)
        pos = np.searchsorted(svid, u[:, 0]).clip(0, len(svid) - 1)
        ok = svid[pos] == u[:, 0]
        if not ok.any():
            return _empty_g()
        u = u[ok]
        take_idx = order[pos[ok]]
        return pa.table({
            id_col: pa.array(u[:, 0], id_type),
            "vp": pa.array(u[:, 1].astype(np.int32)),
            col: vv.column(col).take(pa.array(take_idx, pa.int64())),
        })

    vecs_needed = (
        vec_ds.select_columns([id_col, col])
        .map_batches(tag_vec_jk, batch_format="pyarrow")
        .union(need.map_batches(tag_need_jk, batch_format="pyarrow"))
        .groupby("jk")
        .map_groups(gather_part, batch_format="pyarrow"))

    def tag_vecs(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "vp": b.column("vp"),
            "kind": pa.array(np.ones(n, dtype=np.int8)),
            "a": pa.nulls(n, id_type),
            "b": pa.nulls(n, id_type),
            id_col: b.column(id_col),
            col: b.column(col),
        })

    vecs_t = vecs_needed.map_batches(tag_vecs, batch_format="pyarrow")

    def _empty() -> pa.Table:
        return pa.table({
            "a": pa.array([], id_type),
            "b": pa.array([], id_type),
            "cos_x1000": pa.array([], pa.int64()),
        })

    def verify_group(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .ann import vectors_matrix

        dd = g.filter(pc.equal(g.column("kind"), 1))
        pp = g.filter(pc.equal(g.column("kind"), 0))
        if pp.num_rows == 0 or dd.num_rows == 0:
            return _empty()
        ids = np.asarray(dd.column(id_col), dtype=np.int64)
        E = vectors_matrix(dd.column(col))
        norms = np.linalg.norm(E, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        En = E / norms
        # copies of a pair across tables/partitions share this vp →
        # np.unique here IS the global pair dedup
        pair = np.unique(np.stack(
            [np.asarray(pp.column("a"), np.int64),
             np.asarray(pp.column("b"), np.int64)], axis=1), axis=0)
        order = np.argsort(ids)
        sid = ids[order]
        pa_i = np.searchsorted(sid, pair[:, 0]).clip(0, len(sid) - 1)
        pb_i = np.searchsorted(sid, pair[:, 1]).clip(0, len(sid) - 1)
        ok = (sid[pa_i] == pair[:, 0]) & (sid[pb_i] == pair[:, 1])
        if not ok.any():
            return _empty()
        pair = pair[ok]
        ia, ib = order[pa_i[ok]], order[pb_i[ok]]
        cos = (En[ia] * En[ib]).sum(axis=1)
        m = cos >= threshold
        if not m.any():
            return _empty()
        return pa.table({
            "a": pa.array(pair[m, 0], id_type),
            "b": pa.array(pair[m, 1], id_type),
            "cos_x1000": pa.array(
                np.round(cos[m] * 1000).astype(np.int64), pa.int64()),
        })

    return (pairs_t.union(vecs_t)
            .groupby("vp")
            .map_groups(verify_group, batch_format="pyarrow"))


def snapshot_diff(old_ds, new_ds, col: str = "text",
                  id_col: str = "doc_id", num_partitions: int = 64):
    """→ Dataset(id_col, status) — crawl-snapshot diff: ``added``
    (id only in new), ``removed`` (id only in old), ``changed`` (id in
    both, content hash differs).  UNCHANGED docs are NOT emitted — at
    crawl scale the diff is the small output and the identical bulk
    never leaves its blocks' hash rows.

    Shuffle shape: ONE id-keyed fixed-partition shuffle of
    (id, sha1, side) rows — hashes, never text — with the three-way
    classification fused into the per-partition fold (no outer join
    operator, no second pass).  Contract: ids are unique within each
    snapshot (the crawl-frontier invariant)."""
    import pandas as pd

    from .arrowout import arrow_clean
    from .parthash import partition_ids

    def prep(side: int):
        def f(b: pa.Table) -> pa.Table:
            t = content_hash_batch(b, col, id_col)
            t = t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, np.int8)))
            return t.append_column(
                "__jk", partition_ids([t.column(id_col)],
                                      num_partitions))
        return f

    tagged = (old_ds.map_batches(prep(0), batch_format="pyarrow")
              .union(new_ds.map_batches(prep(1),
                                        batch_format="pyarrow")))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        o = df[df["__side"] == 0][[id_col, "content_hash"]]
        n = df[df["__side"] == 1][[id_col, "content_hash"]]
        m = o.merge(n, on=id_col, how="outer",
                    suffixes=("_old", "_new"), indicator=True)
        status = np.where(
            m["_merge"] == "left_only", "removed",
            np.where(m["_merge"] == "right_only", "added", "changed"))
        keep = (m["_merge"] != "both") | \
            (m["content_hash_old"] != m["content_hash_new"])
        out = pd.DataFrame({id_col: m.loc[keep, id_col].to_numpy(),
                            "status": status[keep.to_numpy()]})
        return out

    return (tagged.groupby("__jk", num_partitions=num_partitions)
            .map_groups(arrow_clean(fold), batch_format="pandas"))
