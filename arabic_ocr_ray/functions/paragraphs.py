"""Corpus-wide paragraph-level deduplication (FineWeb/CCNet-style).

The web-curation operator the per-page extractor cannot express: a
boilerplate paragraph (cookie banner, nav stub, licence blurb) looks
like content on every SINGLE page and only reveals itself by repeating
ACROSS pages.  This module removes such repeats corpus-wide and
reassembles each document's surviving text.

Contract (shared verbatim by the DuckDB SQL twin):

- paragraphs = ``text.split('\\n')`` EXACTLY, keeping empty segments
  (the reassembled text of an untouched document is byte-identical);
- empty paragraphs (``''``) never participate in dup counting and are
  always kept (they encode blank-line spacing, not content);
- ``mode="keep_first"``: the globally-first occurrence — min
  ``(id, pos)`` under the id column's natural order — of each repeated
  paragraph survives; every later occurrence is dropped;
- ``mode="drop_all"``: every occurrence of a paragraph seen more than
  ``max_occurrences`` times corpus-wide is dropped;
- a document whose every paragraph is dropped disappears from the
  output (SQL ``GROUP BY`` over survivors); survivors rejoin with
  ``'\\n'``.

Shuffle inventory (the 100 TB shape):

1. explode → ``(id, pos, para)`` rows — pure map, vectorized repeat/
   arange index math, one Python ``str.split`` per document.
2. ONE para-keyed fixed-partition shuffle: every occurrence of a
   paragraph co-locates, so occurrence counting, keeper election and
   the drop decision all happen inside a single ``map_groups`` fold —
   no separate count table, no join-back, and NO broadcast (the
   dup-paragraph set is unbounded at web scale: boilerplate grows with
   the crawl, unlike the bounded benchmark set in
   ``dedup.benchmark_gram_ref``).  Empty paragraphs are keyed by
   id-hash instead of para-hash — at web scale ``''`` is the hottest
   string in the corpus, and the always-keep rule needs no
   co-location, so the would-be mega-partition spreads evenly.
3. ONE id-keyed fixed-partition shuffle reassembles survivors in
   ``pos`` order.

Paragraph text rides both shuffles (exactness — no hash-collision
risk; the 128-bit-fingerprint variant that ships ``(h, id, pos)`` and
anti-joins a drop list back would save bandwidth at the price of a
collision bound).  Skew note: a mega-boilerplate paragraph inflates
its fold partition linearly in its occurrence count with O(1) work per
row; that is log-worthy, not salt-worthy — the keeper election is
exactly the computation that NEEDS all occurrences co-located.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .arrowout import arrow_clean
from .parthash import partition_ids

_PARTITIONS = 64


def explode_paragraphs(batch: pa.Table, col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """→ one ``(id, pos, para)`` row per '\\n'-split segment (empty
    segments included — they carry blank-line spacing through the
    round trip).  Fully vectorized: the split, the flatten and the
    position math never touch a Python string (``pc.split_pattern``
    over the Arrow buffer; a null text splits like ``''``)."""
    import pyarrow.compute as pc

    texts = pc.fill_null(batch.column(col), "").combine_chunks()
    lists = pc.split_pattern(texts, "\n")
    counts = np.asarray(pc.list_value_length(lists).cast(pa.int64()))
    total = int(counts.sum())
    idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # per-doc 0..c-1 position, vectorized: global arange minus each
    # row's doc start offset
    starts = np.repeat(np.cumsum(counts) - counts, counts)
    pos = np.arange(total, dtype=np.int64) - starts
    return pa.table({
        id_col: batch.column(id_col).take(pa.array(idx)),
        "pos": pa.array(pos, pa.int64()),
        "para": pc.list_flatten(lists),
    })


def dedup_paragraphs(ds, col: str = "text", id_col: str = "doc_id",
                     mode: str = "keep_first", max_occurrences: int = 1,
                     num_partitions: int = _PARTITIONS,
                     reassembly: str = "shuffle",
                     max_broadcast_drops: int = 2_000_000):
    """→ Dataset(id_col, col) — corpus-wide paragraph dedup + document
    reassembly.  See module docstring for contract and shuffle shape.

    ``reassembly="shuffle"`` (default, unbounded-safe): the decision
    fold emits surviving ``(id, pos, para)`` rows and an id-keyed
    shuffle rebuilds documents — text rides two all-to-alls.

    ``reassembly="broadcast"``: the fold emits only the DROPPED
    ``(id, pos)`` keys; they broadcast once via ``ray.put`` and
    reassembly becomes a pure map over the SOURCE rows (a document's
    paragraphs are already co-located in its own row) — text rides
    exactly ONE all-to-all.  BOUNDED-SMALL-SIDE CONTRACT (the same
    one as ``bloom`` / the CC driver union-find): drops = occurrences
    of repeated paragraphs beyond the keeper, typically a small
    fraction of the corpus; raises above ``max_broadcast_drops``
    instead of silently shipping an unbounded set."""
    if mode not in ("keep_first", "drop_all"):
        raise ValueError(f"mode={mode!r}")
    if reassembly not in ("shuffle", "broadcast"):
        raise ValueError(f"reassembly={reassembly!r}")
    emit_drops = reassembly == "broadcast"

    def explode_key(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = explode_paragraphs(b, col=col, id_col=id_col)
        para_jk = np.asarray(
            partition_ids([t.column("para")], num_partitions))
        id_jk = np.asarray(
            partition_ids([t.column(id_col)], num_partitions))
        is_empty = pc.equal(t.column("para"), "").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return t.append_column(
            "__jk", pa.array(np.where(is_empty, id_jk, para_jk),
                             pa.int32()))

    def fold_part(df: pd.DataFrame) -> pd.DataFrame:
        # all occurrences of every non-empty paragraph keyed here are
        # co-located, so a partition-local decision IS the global one.
        # Strings are factorized ONCE and all ordering/counting runs on
        # integer codes (measured 2.4× over the string sort_values; the
        # id factorization uses sort=True so code order == the id
        # column's natural order, preserving the min-(id,pos) contract)
        df = df.reset_index(drop=True)
        ne = df["para"].to_numpy() != ""
        keep = np.ones(len(df), dtype=bool)
        sub = df[ne]
        if len(sub):
            codes, _ = pd.factorize(sub["para"], sort=False)
            if mode == "keep_first":
                idv = sub[id_col].to_numpy()
                if idv.dtype == object:
                    idv = pd.factorize(sub[id_col], sort=True)[0]
                order = np.lexsort(
                    (sub["pos"].to_numpy(), idv, codes))
                sc = codes[order]
                dup = np.empty(len(sc), dtype=bool)
                if len(sc):
                    dup[0] = False
                    dup[1:] = sc[1:] == sc[:-1]
                keep[sub.index.to_numpy()[order[dup]]] = False
            else:
                n = np.bincount(codes)[codes]
                keep[sub.index.to_numpy()[n > max_occurrences]] = False
        if emit_drops:
            return df.loc[~keep, [id_col, "pos"]]
        return df.loc[keep, [id_col, "pos", "para"]]

    decided = (ds.map_batches(explode_key, batch_format="pyarrow")
               .groupby("__jk", num_partitions=num_partitions)
               .map_groups(arrow_clean(fold_part),
                           batch_format="pandas"))

    if emit_drops:
        import ray

        drops = decided.materialize()
        n_drops = drops.count()
        if n_drops > max_broadcast_drops:
            raise ValueError(
                f"{n_drops} dropped paragraph occurrences exceed "
                f"max_broadcast_drops={max_broadcast_drops}; use "
                f"reassembly='shuffle' (unbounded-safe) instead")
        import pyarrow.compute as pc

        dd = drops.to_pandas()
        dropmap = ({} if dd.empty else
                   {i: frozenset(g) for i, g in
                    dd.groupby(id_col)["pos"]})
        touched_keys = pa.array(list(dropmap))  # int64/string inferred
        ref = ray.put((dropmap, touched_keys))

        def rewrite(b: pa.Table) -> pa.Table:
            dm, keys = ray.get(ref)  # local object-store hit
            texts = pc.fill_null(b.column(col), "")
            b = pa.table({id_col: b.column(id_col), col: texts})
            if not dm:
                return b
            # untouched docs (the bulk) pass through as Arrow; only
            # docs holding a dropped paragraph pay the Python resplit
            id_arr = b.column(id_col).combine_chunks()
            if keys.type != id_arr.type:
                keys = keys.cast(id_arr.type)
            mask = pc.is_in(id_arr, value_set=keys)
            out = [b.filter(pc.invert(mask))]
            tb = b.filter(mask)
            out_i, out_t = [], []
            for i, t in zip(tb.column(id_col).to_pylist(),
                            tb.column(col).to_pylist()):
                ps = dm[i]
                segs = [p for j, p in enumerate(t.split("\n"))
                        if j not in ps]
                if segs:  # all-dropped docs vanish (GROUP BY parity)
                    out_i.append(i)
                    out_t.append("\n".join(segs))
            out.append(pa.table({
                id_col: pa.array(out_i, b.schema.field(id_col).type),
                col: pa.array(out_t, pa.string())}))
            return pa.concat_tables(out)

        return ds.map_batches(rewrite, batch_format="pyarrow")

    def add_rk(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__rk", partition_ids([b.column(id_col)], num_partitions))

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "pos"], kind="mergesort")
        g = df.groupby(id_col, sort=True)["para"].agg("\n".join)
        return pd.DataFrame({id_col: g.index.to_numpy(), col: g.values})

    return (decided.map_batches(add_rk, batch_format="pyarrow")
            .groupby("__rk", num_partitions=num_partitions)
            .map_groups(arrow_clean(reassemble), batch_format="pandas"))


def common_paragraphs(ds, min_docs: int = 2, col: str = "text",
                      id_col: str = "doc_id",
                      num_partitions: int = _PARTITIONS):
    """→ Dataset(para, n_occurrences, n_docs) — the corpus's repeated-
    paragraph inventory (the boilerplate report a curation run reads
    before choosing ``max_occurrences``).  Same single para-keyed
    shuffle as :func:`dedup_paragraphs`; map-side partials pre-shrink
    each batch to distinct paragraphs before the all-to-all."""

    def partials(b: pa.Table) -> pa.Table:
        t = explode_paragraphs(b, col=col, id_col=id_col)
        df = pd.DataFrame({
            "para": np.asarray(t.column("para")),
            "id": np.asarray(t.column(id_col)),
        })
        df = df[df["para"] != ""]
        g = df.groupby("para", sort=True).agg(
            n=("id", "size"), nd=("id", "nunique"))
        out = pa.table({
            "para": pa.array(g.index.to_numpy(), pa.string()),
            "n": pa.array(g["n"].to_numpy(), pa.int64()),
            # distinct-doc partials fold as a plain sum because a row
            # is a WHOLE document: all of a doc's paragraphs land in
            # the batch holding that row, so no doc can contribute to
            # the same para's nd in two different batches
            "nd": pa.array(g["nd"].to_numpy(), pa.int64()),
        })
        return out.append_column(
            "__jk", partition_ids([out.column("para")], num_partitions))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("para", sort=True).agg(
            n_occurrences=("n", "sum"), n_docs=("nd", "sum"))
        g = g[g["n_docs"] >= min_docs]
        return pd.DataFrame({
            "para": g.index.to_numpy(),
            "n_occurrences": g["n_occurrences"].to_numpy(),
            "n_docs": g["n_docs"].to_numpy(),
        })

    return (ds.map_batches(partials, batch_format="pyarrow")
            .groupby("__jk", num_partitions=num_partitions)
            .map_groups(arrow_clean(fold), batch_format="pandas"))


# --- incremental (crawl-over-crawl) paragraph dedup ------------------------
#
# The missing member of the incremental family (exact: snapshot_diff;
# near-dup: near_dup_pairs_bipartite): a MATERIALIZED paragraph-
# occurrence counter table, so deduplicating crawl N+1 never re-reads
# or re-shuffles the base corpus TEXT — only the counter table
# (≈ distinct paragraphs, orders of magnitude smaller than the
# corpus) merges with the new crawl's counts.  Epoch layout:
#
#     counts_dir/_current          -> "epoch-<k>" (atomic pointer)
#     counts_dir/epoch-<k>/*.parquet   (para, n, __jk)
#
# An update writes epoch-<k+1> fully, swaps the pointer atomically,
# then removes the old epoch — a failed update leaves a dangling
# un-pointed directory the next run overwrites (resume-safe).  The
# counter is drop_all-composable by construction; keep_first does not
# compose across crawls without per-occurrence order state and stays a
# full-corpus operation by contract.

def _counts_partials(col: str, num_partitions: int):
    def partials(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = pc.fill_null(b.column(col), "").combine_chunks()
        flat = pc.list_flatten(pc.split_pattern(texts, "\n"))
        s = pd.Series(np.asarray(flat))
        vc = s[s != ""].value_counts(sort=False)  # hash-based, no sort
        out = pa.table({
            "para": pa.array(vc.index.to_numpy(), pa.string()),
            "n": pa.array(vc.to_numpy(), pa.int64()),
        })
        return out.append_column(
            "__jk", partition_ids([out.column("para")], num_partitions))
    return partials


def _fold_counts(df: pd.DataFrame) -> pd.DataFrame:
    # __jk is the group key (constant here): carried through so the
    # epoch write needs no second hash pass over every paragraph
    g = df.groupby("para", sort=False)["n"].sum()
    jk = np.int32(df["__jk"].iloc[0]) if len(df) else np.int32(0)
    return pd.DataFrame({
        "para": g.index.to_numpy(),
        "n": g.to_numpy(),
        "__jk": np.full(len(g), jk, dtype=np.int32),
    })


def _current_epoch(counts_dir: str) -> str:
    import os

    with open(os.path.join(counts_dir, "_current")) as f:
        return f.read().strip()


def _resolve_partitions(counts_dir: str,
                        num_partitions: int | None) -> int:
    """The stored ``__jk`` keys are ``hash(para) % N`` with N fixed at
    build time; any consumer hashing with a different N lands counter
    rows and new-crawl rows in different groups — every lookup would
    miss and NO duplicate would ever drop, silently.  So N is recorded
    in ``_meta.json`` at build and every update/dedup resolves it from
    there; passing an explicit conflicting value raises instead of
    silently disabling drops."""
    import json
    import os

    meta_path = os.path.join(counts_dir, "_meta.json")
    try:
        with open(meta_path) as f:
            stored = int(json.load(f)["num_partitions"])
    except FileNotFoundError:
        # pre-meta counter dir: trust the caller (legacy behavior)
        return num_partitions if num_partitions else _PARTITIONS
    if num_partitions is not None and num_partitions != stored:
        raise ValueError(
            f"num_partitions={num_partitions} conflicts with the "
            f"counter's build-time value {stored} (stored __jk keys "
            f"are hash % {stored}); omit the argument or rebuild")
    return stored


def _write_epoch(counts_ds, counts_dir: str, epoch: str,
                 num_partitions: int) -> None:
    """Fold partials → write one epoch dir → swap the pointer."""
    import os

    out = (counts_ds
           .groupby("__jk", num_partitions=num_partitions)
           .map_groups(arrow_clean(_fold_counts),
                       batch_format="pandas"))
    epoch_dir = os.path.join(counts_dir, epoch)
    out.write_parquet(epoch_dir, mode="overwrite")
    tmp = os.path.join(counts_dir, f"_current.tmp{os.getpid()}")
    with open(tmp, "w") as f:
        f.write(epoch)
    os.replace(tmp, os.path.join(counts_dir, "_current"))


def build_paragraph_counts(ds, counts_dir: str, col: str = "text",
                           num_partitions: int = _PARTITIONS) -> None:
    """Materialize the corpus-wide paragraph-occurrence counter for a
    BASE crawl: explode → map-side per-batch combine → ONE para-keyed
    fold → ``epoch-0``.  The base text is read exactly once and never
    again by later updates."""
    import json
    import os

    os.makedirs(counts_dir, exist_ok=True)
    with open(os.path.join(counts_dir, "_meta.json"), "w") as f:
        json.dump({"num_partitions": int(num_partitions)}, f)
    _write_epoch(ds.map_batches(_counts_partials(col, num_partitions),
                                batch_format="pyarrow"),
                 counts_dir, "epoch-0", num_partitions)


def read_paragraph_counts(counts_dir: str):
    """→ Dataset(para, n, __jk) of the CURRENT epoch."""
    import os

    import ray.data as rd

    return rd.read_parquet(
        os.path.join(counts_dir, _current_epoch(counts_dir)))


def update_paragraph_counts(new_ds, counts_dir: str,
                            col: str = "text",
                            num_partitions: int | None = None) -> None:
    """Merge a NEW crawl's paragraph counts into the counter table:
    union(current epoch, new partials) → one para-keyed sum fold →
    next epoch → atomic pointer swap → old epoch removed.  Cost ∝
    |distinct paragraphs| + |new crawl|; the base corpus text is not
    touched.  ``num_partitions`` is resolved from the counter's own
    ``_meta.json`` (see :func:`_resolve_partitions`); an explicit
    conflicting value raises."""
    import os
    import shutil

    num_partitions = _resolve_partitions(counts_dir, num_partitions)
    cur = _current_epoch(counts_dir)
    nxt = f"epoch-{int(cur.split('-')[1]) + 1}"
    merged = read_paragraph_counts(counts_dir).union(
        new_ds.map_batches(_counts_partials(col, num_partitions),
                           batch_format="pyarrow"))
    _write_epoch(merged, counts_dir, nxt, num_partitions)
    shutil.rmtree(os.path.join(counts_dir, cur), ignore_errors=True)


def dedup_paragraphs_incremental(new_ds, counts_dir: str,
                                 col: str = "text",
                                 id_col: str = "doc_id",
                                 max_occurrences: int = 1,
                                 num_partitions: int | None = None,
                                 reassembly: str = "shuffle",
                                 max_broadcast_drops: int = 2_000_000):
    """→ Dataset(id_col, col) — drop_all paragraph dedup of the NEW
    crawl against the MERGED counter table (run
    :func:`update_paragraph_counts` first so counts cover base ∪ new):
    a new document's non-empty paragraph is dropped iff its global
    count exceeds ``max_occurrences``; empty paragraphs always
    survive; all-dropped documents vanish (GROUP BY parity with
    :func:`dedup_paragraphs`).

    ``reassembly="broadcast"``: the dup inventory (counter rows with
    ``n > max_occurrences``) broadcasts once via ``ray.put`` and the
    whole dedup becomes ONE pure map over the new crawl — a document's
    paragraphs are already co-located in its own row, so NO shuffle
    touches either crawl.  Same BOUNDED-SMALL-SIDE contract as
    :func:`dedup_paragraphs`'s broadcast mode: raises above
    ``max_broadcast_drops`` distinct dup paragraphs instead of
    silently shipping an unbounded set (boilerplate grows with the
    crawl; the shuffle mode is the unbounded-safe default).

    Shuffle shape: only the counter rows that can CAUSE a drop —
    ``n > max_occurrences``, the boilerplate/dup inventory, typically
    a sliver of the counter — ride the para-hash shuffle next to the
    new-crawl paragraph rows (a lookup miss already means keep, so
    pruning the ≤-threshold rows changes no decision); the drop
    decision is a partition-local lookup, and one id-keyed shuffle
    reassembles — the base corpus text never moves at all.

    ``num_partitions`` is resolved from the counter's ``_meta.json``
    (the stored ``__jk`` keys fix it at build time); an explicit
    conflicting value raises."""
    if reassembly not in ("shuffle", "broadcast"):
        raise ValueError(f"reassembly={reassembly!r}")
    num_partitions = _resolve_partitions(counts_dir, num_partitions)

    if reassembly == "broadcast":
        import pyarrow.compute as pc
        import ray

        dups_ds = read_paragraph_counts(counts_dir).map_batches(
            lambda b: b.filter(
                pc.greater(b.column("n"), max_occurrences))
            .select(["para"]),
            batch_format="pyarrow").materialize()
        n_dups = dups_ds.count()
        if n_dups > max_broadcast_drops:
            raise ValueError(
                f"{n_dups} dup paragraphs exceed max_broadcast_drops="
                f"{max_broadcast_drops}; use reassembly='shuffle' "
                f"(unbounded-safe) instead")
        dupset = frozenset(
            p for b in dups_ds.iter_batches(batch_format="pyarrow")
            for p in b.column("para").to_pylist())
        ref = ray.put(dupset)

        def rewrite(b: pa.Table) -> pa.Table:
            dset = ray.get(ref)  # local object-store hit per worker
            out_i, out_t = [], []
            ids = b.column(id_col).to_pylist()
            texts = pc.fill_null(b.column(col), "").to_pylist()
            for i, t in zip(ids, texts):
                segs = [p for p in t.split("\n")
                        if p == "" or p not in dset]
                if segs:  # all-dropped docs vanish (GROUP BY parity)
                    out_i.append(i)
                    out_t.append("\n".join(segs))
            return pa.table({
                id_col: pa.array(out_i, b.schema.field(id_col).type),
                col: pa.array(out_t, pa.string())})

        return new_ds.map_batches(rewrite, batch_format="pyarrow")

    def explode_key(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = explode_paragraphs(b, col=col, id_col=id_col)
        para_jk = np.asarray(
            partition_ids([t.column("para")], num_partitions))
        id_jk = np.asarray(
            partition_ids([t.column(id_col)], num_partitions))
        is_empty = pc.equal(t.column("para"), "").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t.column(id_col),
            "pos": t.column("pos"),
            "para": t.column("para"),
            "n": pa.array(np.zeros(t.num_rows, np.int64)),
            "side": pa.array(np.ones(t.num_rows, np.int8)),
            "__jk": pa.array(np.where(is_empty, id_jk, para_jk),
                             pa.int32()),
        })

    sch = new_ds.schema()
    idt = dict(zip(sch.names, sch.types))[id_col]

    def tag_counts(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # prune: rows at or under the threshold can never drop a new
        # paragraph (miss ⇒ count 0 ⇒ keep), so only the dup
        # inventory ships through the shuffle
        b = b.filter(pc.greater(b.column("n"), max_occurrences))
        nr = b.num_rows
        return pa.table({
            id_col: pa.nulls(nr, idt),
            "pos": pa.array(np.full(nr, -1, np.int64)),
            "para": b.column("para"),
            "n": b.column("n"),
            "side": pa.array(np.zeros(nr, np.int8)),
            "__jk": b.column("__jk"),
        })

    counts = read_paragraph_counts(counts_dir).map_batches(
        tag_counts, batch_format="pyarrow")
    tagged = new_ds.map_batches(explode_key, batch_format="pyarrow")

    def fold(t: pa.Table) -> pa.Table:
        # Arrow end to end: a pandas fold would convert the id column
        # (int64 + counter-side nulls) to float64, silently corrupting
        # hash-derived ids above 2^53 on the round trip back.
        import pyarrow.compute as pc

        t = t.combine_chunks()
        side = t.column("side")
        s = t.filter(pc.equal(side, 1))
        if s.num_rows == 0:
            return s.select([id_col, "pos", "para"])
        c = t.filter(pc.equal(side, 0))
        paras = s.column("para")
        if c.num_rows:
            # index_in keeps the FIRST match (one row/para by
            # construction; defensive vs duplicates like the old fold)
            idx = pc.index_in(paras,
                              value_set=c.column("para").combine_chunks())
            ns = pc.fill_null(pc.take(c.column("n"), idx), 0)
        else:
            ns = pa.array(np.zeros(s.num_rows, np.int64))
        keep = pc.or_(pc.equal(paras, ""),
                      pc.less_equal(ns, max_occurrences))
        return s.filter(keep).select([id_col, "pos", "para"])

    decided = (counts.union(tagged)
               .groupby("__jk", num_partitions=num_partitions)
               .map_groups(fold, batch_format="pyarrow"))

    def add_rk(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__rk", partition_ids([b.column(id_col)], num_partitions))

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "pos"], kind="mergesort")
        g = df.groupby(id_col, sort=True)["para"].agg("\n".join)
        return pd.DataFrame({id_col: g.index.to_numpy(),
                             col: g.values})

    return (decided.map_batches(add_rk, batch_format="pyarrow")
            .groupby("__rk", num_partitions=num_partitions)
            .map_groups(arrow_clean(reassemble), batch_format="pandas"))
