"""Join operators beyond ``Dataset.join``.

- :func:`asof_join` — as-of (backward) join: for each left row, the
  latest right row with the same key and ``right_ts <= left_ts``.
  Ray Data has no ASOF join; the engine composes one from the
  FIXED-PARTITION shape: tag both sides, align schemas, union,
  hash keys into ``num_partitions`` fixed partitions, and run ONE
  ``pandas.merge_asof(..., by=key)`` per PARTITION (all of its keys at
  once) — never a python call per key (the r1 per-key ``map_groups``
  dispatch is the measured 3-orders-of-magnitude anti-pattern).
  Partitioning assumption: one partition's rows fit in one group task
  (many keys per partition).  A single hot key that alone overflows a
  task is handled by ``salt_bucket_us``: rows are sub-partitioned into
  (key, ts-bucket) groups; each left bucket additionally receives a
  CARRY row — the latest right row from any earlier bucket — computed
  by a bucket-level as-of over the tiny per-bucket summary table, so
  no boundary information is lost.  Deterministic under ts ties: the
  right side is deduplicated to one row per (key, ts) keeping the
  highest ``right_id`` before the merge (pandas would keep an
  arbitrary-but-stable last; DuckDB's ASOF picks an unspecified one —
  dedup makes both sides agree).

- :func:`semi_join_broadcast` / :func:`anti_join_broadcast` — the
  broadcast-key-set filters (no shuffle; the resume anti-filter in
  pipelines/extract.py is the same shape).

- :func:`hash_join` — distributed inner / left-outer / semi / anti
  hash join built from the fixed-partition union + groupby shape
  instead of ``Dataset.join``.  Two reasons it exists:

  1. **Robustness**: Ray's ``groupby().map_groups()`` hash shuffle
     emits schemaless zero-column blocks for partitions that receive
     no rows, later ``map_batches`` calls are skipped on them, and
     ``Dataset.join``'s pyarrow aggregator then dies with
     ``ArrowInvalid: No match … FieldRef.Name(...)`` when a join
     partition is made only of such blocks (deterministic at
     num_cpus=32 / sf0.01 where 25 pairs spread over 64 partitions).
     A groupby shuffle tolerates them, so a join *expressed as* a
     groupby cannot be broken this way.
  2. **Scale**: the anti/semi forms replace driver-side distinct-key
     broadcasts (``unique() → set → ray.put``) whose broadcast side is
     unbounded (e.g. distinct event users at 10^12 events).

  Shape: tag each side with ``__side`` and a partition key
  ``__jk = hash(key) % P``, align schemas (other side's payload =
  typed nulls), union, ``groupby(__jk)``, and run ONE in-memory
  pyarrow ``Table.join`` per partition.  The per-partition tables are
  constructed with explicit schemas, so Acero never sees a schemaless
  block.  Partitioning assumption: both sides of one hash partition
  fit in one task (the standard partitioned-hash-join contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .arrowout import arrow_clean
from .parthash import partition_ids

_PARTITIONS = 64


def _pa_type(t) -> pa.DataType:
    """Ray ``Dataset.schema().types`` yields numpy dtypes for
    pandas-backed blocks; normalize to Arrow types (object → string)."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError, ValueError):
        return pa.string()


def _jk_for(arr: pa.ChunkedArray, n_parts: int) -> pa.Array:
    """Deterministic partition key for an id column, int or string.
    Nulls hash to 0 (they never match in the join itself).  Both the
    int and string paths are vectorized (`parthash` — the r3 string
    path was a per-row ``to_pylist()`` + crc32 loop over FULL join
    inputs for url-keyed joins)."""
    if pa.types.is_integer(arr.type):
        v = np.asarray(pc.fill_null(arr, 0).combine_chunks()
                       .cast(pa.int64()), dtype=np.int64)
        h = (v * np.int64(-7046029254386353131)) >> np.int64(32)
        return pa.array((h % n_parts).astype(np.int32))
    return partition_ids(arr, n_parts)


def hash_join(left_ds, right_ds, on: str | list[str],
              right_on: str | list[str] | None = None,
              how: str = "inner", num_partitions: int = _PARTITIONS,
              right_distinct: bool = False,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None):
    """→ Dataset joined on one key or a composite key list.  ``how`` ∈
    {"inner", "left", "semi", "anti"}; ``left`` = left outer (every
    left row survives, right payload null on miss); semi/anti keep the
    LEFT schema (right
    may hold duplicate keys — no pre-distinct needed, Acero's
    left-semi/anti handle it).  Inner output columns: left columns
    then right non-key columns.  ``right_distinct=True`` deduplicates
    the right side's full rows inside each join partition before the
    inner join — a GLOBAL distinct for free (all copies of a key hash
    to one partition), used when the right side may carry duplicate
    rows whose join fan-out would replicate left payloads (the
    near-dup need rows).  Composite keys partition by the combined
    hash of all key columns (one shuffle regardless of arity).
    See module docstring for why this exists next to ``Dataset.join``."""
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"how={how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_on = right_on or on
    rkeys = [right_on] if isinstance(right_on, str) else list(right_on)
    if len(rkeys) != len(keys):
        raise ValueError("right_on arity != on arity")
    # explicit schema hints sidestep the fetch-by-execution that a
    # side built from map_groups needs — and which returns None when
    # that side is (legitimately) empty.  A side that is itself a
    # hash_join output carries its statically-known schema in
    # _aor_known_schema (stamped below): without it, every chained
    # join would EXECUTE its upstream join at plan time just to read
    # the schema, then re-execute it in the real pipeline.
    ls = (left_schema if left_schema is not None
          else getattr(left_ds, "_aor_known_schema", None))
    if ls is None:
        ls = left_ds.schema()
    rs = (right_schema if right_schema is not None
          else getattr(right_ds, "_aor_known_schema", None))
    if rs is None:
        rs = right_ds.schema()
    ltypes = {n: _pa_type(t) for n, t in zip(ls.names, ls.types)}
    rtypes = {n: _pa_type(t) for n, t in zip(rs.names, rs.types)}
    key_ts = [ltypes[k] for k in keys]
    left_nonkey = [c for c in ls.names if c not in keys]
    if how in ("inner", "left"):
        right_nonkey = [c for c in rs.names if c not in rkeys]
        clash = set(right_nonkey) & set(ls.names)
        if clash:
            raise ValueError(f"column collision: {sorted(clash)}")
    else:
        right_nonkey = []
        right_ds = right_ds.select_columns(rkeys)
    out_names = keys + left_nonkey + right_nonkey
    out_schema = pa.schema(
        list(zip(keys, key_ts)) + [(c, ltypes[c]) for c in left_nonkey]
        + [(c, rtypes[c]) for c in right_nonkey])

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            n = b.num_rows
            # cast the right keys to the LEFT keys' types BEFORE both
            # the partition hash and the in-partition join — hashing
            # the raw column would send equal-after-cast keys (int64
            # 5 vs float64 5.0) to different partitions, silently
            # un-matching them
            key_arrs = [
                b.column(k) if side == 0
                else b.column(rk).cast(kt)
                for k, rk, kt in zip(keys, rkeys, key_ts)]
            jk = (_jk_for(key_arrs[0], num_partitions)
                  if len(key_arrs) == 1
                  else partition_ids(key_arrs, num_partitions))
            cols = {"__jk": jk,
                    "__side": pa.array(
                        np.full(n, side, dtype=np.int8))}
            for k, arr in zip(keys, key_arrs):
                cols[k] = arr
            for c in left_nonkey:
                cols[c] = (b.column(c) if side == 0
                           else pa.nulls(n, ltypes[c]))
            for c in right_nonkey:
                cols[c] = (b.column(c) if side == 1
                           else pa.nulls(n, rtypes[c]))
            return pa.table(cols)
        return f

    tagged = (left_ds.map_batches(tag(0), batch_format="pyarrow")
              .union(right_ds.map_batches(tag(1),
                                          batch_format="pyarrow")))

    arrow_how = {"inner": "inner", "left": "left outer",
                 "semi": "left semi", "anti": "left anti"}[how]

    def join_part(g: pa.Table) -> pa.Table:
        side = g.column("__side")
        lt = g.filter(pc.equal(side, 0)).select(keys + left_nonkey)
        rt = (g.filter(pc.equal(side, 1))
              .select(keys + right_nonkey))
        if lt.num_rows == 0:
            return out_schema.empty_table()
        if rt.num_rows == 0:
            if how == "anti":
                return lt
            if how == "left":
                t = lt
                for c in right_nonkey:
                    t = t.append_column(
                        c, pa.nulls(lt.num_rows, rtypes[c]))
                return t.select(out_names)
            return out_schema.empty_table()
        if right_distinct and how in ("inner", "left"):
            rt = (rt.combine_chunks()
                  .group_by(rt.column_names).aggregate([]))
        out = lt.combine_chunks().join(
            rt.combine_chunks(), keys=keys, join_type=arrow_how)
        return out.select(out_names)

    # cap the shuffle at the key-space size — __jk has exactly
    # num_partitions distinct values, so more aggregators than that
    # is pure actor-startup overhead (measured 6× on the CC loop)
    out = (tagged.groupby("__jk", num_partitions=num_partitions)
           .map_groups(join_part, batch_format="pyarrow"))
    # statically known regardless of data: downstream hash_joins read
    # this instead of executing the whole join for a schema probe
    out._aor_known_schema = out_schema
    return out


def _key_pk(k: np.ndarray, n_parts: int) -> np.ndarray:
    h = (k * np.int64(-7046029254386353131)) >> np.int64(32)
    return (h % n_parts).astype(np.int32)


def asof_join(
    left_ds,
    right_ds,
    key_left: str,
    key_right: str,
    ts_left: str,
    ts_right: str,
    left_cols: list[str],
    right_cols: list[str],
    right_id: str | None = None,
    num_partitions: int = _PARTITIONS,
    salt_bucket_us: int | None = None,
):
    """→ Dataset(left_cols..., right_cols... (nullable)) — backward
    as-of join (exact matches allowed, ``<=``).  See module docstring
    for the fixed-partition shape and ``salt_bucket_us`` salting."""

    # right-side column types discovered from the schema so nulls on
    # the left align
    right_schema = right_ds.schema()
    rtypes = {n: t for n, t in zip(right_schema.names, right_schema.types)}

    salted = salt_bucket_us is not None

    def _bucket_of(ts_col) -> np.ndarray:
        us = np.asarray(ts_col.cast(pa.int64()))
        return us // salt_bucket_us

    def tag_left_typed(b: pa.Table) -> pa.Table:
        cols = {"_key": b.column(key_left).cast(pa.int64()),
                "_ts": b.column(ts_left),
                "_side": pa.array([0] * b.num_rows, pa.int8())}
        for c in left_cols:
            cols[c] = b.column(c)
        for c in right_cols:
            cols[c] = pa.nulls(b.num_rows, rtypes[c])
        if right_id:
            cols["_rid"] = pa.nulls(b.num_rows, pa.int64())
        if salted:
            cols["_bucket"] = pa.array(_bucket_of(b.column(ts_left)),
                                       pa.int64())
        return pa.table(cols)

    left_schema = left_ds.schema()
    ltypes = {n: t for n, t in zip(left_schema.names, left_schema.types)}

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {"_key": b.column(key_right).cast(pa.int64()),
                "_ts": b.column(ts_right),
                "_side": pa.array([1] * b.num_rows, pa.int8())}
        for c in left_cols:
            cols[c] = pa.nulls(b.num_rows, ltypes[c])
        for c in right_cols:
            cols[c] = b.column(c)
        if right_id:
            cols["_rid"] = b.column(right_id).cast(pa.int64())
        if salted:
            cols["_bucket"] = pa.array(_bucket_of(b.column(ts_right)),
                                       pa.int64())
        return pa.table(cols)

    l = left_ds.map_batches(tag_left_typed, batch_format="pyarrow")
    r = right_ds.map_batches(tag_right, batch_format="pyarrow")

    # Integer columns must come back as NULLABLE ints: pandas coerces
    # int64-with-NaN to float64, which both loses key precision beyond
    # 2^53 and makes block schemas differ between groups with and
    # without right-side rows.
    int_cols = (
        [c for c in left_cols if pa.types.is_integer(ltypes[c])]
        + [c for c in right_cols if pa.types.is_integer(rtypes[c])]
    )

    def _restore_ints(df: pd.DataFrame) -> pd.DataFrame:
        for c in int_cols:
            df[c] = df[c].astype("Int64")
        return df

    by_cols = ["_key"] + (["_bucket"] if salted else [])

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        """ONE merge_asof(by=key) over every key in the partition."""
        lf = g[g["_side"] == 0]
        rf = g[g["_side"] == 1]
        lf = lf.sort_values(["_ts"] + left_cols, kind="mergesort")
        if lf.empty or rf.empty:
            return _restore_ints(lf[left_cols + right_cols].copy())
        sort_cols = ["_ts"] + (["_rid"] if "_rid" in rf.columns else [])
        rf = rf.sort_values(sort_cols, kind="mergesort")
        if "_rid" in rf.columns:
            rf = rf.drop_duplicates(subset=by_cols + ["_ts"],
                                    keep="last")
        merged = pd.merge_asof(
            lf[by_cols + ["_ts"] + left_cols].reset_index(drop=True),
            rf[by_cols + ["_ts"] + right_cols].reset_index(drop=True),
            on="_ts", by=by_cols,
            direction="backward", allow_exact_matches=True)
        return _restore_ints(merged.drop(columns=by_cols + ["_ts"]))

    if not salted:
        def add_pk(b: pa.Table) -> pa.Table:
            k = np.asarray(b.column("_key"), dtype=np.int64)
            return b.append_column(
                "pk", pa.array(_key_pk(k, num_partitions)))

        return (l.union(r)
                .map_batches(add_pk, batch_format="pyarrow")
                .groupby("pk")
                .map_groups(arrow_clean(merge_part),
                        batch_format="pandas"))

    # ---- salted path -----------------------------------------------------
    # Per-(key,bucket) right summaries → bucket-level as-of gives each
    # left bucket ONE carry row = latest right row from earlier buckets.
    def kb_pk(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("_key"), dtype=np.int64)
        bk = np.asarray(b.column("_bucket"), dtype=np.int64)
        h = ((k * np.int64(-7046029254386353131))
             ^ (bk * np.int64(-7046029254386353131 ^ -1))) >> np.int64(32)
        return b.append_column(
            "pk", pa.array((h % num_partitions).astype(np.int32)))

    def right_summaries(g: pd.DataFrame) -> pd.DataFrame:
        sort_cols = (["_key", "_bucket", "_ts"]
                     + (["_rid"] if "_rid" in g.columns else []))
        g = g.sort_values(sort_cols, kind="mergesort")
        return g.drop_duplicates(subset=["_key", "_bucket"], keep="last")

    summ = (r.map_batches(kb_pk, batch_format="pyarrow")
            .groupby("pk").map_groups(arrow_clean(right_summaries),
                                      batch_format="pandas")
            .drop_columns(["pk"]))

    def left_buckets(g: pd.DataFrame) -> pd.DataFrame:
        return (g[["_key", "_bucket"]]
                .drop_duplicates(["_key", "_bucket"]))

    lb = (l.map_batches(kb_pk, batch_format="pyarrow")
          .groupby("pk").map_groups(arrow_clean(left_buckets),
                                      batch_format="pandas"))

    # bucket-level as-of (STRICT <: in-bucket rights are already local)
    def carry_part(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["_cside"] == 0].sort_values("_bucket", kind="mergesort")
        rf = g[g["_cside"] == 1].sort_values("_bucket", kind="mergesort")
        if lf.empty or rf.empty:
            return rf.head(0).drop(columns=["_cside"])
        merged = pd.merge_asof(
            lf[["_key", "_bucket"]].reset_index(drop=True),
            rf.drop(columns=["_cside"]).rename(
                columns={"_bucket": "_rbucket"}).reset_index(drop=True)
            .rename(columns={"_rbucket": "_bucket"}),
            on="_bucket", by="_key",
            direction="backward", allow_exact_matches=False)
        merged = merged[merged["_side"].notna()]  # buckets with a carry
        return merged

    def tag_cside(side: int):
        def f(b: pa.Table) -> pa.Table:
            k = np.asarray(b.column("_key"), dtype=np.int64)
            out = b.append_column(
                "pk", pa.array(_key_pk(k, num_partitions)))
            return out.append_column(
                "_cside", pa.array([side] * b.num_rows, pa.int8()))
        return f

    lb_t = lb.map_batches(tag_cside(0), batch_format="pyarrow")
    # align schemas for union: lb lacks the payload columns
    payload_cols = (["_ts", "_side"] + left_cols + right_cols
                    + (["_rid"] if right_id else []))

    def widen_lb(b: pa.Table) -> pa.Table:
        cols = {"_key": b.column("_key"), "_bucket": b.column("_bucket"),
                "pk": b.column("pk"), "_cside": b.column("_cside")}
        sch = {"_ts": ltypes[ts_left], "_side": pa.int8(),
               "_rid": pa.int64()}
        for c in payload_cols:
            t = sch.get(c) or rtypes.get(c) or ltypes.get(c)
            cols[c] = pa.nulls(b.num_rows, t)
        return pa.table(cols)

    lb_t = lb_t.map_batches(widen_lb, batch_format="pyarrow")
    summ_t = summ.map_batches(tag_cside(1), batch_format="pyarrow")

    # Restore the exact arrow schema of tag_right's output (pandas
    # null-mixing upgraded ints to float64 inside the carry group) so
    # the final union's blocks agree.
    def fix_carry(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        cols = {"_key": pa.array(df["_key"].astype("int64")),
                "_ts": pa.Array.from_pandas(
                    df["_ts"]).cast(ltypes[ts_left]),
                "_side": pa.array([1] * n, pa.int8())}
        for c in left_cols:
            cols[c] = pa.nulls(n, ltypes[c])
        for c in right_cols:
            s = df[c]
            if pa.types.is_integer(rtypes[c]):
                s = s.astype("Int64")
            cols[c] = pa.Array.from_pandas(s).cast(rtypes[c])
        if right_id:
            cols["_rid"] = pa.Array.from_pandas(
                df["_rid"].astype("Int64")).cast(pa.int64())
        cols["_bucket"] = pa.array(df["_bucket"].astype("int64"))
        return pa.table(cols)

    carries = (lb_t.union(summ_t)
               .groupby("pk")
               .map_groups(arrow_clean(carry_part), batch_format="pandas")
               .map_batches(fix_carry, batch_format="pandas",
                            batch_size=None))

    # final: left + in-bucket right + carry rows, merged per (key,bucket)
    all_rows = (l.union(r).union(carries)
                .map_batches(kb_pk, batch_format="pyarrow"))
    return (all_rows.groupby("pk")
            .map_groups(arrow_clean(merge_part),
                        batch_format="pandas"))


def range_join(
    left_ds,
    right_ds,
    key_left: str,
    key_right: str,
    ts_left: str,
    lo_right: str,
    hi_right: str,
    left_cols: list[str],
    right_cols: list[str],
    num_partitions: int = _PARTITIONS,
    bucket_us: int | None = None,
):
    """→ Dataset(left_cols..., right_cols...) — interval (range) join:
    a left point row matches EVERY right interval row with the same
    key and ``lo <= ts < hi`` (half-open; SQL twin
    ``ts >= lo AND ts < hi``).  Inner join — unmatched rows drop.
    ts/lo/hi may be timestamps or ints (compared as int64 µs).

    Shape: the same fixed-partition union+groupby as :func:`asof_join`
    — both sides tagged with pk = hash(key) % P, ONE vectorized pandas
    merge+filter per partition (never per key).  Partitioning
    assumption: intervals-per-key is bounded (a dim-like side) — the
    in-partition merge materializes |points_k| × |intervals_k| rows
    per key before the bound filter.

    ``bucket_us`` is the hot-key escape hatch (the asof-salting
    analog, IMPLEMENTED): each interval explodes to every ts bucket
    of width ``bucket_us`` it covers, each point lands in exactly ONE
    bucket, and the partition key becomes hash(key, bucket) — a hot
    key's points spread across time, the per-partition merge only
    pairs a point with intervals overlapping its own bucket, and no
    match can be emitted twice (one bucket per point).  Interval
    replication = ceil(span / bucket_us) rows per interval — size
    ``bucket_us`` near the typical interval span."""
    right_schema = right_ds.schema()
    rtypes = dict(zip(right_schema.names, right_schema.types))
    left_schema = left_ds.schema()
    ltypes = dict(zip(left_schema.names, left_schema.types))

    salted = bucket_us is not None

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        ts = b.column(ts_left).cast(pa.int64())
        cols = {"_key": b.column(key_left).cast(pa.int64()),
                "_ts": ts,
                "_lo": pa.nulls(n, pa.int64()),
                "_hi": pa.nulls(n, pa.int64()),
                "_side": pa.array([0] * n, pa.int8())}
        if salted:
            cols["_bucket"] = pa.array(
                np.asarray(ts, dtype=np.int64) // bucket_us, pa.int64())
        for c in left_cols:
            cols[c] = b.column(c)
        for c in right_cols:
            cols[c] = pa.nulls(n, rtypes[c])
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        lo = b.column(lo_right).cast(pa.int64())
        hi = b.column(hi_right).cast(pa.int64())
        cols = {"_key": b.column(key_right).cast(pa.int64()),
                "_ts": pa.nulls(n, pa.int64()),
                "_lo": lo,
                "_hi": hi,
                "_side": pa.array([1] * n, pa.int8())}
        for c in left_cols:
            cols[c] = pa.nulls(n, ltypes[c])
        for c in right_cols:
            cols[c] = b.column(c)
        t = pa.table(cols)
        if not salted:
            return t
        # explode each interval to every covered bucket (vectorized):
        # bucket floor(lo/B) .. floor((hi-1)/B); empty (lo >= hi)
        # intervals drop (they can match no half-open point anyway)
        lo_np = np.asarray(lo, dtype=np.int64)
        hi_np = np.asarray(hi, dtype=np.int64)
        b0 = lo_np // bucket_us
        b1 = np.maximum((hi_np - 1) // bucket_us, b0)
        reps = np.where(hi_np > lo_np, b1 - b0 + 1, 0)
        idx = np.repeat(np.arange(n), reps)
        offs = np.concatenate([np.arange(r) for r in reps]) \
            if len(idx) else np.empty(0, dtype=np.int64)
        t = t.take(pa.array(idx, pa.int64()))
        return t.append_column(
            "_bucket", pa.array(b0[idx] + offs, pa.int64()))

    int_cols = (
        [c for c in left_cols if pa.types.is_integer(ltypes[c])]
        + [c for c in right_cols if pa.types.is_integer(rtypes[c])]
    )
    out_cols = left_cols + right_cols

    join_on = ["_key", "_bucket"] if salted else ["_key"]

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["_side"] == 0]
        rf = g[g["_side"] == 1]
        if lf.empty or rf.empty:
            m = lf.head(0)[out_cols].copy()
        else:
            m = lf[join_on + ["_ts"] + left_cols].merge(
                rf[join_on + ["_lo", "_hi"] + right_cols], on=join_on)
            m = m[(m["_ts"] >= m["_lo"])
                  & (m["_ts"] < m["_hi"])][out_cols].copy()
        # nullable ints: the union frame floats int columns (nulls on
        # the other side) — same restore as asof_join
        for c in int_cols:
            m[c] = m[c].astype("Int64")
        return m

    l = left_ds.map_batches(tag_left, batch_format="pyarrow")
    r = right_ds.map_batches(tag_right, batch_format="pyarrow")

    def add_pk(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("_key"), dtype=np.int64)
        if salted:
            bk = np.asarray(b.column("_bucket"), dtype=np.int64)
            h = ((k * np.int64(-7046029254386353131))
                 ^ (bk * np.int64(-7046029254386353131 ^ -1))
                 ) >> np.int64(32)
            return b.append_column(
                "pk", pa.array((h % num_partitions).astype(np.int32)))
        return b.append_column(
            "pk", pa.array(_key_pk(k, num_partitions)))

    return (l.union(r)
            .map_batches(add_pk, batch_format="pyarrow")
            .groupby("pk")
            .map_groups(arrow_clean(merge_part),
                        batch_format="pandas"))


def _value_set(keys) -> pa.Array:
    """Broadcast key collection → Arrow value set for ``pc.is_in``
    (vectorized membership — never a per-row Python ``in`` loop)."""
    if isinstance(keys, pa.Array):
        return keys
    return pa.array(sorted(keys))


def semi_join_broadcast(ds, key_col: str, keys_ref):
    """Keep rows whose key is in the broadcast set (``ray.put`` once)."""
    import ray

    def f(b: pa.Table) -> pa.Table:
        vs = _value_set(ray.get(keys_ref))
        return b.filter(pc.is_in(b.column(key_col), value_set=vs))

    return ds.map_batches(f, batch_format="pyarrow")


def anti_join_broadcast(ds, key_col: str, keys_ref):
    """Drop rows whose key is in the broadcast set."""
    import ray

    def f(b: pa.Table) -> pa.Table:
        vs = _value_set(ray.get(keys_ref))
        return b.filter(pc.invert(
            pc.is_in(b.column(key_col), value_set=vs)))

    return ds.map_batches(f, batch_format="pyarrow")
