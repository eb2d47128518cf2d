"""Join operators beyond ``Dataset.join``.

- :func:`asof_join` — as-of (backward) join: for each left row, the
  latest right row with the same key and ``right_ts <= left_ts``.
  Ray Data has no ASOF join; the engine composes one from the
  documented pattern (ray_guide): tag both sides, align schemas, union,
  ``groupby(key).map_groups`` with ``pandas.merge_asof`` inside each
  group.  Partitioning assumption: one key's rows fit in one group
  task (salt hot keys into (key, ts-range) sub-buckets and stitch at
  the boundary when they don't).  Deterministic under ts ties: the
  right side is deduplicated to one row per (key, ts) keeping the
  highest ``right_id`` before the merge (pandas would keep an
  arbitrary-but-stable last; DuckDB's ASOF picks an unspecified one —
  dedup makes both sides agree).

- :func:`semi_join_broadcast` / :func:`anti_join_broadcast` — the
  broadcast-key-set filters (no shuffle; the resume anti-filter in
  pipelines/extract.py is the same shape).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


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
):
    """→ Dataset(left_cols..., right_cols... (nullable)) — backward
    as-of join (exact matches allowed, ``<=``)."""

    # right-side column types discovered from the schema so nulls on
    # the left align
    right_schema = right_ds.schema()
    rtypes = {n: t for n, t in zip(right_schema.names, right_schema.types)}

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

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["_side"] == 0]
        rf = g[g["_side"] == 1]
        lf = lf.sort_values(["_ts"] + left_cols, kind="mergesort")
        if rf.empty:
            # left rows already carry correctly-typed null right cols
            # from the union schema
            return _restore_ints(lf[left_cols + right_cols].copy())
        sort_cols = ["_ts"] + (["_rid"] if "_rid" in rf.columns else [])
        rf = rf.sort_values(sort_cols, kind="mergesort")
        if "_rid" in rf.columns:
            rf = rf.drop_duplicates(subset=["_ts"], keep="last")
        merged = pd.merge_asof(
            lf[["_ts"] + left_cols].reset_index(drop=True),
            rf[["_ts"] + right_cols].reset_index(drop=True),
            on="_ts", direction="backward", allow_exact_matches=True)
        return _restore_ints(merged.drop(columns=["_ts"]))

    return l.union(r).groupby("_key").map_groups(
        merge, batch_format="pandas")


def semi_join_broadcast(ds, key_col: str, keys_ref):
    """Keep rows whose key is in the broadcast set (``ray.put`` once)."""
    import ray

    def f(b: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        mask = [k in keys for k in b.column(key_col).to_pylist()]
        return b.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")


def anti_join_broadcast(ds, key_col: str, keys_ref):
    """Drop rows whose key is in the broadcast set."""
    import ray

    def f(b: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        mask = [k not in keys for k in b.column(key_col).to_pylist()]
        return b.filter(pa.array(mask))

    return ds.map_batches(f, batch_format="pyarrow")
