"""Top-k operators without global sorts.

``Dataset.sort().limit(k)`` is an all-to-all shuffle of the whole
table for a k-row answer; these operators move at most
``blocks × groups × k`` partial rows instead:

- :func:`topk` — global top-k: per-block partials → tiny driver merge
  (the `__ray_entry__.q_top_orders` shape, shared here as a library
  operator).
- :func:`grouped_topk` — top-k PER GROUP: per-block per-group partials
  (map-side combine) → fixed-partition final merge keyed on the group
  hash (one vectorized pandas call per partition, never per group).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .arrowout import arrow_clean

_PARTITIONS = 32


def _sorted_head(df: pd.DataFrame, group_cols, sort_col: str, k: int,
                 descending: bool, tie_cols) -> pd.DataFrame:
    df = df.sort_values([sort_col] + list(tie_cols),
                        ascending=[not descending]
                        + [True] * len(tie_cols),
                        kind="mergesort")
    if group_cols:
        return df.groupby(list(group_cols), sort=False).head(k)
    return df.head(k)


def topk(ds, sort_col: str, k: int, descending: bool = True,
         tie_cols: tuple = ()):
    """Global top-k → small pandas DataFrame (≤ k rows)."""
    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            _sorted_head(b.to_pandas(), (), sort_col, k, descending,
                         tie_cols), preserve_index=False
        ).replace_schema_metadata(None)

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .to_pandas())  # ≤ k × blocks rows
    return (_sorted_head(merged, (), sort_col, k, descending, tie_cols)
            .reset_index(drop=True))


def grouped_topk(ds, group_cols, sort_col: str, k: int,
                 descending: bool = True, tie_cols: tuple = (),
                 num_partitions: int = _PARTITIONS,
                 with_rank: bool = True):
    """→ Dataset(group_cols..., other cols..., rank) — top-k rows per
    group.  Shuffle key: ``crc32(group) % num_partitions`` over the
    ≤ blocks × groups × k partial rows only."""
    group_cols = list(group_cols)

    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            _sorted_head(b.to_pandas(), group_cols, sort_col, k,
                         descending, tie_cols), preserve_index=False
        ).replace_schema_metadata(None)

    def add_pk(b: pa.Table) -> pa.Table:
        key = b.column(group_cols[0]).to_pylist()
        for c in group_cols[1:]:
            key = [f"{a}|{x}" for a, x in
                   zip(key, b.column(c).to_pylist())]
        pk = [zlib.crc32(str(x).encode()) % num_partitions for x in key]
        return b.append_column("pk", pa.array(pk, pa.int32()))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["pk"])
        out = _sorted_head(g, group_cols, sort_col, k, descending,
                           tie_cols)
        if with_rank:
            out = out.copy()
            out["rank"] = (out.groupby(group_cols, sort=False)
                           .cumcount() + 1).astype("int64")
        return out

    return (ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(add_pk, batch_format="pyarrow")
            .groupby("pk")
            .map_groups(arrow_clean(final), batch_format="pandas"))
