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

import pandas as pd
import pyarrow as pa

from .arrowout import arrow_clean
from .parthash import partition_ids

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
         tie_cols: tuple = (), combine_partitions: int = 8):
    """Global top-k → small pandas DataFrame (≤ k rows).

    Two combine levels: per-block partials → one fixed-width
    repartition + per-block head (tree combine) → driver head.  The
    driver sees ≤ ``combine_partitions × k`` rows regardless of input
    block count (at ~10⁶ blocks / 100 TB, a single-level combine would
    ship blocks × k ≈ 10⁷ rows to the driver)."""
    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            _sorted_head(b.to_pandas(), (), sort_col, k, descending,
                         tie_cols), preserve_index=False
        ).replace_schema_metadata(None)

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .repartition(combine_partitions)  # ≤ k×blocks tiny rows
              .map_batches(partial, batch_format="pyarrow")
              .to_pandas())  # ≤ k × combine_partitions rows
    return (_sorted_head(merged, (), sort_col, k, descending, tie_cols)
            .reset_index(drop=True))


def grouped_topk(ds, group_cols, sort_col: str, k: int,
                 descending: bool = True, tie_cols: tuple = (),
                 num_partitions: int = _PARTITIONS,
                 with_rank: bool = True):
    """→ Dataset(group_cols..., other cols..., rank) — top-k rows per
    group.  Shuffle key: ``parthash(group cols) % num_partitions`` over
    the ≤ blocks × groups × k partial rows only."""
    group_cols = list(group_cols)

    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            _sorted_head(b.to_pandas(), group_cols, sort_col, k,
                         descending, tie_cols), preserve_index=False
        ).replace_schema_metadata(None)

    def add_pk(b: pa.Table) -> pa.Table:
        pk = partition_ids([b.column(c) for c in group_cols],
                           num_partitions)
        return b.append_column("pk", pk)

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
