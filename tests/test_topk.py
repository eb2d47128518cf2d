"""Top-k operators (no global sort)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from arabic_ocr_ray.functions.topk import grouped_topk, topk


def _tbl(n=500, seed=3):
    rng = np.random.RandomState(seed)
    return pa.table({
        "grp": pa.array([f"g{int(i)}" for i in rng.randint(0, 7, n)]),
        "key": pa.array(range(n), pa.int64()),
        "val": pa.array(rng.rand(n) * 100, pa.float64()),
    })


def test_topk_global(ray_session):
    import ray.data as rd

    t = _tbl()
    out = topk(rd.from_arrow(t).repartition(8), "val", 10,
               tie_cols=("key",))
    exp = (t.to_pandas().sort_values(["val", "key"],
                                     ascending=[False, True])
           .head(10).reset_index(drop=True))
    pd.testing.assert_frame_equal(out, exp[out.columns])


def test_topk_tree_combine(ray_session):
    """The driver must see ≤ combine_partitions × k rows regardless of
    block count — and the answer must match a plain sort."""
    import ray.data as rd

    t = _tbl(n=2000, seed=9)
    for parts in (1, 3, 16):
        out = topk(rd.from_arrow(t).repartition(40), "val", 5,
                   tie_cols=("key",), combine_partitions=parts)
        exp = (t.to_pandas().sort_values(["val", "key"],
                                         ascending=[False, True])
               .head(5).reset_index(drop=True))
        pd.testing.assert_frame_equal(out, exp[out.columns])


def test_grouped_topk(ray_session):
    import ray.data as rd

    t = _tbl()
    out = (grouped_topk(rd.from_arrow(t).repartition(8), ["grp"],
                        "val", 3, tie_cols=("key",))
           .to_pandas().sort_values(["grp", "rank"])
           .reset_index(drop=True))
    df = t.to_pandas().sort_values(["val", "key"],
                                   ascending=[False, True])
    exp = df.groupby("grp", sort=False).head(3)
    exp = exp.assign(rank=(exp.groupby("grp", sort=False).cumcount()
                           + 1).astype("int64"))
    exp = exp.sort_values(["grp", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[exp.columns], exp)
