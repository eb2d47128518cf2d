"""Training-shard export — the pipeline → trainer handoff.

A curated corpus leaves the engine as N deterministic shards, each
internally ordered by a reproducible pseudo-random key, so a training
run reads shuffled data WITHOUT a ``random_shuffle`` all-to-all and
without any RNG state:

- ``shard  = LCG1(id) % n_shards`` — which shard a document lands in;
- in-shard order = ``(LCG2(id), id)`` ascending — the shuffle.

Both hashes are pure integer functions of the document id (the same
no-RNG contract as ``sampling.mixture_resample``), so the layout is
bit-reproducible across runs, cluster layouts and resumes, and the
SQL twin can replicate shard assignment exactly.  String ids fold
through ``zlib.crc32`` first — the PERSISTED-layout convention shared
with the lineage ``part`` column (``state/lineage.py``), NOT the
within-run ``parthash`` module (whose hash is only stable within a
session).

Scale shape: ONE shard-keyed shuffle; each shard sorts locally and
writes exactly one parquet file (atomic tmp → rename).  A shard is
the unit a trainer reads and the unit of resume — rerunning skips
shards whose final file already exists.  Choose ``n_shards`` so a
shard fits a worker (at 100 TB that is 10^5-ish shards, not 8); the
in-memory sort is per-shard, never global.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.arrowout import arrow_clean

# distinct LCG streams (glibc-style multiplier for the shard, the
# classic rand() multiplier for the order key); both mod 2^31 so the
# int64 product never overflows for ids below ~4e11 — beyond that,
# pre-fold ids on both engine and oracle sides
_M = np.int64(2147483648)
_SHARD_A, _SHARD_C = np.int64(22695477), np.int64(1)
_ORDER_A, _ORDER_C = np.int64(1103515245), np.int64(12345)


def _id_ints(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    t = col.type
    if pa.types.is_integer(t):
        return np.asarray(col.cast(pa.int64()), dtype=np.int64)
    # persisted-layout string fold: crc32, the lineage convention
    return np.fromiter(
        (zlib.crc32(s.encode()) for s in col.to_pylist()),
        dtype=np.int64, count=len(col))


def shard_keys(col, n_shards: int) -> tuple[np.ndarray, np.ndarray]:
    """→ (shard, order_key) int64 arrays for an id column."""
    ids = _id_ints(col)
    shard = ((ids * _SHARD_A + _SHARD_C) % _M) % np.int64(n_shards)
    okey = (ids * _ORDER_A + _ORDER_C) % _M
    return shard, okey


def export_training_shards(ds, out_dir: str, n_shards: int = 8,
                           id_col: str = "doc_id",
                           size_col: str | None = None):
    """→ Dataset(shard, n_docs[, sum_<size_col>]) manifest after
    writing ``out_dir/shard=K.parquet`` files.  See module docstring
    for the determinism/resume contract.  Shards with zero documents
    write no file and emit no manifest row."""
    os.makedirs(out_dir, exist_ok=True)
    data_cols = [c for c in ds.schema().names]

    def assign(b: pa.Table) -> pa.Table:
        shard, okey = shard_keys(b.column(id_col), n_shards)
        return (b.append_column("shard", pa.array(shard, pa.int64()))
                 .append_column("__okey", pa.array(okey, pa.int64())))

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        df = df.sort_values(["__okey", id_col],
                            kind="mergesort").reset_index(drop=True)
        k = int(df["shard"].iat[0])
        out = {"shard": [k], "n_docs": [len(df)]}
        if size_col is not None:
            out[f"sum_{size_col}"] = [int(df[size_col].sum())]
        path = os.path.join(out_dir, f"shard={k}.parquet")
        if os.path.exists(path):
            # resume: validate the finished shard against the CURRENT
            # input before skipping — a stale out_dir (input changed
            # between runs) must fail loudly, not survive under a
            # fresh manifest that doesn't describe its contents
            n_existing = pq.read_metadata(path).num_rows
            if n_existing != len(df):
                raise RuntimeError(
                    f"resume mismatch: {path} holds {n_existing} rows "
                    f"but the current input produces {len(df)} for "
                    f"shard {k}; the out_dir is stale — delete it or "
                    "export to a fresh directory")
        else:
            t = pa.Table.from_pandas(df[data_cols],
                                     preserve_index=False)
            tmp = f"{path}.tmp{os.getpid()}"
            pq.write_table(t.replace_schema_metadata(None), tmp)
            os.replace(tmp, path)
        return pd.DataFrame(out)

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("shard", num_partitions=n_shards)
            .map_groups(arrow_clean(write_shard),
                        batch_format="pandas"))
