"""Domain-mixture resampling — reweight a corpus toward target source
proportions with a DETERMINISTIC per-row hash test (reproducible across
runs, cluster layouts and resumes; no RNG state anywhere).

The LLM-data use case: given per-source target weights (e.g. "40‰ of
the training mix should be src0"), keep each source at the rate that
realizes its target share of the ORIGINAL corpus size, capped at
keep-everything.  All math is integer (permille weights, floor
division, an LCG hash) so a SQL twin can reproduce the exact row set.

Scale shape: per-source counts are map-side partials folded on the
driver (bounded by #sources × #blocks — sources are a small dimension,
the same bounded contract as the 25-nation broadcast); the resample
itself is a pure streaming filter map — zero shuffles.

Hash: ``((doc_id * 1103515245 + 12345) % 2^31) % 1000 < rate`` — the
classic LCG step, exact in int64 for ids below ~8.3e9; beyond that,
pre-fold ids with a modulus on both engine and oracle sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_LCG_A = np.int64(1103515245)
_LCG_C = np.int64(12345)
_LCG_M = np.int64(2147483648)


def source_counts(ds, source_col: str = "source") -> dict:
    """Per-source row counts via map-side partials + driver fold —
    shuffle-free (the partial stream is ≤ blocks × sources rows)."""

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([source_col]).group_by(source_col).aggregate(
            [([], "count_all")])
        return pa.table({source_col: t.column(source_col),
                         "n": t.column("count_all").cast(pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    out: dict = {}
    for r in rows:
        out[r[source_col]] = out.get(r[source_col], 0) + int(r["n"])
    return out


def mixture_rates(counts: dict, weights_permille: dict) -> dict:
    """Target weights (permille of the ORIGINAL corpus total) →
    per-source keep rate in permille, integer-exact:
    ``rate_s = min(1000, w_s · T // n_s)``.  Sources absent from
    ``weights_permille`` get rate 0 (dropped)."""
    total = sum(counts.values())
    rates = {}
    for src, n in counts.items():
        w = int(weights_permille.get(src, 0))
        rates[src] = min(1000, (w * total) // n) if n else 0
    return rates


def mixture_resample(ds, weights_permille: dict,
                     id_col: str = "doc_id",
                     source_col: str = "source"):
    """→ ds rows surviving the deterministic mixture resample (full
    schema preserved).  Two passes over the input: a shuffle-free
    count pass, then a pure filter map — the plan stays streaming."""
    rates = mixture_rates(source_counts(ds, source_col),
                          weights_permille)

    def f(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), dtype=np.int64)
        src = b.column(source_col).to_pandas()
        rate = src.map(rates).fillna(0).to_numpy(dtype=np.int64)
        h = ((ids * _LCG_A + _LCG_C) % _LCG_M) % np.int64(1000)
        return b.filter(pa.array(h < rate))

    return ds.map_batches(f, batch_format="pyarrow")


# independent LCG stream for named splits — REUSING the resample
# stream (_LCG_A) would correlate the keep-test with the split
# boundaries and bias any split applied after a resample; the export
# shard/order streams (22695477 / 1103515245) are likewise avoided
_SPLIT_A, _SPLIT_C = np.int64(69069), np.int64(1)


def corpus_split(ds, fractions_permille: dict | None = None,
                 id_col: str = "doc_id", split_col: str = "split"):
    """→ ds + ``split_col`` — deterministic named train/val/test split
    by cumulative permille ranges over an independent LCG hash of the
    id.  Pure map (zero shuffles), bit-reproducible across runs /
    layouts / resumes, and integer-exact so the SQL twin reproduces
    the exact assignment.  Fractions must sum to 1000 permille (every
    doc belongs to exactly one split)."""
    fr = fractions_permille or {"train": 980, "val": 10, "test": 10}
    if sum(fr.values()) != 1000:
        raise ValueError(f"fractions sum {sum(fr.values())} != 1000")
    names = list(fr)
    bounds = np.cumsum([fr[n] for n in names]).astype(np.int64)

    def f(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column(id_col), dtype=np.int64)
        h = ((ids * _SPLIT_A + _SPLIT_C) % _LCG_M) % np.int64(1000)
        idx = np.searchsorted(bounds, h, side="right")
        return b.append_column(
            split_col,
            pa.array(np.array(names, dtype=object)[idx], pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")
