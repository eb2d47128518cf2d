"""Distributed integer-exact k-means over an embedding column.

The semantic-clustering step of a curation pipeline (SemDeDup /
cluster-balanced sampling, Abbas et al. 2023): Lloyd's algorithm with
a FIXED iteration count and integer-quantized arithmetic, so the
result is bit-reproducible across partitionings, cluster layouts AND
a fixed-depth SQL unrolling (the DuckDB twin in ``__ray_entry__``
hash-matches it exactly — a rare property for an iterative ML
algorithm, bought by doing every distance/mean in int64).

Scale shape (100 TB contract):
  - The (id, quantized-vector) projection is materialized ONCE
    (``float32 → int64`` is 2× the bytes but read n_iter + 1 times;
    re-decoding the full parquet each Lloyd pass would dominate).
  - Per iteration: centroids broadcast ONCE via ``ray.put`` (K × d
    int64, kilobytes); every batch emits at most K × (d + 1) partial
    rows (per-cluster coordinate sums + counts) folded by ONE keyed
    ``Sum`` — the shuffle is ∝ K × d × num_blocks partials, never
    ∝ corpus.  Assignments themselves never shuffle; the final
    labeling is a pure streaming map off the last centroids.
  - Empty clusters keep their previous centroid (deterministic, and
    exactly mirrorable by the twin's COALESCE).

Quantization/rounding contract (pinned by tests + the twin):
  - quantize: ``floor(float64(x) * Q + 0.5)`` — same double ops both
    sides (DuckDB FLOAT must be cast to DOUBLE first; its default
    FLOAT*INT stays single-precision).
  - centroid mean: TRUNCATED division (DuckDB ``//`` truncates toward
    zero; numpy's ``//`` floors, so the engine mirrors truncation
    explicitly).
  - distance ties: lowest cluster id wins (np.argmin first-hit).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

QUANT = 1_000_000  # int64 head-room: d * (2*|x|*Q)^2 must stay < 2^63


def quantize_batch(b: pa.Table, id_col: str, vec_col: str) -> pa.Table:
    """→ (id, e list<int64>): the exact-arithmetic projection."""
    from .ann import vectors_matrix

    E = vectors_matrix(b.column(vec_col)).astype(np.float64)
    Eq = np.floor(E * QUANT + 0.5).astype(np.int64)
    return pa.table({
        id_col: b.column(id_col),
        "e": pa.array(list(Eq), pa.list_(pa.int64())),
    })


def _trunc_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """int64 division truncating toward zero (DuckDB ``//``)."""
    return (np.sign(s) * (np.abs(s) // n)).astype(np.int64)


def _assign(Eq: np.ndarray, C: np.ndarray) -> tuple:
    """→ (cluster index per row, squared distance per row), exact
    int64: |e|² - 2 e·Cᵀ + |c|², ties → lowest cluster index."""
    d2 = (
        (Eq * Eq).sum(axis=1, dtype=np.int64)[:, None]
        - 2 * (Eq @ C.T)
        + (C * C).sum(axis=1, dtype=np.int64)[None, :]
    )
    a = np.argmin(d2, axis=1)
    return a, d2[np.arange(len(a)), a]


def kmeans_exact(ds, n_clusters: int = 8, n_iter: int = 2,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
    """Distributed Lloyd's k-means, integer-exact.

    Init: the quantized vectors of the ``n_clusters`` smallest ids,
    cluster index = rank of the id (deterministic, twinnable — a
    seeded random init would be neither).  Returns
    ``(assignments Dataset (id, cluster_id, d2), centroids int64
    (K, d))`` where assignments reflect the FINAL centroids."""
    import ray
    from ray.data.aggregate import Sum

    dsq = (ds.select_columns([id_col, vec_col])
           .map_batches(lambda b: quantize_batch(b, id_col, vec_col),
                        batch_format="pyarrow")
           .materialize())  # read n_iter+1 times; decode once

    # --- deterministic init: K smallest ids, in id order ------------
    from .topk import topk

    seeds = (topk(dsq, id_col, n_clusters, descending=False,
                  tie_cols=())
             .sort_values(id_col).reset_index(drop=True))
    if len(seeds) < n_clusters:
        raise ValueError(
            f"k-means needs >= n_clusters={n_clusters} vectors, "
            f"got {len(seeds)}")
    C = np.asarray([np.asarray(e, dtype=np.int64)
                    for e in seeds["e"]], dtype=np.int64)
    dim = C.shape[1]

    for _ in range(n_iter):
        c_ref = ray.put(C)

        def partials(b: pa.Table, _ref=c_ref) -> pa.Table:
            Cb = ray.get(_ref)
            Eq = np.asarray(
                [np.asarray(x, dtype=np.int64)
                 for x in b.column("e").to_pylist()], dtype=np.int64
            ).reshape(b.num_rows, -1)
            a, _ = _assign(Eq, Cb)
            ks, inv = np.unique(a, return_inverse=True)
            sums = np.zeros((len(ks), Eq.shape[1]), dtype=np.int64)
            np.add.at(sums, inv, Eq)
            cnt = np.bincount(inv).astype(np.int64)
            # flatten: dim in [0, d) = coordinate sums; dim = -1 = count
            cl = np.repeat(ks, Eq.shape[1] + 1)
            dm = np.tile(np.arange(-1, Eq.shape[1]), len(ks))
            s = np.concatenate(
                [np.concatenate(([cnt[i]], sums[i])) for i in
                 range(len(ks))]).astype(np.int64)
            return pa.table({"cl": pa.array(cl, pa.int64()),
                             "dm": pa.array(dm, pa.int64()),
                             "s": pa.array(s, pa.int64())})

        rows = (dsq.map_batches(partials, batch_format="pyarrow")
                .groupby(["cl", "dm"])
                .aggregate(Sum("s", alias_name="s"))
                .take_all())  # ≤ K × (d+1) rows by construction
        sums = np.zeros((n_clusters, dim), dtype=np.int64)
        cnts = np.zeros(n_clusters, dtype=np.int64)
        for r in rows:
            if r["dm"] < 0:
                cnts[r["cl"]] = r["s"]
            else:
                sums[r["cl"], r["dm"]] = r["s"]
        nonempty = cnts > 0
        C = C.copy()
        C[nonempty] = _trunc_div(sums[nonempty],
                                 cnts[nonempty][:, None])

    final_ref = ray.put(C)

    def label(b: pa.Table) -> pa.Table:
        Cb = ray.get(final_ref)
        Eq = np.asarray(
            [np.asarray(x, dtype=np.int64)
             for x in b.column("e").to_pylist()], dtype=np.int64
        ).reshape(b.num_rows, -1)
        a, d2 = _assign(Eq, Cb)
        return pa.table({
            id_col: b.column(id_col),
            "cluster_id": pa.array(a.astype(np.int64), pa.int64()),
            "d2": pa.array(d2, pa.int64()),
        })

    return dsq.map_batches(label, batch_format="pyarrow"), C


SIM_QUANT = 1_000          # similarity-side quantization (≠ QUANT)
# int64 headroom for the cross-multiplied cosine test: with
# G = dot(a, b) ≤ d·m² (m = max |quantized coord|), the comparison
# G²·den² ≥ num²·|a|²·|b|² stays exact in int64 iff d·m²·den ≤
# floor(sqrt(2^63 − 1)); both sides are then ≤ (d·m²·den)² < 2^63.
_SIM_HEADROOM = 3_037_000_499
MAX_SEMDEDUP_CLUSTER = 100_000


def semdedup(ds, n_clusters: int = 8, n_iter: int = 2,
             threshold: tuple = (19, 20),
             id_col: str = "vec_id", vec_col: str = "embedding",
             max_cluster: int = MAX_SEMDEDUP_CLUSTER):
    """SemDeDup (Abbas et al. 2023): k-means the embedding space,
    then drop within-cluster semantic near-duplicates by pairwise
    cosine similarity — keep-one per duplicate neighborhood.

    Exact semantics (pinned by tests + the DuckDB twin):
      - clusters/ordering come from :func:`kmeans_exact` (int64,
        quantize 1e6); points in a cluster are ranked by squared
        distance to the FINAL centroid DESC (the paper's
        keep-low-similarity-to-centroid variant), ties → id ASC.
      - a point is dropped iff ANY strictly-earlier point in that
        rank order has cosine ≥ num/den — the upper-triangle max
        test of the reference implementation (order-independent
        given the ranking; earlier points need not be kept).
      - cosine is computed EXACTLY over coordinates re-quantized at
        ``SIM_QUANT`` (floor(x·1000 + 0.5), int64): dropped iff
        dot > 0 and dot²·den² ≥ num²·|a|²·|b|², pure integer — the
        engine and the SQL twin agree bit-for-bit.  A runtime guard
        raises if d·m²·den exceeds the int64 headroom (embeddings
        with |x| ≳ 1.5 at d=64, den=20 — renormalize upstream).

    Scale shape: one similarity projection map (id + 64 int64 ≈
    0.5 kB/row — the raw corpus never shuffles), one id-keyed join
    against the k-means assignments, one cluster-keyed exchange.
    The per-cluster pairwise is intrinsic to SemDeDup (the paper
    runs it on GPUs); parallelism = n_clusters, so size K ∝ corpus
    (the paper uses K = 11k for LAION).  ``max_cluster`` raises —
    never silently truncates — when a cluster is too big for the
    O(n²/K) pairwise; the fix is a larger ``n_clusters``.

    → Dataset (id, cluster_id, kept 0/1) over every input vector.
    """
    import pandas as pd

    from .arrowout import arrow_clean
    from .joins import hash_join

    num, den = int(threshold[0]), int(threshold[1])
    if not (0 < num <= den):
        raise ValueError(f"threshold={threshold!r}: need 0 < num <= den")

    assign, _ = kmeans_exact(ds, n_clusters, n_iter, id_col, vec_col)
    id_type = dict(zip(ds.schema().names, ds.schema().types))[id_col]

    def sim_quant(b: pa.Table) -> pa.Table:
        from .ann import vectors_matrix

        E = vectors_matrix(b.column(vec_col)).astype(np.float64)
        Es = np.floor(E * SIM_QUANT + 0.5).astype(np.int64)
        # Acero hash joins reject nested payload types (the
        # exact_substring lesson) — pack each row's int64 coords as
        # a little-endian binary blob for the id join, unpack with
        # frombuffer in the cluster fold
        return pa.table({
            id_col: b.column(id_col),
            "es": pa.array([r.tobytes() for r in Es], pa.binary()),
        })

    vs = (ds.select_columns([id_col, vec_col])
          .map_batches(sim_quant, batch_format="pyarrow"))
    joined = hash_join(
        assign, vs, on=id_col,
        left_schema=pa.schema([(id_col, id_type),
                               ("cluster_id", pa.int64()),
                               ("d2", pa.int64())]),
        right_schema=pa.schema([(id_col, id_type),
                                ("es", pa.binary())]))

    den2 = den * den
    num2 = num * num

    def cluster_fold(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n > max_cluster:
            raise ValueError(
                f"semdedup cluster of {n} rows exceeds "
                f"max_cluster={max_cluster}; the per-cluster pairwise "
                f"is O(n²) — raise n_clusters so clusters stay bounded")
        g = g.sort_values(["d2", id_col],
                          ascending=[False, True], kind="mergesort")
        E = (np.frombuffer(b"".join(g["es"]), dtype="<i8")
             .reshape(n, -1).astype(np.int64))
        d = E.shape[1]
        m = int(np.abs(E).max()) if n else 0
        if d * m * m * den > _SIM_HEADROOM:
            raise ValueError(
                f"semdedup int64 headroom exceeded: d={d}, max|q|={m}, "
                f"den={den} → d·m²·den > {_SIM_HEADROOM}; renormalize "
                f"embeddings or lower SIM_QUANT")
        n2 = (E * E).sum(axis=1, dtype=np.int64)
        dropped = np.zeros(n, dtype=bool)
        # row-block the Gram products so the buffer stays ≤ ~32 MB;
        # row r only needs columns < r (strict upper-triangle test)
        B = max(1, (1 << 22) // max(n, 1))
        for s in range(1, n, B):
            e = min(n, s + B)
            G = E[s:e] @ E[:e].T                     # ≤ d·m², int64
            cond = (G > 0) & (G * G * den2 >= num2 * np.outer(n2[s:e],
                                                              n2[:e]))
            cond &= np.arange(e)[None, :] < np.arange(s, e)[:, None]
            dropped[s:e] = cond.any(axis=1)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "cluster_id": g["cluster_id"].to_numpy(),
            "kept": (~dropped).astype(np.int64),
        })

    return (joined.groupby("cluster_id")
            .map_groups(arrow_clean(cluster_fold), batch_format="pandas"))


def kmeans_cluster_stats(ds, n_clusters: int = 8, n_iter: int = 2,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding"):
    """→ per-cluster (cluster_id, n_vecs, inertia) after
    ``kmeans_exact`` — the corpus-level diagnostic a curation run
    logs.  One extra K-sized keyed Sum over the assignment stream."""
    from ray.data.aggregate import Count, Sum

    assign, _ = kmeans_exact(ds, n_clusters, n_iter, id_col, vec_col)
    return (assign.groupby("cluster_id")
            .aggregate(Count(alias_name="n_vecs"),
                       Sum("d2", alias_name="inertia")))
