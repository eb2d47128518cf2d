"""Similarity search over an embedding column (list<float>).

Two paths:
  - :func:`knn_bruteforce` — exact cosine top-k: the query matrix is
    broadcast once (``ray.put``), every batch does one numpy matmul
    against it, per-batch top-k partials are merged by a final
    per-query groupby (map-side combine → tiny shuffle).  The baseline
    and the oracle-checkable path.
  - :func:`knn_ivf` — IVF-style approximate: coarse centroids from a
    seeded sample (k-means-lite), every vector assigned to its nearest
    centroid (one shuffle key = centroid id), queries probe the
    ``nprobe`` nearest centroid partitions only.  The 100 TB path:
    probing replaces the full scan.

Determinism: similarities are computed in float64 and ROUNDED to 9
decimals before ranking, ties broken by ascending neighbor id — so
numpy's pairwise-summed dot products and an oracle's sequential sums
cannot disagree on ranks unless two sims collide within 5e-10 (then
the id tie-break decides identically on both sides).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(E: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(E, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return E / norms


def _merge_topk(k: int):
    """Final per-query top-k merge: sort by (sim desc, neighbor asc),
    head k, 1-based rank — the single tie-break/rank definition shared
    by the exact and IVF paths so they can never silently diverge."""
    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos_x1e9", "neighbor_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g
    return merge


def gather_vectors(ds, ids, id_col: str = "vec_id",
                   col: str = "embedding") -> dict:
    """Fetch a handful of vectors by id WITHOUT streaming the table to
    the driver: a distributed filter (broadcast id-set, `ray.put` once)
    runs next to the data and only the ≤ |ids| matching rows come back
    (`take_all` of the tiny filtered result)."""
    import ray

    idset_ref = ray.put(set(ids))

    def pick(b: pa.Table) -> pa.Table:
        wanted = ray.get(idset_ref)
        mask = [i in wanted for i in b.column(id_col).to_pylist()]
        return b.filter(pa.array(mask))

    rows = (ds.select_columns([id_col, col])
            .map_batches(pick, batch_format="pyarrow").take_all())
    return {r[id_col]: r[col] for r in rows}


def knn_bruteforce(ds, query_ids: list[int], k: int = 5,
                   id_col: str = "vec_id", col: str = "embedding"):
    """→ Dataset(query_id, neighbor_id, rank, cos_x1e9) — exact top-k
    cosine for each query id (self excluded)."""
    import ray

    # gather the query vectors (tiny, distributed filter) and broadcast
    qvecs = gather_vectors(ds, query_ids, id_col, col)
    qids = sorted(qvecs)
    Q = _normalize(np.array([qvecs[i] for i in qids], dtype=np.float64))
    qref = ray.put((qids, Q))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids_, Q_ = ray.get(qref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        E = _normalize(np.array(batch.column(col).to_pylist(),
                                dtype=np.float64))
        S = np.round(Q_ @ E.T, 9)  # (q, batch)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids_):
            row = S[qi]
            mask = ids != qid
            cand_ids = ids[mask]
            cand_s = row[mask]
            # per-batch combine: keep only local top-k
            order = np.lexsort((cand_ids, -cand_s))[:len(cand_ids)][: k]
            out_q.extend([qid] * len(order))
            out_n.extend(cand_ids[order].tolist())
            out_s.extend(cand_s[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cos_x1e9": pa.array([int(round(s * 1e9)) for s in out_s],
                                 pa.int64()),
        })

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    return partials.groupby("query_id").map_groups(
        _merge_topk(k), batch_format="pandas")


def kmeans_lite(E: np.ndarray, n_clusters: int, n_iter: int = 25,
                seed: int = 0xC3) -> np.ndarray:
    """Seeded k-means on a sample — coarse IVF centroids.

    k-means++ seeding (next centroid drawn ∝ squared cosine distance
    to the nearest chosen one) + empty-cluster reseeding to the
    farthest point: both are what lifted measured recall on clustered
    data from ~0.68 (uniform random init, 10 iters) to ≥0.9."""
    rng = np.random.RandomState(seed)
    n_clusters = min(n_clusters, len(E))
    # -- k-means++ init ----------------------------------------------------
    first = int(rng.randint(len(E)))
    C = [E[first]]
    d2 = np.maximum(0.0, 1.0 - E @ C[0])  # cosine distance to nearest
    for _ in range(1, n_clusters):
        p = d2 * d2
        tot = p.sum()
        if tot <= 0:
            i = int(rng.randint(len(E)))
        else:
            i = int(np.searchsorted(np.cumsum(p / tot), rng.random_sample()))
            i = min(i, len(E) - 1)
        C.append(E[i])
        d2 = np.minimum(d2, np.maximum(0.0, 1.0 - E @ C[-1]))
    C = np.array(C)
    # -- Lloyd iterations --------------------------------------------------
    for _ in range(n_iter):
        sims = E @ C.T
        assign = np.argmax(sims, axis=1)
        worst = np.argsort(sims[np.arange(len(E)), assign])  # farthest first
        wi = 0
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = E[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
            else:  # empty cluster: reseed to the current farthest point
                C[c] = E[worst[wi]]
                wi += 1
    return C


def knn_ivf(ds, query_ids: list[int], k: int = 5, n_clusters: int = 16,
            nprobe: int | None = None, sample_limit: int = 4096,
            id_col: str = "vec_id", col: str = "embedding"):
    """IVF-bucketed approximate top-k: centroids ← seeded sample;
    vectors partitioned by nearest centroid (groupby key = ivf_cell);
    each query scans only its ``nprobe`` closest cells.

    ``nprobe`` defaults adaptively (the FAISS-style rule): when the
    whole table fits inside the centroid sample there is nothing to
    prune — probing every cell costs the same as one scan and makes
    the answer EXACT (partitioned brute force; asserted equal to
    :func:`knn_bruteforce` in tests and against the driver's exact-kNN
    SQL oracle).  At scale the default is half the cells — the
    measured recall/cost knob (tests gate recall ≥ 0.9 on clustered
    data at nprobe = C/4)."""
    import ray

    sample = ds.select_columns([id_col, col]).limit(sample_limit)
    rows = sample.take_all()
    if nprobe is None:
        nprobe = (n_clusters if len(rows) < sample_limit
                  else max(1, n_clusters // 2))
    ids_s = [r[id_col] for r in rows]
    E_s = _normalize(np.array([r[col] for r in rows], dtype=np.float64))
    C = kmeans_lite(E_s, n_clusters)

    qset = set(query_ids)
    qvecs = {i: v for i, v in zip(ids_s, E_s) if i in qset}
    missing = qset - set(qvecs)
    if missing:  # queries outside the sample: distributed filter fetch
        fetched = gather_vectors(ds, missing, id_col, col)
        for i, v in fetched.items():
            qvecs[i] = _normalize(np.asarray([v], dtype=np.float64))[0]
    qids = sorted(qvecs)
    Q = np.array([qvecs[i] for i in qids])
    probe = np.argsort(-np.round(Q @ C.T, 9), axis=1)[:, :nprobe]
    cell_to_queries: dict[int, list[int]] = {}
    for qi, cells in enumerate(probe):
        for c in cells:
            cell_to_queries.setdefault(int(c), []).append(qi)
    ref = ray.put((qids, Q, C, cell_to_queries))

    def assign_and_score(batch: pa.Table) -> pa.Table:
        qids_, Q_, C_, c2q = ray.get(ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        E = _normalize(np.array(batch.column(col).to_pylist(),
                                dtype=np.float64))
        cell = np.argmax(E @ C_.T, axis=1)
        out_q, out_n, out_s = [], [], []
        for c, qlist in c2q.items():
            m = cell == c
            if not m.any():
                continue
            sub_ids = ids[m]
            S = np.round(Q_[qlist] @ E[m].T, 9)
            for row, qi in zip(S, qlist):
                qid = qids_[qi]
                keep = sub_ids != qid
                order = np.lexsort((sub_ids[keep], -row[keep]))[:k]
                out_q.extend([qid] * len(order))
                out_n.extend(sub_ids[keep][order].tolist())
                out_s.extend(row[keep][order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "cos_x1e9": pa.array([int(round(s * 1e9)) for s in out_s],
                                 pa.int64()),
        })

    partials = ds.map_batches(assign_and_score, batch_format="pyarrow")
    return partials.groupby("query_id").map_groups(
        _merge_topk(k), batch_format="pandas")
