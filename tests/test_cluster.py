"""Integer-exact distributed k-means: brute-force Lloyd oracle
parity, partitioning invariance, quantization/trunc-div contracts."""
import numpy as np
import pyarrow as pa
import pytest

from arabic_ocr_ray.functions.cluster import (
    QUANT,
    _assign,
    _trunc_div,
    kmeans_cluster_stats,
    kmeans_exact,
)


def _brute_kmeans(V: np.ndarray, ids: np.ndarray, k: int,
                  n_iter: int):
    """Single-process Lloyd with the exact same integer contract
    (quantize → assign(ties→low cluster) → truncated-mean update,
    empty keeps previous) — the oracle the distributed fold must
    match bit-for-bit."""
    Eq = np.floor(V.astype(np.float64) * QUANT + 0.5).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    C = Eq[order[:k]].copy()
    for _ in range(n_iter):
        d2 = ((Eq[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        newC = C.copy()
        for c in range(k):
            m = a == c
            if m.any():
                s = Eq[m].sum(axis=0)
                n = int(m.sum())
                newC[c] = np.sign(s) * (np.abs(s) // n)
        C = newC
    d2 = ((Eq[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    return a, d2[np.arange(len(a)), a], C


def _vec_table(V: np.ndarray, ids) -> pa.Table:
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in V],
                              pa.list_(pa.float32())),
    })


def test_trunc_div_matches_duckdb_semantics():
    s = np.array([-7, 7, -8, 8, 0, -1], dtype=np.int64)
    n = np.array([2, 2, 3, 3, 5, 2], dtype=np.int64)
    assert _trunc_div(s, n).tolist() == [-3, 3, -2, 2, 0, 0]


def test_assign_tie_breaks_to_lowest_cluster():
    Eq = np.array([[0, 0]], dtype=np.int64)
    C = np.array([[1, 0], [0, 1]], dtype=np.int64)  # equidistant
    a, d2 = _assign(Eq, C)
    assert a.tolist() == [0] and d2.tolist() == [1]


@pytest.mark.usefixtures("ray_session")
def test_kmeans_matches_brute_oracle_and_partitioning():
    import ray.data as rd

    rng = np.random.default_rng(11)
    V = rng.normal(0, 0.2, size=(120, 8)).astype(np.float32)
    V[:40] += 0.8  # three loose groups
    V[40:80] -= 0.8
    ids = rng.permutation(120).astype(np.int64)
    t = _vec_table(V, ids)

    want_a, want_d2, want_C = _brute_kmeans(V, ids, k=3, n_iter=2)
    for parts in (1, 7):
        ds = rd.from_arrow(t).repartition(parts)
        assign, C = kmeans_exact(ds, n_clusters=3, n_iter=2)
        assert (C == want_C).all()
        got = {r["vec_id"]: (r["cluster_id"], r["d2"])
               for r in assign.take_all()}
        for i, vid in enumerate(ids):
            assert got[int(vid)] == (int(want_a[i]), int(want_d2[i]))


@pytest.mark.usefixtures("ray_session")
def test_kmeans_empty_cluster_keeps_previous_centroid():
    import ray.data as rd

    # two far groups, k=3: the seed centroid stranded between them
    # captures nothing after iter 1 and must keep its coordinates
    V = np.array([[0.0, 0.0], [0.01, 0.0], [0.5, 0.5],
                  [0.49, 0.5], [0.5, 0.49]], dtype=np.float32)
    ids = np.array([2, 3, 10, 11, 12], dtype=np.int64)
    want_a, want_d2, want_C = _brute_kmeans(V, ids, k=3, n_iter=3)
    assign, C = kmeans_exact(rd.from_arrow(_vec_table(V, ids)),
                             n_clusters=3, n_iter=3)
    assert (C == want_C).all()
    got = {r["vec_id"]: r["cluster_id"] for r in assign.take_all()}
    assert got == {int(i): int(a) for i, a in zip(ids, want_a)}


@pytest.mark.usefixtures("ray_session")
def test_kmeans_stats_and_guard():
    import ray.data as rd

    rng = np.random.default_rng(3)
    V = rng.normal(size=(30, 4)).astype(np.float32)
    ids = np.arange(30, dtype=np.int64)
    stats = kmeans_cluster_stats(
        rd.from_arrow(_vec_table(V, ids)), n_clusters=4,
        n_iter=2).to_pandas()
    assert stats["n_vecs"].sum() == 30
    want_a, want_d2, _ = _brute_kmeans(V, ids, k=4, n_iter=2)
    want = {c: (int((want_a == c).sum()),
                int(want_d2[want_a == c].sum()))
            for c in set(want_a.tolist())}
    got = {int(r.cluster_id): (int(r.n_vecs), int(r.inertia))
           for r in stats.itertuples()}
    assert got == want

    with pytest.raises(ValueError, match="n_clusters"):
        kmeans_exact(rd.from_arrow(_vec_table(V[:2], ids[:2])),
                     n_clusters=5)
