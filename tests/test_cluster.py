"""Integer-exact distributed k-means: brute-force Lloyd oracle
parity, partitioning invariance, quantization/trunc-div contracts."""
import numpy as np
import pyarrow as pa
import pytest

from arabic_ocr_ray.functions.cluster import (
    QUANT,
    SIM_QUANT,
    _assign,
    _trunc_div,
    kmeans_cluster_stats,
    kmeans_exact,
    semdedup,
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


# --- SemDeDup ---------------------------------------------------------------

def _brute_semdedup(V: np.ndarray, ids: np.ndarray, k: int,
                    n_iter: int, num: int, den: int):
    """Pure-python SemDeDup oracle on the exact integer contract:
    kmeans order = (d2 to final centroid DESC, id ASC); dropped iff
    ANY earlier point has dot > 0 and dot²·den² ≥ num²·|a|²·|b|²
    over SIM_QUANT-quantized coordinates (python ints — no overflow
    by construction)."""
    a, d2, _ = _brute_kmeans(V, ids, k, n_iter)
    Es = np.floor(V.astype(np.float64) * SIM_QUANT + 0.5).astype(np.int64)
    out = {}
    for c in set(a.tolist()):
        idx = np.where(a == c)[0]
        order = sorted(idx, key=lambda i: (-int(d2[i]), int(ids[i])))
        for r, i in enumerate(order):
            ni = int(Es[i] @ Es[i])
            dr = False
            for j in order[:r]:
                dot = int(Es[i] @ Es[j])
                nj = int(Es[j] @ Es[j])
                if dot > 0 and dot * dot * den * den >= num * num * ni * nj:
                    dr = True
                    break
            out[int(ids[i])] = (int(c), 0 if dr else 1)
    return out


@pytest.mark.usefixtures("ray_session")
def test_semdedup_matches_brute_oracle_and_partitioning():
    import ray.data as rd

    rng = np.random.default_rng(23)
    V = rng.normal(0, 0.15, size=(90, 8)).astype(np.float32)
    V[:30] += 0.6
    V[30:60] -= 0.6
    # plant near-dup families: copies with tiny noise
    for src, dst in ((0, 1), (0, 2), (31, 32), (61, 62), (61, 63)):
        V[dst] = V[src] + rng.normal(0, 0.002, size=8).astype(np.float32)
    ids = rng.permutation(90).astype(np.int64)
    want = _brute_semdedup(V, ids, k=3, n_iter=2, num=19, den=20)
    assert sum(kept for _, kept in want.values()) < 90  # dups really drop
    t = _vec_table(V, ids)
    for parts in (1, 5):
        ds = rd.from_arrow(t).repartition(parts)
        got = {r["vec_id"]: (r["cluster_id"], r["kept"])
               for r in semdedup(ds, n_clusters=3, n_iter=2,
                                 threshold=(19, 20)).take_all()}
        assert got == want


@pytest.mark.usefixtures("ray_session")
def test_semdedup_exact_threshold_tie_drops():
    import ray.data as rd

    # quantized (3,4) vs (4,3): cos = 24/25 exactly → at threshold
    # (24,25) the ≥ comparison is an exact integer tie and must drop
    V = np.array([[0.003, 0.004], [0.004, 0.003]], dtype=np.float32)
    ids = np.array([1, 2], dtype=np.int64)
    res = semdedup(rd.from_arrow(_vec_table(V, ids)), n_clusters=1,
                   n_iter=1, threshold=(24, 25)).to_pandas()
    assert sorted(res["kept"].tolist()) == [0, 1]
    # one notch tighter and the pair survives
    res2 = semdedup(rd.from_arrow(_vec_table(V, ids)), n_clusters=1,
                    n_iter=1, threshold=(97, 100)).to_pandas()
    assert res2["kept"].tolist() == [1, 1]


@pytest.mark.usefixtures("ray_session")
def test_semdedup_guards():
    import ray.data as rd

    # int64 headroom: |x| ~ 3.0 at d=64, den=20 → d·m²·den ≈ 1.2e10
    big = np.full((4, 64), 3.0, dtype=np.float32)
    ids = np.arange(4, dtype=np.int64)
    with pytest.raises(ValueError, match="headroom"):
        semdedup(rd.from_arrow(_vec_table(big, ids)), n_clusters=2,
                 n_iter=1).materialize()

    ok = np.random.default_rng(5).normal(
        0, 0.2, size=(6, 4)).astype(np.float32)
    with pytest.raises(ValueError, match="max_cluster"):
        semdedup(rd.from_arrow(_vec_table(ok, np.arange(6, dtype=np.int64))),
                 n_clusters=2, n_iter=1, max_cluster=2).materialize()
