"""HyperLogLog sketch: deterministic registers + estimate bounds."""

import numpy as np
import pyarrow as pa

from arabic_ocr_ray.functions.sketch import (
    M_REGISTERS,
    _bucket_rho,
    hll_distinct_counts,
    hll_estimate,
    hll_registers,
)


def test_bucket_rho_matches_definition():
    import hashlib

    for v in (0, 1, 42, "abc", 999999):
        hx = hashlib.md5(str(v).encode()).hexdigest()
        idx, rho = _bucket_rho(v)
        assert idx == int(hx[0:2], 16)
        w = int(hx[2:17], 16)
        assert rho == (61 if w == 0 else 60 - w.bit_length() + 1)
        assert 1 <= rho <= 61


def test_hll_estimate_error_bound(ray_session):
    """Estimate within the ~3σ HLL error (3 × 1.04/√256 ≈ 19.5%) on a
    10k-distinct synthetic — and registers merge identically across
    repartitionings (commutative max monoid)."""
    import ray.data as rd

    n = 10_000
    t = pa.table({
        "k": pa.array(["a"] * n + ["b"] * (2 * n)),
        "v": pa.array(list(range(n)) + [i % 500 for i in range(2 * n)],
                      pa.int64()),
    })
    est = hll_distinct_counts(rd.from_arrow(t).repartition(8), "k", "v")
    e = dict(zip(est["k"], est["approx_distinct"]))
    assert abs(e["a"] - n) / n < 0.195, e
    assert abs(e["b"] - 500) / 500 < 0.195, e

    r1 = (hll_registers(rd.from_arrow(t), "k", "v").to_pandas()
          .sort_values(["k", "reg_idx"]).reset_index(drop=True))
    r2 = (hll_registers(rd.from_arrow(t).repartition(13), "k", "v")
          .to_pandas().sort_values(["k", "reg_idx"])
          .reset_index(drop=True))
    assert r1.equals(r2)


def test_hll_estimate_empty_is_zero():
    assert hll_estimate(np.zeros(M_REGISTERS, dtype=np.int64)) == 0.0


def test_cms_one_sided_and_tight_on_heavy_hitters(ray_session):
    """CMS point estimates are one-sided (est >= true) and exact for
    tokens whose buckets hold no collisions at this scale."""
    import ray.data as rd

    from arabic_ocr_ray.functions.sketch import cms_estimate, cms_table
    from arabic_ocr_ray.functions.text import _WS_SPLIT
    from collections import Counter

    texts = [f"alpha beta gamma tok{i % 37} alpha" for i in range(200)]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    cms = cms_table(rd.from_arrow(t)).to_pandas()
    true = Counter()
    for x in texts:
        true.update(_WS_SPLIT.findall(x.lower()))
    toks = sorted(true)
    est = cms_estimate(cms, toks)
    for tok, e in zip(toks, est):
        assert e >= true[tok], (tok, e, true[tok])
    # 41 distinct tokens in 4x1024 buckets: the heavy hitters are
    # collision-free with overwhelming margin → exact
    assert est[toks.index("alpha")] == true["alpha"] == 400
    # sketch table is bounded regardless of corpus size
    assert len(cms) <= 4 * 1024
