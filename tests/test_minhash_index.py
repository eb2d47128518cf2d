"""Materialized MinHash-LSH index: build once over the base corpus,
probe each crawl increment — must equal near_dup_pairs_bipartite
(the index is an access path, not a semantics), reading only the
buckets the increment's band hashes land in."""

import os

import numpy as np
import pyarrow as pa
import pytest

from arabic_ocr_ray.functions import dedup


def _docs(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))


def _corpus(seed, n, planted=()):
    rng = np.random.RandomState(seed)
    vocab = [f"tok{i}" for i in range(200)]
    rows = [(i, " ".join(rng.choice(vocab, size=30)))
            for i in range(n)]
    rows += list(planted)
    return rows


def test_probe_equals_bipartite(ray_session, tmp_path):
    base_rows = _corpus(1, 40)
    # planted near-dups of base docs (one-token edits) + a clean doc
    nd = [(1000 + i, base_rows[i][1].replace("tok", "tok", 1)
           + " extra")
          for i in range(3)]
    new_rows = _corpus(2, 10, planted=[
        (900, base_rows[5][1]),            # exact copy of base #5
        (901, base_rows[7][1] + " x"),     # near-dup of base #7
    ])
    base, new = _docs(base_rows), _docs(new_rows)

    idx = str(tmp_path / "mh")
    dedup.build_minhash_index(base, idx, n_buckets=16)
    got = dedup.minhash_probe(idx, new, base, threshold=0.8) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    want = dedup.near_dup_pairs_bipartite(new, base, threshold=0.8) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert got.equals(want)
    assert {(r["a"], r["b"]) for _, r in got.iterrows()} >= {
        (5, 900), (7, 901)}


def test_probe_prunes_buckets(ray_session, tmp_path):
    """A single-doc increment must read a strict subset of bucket
    dirs (IO ∝ increment)."""
    base = _docs(_corpus(3, 60))
    idx = str(tmp_path / "mh2")
    dedup.build_minhash_index(base, idx, n_buckets=64)
    n_dirs = len([d for d in os.listdir(idx)
                  if d.startswith("bh_bucket=")])
    assert n_dirs > 16  # 60 docs × 16 bands spread over 64 buckets
    new = _docs([(999, " ".join(f"zz{i}" for i in range(25)))])
    out = dedup.minhash_probe(idx, new, base, threshold=0.8) \
        .to_pandas()
    assert len(out) == 0
    # the increment has 16 band rows → ≤ 16 distinct buckets probed
    import ray.data as rd

    rows = new.map_batches(
        lambda b: dedup._band_rows_batch(b, "text", "doc_id"),
        batch_format="pyarrow").to_pandas()
    probed = {int(h) % 64 for h in rows["band_hash"]}
    assert len(probed) <= 16 < n_dirs


def test_probe_guards(ray_session, tmp_path):
    base = _docs(_corpus(4, 10))
    idx = str(tmp_path / "mh3")
    dedup.build_minhash_index(base, idx, n_buckets=8)
    with pytest.raises(ValueError, match="id_col"):
        dedup.minhash_probe(idx, base, base, id_col="url")
    # short docs below MIN_SHINGLES band nothing -> typed empty
    new = _docs([(1, "hi")])
    out = dedup.minhash_probe(idx, new, base)
    # typed empty (ray to_pandas drops columns on 0-row datasets, so
    # pin the schema on the Dataset itself)
    assert out.count() == 0
    assert out.schema().names == ["a", "b", "jaccard_x1000"]
