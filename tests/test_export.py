"""Training-shard exporter: determinism, order, resume, string ids."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from arabic_ocr_ray.pipelines.export import (_M, _ORDER_A, _ORDER_C,
                                             export_training_shards,
                                             shard_keys)


def _docs(n=200, seed=3):
    rng = np.random.RandomState(seed)
    ids = rng.permutation(n * 7)[:n].astype(np.int64)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([f"doc {i}" for i in ids], pa.string()),
        "n_chars": pa.array([len(f"doc {i}") for i in ids], pa.int64()),
    })


def _read_shards(d):
    out = {}
    for p in sorted(glob.glob(os.path.join(d, "shard=*.parquet"))):
        k = int(os.path.basename(p)[len("shard="):-len(".parquet")])
        out[k] = pq.read_table(p)
    return out


def test_export_shards_layout_and_order(ray_session, tmp_path):
    import ray.data as rd

    t = _docs()
    d = str(tmp_path / "out")
    man = (export_training_shards(
               rd.from_arrow(t).repartition(5), d, n_shards=4,
               size_col="n_chars")
           .to_pandas().set_index("shard").sort_index())
    shards = _read_shards(d)
    # every doc lands in its LCG shard, in (LCG2, id) order
    ids_all = np.asarray(t.column("doc_id"))
    shard, okey = shard_keys(t.column("doc_id"), 4)
    seen = 0
    for k, st in shards.items():
        want_ids = ids_all[shard == k]
        want_okey = okey[shard == k]
        order = np.lexsort((want_ids, want_okey))
        got = np.asarray(st.column("doc_id"))
        assert (got == want_ids[order]).all()
        assert man.loc[k, "n_docs"] == len(want_ids)
        assert man.loc[k, "sum_n_chars"] == \
            int(np.asarray(t.column("n_chars"))[shard == k].sum())
        seen += len(got)
        # data columns only — no shard/__okey leakage
        assert st.column_names == ["doc_id", "text", "n_chars"]
    assert seen == t.num_rows


def test_export_shards_deterministic_and_resumable(ray_session,
                                                   tmp_path):
    import ray.data as rd

    t = _docs(seed=9)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = export_training_shards(rd.from_arrow(t), d1,
                                n_shards=3).to_pandas()
    m2 = export_training_shards(
        rd.from_arrow(t).repartition(7), d2, n_shards=3).to_pandas()
    s1, s2 = _read_shards(d1), _read_shards(d2)
    assert set(s1) == set(s2)
    for k in s1:   # identical bytes-level row order, any input layout
        assert s1[k].equals(s2[k])
    # resume: rerun over the SAME dir rewrites nothing (mtimes frozen)
    mt = {k: os.path.getmtime(os.path.join(d1, f"shard={k}.parquet"))
          for k in s1}
    m3 = export_training_shards(rd.from_arrow(t), d1,
                                n_shards=3).to_pandas()
    for k in s1:
        assert os.path.getmtime(
            os.path.join(d1, f"shard={k}.parquet")) == mt[k]
    a = m1.sort_values("shard").reset_index(drop=True)
    c = m3.sort_values("shard").reset_index(drop=True)
    assert a.equals(c)


def test_export_shards_string_ids(ray_session, tmp_path):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([f"u{i}" for i in range(40)], pa.string()),
        "text": pa.array(["x"] * 40, pa.string()),
    })
    d = str(tmp_path / "s")
    man = export_training_shards(rd.from_arrow(t), d,
                                 n_shards=4).to_pandas()
    assert man["n_docs"].sum() == 40
    got = sum((np.asarray(s.column("doc_id")).tolist()
               for _, s in sorted(_read_shards(d).items())), [])
    assert sorted(got) == sorted(f"u{i}" for i in range(40))


def test_order_key_is_the_documented_lcg():
    col = pa.array([0, 1, 12345], pa.int64())
    _, okey = shard_keys(col, 4)
    want = [(i * 1103515245 + 12345) % 2147483648 for i in
            [0, 1, 12345]]
    assert okey.tolist() == [int(np.int64(w)) for w in want]
    assert int(_ORDER_A) == 1103515245 and int(_ORDER_C) == 12345
    assert int(_M) == 2147483648


def test_corpus_split_law_and_partition(ray_session):
    """Every doc lands in exactly one split; assignment matches the
    documented LCG law; bad fractions raise."""
    import pytest
    import ray.data as rd

    from arabic_ocr_ray.functions.sampling import corpus_split

    t = pa.table({"doc_id": pa.array(range(5000), pa.int64())})
    out = (corpus_split(rd.from_arrow(t).repartition(4))
           .to_pandas().set_index("doc_id")["split"])
    assert len(out) == 5000
    for i in (0, 1, 17, 4999):
        h = ((i * 69069 + 1) % 2147483648) % 1000
        want = "train" if h < 980 else ("val" if h < 990 else "test")
        assert out.loc[i] == want
    counts = out.value_counts()
    assert 4700 < counts["train"] <= 5000    # ≈98%
    assert counts.get("val", 0) + counts.get("test", 0) == \
        5000 - counts["train"]
    with pytest.raises(ValueError, match="!= 1000"):
        corpus_split(rd.from_arrow(t), {"train": 900, "val": 50})
