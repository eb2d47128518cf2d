"""CLI end-to-end: gen → extract → eval inside the shared session
(the CLI must not tear down a Ray session it didn't start)."""

import json

import ray

from arabic_ocr_ray.cli import main


def test_cli_gen_extract_eval(ray_session, default_model, tmp_path, capsys):
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")

    assert main(["gen", "-o", pages, "-n", "40", "--seed", "77"]) == 0
    assert ray.is_initialized()  # session survived

    assert main(["extract", "-i", pages, "-o", out]) == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["docs"] == 40

    assert main(["eval", "-i", pages, "-e", out]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["match_rate"] == 1.0
    assert ray.is_initialized()


def test_cli_curate_export_chain(ray_session, tmp_path, capsys):
    """gen → extract → curate → export: the full corpus-to-shards
    handoff through the CLI surface."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = str(tmp_path / "docs.parquet")
    bench = str(tmp_path / "bench.parquet")
    curated = str(tmp_path / "curated")
    shards = str(tmp_path / "shards")

    leak = "alpha beta gamma delta epsilon zeta eta theta iota"
    pq.write_table(pa.table({
        "url": pa.array([f"u{i}" for i in range(8)], pa.string()),
        "text": pa.array(
            [f"{leak} plus words"] +          # contaminated → dropped
            [f"body text number {i} with plenty of words here"
             for i in range(1, 8)], pa.string()),
    }), docs)
    pq.write_table(pa.table({
        "url": pa.array(["b0"], pa.string()),
        "text": pa.array([f"x {leak} y"], pa.string()),
    }), bench)

    assert main(["curate", "-i", docs, "-b", bench,
                 "-o", curated]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["survivors"] == 7

    assert main(["export", "-i", curated, "-o", shards,
                 "--n-shards", "3", "--id-col", "url"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["docs"] == 7
    files = glob.glob(f"{shards}/shard=*.parquet")
    assert sum(pq.read_table(f).num_rows for f in files) == 7


def test_cli_index_build_append_probe(ray_session, tmp_path, capsys):
    """index build → incremental append → probe through the CLI: the
    probe over base+appended must equal brute force over the union
    (fixture scale ⇒ adaptive nprobe probes every cell)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from arabic_ocr_ray.functions import ann

    rng = np.random.RandomState(55)
    E = rng.randn(200, 16)
    t = pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in E],
                              pa.list_(pa.float32())),
    })
    base_p = str(tmp_path / "base.parquet")
    new_p = str(tmp_path / "new.parquet")
    idx = str(tmp_path / "idx")
    pq.write_table(t.slice(0, 120), base_p)
    pq.write_table(t.slice(120), new_p)

    assert main(["index", "build", "-i", base_p, "-x", idx,
                 "--clusters", "8"]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built == {"index": idx, "cells": 8, "rows": 120}

    assert main(["index", "append", "-i", new_p, "-x", idx]) == 0
    app = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert app == {"index": idx, "rows_added": 80, "rows_total": 200}

    assert main(["index", "probe", "-x", idx, "--ids", "0,150",
                 "-k", "3"]) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    exact = (ann.knn_bruteforce(rd.from_arrow(t), [0, 150], k=3)
             .to_pandas().sort_values(["query_id", "rank"]))
    want = list(zip(exact["query_id"], exact["neighbor_id"],
                    exact["rank"]))
    have = [(r["query_id"], r["neighbor_id"], r["rank"])
            for r in got["rows"]]
    assert have == want
