"""Resume-from-checkpoint: partial run + rerun == clean full run, with
no re-processing of completed docs (lineage/anti-filter contract)."""

import pyarrow.dataset as pads
import pyarrow.parquet as pq

from arabic_ocr_ray.pipelines.extract import run_extract
from arabic_ocr_ray.sources.pages import pages_table
from arabic_ocr_ray.state.lineage import completed_urls, read_lineage


def _read_out(out):
    return pads.dataset(out, format="parquet", partitioning="hive",
                        ignore_prefixes=[".", "_"]).to_table()


def test_resume_after_partial_failure(ray_session, default_model, tmp_path):
    full = pages_table(80, seed=11)
    part_path = str(tmp_path / "pages_part.parquet")
    full_path = str(tmp_path / "pages_full.parquet")
    pq.write_table(full.slice(0, 30), part_path, row_group_size=10)
    pq.write_table(full, full_path, row_group_size=10)
    out = str(tmp_path / "out")

    # "failed" run: only the first 30 docs got processed
    m1 = run_extract(part_path, out, batch_size=8, concurrency=2,
                     num_partitions=8)
    assert m1["docs"] == 30
    assert m1["skipped_resume"] == 0

    done = completed_urls(out)
    assert done is not None and len(done) == 30

    # resumed run over the FULL input: skips the 30 finished docs
    m2 = run_extract(full_path, out, batch_size=8, concurrency=2,
                     num_partitions=8)
    assert m2["skipped_resume"] == 30
    assert m2["docs"] == 80  # lineage counts the whole output

    tbl = _read_out(out)
    assert tbl.num_rows == 80  # no duplicates, nothing missing
    assert len(set(tbl.column("url").to_pylist())) == 80

    # lineage manifest covers all partitions and sums to the corpus
    lin = read_lineage(out)
    assert lin is not None
    assert sum(lin.column("docs").to_pylist()) == 80


def test_resume_noop_when_complete(ray_session, default_model, tmp_path):
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages_table(20, seed=12), p)
    out = str(tmp_path / "out")
    run_extract(p, out, batch_size=8, concurrency=2, num_partitions=4)
    m = run_extract(p, out, batch_size=8, concurrency=2, num_partitions=4)
    assert m["skipped_resume"] == 20
    assert _read_out(out).num_rows == 20


def test_completed_urls_excludes_errored_rows(tmp_path):
    import pyarrow as pa

    out = tmp_path / "out"
    out.mkdir()
    pq.write_table(pa.table({
        "url": ["a", "b", "c"],
        "status": ["ok", "error: ValueError: boom", "empty"],
        "extracted_text": ["x", "", ""],
    }), str(out / "f.parquet"))
    done = completed_urls(str(out))
    assert done == {"a", "c"}  # errored row must be retried on resume


def test_partition_resume_multi_part(ray_session, default_model, tmp_path):
    """Per-partition resume: the rerun must use the sidecar anti-filter
    (resume_mode == 'partition' — no full-corpus set on the driver),
    skip every finished doc across ALL parts, and keep counts exact."""
    full = pages_table(120, seed=13)
    part_path = str(tmp_path / "pages_part.parquet")
    full_path = str(tmp_path / "pages_full.parquet")
    pq.write_table(full.slice(0, 50), part_path, row_group_size=10)
    pq.write_table(full, full_path, row_group_size=10)
    out = str(tmp_path / "out")

    m1 = run_extract(part_path, out, batch_size=8, concurrency=2,
                     num_partitions=16)
    assert m1["docs"] == 50 and m1["resume_mode"] == "none"

    # fresh run writes per-BLOCK stat sidecars only (shuffle-free);
    # the part-keyed done-url sets are derived lazily at resume time
    import os

    urls_dir = os.path.join(out, "_lineage", "urls")
    stat_rows = sum(pq.read_table(os.path.join(urls_dir, f)).num_rows
                    for f in os.listdir(urls_dir)
                    if f.endswith(".parquet"))
    assert stat_rows == 50
    done_dir = os.path.join(out, "_lineage", "done_urls")
    assert not os.path.isdir(done_dir)  # lazy until a resume needs it

    m2 = run_extract(full_path, out, batch_size=8, concurrency=2,
                     num_partitions=16)
    assert m2["resume_mode"] == "partition"
    assert m2["skipped_resume"] == 50
    assert m2["docs"] == 120
    # the resume built (then refreshed) per-part sidecars, never a
    # whole-corpus file
    sidecars = sorted(os.listdir(done_dir))
    assert len(sidecars) > 1  # genuinely multi-part
    per_part = [pq.read_table(os.path.join(done_dir, f)).num_rows
                for f in sidecars]
    assert sum(per_part) == 120 and max(per_part) < 120
    tbl = _read_out(out)
    assert len(set(tbl.column("url").to_pylist())) == 120


def test_partition_resume_modulus_recorded(ray_session, default_model,
                                           tmp_path):
    """ADVICE r2: the resume filter must use the partition modulus the
    OUTPUT was written with, not the caller's argument — a rerun with
    a different num_partitions would read the wrong sidecar for every
    url, re-extract finished docs and mix layouts."""
    from arabic_ocr_ray.state.lineage import recorded_num_partitions

    full = pages_table(60, seed=12)
    part_path = str(tmp_path / "pages_part.parquet")
    full_path = str(tmp_path / "pages_full.parquet")
    pq.write_table(full.slice(0, 25), part_path, row_group_size=10)
    pq.write_table(full, full_path, row_group_size=10)
    out = str(tmp_path / "out")

    m1 = run_extract(part_path, out, batch_size=8, concurrency=2,
                     num_partitions=16)
    assert m1["docs"] == 25
    assert recorded_num_partitions(out) == 16

    # rerun asks for a DIFFERENT modulus: the recorded one must win —
    # all 25 finished docs skipped, no mixed-modulus part values
    m2 = run_extract(full_path, out, batch_size=8, concurrency=2,
                     num_partitions=64)
    assert m2["resume_mode"] == "partition"
    assert m2["skipped_resume"] == 25
    tbl = _read_out(out)
    assert len(set(tbl.column("url").to_pylist())) == 60
    assert tbl.num_rows == 60  # no duplicate re-extracted rows
    import zlib

    for u, p in zip(tbl.column("url").to_pylist(),
                    tbl.column("part").to_pylist()):
        assert p == zlib.crc32(u.encode()) % 16  # single modulus


def test_superseded_error_rows_compacted(ray_session, tmp_path):
    """ADVICE r1: retried urls leave stale error rows behind — the
    manifest must not double-count them and dedup_superseded must
    drop them for readers."""
    import pyarrow as pa
    import ray.data as rd

    from arabic_ocr_ray.state.lineage import (
        dedup_superseded,
        read_lineage,
        write_lineage,
    )

    out = tmp_path / "out"
    out.mkdir()
    # two files: the first run's error row + the retry's ok row
    pq.write_table(pa.table({
        "url": ["a", "b"], "status": ["error: boom", "ok"],
        "extracted_text": ["", "B"],
        "html_bytes": [10, 20], "n_content_spans": [0, 2],
        "part": [3, 3],
    }), str(out / "f1.parquet"))
    pq.write_table(pa.table({
        "url": ["a"], "status": ["ok"], "extracted_text": ["A"],
        "html_bytes": [10], "n_content_spans": [1],
        "part": [3],
    }), str(out / "f2.parquet"))

    write_lineage(str(out))
    lin = read_lineage(str(out))
    assert sum(lin.column("docs").to_pylist()) == 2  # not 3

    ds = rd.read_parquet(str(out))
    fixed = dedup_superseded(ds).to_pandas().sort_values("url")
    assert list(fixed["url"]) == ["a", "b"]
    assert list(fixed["extracted_text"]) == ["A", "B"]

    # sidecar for part 3 holds both urls exactly once
    side = pq.read_table(str(out / "_lineage" / "done_urls"
                             / "part=3.parquet"))
    assert sorted(side.column("url").to_pylist()) == ["a", "b"]


def test_orphaned_data_file_reconciled_on_resume(ray_session,
                                                 default_model, tmp_path):
    """ADVICE r3: write_block renames the data parquet before its stat
    sidecar; a crash between the two leaves an ORPHANED data file whose
    urls the sidecar-derived done-set would miss — the resume rebuild
    must fold the orphan's rows back in (no duplicate re-extraction,
    manifest counts exact)."""
    import os

    from arabic_ocr_ray.state.lineage import orphan_data_files

    full = pages_table(60, seed=14)
    part_path = str(tmp_path / "pages_part.parquet")
    full_path = str(tmp_path / "pages_full.parquet")
    pq.write_table(full.slice(0, 30), part_path, row_group_size=10)
    pq.write_table(full, full_path, row_group_size=10)
    out = str(tmp_path / "out")

    m1 = run_extract(part_path, out, batch_size=8, concurrency=2,
                     num_partitions=8)
    assert m1["docs"] == 30

    # simulate the crash: delete ONE block's stat sidecar (its data
    # file survives)
    sdir = os.path.join(out, "_lineage", "urls")
    victim = sorted(f for f in os.listdir(sdir)
                    if f.startswith("stats_"))[0]
    digest = victim[len("stats_"):-len(".parquet")]
    orphan_path = os.path.join(out, f"data_{digest}.parquet")
    assert os.path.exists(orphan_path)
    orphan_urls = set(pq.read_table(orphan_path, columns=["url"])
                      .column("url").to_pylist())
    assert orphan_urls
    os.remove(os.path.join(sdir, victim))
    assert orphan_data_files(out) == [orphan_path]

    # resumed run: the orphan's urls must be SKIPPED, not re-extracted
    m2 = run_extract(full_path, out, batch_size=8, concurrency=2,
                     num_partitions=8)
    assert m2["resume_mode"] == "partition"
    assert m2["skipped_resume"] == 30

    tbl = _read_out(out)
    assert tbl.num_rows == 60          # no duplicates
    assert len(set(tbl.column("url").to_pylist())) == 60
    lin = read_lineage(out)
    assert sum(lin.column("docs").to_pylist()) == 60


def test_extract_incremental_extracts_only_churn(ray_session,
                                                 pages_parquet):
    """Diff-gated extraction: unchanged pages are skipped, added and
    html-changed pages extract byte-identical to golden, removed pages
    produce nothing."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from arabic_ocr_ray.pipelines.extract import extract_incremental

    t = pq.read_table(pages_parquet["pages"],
                      columns=["url", "html", "lang", "text"])
    n = t.num_rows
    idx = np.arange(n)
    old_mask = idx % 13 != 5          # %13==5 → added later
    new_mask = idx % 17 != 2          # %17==2 → removed
    old = t.filter(pa.array(old_mask)).select(["url", "html", "lang"])
    # change: prepend a comment to every 9th page's OLD html (hash
    # differs; golden text untouched — comments strip)
    oh = [bytes(h) if i % 9 else b"<!-- v1 -->" + bytes(h)
          for i, h in zip(idx[old_mask], old.column("html").to_pylist())]
    old = pa.table({"url": old.column("url"),
                    "html": pa.array(oh, pa.binary()),
                    "lang": old.column("lang")})
    new = t.filter(pa.array(new_mask)).select(["url", "html", "lang"])

    out = (extract_incremental(rd.from_arrow(old), rd.from_arrow(new),
                               batch_size=32, concurrency=2)
           .select_columns(["url", "extracted_text"]).to_pandas()
           .set_index("url")["extracted_text"].to_dict())
    urls = t.column("url").to_pylist()
    golden = dict(zip(urls, t.column("text").to_pylist()))
    want = {urls[i] for i in idx
            if i % 17 != 2 and (i % 13 == 5 or i % 9 == 0)}
    assert set(out) == want
    for u in want:
        assert out[u] == golden[u]
