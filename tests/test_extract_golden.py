"""End-to-end golden conformance: byte-identical extracted text per url
(the north rule), via the real Ray Data pipeline."""

import pyarrow.parquet as pq

from arabic_ocr_ray.pipelines.extract import extract_pages, run_extract
from arabic_ocr_ray.pipelines.evaluate import evaluate_extraction


def test_extract_byte_identical(ray_session, pages_parquet, default_model):
    ds = extract_pages(pages_parquet["pages"], batch_size=16, concurrency=2)
    got = {r["url"]: r["extracted_text"] for b in
           ds.iter_batches(batch_format="pyarrow") for r in b.to_pylist()}
    golden = pq.read_table(pages_parquet["pages"], columns=["url", "text"])
    exp = dict(zip(golden.column("url").to_pylist(),
                   golden.column("text").to_pylist()))
    assert set(got) == set(exp)
    mismatched = [u for u in exp if got[u] != exp[u]]
    assert mismatched == [], f"{len(mismatched)} docs not byte-identical: {mismatched[:3]}"


def test_run_extract_writes_partitioned_output(ray_session, pages_parquet,
                                               default_model, tmp_path):
    out = str(tmp_path / "out")
    metrics = run_extract(pages_parquet["pages"], out, batch_size=16,
                          concurrency=2, num_partitions=8, resume=False)
    assert metrics["docs"] == pages_parquet["n"]
    assert metrics["partitions"] >= 2          # url-hash layout exists
    assert metrics["docs_per_s"] > 0
    import pyarrow.dataset as pads

    tbl = pads.dataset(out, format="parquet", partitioning="hive",
                       ignore_prefixes=[".", "_"]).to_table()
    assert tbl.num_rows == pages_parquet["n"]
    assert "extracted_text" in tbl.column_names


def test_evaluate_perfect_match(ray_session, pages_parquet, default_model):
    ds = extract_pages(pages_parquet["pages"], batch_size=16, concurrency=2)
    report = evaluate_extraction(ds, pages_parquet["pages"], num_partitions=4)
    assert report["total_docs"] == pages_parquet["n"]
    assert report["matched_docs"] == pages_parquet["n"]
    assert report["match_rate"] == 1.0
    assert report["total_edit_distance"] == 0
    assert report["mean_accuracy"] == 1.0


def test_rtl_reading_order(default_model):
    """reading_order='rtl' reverses sub-spans WITHIN each line (the
    reference's reversed-words iteration, segment_words.py:162-170);
    line order and the span multiset are unchanged."""
    from arabic_ocr_ray.extract import extract_document
    from arabic_ocr_ray.model import PrototypeModel
    from arabic_ocr_ray.sources.pages import build_page
    from arabic_ocr_ray.templates import Templates

    model = PrototypeModel.load()
    tpl = Templates()
    checked_multi = 0
    for i in range(40):
        r = build_page(9, i)
        doc = extract_document(r["html"], r["lang"], model, tpl)
        rtl = extract_document(r["html"], r["lang"], model, tpl,
                               reading_order="rtl")
        d_lines = doc["extracted_text"].split("\n")
        r_lines = rtl["extracted_text"].split("\n")
        assert len(d_lines) == len(r_lines)
        for dl, rl in zip(d_lines, r_lines):
            # NOTE: spans, not words — a multi-word sub-span stays
            # intact; only the sub-span sequence flips
            assert sorted(dl.split(" ")) == sorted(rl.split(" "))
        if any(" " in ln for ln in d_lines):
            checked_multi += 1
    assert checked_multi > 0  # the fixture must exercise multi-span lines


def test_label_cache_byte_identical(default_model, monkeypatch):
    """The single-token label cache is a pure memo: cached and
    uncached extraction are byte-identical on a fresh seed, including
    under a tiny cache bound that forces the clear-on-full path."""
    import arabic_ocr_ray.extract as ex
    from arabic_ocr_ray.model import PrototypeModel
    from arabic_ocr_ray.sources.pages import build_page
    from arabic_ocr_ray.templates import Templates

    model = PrototypeModel.load()
    tpl = Templates()
    monkeypatch.setattr(ex, "_LABEL_CACHE_MAX", 8)  # churn the cache
    cache: dict = {}
    for i in range(60):
        r = build_page(271, i, scale=3)
        plain = ex.extract_document(r["html"], r["lang"], model, tpl)
        cached = ex.extract_document(r["html"], r["lang"], model, tpl,
                                     label_cache=cache)
        assert cached["extracted_text"] == plain["extracted_text"]
        assert cached == plain  # stats identical too
        assert plain["extracted_text"] == r["text"]  # golden
    assert len(cache) <= 8
