"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in arabic_ocr_ray) calls ray.init/ray.shutdown.

Queries cover SURVEY.md §2's operator inventory plus the training-data
operators (dedup / ANN / text analysis / multimodal).  The extraction
family runs over the deterministic synthetic pages fixture (FIXTURES.md;
the driver's TPC-H-ish tables don't have the required
(url, warc_ts, html, text, lang) shape) written once under
/tmp/aor_fixtures/<sf-name>/ — its golden ``text`` column doubles as the
DuckDB oracle via read_parquet(), which makes the byte-identical
north-rule check part of the hash-verified correctness gate.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any


def _register_package_by_value() -> None:
    """Make Ray workers independent of the driver's sys.path.

    The driver may import this module via a bare ``sys.path`` insert
    from another cwd; worker processes then cannot import
    ``arabic_ocr_ray`` and every actor/UDF deserialization dies with
    ModuleNotFoundError.  Registering the package (and submodules) for
    cloudpickle by-VALUE serialization ships the code with each task
    instead of referencing it — verified against exactly that failure
    mode."""
    try:
        import importlib
        import pkgutil

        # Ray serializes with its VENDORED cloudpickle — registering
        # with the PyPI one has no effect on task/actor serialization.
        from ray import cloudpickle

        import arabic_ocr_ray

        cloudpickle.register_pickle_by_value(arabic_ocr_ray)
        for m in pkgutil.walk_packages(arabic_ocr_ray.__path__,
                                       "arabic_ocr_ray."):
            cloudpickle.register_pickle_by_value(
                importlib.import_module(m.name))
    except Exception:  # noqa: BLE001 — never break the driver import
        pass


_register_package_by_value()

from arabic_ocr_ray.sources.parquet import read_parquet_clean as _rp

FIXTURE_ROOT = "/tmp/aor_fixtures"
FIXTURE_SEED = 123
FIXTURE_ROWS = {"sf0.001": 200, "sf0.01": 1000, "sf0.1": 8000}
KNN_QUERIES = list(range(10))
KNN_K = 5
#: crawl-blocklist ruleset for the url_filter query — shared verbatim
#: by the engine call and the SQL twin (one definition, two
#: consumers); the prefixes bite on the fixture's latin1/malformed
#: url kinds, the host/suffix/allow clauses are unit-test-pinned
URL_RULES = {
    "block_hosts": ["tracker.fixture.test"],
    "block_host_suffixes": [".ads.fixture.test"],
    "block_path_prefixes": [
        f"https://fixture.test/{FIXTURE_SEED}/latin1/",
        f"https://fixture.test/{FIXTURE_SEED}/malformed/",
    ],
    "allow_hosts": [],
}
#: robots.txt body planted by q_robots_filter (engine AND twin — one
#: definition, two consumers) so the politeness filter bites on the
#: fixture: the host's own Disallow rules drop its latin1/malformed
#: trees
ROBOTS_URL = "https://fixture.test/robots.txt"
ROBOTS_LINES = ["User-agent: *",
                f"Disallow: /{FIXTURE_SEED}/latin1/",
                f"Disallow: /{FIXTURE_SEED}/malformed/", ""]
#: reciprocal pair planted by q_mutual_links (the fixture generator
#: never links crawled→crawled, so mutuality needs planted evidence);
#: one definition, engine and twin both consume it
MUTUAL_PAGES = [
    ("https://fixture.test/mutual/a", '<a href="/mutual/b">b</a>'),
    ("https://fixture.test/mutual/b", '<a href="/mutual/a">a</a>'),
    ("https://fixture.test/mutual/c", '<a href="/mutual/a">a</a>'),
]


def _fixture(sf_dir: str) -> dict:
    """Write (once) the pages fixture matching this sf dir."""
    import pyarrow.parquet as pq

    from arabic_ocr_ray.sources.pages import (
        ensure_pages_parquet,
        golden_spans_table,
    )

    from arabic_ocr_ray.sources.pages import GEN_VERSION

    name = os.path.basename(os.path.normpath(sf_dir)) or "default"
    n = FIXTURE_ROWS.get(name, 500)
    d = os.path.join(FIXTURE_ROOT, f"{name}-g{GEN_VERSION}")
    pages = os.path.join(d, "pages.parquet")
    spans = os.path.join(d, "spans.parquet")
    ensure_pages_parquet(pages, n, seed=FIXTURE_SEED)
    if not os.path.exists(spans):
        os.makedirs(d, exist_ok=True)
        tmp = f"{spans}.tmp{os.getpid()}"  # unique per writer
        pq.write_table(golden_spans_table(n, seed=FIXTURE_SEED), tmp)
        os.replace(tmp, spans)
    triples = os.path.join(d, "triples.parquet")
    if not os.path.exists(triples):
        # golden-by-construction expected model triples: the SEQUENTIAL
        # fold (A2 analog, same twin pytest asserts bit-identical to
        # the distributed trainer) — turns train_prototypes from a
        # rows-only row into a hash-verified oracle (r2 verdict #3)
        import pyarrow as pa

        from arabic_ocr_ray.model import PrototypeModel
        from arabic_ocr_ray.sources.pages import build_page
        from arabic_ocr_ray.templates import Templates
        from arabic_ocr_ray.training import doc_training_examples

        tpl = Templates()
        tri: list = []
        for i in range(n):
            r = build_page(FIXTURE_SEED, i)
            ex, _rej, _tot = doc_training_examples(
                r["html"], r["lang"], r["spans"], tpl)
            tri.extend(ex)
        model = PrototypeModel.from_triples(tri)
        rows = [(s, lab, ",".join(map(str, fv)))
                for s, lab, fv in model.triples()]
        tbl = pa.table({
            "score": pa.array([r[0] for r in rows], pa.int64()),
            "label": pa.array([r[1] for r in rows], pa.string()),
            "fv": pa.array([r[2] for r in rows], pa.string()),
        })
        tmp = f"{triples}.tmp{os.getpid()}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, triples)
    return {"pages": pages, "spans": spans, "triples": triples, "n": n}


def _conc(cap: int = 8) -> int:
    """Actor-pool size for fixture-scale queries: never all CPUs (the
    read/write operators starve and the pipeline stalls), capped for
    small corpora."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, min(cap, cpus - 2))


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale: pages → fused extraction
    actor pool → (url, extracted_text, stats) Dataset."""
    from arabic_ocr_ray.pipelines.extract import extract_pages

    fx = _fixture("/root/testdata/sf0.001")
    return extract_pages(fx["pages"], batch_size=32, concurrency=_conc())


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def queries() -> dict[str, Callable[[str], Any]]:
    import pyarrow.parquet as pq

    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    from arabic_ocr_ray.functions import (ann, dedup, multimodal, pdftext,
                                          text)
    from arabic_ocr_ray.pipelines.evaluate import evaluate_extraction
    from arabic_ocr_ray.pipelines.extract import extract_pages
    from arabic_ocr_ray.pipelines.train import train_model
    from arabic_ocr_ray.stages.extract_stage import SegmentStats

    # ---------------- extraction family (pages fixture) ----------------
    def q_extract(sf_dir: str):
        fx = _fixture(sf_dir)
        return (extract_pages(fx["pages"], batch_size=32, concurrency=_conc())
                .select_columns(["url", "extracted_text"]))

    def q_extract_eval(sf_dir: str):
        import pandas as pd

        fx = _fixture(sf_dir)
        ds = extract_pages(fx["pages"], batch_size=32, concurrency=_conc())
        rep = evaluate_extraction(ds, fx["pages"], num_partitions=4)
        return pd.DataFrame({
            "total_docs": [rep["total_docs"]],
            "matched_docs": [rep["matched_docs"]],
            "total_edit_distance": [rep["total_edit_distance"]],
        })

    def q_warc_ingest(sf_dir: str):
        """Raw-WARC alternate source (SURVEY §2.1 S1): the pages
        fixture is serialized ONCE into WARC/1.0 files (cached next to
        the fixture parquet, skip-if-exists), read back via
        read_binary_files + the Content-Length record parser, and fed
        to the SAME extraction pipeline — output must hash-match the
        parquet path's extract_pages."""
        from arabic_ocr_ray.sources.warc import (
            read_warc_pages,
            write_warc_from_pages,
        )

        fx = _fixture(sf_dir)
        warc_dir = os.path.join(os.path.dirname(fx["pages"]), "warc")
        marker = os.path.join(warc_dir, "_SUCCESS")
        if not os.path.exists(marker):
            write_warc_from_pages(fx["pages"], warc_dir,
                                  n_files=8).materialize()
            open(marker, "w").close()
        return (extract_pages(read_warc_pages(warc_dir), batch_size=32,
                              concurrency=_conc())
                .select_columns(["url", "extracted_text"]))

    def q_corpus_stats(sf_dir: str):
        import pyarrow as pa

        fx = _fixture(sf_dir)
        ds = _rp(fx["pages"], columns=["html", "text"])

        def sizes(b: pa.Table) -> pa.Table:
            # vectorized Arrow kernels, no pylist materialization:
            # binary_length on the binary html column IS octet_length;
            # utf8_length on text IS DuckDB length(); null text → 0
            # (same as the oracle, whose max() skips nulls)
            import pyarrow.compute as pc

            return pa.table({
                "html_bytes": pc.binary_length(
                    b.column("html")).cast(pa.int64()),
                "text_chars": pc.coalesce(
                    pc.utf8_length(b.column("text")),
                    pa.scalar(0, pa.int32())).cast(pa.int64()),
            })

        import pandas as pd

        row = ds.map_batches(sizes, batch_format="pyarrow").aggregate(
            Count(alias_name="n_docs"),
            Max("html_bytes", alias_name="max_html_bytes"),
            Sum("html_bytes", alias_name="total_html_bytes"),
            Max("text_chars", alias_name="max_text_chars"),
        )
        # explicit int64: Ray's aggregate row dict may carry numpy
        # scalar types that pandas coerces inconsistently vs the
        # oracle's BIGINT casts (the r1 hash-only mismatch)
        return pd.DataFrame([row]).astype("int64")

    def q_segment_stats(sf_dir: str):
        fx = _fixture(sf_dir)
        ds = _rp(fx["pages"], columns=["url", "html", "lang"])
        out = ds.map_batches(SegmentStats, batch_format="pyarrow",
                             batch_size=32, concurrency=_conc())
        return out.select_columns(["url", "n_spans"])

    def q_extract_dedup(sf_dir: str):
        """Chained pipeline: extract → exact-dedup on extracted_text.
        The fixture's dup hazard (identical content under distinct
        urls) and the empty-content hazard (all '' texts collide)
        give non-trivial groups; byte-identical extraction makes the
        golden text column a valid oracle for the whole chain."""
        import pandas as pd

        fx = _fixture(sf_dir)
        ds = extract_pages(fx["pages"], batch_size=64, concurrency=_conc())
        from arabic_ocr_ray.functions.dedup import dedup_exact

        groups = dedup_exact(ds.select_columns(["url", "extracted_text"]),
                             col="extracted_text", id_col="url")

        # distributive finish: per-block partials → one Sum aggregate —
        # the r1 groups.to_pandas() was unbounded at corpus scale
        import numpy as np
        import pyarrow as pa

        def partial_counts(b: pa.Table) -> pa.Table:
            nc = np.asarray(b.column("n_copies"), dtype=np.int64)
            return pa.table({
                "n_groups": pa.array([b.num_rows], pa.int64()),
                "dup_docs": pa.array([int(nc[nc > 1].sum())], pa.int64()),
            })

        row = groups.map_batches(
            partial_counts, batch_format="pyarrow").aggregate(
            Sum("n_groups", alias_name="n_groups"),
            Sum("dup_docs", alias_name="dup_docs"))
        return pd.DataFrame([row]).astype("int64")[
            ["n_groups", "dup_docs"]]

    def q_train_prototypes(sf_dir: str):
        import pandas as pd

        fx = _fixture(sf_dir)
        model, _stats = train_model(fx["pages"], fx["spans"],
                                    num_partitions=4, concurrency=_conc())
        rows = [(s, lab, ",".join(map(str, fv)))
                for s, lab, fv in model.triples()]
        return pd.DataFrame(rows, columns=["score", "label", "fv"])

    # ---------------- documents: text analysis --------------------------
    def _docs(sf_dir: str, cols=("doc_id", "text")):
        return _rp(os.path.join(sf_dir, "documents.parquet"),
                               columns=list(cols))

    def q_token_count(sf_dir: str):
        return _docs(sf_dir).map_batches(text.token_count_batch,
                                         batch_format="pyarrow")

    def q_bpe_token_count(sf_dir: str):
        return _docs(sf_dir).map_batches(text.bpe_token_count_batch,
                                         batch_format="pyarrow")

    def q_lang_confusion(sf_dir: str):
        """Declared-vs-predicted language confusion matrix (corpus-QA
        mislabel report): per-batch pair Counters fold map-side, ONE
        pair-keyed Sum ∝ |langs|² — never the corpus."""
        return text.lang_confusion(
            _docs(sf_dir, cols=("doc_id", "text", "lang")))

    def q_doc_chunk_plan(sf_dir: str):
        """Sliding-window RAG/training chunk plan (64-token windows,
        stride 48) — pure zero-shuffle map; the plan ships ~32 B/row
        while chunk text stays with the doc."""
        return _docs(sf_dir).map_batches(
            lambda b: text.chunk_plan_batch(b, window=64, stride=48),
            batch_format="pyarrow")

    def q_lang_length_bounds(sf_dir: str):
        """Percentile-calibrated curation gate, thresholds PER
        LANGUAGE (the CCNet/FineWeb move): keep docs whose n_chars
        lies in the per-lang [q10, q90] band.  Bounds via the
        bounded-small (lang, n_chars) histogram — one cell-keyed
        shuffle, DuckDB-bit-equal lerp — then one vectorized
        zero-shuffle mask pass."""
        from arabic_ocr_ray.functions.windows import (
            quantile_bounds_filter,
        )

        docs = _docs(sf_dir, cols=("doc_id", "lang", "n_chars"))
        return quantile_bounds_filter(docs, "lang", "n_chars",
                                      0.1, 0.9)

    def q_dup_lines(sf_dir: str):
        return _docs(sf_dir).map_batches(text.dup_line_stats_batch,
                                         batch_format="pyarrow")

    def q_redact_pii(sf_dir: str):
        return _docs(sf_dir).map_batches(text.redact_pii_batch,
                                         batch_format="pyarrow")

    def q_line_filter(sf_dir: str):
        return _docs(sf_dir).map_batches(text.line_filter_batch,
                                         batch_format="pyarrow")

    def q_bigram_repetition(sf_dir: str):
        return _docs(sf_dir).map_batches(text.bigram_repetition_batch,
                                         batch_format="pyarrow")

    def q_tfidf_top_terms(sf_dir: str):
        return text.tfidf_top_terms(_docs(sf_dir), k=3)

    def q_source_stats(sf_dir: str):
        """Per-source curation stats with an EXACT distinct-lang
        count: two-level groupby — (source, lang) partial counts
        shuffle once on the pair, then a tiny per-source rollup where
        Count(rows) IS the distinct-lang count.  The first level is
        the pre-aggregation that keeps the wide shuffle bounded by
        |source × lang|, never raw docs."""
        import pyarrow as pa

        docs = _rp(os.path.join(sf_dir, "documents.parquet"),
                   columns=["source", "lang", "n_chars"])
        per_sl = (docs.groupby(["source", "lang"], num_partitions=8)
                  .aggregate(Count(alias_name="n_docs"),
                             Sum("n_chars", alias_name="sum_chars")))

        def mark_lang(b: pa.Table) -> pa.Table:
            # count(DISTINCT lang) in SQL skips NULLs; mirror that by
            # summing a 0/1 indicator instead of counting group rows
            import pyarrow.compute as pc
            nn = pc.cast(pc.is_valid(b.column("lang")), pa.int64())
            return b.append_column("lang_nonnull", nn)

        rolled = (per_sl.map_batches(mark_lang, batch_format="pyarrow")
                  .groupby("source", num_partitions=8)
                  .aggregate(Sum("n_docs", alias_name="n_docs"),
                             Sum("sum_chars", alias_name="sum_chars"),
                             Sum("lang_nonnull", alias_name="n_langs")))

        def cast_i64(b: pa.Table) -> pa.Table:
            return pa.table({
                "source": b.column("source"),
                "n_docs": b.column("n_docs").cast(pa.int64()),
                "sum_chars": b.column("sum_chars").cast(pa.int64()),
                "n_langs": b.column("n_langs").cast(pa.int64()),
            })

        return rolled.map_batches(cast_i64, batch_format="pyarrow")

    def q_cms_heavy_hitters(sf_dir: str):
        """Count-Min sketch heavy hitters: the 4x1024 md5-bucket CMS
        table is built distributed (per-block partials bounded by
        depth x width, one tiny keyed Sum shuffle — sketch.cms_table),
        then the exact top-20 tokens are point-estimated from it.
        Like the HLL, the sketch itself is deterministic and the
        WHOLE pipeline (sketch + estimates) is replicated in SQL —
        est >= exact one-sidedness is additionally pytest-gated."""
        import pandas as pd

        from arabic_ocr_ray.functions import sketch

        docs = _docs(sf_dir)
        cms = sketch.cms_table(docs).to_pandas()
        top = text.top_tokens(docs, k=20)
        est = sketch.cms_estimate(cms, list(top["token"]))
        return pd.DataFrame({
            "token": top["token"],
            "n_exact": top["n"].astype("int64"),
            "n_est": pd.Series(est, dtype="int64"),
        })

    def q_lang_stratified_sample(sf_dir: str):
        """Stratified per-stratum sampling: exactly 20 docs per lang,
        chosen by deterministic md5 order — balanced across strata
        (a global hash sample under-represents small langs) and
        reproducible across runs, layouts and resume boundaries.
        Under the hood it is grouped_topk ascending on the hash:
        map-side heads, then a lang-keyed shuffle of <= blocks x
        langs x 20 rows."""
        import hashlib

        import pyarrow as pa

        from arabic_ocr_ray.functions.topk import grouped_topk

        docs = _rp(os.path.join(sf_dir, "documents.parquet"),
                   columns=["doc_id", "lang"])

        def add_h(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_pylist()
            h = [hashlib.md5(str(i).encode()).hexdigest()
                 for i in ids]
            return b.append_column("h", pa.array(h, pa.string()))

        return grouped_topk(docs.map_batches(add_h,
                                             batch_format="pyarrow"),
                            ["lang"], "h", 20, descending=False,
                            tie_cols=("doc_id",), num_partitions=8)

    def q_length_outliers(sf_dir: str):
        """Corpus-level percentile gate (curation outlier removal):
        docs whose n_chars exceeds the EXACT global p95.  The
        threshold comes from windows.global_quantile_exact — a
        value-counts histogram groupby (moved data bounded by
        |distinct lengths|, never rows), lerped driver-side; the gate
        itself is a streaming vectorized filter."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from arabic_ocr_ray.functions.windows import (
            global_quantile_exact,
        )

        docs = _rp(os.path.join(sf_dir, "documents.parquet"),
                   columns=["doc_id", "n_chars"])
        thr = global_quantile_exact(
            docs.select_columns(["n_chars"]), "n_chars", 0.95)

        def gate(b: pa.Table) -> pa.Table:
            return b.filter(pc.greater(b.column("n_chars"),
                                       pa.scalar(thr, pa.float64())))

        return docs.map_batches(gate, batch_format="pyarrow")

    def q_source_cap(sf_dir: str):
        """Per-source frequency cap (the CommonCrawl-style per-domain
        cap): keep the 10 lowest-doc_id docs per source via
        grouped_topk — map-side heads, then a source-keyed shuffle of
        <= blocks x sources x 10 partial rows.  No global sort."""
        from arabic_ocr_ray.functions.topk import grouped_topk

        docs = _rp(os.path.join(sf_dir, "documents.parquet"),
                   columns=["doc_id", "source"])
        return grouped_topk(docs, ["source"], "doc_id", 10,
                            descending=False)

    def q_char_stats(sf_dir: str):
        return _docs(sf_dir).map_batches(text.char_stats_batch,
                                         batch_format="pyarrow")

    def q_lang_id(sf_dir: str):
        return _docs(sf_dir).map_batches(text.lang_id_batch,
                                         batch_format="pyarrow")

    def q_quality(sf_dir: str):
        return _docs(sf_dir).map_batches(text.quality_batch,
                                         batch_format="pyarrow")

    def q_fingerprint(sf_dir: str):
        return _docs(sf_dir).map_batches(text.fingerprint_batch,
                                         batch_format="pyarrow")

    # ---------------- dedup family --------------------------------------
    def q_dedup_exact(sf_dir: str):
        return dedup.dedup_exact(_docs(sf_dir)).select_columns(
            ["doc_id", "n_copies"])

    def _typed(ds_result, schema: dict):
        """Materialize a (small, possibly empty) pair result with a
        guaranteed schema — an all-empty map_groups output otherwise
        yields a schemaless dataset."""
        import pandas as pd

        df = ds_result.to_pandas()
        if df.empty:
            return pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in schema.items()})
        return df[list(schema)].astype(schema)

    def q_near_dup(sf_dir: str):
        return _typed(dedup.near_dup_pairs(_docs(sf_dir), threshold=0.8),
                      {"a": "int64", "b": "int64", "jaccard_x1000": "int64"})

    def q_near_dup_clusters(sf_dir: str):
        """Chained pipeline: MinHash-LSH pairs → exact verify →
        connected components = duplicate clusters (dedup's final
        step; the sf0.01 graph contains a 3-doc triangle)."""
        pairs = dedup.near_dup_pairs(_docs(sf_dir), threshold=0.8)
        return _typed(dedup.dedup_connected_components(pairs),
                      {"doc_id": "int64", "cluster_id": "int64"})

    def q_simhash_dup(sf_dir: str):
        return _typed(dedup.simhash_dup_pairs(_docs(sf_dir), max_hamming=3),
                      {"a": "int64", "b": "int64", "hamming": "int64"})

    def q_doc_decontaminate(sf_dir: str):
        """Train/test decontamination sweep: docs sharing any verbatim
        8-token gram with the held-out benchmark suite (doc_id % 10
        == 0 — a deterministic stand-in for an eval set), with the
        count of distinct contaminated grams.  Benchmark gram set is
        broadcast once (ray.put); the corpus side streams."""
        import numpy as np
        import pyarrow as pa

        docs = _docs(sf_dir)

        def side(want_bench: bool):
            def f(b: pa.Table) -> pa.Table:
                ids = np.asarray(b.column("doc_id"), np.int64)
                m = (ids % 10 == 0) if want_bench else (ids % 10 != 0)
                return b.filter(pa.array(m))
            return f

        ref = dedup.benchmark_gram_ref(
            docs.map_batches(side(True), batch_format="pyarrow"), k=8)
        return _typed(
            dedup.contamination_hits(
                docs.map_batches(side(False), batch_format="pyarrow"),
                ref, k=8),
            {"doc_id": "int64", "n_hits": "int64"})

    def q_exact_substring_spans(sf_dir: str):
        """ExactSubstr-style duplicated-span detection (Lee et al.
        2022 shape): per doc, the count of 8-token gram starts whose
        gram appears in another doc, and the union length of those
        windows = total duplicated-span tokens.  Three bounded
        exchanges; corpus text never shuffles."""
        return _typed(
            dedup.exact_substring_spans(_docs(sf_dir), k=8),
            {"doc_id": "int64", "n_dup_positions": "int64",
             "n_covered_tokens": "int64"})

    def q_exact_substring_dedup(sf_dir: str):
        """The ExactSubstr ACTION (keep-first): rewrite every doc that
        shares a ≥8-token span with a smaller-id doc, dropping the
        covered tokens; only changed docs are emitted, and a totally-
        covered doc vanishes.  Case-sensitive original tokens; output
        text is kept tokens joined by single spaces."""
        return _typed(
            dedup.exact_substring_dedup(_docs(sf_dir), k=8),
            {"doc_id": "int64", "text": "object"})

    def q_rare_tokens(sf_dir: str):
        """Corpus-vocabulary rarity signal (CCNet/Gopher filter
        family): per doc, total tokens and occurrences of
        corpus-hapax tokens (frequency < 2).  One token-keyed Sum
        shuffle + a semi join of the rare vocabulary."""
        return _typed(
            text.rare_token_stats(_docs(sf_dir), min_count=2),
            {"doc_id": "int64", "n_tokens": "int64",
             "n_rare": "int64"})

    def q_lm_surprise(sf_dir: str):
        """CCNet quality scoring (Wenzek et al. 2020): per-doc
        cross-entropy under a reference bigram LM, quantized to whole
        bits so it is integer-exact (no float log anywhere).
        Reference slice = doc_id % 10 == 0; LM = add-one bigram
        counts over it, broadcast ONCE via ray.put (vocabulary-sized,
        guarded); scoring = one pure streaming map — corpus text
        never shuffles."""
        import numpy as np

        import pyarrow as pa

        from arabic_ocr_ray.functions.text import (
            bigram_lm_ref,
            lm_surprise_stats,
        )

        docs = _rp(os.path.join(sf_dir, "documents.parquet"),
                   columns=["doc_id", "text"])

        def ref_only(b: pa.Table) -> pa.Table:
            ids = np.asarray(b.column("doc_id"), dtype=np.int64)
            return b.filter(pa.array(ids % 10 == 0))

        lm = bigram_lm_ref(
            docs.map_batches(ref_only, batch_format="pyarrow"))
        return _typed(
            lm_surprise_stats(docs, lm),
            {"doc_id": "int64", "n_pairs": "int64",
             "surprise_bits": "int64", "oov_pairs": "int64"})

    def q_ccnet_buckets(sf_dir: str):
        """CCNet head/middle/tail corpus split (Wenzek et al. 2020
        §4.4): per-doc mean LM surprise (whole millibits, integer
        floor) bucketed by value-cutoff thirds — head = cleanest.
        Thresholds come from a value-counts histogram bounded by the
        value DOMAIN (≤ 64,001 distinct), never a global sort."""
        import numpy as np

        import pyarrow as pa

        from arabic_ocr_ray.functions.text import (
            bigram_lm_ref,
            lm_quality_buckets,
            lm_surprise_stats,
        )

        docs = _rp(os.path.join(sf_dir, "documents.parquet"),
                   columns=["doc_id", "text"])

        def ref_only(b: pa.Table) -> pa.Table:
            ids = np.asarray(b.column("doc_id"), dtype=np.int64)
            return b.filter(pa.array(ids % 10 == 0))

        lm = bigram_lm_ref(
            docs.map_batches(ref_only, batch_format="pyarrow"))
        return _typed(
            lm_quality_buckets(lm_surprise_stats(docs, lm)),
            {"doc_id": "int64", "mean_millibits": "int64",
             "bucket": "string"})

    def q_pack_plan(sf_dir: str):
        """GPT-style concat-and-chunk sequence packing: every doc
        gets a global token offset in a deterministic LCG
        pseudo-shuffled order and the chunk span of the 2048-token
        training sequences it lands in.  A global ordered prefix-sum
        with NO global sort: bucket token sums (one tiny keyed Sum)
        → exclusive bucket offsets on the driver (256 ints) →
        per-bucket sort+cumsum over the 24 B/doc projection — text
        never shuffles (packing.py module docstring)."""
        from arabic_ocr_ray.functions.packing import pack_plan
        return _typed(
            pack_plan(_docs(sf_dir), seq_len=2048),
            {"doc_id": "int64", "n_tokens": "int64",
             "tok_offset": "int64", "chunk_first": "int64",
             "chunk_last": "int64"})

    def q_pack_chunk_stats(sf_dir: str):
        """Per-training-sequence occupancy of the packing plan:
        chunk_id → (contributing docs, filled token slots).  Chained
        pipeline: pack_plan → vectorized interval explode (rows ∝
        tokens/seq_len) → ONE chunk-keyed Sum."""
        from arabic_ocr_ray.functions.packing import (
            pack_chunk_stats,
            pack_plan,
        )
        return _typed(
            pack_chunk_stats(pack_plan(_docs(sf_dir), seq_len=2048),
                             seq_len=2048),
            {"chunk_id": "int64", "n_docs": "int64",
             "n_tokens": "int64"})

    def q_dsir_weights(sf_dir: str):
        """DSIR importance weights (Xie et al. 2023): hashed
        unigram+bigram bucket models over a target slice (doc_id %
        10 == 0, the LM-family reference convention) vs the raw
        corpus; per-doc weight = Σ floor-log2 add-one count ratio in
        whole bits (integer-exact, text.py DSIR block).  Both models
        are bucket-DOMAIN-bounded histograms (≤ 4096 ints each),
        built together in ONE corpus pass (side-flagged partials, one
        bucket-keyed Sum) and broadcast ONCE via ray.put; scoring is
        a pure streaming map."""
        import numpy as np

        import ray

        from arabic_ocr_ray.functions.text import (
            dsir_models,
            dsir_weight_stats,
        )

        docs = _docs(sf_dir)

        def tgt_mask(b: pa.Table):
            ids = np.asarray(b.column("doc_id"), dtype=np.int64)
            return ids % 10 == 0

        ct, cr = dsir_models(docs, tgt_mask)
        return _typed(
            dsir_weight_stats(docs, ray.put((ct, cr))),
            {"doc_id": "int64", "n_grams": "int64",
             "weight_bits": "int64"})

    def q_gopher_filter(sf_dir: str):
        """Gopher document-quality filter (Rae et al. 2021 A1.1) as
        one integer-exact composite verdict: per-doc fail_flags
        bitmask over the seven published rules (word count, mean word
        length, symbol ratio, bullet/ellipsis lines, alphabetic-word
        share, stopword presence), every threshold cross-multiplied
        to integers (text.py gopher block).  Pure stats map."""
        from arabic_ocr_ray.functions.text import gopher_filter_batch
        return _docs(sf_dir).map_batches(gopher_filter_batch,
                                         batch_format="pyarrow")

    def q_c4_filter(sf_dir: str):
        """C4 page-filter verdict (Raffel et al. 2020 §2.2): line
        law (terminal mark + ≥5 words + no 'javascript') then the
        page rules — ≥3 sentences in kept text, no 'lorem ipsum',
        no '{', no badword — as an integer fail_flags bitmask
        (text.py C4 block; sentence count is a deterministic regex
        stand-in for nltk punkt, documented).  Pure stats map."""
        from arabic_ocr_ray.functions.text import c4_page_filter_batch
        return _docs(sf_dir).map_batches(c4_page_filter_batch,
                                         batch_format="pyarrow")

    def q_gopher_repetition(sf_dir: str):
        """Gopher repetition filter (Rae et al. 2021 A1.2, Table A1):
        the 13 within-doc repetition rules — dup line/paragraph
        fractions (count + chars) and the nine n-gram char-fraction
        rules (top 2/3/4-gram, dup 5..10-gram) — as an integer
        fail_flags bitmask (text.py block documents the exact
        element/char law and the two pinned deviations: overlap-naive
        dup-gram chars, ≥2-count top grams).  Pure stats map."""
        from arabic_ocr_ray.functions.text import gopher_repetition_batch
        return _docs(sf_dir).map_batches(gopher_repetition_batch,
                                         batch_format="pyarrow")

    def q_bpe_vocab(sf_dir: str):
        """BPE vocabulary learning (Sennrich et al. 2016) — the
        tokenizer-training step: ONE corpus pass builds the
        word-type frequency table (per-batch Counter partials + a
        token-keyed Sum, shuffle ∝ vocabulary), then the merge loop
        runs on the driver over that bounded table (the subword-nmt
        / fastBPE shape).  Deterministic ties (count desc, pair
        asc), so the merge list is partitioning-invariant.  NO SQL
        twin: the merge loop is inherently iterative-global (each
        merge rewrites the pair statistics the next argmax reads) —
        rows-only driver check; exactness is pinned by the
        brute-force recount oracle in tests/test_bpe.py."""
        from arabic_ocr_ray.functions.bpe import bpe_merge_table
        return bpe_merge_table(_docs(sf_dir), num_merges=40,
                               min_pair_freq=2)

    def q_bpe_encode(sf_dir: str):
        """Apply the learned merge table back over the corpus:
        per-doc (n_words, n_units) — the compression-ratio signal a
        tokenizer-training run reports.  Merge table broadcasts once
        via ray.put; encode is a pure streaming actor-pool map with
        a per-distinct-word cache.  Rows-only for the same reason as
        bpe_vocab (the segmentation depends on the learned merges);
        encode semantics are pinned against the reference
        lowest-rank-first algorithm in tests/test_bpe.py."""
        import ray

        from arabic_ocr_ray.functions.bpe import (
            bpe_encode_stats,
            bpe_merge_table,
        )
        merges = bpe_merge_table(_docs(sf_dir), num_merges=40,
                                 min_pair_freq=2)
        return _typed(
            bpe_encode_stats(_docs(sf_dir), ray.put(merges)),
            {"doc_id": "int64", "n_words": "int64",
             "n_units": "int64"})

    def q_kmeans_clusters(sf_dir: str):
        """Distributed integer-exact k-means (Lloyd's, K=8, 2
        iterations) over the embeddings table — the semantic
        clustering step of SemDeDup-style curation.  Per iteration:
        centroids broadcast once via ray.put, per-batch assignment +
        per-cluster coordinate-sum partials, ONE keyed Sum of ≤
        K×(d+1) rows per block; assignments never shuffle.  Every
        distance and mean is int64 (quantize = floor(x·1e6 + 0.5),
        truncated-division means, ties → lowest cluster), so the
        2-iteration SQL unrolling is hash-exact — a rare property
        for an iterative ML algorithm (functions/cluster.py)."""
        from arabic_ocr_ray.functions.cluster import kmeans_exact

        ds = _rp(os.path.join(sf_dir, "embeddings.parquet"),
                 columns=["vec_id", "embedding"])
        assign, _ = kmeans_exact(ds, n_clusters=8, n_iter=2)
        return _typed(assign, {"vec_id": "int64",
                               "cluster_id": "int64", "d2": "int64"})

    def q_semdedup(sf_dir: str):
        """SemDeDup (Abbas et al. 2023) over the embeddings table:
        k-means (K=8, 2 Lloyd iterations, integer-exact) then
        within-cluster cosine near-dup drop at 19/20 = 0.95, keeping
        the first point in (distance-to-centroid DESC, id ASC) order
        per duplicate neighborhood — the paper's
        keep-low-similarity-to-centroid variant.  Cosine is exact
        integer over SIM_QUANT-quantized coordinates (dot²·den² ≥
        num²·|a|²·|b|²), so the unrolled SQL twin hash-matches.
        Scale shape: one similarity projection map + one id-keyed
        join + one cluster-keyed exchange; the O(n²/K) per-cluster
        pairwise is intrinsic to SemDeDup (size K ∝ corpus;
        max_cluster raises, never truncates) — functions/cluster.py."""
        from arabic_ocr_ray.functions.cluster import semdedup

        ds = _rp(os.path.join(sf_dir, "embeddings.parquet"),
                 columns=["vec_id", "embedding"])
        return _typed(semdedup(ds, n_clusters=8, n_iter=2,
                               threshold=(19, 20)),
                      {"vec_id": "int64", "cluster_id": "int64",
                       "kept": "int64"})

    def q_near_dup_keep_best(sf_dir: str):
        """Cluster representative election: near-dup pairs →
        connected components → keep the LONGEST member per cluster
        (ties → min id) — the keep-one step of a FineWeb-style sweep
        with a quality-aware policy instead of arbitrary min-id."""
        return _typed(
            dedup.near_dup_keep_best(_docs(sf_dir), threshold=0.8),
            {"cluster_id": "int64", "kept_doc_id": "int64",
             "n_members": "int64"})

    def q_mixture_resample(sf_dir: str):
        """Domain-mixing resample: deterministic LCG-hash sampling to
        target per-source permille weights — integer-exact rates, so
        the SQL twin reproduces the exact surviving row set."""
        from arabic_ocr_ray.functions import sampling

        docs = _rp(os.path.join(sf_dir, "documents.parquet"),
                   columns=["doc_id", "source"])
        out = sampling.mixture_resample(
            docs, {"src0": 40, "src1": 25, "src2": 10})
        return _typed(out, {"doc_id": "int64", "source": "object"})

    def q_paragraph_dedup(sf_dir: str):
        """Corpus-wide paragraph dedup (FineWeb/CCNet shape) over the
        extracted-pages fixture: boilerplate paragraphs repeating
        across pages keep their globally-first occurrence (min (url,
        pos)), every later occurrence is dropped, documents reassemble
        in position order.  One para-keyed shuffle (count + keeper
        election + drop fused in a single fold), one url-keyed
        reassembly shuffle — no count table, no join-back."""
        from arabic_ocr_ray.functions import paragraphs

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "text"])
        return paragraphs.dedup_paragraphs(
            pages, col="text", id_col="url", mode="keep_first")

    def q_para_dedup_incremental(sf_dir: str):
        """Crawl-over-crawl paragraph dedup — the incremental member
        of the paragraph family (exact has snapshot_diff, near-dup has
        the bipartite pass): build the MATERIALIZED paragraph-counter
        table from the even-url half (the "base crawl", its text read
        once and never re-shuffled), merge the odd half's counts in
        (epoch swap), then drop_all-dedup ONLY the new docs against
        the merged counter.  Must equal full-corpus drop_all over
        base ∪ new restricted to new docs — the SQL twin."""
        import tempfile

        import numpy as np
        import pyarrow as pa

        from arabic_ocr_ray.functions import paragraphs

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "text"])

        def half(parity):
            def f(b):
                suf = np.array([int(u[-8:]) % 2
                                for u in b.column("url").to_pylist()])
                return b.filter(pa.array(suf == parity))
            return f

        cdir = tempfile.mkdtemp(prefix="aor_paracnt_")
        paragraphs.build_paragraph_counts(
            pages.map_batches(half(0), batch_format="pyarrow"), cdir,
            col="text")
        new = pages.map_batches(half(1), batch_format="pyarrow")
        paragraphs.update_paragraph_counts(new, cdir, col="text")
        return paragraphs.dedup_paragraphs_incremental(
            new, cdir, col="text", id_col="url", max_occurrences=1)

    def q_url_canonical_dedup(sf_dir: str):
        """Canonical-URL dedup over a deterministically-derived messy
        snapshot (the fixture serves clean urls, so the query plants
        the crawl noise itself: utm params for idx%3==0, fragments for
        idx%5==0, an uppercase-host + unchanged-path spelling for
        idx%7==0).  url_dedup = pure canonicalization map + ONE
        canon-keyed groupby electing min spelling + variant count."""
        import pyarrow as pa

        from arabic_ocr_ray.functions import urls

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url"])

        def variants(b: pa.Table) -> pa.Table:
            out = []
            for u in b.column("url").to_pylist():
                idx = int(u.rsplit("/", 1)[1])
                out.append(u)
                if idx % 3 == 0:
                    out.append(u + "?utm_source=bench&utm_id=7")
                if idx % 5 == 0:
                    out.append(u + "#frag")
                if idx % 7 == 0:
                    out.append("HTTPS://FIXTURE.TEST"
                               + u[len("https://fixture.test"):])
            return pa.table({"url": pa.array(out, pa.string())})

        messy = pages.map_batches(variants, batch_format="pyarrow")
        return _typed(urls.url_dedup(messy),
                      {"canon_url": "object", "url": "object",
                       "n_variants": "int64"})

    def q_curate_v3(sf_dir: str):
        """Web-pages curation flagship composing the r4 operators:
        benchmark decontamination (bench suite = idx%13==0 pages) →
        corpus-wide paragraph dedup (keep_first) → min-token gate on
        the cleaned text.  Every stage bites at fixture scale
        (sf0.01: 1000 → 909 → 868 → 778 docs)."""
        import pyarrow as pa

        from arabic_ocr_ray.pipelines.curate import curate_corpus_v3

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "text"])

        def side(want_bench: bool):
            def f(b: pa.Table) -> pa.Table:
                idx = [int(u.rsplit("/", 1)[1])
                       for u in b.column("url").to_pylist()]
                m = [(i % 13 == 0) == want_bench for i in idx]
                return b.filter(pa.array(m, pa.bool_()))
            return f

        bench = pages.map_batches(side(True), batch_format="pyarrow")
        corpus = pages.map_batches(side(False), batch_format="pyarrow")
        return curate_corpus_v3(corpus, bench, min_tokens=5)

    def q_curate_v4(sf_dir: str):
        """Published-filter curation chain (the C4/FineWeb recipe
        shape): C4 page rules ∧ Gopher repetition in ONE fused
        verdict map, then exact dedup keep-min-id — over the pages
        fixture, where both filters bite (sf0.01: 1000 → 277 kept →
        exact-dup copies dropped).  The Gopher QUALITY filter stays a
        scored column, not a gate (its stopword rule is
        English-specific — it zeroes a multilingual crawl)."""
        from arabic_ocr_ray.pipelines.curate import curate_corpus_v4

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "text"])
        return curate_corpus_v4(pages)

    def q_outlinks(sf_dir: str):
        """Link-graph edge extraction over raw crawl pages: distinct
        (src, dst, n_links) per page — double-quoted <a href>
        targets, strict-UTF-8 gate, fragment-strip + RFC-lite
        resolution (links.py pins the law).  Pure streaming map —
        html never shuffles."""
        from arabic_ocr_ray.functions.links import outlinks

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html"])
        return outlinks(pages)

    def q_link_indegree(sf_dir: str):
        """Link-graph indegree: per target, total incoming links and
        distinct linking pages — ONE dst-keyed Sum over the edge
        projection (the hub/spam-detection signal)."""
        from arabic_ocr_ray.functions.links import link_indegree

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html"])
        return link_indegree(pages)

    def q_pagerank(sf_dir: str):
        """Integer-exact PageRank, 2 damped (85/100) power iterations
        over nodes = corpus pages ∪ link targets, sink-drop variant —
        bit-reproducible across partitionings AND hash-matching a
        fixed-depth SQL unrolling (the kmeans/semdedup property;
        links.py pins the floor-division law).  Per iteration: one
        src-keyed join + one node-keyed Sum — shuffles ∝ EDGES, the
        corpus never moves; weighted edges materialize once."""
        from arabic_ocr_ray.functions.links import pagerank

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html"])
        # 8 partitions: fixture-scale edges (links.py sizing note) —
        # the wall is task dispatch once blocks are small
        return pagerank(pages, n_iter=2, num_partitions=8)

    def q_anchor_texts(sf_dir: str):
        """Anchor-text index: per (target, trimmed anchor text),
        total occurrences and distinct linking pages — what the web
        CALLS each target, the classic ranking/label signal.  Same
        strict-UTF-8 gate + resolution law as outlinks; ONE
        (dst, anchor)-keyed Sum (html never shuffles)."""
        from arabic_ocr_ray.functions.links import anchor_texts

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html"])
        return anchor_texts(pages)

    def q_url_filter(sf_dir: str):
        """Crawl blocklist: the URL rule filter every production
        pipeline front-loads (ad hosts / spam suffixes / infinite-
        calendar prefixes).  ZERO-shuffle vectorized map over a
        url-only pruned read; the path-prefix rules bite on the
        fixture's latin1/malformed kinds (917 keep / 83 drop at
        sf0.01), host/suffix/allow clauses are unit-test-pinned."""
        from arabic_ocr_ray.functions.urls import url_rule_filter

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url"])
        return url_rule_filter(pages, URL_RULES)

    def q_mutual_links(sf_dir: str):
        """Reciprocal-link pairs (link-farm spam signal): distinct
        directed edges fold into ONE (min,max)-keyed Sum of direction
        tags, sum==3 ⟺ both directions exist.  The fixture corpus
        never links crawled→crawled, so a planted a↔b pair (plus a
        one-way c→a that must NOT pair) provides the evidence — the
        twin plants the same rows."""
        import pyarrow as pa
        import ray.data as rd

        from arabic_ocr_ray.functions.links import mutual_links

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html"])
        planted = rd.from_arrow(pa.table({
            "url": pa.array([u for u, _ in MUTUAL_PAGES], pa.string()),
            "html": pa.array([h.encode() for _, h in MUTUAL_PAGES],
                             pa.binary())}))
        return mutual_links(pages.union(planted))

    def q_host_dup_stats(sf_dir: str):
        """Per-host duplication pressure (mirror/scraper detection,
        the FineWeb site-quality signal): content hashed map-side
        (html read once, never shuffled), ONE hash-keyed Count + ONE
        hash-keyed join of tiny projections + ONE host-keyed fold."""
        from arabic_ocr_ray.functions.urls import host_dup_stats

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html"])
        return host_dup_stats(pages)

    def q_url_pattern_stats(sf_dir: str):
        """URL template mining (spider-trap / calendar-trap
        detection): digit runs collapse to 'N', the most-populated
        shapes surface.  Pure vectorized map → per-block value_counts
        → ONE shape-keyed Sum ∝ DISTINCT templates → tree topk."""
        from arabic_ocr_ray.functions.urls import url_pattern_stats

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url"])
        return url_pattern_stats(pages, k=20)

    def q_robots_filter(sf_dir: str):
        """Crawl-politeness gate fed from the corpus itself: each
        host's /robots.txt Disallow prefixes drop that host's own
        pages (simplified-RFC law pinned in urls.py — ALL Disallow
        lines count, case-sensitive directive, strict-UTF-8 body
        gate).  Rules are host-keyed rows, NEVER broadcast; pages
        ship a (url, host, path) projection into one host-keyed
        join + one url-keyed anti-join; html never moves."""
        import pyarrow as pa
        import ray.data as rd

        from arabic_ocr_ray.functions.urls import robots_filter

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html"])
        planted = rd.from_arrow(pa.table({
            "url": pa.array([ROBOTS_URL], pa.string()),
            "html": pa.array(["\n".join(ROBOTS_LINES).encode()],
                             pa.binary())}))
        return robots_filter(pages.union(planted))

    def q_vocab_drift(sf_dir: str):
        """Token-distribution drift between the even/odd doc_id
        halves (the snapshot-refresh QA report): whole-bit integer
        log-ratio (the DSIR quantization), top-20 movers.  ONE
        token-keyed Sum ∝ vocabulary + tree top-k."""
        import pyarrow.compute as pc

        from arabic_ocr_ray.functions.text import vocab_drift

        def half(parity):
            def f(b):
                import numpy as np
                import pyarrow as pa2

                ids = pc.cast(b.column("doc_id"), "int64")
                m = np.asarray(ids) % 2 == parity
                return b.filter(pa2.array(m))
            return f

        docs = _docs(sf_dir)
        return vocab_drift(
            docs.map_batches(half(0), batch_format="pyarrow"),
            docs.map_batches(half(1), batch_format="pyarrow"),
            k=20, min_total=5)

    def q_hits(sf_dir: str):
        """Integer-exact HITS hubs & authorities (Kleinberg 1999) —
        the link-graph companion to pagerank: distinct-edge
        adjacency, hubs seed 1, classic sequential update, fixed 2
        iterations, UNNORMALIZED (links.py pins the law).  Per
        iteration TWO keyed exchanges ∝ EDGES; html never shuffles."""
        from arabic_ocr_ray.functions.links import hits

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html"])
        return hits(pages, n_iter=2, num_partitions=8)

    def q_link_components(sf_dir: str):
        """Weakly-connected components of the page link graph
        (site islands / mirror detection) — the outlink edge
        projection through the SAME component machinery as near-dup
        clustering (driver union-find under the documented edge
        crossover, distributed min-label propagation above)."""
        from arabic_ocr_ray.functions.links import link_components

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html"])
        return link_components(pages)

    def q_host_graph(sf_dir: str):
        """Host-level condensation of the page link graph — what
        domain-level spam/centrality analysis actually runs on (the
        page graph at crawl scale is ~10⁴× bigger).  ONE keyed
        exchange of host-pair projections."""
        from arabic_ocr_ray.functions.links import host_graph

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html"])
        return host_graph(pages)

    def q_host_rank(sf_dir: str):
        """Damped integer PageRank over the HOST condensation —
        domain-level centrality on a graph ~10⁴× smaller than the
        page graph; same floor-div law via the shared power loop,
        edge-set nodes (self-loops kept)."""
        from arabic_ocr_ray.functions.links import host_rank

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html"])
        return host_rank(pages, n_iter=2)

    def q_co_citation(sf_dir: str):
        """Co-citation "related pages" pairs (Dean & Henzinger 1999):
        pages cited together by the most shared targets.  Hub targets
        above the indegree cap are excluded BY LAW (deg² pair
        explosion carries no similarity signal — the MAX_BUCKET
        convention applied to graphs, mirrored by the twin); ONE
        dst-keyed fixed-partition exchange + vectorized triu pair
        generation + ONE pair-keyed Sum + tree topk."""
        from arabic_ocr_ray.functions.links import co_citation

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html"])
        return co_citation(pages, min_common=2, k=20,
                           max_indegree=64)

    def q_crawl_frontier(sf_dir: str):
        """Top-20 UNCRAWLED link targets by distinct linking pages —
        the crawl-scheduling primitive (what a frontier manager
        fetches next).  Anti-join = ONE dst/url-keyed exchange of
        tiny projection rows (html never moves), then the
        tree-combined topk."""
        from arabic_ocr_ray.functions.links import crawl_frontier

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html"])
        return crawl_frontier(pages, k=20)

    def q_crawl_depth(sf_dir: str):
        """Multi-source BFS crawl depth from the seed set (urls
        matching '0$') over directed page→target edges, fixed
        max_depth 3 — frontier-only expansion, one src-keyed join +
        one node-keyed Min per hop, shuffles ∝ frontier-adjacent
        edges; hash-matches the fixed-depth SQL unrolling (the
        pagerank/hits convention)."""
        from arabic_ocr_ray.functions.links import crawl_depth

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html"])
        return crawl_depth(pages, seed_regex="0$", max_depth=3)

    # --- retrieval family (arabic_ocr_ray/functions/retrieval.py) ----
    #: query-term mix pinned to the fixture vocabulary: 'dup' is rare
    #: (df ≈ 25/500) so idf separation is actually exercised; 'hash'/
    #: 'vector' are stopword-common (df ≈ 390)
    BM25_TERMS = ["dup", "hash", "vector"]
    SEARCH_TERMS = ["dup", "hash"]

    def q_bm25_topk(sf_dir: str):
        """BM25 top-10 (integer-exact law in retrieval.py): ONE
        corpus scan → tiny (doc_id, dl, term, tf) projection →
        N/T fold + ≤|terms| df lookup + doc-keyed Sum + tree top-k.
        No global sort, text never shuffles."""
        from arabic_ocr_ray.functions import retrieval

        return retrieval.bm25_topk(_docs(sf_dir), BM25_TERMS, k=10)

    def q_term_search(sf_dir: str):
        """Conjunctive (AND) retrieval by corpus scan — ZERO
        shuffles (a row is a whole doc)."""
        from arabic_ocr_ray.functions import retrieval

        return retrieval.term_search(_docs(sf_dir), SEARCH_TERMS)

    def q_postings_search(sf_dir: str):
        """Same conjunction THROUGH the materialized inverted index:
        build token-bucketed postings parquet (one corpus pass, the
        ivf_cell layout), then answer reading ONLY the ≤|terms|
        bucket dirs the query hashes to.  Must equal term_search's
        oracle — the index is an access path, not a semantics."""
        import tempfile

        from arabic_ocr_ray.functions import retrieval

        idx = tempfile.mkdtemp(prefix="aor_postings_")
        retrieval.build_postings_index(_docs(sf_dir), idx,
                                       n_buckets=16)
        return retrieval.postings_search(idx, SEARCH_TERMS,
                                         n_buckets=16)

    def q_common_paragraphs(sf_dir: str):
        """Boilerplate inventory: paragraphs repeating across ≥ 2
        distinct pages with occurrence/document counts — the report a
        curation run reads before choosing dedup_paragraphs'
        max_occurrences.  Map-side distinct partials → one para-keyed
        fold."""
        from arabic_ocr_ray.functions import paragraphs

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "text"])
        return _typed(
            paragraphs.common_paragraphs(pages, min_docs=2,
                                         id_col="url"),
            {"para": "object", "n_occurrences": "int64",
             "n_docs": "int64"})

    def q_corpus_split(sf_dir: str):
        """Deterministic named train/val/test split (980/10/10
        permille) by an independent LCG stream, rolled up per split.
        Pure map + one split-sized groupby; integer-exact twin."""
        from ray.data.aggregate import Count, Sum

        from arabic_ocr_ray.functions.sampling import corpus_split

        docs = _rp(os.path.join(sf_dir, "documents.parquet"),
                   columns=["doc_id", "n_chars"])
        out = (corpus_split(docs)
               .groupby("split", num_partitions=3)
               .aggregate(Count(alias_name="n_docs"),
                          Sum("n_chars", alias_name="sum_n_chars")))
        return _typed(out, {"split": "object", "n_docs": "int64",
                            "sum_n_chars": "int64"})

    def q_export_shards(sf_dir: str):
        """Training-shard export manifest: deterministic LCG shard
        assignment + reproducible in-shard pseudo-random order, one
        atomic parquet file per shard (the resume unit).  The oracle
        replicates the integer shard law; the order/resume contract is
        pytest-gated (tests/test_export.py)."""
        import shutil

        from arabic_ocr_ray.pipelines.export import (
            export_training_shards)

        docs = _rp(os.path.join(sf_dir, "documents.parquet"),
                   columns=["doc_id", "text", "n_chars"])
        out_dir = os.path.join(
            "/tmp/aor_export",
            os.path.basename(os.path.normpath(sf_dir)))
        shutil.rmtree(out_dir, ignore_errors=True)
        return _typed(
            export_training_shards(docs, out_dir, n_shards=8,
                                   size_col="n_chars"),
            {"shard": "int64", "n_docs": "int64",
             "sum_n_chars": "int64"})

    def q_extract_incremental(sf_dir: str):
        """Incremental crawl extraction end-to-end: snapshot-diff on
        RAW html bytes → extract ONLY added/changed pages of the new
        snapshot.  Derived snapshots: old lacks idx%13==5 (ADDED) and
        carries a prepended html comment for idx%9==0 (CHANGED —
        comments strip out, so the hash differs while golden text is
        untouched); new lacks idx%17==2 (REMOVED, must not appear).
        The oracle is the golden text of exactly the added∪changed
        surviving pages — byte-identity THROUGH the composition."""
        import numpy as np
        import pyarrow as pa

        from arabic_ocr_ray.pipelines.extract import (
            extract_incremental)

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "html", "lang"])

        def _idx(b: pa.Table) -> np.ndarray:
            return np.array([int(u.rsplit("/", 1)[1])
                             for u in b.column("url").to_pylist()],
                            dtype=np.int64)

        def old_side(b: pa.Table) -> pa.Table:
            idx = _idx(b)
            b = b.filter(pa.array(idx % 13 != 5))
            idx = _idx(b)
            html = [bytes(h) if i % 9 else b"<!-- v1 -->" + bytes(h)
                    for i, h in zip(idx, b.column("html").to_pylist())]
            return pa.table({"url": b.column("url"),
                             "html": pa.array(html, pa.binary()),
                             "lang": b.column("lang")})

        def new_side(b: pa.Table) -> pa.Table:
            return b.filter(pa.array(_idx(b) % 17 != 2))

        out = extract_incremental(
            pages.map_batches(old_side, batch_format="pyarrow"),
            pages.map_batches(new_side, batch_format="pyarrow"),
            batch_size=32, concurrency=_conc())
        return out.select_columns(["url", "extracted_text"])

    def q_latest_capture(sf_dir: str):
        """WARC revisit policy over a derived multi-capture archive:
        every idx%4==0 page gains a re-capture one day later (same
        body); latest_capture must keep exactly the newer row per
        url.  Output = (url, warc_ts_us) epoch micros — integer-exact
        across engines."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from arabic_ocr_ray.functions.urls import latest_capture

        fx = _fixture(sf_dir)
        pages = _rp(fx["pages"], columns=["url", "warc_ts"])
        DAY_US = 86_400_000_000

        def captures(b: pa.Table) -> pa.Table:
            idx = np.array([int(u.rsplit("/", 1)[1])
                            for u in b.column("url").to_pylist()],
                           dtype=np.int64)
            base_us = np.asarray(
                b.column("warc_ts").cast(pa.int64()), dtype=np.int64)
            m = idx % 4 == 0
            urls = b.column("url").to_pylist()
            out_u = urls + [u for u, k in zip(urls, m) if k]
            out_t = np.concatenate([base_us, base_us[m] + DAY_US])
            return pa.table({
                "url": pa.array(out_u, pa.string()),
                "warc_ts": pa.array(out_t).cast(
                    pa.timestamp("us")),
            })

        arch = pages.map_batches(captures, batch_format="pyarrow")
        latest = latest_capture(arch)

        def to_us(b: pa.Table) -> pa.Table:
            return pa.table({
                "url": b.column("url"),
                "warc_ts_us": b.column("warc_ts").cast(pa.int64()),
            })

        return latest.map_batches(to_us, batch_format="pyarrow")

    def q_snapshot_diff(sf_dir: str):
        """Crawl-snapshot diff over two deterministically-derived
        snapshots of the documents table: old lacks doc_id%11==3
        (those read as ADDED), new lacks doc_id%7==2 (REMOVED), and
        new's text gains a ' v2' suffix for doc_id%5==0 (CHANGED).
        One id-keyed shuffle of (id, sha1, side) rows, three-way
        classification fused in the fold; unchanged bulk never
        emitted."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        docs = _docs(sf_dir)

        def old_side(b: pa.Table) -> pa.Table:
            ids = np.asarray(b.column("doc_id"), np.int64)
            return b.filter(pa.array(ids % 11 != 3))

        def new_side(b: pa.Table) -> pa.Table:
            ids = np.asarray(b.column("doc_id"), np.int64)
            b = b.filter(pa.array(ids % 7 != 2))
            ids = np.asarray(b.column("doc_id"), np.int64)
            suffixed = pc.binary_join_element_wise(
                b.column("text").cast(pa.string()), " v2", "")
            text = pc.if_else(pa.array(ids % 5 == 0),
                              suffixed, b.column("text"))
            return pa.table({"doc_id": b.column("doc_id"),
                             "text": text})

        return _typed(
            dedup.snapshot_diff(
                docs.map_batches(old_side, batch_format="pyarrow"),
                docs.map_batches(new_side, batch_format="pyarrow")),
            {"doc_id": "int64", "status": "object"})

    def q_cross_snapshot_dups(sf_dir: str):
        """Incremental dedup: near-dup pairs BETWEEN two snapshots
        only (base = even doc ids, new = odd) — "which new docs
        already exist in the corpus", the snapshot-over-snapshot
        crawl-dedup shape."""
        import numpy as np
        import pyarrow as pa

        docs = _docs(sf_dir)

        def parity(want: int):
            def f(b: pa.Table) -> pa.Table:
                ids = np.asarray(b.column("doc_id"), np.int64)
                return b.filter(pa.array(ids % 2 == want))
            return f

        # each side stands in for a PHYSICAL snapshot table (its own
        # parquet read in production); materializing the derived
        # fixture splits keeps the banding/verify consumers from
        # re-executing the parity scan 3× (and trims the task fan-out
        # that tickles a Ray task-manager race under 32-CPU sweeps)
        base = docs.map_batches(parity(0),
                                batch_format="pyarrow").materialize()
        new = docs.map_batches(parity(1),
                               batch_format="pyarrow").materialize()
        return _typed(
            dedup.near_dup_pairs_bipartite(new, base, threshold=0.8),
            {"a": "int64", "b": "int64", "jaccard_x1000": "int64"})

    def q_minhash_probe_dups(sf_dir: str):
        """The cross_snapshot_dups semantics THROUGH the materialized
        MinHash-LSH index (build once over the base half, probe the
        new half reading only its band-hash buckets) — must equal the
        two-dataset banding path's oracle: the index is an access
        path, not a semantics.  What it saves per refresh at scale is
        the base-side tokenize→shingle→minhash recompute."""
        import tempfile

        import numpy as np
        import pyarrow as pa

        docs = _docs(sf_dir)

        def parity(want: int):
            def f(b: pa.Table) -> pa.Table:
                ids = np.asarray(b.column("doc_id"), np.int64)
                return b.filter(pa.array(ids % 2 == want))
            return f

        base = docs.map_batches(parity(0),
                                batch_format="pyarrow").materialize()
        new = docs.map_batches(parity(1),
                               batch_format="pyarrow").materialize()
        idx = tempfile.mkdtemp(prefix="aor_mhidx_")
        dedup.build_minhash_index(base, idx, n_buckets=16)
        return _typed(
            dedup.minhash_probe(idx, new, base, threshold=0.8),
            {"a": "int64", "b": "int64", "jaccard_x1000": "int64"})

    def q_jaccard_dup(sf_dir: str):
        """EXACT n-gram-Jaccard self-join (prefix filter, 100% recall —
        the deterministic complement to MinHash-LSH): every pair with
        trigram Jaccard ≥ 0.7, no minimum-shingle gate."""
        return _typed(dedup.jaccard_dup_pairs(_docs(sf_dir), threshold=0.7),
                      {"a": "int64", "b": "int64", "jaccard_x1000": "int64"})

    def _emb(sf_dir: str):
        return _rp(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])

    def q_bitext_mine(sf_dir: str):
        """Margin-based parallel-pair mining (Artetxe & Schwenk 2019
        ratio margin — the LASER/CCMatrix bitext-mining criterion):
        each query vector pairs with the candidate whose cosine most
        exceeds both endpoints' neighborhood means.  Query matrix
        broadcasts once; the candidate side streams TWICE with zero
        shuffles (x-side top-k partials, then per-batch argmax
        partials); ids only cross the oracle boundary."""
        from arabic_ocr_ray.functions.ann import bitext_margin_mine

        return bitext_margin_mine(_emb(sf_dir), KNN_QUERIES, k=4)

    def _emb_planted_aug(sf_dir: str):
        """The shared planted-copy harness (see q_emb_near_dup):
        embeddings UNION exact copies of every 50th vector at
        vec_id+1_000_000 — ONE definition for the three queries and
        kept in lockstep with the three oracle SQL mirrors."""
        import numpy as np
        import pyarrow as pa

        emb = _emb(sf_dir)

        def planted(b: pa.Table) -> pa.Table:
            ids = np.asarray(b.column("vec_id"), dtype=np.int64)
            d = b.filter(pa.array(ids % 50 == 0))
            return pa.table({
                "vec_id": pa.array(
                    np.asarray(d.column("vec_id"), dtype=np.int64)
                    + 1_000_000, pa.int64()),
                "embedding": d.column("embedding"),
            })

        return emb.union(emb.map_batches(planted,
                                         batch_format="pyarrow"))

    def q_emb_near_dup(sf_dir: str):
        """Planted-truth harness: the driver's gaussian embeddings have
        no ≥0.95-cosine pairs (max pairwise cosine 0.51 at sf0.01 — the
        r1 oracle row was a vacuous 0-vs-0), so the query input is the
        table UNION exact copies of every 50th vector under
        vec_id+1_000_000, mirrored verbatim in the oracle SQL.  The
        expected output is exactly the (original, copy) pairs."""
        return _typed(
            dedup.embedding_near_dup_pairs(_emb_planted_aug(sf_dir),
                                           threshold=0.95),
            {"a": "int64", "b": "int64", "cos_x1000": "int64"})

    def q_curate_v2(sf_dir: str):
        """Second composed flagship: PII redaction -> token +
        top-bigram repetition gates -> exact dedup on the REDACTED
        text -> per-source frequency cap (pipelines/curate.py:
        curate_corpus_v2 — the C4 line filter stays a standalone
        operator; this corpus is single-line, see the pipeline
        docstring); one pure map for all per-row stages, then content
        groupby + semi-join + grouped_topk heads."""
        from arabic_ocr_ray.pipelines.curate import curate_corpus_v2

        docs = _rp(os.path.join(sf_dir, "documents.parquet"),
                   columns=["doc_id", "text", "lang", "source"])
        return curate_corpus_v2(docs)

    def q_semantic_dedup(sf_dir: str):
        """Cross-table composition (the semantic-dedup curation
        step): embedding near-dup pairs — same planted-copy harness
        as embedding_near_dup — drive a doc-level drop via the
        shuffled anti join.  Harness drop rule: the LOWER pair member
        ``a`` is dropped (the planted copies sit at id+1e6, so
        dropping ``b`` would touch no real doc and the row would be
        vacuous); survivors keep their metadata columns."""
        import pyarrow as pa

        from arabic_ocr_ray.functions.joins import hash_join

        pairs = dedup.embedding_near_dup_pairs(
            _emb_planted_aug(sf_dir), threshold=0.95)
        drop = pairs.select_columns(["a"])
        docs = _rp(os.path.join(sf_dir, "documents.parquet"),
                   columns=["doc_id", "lang", "source"])
        # static hint: drop is the whole embedding-near-dup tail —
        # without it the plan-time schema probe runs it twice
        return hash_join(docs, drop, on="doc_id", right_on="a",
                         how="anti", num_partitions=8,
                         right_schema=pa.schema([("a", pa.int64())]))

    def q_emb_near_dup_gather(sf_dir: str):
        """Same planted harness as embedding_near_dup, through the
        gather path: ids-only LSH shuffle, vectors gathered to verify
        partitions (the 100 TB shape — see
        dedup.embedding_near_dup_pairs).  Shares the oracle SQL."""
        return _typed(
            dedup.embedding_near_dup_pairs(_emb_planted_aug(sf_dir),
                                           threshold=0.95,
                                           gather=True),
            {"a": "int64", "b": "int64", "cos_x1000": "int64"})

    # ---------------- similarity search ---------------------------------
    def q_knn(sf_dir: str):
        out = ann.knn_bruteforce(_emb(sf_dir), KNN_QUERIES, k=KNN_K)
        return out.select_columns(["query_id", "neighbor_id", "rank"])

    def q_knn_ivf(sf_dir: str):
        """Materialized-index IVF: build once per sf dir (cached cell-
        partitioned parquet under /tmp), then a probe run that reads
        only the probed cells.  Adaptive nprobe makes the fixture-
        scale answer exact (matches the exact-kNN SQL oracle)."""
        name = os.path.basename(os.path.normpath(sf_dir)) or "default"
        idx = os.path.join("/tmp/aor_ivf", f"{name}-c16")
        out = ann.knn_ivf(_emb(sf_dir), KNN_QUERIES, k=KNN_K,
                          index_dir=idx)
        return out.select_columns(["query_id", "neighbor_id", "rank"])

    def q_knn_ivf_append(sf_dir: str):
        """Incremental IVF maintenance (crawl-over-crawl): build the
        index from the EVEN-vec_id half only, append the odd half to
        the FROZEN centroids (ann.append_ivf_index — cost ∝ |new|,
        existing cell fragments never rewritten), then probe.  The
        fixture fits the centroid sample so the probe is exact over
        the union: the result must equal the exact-kNN SQL twin over
        the FULL table — green only if the appended fragments are
        assigned, written and served correctly alongside the base."""
        import tempfile

        import numpy as np
        import pyarrow as pa

        def _half(parity):
            def f(b):
                ids = np.asarray(b.column("vec_id"))
                return b.filter(pa.array(ids % 2 == parity))
            return f

        emb = _emb(sf_dir)
        idx = tempfile.mkdtemp(prefix="aor_ivf_append_")
        ann.build_ivf_index(
            emb.map_batches(_half(0), batch_format="pyarrow"), idx,
            n_clusters=16)
        ann.append_ivf_index(
            emb.map_batches(_half(1), batch_format="pyarrow"), idx)
        out = ann.knn_ivf_probe(idx, KNN_QUERIES, k=KNN_K)
        return out.select_columns(["query_id", "neighbor_id", "rank"])

    def q_knn_lsh(sf_dir: str):
        """Sign-LSH bucketed kNN (zero-shuffle approximate path) over
        the shared planted-copy harness: each query's exact copy has
        IDENTICAL sign buckets in every table, so the k=1 result —
        (q, q+1e6, rank 1, cos 1.0) — is reached with probability 1
        THROUGH the LSH pruning, never around it (non-vacuous: the
        filter drops the unrelated gaussian bulk).  Broader recall and
        brute-force parity are pytest-gated."""
        from arabic_ocr_ray.functions import ann as _ann

        return _typed(
            _ann.knn_lsh(_emb_planted_aug(sf_dir),
                         [0, 50, 100, 150, 200], k=1),
            {"query_id": "int64", "neighbor_id": "int64",
             "rank": "int64", "cos_x1e9": "int64"})

    # ---------------- relational primitives ------------------------------
    def q_q1_pricing(sf_dir: str):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        li = _rp(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount"])

        # map-side combine: one partial row per (flag,status) per batch.
        # Dtypes are pinned even for an EMPTY batch — a schemaless empty
        # partial block otherwise triggers per-block schema-mismatch
        # warnings downstream (r1 bench log).
        _PARTIAL_TYPES = {"l_returnflag": "object", "l_linestatus": "object",
                          "sum_qty": "float64", "sum_price": "float64",
                          "sum_disc": "float64", "n_rows": "int64"}

        _PARTIAL_SCHEMA = pa.schema([
            ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
            ("sum_qty", pa.float64()), ("sum_price", pa.float64()),
            ("sum_disc", pa.float64()), ("n_rows", pa.int64())])

        def partial(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            g = df.groupby(["l_returnflag", "l_linestatus"], sort=False)
            out = g.agg(sum_qty=("l_quantity", "sum"),
                        sum_price=("l_extendedprice", "sum"),
                        sum_disc=("l_discount", "sum"),
                        n_rows=("l_quantity", "size")).reset_index()
            # Arrow out (typed even when empty): pandas partial blocks
            # carry object dtypes that defeat Ray's schema dedup/
            # hashing and flood logs with mismatch warnings (r2 bench)
            return pa.Table.from_pandas(
                out.astype(_PARTIAL_TYPES), schema=_PARTIAL_SCHEMA,
                preserve_index=False).replace_schema_metadata(None)

        partials = li.map_batches(partial, batch_format="pyarrow",
                                  batch_size=65536)
        final = partials.groupby(["l_returnflag", "l_linestatus"],
                                 num_partitions=8).aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price", alias_name="sum_price"),
            Sum("sum_disc", alias_name="sum_disc"),
            Sum("n_rows", alias_name="n_rows"),
        )

        def finish(b: pa.Table) -> pa.Table:
            import numpy as np

            qty = np.round(np.asarray(b.column("sum_qty"), dtype=np.float64), 2)
            price = np.round(np.asarray(b.column("sum_price"), dtype=np.float64), 2)
            n = np.asarray(b.column("n_rows"), dtype=np.int64)
            avgd = np.round(
                np.asarray(b.column("sum_disc"), dtype=np.float64) / n, 4)
            return pa.table({
                "l_returnflag": b.column("l_returnflag"),
                "l_linestatus": b.column("l_linestatus"),
                "sum_qty": pa.array(qty, pa.float64()),
                "sum_price": pa.array(price, pa.float64()),
                "avg_disc": pa.array(avgd, pa.float64()),
                "n_rows": pa.array(n, pa.int64()),
            })

        return final.map_batches(finish, batch_format="pyarrow")

    def q_q3_shipping(sf_dir: str):
        """TPC-H Q3 shape (segment-filtered shipping revenue top-10):
        the multi-join composition.  Plan: the segment-filtered
        customer keys reach orders via the SHUFFLED semi hash_join —
        customer scales with the corpus, so its keys are never a
        driver set or broadcast; lineitem revenue is PRE-AGGREGATED
        per orderkey before the large-large join (the shuffle moves
        one row per orderkey, not one per lineitem); the final top-10
        is map-side topk, no global sort.  Revenue folds as the EXACT
        integer rev_e4 = cents x (100 - discount_pct) — prices and
        discounts are 2-decimal, so the sum is order-independent and
        the oracle can never drift by a rounding ulp."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from arabic_ocr_ray.functions.joins import hash_join
        from arabic_ocr_ray.functions.topk import topk

        cut = pa.scalar(np.datetime64("1998-06-01T00:00:00", "us"),
                        pa.timestamp("us"))

        def cfilt(b: pa.Table) -> pa.Table:
            return (b.filter(pc.equal(b.column("c_mktsegment"),
                                      "BUILDING"))
                    .select(["c_custkey"]))

        cust_b = _rp(os.path.join(sf_dir, "customer.parquet"),
                     columns=["c_custkey", "c_mktsegment"]).map_batches(
            cfilt, batch_format="pyarrow")

        def ofilt(b: pa.Table) -> pa.Table:
            return b.filter(pc.less(b.column("o_orderdate"), cut))

        orders_f = _rp(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate",
                     "o_orderpriority"]).map_batches(
            ofilt, batch_format="pyarrow")
        j0 = hash_join(orders_f, cust_b, on="o_custkey",
                       right_on="c_custkey", how="semi",
                       num_partitions=16).select_columns(
            ["o_orderkey", "o_orderdate", "o_orderpriority"])

        def lpart(b: pa.Table) -> pa.Table:
            d = b.filter(pc.greater(b.column("l_shipdate"), cut))
            cents = np.rint(np.asarray(d.column("l_extendedprice"),
                                       dtype=np.float64)
                            * 100.0).astype(np.int64)
            dpct = np.rint(np.asarray(d.column("l_discount"),
                                      dtype=np.float64)
                           * 100.0).astype(np.int64)
            return pa.table({
                "l_orderkey": d.column("l_orderkey"),
                "rev_e4": pa.array(cents * (100 - dpct), pa.int64()),
            })

        rev = (_rp(os.path.join(sf_dir, "lineitem.parquet"),
                   columns=["l_orderkey", "l_extendedprice",
                            "l_discount", "l_shipdate"])
               .map_batches(lpart, batch_format="pyarrow")
               .groupby("l_orderkey", num_partitions=16)
               .aggregate(Sum("rev_e4", alias_name="rev_e4")))
        # static hints: rev is an aggregate and j0 a select over a
        # join — either side's plan-time schema probe would execute
        # its whole upstream shuffle a second time
        joined = hash_join(
            rev, j0, on="l_orderkey",
            right_on="o_orderkey", how="inner", num_partitions=16,
            left_schema=pa.schema([("l_orderkey", pa.int64()),
                                   ("rev_e4", pa.int64())]),
            right_schema=pa.schema([
                ("o_orderkey", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string())]))

        def finish(b: pa.Table) -> pa.Table:
            # NO final rounding: the integer e4 fold is exact, and the
            # single IEEE division by 10000 is bit-identical to the
            # oracle's CAST(sum_e4 AS DOUBLE)/10000 (a final round(,2)
            # would reintroduce half-to-even vs half-away tie drift on
            # exactly-representable .XX5 doubles)
            return pa.table({
                "l_orderkey": b.column("l_orderkey"),
                "revenue": pc.divide(pc.cast(b.column("rev_e4"),
                                             pa.float64()), 10000.0),
                "o_orderdate": b.column("o_orderdate"),
                "o_orderpriority": b.column("o_orderpriority"),
            })

        return topk(joined.map_batches(finish, batch_format="pyarrow"),
                    "revenue", 10, descending=True,
                    tie_cols=("o_orderdate", "l_orderkey"))

    def q_q5_local_supplier(sf_dir: str):
        """TPC-H Q5 shape (local-supplier revenue per nation) — the
        deepest multi-join composition: six tables.  Plan: region ⋈
        nation collapse to a TINY broadcast key set (25 nations —
        genuinely bounded, unlike customer keys); customer and
        supplier rows are pre-filtered by it via semi_join_broadcast;
        the two large-large joins (orders⋈customer,
        lineitem⋈supplier-keys) are shuffled hash_joins — no driver
        key sets; the final join co-partitions on orderkey, the
        same-nation predicate and the EXACT integer revenue fold
        (rev_e4 = cents x (100 − discount_pct), order-independent)
        run map-side, and the per-nation rollup is an 8-partition
        groupby over 25 keys."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray

        from arabic_ocr_ray.functions.joins import (
            hash_join,
            semi_join_broadcast,
        )

        lo = pa.scalar(np.datetime64("1996-01-01T00:00:00", "us"),
                       pa.timestamp("us"))
        hi = pa.scalar(np.datetime64("1997-01-01T00:00:00", "us"),
                       pa.timestamp("us"))
        nat = _rp(os.path.join(sf_dir, "nation.parquet")).to_pandas()
        reg = _rp(os.path.join(sf_dir, "region.parquet")).to_pandas()
        asia = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
        nat = nat[nat["n_regionkey"].isin(asia)]
        nk2name = dict(zip(nat["n_nationkey"], nat["n_name"]))
        nk_ref = ray.put(pa.array(sorted(nk2name), pa.int64()))

        cust_f = semi_join_broadcast(
            _rp(os.path.join(sf_dir, "customer.parquet"),
                columns=["c_custkey", "c_nationkey"]),
            "c_nationkey", nk_ref)

        def ofilt(b: pa.Table) -> pa.Table:
            m = pc.and_(pc.greater_equal(b.column("o_orderdate"), lo),
                        pc.less(b.column("o_orderdate"), hi))
            return b.filter(m).select(["o_custkey", "o_orderkey"])

        orders_f = _rp(os.path.join(sf_dir, "orders.parquet"),
                       columns=["o_orderkey", "o_custkey",
                                "o_orderdate"]).map_batches(
            ofilt, batch_format="pyarrow")
        j1 = hash_join(orders_f, cust_f, on="o_custkey",
                       right_on="c_custkey", how="inner",
                       num_partitions=16)

        supp_f = semi_join_broadcast(
            _rp(os.path.join(sf_dir, "supplier.parquet"),
                columns=["s_suppkey", "s_nationkey"]),
            "s_nationkey", nk_ref)

        def lrev(b: pa.Table) -> pa.Table:
            cents = np.rint(np.asarray(b.column("l_extendedprice"),
                                       dtype=np.float64)
                            * 100.0).astype(np.int64)
            dpct = np.rint(np.asarray(b.column("l_discount"),
                                      dtype=np.float64)
                           * 100.0).astype(np.int64)
            return pa.table({
                "l_suppkey": b.column("l_suppkey"),
                "l_orderkey": b.column("l_orderkey"),
                "rev_e4": pa.array(cents * (100 - dpct), pa.int64()),
            })

        li = _rp(os.path.join(sf_dir, "lineitem.parquet"),
                 columns=["l_orderkey", "l_suppkey",
                          "l_extendedprice",
                          "l_discount"]).map_batches(
            lrev, batch_format="pyarrow")
        j2 = hash_join(li, supp_f, on="l_suppkey",
                       right_on="s_suppkey", how="inner",
                       num_partitions=16)
        j3 = hash_join(j2, j1, on="l_orderkey",
                       right_on="o_orderkey", how="inner",
                       num_partitions=16)

        def local_only(b: pa.Table) -> pa.Table:
            d = b.filter(pc.equal(b.column("s_nationkey"),
                                  b.column("c_nationkey")))
            return d.select(["s_nationkey", "rev_e4"])

        per_nat = (j3.map_batches(local_only, batch_format="pyarrow")
                   .groupby("s_nationkey", num_partitions=8)
                   .aggregate(Sum("rev_e4", alias_name="rev_e4")))

        def finish(b: pa.Table) -> pa.Table:
            names = [nk2name[k] for k in
                     b.column("s_nationkey").to_pylist()]
            # no final round(,2): see q3 finish() — the single IEEE
            # division matches the oracle bit-for-bit
            return pa.table({
                "n_name": pa.array(names, pa.string()),
                "revenue": pc.divide(pc.cast(b.column("rev_e4"),
                                             pa.float64()), 10000.0),
            })

        return per_nat.map_batches(finish, batch_format="pyarrow")

    def q_q14_promo_revenue(sf_dir: str):
        """TPC-H Q14 shape (promo revenue for one ship-month): the
        lineitem ⋈ part large-large join — part travels as a shuffled
        column (at 10^12 rows the part dim is NOT broadcastable), the
        month filter prunes lineitem at the read, and the final
        global sums fold map-side as EXACT integers (rev_e4 = cents x
        (100 − discount_pct); one partial row per block, driver
        tree-sum over ints — order-independent, and the only float op
        is one final IEEE division, so the oracle comparison can never
        drift)."""
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        from arabic_ocr_ray.functions.joins import hash_join

        lo = pa.scalar(np.datetime64("1996-09-01T00:00:00", "us"),
                       pa.timestamp("us"))
        hi = pa.scalar(np.datetime64("1996-10-01T00:00:00", "us"),
                       pa.timestamp("us"))

        def lrev(b: pa.Table) -> pa.Table:
            m = pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                        pc.less(b.column("l_shipdate"), hi))
            d = b.filter(m)
            cents = np.rint(np.asarray(d.column("l_extendedprice"),
                                       dtype=np.float64)
                            * 100.0).astype(np.int64)
            dpct = np.rint(np.asarray(d.column("l_discount"),
                                      dtype=np.float64)
                           * 100.0).astype(np.int64)
            return pa.table({
                "l_partkey": d.column("l_partkey"),
                "rev_e4": pa.array(cents * (100 - dpct), pa.int64()),
            })

        li = _rp(os.path.join(sf_dir, "lineitem.parquet"),
                 columns=["l_partkey", "l_extendedprice",
                          "l_discount", "l_shipdate"]).map_batches(
            lrev, batch_format="pyarrow")
        parts = _rp(os.path.join(sf_dir, "part.parquet"),
                    columns=["p_partkey", "p_type"])
        j = hash_join(li, parts, on="l_partkey",
                      right_on="p_partkey", how="inner",
                      num_partitions=16)

        def partial(b: pa.Table) -> pa.Table:
            rev = np.asarray(b.column("rev_e4"), dtype=np.int64)
            promo = np.asarray(
                pc.equal(b.column("p_type"), "PROMO"), dtype=bool)
            return pa.table({
                "promo_e4": pa.array([int(rev[promo].sum())],
                                     pa.int64()),
                "total_e4": pa.array([int(rev.sum())], pa.int64()),
            })

        parts_df = (j.map_batches(partial, batch_format="pyarrow")
                    .to_pandas())
        # no final round(,2): see q3 finish() — one IEEE division of
        # the exact integer sum matches the oracle bit-for-bit
        return pd.DataFrame({
            "promo_rev": [int(parts_df["promo_e4"].sum()) / 10000.0],
            "total_rev": [int(parts_df["total_e4"].sum()) / 10000.0],
        })

    def q_top_orders(sf_dir: str, k: int = 10):
        """Top-k WITHOUT a global sort: per-block top-k partials
        (map-side combine) → one tiny driver merge of ≤ k×blocks rows —
        the `ann._merge_topk` shape.  A `sort().limit(10)` would
        all-to-all-shuffle the whole orders table for a 10-row answer."""
        import numpy as np
        import pyarrow as pa

        orders = _rp(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_totalprice"])

        def block_topk(b: pa.Table) -> pa.Table:
            price = np.asarray(b.column("o_totalprice"), dtype=np.float64)
            okey = np.asarray(b.column("o_orderkey"), dtype=np.int64)
            order = np.lexsort((okey, -price))[:k]
            return b.take(pa.array(order, pa.int64()))

        partials = orders.map_batches(block_topk, batch_format="pyarrow")
        merged = partials.to_pandas()  # ≤ k × n_blocks rows — tiny
        return (merged.sort_values(["o_totalprice", "o_orderkey"],
                                   ascending=[False, True])
                .head(k).reset_index(drop=True))

    def q_segment_order_stats(sf_dir: str):
        import numpy as np
        import pyarrow as pa
        import ray

        cust = _rp(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"]).to_pandas()
        lookup_ref = ray.put((
            pa.array(cust["c_custkey"], pa.int64()),
            pa.array(cust["c_mktsegment"], pa.string())))

        def add_seg(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ks, vs = ray.get(lookup_ref)
            idx = pc.index_in(b.column("o_custkey").combine_chunks()
                              .cast(pa.int64()), value_set=ks)
            seg = pc.fill_null(pc.take(vs, idx), "")
            return pa.table({
                "c_mktsegment": seg,
                "o_totalprice": b.column("o_totalprice"),
            })

        orders = _rp(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice"])
        g = orders.map_batches(add_seg, batch_format="pyarrow").groupby(
            "c_mktsegment").aggregate(
                Count(alias_name="n_orders"),
                Sum("o_totalprice", alias_name="sum_price"))

        def r2(b: pa.Table) -> pa.Table:
            return pa.table({
                "c_mktsegment": b.column("c_mktsegment"),
                "n_orders": b.column("n_orders"),
                "sum_price": pa.array(
                    np.round(np.asarray(b.column("sum_price"),
                                        dtype=np.float64), 2), pa.float64()),
            })

        return g.map_batches(r2, batch_format="pyarrow")

    def q_order_customer_join(sf_dir: str):
        """Native Ray `Dataset.join` (hash-partitioned shuffle join) —
        the non-broadcast counterpart of segment_order_stats' lookup:
        appropriate when BOTH sides are large."""
        import ray

        orders = _rp(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey"])
        cust = _rp(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_name"])
        cpus = int(ray.cluster_resources().get("CPU", 4)) \
            if ray.is_initialized() else 4
        return orders.join(
            cust, join_type="inner",
            num_partitions=max(2, min(8, cpus)),
            on=("o_custkey",), right_on=("c_custkey",),
        ).select_columns(["o_orderkey", "c_name"])

    def q_events_hourly(sf_dir: str):
        import numpy as np
        import pyarrow as pa

        ev = _rp(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "value"])

        def hour_bucket(b: pa.Table) -> pa.Table:
            us = b.column("ts").cast(pa.int64())
            hour = pa.array(np.asarray(us) // 3_600_000_000, pa.int64())
            return pa.table({"user_id": b.column("user_id"),
                             "hour_id": hour,
                             "value": b.column("value")})

        g = (ev.map_batches(hour_bucket, batch_format="pyarrow")
             .groupby(["user_id", "hour_id"])
             .aggregate(Count(alias_name="n_events"),
                        Sum("value", alias_name="sum_value")))

        def r2(b: pa.Table) -> pa.Table:
            import numpy as np

            return pa.table({
                "user_id": b.column("user_id"),
                "hour_id": b.column("hour_id"),
                "n_events": b.column("n_events"),
                "sum_value": pa.array(
                    np.round(np.asarray(b.column("sum_value"),
                                        dtype=np.float64), 2), pa.float64()),
            })

        return g.map_batches(r2, batch_format="pyarrow")

    def q_event_type_counts(sf_dir: str):
        ev = _rp(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type"])
        return ev.groupby("event_type").aggregate(Count(alias_name="n"))

    def q_top_orders_by_segment(sf_dir: str, k: int = 3):
        """Grouped top-k: highest-value k orders per market segment —
        per-block per-group partials, fixed-partition merge, no global
        sort (functions/topk.py)."""
        import numpy as np
        import pyarrow as pa
        import ray

        from arabic_ocr_ray.functions.topk import grouped_topk

        cust = _rp(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"]).to_pandas()
        lookup_ref = ray.put((
            pa.array(cust["c_custkey"], pa.int64()),
            pa.array(cust["c_mktsegment"], pa.string())))

        def add_seg(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ks, vs = ray.get(lookup_ref)
            idx = pc.index_in(b.column("o_custkey").combine_chunks()
                              .cast(pa.int64()), value_set=ks)
            seg = pc.fill_null(pc.take(vs, idx), "")
            return pa.table({
                "c_mktsegment": seg,
                "o_orderkey": b.column("o_orderkey"),
                "o_totalprice": b.column("o_totalprice"),
            })

        orders = _rp(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_totalprice"])
        tagged = orders.map_batches(add_seg, batch_format="pyarrow")
        return grouped_topk(tagged, ["c_mktsegment"], "o_totalprice",
                            k=k, descending=True,
                            tie_cols=("o_orderkey",))

    def q_events_preceding_count(sf_dir: str):
        from arabic_ocr_ray.functions.windows import preceding_count

        ev = _rp(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_id", "user_id", "ts"])
        return preceding_count(ev, window_us=3600 * 1_000_000)

    def q_event_sessions(sf_dir: str):
        from arabic_ocr_ray.functions.windows import session_stats

        ev = _rp(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts"])
        return session_stats(ev)

    def q_event_type_distinct_users(sf_dir: str):
        """EXACT distinct count per key (the contrast partner of the
        HLL sketch): two-level groupby — distinct (type, user) pairs
        first (shuffle on the pair), then a count per type (tiny)."""
        ev = _rp(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "user_id"])
        pairs = (ev.groupby(["event_type", "user_id"])
                 .aggregate(Count(alias_name="_n")))
        return (pairs.groupby("event_type")
                .aggregate(Count(alias_name="n_users")))

    def q_hll_user_registers(sf_dir: str):
        """Deterministic HyperLogLog registers for distinct users per
        event type (functions/sketch.py) — the registers themselves
        are exact/hash-verified; only the estimate is approximate
        (error-bound-gated in pytest)."""
        from arabic_ocr_ray.functions.sketch import hll_registers

        ev = _rp(os.path.join(sf_dir, "events.parquet"),
                             columns=["event_type", "user_id"])
        return hll_registers(ev, "event_type", "user_id")

    def q_events_hopping(sf_dir: str):
        """Hopping windows (size 1 h, hop 30 min → 2 windows/event)."""
        import numpy as np
        import pyarrow as pa

        from arabic_ocr_ray.functions.windows import hopping_window

        ev = _rp(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "ts", "value"])
        g = hopping_window(ev, size_us=3600 * 1_000_000,
                           hop_us=1800 * 1_000_000)

        def r2(b: pa.Table) -> pa.Table:
            return pa.table({
                "user_id": b.column("user_id"),
                "window_id": b.column("window_id"),
                "n_events": b.column("n_events"),
                "sum_value": pa.array(
                    np.round(np.asarray(b.column("sum_value"),
                                        dtype=np.float64), 2),
                    pa.float64()),
            })

        return g.map_batches(r2, batch_format="pyarrow")

    def q_user_value_median(sf_dir: str):
        from arabic_ocr_ray.functions.windows import grouped_median

        ev = _rp(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "value"])
        return grouped_median(ev, "user_id", "value")

    def q_user_value_p90(sf_dir: str):
        from arabic_ocr_ray.functions.windows import grouped_quantile

        ev = _rp(os.path.join(sf_dir, "events.parquet"),
                             columns=["user_id", "value"])
        return grouped_quantile(ev, "user_id", "value", q=0.9)

    def q_doc_normalize(sf_dir: str):
        return _docs(sf_dir).map_batches(text.normalize_batch,
                                         batch_format="pyarrow")

    def q_top_tokens(sf_dir: str):
        return text.top_tokens(_docs(sf_dir), k=20)

    def q_doc_sample(sf_dir: str):
        """Deterministic hash sample (12.5%): keep iff the first md5
        hex digit of str(doc_id) is < '2' — reproducible across runs,
        cluster layouts and resume boundaries (a seeded
        random_shuffle sample is none of those), and exactly
        twinnable in SQL (DuckDB has md5 but no crc32)."""
        import hashlib

        import pyarrow as pa

        def pick(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_pylist()
            keep = [hashlib.md5(str(i).encode()).hexdigest()[0] < "2"
                    for i in ids]
            return b.filter(pa.array(keep))

        return _docs(sf_dir, cols=("doc_id",)).map_batches(
            pick, batch_format="pyarrow")

    def q_customer_event_coverage(sf_dir: str):
        """Left-OUTER hash join: every customer survives with its
        event count (0 on miss), rolled up per market segment.  The
        event side is pre-aggregated to (user, n) BEFORE the join —
        the join moves one row per user, not one per event (the
        scale-correct order at 10^12 events)."""
        import numpy as np
        import pyarrow as pa
        from ray.data.aggregate import Count, Sum

        from arabic_ocr_ray.functions.joins import hash_join

        ev = _rp(os.path.join(sf_dir, "events.parquet"),
                 columns=["user_id"])
        cnt = ev.groupby("user_id").aggregate(
            Count(alias_name="n_ev"))
        cust = _rp(os.path.join(sf_dir, "customer.parquet"),
                   columns=["c_custkey", "c_mktsegment"])
        # static hint: skips the plan-time execution of the event
        # count aggregate
        j = hash_join(cust, cnt, on="c_custkey", right_on="user_id",
                      how="left", num_partitions=16,
                      right_schema=pa.schema([("user_id", pa.int64()),
                                              ("n_ev", pa.int64())]))

        def fin(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            n = pc.fill_null(b.column("n_ev").cast(pa.int64()), 0)
            return pa.table({
                "c_mktsegment": b.column("c_mktsegment"),
                "n_ev": n,
                "has_ev": pc.cast(pc.greater(n, 0), pa.int64()),
            })

        out = (j.map_batches(fin, batch_format="pyarrow")
               .groupby("c_mktsegment", num_partitions=4)
               .aggregate(Count(alias_name="n_customers"),
                          Sum("has_ev", alias_name="n_with_events"),
                          Sum("n_ev", alias_name="total_events")))
        return _typed(out, {"c_mktsegment": "object",
                            "n_customers": "int64",
                            "n_with_events": "int64",
                            "total_events": "int64"})

    def q_customers_without_events(sf_dir: str):
        """Shuffled ANTI join: customers with no events, counted per
        market segment.  The r2 version materialized the distinct
        event users on the driver (``unique() → set → ray.put``) —
        that broadcast side is *distinct event users*, unbounded
        unlike a dim table (driver OOM at 10^12 events).  Now a
        hash-partitioned anti join (functions/joins.py:hash_join):
        the event keys travel as a shuffled column, never a driver
        set; no pre-distinct needed (left-anti tolerates dup keys)."""
        from arabic_ocr_ray.functions.joins import hash_join

        ev_users = _rp(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id"])
        cust = _rp(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"])
        anti = hash_join(cust, ev_users, on="c_custkey",
                         right_on="user_id", how="anti",
                         num_partitions=32)
        return anti.groupby("c_mktsegment").aggregate(
            Count(alias_name="n_customers"))

    def q_customers_without_events_bloom(sf_dir: str):
        """Same anti join via the Bloom prefilter scale path
        (functions/bloom.py): the right side's keys collapse to a
        FIXED-SIZE bitmap broadcast (128 KiB at m=2^20, any key
        count); Bloom misses stream to the output with ZERO shuffle
        and only possible hits (true matches + a few-permille FP
        band) pay the exact shuffled anti join.  Parity-tested and
        sharing the exact path's oracle."""
        from arabic_ocr_ray.functions.bloom import anti_join_bloom

        ev_users = _rp(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id"])
        cust = _rp(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"])
        anti = anti_join_bloom(cust, ev_users, on="c_custkey",
                               right_on="user_id",
                               num_partitions=32)
        return anti.groupby("c_mktsegment").aggregate(
            Count(alias_name="n_customers"))

    def q_orders_asof_event(sf_dir: str):
        from arabic_ocr_ray.functions.joins import asof_join

        orders = _rp(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"])
        events = _rp(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "value"])
        return asof_join(
            orders, events,
            key_left="o_custkey", key_right="user_id",
            ts_left="o_orderdate", ts_right="ts",
            left_cols=["o_orderkey"], right_cols=["value"],
            right_id="event_id",
        )

    def q_events_asof_order(sf_dir: str):
        """Reverse direction of orders_asof_event with REAL matches:
        the driver's orders all predate its events, so that query's
        right values are entirely null (vacuous on the value column);
        here every event finds the user's latest order."""
        from arabic_ocr_ray.functions.joins import asof_join

        orders = _rp(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_orderdate"])
        events = _rp(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts"])
        return asof_join(
            events, orders,
            key_left="user_id", key_right="o_custkey",
            ts_left="ts", ts_right="o_orderdate",
            left_cols=["event_id"], right_cols=["o_orderkey"],
            right_id="o_orderkey",
        )

    def q_events_above_type_mean(sf_dir: str):
        """Composite-key join end-to-end: events strictly above their
        (user_id, event_type) mean value, rolled up per type.  The
        per-group mean never materializes as a float — the comparison
        is the exact integer cross-multiplication v_c·n > Σv_c
        (cents), so no division/rounding can drift vs the oracle.
        Shuffle shape: one multi-key groupby (map-side combined by
        Ray's aggregate), ONE composite-hash `hash_join` (both key
        columns folded into a single partition key — one shuffle
        regardless of key arity), then a type-sized rollup."""
        import numpy as np
        import pyarrow as pa
        from ray.data.aggregate import Count, Sum

        from arabic_ocr_ray.functions.joins import hash_join

        ev = _rp(os.path.join(sf_dir, "events.parquet"),
                 columns=["user_id", "event_type", "value"])

        def cents(b: pa.Table) -> pa.Table:
            v = np.asarray(b.column("value"), dtype=np.float64)
            return pa.table({
                "user_id": b.column("user_id"),
                "event_type": b.column("event_type"),
                "v_c": pa.array(np.round(v * 100).astype(np.int64)),
            })

        evc = ev.map_batches(cents, batch_format="pyarrow")
        agg = (evc.groupby(["user_id", "event_type"])
               .aggregate(Sum("v_c", alias_name="s"),
                          Count(alias_name="n")))
        # static hint: skips the plan-time execution of the per-user
        # Sum/Count aggregate
        j = hash_join(evc, agg, on=["user_id", "event_type"],
                      how="inner", num_partitions=16,
                      right_schema=pa.schema([
                          ("user_id", pa.int64()),
                          ("event_type", pa.string()),
                          ("s", pa.int64()), ("n", pa.int64())]))

        def above(b: pa.Table) -> pa.Table:
            v = np.asarray(b.column("v_c"), dtype=np.int64)
            n = np.asarray(b.column("n"), dtype=np.int64)
            s = np.asarray(b.column("s"), dtype=np.int64)
            return b.filter(pa.array(v * n > s))

        out = (j.map_batches(above, batch_format="pyarrow")
               .groupby("event_type", num_partitions=4)
               .aggregate(Count(alias_name="n_above")))
        return _typed(out, {"event_type": "object",
                            "n_above": "int64"})

    def q_events_range_join(sf_dir: str):
        """Interval (range) join: each purchase event opens a 1-hour
        half-open window [ts, ts+1h); count and id-sum the same user's
        events inside it (the purchase itself matches its own window,
        so every purchase appears)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from arabic_ocr_ray.functions.joins import range_join

        ev = _rp(os.path.join(sf_dir, "events.parquet"),
                 columns=["event_id", "user_id", "ts", "event_type"])

        def purchases(b: pa.Table) -> pa.Table:
            d = b.filter(pc.equal(b.column("event_type"), "purchase"))
            lo = d.column("ts").cast(pa.int64())
            return pa.table({
                "p_id": d.column("event_id"),
                "p_user": d.column("user_id"),
                "lo": lo,
                "hi": pc.add(lo, 3_600_000_000),
            })

        intervals = ev.map_batches(purchases, batch_format="pyarrow")
        joined = range_join(
            ev.select_columns(["event_id", "user_id", "ts"]), intervals,
            key_left="user_id", key_right="p_user",
            ts_left="ts", lo_right="lo", hi_right="hi",
            left_cols=["event_id"], right_cols=["p_id"])
        out = (joined.groupby("p_id")
               .aggregate(Count(alias_name="n_follow"),
                          Sum("event_id", alias_name="sum_follow_id")))
        return _typed(out, {"p_id": "int64", "n_follow": "int64",
                            "sum_follow_id": "int64"})

    def q_curate_corpus(sf_dir: str):
        """Flagship composition: quality gate -> exact dedup ->
        near-dup removal -> per-lang doc/token stats, one streaming
        pipeline (pipelines/curate.py; every stage an oracle-verified
        operator)."""
        from arabic_ocr_ray.pipelines.curate import curate_corpus

        out = curate_corpus(_docs(sf_dir, cols=("doc_id", "text",
                                                "lang")))
        return _typed(out, {"lang": "object", "n_docs": "int64",
                            "sum_tokens": "int64"})

    # ---------------- multimodal plumbing -------------------------------
    def q_mm_decode(sf_dir: str):
        """Synthesize real container headers (PNG/WAV/AVI) from the
        documents table INSIDE map_batches (no driver materialization),
        then parse them back with the actor-pool HeaderDecoder — a
        full synthesize→probe round trip the SQL twin reproduces from
        the same integer formulas."""
        payloads = _docs(sf_dir).map_batches(
            multimodal.payload_table_from_documents,
            batch_format="pyarrow")
        return multimodal.decode_metadata(payloads, concurrency=2,
                                          batch_size=64)

    def q_mm_resize_plan(sf_dir: str):
        """Chained: synthesize → probe → integer thumbnail plan for
        every ok image (fit longer side to 224)."""
        payloads = _docs(sf_dir).map_batches(
            multimodal.payload_table_from_documents,
            batch_format="pyarrow")
        meta = multimodal.decode_metadata(payloads, concurrency=2,
                                          batch_size=64)
        return multimodal.resize_plan(meta, target=224)

    def q_mm_frame_plan(sf_dir: str):
        """Chained multimodal pipeline: synthesize → probe headers →
        frame-sampling plan for every ok video (every 10th frame)."""
        payloads = _docs(sf_dir).map_batches(
            multimodal.payload_table_from_documents,
            batch_format="pyarrow")
        meta = multimodal.decode_metadata(payloads, concurrency=2,
                                          batch_size=64)
        return multimodal.frame_sample_plan(meta, every=10)

    def q_mm_pixel_stats(sf_dir: str):
        """REAL bulk pixel decode (the r4 StubDecoder gap): synthesize
        genuine PNGs (zlib IDAT, alternating None/Up filters) from the
        documents table inside map_batches, bulk-decode pixels with
        the stdlib codec (functions/codecs.py), and emit integer pixel
        sums the SQL twin reproduces in closed form — green only if
        encode, zlib, UNFILTER and the stats all round-trip exactly."""
        import pyarrow.compute as pc

        payloads = _docs(sf_dir).map_batches(
            multimodal.pixel_payload_table_from_documents,
            batch_format="pyarrow")
        meta = multimodal.decode_metadata(
            payloads, concurrency=2, batch_size=64,
            decoder=multimodal.PixelDecoder)

        def keep(b):
            m = pc.and_(pc.equal(b.column("kind"), "image"),
                        pc.equal(b.column("status"), "ok"))
            return b.filter(m).select(
                ["item_id", "width", "height", "sum_px"])

        return meta.map_batches(keep, batch_format="pyarrow")

    def q_mm_audio_stats(sf_dir: str):
        """REAL WAV PCM decode: genuine RIFF/PCM payloads decoded with
        the stdlib wave codec; integer sample stats (sum|s|, max|s|)
        twinned by a generate_series oracle."""
        import pyarrow.compute as pc

        payloads = _docs(sf_dir).map_batches(
            multimodal.pixel_payload_table_from_documents,
            batch_format="pyarrow")
        meta = multimodal.decode_metadata(
            payloads, concurrency=2, batch_size=64,
            decoder=multimodal.PixelDecoder)

        def keep(b):
            m = pc.and_(pc.equal(b.column("kind"), "audio"),
                        pc.equal(b.column("status"), "ok"))
            return b.filter(m).select(
                ["item_id", "channels", "frames", "sum_abs",
                 "peak_abs"])

        return meta.map_batches(keep, batch_format="pyarrow")

    def q_mm_video_frames(sf_dir: str):
        """REAL video frame decode (closes the last decoder stub):
        synthesize genuine uncompressed RIFF-AVI payloads (24-bit
        bottom-up BGR ``00db`` frames + idx1 index) from the documents
        table, bulk-decode every frame with the stdlib codec
        (functions/codecs.py:avi_encode/avi_decode_frames), sample
        every 2nd frame, and emit integer per-frame pixel sums the SQL
        twin reproduces in closed form — green only if the container
        writer, the RIFF chunk walk, the bottom-up BGR de-padding and
        the frame sampling all round-trip exactly."""
        payloads = _docs(sf_dir).map_batches(
            multimodal.video_payload_table_from_documents,
            batch_format="pyarrow")
        return payloads.map_batches(
            multimodal.FrameSampler,
            batch_format="pyarrow",
            batch_size=64,
            concurrency=2,
            num_cpus=1,
        )

    def q_mm_jpeg_stats(sf_dir: str):
        """REAL JPEG decode (closes the last image-codec gap): encode
        genuine baseline ITU-T T.81 JPEGs (huffman entropy coding,
        8×8 DCT, quality-50 Annex K quantization; even docs grayscale
        with DRI/RSTn restart markers, odd docs RGB through the full
        JFIF YCbCr + 4:2:0 subsample path) from the documents table,
        bulk-decode with functions/jpeg.py, and emit integer pixel
        sums.  Every 8×8 block is flat at 128+16k, so decode is
        byte-exact and the SQL twin is closed-form — green only if
        the marker walk, huffman tables, DC DPCM, dequant, inverse
        DCT and color reconstruction all round-trip exactly."""
        import pyarrow.compute as pc

        payloads = _docs(sf_dir).map_batches(
            multimodal.jpeg_payload_table_from_documents,
            batch_format="pyarrow")
        meta = multimodal.decode_metadata(
            payloads, concurrency=2, batch_size=64,
            decoder=multimodal.PixelDecoder)

        def keep(b):
            return b.filter(pc.equal(b.column("status"), "ok")).select(
                ["item_id", "width", "height", "channels", "sum_px"])

        return meta.map_batches(keep, batch_format="pyarrow")

    def q_pdf_extract(sf_dir: str):
        """REAL PDF text + layout parse (the north rule's "PDF/layout
        parse" payload): synthesize genuine PDF 1.4 documents from the
        documents table (two-column pages, hash-SCRAMBLED span
        emission order, Tj / TJ-kerning / UTF-16BE-hex string styles,
        alternating Flate/raw content streams, real xref tables), then
        extract with the stdlib-only COS parser + content-stream
        interpreter (functions/pdftext.py) — the row is only green if
        the writer, the xref walk, the string/stream decoders AND the
        geometric reading-order reconstruction all round-trip exactly
        back to the source text."""
        import pyarrow as pa
        import pyarrow.compute as pc

        payloads = _docs(sf_dir).map_batches(
            pdftext.pdf_payload_table_from_documents,
            batch_format="pyarrow")
        out = payloads.map_batches(
            pdftext.PdfExtractor,
            batch_format="pyarrow", batch_size=64, concurrency=2,
            num_cpus=1)

        def fin(b: pa.Table) -> pa.Table:
            # wrap is split(' ') at 8 words/line, so '\n'→' ' is its
            # exact inverse — the SQL twin compares the source text
            t = pc.replace_substring(b.column("text"),
                                     pattern="\n", replacement=" ")
            return pa.table({"item_id": b.column("item_id"),
                             "text": t,
                             "n_pages": b.column("n_pages")})

        return out.map_batches(fin, batch_format="pyarrow")

    def q_mixed_extract(sf_dir: str):
        """Mixed html/PDF corpus through ONE extraction pipeline (the
        north rule's payload list is "HTML boilerplate strip,
        PDF/layout parse" — same pipeline, per-row dispatch): every
        third url's html payload is replaced by a line-preserving PDF
        of its golden text (text_to_pdf — real xref/Flate/hex/Arabic
        strings, scrambled two-column emission), and MixedExtract
        splits each batch by magic bytes inside the fused actor stage.
        Oracle = the SAME golden-text contract as extract_pages: every
        row must round-trip byte-identically whichever branch it took.
        """
        import zlib as _z

        import pyarrow as pa

        from arabic_ocr_ray.stages.extract_stage import MixedExtract

        fx = _fixture(sf_dir)
        src = _rp(fx["pages"], columns=["url", "html", "lang", "text"])

        def make_mixed(b: pa.Table) -> pa.Table:
            urls = b.column("url").to_pylist()
            htmls = b.column("html").to_pylist()
            texts = b.column("text").to_pylist()
            payloads = []
            for u, h, t in zip(urls, htmls, texts):
                c = _z.crc32(u.encode())
                payloads.append(pdftext.text_to_pdf(t, c)
                                if c % 3 == 0 else h)
            return pa.table({"url": b.column("url"),
                             "html": pa.array(payloads, pa.binary()),
                             "lang": b.column("lang")})

        mixed = src.map_batches(make_mixed, batch_format="pyarrow")
        return (extract_pages(mixed, batch_size=32, concurrency=_conc(),
                              stage_cls=MixedExtract)
                .select_columns(["url", "extracted_text"]))

    # NOTE on ordering: the driver evaluates only the FIRST 50 dict entries
    # (insertion order).  Rotation rule (r4 advice): every query whose
    # ENGINE OR ORACLE changed this round sits inside the window, plus
    # every query that r4 rotated out (so the union of r4+r5 rows covers
    # all entries — nothing goes two rounds without a fresh row).
    # In-window (50): the r5-changed set {warc_ingest (new), pdf_extract
    # (new), mm_* real-decode (new), extract family (extract.py
    # Dataset-input + tokenizer path), corpus_stats (vectorized sizes),
    # cross_snapshot_dups (side-namespaced verify), export_shards
    # (resume validation)} + the rows parked in r4.  Rotated out: all
    # r4-hash-green and untouched this round (plus doc_normalize /
    # doc_fingerprint, see below), each with a fresh full-registry
    # artifact row.
    return {
        "warc_ingest": q_warc_ingest,
        "extract_pages": q_extract,
        # (extract_eval — r4-hash-green, evaluate.py untouched since
        # round 1 (git-verified), the eval law also rides every
        # golden-soak and bench match_rate gate, artifact-covered —
        # yielded its slot to the NEW url_pattern_stats; moved below)
        "url_pattern_stats": q_url_pattern_stats,
        # (corpus_stats — r4-hash-green; its r5 pc.binary_length
        # vectorization has been green in every full-registry
        # artifact since (3 refreshes), and the aggregate law is
        # trivial — yielded its slot to the NEW co_citation; moved
        # past the window below)
        "co_citation": q_co_citation,
        "cross_snapshot_dups": q_cross_snapshot_dups,
        "export_shards": q_export_shards,
        # (train_prototypes — r4-hash-green, trainer untouched this
        # session, bit-identity to the sequential fold pinned by
        # pytest AND the triples-fixture oracle, artifact-covered —
        # yielded its slot to the NEW robots_filter; moved below)
        "robots_filter": q_robots_filter,
        # (curate_corpus — r4-hash-green, its composed path untouched
        # this session (v4 is a separate function), planted-case
        # pipeline test + artifact cover it — yielded its slot to the
        # NEW bitext_mine; moved past the window below)
        "bitext_mine": q_bitext_mine,
        "extract_incremental": q_extract_incremental,
        # (snapshot_diff — r4-hash-green, untouched this session,
        # law pinned by planted/identical-snapshot tests,
        # artifact-covered — yielded its slot to the NEW host_rank;
        # moved past the window below)
        "host_rank": q_host_rank,
        # (jaccard_dup_pairs — r4-hash-green, its PPJoin path
        # untouched this session, law pinned by the randomized
        # brute-parity test, artifact-covered — yielded its slot to
        # the NEW lang_length_bounds; moved past the window below)
        "lang_length_bounds": q_lang_length_bounds,
        # (near_dup_pairs — r4-hash-green, its self-join banding path
        # untouched by the r5 bipartite factoring, bench-measured
        # every round via the near_dup leg, planted-pair tests +
        # artifact cover it — yielded its slot to the NEW
        # host_dup_stats; moved past the window below)
        "host_dup_stats": q_host_dup_stats,
        # (doc_paragraph_dedup — r4-hash-green; paragraphs.py's r5
        # incremental additions stay exercised in-window by
        # para_dedup_incremental, the base law by its planted/
        # round-trip/randomized-parity tests + artifact — yielded its
        # slot to the NEW lang_confusion; moved past the window below)
        "lang_confusion": q_lang_confusion,
        "para_dedup_incremental": q_para_dedup_incremental,
        # (curate_corpus_v3 — r4-hash-green, the v3 composition
        # untouched this session (v4 is a separate function),
        # artifact-covered — yielded its slot to the NEW
        # mutual_links; moved past the window below)
        "mutual_links": q_mutual_links,
        # (mm_pixel_stats / mm_audio_stats — r4-hash-green with
        # multimodal.py untouched this session, artifact-covered —
        # yielded their slots to the NEW hits / host_graph so the
        # 1a91b02 join-hint representatives near_dup_clusters and
        # tfidf_top_terms stay in-window; moved past the window below)
        # (mm_video_frames / mm_jpeg_stats — r4-hash-green with
        # multimodal.py untouched this session, artifact-covered —
        # yielded their slots to the NEW url_filter / vocab_drift;
        # moved past the window with mm_pixel/mm_audio below)
        "knn_ivf_append": q_knn_ivf_append,
        "pdf_extract": q_pdf_extract,
        "mixed_extract": q_mixed_extract,
        # --- new this session (never driver-verified => window priority) --
        "exact_substring_spans": q_exact_substring_spans,
        "exact_substring_dedup": q_exact_substring_dedup,
        "doc_rare_tokens": q_rare_tokens,
        "near_dup_keep_best": q_near_dup_keep_best,
        "doc_lm_surprise": q_lm_surprise,
        "ccnet_buckets": q_ccnet_buckets,
        "pack_plan": q_pack_plan,
        "pack_chunk_stats": q_pack_chunk_stats,
        "dsir_weights": q_dsir_weights,
        "gopher_filter": q_gopher_filter,
        "bpe_vocab": q_bpe_vocab,
        # (bpe_encode_stats — a rows-only entry (no SQL twin is
        # possible for the iterative-global merge loop), so it gains
        # the least from a window slot; its law is pinned by the
        # brute-force recount oracle tests and bpe_vocab keeps the
        # family's rows check in-window — yielded its slot to the NEW
        # link_components; moved past the window below)
        "kmeans_clusters": q_kmeans_clusters,
        "semdedup": q_semdedup,
        "c4_filter": q_c4_filter,
        "gopher_repetition": q_gopher_repetition,
        "curate_corpus_v4": q_curate_v4,
        "outlinks": q_outlinks,
        "link_indegree": q_link_indegree,
        "pagerank": q_pagerank,
        "anchor_texts": q_anchor_texts,
        "bm25_topk": q_bm25_topk,
        "term_search": q_term_search,
        "postings_search": q_postings_search,
        "hits": q_hits,
        "host_graph": q_host_graph,
        "url_filter": q_url_filter,
        "vocab_drift": q_vocab_drift,
        "minhash_probe_dups": q_minhash_probe_dups,
        "link_components": q_link_components,
        # --- the 27 rows r4 parked past the window, rotated back in ------
        # (events_hopping, events_preceding_count, order_customer_join,
        # event_sessions, top_orders_by_segment, top_orders,
        # q14_promo_revenue and q5_local_supplier yielded their slots
        # to the NEW semdedup, c4_filter, gopher_repetition,
        # curate_corpus_v4 and the link-graph family
        # outlinks/link_indegree/pagerank/anchor_texts:
        # never-driver-verified queries take window priority; the
        # first five are r3-green with windows.py/joins.py untouched
        # this session, top_orders/q14/q5 changed in r4 (r1-r3 green
        # pre-change) and q5 is re-measured by bench.py every round —
        # ALL are hash-green in the full-registry artifact refreshed
        # at HEAD)
        # (q3_shipping — changed in r4 not r5, measured by bench.py's
        # q3 leg every round, artifact-covered — yielded its slot to
        # the NEW minhash_probe_dups; moved past the window below)
        # (events_above_type_mean / near_dup_clusters — both
        # r4-hash-green, untouched this session, artifact-covered —
        # yielded their slots to the NEW crawl_frontier/crawl_depth;
        # the 1a91b02 hash_join path stays exercised in-window by
        # tfidf_top_terms AND crawl_depth itself; moved below)
        "crawl_frontier": q_crawl_frontier,
        "crawl_depth": q_crawl_depth,
        # --- join/aggregate paths touched by the late-r5 schema-hint
        # sweep (commit 1a91b02) pulled inside the window; the four
        # untouched pure maps they displace are artifact-covered -----
        # (tfidf_top_terms — r4-hash-green, untouched this session,
        # artifact-covered, and the 1a91b02 hash_join path now stays
        # exercised in-window by crawl_depth — yielded its slot to
        # the NEW doc_chunk_plan; moved past the window below)
        "doc_chunk_plan": q_doc_chunk_plan,
        # (semantic_dedup / curate_corpus_v2 / customer_event_coverage
        # yielded their slots to the NEW retrieval family bm25_topk /
        # term_search / postings_search — never-driver-verified takes
        # priority; their changed code path — the 1a91b02 hash_join
        # schema hints — stays exercised IN-window by q3_shipping,
        # near_dup_clusters and tfidf_top_terms, and all three are
        # hash-green in the full-registry artifact refreshed at HEAD)
        "semantic_dedup": q_semantic_dedup,
        "curate_corpus_v2": q_curate_v2,
        "customer_event_coverage": q_customer_event_coverage,
        "q3_shipping": q_q3_shipping,
        "bpe_encode_stats": q_bpe_encode,
        "mm_pixel_stats": q_mm_pixel_stats,
        "mm_audio_stats": q_mm_audio_stats,
        "mm_video_frames": q_mm_video_frames,
        "mm_jpeg_stats": q_mm_jpeg_stats,
        "events_above_type_mean": q_events_above_type_mean,
        "near_dup_clusters": q_near_dup_clusters,
        "tfidf_top_terms": q_tfidf_top_terms,
        "jaccard_dup_pairs": q_jaccard_dup,
        "snapshot_diff": q_snapshot_diff,
        "train_prototypes": q_train_prototypes,
        "curate_corpus": q_curate_corpus,
        "extract_eval": q_extract_eval,
        "near_dup_pairs": q_near_dup,
        "curate_corpus_v3": q_curate_v3,
        "doc_paragraph_dedup": q_paragraph_dedup,
        "corpus_stats": q_corpus_stats,
        # --- past the 50-entry window: hash-green in CORRECTNESS_r04 and
        # untouched this round.  doc_normalize, doc_fingerprint and
        # doc_quality rotated out late-r5 to make room for the NEW
        # mm_video_frames, pdf_extract and mixed_extract (never
        # driver-verified queries take window priority); all three are
        # pure maps untouched since r3, pytest-covered, and hash-green in
        # the committed full-registry check_oracles run
        # (ORACLES_r5_full.log, rerun at final HEAD).  corpus_split and
        # common_paragraphs (both r4-hash-green, untouched this round,
        # artifact-covered) rotated out late-r5 for the NEW
        # mm_jpeg_stats, knn_ivf_append and para_dedup_incremental
        # (latest_capture likewise r4-green/untouched/artifact-covered).
        # doc_bigram_repetition / doc_char_stats / doc_lang_id (pure maps
        # untouched since r3, pytest-covered) yielded their window slots
        # to the three NEW late-r5 queries above; all three are
        # hash-green in the committed full-registry artifact rerun at
        # final HEAD (ORACLES_r5_full.log).  doc_redact_pii (same
        # status) yielded its slot to exact_substring_dedup.
        # events_hourly / event_type_counts / doc_token_count /
        # doc_token_count_bpe / doc_dup_lines / doc_line_filter (pure
        # maps/groupbys untouched by the late-r5 join changes,
        # artifact-covered at the refreshed final HEAD) yielded their
        # slots to the six join/aggregate queries the 1a91b02
        # schema-hint sweep touched; segment_order_stats (r4-green,
        # untouched, artifact-covered) yielded its slot to the NEW
        # doc_lm_surprise; url_canonical_dedup (r4-green, urls.py
        # untouched this round, artifact-covered) yielded its slot to
        # the NEW ccnet_buckets.  user_value_median / user_value_p90 /
        # hll_user_registers (windows.py + sketch.py untouched by this
        # session's additive-only changes, each hash-green in the
        # committed full-registry artifact refreshed at HEAD) yielded
        # their slots to the NEW pack_plan / pack_chunk_stats /
        # dsir_weights; event_type_distinct_users (same status) yielded
        # its slot to the NEW gopher_filter.  extract_dedup /
        # segment_stats (both hash-green in CORRECTNESS_r04 AND in the
        # full-registry artifact refreshed at HEAD 57628dc) yielded
        # their slots to the NEW bpe_vocab / bpe_encode_stats;
        # doc_decontaminate (r4-green, its benchmark_gram_ref /
        # contamination_hits code path untouched this round,
        # artifact-covered) yielded its slot to the NEW
        # kmeans_clusters. --------------------------------------------
        "events_hopping": q_events_hopping,
        "events_preceding_count": q_events_preceding_count,
        "order_customer_join": q_order_customer_join,
        "event_sessions": q_event_sessions,
        "q5_local_supplier": q_q5_local_supplier,
        "top_orders": q_top_orders,
        "q14_promo_revenue": q_q14_promo_revenue,
        "top_orders_by_segment": q_top_orders_by_segment,
        "extract_dedup": q_extract_dedup,
        "segment_stats": q_segment_stats,
        "doc_decontaminate": q_doc_decontaminate,
        "event_type_distinct_users": q_event_type_distinct_users,
        "user_value_median": q_user_value_median,
        "user_value_p90": q_user_value_p90,
        "hll_user_registers": q_hll_user_registers,
        "url_canonical_dedup": q_url_canonical_dedup,
        "segment_order_stats": q_segment_order_stats,
        "events_hourly": q_events_hourly,
        "event_type_counts": q_event_type_counts,
        "doc_token_count": q_token_count,
        "doc_token_count_bpe": q_bpe_token_count,
        "doc_dup_lines": q_dup_lines,
        "doc_line_filter": q_line_filter,
        "doc_redact_pii": q_redact_pii,
        "doc_bigram_repetition": q_bigram_repetition,
        "doc_char_stats": q_char_stats,
        "doc_lang_id": q_lang_id,
        "corpus_split": q_corpus_split,
        "latest_capture": q_latest_capture,
        "common_paragraphs": q_common_paragraphs,
        "doc_quality": q_quality,
        "doc_fingerprint": q_fingerprint,
        "doc_normalize": q_doc_normalize,
        "mixture_resample": q_mixture_resample,
        "customers_without_events_bloom": q_customers_without_events_bloom,
        "events_range_join": q_events_range_join,
        "top_tokens": q_top_tokens,
        "doc_sample": q_doc_sample,
        "customers_without_events": q_customers_without_events,
        "orders_asof_event": q_orders_asof_event,
        "events_asof_order": q_events_asof_order,
        "mm_decode_meta": q_mm_decode,
        "mm_frame_plan": q_mm_frame_plan,
        "mm_resize_plan": q_mm_resize_plan,
        "source_stats": q_source_stats,
        "source_cap": q_source_cap,
        "length_outliers": q_length_outliers,
        "lang_stratified_sample": q_lang_stratified_sample,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "dedup_exact": q_dedup_exact,
        "simhash_dup_pairs": q_simhash_dup,
        "embedding_near_dup": q_emb_near_dup,
        "embedding_near_dup_gather": q_emb_near_dup_gather,
        "knn_cosine": q_knn,
        "knn_ivf": q_knn_ivf,
        "knn_lsh": q_knn_lsh,
        "q1_pricing": q_q1_pricing,
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB), sf0.01
# --------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    fx = _fixture("/root/testdata/sf0.01")  # oracle always runs at sf0.01
    pages = fx["pages"]
    spans = fx["spans"]
    _knn_ids = ",".join(map(str, KNN_QUERIES))

    from arabic_ocr_ray.functions.text import STOPWORDS

    def stop_re(lang: str) -> str:
        return r"\b(?:" + "|".join(STOPWORDS[lang]) + r")\b"

    lang_counts = ", ".join(
        f"len(regexp_extract_all(lower(text), '{stop_re(lg)}')) AS {lg}_n"
        for lg in ("en", "de", "es", "fr"))

    out = {
        "extract_pages": (
            f"SELECT url, text AS extracted_text "
            f"FROM read_parquet('{pages}')"
        ),
        # raw-WARC ingest must land byte-identical to the parquet path:
        # same golden-text oracle
        "warc_ingest": (
            f"SELECT url, text AS extracted_text "
            f"FROM read_parquet('{pages}')"
        ),
        "extract_eval": (
            f"SELECT count(*) AS total_docs, count(*) AS matched_docs, "
            f"CAST(0 AS BIGINT) AS total_edit_distance "
            f"FROM read_parquet('{pages}')"
        ),
        "extract_dedup": (
            "SELECT count(*) AS n_groups, "
            "CAST(coalesce(sum(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) "
            "AS dup_docs FROM "
            f"(SELECT count(*) AS c FROM read_parquet('{pages}') "
            "GROUP BY text)"
        ),
        "corpus_stats": (
            # every aggregate CAST to BIGINT: DuckDB's sum() yields
            # HUGEINT (→ float64 in pandas) while the engine emits
            # int64 — identical values hash-mismatched in r1
            f"SELECT CAST(count(*) AS BIGINT) AS n_docs, "
            f"CAST(max(octet_length(html)) AS BIGINT) AS max_html_bytes, "
            f"CAST(sum(octet_length(html)) AS BIGINT) AS total_html_bytes, "
            f"CAST(max(length(text)) AS BIGINT) AS max_text_chars "
            f"FROM read_parquet('{pages}')"
        ),
        "segment_stats": (
            f"SELECT url, CAST(count(*) AS INT) AS n_spans "
            f"FROM read_parquet('{spans}') GROUP BY url"
        ),
        "train_prototypes": (
            # expected canonical model triples, written golden-by-
            # construction by the sequential fold in _fixture()
            f"SELECT score, label, fv "
            f"FROM read_parquet('{fx['triples']}')"
        ),
        "doc_token_count": (
            "SELECT doc_id, len(regexp_extract_all(text, "
            "'[^ \\t\\n\\r\\f\\v]+')) AS n_tokens "
            "FROM documents"
        ),
        # sliding-window chunk plan: same token law; the SCALAR
        # generate_series(0, nc-1) returns an empty list for nc = 0
        # (unnest emits no rows) so 0-token docs emit no chunks,
        # matching the engine's explode
        "doc_chunk_plan": (
            "WITH t AS (SELECT doc_id, len(regexp_extract_all(text, "
            "'[^ \\t\\n\\r\\f\\v]+')) AS n FROM documents), "
            "c AS (SELECT doc_id, n, CASE WHEN n = 0 THEN 0 "
            "WHEN n <= 64 THEN 1 "
            "ELSE (n - 64 + 47) // 48 + 1 END AS nc FROM t), "
            "e AS (SELECT doc_id, n, "
            "unnest(generate_series(0, nc - 1)) AS chunk_id FROM c) "
            "SELECT doc_id, chunk_id, chunk_id * 48 AS tok_start, "
            "least(chunk_id * 48 + 64, n) AS tok_end, "
            "n AS n_tokens FROM e"
        ),
        # per-lang percentile band: the engine's histogram lerp is
        # quantile_cont-bit-equal (pytest-pinned), so the inclusive
        # comparisons keep identical row sets
        "lang_length_bounds": (
            "WITH b AS (SELECT lang, "
            "quantile_cont(n_chars, 0.1) AS lo, "
            "quantile_cont(n_chars, 0.9) AS hi "
            "FROM documents GROUP BY lang) "
            "SELECT d.doc_id, d.lang, d.n_chars "
            "FROM documents d JOIN b USING (lang) "
            "WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi"
        ),
        "doc_token_count_bpe": (
            # same regex, same leftmost-first scan in RE2 (see
            # text.BPE_TOKEN_PATTERN - ASCII classes only so the two
            # engines cannot diverge on unicode categories)
            "SELECT doc_id, len(regexp_extract_all(text, "
            "'''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+"
            "| ?[^A-Za-z0-9 \\t\\n\\r\\f\\v]+')) "
            "AS n_bpe_tokens FROM documents"
        ),
        "doc_dup_lines": (
            "SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines, "
            "CAST(CASE WHEN n_lines > 0 THEN "
            "((n_lines - n_uniq) * 1000) // n_lines ELSE 0 END "
            "AS BIGINT) AS dup_line_permille FROM ("
            "SELECT doc_id, "
            "len(list_filter(string_split(text, chr(10)), "
            "x -> x != '')) AS n_lines, "
            "len(list_distinct(list_filter(string_split(text, "
            "chr(10)), x -> x != ''))) AS n_uniq FROM documents)"
        ),
        "doc_redact_pii": """SELECT doc_id, CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails, CAST(len(regexp_extract_all(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '[0-9]{7,}')) AS BIGINT) AS n_digit_runs, regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '[0-9]{7,}', '<DIGITS>', 'g') AS redacted_text FROM documents""",
        "doc_line_filter": (
            "SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines, "
            "CAST(len(ks) AS BIGINT) AS n_kept, "
            "coalesce(array_to_string(ks, chr(10)), '') AS clean_text "
            "FROM (SELECT doc_id, ls, list_filter(ls, x -> "
            "regexp_matches(x, '[.!?\"]$') AND "
            "len(regexp_extract_all(x, '[^ \\t\\n\\r\\f\\v]+')) >= 3) "
            "AS ks FROM (SELECT doc_id, "
            "list_filter(string_split(text, chr(10)), x -> x != '') "
            "AS ls FROM documents))"
        ),
        "doc_bigram_repetition": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '[a-z0-9]+') AS w "
            "FROM documents), "
            "pairs AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS bg "
            "FROM toks, UNNEST(generate_series(1, len(w)-1)) AS t(i) "
            "WHERE len(w) >= 2), "
            "counts AS (SELECT doc_id, bg, count(*) AS c "
            "FROM pairs GROUP BY doc_id, bg), "
            "top AS (SELECT doc_id, max(c) AS top_c, sum(c) AS total "
            "FROM counts GROUP BY doc_id) "
            "SELECT d.doc_id, "
            "CAST(coalesce(top_c, 0) AS BIGINT) AS top_bigram_count, "
            "CAST(coalesce((top_c * 1000) // total, 0) AS BIGINT) "
            "AS top_bigram_permille "
            "FROM documents d LEFT JOIN top USING (doc_id)"
        ),
        "tfidf_top_terms": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) "
            "AS token FROM documents), "
            "tf AS (SELECT doc_id, token, count(*) AS tf "
            "FROM toks GROUP BY doc_id, token), "
            "df AS (SELECT token, count(*) AS df "
            "FROM tf GROUP BY token), "
            "n AS (SELECT count(*) AS n FROM documents), "
            "scored AS (SELECT doc_id, token, "
            "CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, "
            "CAST((CAST(tf AS HUGEINT) * 1000 * n) // df AS BIGINT) "
            "AS score_x1000 FROM tf JOIN df USING (token), n) "
            "SELECT doc_id, token, tf, df, score_x1000, "
            "CAST(rk AS BIGINT) AS rank FROM ("
            "SELECT *, row_number() OVER (PARTITION BY doc_id "
            "ORDER BY score_x1000 DESC, token ASC) AS rk "
            "FROM scored) WHERE rk <= 3"
        ),
        # BM25 integer law (retrieval.py): idf = (2(N-df)+1)/(2df+1),
        # tf term cleared to 22*tf*T/(10*tf*T + 3T + 9*dl*N), one
        # floor per term at e6 — HUGEINT keeps the twin exact where
        # the engine uses python ints
        "bm25_topk": (
            "WITH dl AS (SELECT doc_id, coalesce(len("
            "regexp_extract_all(lower(text), '[a-z0-9]+')), 0) AS dl "
            "FROM documents), "
            "nt AS (SELECT count(*) AS n, "
            "(SELECT coalesce(sum(dl), 0) FROM dl) AS t "
            "FROM documents), "
            "toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) "
            "AS token FROM documents), "
            "tf AS (SELECT doc_id, token, count(*) AS tf FROM toks "
            "WHERE token IN ('dup', 'hash', 'vector') "
            "GROUP BY 1, 2), "
            "df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1), "
            "sc AS (SELECT tf.doc_id, "
            "CAST(((2*(n - df) + 1) * 22 * CAST(tf.tf AS HUGEINT) "
            "* t * 1000000) // ((2*df + 1) * "
            "(10 * CAST(tf.tf AS HUGEINT) * t + 3*t + 9*dl.dl*n)) "
            "AS BIGINT) AS s "
            "FROM tf JOIN df USING (token) "
            "JOIN dl ON dl.doc_id = tf.doc_id, nt), "
            "agg AS (SELECT doc_id, CAST(sum(s) AS BIGINT) "
            "AS score_e6 FROM sc GROUP BY 1) "
            "SELECT doc_id, score_e6, CAST(rk AS BIGINT) AS rank "
            "FROM (SELECT *, row_number() OVER ("
            "ORDER BY score_e6 DESC, doc_id ASC) AS rk FROM agg) "
            "WHERE rk <= 10"
        ),
        # conjunctive AND — count(*) over per-(doc, term) rows =
        # distinct query terms present; ONE definition, TWO consumers
        # (term_search scans, postings_search goes through the
        # materialized bucket index — same semantics by contract)
        "term_search": (
            "WITH toks AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) "
            "AS token FROM documents), "
            "tf AS (SELECT doc_id, token, count(*) AS tf FROM toks "
            "WHERE token IN ('dup', 'hash') GROUP BY 1, 2) "
            "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_hits "
            "FROM tf GROUP BY doc_id HAVING count(*) = 2"
        ),
        "source_stats": (
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
            "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs "
            "FROM documents GROUP BY source"
        ),
        "cms_heavy_hitters": """WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '[^ \t\n\r\f\v]+')) AS tok FROM documents), counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok), top20 AS (SELECT tok, n FROM counts ORDER BY n DESC, tok ASC LIMIT 20), hashes AS (SELECT c.tok, c.n, d.d, md5(CAST(d.d AS VARCHAR) || '|' || c.tok) AS h FROM counts c CROSS JOIN range(4) d(d)), buckets AS (SELECT tok, n, d, CAST(((instr('0123456789abcdef', substr(h,1,1)) - 1) * 268435456 + (instr('0123456789abcdef', substr(h,2,1)) - 1) * 16777216 + (instr('0123456789abcdef', substr(h,3,1)) - 1) * 1048576 + (instr('0123456789abcdef', substr(h,4,1)) - 1) * 65536 + (instr('0123456789abcdef', substr(h,5,1)) - 1) * 4096 + (instr('0123456789abcdef', substr(h,6,1)) - 1) * 256 + (instr('0123456789abcdef', substr(h,7,1)) - 1) * 16 + (instr('0123456789abcdef', substr(h,8,1)) - 1) * 1) % 1024 AS BIGINT) AS bkt FROM hashes), cms AS (SELECT d, bkt, sum(n) AS s FROM buckets GROUP BY d, bkt), est AS (SELECT t.tok, t.n, min(c.s) AS e FROM top20 t JOIN buckets b ON b.tok = t.tok JOIN cms c ON c.d = b.d AND c.bkt = b.bkt GROUP BY t.tok, t.n) SELECT tok AS token, CAST(n AS BIGINT) AS n_exact, CAST(e AS BIGINT) AS n_est FROM est""",
        "lang_stratified_sample": (
            "SELECT doc_id, lang, h, CAST(rk AS BIGINT) AS rank FROM ("
            "SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h, "
            "row_number() OVER (PARTITION BY lang "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk "
            "FROM documents) WHERE rk <= 20"
        ),
        "length_outliers": (
            "SELECT doc_id, n_chars FROM documents WHERE n_chars > "
            "(SELECT quantile_cont(n_chars, 0.95) FROM documents)"
        ),
        "source_cap": (
            "SELECT doc_id, source, CAST(rk AS BIGINT) AS rank FROM ("
            "SELECT doc_id, source, row_number() OVER ("
            "PARTITION BY source ORDER BY doc_id) AS rk "
            "FROM documents) WHERE rk <= 10"
        ),
        "doc_char_stats": (
            "SELECT doc_id, length(text) AS n_chars, "
            "len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha, "
            "len(regexp_extract_all(text, '[0-9]')) AS n_digit, "
            "len(regexp_extract_all(text, ' ')) AS n_space, "
            "len(regexp_extract_all(text, '[A-Z]')) AS n_upper "
            "FROM documents"
        ),
        "doc_lang_id": (
            "SELECT doc_id, CASE "
            "WHEN regexp_matches(text, '[\\x{0600}-\\x{06FF}]') THEN 'ar' "
            "WHEN regexp_matches(text, '[\\x{4E00}-\\x{9FFF}]') THEN 'zh' "
            "WHEN fr_n > en_n AND fr_n > de_n AND fr_n > es_n THEN 'fr' "
            "WHEN es_n > en_n AND es_n > de_n THEN 'es' "
            "WHEN de_n > en_n THEN 'de' ELSE 'en' "
            "END AS lang_pred "
            f"FROM (SELECT doc_id, text, {lang_counts} FROM documents)"
        ),
        # confusion matrix: the SAME prediction CASE grouped against
        # the declared label (coalesced to '' — the engine's
        # null-label key)
        "lang_confusion": (
            "SELECT coalesce(lang, '') AS lang, CASE "
            "WHEN regexp_matches(text, '[\\x{0600}-\\x{06FF}]') THEN 'ar' "
            "WHEN regexp_matches(text, '[\\x{4E00}-\\x{9FFF}]') THEN 'zh' "
            "WHEN fr_n > en_n AND fr_n > de_n AND fr_n > es_n THEN 'fr' "
            "WHEN es_n > en_n AND es_n > de_n THEN 'es' "
            "WHEN de_n > en_n THEN 'de' ELSE 'en' "
            "END AS lang_pred, "
            "CAST(count(*) AS BIGINT) AS n_docs "
            f"FROM (SELECT lang, text, {lang_counts} FROM documents) "
            "GROUP BY 1, 2"
        ),
        "doc_quality": (
            "SELECT doc_id, "
            "CASE WHEN n_tokens > 0 THEN (tok_chars * 100) // n_tokens "
            "ELSE 0 END AS mean_tok_len_x100, "
            f"len(regexp_extract_all(lower(text), '{stop_re('en')}')) "
            "AS n_stopwords, "
            "CASE WHEN length(text) > 0 THEN "
            "(len(regexp_extract_all(text, '[0-9]')) * 1000) // length(text) "
            "ELSE 0 END AS digit_permille, "
            "CASE WHEN length(text) > 0 THEN "
            "(len(regexp_extract_all(text, ' ')) * 1000) // length(text) "
            "ELSE 0 END AS space_permille "
            "FROM (SELECT doc_id, text, "
            "len(regexp_extract_all(text, '[^ \\t\\n\\r\\f\\v]+')) "
            "AS n_tokens, "
            "length(regexp_replace(text, '[ \\t\\n\\r\\f\\v]', "
            "'', 'g')) AS tok_chars "
            "FROM documents)"
        ),
        "doc_fingerprint": (
            # exact Horner fold twin of functions.text.fingerprint
            "SELECT doc_id, CAST(list_reduce("
            "list_prepend(CAST(0 AS HUGEINT), "
            "list_transform(range(1, length(text)+1), "
            "i -> CAST(unicode(substr(text, i, 1)) AS HUGEINT))), "
            "(acc, b) -> (acc * 1000003 + b) % 2305843009213693951"
            ") AS BIGINT) AS fingerprint FROM documents"
        ),
        "dedup_exact": (
            "SELECT min(doc_id) AS doc_id, count(*) AS n_copies "
            "FROM documents GROUP BY text"
        ),
        "curate_corpus_v2": """WITH red AS (SELECT doc_id, source, lang, regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), '[0-9]{7,}', '<DIGITS>', 'g') AS clean FROM documents), sig AS (SELECT *, len(regexp_extract_all(clean, '[^ \t\n\r\f\v]+')) AS ntok FROM red), w AS (SELECT doc_id, regexp_extract_all(lower(clean), '[a-z0-9]+') AS w FROM sig), pr AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS bgm FROM w, UNNEST(generate_series(1, len(w)-1)) t(i) WHERE len(w) >= 2), bgc AS (SELECT doc_id, bgm, count(*) AS c FROM pr GROUP BY doc_id, bgm), bgtop AS (SELECT doc_id, max(c) AS top_c, sum(c) AS total FROM bgc GROUP BY doc_id), gated AS (SELECT s.doc_id, s.source, s.lang, s.clean, s.ntok FROM sig s LEFT JOIN bgtop g USING (doc_id) WHERE s.ntok >= 20 AND coalesce((g.top_c * 1000) // g.total, 0) <= 60), dd AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY clean), surv AS (SELECT g.doc_id, g.source, g.lang, g.ntok FROM gated g JOIN dd USING (doc_id)), capped AS (SELECT doc_id, source, lang, CAST(ntok AS BIGINT) AS n_tokens, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk FROM surv) SELECT doc_id, source, lang, n_tokens, CAST(rk AS BIGINT) AS rank FROM capped WHERE rk <= 10""",
        "semantic_dedup": (
            "WITH allv AS (SELECT vec_id, embedding FROM embeddings "
            "UNION ALL SELECT vec_id + 1000000, embedding "
            "FROM embeddings WHERE vec_id % 50 = 0), "
            "pairs AS (SELECT a.vec_id AS a FROM allv a "
            "JOIN allv b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity("
            "CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.95) "
            "SELECT doc_id, lang, source FROM documents "
            "WHERE doc_id NOT IN (SELECT a FROM pairs)"
        ),
        "embedding_near_dup": (
            # mirrors q_emb_near_dup's planted-copy union (see its
            # docstring): every 50th vector duplicated at id+1e6
            "WITH allv AS (SELECT vec_id, embedding FROM embeddings "
            "UNION ALL SELECT vec_id + 1000000, embedding "
            "FROM embeddings WHERE vec_id % 50 = 0) "
            "SELECT a.vec_id AS a, b.vec_id AS b, "
            "CAST(round(list_cosine_similarity("
            "CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) * 1000) AS BIGINT) AS cos_x1000 "
            "FROM allv a JOIN allv b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
            "CAST(b.embedding AS DOUBLE[])) >= 0.95"
        ),
        # ratio-margin bitext mining: rounded-cosine law shared with
        # the knn family (DOUBLE[] cast + round(,9)); neighborhood
        # means as sum/k (the engine divides the top-k sum), margin
        # re-rounded at 1e-9 so ulp-level summation-order differences
        # can never reorder the argmax; ids only in the output
        "bitext_mine": (
            f"WITH q AS (SELECT vec_id, embedding FROM embeddings"
            f" WHERE vec_id IN ({_knn_ids})),"
            f" t AS (SELECT vec_id, embedding FROM embeddings"
            f" WHERE vec_id NOT IN ({_knn_ids})),"
            f" p AS (SELECT q.vec_id AS sid, t.vec_id AS tid,"
            f" round(list_cosine_similarity("
            f"CAST(q.embedding AS DOUBLE[]),"
            f" CAST(t.embedding AS DOUBLE[])), 9) AS c FROM q, t),"
            f" xk AS (SELECT sid, sum(c)/4 AS xm FROM (SELECT sid, c,"
            f" row_number() OVER (PARTITION BY sid"
            f" ORDER BY c DESC, tid) AS rn FROM p) s"
            f" WHERE rn <= 4 GROUP BY sid),"
            f" yk AS (SELECT tid, sum(c)/4 AS ym FROM (SELECT tid, c,"
            f" row_number() OVER (PARTITION BY tid"
            f" ORDER BY c DESC, sid) AS rn FROM p) s"
            f" WHERE rn <= 4 GROUP BY tid),"
            f" m AS (SELECT p.sid, p.tid,"
            f" round(p.c / ((xk.xm + yk.ym) / 2), 9) AS margin"
            f" FROM p JOIN xk USING (sid) JOIN yk ON yk.tid = p.tid),"
            f" b AS (SELECT sid, tid, row_number() OVER ("
            f"PARTITION BY sid ORDER BY margin DESC, tid) AS rn"
            f" FROM m)"
            f" SELECT sid AS src_id, tid AS dst_id FROM b"
            f" WHERE rn = 1"
        ),
        "knn_cosine": (
            "WITH s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
            "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])), 9) AS sim "
            f"FROM embeddings q, embeddings e "
            f"WHERE q.vec_id < {len(KNN_QUERIES)} AND e.vec_id != q.vec_id), "
            "r AS (SELECT query_id, neighbor_id, CAST(row_number() OVER ("
            "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT)"
            " AS rank FROM s) "
            f"SELECT query_id, neighbor_id, rank FROM r WHERE rank <= {KNN_K}"
        ),
        "knn_ivf": (
            # the fixture table fits the IVF centroid sample, so the
            # adaptive default probes every cell → IVF is EXACT here
            # (partitioned brute force; ann.py docstring) and shares
            # the exact-kNN oracle; at scale nprobe drops to C/2 and
            # quality is gated by the clustered recall ≥ 0.9 pytest
            "WITH s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
            "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])), 9) AS sim "
            f"FROM embeddings q, embeddings e "
            f"WHERE q.vec_id < {len(KNN_QUERIES)} AND e.vec_id != q.vec_id), "
            "r AS (SELECT query_id, neighbor_id, CAST(row_number() OVER ("
            "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT)"
            " AS rank FROM s) "
            f"SELECT query_id, neighbor_id, rank FROM r WHERE rank <= {KNN_K}"
        ),
        "knn_ivf_append": (
            # incremental-maintenance twin: base (even ids) + appended
            # (odd ids) must serve the SAME exact result as one index
            # over the full table — the adaptive probe covers every
            # cell at fixture scale, so any mis-assigned, dropped or
            # double-written appended fragment breaks the hash
            "WITH s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
            "round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), "
            "CAST(e.embedding AS DOUBLE[])), 9) AS sim "
            f"FROM embeddings q, embeddings e "
            f"WHERE q.vec_id < {len(KNN_QUERIES)} AND e.vec_id != q.vec_id), "
            "r AS (SELECT query_id, neighbor_id, CAST(row_number() OVER ("
            "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS BIGINT)"
            " AS rank FROM s) "
            f"SELECT query_id, neighbor_id, rank FROM r WHERE rank <= {KNN_K}"
        ),
        "knn_lsh": (
            # planted-copy top-1 twin: the exact copy (cos 1.0) is the
            # guaranteed nearest neighbor, and identical vectors share
            # every sign bucket, so the LSH path cannot miss it
            "SELECT vec_id AS query_id,"
            " vec_id + 1000000 AS neighbor_id,"
            " CAST(1 AS BIGINT) AS rank,"
            " CAST(1000000000 AS BIGINT) AS cos_x1e9"
            " FROM embeddings"
            " WHERE vec_id IN (0, 50, 100, 150, 200)"
        ),
        "q1_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_price, "
            "round(avg(l_discount), 4) AS avg_disc, "
            "count(*) AS n_rows "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "q14_promo_revenue": (
            # no round(,2) finish on either side: the e4 integer sum is
            # exact and the single /10000 DOUBLE division is the same
            # IEEE op the engine performs (round()'s half-away ties vs
            # pyarrow's half-even would otherwise drift by 0.01)
            "SELECT CAST(sum(CASE WHEN p_type = 'PROMO' "
            "THEN CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT)) "
            "ELSE 0 END) AS DOUBLE) / 10000 AS promo_rev, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000 "
            "AS total_rev FROM lineitem, part "
            "WHERE l_partkey = p_partkey "
            "AND l_shipdate >= TIMESTAMP '1996-09-01' "
            "AND l_shipdate < TIMESTAMP '1996-10-01'"
        ),
        "q5_local_supplier": (
            "SELECT n_name, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000 "
            "AS revenue "
            "FROM customer, orders, lineitem, supplier, nation, region "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "AND s_nationkey = n_nationkey "
            "AND n_regionkey = r_regionkey AND r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY n_name"
        ),
        "q3_shipping": (
            "SELECT l_orderkey, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000 "
            "AS revenue, o_orderdate, o_orderpriority "
            "FROM customer, orders, lineitem "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND o_orderdate < TIMESTAMP '1998-06-01' "
            "AND l_shipdate > TIMESTAMP '1998-06-01' "
            "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
            "ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10"
        ),
        "top_orders": (
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"
        ),
        "segment_order_stats": (
            "SELECT c_mktsegment, count(*) AS n_orders, "
            "round(sum(o_totalprice), 2) AS sum_price "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"
        ),
        "order_customer_join": (
            "SELECT o_orderkey, c_name FROM orders "
            "JOIN customer ON o_custkey = c_custkey"
        ),
        "events_hourly": (
            "SELECT user_id, "
            "CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_id, "
            "count(*) AS n_events, round(sum(value), 2) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "event_type_counts": (
            "SELECT event_type, count(*) AS n FROM events GROUP BY 1"
        ),
        "near_dup_pairs": (
            # Exact replica of the engine's verified output: token
            # trigram shingle sets (distinct), docs with ≥5 distinct
            # shingles (MIN_SHINGLES — shorter docs are excluded from
            # LSH banding by design), integer Jaccard
            # (inter*1000 // union, keep iff inter*1000 ≥ 800*union).
            # LSH recall at J≥0.8 with 16×4 banding is 1-(1-J^4)^16 ≥
            # 0.9998; on this fixture every qualifying pair is found
            # (deterministic seeded hashes, verified).
            r"WITH tk AS ("
            r" SELECT doc_id, regexp_extract_all(lower(text),"
            r" '[^ \t\n\r\f\v]+')"
            r" AS toks FROM documents"
            r"), sh AS ("
            r" SELECT DISTINCT doc_id,"
            r" toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s"
            r" FROM tk, unnest(generate_series(1, len(toks) - 2)) AS u(i)"
            r"), cnt AS ("
            r" SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id"
            r"), inter AS ("
            r" SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i"
            r" FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id"
            r" GROUP BY 1, 2"
            r") SELECT i.a, i.b,"
            r" CAST((i.i * 1000) // (ca.n + cb.n - i.i) AS BIGINT)"
            r" AS jaccard_x1000"
            r" FROM inter i JOIN cnt ca ON ca.doc_id = i.a"
            r" JOIN cnt cb ON cb.doc_id = i.b"
            r" WHERE ca.n >= 5 AND cb.n >= 5"
            r" AND i.i * 1000 >= 800 * (ca.n + cb.n - i.i)"
        ),
        "latest_capture": (
            # recency-dedup twin: the derived archive re-captures
            # idx%4==0 pages one day later, so the expected latest ts
            # is base + 1 day exactly for those urls
            f"SELECT url, CAST(epoch_us(warc_ts) +"
            f" CASE WHEN CAST(right(url, 8) AS BIGINT) % 4 = 0"
            f" THEN 86400000000 ELSE 0 END AS BIGINT) AS warc_ts_us"
            f" FROM read_parquet('{pages}')"
        ),
        "extract_incremental": (
            # golden text of exactly the added (idx%13==5, not
            # removed) ∪ changed (idx%9==0, not removed) pages —
            # byte-identical through diff → semi-join → extraction
            f"SELECT url, text AS extracted_text"
            f" FROM read_parquet('{pages}')"
            f" WHERE CAST(right(url, 8) AS BIGINT) % 17 != 2"
            f" AND (CAST(right(url, 8) AS BIGINT) % 13 = 5"
            f" OR CAST(right(url, 8) AS BIGINT) % 9 = 0)"
        ),
        "snapshot_diff": (
            # the derivation is deterministic, so the expected diff is
            # computable directly: %11==3 missing from old → added,
            # %7==2 missing from new → removed, %5==0 suffixed → changed
            "SELECT doc_id,"
            " CASE WHEN doc_id % 11 = 3 THEN 'added'"
            " WHEN doc_id % 7 = 2 THEN 'removed'"
            " ELSE 'changed' END AS status"
            " FROM documents"
            " WHERE (doc_id % 7 = 2 AND doc_id % 11 != 3)"
            " OR (doc_id % 11 = 3 AND doc_id % 7 != 2)"
            " OR (doc_id % 11 != 3 AND doc_id % 7 != 2"
            " AND doc_id % 5 = 0)"
        ),
        "cross_snapshot_dups": (
            # same trigram-Jaccard contract as near_dup_pairs
            # (MIN_SHINGLES ≥ 5, J ≥ 0.8, integer math) restricted to
            # cross-side pairs: a from the base (even ids), b from the
            # new snapshot (odd ids)
            r"WITH tk AS ("
            r" SELECT doc_id, regexp_extract_all(lower(text),"
            r" '[^ \t\n\r\f\v]+')"
            r" AS toks FROM documents"
            r"), sh AS ("
            r" SELECT DISTINCT doc_id,"
            r" toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s"
            r" FROM tk, unnest(generate_series(1, len(toks) - 2)) AS u(i)"
            r"), cnt AS ("
            r" SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id"
            r"), inter AS ("
            r" SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i"
            r" FROM sh a JOIN sh b ON a.s = b.s"
            r" AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1"
            r" GROUP BY 1, 2"
            r") SELECT i.a, i.b,"
            r" CAST((i.i * 1000) // (ca.n + cb.n - i.i) AS BIGINT)"
            r" AS jaccard_x1000"
            r" FROM inter i JOIN cnt ca ON ca.doc_id = i.a"
            r" JOIN cnt cb ON cb.doc_id = i.b"
            r" WHERE ca.n >= 5 AND cb.n >= 5"
            r" AND i.i * 1000 >= 800 * (ca.n + cb.n - i.i)"
        ),
        "mixture_resample": (
            # integer-exact twin of sampling.mixture_resample:
            # rate_s = min(1000, w_s·T // n_s), keep iff
            # LCG(doc_id) % 1000 < rate_s
            r"WITH w(source, wp) AS ("
            r" VALUES ('src0', 40), ('src1', 25), ('src2', 10)"
            r"), cnt AS ("
            r" SELECT source, count(*) AS n,"
            r" (SELECT count(*) FROM documents) AS t"
            r" FROM documents GROUP BY 1"
            r"), rates AS ("
            r" SELECT c.source,"
            r" least(1000, (w.wp * c.t) // c.n) AS rate"
            r" FROM cnt c JOIN w USING (source)"
            r") SELECT d.doc_id, d.source FROM documents d"
            r" JOIN rates r USING (source)"
            r" WHERE ((d.doc_id * 1103515245 + 12345) % 2147483648)"
            r" % 1000 < r.rate"
        ),
        "doc_paragraph_dedup": (
            # window-function twin of paragraphs.dedup_paragraphs
            # (keep_first): explode on chr(10) with positions, keep a
            # non-empty paragraph iff it is unique or the globally-
            # first (url, pos) occurrence; empty paragraphs always
            # survive; reassemble in position order (docs with zero
            # survivors vanish via GROUP BY)
            f"WITH p AS ("
            f" SELECT url,"
            f" generate_subscripts(string_split(text, chr(10)), 1)"
            f" AS pos,"
            f" unnest(string_split(text, chr(10))) AS para"
            f" FROM read_parquet('{pages}')"
            f"), r AS ("
            f" SELECT url, pos, para,"
            f" count(*) OVER (PARTITION BY para) AS n,"
            f" row_number() OVER (PARTITION BY para"
            f"  ORDER BY url, pos) AS rn"
            f" FROM p WHERE para <> ''"
            f") SELECT url,"
            f" string_agg(para, chr(10) ORDER BY pos) AS text"
            f" FROM ("
            f"  SELECT url, pos, para FROM r WHERE n = 1 OR rn = 1"
            f"  UNION ALL"
            f"  SELECT url, pos, para FROM p WHERE para = ''"
            f" ) GROUP BY url"
        ),
        "para_dedup_incremental": (
            # incremental twin: counts over base ∪ new (the merged
            # counter table), applied to NEW (odd-url-suffix) docs
            # only — drop a non-empty paragraph iff its union-wide
            # count exceeds 1, empties always survive, all-dropped
            # docs vanish via GROUP BY
            f"WITH p AS ("
            f" SELECT url,"
            f" generate_subscripts(string_split(text, chr(10)), 1)"
            f" AS pos,"
            f" unnest(string_split(text, chr(10))) AS para"
            f" FROM read_parquet('{pages}')"
            f"), cnt AS ("
            f" SELECT para, count(*) AS n FROM p"
            f" WHERE para <> '' GROUP BY para"
            f"), kept AS ("
            f" SELECT s.url, s.pos, s.para FROM p s"
            f" JOIN cnt c ON s.para = c.para"
            f" WHERE CAST(right(s.url, 8) AS BIGINT) % 2 = 1"
            f" AND c.n <= 1"
            f" UNION ALL"
            f" SELECT url, pos, para FROM p"
            f" WHERE CAST(right(url, 8) AS BIGINT) % 2 = 1"
            f" AND para = ''"
            f") SELECT url,"
            f" string_agg(para, chr(10) ORDER BY pos) AS text"
            f" FROM kept GROUP BY url"
        ),
        "url_canonical_dedup": (
            # the derived messy spellings (utm idx%3, fragment idx%5,
            # uppercase-host idx%7) all canonicalize back to the clean
            # fixture url, so the expected groups are computable
            # directly: canon = base, n_variants = 1 + planted count,
            # min spelling = the uppercase one when present ('H' < 'h'
            # in binary collation, and base is a prefix of the utm /
            # fragment variants)
            f"SELECT url AS canon_url,"
            f" CASE WHEN CAST(right(url, 8) AS BIGINT) % 7 = 0"
            f" THEN 'HTTPS://FIXTURE.TEST' || substr(url, 21)"
            f" ELSE url END AS url,"
            f" CAST(1"
            f" + CASE WHEN CAST(right(url, 8) AS BIGINT) % 3 = 0"
            f"   THEN 1 ELSE 0 END"
            f" + CASE WHEN CAST(right(url, 8) AS BIGINT) % 5 = 0"
            f"   THEN 1 ELSE 0 END"
            f" + CASE WHEN CAST(right(url, 8) AS BIGINT) % 7 = 0"
            f"   THEN 1 ELSE 0 END AS BIGINT) AS n_variants"
            f" FROM read_parquet('{pages}')"
        ),
        "common_paragraphs": (
            # boilerplate inventory twin: explode on chr(10), count
            # occurrences and distinct docs per non-empty paragraph
            f"SELECT para,"
            f" CAST(count(*) AS BIGINT) AS n_occurrences,"
            f" CAST(count(DISTINCT url) AS BIGINT) AS n_docs"
            f" FROM (SELECT url,"
            f" unnest(string_split(text, chr(10))) AS para"
            f" FROM read_parquet('{pages}'))"
            f" WHERE para <> '' GROUP BY para"
            f" HAVING count(DISTINCT url) >= 2"
        ),
        "corpus_split": (
            # independent-LCG split-law twin: 980/10/10 permille
            # cumulative ranges over ((id*69069 + 1) % 2^31) % 1000
            "WITH s AS (SELECT n_chars,"
            " CASE WHEN ((doc_id * 69069 + 1) % 2147483648) % 1000"
            " < 980 THEN 'train'"
            " WHEN ((doc_id * 69069 + 1) % 2147483648) % 1000 < 990"
            " THEN 'val' ELSE 'test' END AS split FROM documents)"
            " SELECT split, CAST(count(*) AS BIGINT) AS n_docs,"
            " CAST(sum(n_chars) AS BIGINT) AS sum_n_chars"
            " FROM s GROUP BY 1"
        ),
        "export_shards": (
            # integer shard law twin: shard = ((id*22695477 + 1)
            # % 2^31) % 8 — exact int64 math on both engines
            "SELECT ((doc_id * 22695477 + 1) % 2147483648) % 8"
            " AS shard, CAST(count(*) AS BIGINT) AS n_docs,"
            " CAST(sum(n_chars) AS BIGINT) AS sum_n_chars"
            " FROM documents GROUP BY 1"
        ),
        "curate_corpus_v3": (
            # composed twin: decontamination gram-join on the RAW
            # corpus (bench = idx%13==0), then the paragraph-dedup
            # window twin over survivors, then the token gate
            f"WITH tk AS ("
            f" SELECT url, text, regexp_extract_all(lower(text),"
            f" '[^ \\t\\n\\r\\f\\v]+') AS toks,"
            f" CAST(right(url, 8) AS BIGINT) AS idx"
            f" FROM read_parquet('{pages}')"
            f"), bg AS ("
            f" SELECT DISTINCT "
            + " || ' ' || ".join(f"toks[i+{j}]" for j in range(8)) +
            f" AS g FROM tk,"
            f" unnest(generate_series(1, len(toks) - 7)) AS u(i)"
            f" WHERE idx % 13 = 0"
            f"), dg AS ("
            f" SELECT DISTINCT url, "
            + " || ' ' || ".join(f"toks[i+{j}]" for j in range(8)) +
            f" AS g FROM tk,"
            f" unnest(generate_series(1, len(toks) - 7)) AS u(i)"
            f" WHERE idx % 13 <> 0"
            f"), contaminated AS ("
            f" SELECT DISTINCT url FROM dg JOIN bg USING (g)"
            f"), corp AS ("
            f" SELECT url, text FROM tk WHERE idx % 13 <> 0"
            f" AND url NOT IN (SELECT url FROM contaminated)"
            f"), p AS ("
            f" SELECT url,"
            f" generate_subscripts(string_split(text, chr(10)), 1)"
            f" AS pos,"
            f" unnest(string_split(text, chr(10))) AS para FROM corp"
            f"), r AS ("
            f" SELECT url, pos, para,"
            f" count(*) OVER (PARTITION BY para) AS n,"
            f" row_number() OVER (PARTITION BY para"
            f"  ORDER BY url, pos) AS rn"
            f" FROM p WHERE para <> ''"
            f"), clean AS ("
            f" SELECT url,"
            f" string_agg(para, chr(10) ORDER BY pos) AS text"
            f" FROM ("
            f"  SELECT url, pos, para FROM r WHERE n = 1 OR rn = 1"
            f"  UNION ALL"
            f"  SELECT url, pos, para FROM p WHERE para = ''"
            f" ) GROUP BY url"
            f") SELECT url, text,"
            f" CAST(len(regexp_extract_all(text,"
            f" '[^ \\t\\n\\r\\f\\v]+')) AS BIGINT) AS n_tokens"
            f" FROM clean WHERE len(regexp_extract_all(text,"
            f" '[^ \\t\\n\\r\\f\\v]+')) >= 5"
        ),
        "doc_decontaminate": (
            # distinct 8-gram join between the benchmark suite
            # (doc_id % 10 == 0) and the rest of the corpus; n_hits =
            # distinct contaminated grams per doc
            r"WITH tk AS ("
            r" SELECT doc_id, regexp_extract_all(lower(text),"
            r" '[^ \t\n\r\f\v]+') AS toks FROM documents"
            r"), bg AS ("
            r" SELECT DISTINCT "
            + " || ' ' || ".join(f"toks[i+{j}]" for j in range(8)) +
            r" AS g FROM tk,"
            r" unnest(generate_series(1, len(toks) - 7)) AS u(i)"
            r" WHERE doc_id % 10 = 0"
            r"), dg AS ("
            r" SELECT DISTINCT doc_id, "
            + " || ' ' || ".join(f"toks[i+{j}]" for j in range(8)) +
            r" AS g FROM tk,"
            r" unnest(generate_series(1, len(toks) - 7)) AS u(i)"
            r" WHERE doc_id % 10 <> 0"
            r") SELECT dg.doc_id, CAST(count(*) AS BIGINT) AS n_hits"
            r" FROM dg JOIN bg USING (g) GROUP BY 1"
        ),
        "exact_substring_spans": (
            # every 8-token gram START position whose gram string
            # appears in >= 2 distinct docs; coverage = distinct token
            # indices under the union of those 8-wide windows (the
            # engine's sorted-diff interval union, expressed as a
            # DISTINCT expansion)
            r"WITH tk AS ("
            r" SELECT doc_id, regexp_extract_all(lower(text),"
            r" '[^ \t\n\r\f\v]+') AS toks FROM documents"
            r"), g AS ("
            r" SELECT doc_id, i AS pos, "
            + " || ' ' || ".join(f"toks[i+{j}]" for j in range(8)) +
            r" AS g FROM tk,"
            r" unnest(generate_series(1, len(toks) - 7)) AS u(i)"
            r"), dup AS ("
            r" SELECT g FROM g GROUP BY g"
            r" HAVING count(DISTINCT doc_id) >= 2"
            r"), hit AS ("
            r" SELECT doc_id, pos FROM g JOIN dup USING (g)"
            r"), cov AS ("
            r" SELECT doc_id, count(*) AS n_cov FROM ("
            r"  SELECT DISTINCT doc_id, pos + j AS t FROM hit,"
            r"  unnest(generate_series(0, 7)) AS v(j)"
            r" ) GROUP BY doc_id"
            r") SELECT h.doc_id,"
            r" CAST(count(*) AS BIGINT) AS n_dup_positions,"
            r" CAST(min(c.n_cov) AS BIGINT) AS n_covered_tokens"
            r" FROM hit h JOIN cov c USING (doc_id) GROUP BY h.doc_id"
        ),
        "exact_substring_dedup": (
            # keep-first rewrite: position p of doc d is dropped iff
            # some 8-gram window covering p also appears in a doc with
            # a smaller id; changed docs only; a totally-covered doc
            # has no kept rows and vanishes.  CASE-SENSITIVE (no
            # lower()) — the action dedups raw tokens
            r"WITH tk AS ("
            r" SELECT doc_id, regexp_extract_all(text,"
            r" '[^ \t\n\r\f\v]+') AS toks FROM documents"
            r"), tok AS ("
            r" SELECT doc_id, i AS pos, toks[i] AS tok FROM tk,"
            r" unnest(generate_series(1, len(toks))) AS u(i)"
            r"), g AS ("
            r" SELECT doc_id, i AS pos, "
            + " || ' ' || ".join(f"toks[i+{j}]" for j in range(8)) +
            r" AS g FROM tk,"
            r" unnest(generate_series(1, len(toks) - 7)) AS u(i)"
            r"), mn AS ("
            r" SELECT g, min(doc_id) AS m FROM g GROUP BY g"
            r"), hit AS ("
            r" SELECT g.doc_id, g.pos FROM g JOIN mn USING (g)"
            r" WHERE g.doc_id > mn.m"
            r"), cov AS ("
            r" SELECT DISTINCT doc_id, pos + j AS p FROM hit,"
            r" unnest(generate_series(0, 7)) AS v(j)"
            r"), changed AS (SELECT DISTINCT doc_id FROM cov)"
            r" SELECT t.doc_id,"
            r" string_agg(t.tok, ' ' ORDER BY t.pos) AS text"
            r" FROM tok t JOIN changed c USING (doc_id)"
            r" LEFT JOIN cov ON cov.doc_id = t.doc_id"
            r" AND cov.p = t.pos"
            r" WHERE cov.p IS NULL GROUP BY t.doc_id"
        ),
        "doc_rare_tokens": (
            # corpus token frequencies -> occurrences of sub-min_count
            # (hapax, min_count=2) tokens per doc; every doc appears
            r"WITH tk AS ("
            r" SELECT doc_id, regexp_extract_all(lower(text),"
            r" '[^ \t\n\r\f\v]+') AS toks FROM documents"
            r"), t AS ("
            r" SELECT doc_id, unnest(toks) AS token FROM tk"
            r"), cnt AS ("
            r" SELECT token, count(*) AS n FROM t GROUP BY 1"
            r"), r AS ("
            r" SELECT t.doc_id, count(*) AS n_rare FROM t"
            r" JOIN cnt USING (token) WHERE cnt.n < 2 GROUP BY 1"
            r") SELECT tk.doc_id,"
            r" CAST(len(tk.toks) AS BIGINT) AS n_tokens,"
            r" CAST(coalesce(r.n_rare, 0) AS BIGINT) AS n_rare"
            r" FROM tk LEFT JOIN r USING (doc_id)"
        ),
        "doc_lm_surprise": (
            # add-one bigram LM over the doc_id%10==0 reference slice;
            # per-pair surprise in WHOLE BITS: bitlen(c1+V)-bitlen(c2+1)
            # with bitlen(x) = length(printf('%b', x)) — integer-exact,
            # no float log; every doc appears (zeros when < 2 tokens)
            r"WITH tk AS ("
            r" SELECT doc_id, regexp_extract_all(lower(text),"
            r" '[^ \t\n\r\f\v]+') AS t FROM documents"
            r"), u AS ("
            r" SELECT doc_id, unnest(t) AS w,"
            r" generate_subscripts(t, 1) AS i FROM tk"
            r"), pairs AS ("
            r" SELECT a.doc_id, a.w AS w1, b.w AS w2 FROM u a"
            r" JOIN u b ON a.doc_id = b.doc_id AND b.i = a.i + 1"
            r"), ref_u AS ("
            r" SELECT w, count(*) AS c1 FROM u"
            r" WHERE doc_id % 10 = 0 GROUP BY w"
            r"), ref_b AS ("
            r" SELECT w1, w2, count(*) AS c2 FROM pairs"
            r" WHERE doc_id % 10 = 0 GROUP BY w1, w2"
            r"), v AS (SELECT count(*) AS vocab FROM ref_u"
            r"), scored AS ("
            r" SELECT p.doc_id,"
            r" length(printf('%b', coalesce(ru.c1, 0) + v.vocab))"
            r" - length(printf('%b', coalesce(rb.c2, 0) + 1)) AS bits,"
            r" CASE WHEN rb.c2 IS NULL THEN 1 ELSE 0 END AS oov"
            r" FROM pairs p CROSS JOIN v"
            r" LEFT JOIN ref_u ru ON p.w1 = ru.w"
            r" LEFT JOIN ref_b rb ON p.w1 = rb.w1 AND p.w2 = rb.w2"
            r"), agg AS ("
            r" SELECT doc_id, count(*) AS n_pairs,"
            r" CAST(sum(bits) AS BIGINT) AS surprise_bits,"
            r" CAST(sum(oov) AS BIGINT) AS oov_pairs"
            r" FROM scored GROUP BY doc_id"
            r") SELECT d.doc_id,"
            r" CAST(coalesce(agg.n_pairs, 0) AS BIGINT) AS n_pairs,"
            r" coalesce(agg.surprise_bits, 0) AS surprise_bits,"
            r" coalesce(agg.oov_pairs, 0) AS oov_pairs"
            r" FROM documents d LEFT JOIN agg USING (doc_id)"
        ),
        "ccnet_buckets": (
            # doc_lm_surprise's LM + per-doc aggregate, then the CCNet
            # thirds split by VALUE cutoffs over the mean-millibits
            # histogram (ties at a boundary -> lower bucket); docs
            # with no bigram pair are unscoreable and excluded
            r"WITH tk AS ("
            r" SELECT doc_id, regexp_extract_all(lower(text),"
            r" '[^ \t\n\r\f\v]+') AS t FROM documents"
            r"), u AS ("
            r" SELECT doc_id, unnest(t) AS w,"
            r" generate_subscripts(t, 1) AS i FROM tk"
            r"), pairs AS ("
            r" SELECT a.doc_id, a.w AS w1, b.w AS w2 FROM u a"
            r" JOIN u b ON a.doc_id = b.doc_id AND b.i = a.i + 1"
            r"), ref_u AS ("
            r" SELECT w, count(*) AS c1 FROM u"
            r" WHERE doc_id % 10 = 0 GROUP BY w"
            r"), ref_b AS ("
            r" SELECT w1, w2, count(*) AS c2 FROM pairs"
            r" WHERE doc_id % 10 = 0 GROUP BY w1, w2"
            r"), v AS (SELECT count(*) AS vocab FROM ref_u"
            r"), sc AS ("
            r" SELECT p.doc_id,"
            r" length(printf('%b', coalesce(ru.c1, 0) + v.vocab))"
            r" - length(printf('%b', coalesce(rb.c2, 0) + 1)) AS bits"
            r" FROM pairs p CROSS JOIN v"
            r" LEFT JOIN ref_u ru ON p.w1 = ru.w"
            r" LEFT JOIN ref_b rb ON p.w1 = rb.w1 AND p.w2 = rb.w2"
            r"), s AS ("
            r" SELECT doc_id, CAST(sum(bits) AS BIGINT) * 1000"
            r" // count(*) AS mean_millibits FROM sc GROUP BY doc_id"
            r"), h AS ("
            r" SELECT mean_millibits AS mb, count(*) AS c FROM s"
            r" GROUP BY mb"
            r"), cum AS ("
            r" SELECT mb, sum(c) OVER (ORDER BY mb) AS cm FROM h"
            r"), n AS (SELECT count(*) AS nn FROM s"
            r"), t AS (SELECT"
            r" (SELECT min(mb) FROM cum WHERE 3*cm >="
            r"   (SELECT nn FROM n)) AS t1,"
            r" (SELECT min(mb) FROM cum WHERE 3*cm >="
            r"   2*(SELECT nn FROM n)) AS t2"
            r") SELECT s.doc_id,"
            r" CAST(s.mean_millibits AS BIGINT) AS mean_millibits,"
            r" CASE WHEN s.mean_millibits <= t.t1 THEN 'head'"
            r" WHEN s.mean_millibits <= t.t2 THEN 'middle'"
            r" ELSE 'tail' END AS bucket"
            r" FROM s CROSS JOIN t"
        ),
        "pack_plan": (
            # concat-and-chunk packing law: LCG pseudo-shuffle order
            # key (mod-2^31 pre-reduction keeps every product < 2^61,
            # overflow-free on both engines), exclusive running token
            # sum in (h, doc_id) order, integer chunk spans; a
            # zero-token doc occupies no chunk (-1/-1)
            r"WITH t AS (SELECT doc_id,"
            r" len(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS n,"
            r" ((doc_id % 2147483648) * 1103515245 + 12345)"
            r" % 2147483648 AS h FROM documents"
            r"), o AS ("
            r" SELECT doc_id, n, coalesce(SUM(n) OVER ("
            r" ORDER BY h, doc_id"
            r" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
            r" AS off FROM t"
            r") SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,"
            r" CAST(off AS BIGINT) AS tok_offset,"
            r" CAST(CASE WHEN n > 0 THEN off // 2048 ELSE -1 END"
            r" AS BIGINT) AS chunk_first,"
            r" CAST(CASE WHEN n > 0 THEN (off + n - 1) // 2048"
            r" ELSE -1 END AS BIGINT) AS chunk_last FROM o"
        ),
        "pack_chunk_stats": (
            # pack_plan's law, then per-chunk occupancy via a chunk
            # range unnest (generate_series is BIGINT-only — the
            # explicit casts keep DuckDB's // out of HUGEINT)
            r"WITH t AS (SELECT doc_id,"
            r" len(regexp_extract_all(text, '[^ \t\n\r\f\v]+')) AS n,"
            r" ((doc_id % 2147483648) * 1103515245 + 12345)"
            r" % 2147483648 AS h FROM documents"
            r"), o AS ("
            r" SELECT doc_id, n, coalesce(SUM(n) OVER ("
            r" ORDER BY h, doc_id"
            r" ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
            r" AS off FROM t"
            r"), spans AS ("
            r" SELECT CAST(n AS BIGINT) AS n, CAST(off AS BIGINT)"
            r" AS off FROM o WHERE n > 0"
            r"), ch AS ("
            r" SELECT off, n, unnest(generate_series(off // 2048,"
            r" (off + n - 1) // 2048)) AS chunk_id FROM spans"
            r") SELECT chunk_id, CAST(count(*) AS BIGINT) AS n_docs,"
            r" CAST(sum(least(off + n, (chunk_id + 1) * 2048)"
            r" - greatest(off, chunk_id * 2048)) AS BIGINT)"
            r" AS n_tokens FROM ch GROUP BY chunk_id"
        ),
        "dsir_weights": (
            # DSIR hashed-gram importance weights: unigrams + bigrams
            # md5-folded into 4096 buckets (the CMS twin's hex fold),
            # target = doc_id%10==0 slice, weight in WHOLE BITS via
            # printf('%b') bit-length — integer-exact, no float log;
            # the raw-side join always hits (own grams counted)
            r"WITH tk AS (SELECT doc_id, regexp_extract_all("
            r"lower(text), '[^ \t\n\r\f\v]+') AS t FROM documents"
            r"), u AS ("
            r" SELECT doc_id, unnest(t) AS w,"
            r" generate_subscripts(t, 1) AS i FROM tk"
            r"), pairs AS ("
            r" SELECT a.doc_id, a.w || ' ' || b.w AS g FROM u a"
            r" JOIN u b ON a.doc_id = b.doc_id AND b.i = a.i + 1"
            r"), grams AS ("
            r" SELECT doc_id, w AS g FROM u"
            r" UNION ALL SELECT doc_id, g FROM pairs"
            r"), hb AS ("
            r" SELECT doc_id,"
            r" ((instr('0123456789abcdef', substr(hx,1,1)) - 1) * 268435456"
            r" + (instr('0123456789abcdef', substr(hx,2,1)) - 1) * 16777216"
            r" + (instr('0123456789abcdef', substr(hx,3,1)) - 1) * 1048576"
            r" + (instr('0123456789abcdef', substr(hx,4,1)) - 1) * 65536"
            r" + (instr('0123456789abcdef', substr(hx,5,1)) - 1) * 4096"
            r" + (instr('0123456789abcdef', substr(hx,6,1)) - 1) * 256"
            r" + (instr('0123456789abcdef', substr(hx,7,1)) - 1) * 16"
            r" + (instr('0123456789abcdef', substr(hx,8,1)) - 1)) % 4096"
            r" AS b FROM (SELECT doc_id, md5(g) AS hx FROM grams)"
            r"), tgt AS ("
            r" SELECT b, count(*) AS ct FROM hb"
            r" WHERE doc_id % 10 = 0 GROUP BY b"
            r"), raw AS (SELECT b, count(*) AS cr FROM hb GROUP BY b"
            r"), sc AS ("
            r" SELECT h.doc_id,"
            r" length(printf('%b', coalesce(t.ct, 0) + 1))"
            r" - length(printf('%b', r.cr + 1)) AS bits"
            r" FROM hb h LEFT JOIN tgt t USING (b)"
            r" JOIN raw r USING (b)"
            r"), agg AS ("
            r" SELECT doc_id, count(*) AS n_grams,"
            r" CAST(sum(bits) AS BIGINT) AS weight_bits"
            r" FROM sc GROUP BY doc_id"
            r") SELECT d.doc_id,"
            r" CAST(coalesce(agg.n_grams, 0) AS BIGINT) AS n_grams,"
            r" coalesce(agg.weight_bits, 0) AS weight_bits"
            r" FROM documents d LEFT JOIN agg USING (doc_id)"
        ),
        # bpe_vocab / bpe_encode_stats: NO SQL twin by design — BPE
        # merge learning is iterative-global (each merge rewrites the
        # pair statistics the next argmax reads), the documented
        # rows-only case; exactness is pinned by the brute-force
        # recount oracle in tests/test_bpe.py.
        "kmeans_clusters": (
            # Lloyd's k-means unrolled to exactly the engine's 2
            # iterations, every step integer: quantize floor(x*1e6 +
            # 0.5) on DOUBLE (FLOAT*INT stays single precision —
            # cast first), truncated-division centroid means (// is
            # trunc in DuckDB; the engine mirrors trunc explicitly),
            # ties -> lowest cluster id, empty cluster keeps its
            # previous centroid via COALESCE over the LEFT JOIN
            """
            WITH v AS (
              SELECT vec_id, list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5)
                               AS BIGINT)) AS e
              FROM embeddings
            ),
            dims AS (SELECT unnest(range(1, 65)) AS i),
            ve AS (SELECT vec_id, i, e[i] AS x FROM v, dims),
            seed AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, e
              FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 8)
            ),
            c0 AS (SELECT cl, i, e[i] AS cx FROM seed, dims),
            d1 AS (
              SELECT ve.vec_id, c0.cl,
                     SUM((ve.x - c0.cx)*(ve.x - c0.cx)) AS d2
              FROM ve JOIN c0 USING (i) GROUP BY 1, 2
            ),
            a1 AS (
              SELECT vec_id, cl FROM (
                SELECT vec_id, cl,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cl) AS rn
                FROM d1) WHERE rn = 1
            ),
            m1 AS (
              SELECT a1.cl, ve.i, CAST(SUM(ve.x) AS BIGINT) AS s,
                     COUNT(*) AS n
              FROM a1 JOIN ve USING (vec_id) GROUP BY 1, 2
            ),
            c1 AS (
              SELECT c0.cl, c0.i,
                     COALESCE(m1.s // CAST(m1.n AS BIGINT), c0.cx)
                       AS cx
              FROM c0 LEFT JOIN m1
                ON c0.cl = m1.cl AND c0.i = m1.i
            ),
            d2t AS (
              SELECT ve.vec_id, c1.cl,
                     SUM((ve.x - c1.cx)*(ve.x - c1.cx)) AS d2
              FROM ve JOIN c1 USING (i) GROUP BY 1, 2
            ),
            a2 AS (
              SELECT vec_id, cl FROM (
                SELECT vec_id, cl,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cl) AS rn
                FROM d2t) WHERE rn = 1
            ),
            m2 AS (
              SELECT a2.cl, ve.i, CAST(SUM(ve.x) AS BIGINT) AS s,
                     COUNT(*) AS n
              FROM a2 JOIN ve USING (vec_id) GROUP BY 1, 2
            ),
            c2 AS (
              SELECT c1.cl, c1.i,
                     COALESCE(m2.s // CAST(m2.n AS BIGINT), c1.cx)
                       AS cx
              FROM c1 LEFT JOIN m2
                ON c1.cl = m2.cl AND c1.i = m2.i
            ),
            df AS (
              SELECT ve.vec_id, c2.cl,
                     CAST(SUM((ve.x - c2.cx)*(ve.x - c2.cx))
                          AS BIGINT) AS d2
              FROM ve JOIN c2 USING (i) GROUP BY 1, 2
            )
            SELECT vec_id, cl AS cluster_id, d2 FROM (
              SELECT vec_id, cl, d2,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY d2, cl) AS rn
              FROM df) WHERE rn = 1
            """),
        "semdedup": (
            # the kmeans twin's 2-iteration unrolling (see
            # kmeans_clusters above), extended with the SemDeDup
            # pairwise test: rank within cluster by (d2 DESC, id),
            # drop iff ANY earlier point has cosine ≥ 19/20 over
            # SIM_QUANT(=1000)-quantized coordinates — dot > 0 AND
            # dot²·20² ≥ 19²·|a|²·|b|², exact in DuckDB's HUGEINT
            """
            WITH v AS (
              SELECT vec_id, list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE)*1000000 + 0.5)
                               AS BIGINT)) AS e
              FROM embeddings
            ),
            dims AS (SELECT unnest(range(1, 65)) AS i),
            ve AS (SELECT vec_id, i, e[i] AS x FROM v, dims),
            seed AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, e
              FROM (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 8)
            ),
            c0 AS (SELECT cl, i, e[i] AS cx FROM seed, dims),
            d1 AS (
              SELECT ve.vec_id, c0.cl,
                     SUM((ve.x - c0.cx)*(ve.x - c0.cx)) AS d2
              FROM ve JOIN c0 USING (i) GROUP BY 1, 2
            ),
            a1 AS (
              SELECT vec_id, cl FROM (
                SELECT vec_id, cl,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cl) AS rn
                FROM d1) WHERE rn = 1
            ),
            m1 AS (
              SELECT a1.cl, ve.i, CAST(SUM(ve.x) AS BIGINT) AS s,
                     COUNT(*) AS n
              FROM a1 JOIN ve USING (vec_id) GROUP BY 1, 2
            ),
            c1 AS (
              SELECT c0.cl, c0.i,
                     COALESCE(m1.s // CAST(m1.n AS BIGINT), c0.cx)
                       AS cx
              FROM c0 LEFT JOIN m1
                ON c0.cl = m1.cl AND c0.i = m1.i
            ),
            d2t AS (
              SELECT ve.vec_id, c1.cl,
                     SUM((ve.x - c1.cx)*(ve.x - c1.cx)) AS d2
              FROM ve JOIN c1 USING (i) GROUP BY 1, 2
            ),
            a2 AS (
              SELECT vec_id, cl FROM (
                SELECT vec_id, cl,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cl) AS rn
                FROM d2t) WHERE rn = 1
            ),
            m2 AS (
              SELECT a2.cl, ve.i, CAST(SUM(ve.x) AS BIGINT) AS s,
                     COUNT(*) AS n
              FROM a2 JOIN ve USING (vec_id) GROUP BY 1, 2
            ),
            c2 AS (
              SELECT c1.cl, c1.i,
                     COALESCE(m2.s // CAST(m2.n AS BIGINT), c1.cx)
                       AS cx
              FROM c1 LEFT JOIN m2
                ON c1.cl = m2.cl AND c1.i = m2.i
            ),
            df AS (
              SELECT ve.vec_id, c2.cl,
                     CAST(SUM((ve.x - c2.cx)*(ve.x - c2.cx))
                          AS BIGINT) AS d2
              FROM ve JOIN c2 USING (i) GROUP BY 1, 2
            ),
            lab AS (
              SELECT vec_id, cl, d2 FROM (
                SELECT vec_id, cl, d2,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY d2, cl) AS rn
                FROM df) WHERE rn = 1
            ),
            vs AS (
              SELECT vec_id, list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE)*1000 + 0.5)
                               AS BIGINT)) AS es
              FROM embeddings
            ),
            vse AS (SELECT vec_id, i, es[i] AS x FROM vs, dims),
            nrm AS (SELECT vec_id, SUM(x*x) AS n2 FROM vse
                    GROUP BY vec_id),
            ord AS (
              SELECT vec_id, cl,
                     row_number() OVER (PARTITION BY cl
                                        ORDER BY d2 DESC, vec_id)
                       AS rk
              FROM lab
            ),
            dots AS (
              SELECT a.vec_id AS pa, b.vec_id AS pb,
                     SUM(va.x * vb.x) AS dot
              FROM ord a JOIN ord b
                ON a.cl = b.cl AND b.rk < a.rk
              JOIN vse va ON va.vec_id = a.vec_id
              JOIN vse vb ON vb.vec_id = b.vec_id AND vb.i = va.i
              GROUP BY 1, 2
            ),
            dropped AS (
              SELECT DISTINCT d.pa AS vec_id
              FROM dots d
              JOIN nrm x ON x.vec_id = d.pa
              JOIN nrm y ON y.vec_id = d.pb
              WHERE d.dot > 0
                AND d.dot*d.dot*400 >= 361*x.n2*y.n2
            )
            SELECT l.vec_id, l.cl AS cluster_id,
                   CAST(CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END
                        AS BIGINT) AS kept
            FROM lab l LEFT JOIN dropped dr USING (vec_id)
            """),
        "c4_filter": (
            # the C4 line law (trim [ \t\r]; non-empty; terminal
            # [.!?"]; ≥5 whitespace tokens; no 'javascript') then the
            # page rules as a bitmask — ASCII-explicit patterns so
            # RE2 counts exactly as Python re
            r"WITH p AS (SELECT doc_id, coalesce(text, '') AS text"
            r" FROM documents"
            r"), ln AS (SELECT doc_id, text,"
            r" list_filter(list_transform(string_split(text, chr(10)),"
            r" x -> trim(x, ' ' || chr(9) || chr(13))),"
            r" x -> x <> '') AS lines FROM p"
            r"), k AS (SELECT doc_id, text, len(lines) AS n_lines,"
            r" list_filter(lines, x -> regexp_matches(x, '[.!?\"]$')"
            r" AND len(regexp_extract_all(x, '[^ \t\n\r\f\v]+')) >= 5"
            r" AND NOT contains(lower(x), 'javascript')) AS kept"
            r" FROM ln"
            r"), s AS (SELECT doc_id, text, n_lines, len(kept) AS n_kept,"
            # array_to_string on an EMPTY list is NULL in DuckDB —
            # coalesce so zero-kept docs count 0 sentences, not NULL
            r" coalesce(array_to_string(kept, chr(10)), '') AS kt"
            r" FROM k"
            r"), f AS (SELECT doc_id, n_lines, n_kept,"
            r" len(regexp_extract_all(kt, '[.!?]')) AS n_sentences,"
            r" length(kt) AS kept_chars,"
            r" (CASE WHEN len(regexp_extract_all(kt, '[.!?]')) < 3"
            r" THEN 1 ELSE 0 END)"
            r" + (CASE WHEN contains(lower(text), 'lorem ipsum')"
            r" THEN 2 ELSE 0 END)"
            r" + (CASE WHEN contains(text, '{') THEN 4 ELSE 0 END)"
            r" + (CASE WHEN regexp_matches(lower(text),"
            r" '\b(?:viagra|casino|xxx|porn)\b') THEN 8 ELSE 0 END)"
            r" AS fail_flags FROM s"
            r") SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,"
            r" CAST(n_kept AS BIGINT) AS n_kept,"
            r" CAST(n_sentences AS BIGINT) AS n_sentences,"
            r" CAST(kept_chars AS BIGINT) AS kept_chars,"
            r" CAST(fail_flags AS BIGINT) AS fail_flags,"
            r" CAST(CASE WHEN fail_flags = 0 THEN 1 ELSE 0 END"
            r" AS BIGINT) AS keep FROM f"
        ),
        "gopher_repetition": (
            # the 13 Gopher A1.2 repetition rules; dup chars via
            # all-chars minus distinct-chars (array_to_string of an
            # empty list is NULL — coalesced), n-grams via list
            # slicing over the ASCII-word split, fractions as
            # cross-multiplied integers (text.py documents the two
            # pinned deviations: overlap-naive dup-gram chars,
            # ≥2-count top grams)
            r"WITH p AS (SELECT doc_id, coalesce(text, '') AS text"
            r" FROM documents"
            r"), base AS (SELECT doc_id, length(text) AS total,"
            r" list_filter(string_split(text, chr(10)),"
            r" x -> x <> '') AS lines,"
            r" list_filter(string_split_regex(text, '\n{2,}'),"
            r" x -> x <> '') AS paras,"
            r" regexp_extract_all(text, '[^ \t\n\r\f\v]+') AS ws"
            r" FROM p"
            r"), d AS (SELECT doc_id, total, ws,"
            r" len(lines) AS n_lines, len(paras) AS n_paras,"
            r" len(lines) - len(list_distinct(lines)) AS dup_lines,"
            r" len(paras) - len(list_distinct(paras)) AS dup_paras,"
            r" coalesce(length(array_to_string(lines, '')), 0)"
            r" - coalesce(length(array_to_string(list_distinct(lines),"
            r" '')), 0) AS dup_line_chars,"
            r" coalesce(length(array_to_string(paras, '')), 0)"
            r" - coalesce(length(array_to_string(list_distinct(paras),"
            r" '')), 0) AS dup_para_chars FROM base"
            r"), gl AS (SELECT doc_id, n,"
            r" list_transform(range(1, len(ws) - n + 2),"
            r" i -> array_to_string(ws[i:i+n-1], ' ')) AS grams"
            r" FROM d CROSS JOIN (SELECT"
            r" unnest([2,3,4,5,6,7,8,9,10]) AS n) ns"
            r"), ge AS (SELECT doc_id, n, unnest(grams) AS gram"
            r" FROM gl"
            r"), gc AS (SELECT doc_id, n, gram, count(*) AS c"
            r" FROM ge GROUP BY 1, 2, 3"
            r"), ga AS (SELECT doc_id, n,"
            r" coalesce(max(CASE WHEN c >= 2 THEN c * length(gram)"
            r" END), 0) AS topchars,"
            r" coalesce(sum(CASE WHEN c >= 2 THEN c * length(gram)"
            r" END), 0) AS dupchars FROM gc GROUP BY 1, 2"
            r"), gp AS (SELECT doc_id,"
            r" max(CASE WHEN n=2 THEN topchars END) AS t2,"
            r" max(CASE WHEN n=3 THEN topchars END) AS t3,"
            r" max(CASE WHEN n=4 THEN topchars END) AS t4,"
            r" max(CASE WHEN n=5 THEN dupchars END) AS d5,"
            r" max(CASE WHEN n=6 THEN dupchars END) AS d6,"
            r" max(CASE WHEN n=7 THEN dupchars END) AS d7,"
            r" max(CASE WHEN n=8 THEN dupchars END) AS d8,"
            r" max(CASE WHEN n=9 THEN dupchars END) AS d9,"
            r" max(CASE WHEN n=10 THEN dupchars END) AS d10"
            r" FROM ga GROUP BY 1"
            r"), f AS (SELECT d.doc_id, n_lines, n_paras, dup_lines,"
            r" dup_paras, dup_line_chars, dup_para_chars,"
            r" (CASE WHEN dup_lines*10 > n_lines*3 THEN 1 ELSE 0 END)"
            r" + (CASE WHEN dup_paras*10 > n_paras*3 THEN 2 ELSE 0 END)"
            r" + (CASE WHEN dup_line_chars*5 > total THEN 4 ELSE 0 END)"
            r" + (CASE WHEN dup_para_chars*5 > total THEN 8 ELSE 0 END)"
            r" + (CASE WHEN coalesce(t2,0)*100 > total*20"
            r" THEN 16 ELSE 0 END)"
            r" + (CASE WHEN coalesce(t3,0)*100 > total*18"
            r" THEN 32 ELSE 0 END)"
            r" + (CASE WHEN coalesce(t4,0)*100 > total*16"
            r" THEN 64 ELSE 0 END)"
            r" + (CASE WHEN coalesce(d5,0)*100 > total*15"
            r" THEN 128 ELSE 0 END)"
            r" + (CASE WHEN coalesce(d6,0)*100 > total*14"
            r" THEN 256 ELSE 0 END)"
            r" + (CASE WHEN coalesce(d7,0)*100 > total*13"
            r" THEN 512 ELSE 0 END)"
            r" + (CASE WHEN coalesce(d8,0)*100 > total*12"
            r" THEN 1024 ELSE 0 END)"
            r" + (CASE WHEN coalesce(d9,0)*100 > total*11"
            r" THEN 2048 ELSE 0 END)"
            r" + (CASE WHEN coalesce(d10,0)*100 > total*10"
            r" THEN 4096 ELSE 0 END) AS fail_flags"
            r" FROM d LEFT JOIN gp ON d.doc_id = gp.doc_id"
            r") SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,"
            r" CAST(n_paras AS BIGINT) AS n_paras,"
            r" CAST(dup_lines AS BIGINT) AS dup_lines,"
            r" CAST(dup_paras AS BIGINT) AS dup_paras,"
            r" CAST(dup_line_chars AS BIGINT) AS dup_line_chars,"
            r" CAST(dup_para_chars AS BIGINT) AS dup_para_chars,"
            r" CAST(fail_flags AS BIGINT) AS fail_flags,"
            r" CAST(CASE WHEN fail_flags = 0 THEN 1 ELSE 0 END"
            r" AS BIGINT) AS keep FROM f"
        ),
        "gopher_filter": (
            # the seven Gopher A1.1 rules as integer cross-multiplied
            # comparisons; list lambdas give per-token stats, the
            # (?m) line patterns count bullet/ellipsis lines exactly
            # as Python re does (ASCII-explicit classes throughout)
            r"WITH t AS (SELECT doc_id, text,"
            r" regexp_extract_all(text, '[^ \t\n\r\f\v]+') AS toks"
            r" FROM documents"
            r"), s AS (SELECT doc_id, len(toks) AS n,"
            r" coalesce(list_sum(list_transform(toks,"
            r" w -> length(w))), 0) AS chars,"
            r" coalesce(list_sum(list_transform(toks,"
            r" w -> CASE WHEN regexp_matches(w, '[A-Za-z]')"
            r" THEN 1 ELSE 0 END)), 0) AS n_alpha,"
            r" (CASE WHEN list_contains(list_transform(toks,"
            r" w -> lower(w)), 'the') THEN 1 ELSE 0 END"
            r" + CASE WHEN list_contains(list_transform(toks,"
            r" w -> lower(w)), 'be') THEN 1 ELSE 0 END"
            r" + CASE WHEN list_contains(list_transform(toks,"
            r" w -> lower(w)), 'to') THEN 1 ELSE 0 END"
            r" + CASE WHEN list_contains(list_transform(toks,"
            r" w -> lower(w)), 'of') THEN 1 ELSE 0 END"
            r" + CASE WHEN list_contains(list_transform(toks,"
            r" w -> lower(w)), 'and') THEN 1 ELSE 0 END"
            r" + CASE WHEN list_contains(list_transform(toks,"
            r" w -> lower(w)), 'that') THEN 1 ELSE 0 END"
            r" + CASE WHEN list_contains(list_transform(toks,"
            r" w -> lower(w)), 'have') THEN 1 ELSE 0 END"
            r" + CASE WHEN list_contains(list_transform(toks,"
            r" w -> lower(w)), 'with') THEN 1 ELSE 0 END) AS n_stop,"
            r" length(text) - length(replace(text, '#', ''))"
            r" + len(regexp_extract_all(text, '\.\.\.')) AS sym,"
            r" length(text) - length(replace(text, chr(10), '')) + 1"
            r" AS n_lines,"
            r" len(regexp_extract_all(text,"
            r" '(?m)^[ \t]*[-*][ \t]')) AS bullets,"
            r" len(regexp_extract_all(text,"
            r" '(?m)\.\.\.[ \t]*$')) AS ell_lines FROM t"
            r"), f AS (SELECT doc_id, n,"
            r" (CASE WHEN n < 50 OR n > 100000 THEN 1 ELSE 0 END"
            r" + CASE WHEN n > 0 AND (chars < 3*n OR chars > 10*n)"
            r" THEN 2 ELSE 0 END"
            r" + CASE WHEN 10*sym > n THEN 4 ELSE 0 END"
            r" + CASE WHEN 10*bullets > 9*n_lines THEN 8 ELSE 0 END"
            r" + CASE WHEN 10*ell_lines > 3*n_lines THEN 16 ELSE 0 END"
            r" + CASE WHEN n > 0 AND 5*n_alpha < 4*n THEN 32 ELSE 0 END"
            r" + CASE WHEN n_stop < 2 THEN 64 ELSE 0 END) AS fail_flags"
            r" FROM s"
            r") SELECT doc_id, CAST(n AS BIGINT) AS n_words,"
            r" CAST(fail_flags AS BIGINT) AS fail_flags,"
            r" CAST(CASE WHEN fail_flags = 0 THEN 1 ELSE 0 END"
            r" AS BIGINT) AS keep FROM f"
        ),
        "near_dup_keep_best": (
            # the near_dup_clusters closure + per-cluster argmax on
            # text length (ties -> min doc id)
            r"WITH RECURSIVE "
            r"tk AS (SELECT doc_id, regexp_extract_all(lower(text), "
            r"'[^ \t\n\r\f\v]+') AS toks FROM documents), "
            r"sh AS (SELECT DISTINCT doc_id, "
            r"toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s "
            r"FROM tk, unnest(generate_series(1, len(toks) - 2)) AS u(i)), "
            r"cnt AS (SELECT doc_id, count(*) AS n FROM sh "
            r"GROUP BY doc_id), "
            r"inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) "
            r"AS i FROM sh a JOIN sh b ON a.s = b.s "
            r"AND a.doc_id < b.doc_id GROUP BY 1, 2), "
            r"pairs AS (SELECT i.a, i.b FROM inter i "
            r"JOIN cnt ca ON ca.doc_id = i.a "
            r"JOIN cnt cb ON cb.doc_id = i.b "
            r"WHERE ca.n >= 5 AND cb.n >= 5 "
            r"AND i.i * 1000 >= 800 * (ca.n + cb.n - i.i)), "
            r"edges AS (SELECT a AS s, b AS t FROM pairs "
            r"UNION ALL SELECT b, a FROM pairs), "
            r"reach AS (SELECT DISTINCT s AS id, s AS lab FROM edges "
            r"UNION SELECT e.s AS id, r.lab FROM edges e "
            r"JOIN reach r ON r.id = e.t), "
            r"comp AS (SELECT id AS doc_id, min(lab) AS cluster_id "
            r"FROM reach GROUP BY id), "
            r"stats AS (SELECT c.cluster_id, c.doc_id, "
            r"length(d.text) AS n_chars FROM comp c "
            r"JOIN documents d USING (doc_id)), "
            r"mx AS (SELECT cluster_id, max(n_chars) AS m, "
            r"count(*) AS n_members FROM stats GROUP BY 1) "
            r"SELECT CAST(s.cluster_id AS BIGINT) AS cluster_id, "
            r"CAST(min(s.doc_id) AS BIGINT) AS kept_doc_id, "
            r"CAST(min(mx.n_members) AS BIGINT) AS n_members "
            r"FROM stats s JOIN mx ON mx.cluster_id = s.cluster_id "
            r"AND s.n_chars = mx.m GROUP BY s.cluster_id"
        ),
        "jaccard_dup_pairs": (
            # EXACT self-join twin: same trigram-Jaccard CTE as
            # near_dup_pairs but with NO minimum-shingle gate and
            # threshold 0.7 — the engine's prefix-filter candidates
            # guarantee 100% recall, so the oracle is the full
            # quadratic join's answer, not an LSH approximation
            r"WITH tk AS ("
            r" SELECT doc_id, regexp_extract_all(lower(text),"
            r" '[^ \t\n\r\f\v]+')"
            r" AS toks FROM documents"
            r"), sh AS ("
            r" SELECT DISTINCT doc_id,"
            r" toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s"
            r" FROM tk, unnest(generate_series(1, len(toks) - 2)) AS u(i)"
            r"), cnt AS ("
            r" SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id"
            r"), inter AS ("
            r" SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i"
            r" FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id"
            r" GROUP BY 1, 2"
            r") SELECT i.a, i.b,"
            r" CAST((i.i * 1000) // (ca.n + cb.n - i.i) AS BIGINT)"
            r" AS jaccard_x1000"
            r" FROM inter i JOIN cnt ca ON ca.doc_id = i.a"
            r" JOIN cnt cb ON cb.doc_id = i.b"
            r" WHERE i.i * 1000 >= 700 * (ca.n + cb.n - i.i)"
        ),
        "near_dup_clusters": (
            # recursive-CTE transitive closure over the SAME verified
            # pair set as near_dup_pairs: component id = min reachable
            # doc id (the engine's min-label-propagation fixed point)
            r"WITH RECURSIVE "
            r"tk AS (SELECT doc_id, regexp_extract_all(lower(text), "
            r"'[^ \t\n\r\f\v]+') AS toks FROM documents), "
            r"sh AS (SELECT DISTINCT doc_id, "
            r"toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s "
            r"FROM tk, unnest(generate_series(1, len(toks) - 2)) AS u(i)), "
            r"cnt AS (SELECT doc_id, count(*) AS n FROM sh "
            r"GROUP BY doc_id), "
            r"inter AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) "
            r"AS i FROM sh a JOIN sh b ON a.s = b.s "
            r"AND a.doc_id < b.doc_id GROUP BY 1, 2), "
            r"pairs AS (SELECT i.a, i.b FROM inter i "
            r"JOIN cnt ca ON ca.doc_id = i.a "
            r"JOIN cnt cb ON cb.doc_id = i.b "
            r"WHERE ca.n >= 5 AND cb.n >= 5 "
            r"AND i.i * 1000 >= 800 * (ca.n + cb.n - i.i)), "
            r"edges AS (SELECT a AS s, b AS t FROM pairs "
            r"UNION ALL SELECT b, a FROM pairs), "
            r"reach AS (SELECT DISTINCT s AS id, s AS lab FROM edges "
            r"UNION SELECT e.s AS id, r.lab FROM edges e "
            r"JOIN reach r ON r.id = e.t) "
            r"SELECT id AS doc_id, CAST(min(lab) AS BIGINT) "
            r"AS cluster_id FROM reach GROUP BY id"
        ),
        "simhash_dup_pairs": (
            # Full SQL replica of the engine's sketch: token hash =
            # first 8 md5 bytes big-endian (bit b = bit b%4 of hex
            # nibble (63-b)//4), per-bit ±1 fold with ties → 0, then
            # ALL-pairs hamming ≤ 3.  The engine's 4×16-bit banding is
            # EXACT for hamming ≤ 3 (pigeonhole), so engine == oracle
            # deterministically — no LSH luck involved.
            r"WITH tok AS ("
            r" SELECT doc_id, md5(tok) AS h FROM ("
            r"  SELECT doc_id, unnest(regexp_extract_all(lower(text),"
            r" '[^ \t\n\r\f\v]+')) AS tok FROM documents)"
            r"), bitsum AS ("
            r" SELECT t.doc_id, r.b AS b,"
            r" sum(CASE WHEN ((instr('0123456789abcdef',"
            r" substr(t.h, (63 - r.b)//4 + 1, 1)) - 1) >> (r.b % 4))"
            r" & 1 = 1 THEN 1 ELSE -1 END) AS s"
            r" FROM tok t CROSS JOIN range(64) r(b)"
            r" GROUP BY t.doc_id, r.b"
            r"), bits AS ("
            r" SELECT d.doc_id, r.b, coalesce(x.s, 0) > 0 AS bit"
            r" FROM documents d CROSS JOIN range(64) r(b)"
            r" LEFT JOIN bitsum x ON x.doc_id = d.doc_id AND x.b = r.b"
            r") SELECT a.doc_id AS a, b.doc_id AS b,"
            r" CAST(sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END)"
            r" AS BIGINT) AS hamming"
            r" FROM bits a JOIN bits b ON a.b = b.b"
            r" AND a.doc_id < b.doc_id"
            r" GROUP BY a.doc_id, b.doc_id"
            r" HAVING sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END)"
            r" <= 3"
        ),
        "event_sessions": (
            "WITH d AS (SELECT user_id, ts, CASE WHEN "
            "lag(ts) OVER w IS NULL OR epoch_us(ts) - epoch_us(lag(ts) "
            "OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s "
            "FROM events WINDOW w AS "
            "(PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT user_id, ts, new_s, "
            "sum(new_s) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) AS sess_id FROM d) "
            "SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, "
            "count(*) AS n_events, "
            "CAST(max(sess_n) AS BIGINT) AS max_session_events "
            "FROM (SELECT user_id, new_s, "
            "count(*) OVER (PARTITION BY user_id, sess_id) AS sess_n "
            "FROM s) GROUP BY user_id"
        ),
        "orders_asof_event": (
            # ties on (user_id, ts) are deduplicated to the max
            # event_id on both sides (the engine's documented rule) —
            # DuckDB's ASOF picks an unspecified row otherwise
            "WITH e AS (SELECT user_id, ts, value, row_number() OVER "
            "(PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn "
            "FROM events) "
            "SELECT o_orderkey, e.value AS value "
            "FROM orders ASOF LEFT JOIN (SELECT * FROM e WHERE rn = 1) e "
            "ON orders.o_custkey = e.user_id AND e.ts <= orders.o_orderdate"
        ),
        "top_orders_by_segment": (
            "SELECT c_mktsegment, o_orderkey, o_totalprice, rank "
            "FROM (SELECT c_mktsegment, o_orderkey, o_totalprice, "
            "CAST(row_number() OVER (PARTITION BY c_mktsegment "
            "ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rank "
            "FROM orders JOIN customer ON o_custkey = c_custkey) "
            "WHERE rank <= 3"
        ),
        "events_preceding_count": (
            # strictly-earlier ts within [ts − 1h, ts): tie-free on
            # both sides (engine rule, windows.py:preceding_count)
            "SELECT e1.event_id, "
            "CAST(count(e2.event_id) AS BIGINT) AS n_preceding "
            "FROM events e1 LEFT JOIN events e2 "
            "ON e1.user_id = e2.user_id "
            "AND e2.ts >= e1.ts - INTERVAL 1 HOUR AND e2.ts < e1.ts "
            "GROUP BY e1.event_id"
        ),
        "event_type_distinct_users": (
            "SELECT event_type, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY event_type"
        ),
        "hll_user_registers": (
            # exact SQL twin of sketch.py's register definition:
            # md5(str(user)) → idx = first byte, rho = leading zero
            # bits of the next 60 bits + 1 (string ops, no float)
            "WITH h AS (SELECT DISTINCT event_type, "
            "md5(CAST(user_id AS VARCHAR)) AS x FROM events), "
            "r AS (SELECT event_type, "
            "CAST((instr('0123456789abcdef', substr(x, 1, 1)) - 1) * 16 "
            "+ instr('0123456789abcdef', substr(x, 2, 1)) - 1 "
            "AS BIGINT) AS reg_idx, substr(x, 3, 15) AS s FROM h), "
            "rho AS (SELECT event_type, reg_idx, "
            "CASE WHEN ltrim(s, '0') = '' THEN 61 ELSE "
            "CAST(4 * (15 - length(ltrim(s, '0'))) + "
            "CASE WHEN nib >= 8 THEN 1 WHEN nib >= 4 THEN 2 "
            "WHEN nib >= 2 THEN 3 ELSE 4 END AS BIGINT) END AS rho "
            "FROM (SELECT event_type, reg_idx, s, "
            "instr('0123456789abcdef', substr(ltrim(s, '0'), 1, 1)) - 1 "
            "AS nib FROM r)) "
            "SELECT event_type, reg_idx, CAST(max(rho) AS BIGINT) "
            "AS reg_val FROM rho GROUP BY 1, 2"
        ),
        "events_hopping": (
            "SELECT user_id, w AS window_id, count(*) AS n_events, "
            "round(sum(value), 2) AS sum_value "
            "FROM (SELECT user_id, value, unnest(generate_series("
            "CAST(floor((epoch_us(ts) - 3600000000) / 1800000000.0) "
            "+ 1 AS BIGINT), "
            "CAST(floor(epoch_us(ts) / 1800000000.0) AS BIGINT))) AS w "
            "FROM events) GROUP BY 1, 2"
        ),
        "user_value_median": (
            # DuckDB median == the engine's (lo+hi)/2 continuous rule
            # (verified bit-equal on this data)
            "SELECT user_id, median(value) AS median "
            "FROM events GROUP BY user_id"
        ),
        "user_value_p90": (
            # engine uses the exact v[lo]*(1-frac)+v[hi]*frac lerp —
            # DuckDB-bit-equal (numpy's own quantile formula is NOT)
            "SELECT user_id, quantile_cont(value, 0.9) AS quantile "
            "FROM events GROUP BY user_id"
        ),
        "doc_normalize": (
            r"SELECT doc_id, trim(regexp_replace(lower(text),"
            r" '[ \t\n\r\f\v]+', ' ', 'g'), ' ') AS norm_text"
            r" FROM documents"
        ),
        "top_tokens": (
            r"SELECT token, CAST(count(*) AS BIGINT) AS n FROM ("
            r"SELECT unnest(regexp_extract_all(lower(text),"
            r" '[^ \t\n\r\f\v]+')) "
            r"AS token FROM documents) GROUP BY token "
            r"ORDER BY n DESC, token LIMIT 20"
        ),
        "doc_sample": (
            "SELECT doc_id FROM documents "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '2'"
        ),
        "customer_event_coverage": (
            # pre-aggregated left-outer twin: count per user first,
            # then LEFT JOIN — null n → 0 events
            "WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n"
            " FROM events GROUP BY 1)"
            " SELECT c_mktsegment,"
            " CAST(count(*) AS BIGINT) AS n_customers,"
            " CAST(sum(CASE WHEN n IS NOT NULL THEN 1 ELSE 0 END)"
            " AS BIGINT) AS n_with_events,"
            " CAST(coalesce(sum(n), 0) AS BIGINT) AS total_events"
            " FROM customer LEFT JOIN c ON c_custkey = user_id"
            " GROUP BY 1"
        ),
        "customers_without_events": (
            "SELECT c_mktsegment, count(*) AS n_customers "
            "FROM customer WHERE c_custkey NOT IN "
            "(SELECT user_id FROM events) GROUP BY c_mktsegment"
        ),
        "customers_without_events_bloom": (
            "SELECT c_mktsegment, count(*) AS n_customers "
            "FROM customer WHERE c_custkey NOT IN "
            "(SELECT user_id FROM events) GROUP BY c_mktsegment"
        ),
        "events_asof_order": (
            # ties on (custkey, orderdate) deduplicated to the max
            # o_orderkey (engine right_id rule) before the ASOF
            "WITH o AS (SELECT o_custkey, o_orderdate, "
            "max(o_orderkey) AS o_orderkey FROM orders GROUP BY 1, 2) "
            "SELECT event_id, o.o_orderkey AS o_orderkey "
            "FROM events ASOF LEFT JOIN o "
            "ON events.user_id = o.o_custkey "
            "AND o.o_orderdate <= events.ts"
        ),
        "curate_corpus": (
            # the composed curation pipeline, stage for stage:
            # gate (ws-token count + digit permille, integer
            # math), exact dedup (min id per text), near-dup
            # drop (greater id of every verified >=0.8 trigram-
            # Jaccard pair; same CTE shape as near_dup_pairs),
            # per-lang doc/token stats
            r"WITH base AS (SELECT doc_id, text, lang,"
            r" len(regexp_extract_all(text, '[^ \t\n\r\f\v]+'))"
            r" AS n_tokens,"
            r" CASE WHEN length(text) > 0 THEN"
            r" (len(regexp_extract_all(text, '[0-9]')) * 1000)"
            r" // length(text) ELSE 0 END AS digit_pm"
            r" FROM documents),"
            r" q AS (SELECT * FROM base WHERE n_tokens >= 5"
            r" AND digit_pm <= 300),"
            r" ex AS (SELECT min(doc_id) AS doc_id FROM q"
            r" GROUP BY text),"
            r" d AS (SELECT q.* FROM q JOIN ex"
            r" ON q.doc_id = ex.doc_id),"
            r" tk AS (SELECT doc_id,"
            r" regexp_extract_all(lower(text),"
            r" '[^ \t\n\r\f\v]+') AS toks"
            r" FROM d),"
            r" sh AS (SELECT DISTINCT doc_id,"
            r" toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]"
            r" AS s FROM tk,"
            r" unnest(generate_series(1, len(toks) - 2)) AS u(i)),"
            r" cnt AS (SELECT doc_id, count(*) AS n FROM sh"
            r" GROUP BY doc_id),"
            r" inter AS (SELECT a.doc_id AS a, b.doc_id AS b,"
            r" count(*) AS i FROM sh a JOIN sh b ON a.s = b.s"
            r" AND a.doc_id < b.doc_id GROUP BY 1, 2),"
            r" pairs AS (SELECT i.b FROM inter i"
            r" JOIN cnt ca ON ca.doc_id = i.a"
            r" JOIN cnt cb ON cb.doc_id = i.b"
            r" WHERE ca.n >= 5 AND cb.n >= 5"
            r" AND i.i * 1000 >= 800 * (ca.n + cb.n - i.i)),"
            r" kept AS (SELECT * FROM d WHERE doc_id NOT IN"
            r" (SELECT b FROM pairs))"
            r" SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,"
            r" CAST(sum(n_tokens) AS BIGINT) AS sum_tokens"
            r" FROM kept GROUP BY lang"
        ),
        "events_above_type_mean": (
            # integer-cents cross-multiplication twin: v·n > Σv — no
            # float mean on either side
            "WITH c AS (SELECT user_id, event_type,"
            " CAST(round(value * 100) AS BIGINT) AS v FROM events),"
            " a AS (SELECT user_id, event_type,"
            " CAST(sum(v) AS BIGINT) AS s,"
            " CAST(count(*) AS BIGINT) AS n"
            " FROM c GROUP BY 1, 2)"
            " SELECT c.event_type,"
            " CAST(count(*) AS BIGINT) AS n_above"
            " FROM c JOIN a USING (user_id, event_type)"
            " WHERE c.v * a.n > a.s GROUP BY 1"
        ),
        "events_range_join": (
            "WITH p AS (SELECT event_id AS p_id, user_id, ts "
            "FROM events WHERE event_type = 'purchase') "
            "SELECT p.p_id, CAST(count(*) AS BIGINT) AS n_follow, "
            "CAST(sum(e.event_id) AS BIGINT) AS sum_follow_id "
            "FROM p JOIN events e ON e.user_id = p.user_id "
            "AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 1 HOUR "
            "GROUP BY p.p_id"
        ),
        "mm_pixel_stats": (
            # closed-form twin of the REAL PNG decode: px(y,x,ch) =
            # (nb+x)%256 with w<256, so the mod wraps at most once —
            # sum_px = 3·h·(w·r + w(w−1)/2 − 256·max(0, r+w−256));
            # green only if zlib+unfilter reproduce the formula exactly
            "SELECT item_id, CAST(w AS BIGINT) AS width, "
            "CAST(h AS BIGINT) AS height, "
            "CAST(3 * h * (w * r + w * (w - 1) // 2 "
            "- 256 * greatest(0, r + w - 256)) AS BIGINT) AS sum_px "
            "FROM (SELECT doc_id AS item_id, 8 + nb % 120 AS w, "
            "8 + (nb * 7) % 90 AS h, nb % 256 AS r "
            "FROM (SELECT doc_id, octet_length(encode(text)) AS nb "
            "FROM documents WHERE doc_id % 2 = 0 "
            "AND doc_id % 97 != 0))"
        ),
        "mm_audio_stats": (
            # series-join twin of the REAL WAV PCM decode: flat sample
            # i: s[i] = (nb·31 + i·17) % 65536 − 32768.  DuckDB's
            # generate_series can't take lateral column bounds, so join
            # a fixed 0..3997 series (max ch·fr = 2·1999) and filter.
            "SELECT d.doc_id AS item_id, "
            "CAST(d.ch AS BIGINT) AS channels, "
            "CAST(d.fr AS BIGINT) AS frames, "
            "CAST(sum(abs((d.nb * 31 + s.i * 17) % 65536 - 32768)) "
            "AS BIGINT) AS sum_abs, "
            "CAST(max(abs((d.nb * 31 + s.i * 17) % 65536 - 32768)) "
            "AS BIGINT) AS peak_abs "
            "FROM (SELECT doc_id, nb, 1 + nb % 2 AS ch, "
            "500 + nb % 1500 AS fr "
            "FROM (SELECT doc_id, octet_length(encode(text)) AS nb "
            "FROM documents WHERE doc_id % 2 = 1 "
            "AND doc_id % 97 != 0)) d "
            "JOIN generate_series(0, 3997) s(i) "
            "ON s.i < d.ch * d.fr "
            "GROUP BY d.doc_id, d.ch, d.fr"
        ),
        "mm_video_frames": (
            # closed-form twin of the REAL AVI frame decode: frame t's
            # pixel px(t,y,x,ch) = (nb+3t+x)%256, constant in y and ch,
            # so frame_sum(t) = 3·h·(w·r + w(w−1)/2 − 256·max(0,
            # r+w−256)) with r = (nb+3t)%256 (w < 256 wraps at most
            # once); sampler keeps every 2nd frame (t % 2 = 0,
            # frames ≤ 7 so the series tops at 6).  Green only if the
            # AVI writer, RIFF walk, bottom-up BGR de-padding and
            # frame sampling all round-trip exactly.
            "SELECT d.doc_id AS item_id, "
            "CAST(s.t AS BIGINT) AS frame_idx, "
            "CAST(d.w AS BIGINT) AS width, "
            "CAST(d.h AS BIGINT) AS height, "
            "CAST(3 * d.h * (d.w * ((d.nb + 3 * s.t) % 256) "
            "+ d.w * (d.w - 1) // 2 "
            "- 256 * greatest(0, ((d.nb + 3 * s.t) % 256) + d.w - 256)) "
            "AS BIGINT) AS frame_sum "
            "FROM (SELECT doc_id, nb, 8 + nb % 24 AS w, "
            "8 + (nb * 5) % 18 AS h, 2 + nb % 6 AS f "
            "FROM (SELECT doc_id, octet_length(encode(text)) AS nb "
            "FROM documents WHERE doc_id % 97 != 0)) d "
            "JOIN generate_series(0, 6) s(t) "
            "ON s.t < d.f AND s.t % 2 = 0"
        ),
        "mm_jpeg_stats": (
            # closed-form twin of the REAL baseline-JPEG decode: every
            # 8×8 block j (row-major over a bh×bw block grid) is flat
            # at 128 + 16·(((nb+j)%7)−3) — exact through quality-50
            # quantization (Q00=16) — so each block's pixel sum is
            # 64·(128+16k) = 5120 + 1024·((nb+j)%7), times channel
            # count c (1 gray / 3 RGB: equal channels survive the
            # YCbCr+4:2:0 path exactly).  bw ≤ 7, bh ≤ 6 ⇒ series
            # tops at 41.  Green only if the huffman tables, DC DPCM,
            # restart-marker handling, dequant, IDCT and color
            # reconstruction all round-trip exactly.
            "SELECT d.doc_id AS item_id, "
            "CAST(8 * d.bw AS BIGINT) AS width, "
            "CAST(8 * d.bh AS BIGINT) AS height, "
            "CAST(d.c AS BIGINT) AS channels, "
            "CAST(d.c * sum(5120 + 1024 * ((d.nb + s.j) % 7)) "
            "AS BIGINT) AS sum_px "
            "FROM (SELECT doc_id, nb, 2 + nb % 6 AS bw, "
            "2 + (nb * 3) % 5 AS bh, "
            "CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS c "
            "FROM (SELECT doc_id, octet_length(encode(text)) AS nb "
            "FROM documents WHERE doc_id % 97 != 0)) d "
            "JOIN generate_series(0, 41) s(j) ON s.j < d.bw * d.bh "
            "GROUP BY d.doc_id, d.bw, d.bh, d.c, d.nb"
        ),
        "mixed_extract": (
            # same golden-text contract as extract_pages: whichever
            # branch (HTML chain or PDF layout parse) a row took, the
            # extracted text must be byte-identical to golden
            f"SELECT url, text AS extracted_text "
            f"FROM read_parquet('{pages}')"
        ),
        "pdf_extract": (
            # The PDF wrap (split(' ') at 8 words/line, 12 lines/page,
            # two columns, scrambled emission) is exactly invertible:
            # the engine's '\n'→' ' flatten must reproduce the SOURCE
            # text byte-for-byte, and n_pages is the closed-form
            # ceil(ceil(words/8)/12).  Any loss in the string escapes,
            # hex decode, Flate streams, xref walk or reading-order
            # reconstruction breaks the hash.
            "SELECT doc_id AS item_id, text, "
            "CAST(ceil(CAST(ceil(len(str_split(text, ' ')) / 8.0) "
            "AS BIGINT) / 12.0) AS BIGINT) AS n_pages "
            "FROM documents"
        ),
        "mm_decode_meta": (
            # SQL twin of payload_table_from_documents' integer field
            # formulas (multimodal.py): the engine row is only green if
            # header SYNTHESIS and header PARSING round-trip exactly.
            "SELECT doc_id AS item_id, "
            "CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
            "ELSE 'video' END AS kind, "
            "CAST(CASE WHEN bad THEN 0 WHEN k = 0 THEN 16 + nb % 241 "
            "WHEN k = 1 THEN 0 ELSE 320 + nb % 321 END AS BIGINT) "
            "AS width, "
            "CAST(CASE WHEN bad THEN 0 WHEN k = 0 THEN "
            "16 + (nb * 7) % 199 WHEN k = 1 THEN 0 "
            "ELSE 240 + nb % 241 END AS BIGINT) AS height, "
            "CAST(CASE WHEN bad THEN 0 WHEN k = 1 THEN 1 + nb % 2 "
            "ELSE 3 END AS BIGINT) AS channels, "
            "CAST(CASE WHEN bad THEN 0 WHEN k = 0 THEN 1 "
            "WHEN k = 1 THEN 1000 + nb % 9000 "
            "ELSE 1 + nb % 120 END AS BIGINT) AS frames, "
            "CAST(CASE WHEN bad THEN 0 WHEN k = 1 THEN 16000 "
            "ELSE 0 END AS BIGINT) AS sample_rate, "
            "CAST(CASE WHEN bad THEN 0 WHEN k = 0 THEN 33 + nb "
            "WHEN k = 1 THEN 44 + nb ELSE 88 + nb END AS BIGINT) "
            "AS payload_bytes, "
            "CASE WHEN bad THEN 'error: empty payload' ELSE 'ok' END "
            "AS status "
            "FROM (SELECT doc_id, octet_length(encode(text)) AS nb, "
            "doc_id % 3 AS k, doc_id % 97 = 0 AS bad FROM documents)"
        ),
        "mm_resize_plan": (
            # image rows: doc_id % 3 == 0, non-corrupt; dims from the
            # synthesis formulas; fit-longer-side-to-224 integer math
            "SELECT doc_id AS item_id, "
            "CAST(greatest(1, (w * 224) // greatest(w, h, 1)) "
            "AS BIGINT) AS thumb_w, "
            "CAST(greatest(1, (h * 224) // greatest(w, h, 1)) "
            "AS BIGINT) AS thumb_h "
            "FROM (SELECT doc_id, "
            "16 + octet_length(encode(text)) % 241 AS w, "
            "16 + (octet_length(encode(text)) * 7) % 199 AS h "
            "FROM documents WHERE doc_id % 3 = 0 AND doc_id % 97 != 0)"
        ),
        "mm_frame_plan": (
            # video rows = doc_id % 3 == 2, non-corrupt; frames =
            # 1 + nb % 120 (multimodal synthesis formulas); every 10th
            "SELECT doc_id AS item_id, "
            "unnest(generate_series(0, frames - 1, 10)) AS frame_idx "
            "FROM (SELECT doc_id, "
            "1 + octet_length(encode(text)) % 120 AS frames "
            "FROM documents WHERE doc_id % 3 = 2 AND doc_id % 97 != 0)"
        ),
        # knn_ivf / train_prototypes: rows-only by design (approximate
        # search tuned by a recall gate in pytest; model training is a
        # custom fold) — documented in COVERAGE.md.
    }
    # gather-path variant runs the same planted harness → same truth
    out["embedding_near_dup_gather"] = out["embedding_near_dup"]
    # the postings index is an ACCESS PATH: its answer must equal the
    # corpus-scan conjunction (one definition, two consumers)
    out["postings_search"] = out["term_search"]
    # same rule for the materialized MinHash-LSH index: probe ≡ the
    # two-dataset banding path on the same even/odd split
    out["minhash_probe_dups"] = out["cross_snapshot_dups"]
    # curate_corpus_v4: compose the c4_filter and gopher_repetition
    # twins VERBATIM (one definition, two consumers), retargeted from
    # the documents view to the pages fixture, then conjunction +
    # exact dedup (min url per identical text — Ray Min and DuckDB
    # min agree lexicographically on varchar)
    _v4_pages = (f"(SELECT url AS doc_id, text"
                 f" FROM read_parquet('{pages}'))")
    _v4_c4 = out["c4_filter"].replace(" FROM documents",
                                      f" FROM {_v4_pages}")
    _v4_rep = out["gopher_repetition"].replace(" FROM documents",
                                               f" FROM {_v4_pages}")
    out["curate_corpus_v4"] = (
        f"WITH c4 AS ({_v4_c4}), rep AS ({_v4_rep}),"
        f" surv AS (SELECT p.url, p.text, c4.n_kept,"
        f" c4.n_sentences, c4.kept_chars"
        f" FROM read_parquet('{pages}') p"
        f" JOIN c4 ON c4.doc_id = p.url"
        f" JOIN rep ON rep.doc_id = p.url"
        f" WHERE c4.keep = 1 AND rep.keep = 1),"
        f" k AS (SELECT min(url) AS url FROM surv GROUP BY text)"
        f" SELECT s.url, n_kept, n_sentences, kept_chars"
        f" FROM surv s JOIN k USING (url)"
    )
    # link-graph family: ONE shared edge-extraction CTE text (href
    # regex + strict-UTF-8 gate + fragment-strip + RFC-lite
    # resolution — links.py pins the law; the fixture marks its
    # non-UTF-8 pages by url kind, the ground-truth for the decode()
    # gate since DuckDB has no TRY variant of decode)
    _lk_edges = (
        f"up AS (SELECT url, decode(html) AS h"
        f" FROM read_parquet('{pages}')"
        f" WHERE url NOT LIKE '%/latin1/%'),"
        r" raw AS (SELECT url AS src, unnest(regexp_extract_all(h,"
        r""" '<[aA][ \t][^>]*?[hH][rR][eE][fF][ \t]*=[ \t]*"([^"]*)"',"""
        r" 1)) AS href FROM up),"
        r" st AS (SELECT src, split_part(href, '#', 1) AS hh"
        r" FROM raw),"
        r" res AS (SELECT src, CASE"
        r" WHEN regexp_matches(hh, '^[a-z][a-z0-9+.-]*://') THEN hh"
        r" WHEN left(hh, 1) = '/' THEN"
        r" regexp_extract(src, '^[a-z][a-z0-9+.-]*://[^/]*') || hh"
        r" ELSE regexp_extract(src, '^.*/') || hh END AS dst"
        r" FROM st WHERE hh <> ''),"
        r" edges AS (SELECT src, dst, CAST(count(*) AS BIGINT)"
        r" AS n_links FROM res GROUP BY 1, 2)"
    )
    out["outlinks"] = (
        f"WITH {_lk_edges} SELECT src, dst, n_links FROM edges"
    )
    out["link_indegree"] = (
        f"WITH {_lk_edges}"
        f" SELECT dst, CAST(sum(n_links) AS BIGINT) AS n_links,"
        f" CAST(count(*) AS BIGINT) AS n_src_pages"
        f" FROM edges GROUP BY dst"
    )
    # anchor-text index: TWO regexp_extract_all passes (groups 1/2)
    # align by match index — both engines scan the same pattern
    # leftmost/non-overlapping; generate_series zips them
    _anchor_pat = (r'<[aA][ \t][^>]*?[hH][rR][eE][fF][ \t]*=[ \t]*'
                   r'"([^"]*)"[^>]*>([^<]*)')
    out["anchor_texts"] = (
        f"WITH up AS (SELECT url, decode(html) AS h"
        f" FROM read_parquet('{pages}')"
        f" WHERE url NOT LIKE '%/latin1/%'),"
        f" hs AS (SELECT url AS src,"
        f" regexp_extract_all(h, '{_anchor_pat}', 1) AS hl,"
        f" regexp_extract_all(h, '{_anchor_pat}', 2) AS tl FROM up),"
        r" occ AS (SELECT src, hl[i] AS href,"
        r" trim(tl[i], ' ' || chr(9) || chr(13) || chr(10)) AS anchor"
        r" FROM hs, unnest(generate_series(1, len(hl))) AS u(i)),"
        r" st AS (SELECT src, split_part(href, '#', 1) AS hh, anchor"
        r" FROM occ WHERE anchor <> ''),"
        r" res AS (SELECT src, CASE"
        r" WHEN regexp_matches(hh, '^[a-z][a-z0-9+.-]*://') THEN hh"
        r" WHEN left(hh, 1) = '/' THEN"
        r" regexp_extract(src, '^[a-z][a-z0-9+.-]*://[^/]*') || hh"
        r" ELSE regexp_extract(src, '^.*/') || hh END AS dst, anchor"
        r" FROM st WHERE hh <> ''),"
        r" pp AS (SELECT src, dst, anchor, count(*) AS n FROM res"
        r" GROUP BY 1, 2, 3)"
        r" SELECT dst, anchor,"
        r" CAST(sum(n) AS BIGINT) AS n_occurrences,"
        r" CAST(count(*) AS BIGINT) AS n_src_pages"
        r" FROM pp GROUP BY 1, 2"
    )
    # 2-iteration integer PageRank unrolled (the kmeans/semdedup
    # fixed-depth-CTE property); // is floor division on BIGINT in
    # both engines, sink-drop documented in links.py
    _pr_iter = (
        "(SELECT e.dst AS node,"
        " sum((85 * r.r * e.n_links) // (100 * o.outdeg)) AS contrib"
        " FROM edges e JOIN {r} r ON r.node = e.src"
        " JOIN od o ON o.src = e.src GROUP BY e.dst)"
    )
    _pr_rank = (
        "(SELECT n.node, 150000 + coalesce(c.contrib, 0) AS r"
        " FROM nodes n LEFT JOIN {c} c ON c.node = n.node)"
    )
    out["pagerank"] = (
        f"WITH {_lk_edges},"
        f" nodes AS (SELECT url AS node FROM read_parquet('{pages}')"
        f" UNION SELECT dst FROM edges),"
        f" od AS (SELECT src, sum(n_links) AS outdeg FROM edges"
        f" GROUP BY src),"
        f" r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r"
        f" FROM nodes),"
        f" c1 AS {_pr_iter.format(r='r0')},"
        f" r1 AS {_pr_rank.format(c='c1')},"
        f" c2 AS {_pr_iter.format(r='r1')},"
        f" r2 AS {_pr_rank.format(c='c2')}"
        f" SELECT node, CAST(r AS BIGINT) AS rank FROM r2"
    )
    # 2-iteration integer HITS unrolled (links.py pins the law:
    # DISTINCT unweighted edges, hubs seed 1, auth-then-hub
    # sequential update, UNNORMALIZED)
    _hits_auth = (
        "(SELECT n.node, coalesce(s.v, 0) AS v FROM nodes n"
        " LEFT JOIN (SELECT de.dst AS node, sum({h}.v) AS v"
        " FROM de JOIN {h} ON {h}.node = de.src GROUP BY de.dst) s"
        " ON s.node = n.node)"
    )
    _hits_hub = (
        "(SELECT n.node, coalesce(s.v, 0) AS v FROM nodes n"
        " LEFT JOIN (SELECT de.src AS node, sum({a}.v) AS v"
        " FROM de JOIN {a} ON {a}.node = de.dst GROUP BY de.src) s"
        " ON s.node = n.node)"
    )
    out["hits"] = (
        f"WITH {_lk_edges},"
        f" de AS (SELECT DISTINCT src, dst FROM edges),"
        f" nodes AS (SELECT url AS node FROM read_parquet('{pages}')"
        f" UNION SELECT dst FROM edges),"
        f" h0 AS (SELECT node, CAST(1 AS BIGINT) AS v FROM nodes),"
        f" a1 AS {_hits_auth.format(h='h0')},"
        f" h1 AS {_hits_hub.format(a='a1')},"
        f" a2 AS {_hits_auth.format(h='h1')},"
        f" h2 AS {_hits_hub.format(a='a2')}"
        f" SELECT h2.node, CAST(h2.v AS BIGINT) AS hub,"
        f" CAST(a2.v AS BIGINT) AS auth"
        f" FROM h2 JOIN a2 ON a2.node = h2.node"
    )
    # weakly-connected components: recursive-CTE transitive closure
    # over the undirected edge set (the near_dup_clusters twin shape);
    # component = min reachable node (lexicographic on urls — the
    # engine's min-label fixed point); edge-set nodes only
    out["link_components"] = (
        f"WITH RECURSIVE {_lk_edges},"
        r" und AS (SELECT src AS s, dst AS t FROM edges"
        r" UNION SELECT dst, src FROM edges),"
        r" reach AS (SELECT DISTINCT s AS id, s AS lab FROM und"
        r" UNION SELECT e.s AS id, r.lab FROM und e"
        r" JOIN reach r ON r.id = e.t)"
        r" SELECT id AS node, min(lab) AS component"
        r" FROM reach GROUP BY id"
    )
    # crawl frontier: uncrawled targets ranked by distinct linking
    # pages (edge rows are per-(src, dst) distinct so count(*) ≡
    # distinct pages); the ORDER BY mirrors the engine's topk tie law
    # (n_src_pages DESC, dst ASC) so the boundary SET matches
    out["crawl_frontier"] = (
        f"WITH {_lk_edges}"
        r" SELECT dst, CAST(count(*) AS BIGINT) AS n_src_pages,"
        r" CAST(sum(n_links) AS BIGINT) AS n_links FROM edges"
        f" WHERE dst NOT IN (SELECT url FROM read_parquet('{pages}'))"
        r" GROUP BY dst ORDER BY n_src_pages DESC, dst ASC LIMIT 20"
    )
    # crawl depth: fixed-depth BFS unrolling (the pagerank/hits
    # convention) — seeds from the FULL pages table (a crawled page
    # seeds even when its html fails the edge gate), each hop joins
    # only the frontier (depth = hop-1; expanding settled nodes is
    # redundant under +1 weights) then re-mins
    _cd_hop = (
        " u{i} AS (SELECT node, depth FROM d{p}"
        " UNION ALL SELECT e.dst AS node, d.depth + 1 AS depth"
        " FROM d{p} d JOIN edges e ON e.src = d.node"
        " WHERE d.depth = {pd}),"
        " d{i} AS (SELECT node, min(depth) AS depth"
        " FROM u{i} GROUP BY node)")
    out["crawl_depth"] = (
        f"WITH {_lk_edges},"
        f" d0 AS (SELECT url AS node, CAST(0 AS BIGINT) AS depth"
        f" FROM read_parquet('{pages}')"
        r" WHERE regexp_matches(url, '0$')),"
        + ",".join(_cd_hop.format(i=i, p=i - 1, pd=i - 1)
                   for i in (1, 2, 3))
        + " SELECT node, depth FROM d3"
    )
    # host condensation: authority part via the same scheme regex
    # both engines run; '' on no match (DuckDB regexp_extract ≡ the
    # engine's host_of law)
    # crawl blocklist — clause-per-bit twin of urls.url_rule_filter
    # over the SAME URL_RULES constant (one definition, two
    # consumers); ends_with/starts_with builtins, never LIKE (no
    # wildcard-escaping hazard)
    _uf_bh = "','".join(sorted(URL_RULES["block_hosts"]))
    _uf_sfx = " OR ".join(
        f"ends_with(host, '{s}')"
        for s in sorted(URL_RULES["block_host_suffixes"]))
    _uf_pfx = " OR ".join(
        f"starts_with(url, '{p}')"
        for p in sorted(URL_RULES["block_path_prefixes"]))
    _uf_allow = ("host IN ('" + "','".join(
        sorted(URL_RULES["allow_hosts"])) + "')"
        if URL_RULES["allow_hosts"] else "FALSE")
    out["url_filter"] = (
        f"WITH h AS (SELECT url, regexp_extract(url,"
        f" '^[a-z][a-z0-9+.-]*://([^/]*)', 1) AS host"
        f" FROM read_parquet('{pages}')),"
        f" f AS (SELECT url,"
        f" (CASE WHEN host IN ('{_uf_bh}') THEN 1 ELSE 0 END"
        f" + CASE WHEN {_uf_sfx} THEN 2 ELSE 0 END"
        f" + CASE WHEN {_uf_pfx} THEN 4 ELSE 0 END"
        f" + CASE WHEN {_uf_allow} THEN 8 ELSE 0 END) AS flags"
        f" FROM h)"
        f" SELECT url, CAST(flags AS BIGINT) AS flags,"
        f" CAST(CASE WHEN (flags & 8) != 0 OR (flags & 7) = 0"
        f" THEN 1 ELSE 0 END AS BIGINT) AS keep FROM f"
    )
    # URL template mining: digit-run collapse + population, the
    # crawl_frontier tie law at the k boundary
    out["url_pattern_stats"] = (
        f"WITH s AS (SELECT regexp_replace(url, '[0-9]+', 'N', 'g')"
        f" AS shape FROM read_parquet('{pages}'))"
        r" SELECT shape, CAST(count(*) AS BIGINT) AS n_urls FROM s"
        r" GROUP BY shape ORDER BY n_urls DESC, shape ASC LIMIT 20"
    )
    # robots politeness filter over pages + the SAME planted robots
    # row (ROBOTS_URL/ROBOTS_LINES — one definition, two consumers);
    # parse law: ALL 'Disallow:' lines (case-sensitive, at line
    # start), values trimmed of [ \t\r], empties dropped; pages drop
    # when their own host has a matching path prefix
    _rb_body_sql = "'" + "\\n".join(
        ln.replace("'", "''") for ln in ROBOTS_LINES) + "'"
    out["robots_filter"] = (
        f"WITH pl AS (SELECT url, html"
        f" FROM read_parquet('{pages}')"
        f" UNION ALL SELECT '{ROBOTS_URL}',"
        f" encode(replace({_rb_body_sql}, '\\n', chr(10)))),"
        r" rob AS (SELECT regexp_extract(url,"
        r" '^[a-z][a-z0-9+.-]*://([^/]*)', 1) AS host,"
        r" decode(html) AS body FROM pl WHERE regexp_matches(url,"
        r" '^[a-z][a-z0-9+.-]*://[^/]*/robots\.txt$')),"
        r" ln AS (SELECT host, unnest(string_split(body, chr(10)))"
        r" AS line FROM rob),"
        r" rules AS (SELECT DISTINCT host,"
        r" trim(substr(line, 10), ' ' || chr(9) || chr(13))"
        r" AS prefix FROM ln WHERE starts_with(line, 'Disallow:')"
        r" AND trim(substr(line, 10), ' ' || chr(9) || chr(13))"
        r" <> ''),"
        r" pp AS (SELECT url, regexp_extract(url,"
        r" '^[a-z][a-z0-9+.-]*://([^/]*)', 1) AS host,"
        r" regexp_replace(url, '^[a-z][a-z0-9+.-]*://[^/]*', '')"
        r" AS path FROM pl)"
        r" SELECT url FROM pp WHERE NOT EXISTS (SELECT 1 FROM rules"
        r" r WHERE r.host = pp.host"
        r" AND starts_with(pp.path, r.prefix))"
    )
    # vocabulary drift between the even/odd doc_id halves — the
    # whole-bit log-ratio (printf('%b') ≡ the engine's _bitlen)
    out["vocab_drift"] = (
        "WITH ta AS (SELECT unnest(regexp_extract_all(lower(text),"
        " '[a-z0-9]+')) AS token FROM documents WHERE doc_id % 2 = 0),"
        " tb AS (SELECT unnest(regexp_extract_all(lower(text),"
        " '[a-z0-9]+')) AS token FROM documents WHERE doc_id % 2 = 1),"
        " ca AS (SELECT token, count(*) AS n_a FROM ta GROUP BY 1),"
        " cb AS (SELECT token, count(*) AS n_b FROM tb GROUP BY 1),"
        " m AS (SELECT token, coalesce(n_a, 0) AS n_a,"
        " coalesce(n_b, 0) AS n_b FROM ca FULL JOIN cb USING (token)),"
        " s AS (SELECT token, CAST(n_a AS BIGINT) AS n_a,"
        " CAST(n_b AS BIGINT) AS n_b,"
        " CAST(length(printf('%b', n_a + 1))"
        " - length(printf('%b', n_b + 1)) AS BIGINT) AS shift_bits"
        " FROM m WHERE n_a + n_b >= 5)"
        " SELECT token, n_a, n_b, shift_bits,"
        " CAST(rk AS BIGINT) AS rank FROM (SELECT *, row_number()"
        " OVER (ORDER BY abs(shift_bits) DESC, token ASC) AS rk"
        " FROM s) WHERE rk <= 20"
    )
    out["host_graph"] = (
        f"WITH {_lk_edges}"
        r" SELECT"
        r" regexp_extract(src, '^[a-z][a-z0-9+.-]*://([^/]*)', 1)"
        r" AS src_host,"
        r" regexp_extract(dst, '^[a-z][a-z0-9+.-]*://([^/]*)', 1)"
        r" AS dst_host,"
        r" CAST(count(*) AS BIGINT) AS n_page_edges,"
        r" CAST(sum(n_links) AS BIGINT) AS n_links"
        r" FROM edges GROUP BY 1, 2"
    )
    # host-level PageRank: the SAME damped floor-div unrolling as
    # `pagerank`, over the host condensation (self-loops kept) with
    # EDGE-SET nodes (the link_components convention — no corpus
    # host table exists)
    _hr_host = "regexp_extract({c}, '^[a-z][a-z0-9+.-]*://([^/]*)', 1)"
    _hr_iter = (
        "(SELECT e.dst AS node,"
        " sum((85 * r.r * e.n_links) // (100 * o.outdeg)) AS contrib"
        " FROM he e JOIN {r} r ON r.node = e.src"
        " JOIN odh o ON o.src = e.src GROUP BY e.dst)"
    )
    _hr_rank = (
        "(SELECT n.node, 150000 + coalesce(c.contrib, 0) AS r"
        " FROM nodesh n LEFT JOIN {c} c ON c.node = n.node)"
    )
    out["host_rank"] = (
        f"WITH {_lk_edges},"
        f" he AS (SELECT {_hr_host.format(c='src')} AS src,"
        f" {_hr_host.format(c='dst')} AS dst,"
        f" CAST(sum(n_links) AS BIGINT) AS n_links"
        f" FROM edges GROUP BY 1, 2),"
        f" nodesh AS (SELECT src AS node FROM he"
        f" UNION SELECT dst FROM he),"
        f" odh AS (SELECT src, sum(n_links) AS outdeg FROM he"
        f" GROUP BY src),"
        f" r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r"
        f" FROM nodesh),"
        f" c1 AS {_hr_iter.format(r='r0')},"
        f" r1 AS {_hr_rank.format(c='c1')},"
        f" c2 AS {_hr_iter.format(r='r1')},"
        f" r2 AS {_hr_rank.format(c='c2')}"
        f" SELECT node, CAST(r AS BIGINT) AS rank FROM r2"
    )
    # co-citation "related pages": hub targets above the indegree
    # cap excluded BY LAW before pairing (the MAX_BUCKET convention
    # applied to graphs); engine topk tie law mirrored
    out["co_citation"] = (
        f"WITH {_lk_edges},"
        r" ind AS (SELECT dst, count(*) AS deg FROM edges"
        r" GROUP BY dst),"
        r" kp AS (SELECT e.src, e.dst FROM edges e"
        r" JOIN ind USING (dst) WHERE ind.deg <= 64),"
        r" p AS (SELECT x.src AS a, y.src AS b,"
        r" CAST(count(*) AS BIGINT) AS n_common"
        r" FROM kp x JOIN kp y ON x.dst = y.dst AND x.src < y.src"
        r" GROUP BY 1, 2)"
        r" SELECT a, b, n_common FROM p WHERE n_common >= 2"
        r" ORDER BY n_common DESC, a, b LIMIT 20"
    )
    # reciprocal links over pages + the SAME planted a↔b pair
    # (MUTUAL_PAGES — one definition, two consumers); least/greatest
    # ≡ the engine's lexicographic min/max, sum of direction tags
    # == 3 ⟺ both directions exist; self-links excluded
    _mu_planted = "".join(
        f" UNION ALL SELECT '{u}', encode('{h}')"
        for u, h in MUTUAL_PAGES)
    _lk_edges_pl = _lk_edges.replace(
        f"read_parquet('{pages}')", "pl")
    out["mutual_links"] = (
        f"WITH pl AS (SELECT url, html FROM read_parquet('{pages}')"
        f"{_mu_planted}),"
        f" {_lk_edges_pl}"
        r" SELECT least(src, dst) AS a, greatest(src, dst) AS b"
        r" FROM edges WHERE src <> dst GROUP BY 1, 2"
        r" HAVING sum(CASE WHEN src < dst THEN 1 ELSE 2 END) = 3"
    )
    # per-host duplication pressure: twin counts raw html values,
    # engine counts sha1 groups (the dedup_exact convention)
    out["host_dup_stats"] = (
        f"WITH c AS (SELECT html, CAST(count(*) AS BIGINT) AS n"
        f" FROM read_parquet('{pages}') GROUP BY html),"
        f" p AS (SELECT regexp_extract(url,"
        f" '^[a-z][a-z0-9+.-]*://([^/]*)', 1) AS host, html"
        f" FROM read_parquet('{pages}')),"
        r" j AS (SELECT p.host, c.n FROM p JOIN c USING (html))"
        r" SELECT host, CAST(count(*) AS BIGINT) AS n_pages,"
        r" CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)"
        r" AS n_dup_pages FROM j GROUP BY host"
    )
    return out
