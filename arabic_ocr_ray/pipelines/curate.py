"""Training-corpus curation — the composed pipeline shape a 100 TB
text-curation run executes, end to end on one streaming Dataset:

    quality gate → exact dedup → near-dup removal → per-lang stats

Every stage is one of the engine's verified operators; this module
only composes them (analogous to how the reference's process.py
composes preprocess → segment → classify, process.py:15-47).

Shuffle inventory (the scale contract):
  gate            none (map_batches filter)
  exact dedup     content-hash groupby + one hash semi-join
  near-dup        LSH banding groupby + shuffle-side Jaccard verify
                  (verify texts bounded by 2 × pairs) + one hash
                  anti-join on the drop list
  final stats     groupby(lang) over a handful of rows per block
                  (map-side combine by Ray's aggregate)
"""

from __future__ import annotations

import pyarrow as pa


def curate_corpus(docs_ds, min_tokens: int = 5, max_digit_pm: int = 300,
                  near_threshold: float = 0.8,
                  checkpoint_dir: str | None = None):
    """→ Dataset(lang, n_docs, sum_tokens) after curation.

    Gate: whitespace token count ≥ ``min_tokens`` AND digit permille
    ≤ ``max_digit_pm`` (integer math — SQL-exact).  Exact dedup keeps
    the min doc_id per identical text.  Near-dup removal drops the
    GREATER id of every verified ≥ ``near_threshold`` Jaccard pair —
    deterministic in both engines given the (oracle-verified) pair
    set.

    The survivor set feeds TWO consumers (pair mining and the final
    anti-join), so a streaming engine must either recompute the
    upstream or checkpoint it.  ``checkpoint_dir`` writes survivors
    as partitioned parquet and re-reads (the 100 TB path — doubles
    as the resume boundary); without it the survivors are pinned in
    the object store (fixture scale).
    """
    from ..functions import dedup
    from ..functions.joins import hash_join
    from ..functions.text import _DIGIT, _WS_SPLIT

    def gate(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        keep, ntok = [], []
        for t in texts:
            t0 = t or ""
            toks = len(_WS_SPLIT.findall(t0))
            n = len(t0)
            dpm = (len(_DIGIT.findall(t0)) * 1000) // n if n else 0
            keep.append(toks >= min_tokens and dpm <= max_digit_pm)
            ntok.append(toks)
        out = b.append_column("n_tokens", pa.array(ntok, pa.int64()))
        return out.filter(pa.array(keep))

    qd = docs_ds.map_batches(gate, batch_format="pyarrow")

    from ..functions.joins import _pa_type
    idt = _pa_type(dict(zip(docs_ds.schema().names,
                            docs_ds.schema().types))["doc_id"])
    id_hint = pa.schema([("doc_id", idt)])
    keep_ids = dedup.dedup_exact(
        qd, col="text", id_col="doc_id").select_columns(["doc_id"])
    # static hints: both small sides are aggregate/fold tails whose
    # plan-time schema probe would run their whole shuffle twice
    survivors = hash_join(qd, keep_ids, on="doc_id", how="semi",
                          right_schema=id_hint)

    if checkpoint_dir is not None:
        from ..sources.parquet import read_parquet_clean

        survivors.write_parquet(checkpoint_dir)
        survivors = read_parquet_clean(checkpoint_dir)
    else:
        survivors = survivors.materialize()

    pairs = dedup.near_dup_pairs(survivors, threshold=near_threshold,
                                 col="text", id_col="doc_id")
    drop = pairs.select_columns(["b"]).map_batches(
        lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow")
    kept = hash_join(survivors, drop, on="doc_id", how="anti",
                     right_schema=id_hint)

    from ray.data.aggregate import Count, Sum

    return (kept.groupby("lang")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_tokens", alias_name="sum_tokens")))


def curate_corpus_v2(docs_ds, min_tokens: int = 20,
                     max_top_bigram_pm: int = 60,
                     per_source_cap: int = 10,
                     num_partitions: int = 16,
                     checkpoint_dir: str | None = None):
    """→ Dataset(doc_id, source, lang, n_tokens, rank) — the second
    composed curation chain, built from the late-r3 operators:

        PII redaction → token + top-bigram repetition gates
        → exact dedup (on the REDACTED text) → per-source cap

    The C4 line filter stays a standalone operator
    (``text.line_filter_batch``): the documents-table contract is
    single-line word streams (no '\n', no terminal punctuation), so
    a line gate would be vacuous here; the gates that DO discriminate
    on this corpus are token count and Gopher-style top-bigram share
    (p90 = 68 permille at sf0.01 → the 60-permille default rejects a
    real tail).  Order matters (gates run on the redacted text) and
    is mirrored exactly in the SQL twin.

    Shuffle inventory: redaction + signals + gates are ONE pure map;
    exact dedup = content groupby + hash semi-join; the per-source
    frequency cap = grouped_topk map-side heads.  Like v1, the gated
    set feeds TWO consumers (the dedup key scan and the semi-join
    left side), so it is pinned — ``checkpoint_dir`` writes it as
    partitioned parquet and re-reads (the 100 TB resume boundary);
    without it the object store pin is used (fixture scale).  Leaving
    it lazy would re-run the regex+Counter map, the costliest per-row
    stage, once per consumer."""
    from collections import Counter

    from ..functions import dedup
    from ..functions.joins import hash_join
    from ..functions.text import _WORD_RE, _WS_SPLIT, redact
    from ..functions.topk import grouped_topk

    def stage_map(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        keep, ntok_out, red_out = [], [], []
        for t in texts:
            red = redact(t)
            toks = len(_WS_SPLIT.findall(red))
            w = _WORD_RE.findall(red.lower())
            if len(w) >= 2:
                bg_pm = (max(Counter(zip(w, w[1:])).values())
                         * 1000) // (len(w) - 1)
            else:
                bg_pm = 0
            keep.append(toks >= min_tokens
                        and bg_pm <= max_top_bigram_pm)
            ntok_out.append(toks)
            red_out.append(red)
        out = pa.table({
            "doc_id": b.column("doc_id"),
            "source": b.column("source"),
            "lang": b.column("lang"),
            "clean_text": pa.array(red_out, pa.string()),
            "n_tokens": pa.array(ntok_out, pa.int64()),
        })
        return out.filter(pa.array(keep))

    gated = docs_ds.map_batches(stage_map, batch_format="pyarrow")
    if checkpoint_dir is not None:
        from ..sources.parquet import read_parquet_clean

        gated.write_parquet(checkpoint_dir)
        gated = read_parquet_clean(checkpoint_dir)
    else:
        gated = gated.materialize()
    keep_ids = dedup.dedup_exact(
        gated, col="clean_text",
        id_col="doc_id").select_columns(["doc_id"])
    # static hint: the keep_ids aggregate would otherwise execute
    # twice (plan-time schema probe + real run)
    from ..functions.joins import _pa_type
    idt = _pa_type(dict(zip(docs_ds.schema().names,
                            docs_ds.schema().types))["doc_id"])
    survivors = hash_join(gated, keep_ids, on="doc_id", how="semi",
                          num_partitions=num_partitions,
                          right_schema=pa.schema([("doc_id", idt)]))
    return grouped_topk(
        survivors.select_columns(["doc_id", "source", "lang",
                                  "n_tokens"]),
        ["source"], "doc_id", per_source_cap, descending=False,
        num_partitions=8)


def curate_corpus_v3(pages_ds, bench_ds, k_gram: int = 8,
                     min_tokens: int = 5, num_partitions: int = 16):
    """→ Dataset(url, text, n_tokens) — the WEB-pages curation chain,
    composed from the r4 corpus-level operators in the order a
    crawl-curation run applies them:

        benchmark decontamination → corpus-wide paragraph dedup
        (keep_first) → minimum-token gate on the CLEANED text

    Decontamination runs FIRST: a benchmark passage that also happens
    to be boilerplate must drop the document (leak!) before the
    paragraph pass could launder it into a unique-looking page.  The
    token gate runs LAST so pages gutted down to navigation crumbs by
    the paragraph pass are swept out.

    Shuffle inventory: decontamination is a pure streaming filter
    (benchmark gram set broadcast once via ray.put — bounded
    eval-suite contract); paragraph dedup is the module's two
    fixed-partition shuffles (para-keyed decision fold, id-keyed
    reassembly); the gate is a pure map.  Nothing here pins or
    materializes the corpus — the chain is a single streaming plan.
    """
    from ..functions import dedup, paragraphs
    from ..functions.text import _WS_SPLIT

    ref = dedup.benchmark_gram_ref(bench_ds, k=k_gram)
    clean = dedup.decontaminate(pages_ds, ref, k=k_gram, col="text")
    deduped = paragraphs.dedup_paragraphs(
        clean, col="text", id_col="url", mode="keep_first",
        num_partitions=num_partitions)

    def gate(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        ntok = [len(_WS_SPLIT.findall(t or "")) for t in texts]
        out = b.append_column("n_tokens", pa.array(ntok, pa.int64()))
        import pyarrow.compute as pc

        return out.filter(pc.greater_equal(out.column("n_tokens"),
                                           min_tokens))

    return deduped.map_batches(gate, batch_format="pyarrow")


def curate_corpus_v4(pages_ds, id_col: str = "url"):
    """→ Dataset(url, n_kept, n_sentences, kept_chars) — the
    PUBLISHED-filter curation chain (the C4/FineWeb recipe shape):

        C4 page filter ∧ Gopher repetition filter → exact dedup
        (keep lexicographic-min id per identical text)

    Both filters are per-doc pure stats, so they run in ONE fused
    verdict map — a single corpus scan computes both bitmasks and
    filters in-batch (three separate map stages would re-ship every
    text twice through the object store for no reason).  The Gopher
    QUALITY filter is deliberately not in this chain: its stopword
    rule is English-specific and its word-count floor assumes prose —
    on a multilingual crawl it runs as a scored column
    (``gopher_filter``), not a gate.

    Shuffle inventory: verdicts none (streaming map); exact dedup =
    content-hash groupby + one id semi-join (the D1 pattern) — the
    text column never moves except into the hash.
    """
    from ..functions import dedup
    from ..functions.joins import _pa_type, hash_join
    from ..functions.text import (
        c4_page_filter_batch,
        gopher_repetition_batch,
    )

    def verdict(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        docs = pa.table({"doc_id": b.column(id_col),
                         "text": b.column("text")})
        c4 = c4_page_filter_batch(docs)
        rep = gopher_repetition_batch(docs)
        keep = pc.and_(pc.equal(c4.column("keep"), 1),
                       pc.equal(rep.column("keep"), 1))
        out = pa.table({
            id_col: b.column(id_col),
            "text": b.column("text"),
            "n_kept": c4.column("n_kept"),
            "n_sentences": c4.column("n_sentences"),
            "kept_chars": c4.column("kept_chars")})
        return out.filter(keep)

    surv = pages_ds.map_batches(verdict, batch_format="pyarrow")

    idt = _pa_type(dict(zip(pages_ds.schema().names,
                            pages_ds.schema().types))[id_col])
    keep_ids = dedup.dedup_exact(
        surv, col="text", id_col=id_col).select_columns([id_col])
    # static hint: the keep set is an aggregate tail whose plan-time
    # schema probe would run the whole dedup shuffle twice
    out = hash_join(surv, keep_ids, on=id_col, how="semi",
                    right_schema=pa.schema([(id_col, idt)]))
    return out.select_columns([id_col, "n_kept", "n_sentences",
                               "kept_chars"])
