"""Text-analysis operators over a documents table (doc_id, text, ...).

Each operator is a vectorized per-batch function designed so an ANSI
SQL oracle (DuckDB) can reproduce it EXACTLY — integer outputs, fixed
priority orders, no floats on any decision path.  The SQL twins live in
``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

# --- token counting -------------------------------------------------------
# Token = run of non-whitespace, with an EXPLICIT ASCII whitespace
# class (never \s / str.split(): Python whitespace is unicode-aware —
# U+0085, U+00A0 — while the DuckDB-RE2 oracles are ASCII-only; the
# hypothesis twin fuzz caught the divergence).  Unicode whitespace is
# a token character in BOTH engines, consistently.
_WS_SPLIT = re.compile(r"[^ \t\n\r\f\v]+")


def token_count_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    n = [len(_WS_SPLIT.findall(t or "")) for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(n, pa.int64()),
    })


def chunk_plan_batch(batch: pa.Table, window: int = 64,
                     stride: int = 48) -> pa.Table:
    """→ (doc_id, chunk_id, tok_start, tok_end, n_tokens) — the
    sliding-window chunk plan a RAG indexer / context-window trainer
    runs over every document: overlapping windows of ``window``
    whitespace tokens advancing by ``stride`` (overlap = window −
    stride).

    Law (oracle-pinned): token count = the :func:`token_count_batch`
    whitespace-run law; a doc with 0 tokens emits NO chunks; n ≤
    window ⇒ exactly one chunk [0, n); else
    ``ceil((n − window)/stride) + 1`` chunks at starts ``i·stride``
    with ``end = min(start + window, n)`` — the last chunk may be
    short, the second-to-last is always full, and no start ≥ n is
    ever emitted (the HF-tokenizers stride convention).

    Pure per-row map (ZERO shuffles; the explode is one vectorized
    repeat + per-group arange, no Python loop beyond the tokenizer
    scan itself) — chunk TEXT is deliberately not materialized here:
    the plan is ~32 B/row while gathered text would be ~overlap×
    corpus bytes; a consumer slices lazily from the doc."""
    texts = batch.column("text").to_pylist()
    ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
    n = np.array([len(_WS_SPLIT.findall(t or "")) for t in texts],
                 np.int64)
    nc = np.where(n == 0, 0,
                  np.where(n <= window, 1,
                           (n - window + stride - 1) // stride + 1))
    rep_id = np.repeat(ids, nc)
    rep_n = np.repeat(n, nc)
    offs = np.concatenate([[0], np.cumsum(nc)[:-1]])
    cid = np.arange(int(nc.sum()), dtype=np.int64) \
        - np.repeat(offs, nc)
    start = cid * stride
    return pa.table({
        "doc_id": pa.array(rep_id, pa.int64()),
        "chunk_id": pa.array(cid, pa.int64()),
        "tok_start": pa.array(start, pa.int64()),
        "tok_end": pa.array(np.minimum(start + window, rep_n),
                            pa.int64()),
        "n_tokens": pa.array(rep_n, pa.int64()),
    })


# GPT-2-style pre-tokenizer shape (contractions | space?+letter-run |
# space?+digit-run | space?+punct-run), restricted to ASCII classes so
# Python re and DuckDB's RE2 tokenize IDENTICALLY (both engines are
# leftmost-first; \p{L} would diverge).  Whitespace runs are not
# tokens — unmatched text is skipped by both scanners.  The whitespace
# class is EXPLICIT ([ \t\n\r\f\v]), never \s: Python's \s is
# Unicode-aware (U+00A0 is whitespace) while RE2's is ASCII-only —
# the hypothesis fuzz (test_bpe_pattern_python_duckdb_equivalence)
# caught exactly that divergence.  Unicode whitespace therefore
# counts as a punct-run char in BOTH engines, consistently.
BPE_TOKEN_PATTERN = (r"'(?:s|t|re|ve|m|ll|d)"
                     r"| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f\v]+")
_BPE_RE = re.compile(BPE_TOKEN_PATTERN)


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """BPE-ish token count — the training-cost estimator's unit (a
    whitespace count undercounts code/punctuation-heavy docs 2-3x).
    SQL twin: ``len(regexp_extract_all(text, <same pattern>))``."""
    texts = batch.column("text").to_pylist()
    n = [len(_BPE_RE.findall(t or "")) for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_bpe_tokens": pa.array(n, pa.int64()),
    })


# --- character-class stats (quality-score ingredients) --------------------
_DIGIT = re.compile(r"[0-9]")
_ALPHA = re.compile(r"[A-Za-z]")
_SPACE = re.compile(r" ")
_UPPER = re.compile(r"[A-Z]")


def char_stats_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    out = {"n_chars": [], "n_alpha": [], "n_digit": [], "n_space": [],
           "n_upper": []}
    for t in texts:
        t = t or ""
        out["n_chars"].append(len(t))
        out["n_alpha"].append(len(_ALPHA.findall(t)))
        out["n_digit"].append(len(_DIGIT.findall(t)))
        out["n_space"].append(len(_SPACE.findall(t)))
        out["n_upper"].append(len(_UPPER.findall(t)))
    cols = {"doc_id": batch.column("doc_id")}
    cols.update({k: pa.array(v, pa.int64()) for k, v in out.items()})
    return pa.table(cols)


# --- language identification (n-gram/stopword heuristic) ------------------
# Deterministic rule, replicable in SQL:
#   1. any Arabic-block char        → 'ar'
#   2. any CJK-block char           → 'zh'
#   3. else stopword-hit vote among {en,de,es,fr}; ties break by this
#      fixed priority order (en > de > es > fr); zero hits → 'en'.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr": ("le", "la", "les", "et", "est", "que", "pour", "dans", "un", "une"),
}
_LANG_ORDER = ("en", "de", "es", "fr")
# re.ASCII: \b must mean the ASCII word boundary RE2 uses — unicode
# \b treats e.g. '¹' as a word char and diverges from the SQL twins
_STOP_RE = {
    lang: re.compile(r"\b(?:" + "|".join(ws) + r")\b", re.ASCII)
    for lang, ws in STOPWORDS.items()
}
_ARABIC_RE = re.compile(r"[؀-ۿ]")
_CJK_RE = re.compile(r"[一-鿿]")


def lang_id(text: str) -> str:
    t = (text or "").lower()
    if _ARABIC_RE.search(t):
        return "ar"
    if _CJK_RE.search(t):
        return "zh"
    best, best_n = "en", -1
    for lang in _LANG_ORDER:
        k = len(_STOP_RE[lang].findall(t))
        if k > best_n:
            best, best_n = lang, k
    return best


def lang_id_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "lang_pred": pa.array([lang_id(t) for t in texts], pa.string()),
    })


# --- document fingerprint (rolling polynomial hash) -----------------------
FP_MOD = (1 << 61) - 1
FP_BASE = 1_000_003


def fingerprint(text: str) -> int:
    """Karp-Rabin style rolling hash over the Unicode CODE-POINT
    stream, mod 2^61−1 (Horner fold; python-int arithmetic stays
    exact).  Code points rather than utf-8 bytes so a SQL twin can
    reproduce it exactly (DuckDB ``unicode(substr(..))`` +
    ``list_reduce`` over HUGEINT — blobs have no byte indexing)."""
    h = 0
    for cp in map(ord, text or ""):
        h = (h * FP_BASE + cp) % FP_MOD
    return h


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array([fingerprint(t) for t in texts], pa.int64()),
    })


# --- quality score --------------------------------------------------------
def quality_batch(batch: pa.Table) -> pa.Table:
    """Integer quality signals: mean token length (x100), stopword hits
    (en), digit permille, space permille.  All int64 → oracle-exact."""
    texts = batch.column("text").to_pylist()
    mean_tok_len_x100, n_stop, digit_pm, space_pm = [], [], [], []
    for t in texts:
        t = t or ""
        toks = _WS_SPLIT.findall(t)
        total = sum(len(w) for w in toks)
        mean_tok_len_x100.append((total * 100) // len(toks) if toks else 0)
        n_stop.append(len(_STOP_RE["en"].findall(t.lower())))
        n = len(t)
        digit_pm.append((len(_DIGIT.findall(t)) * 1000) // n if n else 0)
        space_pm.append((len(_SPACE.findall(t)) * 1000) // n if n else 0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "mean_tok_len_x100": pa.array(mean_tok_len_x100, pa.int64()),
        "n_stopwords": pa.array(n_stop, pa.int64()),
        "digit_permille": pa.array(digit_pm, pa.int64()),
        "space_permille": pa.array(space_pm, pa.int64()),
    })


_WS_RUN = re.compile(r"[ \t\n\r\f\v]+")  # ASCII-only, see _WS_SPLIT


def normalize_batch(batch: pa.Table) -> pa.Table:
    """Canonical text normalization: lowercase, collapse every
    whitespace run to one space, strip.  The X1 whitespace-collapse
    analog (integrator.py:8-9) as a corpus-wide operator; SQL twin:
    ``trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))``."""
    texts = batch.column("text").to_pylist()
    out = [_WS_RUN.sub(" ", (t or "").lower()).strip(" ")
           for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "norm_text": pa.array(out, pa.string()),
    })


def token_count_partials(batch: pa.Table) -> pa.Table:
    """Per-batch token frequency partials (map-side combine for the
    distributed word count): → (token, n) rows, one per distinct
    token per batch."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch.column("text").to_pylist():
        c.update(_WS_SPLIT.findall((t or "").lower()))
    items = sorted(c.items())
    return pa.table({
        "token": pa.array([k for k, _ in items], pa.string()),
        "n": pa.array([v for _, v in items], pa.int64()),
    })


def top_tokens(ds, k: int = 20):
    """Distributed word count → top-k tokens (ties → token asc):
    map-side partial Counters → one Sum shuffle keyed by token →
    map-side top-k partials → tiny driver merge (no global sort)."""
    from ray.data.aggregate import Sum

    from .topk import topk

    counts = (ds.map_batches(token_count_partials,
                             batch_format="pyarrow")
              .groupby("token")
              .aggregate(Sum("n", alias_name="n")))
    return topk(counts, "n", k, descending=True, tie_cols=("token",))


def term_count_partials(batch: pa.Table) -> pa.Table:
    """→ (doc_id, token, tf) rows.  Each input row is one WHOLE
    document, so per-doc term frequencies are complete in-batch —
    no shuffle needed for the tf side of tf-idf."""
    from collections import Counter

    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_id, out_tok, out_tf = [], [], []
    for i, t in zip(ids, texts):
        c = Counter(_WORD_RE.findall((t or "").lower()))
        for tok in sorted(c):
            out_id.append(i)
            out_tok.append(tok)
            out_tf.append(c[tok])
    return pa.table({
        "doc_id": pa.array(out_id, pa.int64()),
        "token": pa.array(out_tok, pa.string()),
        "tf": pa.array(out_tf, pa.int64()),
    })


def tfidf_top_terms(ds, k: int = 3, num_partitions: int = 32):
    """Distributed TF-IDF top-k terms per document.

    Shuffle inventory (the 100 TB shape):
      1. tf: map-side only — one row per (doc, token), complete
         in-batch because a row is a whole document.
      2. df: ``groupby(token).count()`` over those rows (they are
         already distinct per (doc, token)) — one token-keyed shuffle
         of (token, 1)-weight rows.
      3. tf ⋈ df: token-hash partitioned ``hash_join`` — the df side
         is vocabulary-sized and skew-prone (stopword tokens), so it
         travels as a shuffled column, never a driver broadcast.
      4. per-doc top-k: ``grouped_topk`` (map-side heads, doc-keyed
         shuffle of ≤ blocks × k rows — no global sort).

    Integer-exact score: ``score_x1000 = tf * 1000 * N // df``
    (idf ∝ N/df; the log-free variant keeps the oracle exact —
    HUGEINT intermediate in the SQL twin, python int here)."""
    from ray.data.aggregate import Count

    from .joins import hash_join
    from .topk import grouped_topk

    n_docs = ds.count()
    tf = ds.map_batches(term_count_partials, batch_format="pyarrow")
    df = (tf.select_columns(["token"])
          .groupby("token").aggregate(Count(alias_name="df")))
    # static hints: without them the df side's plan-time schema probe
    # executes the whole tf→Count shuffle a second time
    joined = hash_join(tf, df, on="token", how="inner",
                       num_partitions=num_partitions,
                       left_schema=pa.schema([("doc_id", pa.int64()),
                                              ("token", pa.string()),
                                              ("tf", pa.int64())]),
                       right_schema=pa.schema([("token", pa.string()),
                                               ("df", pa.int64())]))

    def score(b: pa.Table) -> pa.Table:
        tfv = b.column("tf").to_pylist()
        dfv = b.column("df").to_pylist()
        s = [(t * 1000 * n_docs) // d for t, d in zip(tfv, dfv)]
        return b.append_column("score_x1000", pa.array(s, pa.int64()))

    scored = joined.map_batches(score, batch_format="pyarrow")
    return grouped_topk(scored, ["doc_id"], "score_x1000", k,
                        descending=True, tie_cols=("token",),
                        num_partitions=num_partitions)


def _doc_token_rows(batch: pa.Table) -> pa.Table:
    """→ (doc_id, token, c) whitespace-token frequency rows, complete
    in-batch (a row is a whole document) — the map-side partial for
    vocabulary-keyed statistics.  Id column passes through typed."""
    from collections import Counter

    ids = batch.column("doc_id")
    out_tok: list = []
    out_c: list = []
    take: list = []
    for i, t in enumerate(batch.column("text").to_pylist()):
        c = Counter(_WS_SPLIT.findall((t or "").lower()))
        for tok in sorted(c):
            out_tok.append(tok)
            out_c.append(c[tok])
            take.append(i)
    return pa.table({
        "doc_id": ids.take(pa.array(take, pa.int64())),
        "token": pa.array(out_tok, pa.string()),
        "c": pa.array(out_c, pa.int64()),
    })


def rare_token_stats(ds, min_count: int = 2, num_partitions: int = 32):
    """Corpus-vocabulary quality signal (the CCNet / Gopher filter
    family's "rare word" ratio): per document, how many token
    OCCURRENCES belong to tokens whose WHOLE-CORPUS frequency is
    below ``min_count`` — garbage, OCR noise and misspellings
    concentrate in corpus-hapax vocabulary.  → Dataset(doc_id,
    n_tokens, n_rare); every doc appears (n_rare = 0 when clean), so
    a filter/threshold composes downstream.

    Shuffle inventory (the 100 TB shape):
      1. (doc, token, c) rows are map-side complete (a row is a whole
         doc) and — like :func:`tfidf_top_terms`'s tf side — feed two
         consumers lazily; re-tokenizing beats materializing a
         token-count-sized intermediate.
      2. corpus counts: ONE token-keyed ``Sum`` shuffle of the
         per-doc partials (never raw occurrences).
      3. the rare vocabulary is filtered from those counts
         (∝ distinct tokens, skew-free by construction — rare means
         count < min_count) and semi-joined back on token.
      4. final combine: the surviving rows (bounded by rare volume,
         reshaped to (doc, 0, c) partials) UNION the shuffle-free
         per-doc totals (doc, n_tokens, 0), folded by ONE doc-keyed
         ``Sum`` — no join, every doc appears.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .joins import hash_join

    rows = ds.map_batches(_doc_token_rows, batch_format="pyarrow")
    counts = (rows.select_columns(["token", "c"])
              .groupby("token").aggregate(Sum("c", alias_name="n")))

    def only_rare(b: pa.Table) -> pa.Table:
        return (b.filter(pc.less(b.column("n"), min_count))
                .select(["token"]))

    rare = counts.map_batches(only_rare, batch_format="pyarrow")

    def as_rare_partial(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.nulls(b.num_rows, pa.int64()).fill_null(0),
            "n_rare": b.column("c")})

    # static schema hints: the rare side is filtered off a groupby
    # aggregate whose plan-time schema probe would re-run the whole
    # token-count shuffle (and return None on an all-empty corpus —
    # which must yield (doc, n, 0) rows, not crash)
    from .joins import _pa_type
    sch = ds.schema()
    id_type = _pa_type(sch.types[sch.names.index("doc_id")])
    rare_part = (hash_join(rows, rare, on="token", how="semi",
                           num_partitions=num_partitions,
                           left_schema=pa.schema([
                               ("doc_id", id_type),
                               ("token", pa.string()),
                               ("c", pa.int64())]),
                           right_schema=pa.schema([
                               ("token", pa.string())]))
                 .map_batches(as_rare_partial, batch_format="pyarrow"))

    def totals(b: pa.Table) -> pa.Table:
        n = [len(_WS_SPLIT.findall((t or "").lower()))
             for t in b.column("text").to_pylist()]
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(n, pa.int64()),
            "n_rare": pa.nulls(b.num_rows, pa.int64()).fill_null(0)})

    return (ds.map_batches(totals, batch_format="pyarrow")
            .union(rare_part)
            .groupby("doc_id")
            .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                       Sum("n_rare", alias_name="n_rare")))


def replace_composites(text: str) -> str:
    """X2 analog surface (integrator.py:39-43): sentinel → composite."""
    from ..html.tokenizer import COMPOSITE, COMPOSITE_SENTINEL

    return text.replace(COMPOSITE_SENTINEL, COMPOSITE)


# PII scrubbing (C4/CCNet-style curation): ASCII-only classes so the
# Python and RE2 scans are identical (ASCII TWIN RULE); emails are
# redacted FIRST, then 7+-digit runs on the email-redacted text (an
# email's digits must not double-count)
_EMAIL_RE = re.compile(
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_LONG_DIGITS_RE = re.compile(r"[0-9]{7,}")


def redact(text: str) -> str:
    """The ORDER-SENSITIVE redaction composition (emails first, so an
    email's digits never double-count) in one shared place — the
    batch operator and the curate-v2 pipeline both call this, keeping
    every Python site in lockstep with the nested-regexp SQL twins."""
    return _LONG_DIGITS_RE.sub(
        "<DIGITS>", _EMAIL_RE.sub("<EMAIL>", text or ""))


def redact_pii_batch(batch: pa.Table) -> pa.Table:
    """→ (doc_id, n_emails, n_digit_runs, redacted_text): emails →
    '<EMAIL>', 7+-digit runs → '<DIGITS>'.  Exact SQL twin: nested
    regexp_replace(..., 'g') + len(regexp_extract_all(...))."""
    texts = batch.column("text").to_pylist()
    n_em, n_dg, red = [], [], []
    for t in texts:
        t = t or ""
        n_em.append(len(_EMAIL_RE.findall(t)))
        step = _EMAIL_RE.sub("<EMAIL>", t)
        n_dg.append(len(_LONG_DIGITS_RE.findall(step)))
        red.append(_LONG_DIGITS_RE.sub("<DIGITS>", step))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_emails": pa.array(n_em, pa.int64()),
        "n_digit_runs": pa.array(n_dg, pa.int64()),
        "redacted_text": pa.array(red, pa.string()),
    })


_TERMINAL_RE = re.compile(r'[.!?"]$')
_WORD_RE = re.compile(r"[a-z0-9]+")


def line_filter_batch(batch: pa.Table) -> pa.Table:
    """C4-style line filter: keep non-empty lines that end in terminal
    punctuation (. ! ? \") AND have >= 3 whitespace tokens; emit the
    cleaned text (kept lines rejoined with '\\n') plus counts.  Exact
    SQL twin: string_split + list_filter(regexp_matches ... AND
    len(regexp_extract_all ...) >= 3) + array_to_string."""
    texts = batch.column("text").to_pylist()
    n_lines_out, n_kept_out, clean = [], [], []
    for t in texts:
        lines = [ln for ln in (t or "").split("\n") if ln != ""]
        kept = [ln for ln in lines
                if _TERMINAL_RE.search(ln)
                and len(_WS_SPLIT.findall(ln)) >= 3]
        n_lines_out.append(len(lines))
        n_kept_out.append(len(kept))
        clean.append("\n".join(kept))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_lines": pa.array(n_lines_out, pa.int64()),
        "n_kept": pa.array(n_kept_out, pa.int64()),
        "clean_text": pa.array(clean, pa.string()),
    })


def bigram_repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signal #2: count of the most frequent
    word 2-gram and its share of all bigram occurrences (permille).
    Words = lowercase [a-z0-9]+ runs; total bigrams = n_words - 1.
    SQL twin: lateral UNNEST(generate_series) over the word list."""
    from collections import Counter

    texts = batch.column("text").to_pylist()
    top_out, pm_out = [], []
    for t in texts:
        w = _WORD_RE.findall((t or "").lower())
        if len(w) >= 2:
            c = Counter(zip(w, w[1:]))
            top = max(c.values())
            total = len(w) - 1
            top_out.append(top)
            pm_out.append((top * 1000) // total)
        else:
            top_out.append(0)
            pm_out.append(0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "top_bigram_count": pa.array(top_out, pa.int64()),
        "top_bigram_permille": pa.array(pm_out, pa.int64()),
    })


def dup_line_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signal: share of non-empty line
    occurrences that duplicate an earlier line (integer permille).
    Lines split on '\\n' exactly; SQL twin uses string_split +
    list_distinct over the same contract."""
    texts = batch.column("text").to_pylist()
    n_lines_out, dup_pm = [], []
    for t in texts:
        lines = [ln for ln in (t or "").split("\n") if ln != ""]
        n = len(lines)
        dup = n - len(set(lines))
        n_lines_out.append(n)
        dup_pm.append((dup * 1000) // n if n else 0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_lines": pa.array(n_lines_out, pa.int64()),
        "dup_line_permille": pa.array(dup_pm, pa.int64()),
    })


# --- reference-LM surprise (CCNet's KenLM quality step, quantized) --------

#: Bounded-small-side contract for the broadcast LM (same class as
#: dedup.benchmark_gram_ref): a reference LM is vocabulary-sized —
#: CCNet's per-language KenLM artifacts are single-digit GB for the
#: whole of Wikipedia.  Raise rather than silently broadcast an
#: unbounded table.
MAX_LM_ENTRIES = 50_000_000


def bigram_lm_ref(ref_ds, col: str = "text",
                  max_entries: int = MAX_LM_ENTRIES):
    """Reference slice → ray.put'd integer add-one bigram LM: sorted
    unigram / bigram key arrays with aligned counts plus the unigram
    vocabulary size V.  The CCNet quality-scoring shape (Wenzek et
    al. 2020: score corpus docs under a CLEAN reference LM), with the
    LM kept integer-exact so the scorer and its SQL twin can never
    drift by a float ulp.

    Scale shape: per-batch partial ``Counter`` rows → ONE token-keyed
    ``Sum`` per order (shuffle ∝ reference vocabulary, never raw
    occurrences) → driver collect of the vocabulary-sized result
    (bounded by contract, guarded) → ``ray.put`` ONCE; corpus text
    never moves.  Bigram keys are ``"w1 w2"`` — unambiguous because
    tokens are whitespace-split."""
    import ray
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        from collections import Counter
        uc: Counter = Counter()
        bc: Counter = Counter()
        for t in b.column(col).to_pylist():
            toks = _WS_SPLIT.findall((t or "").lower())
            uc.update(toks)
            bc.update(a + " " + z for a, z in zip(toks, toks[1:]))
        keys = list(uc) + list(bc)
        return pa.table({
            "k": pa.array(keys, pa.string()),
            "o": pa.array([0] * len(uc) + [1] * len(bc), pa.int8()),
            "c": pa.array([uc[k] for k in uc] + [bc[k] for k in bc],
                          pa.int64())})

    rows = (ref_ds.select_columns([col])
            .map_batches(partials, batch_format="pyarrow")
            .groupby(["o", "k"]).aggregate(Sum("c", alias_name="c"))
            .take_all())
    if len(rows) > max_entries:
        raise ValueError(
            f"reference LM has {len(rows)} entries > max_entries="
            f"{max_entries}; pass a bounded reference slice "
            "(the LM side must be vocabulary-sized, not corpus-sized)")

    def pack(order: int):
        ks = np.asarray([r["k"] for r in rows if r["o"] == order])
        cs = np.asarray([r["c"] for r in rows if r["o"] == order],
                        dtype=np.int64)
        if ks.size:
            srt = np.argsort(ks)
            return ks[srt], cs[srt]
        return ks, cs

    uk, ucnt = pack(0)
    bk, bcnt = pack(1)
    return ray.put((uk, ucnt, bk, bcnt, int(uk.size)))


def _sorted_lookup(keys: np.ndarray, counts: np.ndarray,
                   q: np.ndarray) -> np.ndarray:
    """counts[q] with 0 on miss — one vectorized searchsorted."""
    if keys.size == 0:
        return np.zeros(q.size, np.int64)
    pos = np.searchsorted(keys, q)
    pos[pos == keys.size] = 0
    out = counts[pos].copy()
    out[keys[pos] != q] = 0
    return out


def _bitlen(x: np.ndarray) -> np.ndarray:
    """Binary-digit count of nonnegative int64 — integer-EXACT via
    frexp (x < 2^53 converts to float64 losslessly), matching the SQL
    twin's ``length(printf('%b', x))`` — including bitlen(0) == 1
    (printf renders 0 as '0'), reachable only with an EMPTY reference
    slice (V = 0, unseen w1)."""
    return np.maximum(
        np.frexp(x.astype(np.float64))[1].astype(np.int64), 1)


def lm_surprise_stats(ds, lm_ref, col: str = "text",
                      id_col: str = "doc_id"):
    """→ Dataset(doc_id, n_pairs, surprise_bits, oov_pairs): per-doc
    cross-entropy under the broadcast add-one bigram reference LM,
    quantized to WHOLE BITS so it is integer-exact end to end:

        surprise_bits = Σ_pairs  bitlen(c1(w1) + V) − bitlen(c2(w1,w2) + 1)

    i.e. Σ −floor-log2 of the Laplace probability (c2+1)/(c1+V) —
    the CCNet head/middle/tail quality signal without a float log
    anywhere (a float Σlog is order-dependent across engines and can
    never hash-match an oracle).  ``oov_pairs`` counts pairs unseen
    in the reference.  Every doc appears; < 2 tokens → (0, 0, 0).

    Pure streaming map: the LM arrives via the object store
    (zero-copy numpy views per task); per batch, ALL docs' pairs are
    scored with two searchsorted lookups + one bincount fold — no
    per-pair Python."""
    import ray

    def f(b: pa.Table) -> pa.Table:
        uk, ucnt, bk, bcnt, v = ray.get(lm_ref)  # local object store
        w1l, w2l, npair = [], [], []
        for t in b.column(col).to_pylist():
            toks = _WS_SPLIT.findall((t or "").lower())
            m = max(len(toks) - 1, 0)
            npair.append(m)
            if m:
                w1l.extend(toks[:-1])
                w2l.extend(toks[1:])
        n_docs = b.num_rows
        npair_a = np.asarray(npair, dtype=np.int64)
        if w1l:
            w1 = np.asarray(w1l)
            w2 = np.asarray(w2l)
            c1 = _sorted_lookup(uk, ucnt, w1)
            c2 = _sorted_lookup(bk, bcnt, np.char.add(
                np.char.add(w1, " "), w2))
            bits = _bitlen(c1 + v) - _bitlen(c2 + 1)
            doc_ix = np.repeat(np.arange(n_docs), npair_a)
            # float64 bincount sums stay exact far below 2^53
            surprise = np.bincount(doc_ix, weights=bits,
                                   minlength=n_docs).astype(np.int64)
            oov = np.bincount(doc_ix[c2 == 0],
                              minlength=n_docs).astype(np.int64)
        else:
            surprise = np.zeros(n_docs, np.int64)
            oov = np.zeros(n_docs, np.int64)
        return pa.table({
            id_col: b.column(id_col),
            "n_pairs": pa.array(npair_a, pa.int64()),
            "surprise_bits": pa.array(surprise, pa.int64()),
            "oov_pairs": pa.array(oov, pa.int64())})

    return ds.select_columns([id_col, col]).map_batches(
        f, batch_format="pyarrow")


def lm_quality_buckets(stats_ds, id_col: str = "doc_id"):
    """→ Dataset(doc_id, mean_millibits, bucket): the CCNet
    head/middle/tail corpus split (Wenzek et al. 2020 §4.4 — docs
    bucketed by perplexity under the reference LM into thirds, head =
    lowest surprise = cleanest).  Input is :func:`lm_surprise_stats`
    output; docs with no bigram pair (< 2 tokens) are unscoreable and
    are excluded, matching CCNet's behavior.

    Integer-exact semantics (so the SQL twin hash-matches):
    ``mean_millibits = surprise_bits * 1000 // n_pairs`` (both
    nonnegative, so floor == truncate), and thresholds are VALUE
    cutoffs, not rank splits: t1 = min value v with
    3·|{mean ≤ v}| ≥ n, t2 = likewise for 2n; head = mean ≤ t1,
    middle = mean ≤ t2, tail = rest.  Ties at a boundary all land on
    the lower bucket — deterministic regardless of partitioning,
    unlike ntile-over-global-sort.

    Scale shape: the (id, mean) projection — 16 B/doc, text and
    counts already dropped — is materialized once so the histogram
    pass and the assign pass don't re-run upstream scoring; the
    threshold histogram is a value-counts groupby whose size is
    bounded by the value DOMAIN (mean_millibits ≤ 1000 × 64 bits →
    ≤ 64,001 distinct values, never ∝ corpus), collected once on the
    driver; assignment is one pure map over two broadcast ints.  No
    global sort anywhere."""
    def mean_map(b: pa.Table) -> pa.Table:
        npair = np.asarray(b.column("n_pairs"), dtype=np.int64)
        bits = np.asarray(b.column("surprise_bits"), dtype=np.int64)
        mask = npair > 0
        ids = np.asarray(b.column(id_col), dtype=np.int64)[mask]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "mean_millibits": pa.array(
                bits[mask] * 1000 // npair[mask], pa.int64())})

    scored = stats_ds.map_batches(
        mean_map, batch_format="pyarrow").materialize()

    hist = scored.groupby("mean_millibits").count().take_all()
    if not hist:
        # typed empty with the FULL output schema (no scoreable doc)
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "mean_millibits": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.string())}))
    vals = np.asarray([r["mean_millibits"] for r in hist],
                      dtype=np.int64)
    cnts = np.asarray([r["count()"] for r in hist], dtype=np.int64)
    srt = np.argsort(vals)
    vals, cum = vals[srt], np.cumsum(cnts[srt])
    n = int(cum[-1])
    t1 = int(vals[np.searchsorted(3 * cum, n)])
    t2 = int(vals[np.searchsorted(3 * cum, 2 * n)])

    def assign(b: pa.Table) -> pa.Table:
        mb = np.asarray(b.column("mean_millibits"), dtype=np.int64)
        lab = np.where(mb <= t1, "head",
                       np.where(mb <= t2, "middle", "tail"))
        return b.append_column("bucket", pa.array(lab, pa.string()))

    return scored.map_batches(assign, batch_format="pyarrow")


# --- DSIR hashed-n-gram importance resampling ------------------------------
# Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): features are unigram+bigram counts hashed into a
# fixed bucket domain; a doc's importance weight is its log
# likelihood-ratio between a TARGET (clean) bag-of-buckets model and
# the RAW-corpus model.  As with the LM-surprise family above, the
# log is quantized to whole bits via bit-length so the engine and the
# DuckDB twin are integer-exact:
#
#   weight_bits(d) = Σ_{gram occurrences g}
#       bitlen(c_tgt[h(g)] + 1) − bitlen(c_raw[h(g)] + 1)
#
# i.e. Σ floor-log2 of the add-one count ratio (the two models'
# normalizers are per-gram constants, dropped — document selection
# compares docs of similar length by weight_bits / n_grams).
# h(gram) = first 8 md5 hex chars % DSIR_BUCKETS — the same md5 fold
# every sketch twin uses, so the SQL side replicates it verbatim.
DSIR_BUCKETS = 4096
_DSIR_CACHE: dict = {}
_DSIR_CACHE_CAP = 1 << 20


def _gram_buckets_many(grams: list, n_buckets: int) -> np.ndarray:
    """Vectorized md5 bucket per gram: cache lookups, then ONE
    digest-concat + numpy parse pass for the misses (the
    ``sketch._cms_buckets_many`` batching, unsalted).  The cache
    stores the RAW 32-bit value; ``% n_buckets`` applies at lookup."""
    import hashlib
    n = len(grams)
    raw = np.empty(n, dtype=np.int64)
    get = _DSIR_CACHE.get
    miss = []
    for i, g in enumerate(grams):
        hit = get(g)
        if hit is None:
            miss.append(i)
        else:
            raw[i] = hit
    if miss:
        md5 = hashlib.md5
        buf = b"".join([md5(grams[i].encode()).digest() for i in miss])
        d = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 16)
        # int(hexdigest[:8], 16) == first 4 digest bytes big-endian
        b = d[:, :4].copy().view(">u4").ravel().astype(np.int64)
        raw[miss] = b
        if len(_DSIR_CACHE) < _DSIR_CACHE_CAP:
            _DSIR_CACHE.update(zip((grams[i] for i in miss),
                                   b.tolist()))
    return raw % n_buckets


def _doc_gram_buckets(b: pa.Table, col: str,
                      n_buckets: int) -> tuple:
    """(bucket id per gram occurrence, doc index per occurrence,
    per-doc gram counts) for one batch — grams are lowercase
    whitespace unigrams plus space-joined bigrams.  Occurrence order
    is (all unigrams in doc order, then all bigrams in doc order);
    ``doc_ix`` carries the attribution explicitly, so consumers fold
    with bincount regardless of order.

    Hot-path shape: md5 runs only on the batch's DISTINCT grams —
    ``pd.factorize`` (hash-based, no sort) dedups the occurrence
    list at C speed and its codes fan the bucket ids back out.
    Measured on bench text (2,000 docs, 1.57M gram occurrences):
    tokenize 0.17 s + gram build 0.13 s + factorize 0.28 s + md5 of
    42k distinct 0.03 s — 2× the per-occurrence cache loop and 4× the
    ``np.char.add``/``np.unique`` string-array variant (U-dtype
    copies), both tried first."""
    import pandas as pd

    grams: list = []
    per_doc = np.empty(b.num_rows, dtype=np.int64)
    for i, t in enumerate(b.column(col).to_pylist()):
        toks = _WS_SPLIT.findall((t or "").lower())
        k = len(grams)
        grams.extend(toks)
        grams.extend(a + " " + z for a, z in zip(toks, toks[1:]))
        per_doc[i] = len(grams) - k
    doc_ix = np.repeat(np.arange(b.num_rows), per_doc)
    if not grams:
        return (np.empty(0, np.int64), doc_ix, per_doc)
    codes, uq = pd.factorize(np.asarray(grams, dtype=object),
                             sort=False)
    ub = _gram_buckets_many(list(uq), n_buckets)
    return ub[codes], doc_ix, per_doc


def hashed_gram_hist(ds, col: str = "text",
                     n_buckets: int = DSIR_BUCKETS) -> np.ndarray:
    """→ dense int64[n_buckets] occurrence histogram of the hashed
    grams of ``col`` — one bag-of-buckets model side for DSIR.

    Scale shape: per-batch ``bincount`` partials (≤ n_buckets rows per
    block regardless of token count) → ONE bucket-keyed Sum → driver
    collect of ≤ n_buckets rows.  Shuffle and driver cost are bounded
    by the bucket DOMAIN, never the corpus."""
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        bkts, _, _ = _doc_gram_buckets(b, col, n_buckets)
        s = np.bincount(bkts, minlength=n_buckets)
        nz = np.flatnonzero(s)
        return pa.table({"b": pa.array(nz, pa.int64()),
                         "c": pa.array(s[nz], pa.int64())})

    out = np.zeros(n_buckets, dtype=np.int64)
    for r in (ds.select_columns([col])
              .map_batches(partials, batch_format="pyarrow")
              .groupby("b").aggregate(Sum("c", alias_name="c"))
              .take_all()):  # ≤ n_buckets rows by construction
        out[r["b"]] = r["c"]
    return out


def dsir_models(ds, tgt_mask_fn, col: str = "text",
                id_col: str = "doc_id",
                n_buckets: int = DSIR_BUCKETS) -> tuple:
    """→ (target_hist, raw_hist) in ONE corpus pass: every batch
    folds its gram buckets twice (all docs, and the
    ``tgt_mask_fn(batch)`` subset) into ≤ n_buckets partial rows with
    two count columns, combined by a single bucket-keyed Sum.  Halves
    the model-build wall vs two :func:`hashed_gram_hist` passes —
    each pass is read+tokenize bound, and the raw pass re-reads the
    target docs anyway (the target is a subset of the corpus)."""
    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        bkts, doc_ix, _ = _doc_gram_buckets(b, col, n_buckets)
        m = np.asarray(tgt_mask_fn(b), dtype=bool)
        cr = np.bincount(bkts, minlength=n_buckets)
        ct = np.bincount(bkts[m[doc_ix]], minlength=n_buckets)
        nz = np.flatnonzero(cr)
        return pa.table({"b": pa.array(nz, pa.int64()),
                         "cr": pa.array(cr[nz], pa.int64()),
                         "ct": pa.array(ct[nz], pa.int64())})

    ct = np.zeros(n_buckets, dtype=np.int64)
    cr = np.zeros(n_buckets, dtype=np.int64)
    for r in (ds.select_columns([id_col, col])
              .map_batches(partials, batch_format="pyarrow")
              .groupby("b").aggregate(Sum("cr", alias_name="cr"),
                                      Sum("ct", alias_name="ct"))
              .take_all()):  # ≤ n_buckets rows by construction
        cr[r["b"]] = r["cr"]
        ct[r["b"]] = r["ct"]
    return ct, cr


def dsir_weight_stats(ds, models_ref, col: str = "text",
                      id_col: str = "doc_id",
                      n_buckets: int = DSIR_BUCKETS):
    """→ Dataset(doc_id, n_grams, weight_bits): per-doc DSIR
    importance weight in whole bits under the broadcast
    (target_hist, raw_hist) pair (``models_ref`` = ``ray.put((ct,
    cr))``; each side from :func:`hashed_gram_hist`).  Every doc
    appears (0 grams → weight 0).  Pure streaming map: two histogram
    gathers + one bincount fold per batch — corpus text never
    shuffles, the models ride the object store once per actor."""
    import ray

    def f(b: pa.Table) -> pa.Table:
        ct, cr = ray.get(models_ref)
        bkts, doc_ix, per_doc = _doc_gram_buckets(b, col, n_buckets)
        if bkts.size:
            bits = _bitlen(ct[bkts] + 1) - _bitlen(cr[bkts] + 1)
            # float64 bincount sums stay exact far below 2^53
            w = np.bincount(doc_ix, weights=bits,
                            minlength=b.num_rows).astype(np.int64)
        else:
            w = np.zeros(b.num_rows, np.int64)
        return pa.table({
            id_col: b.column(id_col),
            "n_grams": pa.array(per_doc, pa.int64()),
            "weight_bits": pa.array(w, pa.int64())})

    return ds.select_columns([id_col, col]).map_batches(
        f, batch_format="pyarrow")


# --- Gopher quality filter --------------------------------------------------
# The Gopher rule set (Rae et al. 2021, Appendix A1.1) as ONE
# integer-exact composite: every threshold is rewritten as a
# cross-multiplied integer comparison (10·sym > words, not
# sym/words > 0.1) so the engine and the SQL twin cannot drift by a
# float ulp.  fail_flags is a bitmask (bit set = rule FAILED):
#   bit 0  word count outside [50, 100_000]
#   bit 1  mean word length outside [3, 10]   (only when words > 0)
#   bit 2  symbol-to-word ratio > 0.1         ('#' chars + '...' runs)
#   bit 3  > 90% of lines start with a bullet (^[ \t]*[-*][ \t])
#   bit 4  > 30% of lines end with an ellipsis (\.\.\.[ \t]*$)
#   bit 5  < 80% of words contain an alphabetic char (words > 0)
#   bit 6  < 2 distinct stopwords of the 8-set present as tokens
# keep = 1 iff fail_flags == 0.  All patterns are ASCII-explicit so
# Python re and DuckDB RE2 count identically (the _WS_SPLIT rule).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and",
                    "that", "have", "with")
_ALPHA = re.compile(r"[A-Za-z]")
_ELLIPSIS = re.compile(r"\.\.\.")
_BULLET_LINE = re.compile(r"(?m)^[ \t]*[-*][ \t]")
_ELLIPSIS_LINE = re.compile(r"(?m)\.\.\.[ \t]*$")


def gopher_filter_batch(batch: pa.Table) -> pa.Table:
    """→ (doc_id, n_words, fail_flags, keep) — the Gopher document
    filter verdict per doc (rule law above).  Pure stats map."""
    stop_set = set(GOPHER_STOPWORDS)
    ids = batch.column("doc_id")
    n_words_l, flags_l = [], []
    for t in batch.column("text").to_pylist():
        t = t or ""
        toks = _WS_SPLIT.findall(t)
        n = len(toks)
        chars = sum(len(w) for w in toks)
        n_alpha = sum(1 for w in toks if _ALPHA.search(w))
        n_stop = len(stop_set.intersection(w.lower() for w in toks))
        sym = t.count("#") + len(_ELLIPSIS.findall(t))
        n_lines = t.count("\n") + 1
        bullets = len(_BULLET_LINE.findall(t))
        ell_lines = len(_ELLIPSIS_LINE.findall(t))
        f = 0
        if n < 50 or n > 100_000:
            f |= 1
        if n > 0 and (chars < 3 * n or chars > 10 * n):
            f |= 2
        if 10 * sym > n:
            f |= 4
        if 10 * bullets > 9 * n_lines:
            f |= 8
        if 10 * ell_lines > 3 * n_lines:
            f |= 16
        if n > 0 and 5 * n_alpha < 4 * n:
            f |= 32
        if n_stop < 2:
            f |= 64
        n_words_l.append(n)
        flags_l.append(f)
    flags = np.asarray(flags_l, dtype=np.int64)
    return pa.table({
        "doc_id": ids,
        "n_words": pa.array(n_words_l, pa.int64()),
        "fail_flags": pa.array(flags, pa.int64()),
        "keep": pa.array((flags == 0).astype(np.int64), pa.int64())})


# --- C4 page filter ----------------------------------------------------------
# The C4 cleaning heuristics (Raffel et al. 2020 §2.2, the public
# c4_utils rule set) as one integer-exact composite over the raw doc:
#   line kept iff (after trimming [ \t\r]) it is non-empty, ends in a
#   terminal mark (. ! ? "), has ≥ 5 whitespace tokens, and does not
#   contain "javascript" (case-insensitive);
#   page fail_flags (bit set = rule FAILED):
#     bit 0  kept text has < 3 sentences (sentence ≈ count of [.!?] —
#            deterministic regex stand-in for the paper's nltk punkt,
#            which is not in this sandbox; documented deviation)
#     bit 1  raw page contains "lorem ipsum" (case-insensitive)
#     bit 2  raw page contains "{"
#     bit 3  raw page matches the badword list (word-boundary,
#            case-insensitive; C4_BADWORDS is a short representative
#            stand-in for the full LDNOOBW list — pluggable)
#   keep = 1 iff fail_flags == 0.  Every pattern is ASCII-explicit so
# Python re and DuckDB RE2 count identically (the _WS_SPLIT rule).
C4_BADWORDS = ("viagra", "casino", "xxx", "porn")
C4_MIN_WORDS_PER_LINE = 5
C4_MIN_SENTENCES = 3
_C4_TERMINAL = re.compile(r'[.!?"]$')
_C4_SENTENCE = re.compile(r"[.!?]")
# re.ASCII: RE2's \b is ASCII-only — without the flag Python's
# unicode \b diverges on words abutting non-ASCII letters
# ('xxxé': unicode \b says no boundary, RE2 says boundary)
_C4_BADWORD_RE = re.compile(r"\b(?:" + "|".join(C4_BADWORDS) + r")\b",
                            re.ASCII)


def c4_page_filter_batch(batch: pa.Table) -> pa.Table:
    """→ (doc_id, n_lines, n_kept, n_sentences, kept_chars,
    fail_flags, keep) — the C4 page-filter verdict per doc (rule law
    above).  Pure stats map; pairs with :func:`line_filter_batch`
    (which emits the cleaned text) and :func:`gopher_filter_batch`
    (the Gopher suite) as the published-filter family."""
    ids = batch.column("doc_id")
    n_lines_l, n_kept_l, n_sent_l, chars_l, flags_l = [], [], [], [], []
    for t in batch.column("text").to_pylist():
        t = t or ""
        low = t.lower()
        lines = [s for s in
                 (ln.strip(" \t\r") for ln in t.split("\n")) if s]
        kept = [ln for ln in lines
                if _C4_TERMINAL.search(ln)
                and len(_WS_SPLIT.findall(ln)) >= C4_MIN_WORDS_PER_LINE
                and "javascript" not in ln.lower()]
        kt = "\n".join(kept)
        n_sent = len(_C4_SENTENCE.findall(kt))
        f = 0
        if n_sent < C4_MIN_SENTENCES:
            f |= 1
        if "lorem ipsum" in low:
            f |= 2
        if "{" in t:
            f |= 4
        if _C4_BADWORD_RE.search(low):
            f |= 8
        n_lines_l.append(len(lines))
        n_kept_l.append(len(kept))
        n_sent_l.append(n_sent)
        chars_l.append(len(kt))
        flags_l.append(f)
    flags = np.asarray(flags_l, dtype=np.int64)
    return pa.table({
        "doc_id": ids,
        "n_lines": pa.array(n_lines_l, pa.int64()),
        "n_kept": pa.array(n_kept_l, pa.int64()),
        "n_sentences": pa.array(n_sent_l, pa.int64()),
        "kept_chars": pa.array(chars_l, pa.int64()),
        "fail_flags": pa.array(flags, pa.int64()),
        "keep": pa.array((flags == 0).astype(np.int64), pa.int64())})


# --- Gopher repetition filter -------------------------------------------------
# The 13 repetition rules of Gopher (Rae et al. 2021, Appendix A1.2,
# Table A1) as one integer-exact composite — the within-doc-repetition
# half of the published-filter family (:func:`gopher_filter_batch` is
# the quality half).  Every threshold is a cross-multiplied integer
# comparison (lhs·100 > rhs·k, never a float ratio) so the DuckDB twin
# is hash-exact.  Exact semantics (documented where they pin down what
# the paper leaves open):
#   lines  = text.split("\n") minus empties (no trim);
#   paras  = re.split("\n{2,}") minus empties;
#   a DUPLICATE element is any occurrence beyond the first, so
#   dup_elems = n - n_distinct and dup_chars = (chars of all
#   occurrences) - (chars of distinct values);
#   words  = _WS_SPLIT (ASCII whitespace — the twin rule);
#   n-gram = " ".join(words[i:i+n]);
#   top-n-gram chars = max over distinct n-grams with count ≥ 2 of
#   count·len (0 if nothing repeats — a singleton n-gram is not a
#   repetition, and without the ≥2 gate every short clean doc fails
#   the 3/4-gram rules because one n-gram trivially covers >16 % of a
#   one-line text; the max-of-product form makes ties irrelevant);
#   dup-n-gram chars = sum over n-grams with count ≥ 2 of count·len —
#   ALL occurrences of any duplicated n-gram ("characters contained
#   within duplicate n-grams"), overlap-NAIVE: the paper's
#   count-each-character-once coverage union is order-dependent and
#   not SQL-expressible; this deterministic variant upper-bounds it
#   and is monotone in the same repetition signal (documented
#   deviation, like the c4 sentence regex);
#   every char-fraction denominator is len(text) in codepoints
#   (Python len == DuckDB length), and comparisons are multiplicative
#   so empty docs pass all 13 rules without a division guard.
# fail_flags bits (set = rule FAILED, i.e. fraction EXCEEDS threshold):
#   0  dup line fraction            > 0.30
#   1  dup paragraph fraction       > 0.30
#   2  dup line char fraction       > 0.20
#   3  dup paragraph char fraction  > 0.20
#   4  top 2-gram char fraction     > 0.20
#   5  top 3-gram char fraction     > 0.18
#   6  top 4-gram char fraction     > 0.16
#   7  dup 5-gram char fraction     > 0.15
#   8  dup 6-gram char fraction     > 0.14
#   9  dup 7-gram char fraction     > 0.13
#   10 dup 8-gram char fraction     > 0.12
#   11 dup 9-gram char fraction     > 0.11
#   12 dup 10-gram char fraction    > 0.10
GOPHER_TOP_NGRAM = ((2, 20), (3, 18), (4, 16))          # (n, pct·100)
GOPHER_DUP_NGRAM = ((5, 15), (6, 14), (7, 13),
                    (8, 12), (9, 11), (10, 10))
_PARA_SPLIT = re.compile(r"\n{2,}")


def _dup_stats(elems: list) -> tuple:
    """(dup_elems, dup_chars): occurrences beyond the first, and
    their total characters (all-chars minus distinct-chars)."""
    seen = set()
    dup_e = dup_c = 0
    for e in elems:
        if e in seen:
            dup_e += 1
            dup_c += len(e)
        else:
            seen.add(e)
    return dup_e, dup_c


def gopher_repetition_batch(batch: pa.Table) -> pa.Table:
    """→ (doc_id, n_lines, n_paras, dup_lines, dup_paras,
    dup_line_chars, dup_para_chars, fail_flags, keep) — the Gopher
    A1.2 repetition-filter verdict per doc (rule law above; the nine
    n-gram statistics fold into ``fail_flags`` only).  Pure stats
    map."""
    ids = batch.column("doc_id")
    out = {k: [] for k in ("n_lines", "n_paras", "dup_lines",
                           "dup_paras", "dup_line_chars",
                           "dup_para_chars", "fail_flags")}
    for t in batch.column("text").to_pylist():
        t = t or ""
        total = len(t)
        lines = [x for x in t.split("\n") if x]
        paras = [x for x in _PARA_SPLIT.split(t) if x]
        dl, dlc = _dup_stats(lines)
        dp, dpc = _dup_stats(paras)
        f = 0
        if dl * 10 > len(lines) * 3:
            f |= 1
        if dp * 10 > len(paras) * 3:
            f |= 2
        if dlc * 5 > total:
            f |= 4
        if dpc * 5 > total:
            f |= 8
        words = _WS_SPLIT.findall(t)
        bit = 16
        for n, pct in GOPHER_TOP_NGRAM:
            c = Counter(" ".join(words[i:i + n])
                        for i in range(len(words) - n + 1))
            top = max((v * len(g) for g, v in c.items() if v >= 2),
                      default=0)
            if top * 100 > total * pct:
                f |= bit
            bit <<= 1
        for n, pct in GOPHER_DUP_NGRAM:
            c = Counter(" ".join(words[i:i + n])
                        for i in range(len(words) - n + 1))
            dup = sum(v * len(g) for g, v in c.items() if v >= 2)
            if dup * 100 > total * pct:
                f |= bit
            bit <<= 1
        out["n_lines"].append(len(lines))
        out["n_paras"].append(len(paras))
        out["dup_lines"].append(dl)
        out["dup_paras"].append(dp)
        out["dup_line_chars"].append(dlc)
        out["dup_para_chars"].append(dpc)
        out["fail_flags"].append(f)
    flags = np.asarray(out["fail_flags"], dtype=np.int64)
    cols = {"doc_id": ids}
    cols.update({k: pa.array(v, pa.int64()) for k, v in out.items()})
    cols["keep"] = pa.array((flags == 0).astype(np.int64), pa.int64())
    return pa.table(cols)


# --- vocabulary drift (corpus QA between snapshots / slices) -----------------

def _vocab_partials(side: int):
    """Per-batch (token, n_a, n_b) partial counts with the side's
    column populated — the dsir_models side-flag shape, vocabulary-
    keyed so REAL tokens (not hash buckets) survive to the report."""
    def f(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(_WORD_RE.findall((t or "").lower()))
        items = sorted(c.items())
        n = [v for _, v in items]
        z = [0] * len(items)
        return pa.table({
            "token": pa.array([k for k, _ in items], pa.string()),
            "n_a": pa.array(n if side == 0 else z, pa.int64()),
            "n_b": pa.array(z if side == 0 else n, pa.int64()),
        })
    return f


def vocab_drift(ds_a, ds_b, k: int = 20, min_total: int = 5):
    """Token-distribution drift between two corpus slices (snapshot
    A vs snapshot B, or source X vs source Y) — the corpus-QA report
    a crawl team reads after every refresh: which words surged,
    which vanished.

    → pandas DataFrame(token, n_a, n_b, shift_bits, rank), the
    top-``k`` tokens by |shift| (ties → token asc), where
    ``shift_bits = bitlen(n_a+1) − bitlen(n_b+1)`` — the whole-bit
    integer log-ratio (the DSIR/LM-surprise quantization, so the
    DuckDB twin ``length(printf('%b', …))`` is hash-exact).
    ``min_total`` prunes noise vocabulary (n_a + n_b below it).

    Scale shape: one streaming pass per side emits per-batch partial
    Counters → ONE token-keyed Sum over the union (shuffle ∝
    VOCABULARY, never occurrences — the bpe/word_freq convention) →
    pure shift map → tree-combined top-k.  No global sort; text
    never shuffles."""
    from ray.data.aggregate import Sum

    from .topk import topk

    both = (ds_a.map_batches(_vocab_partials(0),
                             batch_format="pyarrow")
            .union(ds_b.map_batches(_vocab_partials(1),
                                    batch_format="pyarrow"))
            .groupby("token")
            .aggregate(Sum("n_a", alias_name="n_a"),
                       Sum("n_b", alias_name="n_b")))

    def shift(b: pa.Table) -> pa.Table:
        na = np.asarray(b.column("n_a"), dtype=np.int64)
        nb = np.asarray(b.column("n_b"), dtype=np.int64)
        m = (na + nb) >= min_total
        na, nb = na[m], nb[m]
        s = _bitlen(na + 1) - _bitlen(nb + 1)
        return pa.table({
            "token": b.column("token").filter(pa.array(m)),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64()),
            "shift_bits": pa.array(s, pa.int64()),
            "abs_shift": pa.array(np.abs(s), pa.int64()),
        })

    out = topk(both.map_batches(shift, batch_format="pyarrow"),
               "abs_shift", k, descending=True, tie_cols=("token",))
    out = out.drop(columns=["abs_shift"]).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out


def lang_confusion(ds, num_partitions: int = 8):
    """→ Dataset(lang, lang_pred, n_docs) — the declared-vs-predicted
    language confusion matrix, the corpus-QA report that surfaces
    mislabeled slices (a crawl whose 'en' partition is 30% predicted
    'de' has a labeling problem upstream).  Prediction = the pinned
    :func:`lang_id` rule.

    Scale shape: per-batch (lang, pred) pair counts fold map-side
    (Counter over the zip — ≤ |langs|² rows/block), then ONE
    pair-keyed Sum ∝ |langs|² — never the corpus."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        langs = b.column("lang").to_pylist()
        c: Counter = Counter()
        for lg, t in zip(langs, texts):
            c[(lg or "", lang_id(t))] += 1
        keys = sorted(c)
        return pa.table({
            "lang": pa.array([k[0] for k in keys], pa.string()),
            "lang_pred": pa.array([k[1] for k in keys], pa.string()),
            "n": pa.array([c[k] for k in keys], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["lang", "lang_pred"],
                     num_partitions=num_partitions)
            .aggregate(Sum("n", alias_name="n_docs")))
