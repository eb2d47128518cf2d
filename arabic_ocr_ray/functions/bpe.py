"""Distributed BPE vocabulary learning + subword encoding.

Byte-Pair-Encoding subword vocabularies (Sennrich, Haddow & Birch
2016, "Neural Machine Translation of Rare Words with Subword Units")
— the tokenizer-training step of every LLM data pipeline.

Scale shape (the 100 TB contract): the corpus contributes exactly ONE
pass — per-batch word Counters folded by a single token-keyed ``Sum``,
so the shuffle is proportional to the word-type VOCABULARY, never to
raw occurrences — and the merge loop runs on the driver over that
bounded word-type table.  This mirrors the reference implementations
(subword-nmt ``learn_bpe``, fastBPE): both learn from a word-frequency
dictionary, not from raw text, because pair statistics over word types
× frequencies are exactly the pair statistics over the corpus.
``max_word_types`` guards the driver table and ``min_word_freq``
prunes the hapax tail first (the standard mitigation; the documented
loss is merges supported only by pruned singleton words).

Encoding back over the corpus is a pure streaming map: the merge
table broadcasts once via ``ray.put`` and every actor keeps a
per-distinct-word cache (vocabulary-bounded), so the per-occurrence
cost is one dict hit.

No reference-repo analog (the reference's tokenizer is a fixed
template set, ``/root/reference/segment_words.py``); this operator
exists for the training-data pipeline family.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

END = "▁"  # end-of-word sentinel glued to a word's final char
MAX_WORD_TYPES = 50_000_000  # driver word-type table guard (~GBs)


def word_freq_table(ds, col: str = "text", min_word_freq: int = 1,
                    max_word_types: int = MAX_WORD_TYPES):
    """→ (words list[str], counts int64 array), the corpus word-type
    frequency dictionary.  ONE corpus pass: per-batch ``Counter``
    partials (map-side combine) → a single token-keyed ``Sum``.
    Case-sensitive whitespace tokens (BPE is learned on surface
    forms; casefolding is a corpus-prep decision, not the learner's).

    The aggregated table is vocabulary-sized; ``count()`` checks the
    guard BEFORE ``take_all`` so an over-budget corpus fails loudly
    instead of OOM-ing the driver."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in b.column(col).to_pylist():
            c.update((t or "").split())
        items = sorted(c.items())
        return pa.table({
            "w": pa.array([k for k, _ in items], pa.string()),
            "c": pa.array([v for _, v in items], pa.int64()),
        })

    agg = (ds.select_columns([col])
           .map_batches(partials, batch_format="pyarrow")
           .groupby("w").aggregate(Sum("c", alias_name="c")))
    if min_word_freq > 1:
        agg = agg.filter(
            expr=f"c >= {int(min_word_freq)}")
    n_types = agg.count()
    if n_types > max_word_types:
        raise ValueError(
            f"word-type table has {n_types} rows > max_word_types="
            f"{max_word_types}; raise min_word_freq (hapax pruning) "
            f"or the guard")
    words: list = []
    counts: list = []
    for r in agg.take_all():
        words.append(r["w"])
        counts.append(r["c"])
    return words, np.asarray(counts, dtype=np.int64)


def _symbolize(word: str) -> list:
    """chars of ``word`` with END glued to the final char — the
    Sennrich et al. word representation ('low' → l,o,w</w>)."""
    syms = list(word)
    syms[-1] = syms[-1] + END
    return syms


def learn_bpe(words, counts, num_merges: int,
              min_pair_freq: int = 2) -> list:
    """→ ordered merge list ``[(rank, left, right, freq), ...]``.

    Textbook BPE with the indexed incremental update (only words that
    contain the chosen pair are re-counted, via a pair → word-ids
    index), so cost is Σ|changed words| per merge, not |vocab| per
    merge.  Deterministic: ties on pair frequency break to the
    lexicographically smallest ``(left, right)`` — counts are
    additive, so the result is independent of word order and of
    upstream partitioning.  Stops early when the best pair's
    frequency drops below ``min_pair_freq`` (merges supported by a
    single word type are noise)."""
    from collections import defaultdict

    syms = [_symbolize(w) for w in words]
    freq = np.asarray(counts, dtype=np.int64)

    pair_n: dict = defaultdict(int)
    pair_words: dict = defaultdict(set)
    for wi, s in enumerate(syms):
        f = int(freq[wi])
        for p in zip(s, s[1:]):
            pair_n[p] += f
            pair_words[p].add(wi)

    merges: list = []
    for rank in range(num_merges):
        if not pair_n:
            break
        # max count, ties -> lexicographically smallest pair
        best = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), best_n = best
        if best_n < min_pair_freq:
            break
        merges.append((rank, left, right, int(best_n)))
        new_sym = left + right
        for wi in pair_words[(left, right)].copy():
            s = syms[wi]
            f = int(freq[wi])
            for p in zip(s, s[1:]):
                pair_n[p] -= f
                if pair_n[p] <= 0:
                    del pair_n[p]
                pw = pair_words[p]
                pw.discard(wi)
                if not pw:
                    del pair_words[p]
            merged: list = []
            i = 0
            while i < len(s):
                if (i + 1 < len(s) and s[i] == left
                        and s[i + 1] == right):
                    merged.append(new_sym)
                    i += 2
                else:
                    merged.append(s[i])
                    i += 1
            syms[wi] = merged
            for p in zip(merged, merged[1:]):
                pair_n[p] += f
                pair_words[p].add(wi)
    return merges


def bpe_merge_table(ds, num_merges: int = 50, col: str = "text",
                    min_word_freq: int = 1,
                    min_pair_freq: int = 2) -> pa.Table:
    """Learn a BPE merge table over a text Dataset → arrow table
    ``(rank, left, right, freq)`` in merge order.  One distributed
    corpus pass + a driver loop over the bounded word-type table
    (see module docstring for why that is the reference shape)."""
    words, counts = word_freq_table(ds, col,
                                    min_word_freq=min_word_freq)
    merges = learn_bpe(words, counts, num_merges,
                       min_pair_freq=min_pair_freq)
    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "freq": pa.array([m[3] for m in merges], pa.int64()),
    })


def encode_word(word: str, ranks: dict) -> list:
    """Apply a learned merge table to one word: repeatedly merge the
    present pair with the LOWEST rank (all its occurrences,
    left-to-right) until no learned pair remains — subword-nmt's
    encode order, which reproduces the training-time segmentation."""
    s = _symbolize(word)
    while len(s) > 1:
        best_rank = None
        best_pair = None
        for p in zip(s, s[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = p
        if best_pair is None:
            break
        left, right = best_pair
        merged: list = []
        i = 0
        while i < len(s):
            if (i + 1 < len(s) and s[i] == left
                    and s[i + 1] == right):
                merged.append(left + right)
                i += 2
            else:
                merged.append(s[i])
                i += 1
        s = merged
    return s


class BpeEncoder:
    """Actor-pool encode stage: merge table → per-doc subword stats.

    The merge table is fetched from the object store ONCE per actor
    (``__init__``), and a per-distinct-word unit-count cache makes
    the per-occurrence cost a dict hit — the cache is bounded by the
    word-type vocabulary the actor sees, same contract as the word
    table itself."""

    def __init__(self, merges_ref, col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        t = ray.get(merges_ref)
        self._ranks = {
            (left, right): rank
            for rank, left, right in zip(t.column("rank").to_pylist(),
                                         t.column("left").to_pylist(),
                                         t.column("right").to_pylist())
        }
        self._col = col
        self._id = id_col
        self._cache: dict = {}

    def _units(self, word: str) -> int:
        n = self._cache.get(word)
        if n is None:
            n = len(encode_word(word, self._ranks))
            self._cache[word] = n
        return n

    def __call__(self, b: pa.Table) -> pa.Table:
        n_words = np.empty(b.num_rows, dtype=np.int64)
        n_units = np.empty(b.num_rows, dtype=np.int64)
        for i, t in enumerate(b.column(self._col).to_pylist()):
            toks = (t or "").split()
            n_words[i] = len(toks)
            n_units[i] = sum(map(self._units, toks))
        return pa.table({
            self._id: b.column(self._id),
            "n_words": pa.array(n_words, pa.int64()),
            "n_units": pa.array(n_units, pa.int64()),
        })


def bpe_encode_stats(ds, merges_ref, col: str = "text",
                     id_col: str = "doc_id", concurrency: int = 4):
    """→ per-doc ``(id, n_words, n_units)`` under a learned merge
    table: pure streaming actor-pool map, zero shuffles."""
    return ds.select_columns([id_col, col]).map_batches(
        BpeEncoder,
        fn_constructor_args=(merges_ref, col, id_col),
        batch_format="pyarrow", concurrency=concurrency)
