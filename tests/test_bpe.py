"""BPE vocabulary learning: brute-force reference parity, determinism
across partitioning, encode semantics, guards."""
import numpy as np
import pyarrow as pa
import pytest

from arabic_ocr_ray.functions.bpe import (
    END,
    BpeEncoder,
    bpe_merge_table,
    encode_word,
    learn_bpe,
    word_freq_table,
)


def _brute_bpe(words, counts, num_merges, min_pair_freq=2):
    """Textbook recount-every-iteration BPE (Sennrich et al. 2016
    Fig. 1 semantics + our deterministic tie-break) — the oracle the
    incremental-index implementation must match exactly."""
    from collections import defaultdict

    syms = {}
    for w, c in zip(words, counts):
        s = list(w)
        s[-1] = s[-1] + END
        syms[w] = (s, int(c))
    merges = []
    for rank in range(num_merges):
        pairs = defaultdict(int)
        for s, c in syms.values():
            for p in zip(s, s[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        if n < min_pair_freq:
            break
        merges.append((rank, left, right, n))
        for w, (s, c) in syms.items():
            out, i = [], 0
            while i < len(s):
                if (i + 1 < len(s) and s[i] == left
                        and s[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = (out, c)
    return merges


def test_learn_bpe_hand_example():
    # the canonical low/lower/newest/widest example of the paper
    words = ["low", "lower", "newest", "widest"]
    counts = [5, 2, 6, 3]
    merges = learn_bpe(words, counts, 4, min_pair_freq=2)
    assert merges == _brute_bpe(words, counts, 4)
    # first merge must be the most frequent pair: 'es' (9 = 6+3)
    assert (merges[0][1], merges[0][2]) == ("e", "s")
    assert merges[0][3] == 9


def test_learn_bpe_matches_brute_on_random_corpora():
    rng = np.random.default_rng(7)
    alphabet = list("abcde")
    for trial in range(8):
        n_words = int(rng.integers(3, 40))
        words = list({
            "".join(rng.choice(alphabet,
                               size=int(rng.integers(1, 8))))
            for _ in range(n_words)
        })
        counts = rng.integers(1, 50, size=len(words)).tolist()
        got = learn_bpe(words, counts, 12)
        want = _brute_bpe(words, counts, 12)
        assert got == want, (trial, words, counts)


def test_learn_bpe_tie_break_and_early_stop():
    # 'ab' and 'cd' both appear 3 times -> lexicographically
    # smallest pair wins
    merges = learn_bpe(["ab", "cd"], [3, 3], 1)
    assert (merges[0][1], merges[0][2]) == ("a", "b" + END)
    # all pairs below min_pair_freq -> no merges at all
    assert learn_bpe(["xy"], [1], 5, min_pair_freq=2) == []
    # single-char words carry no pairs
    assert learn_bpe(["a", "b"], [9, 9], 5) == []


def test_encode_word_reproduces_training_segmentation():
    words = ["low", "lower", "newest", "widest", "lowest"]
    counts = [5, 2, 6, 3, 4]
    merges = learn_bpe(words, counts, 30, min_pair_freq=1)
    ranks = {(left, right): rank for rank, left, right, _ in merges}
    # a word fully merged during training encodes to one unit
    for w in words:
        units = encode_word(w, ranks)
        assert "".join(units) == w + END
    # unseen characters survive as singletons
    assert encode_word("zq", {}) == ["z", "q" + END]


@pytest.mark.usefixtures("ray_session")
def test_bpe_merge_table_partitioning_invariant():
    import ray.data as rd

    texts = ["the cat sat on the mat", "the cat ran",
             "a mat a cat a hat", "the the the cat"] * 3
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    a = bpe_merge_table(rd.from_arrow(t), num_merges=10)
    b = bpe_merge_table(rd.from_arrow(t).repartition(7), num_merges=10)
    assert a.equals(b)
    assert a.num_rows > 0
    # word_freq_table counts match a flat Counter
    words, counts = word_freq_table(rd.from_arrow(t).repartition(5))
    from collections import Counter
    want = Counter(" ".join(texts).split())
    assert dict(zip(words, counts.tolist())) == dict(want)


@pytest.mark.usefixtures("ray_session")
def test_bpe_encode_stats_counts():
    import ray
    import ray.data as rd

    texts = ["low lower", "newest widest lowest", ""]
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t)
    merges = bpe_merge_table(ds, num_merges=20, min_pair_freq=1)
    ref = ray.put(merges)
    out = {r["doc_id"]: r for r in
           ray.data.from_arrow(t).map_batches(
               BpeEncoder, fn_constructor_args=(ref,),
               batch_format="pyarrow", concurrency=1).take_all()}
    ranks = {(left, right): rank for rank, left, right in
             zip(merges.column("rank").to_pylist(),
                 merges.column("left").to_pylist(),
                 merges.column("right").to_pylist())}
    for doc_id, text in zip([1, 2, 3], texts):
        toks = text.split()
        assert out[doc_id]["n_words"] == len(toks)
        assert out[doc_id]["n_units"] == sum(
            len(encode_word(w, ranks)) for w in toks)


@pytest.mark.usefixtures("ray_session")
def test_word_freq_guards():
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["a a a b"], pa.string())})
    with pytest.raises(ValueError, match="max_word_types"):
        word_freq_table(rd.from_arrow(t), max_word_types=1)
    words, counts = word_freq_table(rd.from_arrow(t),
                                    min_word_freq=2)
    assert words == ["a"] and counts.tolist() == [3]
