"""Gopher quality-filter rules — every bit exercised by a crafted doc,
plus a DuckDB twin equivalence fuzz over adversarial texts."""

from __future__ import annotations

import pyarrow as pa
import pytest

from arabic_ocr_ray.functions.text import gopher_filter_batch

# a doc that PASSES all seven rules: 60 simple words incl. 3 stopwords
CLEAN = ("the quick brown fox jumps over that lazy dog with great "
         "ease and then runs far away into green fields where tall "
         "trees grow beside calm rivers full of bright fish while "
         "soft winds blow warm air across quiet hills under clear "
         "blue skies every single fine day during long happy summers "
         "there")


def _run(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = gopher_filter_batch(t)
    return {i: (out.column("n_words")[i].as_py(),
                out.column("fail_flags")[i].as_py(),
                out.column("keep")[i].as_py())
            for i in range(len(texts))}


def test_clean_doc_passes_all_rules():
    n, flags, keep = _run([CLEAN])[0]
    assert n >= 50 and flags == 0 and keep == 1


def test_each_rule_fires_alone():
    cases = {
        # bit 0: too few words (still has stopwords, sane lengths)
        1: "the cat sat with that dog",
        # bit 1: mean word length > 10 (long pseudo-words)
        2: CLEAN + " " + " ".join(["supercalifragilistic"] * 200),
        # bit 2: symbol ratio — pepper in > n/10 hashes
        4: CLEAN + " " + "#" * 40,
        # bit 3: > 90% bullet lines
        8: "\n".join("- item one two" for _ in range(30)),
        # bit 4: > 30% ellipsis-ended lines
        16: CLEAN + "\n" + "\n".join("and so on..." for _ in range(40)),
        # bit 5: < 80% alphabetic words (numbers)
        32: CLEAN + " " + " ".join(str(i) for i in range(100)),
        # bit 6: stopword-free
        64: " ".join(f"word{i}" for i in range(60)),
    }
    got = _run(list(cases.values()))
    for i, bit in enumerate(cases):
        _, flags, keep = got[i]
        assert flags & bit, (bit, flags)
        assert keep == 0

    # the single-rule cases must not trip unrelated line rules
    assert got[0][1] == 1  # ONLY word count fails on the short doc


def test_empty_and_whitespace_docs():
    got = _run(["", "   \n\t  ", None])
    for i in range(3):
        n, flags, keep = got[i]
        assert n == 0 and keep == 0
        assert flags & 1 and flags & 64
        assert not flags & 2 and not flags & 32  # n==0 guards


def test_matches_duckdb_twin_on_adversarial_texts():
    import duckdb

    texts = [CLEAN, "", "...\n...\n...", "- a\n- b\nplain", "###",
             "one... two...\nthree...", "héllo wörld " * 30,
             "a\rb\r\nc...", "\n\n\n", "-x\n- y\n * z\n\t* w",
             "the be " + "#" * 5 + " of"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = gopher_filter_batch(t).to_pandas()
    import __ray_entry__ as e

    sql = e.oracle_sql()["gopher_filter"]
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(sql).df().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got.equals(want[got.columns.tolist()].astype(
        {c: got[c].dtype for c in got.columns}))
