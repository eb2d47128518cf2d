"""Gopher A1.2 repetition rules — each bit exercised by a crafted
doc, dup-stat law pinned by hand counts, plus a DuckDB twin
equivalence check over adversarial texts (mirrors tests/test_c4.py
and tests/test_gopher.py)."""

from __future__ import annotations

import pyarrow as pa

from arabic_ocr_ray.functions.text import gopher_repetition_batch

# a doc that PASSES all 13 rules: varied lines/paragraphs, nothing
# repeats at any granularity
CLEAN = ("The quick brown fox jumps over one lazy dog today.\n"
         "Seven violet marbles rolled beneath an antique desk.\n\n"
         "Gardens flourish when rain arrives during quiet spring "
         "evenings and children watch from windows.")


def _run(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = gopher_repetition_batch(t)
    cols = ("n_lines", "n_paras", "dup_lines", "dup_paras",
            "dup_line_chars", "dup_para_chars", "fail_flags", "keep")
    return [{c: out.column(c)[i].as_py() for c in cols}
            for i in range(len(texts))]


def test_clean_doc_passes():
    r = _run([CLEAN])[0]
    assert r["fail_flags"] == 0 and r["keep"] == 1
    assert r["n_lines"] == 3 and r["n_paras"] == 2
    assert r["dup_lines"] == 0 and r["dup_para_chars"] == 0


def test_dup_element_and_char_law():
    # 4 lines, 'same line' (9 chars) appears 3x -> 2 duplicate
    # occurrences beyond the first, 18 duplicate chars
    r = _run(["same line\nsame line\nsame line\nother words here"])[0]
    assert r["n_lines"] == 4 and r["dup_lines"] == 2
    assert r["dup_line_chars"] == 18
    assert r["fail_flags"] & 1          # 2/4 > 0.30
    assert r["fail_flags"] & 4          # 18*5 > total
    # paragraphs: \n\n separated, 'para one' repeats
    r = _run(["para one here\n\npara one here\n\nunique paragraph"])[0]
    assert r["n_paras"] == 3 and r["dup_paras"] == 1
    assert r["dup_para_chars"] == 13
    assert r["fail_flags"] & 2 and r["fail_flags"] & 8


def test_top_ngram_bits():
    # 'spam spam' 2-gram dominates; singleton n-grams must NOT count
    heavy = "spam spam spam spam spam spam spam spam"
    r = _run([heavy])[0]
    assert r["fail_flags"] & 16         # top 2-gram > 20 %
    assert r["fail_flags"] & 32 and r["fail_flags"] & 64
    # a clean short one-line doc has NO repeated n-gram -> top = 0,
    # so the 3/4-gram bits stay clear (the >=2-count gate)
    r = _run(["The quick brown fox jumps high today."])[0]
    assert r["fail_flags"] & (16 | 32 | 64) == 0


def test_dup_ngram_bits():
    # a 10-word phrase repeated 4x trips every dup-n-gram rule 5..10
    phrase = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    r = _run([phrase * 4])[0]
    for bit in (128, 256, 512, 1024, 2048, 4096):
        assert r["fail_flags"] & bit, bin(r["fail_flags"])
    # the same phrase once is clean
    r = _run([phrase.strip()])[0]
    assert r["fail_flags"] == 0


def test_empty_and_null_docs_pass():
    # no content -> no repetition -> all multiplicative comparisons
    # are 0 > 0 -> pass (the quality filter owns the emptiness rules)
    for r in _run(["", None, "\n\n\n", "   "]):
        assert r["fail_flags"] == 0 and r["keep"] == 1
        assert r["n_lines"] == 0 or r["n_lines"] == 1  # '   ' is a line


def test_matches_duckdb_twin_on_adversarial_texts():
    import duckdb

    import __ray_entry__ as e

    phrase = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    texts = [CLEAN, "", None, "a\na\na\na", "x y " * 50,
             "p1\n\np1\n\np1", "héllo wörld\nhéllo wörld",
             phrase * 4, "one two three four five six seven",
             "tab\tsep words\ttab\tsep words repeated here",
             "\n\n\n", "a", "a a", "a a a a a a a a a a a a",
             CLEAN + "\n" + CLEAN,
             "line with trailing space \nline with trailing space "]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = gopher_repetition_batch(t).to_pandas()
    sql = e.oracle_sql()["gopher_repetition"]
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(sql).df().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got.equals(want[got.columns.tolist()].astype(
        {c: got[c].dtype for c in got.columns}))


def test_curate_corpus_v4_chain(ray_session):
    """Published-filter chain: C4 ∧ repetition gate, then exact
    dedup keep-min-id — each stage drops exactly the planted doc."""
    import ray.data as rd

    from arabic_ocr_ray.pipelines.curate import curate_corpus_v4

    clean2 = CLEAN.replace("fox", "wolf")
    t = pa.table({
        "url": pa.array(["u/1", "u/2", "u/3", "u/4", "u/5", "u/6"],
                        pa.string()),
        "text": pa.array([
            CLEAN,                     # kept
            CLEAN,                     # exact dup of u/1 -> dropped
            clean2,                    # kept (distinct text)
            CLEAN + "\nfunction f() { return 1; }",  # C4 brace -> out
            "same line here today ok.\n" * 8,  # repetition -> out
            "no terminal marks on this line",  # C4 <3 sentences -> out
        ], pa.string()),
    })
    out = curate_corpus_v4(rd.from_arrow(t)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert out["url"].tolist() == ["u/1", "u/3"]
    # the stats columns ride through from the C4 verdict
    assert (out["n_kept"] == 3).all() and (out["n_sentences"] == 3).all()


def test_twin_equivalence_fuzz():
    """gopher_repetition engine ≡ DuckDB twin on arbitrary unicode —
    no lower()/\\b in this rule set, so no assume-gate needed: the
    law is pure splitting + counting + codepoint lengths, which the
    two engines must agree on everywhere."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import __ray_entry__ as e

    sql = e.oracle_sql()["gopher_repetition"]
    con = duckdb.connect()
    alpha = st.characters(blacklist_categories=("Cs",))
    seeds = st.sampled_from(["\n", "\n\n", " ", "a b c d e",
                             "dup line", "é ö", "\t", "x"])

    @settings(max_examples=120, deadline=None)
    @given(st.lists(st.one_of(st.text(alphabet=alpha, max_size=8),
                              seeds), max_size=12).map("".join))
    def check(t):
        tab = pa.table({"doc_id": pa.array([0], pa.int64()),
                        "text": pa.array([t], pa.string())})
        got = gopher_repetition_batch(tab).to_pandas()
        con.register("documents", tab)
        want = con.execute(sql).df()
        want = want[got.columns.tolist()].astype(
            {c: got[c].dtype for c in got.columns})
        assert got.equals(want), (t, got.to_dict(), want.to_dict())

    check()
