"""C4 page-filter rules — line law + every page bit exercised by a
crafted doc, plus a DuckDB twin equivalence check over adversarial
texts (mirrors tests/test_gopher.py for the Gopher suite)."""

from __future__ import annotations

import pyarrow as pa

from arabic_ocr_ray.functions.text import c4_page_filter_batch

# a doc that PASSES: 3 lines, each ≥5 words with a terminal mark,
# ≥3 sentences total, no lorem/brace/badword
CLEAN = ("The quick brown fox jumps high.\n"
         "A calm river flows past green fields today.\n"
         "Tall trees grow beside the quiet old mill!")


def _run(texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = c4_page_filter_batch(t)
    cols = ("n_lines", "n_kept", "n_sentences", "kept_chars",
            "fail_flags", "keep")
    return [{c: out.column(c)[i].as_py() for c in cols}
            for i in range(len(texts))]


def test_clean_doc_passes():
    r = _run([CLEAN])[0]
    assert r["n_lines"] == 3 and r["n_kept"] == 3
    assert r["n_sentences"] == 3
    assert r["fail_flags"] == 0 and r["keep"] == 1


def test_line_law():
    # no terminal mark / <5 words / javascript line all drop; the
    # quote terminal and trimmed trailing whitespace both keep
    doc = ("this line has plenty of words but no terminal mark\n"
           "Too short.\n"
           "Please enable javascript to view this page now.\n"
           'He said "this line ends in a quote mark."\n'
           "Trailing spaces still count as terminal here.   \n"
           "\n   \t\n")
    r = _run([doc])[0]
    assert r["n_lines"] == 5          # blank/ws-only lines uncounted
    assert r["n_kept"] == 2           # quote line + trimmed line


def test_each_page_rule_fires_alone():
    cases = {
        # bit 0: kept text has < 3 sentences
        1: "Only one kept sentence lives right here.",
        # bit 1: lorem ipsum (case-insensitive, raw page)
        2: CLEAN + "\nLorem Ipsum dolor sit amet and so forth.",
        # bit 2: curly brace anywhere raw
        4: CLEAN + "\nfunction f() { return 1; }",
        # bit 3: badword with word boundary
        8: CLEAN + "\nBuy cheap viagra pills online right now.",
    }
    got = _run(list(cases.values()))
    for i, bit in enumerate(cases):
        assert got[i]["fail_flags"] & bit, (bit, got[i])
        assert got[i]["keep"] == 0
    # single-rule isolation (the crafted extras keep the others clean)
    assert got[1]["fail_flags"] == 2
    assert got[3]["fail_flags"] == 8
    # substring does NOT trip the word-boundary badword rule
    r = _run([CLEAN + "\nThe maxxx festival drew huge crowds there."])[0]
    assert r["fail_flags"] == 0


def test_empty_and_null_docs():
    for r in _run(["", None, "   \n\t  "]):
        assert r["n_lines"] == 0 and r["n_kept"] == 0
        assert r["n_sentences"] == 0 and r["kept_chars"] == 0
        assert r["fail_flags"] == 1 and r["keep"] == 0


def test_matches_duckdb_twin_on_adversarial_texts():
    import duckdb

    import __ray_entry__ as e

    texts = [CLEAN, "", None, "...\n!!!\n???", '"""\n"x y z w v."',
             "JaVaScRiPt required here on this long line.",
             "héllo wörld wide web page today.\n" * 4,
             "a\rb\r\nEnds with period after five words.",
             "{", "Lorem\nipsum", "lorem ipsum", "xxx.",
             "Spaces  between   words collapse never here today.",
             CLEAN + "\n" + CLEAN]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = c4_page_filter_batch(t).to_pandas()
    sql = e.oracle_sql()["c4_filter"]
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(sql).df().sort_values("doc_id") \
        .reset_index(drop=True)
    assert got.equals(want[got.columns.tolist()].astype(
        {c: got[c].dtype for c in got.columns}))


def test_twin_equivalence_fuzz():
    """c4_filter engine ≡ DuckDB twin on arbitrary unicode — the
    badword \\b needed re.ASCII (RE2's \\b is ASCII-only; unicode \\b
    diverges on badwords abutting non-ASCII letters).  Examples
    hitting the documented str.lower()/utf8proc casing-skew alphabet
    are assume-rejected (the shared-casing contract, see
    test_text_twins_python_duckdb_equivalence_fuzz)."""
    import duckdb
    from hypothesis import assume, given, settings
    from hypothesis import strategies as st

    import __ray_entry__ as e

    sql = e.oracle_sql()["c4_filter"]
    con = duckdb.connect()
    alpha = st.characters(blacklist_categories=("Cs",))
    # bias toward the rule-relevant tokens so bits actually flip
    seeds = st.sampled_from([
        "viagra", "xxx", "lorem ipsum", "{", "javascript", ".", "!",
        '"', "\n", " ", "é", "İ", "word"])

    @settings(max_examples=120, deadline=None)
    @given(st.lists(st.one_of(st.text(alphabet=alpha, max_size=8),
                              seeds), max_size=12).map("".join))
    def check(t):
        assume(con.execute("SELECT lower(?)", [t]).fetchone()[0]
               == t.lower())
        tab = pa.table({"doc_id": pa.array([0], pa.int64()),
                        "text": pa.array([t], pa.string())})
        got = c4_page_filter_batch(tab).to_pandas()
        con.register("documents", tab)
        want = con.execute(sql).df()
        want = want[got.columns.tolist()].astype(
            {c: got[c].dtype for c in got.columns})
        assert got.equals(want), (t, got.to_dict(), want.to_dict())

    check()
