"""Real PDF writer/parser (functions/pdftext.py): COS round trips,
escape/hex/TJ string paths, Flate + raw streams, xref vs scan
loading, scrambled two-column layout reconstruction, corpus builder
determinism, PdfExtractor stage parity and per-row error isolation."""

import re

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from arabic_ocr_ray.functions import pdftext as P


def _wrap(text: str, wpl: int = 8) -> list[str]:
    words = text.split(" ")
    return [" ".join(words[i:i + wpl])
            for i in range(0, len(words), wpl)] or [""]


def _flat(extracted: str) -> str:
    return extracted.replace("\n", " ")


# ------------------------------------------------------------ round trips

@pytest.mark.parametrize("n_words", [1, 7, 8, 9, 95, 96, 97, 500])
def test_doc_round_trip_word_counts(n_words):
    text = " ".join(f"word{i}" for i in range(n_words))
    r = P.pdf_extract(P.doc_to_pdf(text, doc_id=n_words))
    assert _flat(r["text"]) == text
    lines = _wrap(text)
    assert r["n_spans"] == len(lines)
    assert r["n_pages"] == (len(lines) + 11) // 12


def test_specials_escapes_round_trip():
    text = r"(parens) \backslash (nested (deep) ok) tab\t literal ends"
    assert _flat(P.pdf_extract(P.doc_to_pdf(text, 1))["text"]) == text


def test_unicode_hex_path_round_trip():
    text = "héllo wörld ☃ snow straße 中文 tokens  nbsp here"
    pdf = P.doc_to_pdf(text, 2)
    assert b"<feff" in pdf.lower()          # UTF-16BE hex strings present
    assert _flat(P.pdf_extract(pdf)["text"]) == text


def test_multi_space_and_empty_tokens_preserved():
    text = "a  b   c    d"
    assert _flat(P.pdf_extract(P.doc_to_pdf(text, 3))["text"]) == text


def test_empty_and_single_word():
    assert P.pdf_extract(P.doc_to_pdf("", 0))["text"] == ""
    assert P.pdf_extract(P.doc_to_pdf("x", 0))["text"] == "x"


def test_control_chars_ride_hex_path():
    text = "line\nbreak and\ttab inside one word-span"
    # '\n' inside a span must survive (it is span-internal, not layout)
    r = P.pdf_extract(P.doc_to_pdf(text, 4))
    joined = "\n".join(_wrap(text))
    assert r["text"] == joined


# --------------------------------------------------------- string paths

def test_literal_string_escapes_decode():
    # hand-written content: escapes, octal, line continuation
    pdf = P.pdf_encode(
        [[(72, 720, "ab", "tj")]], compress=False)
    body = (b"BT /F1 12 Tf 1 0 0 1 72 720 Tm "
            b"(a\\(b\\)c\\\\d\\n\\101\\60end) Tj ET")
    pdf = pdf.replace(b"BT\n/F1 12 Tf\n1 0 0 1 72 720 Tm (ab) Tj\nET",
                      body)
    pdf = re.sub(rb"/Length \d+",
                 b"/Length %d" % len(body), pdf, count=1)
    r = P.pdf_extract(pdf)
    assert r["text"] == "a(b)c\\d\nA0end"


def test_tj_array_kerning_becomes_spaces():
    spans = [(72, 720, "alpha beta gamma", "tjarr")]
    pdf = P.pdf_encode([spans], compress=False)
    assert b"] TJ" in pdf
    assert P.pdf_extract(pdf)["text"] == "alpha beta gamma"


def test_small_kerning_is_not_a_space():
    content = (b"BT /F1 12 Tf 1 0 0 1 72 720 Tm "
               b"[(kern) -40 (ing) -250 (apart)] TJ ET")
    pdf = P.pdf_encode([[(72, 720, "x", "tj")]], compress=False)
    pdf = pdf.replace(b"BT\n/F1 12 Tf\n1 0 0 1 72 720 Tm (x) Tj\nET",
                      content)
    pdf = re.sub(rb"/Length \d+",
                 b"/Length %d" % len(content), pdf, count=1)
    assert P.pdf_extract(pdf)["text"] == "kerning apart"


def test_hex_string_whitespace_and_odd_length():
    lex = P._Lexer(b"<48 65 6C6C 6F>")
    assert lex.next_token() == ("str", b"Hello")
    lex = P._Lexer(b"<486>")                 # odd → padded with 0
    assert lex.next_token() == ("str", b"\x48\x60")


# ------------------------------------------------------- streams / xref

def test_flate_and_raw_streams_both_parse():
    text = " ".join(f"w{i}" for i in range(200))   # 3 pages → mixed
    pdf = P.doc_to_pdf(text, 7)
    assert b"FlateDecode" in pdf
    assert _flat(P.pdf_extract(pdf)["text"]) == text
    # force-all-compressed and force-none parse identically
    lines = _wrap(text)
    pages = [[(72, 720 - 14 * i, ln, "tj")] for i, ln in
             enumerate(lines[:3])]
    for comp in (True, False):
        r = P.pdf_extract(P.pdf_encode(pages, compress=comp))
        assert r["text"] == "\n".join(lines[:3])
        assert r["n_pages"] == 3


def test_xref_table_is_authoritative_and_scan_is_fallback():
    text = " ".join(f"w{i}" for i in range(120))
    pdf = P.doc_to_pdf(text, 11)
    via_xref = P._load_objects_via_xref(pdf)
    assert via_xref and all(isinstance(k, int) for k in via_xref)
    # chop the trailer: the scan fallback must still extract the same
    broken = pdf[:pdf.rfind(b"startxref")]
    assert P.pdf_extract(broken)["text"] == P.pdf_extract(pdf)["text"]


def test_garbage_rejection():
    with pytest.raises(ValueError):
        P.pdf_extract(b"not a pdf")
    with pytest.raises(ValueError):
        P.pdf_extract(b"%PDF-1.4\njunk with no objects")


# ------------------------------------------------------------- layout

def test_emission_order_is_scrambled_but_reading_order_recovered():
    text = " ".join(f"word{i}" for i in range(200))
    pdf = P.doc_to_pdf(text, 7)
    m = re.search(rb"stream\r?\n(BT.*?ET)\r?\nendstream", pdf, re.S)
    spans = P._content_spans(m.group(1))
    emitted = [s[2] for s in spans]
    reading = P._reading_order(spans)
    assert emitted != reading                # the corpus really scrambles
    assert reading == _wrap(text)[:12]       # geometry restores order


def test_two_column_reading_order():
    # right column must come after the WHOLE left column, regardless of y
    spans = [(306.0, 720.0, "C"), (72.0, 706.0, "B"),
             (306.0, 706.0, "D"), (72.0, 720.0, "A")]
    assert P._reading_order(spans) == ["A", "B", "C", "D"]


def test_single_column_orders_by_y_only():
    spans = [(72.0, 650.0, "third"), (72.0, 720.0, "first"),
             (72.0, 706.0, "second")]
    assert P._reading_order(spans) == ["first", "second", "third"]


# ----------------------------------------------------- stage / builder

def test_payload_table_deterministic_and_stage_parity():
    docs = pa.table({
        "doc_id": pa.array([5, 9], type=pa.int64()),
        "text": ["alpha beta gamma " * 20, "short one"],
    })
    t1 = P.pdf_payload_table_from_documents(docs)
    t2 = P.pdf_payload_table_from_documents(docs)
    assert t1.equals(t2)
    out = P.PdfExtractor()(t1)
    assert out.column("status").to_pylist() == ["ok", "ok"]
    for row, src in zip(out.column("text").to_pylist(),
                        docs.column("text").to_pylist()):
        assert row.replace("\n", " ") == src


def test_stage_isolates_bad_rows():
    good = P.doc_to_pdf("fine document here", 1)
    batch = pa.table({
        "item_id": pa.array([1, 2, 3], type=pa.int64()),
        "payload": pa.array([good, b"\x00garbage", b"%PDF-1.4\nbroken"],
                            type=pa.binary()),
    })
    out = P.PdfExtractor()(batch)
    assert out.column("status").to_pylist() == ["ok", "error", "error"]
    assert out.column("text").to_pylist()[1] == ""
    assert out.column("n_pages").to_pylist() == [1, 0, 0]
    assert out.schema.field("n_pages").type == pa.int64()


# ------------------------------------------------- mixed-corpus dispatch

def test_text_to_pdf_preserves_newlines_and_unicode():
    text = "سطر أول عربي\nsecond line latin\n\nafter an empty line\nλεξη"
    r = P.pdf_extract(P.text_to_pdf(text, 21))
    assert r["text"] == text                 # NO flatten — exact inverse
    assert r["n_spans"] == len(text.split("\n"))


def test_mixed_extract_dispatch_golden_round_trip():
    import zlib

    from arabic_ocr_ray.sources.pages import pages_table
    from arabic_ocr_ray.stages.extract_stage import ExtractText, MixedExtract

    t = pages_table(40, seed=303)
    urls = t.column("url").to_pylist()
    texts = t.column("text").to_pylist()
    payloads, n_pdf = [], 0
    for u, h, x in zip(urls, t.column("html").to_pylist(), texts):
        c = zlib.crc32(u.encode())
        if c % 3 == 0:
            payloads.append(P.text_to_pdf(x, c))
            n_pdf += 1
        else:
            payloads.append(h)
    assert 0 < n_pdf < len(urls)             # genuinely mixed
    batch = pa.table({"url": t.column("url"),
                      "html": pa.array(payloads, pa.binary()),
                      "lang": t.column("lang")})
    out = MixedExtract(num_partitions=8)(batch)
    assert out.column("extracted_text").to_pylist() == texts
    assert set(out.column("status").to_pylist()) == {"ok"}
    assert out.column("url").to_pylist() == urls      # original row order
    # html-only batches take the fast path and match ExtractText exactly
    pure = pa.table({"url": t.column("url"), "html": t.column("html"),
                     "lang": t.column("lang")})
    assert ExtractText(num_partitions=8)(pure).equals(
        MixedExtract(num_partitions=8)(pure))


def test_mixed_extract_isolates_broken_pdf_rows():
    from arabic_ocr_ray.sources.pages import pages_table
    from arabic_ocr_ray.stages.extract_stage import MixedExtract

    t = pages_table(3, seed=303)
    payloads = [t.column("html").to_pylist()[0],
                b"%PDF-1.4\nbroken beyond repair",
                P.text_to_pdf("fine", 1)]
    batch = pa.table({"url": t.column("url"),
                      "html": pa.array(payloads, pa.binary()),
                      "lang": t.column("lang")})
    out = MixedExtract()(batch)
    st = out.column("status").to_pylist()
    assert st[0] == "ok" and st[2] == "ok"
    assert st[1].startswith("error")
    assert out.column("extracted_text").to_pylist()[2] == "fine"


def _mixed_pages_table(n: int, seed: int):
    """Pages fixture with every third url's html swapped for a PDF of
    its golden text (keeps the text column for eval/oracle use)."""
    import zlib

    from arabic_ocr_ray.sources.pages import pages_table

    t = pages_table(n, seed=seed)
    payloads = []
    for u, h, x in zip(t.column("url").to_pylist(),
                       t.column("html").to_pylist(),
                       t.column("text").to_pylist()):
        c = zlib.crc32(u.encode())
        payloads.append(P.text_to_pdf(x, c) if c % 3 == 0 else h)
    return t.set_column(t.schema.get_field_index("html"), "html",
                        pa.array(payloads, pa.binary()))


def test_cli_extract_mixed_chain(ray_session, default_model, tmp_path,
                                 capsys):
    """CLI surface: extract --mixed over a mixed corpus evals to
    match_rate 1.0 against the same golden as the pure-html path."""
    import json

    import pyarrow.parquet as pq

    from arabic_ocr_ray.cli import main

    src = str(tmp_path / "mixed.parquet")
    out = str(tmp_path / "out")
    pq.write_table(_mixed_pages_table(40, seed=307), src)
    assert main(["extract", "-i", src, "-o", out, "--mixed"]) == 0
    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["docs"] == 40
    assert main(["eval", "-i", src, "-e", out]) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["match_rate"] == 1.0


def test_warc_carrying_pdf_payloads_extracts_golden(ray_session, tmp_path):
    """Composition: PDFs inside WARC records ride the binary payload
    path untouched, and the mixed stage recovers golden text — the
    raw-archive ingest and the PDF branch need no coupling code."""
    import pandas as pd
    import pyarrow.parquet as pq

    from arabic_ocr_ray.pipelines.extract import extract_pages
    from arabic_ocr_ray.sources import warc as W
    from arabic_ocr_ray.stages.extract_stage import MixedExtract

    t = _mixed_pages_table(50, seed=311)
    src = str(tmp_path / "mixed.parquet")
    pq.write_table(t, src)
    W.write_warc_from_pages(src, str(tmp_path / "warc"),
                            n_files=3).materialize()
    df = (extract_pages(W.read_warc_pages(str(tmp_path / "warc")),
                        batch_size=32, concurrency=2,
                        stage_cls=MixedExtract)
          .select_columns(["url", "extracted_text"]).to_pandas()
          .sort_values("url").reset_index(drop=True))
    golden = (t.select(["url", "text"]).to_pandas()
              .sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        df.rename(columns={"extracted_text": "text"}), golden)


# --------------------------------------------------------------- fuzz

@settings(max_examples=60, deadline=None)
@given(st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters=["\ud800"]),
    min_size=0, max_size=400))
def test_fuzz_any_unicode_round_trips(text):
    r = P.pdf_extract(P.doc_to_pdf(text, 13))
    assert r["text"] == "\n".join(_wrap(text))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="ab ()\\<>[]/%#\n\té☃", min_size=0,
                        max_size=30),
                min_size=1, max_size=30))
def test_fuzz_span_strings_survive_all_paths(parts):
    text = " ".join(parts)
    r = P.pdf_extract(P.doc_to_pdf(text, 17))
    assert r["text"] == "\n".join(_wrap(text))


def test_cyclic_kids_raises_valueerror_not_recursionerror():
    """A corrupt /Kids reference pointing back into the page tree must
    raise ValueError (per-row isolation contract), not blow the stack
    with RecursionError and kill the whole batch."""
    import re

    import pytest

    from arabic_ocr_ray.functions.pdftext import pdf_extract, text_to_pdf

    good = text_to_pdf("alpha\nbeta\ngamma", 7)
    m = re.search(rb"(\d+) 0 obj\s*<<[^>]*?/Type /Pages", good, re.S)
    assert m, "fixture PDF must contain a Pages node"
    pages_num = m.group(1)
    k = re.search(rb"/Kids \[(\d+) 0 R", good)
    assert k, "fixture PDF must contain a /Kids array"
    # repoint the first kid at the Pages node itself: a cycle
    bad = good[:k.start(1)] + pages_num + good[k.end(1):]
    with pytest.raises(ValueError, match="page tree|malformed"):
        pdf_extract(bad)
