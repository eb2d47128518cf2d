"""Segmentation stage tests: lines, spans, fine cuts, generator parity."""

from arabic_ocr_ray.html.tokenizer import COMPOSITE, COMPOSITE_SENTINEL, tokenize
from arabic_ocr_ray.segmentation import (
    fine_cuts,
    segment_document,
    segment_lines,
    segment_spans,
)
from arabic_ocr_ray.sources.pages import build_page


def _span_texts(raw, lang=""):
    ts = tokenize(raw, lang)
    return [s.text for s in segment_document(ts).subspans]


def test_each_block_is_a_line():
    ts = tokenize(b"<div><p>one</p><p>two</p><ul><li>three</li></ul></div>")
    lines = segment_lines(ts)
    assert len(lines) == 3


def test_empty_paragraph_is_no_line():
    ts = tokenize(b"<p>a</p><p></p><p> </p><p>b</p>")
    assert len(segment_lines(ts)) == 2


def test_inline_markup_does_not_split_line():
    assert _span_texts(b"<p>a <b>b</b> c</p>") == ["a", "b", "c"]
    # reassembly is byte-identical: the extract stage joins with " "


def test_single_word_inline_kept_whole_when_two_tokens():
    # unclosed <b>: 2-token excursion < MIN_EXCURSION → no cut
    assert _span_texts(b"<p>pre <b>bw post</p>") == ["pre bw post"]


def test_trailing_link_fine_cut():
    got = _span_texts(b'<p>long story text here <a href="#">Read more</a></p>')
    assert got == ["long story text here", "Read more"]


def test_leading_link_fine_cut():
    got = _span_texts(b'<p><a href="#">Home page</a> rest of text</p>')
    assert got == ["Home page", "rest of text"]


def test_nav_item_single_span():
    assert _span_texts(b'<li><a href="/x">Home</a></li>') == ["Home"]


def test_adjacent_links_one_span():
    got = _span_texts(b'<p><a href="/a">Privacy Policy</a> <a href="/b">Terms</a></p>')
    assert got == ["Privacy Policy Terms"]


def test_br_gap_splitting_adaptive():
    # gaps: inner width 1 between words, one 6-wide gap → split there
    words = " <br> ".join(f"w{i}" for i in range(12))
    raw = f"<p>{words} <br><br><br><br><br><br> tail words here</p>".encode()
    got = _span_texts(raw)
    assert got == [" ".join(f"w{i}" for i in range(12)), "tail words here"]


def test_generator_span_parity_all_hazards():
    """Engine segmentation reproduces the generator's golden spans
    (the J2 positional-alignment contract) across hazards and langs."""
    for i in range(100):
        r = build_page(3, i)
        ts = tokenize(r["html"], r["lang"])
        got = [s.text for s in segment_document(ts).subspans]
        exp = [t for _, t in r["spans"]]
        if r["lang"] == "ar":
            exp = [t.replace(COMPOSITE, COMPOSITE_SENTINEL) for t in exp]
        assert got == exp, (i, r["hazard"], r["lang"])


def test_fine_cuts_adjacent_excursions_single_unit():
    # two adjacent link elements at the same depth form ONE contiguous
    # excursion → cut out as a single sub-span (no empty segment
    # between them; merge rule preprocess.py:441-448)
    raw = (b'<p>plenty of surrounding anchor text mass here '
           b'<a href="/1">one link</a><a href="/2">two link</a> and more '
           b'trailing words</p>')
    spans = _span_texts(raw)
    assert spans == [
        "plenty of surrounding anchor text mass here",
        "one link two link",
        "and more trailing words",
    ]


def test_baseline_follows_dominant_mass():
    # when link text dominates the line, the baseline sits at link
    # depth and no excursion is cut — the whole line is one linky span
    spans = _span_texts(b'<p>a <a href="/1">one link</a><a href="/2">two link</a> b</p>')
    assert spans == ["a one link two link b"]
