"""Tokenizer unit tests: decode, stripping, depth, links, composites."""

import numpy as np

from arabic_ocr_ray.html.tokenizer import (
    COMPOSITE,
    COMPOSITE_SENTINEL,
    MARKUP,
    TEXT,
    decode_html,
    tokenize,
)


def _texts(ts):
    return [t for t, k in zip(ts.texts, ts.kinds) if k == TEXT]


def test_basic_tokens_and_weights():
    ts = tokenize(b"<p>hello  world</p>")
    assert _texts(ts) == ["hello world"]  # whitespace collapsed (X1)
    ti = ts.texts.index("hello world")
    assert ts.weights[ti] == 11


def test_script_style_comment_head_never_leak():
    raw = (b"<html><head><title>T</title><style>p{}</style></head><body>"
           b"<script>var a='<p>x</p>';</script><!-- c --><p>keep</p></body></html>")
    assert _texts(tokenize(raw)) == ["keep"]


def test_unclosed_script_strips_to_end():
    assert _texts(tokenize(b"<p>a</p><script>boom")) == ["a"]


def test_entities_and_stray_chars():
    ts = tokenize(b"<p>AT&amp;T is 5 &gt; 3 &amp; 2 < 4</p>")
    assert _texts(ts) == ["AT&T is 5 > 3 & 2 < 4"]


def test_charset_sniff_latin1():
    raw = ('<html><head><meta charset="iso-8859-1"></head><body>'
           "<p>café straße</p></body></html>").encode("latin-1")
    assert _texts(tokenize(raw)) == ["café straße"]
    assert decode_html("é".encode("latin-1")) == "é"
    assert decode_html("é".encode("utf-8")) == "é"


def test_depth_normalization_deskew_analog():
    # wrapper layers must not shift depths: min text depth becomes 0.
    a = tokenize(b"<p>x</p>")
    b = tokenize(b"<div><div><div><p>x</p></div></div></div>")
    da = a.depths[np.asarray(a.kinds) == TEXT]
    db = b.depths[np.asarray(b.kinds) == TEXT]
    assert list(da) == list(db) == [0]


def test_element_inside_depth_convention():
    ts = tokenize(b"<p>a <b>c</b> d</p>")
    # <b>, 'c', </b> share one deeper depth → one contiguous excursion
    i = ts.tags.index("b")
    assert ts.depths[i] == ts.depths[i + 1] == ts.depths[i + 2]
    assert ts.depths[i] == ts.depths[i - 1] + 1


def test_in_link_containment():
    ts = tokenize(b'<ul><li><a href="/x"><span>Home</span></a></li></ul>')
    ti = ts.texts.index("Home")
    assert ts.in_link[ti]
    ts2 = tokenize(b"<p>plain</p>")
    assert not ts2.in_link[ts2.texts.index("plain")]


def test_open_close_matching_and_recovery():
    ts = tokenize(b"<p><b>x</b> <i>y</p>")
    bi = ts.tags.index("b")
    assert ts.match[bi] == bi + 2  # </b> right after 'x'
    ii = ts.tags.index("i")
    assert ts.match[ii] == -1      # unclosed <i>: popped by </p>, no match
    # stray close is ignored entirely
    ts2 = tokenize(b"<p>a</b>b</p>")
    assert "b" not in ts2.tags


def test_void_elements_do_not_push():
    ts = tokenize(b"<p>a<br><br>b</p>")
    ta, tb = ts.texts.index("a"), ts.texts.index("b")
    assert ts.depths[ta] == ts.depths[tb]
    assert ts.tags.count("br") == 2


def test_composite_round_trip_flag():
    raw = f"<p>{COMPOSITE}عب</p>".encode()
    assert _texts(tokenize(raw, lang="ar")) == [f"{COMPOSITE_SENTINEL}عب"]
    assert _texts(tokenize(raw, lang="en")) == [f"{COMPOSITE}عب"]


def test_latin_L_survives_arabic_page():
    """ADVICE r1: the sentinel is a PUA codepoint now — a genuine
    Latin 'L' in a mixed-script Arabic page must NOT round-trip to
    لا."""
    from arabic_ocr_ray.functions.text import replace_composites

    raw = "<html><body><p>London لاحظ</p></body></html>".encode()
    ts = tokenize(raw, lang="ar")
    texts = [t for t in ts.texts if t]
    assert len(texts) == 1
    assert "London" in texts[0]
    assert COMPOSITE_SENTINEL in texts[0]          # لا was normalized
    restored = replace_composites(texts[0])
    assert restored == "London لاحظ"               # byte-exact round trip
    assert "لاondon" not in restored


def test_unquoted_attr_trailing_slash_not_self_closing():
    """ADVICE r1: <a href=/about/> ends an UNQUOTED attribute value
    with '/' — the element must still push the stack (its text is
    in_link), while genuine self-closing forms must not."""
    raw = b'<div><a href=/about/>about us</a> <br/> <img src="x"/> tail</div>'
    ts = tokenize(raw)
    by_text = {t: i for i, t in enumerate(ts.texts) if t}
    assert ts.in_link[by_text["about us"]]          # <a ...> pushed
    assert not ts.in_link[by_text["tail"]]          # and was closed
    # the <a> open found its </a> partner
    a_idx = [i for i, tag in enumerate(ts.tags)
             if tag == "a" and ts.is_open[i]]
    assert len(a_idx) == 1 and ts.match[a_idx[0]] != -1
