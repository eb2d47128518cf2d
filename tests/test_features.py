"""Feature-vector micro-fixtures (FIXTURES.md §4): 9-slot layout,
4^i score weights (code semantics, train_recognition.py:289-301 — not
README's 2^i), decoration features, transition maxima."""

from arabic_ocr_ray.features import SCORE_WEIGHTS, feature_vector
from arabic_ocr_ray.html.tokenizer import tokenize
from arabic_ocr_ray.segmentation import segment_document


def _fv_of(raw, lang="", span_idx=0):
    ts = tokenize(raw, lang)
    seg = segment_document(ts)
    s = seg.subspans[span_idx]
    return feature_vector(ts, s.start, s.end,
                          seg.line_baselines[s.line_idx])


def test_score_weights_are_4_pow_i():
    assert SCORE_WEIGHTS == (1, 4, 16, 64, 256)


def test_fv_has_9_slots_and_plain_span_is_flat():
    fv = _fv_of(b"<p>plain words here</p>")
    assert len(fv) == 9
    score, char_form, corvar, expunc, pospunc, numpunc, hmax, vmax, hole = fv
    assert score == 0 and numpunc == 0 and hole == 0


def test_char_form_length_classes():
    assert _fv_of(b"<p>ab</p>")[1] == 1                       # < 8 chars
    assert _fv_of(b"<p>twelve chars ok</p>")[1] == 2          # < 48
    assert _fv_of(b"<p>" + b"w" * 60 + b"</p>")[1] == 3       # >= 48


def test_corvar_bits():
    # bit 4: first text char uppercase; bit 8: ends with sentence punct
    assert _fv_of(b"<p>Word more</p>")[2] & 4
    assert not _fv_of(b"<p>word more</p>")[2] & 4
    assert _fv_of(b"<p>word more.</p>")[2] & 8
    # Arabic first char also sets bit 4 (upper analog)
    assert _fv_of("<p>كتاب</p>".encode(), "ar")[2] & 4


def test_link_decoration_features():
    # nav item: trimmed span is link-wrapped → numpunc >= 1, pospunc set
    fv = _fv_of(b'<li><a href="/x">Home</a></li>')
    assert fv[5] == 1        # numpunc (one in_link run)
    assert fv[4] == 1        # pospunc: link at span start
    assert fv[3] == 0        # single-token link: not a "hamza"
    # adjacent links merge into ONE in_link run wrapping 3 text tokens
    # → numpunc 1, "hamza" (run covers ≥2 text tokens)
    fv3 = _fv_of(b'<p><a href=1>PP</a> <a href=2>TT</a> <a href=3>CC</a></p>')
    assert fv3[5] == 1 and fv3[3] == 1


def test_three_connected_dots_at_function_level():
    # expunc=2 needs ≥3 separate in_link runs with ≤2 tokens between —
    # reachable on a raw token range (segmentation would fine-cut the
    # excursions first, exactly like contour masking precedes cuts)
    ts = tokenize(b'<p>a <a href=1>x</a> b <a href=2>y</a> c <a href=3>z</a> d</p>')
    fv = feature_vector(ts, 1, len(ts) - 1, 1)
    assert fv[5] == 3        # three runs
    assert fv[3] == 2        # "3 connected dots"


def test_empty_span_returns_empty_fv():
    # F9 contract: no text → [] (merge forward)
    ts = tokenize(b"<p>x</p>")
    assert feature_vector(ts, 0, 1, 0) == []  # markup-only range


def test_hmax_zeroed_below_4():
    # 3 markup↔text transitions < 4 → zeroed (train_recognition.py:329-334)
    ts = tokenize(b"<p>long text <b>x</b></p>")
    fv = feature_vector(ts, 1, len(ts) - 1, 1)
    assert fv[6] == 0
    # 4+ transitions survive
    ts2 = tokenize(b"<p>a <b>b</b> c <b>d</b> e</p>")
    fv2 = feature_vector(ts2, 1, len(ts2) - 1, 1)
    assert fv2[6] >= 4


def test_left_right_open_concavities():
    # unclosed <b> inside the span → R-concavity (open without close)
    ts = tokenize(b"<p>pre <b>bw post</p>")
    seg = segment_document(ts)
    s = seg.subspans[0]
    fv = feature_vector(ts, s.start, s.end, seg.line_baselines[0])
    assert fv[0] == 16  # one R at weight 16, no other points


def test_determinism():
    raw = b'<p>Some text <a href="/x">with link trail</a></p>'
    assert _fv_of(raw) == _fv_of(raw)
