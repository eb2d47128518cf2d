"""Per-sub-span 9-slot feature vectors — the ``recognize_char`` analog.

Reference mapping (train_recognition.py, README.md §features):

  fv = [score, char_form, corvar, expunc, pospunc, numpunc, hmax, vmax,
        has_hole]                      (train_recognition.py:335 layout)

  - score: Σ label·4**i over structural interest points with weights
    {HOLE:1, L:4, R:16, U:64, D:256} — the CODE's 4**i weights
    (train_recognition.py:289-301), not the README's documented 2**i
    (README.md:247-251); SURVEY.md §2.4 F1: "code wins".
    Interest-point analogs here:
      HOLE — inline element fully enclosed in the span (matched
             open+close inside; F4's all-beams-blocked case)
      L    — close tag whose open lies before the span (left-open
             concavity)
      R    — open tag whose close lies beyond the span (right-open)
      U    — text token nested ≥2 deeper than the line baseline
      D    — text token ≥2 shallower than the line baseline
    Each count is capped at 3 to bound the score-bucket space
    (engine divergence, documented: the reference observed 311 buckets
    organically; we bound ours to 4^5 = 1024 combinations).
  - char_form: size class 1/2/3 (train_recognition.py:309-319 h/w form
    ratio analog → total text chars <8 / <48 / ≥48).
  - corvar: 4 corner bits with weights 1,2,4,8
    (train_recognition.py:323-324, README.md:227-239): first token is
    markup, last token is markup, first text char is upper/Arabic,
    last text char is sentence punctuation.
  - expunc/pospunc/numpunc: decoration features — links play the role
    of diacritical dots (recognize_dots, train_recognition.py:215-258):
    numpunc = link count (capped 3), pospunc = first-link position
    top/mid/bottom → 1/2/3, expunc = decoration kind (0 plain,
    1 "hamza" = a link wrapping ≥2 text tokens, 2 "connected 3 dots" =
    ≥3 adjacent links; is_hamza / is_3_dots_connected,
    train_recognition.py:199-212).
  - hmax/vmax: max windowed markup↔text transition count / depth
    variation (calculate_*_transitions, train_recognition.py:58-73),
    zeroed when < 4 exactly like train_recognition.py:329-334, capped
    at 8.
  - has_hole: 1 iff any hole (train_recognition.py slot 8).

Empty sub-spans (no text) return ``[]`` — the F9 contract
(train_recognition.py:360-363): an empty feature vector merges the
segment forward.
"""

from __future__ import annotations

import numpy as np

from .html.tokenizer import COMPOSITE_SENTINEL, TEXT, TokenStream
from .kernels import max_window_sum

WINDOW = 8
SENTENCE_END = set(".!?…:;؟؛،")
ARABIC_LO, ARABIC_HI = 0x0600, 0x06FF


def _initial_upper(c0: str) -> bool:
    """Corner bit 4: first char is upper/Arabic.  The composite
    sentinel REPRESENTS the Arabic لا, so it keeps the bit (feature
    vectors are unchanged from the old 'L' sentinel, whose isupper()
    set it)."""
    return (c0.isupper() or ARABIC_LO <= ord(c0) <= ARABIC_HI
            or c0 == COMPOSITE_SENTINEL)

SCORE_WEIGHTS = (1, 4, 16, 64, 256)  # HOLE, L, R, U, D — 4**i (code semantics)


def _cap3(n: int) -> int:
    return n if n < 3 else 3


def _single_token_fv(ts: TokenStream, i: int, baseline: int) -> list[int]:
    """Fast path for the dominant case (a trimmed span of one text
    token — every plain paragraph/nav word).  Produces exactly what the
    general path would: no pairs/concavities possible, transitions 0."""
    if ts.kinds[i] != TEXT:
        return []
    t = ts.texts[i]
    if not t:
        return []
    d = int(ts.depths[i])
    n_u = 1 if d >= baseline + 2 else 0
    n_d = 1 if d <= baseline - 2 else 0
    score = 64 * n_u + 256 * n_d
    total = len(t)
    char_form = 1 if total < 8 else (2 if total < 48 else 3)
    c0, c1 = t[0], t[-1]
    corvar = (
        (4 if _initial_upper(c0) else 0)
        + (8 if c1 in SENTENCE_END else 0)
    )
    if ts.in_link[i]:
        return [score, char_form, corvar, 0, 1, 1, 0, 0, 0]
    return [score, char_form, corvar, 0, 0, 0, 0, 0, 0]


def feature_vector(ts: TokenStream, start: int, end: int, baseline: int) -> list[int]:
    """Compute the 9-slot fv for token range [start, end)."""
    if end - start == 1:
        return _single_token_fv(ts, start, baseline)
    return _general_fv(ts, start, end, baseline)


def _general_fv(ts: TokenStream, start: int, end: int, baseline: int) -> list[int]:
    k = ts.kinds[start:end]
    text_idx = np.flatnonzero(k == TEXT)
    if text_idx.size == 0:
        return []  # F9: empty fv ⇒ merge forward
    total_chars = int(ts.weights[start:end].sum())
    if total_chars == 0:
        return []

    # --- structural interest points → score ------------------------------
    holes = 0
    n_l = 0
    n_r = 0
    for i in range(start, end):
        if ts.is_open[i]:
            m = int(ts.match[i])
            if start <= m < end:
                holes += 1
            elif m == -1 or m >= end:
                n_r += 1
        elif ts.is_close[i]:
            m = int(ts.match[i])
            if m != -1 and m < start:
                n_l += 1
    d = ts.depths[start:end]
    td = d[text_idx]
    n_u = int((td >= baseline + 2).sum())
    n_d = int((td <= baseline - 2).sum())

    counts = (_cap3(holes), _cap3(n_l), _cap3(n_r), _cap3(n_u), _cap3(n_d))
    score = sum(c * w for c, w in zip(counts, SCORE_WEIGHTS))

    # --- form class ------------------------------------------------------
    char_form = 1 if total_chars < 8 else (2 if total_chars < 48 else 3)

    # --- corner variance bits -------------------------------------------
    first_text = ts.texts[start + int(text_idx[0])]
    last_text = ts.texts[start + int(text_idx[-1])]
    c0 = first_text[0]
    c1 = last_text[-1]
    corvar = (
        (1 if k[0] != TEXT else 0)
        + (2 if k[-1] != TEXT else 0)
        + (4 if _initial_upper(c0) else 0)
        + (8 if c1 in SENTENCE_END else 0)
    )

    # --- decoration (link = dot) features -------------------------------
    # Links play the role of diacritical dots; detection uses the
    # ``in_link`` containment flag (survives the bbox trim of sub-span
    # edges, unlike the <a> delimiter tokens themselves).  A "dot" is a
    # maximal run of link-contained tokens.
    in_link = ts.in_link[start:end]
    link_runs: list[tuple[int, int]] = []
    i = 0
    n = end - start
    while i < n:
        if in_link[i]:
            j = i
            while j < n and in_link[j]:
                j += 1
            link_runs.append((i, j))
            i = j
        else:
            i += 1
    numpunc = _cap3(len(link_runs))
    if numpunc == 0:
        pospunc = 0
        expunc = 0
    else:
        p = link_runs[0][0]
        pospunc = 1 if 3 * p < n else (3 if 3 * p >= 2 * n else 2)
        expunc = 0
        # "hamza" (is_hamza analog): a link wrapping ≥2 text tokens.
        for lo, hi in link_runs:
            if int((k[lo:hi] == TEXT).sum()) >= 2:
                expunc = 1
                break
        # "3 connected dots" (is_3_dots_connected analog): ≥3 link runs
        # each separated by ≤2 non-link tokens.
        if len(link_runs) >= 3:
            run = 1
            for (plo, phi), (nlo, nhi) in zip(link_runs, link_runs[1:]):
                run = run + 1 if nlo - phi <= 2 else 1
                if run >= 3:
                    expunc = 2
                    break

    # --- transition maxima ----------------------------------------------
    trans = (k[1:] != k[:-1]).astype(np.int64) if len(k) > 1 else np.zeros(0, np.int64)
    hmax = max_window_sum(trans, WINDOW)
    hmax = 0 if hmax < 4 else min(hmax, 8)
    dvar = np.abs(np.diff(d)).astype(np.int64) if len(d) > 1 else np.zeros(0, np.int64)
    vmax = max_window_sum(dvar, WINDOW)
    vmax = 0 if vmax < 4 else min(vmax, 8)

    return [
        score, char_form, corvar, expunc, pospunc, numpunc,
        int(hmax), int(vmax), 1 if holes > 0 else 0,
    ]
