"""Projection-profile segmentation: document → lines → spans → sub-spans.

Reference mapping (file:line into /root/reference):

  - Lines   — ``segment_lines`` (segment_words.py:15-75): horizontal
    projection + zero-run scanner.  Here the "row axis" is the sequence
    of inline runs delimited by block-level tags; each block tag is its
    own zero-weight row, so the text-density profile over rows has a
    zero run between any two inline runs and the scanner recovers the
    same line structure.
  - Spans   — word segmentation (segment_words.py:125-170): vertical
    projection (per-token char weights) → gap widths → adaptive
    threshold (utils.py:42-60) → cuts at gaps wider than the threshold.
  - Sub-spans — ``contour_seg`` fine cuts (preprocess.py:272-475):
    within a span, structural excursions (token runs nested deeper than
    the baseline depth, ≥3 tokens long, carrying text — the "≥3
    consecutive baseline points" rule at preprocess.py:395-414) are cut
    out as separate units, with the no-ink-between-cuts merge rule
    (preprocess.py:441-448).
  - Baseline — ``get_baseline_y_coord`` (preprocess.py:8-11) argmax of
    the projection → here the tag-depth holding the most text mass;
    per-line local baseline falls back to the document baseline when it
    deviates by more than 2 (preprocess.py:420-422).

All pure per-document integer computation; invoked inside map_batches.
Ordering contract: the reference iterates words right-to-left
(segment_words.py:162-170, Arabic reading order); we emit document
order — per-document determinism is what matters (SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .html.tokenizer import TEXT, TokenStream
from .kernels import (
    adaptive_gap_threshold,
    dominant_weighted_range,
    runs_of_mask,
    trim_to_content,
    zero_run_cuts,
    zero_runs,
)

#: Minimum token length of a deep structural excursion that earns fine
#: cuts — parity with the reference's ``count > 2`` consecutive-run rule
#: (preprocess.py:408-410).  A 3-token inline element (``<a>text</a>``)
#: is the smallest excursion that separates.
MIN_EXCURSION = 3


@dataclass
class SubSpan:
    line_idx: int
    start: int          # token index (inclusive)
    end: int            # token index (exclusive)
    text: str
    is_template: bool = False  # masked by a boilerplate template (C2)


@dataclass
class Segmented:
    baseline: int                                  # document dominant depth
    line_ranges: list = field(default_factory=list)      # [(start, end)]
    line_baselines: list = field(default_factory=list)   # per line
    subspans: list = field(default_factory=list)         # [SubSpan] doc order


def span_text(ts: TokenStream, start: int, end: int) -> str:
    """Canonical span text: text-token contents joined by single
    spaces (the whitespace-collapse contract, integrator.py:8-9)."""
    wl = ts.wlist
    texts = ts.texts
    return " ".join(
        texts[i] for i in range(start, end) if wl[i]  # text ⇔ w > 0
    )


def line_rows(ts: TokenStream) -> tuple[list[tuple[int, int]], np.ndarray]:
    """Split the token stream into rows: inline runs + one zero row per
    block-level tag.  Returns (row token ranges, row density profile).

    Loops over the block-tag POSITIONS (flatnonzero) rather than every
    token, and reads each run's mass from the cumulative weight sum —
    O(#blocks), not O(#tokens)."""
    rows: list[tuple[int, int]] = []
    hp: list[int] = []
    n = len(ts)
    start = 0
    cw = ts.cumw
    for i in np.flatnonzero(ts.is_block).tolist():
        if i > start:
            rows.append((start, i))
            hp.append(int(cw[i] - cw[start]))
        rows.append((i, i + 1))  # the block tag itself: zero row
        hp.append(0)
        start = i + 1
    if n > start:
        rows.append((start, n))
        hp.append(int(cw[n] - cw[start]))
    return rows, np.asarray(hp, dtype=np.int64)


def segment_lines(ts: TokenStream) -> list[tuple[int, int]]:
    """Lines = maximal runs of nonzero rows in the row density profile
    (M7/M8 semantics: zero runs separate; midpoints are the cut
    coordinates, which for token ranges reduce to the run bounds)."""
    rows, hp = line_rows(ts)
    lines: list[tuple[int, int]] = []
    # Nonzero runs over hp → line row-ranges → token ranges.
    nz = hp > 0
    for r0, r1 in runs_of_mask(nz):
        lines.append((rows[r0][0], rows[r1 - 1][1]))
    return lines


def _range_has_text(ts: TokenStream, lo: int, hi: int) -> bool:
    """O(1) via the cumulative weight sum (text ⇔ weight > 0)."""
    return ts.cumw[hi] > ts.cumw[lo]


def segment_spans(ts: TokenStream, start: int, end: int) -> list[tuple[int, int]]:
    """Word-analog segmentation of one line (segment_words.py:125-170).

    Zero-run scanner over per-token weights → gap midpoints + widths;
    adaptive threshold (utils.py:42-60); cuts only at gaps wider than
    the threshold (``distances[i] > distance``, segment_words.py:152-155,
    strictly greater).  Segments with no text merge forward — the F9
    empty-feature-vector rule (train_recognition.py:360-363).
    """
    cuts, widths = zero_run_cuts(ts.wlist[start:end])
    if cuts:
        thr = adaptive_gap_threshold(widths)
        cuts = [c for c, wd in zip(cuts, widths) if wd > thr]
    bounds = [start + c for c in cuts] + [end]
    spans: list[tuple[int, int]] = []
    last = start
    for b in bounds:
        lo, hi = trim_to_content(ts.wlist, last, b)
        if hi > lo:  # has text → emit; else merge forward (F9)
            # UNtrimmed bounds: the fine-cut stage (contour_seg analog)
            # operates on the whole word image incl. margins
            # (preprocess.py:272-475); sub-spans are trimmed afterwards.
            spans.append((last, b))
            last = b
    return spans


def fine_cuts(ts: TokenStream, start: int, end: int, baseline: int) -> list[int]:
    """Structural sub-span cut points inside [start, end) — the
    ``contour_seg`` analog (preprocess.py:272-475).

    Candidates: maximal runs of tokens nested strictly deeper than the
    line baseline, at least :data:`MIN_EXCURSION` tokens long and
    carrying text (the ≥3-consecutive-baseline-points rule transposed:
    the *excursion* is the glyph body, its bounds are where the stream
    returns to the baseline).  Cuts fall at both bounds.  Then the
    merge rule of preprocess.py:441-448: a cut whose following segment
    holds no text is dropped (segment merges forward).
    """
    dl = ts.dlist
    over = False
    for i in range(start, end):  # early-exit max (flat span = common)
        if dl[i] > baseline:
            over = True
            break
    if not over:
        return []  # flat span (the common case): no excursions
    d = ts.depths[start:end]
    deep = d > baseline
    cand: list[int] = []
    for r0, r1 in runs_of_mask(deep):
        if r1 - r0 >= MIN_EXCURSION and _range_has_text(
                ts, start + r0, start + r1):
            if r0 > 0:
                cand.append(start + r0)
            if r1 < end - start:
                cand.append(start + r1)
    if not cand:
        return []
    cand = sorted(set(cand))
    # Drop a cut when no text lies between it and the next cut
    # (preprocess.py:441-448 "no ink above baseline between cuts").
    kept: list[int] = []
    for i, c in enumerate(cand):
        nxt = cand[i + 1] if i + 1 < len(cand) else end
        if _range_has_text(ts, c, nxt):
            kept.append(c)
    return kept


def segment_document(ts: TokenStream) -> Segmented:
    """Full segmentation chain for one document (document → lines →
    spans → sub-spans), emitting sub-spans in document order."""
    n = len(ts)
    baseline = dominant_weighted_range(ts.dlist, ts.wlist, 0, n)
    seg = Segmented(baseline=baseline)

    for ls, le in segment_lines(ts):
        local = dominant_weighted_range(ts.dlist, ts.wlist, ls, le)
        # C3 note (preprocess.py:420-422): the reference distrusts a
        # CONTOUR's local baseline when it strays >2 from its LINE
        # baseline.  In this engine sub-spans inherit the line baseline
        # directly, which realizes that rule by construction; a
        # line→document fallback (the first mapping attempted) was
        # removed — in the DOM, inter-line depth variance is
        # structural (nav at depth 6 vs content under k wrapper divs),
        # and the fallback mis-baselined deeply-wrapped low-content
        # pages (caught by the wrap-variation golden soak).
        line_idx = len(seg.line_ranges)
        seg.line_ranges.append((ls, le))
        seg.line_baselines.append(local)

        for ss, se in segment_spans(ts, ls, le):
            cuts = fine_cuts(ts, ss, se, local)
            bounds = [ss] + cuts + [se]
            last = bounds[0]
            for b in bounds[1:]:
                lo, hi = trim_to_content(ts.wlist, last, b)
                if hi > lo:
                    seg.subspans.append(
                        SubSpan(line_idx, lo, hi, span_text(ts, lo, hi))
                    )
                    last = b
                # else: empty sub-span merges forward (F9)
    return seg


def line_profile_cuts(profile: np.ndarray) -> list[int]:
    """Exposed for parity tests: integer midpoints of closed zero runs
    (segment_words.py:24-41 scanner), see kernels.zero_run_cuts."""
    cuts, _ = zero_run_cuts(np.asarray(profile))
    return cuts


__all__ = [
    "Segmented",
    "SubSpan",
    "fine_cuts",
    "line_profile_cuts",
    "line_rows",
    "segment_document",
    "segment_lines",
    "segment_spans",
    "span_text",
    "zero_runs",
]
