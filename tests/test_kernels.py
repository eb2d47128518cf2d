"""Kernel micro-fixtures (FIXTURES.md §4 golden_micro)."""

import numpy as np

from arabic_ocr_ray.kernels import (
    NO_SPLIT,
    adaptive_gap_threshold,
    dominant_weighted,
    max_window_sum,
    most_frequent,
    runs_of_mask,
    trim_to_content,
    zero_run_cuts,
    zero_runs,
)


def test_zero_run_cuts_micro():
    # FIXTURES.md: density [0,0,3,5,0,0,0,2,0] → cuts [0.5, 5.0]-equivalent
    # integer midpoints; trailing unclosed run not emitted.
    cuts, widths = zero_run_cuts(np.array([0, 0, 3, 5, 0, 0, 0, 2, 0]))
    assert cuts == [0, 5]
    assert widths == [2, 3]


def test_zero_runs_closed_flag():
    runs = zero_runs(np.array([1, 0, 0, 1, 0]))
    assert runs == [(1, 2, True), (4, 1, False)]


def test_adaptive_gap_threshold_reference_rule():
    # utils.py:42-60: drop ends, freq-sort distinct desc, top3,
    # min + max//4.  gaps [1,3,3,7,2,9] → interior [3,3,7,2] →
    # by freq [3,7,2] → min 2 + 7//4 = 3.
    assert adaptive_gap_threshold([1, 3, 3, 7, 2, 9]) == 3


def test_adaptive_gap_threshold_single_value():
    assert adaptive_gap_threshold([5, 2, 2, 2, 9]) == 2  # [2,2,2]→2+0
    assert adaptive_gap_threshold([1, 4, 1]) == 5        # [4] → 4+1


def test_adaptive_gap_threshold_guard():
    # divergence guard: the reference would crash on min([]).
    assert adaptive_gap_threshold([3, 9]) == NO_SPLIT
    assert adaptive_gap_threshold([]) == NO_SPLIT


def test_most_frequent_zero_fallback():
    # utils.py:9-19: mode; if 0, recompute excluding zeros.
    assert most_frequent(np.array([0, 0, 0, 2, 2, 3])) == 2
    assert most_frequent(np.array([1, 1, 2])) == 1
    assert most_frequent(np.array([0, 0])) == 0  # guarded divergence
    assert most_frequent(np.array([], dtype=int)) == 0
    # tie → smallest value (np.unique sort + first argmax)
    assert most_frequent(np.array([3, 3, 5, 5])) == 3


def test_dominant_weighted():
    # baseline analog: depth with max text mass; tie → smaller depth.
    assert dominant_weighted(np.array([1, 2, 2]), np.array([5, 2, 2])) == 1
    assert dominant_weighted(np.array([1, 2]), np.array([4, 4])) == 1
    assert dominant_weighted(np.array([]), np.array([])) == 0


def test_trim_to_content():
    w = np.array([0, 0, 3, 1, 0, 2, 0])
    assert trim_to_content(w, 0, 7) == (2, 6)
    assert trim_to_content(w, 0, 2) == (0, 0)  # all background


def test_max_window_sum():
    assert max_window_sum(np.array([1, 0, 1, 1]), 2) == 2
    assert max_window_sum(np.array([1, 1]), 8) == 2
    assert max_window_sum(np.array([], dtype=int), 4) == 0


def test_runs_of_mask():
    assert runs_of_mask(np.array([1, 1, 0, 1], dtype=bool)) == [(0, 2), (3, 4)]
    assert runs_of_mask(np.array([0, 0], dtype=bool)) == []
    assert runs_of_mask(np.array([1], dtype=bool)) == [(0, 1)]
