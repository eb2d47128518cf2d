"""Pure, deterministic numeric kernels shared by all stages.

Each kernel mirrors a reference idiom (file:line cites point into
/root/reference).  All integer math — no floats on any path that decides
output text, so results are bit-stable across NumPy versions
(SURVEY.md §7.3 determinism note).
"""

from __future__ import annotations

import numpy as np

#: Sentinel threshold meaning "never split" (guard for the reference's
#: unguarded ``min([])`` crash path in utils.py:42-60 when a line has
#: fewer than three gaps — an engine fix, documented divergence).
NO_SPLIT = 2**31 - 1


def zero_runs(profile) -> list[tuple[int, int, bool]]:
    """Scan ``profile`` for runs of zeros.

    Returns ``[(start, width, closed), ...]`` where *closed* means a
    nonzero value follows the run (the reference's scanner only emits a
    cut when it sees the run end: segment_words.py:24-41, the most
    reused idiom in the codebase — SURVEY.md §2.9 X5).

    Accepts a list or ndarray; ndarrays are converted once — per-element
    numpy scalar extraction inside the scan is ~5× a list index.
    """
    if isinstance(profile, np.ndarray):
        profile = profile.tolist()
    runs: list[tuple[int, int, bool]] = []
    n = len(profile)
    i = 0
    while i < n:
        if profile[i] == 0:
            j = i
            while j < n and profile[j] == 0:
                j += 1
            runs.append((i, j - i, j < n))
            i = j
        else:
            i += 1
    return runs


def zero_run_cuts(profile) -> tuple[list[int], list[int]]:
    """Integer midpoints + widths of *closed* zero runs.

    Parity with the reference scanner (segment_words.py:24-41 /
    segment_words.py:125-145): the cut coordinate is the mean index of
    the zero run (``y/count`` there, a float); we use the exact integer
    floor of that mean, ``start + (width-1)//2``, to stay float-free
    (SURVEY.md §7.3).  The trailing unclosed run is never emitted, same
    as the reference.
    """
    cuts: list[int] = []
    widths: list[int] = []
    for start, width, closed in zero_runs(profile):
        if closed:
            cuts.append(start + (width - 1) // 2)
            widths.append(width)
    return cuts, widths


def adaptive_gap_threshold(widths: list[int]) -> int:
    """Adaptive word/span gap threshold — exact port of the reference
    rule (utils.py:42-60, spec README.md:88-95):

    1. drop the first and last gap (``distances[1:-1]``)
    2. stable-sort distinct widths by frequency, descending
    3. keep the top 3
    4. return ``min(top3) + max(top3) // 4``

    Divergence (documented): the reference crashes on < 1 interior gap
    (``min([])``); we return :data:`NO_SPLIT` so such a line becomes a
    single span.
    """
    interior = list(widths[1:-1])
    if not interior:
        return NO_SPLIT
    # Stable frequency sort using list.count, exactly like the O(n^2)
    # reference expression ``sorted(d, key=d.count, reverse=True)`` —
    # input is a handful of gaps per line, cost is irrelevant.
    by_freq = sorted(interior, key=interior.count, reverse=True)
    top: list[int] = []
    for w in by_freq:  # unique_everseen analog (utils.py:46)
        if w not in top:
            top.append(w)
        if len(top) == 3:
            break
    return min(top) + max(top) // 4


def most_frequent(arr: np.ndarray) -> int:
    """Mode with zero-exclusion fallback — exact port of utils.py:9-19.

    ``np.unique`` sorts values, ``argmax`` takes the first maximal
    count, so ties resolve to the smallest value, same as the
    reference.  If the mode is 0 and nonzero values exist, recompute on
    the nonzero subset; all-zero input returns 0 (the reference would
    crash on the empty recompute — guarded here, divergence documented).
    """
    arr = np.asarray(arr)
    if arr.size == 0:
        return 0
    values, counts = np.unique(arr, return_counts=True)
    mode = int(values[int(np.argmax(counts))])
    if mode == 0:
        nz = arr[arr != 0]
        if nz.size == 0:
            return 0
        values, counts = np.unique(nz, return_counts=True)
        mode = int(values[int(np.argmax(counts))])
    return mode


def dominant_weighted(keys: np.ndarray, weights: np.ndarray) -> int:
    """Key with the maximum total weight; ties → smallest key.

    Baseline analog: the reference's baseline is the argmax of the
    horizontal projection (preprocess.py:8-11); ours is the tag-depth
    carrying the most text mass (SURVEY.md §2.2 M6).
    """
    n = len(keys)
    if n == 0:
        return 0
    if n <= 128:  # typical line/span: dict fold beats numpy dispatch
        acc: dict[int, int] = {}
        for k, w in zip(keys.tolist(), weights.tolist()):
            acc[k] = acc.get(k, 0) + w
        best_w = max(acc.values())
        return min(k for k, w in acc.items() if w == best_w)
    keys = np.asarray(keys)
    weights = np.asarray(weights, dtype=np.int64)
    uniq, inv = np.unique(keys, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sums, inv, weights)
    return int(uniq[int(np.argmax(sums))])  # argmax → first max → smallest key


def trim_to_content(weights, lo: int, hi: int) -> tuple[int, int]:
    """Shrink [lo, hi) to the first/last index with weight > 0.

    Bounding-box trim analog (train_recognition.py:176-196, M12):
    strips leading/trailing weightless (markup/whitespace) tokens from a
    segment.  Returns (lo, lo) if the range has no content.  Pass a
    LIST on the per-document hot path (``TokenStream.wlist``) — numpy
    scalar indexing in the scan costs ~5× a list index.
    """
    if hi - lo <= 256 or not isinstance(weights, np.ndarray):
        i = lo
        while i < hi and weights[i] == 0:
            i += 1
        if i == hi:
            return lo, lo
        j = hi - 1
        while weights[j] == 0:
            j -= 1
        return i, j + 1
    seg = np.asarray(weights[lo:hi])
    nz = np.flatnonzero(seg)
    if nz.size == 0:
        return lo, lo
    return lo + int(nz[0]), lo + int(nz[-1]) + 1


def dominant_weighted_range(dlist: list, wlist: list,
                            lo: int, hi: int) -> int:
    """:func:`dominant_weighted` over TEXT tokens of ``[lo, hi)``
    without materializing masked arrays: one dict fold over the
    list mirrors (text ⇔ weight > 0).  Ties → smallest key; no text
    → 0 — identical contract."""
    acc: dict[int, int] = {}
    for i in range(lo, hi):
        w = wlist[i]
        if w:
            k = dlist[i]
            acc[k] = acc.get(k, 0) + w
    if not acc:
        return 0
    best_w = max(acc.values())
    return min(k for k, w in acc.items() if w == best_w)


def max_window_sum(values: np.ndarray, window: int) -> int:
    """Max sum over any length-``window`` sliding window (cumsum trick).

    Used for the transition-maxima features hmax/vmax
    (train_recognition.py:58-73 analog, F2): the reference takes the
    max per-column/row transition count; we take the max windowed
    markup↔text transition (resp. depth-variation) mass.
    """
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return 0
    if v.size <= window:
        return int(v.sum())
    c = np.concatenate([[0], np.cumsum(v)])
    return int((c[window:] - c[:-window]).max())


def runs_of_mask(mask) -> list[tuple[int, int]]:
    """Maximal True runs of a boolean mask → [(start, end), ...).

    Small masks (per-span excursion tests) take a pure-Python scan —
    the numpy diff/flatnonzero pipeline costs ~4 array allocations,
    which dominates below a few hundred elements."""
    n = len(mask)
    if n == 0:
        return []
    if n <= 512:
        m = mask.tolist() if isinstance(mask, np.ndarray) else mask
        runs: list[tuple[int, int]] = []
        i = 0
        while i < n:
            if m[i]:
                j = i + 1
                while j < n and m[j]:
                    j += 1
                runs.append((i, j))
                i = j
            else:
                i += 1
        return runs
    m = np.asarray(mask, dtype=bool)
    diff = np.diff(m.astype(np.int8))
    starts = list(np.flatnonzero(diff == 1) + 1)
    ends = list(np.flatnonzero(diff == -1) + 1)
    if m[0]:
        starts.insert(0, 0)
    if m[-1]:
        ends.append(m.size)
    return list(zip(starts, ends))
