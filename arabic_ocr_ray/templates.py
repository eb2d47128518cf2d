"""Boilerplate template matchers — the glyph-template analog.

The reference template-matches 14 glyph patterns (``patterns/*.png``)
against every contour with per-template thresholds 0.65–0.8 and masks
the hits before cutting (``template_match`` preprocess.py:245-269, call
sites preprocess.py:329-393).  Its #1 inefficiency is re-reading every
template image from disk on every call (preprocess.py:247-248,
SURVEY.md §2.1 S8) — here the patterns are compiled ONCE per actor in
the classifier stage's ``__init__`` and shared across all batches.

A sub-span whose text is covered by a template match at or above the
template's threshold (matched chars / span chars — the analog of the
normalized correlation threshold) is labeled directly, bypassing the
prototype-NN classifier, exactly like masked glyph regions bypass the
cut-point search.  The drop-trailing-"DAL" special case
(preprocess.py:450-461) maps to the read-more/continue-reading
trailer template: a trailing sub-span it matches is masked rather than
cut-merged.  The pattern set is the user-extension surface (U3):
``Templates(extra=[...])`` accepts drop-in additions with per-pattern
thresholds.
"""

from __future__ import annotations

import re

# (label, pattern, coverage threshold)
DEFAULT_TEMPLATES: list[tuple[str, str, float]] = [
    ("cookie", r"(?:we use cookies|this (?:web)?site uses cookies|"
               r"cookie (?:policy|settings|preferences|consent)|"
               r"accept(?: all)? cookies)", 0.20),
    ("footer", r"(?:©|\(c\)\s*\d{4}|copyright\s+\d{4}|all rights reserved)", 0.15),
    ("nav", r"skip to (?:main )?content", 0.50),
    ("nav", r"(?:privacy policy|terms of (?:service|use)|cookie policy)", 0.45),
    ("ad", r"(?:subscribe to our newsletter|sign up for (?:our )?updates|"
           r"advertisement|sponsored content)", 0.30),
    ("nav", r"(?:read more|continue reading|learn more)\s*(?:»|→|>>)?", 0.60),
    ("aside", r"(?:related (?:articles|posts|links)|popular posts|"
              r"recent posts|trending now)", 0.50),
]


class Templates:
    """Compiled boilerplate patterns with per-pattern thresholds."""

    def __init__(self, extra: list[tuple[str, str, float]] | None = None):
        specs = DEFAULT_TEMPLATES + list(extra or [])
        self._compiled = [
            (label, re.compile(pat, re.IGNORECASE), thr)
            for label, pat, thr in specs
        ]
        # Literal pre-gate: every DEFAULT pattern requires one of these
        # substrings, and C-level ``in`` over the lowered span is far
        # cheaper than N regex scans (a union-alternation regex was
        # tried and is SLOWER — python re has no Aho-Corasick).  The
        # gate is sound only for the default set, so drop-in extras
        # disable it.
        self._gate_literals = (
            "cookie", "©", "(c)", "copyright", "rights reserved",
            "skip to", "privacy", "terms of", "subscribe", "sign up",
            "advertis", "sponsor", "read more", "continue reading",
            "learn more", "related", "popular", "recent", "trending",
        ) if not extra else None

    def match(self, text: str) -> str:
        """Return the masking label for ``text`` or '' if no template
        reaches its coverage threshold.  Non-overlapping ``finditer``
        plays the role of the reference's near-duplicate hit dedup
        (preprocess.py:259-261)."""
        if not text:
            return ""
        if self._gate_literals is not None:
            # casefold(), not lower(): IGNORECASE matches under full
            # case-folding (e.g. U+017F 'ſ' folds to 's' but lowers to
            # itself), and the gate must be a strict SUPERSET of what
            # the patterns can match or a span the ungated matcher
            # would label slips through unlabeled.  Plain loop, not
            # any(genexpr): this gate runs per sub-span × 19 literals
            # and the generator frame was a measured profile line.
            low = text.casefold()
            for k in self._gate_literals:
                if k in low:
                    break
            else:
                return ""
        n = len(text)
        for label, rx, thr in self._compiled:
            if rx.search(text) is None:
                continue
            covered = sum(m.end() - m.start() for m in rx.finditer(text))
            if covered >= thr * n:
                return label
        return ""
