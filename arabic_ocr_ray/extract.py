"""Single-document extraction: the fused per-row chain.

tokenize (M1-M3) → segment (M4-M13, C1-C3) → template mask (C2) →
features (F1-F8) → bucket-NN labels (F10) → span assembly
(segment_words.py:162-206 analog).

Assembly contract (the engine's canonical separator, FIXTURES.md §1):
within a line, kept (content) sub-span texts join with a single space
— the reference's ``' ' + word`` accumulator (segment_words.py:188) —
and non-empty lines join with ``\\n`` (engine divergence: the reference
flattens the whole page into one space-joined string; we keep line
structure, documented).  Arabic pages substitute the composite
sentinel back on the way out (``replace_composities``,
integrator.py:39-43).

This is a pure function of one row — called from inside the
classifier actor pool's ``__call__`` over Arrow batches.
"""

from __future__ import annotations

from .features import feature_vector
from .html.tokenizer import COMPOSITE, COMPOSITE_SENTINEL, tokenize
from .model import CONTENT_LABEL, PrototypeModel
from .segmentation import segment_document
from .templates import Templates


#: Single-token label-cache bound: clear-on-full (cheap, no LRU
#: bookkeeping); sized so a worker's cache of distinct (token, depth
#: flags, link flag) keys stays far under one block's memory.
_LABEL_CACHE_MAX = 200_000


def extract_document(
    html: bytes,
    lang: str,
    model: PrototypeModel,
    templates: Templates,
    reading_order: str = "document",
    label_cache: dict | None = None,
) -> dict:
    """Extract main content from one page; returns per-doc stats too.

    ``reading_order``: ``"document"`` (default) emits sub-spans within
    a line in document order; ``"rtl"`` reverses them, matching the
    reference's right-to-left word iteration
    (segment_words.py:162-170 — it walks ``reversed(words)`` and
    prepends, so the output string lists the rightmost word first).
    Line order is unaffected (lines are already top-to-bottom in both).

    ``label_cache``: optional per-actor dict memoizing the FULL label
    decision (template match → fv → prototype-NN) for SINGLE-token
    spans.  For those spans the decision is a pure function of
    ``(text, depth≥base+2, depth≤base−2, in_link)`` — the exact inputs
    of ``features._single_token_fv`` — and web text repeats tokens
    heavily (nav words, boilerplate), so the hit rate is high.  The
    caller owns the dict and MUST key it to one (model, templates)
    pair (``ExtractText`` creates it per actor in ``__init__``).
    """
    if reading_order not in ("document", "rtl"):
        raise ValueError(f"reading_order={reading_order!r}")
    ts = tokenize(html, lang)
    seg = segment_document(ts)

    n_content = 0
    line_texts: dict[int, list[str]] = {}
    dlist = ts.dlist
    in_link = ts.in_link
    for sub in seg.subspans:
        base = seg.line_baselines[sub.line_idx]
        if label_cache is not None and sub.end - sub.start == 1:
            i = sub.start
            d = dlist[i]
            key = (sub.text, d >= base + 2, d <= base - 2,
                   bool(in_link[i]))
            hit = label_cache.get(key)
            if hit is None:
                tlabel = templates.match(sub.text)
                if tlabel:
                    hit = (tlabel, True)
                else:
                    fv = feature_vector(ts, i, sub.end, base)
                    hit = (model.predict_one(fv) if fv else "", False)
                if len(label_cache) >= _LABEL_CACHE_MAX:
                    label_cache.clear()
                label_cache[key] = hit
            label, is_t = hit
            if is_t:
                sub.is_template = True
        else:
            tlabel = templates.match(sub.text)
            if tlabel:
                sub.is_template = True
                label = tlabel
            else:
                fv = feature_vector(ts, sub.start, sub.end, base)
                label = model.predict_one(fv) if fv else ""
        if label == CONTENT_LABEL:
            n_content += 1
            line_texts.setdefault(sub.line_idx, []).append(sub.text)

    rtl = reading_order == "rtl"
    parts = []
    for li in range(len(seg.line_ranges)):
        if li in line_texts:
            spans = line_texts[li]
            parts.append(" ".join(reversed(spans) if rtl else spans))
    text = "\n".join(parts)
    if lang == "ar":
        text = text.replace(COMPOSITE_SENTINEL, COMPOSITE)

    return {
        "extracted_text": text,
        "n_tokens": len(ts),
        "n_lines": len(seg.line_ranges),
        "n_spans": len(seg.subspans),
        "n_content_spans": n_content,
    }


def segment_stats(html: bytes, lang: str) -> dict:
    """Segmentation-only stats for one page (the ``process.py`` stats
    job analog, with the A5 max-tracking bug FIXED — process.py:185
    returns the loop's last value instead of the tracked maxima;
    SURVEY.md §2.6 A5: do not reproduce)."""
    ts = tokenize(html, lang)
    seg = segment_document(ts)
    span_lens = [len(s.text) for s in seg.subspans]
    return {
        "n_tokens": len(ts),
        "n_lines": len(seg.line_ranges),
        "n_spans": len(seg.subspans),
        "max_span_chars": max(span_lens) if span_lens else 0,
        "baseline_depth": seg.baseline,
    }
