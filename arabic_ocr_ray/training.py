"""Training fold: labeled golden spans → classifier prototypes.

Mirrors the reference's train mode (segment_words.py:173-189 +
integrator.py:136-160):

  - positional alignment: detected sub-spans zip against golden spans
    by position (the ``curr_word_idx`` cursor, J2);
  - rejection: a document whose detected span count or span texts
    disagree with the golden spans contributes NOTHING and is counted
    (the reference rejects per word when detected-char count != golden
    length, integrator.py:138-139; our unit of rejection is the doc);
  - validation predicates (``validation_map``, integrator.py:143-148)
    filter label-contradicting examples;
  - template-masked spans are skipped — the predict path never sends
    them to the NN, so they need no prototypes (the glyph-template mask
    analog, preprocess.py:329-393);
  - exact dedup on (score, label, fv) — the set-membership insert of
    integrator.py:157-159, which makes the fold an order-insensitive,
    commutative set-union monoid → safe to distribute (SURVEY.md §2.6
    A1).

Golden span texts are normalized with the composite substitution for
Arabic docs before comparison, exactly like the reference's golden-text
loader (integrator.py:12-13).
"""

from __future__ import annotations

from .features import feature_vector
from .html.tokenizer import COMPOSITE, COMPOSITE_SENTINEL, tokenize
from .model import validate_example
from .segmentation import segment_document
from .templates import Templates


def doc_training_examples(
    html: bytes,
    lang: str,
    golden: list[tuple[str, str]],
    templates: Templates,
) -> tuple[list[tuple[str, list[int]]], int, int]:
    """One document → (accepted (label, fv) examples, rejected_spans,
    total_spans).  Rejected == total when alignment fails."""
    ts = tokenize(html, lang)
    seg = segment_document(ts)
    exp = golden
    if lang == "ar":
        exp = [(lab, t.replace(COMPOSITE, COMPOSITE_SENTINEL)) for lab, t in exp]
    total = len(exp)
    if len(seg.subspans) != total or any(
        s.text != t for s, (_, t) in zip(seg.subspans, exp)
    ):
        return [], total, total  # doc rejected (J2 mismatch)

    out: list[tuple[str, list[int]]] = []
    rejected = 0
    for s, (label, _) in zip(seg.subspans, exp):
        if templates.match(s.text):
            continue  # masked: classified by template, not NN
        fv = feature_vector(ts, s.start, s.end,
                            seg.line_baselines[s.line_idx])
        if not fv:
            rejected += 1  # F9: empty fv
            continue
        if not validate_example(label, fv):
            rejected += 1  # U1 predicate rejection
            continue
        out.append((label, fv))
    return out, rejected, total
