"""Score-bucketed nearest-prototype classifier — the model of the engine.

Persisted shape is exactly the reference's ``config_map.json``
(built at integrator.py:153-159, loaded at integrator.py:163-170):

    { "<score>": [ [label, [9 ints]], ... ], ... }

Prediction (``match_feat_to_char`` semantics, integrator.py:181-200):
bucket lookup by ``str(score)``; within the bucket the nearest
prototype by Euclidean distance wins, first-seen on ties (the
reference's strict ``<`` linear scan + early exit on exact match ≡
``np.argmin`` over the bucket matrix); an unknown bucket yields the
empty label (integrator.py:187,198 — an unrecognized segment emits
nothing).

The model is ACTOR STATE: loaded once per worker in the classifier
stage's ``__init__`` (the analog of the one ``load_features_map()``
call reused across all documents, segment_words.py:258), never
shipped per batch and never part of a shuffle (SURVEY.md §2.5 J4).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable

import numpy as np

#: Label the assembly stage keeps (the "ink" class).
CONTENT_LABEL = "content"

#: Default labels (analog of the reference's 29-character alphabet —
#: ours is the boilerplate taxonomy).
LABELS = ("content", "header", "nav", "aside", "footer", "cookie", "ad")

DEFAULT_MODEL_PATH = os.path.join(os.path.dirname(__file__), "default_model.json")


class PrototypeModel:
    """Vectorized score-bucket NN over ``(label, fv)`` prototypes."""

    def __init__(self, mapping: dict[str, list] | None = None):
        self.mapping: dict[str, list] = {}
        self._buckets: dict[str, tuple[np.ndarray, list[str]]] = {}
        if mapping:
            for score, protos in mapping.items():
                self.mapping[score] = [[lab, list(map(int, fv))] for lab, fv in protos]
        self._rebuild()

    # --- persistence (S4/S6 analogs) ------------------------------------
    @classmethod
    def load(cls, path: str = DEFAULT_MODEL_PATH) -> "PrototypeModel":
        """``load_features_map`` parity (integrator.py:163-170): a
        missing/corrupt file yields an empty model, not an error."""
        try:
            with open(path, encoding="utf-8") as f:
                return cls(json.load(f))
        except (OSError, json.JSONDecodeError, UnicodeDecodeError):
            return cls({})

    def save(self, path: str) -> None:
        """``config_map.json`` writer parity (segment_words.py:192-201);
        plain-int conversion replaces the numpy-int64 shim
        (segment_words.py:78-82)."""
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(self.mapping, f, ensure_ascii=False)
        os.replace(tmp, path)

    # --- construction ----------------------------------------------------
    @classmethod
    def from_triples(cls, triples: Iterable[tuple[str, list[int]]]) -> "PrototypeModel":
        """Build from ``(label, fv)`` pairs with exact dedup — the
        set-membership insert of integrator.py:157-159 (A1/D1), which
        makes the training fold an order-insensitive set-union monoid.

        The result is CANONICALIZED (buckets sorted numerically,
        prototypes sorted by (label, fv)) so a distributed trainer's
        arbitrary arrival order yields a bit-identical model — and NN
        tie-breaks ("first min") stay deterministic.  Divergence from
        the reference (insertion-ordered buckets), required for
        order-insensitive distributed folds.
        """
        m = cls({})
        for label, fv in triples:
            m.insert(label, fv)
        m.canonicalize()
        return m

    def canonicalize(self) -> None:
        ordered = {}
        for score in sorted(self.mapping, key=int):
            ordered[score] = sorted(self.mapping[score])
        self.mapping = ordered
        self._rebuild()

    def insert(self, label: str, fv: list[int]) -> bool:
        """Dedup insert; returns True if the prototype was new."""
        key = str(int(fv[0]))
        bucket = self.mapping.setdefault(key, [])
        entry = [label, [int(x) for x in fv]]
        if entry in bucket:
            return False
        bucket.append(entry)
        return True

    def merge(self, other: "PrototypeModel") -> None:
        for _score, protos in other.mapping.items():
            for label, fv in protos:
                self.insert(label, fv)
        # canonicalize so merge order can never change the serialized
        # model (the same invariant from_triples guarantees)
        self.canonicalize()

    def _rebuild(self) -> None:
        self._buckets = {}
        self._exact: dict[tuple, str] = {}
        for score, protos in self.mapping.items():
            if protos:
                mat = np.asarray([fv for _, fv in protos], dtype=np.int64)
                self._buckets[score] = (mat, [lab for lab, _ in protos])
                for lab, fv in protos:
                    # first prototype wins on duplicate fvs — same as the
                    # scan's early exit on distance 0 (integrator.py:195)
                    self._exact.setdefault(tuple(fv), lab)

    # --- prediction (F10/F11) --------------------------------------------
    def predict_one(self, fv: list[int]) -> str:
        # exact-match fast path ≡ the reference's early exit on
        # distance 0 (integrator.py:195-196) — O(1) dict hit
        hit = self._exact.get(tuple(fv))
        if hit is not None:
            return hit
        bucket = self._buckets.get(str(int(fv[0])))
        if bucket is None:
            return ""  # unknown bucket ⇒ empty label (integrator.py:187)
        mat, labels = bucket
        v = np.asarray(fv, dtype=np.int64)
        d2 = ((mat - v) ** 2).sum(axis=1)
        return labels[int(np.argmin(d2))]  # first min ≡ strict-< scan

    def predict(self, fvs: list[list[int]]) -> list[str]:
        return [self.predict_one(fv) if fv else "" for fv in fvs]

    @property
    def n_prototypes(self) -> int:
        return sum(len(p) for p in self.mapping.values())

    def triples(self) -> list[tuple[int, str, list[int]]]:
        """Flat ``(score, label, fv)`` view, deterministically sorted."""
        out = []
        for score, protos in self.mapping.items():
            for label, fv in protos:
                out.append((int(score), label, fv))
        out.sort(key=lambda t: (t[0], t[1], t[2]))
        return out


# --- validation predicate registry (U1 analog) ---------------------------
# The reference's per-character predicate registry
# (``validation_map``, integrator.py:102-133; predicates like
# ``should_have_one_dot`` at integrator.py:46-99) filters training
# examples whose feature vector contradicts the label
# (integrator.py:143-148).  Slots: fv[5]=numpunc (link count),
# fv[1]=char_form (size class).
VALIDATION_MAP: dict[str, list] = {
    "content": [lambda fv: fv[5] <= 1],          # content carries ≤1 link
    "nav": [lambda fv: fv[5] >= 1],              # nav items are links
    "aside": [lambda fv: fv[5] >= 1],
    "header": [lambda fv: fv[1] <= 2],           # site titles are short
    "footer": [],
    "cookie": [],
    "ad": [],
}


def validate_example(label: str, fv: list[int]) -> bool:
    """integrator.py:143-148 semantics: every predicate registered for
    the label must pass; labels with no registry entry always pass."""
    return all(p(fv) for p in VALIDATION_MAP.get(label, ()))
