"""Build arabic_ocr_ray/default_model.json from the seeded fixture
grammar — the committed analog of the reference's trained
``config_map.json`` (1.4 MB, 311 buckets / 32k prototypes there; a few
dozen prototypes here because the fixture grammar's feature space is
small by design).

Sequential fold (A2 analog, segment_words.py:258-263); the distributed
trainer (pipelines/train.py) must produce the identical model —
asserted by tests/test_train.py.

Usage: python scripts/build_default_model.py [n_pages] [seed]
"""

import sys

sys.path.insert(0, ".")

from arabic_ocr_ray.model import DEFAULT_MODEL_PATH, PrototypeModel  # noqa: E402
from arabic_ocr_ray.sources.pages import build_page  # noqa: E402
from arabic_ocr_ray.templates import Templates  # noqa: E402
from arabic_ocr_ray.training import doc_training_examples  # noqa: E402


def main(n: int = 3000, seed: int = 1) -> None:
    templates = Templates()
    triples = []
    rejected = total = rejected_docs = 0
    for i in range(n):
        r = build_page(seed, i)
        ex, rej, tot = doc_training_examples(
            r["html"], r["lang"], r["spans"], templates)
        triples.extend(ex)
        rejected += rej
        total += tot
        if rej == tot and tot:
            rejected_docs += 1
    model = PrototypeModel.from_triples(triples)
    model.save(DEFAULT_MODEL_PATH)
    print(f"n={n} seed={seed} spans={total} rejected_spans={rejected} "
          f"rejected_docs={rejected_docs} prototypes={model.n_prototypes} "
          f"buckets={len(model.mapping)} -> {DEFAULT_MODEL_PATH}")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
