"""Distributed trainer ≡ sequential fold (order-insensitive monoid),
and rejection of misaligned docs."""

from arabic_ocr_ray.model import PrototypeModel
from arabic_ocr_ray.pipelines.train import train_model
from arabic_ocr_ray.sources.pages import build_page
from arabic_ocr_ray.templates import Templates
from arabic_ocr_ray.training import doc_training_examples


def _sequential_fold(n, seed):
    tpl = Templates()
    triples = []
    for i in range(n):
        r = build_page(seed, i)
        ex, _, _ = doc_training_examples(r["html"], r["lang"], r["spans"], tpl)
        triples.extend(ex)
    return PrototypeModel.from_triples(triples)


def test_distributed_equals_sequential(ray_session, pages_parquet):
    model, stats = train_model(pages_parquet["pages"],
                               pages_parquet["spans"], num_partitions=4,
                               concurrency=2)
    ref = _sequential_fold(pages_parquet["n"], pages_parquet["seed"])
    assert model.mapping == ref.mapping  # bit-identical canonical model
    assert stats["rejected_spans"] == 0
    assert stats["total_spans"] > 0
    assert stats["prototypes"] == ref.n_prototypes


def test_misaligned_doc_rejected():
    tpl = Templates()
    r = build_page(5, 1)
    golden = list(r["spans"])
    golden.insert(0, ("content", "phantom block"))  # break alignment
    ex, rej, tot = doc_training_examples(r["html"], r["lang"], golden, tpl)
    assert ex == []
    assert rej == tot == len(golden)


def test_validation_predicates_filter():
    from arabic_ocr_ray.model import validate_example

    assert validate_example("content", [0, 2, 4, 0, 0, 0, 0, 0, 0])
    assert not validate_example("content", [0, 2, 4, 0, 1, 2, 0, 0, 0])
    assert validate_example("nav", [0, 1, 4, 0, 1, 1, 0, 0, 0])
    assert not validate_example("nav", [0, 1, 4, 0, 0, 0, 0, 0, 0])
    assert validate_example("unknown-label", [0] * 9)  # no registry → pass


def test_model_round_trip(tmp_path):
    m = PrototypeModel.from_triples([
        ("content", [0, 2, 4, 0, 0, 0, 0, 0, 0]),
        ("nav", [0, 1, 4, 0, 1, 1, 0, 0, 0]),
        ("content", [0, 2, 4, 0, 0, 0, 0, 0, 0]),  # dup → dedup
    ])
    assert m.n_prototypes == 2
    p = str(tmp_path / "m.json")
    m.save(p)
    m2 = PrototypeModel.load(p)
    assert m2.mapping == m.mapping
    # unknown bucket ⇒ empty label (integrator.py:187)
    assert m2.predict_one([999, 0, 0, 0, 0, 0, 0, 0, 0]) == ""
    # nearest in bucket
    assert m2.predict_one([0, 2, 4, 0, 0, 0, 0, 0, 0]) == "content"
    assert m2.predict_one([0, 1, 4, 0, 1, 1, 0, 0, 0]) == "nav"


def test_load_missing_file_returns_empty():
    assert PrototypeModel.load("/nonexistent/nope.json").n_prototypes == 0
