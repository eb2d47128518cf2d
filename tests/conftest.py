"""Shared fixtures.  Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_parquet(tmp_path_factory):
    """t1-style fixture corpus: 150 pages, all hazards, seed 5."""
    import pyarrow.parquet as pq

    from arabic_ocr_ray.sources.pages import golden_spans_table, pages_table

    d = tmp_path_factory.mktemp("pages")
    pages = str(d / "pages.parquet")
    spans = str(d / "spans.parquet")
    pq.write_table(pages_table(150, seed=5), pages, row_group_size=25)
    pq.write_table(golden_spans_table(150, seed=5), spans)
    return {"pages": pages, "spans": spans, "n": 150, "seed": 5}


@pytest.fixture(scope="session")
def default_model():
    from arabic_ocr_ray.model import DEFAULT_MODEL_PATH, PrototypeModel

    m = PrototypeModel.load(DEFAULT_MODEL_PATH)
    assert m.n_prototypes > 0, "default_model.json missing — run scripts/build_default_model.py"
    return m
