from .pages import (  # noqa: F401
    build_page,
    ensure_pages_parquet,
    golden_spans_table,
    pages_table,
    read_pages,
)
