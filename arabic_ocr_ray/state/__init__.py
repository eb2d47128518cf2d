from .lineage import completed_urls, write_lineage  # noqa: F401
