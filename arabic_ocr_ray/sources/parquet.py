"""Parquet read with a HASHABLE schema.

``pyarrow.Schema`` objects that carry pandas metadata (written by
``pandas.to_parquet`` — the testdata tables and the fixture files)
are unhashable (the embedded dict), which defeats Ray Data's
block-schema deduplication and floods every read stage's logs with
"Failed to hash the schemas (for deduplication)" warnings.  Reading
with the metadata-stripped schema restores dedup and silence; the
data itself is unchanged.
"""

from __future__ import annotations


def read_parquet_clean(path: str, columns: list[str] | None = None,
                       **kwargs):
    """``ray.data.read_parquet`` with the file's schema metadata
    stripped.  ``path`` must be a single parquet file (the engine's
    table-per-file layout); directories fall back to a plain read."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    if os.path.isfile(path) and "schema" not in kwargs:
        import pyarrow as pa

        schema = pq.read_schema(path).remove_metadata()
        if columns:
            # schema must match the pruned projection, else the read
            # task fails on "Schema at index 0 was different"
            schema = pa.schema([schema.field(c) for c in columns])
        kwargs["schema"] = schema
    return rd.read_parquet(path, columns=columns, **kwargs)
