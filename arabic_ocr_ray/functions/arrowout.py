"""Typed, metadata-free Arrow output for pandas UDFs.

Ray stores a pandas-returning ``map_groups``/``map_batches`` output as
a pandas block; when a downstream operator needs Arrow, Ray converts
with ``pa.Table.from_pandas``, which (a) attaches the pandas schema
metadata dict — making the block schema UNHASHABLE and defeating Ray's
schema dedup ("Failed to hash the schemas" on every reduce task) — and
(b) gives EMPTY frames object/null column types that mismatch the
non-empty blocks ("Operator produced a RefBundle with a different
schema").  Wrapping the UDF so the conversion happens eagerly, with
metadata stripped and dtypes taken from the (typed) empty frame,
removes both warning classes at the source.
"""

from __future__ import annotations

import functools

import pyarrow as pa


def arrow_clean(fn):
    """Wrap a group/batch UDF returning a DataFrame (or Table) so its
    output enters Ray as a typed, metadata-free Arrow block."""

    @functools.wraps(fn)
    def g(*args, **kwargs):
        out = fn(*args, **kwargs)
        if isinstance(out, pa.Table):
            return out.replace_schema_metadata(None)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    return g
