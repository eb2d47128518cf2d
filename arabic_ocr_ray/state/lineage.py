"""Per-partition lineage + doc-level resume support.

The reference's only checkpoint is rewriting the whole model JSON after
every document in train mode (segment_words.py:192-201); predict mode
re-runs everything.  The engine writes:

  - the extracted corpus as partitioned Parquet
    (``write_parquet(partition_cols=["part"])``, part = crc32(url) % P
    — a deterministic layout, NOT arrival order, SURVEY.md §4);
  - a lineage manifest ``<out>/_lineage/`` with per-partition
    ``(part, docs, html_bytes, content_spans)`` — the
    "(partition_id, urls, docs, bytes, …)" record of SURVEY.md §1.2.

Resume contract (doc-level anti-filter): a rerun reads ONLY the ``url``
column of the existing output (column-pruned), broadcasts the done-set
via ``ray.put``, and drops finished rows inside ``map_batches`` before
any extraction work — a broadcast anti-semi-join, no shuffle.  At
10^12-doc scale the same anti-filter runs per PARTITION (read one part
dir's urls inside the task that extends it); the fixture-scale
implementation materializes the set on the driver, documented here.
"""

from __future__ import annotations

import os

LINEAGE_DIR = "_lineage"


def completed_urls(out_dir: str):
    """Set of urls already SUCCESSFULLY extracted into ``out_dir``
    (or None).  Rows with an error status are excluded so a rerun
    retries them; note a retried url leaves the superseded error row
    behind in the old file — corpus readers should prefer non-error
    rows per url (extraction is total, so this path is defensive)."""
    if not os.path.isdir(out_dir):
        return None
    import pyarrow as pa
    import pyarrow.dataset as pads

    try:
        dataset = pads.dataset(out_dir, format="parquet",
                               partitioning="hive",
                               ignore_prefixes=[".", "_"])
        cols = ["url"]
        if "status" in dataset.schema.names:
            cols.append("status")
        tbl = dataset.to_table(columns=cols)
    except (OSError, pa.ArrowInvalid):
        return None
    if tbl.num_rows == 0:
        return None
    urls = tbl.column("url").to_pylist()
    if "status" in cols:
        # rows that FAILED extraction are not complete — a rerun (with
        # a fixed model/code) must retry them, not skip them
        status = tbl.column("status").to_pylist()
        return {u for u, s in zip(urls, status)
                if not (s or "").startswith("error")}
    return set(urls)


def write_lineage(out_dir: str) -> None:
    """(Re)build the per-partition manifest from the written output.

    Reads ONLY the three stat columns of the output with a PARALLEL
    Ray scan (stat rows are ~24 bytes/doc — the groupby shuffle here
    moves partial aggregates, not documents) and writes
    ``_lineage/manifest.parquet`` with ``(part, docs, html_bytes,
    content_spans)``.  Covers everything present on disk, so a resumed
    run's manifest is complete by construction.  At 10^12-doc scale
    the equivalent is incremental per-partition manifests emitted next
    to each output shard."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    manifest = (
        rd.read_parquet(out_dir,
                        columns=["part", "html_bytes", "n_content_spans"])
        .groupby("part")
        .aggregate(Count(alias_name="docs"),
                   Sum("html_bytes", alias_name="html_bytes"),
                   Sum("n_content_spans", alias_name="content_spans"))
        .to_pandas()
    )
    path = os.path.join(out_dir, LINEAGE_DIR)
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(manifest, preserve_index=False),
                   os.path.join(path, "manifest.parquet"))


def read_lineage(out_dir: str):
    import pyarrow.dataset as pads

    path = os.path.join(out_dir, LINEAGE_DIR)
    if not os.path.isdir(path):
        return None
    return pads.dataset(path, format="parquet").to_table()
