"""The flagship pipeline: pages Parquet → extracted text Parquet.

SURVEY.md §7.1 shape:

    pages = ray.data.read_parquet(in_dir, columns=["url","html","lang"])
    extracted = pages.map_batches(ExtractText, concurrency=N,
                                  batch_size=B, batch_format="pyarrow")
    extracted.write_parquet(out_dir, partition_cols=["part"])

- column pruning at the read: the golden ``text`` column never leaves
  storage on the hot path;
- the only stateful stage is the actor pool (model in ``__init__``);
- nothing shuffles; streaming end to end with backpressure;
- giant-html skew is tamed by a small ``batch_size`` (a batch of B rows
  bounds worker heap ≈ B × max_html) and the url-hash ``part`` column
  keeps the output layout uniform regardless of input order.
"""

from __future__ import annotations

import os
import time

from ..model import DEFAULT_MODEL_PATH
from ..stages.extract_stage import ExtractText
from ..state.lineage import (  # noqa: F401
    done_url_count,
    recorded_num_partitions,
    PartResumeFilter,
    completed_urls,
    has_done_sidecars,
    read_lineage,
    write_lineage,
)

DEFAULT_BATCH_SIZE = 256


def _default_concurrency() -> int:
    """Actor-pool size: leave CPUs for the read/write task operators —
    a pool reserving every CPU starves them and the pipeline stalls."""
    import ray

    if ray.is_initialized():
        return max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
    return 4


def extract_pages(
    input_path: str,
    model_path: str = DEFAULT_MODEL_PATH,
    model_ref=None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: int | None = None,
    num_partitions: int = 64,
    done_urls_ref=None,
    resume_out_dir: str | None = None,
):
    """Lazy Dataset of (url, extracted_text, html_bytes, n_*, part).

    Resume anti-filters (at most one active):
      - ``resume_out_dir``: PER-PARTITION filter — each task reads the
        done-url sidecar of the row's own part (lineage.py contract);
        the scalable default.
      - ``done_urls_ref``: broadcast driver set (``ray.put`` once) —
        fallback for outputs without sidecars.
    """
    import pyarrow as pa
    import ray.data as rd

    ds = rd.read_parquet(input_path, columns=["url", "html", "lang"])
    if resume_out_dir is not None:
        ds = ds.map_batches(
            PartResumeFilter,
            fn_constructor_kwargs={
                "out_dir": resume_out_dir,
                "num_partitions": num_partitions,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=2,
            num_cpus=0.5,
        )
    elif done_urls_ref is not None:
        import ray

        def drop_done(batch: pa.Table, ref=done_urls_ref) -> pa.Table:
            done = ray.get(ref)
            keep = [u not in done for u in batch.column("url").to_pylist()]
            return batch.filter(pa.array(keep))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    return ds.map_batches(
        ExtractText,
        fn_constructor_kwargs={
            "model_path": model_path,
            "model_ref": model_ref,
            "num_partitions": num_partitions,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or _default_concurrency(),
        num_cpus=1,
    )


def run_extract(
    input_path: str,
    out_dir: str,
    model_path: str = DEFAULT_MODEL_PATH,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: int | None = None,
    num_partitions: int = 64,
    resume: bool = True,
) -> dict:
    """Materializing runner with resume + lineage (north_rule).

    Resume mode is chosen by what the existing output provides:
    per-partition sidecars → the scalable per-part anti-filter
    (no driver set, ``resume_mode="partition"``); legacy output
    without sidecars → broadcast done-set fallback.

    Returns run metrics (docs, bytes, wall_s, docs_per_s, skipped)."""
    import ray
    import ray.data as rd

    t0 = time.monotonic()
    done_ref = None
    resume_out = None
    resume_mode = "none"
    skipped = 0
    if resume and os.path.isdir(out_dir):
        rec_parts = recorded_num_partitions(out_dir)
        if has_done_sidecars(out_dir) and rec_parts is None:
            # sidecars without a recorded modulus (legacy layout):
            # guessing the modulus would read the WRONG sidecar for
            # every url — fall through to the broadcast done-set,
            # which is modulus-independent
            import logging

            logging.getLogger("arabic_ocr_ray").warning(
                "resume: output at %s has done-url sidecars but no "
                "recorded num_partitions; using broadcast resume",
                out_dir)
        if has_done_sidecars(out_dir) and rec_parts is not None:
            if rec_parts != num_partitions:
                import logging

                logging.getLogger("arabic_ocr_ray").warning(
                    "resume: output was written with num_partitions="
                    "%d; overriding requested %d to keep the layout "
                    "and sidecar lookups consistent",
                    rec_parts, num_partitions)
                num_partitions = rec_parts
            resume_out = out_dir
            resume_mode = "partition"
            # skip count = ok rows in the sidecars (the manifest's
            # docs include errored urls, which this rerun retries)
            skipped = done_url_count(out_dir)
        else:
            done = completed_urls(out_dir)
            if done:
                resume_mode = "broadcast"
                skipped = len(done)
                done_ref = ray.put(done)

    ds = extract_pages(
        input_path,
        model_path=model_path,
        batch_size=batch_size,
        concurrency=concurrency,
        num_partitions=num_partitions,
        done_urls_ref=done_ref,
        resume_out_dir=resume_out,
    )
    # Stream straight into the sink: one file per producer block, the
    # url-hash ``part`` kept as a COLUMN (not a hive directory — a
    # random hash key against arbitrary producer blocks would fan out
    # blocks × partitions tiny files, and co-locating first costs an
    # all-to-all of the result; measured slower than extraction itself).
    # Resume works at doc level (url anti-filter) and the per-partition
    # manifest is aggregated from the output's stat columns below.
    ds.write_parquet(out_dir)
    write_lineage(out_dir, num_partitions=num_partitions)

    stats = rd.read_parquet(
        os.path.join(out_dir, "_lineage", "manifest.parquet")
    ).to_pandas()
    wall = time.monotonic() - t0
    docs = int(stats["docs"].sum())
    nbytes = int(stats["html_bytes"].sum())
    return {
        "docs": docs,
        "html_bytes": nbytes,
        "skipped_resume": skipped,
        "resume_mode": resume_mode,
        "wall_s": wall,
        "docs_per_s": docs / wall if wall > 0 else 0.0,
        "bytes_per_s": nbytes / wall if wall > 0 else 0.0,
        "partitions": int(stats.shape[0]),
    }
