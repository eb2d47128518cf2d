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
from ..stages.extract_stage import ExtractText, MixedExtract
from ..state.lineage import (  # noqa: F401
    done_url_count,
    recorded_num_partitions,
    PartResumeFilter,
    completed_urls,
    has_done_sidecars,
    has_stat_sidecars,
    read_lineage,
    write_lineage,
    write_lineage_from,
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
    reading_order: str = "document",
    stage_cls=None,
):
    """Lazy Dataset of (url, extracted_text, html_bytes, n_*, part).

    ``input_path`` is a parquet path (pruned read of url/html/lang) or
    an already-built Dataset with those columns — e.g. the raw-WARC
    ingest (``sources/warc.py:read_warc_pages``).

    ``stage_cls`` swaps the fused extraction stage (default
    :class:`ExtractText`; :class:`stages.extract_stage.MixedExtract`
    adds in-stage PDF dispatch for mixed html/PDF corpora) — the
    resume/lineage plumbing is payload-agnostic.

    Resume anti-filters (at most one active):
      - ``resume_out_dir``: PER-PARTITION filter — each task reads the
        done-url sidecar of the row's own part (lineage.py contract);
        the scalable default.
      - ``done_urls_ref``: broadcast driver set (``ray.put`` once) —
        fallback for outputs without sidecars.
    """
    import pyarrow as pa
    import ray.data as rd

    if isinstance(input_path, rd.Dataset):
        ds = input_path.select_columns(["url", "html", "lang"])
    else:
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

        def drop_done(batch: pa.Table, ref=done_urls_ref,
                      _vs_cache={}) -> pa.Table:
            # value_set built ONCE per worker (mutable-default cache);
            # per batch it's a single vectorized is_in kernel, not a
            # Python membership loop
            import pyarrow.compute as pc

            vs = _vs_cache.get("vs")
            if vs is None:
                vs = _vs_cache["vs"] = pa.array(
                    sorted(ray.get(ref)), pa.string())
            return batch.filter(pc.invert(pc.is_in(
                batch.column("url"), value_set=vs)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")
    return ds.map_batches(
        stage_cls or ExtractText,
        fn_constructor_kwargs={
            "model_path": model_path,
            "model_ref": model_ref,
            "num_partitions": num_partitions,
            "reading_order": reading_order,
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
    reading_order: str = "document",
    mixed: bool = False,
) -> dict:
    """Materializing runner with resume + lineage (north_rule).

    ``mixed=True`` swaps in :class:`MixedExtract` — per-row html/PDF
    dispatch inside the fused stage; everything else (resume modes,
    lineage, the shuffle-free sink) is payload-agnostic.

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
        if (has_stat_sidecars(out_dir)
                and not has_done_sidecars(out_dir)
                and rec_parts is not None):
            # lazy done-url sidecar build: the fresh-run fast path
            # writes only the per-block stat sidecars (no shuffle);
            # the part-keyed sets are derived here, at resume time —
            # the only time anything reads them
            write_lineage(out_dir, num_partitions=rec_parts)
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
        reading_order=reading_order,
        stage_cls=MixedExtract if mixed else None,
    )
    # Fused SHUFFLE-FREE sink: each producer block writes (a) its own
    # data parquet file — content-addressed name (md5 of the block's
    # url column) so a retried task atomically overwrites the same
    # file, matching write_parquet's idempotency — (b) a tiny stat
    # sidecar (url, part, status, …; ~70 B/doc) under _lineage/urls,
    # and returns per-part PARTIAL manifest rows (≤ parts rows per
    # block).  The fresh-run manifest is a ≤ blocks × parts row
    # aggregate; no per-doc shuffle runs at all (the r2 design's
    # write_lineage re-read + groupby was ~6 s of the 25 s bench wall
    # at 32 CPUs).  The part-keyed done-url sidecars the resume filter
    # needs are built LAZILY from the stat sidecars at resume time —
    # the only time they are read.  The url-hash ``part`` stays a
    # COLUMN, not a hive directory (a random hash key against
    # arbitrary producer blocks fans out blocks × partitions tiny
    # files; measured slower than extraction itself).
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..state.lineage import urls_dir as _urls_dir

    os.makedirs(out_dir, exist_ok=True)
    stats_root = _urls_dir(out_dir)
    os.makedirs(stats_root, exist_ok=True)
    stat_cols = ["url", "part", "status", "html_bytes",
                 "n_content_spans"]
    # lineage completeness flags, captured BEFORE the run
    had_stats = has_stat_sidecars(out_dir)
    fresh = (resume_mode == "none" and not had_stats
             and not has_done_sidecars(out_dir))

    def write_block(b: pa.Table) -> pa.Table:
        urls_buf = b.column("url").combine_chunks()
        h = hashlib.md5()
        for buf in urls_buf.buffers():
            if buf is not None:
                h.update(buf)
        digest = h.hexdigest()
        path = os.path.join(out_dir, f"data_{digest}.parquet")
        tmp = f"{path}.tmp{os.getpid()}"
        pq.write_table(b, tmp)
        os.replace(tmp, path)
        spath = os.path.join(stats_root, f"stats_{digest}.parquet")
        tmp = f"{spath}.tmp{os.getpid()}"
        pq.write_table(b.select(stat_cols), tmp)
        os.replace(tmp, spath)
        part = np.asarray(b.column("part").combine_chunks()
                          .cast(pa.int64()), dtype=np.int64)
        hb = np.asarray(b.column("html_bytes").combine_chunks()
                        .cast(pa.int64()), dtype=np.int64)
        cs = np.asarray(b.column("n_content_spans").combine_chunks()
                        .cast(pa.int64()), dtype=np.int64)
        docs = np.bincount(part, minlength=num_partitions)
        hbs = np.bincount(part, weights=hb, minlength=num_partitions)
        css = np.bincount(part, weights=cs, minlength=num_partitions)
        nz = np.flatnonzero(docs)
        return pa.table({
            "part": pa.array(nz.astype(np.int64)),
            "docs": pa.array(docs[nz].astype(np.int64)),
            "html_bytes": pa.array(hbs[nz].astype(np.int64)),
            "content_spans": pa.array(css[nz].astype(np.int64)),
        })

    partials = ds.map_batches(write_block, batch_format="pyarrow",
                              batch_size=None)
    if fresh:
        from ..state.lineage import write_manifest_from_partials

        write_manifest_from_partials(partials, out_dir,
                                     num_partitions)
    else:
        # resumed / appended run: this run's stream holds only NEW
        # rows, and the done-url sidecars the filter reads must
        # survive until the pipeline has executed — drive the write
        # with a cheap count, then rebuild manifest + done sidecars
        # covering old + new rows: from the stat sidecars if they
        # were complete before the run, else from the output itself
        partials.count()
        # use_sidecars must reflect the PRE-run state: if the old
        # output predates the sidecar layout, this run's new sidecars
        # alone would miss every pre-existing row.  The sidecar path
        # also folds in any orphaned data files (crash between the
        # data and sidecar renames of an earlier run).
        write_lineage(out_dir, num_partitions=num_partitions,
                      use_sidecars=had_stats)

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


def extract_incremental(
    old_pages_ds,
    new_pages_ds,
    model_path: str = DEFAULT_MODEL_PATH,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: int | None = None,
    num_partitions: int = 64,
    reading_order: str = "document",
):
    """Incremental crawl extraction: snapshot-diff the two page sets
    on RAW ``html`` bytes (sha1 rows through one id-keyed shuffle —
    page bodies never move through the diff), then run the extraction
    actor pool over ONLY the new snapshot's added/changed pages.
    Unchanged pages are skipped entirely and removed pages produce
    nothing, so the crawl-over-crawl cost is proportional to churn,
    not corpus size.  Output schema = :func:`extract_pages`."""
    import pyarrow as pa

    from ..functions.dedup import snapshot_diff
    from ..functions.joins import hash_join
    from ..stages.extract_stage import ExtractText

    diff = snapshot_diff(
        old_pages_ds.select_columns(["url", "html"]),
        new_pages_ds.select_columns(["url", "html"]),
        col="html", id_col="url",
        num_partitions=num_partitions)

    def todo_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return (b.filter(pc.not_equal(b.column("status"), "removed"))
                .select(["url"]))

    todo = diff.map_batches(todo_only, batch_format="pyarrow")
    # static hint: todo is the snapshot_diff tail — without it the
    # plan-time schema probe runs the whole diff a second time
    pages = hash_join(new_pages_ds, todo, on="url", how="semi",
                      num_partitions=num_partitions,
                      right_schema=pa.schema([("url", pa.string())]))
    return pages.map_batches(
        ExtractText,
        fn_constructor_kwargs={
            "model_path": model_path,
            "num_partitions": num_partitions,
            "reading_order": reading_order,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or _default_concurrency(),
        num_cpus=1,
    )
