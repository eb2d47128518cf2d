"""Per-partition lineage + resume support.

The reference's only checkpoint is rewriting the whole model JSON after
every document in train mode (segment_words.py:192-201); predict mode
re-runs everything.  The engine writes:

  - the extracted corpus as streaming Parquet with a deterministic
    url-hash ``part`` column (part = crc32(url) % P — a stable layout,
    NOT arrival order, SURVEY.md §4);
  - a lineage manifest ``<out>/_lineage/manifest.parquet`` with
    per-partition ``(part, docs, html_bytes, content_spans)``;
  - per-partition done-url sidecars
    ``<out>/_lineage/done_urls/part=K.parquet`` (url column only,
    successful rows, deduplicated) — each written by the group task
    that owns the part, never collected on the driver.

Resume contract (per-partition anti-filter): a rerun maps each input
row to its part and drops it iff its url appears in THAT part's
done-url sidecar, which is read INSIDE the filter actor (LRU-cached
per actor, ``cache_parts`` sidecars resident at a time).  No
full-corpus url set ever exists in any single process — the r1
driver-broadcast done-set (a driver OOM at 10^12 docs) survives only
as the explicit ``resume_mode="broadcast"`` fallback for outputs that
predate the sidecar layout.  At scale, input co-partitioned by the
same url-hash key makes the cache hit rate ~1 (the engine's "one
partitioning key reused across stages" rule).

Superseded rows: a retried url leaves its old ``error:`` row behind in
the output files.  The manifest aggregation prefers the non-error row
per url (counts stay exact), and :func:`dedup_superseded` gives
readers the same rule as a Dataset transform.
"""

from __future__ import annotations

import os
import zlib

LINEAGE_DIR = "_lineage"
DONE_DIR = "done_urls"
#: per-block stat sidecars (url, part, status, html_bytes,
#: n_content_spans) written by the SAME task that writes the data
#: file — no shuffle on the fresh-run path; the part-keyed done-url
#: sidecars are derived from these LAZILY, at resume time (the only
#: time they are needed)
URLS_DIR = "urls"


def _done_path(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, LINEAGE_DIR, DONE_DIR,
                        f"part={part}.parquet")


def urls_dir(out_dir: str) -> str:
    return os.path.join(out_dir, LINEAGE_DIR, URLS_DIR)


def has_stat_sidecars(out_dir: str) -> bool:
    d = urls_dir(out_dir)
    return os.path.isdir(d) and any(
        f.endswith(".parquet") for f in os.listdir(d))


def completed_urls(out_dir: str):
    """Driver-side done-set (or None) — the BROADCAST resume fallback.
    Excludes rows with an error status so a rerun retries them."""
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


class PartResumeFilter:
    """Per-partition resume anti-filter (actor-pool ``map_batches``
    stage).  Holds an LRU of per-part done-url sets read from the
    output's sidecars — memory bounded by ``cache_parts`` × part size,
    never the corpus."""

    def __init__(self, out_dir: str, num_partitions: int,
                 cache_parts: int = 64):
        from collections import OrderedDict

        self.out_dir = out_dir
        self.num_partitions = num_partitions
        self.cache_parts = cache_parts
        self._cache: OrderedDict[int, set] = OrderedDict()

    def _done(self, part: int) -> set:
        s = self._cache.get(part)
        if s is not None:
            self._cache.move_to_end(part)
            return s
        import pyarrow.parquet as pq

        path = _done_path(self.out_dir, part)
        s = (set(pq.read_table(path, columns=["url"])
                 .column("url").to_pylist())
             if os.path.exists(path) else set())
        self._cache[part] = s
        while len(self._cache) > self.cache_parts:
            self._cache.popitem(last=False)
        return s

    def __call__(self, batch):
        import pyarrow as pa

        urls = batch.column("url").to_pylist()
        keep = [
            u not in self._done(zlib.crc32(u.encode())
                                % self.num_partitions)
            for u in urls
        ]
        return batch.filter(pa.array(keep))


def write_lineage_from(stats_ds, out_dir: str,
                       num_partitions: int | None = None) -> None:
    """Build the per-partition manifest AND done-url sidecars from a
    Dataset of stat columns (url, part, status, html_bytes,
    n_content_spans) — the groupby shuffle moves ~30 bytes/doc, never
    documents.  Inside each group task: prefers the non-error row per
    url (superseded retries are not double-counted), writes that
    part's done-url sidecar, and returns the part's manifest row.

    When ``stats_ds`` is the live extraction pipeline's stat output
    (see ``run_extract``), the shuffle overlaps extraction — no
    separate lineage pass, no output re-read."""
    import shutil

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.arrowout import arrow_clean

    done_root = os.path.join(out_dir, LINEAGE_DIR, DONE_DIR)
    shutil.rmtree(done_root, ignore_errors=True)
    os.makedirs(done_root, exist_ok=True)

    def finish_part(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["part"].iloc[0])
        is_err = g["status"].str.startswith("error")
        # prefer the non-error row per url (stable: error rows sort last)
        g = (g.assign(_err=is_err)
             .sort_values(["url", "_err"], kind="mergesort")
             .drop_duplicates("url", keep="first"))
        ok = g.loc[~g["_err"], "url"]
        tmp = _done_path(out_dir, part) + f".tmp{os.getpid()}"
        pq.write_table(
            pa.table({"url": pa.array(ok.tolist(), pa.string())}), tmp)
        os.replace(tmp, _done_path(out_dir, part))
        return pd.DataFrame({
            "part": [part],
            "docs": [len(g)],
            "html_bytes": [int(g["html_bytes"].sum())],
            "content_spans": [int(g["n_content_spans"].sum())],
        })

    # shuffle capped at the part count — "part" has ≤ num_partitions
    # distinct values, so more shuffle partitions is pure overhead
    manifest = (
        stats_ds
        .groupby("part", num_partitions=(num_partitions or 64))
        .map_groups(arrow_clean(finish_part), batch_format="pandas")
        .to_pandas()
    )
    # record the partition modulus the layout was written with: a
    # resume MUST compute part = crc32(url) % THIS value — a rerun
    # launched with a different num_partitions would otherwise read
    # the wrong sidecar for every url and re-extract finished docs
    # into a mixed-modulus layout
    manifest["num_partitions"] = int(num_partitions or -1)
    path = os.path.join(out_dir, LINEAGE_DIR)
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f"manifest.parquet.tmp{os.getpid()}")
    pq.write_table(pa.Table.from_pandas(manifest, preserve_index=False),
                   tmp)
    os.replace(tmp, os.path.join(path, "manifest.parquet"))


def orphan_data_files(out_dir: str) -> list[str]:
    """``data_<digest>.parquet`` files with no matching
    ``stats_<digest>.parquet`` sidecar.  ``run_extract.write_block``
    renames the data file BEFORE its stat sidecar (data-first: a crash
    between the two renames can never LOSE rows, only orphan them from
    the sidecar view); this detects the orphans so a lineage rebuild
    counts their rows and a resume skips their urls instead of
    re-extracting them into duplicates."""
    sdir = urls_dir(out_dir)
    have = set()
    if os.path.isdir(sdir):
        have = {f[len("stats_"):-len(".parquet")]
                for f in os.listdir(sdir)
                if f.startswith("stats_") and f.endswith(".parquet")}
    out = []
    for f in sorted(os.listdir(out_dir)):
        if f.startswith("data_") and f.endswith(".parquet"):
            digest = f[len("data_"):-len(".parquet")]
            if digest not in have:
                out.append(os.path.join(out_dir, f))
    return out


def write_lineage(out_dir: str, num_partitions: int | None = None,
                  use_sidecars: bool | None = None) -> None:
    """(Re)build lineage from data already ON DISK: prefers the tiny
    per-block stat sidecars (``_lineage/urls``, ~70 B/doc) plus a
    pruned read of any ORPHANED data files (sidecar rename lost to a
    crash — see :func:`orphan_data_files`), and falls back to a pruned
    re-read of the whole output (outputs written by other means).
    ``run_extract``'s fresh-run path never calls this — it folds
    manifest partials into the write pass with no shuffle; this form
    serves resume-time (re)builds and standalone regeneration."""
    import ray.data as rd

    if use_sidecars is None:
        use_sidecars = has_stat_sidecars(out_dir)
    if use_sidecars:
        sdir = urls_dir(out_dir)
        # explicit file list: read_parquet can't mix a directory path
        # with the orphan FILE paths below
        srcs = [os.path.join(sdir, f) for f in sorted(os.listdir(sdir))
                if f.endswith(".parquet")]
        orphans = orphan_data_files(out_dir)
        if orphans:
            import logging

            logging.getLogger("arabic_ocr_ray").warning(
                "lineage: %d data file(s) lack a stat sidecar "
                "(crash between renames?); folding their rows into "
                "the rebuild", len(orphans))
            srcs += orphans
    else:
        srcs = [out_dir]
    stats_ds = rd.read_parquet(
        srcs, columns=["url", "part", "status",
                       "html_bytes", "n_content_spans"])
    write_lineage_from(stats_ds, out_dir, num_partitions)


def write_manifest_from_partials(partials_ds, out_dir: str,
                                 num_partitions: int | None) -> None:
    """Fresh-run manifest: sum the per-block (part, docs, html_bytes,
    content_spans) partial rows with a SHUFFLE-FREE tree combine —
    map-side pandas sums over coalesced partial batches, then a tiny
    driver fold (≤ parts rows per combined batch; even a sort shuffle
    over 13k partial rows cost ~14 s of fixed overhead at 32 CPUs).
    Exact when every url appears once in the run (a fresh run over a
    unique-url corpus); resumed runs rebuild with per-url dedup via
    :func:`write_lineage` instead."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.arrowout import arrow_clean

    @arrow_clean
    def combine(b: pa.Table):
        return (b.to_pandas().groupby("part", as_index=False).sum())

    manifest = (partials_ds
                .map_batches(combine, batch_format="pyarrow",
                             batch_size=65536)
                .to_pandas()
                .groupby("part", as_index=False).sum())
    manifest["num_partitions"] = int(num_partitions or -1)
    path = os.path.join(out_dir, LINEAGE_DIR)
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f"manifest.parquet.tmp{os.getpid()}")
    pq.write_table(pa.Table.from_pandas(manifest, preserve_index=False),
                   tmp)
    os.replace(tmp, os.path.join(path, "manifest.parquet"))


def read_lineage(out_dir: str):
    import pyarrow.dataset as pads

    path = os.path.join(out_dir, LINEAGE_DIR)
    if not os.path.isdir(path):
        return None
    return pads.dataset(path, format="parquet",
                        ignore_prefixes=[".", DONE_DIR,
                                         URLS_DIR]).to_table()


def has_done_sidecars(out_dir: str) -> bool:
    return os.path.isdir(os.path.join(out_dir, LINEAGE_DIR, DONE_DIR))


def recorded_num_partitions(out_dir: str) -> int | None:
    """The partition modulus the existing output's layout/sidecars
    were written with (from the manifest), or None for layouts that
    predate its recording."""
    lin = read_lineage(out_dir)
    if lin is None or "num_partitions" not in lin.schema.names \
            or lin.num_rows == 0:
        return None
    v = int(lin.column("num_partitions")[0].as_py())
    return v if v > 0 else None


def done_url_count(out_dir: str) -> int:
    """Exact count of completed (ok) urls = total sidecar rows, from
    parquet METADATA only (the manifest's ``docs`` counts errored urls
    too, which a resume deliberately retries — using it overstates
    skips whenever prior runs had errors)."""
    import pyarrow.parquet as pq

    root = os.path.join(out_dir, LINEAGE_DIR, DONE_DIR)
    if not os.path.isdir(root):
        return 0
    total = 0
    for f in os.listdir(root):
        if f.endswith(".parquet"):
            total += pq.read_metadata(os.path.join(root, f)).num_rows
    return total


def dedup_superseded(ds, num_partitions: int = 64):
    """Corpus-reader rule for resumed outputs: one row per url,
    preferring the non-error row (the retry) over a stale ``error:``
    row.  Shuffle key = ``part`` (rows of one url share it)."""
    import pandas as pd

    def fix(g: pd.DataFrame) -> pd.DataFrame:
        is_err = g["status"].str.startswith("error")
        return (g.assign(_err=is_err)
                .sort_values(["url", "_err"], kind="mergesort")
                .drop_duplicates("url", keep="first")
                .drop(columns=["_err"]))

    from ..functions.arrowout import arrow_clean

    return ds.groupby("part").map_groups(arrow_clean(fix),
                                          batch_format="pandas")
