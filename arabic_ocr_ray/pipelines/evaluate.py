"""Evaluation job — the ``edit.py`` analog (edit.py:9-26) plus the
stricter north-rule check (byte-identical text per url).

Join extracted ↔ golden on ``url`` (J3; the reference joins by
filename convention) with ``Dataset.join`` (hash-partitioned), then a
vectorized comparison stage and a Sum/Count aggregate:

  - ``matched``: extracted_text == text byte-for-byte (north rule);
  - ``edit_distance`` on whitespace-STRIPPED strings — the reference's
    eval contract is whitespace-insensitive (``''.join(s.split())``,
    edit.py:17-19; predict mode's leading-space word separator is
    erased there, segment_words.py:188);
  - per-doc accuracy = max(0, 1 − d/len(truth)) (edit.py:22), corpus
    mean of per-doc ratios (edit.py:25-26 — mean of ratios, not ratio
    of sums; A4 parity).

Edit distance is O(n·m) — computed ONLY for mismatching docs (matched
docs have distance 0 by definition), numpy rolling-row DP, inputs
capped at 4000 chars (documented guard; the reference has no cap).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EDIT_CAP = 4000


def levenshtein(a: str, b: str, cap: int = EDIT_CAP) -> int:
    """numpy rolling-row edit distance (editdistance.eval parity)."""
    a, b = a[:cap], b[:cap]
    if not a:
        return len(b)
    if not b:
        return len(a)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    m = len(bb)
    idx = np.arange(m + 1, dtype=np.int64)
    prev = idx.copy()
    for i, ca in enumerate(a):
        cost = (bb != ord(ca)).astype(np.int64)
        # substitution/deletion candidates, then the insertion chain
        # cur[j] = min_{k<=j}(cand[k] + j - k) as a min-plus prefix scan
        cand = np.empty(m + 1, dtype=np.int64)
        cand[0] = i + 1
        np.minimum(prev[:-1] + cost, prev[1:] + 1, out=cand[1:])
        prev = idx + np.minimum.accumulate(cand - idx)
    return int(prev[-1])


def _compare_batch(batch: pa.Table) -> pa.Table:
    ext = batch.column("extracted_text").to_pylist()
    gold = batch.column("text").to_pylist()
    n = len(ext)
    matched = np.empty(n, dtype=np.int64)
    dist = np.empty(n, dtype=np.int64)
    acc = np.empty(n, dtype=np.float64)
    for i, (e, g) in enumerate(zip(ext, gold)):
        e = e or ""
        g = g or ""
        if e == g:
            matched[i] = 1
            dist[i] = 0
            acc[i] = 1.0
        else:
            matched[i] = 0
            es, gs = "".join(e.split()), "".join(g.split())
            d = 0 if es == gs else levenshtein(es, gs)
            dist[i] = d
            acc[i] = max(0.0, 1.0 - d / len(gs)) if gs else float(d == 0)
    return pa.table({
        "url": batch.column("url"),
        "matched": pa.array(matched),
        "edit_distance": pa.array(dist),
        "accuracy": pa.array(acc),
    })


def evaluate_extraction(extracted_ds, pages_path: str,
                        num_partitions: int = 8) -> dict:
    """extracted_ds: Dataset with (url, extracted_text).  Returns the
    corpus report (A4)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Mean, Sum

    golden = rd.read_parquet(pages_path, columns=["url", "text"])
    joined = extracted_ds.select_columns(["url", "extracted_text"]).join(
        golden, join_type="inner", num_partitions=num_partitions,
        on=("url",),
    )
    per_doc = joined.map_batches(_compare_batch, batch_format="pyarrow")
    agg = per_doc.aggregate(
        Count(alias_name="total_docs"),
        Sum("matched", alias_name="matched_docs"),
        Sum("edit_distance", alias_name="total_edit_distance"),
        Mean("accuracy", alias_name="mean_accuracy"),
    )
    total = int(agg["total_docs"])
    matched = int(agg["matched_docs"])
    return {
        "total_docs": total,
        "matched_docs": matched,
        "match_rate": matched / total if total else 0.0,
        "total_edit_distance": int(agg["total_edit_distance"]),
        "mean_accuracy": float(agg["mean_accuracy"]),
    }
