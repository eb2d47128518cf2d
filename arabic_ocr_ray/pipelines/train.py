"""Distributed training job — the A1/A2 fold as a Ray Data aggregate.

Reference train mode threads a mutable ``acc_char_map`` through a
sequential file loop and rewrites the whole JSON after every document
(segment_words.py:258-263, 192-201).  Because the fold's insert is a
set-add with exact dedup (integrator.py:157-159), it is a commutative,
associative set-union monoid — so the distributed plan is
order-insensitive and MUST produce the byte-identical canonical model
(asserted by tests/test_train.py against the sequential fold):

    spans   = read_parquet(labeled)                 # url, block_idx, label, block_text
    per_url = spans.groupby("url").map_groups(sort by block_idx → one row per url)
    joined  = pages.join(per_url, on=("url",))      # hash join (J1)
    ex      = joined.map_batches(doc_training_examples per row)
    distinct= ex.groupby(["label","fv_key"]).map_groups(head 1)   # A1 exact dedup
    model   = PrototypeModel.from_triples(driver-collected distinct)  # tiny

The shuffle keys: ``url`` for the join, ``(label, fv_key)`` for the
dedup — both well-distributed; the distinct set is tiny (bounded by
the feature-space size), so the driver collect is O(model), not
O(corpus).  Rejection counters ride along as summable columns (A3; the
reference's off-by-one ``curr_word_idx − 1`` return at
segment_words.py:198 is NOT reproduced).
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

from ..model import PrototypeModel
from ..templates import Templates
from ..training import doc_training_examples


def _collect_spans(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values("block_idx")
    return pd.DataFrame({
        "url": [g["url"].iloc[0]],
        "labels_json": [json.dumps(list(g["label"]))],
        "texts_json": [json.dumps(list(g["block_text"]))],
    })


class _ExamplesBatch:
    """Actor stage: compiled templates once per actor (S8 fix)."""

    def __init__(self):
        self.templates = Templates()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        langs = batch.column("lang").to_pylist()
        labels_j = batch.column("labels_json").to_pylist()
        texts_j = batch.column("texts_json").to_pylist()

        out_url: list[str] = []
        out_label: list[str] = []
        out_fv: list[str] = []
        out_rej: list[int] = []
        out_tot: list[int] = []
        for u, h, lg, lj, tj in zip(urls, htmls, langs, labels_j,
                                    texts_j):
            golden = list(zip(json.loads(lj), json.loads(tj)))
            ex, rej, tot = doc_training_examples(h, lg or "", golden,
                                                 self.templates)
            for label, fv in ex:
                out_url.append("")
                out_label.append(label)
                out_fv.append(json.dumps(fv))
                out_rej.append(0)
                out_tot.append(0)
            # one stat row per doc, carrying its url (label "" rows are
            # counters only) — the per-doc rejection report analog of
            # the reference's per-image print (segment_words.py:229-230)
            out_url.append(u)
            out_label.append("")
            out_fv.append("")
            out_rej.append(rej)
            out_tot.append(tot)
        return pa.table({
            "url": pa.array(out_url, pa.string()),
            "label": pa.array(out_label, pa.string()),
            "fv_key": pa.array(out_fv, pa.string()),
            "rejected": pa.array(out_rej, pa.int64()),
            "total": pa.array(out_tot, pa.int64()),
        })


def train_model(
    pages_path: str,
    spans_path: str,
    num_partitions: int = 8,
    concurrency: int | None = None,
    per_doc_report: bool = False,
):
    """→ (model, stats) — or (model, stats, per_doc) with
    ``per_doc_report=True``, where per_doc is a DataFrame of
    (url, rejected, total) for every doc with ≥1 rejected span (the
    reference's per-image rejection print, segment_words.py:229-230,
    as a queryable table)."""
    import ray.data as rd

    from ..functions.arrowout import arrow_clean
    from ray.data.aggregate import Sum

    pages = rd.read_parquet(pages_path, columns=["url", "html", "lang"])
    spans = rd.read_parquet(spans_path)
    per_url = spans.groupby("url").map_groups(
        arrow_clean(_collect_spans), batch_format="pandas")
    # union+groupby hash join, not Dataset.join: per_url comes out of
    # a map_groups shuffle whose empty partitions are schemaless
    # blocks that break the pyarrow join aggregator (r2 near-dup
    # crash class; see functions/joins.py:hash_join)
    from ..functions.joins import hash_join

    # static hint: per_url is a map_groups fold — without it the
    # plan-time schema probe runs the spans shuffle a second time
    joined = hash_join(pages, per_url, on="url",
                       num_partitions=num_partitions,
                       right_schema=pa.schema([
                           ("url", pa.string()),
                           ("labels_json", pa.string()),
                           ("texts_json", pa.string())]))
    ex = joined.map_batches(
        _ExamplesBatch,
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency or 4,
    ).materialize()  # tiny (examples + counters), consumed twice

    counters = ex.aggregate(Sum("rejected", alias_name="rejected"),
                            Sum("total", alias_name="total"))

    distinct = (
        ex.groupby(["label", "fv_key"])
        .map_groups(arrow_clean(lambda g: g.head(1)),
                    batch_format="pandas")
        .to_pandas()
    )
    triples = [
        (row.label, json.loads(row.fv_key))
        for row in distinct.itertuples()
        if row.label
    ]
    model = PrototypeModel.from_triples(triples)
    stats = {
        "rejected_spans": int(counters["rejected"] or 0),
        "total_spans": int(counters["total"] or 0),
        "prototypes": model.n_prototypes,
        "buckets": len(model.mapping),
    }
    if per_doc_report:
        import pyarrow.compute as pc

        rep = (ex.map_batches(
            lambda b: b.filter(pc.greater(b.column("rejected"), 0))
            .select(["url", "rejected", "total"]),
            batch_format="pyarrow").to_pandas())
        return model, stats, rep
    return model, stats
