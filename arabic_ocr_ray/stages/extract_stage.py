"""Ray Data stages for the extraction pipeline.

Design (SURVEY.md §7.1): the per-document chain tokenize → segment →
classify → assemble is a pure function of one row, so the hot path is
ONE FUSED actor-pool stage (:class:`ExtractText`) — no token streams
ever cross a stage boundary, nothing shuffles.  The class is passed to
``ds.map_batches(ExtractText, fn_constructor_kwargs=..., concurrency=N,
batch_size=B, batch_format="pyarrow")``:

  - ``__init__`` runs ONCE per actor: load the prototype model (S4,
    ``load_features_map`` at segment_words.py:258 — once, reused for
    every document) and compile the boilerplate templates (S8 — fixing
    the reference's per-call template re-read, preprocess.py:247-248).
  - ``__call__`` runs per Arrow batch, zero-copy in, Arrow out.

Model distribution: pass ``model_ref=ray.put(model.mapping)`` for a
driver-broadcast model (one object-store copy per node), or
``model_path=`` to load from a shared filesystem.  Never ship the model
inside the batch or per task.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..extract import extract_document, segment_stats
from ..html.tokenizer import tokenize
from ..model import DEFAULT_MODEL_PATH, PrototypeModel
from ..templates import Templates


def url_partition(urls, num_partitions: int) -> np.ndarray:
    """Stable url-hash partition ids (crc32 — deterministic across
    processes/runs, unlike Python's salted ``hash``).  The explicit
    partitioning key for skew taming + resumable layout (north_rule)."""
    return np.asarray(
        [zlib.crc32(u.encode()) % num_partitions for u in urls],
        dtype=np.int32,
    )


class ExtractText:
    """Fused tokenize→segment→classify→assemble actor stage."""

    def __init__(
        self,
        model_path: str = DEFAULT_MODEL_PATH,
        model_ref=None,
        extra_templates: list | None = None,
        num_partitions: int = 0,
        reading_order: str = "document",
    ):
        if model_ref is not None:
            import ray

            mapping = ray.get(model_ref)
            self.model = PrototypeModel(mapping)
        else:
            self.model = PrototypeModel.load(model_path)
        self.templates = Templates(extra_templates)
        self.num_partitions = num_partitions
        self.reading_order = reading_order
        # per-actor single-token label memo (extract.py contract:
        # one cache per (model, templates) pair — both fixed here)
        self._label_cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        langs = batch.column("lang").to_pylist()

        texts: list[str] = []
        status: list[str] = []
        stats = {k: np.empty(len(urls), dtype=np.int32)
                 for k in ("n_tokens", "n_lines", "n_spans", "n_content_spans")}
        html_bytes = np.empty(len(urls), dtype=np.int64)
        for i, (h, lg) in enumerate(zip(htmls, langs)):
            h = h or b""
            try:
                out = extract_document(h, lg or "", self.model,
                                       self.templates,
                                       self.reading_order,
                                       label_cache=self._label_cache)
                texts.append(out["extracted_text"])
                status.append("ok" if h else "empty")
                for k in stats:
                    stats[k][i] = out[k]
            except Exception as e:  # noqa: BLE001
                # per-row status instead of the reference's silent
                # bare-except swallow (train_recognition.py:364-367,
                # SURVEY.md §4 "stragglers/retries" design note)
                texts.append("")
                status.append(f"error: {type(e).__name__}: {e}"[:200])
                for k in stats:
                    stats[k][i] = 0
            html_bytes[i] = len(h)

        cols: dict = {
            "url": batch.column("url"),
            "extracted_text": pa.array(texts, pa.string()),
            "status": pa.array(status, pa.string()),
            "html_bytes": pa.array(html_bytes),
        }
        for k, v in stats.items():
            cols[k] = pa.array(v)
        if self.num_partitions:
            cols["part"] = pa.array(url_partition(urls, self.num_partitions))
        from ..debug import debug_log
        debug_log("extract batch: %d docs, %d bytes, %d errors",
                  len(urls), int(html_bytes.sum()),
                  sum(1 for s in status if s.startswith("error")))
        return pa.table(cols)


class MixedExtract(ExtractText):
    """Content-type dispatch INSIDE the fused stage (north rule: the
    extraction pipeline's payloads are "HTML boilerplate strip,
    PDF/layout parse").

    One pass, one actor pool, no branch-and-union: each batch is
    split by payload magic bytes — ``%PDF-`` rows go through the
    stdlib PDF layout parser (``functions/pdftext.pdf_extract``),
    everything else through the HTML chain — and re-assembled in the
    original row order with the identical output schema.  At 100 TB
    this is the right shape: a two-branch ``Dataset.filter`` would
    read the corpus twice (or force a materialization), and a
    separate PDF pipeline would double the operator count for a
    per-row-local decision.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # Magic-byte sniff stays in Arrow: a to_pylist here would copy
        # EVERY payload into Python objects just to test 5 bytes (and
        # the html rows would be materialized again inside the parent
        # __call__) — on the hot fused stage that doubles byte copies.
        head = pc.binary_slice(
            pc.fill_null(batch.column("html"), b""), 0, 5)
        ispdf = pc.equal(head, b"%PDF-").to_numpy(zero_copy_only=False)
        if not ispdf.any():
            return super().__call__(batch)
        from ..functions.pdftext import pdf_extract

        pdf_idx = np.flatnonzero(ispdf)
        html_idx = np.flatnonzero(~ispdf)
        parts = []
        if len(html_idx):
            parts.append((html_idx, super().__call__(batch.take(html_idx))))

        urls = batch.column("url").take(pdf_idx)
        payloads = batch.column("html").take(pdf_idx).to_pylist()
        texts, status = [], []
        n_spans = np.empty(len(pdf_idx), dtype=np.int32)
        html_bytes = np.empty(len(pdf_idx), dtype=np.int64)
        for j, payload in enumerate(payloads):
            try:
                r = pdf_extract(payload)
                texts.append(r["text"])
                status.append("ok")
                n_spans[j] = r["n_spans"]
            except Exception as e:  # noqa: BLE001
                texts.append("")
                status.append(f"error: {type(e).__name__}: {e}"[:200])
                n_spans[j] = 0
            html_bytes[j] = len(payload)
        cols: dict = {
            "url": urls,
            "extracted_text": pa.array(texts, pa.string()),
            "status": pa.array(status, pa.string()),
            "html_bytes": pa.array(html_bytes),
            # PDF stats mapped onto the shared schema: spans are the
            # layout unit on both branches; the token count is an
            # HTML-chain concept and reads 0 for PDF rows
            "n_tokens": pa.array(np.zeros(len(pdf_idx), dtype=np.int32)),
            "n_lines": pa.array(n_spans),
            "n_spans": pa.array(n_spans),
            "n_content_spans": pa.array(n_spans),
        }
        if self.num_partitions:
            cols["part"] = pa.array(url_partition(
                urls.to_pylist(), self.num_partitions))
        parts.append((pdf_idx, pa.table(cols)))

        merged = pa.concat_tables(
            [t.select(parts[0][1].column_names) for _, t in parts])
        order = np.argsort(np.fromiter(
            (i for idx, _ in parts for i in idx), dtype=np.int64),
            kind="stable")
        return merged.take(pa.array(order))


class SegmentStats:
    """Segmentation-only stage (the ``process.py`` stats job analog,
    A5 bug fixed — see extract.segment_stats)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        langs = batch.column("lang").to_pylist()
        rows = [segment_stats(h, lg or "") for h, lg in zip(htmls, langs)]
        cols = {"url": batch.column("url")}
        for k in ("n_tokens", "n_lines", "n_spans", "max_span_chars",
                  "baseline_depth"):
            cols[k] = pa.array([r[k] for r in rows], pa.int32())
        return pa.table(cols)


def tokenize_stats_batch(batch: pa.Table) -> pa.Table:
    """Stateless tokenizer-inspection stage: per-doc token counts.
    Exposes the M1-M3 stage on its own for tests/inspection."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    langs = batch.column("lang").to_pylist()
    n_tokens, n_text, n_chars, max_depth = [], [], [], []
    for h, lg in zip(htmls, langs):
        ts = tokenize(h, lg or "")
        n_tokens.append(len(ts))
        n_text.append(int((ts.kinds == 1).sum()))
        n_chars.append(int(ts.weights.sum()))
        max_depth.append(int(ts.depths.max()) if len(ts) else 0)
    return pa.table({
        "url": batch.column("url"),
        "n_tokens": pa.array(n_tokens, pa.int32()),
        "n_text_tokens": pa.array(n_text, pa.int32()),
        "n_chars": pa.array(n_chars, pa.int64()),
        "max_depth": pa.array(max_depth, pa.int32()),
    })
