"""Link-graph operators over raw crawl pages — outlink extraction,
indegree, and integer-exact PageRank.

The web-scale analysis family a crawl pipeline runs AFTER extraction:
the link graph drives crawl scheduling, spam/hub detection and
quality priors (the original PageRank use).  Everything here is
oracle-twinned, so the semantics are pinned exactly:

* anchors are double-quoted ``href`` attributes of ``<a``/``<A`` tags
  with an ASCII space/tab after the tag name — extracted by ONE
  compiled regex that Python ``re`` and DuckDB RE2 scan identically
  (leftmost, non-overlapping; lazy ``[^>]*?`` supported by both);
* pages must decode as STRICT UTF-8 to contribute edges (the
  oracle-checked gate; charset-sniffed pages flow through the extract
  pipeline's tokenizer, which owns encodings, and can feed the
  decoded-text overload);
* resolution: the fragment is stripped first (``split('#', 1)[0]`` ≡
  DuckDB ``split_part``), an empty remainder is dropped, then
  scheme-absolute hrefs pass through, ``/``-rooted hrefs join the
  source's ``scheme://authority``, and anything else joins the
  source's directory (greedy ``^.*/`` — both regex engines agree);
* PageRank is the damped power iteration in INTEGER arithmetic:
  ranks start at ``PR_QUANT`` per node, every edge ships
  ``(num·r·n_links) // (den·outdeg)`` (floor division — Python ``//``
  ≡ DuckDB ``//`` on positive ints), every node adds the
  ``(den-num)·PR_QUANT // den`` base, and dangling mass is dropped
  (the sink-drop variant — documented; redistribution would need a
  per-iteration global scalar, a trivial extra aggregate, but the
  twin stays simpler without it).  The result is bit-reproducible
  across partitionings AND hash-matches a fixed-depth SQL unrolling,
  like the kmeans/semdedup family.

Scale shape (the 100 TB contract): edge extraction is a pure
streaming map (html never shuffles — only the (src, dst, n) edge
projection, ~100 B/row, moves); indegree is ONE dst-keyed Sum;
PageRank materializes the weighted edge list ONCE (re-extracting the
corpus per iteration would dominate), each iteration is one
src-keyed join + one node-keyed Sum — shuffles proportional to the
EDGE list, never the corpus — and the per-iteration rank
materialization is the checkpoint/resume boundary a 10^12-node run
needs anyway.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

PR_QUANT = 1_000_000
_HREF_RE = re.compile(
    r'<[aA][ \t][^>]*?[hH][rR][eE][fF][ \t]*=[ \t]*"([^"]*)"')
_SCHEME_RE = re.compile(r"^[a-z][a-z0-9+.-]*://")
_HOST_RE = re.compile(r"^[a-z][a-z0-9+.-]*://[^/]*")
_DIR_RE = re.compile(r"^.*/")


def resolve_href(src: str, href: str) -> str | None:
    """Resolve ``href`` against ``src`` under the module's pinned
    rules; None ⇒ drop (fragment-only / empty)."""
    h = href.split("#", 1)[0]
    if not h:
        return None
    if _SCHEME_RE.match(h):
        return h
    if h.startswith("/"):
        m = _HOST_RE.match(src)
        return (m.group(0) if m else "") + h
    m = _DIR_RE.match(src)
    return (m.group(0) if m else "") + h


def outlinks_batch(batch: pa.Table, url_col: str = "url",
                   html_col: str = "html") -> pa.Table:
    """→ (src, dst, n_links) — one row per DISTINCT resolved target
    per page (dst sorted within a page for determinism).  Rows are
    pages, so the fold is in-batch; no shuffle."""
    rows_s: list = []
    rows_d: list = []
    rows_n: list = []
    for src, hb in zip(batch.column(url_col).to_pylist(),
                       batch.column(html_col).to_pylist()):
        if isinstance(hb, bytes):
            try:
                h = hb.decode("utf-8")
            except UnicodeDecodeError:
                continue  # the strict-UTF-8 gate (oracle parity)
        else:
            h = hb or ""
        c: Counter = Counter()
        for href in _HREF_RE.findall(h):
            d = resolve_href(src, href)
            if d is not None:
                c[d] += 1
        for d in sorted(c):
            rows_s.append(src)
            rows_d.append(d)
            rows_n.append(c[d])
    return pa.table({"src": pa.array(rows_s, pa.string()),
                     "dst": pa.array(rows_d, pa.string()),
                     "n_links": pa.array(rows_n, pa.int64())})


def outlinks(pages_ds, url_col: str = "url", html_col: str = "html"):
    """→ Dataset(src, dst, n_links).  Pure streaming map."""
    return pages_ds.map_batches(
        lambda b: outlinks_batch(b, url_col, html_col),
        batch_format="pyarrow")


def link_indegree(pages_ds, url_col: str = "url",
                  html_col: str = "html"):
    """→ Dataset(dst, n_links, n_src_pages).  Edge rows are already
    distinct per (src, dst), so Count ≡ distinct linking pages.  ONE
    dst-keyed exchange (edge rows only — html never shuffles)."""
    from ray.data.aggregate import Count, Sum

    return (outlinks(pages_ds, url_col, html_col)
            .groupby("dst")
            .aggregate(Sum("n_links", alias_name="n_links"),
                       Count(alias_name="n_src_pages")))


def _share_map(num: int, den: int):
    def f(b: pa.Table) -> pa.Table:
        r = np.asarray(b.column("r"), dtype=np.int64)
        n = np.asarray(b.column("n_links"), dtype=np.int64)
        od = np.asarray(b.column("outdeg"), dtype=np.int64)
        if len(r):
            # int64 headroom guard — numpy wraps silently (the
            # semdedup convention: raise, never corrupt)
            hi = num * int(r.max()) * int(n.max())
            if hi >= (1 << 63):
                raise ValueError(
                    f"pagerank int64 overflow: num*r*n = {hi}; "
                    f"lower PR_QUANT or damping numerator")
        contrib = (num * r * n) // (den * od)
        return pa.table({"node": b.column("dst"),
                         "contrib": pa.array(contrib, pa.int64())})
    return f


def pagerank(pages_ds, n_iter: int = 2, url_col: str = "url",
             html_col: str = "html", damping: tuple = (85, 100),
             num_partitions: int = 64):
    """→ Dataset(node, rank) after ``n_iter`` damped integer power
    iterations (law in the module docstring).  Node set = every
    corpus page ∪ every link target, so never-linked and linkless
    pages both carry the base rank.

    ``num_partitions`` sizes every keyed exchange (joins + node
    Sums).  Size it to the EDGE volume: the per-iteration wall is
    dominated by task dispatch once blocks are small, so a fixture-
    scale run wants 8, a 10^12-edge run wants thousands."""
    from ray.data.aggregate import Sum

    from .joins import hash_join

    num, den = int(damping[0]), int(damping[1])
    base = (den - num) * PR_QUANT // den

    # the raw edge list materializes once: it feeds outdeg AND the
    # weighted join, and a lazy feed would re-run the corpus-wide
    # href extraction for each consumer.  Every materialize boundary
    # below also REPARTITIONS first: Ray's shuffle ops emit one block
    # per (input block x partition), so a chain of groupby/join/union
    # stages compounds block counts geometrically across iterations —
    # measured 512->832 blocks and 95 s at 1k pages before bounding,
    # 8 blocks and ~7 s after (the wall was pure task dispatch)
    edges = (outlinks(pages_ds, url_col, html_col)
             .repartition(num_partitions).materialize())
    outdeg = edges.groupby("src").aggregate(
        Sum("n_links", alias_name="outdeg"))
    e_schema = pa.schema([("src", pa.string()), ("dst", pa.string()),
                          ("n_links", pa.int64())])
    od_schema = pa.schema([("src", pa.string()),
                           ("outdeg", pa.int64())])
    # weighted edges materialize ONCE: every iteration re-reads them,
    # and re-extracting the corpus per pass would dominate
    edges_w = hash_join(edges, outdeg, on="src",
                        num_partitions=num_partitions,
                        left_schema=e_schema,
                        right_schema=od_schema) \
        .repartition(num_partitions).materialize()

    def page_nodes(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(url_col)})

    from ray.data.aggregate import Count

    # distinct via groupby; materialized because the node set feeds
    # TWO consumers (the zero stream and the seed ranks) — lazy, the
    # corpus scan + distinct shuffle would run twice
    nodes = (pages_ds.map_batches(page_nodes, batch_format="pyarrow")
             .union(edges_w.map_batches(
                 lambda b: pa.table({"node": b.column("dst")}),
                 batch_format="pyarrow"))
             .groupby("node", num_partitions=num_partitions)
             .aggregate(Count(alias_name="_c"))
             .select_columns(["node"])
             .repartition(num_partitions).materialize())

    def zero(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("node"),
            "contrib": pa.array(np.zeros(b.num_rows, np.int64))})

    nodes0 = nodes.map_batches(zero, batch_format="pyarrow") \
        .materialize()

    def seed(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("node"),
            "r": pa.array(np.full(b.num_rows, PR_QUANT, np.int64))})

    ranks = nodes.map_batches(seed, batch_format="pyarrow") \
        .materialize()
    r_schema = pa.schema([("node", pa.string()), ("r", pa.int64())])
    ew_schema = pa.schema([("src", pa.string()), ("dst", pa.string()),
                           ("n_links", pa.int64()),
                           ("outdeg", pa.int64())])

    for _ in range(n_iter):
        joined = hash_join(edges_w, ranks, on="src",
                           right_on="node",
                           num_partitions=num_partitions,
                           left_schema=ew_schema,
                           right_schema=r_schema)
        # materialized: groupby's plan-time schema probe would
        # otherwise EXECUTE the whole join once, then the real
        # pipeline a second time (measured 16→47 s/iter ballooning
        # at 1k pages before this; 2 s/iter after)
        shares = joined.map_batches(_share_map(num, den),
                                    batch_format="pyarrow") \
            .materialize()
        summed = (shares.union(nodes0)
                  .groupby("node", num_partitions=num_partitions)
                  .aggregate(Sum("contrib", alias_name="contrib")))

        def add_base(b: pa.Table) -> pa.Table:
            c = np.asarray(b.column("contrib"), dtype=np.int64)
            return pa.table({"node": b.column("node"),
                             "r": pa.array(base + c, pa.int64())})

        # per-iteration materialization = the checkpoint boundary (a
        # lazy chain would re-execute every prior iteration through
        # each join probe)
        ranks = (summed.map_batches(add_base, batch_format="pyarrow")
                 .repartition(num_partitions).materialize())

    return ranks.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "rank": b.column("r")}),
        batch_format="pyarrow")


# --- anchor text ------------------------------------------------------------
#: href + the immediately-following text node (up to the next '<') —
#: the two capture groups align across Python findall and two RE2
#: regexp_extract_all(…, 1/2) passes because both engines scan the
#: same pattern leftmost/non-overlapping.  No entity decoding (the
#: tokenizer owns that for extraction); anchor text is trimmed of
#: ASCII [ \t\r\n] and empties are dropped.
_ANCHOR_RE = re.compile(
    r'<[aA][ \t][^>]*?[hH][rR][eE][fF][ \t]*=[ \t]*"([^"]*)"'
    r'[^>]*>([^<]*)')
_ANCHOR_TRIM = " \t\r\n"


def anchor_texts_batch(batch: pa.Table, url_col: str = "url",
                       html_col: str = "html") -> pa.Table:
    """→ (src, dst, anchor, n) — one row per DISTINCT (resolved
    target, trimmed anchor text) per page.  Same strict-UTF-8 gate
    and resolution law as :func:`outlinks_batch`."""
    rows_s: list = []
    rows_d: list = []
    rows_a: list = []
    rows_n: list = []
    for src, hb in zip(batch.column(url_col).to_pylist(),
                       batch.column(html_col).to_pylist()):
        if isinstance(hb, bytes):
            try:
                h = hb.decode("utf-8")
            except UnicodeDecodeError:
                continue
        else:
            h = hb or ""
        c: Counter = Counter()
        for href, text in _ANCHOR_RE.findall(h):
            d = resolve_href(src, href)
            a = text.strip(_ANCHOR_TRIM)
            if d is not None and a:
                c[(d, a)] += 1
        for d, a in sorted(c):
            rows_s.append(src)
            rows_d.append(d)
            rows_a.append(a)
            rows_n.append(c[(d, a)])
    return pa.table({"src": pa.array(rows_s, pa.string()),
                     "dst": pa.array(rows_d, pa.string()),
                     "anchor": pa.array(rows_a, pa.string()),
                     "n": pa.array(rows_n, pa.int64())})


def anchor_texts(pages_ds, url_col: str = "url",
                 html_col: str = "html"):
    """→ Dataset(dst, anchor, n_occurrences, n_src_pages) — the
    anchor-text index (what the web calls each target: the classic
    ranking/label signal).  ONE (dst, anchor)-keyed Sum over the
    per-page distinct projection; Count ≡ distinct linking pages
    because batch rows are per-(src, dst, anchor)."""
    from ray.data.aggregate import Count, Sum

    return (pages_ds.map_batches(
                lambda b: anchor_texts_batch(b, url_col, html_col),
                batch_format="pyarrow")
            .groupby(["dst", "anchor"])
            .aggregate(Sum("n", alias_name="n_occurrences"),
                       Count(alias_name="n_src_pages")))
