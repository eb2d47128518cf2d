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
                   html_col: str = "html",
                   with_outdeg: bool = False) -> pa.Table:
    """→ (src, dst, n_links[, outdeg]) — one row per DISTINCT
    resolved target per page (dst sorted within a page for
    determinism).  Rows are pages, so the fold is in-batch; no
    shuffle.  ``with_outdeg`` stamps each row with the page's TOTAL
    link count (Σ n_links over the page) — a per-page quantity, so it
    costs nothing here but saves its consumer (pagerank) a
    src-keyed groupby AND a 1-per-edge join."""
    rows_s: list = []
    rows_d: list = []
    rows_n: list = []
    rows_o: list = []
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
        od = sum(c.values())
        for d in sorted(c):
            rows_s.append(src)
            rows_d.append(d)
            rows_n.append(c[d])
            rows_o.append(od)
    cols = {"src": pa.array(rows_s, pa.string()),
            "dst": pa.array(rows_d, pa.string()),
            "n_links": pa.array(rows_n, pa.int64())}
    if with_outdeg:
        cols["outdeg"] = pa.array(rows_o, pa.int64())
    return pa.table(cols)


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


def materialize_edges(pages_ds, url_col: str = "url",
                      html_col: str = "html",
                      num_partitions: int = 64):
    """→ MATERIALIZED Dataset(src, dst, n_links, outdeg) — the shared
    edge projection of the whole link family.  A production run
    extracts ONCE and feeds pagerank/crawl_frontier/crawl_depth/
    mutual_links via their ``edges_ds=`` parameter — the sf1
    scale-proof's batching conclusion, made concrete.  Measured at
    bench scale (360k pages, 32 CPUs): the projection itself is
    3.6 s (the href regex scan is far cheaper than full extraction),
    and sharing it cuts crawl_frontier 24.3 → 11.9 s and crawl_depth
    to 11.4 s — the win is the avoided re-extraction + re-read on
    every consumer AFTER the first, and it compounds with family
    size; pagerank (25.8 s either way) is iteration-dominated, not
    scan-dominated."""
    return (pages_ds.map_batches(
                lambda b: outlinks_batch(b, url_col, html_col,
                                         with_outdeg=True),
                batch_format="pyarrow")
            .repartition(num_partitions).materialize())


def pagerank(pages_ds, n_iter: int = 2, url_col: str = "url",
             html_col: str = "html", damping: tuple = (85, 100),
             num_partitions: int = 64, edges_ds=None):
    """→ Dataset(node, rank) after ``n_iter`` damped integer power
    iterations (law in the module docstring).  Node set = every
    corpus page ∪ every link target, so never-linked and linkless
    pages both carry the base rank.

    ``num_partitions`` sizes every keyed exchange (joins + node
    Sums).  Size it to the EDGE volume: the per-iteration wall is
    dominated by task dispatch once blocks are small, so a fixture-
    scale run wants 8, a 10^12-edge run wants thousands.

    ``edges_ds``: a :func:`materialize_edges` result to share the
    extraction scan across the family (must carry ``outdeg``); the
    corpus scan for the page-node side still runs (url-only,
    column-pruned)."""
    num, den = int(damping[0]), int(damping[1])

    # the weighted edge list materializes ONCE: every iteration
    # re-reads it, and re-extracting the corpus per pass would
    # dominate.  outdeg is stamped IN the extraction map
    # (with_outdeg=True): a page's total link count is a per-page
    # quantity, so the src-keyed groupby + 1-per-edge join the first
    # implementation paid (~8 s on the 3.26M-edge bench graph) is
    # free here.  Every materialize boundary below also REPARTITIONS
    # first: Ray's shuffle ops emit one block per (input block x
    # partition), so a chain of groupby/join/union stages compounds
    # block counts geometrically across iterations — measured
    # 512->832 blocks and 95 s at 1k pages before bounding, 8 blocks
    # and ~7 s after (the wall was pure task dispatch)
    if edges_ds is not None:
        if "outdeg" not in edges_ds.schema().names:
            raise ValueError(
                "pagerank edges_ds must carry outdeg — build it with "
                "materialize_edges()")
        edges_w = edges_ds
    else:
        edges_w = materialize_edges(pages_ds, url_col, html_col,
                                    num_partitions)
    edges = edges_w  # node-set build reads the same materialization

    def page_nodes(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(url_col)})

    from ray.data.aggregate import Count

    def dst_nodes(b: pa.Table) -> pa.Table:
        # map-side unique BEFORE the distinct shuffle: dst repeats ~
        # avg-indegree× per block, so this cuts the shuffled rows
        # correspondingly (measured 12.7 → 8.0 s on the 3.26M-edge
        # bench graph); reads the pre-join `edges` (same dst set as
        # edges_w — the src⋈outdeg join never drops a row) so the
        # node build doesn't wait on the join
        import pyarrow.compute as pc
        return pa.table(
            {"node": pc.unique(b.column("dst").combine_chunks())})

    # distinct via groupby; materialized because the node set feeds
    # TWO consumers (the zero stream and the seed ranks) — lazy, the
    # corpus scan + distinct shuffle would run twice.  The page-node
    # side is COLUMN-PRUNED to url before its map: without it this
    # second corpus pass re-reads every html payload just to throw it
    # away (measured ~10 s of the 29.6 s bench-shape pagerank wall)
    nodes = (pages_ds.select_columns([url_col])
             .map_batches(page_nodes, batch_format="pyarrow")
             .union(edges.map_batches(dst_nodes,
                                      batch_format="pyarrow"))
             .groupby("node", num_partitions=num_partitions)
             .aggregate(Count(alias_name="_c"))
             .select_columns(["node"])
             .repartition(num_partitions).materialize())

    return _pr_power_loop(edges_w, nodes, num, den, n_iter,
                          num_partitions)


def _pr_power_loop(edges_w, nodes, num: int, den: int, n_iter: int,
                   num_partitions: int):
    """The damped integer power iteration shared by :func:`pagerank`
    (page graph) and :func:`host_rank` (host condensation):
    ``edges_w`` = materialized (src, dst, n_links, outdeg) rows,
    ``nodes`` = materialized distinct (node) rows.  Per iteration ONE
    src-keyed join + ONE node-keyed Sum ∝ edges; per-iteration
    materialization is the checkpoint boundary."""
    from ray.data.aggregate import Sum

    from .joins import hash_join

    base = (den - num) * PR_QUANT // den

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


def host_rank(pages_ds, n_iter: int = 2, url_col: str = "url",
              html_col: str = "html", damping: tuple = (85, 100),
              num_partitions: int = 8):
    """→ Dataset(node, rank) — the damped integer PageRank over the
    HOST condensation graph (domain-level centrality: what spam/
    authority analysis actually ranks, on a graph ~10⁴× smaller than
    the page graph).

    Law (oracle-pinned): edges = :func:`host_graph` rows weighted by
    ``n_links`` (self-loops KEPT — intra-host links are real edges;
    filtering is a consumer choice, and the twin keeps them too);
    node set = src ∪ dst of the EDGE SET (the link_components
    convention — there is no "corpus host table" analog of the page
    node rule); same PR_QUANT/floor-div/sink-drop arithmetic as
    :func:`pagerank` via the shared :func:`_pr_power_loop`.

    Scale shape: outdeg here needs ONE src-keyed Sum + one join —
    unlike the page graph it cannot be stamped map-side (host edges
    are already aggregated across pages) — but both exchanges are on
    the condensed graph, ∝ HOST edges."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    from .joins import hash_join

    num, den = int(damping[0]), int(damping[1])

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"src": b.column("src_host"),
                         "dst": b.column("dst_host"),
                         "n_links": b.column("n_links")})

    edges = (host_graph(pages_ds, url_col, html_col)
             .map_batches(rename, batch_format="pyarrow")
             .repartition(num_partitions).materialize())

    od = (edges.groupby("src", num_partitions=num_partitions)
          .aggregate(Sum("n_links", alias_name="outdeg")))
    e_schema = pa.schema([("src", pa.string()), ("dst", pa.string()),
                          ("n_links", pa.int64())])
    od_schema = pa.schema([("src", pa.string()),
                           ("outdeg", pa.int64())])
    edges_w = (hash_join(edges, od, on="src",
                         num_partitions=num_partitions,
                         left_schema=e_schema,
                         right_schema=od_schema)
               .repartition(num_partitions).materialize())

    def side_nodes(col: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {"node": pc.unique(b.column(col).combine_chunks())})
        return f

    nodes = (edges.map_batches(side_nodes("src"),
                               batch_format="pyarrow")
             .union(edges.map_batches(side_nodes("dst"),
                                      batch_format="pyarrow"))
             .groupby("node", num_partitions=num_partitions)
             .aggregate(Count(alias_name="_c"))
             .select_columns(["node"])
             .repartition(num_partitions).materialize())

    return _pr_power_loop(edges_w, nodes, num, den, n_iter,
                          num_partitions)


# --- HITS (hubs & authorities) ----------------------------------------------
#: Kleinberg 1999, in EXACT integer arithmetic.  Law (oracle-pinned):
#: node set = corpus pages ∪ link targets; adjacency is the DISTINCT
#: (src, dst) page-edge set (unweighted — classic HITS; ``n_links``
#: multiplicity is PageRank's convention, not HITS'); hubs seed at 1;
#: each iteration runs the classic sequential update
#: ``auth_i(v) = Σ_{u→v} hub_{i-1}(u)`` then
#: ``hub_i(u) = Σ_{u→v} auth_i(v)`` — UNNORMALIZED (the float
#: L2-normalization is a presentation detail that would break
#: integer exactness; relative order per fixed depth is identical),
#: with a per-iteration overflow bound (max·degree products checked
#: on the driver) that RAISES rather than wraps (the pagerank/
#: semdedup convention).  Bit-reproducible across partitionings and
#: hash-matches a fixed-depth CTE unrolling.


def hits(pages_ds, n_iter: int = 2, url_col: str = "url",
         html_col: str = "html", num_partitions: int = 64):
    """→ Dataset(node, hub, auth) after ``n_iter`` integer HITS
    iterations (law above).

    Scale shape: the distinct edge projection materializes ONCE;
    each iteration is TWO keyed exchanges (src-join + dst-keyed Sum,
    then dst-join + src-keyed Sum) ∝ EDGES — the corpus html never
    moves.  Same repartition-at-materialize-boundaries rule as
    :func:`pagerank` (Ray shuffle ops emit input-blocks×partitions
    blocks; unbounded, iteration walls balloon on task dispatch)."""
    from ray.data.aggregate import Count, Max, Sum

    from .joins import hash_join

    edges = (outlinks(pages_ds, url_col, html_col)
             .select_columns(["src", "dst"])
             .repartition(num_partitions).materialize())

    def page_nodes(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column(url_col)})

    def dst_nodes(b: pa.Table) -> pa.Table:
        # map-side unique before the distinct shuffle (the pagerank
        # measurement: −37% on the node-set wall)
        import pyarrow.compute as pc
        return pa.table(
            {"node": pc.unique(b.column("dst").combine_chunks())})

    nodes = (pages_ds.map_batches(page_nodes, batch_format="pyarrow")
             .union(edges.map_batches(dst_nodes,
                                      batch_format="pyarrow"))
             .groupby("node", num_partitions=num_partitions)
             .aggregate(Count(alias_name="_c"))
             .select_columns(["node"])
             .repartition(num_partitions).materialize())

    def zeros(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("node"),
            "v": pa.array(np.zeros(b.num_rows, np.int64))})

    nodes0 = nodes.map_batches(zeros, batch_format="pyarrow") \
        .materialize()

    def seed(b: pa.Table) -> pa.Table:
        return pa.table({
            "node": b.column("node"),
            "v": pa.array(np.ones(b.num_rows, np.int64))})

    hub = nodes.map_batches(seed, batch_format="pyarrow") \
        .materialize()
    auth = nodes0

    # degree bounds for the overflow guard: a sum of m terms each
    # ≤ x is ≤ m·x — raise BEFORE a wrap can happen
    deg = edges.groupby("src").aggregate(Count(alias_name="d")) \
        .aggregate(Max("d", alias_name="m"))
    max_out = int(deg["m"] or 0)
    deg = edges.groupby("dst").aggregate(Count(alias_name="d")) \
        .aggregate(Max("d", alias_name="m"))
    max_in = int(deg["m"] or 0)

    e_schema = pa.schema([("src", pa.string()), ("dst", pa.string())])
    v_schema = pa.schema([("node", pa.string()), ("v", pa.int64())])

    def _sweep(vec, join_on: str, emit: str):
        """One half-iteration: ship vec along edges (joined on
        ``join_on``), fold at the ``emit`` end."""
        j = hash_join(edges, vec, on=join_on, right_on="node",
                      num_partitions=num_partitions,
                      left_schema=e_schema, right_schema=v_schema)
        rows = j.map_batches(
            lambda b: pa.table({"node": b.column(emit),
                                "v": b.column("v")}),
            batch_format="pyarrow")
        return (rows.union(nodes0)
                .groupby("node", num_partitions=num_partitions)
                .aggregate(Sum("v", alias_name="v"))
                .repartition(num_partitions).materialize())

    for _ in range(n_iter):
        hmax = int(hub.aggregate(Max("v", alias_name="m"))["m"] or 0)
        if max_in and hmax and max_in * hmax >= (1 << 63):
            raise ValueError(
                f"hits int64 overflow: indeg·hub bound = "
                f"{max_in * hmax}; lower n_iter")
        auth = _sweep(hub, "src", "dst")
        amax = int(auth.aggregate(Max("v", alias_name="m"))["m"] or 0)
        if max_out and amax and max_out * amax >= (1 << 63):
            raise ValueError(
                f"hits int64 overflow: outdeg·auth bound = "
                f"{max_out * amax}; lower n_iter")
        hub = _sweep(auth, "dst", "src")

    h_schema = pa.schema([("node", pa.string()), ("hub", pa.int64())])
    a_schema = pa.schema([("node", pa.string()),
                          ("auth", pa.int64())])
    hub_t = hub.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "hub": b.column("v")}),
        batch_format="pyarrow")
    auth_t = auth.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "auth": b.column("v")}),
        batch_format="pyarrow")
    return hash_join(hub_t, auth_t, on="node",
                     num_partitions=num_partitions,
                     left_schema=h_schema, right_schema=a_schema)


# --- connected components of the link graph ----------------------------------

def link_components(pages_ds, url_col: str = "url",
                    html_col: str = "html",
                    num_partitions: int = 8):
    """→ Dataset(node, component) — weakly-connected components of
    the page link graph (component = min node id, lexicographic for
    urls): the site-island analysis (mirror detection, crawl-frontier
    partitioning) a link graph feeds after extraction.

    Pure composition: the outlink edge projection feeds the SAME
    component machinery as near-dup clustering
    (``dedup.dedup_connected_components`` — driver union-find under
    its documented edge crossover, distributed min-label propagation
    above), so the 100 TB shape is already proven there.  Nodes with
    NO edges (linkless AND never-linked pages) don't appear — the
    near_dup_clusters convention, matched by the SQL twin."""
    from .dedup import dedup_connected_components

    def to_pairs(b: pa.Table) -> pa.Table:
        return pa.table({"a": b.column("src"), "b": b.column("dst")})

    pairs = outlinks(pages_ds, url_col, html_col).map_batches(
        to_pairs, batch_format="pyarrow")
    out = dedup_connected_components(pairs,
                                     num_partitions=num_partitions)
    return out.map_batches(
        lambda b: pa.table({"node": b.column("doc_id"),
                            "component": b.column("cluster_id")}),
        batch_format="pyarrow")


# --- host-level condensation --------------------------------------------------
_HOST_G_RE = re.compile(r"^[a-z][a-z0-9+.-]*://([^/]*)")


def host_of(url: str) -> str:
    """Authority part of a scheme-absolute url; '' when the url has
    no scheme (matches DuckDB ``regexp_extract(url, pat, 1)``'s
    empty-string-on-no-match)."""
    m = _HOST_G_RE.match(url or "")
    return m.group(1) if m else ""


def host_graph(pages_ds, url_col: str = "url",
               html_col: str = "html"):
    """→ Dataset(src_host, dst_host, n_page_edges, n_links) — the
    host-level condensation of the page link graph (the graph
    domain-level spam/centrality analysis actually runs on: the page
    graph at 100 TB is too big to eyeball, the host graph is ~10⁴×
    smaller).  Count ≡ distinct page-level (src, dst) edges because
    outlink rows are per-page distinct.  ONE keyed exchange of
    ~60 B/row host-pair projections; html never shuffles.  Self-loops
    (intra-host links) are kept — filtering is the consumer's choice."""
    from ray.data.aggregate import Count, Sum

    def to_hosts(b: pa.Table) -> pa.Table:
        return pa.table({
            "src_host": pa.array([host_of(u) for u in
                                  b.column("src").to_pylist()],
                                 pa.string()),
            "dst_host": pa.array([host_of(u) for u in
                                  b.column("dst").to_pylist()],
                                 pa.string()),
            "n_links": b.column("n_links"),
        })

    return (outlinks(pages_ds, url_col, html_col)
            .map_batches(to_hosts, batch_format="pyarrow")
            .groupby(["src_host", "dst_host"])
            .aggregate(Count(alias_name="n_page_edges"),
                       Sum("n_links", alias_name="n_links")))


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


# --- crawl scheduling -------------------------------------------------------


def crawl_frontier(pages_ds, k: int = 20, url_col: str = "url",
                   html_col: str = "html",
                   num_partitions: int = 8, edges_ds=None):
    """→ pandas DataFrame (≤ ``k`` rows): the top-k UNCRAWLED link
    targets ranked by distinct linking pages — the crawl-scheduling
    primitive (what a frontier manager fetches next; the reference's
    directory scan `segment_words.py:254` is the degenerate
    single-machine analog of "what to process next").

    Law (oracle-pinned): candidates = every resolved link target NOT
    present in the corpus url set; ``n_src_pages`` = distinct linking
    pages (edge rows are per-(src, dst) distinct, so Sum of 1s ≡
    distinct count); ``n_links`` = total occurrences; order =
    ``n_src_pages`` DESC then ``dst`` ASC (deterministic boundary
    ties).

    Scale shape: the anti-join is ONE dst/url-keyed exchange of tiny
    projection rows — edge rows carry (dst, n_links, 1, 0), crawled
    urls ship a 4-int marker row (url, 0, 0, 1); html never moves —
    then the tree-combined :func:`~.topk.topk` bounds the driver at
    ``combine_partitions × k`` rows regardless of corpus size.
    ``edges_ds`` (a :func:`materialize_edges` result) skips the
    extraction scan — only the url-only marker pass reads the
    corpus."""
    from ray.data.aggregate import Sum

    from .topk import topk

    def edge_rows(b: pa.Table) -> pa.Table:
        eb = (b if "dst" in b.schema.names
              else outlinks_batch(b, url_col, html_col))
        n = eb.num_rows
        return pa.table({
            "dst": eb.column("dst"),
            "n_links": eb.column("n_links"),
            "one": pa.array(np.ones(n, np.int64)),
            "crawled": pa.array(np.zeros(n, np.int64))})

    def marker_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        z = pa.array(np.zeros(n, np.int64))
        return pa.table({
            "dst": b.column(url_col),
            "n_links": z, "one": z,
            "crawled": pa.array(np.ones(n, np.int64))})

    # the marker side is column-pruned to url: its second corpus pass
    # would otherwise re-read every html payload it never touches
    # (the pagerank node-build lesson — ~13 s/scan at bench scale)
    edge_src = edges_ds if edges_ds is not None else pages_ds
    merged = (edge_src.map_batches(edge_rows, batch_format="pyarrow")
              .union(pages_ds.select_columns([url_col])
                     .map_batches(marker_rows,
                                  batch_format="pyarrow"))
              .groupby("dst", num_partitions=num_partitions)
              .aggregate(Sum("n_links", alias_name="n_links"),
                         Sum("one", alias_name="n_src_pages"),
                         Sum("crawled", alias_name="_c")))

    def uncrawled(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = b.filter(pc.equal(b.column("_c"), 0))
        return keep.select(["dst", "n_src_pages", "n_links"])

    cand = merged.map_batches(uncrawled, batch_format="pyarrow")
    return topk(cand, "n_src_pages", k, descending=True,
                tie_cols=("dst",))


def crawl_depth(pages_ds, seed_regex: str = "0$", max_depth: int = 3,
                url_col: str = "url", html_col: str = "html",
                num_partitions: int = 8, edges_ds=None):
    """→ Dataset(node, depth) — minimum hop count from the seed set
    over DIRECTED page→target edges, the crawl-depth/BFS analysis a
    frontier scheduler and politeness budgeter run on the link graph.

    Law (oracle-pinned): seeds = corpus pages whose url matches
    ``seed_regex`` (Python ``re.search`` ≡ DuckDB ``regexp_matches``
    — both leftmost RE2-compatible scans; a crawled page seeds even
    if its html fails the strict-UTF-8 edge gate, it just contributes
    no edges); edges = the distinct (src, dst) projection of
    :func:`outlinks_batch`; depth(v) = min hops from any seed,
    reported only for nodes reached within ``max_depth`` — classic
    multi-source BFS, bit-reproducible across partitionings and
    hash-matching a fixed-depth SQL unrolling (the pagerank/hits
    convention).

    Scale shape: the edge projection materializes ONCE; each
    iteration joins only the CURRENT FRONTIER (nodes first reached in
    the previous round — expanding earlier-settled nodes is provably
    redundant under +1 weights) against the edges — one src-keyed
    hash join + one node-keyed Min, shuffles ∝ frontier-adjacent
    edges, html never moves — and the per-iteration materialization
    is the checkpoint/resume boundary an end-to-end 10^12-edge BFS
    needs anyway (every boundary repartitions first: the pagerank
    block-compounding lesson)."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Min

    from .joins import hash_join

    cre = re.compile(seed_regex)

    def edge_proj(b: pa.Table) -> pa.Table:
        eb = (b if "dst" in b.schema.names
              else outlinks_batch(b, url_col, html_col))
        return eb.select(["src", "dst"])

    # edges_ds (a materialize_edges result) skips the extraction
    # scan; the url-only seed pass still reads the corpus
    edge_src = edges_ds if edges_ds is not None else pages_ds
    edges = (edge_src.map_batches(edge_proj, batch_format="pyarrow")
             .repartition(num_partitions).materialize())

    def seed_rows(b: pa.Table) -> pa.Table:
        urls = b.column(url_col).to_pylist()
        keep = [u for u in urls if cre.search(u)]
        return pa.table({
            "node": pa.array(keep, pa.string()),
            "depth": pa.array(np.zeros(len(keep), np.int64))})

    # seed scan column-pruned to url (the regex never reads html)
    dist = (pages_ds.select_columns([url_col])
            .map_batches(seed_rows, batch_format="pyarrow")
            .repartition(num_partitions).materialize())
    e_schema = pa.schema([("src", pa.string()),
                          ("dst", pa.string())])
    d_schema = pa.schema([("node", pa.string()),
                          ("depth", pa.int64())])

    for it in range(max_depth):
        def frontier_only(b: pa.Table, _d=it) -> pa.Table:
            return b.filter(pc.equal(b.column("depth"), _d))

        frontier = dist.map_batches(frontier_only,
                                    batch_format="pyarrow")
        # empty-frontier early exit: no new labels can appear, so
        # further fixed-depth iterations are no-ops — behavior-
        # identical to running them (the law test re-checks at
        # max_depth 5), and it cuts the tail once BFS converges
        # (dist is materialized, so this count is a cheap filter
        # pass, not a pipeline re-execution)
        if frontier.count() == 0:
            break
        joined = hash_join(edges, frontier, on="src",
                           right_on="node",
                           num_partitions=num_partitions,
                           left_schema=e_schema,
                           right_schema=d_schema)

        def step(b: pa.Table) -> pa.Table:
            d = np.asarray(b.column("depth"), dtype=np.int64)
            return pa.table({"node": b.column("dst"),
                             "depth": pa.array(d + 1, pa.int64())})

        dist = (dist.union(joined.map_batches(step,
                                              batch_format="pyarrow"))
                .groupby("node", num_partitions=num_partitions)
                .aggregate(Min("depth", alias_name="depth"))
                .repartition(num_partitions).materialize())

    return dist


def mutual_links(pages_ds, url_col: str = "url",
                 html_col: str = "html", num_partitions: int = 8,
                 edges_ds=None):
    """→ Dataset(a, b) — unordered page pairs that link to EACH OTHER:
    the classic reciprocal-link / link-farm spam signal (mutual-link
    density is one of the oldest web-spam features).

    Law (oracle-pinned): edges = the distinct (src, dst) projection
    of :func:`outlinks_batch`; self-links excluded (a page citing
    itself is not "mutual"); ``a = min(src, dst)``, ``b = max`` —
    lexicographic, Python str min/max ≡ DuckDB least/greatest; a pair
    is emitted iff BOTH directions exist.

    Scale shape: ONE (a, b)-keyed Sum of direction tags (1 when
    src < dst, 2 when src > dst — each direction appears at most once
    because edge rows are per-(src, dst) distinct), sum == 3 ⟺
    mutual; ~80 B/row pair projections move, html never does."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def tag(b: pa.Table) -> pa.Table:
        src = b.column("src").to_pylist()
        dst = b.column("dst").to_pylist()
        a_, b_, d_ = [], [], []
        for s, d in zip(src, dst):
            if s == d:
                continue
            if s < d:
                a_.append(s); b_.append(d); d_.append(1)
            else:
                a_.append(d); b_.append(s); d_.append(2)
        return pa.table({"a": pa.array(a_, pa.string()),
                         "b": pa.array(b_, pa.string()),
                         "dir": pa.array(d_, pa.int64())})

    edge_src = (edges_ds if edges_ds is not None
                else outlinks(pages_ds, url_col, html_col))
    tagged = edge_src.map_batches(tag, batch_format="pyarrow")

    def mutual_only(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.equal(t.column("dir"), 3))
        return keep.select(["a", "b"])

    return (tagged.groupby(["a", "b"], num_partitions=num_partitions)
            .aggregate(Sum("dir", alias_name="dir"))
            .map_batches(mutual_only, batch_format="pyarrow"))


def co_citation(pages_ds, min_common: int = 2, k: int = 20,
                max_indegree: int = 64, url_col: str = "url",
                html_col: str = "html", num_partitions: int = 8,
                edges_ds=None):
    """→ pandas DataFrame (≤ ``k`` rows): (a, b, n_common) — page
    pairs CITED TOGETHER by the most shared link targets, the classic
    co-citation "related pages" signal (Dean & Henzinger 1999: two
    pages frequently linked from the same documents are related).

    Law (oracle-pinned): distinct (src, dst) edges; targets with
    indegree > ``max_indegree`` are EXCLUDED before pairing (a hub
    target cited by everyone carries no similarity signal and would
    generate deg² pairs — the MinHash MAX_BUCKET convention applied
    to graphs; the cap is part of the law, mirrored by the twin);
    ``n_common`` = shared kept targets; pairs need ≥ ``min_common``;
    order = n_common DESC then (a, b) ASC.

    Scale shape: ONE dst-keyed fixed-partition exchange of edge
    projections, per-partition vectorized pair generation
    (``np.triu_indices`` per dst run — never per-group task
    dispatch, the r2 near-dup lesson) bounded by ``max_indegree`` ×
    edges; ONE (a, b)-keyed Sum; then the tree-combined topk."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from .arrowout import arrow_clean
    from .parthash import partition_ids
    from .topk import topk

    def edge_proj(b: pa.Table) -> pa.Table:
        eb = (b if "dst" in b.schema.names
              else outlinks_batch(b, url_col, html_col))
        t = eb.select(["src", "dst"])
        return t.append_column(
            "__jk", partition_ids([t.column("dst")], num_partitions))

    edge_src = edges_ds if edges_ds is not None else pages_ds

    def pair_fold(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"a": pd.Series(dtype="object"),
                                 "b": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        df = df.sort_values(["dst", "src"], kind="mergesort")
        dst = df["dst"].to_numpy()
        src = df["src"].to_numpy()
        starts = np.flatnonzero(
            np.concatenate([[True], dst[1:] != dst[:-1]]))
        ends = np.append(starts[1:], len(dst))
        out_a: list = []
        out_b: list = []
        for s, e in zip(starts, ends):
            d = e - s
            if d < 2 or d > max_indegree:
                continue  # singletons pair nothing; hubs excluded
            g = src[s:e]  # sorted ascending within the dst run
            ia, ib = np.triu_indices(d, 1)
            out_a.append(g[ia])
            out_b.append(g[ib])
        if not out_a:
            return pd.DataFrame({"a": pd.Series(dtype="object"),
                                 "b": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pd.DataFrame({"a": a, "b": b,
                             "n": np.ones(len(a), np.int64)})

    pairs = (edge_src.map_batches(edge_proj, batch_format="pyarrow")
             .groupby("__jk", num_partitions=num_partitions)
             .map_groups(arrow_clean(pair_fold),
                         batch_format="pandas"))

    def common_filter(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = t.filter(pc.greater_equal(t.column("n_common"),
                                         min_common))
        return keep

    counted = (pairs.groupby(["a", "b"],
                             num_partitions=num_partitions)
               .aggregate(Sum("n", alias_name="n_common"))
               .map_batches(common_filter, batch_format="pyarrow"))
    return topk(counted, "n_common", k, descending=True,
                tie_cols=("a", "b"))
