"""Link-graph family: href extraction/resolution law, strict-UTF-8
gate, indegree fold, and the integer PageRank power iteration pinned
against a brute-force python-int oracle across two partitionings."""

from __future__ import annotations

import pyarrow as pa
import pytest

from arabic_ocr_ray.functions.links import (
    PR_QUANT,
    link_indegree,
    outlinks,
    outlinks_batch,
    pagerank,
    resolve_href,
)


def _page(url, hrefs):
    body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
    return url, f"<html><body>{body}</body></html>".encode()


def _pages_table(rows):
    return pa.table({"url": pa.array([r[0] for r in rows], pa.string()),
                     "html": pa.array([r[1] for r in rows],
                                      pa.binary())})


def test_resolve_href_law():
    src = "https://h.test/a/b/p1"
    assert resolve_href(src, "https://x.com/q") == "https://x.com/q"
    assert resolve_href(src, "/root") == "https://h.test/root"
    assert resolve_href(src, "rel") == "https://h.test/a/b/rel"
    assert resolve_href(src, "rel#frag") == "https://h.test/a/b/rel"
    assert resolve_href(src, "#frag") is None
    assert resolve_href(src, "") is None


def test_outlinks_extraction_and_gate():
    rows = [
        _page("https://h.test/p1", ["/hub", "/hub", "x", "#f"]),
        # uppercase tag+attr, and href in a non-anchor tag (ignored)
        ("https://h.test/p2",
         b'<A HREF="/up">y</A><link href="/css">'),
        ("https://h.test/latin", "caf\xe9".encode("latin-1")),  # gated
        ("https://h.test/empty", b"<html></html>"),
    ]
    out = outlinks_batch(_pages_table(rows))
    got = {(out.column("src")[i].as_py(), out.column("dst")[i].as_py()):
           out.column("n_links")[i].as_py()
           for i in range(out.num_rows)}
    assert got == {
        ("https://h.test/p1", "https://h.test/hub"): 2,
        ("https://h.test/p1", "https://h.test/x"): 1,
        ("https://h.test/p2", "https://h.test/up"): 1,
    }


def test_indegree_fold(ray_session):
    import ray.data as rd

    rows = [_page(f"https://h.test/p{i}", ["/hub"]) for i in range(5)]
    rows.append(_page("https://h.test/q", ["/hub", "/hub", "/solo"]))
    ds = rd.from_arrow(_pages_table(rows))
    out = link_indegree(ds).to_pandas().set_index("dst")
    assert out.loc["https://h.test/hub", "n_links"] == 7
    assert out.loc["https://h.test/hub", "n_src_pages"] == 6
    assert out.loc["https://h.test/solo", "n_src_pages"] == 1


def _brute_pagerank(rows, n_iter=2):
    import re
    pat = re.compile(
        r'<[aA][ \t][^>]*?[hH][rR][eE][fF][ \t]*=[ \t]*"([^"]*)"')
    edges: dict = {}
    for url, hb in rows:
        try:
            h = hb.decode("utf-8")
        except UnicodeDecodeError:
            continue
        for href in pat.findall(h):
            d = resolve_href(url, href)
            if d is not None:
                edges[(url, d)] = edges.get((url, d), 0) + 1
    nodes = {u for u, _ in rows} | {d for _, d in edges}
    outdeg: dict = {}
    for (s, _), n in edges.items():
        outdeg[s] = outdeg.get(s, 0) + n
    r = {v: PR_QUANT for v in nodes}
    for _ in range(n_iter):
        nr = {v: 150000 for v in nodes}
        for (s, d), n in edges.items():
            nr[d] += (85 * r[s] * n) // (100 * outdeg[s])
        r = nr
    return sorted(r.items())


@pytest.mark.parametrize("n_blocks", [1, 7])
def test_pagerank_matches_bruteforce(ray_session, n_blocks):
    """2-iteration integer PR ≡ the python-int oracle, bit-for-bit,
    regardless of input partitioning (sink-drop + base law)."""
    import ray.data as rd

    rows = [
        _page("https://h.test/p1", ["/hub", "/hub", "p2", "ext"]),
        _page("https://h.test/p2", ["/hub", "p1"]),
        _page("https://h.test/p3", ["p1", "p2", "p3", "/hub"]),
        _page("https://h.test/p4", []),                 # linkless
        ("https://h.test/lat", "caf\xe9".encode("latin-1")),  # gated
    ]
    ds = rd.from_arrow(_pages_table(rows)).repartition(n_blocks)
    got = pagerank(ds, n_iter=2, num_partitions=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    want = _brute_pagerank(rows)
    assert list(zip(got["node"], got["rank"])) == want
    # self-link (p3 -> p3) and dangling hub both handled: hub gets
    # mass, never emits it (sink-drop)
    d = dict(want)
    assert d["https://h.test/hub"] == max(d.values())
    assert d["https://h.test/lat"] == 150000  # gated page = base only


def test_pagerank_overflow_guard(ray_session):
    import ray.data as rd

    from arabic_ocr_ray.functions import links

    rows = [_page("https://h.test/p1", ["/hub"])]
    ds = rd.from_arrow(_pages_table(rows))
    old = links.PR_QUANT
    try:
        links.PR_QUANT = 1 << 58  # 85 * 2^58 > 2^63
        with pytest.raises(Exception, match="overflow"):
            links.pagerank(ds, n_iter=1, num_partitions=2).to_pandas()
    finally:
        links.PR_QUANT = old


def test_anchor_texts_law(ray_session):
    """(dst, anchor) pairs: per-page distinct + trim + empty-drop,
    then one keyed Sum; Count = distinct linking pages."""
    import ray.data as rd

    from arabic_ocr_ray.functions.links import anchor_texts

    rows = [
        ("https://h.test/p1",
         b'<a href="/hub"> Home </a><a href="/hub">Home</a>'
         b'<a href="/hub">   </a><a href="/x">X<b>bold</b></a>'),
        ("https://h.test/p2", b'<a href="/hub">Home</a>'),
    ]
    t = pa.table({"url": pa.array([r[0] for r in rows], pa.string()),
                  "html": pa.array([r[1] for r in rows], pa.binary())})
    out = anchor_texts(rd.from_arrow(t)).to_pandas()
    got = {(r["dst"], r["anchor"]): (r["n_occurrences"],
                                     r["n_src_pages"])
           for _, r in out.iterrows()}
    # ' Home ' trims to 'Home' == the second anchor -> one pair, n=2
    # on p1; whitespace-only anchor dropped; text stops at next '<'
    assert got == {
        ("https://h.test/hub", "Home"): (3, 2),
        ("https://h.test/x", "X"): (1, 1),
    }


def _brute_hits(rows, n_iter):
    """Python-int HITS oracle over the module's own edge law."""
    from arabic_ocr_ray.functions import links

    edges = set()
    nodes = set()
    for url, hb in rows:
        nodes.add(url)
        try:
            h = hb.decode("utf-8")
        except UnicodeDecodeError:
            continue
        for href in links._HREF_RE.findall(h):
            d = links.resolve_href(url, href)
            if d is not None:
                edges.add((url, d))
                nodes.add(d)
    hub = {n: 1 for n in nodes}
    auth = {n: 0 for n in nodes}
    for _ in range(n_iter):
        auth = {n: 0 for n in nodes}
        for u, v in edges:
            auth[v] += hub[u]
        hub = {n: 0 for n in nodes}
        for u, v in edges:
            hub[u] += auth[v]
    return {n: (hub[n], auth[n]) for n in nodes}


@pytest.mark.parametrize("nparts", [1, 3])
def test_hits_matches_brute_oracle(ray_session, nparts):
    """Integer HITS == the python-int oracle, bit-for-bit, across
    partitionings — incl. a dangling target, a linkless page, a
    self-link, a non-UTF-8 page contributing no edges, and repeated
    hrefs (distinct-edge law: multiplicity must NOT weight HITS)."""
    import ray.data as rd

    from arabic_ocr_ray.functions.links import hits

    rows = [
        _page("https://a.test/1", ["/2", "/3", "https://b.test/x"]),
        _page("https://a.test/2", ["/1", "/1", "/1"]),  # repeats
        _page("https://a.test/3", ["/3"]),              # self-link
        _page("https://a.test/4", []),                  # linkless
        ("https://a.test/latin1/5", b'<a href="/1">\xff</a>'),
    ]
    ds = rd.from_arrow(_pages_table(rows)).repartition(nparts)
    out = hits(ds, n_iter=2, num_partitions=4).to_pandas()
    want = _brute_hits(rows, 2)
    got = {r["node"]: (r["hub"], r["auth"])
           for _, r in out.iterrows()}
    assert got == want
    # sanity on the oracle itself: the linkless page and the
    # non-UTF-8 page have no edges => hub 0 (they still carry auth
    # from /2's repeated-but-distinct edge to /1? no — nothing links
    # THEM, so auth 0 too); the dangling cross-host target exists
    # as a node with hub 0
    assert want["https://a.test/4"] == (0, 0)
    assert want["https://a.test/latin1/5"] == (0, 0)
    assert want["https://b.test/x"][0] == 0


def test_hits_overflow_guard(ray_session):
    """The degree·max bound must RAISE, never wrap (monkeypatched
    seed is impossible, so drive the bound with n_iter on a dense
    clique — 40 nodes, 2 iterations stays put, the guard math is
    what's under test via a tiny ceiling)."""
    import ray.data as rd

    from arabic_ocr_ray.functions import links

    rows = [_page(f"https://c.test/{i}",
                  [f"/{j}" for j in range(12)]) for i in range(12)]
    ds = rd.from_arrow(_pages_table(rows))
    # 12-clique, h grows ~144x per iteration: 8 iterations from 1
    # crosses 2^63 / indeg — the guard must fire before a wrap
    with pytest.raises(ValueError, match="overflow"):
        links.hits(ds, n_iter=16, num_partitions=2)


def test_host_graph_condensation(ray_session):
    import ray.data as rd

    from arabic_ocr_ray.functions.links import host_graph, host_of

    assert host_of("https://a.test/x/y") == "a.test"
    assert host_of("no-scheme") == ""
    rows = [
        _page("https://a.test/1", ["/2", "https://b.test/x",
                                   "https://b.test/y"]),
        _page("https://a.test/2", ["https://b.test/x"]),
    ]
    ds = rd.from_arrow(_pages_table(rows))
    out = host_graph(ds).to_pandas()
    got = {(r["src_host"], r["dst_host"]):
           (r["n_page_edges"], r["n_links"])
           for _, r in out.iterrows()}
    # a.test->b.test: 3 page-edges (p1 has two DISTINCT b.test dsts),
    # a.test->a.test: the intra-host self-pair is kept
    assert got == {("a.test", "b.test"): (3, 3),
                   ("a.test", "a.test"): (1, 1)}


def test_link_components(ray_session):
    """Two disjoint link islands + a self-link + a linkless page
    (excluded by convention) + a dangling target (included: it's a
    node of the edge set)."""
    import ray.data as rd

    from arabic_ocr_ray.functions.links import link_components

    rows = [
        _page("https://a.test/1", ["/2"]),
        _page("https://a.test/2", ["/1", "/3"]),   # island A: 1,2,3
        _page("https://b.test/x", ["https://b.test/y"]),  # island B
        _page("https://c.test/solo", []),          # linkless: absent
        _page("https://d.test/self", ["https://d.test/self"]),
    ]
    ds = rd.from_arrow(_pages_table(rows))
    out = link_components(ds).to_pandas()
    got = dict(zip(out["node"], out["component"]))
    assert got == {
        "https://a.test/1": "https://a.test/1",
        "https://a.test/2": "https://a.test/1",
        "https://a.test/3": "https://a.test/1",
        "https://b.test/x": "https://b.test/x",
        "https://b.test/y": "https://b.test/x",
        "https://d.test/self": "https://d.test/self",
    }


def test_crawl_depth_bfs_law(ray_session):
    """Multi-source BFS: a 4-deep chain truncated by max_depth, a
    diamond (min over two path lengths), an unreachable island
    (absent), and a seed whose html fails the UTF-8 gate (seeds at 0,
    contributes no edges)."""
    import ray.data as rd

    from arabic_ocr_ray.functions.links import crawl_depth

    rows = [
        # chain: seed0 -> c1 -> c2 -> c3 -> c4 (c4 beyond max_depth 3)
        _page("https://h.test/seed0", ["/c1"]),
        _page("https://h.test/c1", ["/c2"]),
        _page("https://h.test/c2", ["/c3"]),
        _page("https://h.test/c3", ["/c4"]),
        # diamond: give d0 a direct edge to c2 so
        # c2 = min(2 via the chain, 1 via d0)
        _page("https://h.test/d0", ["/c2"]),
        # unreachable island (no seed matches, nothing links in)
        _page("https://h.test/island", ["/island2"]),
        # latin1 seed: depth 0, no edges
        ("https://h.test/lat0", "caf\xe9".encode("latin-1")),
    ]
    ds = rd.from_arrow(_pages_table(rows))
    out = crawl_depth(ds, seed_regex=r"0$", max_depth=3,
                      num_partitions=4).to_pandas()
    got = dict(zip(out["node"], out["depth"]))
    assert got == {
        "https://h.test/seed0": 0,
        "https://h.test/d0": 0,
        "https://h.test/lat0": 0,
        "https://h.test/c1": 1,
        "https://h.test/c2": 1,   # min(2 via chain, 1 via d0)
        "https://h.test/c3": 2,
        "https://h.test/c4": 3,
    }
    # frontier-only expansion == full Bellman-Ford at fixed depth:
    # re-run with a depth large enough to converge; island stays out
    out4 = crawl_depth(ds, seed_regex=r"0$", max_depth=5,
                       num_partitions=2).to_pandas()
    assert dict(zip(out4["node"], out4["depth"])) == got


def test_crawl_frontier_anti_join_and_ties(ray_session):
    """Crawled targets are excluded even when heavily linked; ranking
    is n_src_pages DESC then dst ASC at the boundary."""
    import ray.data as rd

    from arabic_ocr_ray.functions.links import crawl_frontier

    rows = [
        # p1..p3 all link to crawled /p1 (excluded) and uncrawled /u1
        _page("https://h.test/p1", ["/u1", "/u2", "/u2"]),
        _page("https://h.test/p2", ["/u1", "/p1"]),
        _page("https://h.test/p3", ["/u1", "/p1", "/ua"]),
        _page("https://h.test/p4", ["/ub"]),
    ]
    ds = rd.from_arrow(_pages_table(rows))
    out = crawl_frontier(ds, k=3, num_partitions=4)
    assert list(out["dst"]) == [
        "https://h.test/u1",            # 3 linking pages
        "https://h.test/u2",            # 1 page (2 links)
        "https://h.test/ua",            # tie (1 page) broken dst ASC
    ]
    assert list(out["n_src_pages"]) == [3, 1, 1]
    assert list(out["n_links"]) == [3, 2, 1]
    # k larger than candidates: all 4 uncrawled, crawled p1 never
    out_all = crawl_frontier(ds, k=10, num_partitions=2)
    assert set(out_all["dst"]) == {
        "https://h.test/u1", "https://h.test/u2",
        "https://h.test/ua", "https://h.test/ub"}


def _brute_host_rank(rows, n_iter=2):
    """Python-int oracle: host-condense the edge multiset, edge-set
    nodes, same damped floor-div law."""
    import re as _re

    from arabic_ocr_ray.functions.links import host_of, resolve_href
    pat = _re.compile(
        r'<[aA][ \t][^>]*?[hH][rR][eE][fF][ \t]*=[ \t]*"([^"]*)"')
    pe: dict = {}
    for url, hb in rows:
        try:
            h = hb.decode("utf-8")
        except UnicodeDecodeError:
            continue
        for href in pat.findall(h):
            d = resolve_href(url, href)
            if d is not None:
                pe[(url, d)] = pe.get((url, d), 0) + 1
    he: dict = {}
    for (s, d), n in pe.items():
        k = (host_of(s), host_of(d))
        he[k] = he.get(k, 0) + n
    nodes = {s for s, _ in he} | {d for _, d in he}
    outdeg: dict = {}
    for (s, _), n in he.items():
        outdeg[s] = outdeg.get(s, 0) + n
    r = {v: PR_QUANT for v in nodes}
    for _ in range(n_iter):
        nr = {v: 150000 for v in nodes}
        for (s, d), n in he.items():
            nr[d] += (85 * r[s] * n) // (100 * outdeg[s])
        r = nr
    return sorted(r.items())


@pytest.mark.parametrize("n_blocks", [1, 5])
def test_host_rank_matches_bruteforce(ray_session, n_blocks):
    """Host-condensed integer PR ≡ the python-int oracle bit-for-bit
    across partitionings: multi-host graph with intra-host self-loop
    edges, a dangling host (gets mass, emits none), and a gated
    page."""
    import ray.data as rd

    from arabic_ocr_ray.functions.links import host_rank

    rows = [
        # a.test: 2 pages; intra-host links become an a→a self-loop
        _page("https://a.test/1", ["/2", "https://b.test/x"]),
        _page("https://a.test/2", ["/1", "https://b.test/y",
                                   "https://c.test/only"]),
        # b.test links back to a.test and to dangling d.test
        _page("https://b.test/x", ["https://a.test/1",
                                   "https://d.test/sink"]),
        ("https://b.test/lat", "caf\xe9".encode("latin-1")),  # gated
    ]
    ds = rd.from_arrow(_pages_table(rows)).repartition(n_blocks)
    got = host_rank(ds, n_iter=2, num_partitions=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    want = _brute_host_rank(rows)
    assert list(zip(got["node"], got["rank"])) == want
    d = dict(want)
    # d.test is a pure sink host: base + b's share, emits nothing
    assert "https://h.test/lat" not in d
    assert set(d) == {"a.test", "b.test", "c.test", "d.test"}


def test_mutual_links_law(ray_session):
    """A↔B found; one-way excluded; self-link excluded; href
    multiplicity does not matter (distinct-edge law)."""
    import ray.data as rd

    from arabic_ocr_ray.functions.links import mutual_links

    rows = [
        _page("https://h.test/a", ["/b", "/b", "/c"]),  # a->b (x2), a->c
        _page("https://h.test/b", ["/a"]),              # b->a  => mutual
        _page("https://h.test/c", ["/d"]),              # c->d one-way
        _page("https://h.test/self", ["https://h.test/self"]),
    ]
    ds = rd.from_arrow(_pages_table(rows))
    out = mutual_links(ds, num_partitions=4).to_pandas()
    assert list(zip(out["a"], out["b"])) == [
        ("https://h.test/a", "https://h.test/b")]


def test_edges_ds_sharing_equals_internal(ray_session):
    """materialize_edges fed via edges_ds= must reproduce each family
    member's internal-extraction result exactly — the one-scan
    batching path a production run uses."""
    import ray.data as rd

    from arabic_ocr_ray.functions.links import (
        crawl_depth,
        crawl_frontier,
        materialize_edges,
        mutual_links,
        pagerank,
    )

    rows = [
        _page("https://h.test/a0", ["/b", "/c"]),
        _page("https://h.test/b", ["/a0", "/u1"]),
        _page("https://h.test/c", ["/u1", "/u2"]),
        ("https://h.test/lat0", "caf\xe9".encode("latin-1")),
    ]
    ds = rd.from_arrow(_pages_table(rows))
    ew = materialize_edges(ds, num_partitions=4)

    pr_a = pagerank(ds, n_iter=2, num_partitions=4).to_pandas()
    pr_b = pagerank(ds, n_iter=2, num_partitions=4,
                    edges_ds=ew).to_pandas()
    assert (sorted(zip(pr_a["node"], pr_a["rank"]))
            == sorted(zip(pr_b["node"], pr_b["rank"])))

    fr_a = crawl_frontier(ds, k=10, num_partitions=4)
    fr_b = crawl_frontier(ds, k=10, num_partitions=4, edges_ds=ew)
    assert fr_a.values.tolist() == fr_b.values.tolist()

    cd_a = crawl_depth(ds, max_depth=3, num_partitions=4).to_pandas()
    cd_b = crawl_depth(ds, max_depth=3, num_partitions=4,
                       edges_ds=ew).to_pandas()
    assert (sorted(zip(cd_a["node"], cd_a["depth"]))
            == sorted(zip(cd_b["node"], cd_b["depth"])))

    mu_a = mutual_links(ds, num_partitions=4).to_pandas()
    mu_b = mutual_links(ds, num_partitions=4,
                        edges_ds=ew).to_pandas()
    assert (sorted(zip(mu_a["a"], mu_a["b"]))
            == sorted(zip(mu_b["a"], mu_b["b"])))

    import pytest as _pytest

    with _pytest.raises(ValueError, match="outdeg"):
        pagerank(ds, edges_ds=ew.select_columns(["src", "dst",
                                                 "n_links"]))


def test_co_citation_law(ray_session):
    """Shared-target pairs counted; hub targets (deg > cap) excluded;
    min_common enforced; (a, b) ascending ordering; edges_ds path
    identical."""
    import ray.data as rd

    from arabic_ocr_ray.functions.links import (
        co_citation,
        materialize_edges,
    )

    rows = [
        # p1, p2 share t1 and t2 (n_common 2); p3 shares only t1
        _page("https://h.test/p1", ["/t1", "/t2", "/hub"]),
        _page("https://h.test/p2", ["/t1", "/t2", "/hub"]),
        _page("https://h.test/p3", ["/t1", "/hub"]),
        # 4 more pages all citing /hub -> hub deg 7 > cap 4: excluded
        _page("https://h.test/p4", ["/hub"]),
        _page("https://h.test/p5", ["/hub"]),
        _page("https://h.test/p6", ["/hub"]),
        _page("https://h.test/p7", ["/hub"]),
    ]
    ds = rd.from_arrow(_pages_table(rows))
    out = co_citation(ds, min_common=2, k=10, max_indegree=4,
                      num_partitions=4)
    assert list(zip(out["a"], out["b"], out["n_common"])) == [
        ("https://h.test/p1", "https://h.test/p2", 2)]
    # without the hub cap every pair of the 7 citing pages appears
    out2 = co_citation(ds, min_common=2, k=50, max_indegree=100,
                       num_partitions=2)
    assert len(out2) == 3   # (p1,p2):3, (p1,p3):2, (p2,p3):2
    assert out2.iloc[0]["n_common"] == 3
    ew = materialize_edges(ds, num_partitions=4)
    out3 = co_citation(ds, min_common=2, k=10, max_indegree=4,
                       num_partitions=4, edges_ds=ew)
    assert out.values.tolist() == out3.values.tolist()
