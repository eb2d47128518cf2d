"""URL rule filter (crawl blocklist law) + vocabulary drift report."""

import numpy as np
import pyarrow as pa
import pytest

from arabic_ocr_ray.functions.urls import (
    url_rule_filter,
    url_rule_filter_batch,
)


RULES = {
    "block_hosts": ["tracker.test"],
    "block_host_suffixes": [".ads.test"],
    "block_path_prefixes": ["https://ok.test/calendar/"],
    "allow_hosts": ["vip.ads.test"],
}


def test_url_rule_filter_law(ray_session):
    import ray.data as rd

    urls = [
        "https://ok.test/page",            # clean         -> keep
        "https://tracker.test/x",          # exact host    -> drop
        "https://banner.ads.test/x",       # suffix        -> drop
        "https://vip.ads.test/x",          # suffix+allow  -> keep
        "https://ok.test/calendar/2031",   # prefix        -> drop
        "no-scheme-url",                   # host=''       -> keep
    ]
    t = pa.table({"url": pa.array(urls, pa.string())})
    out = url_rule_filter(rd.from_arrow(t), RULES).to_pandas() \
        .set_index("url")
    assert out.loc[urls[0]].tolist() == [0, 1]     # flags, keep
    assert out.loc[urls[1]].tolist() == [1, 0]
    assert out.loc[urls[2]].tolist() == [2, 0]
    assert out.loc[urls[3]].tolist() == [2 + 8, 1]
    assert out.loc[urls[4]].tolist() == [4, 0]
    assert out.loc[urls[5]].tolist() == [0, 1]


def test_url_rule_filter_matches_twin_semantics():
    """Batch kernel ≡ the DuckDB clause set on adversarial urls
    (empty, null-ish, multi-rule overlap)."""
    import duckdb

    urls = [
        "https://tracker.test/x",
        "https://sub.tracker.test/x",      # NOT exact -> keep
        "https://x.ads.test/calendar/",
        "https://ok.test/calendar/",       # prefix boundary: equal
        "https://ok.test/calenda",         # shorter than prefix
        "",
        "https://",                        # host ''
    ]
    t = pa.table({"url": pa.array(urls, pa.string())})
    got = url_rule_filter_batch(t, RULES).to_pandas()
    con = duckdb.connect()
    con.register("u", t)
    bh = "','".join(sorted(RULES["block_hosts"]))
    ah = "','".join(sorted(RULES["allow_hosts"]))
    sfx = sorted(RULES["block_host_suffixes"])[0]
    pfx = sorted(RULES["block_path_prefixes"])[0]
    want = con.execute(f"""
      WITH h AS (SELECT url,
        regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/]*)', 1) AS host
        FROM u),
      f AS (SELECT url,
        (CASE WHEN host IN ('{bh}') THEN 1 ELSE 0 END
         + CASE WHEN ends_with(host, '{sfx}') THEN 2 ELSE 0 END
         + CASE WHEN starts_with(url, '{pfx}') THEN 4 ELSE 0 END
         + CASE WHEN host IN ('{ah}') THEN 8 ELSE 0 END) AS flags
        FROM h)
      SELECT url, CAST(flags AS BIGINT) AS flags,
        CAST(CASE WHEN (flags & 8) != 0 OR (flags & 7) = 0
             THEN 1 ELSE 0 END AS BIGINT) AS keep FROM f
    """).df()
    assert got.equals(want)


def test_vocab_drift_report(ray_session):
    import ray.data as rd

    from arabic_ocr_ray.functions.text import vocab_drift

    def docs(rows):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array(rows, pa.string())}))

    # 'surge' 1 -> 15 occurrences (+bits), 'gone' 12 -> 0 (-bits),
    # 'flat' unchanged, 'rare' pruned by min_total
    a = ["flat gone " * 6 + "surge", "rare"]
    b = ["flat " * 6 + "surge " * 15]
    out = vocab_drift(docs(a), docs(b), k=10, min_total=5)
    got = {r["token"]: (r["n_a"], r["n_b"], r["shift_bits"])
           for _, r in out.iterrows()}
    assert got["surge"] == (1, 15, 1 - 4)
    assert got["gone"] == (6, 0, 3 - 1)
    assert got["flat"] == (6, 6, 0)
    assert "rare" not in got
    # ranking: |shift| desc, token asc; rank is 1-based dense order
    assert out["rank"].tolist() == list(range(1, len(out) + 1))
    abss = out["shift_bits"].abs().tolist()
    assert abss == sorted(abss, reverse=True)


def test_vocab_drift_partitioning_invariant(ray_session):
    import ray.data as rd

    from arabic_ocr_ray.functions.text import vocab_drift

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(30)]
    mk = lambda n: [" ".join(rng.choice(vocab, size=20)) for _ in range(n)]
    ta = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                   "text": pa.array(mk(40), pa.string())})
    tb = pa.table({"doc_id": pa.array(range(25), pa.int64()),
                   "text": pa.array(mk(25), pa.string())})
    r1 = vocab_drift(rd.from_arrow(ta), rd.from_arrow(tb), k=15)
    r2 = vocab_drift(rd.from_arrow(ta).repartition(7),
                     rd.from_arrow(tb).repartition(3), k=15)
    assert r1.equals(r2)


def test_robots_rules_parse_law():
    """Disallow parsing: case-sensitive directive, [ \\t\\r] trim,
    empty-value drop, per-file distinct, strict-UTF-8 gate,
    non-robots urls skipped."""
    import pyarrow as pa

    from arabic_ocr_ray.functions.urls import robots_rules_batch

    t = pa.table({
        "url": ["https://a.test/robots.txt",
                "https://a.test/page",          # not robots: skipped
                "https://b.test/robots.txt",    # bad UTF-8: gated
                "https://c.test/sub/robots.txt"],  # path'd: NOT host
        "html": [b"User-agent: x\nDisallow: /p1/\r\n"
                 b"disallow: /lower/\nDisallow:\t/p2\t\n"
                 b"Disallow: /p1/\nDisallow:   \nAllow: /ok\n",
                 b"Disallow: /never/",
                 b"\xff\xfeDisallow: /gated/",
                 b"Disallow: /sub/"],
    })
    out = robots_rules_batch(t)
    got = list(zip(out.column("host").to_pylist(),
                   out.column("prefix").to_pylist()))
    # /sub/robots.txt is not scheme://host/robots.txt -> no rules
    assert got == [("a.test", "/p1/"), ("a.test", "/p2")]


def test_robots_filter_host_scoped(ray_session):
    """Rules bind only their own host; unruled hosts pass whole; the
    robots page itself is an ordinary row; no-scheme urls pass."""
    import pyarrow as pa
    import ray.data as rd

    from arabic_ocr_ray.functions.urls import robots_filter

    t = pa.table({
        "url": ["https://a.test/robots.txt",
                "https://a.test/priv/1",     # dropped
                "https://a.test/priv",       # kept: /priv !start /priv/
                "https://a.test/pub/1",      # kept
                "https://b.test/priv/1",     # kept: b.test has no rules
                "no-scheme-url"],            # kept: host ''
        "html": [b"Disallow: /priv/\n", b"x", b"x", b"x", b"x", b"x"],
    })
    out = robots_filter(rd.from_arrow(t), num_partitions=4).to_pandas()
    assert sorted(out["url"]) == [
        "https://a.test/priv",
        "https://a.test/pub/1",
        "https://a.test/robots.txt",
        "https://b.test/priv/1",
        "no-scheme-url",
    ]


def test_url_pattern_stats_trap_collapse(ray_session):
    """Calendar-trap urls differing only in digit runs collapse to
    one shape; ranking is n_urls DESC then shape ASC; partitioning-
    invariant."""
    import pyarrow as pa
    import ray.data as rd

    from arabic_ocr_ray.functions.urls import url_pattern_stats

    urls = ([f"https://t.test/cal/2024/{m:02d}/{d:02d}"
             for m in range(1, 4) for d in range(1, 4)]   # 9 → 1 shape
            + ["https://t.test/about", "https://t.test/a1b2"])
    t = pa.table({"url": pa.array(urls, pa.string())})
    for nb in (1, 4):
        out = url_pattern_stats(
            rd.from_arrow(t).repartition(nb), k=10, num_partitions=2)
        assert list(zip(out["shape"], out["n_urls"])) == [
            ("https://t.test/cal/N/N/N", 9),
            ("https://t.test/aNbN", 1),
            ("https://t.test/about", 1),
        ]


def test_host_dup_stats_global_duplicates(ray_session):
    """Duplicate = content occurring >1x CORPUS-WIDE: cross-host
    mirrors count on both hosts; unique content does not."""
    import pyarrow as pa
    import ray.data as rd

    from arabic_ocr_ray.functions.urls import host_dup_stats

    t = pa.table({
        "url": ["https://a.test/1", "https://a.test/2",
                "https://b.test/1", "https://b.test/2",
                "no-scheme"],
        "html": [b"same", b"uniqA", b"same", b"uniqB", b"same"],
    })
    out = (host_dup_stats(rd.from_arrow(t), num_partitions=4)
           .to_pandas().set_index("host").sort_index())
    assert out.loc["a.test", "n_pages"] == 2
    assert out.loc["a.test", "n_dup_pages"] == 1   # the mirror page
    assert out.loc["b.test", "n_dup_pages"] == 1
    assert out.loc["", "n_pages"] == 1             # no-scheme host ''
    assert out.loc["", "n_dup_pages"] == 1         # same content 3x
