"""URL canonicalization + canonical-URL dedup (crawl-frontier hygiene).

A web crawl reaches the same page under many spellings — tracking
params, fragments, case-insensitive hosts, trailing slashes.  Exact
text dedup catches SOME of these (when the bodies are byte-identical),
but the curation pipeline wants to collapse them BEFORE fetching or
extracting: a cheap, pure-string canonical form.

Canonical form (documented contract, unit-tested; deliberately
conservative — every rule below is semantics-preserving under
RFC 3986 plus the de-facto utm_* convention):

1. the fragment (first ``#`` onward) is dropped — never sent to the
   server;
2. scheme and host (authority) are lowercased — both case-insensitive
   per RFC 3986 §6.2.2.1; path/query case is PRESERVED (significant);
3. an explicit default port (``:80`` for http, ``:443`` for https) is
   dropped;
4. ``utm_*`` query parameters are removed (``&``-separated scan; the
   ``?`` goes too when nothing survives); non-utm parameter ORDER is
   preserved (re-sorting params is NOT semantics-preserving in
   general);
5. trailing ``/`` characters are stripped — but ONLY when the URL has
   no query left after rule 4 (a trailing slash inside a query VALUE,
   e.g. ``?next=/``, is data and must survive); all of them at once,
   so the canonical form is a fixed point —
   ``canon(canon(u)) == canon(u)``, hypothesis-gated.

Scale shape: canonicalization is a pure per-row string map (zero
shuffle, no state — plain task pool, not an actor pool);
:func:`url_dedup` adds ONE canon-keyed shuffle whose per-group fold
elects min-url + count, exactly the ``dedup_exact`` D1 pattern.
"""

from __future__ import annotations

import re

import pyarrow as pa

_DEFAULT_PORT = {"http": ":80", "https": ":443"}


def canonicalize_url(u: str) -> str:
    """Apply the 5 canonicalization rules (module docstring)."""
    u = u.split("#", 1)[0]
    scheme, sep, rest = u.partition("://")
    if sep:
        # authority ends at the first '/' OR '?' (a query can follow
        # the host directly, path-less: https://e.com?x=1 — the query
        # must not be case-folded or port-scanned)
        cut = len(rest)
        for ch in ("/", "?"):
            p = rest.find(ch)
            if 0 <= p < cut:
                cut = p
        host, path = rest[:cut], rest[cut:]
        scheme = scheme.lower()
        host = host.lower()
        dp = _DEFAULT_PORT.get(scheme)
        if dp and host.endswith(dp):
            host = host[: -len(dp)]
        u = scheme + sep + host + path
    q = u.find("?")
    if q >= 0 and "utm_" in u[q:]:
        head, query = u[:q], u[q + 1:]
        keep = [p for p in query.split("&") if not p.startswith("utm_")]
        u = head + ("?" + "&".join(keep) if keep else "")
    return u if "?" in u else u.rstrip("/")


def canonicalize_batch(batch: pa.Table, col: str = "url",
                       out_col: str = "canon_url") -> pa.Table:
    """→ batch + ``out_col`` (canonical form of ``col``)."""
    urls = batch.column(col).to_pylist()
    return batch.append_column(
        out_col, pa.array([canonicalize_url(u or "") for u in urls],
                          pa.string()))


def url_dedup(ds, col: str = "url"):
    """→ Dataset(canon_url, url=min original spelling, n_variants) —
    one row per canonical URL.  ONE canon-keyed shuffle (the D1
    hash-partition + per-group min pattern of ``dedup.dedup_exact``);
    the min-spelling winner is deterministic across runs and cluster
    layouts."""
    from ray.data.aggregate import Count, Min

    canon = ds.map_batches(
        lambda b: canonicalize_batch(b.select([col]), col=col),
        batch_format="pyarrow")
    return canon.groupby("canon_url").aggregate(
        Min(col, alias_name=col),
        Count(alias_name="n_variants"),
    )


def latest_capture(ds, id_col: str = "url", ts_col: str = "warc_ts",
                   num_partitions: int = 64):
    """→ one FULL row per id: the newest capture (max ``ts_col``) —
    the crawl-archive revisit policy (WARC recency dedup: a URL
    re-crawled across snapshots keeps only its latest body).

    ONE id-keyed fixed-partition shuffle; each partition resolves all
    its ids with one vectorized sort + keep-last (never a python call
    per url).  Contract: ``(id, ts)`` pairs are unique per input (the
    crawl-archive invariant) — equal-ts duplicates have no defined
    winner; a null ts sorts FIRST (a malformed capture can never beat
    a real timestamp)."""
    import pandas as pd  # noqa: F401  (fold runs in pandas)

    from .arrowout import arrow_clean
    from .parthash import partition_ids

    names = list(ds.schema().names)

    def add_jk(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__jk", partition_ids([b.column(id_col)], num_partitions))

    def fold(df):
        df = df.sort_values([id_col, ts_col], kind="mergesort",
                            na_position="first")
        return df.drop_duplicates(id_col, keep="last")[names]

    return (ds.map_batches(add_jk, batch_format="pyarrow")
            .groupby("__jk", num_partitions=num_partitions)
            .map_groups(arrow_clean(fold), batch_format="pandas"))


# --- URL rule filter (crawl blocklist) ---------------------------------------
#: Every production crawl pipeline front-loads a URL rule filter —
#: ad/tracker hosts, spam TLD suffixes, infinite-calendar path
#: prefixes — BEFORE fetching or extracting.  Law (oracle-pinned,
#: every clause a vectorized Arrow kernel / a DuckDB builtin):
#:
#:   host        = authority part via the scheme regex ('' when the
#:                 url has no scheme — the links.host_of law);
#:   flags bit 0 = host ∈ block_hosts            (exact match)
#:   flags bit 1 = host ends with any suffix     (ends_with — never
#:                 LIKE, so no wildcard-escaping hazard)
#:   flags bit 2 = url  starts with any prefix   (starts_with)
#:   flags bit 3 = host ∈ allow_hosts            (the override)
#:   keep        = 1 iff allowlisted OR no block bit set.
#:
#: Rules are a BOUNDED small set by contract (a blocklist is
#: kilobytes, not a table) — they travel inside the UDF closure once
#: per task, never per batch; rows stream.

_URL_HOST_PAT = r"^[a-z][a-z0-9+.-]*://(?P<h>[^/]*)"


def url_rule_filter_batch(batch: pa.Table, rules: dict,
                          col: str = "url") -> pa.Table:
    """→ (url, flags, keep) — pure vectorized map (law above)."""
    import pyarrow.compute as pc

    urls = batch.column(col)
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    ex = pc.extract_regex(urls, _URL_HOST_PAT)
    host = pc.fill_null(pc.struct_field(ex, 0), "")

    def any_of(kernel, arr, needles):
        m = pa.array([False] * len(arr), pa.bool_())
        for s in needles:
            m = pc.or_(m, pc.fill_null(kernel(arr, s), False))
        return m

    b_exact = pc.fill_null(pc.is_in(
        host, value_set=pa.array(sorted(rules.get("block_hosts", ())),
                                 pa.string())), False)
    b_suff = any_of(pc.ends_with, host,
                    sorted(rules.get("block_host_suffixes", ())))
    b_pref = any_of(pc.starts_with, urls,
                    sorted(rules.get("block_path_prefixes", ())))
    allow = pc.fill_null(pc.is_in(
        host, value_set=pa.array(sorted(rules.get("allow_hosts", ())),
                                 pa.string())), False)

    import numpy as np

    f = (np.asarray(b_exact, dtype=np.int64)
         + 2 * np.asarray(b_suff, dtype=np.int64)
         + 4 * np.asarray(b_pref, dtype=np.int64)
         + 8 * np.asarray(allow, dtype=np.int64))
    keep = ((f & 8 != 0) | (f & 7 == 0)).astype(np.int64)
    return pa.table({"url": urls,
                     "flags": pa.array(f, pa.int64()),
                     "keep": pa.array(keep, pa.int64())})


def url_rule_filter(ds, rules: dict, col: str = "url"):
    """→ Dataset(url, flags, keep).  ZERO-shuffle streaming map;
    compose ``.filter``/semi-join downstream on ``keep``."""
    return ds.map_batches(
        lambda b: url_rule_filter_batch(b, rules, col),
        batch_format="pyarrow")


# --- robots.txt politeness filter -------------------------------------------
#: a crawl's politeness gate, fed from the corpus itself: every
#: ``scheme://host/robots.txt`` capture contributes its ``Disallow:``
#: prefixes, and pages whose path falls under a prefix for their own
#: host are dropped.  Law (oracle-pinned, deliberately simplified —
#: documented divergence from RFC 9309): ALL ``Disallow:`` lines
#: count regardless of User-agent grouping (a SQL twin cannot run the
#: stateful group parse; agent-``*`` groups are the overwhelming
#: majority in practice), the directive match is case-sensitive
#: ``Disallow:`` at line start, values are trimmed of ``[ \t\r]`` and
#: empties dropped (an empty Disallow means allow-all per RFC), and
#: robots bodies must decode as strict UTF-8 to contribute (the
#: links.py gate convention).  The robots.txt page itself is an
#: ordinary row — it survives unless a rule matches its own path.
_ROBOTS_URL_RE = re.compile(
    r"^[a-z][a-z0-9+.-]*://[^/]*/robots\.txt$")
_ROBOTS_TRIM = " \t\r"


def robots_rules_batch(batch: pa.Table, url_col: str = "url",
                       html_col: str = "html") -> pa.Table:
    """→ (host, prefix) rows from the robots.txt pages of a batch
    (per-file distinct, sorted for determinism).  Non-robots rows are
    skipped without decoding, so the scan stays cheap on ordinary
    corpus batches."""
    rows_h: list = []
    rows_p: list = []
    for u, hb in zip(batch.column(url_col).to_pylist(),
                     batch.column(html_col).to_pylist()):
        if not _ROBOTS_URL_RE.match(u or ""):
            continue
        if isinstance(hb, bytes):
            try:
                body = hb.decode("utf-8")
            except UnicodeDecodeError:
                continue
        else:
            body = hb or ""
        m = re.match(_URL_HOST_PAT, u)
        host = m.group("h") if m else ""
        seen = set()
        for line in body.split("\n"):
            if line.startswith("Disallow:"):
                p = line[9:].strip(_ROBOTS_TRIM)
                if p:
                    seen.add(p)
        for p in sorted(seen):
            rows_h.append(host)
            rows_p.append(p)
    return pa.table({"host": pa.array(rows_h, pa.string()),
                     "prefix": pa.array(rows_p, pa.string())})


def robots_rules(pages_ds, url_col: str = "url",
                 html_col: str = "html", num_partitions: int = 8):
    """→ Dataset(host, prefix), globally distinct (a host captured
    more than once contributes each rule once).  ONE keyed exchange
    ∝ RULES (≈ hosts × rules-per-host — never the corpus)."""
    from ray.data.aggregate import Count

    return (pages_ds.map_batches(
                lambda b: robots_rules_batch(b, url_col, html_col),
                batch_format="pyarrow")
            .groupby(["host", "prefix"],
                     num_partitions=num_partitions)
            .aggregate(Count(alias_name="_c"))
            .select_columns(["host", "prefix"]))


def robots_filter(pages_ds, url_col: str = "url",
                  html_col: str = "html", num_partitions: int = 8):
    """→ Dataset(url) — the corpus urls that survive their own host's
    robots rules (law above).

    Scale shape: rules are host-keyed rows, NEVER broadcast (hosts
    are unbounded at crawl scale — the opposite contract from
    url_rule_filter's kilobyte blocklist); pages ship only a
    (url, host, path) projection into ONE host-keyed join whose
    fan-out is rules-per-host (~10), hits ship url-only into ONE
    url-keyed anti-join; html never moves.  The per-row
    ``startswith`` over joined (path, prefix) pairs is a Python zip
    — no two-array Arrow kernel exists — but it runs on the join
    output (pages on rule-bearing hosts), not the corpus."""
    import pyarrow.compute as pc

    from .joins import hash_join

    rules = robots_rules(pages_ds, url_col, html_col,
                         num_partitions=num_partitions)

    def proj(b: pa.Table) -> pa.Table:
        urls = b.column(url_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        ex = pc.extract_regex(urls, _URL_HOST_PAT)
        host = pc.fill_null(pc.struct_field(ex, 0), "")
        path = pc.replace_substring_regex(
            urls, _URL_HOST_PAT.replace("(?P<h>", "("), "")
        return pa.table({"url": urls, "host": host, "path": path})

    pp = pages_ds.map_batches(proj, batch_format="pyarrow")
    pp_schema = pa.schema([("url", pa.string()),
                           ("host", pa.string()),
                           ("path", pa.string())])
    r_schema = pa.schema([("host", pa.string()),
                          ("prefix", pa.string())])

    joined = hash_join(pp, rules, on="host",
                       num_partitions=num_partitions,
                       left_schema=pp_schema,
                       right_schema=r_schema)

    def hit(b: pa.Table) -> pa.Table:
        keep = [u for u, p, r in zip(b.column("url").to_pylist(),
                                     b.column("path").to_pylist(),
                                     b.column("prefix").to_pylist())
                if p.startswith(r)]
        return pa.table({"url": pa.array(keep, pa.string())})

    hits = joined.map_batches(hit, batch_format="pyarrow")
    urls_only = pages_ds.map_batches(
        lambda b: pa.table({"url": b.column(url_col)}),
        batch_format="pyarrow")
    u_schema = pa.schema([("url", pa.string())])
    return hash_join(urls_only, hits, on="url", how="anti",
                     num_partitions=num_partitions,
                     left_schema=u_schema, right_schema=u_schema)


# --- URL template mining (spider-trap / calendar-trap detection) ------------


def url_shape_batch(batch: pa.Table, col: str = "url") -> pa.Table:
    """→ (shape) — one row per url with every ``[0-9]+`` run collapsed
    to ``N`` (the pinned template law: calendar/pagination/id traps
    differ only in their numeric runs, so their urls collapse to one
    shape).  Pure Arrow kernel (`replace_substring_regex`), zero
    Python per row."""
    import pyarrow.compute as pc

    urls = batch.column(col)
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    return pa.table({
        "shape": pc.replace_substring_regex(urls, "[0-9]+", "N")})


def url_pattern_stats(ds, k: int = 20, col: str = "url",
                      num_partitions: int = 8):
    """→ pandas DataFrame (≤ ``k`` rows): the most-populated URL
    templates — the crawl-hygiene report that surfaces spider traps
    (calendar pages, pagination explosions, session-id mirrors): a
    template whose population explodes while its content entropy
    stays flat is a trap, and population is the cheap first signal.

    Law (oracle-pinned): shape = every digit run collapsed to ``N``;
    ``n_urls`` = rows with that shape; order = n_urls DESC then shape
    ASC at the boundary (the crawl_frontier tie convention).

    Scale shape: pure vectorized map → map-side combine (per-block
    value_counts) → ONE shape-keyed Sum ∝ DISTINCT shapes — templates
    number ~10³–10⁶ at any crawl size, never the corpus — then the
    tree-combined topk."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from .topk import topk

    def partial(b: pa.Table) -> pa.Table:
        sh = url_shape_batch(b, col).column("shape")
        vc = sh.value_counts()
        return pa.table({
            "shape": vc.field("values"),
            "n": vc.field("counts").cast(pa.int64())})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("shape", num_partitions=num_partitions)
              .aggregate(Sum("n", alias_name="n_urls")))
    return topk(counts, "n_urls", k, descending=True,
                tie_cols=("shape",))


def host_dup_stats(pages_ds, url_col: str = "url",
                   content_col: str = "html",
                   num_partitions: int = 8):
    """→ Dataset(host, n_pages, n_dup_pages) — per-host duplication
    pressure: how many of a host's pages carry content that appears
    MORE THAN ONCE in the whole corpus (globally — mirrors count, the
    FineWeb-style site-quality signal: a host whose pages are mostly
    corpus-duplicates is a mirror/scraper and a candidate for
    domain-level demotion).

    Law (oracle-pinned): duplicate = content value occurring > 1×
    corpus-wide (the engine counts sha1 groups, the twin counts raw
    values — identical by the dedup_exact convention); host = the
    scheme-authority regex ('' on no scheme).

    Scale shape: content hashes map-side (html read once, never
    shuffled); ONE hash-keyed Count, ONE hash-keyed join of ~60 B
    (host, hash) rows against the counts, ONE host-keyed fold —
    every exchange ∝ rows of tiny projections."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum

    from .dedup import content_hash_batch
    from .joins import hash_join

    def proj(b: pa.Table) -> pa.Table:
        hashed = content_hash_batch(b, content_col, url_col)
        urls = hashed.column(url_col)
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        ex = pc.extract_regex(urls, _URL_HOST_PAT)
        host = pc.fill_null(pc.struct_field(ex, 0), "")
        return pa.table({"host": host,
                         "content_hash":
                         hashed.column("content_hash")})

    hp = pages_ds.map_batches(proj, batch_format="pyarrow")
    counts = (hp.groupby("content_hash",
                         num_partitions=num_partitions)
              .aggregate(Count(alias_name="_n")))
    hp_schema = pa.schema([("host", pa.string()),
                           ("content_hash", pa.string())])
    c_schema = pa.schema([("content_hash", pa.string()),
                          ("_n", pa.int64())])
    joined = hash_join(hp, counts, on="content_hash",
                       num_partitions=num_partitions,
                       left_schema=hp_schema,
                       right_schema=c_schema)

    def flag(b: pa.Table) -> pa.Table:
        n = np.asarray(b.column("_n"), dtype=np.int64)
        return pa.table({
            "host": b.column("host"),
            "one": pa.array(np.ones(len(n), np.int64)),
            "dup": pa.array((n > 1).astype(np.int64))})

    return (joined.map_batches(flag, batch_format="pyarrow")
            .groupby("host", num_partitions=num_partitions)
            .aggregate(Sum("one", alias_name="n_pages"),
                       Sum("dup", alias_name="n_dup_pages")))
