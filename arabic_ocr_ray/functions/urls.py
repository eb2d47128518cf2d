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
