"""Stream-shaped windowed operators over an ordered, partitioned log.

Ray Data has no event-time windows; the engine expresses them with the
FIXED-PARTITION fold shape (the same shape that took MinHash-LSH from
470 s to 28 s at 360k docs): rows are hash-partitioned on the key into
``num_partitions`` groups and each partition runs ONE vectorized numpy
fold over all of its keys at once — never a python call per key
(measured 3 orders of magnitude slower on mostly-small groups, r1
verdict).

Partitioning assumption: one PARTITION's events fit in one group task
(many keys per partition).  A single hot key that alone overflows a
task is handled by :func:`session_stats` with ``salt_bucket_us`` set:
events are sub-partitioned into (key, ts-bucket) groups, each bucket
folds independently into a session PARTIAL (a monoid carrying first/
last session lengths), and partials merge per key — the documented
hot-key salting, now implemented and tested for equality with the
unsalted fold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .arrowout import arrow_clean

THIRTY_MIN_US = 30 * 60 * 1_000_000
_PARTITIONS = 64


def _ts_us(col) -> np.ndarray:
    return col.to_numpy().astype("datetime64[us]").astype(np.int64)


def _add_pk(b: pa.Table, key: str, n_parts: int) -> pa.Table:
    k = np.asarray(b.column(key), dtype=np.int64)
    # splitmix-style scramble: user ids are often sequential; raw % P
    # would map contiguous ranges to contiguous partitions
    h = (k * np.int64(-7046029254386353131)) >> np.int64(32)
    return b.append_column("pk", pa.array(h % n_parts, pa.int32()))


def session_stats(events_ds, gap_us: int = THIRTY_MIN_US,
                  num_partitions: int = _PARTITIONS,
                  salt_bucket_us: int | None = None):
    """Per-user session windows: a new session starts when the gap to
    the previous event exceeds ``gap_us``.

    → Dataset(user_id, n_sessions, n_events, max_session_events).
    Ties in ts are harmless (gap 0 never splits).  Shuffle key:
    ``hash(user_id) % num_partitions`` (or (user, ts-bucket) when
    ``salt_bucket_us`` is set — see module docstring).
    """
    if salt_bucket_us is not None:
        return _session_stats_salted(events_ds, gap_us, salt_bucket_us,
                                     num_partitions)

    def fold_part(g: pd.DataFrame) -> pd.DataFrame:
        return _fold_sessions(g["user_id"].to_numpy(),
                              _ts_us(g["ts"]), gap_us)

    return (events_ds
            .map_batches(lambda b: _add_pk(b, "user_id", num_partitions),
                         batch_format="pyarrow")
            .groupby("pk")
            .map_groups(arrow_clean(fold_part), batch_format="pandas"))


def _fold_sessions(u: np.ndarray, ts: np.ndarray,
                   gap_us: int) -> pd.DataFrame:
    """ONE vectorized sessionization over every key in the partition."""
    if len(u) == 0:
        return pd.DataFrame({
            "user_id": pd.Series(dtype="int64"),
            "n_sessions": pd.Series(dtype="int64"),
            "n_events": pd.Series(dtype="int64"),
            "max_session_events": pd.Series(dtype="int64"),
        })
    order = np.lexsort((ts, u))
    u, ts = u[order], ts[order]
    new_user = np.empty(len(u), dtype=bool)
    new_user[0] = True
    np.not_equal(u[1:], u[:-1], out=new_user[1:])
    gaps = np.empty(len(ts), dtype=np.int64)
    gaps[0] = 0
    np.subtract(ts[1:], ts[:-1], out=gaps[1:])
    new_session = new_user | (gaps > gap_us)

    user_starts = np.flatnonzero(new_user)
    sess_starts = np.flatnonzero(new_session)          # ⊇ user_starts
    sess_len = np.diff(np.append(sess_starts, len(u)))
    n_events = np.diff(np.append(user_starts, len(u)))
    n_sessions = np.add.reduceat(new_session.astype(np.int64),
                                 user_starts)
    # sessions are contiguous per user; the first session of each user
    # sits at searchsorted(sess_starts, user_starts) exactly
    first_sess = np.searchsorted(sess_starts, user_starts)
    max_sess = np.maximum.reduceat(sess_len, first_sess)
    return pd.DataFrame({
        "user_id": u[user_starts],
        "n_sessions": n_sessions.astype(np.int64),
        "n_events": n_events.astype(np.int64),
        "max_session_events": max_sess.astype(np.int64),
    })


# --- salted (hot-key) sessionization ---------------------------------------
#
# Session partial per (key, ts-bucket) — an associative monoid:
#   (n_sessions, n_events, max_len, first_ts, last_ts,
#    first_len = events in the bucket's first session,
#    last_len  = events in its last session)
# combine(A, B) for time-adjacent partials of one key merges A's last
# session with B's first when the boundary gap ≤ gap_us.

_PARTIAL_COLS = ("n_sessions", "n_events", "max_len",
                 "first_ts", "last_ts", "first_len", "last_len")


def _session_stats_salted(events_ds, gap_us: int, bucket_us: int,
                          num_partitions: int):
    def add_salt_pk(b: pa.Table) -> pa.Table:
        k = np.asarray(b.column("user_id"), dtype=np.int64)
        ts = np.asarray(b.column("ts").cast(pa.int64()))
        bucket = ts // bucket_us
        h = ((k * np.int64(-7046029254386353131))
             ^ (bucket * np.int64(-7046029254386353131 ^ -1))) >> np.int64(32)
        out = b.append_column("bucket", pa.array(bucket, pa.int64()))
        return out.append_column("pk",
                                 pa.array(h % num_partitions, pa.int32()))

    def fold_buckets(g: pd.DataFrame) -> pd.DataFrame:
        """Partial sessionization of every (key, bucket) group in the
        partition, vectorized exactly like _fold_sessions but keyed by
        (user, bucket)."""
        u = g["user_id"].to_numpy()
        bk = g["bucket"].to_numpy()
        ts = _ts_us(g["ts"])
        if len(u) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "bucket": pd.Series(dtype="int64"),
                 **{c: pd.Series(dtype="int64") for c in _PARTIAL_COLS}})
        order = np.lexsort((ts, bk, u))
        u, bk, ts = u[order], bk[order], ts[order]
        new_grp = np.empty(len(u), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (u[1:] != u[:-1]) | (bk[1:] != bk[:-1])
        gaps = np.empty(len(ts), dtype=np.int64)
        gaps[0] = 0
        np.subtract(ts[1:], ts[:-1], out=gaps[1:])
        new_session = new_grp | (gaps > gap_us)

        grp_starts = np.flatnonzero(new_grp)
        grp_end = np.append(grp_starts[1:], len(u))
        sess_starts = np.flatnonzero(new_session)
        sess_len = np.diff(np.append(sess_starts, len(u)))
        first_sess = np.searchsorted(sess_starts, grp_starts)
        next_first = np.append(first_sess[1:], len(sess_starts))
        n_sessions = next_first - first_sess
        return pd.DataFrame({
            "user_id": u[grp_starts],
            "bucket": bk[grp_starts],
            "n_sessions": n_sessions.astype(np.int64),
            "n_events": (grp_end - grp_starts).astype(np.int64),
            "max_len": np.maximum.reduceat(sess_len, first_sess)
            .astype(np.int64),
            "first_ts": ts[grp_starts],
            "last_ts": ts[grp_end - 1],
            "first_len": sess_len[first_sess].astype(np.int64),
            "last_len": sess_len[next_first - 1].astype(np.int64),
        })

    def merge_partials(g: pd.DataFrame) -> pd.DataFrame:
        """Per-key monoid merge of time-ordered bucket partials.
        Partials per key = buckets touched — small by construction."""
        g = g.sort_values(["user_id", "bucket"], kind="mergesort")
        out_rows = []
        for uid, gu in g.groupby("user_id", sort=False):
            acc = None
            for row in gu.itertuples(index=False):
                cur = {c: int(getattr(row, c)) for c in _PARTIAL_COLS}
                if acc is None:
                    acc = cur
                    continue
                if cur["first_ts"] - acc["last_ts"] <= gap_us:
                    joined = acc["last_len"] + cur["first_len"]
                    n = acc["n_sessions"] + cur["n_sessions"] - 1
                    acc = {
                        "n_sessions": n,
                        "n_events": acc["n_events"] + cur["n_events"],
                        "max_len": max(acc["max_len"], cur["max_len"],
                                       joined),
                        "first_ts": acc["first_ts"],
                        "last_ts": cur["last_ts"],
                        "first_len": joined
                        if acc["n_sessions"] == 1 else acc["first_len"],
                        "last_len": joined
                        if cur["n_sessions"] == 1 else cur["last_len"],
                    }
                else:
                    acc = {
                        "n_sessions":
                            acc["n_sessions"] + cur["n_sessions"],
                        "n_events": acc["n_events"] + cur["n_events"],
                        "max_len": max(acc["max_len"], cur["max_len"]),
                        "first_ts": acc["first_ts"],
                        "last_ts": cur["last_ts"],
                        "first_len": acc["first_len"],
                        "last_len": cur["last_len"],
                    }
            out_rows.append((uid, acc["n_sessions"], acc["n_events"],
                             acc["max_len"]))
        return pd.DataFrame(
            out_rows, columns=["user_id", "n_sessions", "n_events",
                               "max_session_events"]).astype("int64")

    partials = (events_ds
                .map_batches(add_salt_pk, batch_format="pyarrow")
                .groupby("pk")
                .map_groups(arrow_clean(fold_buckets), batch_format="pandas"))
    return (partials
            .map_batches(lambda b: _add_pk(b, "user_id", num_partitions),
                         batch_format="pyarrow")
            .groupby("pk")
            .map_groups(arrow_clean(merge_partials), batch_format="pandas"))


def preceding_count(events_ds, window_us: int,
                    id_col: str = "event_id",
                    num_partitions: int = _PARTITIONS):
    """Sliding preceding-window RANGE aggregate: for every event, the
    number of same-user events with ``ts ∈ [ts − window_us, ts)``
    (strictly earlier; ties at the exact same ts are excluded on both
    sides, so the rule is order-free and SQL-twinnable).

    The range join a naive plan would express as an O(n²)-per-user
    self-join runs here as: fixed hash partitions on user →
    per-partition sort by (user, ts) → two ``np.searchsorted`` calls
    per user SEGMENT (binary searches over contiguous slices — numpy
    per segment, one python iteration per user in the partition, not
    per event).  → Dataset(id_col, n_preceding).
    """
    def fold_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                id_col: pd.Series(dtype="int64"),
                "n_preceding": pd.Series(dtype="int64")})
        u = g["user_id"].to_numpy()
        ts = _ts_us(g["ts"])
        ev = g[id_col].to_numpy()
        order = np.lexsort((ts, u))
        u, ts, ev = u[order], ts[order], ev[order]
        starts = np.flatnonzero(
            np.concatenate([[True], u[1:] != u[:-1]]))
        ends = np.append(starts[1:], len(u))
        n_prec = np.empty(len(u), dtype=np.int64)
        for s, e in zip(starts, ends):
            seg = ts[s:e]
            hi = np.searchsorted(seg, seg, side="left")
            lo = np.searchsorted(seg, seg - window_us, side="left")
            n_prec[s:e] = hi - lo
        return pd.DataFrame({id_col: ev,
                             "n_preceding": n_prec})

    return (events_ds
            .map_batches(lambda b: _add_pk(b, "user_id", num_partitions),
                         batch_format="pyarrow")
            .groupby("pk")
            .map_groups(arrow_clean(fold_part), batch_format="pandas"))


def hopping_window(events_ds, size_us: int, hop_us: int,
                   value_col: str = "value"):
    """Hopping (sliding) event-time windows: every event lands in all
    windows ``[w·hop, w·hop + size)`` that contain it (``size/hop``
    windows per event) → (user_id, window_id=w) count/sum.

    flat-map expansion inside ``map_batches`` (vectorized repeat) then
    the same hash aggregation as :func:`tumbling_window` — window_id is
    the window's start/hop index, negative ids allowed near epoch 0.
    """
    if size_us % hop_us != 0:
        raise ValueError("size_us must be a multiple of hop_us")
    per_event = size_us // hop_us
    from ray.data.aggregate import Count, Sum

    def expand(b: pa.Table) -> pa.Table:
        us = np.asarray(b.column("ts").cast(pa.int64()))
        hi = us // hop_us                      # last window start idx
        lo = (us - size_us) // hop_us + 1      # first window start idx
        n = b.num_rows
        # per_event consecutive window ids per row (floor div makes
        # hi - lo + 1 == per_event exactly)
        wid = (np.repeat(lo, per_event)
               + np.tile(np.arange(per_event, dtype=np.int64), n))
        idx = np.repeat(np.arange(n, dtype=np.int64), per_event)
        return pa.table({
            "user_id": b.column("user_id").take(pa.array(idx)),
            "window_id": pa.array(wid, pa.int64()),
            value_col: b.column(value_col).take(pa.array(idx)),
        })

    return (events_ds.map_batches(expand, batch_format="pyarrow")
            .groupby(["user_id", "window_id"])
            .aggregate(Count(alias_name="n_events"),
                       Sum(value_col, alias_name="sum_value")))


def grouped_median(ds, key_col: str, value_col: str,
                   num_partitions: int = _PARTITIONS):
    """Exact per-key median (DuckDB ``median``-compatible continuous
    rule: middle element, or the mean of the two middle elements) —
    fixed hash partitions on the key, one vectorized sort +
    reduceat-style segment indexing per partition.  → Dataset(key,
    median)."""
    def fold_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                key_col: pd.Series(dtype="int64"),
                "median": pd.Series(dtype="float64")})
        k = g[key_col].to_numpy()
        v = g[value_col].to_numpy().astype(np.float64)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        starts = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        ends = np.append(starts[1:], len(k))
        n = ends - starts
        mid_hi = starts + n // 2
        mid_lo = starts + (n - 1) // 2
        med = (v[mid_lo] + v[mid_hi]) / 2.0
        return pd.DataFrame({key_col: k[starts], "median": med})

    return (ds
            .map_batches(lambda b: _add_pk(b, key_col, num_partitions),
                         batch_format="pyarrow")
            .groupby("pk")
            .map_groups(arrow_clean(fold_part), batch_format="pandas"))


def grouped_quantile(ds, key_col: str, value_col: str, q: float,
                     num_partitions: int = _PARTITIONS):
    """Exact per-key continuous quantile, DuckDB ``quantile_cont``-
    compatible: with pos = (n−1)·q, result =
    ``v[lo]·(1−frac) + v[hi]·frac`` — this exact two-sided lerp (NOT
    numpy's formulation) reproduces DuckDB bit-for-bit (verified on
    150 keys).  Same fixed-partition fold as :func:`grouped_median`.
    → Dataset(key, quantile)."""
    def fold_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                key_col: pd.Series(dtype="int64"),
                "quantile": pd.Series(dtype="float64")})
        k = g[key_col].to_numpy()
        v = g[value_col].to_numpy().astype(np.float64)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        starts = np.flatnonzero(
            np.concatenate([[True], k[1:] != k[:-1]]))
        n = np.diff(np.append(starts, len(k)))
        pos = (n - 1) * q
        lo = np.floor(pos).astype(np.int64)
        frac = pos - lo
        hi = np.minimum(lo + 1, n - 1)
        qv = (v[starts + lo] * (1.0 - frac)
              + v[starts + hi] * frac)
        return pd.DataFrame({key_col: k[starts], "quantile": qv})

    return (ds
            .map_batches(lambda b: _add_pk(b, key_col, num_partitions),
                         batch_format="pyarrow")
            .groupby("pk")
            .map_groups(arrow_clean(fold_part), batch_format="pandas"))


def tumbling_window(events_ds, size_us: int, value_col: str = "value"):
    """Tumbling event-time windows: (user_id, window_id) → count/sum.
    Pure hash aggregation (no per-group ordering needed) — the cheap
    path; kept beside :func:`session_stats` to document the tradeoff."""
    from ray.data.aggregate import Count, Sum

    def bucket(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64())
        win = pa.array(np.asarray(us) // size_us, pa.int64())
        return pa.table({"user_id": b.column("user_id"),
                         "window_id": win,
                         value_col: b.column(value_col)})

    return (events_ds.map_batches(bucket, batch_format="pyarrow")
            .groupby(["user_id", "window_id"])
            .aggregate(Count(alias_name="n_events"),
                       Sum(value_col, alias_name="sum_value")))


def global_quantile_exact(ds, value_col: str, q: float) -> float:
    """Exact GLOBAL continuous quantile with NO global sort: the
    value-counts histogram shape.  One ``groupby(value).count()``
    shuffle bounds the data moved by |distinct values| — for the
    curation gates this feeds (doc lengths, token counts) that domain
    is a small integer set at ANY corpus size, so the sorted-histogram
    lerp runs driver-side on a tiny table while the 100 TB of rows
    stay distributed.  DuckDB ``quantile_cont``-compatible: identical
    two-sided lerp as :func:`grouped_quantile` (pos = (n−1)·q,
    ``v[lo]·(1−frac) + v[hi]·frac``)."""
    from ray.data.aggregate import Count

    vc = (ds.groupby(value_col, num_partitions=8)
          .aggregate(Count(alias_name="_n")).to_pandas())
    if not len(vc):
        return float("nan")
    vc = vc.sort_values(value_col).reset_index(drop=True)
    vals = vc[value_col].to_numpy().astype(np.float64)
    cnt = vc["_n"].to_numpy().astype(np.int64)
    n = int(cnt.sum())
    pos = (n - 1) * q
    lo = int(np.floor(pos))
    frac = pos - lo
    hi = min(lo + 1, n - 1)
    cum = np.cumsum(cnt)
    v_lo = vals[int(np.searchsorted(cum, lo + 1))]
    v_hi = vals[int(np.searchsorted(cum, hi + 1))]
    return float(v_lo * (1.0 - frac) + v_hi * frac)


def grouped_quantile_hist(ds, key_col: str, value_col: str,
                          qs: tuple, num_partitions: int = 8,
                          max_cells: int = 5_000_000):
    """Exact PER-KEY continuous quantiles with NO global sort — the
    per-group generalization of :func:`global_quantile_exact`: one
    ``groupby(key, value).count()`` shuffle bounds the data moved by
    |distinct (key, value) cells|, then the DuckDB-bit-equal
    two-sided lerp runs driver-side per key on the tiny histogram.

    → pandas DataFrame (key, q0, q1, …) with one column per entry of
    ``qs`` named ``q{i}``.

    Contract: the (key, value) cell count must be bounded-small
    (curation gates: languages × doc lengths ≈ 10⁵ at ANY corpus
    size).  ``max_cells`` RAISES when the histogram exceeds it (the
    paragraphs.py convention: fail loudly, never silently
    materialize an unbounded table on the driver) — an unbounded
    domain wants :func:`grouped_quantile`'s fold instead."""
    import pandas as pd

    from ray.data.aggregate import Count

    vc = (ds.groupby([key_col, value_col],
                     num_partitions=num_partitions)
          .aggregate(Count(alias_name="_n")).to_pandas())
    if len(vc) > max_cells:
        raise ValueError(
            f"grouped_quantile_hist: {len(vc)} (key, value) cells "
            f"exceed max_cells={max_cells}; the value domain is not "
            "bounded-small — use grouped_quantile's distributed "
            "fold instead")
    vc = vc.sort_values([key_col, value_col]).reset_index(drop=True)
    out_rows = []
    for key, g in vc.groupby(key_col, sort=False):
        vals = g[value_col].to_numpy().astype(np.float64)
        cnt = g["_n"].to_numpy().astype(np.int64)
        n = int(cnt.sum())
        cum = np.cumsum(cnt)
        row = [key]
        for q in qs:
            pos = (n - 1) * q
            lo = int(np.floor(pos))
            frac = pos - lo
            hi = min(lo + 1, n - 1)
            v_lo = vals[int(np.searchsorted(cum, lo + 1))]
            v_hi = vals[int(np.searchsorted(cum, hi + 1))]
            row.append(float(v_lo * (1.0 - frac) + v_hi * frac))
        out_rows.append(row)
    return pd.DataFrame(
        out_rows, columns=[key_col] + [f"q{i}" for i in
                                       range(len(qs))])


def quantile_bounds_filter(ds, key_col: str, value_col: str,
                           q_lo: float = 0.1, q_hi: float = 0.9,
                           num_partitions: int = 8):
    """Keep rows whose ``value_col`` lies within the per-key
    [q_lo, q_hi] continuous-quantile band (inclusive) — the
    percentile-calibrated curation gate (the CCNet/FineWeb move:
    thresholds per LANGUAGE, not one global cutoff, because length
    and quality distributions differ by language).

    Scale shape: bounds come from :func:`grouped_quantile_hist`'s
    bounded-small histogram (one cell-keyed shuffle), then ride the
    task closure as a tiny dict — every row is filtered by ONE
    vectorized per-key mask pass, zero further shuffles, streaming.
    Keys absent from the bounds table (impossible for bounds built
    from the same ds, possible for a caller-supplied subset) drop."""
    import pyarrow.compute as pc

    bounds = grouped_quantile_hist(ds, key_col, value_col,
                                   (q_lo, q_hi),
                                   num_partitions=num_partitions)
    bmap = {r[key_col]: (r["q0"], r["q1"])
            for _, r in bounds.iterrows()}

    def keep(b: pa.Table) -> pa.Table:
        v = np.asarray(b.column(value_col), dtype=np.float64)
        mask = np.zeros(len(v), dtype=bool)
        keys = b.column(key_col)
        for k, (lo, hi) in bmap.items():
            km = np.asarray(pc.equal(keys, k).combine_chunks()
                            .fill_null(False))
            mask |= km & (v >= lo) & (v <= hi)
        return b.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
