"""Stream-shaped window operators (sessions, tumbling)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from arabic_ocr_ray.functions.windows import session_stats, tumbling_window


def _events(rows):
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[1], "us") for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([float(r[2]) for r in rows], pa.float64()),
    })


def test_session_stats(ray_session):
    import ray.data as rd

    rows = [
        (1, "2024-01-01T00:00:00", 1),
        (1, "2024-01-01T00:10:00", 1),   # same session (gap 10m)
        (1, "2024-01-01T01:00:00", 1),   # new session (gap 50m)
        (2, "2024-01-01T00:00:00", 1),   # single-event user
    ]
    out = (session_stats(rd.from_arrow(_events(rows)))
           .to_pandas().set_index("user_id").sort_index())
    assert out.loc[1, "n_sessions"] == 2
    assert out.loc[1, "n_events"] == 3
    assert out.loc[1, "max_session_events"] == 2
    assert out.loc[2, "n_sessions"] == 1


def test_tumbling_window(ray_session):
    import ray.data as rd

    rows = [
        (1, "2024-01-01T00:05:00", 2.0),
        (1, "2024-01-01T00:55:00", 3.0),   # same hour
        (1, "2024-01-01T01:05:00", 4.0),   # next hour
    ]
    out = (tumbling_window(rd.from_arrow(_events(rows)),
                           size_us=3_600_000_000)
           .to_pandas().sort_values("window_id"))
    assert list(out["n_events"]) == [2, 1]
    assert list(out["sum_value"]) == [5.0, 4.0]


def test_session_stats_salted_equals_unsalted(ray_session):
    """Hot-key salting: a randomized multi-user event log folded via
    (user, ts-bucket) partials + monoid merge must equal the plain
    fixed-partition fold, including sessions that SPAN bucket
    boundaries."""
    import ray.data as rd

    rng = np.random.RandomState(5)
    rows = []
    base = np.datetime64("2024-01-01T00:00:00", "us")
    for uid in range(25):
        t = base
        for _ in range(rng.randint(1, 120)):
            # gaps straddle the 30-min session threshold AND the
            # 2-hour salt bucket boundary
            t = t + np.timedelta64(int(rng.randint(1, 5400)), "s")
            rows.append((uid, t))
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    ds = rd.from_arrow(t)
    plain = (session_stats(ds).to_pandas()
             .sort_values("user_id").reset_index(drop=True))
    salted = (session_stats(ds, salt_bucket_us=2 * 3600 * 1_000_000)
              .to_pandas().sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(plain, salted[plain.columns],
                                  check_dtype=False)


def test_preceding_count(ray_session):
    import ray.data as rd

    from arabic_ocr_ray.functions.windows import preceding_count

    rows = [
        (7, 1, "2024-01-01T00:00:00"),
        (7, 2, "2024-01-01T00:20:00"),   # 1 in preceding hour
        (7, 3, "2024-01-01T00:50:00"),   # 2
        (7, 4, "2024-01-01T02:00:00"),   # 0 (gap > 1h)
        (9, 5, "2024-01-01T00:30:00"),   # other user: independent
        (9, 6, "2024-01-01T00:30:00"),   # exact tie: excluded both ways
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(r[2], "us") for r in rows],
                       pa.timestamp("us")),
    })
    out = (preceding_count(rd.from_arrow(t), window_us=3600 * 1_000_000)
           .to_pandas().set_index("event_id").sort_index())
    assert list(out["n_preceding"]) == [0, 1, 2, 0, 0, 0]


def test_hopping_window(ray_session):
    import ray.data as rd

    from arabic_ocr_ray.functions.windows import hopping_window

    rows = [
        (1, "2024-01-01T00:05:00", 2.0),   # windows starting 23:40? no —
        (1, "2024-01-01T00:40:00", 3.0),
        (1, "2024-01-01T01:10:00", 4.0),
    ]
    out = (hopping_window(rd.from_arrow(_events(rows)),
                          size_us=3600_000_000, hop_us=1800_000_000)
           .to_pandas().sort_values("window_id").reset_index(drop=True))
    # every event is in exactly 2 half-hour-hop windows
    assert out["n_events"].sum() == 6
    # window covering [00:00, 01:00) holds events 1 and 2
    ids = dict(zip(out["window_id"],
                   zip(out["n_events"], out["sum_value"])))
    full_hours_since_epoch = int(np.datetime64("2024-01-01T00:00:00", "us")
                                 .astype(np.int64) // 1800_000_000)
    assert ids[full_hours_since_epoch] == (2, 5.0)


def test_grouped_median(ray_session):
    import ray.data as rd

    from arabic_ocr_ray.functions.windows import grouped_median

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "value": pa.array([3.0, 1.0, 2.0, 10.0, 20.0], pa.float64()),
    })
    out = (grouped_median(rd.from_arrow(t), "user_id", "value")
           .to_pandas().set_index("user_id").sort_index())
    assert out.loc[1, "median"] == 2.0     # odd count
    assert out.loc[2, "median"] == 15.0    # even count: (10+20)/2


def test_grouped_quantile_duckdb_formula(ray_session):
    import ray.data as rd

    from arabic_ocr_ray.functions.windows import grouped_quantile

    t = pa.table({
        "user_id": pa.array([1] * 5 + [2] * 2, pa.int64()),
        "value": pa.array([5.0, 1.0, 3.0, 2.0, 4.0, 10.0, 20.0],
                          pa.float64()),
    })
    out = (grouped_quantile(rd.from_arrow(t), "user_id", "value", 0.25)
           .to_pandas().set_index("user_id").sort_index())
    # user 1 sorted [1..5]: pos=1.0 → exactly v[1]=2.0
    assert out.loc[1, "quantile"] == 2.0
    # user 2: pos=0.25 → 10*(1-.25) + 20*.25 = 12.5
    assert out.loc[2, "quantile"] == 12.5


def test_global_quantile_exact_matches_duckdb(ray_session):
    """Histogram-shape global quantile must be BIT-equal to DuckDB
    quantile_cont on duplicate-heavy integer data at several q."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from arabic_ocr_ray.functions.windows import global_quantile_exact

    rng = np.random.RandomState(9)
    vals = rng.randint(0, 40, size=501).astype("int64")  # heavy dups
    t = pa.table({"n_chars": pa.array(vals, pa.int64())})
    tf = pa.table({"n_chars": pa.array(
        np.round(rng.rand(301) * 7, 3), pa.float64())})  # float domain
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    ds = rd.from_arrow(t)
    con.register("tf", tf.to_pandas())
    dsf = rd.from_arrow(tf)
    for q in (0.0, 0.25, 0.5, 0.9, 0.95, 1.0):
        got = global_quantile_exact(ds, "n_chars", q)
        exp = con.execute(
            "SELECT quantile_cont(n_chars, ?) FROM t", [q]).fetchone()[0]
        assert got == exp, (q, got, exp)
        gotf = global_quantile_exact(dsf, "n_chars", q)
        expf = con.execute(
            "SELECT quantile_cont(n_chars, ?) FROM tf",
            [q]).fetchone()[0]
        assert gotf == expf, (q, gotf, expf)


def test_quantile_bounds_filter_matches_duckdb(ray_session):
    """Per-key [q10, q90] band filter must keep EXACTLY the rows the
    DuckDB quantile_cont twin keeps (bit-equal bounds, inclusive
    comparison) on duplicate-heavy per-key integer data."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from arabic_ocr_ray.functions.windows import (
        grouped_quantile_hist,
        quantile_bounds_filter,
    )

    rng = np.random.RandomState(17)
    langs = np.array(["en", "de", "ar"])[rng.randint(0, 3, 700)]
    vals = rng.randint(0, 60, 700).astype("int64")
    t = pa.table({
        "doc_id": pa.array(np.arange(700), pa.int64()),
        "lang": pa.array(langs, pa.string()),
        "n_chars": pa.array(vals, pa.int64()),
    })
    ds = rd.from_arrow(t)
    got = (quantile_bounds_filter(ds, "lang", "n_chars", 0.1, 0.9,
                                  num_partitions=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("d", t.to_pandas())
    exp = con.execute(
        "WITH b AS (SELECT lang, quantile_cont(n_chars, 0.1) AS lo, "
        "quantile_cont(n_chars, 0.9) AS hi FROM d GROUP BY lang) "
        "SELECT d.doc_id, d.lang, d.n_chars FROM d JOIN b USING (lang) "
        "WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi "
        "ORDER BY doc_id").df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    # bounds themselves bit-equal to quantile_cont
    bounds = grouped_quantile_hist(ds, "lang", "n_chars", (0.1, 0.9),
                                   num_partitions=4)
    expb = con.execute(
        "SELECT lang, quantile_cont(n_chars, 0.1) AS q0, "
        "quantile_cont(n_chars, 0.9) AS q1 FROM d GROUP BY lang "
        "ORDER BY lang").df()
    b = bounds.sort_values("lang").reset_index(drop=True)
    assert b["q0"].tolist() == expb["q0"].tolist()
    assert b["q1"].tolist() == expb["q1"].tolist()


def test_grouped_quantile_hist_cell_guard(ray_session):
    import pytest
    import ray.data as rd

    from arabic_ocr_ray.functions.windows import grouped_quantile_hist

    t = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "v": pa.array([1, 2, 3], pa.int64())})
    with pytest.raises(ValueError, match="max_cells"):
        grouped_quantile_hist(rd.from_arrow(t), "k", "v", (0.5,),
                              max_cells=2)
