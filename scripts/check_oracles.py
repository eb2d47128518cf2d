"""Driver-simulator: run every queries() entry at a given sf and
compare row-count/schema/values against oracle_sql() via DuckDB.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

import sys
import time

sys.path.insert(0, ".")


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    assert isinstance(res, pd.DataFrame)
    return res


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main():
    import duckdb
    import pandas as pd
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import os

    # default 32 = the driver's exact conditions (the r2 near-dup
    # crash only reproduced at 32 CPUs — empty shuffle partitions)
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append(name)
            print(f"{name:24s} RAY-ERROR {type(e).__name__}: {e}")
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only rows={len(got)}  {dt:5.1f}s")
            continue
        try:
            exp = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            failures.append(name)
            print(f"{name:24s} SQL-ERROR {type(e).__name__}: {e}")
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    got.reset_index(drop=True), exp.reset_index(drop=True),
                    check_dtype=False, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).splitlines()[0]
                print(f"{name:24s} VALUE-DIFF {msg}")
            # dtype drift is a driver hash-mismatch even when values
            # agree (r1 corpus_stats) — surface it loudly
            dt_g = [str(t) for t in got.dtypes]
            dt_e = [str(t) for t in exp.dtypes]
            if ok_vals and dt_g != dt_e:
                print(f"{name:24s} DTYPE-DIFF got={dt_g} exp={dt_e}")
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
            if not ok_rows:
                print(f"  rows got={len(got)} exp={len(exp)}")
            if not ok_cols:
                print(f"  cols got={list(got.columns)} exp={list(exp.columns)}")
        print(f"{name:24s} {status} rows={len(got)}  {dt:5.1f}s")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
