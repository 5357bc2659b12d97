"""Driver-correctness-gate simulation: every registered query vs its oracle.

Usage: python scripts/parity_check.py [SF_DIR] [name ...]

Mirrors the external driver's compare at the given scale factor (default
/root/testdata/sf0.01): for each oracle-backed query, run the Spark
callable AND the DuckDB oracle on the same parquet tables and compare row
count, sorted column names, and the order-insensitive value multiset
(floats to 6 decimals).  Rows-only queries are executed for row count.
Prints one line per query and a final summary; exit code 1 on any
mismatch or error.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    return str(v)


def normalize(pdf):
    cols = sorted(pdf.columns)
    return sorted(
        tuple(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False)
    )


def main() -> int:
    import duckdb

    from data_model_spark.cache import unpersist_tracked
    from data_model_spark.operators.registry import all_queries
    from data_model_spark.session import get_spark
    from data_model_spark.sources.tables import TESTDATA_TABLES

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    queries = all_queries()
    if only:
        unknown = only - set(queries)
        if unknown:
            print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
            return 1
        queries = {n: s for n, s in queries.items() if n in only}

    spark = get_spark(app_name="parity-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, spec in queries.items():
        t0 = time.perf_counter()
        try:
            got = spec.spark_fn(spark, sf_dir).toPandas()
            if spec.oracle is None:
                print(f"{name:28s} rows-only  {len(got):6d} rows"
                      f"  {time.perf_counter() - t0:6.2f}s")
                continue
            want = con.execute(spec.oracle).df()
            ok_rows = len(got) == len(want)
            ok_cols = sorted(got.columns) == sorted(want.columns)
            ok_vals = ok_rows and ok_cols and normalize(got) == normalize(want)
            status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
            if status != "OK":
                failures.append(name)
            print(
                f"{name:28s} {status:8s} {len(got):6d} vs {len(want):6d} rows"
                f"  cols={'ok' if ok_cols else 'DIFF'}"
                f"  vals={'ok' if ok_vals else 'DIFF'}"
                f"  {time.perf_counter() - t0:6.2f}s"
            )
        except Exception as exc:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"{name:28s} ERROR    {type(exc).__name__}: {exc}")
        finally:
            unpersist_tracked()

    print(
        f"\n{len(queries) - len(failures)}/{len(queries)} clean at {sf_dir}"
        + (f"; FAILURES: {failures}" if failures else "")
    )
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
