"""Local twin of the driver's correctness gate.

Runs every registered query both through Spark and through DuckDB on the
same parquet tables, then compares row count, column names, and the
order-insensitive value multiset (floats to 6 decimals) — a stricter local
version of CORRECTNESS_r{N}.json.
"""

import math

import duckdb
import pandas as pd
import pytest

from data_model_spark.operators.registry import all_queries
from data_model_spark.sources.tables import TESTDATA_TABLES

QUERIES = all_queries()

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    return str(v)


def normalize(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(rows)


# has_oracle (not .oracle) keeps lazy oracle builders unresolved at pytest
# collection time — the expensive fixture oracles materialize only when
# their own test actually runs
SQL_CHECKED = sorted(n for n, s in QUERIES.items() if s.has_oracle)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if not s.has_oracle)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, ddb, name):
    spec = QUERIES[name]
    got = spec.spark_fn(spark, SF_DIR).toPandas()
    exp = ddb.execute(spec.oracle).fetchdf()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"column mismatch: {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"row count {len(got)} vs {len(exp)}"
    ng, ne = normalize(got), normalize(exp)
    mism = [i for i, (a, b) in enumerate(zip(ng, ne)) if a != b][:5]
    assert ng == ne, f"value mismatch at sorted rows {mism}: " + "; ".join(
        f"{ng[i]} != {ne[i]}" for i in mism
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    df = QUERIES[name].spark_fn(spark, SF_DIR)
    assert df.count() >= 0
