"""Emulates the driver's correctness gate: run every ``queries()`` entry
at sf0.01 and compare row-count + schema-shape + values against the
DuckDB ``oracle_sql()`` on the same parquet views."""
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

import os

SF_DIR = os.environ.get("ORACLE_PARITY_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
        elif pdf[c].dtype == object and len(pdf) and isinstance(
                pdf[c].iloc[0], (list, np.ndarray)):
            # array columns: sortable, exactly comparable tuples of
            # float64 (float32 widens identically in both engines)
            pdf[c] = pdf[c].map(
                lambda v: tuple(np.asarray(v, dtype=np.float64)))
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


ORACLES = entry_mod.oracle_sql()
ALL = entry_mod.queries()


@pytest.mark.parametrize("name", list(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    got = normalize(ALL[name](spark, SF_DIR).toPandas())
    exp = normalize(duck.execute(ORACLES[name]).fetchdf())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_exact=True)


@pytest.mark.parametrize("name", [q for q in ALL if q not in ORACLES])
def test_rows_only_queries_run(spark, name):
    df = ALL[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
