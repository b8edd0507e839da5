"""Oracle-comparison harness mirroring the driver's correctness gate:
row count + column names + order-insensitive exact value comparison."""

from __future__ import annotations

import glob
import os

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def duck_con(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for path in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(path).replace(".parquet", "")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str = SF_DIR) -> None:
    got = _normalize(spark_df.toPandas())
    con = duck_con(sf_dir)
    want = _normalize(con.sql(oracle_sql).df())
    con.close()
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        assert gk == wk or {gk, wk} <= {"i", "u"}, (
            f"dtype kind mismatch on {c}: spark={got[c].dtype} oracle={want[c].dtype}"
        )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
