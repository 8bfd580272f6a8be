"""Mirror of the driver's correctness gate: run every ``queries()`` entry
and compare against its ``oracle_sql()`` DuckDB result — row count,
column names, and order-insensitive values."""

import math
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as entrymod

SF_DIR = os.environ.get("GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        df = res.to_pandas()
        if df.shape[1] == 0:
            # Ray's to_pandas drops the schema at 0 rows; restore the
            # column contract from the dataset's Arrow schema
            sch = res.schema()
            if sch is not None and sch.names:
                df = pd.DataFrame({n: pd.Series(dtype=object) for n in sch.names})
        return df
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(name, oracle_con, ray_session):
    ray_df = _normalize(_to_pandas(QUERIES[name](SF_DIR)))
    sql_df = _normalize(oracle_con.execute(ORACLES[name]).fetchdf())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    for c in ray_df.columns:
        a, b = ray_df[c], sql_df[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            assert np.allclose(a.astype(float), b.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True), (
                f"{name}: column {c} differs"
            )
        else:
            mism = (a.astype(str) != b.astype(str))
            assert not mism.any(), f"{name}: column {c} differs at rows {list(a[mism].head())} vs {list(b[mism].head())}"


def test_rows_only_queries_run(ray_session):
    """No-oracle entries must still execute and return a stable schema."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = _to_pandas(QUERIES[name](SF_DIR))
        assert df is not None and df.shape[1] > 0, name


def test_entry_smoke(ray_session):
    df = _to_pandas(entrymod.entry())
    assert df.shape[0] >= 0 and df.shape[1] > 0
