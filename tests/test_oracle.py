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
    # Driver-grade strictness: NO dtype coercion here. Rounding floats is
    # the only transform (sort stability for the value compare); integer
    # widths and timestamp units must already agree with the oracle —
    # the round-4/5 verdicts showed coercion masks exactly the
    # mismatches the driver's value-hash flags (decimal128-vs-int64,
    # timestamp[s]-vs-[us] in events_retention).
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_no_decimal(name: str, table) -> None:
    """Driver-grade strictness: the driver value-hashes the raw Arrow
    values, so a DuckDB HUGEINT/decimal128 aggregate (uncast
    ``SUM(BIGINT*BIGINT)``) hash-mismatches an int64 engine column even
    when every value is identical. Reject decimal types outright so the
    local gate catches what the driver's hash catches (round-4 verdict:
    ``shipping_priority``, ``corpus_datacard``)."""
    import pyarrow as pa

    for f in table.schema:
        assert not pa.types.is_decimal(f.type), (
            f"{name}: oracle column {f.name!r} is {f.type} — cast the SQL "
            f"aggregate to BIGINT (::BIGINT) so dtypes match the engine"
        )


def _compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> None:
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    for c in ray_df.columns:
        a, b = ray_df[c], sql_df[c]
        a_f, b_f = pd.api.types.is_float_dtype(a), pd.api.types.is_float_dtype(b)
        a_i, b_i = pd.api.types.is_integer_dtype(a), pd.api.types.is_integer_dtype(b)
        # an int column on one side arriving float on the other is a
        # dtype contract violation, not a tolerance question
        assert not (a_i and b_f) and not (a_f and b_i), (
            f"{name}: column {c} dtype-kind mismatch {a.dtype} vs {b.dtype}"
        )
        # …and so are integer-width and timestamp-unit differences: the
        # str()-based value compare below can't see them ("2020-01-01"
        # prints the same at [s] and [us]) but the driver's raw-Arrow
        # value-hash does (round-5: events_retention timestamp[s])
        if not (a_f or b_f):
            assert str(a.dtype) == str(b.dtype), (
                f"{name}: column {c} dtype mismatch {a.dtype} vs {b.dtype}"
            )
        if a_f or b_f:
            assert np.allclose(a.astype(float), b.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True), (
                f"{name}: column {c} differs"
            )
        else:
            mism = (a.astype(str) != b.astype(str))
            assert not mism.any(), f"{name}: column {c} differs at rows {list(a[mism].head())} vs {list(b[mism].head())}"


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
    sql_arrow = oracle_con.execute(ORACLES[name]).arrow()
    _assert_no_decimal(name, sql_arrow)
    sql_df = _normalize(sql_arrow.to_pandas())
    _compare(name, ray_df, sql_df)


def test_uncast_hugeint_mirror_fails(oracle_con):
    """Regression pin for the round-4 driver red: an uncast
    ``SUM(BIGINT*BIGINT)`` mirror returns decimal128 (HUGEINT) and MUST
    fail this harness even though the values equal the int64 engine
    side — the driver's value-hash is dtype-sensitive."""
    bad = oracle_con.execute(
        "SELECT SUM(CAST(l_orderkey AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS v FROM lineitem"
    ).arrow()
    with pytest.raises(AssertionError, match="cast the SQL aggregate"):
        _assert_no_decimal("uncast_hugeint", bad)
    # and if the decimal arrives in pandas as float64 (duckdb's HUGEINT
    # fetchdf path), the int/float kind guard catches it too
    eng = pd.DataFrame({"v": pd.array([1], dtype="int64")})
    ora = _normalize(bad.to_pandas())
    if pd.api.types.is_float_dtype(ora["v"]):
        with pytest.raises(AssertionError):
            _compare("uncast_hugeint", _normalize(eng), ora)


def test_rows_only_queries_run(ray_session):
    """No-oracle entries must still execute and return a stable schema."""
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = _to_pandas(QUERIES[name](SF_DIR))
        assert df is not None and df.shape[1] > 0, name


def test_entry_smoke(ray_session):
    df = _to_pandas(entrymod.entry())
    assert df.shape[0] >= 0 and df.shape[1] > 0
