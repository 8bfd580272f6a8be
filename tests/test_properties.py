"""Property-based tests (hypothesis) for the engine's SQL-parity
primitives: the integer-cents rounding contract and the running-total
window semantics hold for ARBITRARY inputs, not just the driver data."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


class TestToCentsMatchesSqlRound:
    @given(
        st.lists(
            st.one_of(
                # typical 2-decimal currency values
                st.integers(min_value=-10_000_00, max_value=10_000_00).map(lambda c: c / 100.0),
                # adversarial exact .5 cents boundaries and arbitrary doubles
                st.integers(min_value=-1000, max_value=1000).map(lambda k: k + 0.125),
                st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
            ),
            min_size=1,
            max_size=50,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_matches_duckdb_round(self, values):
        from fancyrag_ray.util import to_cents

        got = list(to_cents(values))
        con = duckdb.connect()
        con.execute("CREATE TABLE v(x DOUBLE)")
        con.executemany("INSERT INTO v VALUES (?)", [(float(x),) for x in values])
        want = [r[0] for r in con.execute(
            "SELECT CAST(ROUND(x * 100) AS BIGINT) FROM v"
        ).fetchall()]
        assert got == want


class TestRunningTotalProperty:
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),      # key
                st.integers(min_value=0, max_value=10_000),  # time
                st.integers(min_value=-10_000, max_value=10_000),  # cents-scaled value
            ),
            min_size=1,
            max_size=60,
        )
    )
    @settings(max_examples=25, deadline=None)
    def test_matches_pandas_reference(self, rows):  # ray_session is autouse
        """keyed_running_total over arbitrary (key, t, value) rows equals
        a direct per-key sorted cumsum (ids disambiguate duplicate
        timestamps, matching the deterministic-order contract)."""
        import ray.data as rd

        from fancyrag_ray.functions.analytics import keyed_running_total

        ids = list(range(len(rows)))
        t = pa.table(
            {
                "rid": pa.array(ids, pa.int64()),
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "t": pa.array([r[1] for r in rows], pa.int64()),
                "v": pa.array([r[2] / 100.0 for r in rows], pa.float64()),
            }
        )
        out = (
            keyed_running_total(
                rd.from_arrow(t), by="k", order=["t", "rid"], value_col="v",
                out_col="rc", num_partitions=2,
            )
            .to_pandas()
            .sort_values("rid")
            .reset_index(drop=True)
        )
        ref = t.to_pandas().sort_values(["k", "t", "rid"], kind="mergesort")
        from fancyrag_ray.util import to_cents

        ref["rc"] = ref.assign(_c=to_cents(ref["v"].to_numpy())).groupby("k")["_c"].cumsum()
        ref = ref.sort_values("rid").reset_index(drop=True)
        assert out["rc"].tolist() == ref["rc"].tolist()


class TestCountMinProperties:
    @given(
        st.lists(
            st.tuples(
                st.text(alphabet="abcdefgh", min_size=1, max_size=4),  # key
                st.integers(min_value=1, max_value=100),               # count
            ),
            min_size=1,
            max_size=200,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_never_underestimates_any_stream(self, items):
        """For ARBITRARY (key, count) streams: point query ≥ exact count
        for every key, and ≤ exact + total (the trivial upper bound is
        total mass; the probabilistic 2N/width bound is asserted on the
        planted test — here we pin the hard invariant only)."""
        from fancyrag_ray.functions.sketches import CountMinSketch, _hash_strings

        exact: dict = {}
        for k, c in items:
            exact[k] = exact.get(k, 0) + c
        s = CountMinSketch(width=256, depth=4)
        keys = [k for k, _ in items]
        s.add_hashes(_hash_strings(keys), np.array([c for _, c in items], np.int64))
        got = s.query_hashes(_hash_strings(list(exact)))
        want = np.array([exact[k] for k in exact], np.int64)
        total = sum(exact.values())
        assert (got >= want).all()
        assert (got <= total).all()

    @given(
        st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=0, max_size=80),
        st.lists(st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=0, max_size=80),
    )
    @settings(max_examples=100, deadline=None)
    def test_merge_associative_commutative(self, xs, ys):
        """merge(a,b) == merge(b,a) == single-pass(a+b) for arbitrary
        splits — the property the tree-reduce relies on."""
        from fancyrag_ray.functions.sketches import CountMinSketch, _hash_strings

        def build(keys):
            s = CountMinSketch(width=128, depth=3)
            if keys:
                s.add_hashes(_hash_strings(keys))
            return s

        ab = build(xs).merge(build(ys))
        ba = build(ys).merge(build(xs))
        whole = build(xs + ys)
        assert (ab.table == whole.table).all()
        assert (ba.table == whole.table).all()
