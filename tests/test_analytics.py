"""Unit tests for the distributed analytics operators (grouped top-N,
exact grouped quantiles, pivot-to-wide, stratified sampling)."""

import hashlib
import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from fancyrag_ray.functions.analytics import (
    grouped_quantile_exact,
    grouped_topk,
    pivot_counts,
    stratified_hash_sample,
)


class TestGroupedTopk:
    def test_rank_and_tiebreak(self, ray_session):
        """ROW_NUMBER semantics: k best per group by value desc, ties
        broken by id asc, 1-based rank; groups smaller than k keep all."""
        t = pa.table(
            {
                "g": pa.array([1, 1, 1, 1, 2], pa.int64()),
                "id": pa.array([10, 11, 12, 13, 20], pa.int64()),
                "v": pa.array([5.0, 9.0, 9.0, 1.0, 3.0], pa.float64()),
            }
        )
        out = (
            grouped_topk(
                rd.from_arrow(t), by="g", order_col="v", k=2, tiebreak="id",
                num_partitions=2,
            )
            .to_pandas()
            .sort_values(["g", "rk"])
            .reset_index(drop=True)
        )
        # ties at v=9.0: id 11 ranks before id 12; id 13 (v=1) pruned
        assert list(zip(out["g"], out["id"], out["rk"])) == [
            (1, 11, 1), (1, 12, 2), (2, 20, 1),
        ]

    def test_partial_prune_across_blocks(self, ray_session):
        """A group scattered across many input blocks still yields the
        global top-k (the per-block prune is a safe partial)."""
        n = 500
        t = pa.table(
            {
                "g": pa.array([0] * n, pa.int64()),
                "id": pa.array(list(range(n)), pa.int64()),
                "v": pa.array([float(i) for i in range(n)], pa.float64()),
            }
        )
        ds = rd.from_arrow(t).repartition(10)
        out = grouped_topk(
            ds, by="g", order_col="v", k=3, tiebreak="id", num_partitions=2
        ).to_pandas()
        assert sorted(out["id"]) == [n - 3, n - 2, n - 1]


class TestGroupedQuantileExact:
    def test_matches_quantile_disc_indexing(self, ray_session):
        """quantile_disc semantics: sorted index max(0, ceil(q*n)-1) —
        checked against a directly computed expansion, duplicates
        collapsing to (value, count) pairs across blocks."""
        vals = [10, 20, 20, 30, 40, 40, 40, 50]
        t = pa.table(
            {
                "g": pa.array(["a"] * len(vals), pa.string()),
                "v": pa.array(vals, pa.int64()),
            }
        )
        ds = rd.from_arrow(t).repartition(4)
        out = grouped_quantile_exact(
            ds, by="g", value_col="v", quantiles=[0.0, 0.5, 0.9, 1.0],
            out_names=["p0", "p50", "p90", "p100"], num_partitions=2,
        ).to_pandas()
        assert len(out) == 1
        row = out.iloc[0]
        sv = sorted(vals)
        for q, nm in [(0.0, "p0"), (0.5, "p50"), (0.9, "p90"), (1.0, "p100")]:
            idx = max(0, math.ceil(q * len(sv)) - 1)
            assert row[nm] == sv[idx], nm
        assert row["n"] == len(vals)

    def test_multiple_groups(self, ray_session):
        t = pa.table(
            {
                "g": pa.array(["a", "a", "b"], pa.string()),
                "v": pa.array([1, 3, 7], pa.int64()),
            }
        )
        out = (
            grouped_quantile_exact(
                rd.from_arrow(t), by="g", value_col="v", quantiles=[0.5],
                out_names=["p50"], num_partitions=2,
            )
            .to_pandas()
            .set_index("g")
        )
        assert out.loc["a", "p50"] == 1  # ceil(0.5*2)-1 = 0 → first value
        assert out.loc["b", "p50"] == 7


class TestPivotCounts:
    def test_wide_zero_filled(self, ray_session):
        t = pa.table(
            {
                "day": pa.array([1, 1, 1, 2], pa.int64()),
                "cat": pa.array(["x", "x", "y", "y"], pa.string()),
            }
        )
        out = (
            pivot_counts(
                rd.from_arrow(t).repartition(2), row_key="day", col_key="cat",
                categories=["x", "y", "z"], num_partitions=2,
            )
            .to_pandas()
            .set_index("day")
            .sort_index()
        )
        assert out.loc[1].tolist() == [2, 1, 0]
        assert out.loc[2].tolist() == [0, 1, 0]
        assert list(out.columns) == ["n_x", "n_y", "n_z"]

    def test_unlisted_category_ignored(self, ray_session):
        t = pa.table({"day": pa.array([1], pa.int64()), "cat": pa.array(["w"], pa.string())})
        out = pivot_counts(
            rd.from_arrow(t), row_key="day", col_key="cat", categories=["x"],
            num_partitions=2,
        ).to_pandas()
        assert out["n_x"].tolist() == [0]


class TestStratifiedSample:
    def test_per_stratum_thresholds(self, ray_session):
        """Rate 100% keeps everything in the stratum, 0%/unlisted keeps
        nothing, and the md5 rule matches an independent recomputation."""
        ids = list(range(200))
        strata = ["keep" if i % 2 else "half" for i in ids]
        t = pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "s": pa.array(strata, pa.string()),
            }
        )
        rates = {"keep": 10000, "half": 5000}
        out = stratified_hash_sample(
            rd.from_arrow(t), strata_col="s", id_col="id", rates_bp=rates
        ).to_pandas()
        from fancyrag_ray.functions.analytics import _hash_threshold

        expect = {
            i
            for i, s in zip(ids, strata)
            if hashlib.md5(str(i).encode()).hexdigest()[:4] < _hash_threshold(rates[s])
        }
        assert set(out["id"]) == expect
        # every "keep" row survives (threshold 10000bp ⇒ '10000' > 'ffff')
        assert sum(1 for s in out["s"] if s == "keep") == 100

    def test_unlisted_stratum_dropped(self, ray_session):
        t = pa.table({"id": pa.array([1, 2], pa.int64()), "s": pa.array(["u", "u"], pa.string())})
        out = stratified_hash_sample(
            rd.from_arrow(t), strata_col="s", id_col="id", rates_bp={"x": 10000}
        ).to_pandas()
        assert len(out) == 0


class TestRollupAndRunningTotal:
    def test_rollup_int_keys(self, ray_session):
        """Regression: rolled-up sentinel positions are strings; int key
        columns must cast cleanly instead of breaking the level union."""
        import ray.data as rd

        from fancyrag_ray.functions.analytics import rollup_counts

        t = pa.table(
            {
                "region_id": pa.array([1, 1, 2], pa.int64()),
                "day": pa.array(["d1", "d2", "d1"], pa.string()),
                "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            }
        )
        out = rollup_counts(rd.from_arrow(t), ["region_id", "day"], "value").to_pandas()
        rows = {(r.region_id, r.day): (r.n_rows, r.sum_cents) for r in out.itertuples()}
        assert rows[("1", "d1")] == (1, 100)
        assert rows[("1", "ALL")] == (2, 300)
        assert rows[("ALL", "ALL")] == (3, 600)

    def test_rollup_null_keys_match_coalesced_sql(self, ray_session):
        """NULL keys normalize to the sentinel BEFORE grouping, so the
        output is a row-for-row multiset match with a SQL mirror that
        COALESCEs INSIDE the ROLLUP (the ADVICE-flagged divergence:
        coalescing only in the SELECT list keeps a separate null group).
        Note both sides emit two ('ALL','ALL') rows here — the subtotal
        of the null-keyed group and the grand total — which is the
        documented sentinel-collision shape."""
        import duckdb
        import ray.data as rd

        from fancyrag_ray.functions.analytics import rollup_counts

        t = pa.table(
            {
                "k": pa.array(["x", None, "x"], pa.string()),
                "day": pa.array(["d1", "d1", "d2"], pa.string()),
                "value": pa.array([1.0, 2.0, 4.0], pa.float64()),
            }
        )
        out = rollup_counts(rd.from_arrow(t), ["k", "day"], "value").to_pandas()
        got = sorted(zip(out["k"], out["day"], out["n_rows"], out["sum_cents"]))
        con = duckdb.connect()
        con.register("t", t)
        sql = """
        SELECT COALESCE(k, 'ALL') AS k, COALESCE(day, 'ALL') AS day,
               COUNT(*)::BIGINT AS n_rows,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        FROM (SELECT COALESCE(k, 'ALL') AS k, day, value FROM t)
        GROUP BY ROLLUP(k, day)
        """
        odf = con.execute(sql).df()
        want = sorted(zip(odf["k"], odf["day"], odf["n_rows"], odf["sum_cents"]))
        assert got == want
        # the NULL row landed in the sentinel group at the finest level
        assert ("ALL", "d1", 1, 200) in got

    def test_running_total_half_away_rounding(self, ray_session):
        """to_cents rounds .5 away from zero like SQL ROUND (np.rint's
        half-to-even would give 812 for 8.125)."""
        from fancyrag_ray.util import to_cents

        assert list(to_cents([8.125, -8.125, 6.55, 0.0])) == [813, -813, 655, 0]


class TestGlobalRunningTotal:
    def test_matches_numpy_cumsum_across_buckets(self, ray_session):
        """Hierarchical prefix sum (bucket sums → driver prefix →
        within-bucket cumsum) equals a direct global cumsum, across
        many buckets and partitions, with gaps in the key space."""
        import numpy as np
        import ray.data as rd

        from fancyrag_ray.functions.analytics import global_running_total

        rng = np.random.default_rng(11)
        ids = np.sort(rng.choice(200_000, size=20_000, replace=False)).astype(np.int64)
        vals = rng.integers(1, 100, size=len(ids)).astype(np.int64)
        t = pa.table({"k": pa.array(ids), "v": pa.array(vals)})
        out = (
            global_running_total(
                rd.from_arrow(t).repartition(8), order_col="k", value_col="v",
                out_col="c", bucket_width=1024, num_partitions=4,
            )
            .to_pandas().sort_values("k").reset_index(drop=True)
        )
        assert out["c"].to_numpy().tolist() == np.cumsum(vals).tolist()


class TestHourValueStats:
    def test_moments_match_numpy(self, ray_session):
        """Distributed integer moments ≡ a dense numpy computation, and
        the Pearson r derived from them ≡ np.corrcoef."""
        import pyarrow.parquet as pq

        from fancyrag_ray.functions.analytics import events_hour_value_stats

        sf = "/root/testdata/sf0.001"
        out = events_hour_value_stats(sf).to_pandas().set_index("event_type")
        t = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "ts", "value"])
        df = t.to_pandas()
        df["x"] = df["ts"].dt.hour.astype(np.int64)
        v = df["value"].to_numpy()
        df["y"] = np.trunc(v * 100.0 + np.copysign(0.5, v)).astype(np.int64)
        for et, g in df.groupby("event_type"):
            row = out.loc[et]
            x, y = g["x"].to_numpy(), g["y"].to_numpy()
            assert row["n"] == len(g)
            assert row["sum_x"] == x.sum() and row["sum_y"] == y.sum()
            assert row["sum_xx"] == (x * x).sum() and row["sum_yy"] == (y * y).sum()
            assert row["sum_xy"] == (x * y).sum()
            assert row["cov_num"] == len(g) * (x * y).sum() - x.sum() * y.sum()
            # derived Pearson r agrees with numpy (float check, consumer-side)
            den = np.sqrt(
                float(row["n"] * row["sum_xx"] - row["sum_x"] ** 2)
                * float(row["n"] * row["sum_yy"] - row["sum_y"] ** 2)
            )
            if den > 0 and np.std(x) > 0 and np.std(y) > 0:
                r_engine = float(row["cov_num"]) / den
                r_np = np.corrcoef(x, y)[0, 1]
                assert abs(r_engine - r_np) < 1e-9


class TestCopurchase:
    def test_planted_baskets(self, ray_session, tmp_path):
        """Planted baskets: pair (1,2) appears in 3 orders, (1,3) in 2,
        (2,3) in 1 (filtered by min_orders=2); duplicate lineitems of
        the same part in one order count once."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from fancyrag_ray.functions.analytics import copurchase_pairs

        rows = [
            (100, 1), (100, 2), (100, 3),
            (200, 1), (200, 2), (200, 2),   # dup part 2 — counts once
            (300, 1), (300, 2),
            (400, 1), (400, 3),
        ]
        t = pa.table({
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_shipdate": pa.array([None] * len(rows), pa.timestamp("us")),
        })
        pq.write_table(t, f"{tmp_path}/lineitem.parquet")
        out = copurchase_pairs(str(tmp_path)).to_pandas()
        got = {(r.p1, r.p2): r.n_orders for r in out.itertuples()}
        assert got == {(1, 2): 3, (1, 3): 2}

    def test_matches_duckdb_on_testdata(self, ray_session):
        import duckdb

        from fancyrag_ray.functions.analytics import COPURCHASE_PAIRS_SQL, copurchase_pairs

        sf = "/root/testdata/sf0.001"
        out = copurchase_pairs(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')")
        sql = con.execute(COPURCHASE_PAIRS_SQL).fetchdf().reset_index(drop=True)
        assert out.equals(sql)
