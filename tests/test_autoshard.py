"""Skew-adaptive windowed-relational dispatch (autoshard.py): the probe
statistic, the plan decision at both threshold sides, and result
equality no matter which plan runs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fancyrag_ray.functions.autoshard import (
    asof_join_auto,
    choose_windowed_path,
    keyed_running_total_auto,
    max_key_rows,
    range_join_auto,
    rolling_window_aggregate_auto,
)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def _events(counts: dict[int, int]) -> rd.Dataset:
    """counts: user_id → number of rows, timestamps spread over a day."""
    users, ts = [], []
    for u, n in counts.items():
        users.extend([u] * n)
        ts.extend(np.linspace(0, 86_400_000_000 - 1, n).astype(np.int64) + u)
    base = pd.Timestamp("2024-01-01").value // 1000
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(range(len(users)), pa.int64()),
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(np.array(ts) + base, pa.timestamp("us")),
                "value": pa.array(np.arange(len(users), dtype=np.float64) / 100.0),
            }
        )
    )


class TestProbe:
    def test_max_key_rows(self, ray_session):
        ds = _events({1: 7, 2: 3, 3: 11})
        assert max_key_rows(ds, "user_id") == 11

    def test_empty(self, ray_session):
        ds = _events({1: 1}).filter(lambda r: False)
        assert max_key_rows(ds, "user_id") == 0

    def test_union_probe_counts_combined_sides(self, ray_session):
        """The two-sided probe sums a key's rows ACROSS sides (that is
        what one co-partitioned block holds) and runs as one execution;
        keys hot on only one side still count correctly."""
        from fancyrag_ray.functions.autoshard import max_key_rows_union

        left = _events({1: 7, 2: 3})
        right = _events({1: 6, 3: 9}).map_batches(
            lambda t: pa.table({"r_user": t.column("user_id")}),
            batch_format="pyarrow",
        )
        # key 1: 7 + 6 = 13 combined beats key 3's single-side 9
        assert max_key_rows_union([(left, "user_id"), (right, "r_user")]) == 13
        assert max_key_rows_union([(left, "user_id")]) == 7

    def test_choice(self):
        assert choose_windowed_path(10, threshold=100) == "unsharded"
        assert choose_windowed_path(101, threshold=100) == "sharded"
        assert choose_windowed_path(100, threshold=100) == "unsharded"  # ≤ stays


class TestDispatch:
    """The decision actually routes to the right implementation (spied
    via monkeypatch on the module-level names the dispatchers call)."""

    def _spy(self, monkeypatch, module, name):
        import importlib

        mod = importlib.import_module(f"fancyrag_ray.functions.{module}")
        real = getattr(mod, name)
        calls = []

        def wrapper(*a, **k):
            calls.append(name)
            return real(*a, **k)

        monkeypatch.setattr(mod, name, wrapper)
        return calls

    def test_rolling_dispatch_both_sides(self, ray_session, monkeypatch):
        sharded = self._spy(monkeypatch, "timeshard", "rolling_window_aggregate_timesharded")
        unsharded = self._spy(monkeypatch, "relational", "rolling_window_aggregate")
        ds = _events({1: 50, 2: 5})

        def run(threshold):
            return rolling_window_aggregate_auto(
                ds, on="ts", by="user_id", value_col="value",
                window_seconds=3600, hot_key_threshold=threshold,
            ).to_pandas()

        run(10)  # densest key 50 > 10 → sharded
        assert sharded == ["rolling_window_aggregate_timesharded"] and unsharded == []
        run(1000)  # 50 ≤ 1000 → unsharded
        assert unsharded == ["rolling_window_aggregate"]

    def test_running_total_dispatch(self, ray_session, monkeypatch):
        sharded = self._spy(monkeypatch, "timeshard", "keyed_running_total_timesharded")
        ds = _events({1: 50})
        keyed_running_total_auto(
            ds, by="user_id", order=["ts", "event_id"], value_col="value",
            hot_key_threshold=10,
        ).to_pandas()
        assert sharded == ["keyed_running_total_timesharded"]


class TestResultEquality:
    """Both plans produce identical rows on the same input — forcing the
    threshold to each side must not change the answer."""

    def test_asof(self, ray_session):
        left = _events({1: 40, 2: 8})
        right = _events({1: 6, 2: 4}).map_batches(
            lambda t: pa.table(
                {
                    "r_user": t.column("user_id"),
                    "r_ts": t.column("ts"),
                    "payload": t.column("event_id"),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

        def run(threshold):
            return asof_join_auto(
                left, right, on="ts", by="user_id", right_on="r_ts",
                right_by="r_user", shard_seconds=3600, num_partitions=2,
                hot_key_threshold=threshold,
            ).to_pandas()

        assert _norm(run(1)).astype(str).equals(_norm(run(10**9)).astype(str))

    def test_range(self, ray_session):
        left = _events({1: 30, 2: 10})
        intervals = rd.from_arrow(
            pa.table(
                {
                    "i_user": pa.array([1, 1, 2], pa.int64()),
                    "t_lo": pa.array(
                        [pd.Timestamp("2024-01-01").value // 1000,
                         pd.Timestamp("2024-01-01 06:00").value // 1000,
                         pd.Timestamp("2024-01-01").value // 1000],
                        pa.timestamp("us"),
                    ),
                    "t_hi": pa.array(
                        [pd.Timestamp("2024-01-01 08:00").value // 1000,
                         pd.Timestamp("2024-01-01 23:00").value // 1000,
                         pd.Timestamp("2024-01-02").value // 1000],
                        pa.timestamp("us"),
                    ),
                    "tag": pa.array([10, 20, 30], pa.int64()),
                }
            )
        )

        def run(threshold):
            return range_join_auto(
                left, intervals, on="ts", by="user_id", lower="t_lo",
                upper="t_hi", right_by="i_user", shard_seconds=3600,
                num_partitions=2, hot_key_threshold=threshold,
            ).to_pandas()

        lo, hi = run(1), run(10**9)
        assert len(lo) > 0
        assert _norm(lo).astype(str).equals(_norm(hi).astype(str))

    def test_rolling_and_running(self, ray_session):
        base = _events({1: 25, 2: 12})
        # rolling sums an INTEGER cents column (both plans' contract);
        # running_total converts floats to cents itself
        cents = base.map_batches(
            lambda t: t.drop_columns(["value"]).append_column(
                "value_cents", t.column("event_id")
            ),
            batch_format="pyarrow",
        ).materialize()

        def run_roll(threshold):
            return rolling_window_aggregate_auto(
                cents, on="ts", by="user_id", value_col="value_cents",
                window_seconds=7200, hot_key_threshold=threshold,
            ).to_pandas()

        assert _norm(run_roll(1)).astype(str).equals(_norm(run_roll(10**9)).astype(str))

        def run_rt(threshold):
            return keyed_running_total_auto(
                base, by="user_id", order=["ts", "event_id"], value_col="value",
                hot_key_threshold=threshold,
            ).to_pandas()

        assert _norm(run_rt(1)).astype(str).equals(_norm(run_rt(10**9)).astype(str))


class TestSaltedJoin:
    def test_hot_key_salted_equals_plain(self, ray_session):
        """A planted 1000-row hot key must produce EXACTLY the plain
        join's rows through the salted path (salting is invisible)."""
        import pyarrow as pa
        import ray.data as rd

        from fancyrag_ray.functions.autoshard import salted_join

        left = rd.from_arrow(pa.table({"k": [1] * 1000 + [2, 3, 4], "x": list(range(1003))}))
        right = rd.from_arrow(pa.table({"rk": [1, 1, 2, 3, 5], "y": [10, 11, 20, 30, 50]}))
        s = salted_join(left, right, "k", "rk", n_salts=4, hot_threshold=100).to_pandas()
        p = left.join(right, join_type="inner", num_partitions=4, on=("k",), right_on=("rk",)).to_pandas()
        cols = sorted(s.columns)
        s = s[cols].sort_values(cols).reset_index(drop=True)
        p = p[cols].sort_values(cols).reset_index(drop=True)
        assert len(s) == 2002  # 1000 hot x 2 matches + 2 cold
        assert s.equals(p)

    def test_no_hot_key_passthrough(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from fancyrag_ray.functions.autoshard import salted_join

        left = rd.from_arrow(pa.table({"k": [1, 2, 3], "x": [1, 2, 3]}))
        right = rd.from_arrow(pa.table({"rk": [2, 3, 4], "y": [20, 30, 40]}))
        out = salted_join(left, right, "k", "rk").to_pandas()
        assert sorted(out["k"]) == [2, 3]


class TestProbeHottest:
    """Caller-supplied ``probe_hottest`` skips the probe execution and
    still dispatches correctly."""

    def test_skips_probe_and_dispatches(self, ray_session, monkeypatch):
        import fancyrag_ray.functions.autoshard as auto

        def boom(*a, **k):  # the probe must NOT run
            raise AssertionError("union probe executed despite probe_hottest")

        monkeypatch.setattr(auto, "max_key_rows_union", boom)
        left = _events({1: 30, 2: 10})
        intervals = rd.from_arrow(
            pa.table(
                {
                    "i_user": pa.array([1, 2], pa.int64()),
                    "t_lo": pa.array(
                        [pd.Timestamp("2024-01-01").value // 1000] * 2, pa.timestamp("us")
                    ),
                    "t_hi": pa.array(
                        [pd.Timestamp("2024-01-02").value // 1000] * 2, pa.timestamp("us")
                    ),
                    "tag": pa.array([10, 30], pa.int64()),
                }
            )
        )

        def run(hottest, threshold):
            return range_join_auto(
                left, intervals, on="ts", by="user_id", lower="t_lo",
                upper="t_hi", right_by="i_user", shard_seconds=3600,
                num_partitions=2, hot_key_threshold=threshold,
                probe_hottest=hottest,
            ).to_pandas()

        lo = run(hottest=5, threshold=10)     # below → unsharded, probe skipped
        hi = run(hottest=50, threshold=10)    # above → sharded, probe skipped
        assert _norm(lo).astype(str).equals(_norm(hi).astype(str))

    def test_attribution_derived_stat_equals_union_probe(self, ray_session, monkeypatch):
        """events_session_attribution derives the dispatcher statistic
        from the materialized session summaries (Σ n_events + n_sessions
        per user); it must equal what the union probe would measure over
        (events.user_id) ∪ (session intervals.s_user)."""
        import os

        import pyarrow.parquet as pq

        import fancyrag_ray.functions.autoshard as auto
        import fancyrag_ray.functions.relational as rel

        sf = os.environ.get("GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
        seen = {}
        real = auto.range_join_auto

        def capture(*a, **k):
            seen["hottest"] = k.get("probe_hottest")
            return real(*a, **k)

        monkeypatch.setattr(rel, "range_join_auto", capture, raising=False)
        # relational imports range_join_auto inside the function body, so
        # patch the source module attribute it resolves at call time
        monkeypatch.setattr(auto, "range_join_auto", capture)
        out = rel.events_session_attribution(sf)
        n_rows = out.count()
        assert n_rows == pq.read_metadata(f"{sf}/events.parquet").num_rows
        ev = rd.read_parquet(f"{sf}/events.parquet", columns=["user_id"])
        sess = rel.events_sessions_sharded(sf).map_batches(
            lambda t: pa.table({"s_user": t.column("user_id").cast(pa.int64())}),
            batch_format="pyarrow",
        )
        expected = auto.max_key_rows_union([(ev, "user_id"), (sess, "s_user")])
        assert seen["hottest"] == expected


class TestStatsCache:
    def test_parquet_stats_cache_memo_and_invalidation(self, ray_session, tmp_path, monkeypatch):
        """One probe per (file identity, key): the second call is a memo
        hit (no probe execution); rewriting the file invalidates."""
        import time

        import pyarrow.parquet as pq

        import fancyrag_ray.functions.autoshard as auto

        p = str(tmp_path / "t.parquet")
        pq.write_table(pa.table({"k": pa.array([1, 1, 1, 2], pa.int64())}), p)
        assert auto.max_key_rows_parquet(p, "k") == 3
        calls = []
        real = auto.max_key_rows
        monkeypatch.setattr(
            auto, "max_key_rows", lambda *a, **k: (calls.append(1), real(*a, **k))[1]
        )
        assert auto.max_key_rows_parquet(p, "k") == 3  # memo hit
        assert calls == []
        time.sleep(0.01)  # ensure a distinct mtime_ns
        pq.write_table(pa.table({"k": pa.array([5] * 7, pa.int64())}), p)
        assert auto.max_key_rows_parquet(p, "k") == 7  # stats refresh
        assert calls == [1]

    def test_hot_keys_parquet_free_from_scalar_cache(self, ray_session, tmp_path, monkeypatch):
        """When the scalar snapshot stat already shows the densest key
        ≤ threshold, the hot set is [] with NO probe; above threshold
        the set probe runs (and memoizes)."""
        import pyarrow.parquet as pq

        import fancyrag_ray.functions.autoshard as auto

        p = str(tmp_path / "h.parquet")
        pq.write_table(pa.table({"k": pa.array([1] * 9 + [2], pa.int64())}), p)
        assert auto.max_key_rows_parquet(p, "k") == 9  # primes the scalar cache

        def boom(*a, **k):
            raise AssertionError("hot_keys probe ran despite scalar-cache proof")

        monkeypatch.setattr(auto, "hot_keys", boom)
        assert auto.hot_keys_parquet(p, "k", threshold=20) == []  # 9 ≤ 20, free
        monkeypatch.undo()
        hot = auto.hot_keys_parquet(p, "k", threshold=5)  # 9 > 5 → probe
        assert list(hot) == [1]
        monkeypatch.setattr(auto, "hot_keys", boom)
        assert list(auto.hot_keys_parquet(p, "k", threshold=5)) == [1]  # memo hit
