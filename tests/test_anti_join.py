"""tiered_anti_join: all three tiers must return identical rows — the
tier only changes exchange volume, never the answer."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from fancyrag_ray.util import tiered_anti_join


def _sides():
    rng = np.random.default_rng(5)
    left_keys = rng.integers(0, 5000, 3000)
    right_keys = rng.integers(2500, 7500, 2000)  # ~half overlap range
    left = rd.from_arrow(
        pa.table({"k": left_keys, "payload": np.arange(len(left_keys))})
    ).repartition(4)
    right = rd.from_arrow(pa.table({"rk": right_keys})).repartition(4)
    expected = sorted(
        int(p) for k, p in zip(left_keys, np.arange(len(left_keys)))
        if k not in set(right_keys.tolist())
    )
    return left, right, expected


def _got(ds):
    df = ds.to_pandas()
    return sorted(int(x) for x in df["payload"])


class TestTieredAntiJoin:
    def test_broadcast_tier(self, ray_session):
        left, right, expected = _sides()
        out = tiered_anti_join(left, "k", right, "rk")  # small → tier 1
        assert _got(out) == expected

    def test_bloom_tier(self, ray_session):
        left, right, expected = _sides()
        # budget below the raw key bytes (2000×8×4 overhead ≈ 64k) but
        # above the bloom bitmap (2000×10/8 = 2.5k) → tier 2
        out = tiered_anti_join(left, "k", right, "rk", broadcast_budget_bytes=16_000)
        assert _got(out) == expected

    def test_join_tier(self, ray_session):
        left, right, expected = _sides()
        out = tiered_anti_join(left, "k", right, "rk", broadcast_budget_bytes=0)
        assert _got(out) == expected

    def test_string_keys_bloom_tier(self, ray_session):
        left = rd.from_arrow(
            pa.table({"k": [f"key-{i}" for i in range(400)], "payload": list(range(400))})
        )
        right = rd.from_arrow(pa.table({"rk": [f"key-{i}" for i in range(200, 800)]}))
        out = tiered_anti_join(left, "k", right, "rk", broadcast_budget_bytes=3_000)
        assert _got(out) == list(range(200))

    def test_empty_right_returns_left(self, ray_session):
        left = rd.from_arrow(pa.table({"k": [1, 2], "payload": [0, 1]}))
        right = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
        assert _got(tiered_anti_join(left, "k", right, "rk")) == [0, 1]

    def test_all_matched_bloom_tier_returns_empty(self, ray_session):
        left = rd.from_arrow(pa.table({"k": list(range(300)), "payload": list(range(300))}))
        right = rd.from_arrow(pa.table({"rk": list(range(300))}))
        out = tiered_anti_join(left, "k", right, "rk", broadcast_budget_bytes=2_000)
        assert out.count() == 0
