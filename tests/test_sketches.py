import numpy as np
import pyarrow as pa
import ray.data as rd

from fancyrag_ray.functions.sketches import HllSketch, approx_distinct


class TestHll:
    @staticmethod
    def _hashes(rng, n):
        # full 64-bit hashes (rng.integers caps at 2^63 and would leave
        # the top index bit — and half the registers — always empty)
        return np.frombuffer(rng.bytes(n * 8), dtype=np.uint64).copy()

    def test_estimate_within_error(self):
        rng = np.random.default_rng(42)
        s = HllSketch(p=12)
        n = 50_000
        s.add_hashes(self._hashes(rng, n))
        est = s.estimate()
        assert abs(est - n) / n < 0.05  # ~1.04/sqrt(4096) ≈ 1.6% std error

    def test_merge_equals_union(self):
        rng = np.random.default_rng(7)
        a, b = HllSketch(), HllSketch()
        ha = self._hashes(rng, 10_000)
        hb = self._hashes(rng, 10_000)
        a.add_hashes(ha)
        b.add_hashes(hb)
        u = HllSketch()
        u.add_hashes(np.concatenate([ha, hb]))
        assert np.array_equal(a.merge(b).registers, u.registers)

    def test_small_cardinality_linear_counting(self):
        s = HllSketch()
        s.add_hashes(np.arange(1, 50, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        assert abs(s.estimate() - 49) < 5

    def test_dataset_approx_distinct(self, ray_session):
        ds = rd.read_parquet("/root/testdata/sf0.001/orders.parquet", columns=["o_custkey"])
        est = approx_distinct(ds, "o_custkey")
        exact = len(set(ds.to_pandas()["o_custkey"]))
        assert abs(est - exact) / exact < 0.1
