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


class TestMisraGries:
    def test_heavy_hitter_guarantee_on_zipf(self):
        import numpy as np

        from fancyrag_ray.functions.sketches import MisraGries

        rng = np.random.default_rng(0)
        stream = [f"v{z}" for z in rng.zipf(1.5, 20000) if z < 1000]
        mg = MisraGries(k=32)
        mg.add_many(stream)
        from collections import Counter

        exact = Counter(stream)
        n = len(stream)
        # every value with true frequency > n/(k+1) must be present
        for v, c in exact.items():
            if c > n / 33:
                assert v in mg.counters, f"{v} (count {c}) missing"
        # reported counts undercount by at most n/(k+1)
        for v, c in mg.counters.items():
            assert exact[v] >= c >= exact[v] - n / 33

    def test_merge_matches_single_pass_guarantees(self):
        from collections import Counter

        from fancyrag_ray.functions.sketches import MisraGries

        a = ["x"] * 500 + ["y"] * 300 + [f"n{i}" for i in range(200)]
        b = ["x"] * 400 + ["z"] * 350 + [f"m{i}" for i in range(200)]
        m1 = MisraGries(k=16)
        m1.add_many(a)
        m2 = MisraGries(k=16)
        m2.add_many(b)
        m1.merge(m2)
        exact = Counter(a + b)
        n = len(a) + len(b)
        for v, c in exact.items():
            if c > n / 17:
                assert v in m1.counters
        top = max(m1.counters, key=m1.counters.get)
        assert top == "x"

    def test_distributed_top_sources(self, ray_session):
        import pyarrow.parquet as pq
        import ray.data as rd
        from collections import Counter

        from fancyrag_ray.functions.sketches import approx_heavy_hitters

        sf = "/root/testdata/sf0.001"
        ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["source"])
        top = approx_heavy_hitters(ds, "source", k=64, top=5)
        exact = Counter(pq.read_table(f"{sf}/documents.parquet", columns=["source"]).column("source").to_pylist())
        # k=64 >> distinct sources ⇒ counts are EXACT; compare with the
        # sketch's own deterministic (-count, name) tie-break
        want = sorted(exact.items(), key=lambda kv: (-kv[1], str(kv[0])))[:5]
        assert top == want

    def test_native_key_types_preserved(self, ray_session):
        """Summaries travel as Arrow columns in the column's native type:
        int heavy hitters must come back as ints, not JSON-stringified
        keys (r2 ADVICE: json.dumps merged 1 and "1")."""
        from fancyrag_ray.functions.sketches import approx_heavy_hitters

        vals = [7] * 50 + [13] * 20 + list(range(100, 130))
        ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())}))
        top = approx_heavy_hitters(ds, "v", k=16, top=2)
        assert [t[0] for t in top] == [7, 13]
        assert all(isinstance(t[0], int) for t in top)


class TestKllQuantiles:
    def test_rank_error_and_weight_conservation(self):
        import numpy as np

        from fancyrag_ray.functions.sketches import KllSketch

        rng = np.random.default_rng(7)
        data = rng.lognormal(3, 1.5, 400_000)
        s = KllSketch(256, 42)
        for chunk in np.array_split(data, 16):
            s.extend(chunk)
        assert s.total_weight == len(data)  # odd-buffer survivors conserve weight
        srt = np.sort(data)
        for q in (0.01, 0.25, 0.5, 0.75, 0.99):
            est = s.quantile(q)
            rank = np.searchsorted(srt, est) / len(data)
            assert abs(rank - q) <= 0.01, (q, est, rank)
        # retained size is O(k log(n/k)), nowhere near n
        assert sum(len(b) for b in s.levels) < 16 * 256

    def test_extremes_exact_and_merge(self):
        import numpy as np

        from fancyrag_ray.functions.sketches import KllSketch

        rng = np.random.default_rng(11)
        data = rng.normal(0, 100, 200_000)
        parts = [KllSketch(256, 42) for _ in range(8)]
        for p, chunk in zip(parts, np.array_split(data, 8)):
            p.extend(chunk)
        m = parts[0]
        for p in parts[1:]:
            m.merge(p)
        assert m.total_weight == len(data)
        assert m.quantile(0.0) == data.min()
        assert m.quantile(1.0) == data.max()
        srt = np.sort(data)
        for q in (0.1, 0.5, 0.9):
            rank = np.searchsorted(srt, m.quantile(q)) / len(data)
            assert abs(rank - q) <= 0.01

    def test_distributed_approx_quantiles(self, ray_session):
        import numpy as np

        from fancyrag_ray.functions.sketches import approx_quantiles

        rng = np.random.default_rng(3)
        data = rng.exponential(50.0, 150_000)
        ds = rd.from_arrow(pa.table({"v": data})).repartition(12)
        out = approx_quantiles(ds, "v", [0.25, 0.5, 0.95])
        srt = np.sort(data)
        for q, est in out.items():
            rank = np.searchsorted(srt, est) / len(data)
            assert abs(rank - q) <= 0.01, (q, est, rank)

    def test_empty_and_nan_inputs(self, ray_session):
        import math

        from fancyrag_ray.functions.sketches import approx_quantiles

        ds = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
        out = approx_quantiles(ds, "v", [0.5])
        assert math.isnan(out[0.5])
        ds2 = rd.from_arrow(pa.table({"v": pa.array([float("nan"), 1.0, 2.0, 3.0])}))
        out2 = approx_quantiles(ds2, "v", [0.5])
        assert 1.0 <= out2[0.5] <= 3.0  # NaNs dropped, not propagated


class TestCountMin:
    def test_never_underestimates_and_bounded(self, ray_session):
        """CMS point queries ≥ exact counts, and ≤ exact + 2N/width on
        a planted stream (the classic guarantee)."""
        import numpy as np

        from fancyrag_ray.functions.sketches import CountMinSketch, _hash_strings

        rng = np.random.default_rng(7)
        keys = [f"k{i}" for i in range(500)]
        freq = {k: int(rng.integers(1, 50)) for k in keys}
        s = CountMinSketch(width=2048, depth=4)
        s.add_hashes(_hash_strings(keys), np.array([freq[k] for k in keys], np.int64))
        got = s.query_hashes(_hash_strings(keys))
        exact = np.array([freq[k] for k in keys], np.int64)
        n_total = exact.sum()
        assert (got >= exact).all()
        assert (got <= exact + 2 * n_total // 2048 + 1).all()

    def test_merge_equals_single_pass(self, ray_session):
        import numpy as np

        from fancyrag_ray.functions.sketches import CountMinSketch, _hash_strings

        a, b, whole = (CountMinSketch(512, 4) for _ in range(3))
        k1, k2 = ["x", "y", "z"], ["y", "z", "w"]
        a.add_hashes(_hash_strings(k1))
        b.add_hashes(_hash_strings(k2))
        whole.add_hashes(_hash_strings(k1 + k2))
        assert (a.merge(b).table == whole.table).all()

    def test_approx_term_counts_vs_exact(self, ray_session):
        """Distributed sketch over the sf docs: every queried term's
        approximate count ≥ its exact corpus count and within the CMS
        bound of it."""
        import re

        import pyarrow.parquet as pq
        import ray.data as rd

        from fancyrag_ray.functions.sketches import approx_term_counts

        sf = "/root/testdata/sf0.001"
        ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
        out = approx_term_counts(ds).to_pandas().set_index("term")["approx_count"]
        texts = pq.read_table(f"{sf}/documents.parquet", columns=["text"]).column("text").to_pylist()
        pat = re.compile(r"[a-z0-9]+")
        exact: dict = {}
        n_total = 0
        for t in texts:
            for m in pat.findall((t or "").lower()):
                exact[m] = exact.get(m, 0) + 1
                n_total += 1
        for term in out.index:
            e = exact.get(term, 0)
            assert out[term] >= e
            assert out[term] <= e + 2 * n_total // (1 << 14) + 1


class TestKeyedHll:
    def test_per_hour_error_bound(self, ray_session):
        """Keyed HLL per tumbling hour vs exact distinct users: every
        window within 5% relative error (p=10 linear counting makes the
        small windows near-exact)."""
        import duckdb

        from fancyrag_ray.functions.sketches import approx_hourly_distinct_users

        sf = "/root/testdata/sf0.001"
        got = approx_hourly_distinct_users(sf).to_pandas().set_index("hour")["approx_users"]
        con = duckdb.connect()
        exact = con.execute(
            f"SELECT date_trunc('hour', ts) AS hour, COUNT(DISTINCT user_id) AS n "
            f"FROM read_parquet('{sf}/events.parquet') GROUP BY 1"
        ).fetchdf().set_index("hour")["n"]
        assert set(got.index) == set(exact.index)
        rel = ((got.sort_index() - exact.sort_index()).abs() / exact.sort_index()).max()
        assert rel <= 0.05, f"max per-window relative error {rel:.3f}"

    def test_merge_across_blocks_equals_single_sketch(self, ray_session):
        """A key whose rows are split across many blocks reduces to the
        same registers as one sketch over all its rows (planted)."""
        import pyarrow as pa
        import ray.data as rd

        from fancyrag_ray.functions.sketches import HllSketch, _hash_column, keyed_hll_distinct

        users = list(range(500))
        t = pa.table({
            "k": pa.array(["a"] * 500 + ["b"] * 100, pa.string()),
            "v": pa.array(users + users[:100], pa.int64()),
        })
        ds = rd.from_arrow(t).repartition(8)  # scatter the key across blocks
        out = keyed_hll_distinct(ds, "k", "v").to_pandas().set_index("k")["approx_distinct"]
        ref = {}
        for key, vals in (("a", users), ("b", users[:100])):
            s = HllSketch(10)
            s.add_hashes(_hash_column(pa.array(vals, pa.int64())))
            ref[key] = int(round(s.estimate()))
        assert out.to_dict() == ref
