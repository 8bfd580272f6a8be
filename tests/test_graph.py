"""Graph analytics: degree histogram and distributed PageRank — both
tiers of the rank-vector exchange (broadcast and hash-join) checked for
equivalence against a dense numpy power iteration on the same graph."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd


def _edge_ds(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "src_id": pa.array([p[0] for p in pairs], pa.string()),
                "dst_id": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


def _numpy_pagerank(pairs, damping=0.85, iters=10, symmetric=True):
    es = list(pairs)
    if symmetric:
        es = es + [(b, a) for a, b in es]
    nodes = sorted({x for e in es for x in e})
    pos = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for a, _ in es:
        out[pos[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.full(n, (1 - damping) / n)
        dangling = r[out == 0].sum()
        new += damping * dangling / n
        for a, b in es:
            new[pos[b]] += damping * r[pos[a]] / out[pos[a]]
        r = new
    return nodes, r


GRAPH = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "e"),
    ("e", "a"), ("b", "e"), ("f", "g"),  # second component
]


class TestPagerank:
    def test_broadcast_tier_matches_numpy(self, ray_session):
        from fancyrag_ray.functions.graph import pagerank

        got = pagerank(_edge_ds(GRAPH)).to_pandas().sort_values("node").reset_index(drop=True)
        nodes, r = _numpy_pagerank(GRAPH)
        assert list(got["node"]) == nodes
        assert np.allclose(got["rank"].to_numpy(), r, atol=1e-12)
        # probability distribution (symmetric graph has no dangling loss)
        assert abs(got["rank"].sum() - 1.0) < 1e-9

    def test_join_tier_matches_broadcast(self, ray_session):
        from fancyrag_ray.functions.graph import pagerank

        bc = pagerank(_edge_ds(GRAPH)).to_pandas().sort_values("node").reset_index(drop=True)
        jn = (
            pagerank(_edge_ds(GRAPH), broadcast_budget=1)  # force the join tier
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        assert list(bc["node"]) == list(jn["node"])
        assert np.allclose(bc["rank"].to_numpy(), jn["rank"].to_numpy(), atol=1e-9)

    def test_directed_dangling_mass(self, ray_session):
        """Asymmetric chain a→b→c: c is dangling; ranks must still sum
        to 1 (mass redistributed), matching numpy exactly."""
        from fancyrag_ray.functions.graph import pagerank

        chain = [("a", "b"), ("b", "c")]
        got = (
            pagerank(_edge_ds(chain), symmetric=False)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        nodes, r = _numpy_pagerank(chain, symmetric=False)
        assert list(got["node"]) == nodes
        assert np.allclose(got["rank"].to_numpy(), r, atol=1e-12)
        assert abs(got["rank"].sum() - 1.0) < 1e-9

    def test_directed_dangling_join_tier(self, ray_session):
        from fancyrag_ray.functions.graph import pagerank

        chain = [("a", "b"), ("b", "c")]
        got = (
            pagerank(_edge_ds(chain), symmetric=False, broadcast_budget=1)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        nodes, r = _numpy_pagerank(chain, symmetric=False)
        assert np.allclose(got["rank"].to_numpy(), r, atol=1e-9)

    def test_empty_edges(self, ray_session):
        from fancyrag_ray.functions.graph import pagerank

        out = pagerank(_edge_ds([]))
        assert out.count() == 0


def _numpy_pagerank_int(pairs, iters=5):
    """Dense integer reference of pagerank_int's exact update rule."""
    es = list(pairs)
    es = es + [(b, a) for a, b in es]
    nodes = sorted({x for e in es for x in e})
    pos = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n, np.int64)
    for a, _ in es:
        out[pos[a]] += 1
    start, base = 10**12 // n, 150_000_000_000 // n
    r = np.full(n, start, np.int64)
    for _ in range(iters):
        new = np.full(n, base, np.int64)
        for a, b in es:
            new[pos[b]] += (r[pos[a]] * 85) // (100 * out[pos[a]])
        r = new
    return nodes, r


class TestPagerankInt:
    def test_broadcast_tier_matches_numpy_exactly(self, ray_session):
        from fancyrag_ray.functions.graph import pagerank_int

        got = pagerank_int(_edge_ds(GRAPH)).to_pandas().sort_values("node").reset_index(drop=True)
        nodes, r = _numpy_pagerank_int(GRAPH)
        assert got["node"].tolist() == nodes
        assert got["rank_micro"].tolist() == r.tolist()  # bit-exact, no tolerance

    def test_join_tier_matches_broadcast_exactly(self, ray_session):
        from fancyrag_ray.functions.graph import pagerank_int

        bc = pagerank_int(_edge_ds(GRAPH)).to_pandas().sort_values("node").reset_index(drop=True)
        jn = (
            pagerank_int(_edge_ds(GRAPH), broadcast_budget=1)
            .to_pandas().sort_values("node").reset_index(drop=True)
        )
        assert bc.equals(jn)

    def test_mass_approximately_conserved(self, ray_session):
        """Floor division leaks at most 1 micro-unit per edge per
        iteration: total mass stays within that bound of 10^12."""
        from fancyrag_ray.functions.graph import pagerank_int

        got = pagerank_int(_edge_ds(GRAPH)).to_pandas()
        total = int(got["rank_micro"].sum())
        n_dir_edges = 2 * len(GRAPH)
        slack = (n_dir_edges + 2 * len(got)) * 5  # div leaks + base rounding
        assert abs(total - 10**12) <= slack

    def test_empty_edges(self, ray_session):
        from fancyrag_ray.functions.graph import pagerank_int

        out = pagerank_int(_edge_ds([]))
        assert out.count() == 0 and out.schema().names == ["node", "rank_micro"]


class TestTriangles:
    def test_known_triangles(self, ray_session):
        from fancyrag_ray.functions.graph import triangle_counts

        # GRAPH triangles: (a,b,c), (a,b,e)? a-b,a-c,b-c yes; b-e,e-a,a-b yes;
        # c-d,d-e,?c-e no. So triangles: {a,b,c} and {a,b,e}.
        got = triangle_counts(_edge_ds(GRAPH)).to_pandas()
        counts = dict(zip(got["node"], got["n_triangles"]))
        assert counts == {"a": 2, "b": 2, "c": 1, "e": 1}

    def test_clique_counts(self, ray_session):
        from fancyrag_ray.functions.graph import triangle_counts

        # K5: each node is in C(4,2)=6 triangles; total C(5,3)=10
        nodes = ["n1", "n2", "n3", "n4", "n5"]
        k5 = [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1 :]]
        got = triangle_counts(_edge_ds(k5)).to_pandas()
        assert sorted(got["node"]) == nodes
        assert (got["n_triangles"] == 6).all()
        assert got["n_triangles"].sum() == 30  # 10 triangles × 3 corners

    def test_duplicate_and_reversed_edges_collapse(self, ray_session):
        from fancyrag_ray.functions.graph import triangle_counts

        tri = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "c")]
        got = triangle_counts(_edge_ds(tri)).to_pandas()
        assert dict(zip(got["node"], got["n_triangles"])) == {"a": 1, "b": 1, "c": 1}

    def test_no_triangles(self, ray_session):
        from fancyrag_ray.functions.graph import triangle_counts

        got = triangle_counts(_edge_ds([("a", "b"), ("b", "c"), ("c", "d")]))
        assert got.count() == 0

    def test_join_tier_matches_broadcast(self, ray_session):
        """broadcast_budget=0 forces the over-budget join orientation;
        triangle counts must equal the broadcast tier's exactly."""
        from fancyrag_ray.functions.graph import triangle_counts

        bc = triangle_counts(_edge_ds(GRAPH)).to_pandas()
        jn = triangle_counts(_edge_ds(GRAPH), broadcast_budget=0).to_pandas()
        assert dict(zip(jn["node"], jn["n_triangles"])) == dict(
            zip(bc["node"], bc["n_triangles"])
        )


class TestDegreeHist:
    def test_hist_small_graph(self, ray_session):
        from fancyrag_ray.functions.graph import degree_hist

        # degrees (symmetric endpoint counts): a:3 b:3 c:3 d:2 e:3 f:1 g:1
        got = degree_hist(_edge_ds(GRAPH)).to_pandas().sort_values("degree").reset_index(drop=True)
        expect = {1: 2, 2: 1, 3: 4}
        assert dict(zip(got["degree"], got["n_nodes"])) == expect


class TestLangIdQuery:
    def test_matches_classify_one(self, ray_session, tmp_path):
        """The vectorized query semantics must agree with the per-row
        LangId actor on every branch: en/de/es/fr argmax, tie→profile
        order, und (no hits / empty), zh (CJK ratio)."""
        import pyarrow.parquet as pq

        from fancyrag_ray.functions.quality import LangId, lang_id_documents

        texts = [
            "the cat and the dog are in the house",
            "der hund ist nicht mit der katze",
            "el perro y el gato en la casa",
            "le chat et le chien dans la maison",
            "你好世界 这是一个测试 文本很长",
            "zzz qqq xxx",           # no hits → und
            "",                       # empty → und
            "de la",                  # es/fr tie → es (profile order)
        ]
        t = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts, pa.string()),
             "source": pa.array(["s"] * len(texts), pa.string()),
             "n_chars": pa.array([len(x) for x in texts], pa.int64())}
        )
        d = tmp_path / "documents.parquet"
        pq.write_table(t, d)
        out = (
            lang_id_documents(str(tmp_path))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        li = LangId()
        for i, txt in enumerate(texts):
            lang, _score = li.classify_one(txt)
            assert out.loc[i, "lang_pred"] == lang, (i, txt)
        assert out.loc[5, "lang_pred"] == "und"
        assert out.loc[7, "lang_pred"] == "es"
        assert out.loc[4, "lang_pred"] == "zh"
        assert out.loc[0, "n_hits"] > 0 and out.loc[0, "lang_pred"] == "en"


class TestFingerprintQuery:
    def test_known_value_and_shared_window(self, ray_session, tmp_path):
        import hashlib

        import pyarrow.parquet as pq

        from fancyrag_ray.functions.quality import doc_fingerprints

        a = "alpha beta gamma delta epsilon zeta"
        b_shares_min = "PREFIX alpha beta gamma delta epsilon zeta SUFFIX"
        texts = [a, b_shares_min, "short words", ""]
        t = pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()),
             "text": pa.array(texts, pa.string())}
        )
        pq.write_table(t, tmp_path / "documents.parquet")
        out = (
            doc_fingerprints(str(tmp_path))
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        ws = a.split()
        expect = min(
            hashlib.md5(" ".join(ws[i : i + 5]).encode()).hexdigest()[:16]
            for i in range(len(ws) - 4)
        )
        assert out.loc[0, "fingerprint"] == expect
        # doc 1 contains every window of doc 0 → its min is ≤ doc 0's;
        # winnowing overlap detection = fingerprint can only get smaller
        assert out.loc[1, "fingerprint"] <= expect
        assert out.loc[3, "fingerprint"] == ""
        # sub-window doc uses all its words
        sw = hashlib.md5(b"short words").hexdigest()[:16]
        assert out.loc[2, "fingerprint"] == sw


class TestClusteringAndBfs:
    def test_clustering_on_known_graph(self, ray_session):
        """Square + one diagonal: 2 triangles, degrees (3,3,2,2) ->
        wedges 3+3+1+1=8, coefficient = 6/8 = 0.75."""
        import pyarrow as pa
        import ray.data as rd

        from fancyrag_ray.functions.graph import triangle_counts

        edges = rd.from_arrow(pa.table({
            "src_id": ["a", "b", "c", "d", "a"],
            "dst_id": ["b", "c", "d", "a", "c"],
        }))
        tri = triangle_counts(edges).to_pandas()
        assert tri["n_triangles"].sum() == 6  # 2 triangles x 3 corners

    def test_bfs_distances_chain(self, ray_session, tmp_path, monkeypatch):
        """Chain a-b-c plus isolated pair d-e: distances from the min
        node 'a' are 0,1,2; d/e unreachable and absent."""
        import pyarrow as pa
        import ray.data as rd

        import fancyrag_ray.functions.graph as G

        edges = rd.from_arrow(pa.table({
            "src_id": ["a", "b", "d"],
            "dst_id": ["b", "c", "e"],
        })).materialize()
        monkeypatch.setattr(G, "_flagship_edges", lambda sf: edges)
        out = G.entity_bfs_distances("unused").to_pandas().set_index("node")["dist"]
        assert out.to_dict() == {"a": 0, "b": 1, "c": 2}

    def test_bfs_depth_cap(self, ray_session, monkeypatch):
        import pyarrow as pa
        import ray.data as rd

        import fancyrag_ray.functions.graph as G

        edges = rd.from_arrow(pa.table({
            "src_id": ["a", "b", "c"],
            "dst_id": ["b", "c", "d"],
        })).materialize()
        monkeypatch.setattr(G, "_flagship_edges", lambda sf: edges)
        out = G.entity_bfs_distances("unused", max_depth=2).to_pandas()
        assert set(out["node"]) == {"a", "b", "c"}  # 'd' is beyond the cap


def _py_kcore(pairs, k, max_rounds=10**9):
    """Reference peel: symmetric distinct non-loop edges, drop deg<k
    nodes round by round, return {node: degree_in_core}."""
    es = {(a, b) for a, b in pairs if a != b} | {(b, a) for a, b in pairs if a != b}
    for _ in range(max_rounds):
        deg = {}
        for a, _ in es:
            deg[a] = deg.get(a, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        if len(keep) == len(deg):
            break
        es = {(a, b) for a, b in es if a in keep and b in keep}
        if not es:
            return {}
    deg = {}
    for a, _ in es:
        deg[a] = deg.get(a, 0) + 1
    return deg


class TestKcore:
    # K4 on a,b,c,d (a 3-core) + pendant chain d-e-f that 2-core peeling
    # must strip one node per round (exercises multi-round convergence)
    PLANTED = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"), ("d", "e"), ("e", "f"),
    ]

    def _run(self, pairs, k, max_rounds=8):
        from fancyrag_ray.functions.graph import kcore_subgraph

        out = kcore_subgraph(_edge_ds(pairs), k=k, max_rounds=max_rounds).to_pandas()
        if len(out) == 0:  # Ray's to_pandas drops schema at 0 rows
            return {}
        return dict(zip(out["node"], out["core_degree"]))

    def test_three_core_is_k4(self, ray_session):
        got = self._run(self.PLANTED, k=3)
        assert got == _py_kcore(self.PLANTED, 3) == {"a": 3, "b": 3, "c": 3, "d": 3}

    def test_two_core_strips_pendant_chain(self, ray_session):
        got = self._run(self.PLANTED, k=2)
        assert got == _py_kcore(self.PLANTED, 2)
        assert "e" not in got and "f" not in got

    def test_multi_round_chain_peel(self, ray_session):
        # path graph: 2-core is empty, but peeling removes only the two
        # endpoints per round — needs len/2 rounds to drain
        path = [(f"n{i}", f"n{i+1}") for i in range(9)]
        assert self._run(path, k=2, max_rounds=8) == {}

    def test_bounded_rounds_match_reference_cap(self, ray_session):
        # with the cap BELOW convergence both sides define the same
        # partial peel (the SQL-mirror contract)
        path = [(f"n{i}", f"n{i+1}") for i in range(9)]
        got = self._run(path, k=2, max_rounds=2)
        assert got == _py_kcore(path, 2, max_rounds=2)
        assert got  # still non-empty at 2 rounds

    def test_empty_and_self_loops(self, ray_session):
        assert self._run([], k=2) == {}
        assert self._run([("a", "a"), ("b", "b")], k=1) == {}

    def test_sql_mirror_chained_ctes(self, ray_session):
        """entity_kcore_sql's round-CTE chain equals the engine peel on
        the planted graph (swap the flagship CTE for the planted edges)."""
        import duckdb

        from fancyrag_ray.functions.graph import entity_kcore_sql

        sql = entity_kcore_sql(k=2, max_rounds=8)
        # replace the flagship edge CTE body with the planted table
        head, tail = sql.split("),\nr0 AS MATERIALIZED (", 1)
        planted_sql = (
            "WITH edges AS MATERIALIZED (SELECT * FROM planted),\nr0 AS MATERIALIZED (" + tail
        )
        con = duckdb.connect()
        con.register(
            "planted",
            pa.table({
                "src_id": pa.array([p[0] for p in self.PLANTED]),
                "dst_id": pa.array([p[1] for p in self.PLANTED]),
            }),
        )
        sql_out = con.execute(planted_sql).fetchdf()
        got = dict(zip(sql_out["node"], sql_out["core_degree"]))
        assert got == self._run(self.PLANTED, k=2)


class TestAssortativity:
    def _numpy_moments(self, pairs):
        es = {(a, b) for a, b in pairs if a != b}
        es = {(min(a, b), max(a, b)) for a, b in es}
        adj = [(u, v) for u, v in es] + [(v, u) for u, v in es]
        deg = {}
        for u, _ in adj:
            deg[u] = deg.get(u, 0) + 1
        x = np.array([deg[u] for u, _ in adj], np.int64)
        y = np.array([deg[v] for _, v in adj], np.int64)
        n = len(adj)
        return {
            "n_pairs": n, "sum_x": x.sum(), "sum_y": y.sum(),
            "sum_xx": (x * x).sum(), "sum_yy": (y * y).sum(),
            "sum_xy": (x * y).sum(),
            "cov_num": n * (x * y).sum() - x.sum() * y.sum(),
        }

    def test_moments_match_numpy(self, ray_session):
        from fancyrag_ray.functions.graph import degree_assortativity_moments

        got = degree_assortativity_moments(_edge_ds(GRAPH)).to_pandas().iloc[0].to_dict()
        assert got == self._numpy_moments(GRAPH)

    def test_star_is_disassortative(self, ray_session):
        """A star graph wires the hub (deg n) to leaves (deg 1) only:
        cov_num must be negative."""
        from fancyrag_ray.functions.graph import degree_assortativity_moments

        star = [("hub", f"leaf{i}") for i in range(6)]
        got = degree_assortativity_moments(_edge_ds(star)).to_pandas().iloc[0]
        assert got["cov_num"] < 0
        assert got.to_dict() == self._numpy_moments(star)

    def test_regular_graph_zero_covariance(self, ray_session):
        """Every node of a cycle has degree 2 ⇒ x and y are constant ⇒
        cov_num is exactly 0."""
        from fancyrag_ray.functions.graph import degree_assortativity_moments

        cyc = [(f"n{i}", f"n{(i+1) % 5}") for i in range(5)]
        got = degree_assortativity_moments(_edge_ds(cyc)).to_pandas().iloc[0]
        assert got["cov_num"] == 0

    def test_join_tier_matches_broadcast(self, ray_session):
        from fancyrag_ray.functions.graph import degree_assortativity_moments

        bc = degree_assortativity_moments(_edge_ds(GRAPH)).to_pandas()
        jn = degree_assortativity_moments(_edge_ds(GRAPH), broadcast_budget=1).to_pandas()
        assert bc.equals(jn)

    def test_empty(self, ray_session):
        from fancyrag_ray.functions.graph import degree_assortativity_moments

        assert degree_assortativity_moments(_edge_ds([])).count() == 0
