"""Relational operators over the TPC-H-ish testdata tables, Ray-Data-first.

Each function takes ``sf_dir`` and returns a Dataset whose rows/columns
match its DuckDB oracle in ``__ray_entry__.oracle_sql`` exactly.

Scale/determinism notes:
  * reads prune columns at the source (`columns=[...]`);
  * aggregations pre-combine per block (pyarrow ``group_by`` inside
    ``map_batches``) before the global groupby — one row per key per
    block crosses the shuffle, so hot keys cost O(blocks), not O(rows);
  * big⋈big joins use hash-partitioned ``Dataset.join``; small sides
    (nation/region/customer at test scale) broadcast as dicts inside
    ``map_batches`` — no shuffle;
  * float sums are rounded at the *grid precision* of the underlying
    discrete values (prices 2dp, discount products 4dp), so distributed
    accumulation order can never flip a rounding boundary and results
    are bit-stable vs the SQL oracle;
  * derived ratios (avg) are computed from the already-rounded sums so
    both sides perform the identical IEEE division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Count, Max, Sum

from ..util import adaptive_partitions, hash_partitioned_combine


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-shaped grouped aggregate over lineitem."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
        t = t.append_column("disc_price", disc)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ("disc_price", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "count_order"]
        )

    out = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("count_order", alias_name="count_order"),
    )

    def finish(t: pa.Table) -> pa.Table:
        sq = pc.round(t.column("sum_qty"), 2)
        sb = pc.round(t.column("sum_base_price"), 2)
        sd = pc.round(t.column("sum_disc_price"), 4)
        cnt = t.column("count_order").cast(pa.float64())
        avg = pc.round(pc.divide(sq, cnt), 6)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "sum_qty": sq,
                "sum_base_price": sb,
                "sum_disc_price": sd,
                "avg_qty": avg,
                "count_order": t.column("count_order"),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ROUND(ROUND(SUM(l_quantity), 2) / COUNT(*), 6)   AS avg_qty,
       COUNT(*)                                          AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


BROADCAST_ORDERS_LIMIT = 20_000_000  # 8 B key + 4 B code ≈ 240 MB broadcast


def revenue_by_nation(sf_dir: str, broadcast_join: bool | None = None) -> rd.Dataset:
    """lineitem ⋈ orders ⋈ customer ⋈ nation: revenue per nation name.

    ``broadcast_join=None`` (default) picks the path by the orders row
    count from parquet metadata: below ``BROADCAST_ORDERS_LIMIT`` the
    dimension chain orders→customer→nation collapses to a sorted
    (o_orderkey → nation_code) array pair shipped once (``ray.put``) and
    probed with ``np.searchsorted`` per batch — no shuffle on the fact
    table; the only exchange is 25 partial rows per block. Above the
    limit (orders is itself a fact table at 100-TB scale) it is the
    hash-partitioned ``Dataset.join`` — the broadcast path would OOM the
    driver. The keymap build is fully vectorized (sorted-key searchsorted
    + ``np.take``), and probe misses are dropped (inner-join semantics)
    rather than silently mis-attributed."""
    import ray

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    cust_keys = cust.column("c_custkey").to_numpy()
    cust_nation = cust.column("c_nationkey").to_numpy()
    cust_sort = np.argsort(cust_keys)
    cust_keys, cust_nation = cust_keys[cust_sort], cust_nation[cust_sort]
    nation_codes = nation.column("n_nationkey").to_numpy()
    nation_names = nation.column("n_name").to_pylist()
    code_to_idx = np.full(int(nation_codes.max()) + 1, -1, dtype=np.int32)
    code_to_idx[nation_codes] = np.arange(len(nation_names), dtype=np.int32)

    def nation_idx_for_custkeys(ck: np.ndarray) -> np.ndarray:
        pos = np.clip(np.searchsorted(cust_keys, ck), 0, len(cust_keys) - 1)
        idx = code_to_idx[cust_nation[pos]]
        return np.where(cust_keys[pos] == ck, idx, -1)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    if broadcast_join is None:
        n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
        broadcast_join = n_orders <= BROADCAST_ORDERS_LIMIT

    if broadcast_join:
        orders_t = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
        okeys = orders_t.column("o_orderkey").to_numpy()
        onation = nation_idx_for_custkeys(orders_t.column("o_custkey").to_numpy())
        order_sort = np.argsort(okeys)
        keymap_ref = ray.put((okeys[order_sort], onation[order_sort]))

        def partial(t: pa.Table) -> pa.Table:
            keys_sorted, nation_idx = ray.get(keymap_ref)
            rev = pc.multiply(
                t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount"))
            ).to_numpy()
            lk = t.column("l_orderkey").to_numpy()
            pos = np.clip(np.searchsorted(keys_sorted, lk), 0, len(keys_sorted) - 1)
            codes = nation_idx[pos]
            # inner-join semantics: drop lineitems whose orderkey is
            # absent (or whose chain broke at customer → code -1)
            ok = (keys_sorted[pos] == lk) & (codes >= 0)
            sums = np.bincount(codes[ok], weights=rev[ok], minlength=len(nation_names))
            nz = np.flatnonzero(sums)
            return pa.table(
                {
                    "n_name": pa.array([nation_names[i] for i in nz], pa.string()),
                    "revenue": pa.array(sums[nz], pa.float64()),
                }
            )

        out = li.map_batches(partial, batch_format="pyarrow", batch_size=None).groupby("n_name").aggregate(
            Sum("revenue", alias_name="revenue")
        )
    else:
        # Scale path: lineitem ⋈ orders and (pre-aggregated) ⋈ customer
        # are hash joins; only nation (25 rows) is broadcast. Revenue is
        # partially summed per custkey between the joins so the second
        # join's left side is |distinct customers with orders|, not
        # |lineitem|.
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        joined = li.join(
            orders, join_type="inner", num_partitions=adaptive_partitions(16),
            on=("l_orderkey",), right_on=("o_orderkey",),
        )

        def partial_by_cust(t: pa.Table) -> pa.Table:
            rev = pc.multiply(t.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), t.column("l_discount")))
            pt = pa.table({"o_custkey": t.column("o_custkey"), "revenue": rev})
            g = pt.group_by(["o_custkey"]).aggregate([("revenue", "sum")])
            return g.rename_columns(["o_custkey", "revenue"])

        by_cust = (
            joined.map_batches(partial_by_cust, batch_format="pyarrow", batch_size=None)
            .groupby("o_custkey")
            .aggregate(Sum("revenue", alias_name="revenue"))
        )
        cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        with_nation = by_cust.join(
            cust_ds, join_type="inner", num_partitions=adaptive_partitions(16),
            on=("o_custkey",), right_on=("c_custkey",),
        )
        names_arr = np.array(nation_names, dtype=object)

        def to_name(t: pa.Table) -> pa.Table:
            idx = code_to_idx[t.column("c_nationkey").to_numpy(zero_copy_only=False)]
            ok = idx >= 0
            pt = pa.table(
                {
                    "n_name": pa.array(names_arr[idx[ok]], pa.string()),
                    "revenue": pa.array(t.column("revenue").to_numpy()[ok]),
                }
            )
            g = pt.group_by(["n_name"]).aggregate([("revenue", "sum")])
            return g.rename_columns(["n_name", "revenue"])

        out = with_nation.map_batches(to_name, batch_format="pyarrow", batch_size=None).groupby("n_name").aggregate(
            Sum("revenue", alias_name="revenue")
        )
    return out.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("revenue"), "revenue", pc.round(t.column("revenue"), 4)),
        batch_format="pyarrow",
    )


REVENUE_BY_NATION_SQL = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def topk_orders(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Top-k orders by total price (distributed sort + limit)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k)


TOPK_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def customers_without_orders(sf_dir: str, min_total: float = 300000.0) -> rd.Dataset:
    """Anti-join (QA orphan-count parity, SURVEY §2.4): customers with no
    order above ``min_total`` (filtered right side pushed before the
    shuffle), through the shared tier ladder (broadcast value_set →
    Bloom prefilter → hash left_anti)."""
    from ..util import tiered_anti_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), pa.scalar(min_total))).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    return tiered_anti_join(cust, "c_custkey", orders, "o_custkey")


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
"""


def events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling-window aggregate (streaming-shaped op → batch groupby):
    per (user, hour) event count and value sum."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t.column("ts"), unit="hour")
        pt = pa.table({"user_id": t.column("user_id"), "hour": hour, "value": t.column("value")})
        g = pt.group_by(["user_id", "hour"]).aggregate([([], "count_all"), ("value", "sum")])
        return g.rename_columns(["user_id", "hour", "n_events", "sum_value"])

    # (user, hour) groups ≈ rows on bursty event data — the
    # groups-as-numerous-as-rows case where the hash-partitioned combine
    # beats the sort-based groupby (see util.hash_partitioned_combine)
    from ..util import hash_partitioned_combine as _hpc

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id", "hour"]).aggregate([("n_events", "sum"), ("value_sum", "sum")])
        g = g.rename_columns(["user_id", "hour", "n_events", "sum_value"])
        return g.set_column(
            g.schema.get_field_index("sum_value"), "sum_value", pc.round(g.column("sum_value"), 2)
        )

    n_rows = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows

    def partial2(t: pa.Table) -> pa.Table:
        g = partial(t)
        return g.rename_columns(["user_id", "hour", "n_events", "value_sum"])

    return _hpc(
        ds.map_batches(partial2, batch_format="pyarrow", batch_size=None),
        ["user_id", "hour"],
        combine,
        adaptive_partitions(16, n_rows=n_rows),
    )


EVENTS_HOURLY_SQL = """
SELECT user_id, date_trunc('hour', ts) AS hour,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY user_id, date_trunc('hour', ts)
"""


def events_by_type(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type"]).aggregate([([], "count_all"), ("value", "sum")])
        return g.rename_columns(["event_type", "n_events", "sum_value"])

    out = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).groupby("event_type").aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value")
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("sum_value"), "sum_value", pc.round(t.column("sum_value"), 2)
        ),
        batch_format="pyarrow",
    )


EVENTS_BY_TYPE_SQL = """
SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY event_type
"""


def high_value_open_orders(sf_dir: str) -> rd.Dataset:
    """Vectorized filter + projection (no shuffle)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"])

    def f(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater(t.column("o_totalprice"), pa.scalar(150000.0)),
            pc.equal(t.column("o_orderstatus"), pa.scalar("O")),
        )
        return t.filter(mask).select(["o_orderkey", "o_totalprice", "o_orderpriority"])

    return ds.map_batches(f, batch_format="pyarrow")


HIGH_VALUE_OPEN_ORDERS_SQL = """
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders WHERE o_totalprice > 150000.0 AND o_orderstatus = 'O'
"""


def supplier_balance_by_region(sf_dir: str) -> rd.Dataset:
    """Broadcast dimension-chain join supplier→nation→region."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    n2r = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_regionkey").to_pylist()))
    rname = dict(zip(region.column("r_regionkey").to_pylist(), region.column("r_name").to_pylist()))
    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def partial(t: pa.Table) -> pa.Table:
        keys = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        names = [rname[n2r[int(k)]] for k in keys]
        pt = pa.table({"r_name": pa.array(names, pa.string()), "s_acctbal": t.column("s_acctbal")})
        g = pt.group_by(["r_name"]).aggregate([([], "count_all"), ("s_acctbal", "sum")])
        return g.rename_columns(["r_name", "n_suppliers", "total_acctbal"])

    out = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).groupby("r_name").aggregate(
        Sum("n_suppliers", alias_name="n_suppliers"), Sum("total_acctbal", alias_name="total_acctbal")
    )
    return out.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("total_acctbal"), "total_acctbal", pc.round(t.column("total_acctbal"), 2)
        ),
        batch_format="pyarrow",
    )


SUPPLIER_BALANCE_BY_REGION_SQL = """
SELECT r_name, COUNT(*) AS n_suppliers, ROUND(SUM(s_acctbal), 2) AS total_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def events_sessions(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Gap-based sessionization (streaming-shaped op → batch groupby):
    per user, a new session starts when the inter-event gap exceeds
    ``gap_minutes``. Implemented as ``groupby(user).map_groups`` over
    ts-sorted groups (the guide's pattern for windowed state); ordering
    assumption: per-user event streams fit one group."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        new_s = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        g["session_id"] = new_s.cumsum().astype("int32")
        out = g.groupby("session_id", as_index=False).agg(
            user_id=("user_id", "first"),
            n_events=("ts", "size"),
            t_start=("ts", "min"),
            t_end=("ts", "max"),
            sum_value=("value", "sum"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].round(2)
        return out[["user_id", "session_id", "n_events", "t_start", "t_end", "sum_value"]]

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


EVENTS_SESSIONS_SQL = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS INTEGER) AS session_id, COUNT(*) AS n_events,
       MIN(ts) AS t_start, MAX(ts) AS t_end, ROUND(SUM(value), 2) AS sum_value
FROM sess GROUP BY user_id, session_id
"""


def events_sessions_sharded(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Scale-safe sessionization: identical semantics (and oracle) to
    ``events_sessions``, but no per-user single-group assumption.

    Two phases, both BUCKET-vectorized (one Python call per hash bucket,
    vectorized pandas groupby inside — thousands of per-(user,day)
    Python calls would dominate otherwise):
      1. shuffle on ``hash(user, day) % N`` — a bot-scale hot user's
         stream splits across its days instead of landing on one
         reducer; inside each bucket, sessions per (user, day) computed
         with vectorized shift/cumsum;
      2. shuffle the per-shard SESSION SUMMARY rows (O(sessions), not
         O(events)) on ``hash(user) % N``; adjacent shards' boundary
         sessions merge when the cross-shard gap ≤ ``gap_minutes`` and
         session ids renumber 1..k per user by t_start."""
    import zlib

    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    gap = pd.Timedelta(minutes=gap_minutes)
    n_buckets = adaptive_partitions(64)

    from ..util import mix64 as _mix64  # single shared splitmix64 finalizer

    def add_keys(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t.column("ts"), unit="day")
        users = t.column("user_id")
        if pa.types.is_integer(users.type):
            # hot path: one vectorized mix over (user, day-epoch) ints —
            # the per-row crc32 loop cost O(events) Python calls
            u = _mix64(users.to_numpy(zero_copy_only=False))
            d = _mix64(day.cast(pa.int64()).to_numpy(zero_copy_only=False))
            bucket = pa.array(((u ^ d) % np.uint64(n_buckets)).astype(np.int32))
        else:  # generic fallback for string ids
            bucket = pa.array(
                [zlib.crc32(f"{u}|{d}".encode()) % n_buckets
                 for u, d in zip(users.to_pylist(), day.to_pylist())],
                pa.int32(),
            )
        return t.append_column("day", day).append_column("bucket", bucket)

    def bucket_segments(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day", "ts"], kind="mergesort")
        same = (g["user_id"] == g["user_id"].shift()) & (g["day"] == g["day"].shift())
        new_s = ~(same & (g["ts"].diff() <= gap))
        g = g.assign(_sid=new_s.cumsum())
        out = g.groupby("_sid", as_index=False).agg(
            user_id=("user_id", "first"),
            n_events=("ts", "size"),
            t_start=("ts", "min"),
            t_end=("ts", "max"),
            sum_value=("value", "sum"),
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out[["user_id", "n_events", "t_start", "t_end", "sum_value"]]

    # hash-partition on the bucket key and run the (already multi-group
    # vectorized) segment pass once per BLOCK: every (user, day) lands
    # whole in one block, and the per-block pandas pass sorts by
    # (user, day, ts) itself — Ray's sort-based map_groups paid a global
    # sort plus a Python call per bucket for the same result
    from ..util import hash_partitioned_combine as _hpc

    n_events_total = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows

    def _seg_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "t_start": pa.array([], pa.timestamp("us")),
                    "t_end": pa.array([], pa.timestamp("us")),
                    "sum_value": pa.array([], pa.float64()),
                }
            )
        return pa.Table.from_pandas(bucket_segments(t.to_pandas()), preserve_index=False)

    segments = _hpc(
        ds.map_batches(add_keys, batch_format="pyarrow"),
        ["bucket"],
        _seg_block,
        adaptive_partitions(16, n_rows=n_events_total),
    )

    def add_user_bucket(t: pa.Table) -> pa.Table:
        users = t.column("user_id")
        if pa.types.is_integer(users.type):
            h = _mix64(users.to_numpy(zero_copy_only=False))
            bucket = pa.array((h % np.uint64(n_buckets)).astype(np.int32))
        else:
            bucket = pa.array(
                [zlib.crc32(str(u).encode()) % n_buckets for u in users.to_pylist()], pa.int32()
            )
        return t.append_column("ubucket", bucket)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t_start"], kind="mergesort")
        same_user = g["user_id"] == g["user_id"].shift()
        boundary = ~(same_user & (g["t_start"] - g["t_end"].shift() <= gap))
        g = g.assign(_sid=boundary.cumsum())
        out = g.groupby("_sid", as_index=False).agg(
            user_id=("user_id", "first"),
            n_events=("n_events", "sum"),
            t_start=("t_start", "min"),
            t_end=("t_end", "max"),
            sum_value=("sum_value", "sum"),
        )
        out = out.sort_values(["user_id", "t_start"], kind="mergesort")
        out["session_id"] = (out.groupby("user_id").cumcount() + 1).astype("int32")
        out["sum_value"] = out["sum_value"].round(2)
        return out[["user_id", "session_id", "n_events", "t_start", "t_end", "sum_value"]]

    def _merge_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_id": pa.array([], pa.int32()),
                    "n_events": pa.array([], pa.int64()),
                    "t_start": pa.array([], pa.timestamp("us")),
                    "t_end": pa.array([], pa.timestamp("us")),
                    "sum_value": pa.array([], pa.float64()),
                }
            )
        df = t.to_pandas().drop(columns=["ubucket"])
        return pa.Table.from_pandas(merge_bucket(df), preserve_index=False)

    return _hpc(
        segments.map_batches(add_user_bucket, batch_format="pyarrow"),
        ["ubucket"],
        _merge_block,
        adaptive_partitions(16, n_rows=n_events_total),
    )


def distinct_order_priorities(sf_dir: str) -> rd.Dataset:
    """Distinct values (set-op / D2 parity)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderpriority"]).aggregate([])
        return g

    return ds.map_batches(partial, batch_format="pyarrow", batch_size=None).groupby("o_orderpriority").aggregate(
        Count(alias_name="_n")
    ).select_columns(["o_orderpriority"])


DISTINCT_ORDER_PRIORITIES_SQL = "SELECT DISTINCT o_orderpriority FROM orders"


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    by: str,
    right_on: str | None = None,
    right_by: str | None = None,
    direction: str = "backward",
    how: str = "inner",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Distributed as-of join: for each left row, the nearest right row
    at-or-before (``backward``) / at-or-after (``forward``) its ``on``
    time within the same ``by`` key. An operator Ray Data lacks;
    composition: tag each side, hash-co-partition the UNION by key (one
    shuffle moves both sides, so left and right rows of a key are
    guaranteed into the SAME block), then one vectorized
    ``pandas.merge_asof`` per block.

    Partitioning assumption (documented per the custom-operator
    contract): all rows of one ``by`` key fit one block. Near-dup time
    series with a single hot key need a time-sharded variant (bucket
    boundaries replicated one row across shards) — same pattern as
    ``events_sessions_sharded``.

    Determinism: ties on the ``on`` value within a key resolve to the
    LAST right row in (time, payload-column) sort order; pre-reduce the
    right side to one row per (key, time) for a fully deterministic
    payload (the driver query + oracle both do).

    ``how="inner"`` drops unmatched left rows, which keeps every output
    column's dtype exactly the input dtype (a ``left`` join widens
    matched-side ints to nullable).
    """
    import pandas as pd

    right_on = right_on or on
    right_by = right_by or by
    from ..util import hash_partitioned_combine

    lsch, rsch = left.schema(), right.schema()
    lcols = list(lsch.names)
    # the right's by key is redundant on matched rows (== left's by);
    # its on column rides as payload unless the name collides with a
    # left column (i.e. both sides share the timestamp column name)
    rcols = [c for c in rsch.names if c != right_by and not (c == right_on and c in lcols)]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"payload column collision: {sorted(overlap)}")
    rtypes = dict(zip(rsch.names, rsch.types))
    ltypes = dict(zip(lsch.names, lsch.types))
    if ltypes[by] != rtypes[right_by] or ltypes[on] != rtypes[right_on]:
        raise ValueError("by/on dtypes must match across sides")

    def _std_left(t: pa.Table) -> pa.Table:
        cols = {"__k": t.column(by), "__t": t.column(on), "__side": pa.array([0] * len(t), pa.int8())}
        for c in lcols:
            cols[c] = t.column(c)
        for c in rcols:
            cols[c] = pa.nulls(len(t), rtypes[c])
        return pa.table(cols)

    def _std_right(t: pa.Table) -> pa.Table:
        cols = {"__k": t.column(right_by), "__t": t.column(right_on), "__side": pa.array([1] * len(t), pa.int8())}
        for c in lcols:
            cols[c] = pa.nulls(len(t), ltypes[c])
        for c in rcols:
            cols[c] = t.column(c)
        return pa.table(cols)

    tagged = left.map_batches(_std_left, batch_format="pyarrow").union(
        right.map_batches(_std_right, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [pa.field(c, ltypes[c]) for c in lcols] + [pa.field(c, rtypes[c]) for c in rcols]
    )

    def _merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        l = df[df["__side"] == 0]
        r = df[df["__side"] == 1]
        if len(l) == 0:
            return out_schema.empty_table()
        l = l.sort_values("__t", kind="mergesort")[["__k", "__t", *lcols]]
        r = r.sort_values(["__t", *rcols], kind="mergesort")[["__k", "__t", *rcols]]
        # explicit match marker: filtering on a payload column's notna()
        # would silently drop matched rows whose payload is legitimately
        # null
        r = r.assign(__m=np.int8(1))
        merged = pd.merge_asof(
            l, r, on="__t", by="__k", direction=direction, allow_exact_matches=True
        )
        if how == "inner":
            merged = merged[merged["__m"].notna()]
        arrays = [
            pa.Array.from_pandas(merged[c], type=out_schema.field(c).type) for c in out_schema.names
        ]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return hash_partitioned_combine(tagged, ["__k"], _merge, num_partitions)


def rolling_window_aggregate(
    ds: rd.Dataset,
    on: str,
    by: str,
    value_col: str,
    window_seconds: int,
    out_sum: str = "win_sum",
    out_n: str = "win_n",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Per-row sliding-window aggregate: for each row, the sum/count of
    ``value_col`` over all rows of the same ``by`` key with ``on`` in
    ``[t - window, t]`` (both edges inclusive — SQL ``RANGE BETWEEN
    window PRECEDING AND CURRENT ROW`` semantics, including peers at the
    current timestamp). An operator Ray Data lacks; composition:
    hash-partition by key, then per block (a) pre-sum per (key, time) so
    equal-timestamp peers aggregate identically to SQL's RANGE frame —
    a positional rolling window would exclude LATER peer rows — then
    (b) one vectorized time-windowed ``pandas.rolling`` per block and a
    merge back onto the rows.

    Partitioning assumption: all rows of one ``by`` key fit one block
    (same contract as ``asof_join``; hot keys need time-sharding with a
    ``window``-wide boundary overlap replicated between shards).

    ``value_col`` should be integer (pre-scale currency to cents) for a
    bit-stable match with a SQL oracle: integer window sums are exact in
    both engines, float sliding sums are accumulation-order-dependent.
    """
    import pandas as pd

    from ..util import hash_partitioned_combine

    sch = ds.schema()
    out_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(sch.names, sch.types)]
        + [pa.field(out_sum, pa.int64()), pa.field(out_n, pa.int64())]
    )

    def _roll(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        g = (
            df.groupby([by, on], sort=True)[value_col]
            .agg(["sum", "size"])
            .reset_index()
        )
        # join the rolling result back BY KEY, never positionally:
        # groupby().rolling() concatenates groups in the grouper's
        # internal order, which is not guaranteed to match g's row order
        # (observed divergence with composite keys — timeshard.py)
        r = (
            g.groupby(by, sort=False)
            .rolling(pd.Timedelta(seconds=window_seconds), on=on, closed="both")[["sum", "size"]]
            .sum()
            .reset_index()
        )
        r = r[[by, on, "sum", "size"]].rename(columns={"sum": out_sum, "size": out_n})
        r[out_sum] = r[out_sum].astype("int64")
        r[out_n] = r[out_n].astype("int64")
        merged = df.merge(r, on=[by, on], how="left")
        arrays = [
            pa.Array.from_pandas(merged[c], type=out_schema.field(c).type)
            for c in out_schema.names
        ]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return hash_partitioned_combine(ds, [by], _roll, num_partitions)


def events_rolling_hour(sf_dir: str) -> rd.Dataset:
    """Driver query for ``rolling_window_aggregate``: each event with the
    1-hour trailing sum (integer cents) and count of its user's event
    values — oracle is the equivalent SQL RANGE window frame."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _cents(t: pa.Table) -> pa.Table:
        from ..util import to_cents

        cents = pa.array(to_cents(t.column("value").to_numpy(zero_copy_only=False)))
        return pa.table(
            {
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts": t.column("ts"),
                "value_cents": cents,
            }
        )

    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    # Skew-dispatched (autoshard): the statistic comes from the
    # per-(table, key) probe cache — one probe per events snapshot for
    # the whole suite, not one per query (and never the _cents pipeline
    # tail, which would execute the whole transform just to count keys).
    from .autoshard import max_key_rows_parquet, rolling_window_aggregate_auto

    return rolling_window_aggregate_auto(
        ds.map_batches(_cents, batch_format="pyarrow"),
        on="ts",
        by="user_id",
        value_col="value_cents",
        window_seconds=3600,
        out_sum="win_sum_cents",
        num_partitions=adaptive_partitions(16, n_rows=n_events),
        probe_hottest=max_key_rows_parquet(f"{sf_dir}/events.parquet", "user_id"),
    ).select_columns(["event_id", "user_id", "ts", "win_sum_cents", "win_n"])


EVENTS_ROLLING_HOUR_SQL = """
SELECT event_id, user_id, ts,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS win_sum_cents,
  count(*) OVER w AS win_n
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts
  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
)
"""


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    by: str,
    lower: str,
    upper: str,
    right_by: str | None = None,
    num_partitions: int = 16,
) -> rd.Dataset:
    """Distributed interval-containment join: left rows matched to every
    right interval with ``lower <= on <= upper`` under the same key
    (inner; a left row may match 0..m intervals). An operator Ray Data
    lacks; composition: tag sides → hash-co-partition the UNION by key
    (one shuffle moves both sides) → per-block vectorized matching.

    Per-block algorithm (no per-row Python): intervals sorted by start;
    a matching interval for time t must have ``lower ∈ (t - L, t]``
    where L = the key's longest interval, so two ``searchsorted`` calls
    bound a candidate slice per left row, candidates expand via the
    repeat+cumsum-offsets pattern, and one boolean mask keeps
    ``upper >= t``. Fan-out bound: candidates per row ≤ the number of
    interval STARTS inside any L-wide window — tight for disjoint or
    modestly overlapping intervals (sessions, maintenance windows); a
    single huge interval per key degrades the prune, not correctness.

    Partitioning assumption: one key's rows fit one block (same
    contract as ``asof_join``).
    """
    from ..util import hash_partitioned_combine

    right_by = right_by or by
    lsch, rsch = left.schema(), right.schema()
    lcols = list(lsch.names)
    rcols = [c for c in rsch.names if c != right_by]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"payload column collision: {sorted(overlap)}")
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    if ltypes[by] != rtypes[right_by] or ltypes[on] != rtypes[lower] or ltypes[on] != rtypes[upper]:
        raise ValueError("by/on/bound dtypes must match across sides")

    def _std_left(t: pa.Table) -> pa.Table:
        cols = {"__k": t.column(by), "__side": pa.array([0] * len(t), pa.int8())}
        for c in lcols:
            cols[c] = t.column(c)
        for c in rcols:
            cols[c] = pa.nulls(len(t), rtypes[c])
        return pa.table(cols)

    def _std_right(t: pa.Table) -> pa.Table:
        cols = {"__k": t.column(right_by), "__side": pa.array([1] * len(t), pa.int8())}
        for c in lcols:
            cols[c] = pa.nulls(len(t), ltypes[c])
        for c in rcols:
            cols[c] = t.column(c)
        return pa.table(cols)

    tagged = left.map_batches(_std_left, batch_format="pyarrow").union(
        right.map_batches(_std_right, batch_format="pyarrow")
    )
    out_schema = pa.schema(
        [pa.field(c, ltypes[c]) for c in lcols] + [pa.field(c, rtypes[c]) for c in rcols]
    )

    def _match(t: pa.Table) -> pa.Table:
        return interval_match_block(t, on, lower, upper, lcols, rcols, out_schema)

    return hash_partitioned_combine(tagged, ["__k"], _match, num_partitions)


def interval_match_block(
    t: pa.Table,
    on: str,
    lower: str,
    upper: str,
    lcols: list[str],
    rcols: list[str],
    out_schema: pa.Schema,
    seg_cols: list[str] | None = None,
) -> pa.Table:
    """Per-block interval containment matcher shared by ``range_join``
    and the time-sharded variant: both frames key-sorted, two
    ``searchsorted`` calls bound a candidate slice per left row,
    candidates expand via repeat+cumsum offsets, one boolean mask keeps
    ``upper >= t`` — one Python iteration per DISTINCT key in the block,
    everything else vectorized.

    ``seg_cols`` is the matching-scope key (default ``["__k"]``). The
    time-sharded caller MUST pass ``["__k", "__b"]``: a block may hold
    several buckets of one key, and an interval replicated into each of
    them would otherwise match the same left row once per copy."""
    import pandas as pd

    seg_cols = seg_cols or ["__k"]
    df = t.to_pandas()
    # one integer segment code per distinct seg_cols combination, shared
    # by both sides (computed before the split)
    df["__seg"] = df.groupby(seg_cols, sort=True).ngroup()
    l = df[df["__side"] == 0].sort_values(["__seg", on], kind="mergesort")
    r = df[df["__side"] == 1].sort_values(["__seg", lower], kind="mergesort")
    if len(l) == 0 or len(r) == 0:
        return out_schema.empty_table()
    lt = l[on].to_numpy()
    lk = l["__seg"].to_numpy()
    rlo = r[lower].to_numpy()
    rhi = r[upper].to_numpy()
    rk = r["__seg"].to_numpy()
    left_take: list[np.ndarray] = []
    right_take: list[np.ndarray] = []
    lkeys, lstarts = np.unique(lk, return_index=True)
    rkeys, rstarts = np.unique(rk, return_index=True)
    rmap = {k: i for i, k in enumerate(rkeys)}
    lbounds = np.append(lstarts, len(lk))
    rbounds = np.append(rstarts, len(rk))
    for i, key in enumerate(lkeys):
        j = rmap.get(key)
        if j is None:
            continue
        ls, le = lbounds[i], lbounds[i + 1]
        rs, re = rbounds[j], rbounds[j + 1]
        lo_seg, hi_seg = rlo[rs:re], rhi[rs:re]
        t_seg = lt[ls:le]
        L = (hi_seg - lo_seg).max()
        c0 = np.searchsorted(lo_seg, t_seg - L, side="left")
        c1 = np.searchsorted(lo_seg, t_seg, side="right")
        counts = c1 - c0
        total = int(counts.sum())
        if total == 0:
            continue
        # repeat+offsets expansion: candidate interval index for each
        # (left row, local candidate slot) pair
        lrep = np.repeat(np.arange(ls, le), counts)
        offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        cand = np.repeat(c0, counts) + offs
        keep = hi_seg[cand] >= lt[lrep]
        left_take.append(lrep[keep])
        right_take.append(rs + cand[keep])
    if not left_take:
        return out_schema.empty_table()
    li = np.concatenate(left_take)
    ri = np.concatenate(right_take)
    out = {c: l[c].to_numpy()[li] for c in lcols}
    out.update({c: r[c].to_numpy()[ri] for c in rcols})
    arrays = [
        pa.Array.from_pandas(pd.Series(out[c]), type=out_schema.field(c).type)
        for c in out_schema.names
    ]
    return pa.Table.from_arrays(arrays, schema=out_schema)


def events_session_attribution(sf_dir: str) -> rd.Dataset:
    """Driver query for ``range_join``: each event attributed to the
    session interval that contains it (sessions from the sharded
    sessionizer, whose per-session rows are oracle-equal to the SQL
    CTE). Every event lands in exactly one session, so row count equals
    the events table — a self-validating property."""
    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    sessions = events_sessions_sharded(sf_dir).select_columns(
        ["user_id", "session_id", "n_events", "t_start", "t_end"]
    )

    def _recast(t: pa.Table) -> pa.Table:
        cols = {
            "s_user": t.column("user_id").cast(pa.int64()),
            "session_id": t.column("session_id"),
            "n_events": t.column("n_events"),
            "t_start": t.column("t_start").cast(pa.timestamp("us")),
            "t_end": t.column("t_end").cast(pa.timestamp("us")),
        }
        return pa.table(cols)

    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    mat = sessions.map_batches(_recast, batch_format="pyarrow").materialize()
    # Skew-dispatched (autoshard), with a FREE probe: the session
    # summaries already aggregate the fact side (Σ n_events per user =
    # that user's event rows), so the exact combined per-key count the
    # dispatcher needs — events + session rows of the densest user —
    # falls out of one tiny aggregation over the O(sessions)
    # materialized table. No events re-read, no union-probe execution.
    from ray.data.aggregate import Max as _Max, Sum as _Sum

    def _key_partial(t: pa.Table) -> pa.Table:
        g = t.select(["s_user", "n_events"]).group_by(["s_user"]).aggregate(
            [("n_events", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["s_user", "ev", "ns"])

    per_user = (
        mat.map_batches(_key_partial, batch_format="pyarrow", batch_size=None)
        .groupby("s_user")
        .aggregate(_Sum("ev", alias_name="ev"), _Sum("ns", alias_name="ns"))
        .map_batches(
            lambda t: pa.table({"combined": pc.add(t.column("ev"), t.column("ns"))}),
            batch_format="pyarrow",
        )
        .aggregate(_Max("combined", alias_name="max_n"))
    )
    hottest = int(per_user["max_n"] or 0)
    from .autoshard import range_join_auto

    return range_join_auto(
        events,
        mat.select_columns(["s_user", "session_id", "t_start", "t_end"]),
        on="ts",
        by="user_id",
        lower="t_start",
        upper="t_end",
        right_by="s_user",
        num_partitions=adaptive_partitions(16, n_rows=n_events),
        probe_hottest=hottest,
    ).select_columns(["event_id", "user_id", "ts", "session_id"])


EVENTS_SESSION_ATTRIBUTION_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), intervals AS (
  SELECT user_id, CAST(session_id AS INTEGER) AS session_id,
         MIN(ts) AS t_start, MAX(ts) AS t_end
  FROM sess GROUP BY user_id, session_id
)
SELECT e.event_id, e.user_id, e.ts, i.session_id
FROM events e
JOIN intervals i
  ON e.user_id = i.user_id AND e.ts BETWEEN i.t_start AND i.t_end
"""


def events_last_order(sf_dir: str) -> rd.Dataset:
    """Driver query for ``asof_join``: each event annotated with the
    user's most recent order as of the event time (DuckDB ``ASOF JOIN``
    oracle). Ties at one (custkey, orderdate) resolve to the max
    orderkey WITHOUT a global pre-reduce: ``asof_join``'s per-block
    merge sorts the right side by (time, payload) and ``merge_asof``
    matches the last tied row — identical to the oracle's max-orderkey
    reduction. A per-block partial reduce still slims duplicate
    (custkey, orderdate) rows before they shuffle."""
    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"])

    def _pre(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey", "o_orderdate"]).aggregate([("o_orderkey", "max")])
        g = g.rename_columns(["o_custkey", "o_orderdate", "o_orderkey"])
        # keep the on-dtype identical to events.ts for the asof check
        return g.set_column(
            g.schema.get_field_index("o_orderdate"),
            "o_orderdate",
            g.column("o_orderdate").cast(pa.timestamp("us")),
        )

    reduced = orders.map_batches(_pre, batch_format="pyarrow").materialize()
    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    # Route through the skew dispatcher (autoshard) on CACHED per-
    # (table, key) statistics: one probe per events / orders snapshot
    # serves the whole suite. The combined statistic is the sound upper
    # bound max_user(events) + max_custkey(orders) ≥ the exact combined
    # count of any one key (and ≥ the reduced right side's, which
    # dedups (custkey, orderdate)) — an over-estimate can only dispatch
    # toward the sharded plan, which is result-equal by the planted
    # tests. On unskewed data it picks this exact unsharded plan.
    from .autoshard import asof_join_auto, max_key_rows_parquet

    hottest_bound = max_key_rows_parquet(
        f"{sf_dir}/events.parquet", "user_id"
    ) + max_key_rows_parquet(f"{sf_dir}/orders.parquet", "o_custkey")
    return asof_join_auto(
        events,
        reduced,
        on="ts",
        by="user_id",
        right_on="o_orderdate",
        right_by="o_custkey",
        num_partitions=adaptive_partitions(16, n_rows=n_events),
        probe_hottest=hottest_bound,
    )


EVENTS_LAST_ORDER_SQL = """
WITH r AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, e.ts, r.o_orderkey, r.o_orderdate
FROM events e ASOF JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
"""


def events_value_delta(sf_dir: str) -> rd.Dataset:
    """Per-user LAG delta: each event's value minus the previous event's
    value in (ts, event_id) order — the change-detection window Ray Data
    lacks (``LAG() OVER (PARTITION BY … ORDER BY …)``). One hash
    co-partition on the key, then a per-block vectorized sort + grouped
    shift; the delta is ONE double subtraction over the exact input
    values (no accumulation), so the doubles are bit-identical to the
    SQL mirror. First event per user carries NULL prev/delta.

    Partitioning assumption: one user's events fit one block (the
    windowed-family contract — a hot key takes the ``autoshard``
    probe-and-shard route)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts": pa.array([], pa.timestamp("us")),
                    "value": pa.array([], pa.float64()),
                    "prev_value": pa.array([], pa.float64()),
                    "delta": pa.array([], pa.float64()),
                }
            )
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id", sort=False)["value"].shift(1)
        df["prev_value"] = prev
        df["delta"] = df["value"] - prev
        return pa.Table.from_pandas(df, preserve_index=False)

    from ..util import hash_partitioned_combine as _hpc

    n = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    return _hpc(ds, ["user_id"], block, adaptive_partitions(16, n_rows=n))


EVENTS_VALUE_DELTA_SQL = """
SELECT event_id, user_id, ts, value,
       LAG(value) OVER w AS prev_value,
       value - LAG(value) OVER w AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def events_percent_rank(sf_dir: str) -> rd.Dataset:
    """Per-user PERCENT_RANK of event value — ``(rank − 1) / (n − 1)``
    under the unique (value, event_id) order, 0.0 for single-row
    partitions (SQL's convention). The ordering key is made unique by
    the event_id tiebreak so rank = row number on both sides; the one
    integer-to-double division is correctly rounded ⇒ bit-exact mirror.

    Same one-key-one-block contract (and autoshard escape hatch) as the
    rest of the windowed family."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                    "pr": pa.array([], pa.float64()),
                }
            )
        df = t.to_pandas().sort_values(["user_id", "value", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        rn = g.cumcount().to_numpy()
        n = g["event_id"].transform("size").to_numpy()
        pr = np.where(n > 1, rn / np.maximum(n - 1, 1), 0.0)
        df["pr"] = pr
        return pa.Table.from_pandas(df, preserve_index=False)

    from ..util import hash_partitioned_combine as _hpc

    n = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    return _hpc(ds, ["user_id"], block, adaptive_partitions(16, n_rows=n))


EVENTS_PERCENT_RANK_SQL = """
SELECT event_id, user_id, value,
       PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY value, event_id) AS pr
FROM events
"""


def events_ntile(sf_dir: str, k: int = 4) -> rd.Dataset:
    """Per-user NTILE(k) bucket of event value — the equal-height
    bucketing window (``NTILE(k) OVER (PARTITION BY … ORDER BY …)``).
    SQL's tile rule, reproduced exactly: with n rows and 0-based row
    number rn, the first ``n % k`` tiles hold ``n//k + 1`` rows and the
    rest ``n//k`` — all-integer arithmetic, so the mirror is hash-exact.
    One hash co-partition on the key, then a per-block vectorized sort +
    grouped cumcount (same plan shape as ``events_percent_rank``).

    Same one-key-one-block contract (and autoshard escape hatch) as the
    rest of the windowed family."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "value": pa.array([], pa.float64()),
                    "tile": pa.array([], pa.int64()),
                }
            )
        df = t.to_pandas().sort_values(["user_id", "value", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        rn = g.cumcount().to_numpy()
        n = g["event_id"].transform("size").to_numpy()
        q, r = n // k, n % k
        # rows rn < r*(q+1) land in the wide tiles; the rest in the
        # narrow ones (q == 0 ⇒ r == n and the first branch always wins)
        wide = rn < r * (q + 1)
        tile = np.where(wide, rn // np.maximum(q + 1, 1), r + (rn - r * (q + 1)) // np.maximum(q, 1)) + 1
        df["tile"] = tile.astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    from ..util import hash_partitioned_combine as _hpc

    n = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    return _hpc(ds, ["user_id"], block, adaptive_partitions(16, n_rows=n))


EVENTS_NTILE_SQL = """
SELECT event_id, user_id, value,
       NTILE(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS tile
FROM events
"""


def events_hopping_counts(sf_dir: str) -> rd.Dataset:
    """Hopping-window aggregate (60-min window sliding by a 15-min hop):
    per (window_start, event_type) event count, where each event belongs
    to the 4 overlapping windows covering its timestamp — the streaming
    windowed aggregate Ray Data has no operator for. Per-block plan:
    integer hop bucket ``epoch_us // hop_us``, vectorized 4-way repeat to
    (bucket − j) for j in 0..3, one Arrow group_by partial per block —
    so only (window, type) partials cross the shuffle, never events. The
    window_start timestamp is rebuilt from the integer window id
    (``id · hop_us`` cast to timestamp[us]), all-integer ⇒ hash-exact
    mirror. Windows are keyed by their start; events earlier than a
    window's start simply don't contribute (no partial-window padding),
    matching the UNNEST-offset SQL mirror row-for-row."""
    HOP_US = 15 * 60 * 1_000_000
    N_HOPS = 4  # window = 4 hops = 60 min
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "window_start": pa.array([], pa.timestamp("us")),
                    "event_type": pa.array([], pa.string()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        epoch = t.column("ts").cast(pa.int64()).to_numpy()
        bucket = epoch // HOP_US
        win = (bucket[:, None] - np.arange(N_HOPS)[None, :]).ravel()
        etype = t.column("event_type").to_numpy(zero_copy_only=False).repeat(N_HOPS)
        part = pa.table({"win": pa.array(win, pa.int64()), "event_type": pa.array(etype, pa.string())})
        g = part.group_by(["win", "event_type"]).aggregate([([], "count_all")])
        starts = pc.multiply(g.column("win"), pa.scalar(HOP_US, pa.int64())).cast(pa.timestamp("us"))
        return pa.table(
            {
                "window_start": starts,
                "event_type": g.column("event_type"),
                "n_events": g.column("count_all").cast(pa.int64()),
            }
        )

    def restore_unit(t: pa.Table) -> pa.Table:
        # Ray's sort-based aggregate narrows second-aligned timestamps
        # to timestamp[s]; restore the table contract's [us]
        i = t.schema.get_field_index("window_start")
        return t.set_column(i, "window_start", t.column("window_start").cast(pa.timestamp("us")))

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("n_events", alias_name="n_events"))
        .map_batches(restore_unit, batch_format="pyarrow", batch_size=None)
    )


EVENTS_HOPPING_COUNTS_SQL = """
-- hop bucket uses FLOOR division like the engine's numpy `//`;
-- DuckDB's `//` truncates toward zero (-7 // 2 = -3, numpy -4), so
-- emulate floor with integer math (remainder sign follows dividend)
-- to stay hash-exact for pre-1970 timestamps too
SELECT make_timestamp((((epoch_us(ts) // 900000000)
         - CASE WHEN epoch_us(ts) % 900000000 < 0 THEN 1 ELSE 0 END) - j) * 900000000) AS window_start,
       event_type,
       count(*) AS n_events
FROM events, unnest([0, 1, 2, 3]) AS t(j)
GROUP BY 1, 2
"""


def events_funnel(sf_dir: str, steps: tuple[str, ...] = ("view", "click", "purchase")) -> rd.Dataset:
    """Sequential conversion FUNNEL — the product-analytics staple: how
    many users reach step k, where step k counts only events STRICTLY
    AFTER that user's step-(k-1) completion time (first view, then first
    click after it, then first purchase after that). DRIVER-ORACLED: the
    mirror is the classic chained min-join SQL; timestamps and counts
    are exact integers.

    Scale shape: one hash co-partition by ``user_id`` (every user's
    stream lands whole in one block), then ONE vectorized pandas pass
    per block — per step a filter + merge-on-prev + grouped min, no
    per-user Python — emitting len(steps) partial count rows per block;
    the final exchange is a ≤(blocks·steps)-row groupby. Hot-key caveat
    shared with ``events_sessions`` (a pathological single user bounds a
    block); the time-sharded family is the documented escape hatch."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows

    def block(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        cur: pd.Series | None = None
        counts: list[int] = []
        for step in steps:
            s = df[df["event_type"] == step]
            if cur is not None:
                s = s.merge(cur.rename("prev"), left_on="user_id", right_index=True)
                s = s[s["ts"] > s["prev"]]
            cur = s.groupby("user_id")["ts"].min()
            counts.append(len(cur))
        return pa.table(
            {
                "step": pa.array(range(1, len(steps) + 1), pa.int64()),
                "step_name": pa.array(list(steps), pa.string()),
                "n_users": pa.array(counts, pa.int64()),
            }
        )

    partials = hash_partitioned_combine(ds, ["user_id"], block, adaptive_partitions(16, n_rows=n))
    return partials.groupby(["step", "step_name"]).aggregate(Sum("n_users", alias_name="n_users"))


def _events_funnel_sql(steps: tuple[str, ...] = ("view", "click", "purchase")) -> str:
    ctes, prev = [], None
    for i, step in enumerate(steps, 1):
        if prev is None:
            ctes.append(f"s{i} AS (SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = '{step}' GROUP BY user_id)")
        else:
            ctes.append(
                f"s{i} AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN {prev} USING (user_id)"
                f" WHERE e.event_type = '{step}' AND e.ts > {prev}.t GROUP BY e.user_id)"
            )
        prev = f"s{i}"
    selects = " UNION ALL ".join(
        f"SELECT {i}::BIGINT AS step, '{step}' AS step_name, COUNT(*)::BIGINT AS n_users FROM s{i}"
        for i, step in enumerate(steps, 1)
    )
    return f"WITH {', '.join(ctes)} {selects}"


EVENTS_FUNNEL_SQL = _events_funnel_sql()


def events_retention(sf_dir: str) -> rd.Dataset:
    """Cohort RETENTION matrix — users grouped by first-activity day,
    counted on each later active day: (cohort_day, day_offset, n_users).
    DRIVER-ORACLED; day truncation and offsets are exact integers.

    Scale shape: same one-shuffle-by-user plan as ``events_funnel`` —
    per block one vectorized pandas pass (day floor → per-user distinct
    days → transform-min cohort → offset) whose per-(cohort, offset)
    user counts are EXACT partials because a user never spans blocks;
    the final exchange is bounded by |cohorts| × |offsets|, not rows.
    The cohort key rides that exchange as int64 epoch-µs (Ray's sort
    shuffle re-infers timestamp units through numpy, which downcast the
    column to timestamp[s]); the terminal map casts it back to the
    driver-hash-exact timestamp[us]."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows

    def block(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["day"] = df["ts"].dt.floor("D")
        pairs = df[["user_id", "day"]].drop_duplicates()
        first = pairs.groupby("user_id")["day"].transform("min")
        out = (
            pairs.assign(cohort_day=first, day_offset=(pairs["day"] - first).dt.days.astype("int64"))
            .groupby(["cohort_day", "day_offset"], as_index=False)
            .agg(n_users=("user_id", "size"))
        )
        out["n_users"] = out["n_users"].astype("int64")
        out["cohort_us"] = out.pop("cohort_day").astype("datetime64[us]").astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    def finish(t: pa.Table) -> pa.Table:
        day = pc.cast(t.column("cohort_us"), pa.timestamp("us"))
        return pa.table(
            {"cohort_day": day, "day_offset": t.column("day_offset"), "n_users": t.column("n_users")}
        )

    partials = hash_partitioned_combine(ds, ["user_id"], block, adaptive_partitions(16, n_rows=n))
    agg = partials.groupby(["cohort_us", "day_offset"]).aggregate(Sum("n_users", alias_name="n_users"))
    return agg.map_batches(finish, batch_format="pyarrow")


EVENTS_RETENTION_SQL = """
WITH pairs AS (SELECT DISTINCT user_id, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day FROM events),
f AS (SELECT user_id, MIN(day) AS cohort_day FROM pairs GROUP BY user_id)
SELECT f.cohort_day, DATE_DIFF('day', f.cohort_day, p.day)::BIGINT AS day_offset,
       COUNT(*)::BIGINT AS n_users
FROM pairs p JOIN f USING (user_id)
GROUP BY 1, 2
"""


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-01-01", k: int = 10,
                      broadcast_join: bool | None = None) -> rd.Dataset:
    """TPC-H Q3 (shipping priority): top-k unshipped-revenue orders for
    one market segment — customer ⋈ orders ⋈ lineitem with date
    predicates pushed to the reads. Revenue is INTEGER-EXACT:
    prices/discounts are 2-dp by data contract, so
    ``cents(price) · (100 − bp(discount))`` sums associatively to the
    identical BIGINT on both engines (no float-sum order sensitivity).

    Scale shape mirrors ``revenue_by_nation``: under the broadcast gate
    the qualifying (orderkey → orderdate) map ships once via ``ray.put``
    and lineitem probes it with ``searchsorted`` (the fact table never
    shuffles); above the gate it is a hash ``Dataset.join``. The final
    top-k sorts only the per-order aggregate (bounded by qualifying
    orders, not lineitems)."""
    import ray

    cut = np.datetime64(cutoff, "us")
    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    seg_keys = np.sort(
        cust.filter(pc.equal(cust.column("c_mktsegment"), segment)).column("c_custkey").to_numpy()
    )

    def li_filter(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").cast(pa.timestamp("us")).to_numpy()
        keep = pa.array(sd > cut)
        price = t.column("l_extendedprice").filter(keep).to_numpy()
        disc = t.column("l_discount").filter(keep).to_numpy()
        cents = np.trunc(price * 100.0 + np.copysign(0.5, price)).astype(np.int64)
        bp = np.trunc(disc * 100.0 + np.copysign(0.5, disc)).astype(np.int64)
        return pa.table(
            {"l_orderkey": t.column("l_orderkey").filter(keep),
             "rev": pa.array(cents * (100 - bp), pa.int64())}
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]).map_batches(
        li_filter, batch_format="pyarrow"
    )

    if broadcast_join is None:
        n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
        broadcast_join = n_orders <= BROADCAST_ORDERS_LIMIT

    if broadcast_join:
        # dimension-map build on the driver, shipped once — the same
        # gate-and-broadcast shape as revenue_by_nation's orders keymap
        ot = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"])
        ck = ot.column("o_custkey").to_numpy()
        od = ot.column("o_orderdate").cast(pa.timestamp("us")).to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(seg_keys) == 0:
            ok = np.zeros(len(ck), bool)
        else:
            pos = np.clip(np.searchsorted(seg_keys, ck), 0, len(seg_keys) - 1)
            ok = (seg_keys[pos] == ck) & (od < cut.astype(np.int64))
        okeys = ot.column("o_orderkey").to_numpy()[ok]
        odates = od[ok]
        srt = np.argsort(okeys)
        keymap_ref = ray.put((okeys[srt], odates[srt]))

        def partial(t: pa.Table) -> pa.Table:
            keys_sorted, dates_us = ray.get(keymap_ref)
            lk = t.column("l_orderkey").to_numpy()
            if len(keys_sorted) == 0:
                return pa.table({"o_orderkey": pa.array([], pa.int64()),
                                 "date_us": pa.array([], pa.int64()),
                                 "rev": pa.array([], pa.int64())})
            pos = np.clip(np.searchsorted(keys_sorted, lk), 0, len(keys_sorted) - 1)
            ok = keys_sorted[pos] == lk
            pt = pa.table(
                {"o_orderkey": pa.array(lk[ok]), "date_us": pa.array(dates_us[pos[ok]]),
                 "rev": t.column("rev").filter(pa.array(ok))}
            )
            g = pt.group_by(["o_orderkey", "date_us"]).aggregate([("rev", "sum")])
            return g.rename_columns(["o_orderkey", "date_us", "rev"])

        agg = li.map_batches(partial, batch_format="pyarrow", batch_size=None)
    else:
        def order_filter(t: pa.Table) -> pa.Table:
            ck = t.column("o_custkey").to_numpy()
            od = t.column("o_orderdate").cast(pa.timestamp("us")).to_numpy()
            if len(seg_keys) == 0:
                ok = np.zeros(len(ck), bool)
            else:
                pos = np.clip(np.searchsorted(seg_keys, ck), 0, len(seg_keys) - 1)
                ok = (seg_keys[pos] == ck) & (od < cut)
            return pa.table(
                {"o_orderkey": t.column("o_orderkey").filter(pa.array(ok)),
                 "o_orderdate": t.column("o_orderdate").cast(pa.timestamp("us")).filter(pa.array(ok))}
            )

        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            order_filter, batch_format="pyarrow"
        )
        joined = li.join(
            orders, join_type="inner",
            num_partitions=adaptive_partitions(16),
            on=("l_orderkey",), right_on=("o_orderkey",),
        )

        def partial_joined(t: pa.Table) -> pa.Table:
            pt = pa.table(
                {"o_orderkey": t.column("l_orderkey"),
                 "date_us": t.column("o_orderdate").cast(pa.timestamp("us")).cast(pa.int64()),
                 "rev": t.column("rev")}
            )
            g = pt.group_by(["o_orderkey", "date_us"]).aggregate([("rev", "sum")])
            return g.rename_columns(["o_orderkey", "date_us", "rev"])

        agg = joined.map_batches(partial_joined, batch_format="pyarrow", batch_size=None)

    out = (
        agg.groupby(["o_orderkey", "date_us"])
        .aggregate(Sum("rev", alias_name="revenue_c100"))
        .map_batches(
            lambda t: pa.table(
                {"o_orderkey": t.column("o_orderkey"),
                 "revenue_c100": t.column("revenue_c100"),
                 "o_orderdate": t.column("date_us").cast(pa.timestamp("us"))}
            ),
            batch_format="pyarrow",
        )
        .sort(["revenue_c100", "o_orderkey"], descending=[True, False])
        .limit(k)
    )
    return out


SHIPPING_PRIORITY_SQL = """
SELECT l.l_orderkey AS o_orderkey,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_c100,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 3
ORDER BY revenue_c100 DESC, o_orderkey ASC LIMIT 10
"""


def part_distinct_suppliers(sf_dir: str) -> rd.Dataset:
    """Distinct-count at scale (TPC-H Q16 shape over the tables we
    have): suppliers per part brand from lineitem, plus the lineitem
    volume. Exact distinct with a TINY pair domain (|brands| ×
    |suppliers| ≪ |lineitems|): per-batch (brand, suppkey) partial
    counts → ``tree_aggregate`` coalesce (no hash shuffle — each level
    merges blocks of pair partials with the same associative group_by)
    → per-brand pair-count / count-sum rollup on the single final
    block. Round-4 profiling showed the previous
    ``hash_partitioned_combine`` + second groupby spent three shuffled
    passes on a ≤25k-row pair domain; the tree coalesce is one. For a
    pair domain too big for one block (≳10M pairs), callers should flip
    back to the hash-partitioned plan — the partial/combine fns are
    shared. The part→brand dimension map broadcasts once (``ray.put``
    + ``searchsorted``), the fact table never shuffles raw."""
    import ray

    from ..stages.materialize import tree_aggregate

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"])
    pk = part.column("p_partkey").to_numpy()
    srt = np.argsort(pk)
    brands = np.asarray(part.column("p_brand").to_pylist(), dtype=object)[srt]
    map_ref = ray.put((pk[srt], brands))

    def partial(t: pa.Table) -> pa.Table:
        keys_sorted, brand_arr = ray.get(map_ref)
        lp = t.column("l_partkey").to_numpy()
        pos = np.clip(np.searchsorted(keys_sorted, lp), 0, len(keys_sorted) - 1)
        ok = keys_sorted[pos] == lp
        pt = pa.table(
            {"p_brand": pa.array(brand_arr[pos[ok]], pa.string()),
             "l_suppkey": t.column("l_suppkey").filter(pa.array(ok)),
             "ones": pa.array(np.ones(int(ok.sum()), np.int64))}
        )
        g = pt.group_by(["p_brand", "l_suppkey"]).aggregate([("ones", "sum")])
        return g.rename_columns(["p_brand", "l_suppkey", "n"])

    def pair_combine(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["p_brand", "l_suppkey"]).aggregate([("n", "sum")])
            .rename_columns(["p_brand", "l_suppkey", "n"])
        )

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    pairs = tree_aggregate(
        li.map_batches(partial, batch_format="pyarrow", batch_size=None),
        pair_combine, levels=(8, 1),
    )

    def brand_rollup(t: pa.Table) -> pa.Table:
        # exact: `pairs` holds every (brand, suppkey) exactly once in
        # the single final tree block
        pt = pa.table(
            {"p_brand": t.column("p_brand"),
             "pair": pa.array(np.ones(t.num_rows, np.int64)),
             "n": t.column("n")}
        )
        g = pt.group_by(["p_brand"]).aggregate([("pair", "sum"), ("n", "sum")])
        return g.rename_columns(["p_brand", "n_suppliers", "n_lineitems"])

    return pairs.map_batches(brand_rollup, batch_format="pyarrow", batch_size=None)


PART_DISTINCT_SUPPLIERS_SQL = """
SELECT p.p_brand, COUNT(DISTINCT l.l_suppkey)::BIGINT AS n_suppliers, COUNT(*)::BIGINT AS n_lineitems
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


def order_status_transitions(sf_dir: str) -> rd.Dataset:
    """Markov transition counts over each customer's order-status
    SEQUENCE (ordered by date, then key): (prev_status → status) pair
    frequencies — the categorical sibling of ``events_value_delta``'s
    LAG. One hash co-partition by customer, per-block vectorized
    sort/shift/group (no per-customer Python), final exchange bounded by
    |statuses|²."""
    import pandas as pd

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus"])
    n = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows

    def block(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        prev = df.groupby("o_custkey")["o_orderstatus"].shift()
        pairs = pd.DataFrame({"prev_status": prev, "status": df["o_orderstatus"]}).dropna()
        out = pairs.groupby(["prev_status", "status"], as_index=False).size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = hash_partitioned_combine(ds, ["o_custkey"], block, adaptive_partitions(16, n_rows=n))
    return partials.groupby(["prev_status", "status"]).aggregate(Sum("n", alias_name="n"))


ORDER_STATUS_TRANSITIONS_SQL = """
WITH seq AS (
  SELECT o_custkey,
         LAG(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_status,
         o_orderstatus AS status
  FROM orders
)
SELECT prev_status, status, COUNT(*)::BIGINT AS n
FROM seq WHERE prev_status IS NOT NULL GROUP BY 1, 2
"""


def events_peak_window(sf_dir: str, lo: str = "2024-01-10", hi: str = "2024-01-12") -> rd.Dataset:
    """Time-window rollup with the predicate pushed INTO the parquet
    read (``read_parquet(filter=...)``): row groups whose ts-range
    statistics miss the window never leave storage — the 'prune at the
    read' discipline made visible as a driver query (elsewhere the
    engine prunes columns; this is the row-filter half). Value sums are
    per-row micro-integers for a hash-exact mirror."""
    expr = (pc.field("ts") >= pa.scalar(np.datetime64(lo, "us"))) & (
        pc.field("ts") < pa.scalar(np.datetime64(hi, "us"))
    )
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"], filter=expr
    )

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        micro = np.trunc(v * 1e6 + np.copysign(0.5, v)).astype(np.int64)
        pt = pa.table(
            {"event_type": t.column("event_type"),
             "ones": pa.array(np.ones(t.num_rows, np.int64)),
             "v": pa.array(micro)}
        )
        g = pt.group_by(["event_type"]).aggregate([("ones", "sum"), ("v", "sum")])
        return g.rename_columns(["event_type", "n_events", "sum_value_micro"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value_micro", alias_name="sum_value_micro"))
    )


EVENTS_PEAK_WINDOW_SQL = """
SELECT event_type, COUNT(*)::BIGINT AS n_events,
       SUM(CAST(ROUND(value * 1000000) AS BIGINT))::BIGINT AS sum_value_micro
FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
GROUP BY 1
"""


def events_props_stats(sf_dir: str) -> rd.Dataset:
    """Semi-structured payload extraction — the JSON-column staple: pull
    the integer ``k`` field out of the ``props`` JSON string with ONE
    vectorized RE2 capture (``pc.extract_regex``) per batch — no JSON
    parser, no per-row Python — and roll up count/sum/max per event
    type. DuckDB mirrors with the same RE2 via ``regexp_extract(...,
    1)``, so the all-integer output is hash-exact. (A nested-schema
    corpus would swap the regex for Arrow's struct columns; the Ray
    plumbing — extract inside map_batches, partial-first rollup — is
    identical.)"""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        # Arrow's extract_regex requires NAMED groups; DuckDB's mirror
        # uses the equivalent unnamed group 1 — same RE2 semantics.
        # The capture is bounded to 18 digits so the value always fits
        # int64: an unbounded \d+ would make pc.cast RAISE on a 20-digit
        # payload where the mirror's TRY_CAST silently NULLs (RE2 has no
        # lookahead, so a longer run matches its first 18 digits — on
        # BOTH sides identically, keeping the mirror hash-exact).
        ex = pc.extract_regex(pc.coalesce(t.column("props"), pa.scalar("")), r'"k":\s*(?P<k>\d{1,18})')
        vals = pc.struct_field(ex, "k")
        ok = pc.is_valid(vals)
        k = pc.cast(pc.fill_null(vals, "0"), pa.int64())
        pt = pa.table(
            {"event_type": t.column("event_type").filter(ok),
             "k": k.filter(ok),
             "ones": pa.array(np.ones(int(pc.sum(pc.cast(ok, pa.int64())).as_py() or 0), np.int64))}
        )
        g = pt.group_by(["event_type"]).aggregate([("ones", "sum"), ("k", "sum"), ("k", "max")])
        return g.rename_columns(["event_type", "n_events", "sum_k", "max_k"])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


EVENTS_PROPS_STATS_SQL = """
WITH x AS (
  SELECT event_type, TRY_CAST(regexp_extract(props, '"k":\\s*(\\d{1,18})', 1) AS BIGINT) AS k
  FROM events
)
SELECT event_type, COUNT(*)::BIGINT AS n_events, SUM(k)::BIGINT AS sum_k, MAX(k) AS max_k
FROM x WHERE k IS NOT NULL GROUP BY 1
"""


def orders_monthly_dense(sf_dir: str) -> rd.Dataset:
    """Time-series DENSIFICATION (calendar gap-fill): monthly order
    counts left-joined onto a generated month spine so silent gaps
    become explicit zeros — the reporting primitive every BI pipeline
    needs. The heavy part (per-month counts) is a distributed
    partial-first aggregate; the spine fill touches only the O(months)
    aggregated series on the driver (a 100-year series is 1,200 rows),
    mirrored by DuckDB's ``generate_series`` LEFT JOIN."""
    ds = _read(sf_dir, "orders", ["o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        mon = pc.floor_temporal(t.column("o_orderdate").cast(pa.timestamp("us")), unit="month")
        g = pa.table({"mon": mon}).group_by(["mon"]).aggregate([([], "count_all")])
        return g.rename_columns(["mon", "n_orders"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("mon")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )
    rows = agg.take_all()  # O(months) — the aggregated series only
    if not rows:
        return rd.from_arrow(
            pa.table({"mon": pa.array([], pa.timestamp("us")), "n_orders": pa.array([], pa.int64())})
        )
    counts = {np.datetime64(r["mon"], "M"): int(r["n_orders"]) for r in rows}
    lo, hi = min(counts), max(counts)
    spine = np.arange(lo, hi + np.timedelta64(1, "M"), dtype="datetime64[M]")
    return rd.from_arrow(
        pa.table(
            {"mon": pa.array(spine.astype("datetime64[us]")),
             "n_orders": pa.array([counts.get(m, 0) for m in spine], pa.int64())}
        )
    )


ORDERS_MONTHLY_DENSE_SQL = """
WITH m AS (
  SELECT CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS mon, COUNT(*)::BIGINT AS n_orders
  FROM orders GROUP BY 1
), bounds AS (SELECT MIN(mon) AS lo, MAX(mon) AS hi FROM m),
spine AS (
  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 MONTH)) AS mon FROM bounds
)
SELECT s.mon, COALESCE(m.n_orders, 0)::BIGINT AS n_orders
FROM spine s LEFT JOIN m USING (mon)
"""


def events_type_trigrams(sf_dir: str) -> rd.Dataset:
    """Behavioral sequence mining: consecutive event-type TRIGRAMS per
    user (ordered by ts, then event_id) counted corpus-wide — the n=3
    extension of ``order_status_transitions``' Markov pairs, the
    input to next-action models and anomalous-flow detection. Same one
    co-partition by user + per-block vectorized sort/shift plan; final
    exchange bounded by |event types|³."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
    n = pq.ParquetFile(f"{sf_dir}/events.parquet").metadata.num_rows

    def block(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        g = df.groupby("user_id")["event_type"]
        pairs = pd.DataFrame({"e1": g.shift(2), "e2": g.shift(1), "e3": df["event_type"]}).dropna()
        out = pairs.groupby(["e1", "e2", "e3"], as_index=False).size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = hash_partitioned_combine(ds, ["user_id"], block, adaptive_partitions(16, n_rows=n))
    return partials.groupby(["e1", "e2", "e3"]).aggregate(Sum("n", alias_name="n"))


EVENTS_TYPE_TRIGRAMS_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS e3,
         LAG(event_type, 1) OVER w AS e2,
         LAG(event_type, 2) OVER w AS e1
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, COUNT(*)::BIGINT AS n FROM seq WHERE e1 IS NOT NULL GROUP BY 1, 2, 3
"""


def customer_order_counts(sf_dir: str) -> rd.Dataset:
    """LEFT OUTER join surface (the one join type the query suite had
    not yet exercised): every customer with their order count and
    integer-cents order total, zero-filled for order-less customers —
    the canonical enrichment join. Orders pre-aggregate to one slim row
    per customer BEFORE the join (the exchange is bounded by
    |customers|, never |orders|), then one hash ``left_outer``
    Dataset.join against the customer table and a vectorized COALESCE."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.trunc(
            t.column("o_totalprice").to_numpy() * 100.0
            + np.copysign(0.5, t.column("o_totalprice").to_numpy())
        ).astype(np.int64)
        pt = pa.table(
            {"o_custkey": t.column("o_custkey"),
             "ones": pa.array(np.ones(t.num_rows, np.int64)),
             "cents": pa.array(cents)}
        )
        g = pt.group_by(["o_custkey"]).aggregate([("ones", "sum"), ("cents", "sum")])
        return g.rename_columns(["o_custkey", "n_orders", "total_cents"])

    counts = (
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("o_custkey")
        .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("total_cents", alias_name="total_cents"))
        .materialize()
    )

    from ..util import dataset_mean_row_bytes, fits_broadcast

    n_counts = counts.count()
    if n_counts == 0 or fits_broadcast(n_counts, dataset_mean_row_bytes(counts, max(n_counts, 1))):
        # broadcast tier: ship the slim aggregate once, probe per batch
        # (also sidesteps Ray's hash-join limitation with the SCHEMA-LESS
        # empty blocks tiny shuffles emit — at scale, where the join tier
        # runs, partitions are never empty)
        import ray

        ct = counts.to_pandas()
        keys = ct["o_custkey"].to_numpy() if n_counts else np.array([], np.int64)
        srt = np.argsort(keys)
        ref = ray.put(
            (keys[srt],
             ct["n_orders"].to_numpy()[srt] if n_counts else np.array([], np.int64),
             ct["total_cents"].to_numpy()[srt] if n_counts else np.array([], np.int64))
        )

        def probe(t: pa.Table) -> pa.Table:
            k, n_o, tc = ray.get(ref)
            ck = t.column("c_custkey").to_numpy()
            if len(k) == 0:
                n = np.zeros(len(ck), np.int64)
                tot = np.zeros(len(ck), np.int64)
            else:
                pos = np.clip(np.searchsorted(k, ck), 0, len(k) - 1)
                hit = k[pos] == ck
                n = np.where(hit, n_o[pos], 0).astype(np.int64)
                tot = np.where(hit, tc[pos], 0).astype(np.int64)
            return pa.table(
                {"c_custkey": t.column("c_custkey"), "c_name": t.column("c_name"),
                 "n_orders": pa.array(n), "total_cents": pa.array(tot)}
            )

        return cust.map_batches(probe, batch_format="pyarrow")

    joined = cust.join(
        counts, join_type="left_outer",
        num_partitions=adaptive_partitions(8),
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {"c_custkey": t.column("c_custkey"),
             "c_name": t.column("c_name"),
             "n_orders": pc.coalesce(t.column("n_orders"), pa.scalar(0, pa.int64())),
             "total_cents": pc.coalesce(t.column("total_cents"), pa.scalar(0, pa.int64()))}
        )

    return joined.map_batches(fill, batch_format="pyarrow")


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c.c_custkey, c.c_name,
       COALESCE(o.n_orders, 0)::BIGINT AS n_orders,
       COALESCE(o.total_cents, 0)::BIGINT AS total_cents
FROM customer c LEFT JOIN (
  SELECT o_custkey, COUNT(*)::BIGINT AS n_orders,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))::BIGINT AS total_cents
  FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
"""


def late_shipment_priority(
    sf_dir: str, grace_days: int = 90, broadcast_budget: int | None = None
) -> rd.Dataset:
    """Correlated-EXISTS semi-join (TPC-H Q4's shape, the one join flavor
    the suite had not exercised): count orders per priority that have AT
    LEAST ONE lineitem shipped more than ``grace_days`` after the order
    date. The reference's QA evaluator asks the same "does a violating
    child row exist for this parent" question of Neo4j
    (``src/fancyrag/kg/evaluator.py`` orphan/mismatch counts); here the
    predicate spans BOTH tables, so it cannot reduce to a key anti-join.

    Ray-first plan — EXISTS(l_shipdate > cutoff) ⟺ MAX(l_shipdate) >
    cutoff, so lineitem collapses to slim (orderkey, max_ship) partial
    rows inside ``map_batches`` (bounded by |orders| per block, never
    |lineitem|). Tier ladder on the PARTIALS (a stricter gate than the
    combined aggregate — Σ partials ≥ combined): under the byte budget
    the per-block partials come straight to the driver and the final
    max-combine happens there (ZERO shuffles — the driver holds the
    O(|orders|) lookup it was about to broadcast anyway; measured 2.5 s
    → ~1.5 s warm at sf0.1 vs the shuffled combine); above it, one hash
    combine keyed by the partial-domain size, then a hash
    ``Dataset.join``. The final exchange is the ≤5-row priority rollup."""
    from ..util import dataset_mean_row_bytes, fits_broadcast

    def li_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey"]).aggregate([("l_shipdate", "max")])
        return g.rename_columns(["l_orderkey", "max_ship"])

    def li_combine(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_orderkey"]).aggregate([("max_ship", "max")])
        return g.rename_columns(["l_orderkey", "max_ship"])

    partials = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
        .map_batches(li_partial, batch_format="pyarrow", batch_size=None)
        .materialize()
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    grace = np.timedelta64(grace_days, "D").astype("timedelta64[us]")

    n_part = partials.count()
    kw = {} if broadcast_budget is None else {"budget_bytes": broadcast_budget}
    if n_part == 0 or fits_broadcast(
        n_part, dataset_mean_row_bytes(partials, max(n_part, 1)), **kw
    ):
        import ray

        mt = pa.concat_tables(list(partials.iter_batches(batch_format="pyarrow")))
        if mt.num_rows:
            mt = li_combine(mt)  # final combine on the driver — O(|orders|)
        keys = mt.column("l_orderkey").to_numpy(zero_copy_only=False) if mt.num_rows else np.array([], np.int64)
        ships = (
            mt.column("max_ship").to_numpy(zero_copy_only=False).astype("datetime64[us]")
            if mt.num_rows
            else np.array([], "datetime64[us]")
        )
        srt = np.argsort(keys)
        ref = ray.put((keys[srt], ships[srt]))

        def probe(t: pa.Table) -> pa.Table:
            k, ms = ray.get(ref)
            ok = t.column("o_orderkey").to_numpy()
            od = t.column("o_orderdate").to_numpy().astype("datetime64[us]")
            if len(k) == 0:
                late = np.zeros(len(ok), bool)
            else:
                pos = np.clip(np.searchsorted(k, ok), 0, len(k) - 1)
                late = (k[pos] == ok) & (ms[pos] > od + grace)
            pt = pa.table({"o_orderpriority": t.column("o_orderpriority").filter(pa.array(late))})
            g = pt.group_by(["o_orderpriority"]).aggregate([([], "count_all")])
            return g.rename_columns(["o_orderpriority", "n_orders"])

        partial = orders.map_batches(probe, batch_format="pyarrow", batch_size=None)
    else:
        # above-budget tier: one hash combine sized by the PARTIAL
        # domain (≈ |orders|, not |lineitem|), then the hash join
        max_ship = hash_partitioned_combine(
            partials, ["l_orderkey"], li_combine, adaptive_partitions(16, n_rows=n_part)
        ).materialize()
        joined = orders.join(
            max_ship,
            join_type="inner",
            num_partitions=adaptive_partitions(8, n_rows=n_part),
            on=("o_orderkey",),
            right_on=("l_orderkey",),
        )

        def late_partial(t: pa.Table) -> pa.Table:
            od = t.column("o_orderdate").to_numpy().astype("datetime64[us]")
            ms = t.column("max_ship").to_numpy().astype("datetime64[us]")
            pt = pa.table(
                {"o_orderpriority": t.column("o_orderpriority").filter(pa.array(ms > od + grace))}
            )
            g = pt.group_by(["o_orderpriority"]).aggregate([([], "count_all")])
            return g.rename_columns(["o_orderpriority", "n_orders"])

        partial = joined.map_batches(late_partial, batch_format="pyarrow", batch_size=None)

    return partial.groupby("o_orderpriority").aggregate(Sum("n_orders", alias_name="n_orders"))


LATE_SHIPMENT_PRIORITY_SQL = """
SELECT o.o_orderpriority, COUNT(*)::BIGINT AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
GROUP BY o.o_orderpriority
"""
