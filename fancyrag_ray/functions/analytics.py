"""Distributed analytics operators Ray Data lacks: grouped top-N,
exact grouped quantiles, pivot-to-wide, stratified sampling.

Training-data-pipeline extensions in the same family as ``asof_join`` /
``range_join`` (functions/relational.py): each is expressed as
``map_batches`` partials + one hash co-partitioning shuffle, never a
global sort, and each ships with a DuckDB-oracled driver query. The
reference engine has no analogues (SURVEY §2.6 notes the gap); these are
the aggregate surface a 100-TB curation pipeline needs (per-source
top-k exemplars, per-stratum size quotas, quality-score percentiles).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..util import adaptive_partitions, hash_partitioned_combine


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# grouped top-N
# ---------------------------------------------------------------------------


def grouped_topk(
    ds: rd.Dataset,
    by: str,
    order_col: str,
    k: int,
    tiebreak: str,
    descending: bool = True,
    rank_col: str = "rk",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Top-``k`` rows per ``by`` group ordered by ``order_col`` (then
    ``tiebreak`` ascending for a total, engine-independent order), with
    a 1-based ``rank_col`` — SQL ``ROW_NUMBER() OVER (PARTITION BY ...
    ORDER BY ...) <= k`` semantics.

    Scale shape: a per-block partial prune keeps at most ``k`` rows per
    group per block — the shuffle then moves ≤ k × (groups-per-block)
    rows instead of the full table — and one hash co-partitioning
    shuffle brings each group's ≤ k·num_blocks survivors to a single
    block where the identical prune is the final combine. No global
    sort; a group hot enough to appear in every block still lands at
    most k·num_blocks rows on one partition.

    Both passes are vectorized: one ``sort_values`` (stable mergesort)
    + ``groupby(...).cumcount()`` mask per block, no per-row Python.
    """
    s = ds.schema()
    sch = pa.schema(list(zip(s.names, s.types)))
    out_schema = pa.schema(list(sch) + [pa.field(rank_col, pa.int64())])
    sort_cols = [by, order_col, tiebreak]
    asc = [True, not descending, True]

    def _rank(t: pa.Table) -> tuple:
        df = t.to_pandas().sort_values(sort_cols, ascending=asc, kind="mergesort")
        rk = df.groupby(by, sort=False).cumcount().to_numpy()
        return df, rk

    def _prune(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        df, rk = _rank(t)
        kept = df[rk < k]
        arrays = [pa.Array.from_pandas(kept[c], type=sch.field(c).type) for c in sch.names]
        return pa.Table.from_arrays(arrays, schema=sch)

    def _final(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        df, rk = _rank(t)
        kept = df[rk < k].copy()
        kept[rank_col] = (rk[rk < k] + 1).astype("int64")
        arrays = [
            pa.Array.from_pandas(kept[c], type=out_schema.field(c).type)
            for c in out_schema.names
        ]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    pruned = ds.map_batches(_prune, batch_format="pyarrow", batch_size=None)
    return hash_partitioned_combine(pruned, [by], _final, num_partitions)


def top_orders_per_customer(sf_dir: str) -> rd.Dataset:
    """Driver query for ``grouped_topk``: each customer's 3 most
    expensive orders with rank — oracle is the ROW_NUMBER window."""
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    n = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    return grouped_topk(
        ds,
        by="o_custkey",
        order_col="o_totalprice",
        k=3,
        tiebreak="o_orderkey",
        num_partitions=adaptive_partitions(16, n_rows=n),
    )


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# exact grouped quantiles
# ---------------------------------------------------------------------------


def grouped_quantile_exact(
    ds: rd.Dataset,
    by: str,
    value_col: str,
    quantiles: list[float],
    out_names: list[str],
    count_name: str = "n",
    num_partitions: int = 16,
) -> rd.Dataset:
    """EXACT per-group discrete quantiles (DuckDB ``quantile_disc``
    semantics: sorted 0-based index ``max(0, ceil(q·n) − 1)``, no
    interpolation — pinned empirically against DuckDB) without ever
    sorting or co-locating the raw rows.

    Scale shape: per-block ``group_by(by, value).count`` collapses rows
    to distinct (group, value) pairs BEFORE the shuffle, so the
    exchange volume is bounded by the value domain (cents, token
    counts, scores), not the row count; the hash shuffle co-partitions
    pairs by group and the final combine re-sums pair counts, sorts the
    ≤|domain| distinct values, and reads quantiles off the count
    cumsum. A group with billions of rows but a bounded domain costs
    one small sorted array. Partitioning assumption: one group's
    DISTINCT values fit a block (unbounded continuous domains should be
    quantized first — which is also what makes a bit-stable cross-engine
    oracle possible).
    """
    s = ds.schema()
    types = dict(zip(s.names, s.types))
    vtype = types[value_col]
    out_schema = pa.schema(
        [pa.field(by, types[by]), pa.field(count_name, pa.int64())]
        + [pa.field(nm, vtype) for nm in out_names]
    )

    def _partial(t: pa.Table) -> pa.Table:
        g = t.select([by, value_col]).group_by([by, value_col]).aggregate([([], "count_all")])
        return g.rename_columns([by, value_col, "__n"])

    def _final(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        agg = t.group_by([by, value_col]).aggregate([("__n", "sum")])
        df = agg.to_pandas().sort_values([by, value_col], kind="mergesort")
        keys = df[by].to_numpy()
        vals = df[value_col].to_numpy()
        cnt = df["__n_sum"].to_numpy().astype(np.int64)
        ukeys, starts = np.unique(keys, return_index=True)
        bounds = np.append(starts, len(keys))
        out: dict[str, list] = {by: [], count_name: []}
        for nm in out_names:
            out[nm] = []
        # one Python iteration per GROUP in the partition (groups are
        # low-cardinality by contract); all per-value work is numpy
        for i, kk in enumerate(ukeys):
            s, e = bounds[i], bounds[i + 1]
            c = np.cumsum(cnt[s:e])
            n = int(c[-1])
            out[by].append(kk)
            out[count_name].append(n)
            for q, nm in zip(quantiles, out_names):
                idx = max(0, math.ceil(q * n) - 1)
                j = int(np.searchsorted(c, idx + 1, side="left"))
                out[nm].append(vals[s + j])
        arrays = [
            pa.array(out[f.name], type=f.type) if f.name != by
            else pa.Array.from_pandas(np.asarray(out[by]), type=f.type)
            for f in out_schema
        ]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
    return hash_partitioned_combine(partials, [by], _final, num_partitions)


def order_price_quantiles(sf_dir: str) -> rd.Dataset:
    """Driver query for ``grouped_quantile_exact``: median / p90 order
    price in integer cents per order priority (cents quantization is
    what makes the distributed result bit-equal to the SQL oracle)."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def _cents(t: pa.Table) -> pa.Table:
        from ..util import to_cents

        cents = pa.array(to_cents(t.column("o_totalprice").to_numpy(zero_copy_only=False)))
        return pa.table({"o_orderpriority": t.column("o_orderpriority"), "cents": cents})

    return grouped_quantile_exact(
        ds.map_batches(_cents, batch_format="pyarrow"),
        by="o_orderpriority",
        value_col="cents",
        quantiles=[0.5, 0.9],
        out_names=["p50_cents", "p90_cents"],
        num_partitions=2,  # 5 groups
    )


ORDER_PRICE_QUANTILES_SQL = """
SELECT o_orderpriority, count(*) AS n,
       quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.5) AS p50_cents,
       quantile_disc(CAST(round(o_totalprice * 100) AS BIGINT), 0.9) AS p90_cents
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# pivot to wide counts
# ---------------------------------------------------------------------------


def pivot_counts(
    ds: rd.Dataset,
    row_key: str,
    col_key: str,
    categories: list[str],
    prefix: str = "n_",
    num_partitions: int = 16,
) -> rd.Dataset:
    """Pivot long (row, category) pairs to one wide row per ``row_key``
    with a zero-filled int64 count column per category. Categories are
    declared up front — the same static-schema contract as SQL
    ``PIVOT ... IN (...)`` — because a Dataset's schema cannot depend on
    the data. Unlisted categories are ignored.

    Scale shape: per-block ``group_by(row, col).count`` partials (the
    shuffle moves ≤ rows-per-block × |categories| pair counts, not
    rows), hash co-partition by ``row_key``, and a vectorized widen —
    per category one boolean-mask sum over the partition's pairs.
    """
    s = ds.schema()
    rtype = dict(zip(s.names, s.types))[row_key]
    out_schema = pa.schema(
        [pa.field(row_key, rtype)]
        + [pa.field(f"{prefix}{c}", pa.int64()) for c in categories]
    )

    def _partial(t: pa.Table) -> pa.Table:
        g = t.select([row_key, col_key]).group_by([row_key, col_key]).aggregate([([], "count_all")])
        return g.rename_columns([row_key, col_key, "__n"])

    def _final(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        agg = t.group_by([row_key, col_key]).aggregate([("__n", "sum")])
        df = agg.to_pandas()
        wide = df.pivot_table(
            index=row_key, columns=col_key, values="__n_sum", aggfunc="sum", fill_value=0
        )
        arrays = [pa.Array.from_pandas(wide.index.to_series(), type=rtype)]
        for c in categories:
            col = wide[c] if c in wide.columns else np.zeros(len(wide), dtype=np.int64)
            arrays.append(pa.array(np.asarray(col, dtype=np.int64), type=pa.int64()))
        return pa.Table.from_arrays(arrays, schema=out_schema)

    partials = ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
    return hash_partitioned_combine(partials, [row_key], _final, num_partitions)


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_type_pivot(sf_dir: str) -> rd.Dataset:
    """Driver query for ``pivot_counts``: events per day × event type,
    one wide row per day — oracle is COUNT(*) FILTER conditional
    aggregation."""
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def _day(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.floor_temporal(t.column("ts"), unit="day"),
                "event_type": t.column("event_type"),
            }
        )

    return pivot_counts(
        ds.map_batches(_day, batch_format="pyarrow"),
        row_key="day",
        col_key="event_type",
        categories=EVENT_TYPES,
        num_partitions=4,
    )


EVENTS_TYPE_PIVOT_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       count(*) FILTER (WHERE event_type = 'click')    AS n_click,
       count(*) FILTER (WHERE event_type = 'error')    AS n_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       count(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# stratified deterministic sampling
# ---------------------------------------------------------------------------


def _hash_threshold(bp: int) -> str:
    """4-hex-digit md5-prefix threshold for a basis-point rate. A 100%
    rate maps to ``"g"`` — lexicographically above every hex string —
    because ``format(65536, "04x") == "10000"`` compares BELOW any
    prefix starting with '2'..'f' and would silently sample ~6%."""
    v = (65536 * bp) // 10000
    return "g" if v >= 65536 else format(v, "04x")


def stratified_hash_sample(
    ds: rd.Dataset,
    strata_col: str,
    id_col: str,
    rates_bp: dict[str, int],
    default_bp: int = 0,
) -> rd.Dataset:
    """Per-stratum deterministic hash sampling: keep a row iff the
    first 4 hex chars of md5(id) fall below the stratum's basis-point
    threshold. The strata rebalancer of a training-data pipeline
    (downsample boilerplate crawl, keep all rare strata) in the same
    engine-independent idiom as ``sample_documents_hash``
    (functions/textops.py): shuffle-free, partition-independent,
    resumable, and SQL-reproducible so the oracle checks it exactly.
    md5 has no Arrow kernel, so the digest is the one per-row Python
    step (same documented tradeoff as ``sample_documents_hash``).
    """
    thresholds = {s: _hash_threshold(bp) for s, bp in rates_bp.items()}
    default_thresh = _hash_threshold(default_bp)

    def f(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        strata = t.column(strata_col).to_pylist()
        keep = pa.array(
            [
                hashlib.md5(str(i).encode()).hexdigest()[:4]
                < thresholds.get(s, default_thresh)
                for i, s in zip(ids, strata)
            ],
            pa.bool_(),
        )
        return t.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")


EVENT_SAMPLE_RATES_BP = {"view": 500, "click": 1000, "error": 5000, "signup": 10000, "purchase": 10000}


def stratified_sample_events(sf_dir: str) -> rd.Dataset:
    """Driver query for ``stratified_hash_sample``: downsample the
    high-volume event types, keep all of the rare ones."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "user_id"])
    return stratified_hash_sample(ds, "event_type", "event_id", EVENT_SAMPLE_RATES_BP)


def _stratified_sql() -> str:
    cases = " ".join(
        f"WHEN event_type = '{s}' THEN '{_hash_threshold(bp)}'"
        for s, bp in EVENT_SAMPLE_RATES_BP.items()
    )
    return f"""
SELECT event_id, event_type, user_id FROM events
WHERE SUBSTR(MD5(CAST(event_id AS VARCHAR)), 1, 4) < (CASE {cases} ELSE '0000' END)
"""


STRATIFIED_SAMPLE_EVENTS_SQL = _stratified_sql()


# ---------------------------------------------------------------------------
# per-key running total (window cumsum)
# ---------------------------------------------------------------------------


def keyed_running_total(
    ds: "rd.Dataset",
    by: str,
    order: list[str],
    value_col: str,
    out_col: str = "running_cents",
    num_partitions: int = 16,
) -> "rd.Dataset":
    """Per-key running total in deterministic ``order`` — the
    ``SUM() OVER (PARTITION BY key ORDER BY ... ROWS UNBOUNDED
    PRECEDING)`` window, an operator Ray Data lacks. One hash shuffle on
    the key, then a per-block vectorized sort + grouped cumsum (pandas).

    The value is accumulated in INTEGER CENTS (``round(value·100)``):
    left-to-right float accumulation is order-sensitive AND DuckDB's
    windowed SUM may aggregate through a segment tree (different
    association), so only integer math makes the oracle hash-exact —
    the same trick ``rolling_window_aggregate`` uses.

    Partitioning assumption (custom-operator contract): all rows of one
    ``by`` key fit one block; a single hot key at web scale needs
    time-sharding with carry-in offsets (shard partials are associative:
    later shards add the sum of earlier shards — O(shards) carry rows).
    """
    import numpy as np

    from ..util import hash_partitioned_combine

    def block(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        from ..util import to_cents

        cents = to_cents(df[value_col].to_numpy())
        df = df.drop(columns=[value_col]).assign(_cents=cents)
        df = df.sort_values([by, *order], kind="mergesort")
        df[out_col] = df.groupby(by, sort=False)["_cents"].cumsum()
        return pa.Table.from_pandas(df.drop(columns=["_cents"]), preserve_index=False)

    return hash_partitioned_combine(ds, [by], block, num_partitions)


def events_running_value(sf_dir: str) -> rd.Dataset:
    """Driver query for ``keyed_running_total``: each event with the
    user's cumulative value (integer cents) up to and including it,
    ordered by (ts, event_id) — hash-exact vs the SQL window oracle."""
    from ..util import adaptive_partitions

    n = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    # Skew-dispatched (autoshard); the statistic comes from the
    # per-(table, key) probe cache — one probe per events snapshot.
    from .autoshard import keyed_running_total_auto, max_key_rows_parquet

    return keyed_running_total_auto(
        ds, by="user_id", order=["ts", "event_id"], value_col="value",
        num_partitions=adaptive_partitions(16, n_rows=n),
        probe_hottest=max_key_rows_parquet(f"{sf_dir}/events.parquet", "user_id"),
    )


EVENTS_RUNNING_VALUE_SQL = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
       ) AS BIGINT) AS running_cents
FROM events
"""


# ---------------------------------------------------------------------------
# ROLLUP-style multi-level aggregate
# ---------------------------------------------------------------------------


def rollup_counts(
    ds: "rd.Dataset",
    keys: list[str],
    value_col: str,
    all_sentinel: str = "ALL",
    num_partitions: int = 16,
) -> "rd.Dataset":
    """``GROUP BY ROLLUP(k1, k2, …)`` as a Dataset composition: the
    FINEST level aggregates once from the raw rows (partial-per-block +
    hash combine); every coarser level re-aggregates from the finest —
    whose row count is bounded by the key-combination domain, ≪ rows —
    so the raw data is scanned exactly once however many levels roll up.
    Rolled-up key positions carry ``all_sentinel`` (the SQL mirror
    COALESCEs its NULLs to the same sentinel for a hash-exact compare;
    value sums ride as integer cents). Key columns are cast to STRING in
    the output — the sentinel needs a common type across levels, the
    same reason a SQL mirror over non-string keys must
    ``COALESCE(CAST(k AS VARCHAR), sentinel)``.

    NULL keys are normalized to ``all_sentinel`` BEFORE grouping, so a
    SQL mirror must coalesce inside the ROLLUP too
    (``ROLLUP(COALESCE(CAST(k AS VARCHAR), sentinel), …)``) — coalescing
    only in the SELECT list would keep the NULL group separate from the
    subtotal row while Ray merges them. Precondition: no data value
    literally equals the sentinel (it would merge with the subtotal on
    BOTH sides — pick a sentinel outside the key domain)."""
    import numpy as np

    from ..util import hash_partitioned_combine

    def partial(t: pa.Table) -> pa.Table:
        from ..util import to_cents

        cents = pa.array(to_cents(t.column(value_col).to_numpy(zero_copy_only=False)))
        pt = pa.table(
            {
                **{
                    k: pc.fill_null(t.column(k).cast(pa.string()), all_sentinel)
                    for k in keys
                },
                "_c": cents,
            }
        )
        g = pt.group_by(keys).aggregate([([], "count_all"), ("_c", "sum")])
        return g.rename_columns([*keys, "n_rows", "sum_cents"])

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate([("n_rows", "sum"), ("sum_cents", "sum")])
        return g.rename_columns([*keys, "n_rows", "sum_cents"])

    finest = hash_partitioned_combine(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        keys, combine, num_partitions,
    ).materialize()  # consumed once per rollup level

    # ALL coarser levels derive from the finest table in ONE pass over
    # one block (the finest level is bounded by the key-combination
    # domain, ≪ rows — re-reducing it per level would pay a whole
    # execution round each)
    def widen_all(t: pa.Table) -> pa.Table:
        outs = []
        for lvl in range(len(keys) - 1, -1, -1):
            kept = keys[:lvl]
            if kept:
                g = t.group_by(kept).aggregate([("n_rows", "sum"), ("sum_cents", "sum")])
                g = g.rename_columns([*kept, "n_rows", "sum_cents"])
            else:
                g = pa.table(
                    {
                        "n_rows": pa.array([pa.compute.sum(t.column("n_rows")).as_py() or 0], pa.int64()),
                        "sum_cents": pa.array([pa.compute.sum(t.column("sum_cents")).as_py() or 0], pa.int64()),
                    }
                )
            cols = {}
            for k in keys:
                cols[k] = g.column(k) if k in kept else pa.array([all_sentinel] * g.num_rows, pa.string())
            cols["n_rows"] = g.column("n_rows")
            cols["sum_cents"] = g.column("sum_cents")
            outs.append(pa.table(cols))
        return pa.concat_tables(outs)

    coarser = finest.repartition(1).map_batches(widen_all, batch_format="pyarrow", batch_size=None)
    return finest.union(coarser)


def events_type_rollup(sf_dir: str) -> rd.Dataset:
    """Driver query for ``rollup_counts``: event counts + value cents by
    (event_type, day), rolled up to (event_type) and the grand total —
    DuckDB ``GROUP BY ROLLUP`` oracle with NULLs coalesced to 'ALL'."""
    from ..util import adaptive_partitions

    n = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def add_day(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t.column("ts"), unit="day"), format="%Y-%m-%d")
        return pa.table(
            {"event_type": t.column("event_type"), "day": day, "value": t.column("value")}
        )

    return rollup_counts(
        ds.map_batches(add_day, batch_format="pyarrow"),
        ["event_type", "day"],
        "value",
        num_partitions=adaptive_partitions(16, n_rows=n),
    )


# NULLs are coalesced to the sentinel INSIDE the ROLLUP (not just in the
# SELECT list) to mirror rollup_counts' pre-grouping fill_null — see its
# docstring for why the two placements differ on NULL-keyed data.
EVENTS_TYPE_ROLLUP_SQL = """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(day, 'ALL') AS day,
       COUNT(*)::BIGINT AS n_rows,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM (
  SELECT COALESCE(event_type, 'ALL') AS event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         value
  FROM events
)
GROUP BY ROLLUP(event_type, day)
"""


# ---------------------------------------------------------------------------
# global prefix sum + sequence packing
# ---------------------------------------------------------------------------


def global_running_total(
    ds: "rd.Dataset",
    order_col: str,
    value_col: str,
    out_col: str = "running",
    bucket_width: int | None = None,
    key_range: int | None = None,
    num_partitions: int = 16,
) -> "rd.Dataset":
    """GLOBAL running total over an INTEGER ordering key — the
    ``SUM() OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)`` window with no
    partition key, which no single hash shuffle can produce. Classic
    hierarchical prefix sum:

      1. coarse bucket sums (``k // bucket_width``) reduce
         partial-per-block then combine — one small shuffle over
         O(key_range / bucket_width) rows;
      2. the bucket table prefix-sums on the DRIVER (O(#buckets) —
         documented bound; size ``bucket_width`` so #buckets stays
         driver-friendly at the target scale) and broadcasts once;
      3. rows hash-partition by bucket; each block sorts its buckets
         and adds within-bucket cumsum to the broadcast bucket offset.

    The ordering key must be integer and unique (ties would make the
    window non-deterministic; the oracle orders by the same key).

    ``bucket_width`` defaults from ``key_range`` (pass the key span —
    e.g. from parquet column statistics, no execution needed) so the
    driver-side bucket table stays ≤ ~1M entries at ANY scale: a fixed
    width that is fine at 10^4 keys would put 10^8 buckets on the
    driver at 10^12.
    """
    import ray

    from ..util import hash_partitioned_combine

    if bucket_width is None:
        span = key_range if key_range is not None else 4096
        bucket_width = max(4096, -(-int(span) // 1_000_000))  # ceil → ≤1M buckets

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.divide(t.column(order_col), pa.scalar(bucket_width)).cast(pa.int64())
        return t.append_column("_bkt", b)

    withb = ds.map_batches(add_bucket, batch_format="pyarrow").materialize()

    def bsum_partial(t: pa.Table) -> pa.Table:
        g = t.select(["_bkt", value_col]).group_by(["_bkt"]).aggregate([(value_col, "sum")])
        return g.rename_columns(["_bkt", "s"])

    def bsum_combine(t: pa.Table) -> pa.Table:
        return t.group_by(["_bkt"]).aggregate([("s", "sum")]).rename_columns(["_bkt", "s"])

    bsums = hash_partitioned_combine(
        withb.map_batches(bsum_partial, batch_format="pyarrow", batch_size=None),
        ["_bkt"], bsum_combine, max(1, num_partitions // 4),
    )
    btbl = pa.concat_tables(list(bsums.iter_batches(batch_format="pyarrow")))
    order = pc.array_sort_indices(btbl.column("_bkt"))
    bkts = pc.take(btbl.column("_bkt"), order).to_numpy(zero_copy_only=False)
    sums = pc.take(btbl.column("s"), order).to_numpy(zero_copy_only=False)
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])  # exclusive prefix
    off_map_ref = ray.put((bkts, offsets))

    def within(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.drop_columns(["_bkt"]).append_column(out_col, pa.array([], pa.int64()))
        bk, off = ray.get(off_map_ref)
        df = t.to_pandas().sort_values([ "_bkt", order_col], kind="mergesort")
        cum = df.groupby("_bkt", sort=False)[value_col].cumsum()
        idx = np.searchsorted(bk, df["_bkt"].to_numpy())
        df[out_col] = cum.to_numpy() + off[idx]
        return pa.Table.from_pandas(df.drop(columns=["_bkt"]), preserve_index=False)

    return hash_partitioned_combine(withb, ["_bkt"], within, num_partitions)


def pack_documents(sf_dir: str, budget_tokens: int = 1024) -> rd.Dataset:
    """Sequence PACKING — the LLM-training batcher: documents in
    deterministic doc_id order are laid head-to-tail on a global token
    tape (token estimate = the reference's ``max(1, ceil(len/4))``,
    same as ``token_stats_by_source``), and each doc's pack is the
    ``budget_tokens``-sized bin its START offset falls in (contiguous
    packing with overflow — long docs straddle into the next bin, the
    streaming-friendly contract a separate splitter then chunks).
    Built on :func:`global_running_total`; hash-exact vs the SQL
    global-window mirror."""
    from ..util import adaptive_partitions

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def toks(t: pa.Table) -> pa.Table:
        n = pc.utf8_length(t.column("text")).cast(pa.float64())
        est = pc.max_element_wise(
            pc.ceil(pc.divide(n, pa.scalar(4.0))), pa.scalar(1.0)
        ).cast(pa.int64())
        return pa.table({"doc_id": t.column("doc_id"), "n_tokens": est})

    meta = pq.read_metadata(f"{sf_dir}/documents.parquet")
    n = meta.num_rows
    # key span from the parquet column statistics — sizes the prefix-sum
    # bucket width with zero execution
    idx = pq.read_schema(f"{sf_dir}/documents.parquet").get_field_index("doc_id")
    lo = min(meta.row_group(g).column(idx).statistics.min for g in range(meta.num_row_groups))
    hi = max(meta.row_group(g).column(idx).statistics.max for g in range(meta.num_row_groups))
    cum = global_running_total(
        docs.map_batches(toks, batch_format="pyarrow"),
        order_col="doc_id", value_col="n_tokens", out_col="cum_tokens",
        key_range=int(hi) - int(lo) + 1,
        num_partitions=adaptive_partitions(16, n_rows=n),
    )

    def finish(t: pa.Table) -> pa.Table:
        start = pc.subtract(t.column("cum_tokens"), t.column("n_tokens"))
        pack = pc.divide(start, pa.scalar(budget_tokens)).cast(pa.int64())
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "pack_id": pack,
            }
        )

    return cum.map_batches(finish, batch_format="pyarrow")


PACK_DOCUMENTS_SQL = """
WITH d AS (
  SELECT doc_id, GREATEST(1, CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT)) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM d
)
SELECT doc_id, n_tokens, (cum - n_tokens) // 1024 AS pack_id FROM c
"""


# ---------------------------------------------------------------------------
# temperature-based source rebalancing
# ---------------------------------------------------------------------------


def temperature_rates_bp(counts: dict[str, int]) -> dict[str, int]:
    """Per-group basis-point sampling rates that rebalance a skewed
    corpus toward T=2 temperature sampling (the multilingual-pretraining
    rebalancer: sample group g with probability ∝ count_g^(1/T); the
    per-row inclusion rate is then ∝ count_g^(1/T − 1) = count_g^(−1/2),
    normalized so the SMALLEST group keeps 100%).

    INTEGER-EXACT construction so a SQL mirror reproduces every rate
    bit-for-bit: rate_bp = floor(sqrt((10^8 · c_min) // c)). The
    argument of sqrt is an exact integer ≤ 10^8 (fits a double), IEEE
    sqrt is correctly rounded in every engine, and a non-square's root
    is ≫ 1 ulp away from an integer — so floor agrees everywhere.
    """
    import math

    cmin = min(counts.values())
    return {
        g: int(math.floor(math.sqrt((100_000_000 * cmin) // c)))
        for g, c in counts.items()
    }


def temperature_sample_documents(sf_dir: str) -> rd.Dataset:
    """Driver query: T=2 temperature resampling of documents by ``lang``
    (en dominates the corpus ~3:1; rare languages keep 100%, en keeps
    ~sqrt(c_min/c_en)). Two phases: a tiny per-lang count groupby, then
    the shuffle-free md5-threshold filter (``stratified_hash_sample``)
    with the integer-exact rates — deterministic, resumable, and
    hash-exact vs the SQL mirror that recomputes the same rates."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def cpartial(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "c"])

    from ray.data.aggregate import Sum as _Sum

    counts_tbl = (
        ds.map_batches(cpartial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(_Sum("c", alias_name="c"))
        .to_pandas()
    )
    counts = dict(zip(counts_tbl["lang"], counts_tbl["c"]))
    rates = temperature_rates_bp(counts)
    return stratified_hash_sample(ds, strata_col="lang", id_col="doc_id", rates_bp=rates)


TEMPERATURE_SAMPLE_DOCUMENTS_SQL = """
WITH counts AS (
  SELECT lang, COUNT(*)::BIGINT AS c FROM documents GROUP BY lang
),
mn AS (SELECT MIN(c) AS cmin FROM counts),
rates AS (
  SELECT lang,
         CAST(FLOOR(SQRT(CAST((100000000 * mn.cmin) // c AS DOUBLE))) AS BIGINT) AS rate_bp
  FROM counts, mn
),
th AS (
  SELECT lang,
         CASE WHEN (65536 * rate_bp) // 10000 >= 65536 THEN 'g'
              ELSE printf('%04x', (65536 * rate_bp) // 10000) END AS thr
  FROM rates
)
SELECT d.doc_id, d.lang
FROM documents d JOIN th USING (lang)
WHERE SUBSTR(MD5(CAST(d.doc_id AS VARCHAR)), 1, 4) < th.thr
"""


# ---------------------------------------------------------------------------
# grouped covariance / correlation moments (exact integer)
# ---------------------------------------------------------------------------


def events_hour_value_stats(sf_dir: str) -> rd.Dataset:
    """Grouped second-moment statistics — the covariance/correlation
    member of the aggregate family (feature-correlation checks every
    curation pipeline runs before training): per event_type, the exact
    integer moments between hour-of-day (x ∈ [0,23]) and value-cents
    (y), plus the covariance NUMERATOR ``n·Σxy − Σx·Σy``. Pearson r =
    cov_num / sqrt((n·Σxx − (Σx)²)(n·Σyy − (Σy)²)) is one float
    expression over these exact integers, left to the consumer so the
    stored row stays hash-exact (emitting the division would tie the
    contract to libm rounding).

    Shape: one per-block 6-way integer partial per type (Σ inside
    ``map_batches``), then a ≤|event_types|-row combine — no row ever
    shuffles. int64 bounds: |cov_num| ≤ n·Σ|xy| ≈ n²·23·max_cents;
    safe through ~10⁹ rows/group at cents scale — shard the group key
    (timeshard family) past that."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.hour(t.column("ts")).to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = np.trunc(v * 100.0 + np.copysign(0.5, v)).astype(np.int64)
        pt = pa.table(
            {
                "event_type": t.column("event_type"),
                "n": pa.array(np.ones(t.num_rows, np.int64)),
                "sum_x": pa.array(hour),
                "sum_y": pa.array(cents),
                "sum_xx": pa.array(hour * hour),
                "sum_yy": pa.array(cents * cents),
                "sum_xy": pa.array(hour * cents),
            }
        )
        g = pt.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("sum_x", "sum"), ("sum_y", "sum"),
             ("sum_xx", "sum"), ("sum_yy", "sum"), ("sum_xy", "sum")]
        )
        return g.rename_columns(
            ["event_type", "n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
        )

    agg = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).groupby(
        "event_type"
    ).aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_x", alias_name="sum_x"),
        Sum("sum_y", alias_name="sum_y"),
        Sum("sum_xx", alias_name="sum_xx"),
        Sum("sum_yy", alias_name="sum_yy"),
        Sum("sum_xy", alias_name="sum_xy"),
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False)
        sx = t.column("sum_x").to_numpy(zero_copy_only=False)
        sy = t.column("sum_y").to_numpy(zero_copy_only=False)
        sxy = t.column("sum_xy").to_numpy(zero_copy_only=False)
        cov_num = n * sxy - sx * sy
        return t.append_column("cov_num", pa.array(cov_num, pa.int64()))

    return agg.map_batches(finish, batch_format="pyarrow")


EVENTS_HOUR_VALUE_STATS_SQL = """
SELECT event_type,
       COUNT(*)::BIGINT AS n,
       SUM(x)::BIGINT AS sum_x,
       SUM(y)::BIGINT AS sum_y,
       SUM(x * x)::BIGINT AS sum_xx,
       SUM(y * y)::BIGINT AS sum_yy,
       SUM(x * y)::BIGINT AS sum_xy,
       (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))::BIGINT AS cov_num
FROM (
  SELECT event_type,
         EXTRACT(hour FROM ts)::BIGINT AS x,
         CAST(ROUND(value * 100) AS BIGINT) AS y
  FROM events
)
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# market-basket co-purchase pairs
# ---------------------------------------------------------------------------


def copurchase_pairs(sf_dir: str, top: int = 100, min_orders: int = 2) -> rd.Dataset:
    """Frequent co-purchase part pairs (market-basket pair mining — the
    A-priori candidate-generation step every recommender/affinity
    pipeline runs): for every unordered part pair appearing together in
    ≥ ``min_orders`` orders, the co-occurrence count; top-``top`` by
    (n_orders desc, p1, p2).

    Shape: ONE hash co-partition by orderkey (each basket lands whole in
    one block), per-block distinct-parts-per-order pair generation from
    the sorted flat array (vectorized triu indices — the
    ``common_neighbor_scores`` kernel, but with a BOUNDED fan-out:
    baskets are O(10) lineitems, so pairs/order ≤ C(|basket|,2) is a
    constant, never the hub-pivot d² hazard), pair-count combine, then
    block-prune → single-partition top-k (nothing pair-domain-sized is
    globally sorted)."""
    from ray.data.aggregate import Sum as _Sum

    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def distinct_partial(t: pa.Table) -> pa.Table:
        return t.group_by(["l_orderkey", "l_partkey"]).aggregate([])

    baskets = hash_partitioned_combine(
        li.map_batches(distinct_partial, batch_format="pyarrow", batch_size=None),
        ["l_orderkey"],
        lambda t: t.group_by(["l_orderkey", "l_partkey"]).aggregate([]),
        adaptive_partitions(16, n_rows=n_li),
    )

    def pair_block(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"p1": pa.array([], pa.int64()), "p2": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}
        )
        if t.num_rows < 2:
            return empty
        df = t.to_pandas().sort_values(["l_orderkey", "l_partkey"])
        ok = df["l_orderkey"].to_numpy()
        pk = df["l_partkey"].to_numpy()
        p1s, p2s = [], []
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        ends = np.r_[starts[1:], len(ok)]
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            ai, bi = np.triu_indices(m, k=1)
            p1s.append(pk[s:e][ai])
            p2s.append(pk[s:e][bi])
        if not p1s:
            return empty
        pt = pa.table(
            {"p1": pa.array(np.concatenate(p1s), pa.int64()),
             "p2": pa.array(np.concatenate(p2s), pa.int64())}
        )
        g = pt.group_by(["p1", "p2"]).aggregate([([], "count_all")])
        return g.rename_columns(["p1", "p2", "n"])

    pair_partials = baskets.map_batches(pair_block, batch_format="pyarrow", batch_size=None)
    counts = hash_partitioned_combine(
        pair_partials,
        ["p1", "p2"],
        lambda t: t.group_by(["p1", "p2"]).aggregate([("n", "sum")]).rename_columns(["p1", "p2", "n_orders"]),
        adaptive_partitions(16, n_rows=n_li),
    )

    def prune(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("n_orders"), pa.scalar(min_orders)))
        idx = pc.sort_indices(
            t, sort_keys=[("n_orders", "descending"), ("p1", "ascending"), ("p2", "ascending")]
        )
        return t.take(idx[:top])

    return (
        counts.map_batches(prune, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(prune, batch_format="pyarrow", batch_size=None)
    )


COPURCHASE_PAIRS_SQL = """
SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*)::BIGINT AS n_orders
FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING COUNT(*) >= 2
ORDER BY n_orders DESC, p1, p2 LIMIT 100
"""
