"""Skew-adaptive dispatch for the windowed-relational family.

The unsharded operators (``relational.asof_join`` / ``range_join`` /
``rolling_window_aggregate``, ``analytics.keyed_running_total``) hash
co-partition by the ``by`` key and run one vectorized kernel per block —
the fastest plan when every key's rows fit a block. The time-sharded
variants (``timeshard.*_timesharded``) remove that assumption at a
measured ~1.5–2.3× fixed-cost overhead (extra boundary-state phases that
are pure tax when no key is hot).

This module makes the choice DATA-DRIVEN instead of caller-guessed: a
cheap skew probe (:func:`max_key_rows` — per-block partial counts, an
O(distinct keys) shuffle, one scalar to the driver) measures the densest
key; above ``hot_key_threshold`` rows the sharded plan runs, below it
the unsharded plan does. The probe costs one narrow pass over the key
column — at 100 TB that is orders of magnitude cheaper than either join
it protects, and a wrong static guess in EITHER direction is worse:
unsharded on a hot key is a straggler/OOM, sharded on uniform data pays
the boundary tax on every run.

The threshold default (2²¹ rows ≈ 2M) is the one-key-one-block budget:
a 2M-row key at ~100 B/row is ~200 MB in a single combine block — near
the default target block size; beyond it the block no longer pipelines.

Each dispatcher returns exactly what the underlying operator returns
(same semantics, same SQL oracle either way); ``probe_result`` callers
can inspect the decision via :func:`choose_windowed_path`.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Max, Sum

# One hash-partitioned combine block should stay pipelineable: ~2M rows
# of a single key is the point where block size ≈ target_max_block_size.
HOT_KEY_THRESHOLD_ROWS = 1 << 21


def max_key_rows(ds: rd.Dataset, key: str) -> int:
    """Rows of the densest ``key`` — the skew statistic the dispatch
    decision needs. Per-block partial counts (``batch_size=None`` so the
    partial is block-final) bound the shuffle to O(distinct keys per
    block); the groupby-sum + max reduce returns ONE scalar to the
    driver. Nothing corpus-sized moves."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([key]).group_by([key]).aggregate([([], "count_all")])
        return g.rename_columns([key, "n"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(key)
        .aggregate(Sum("n", alias_name="n"))
    )
    out = counts.aggregate(Max("n", alias_name="max_n"))
    return int(out["max_n"] or 0)


_KEY_STATS_CACHE: dict[tuple, int] = {}


def max_key_rows_parquet(path: str, key: str) -> int:
    """:func:`max_key_rows` over one parquet file's ``key`` column,
    memoized on the file's identity (realpath, mtime_ns, size) — the
    probe-once-per-(table, key) statistics cache. Within one process
    (the driver's query suite, a bench rep loop) every query that
    dispatches on the same column pays ONE probe total instead of one
    per query; rewriting the table invalidates the entry the way a
    stats refresh would. This is the ANALYZE-style table-statistics
    pattern: heavy-hitter stats belong to a table snapshot, not to a
    query execution."""
    st = os.stat(path)
    fp = (os.path.realpath(path), st.st_mtime_ns, st.st_size, key)
    hit = _KEY_STATS_CACHE.get(fp)
    if hit is not None:
        return hit
    val = max_key_rows(rd.read_parquet(path, columns=[key]), key)
    _KEY_STATS_CACHE[fp] = val
    return val


def max_key_rows_union(probes: list[tuple[rd.Dataset, str]]) -> int:
    """Rows of the densest key over the UNION of the given (dataset,
    key-column) sides, in ONE pipeline execution — the two-sided probe
    for the co-partitioned join plans.

    Two reasons this replaces ``max(max_key_rows(L), max_key_rows(R))``
    for asof/range dispatch: (a) an unsharded aggregator block holds a
    key's LEFT AND RIGHT rows TOGETHER, so the per-side max under-states
    the real one-block budget by up to 2×, while the union-sum is the
    exact combined count; (b) one execution instead of two halves the
    probe's fixed pipeline cost (~1 s per execution at sf0.1 — measured
    as the dominant share of the dispatcher premium on small inputs).
    Join keys are equality-compared by the join itself, so the sides'
    key columns are union-compatible by construction."""

    def mk_partial(key: str):
        def partial(t: pa.Table) -> pa.Table:
            g = t.select([key]).group_by([key]).aggregate([([], "count_all")])
            return g.rename_columns(["k", "n"])

        return partial

    parts = [
        ds.map_batches(mk_partial(key), batch_format="pyarrow", batch_size=None)
        for ds, key in probes
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    counts = u.groupby("k").aggregate(Sum("n", alias_name="n"))
    out = counts.aggregate(Max("n", alias_name="max_n"))
    return int(out["max_n"] or 0)


def choose_windowed_path(
    max_rows: int, threshold: int = HOT_KEY_THRESHOLD_ROWS
) -> str:
    """'sharded' iff the densest key exceeds the one-block budget.

    The threshold is a WORKER-HEAP dial, not a latency crossover:
    measured at 32 CPUs (BASELINE.md round-5 skew table), the sharded
    plan costs ~2.5–3.5× the unsharded plan's wall-clock even at a
    3M-row hot key, because a 3M-row pandas block is still only ~70 MB
    and finishes in seconds on a large-memory box — sharding pays off
    where the unsharded plan would materialize an UNBOUNDED key block
    on a small worker heap (bot-scale keys, 100M+ rows). Default 2²¹
    (~50–100 MB/key-block) suits ~4 GB workers; raise
    ``hot_key_threshold`` on large-memory clusters that care about
    latency."""
    return "sharded" if max_rows > threshold else "unsharded"


def asof_join_auto(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    by: str,
    right_on: str | None = None,
    right_by: str | None = None,
    direction: str = "backward",
    how: str = "inner",
    shard_seconds: int = 86_400,
    num_partitions: int = 16,
    hot_key_threshold: int = HOT_KEY_THRESHOLD_ROWS,
    probe_left: rd.Dataset | None = None,
    probe_right: rd.Dataset | None = None,
    probe_hottest: int | None = None,
) -> rd.Dataset:
    """``relational.asof_join`` with data-driven skew dispatch: probes
    the densest ``by`` key on BOTH sides (either side's hot key lands in
    the same co-partitioned block) and picks the sharded plan only when
    needed.

    ``probe_left`` / ``probe_right``: optional stand-in datasets for the
    probe (same key column, e.g. a key-only parquet read). When the
    input is the tail of a transform pipeline, probing it directly would
    EXECUTE that pipeline once just to count keys — at 100 TB that is a
    full extra pass; a narrow source read costs one column's IO.

    ``probe_hottest``: caller-supplied combined count of the densest key
    — skips the probe execution entirely. Use when the statistic falls
    out of work already done (e.g. a materialized right side that
    aggregates the left, as session summaries aggregate events).

    The statistic is the COMBINED left+right row count of the densest
    key (one union probe, :func:`max_key_rows_union`) — that is what an
    unsharded co-partitioned block actually holds."""
    from . import relational, timeshard

    hottest = probe_hottest if probe_hottest is not None else max_key_rows_union(
        [
            (probe_left if probe_left is not None else left, by),
            (probe_right if probe_right is not None else right, right_by or by),
        ]
    )
    if choose_windowed_path(hottest, hot_key_threshold) == "sharded":
        return timeshard.asof_join_timesharded(
            left, right, on=on, by=by, right_on=right_on, right_by=right_by,
            direction=direction, how=how, shard_seconds=shard_seconds,
            num_partitions=num_partitions,
        )
    return relational.asof_join(
        left, right, on=on, by=by, right_on=right_on, right_by=right_by,
        direction=direction, how=how, num_partitions=num_partitions,
    )


def rolling_window_aggregate_auto(
    ds: rd.Dataset,
    on: str,
    by: str,
    value_col: str,
    window_seconds: int,
    out_sum: str = "win_sum",
    out_n: str = "win_n",
    shard_seconds: int | None = None,
    num_partitions: int = 16,
    hot_key_threshold: int = HOT_KEY_THRESHOLD_ROWS,
    probe_ds: rd.Dataset | None = None,
    probe_hottest: int | None = None,
) -> rd.Dataset:
    """``relational.rolling_window_aggregate`` with skew dispatch.
    ``probe_ds``: optional key-only stand-in for the probe;
    ``probe_hottest``: caller-supplied statistic that skips the probe
    (see :func:`asof_join_auto` / :func:`max_key_rows_parquet`)."""
    from . import relational, timeshard

    hottest = probe_hottest if probe_hottest is not None else max_key_rows(
        probe_ds if probe_ds is not None else ds, by
    )
    if choose_windowed_path(hottest, hot_key_threshold) == "sharded":
        return timeshard.rolling_window_aggregate_timesharded(
            ds, on=on, by=by, value_col=value_col, window_seconds=window_seconds,
            out_sum=out_sum, out_n=out_n, shard_seconds=shard_seconds,
            num_partitions=num_partitions,
        )
    return relational.rolling_window_aggregate(
        ds, on=on, by=by, value_col=value_col, window_seconds=window_seconds,
        out_sum=out_sum, out_n=out_n, num_partitions=num_partitions,
    )


def range_join_auto(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    by: str,
    lower: str,
    upper: str,
    right_by: str | None = None,
    shard_seconds: int = 86_400,
    num_partitions: int = 16,
    hot_key_threshold: int = HOT_KEY_THRESHOLD_ROWS,
    probe_left: rd.Dataset | None = None,
    probe_right: rd.Dataset | None = None,
    probe_hottest: int | None = None,
) -> rd.Dataset:
    """``relational.range_join`` with skew dispatch (both sides probed
    in one union execution — combined count, see :func:`asof_join_auto`).
    ``probe_left`` / ``probe_right``: optional key-only stand-ins for
    the probe; ``probe_hottest``: caller-supplied statistic that skips
    the probe execution (see :func:`asof_join_auto`)."""
    from . import relational, timeshard

    hottest = probe_hottest if probe_hottest is not None else max_key_rows_union(
        [
            (probe_left if probe_left is not None else left, by),
            (probe_right if probe_right is not None else right, right_by or by),
        ]
    )
    if choose_windowed_path(hottest, hot_key_threshold) == "sharded":
        return timeshard.range_join_timesharded(
            left, right, on=on, by=by, lower=lower, upper=upper,
            right_by=right_by, shard_seconds=shard_seconds,
            num_partitions=num_partitions,
        )
    return relational.range_join(
        left, right, on=on, by=by, lower=lower, upper=upper,
        right_by=right_by, num_partitions=num_partitions,
    )


def keyed_running_total_auto(
    ds: rd.Dataset,
    by: str,
    order: list[str],
    value_col: str,
    out_col: str = "running_cents",
    shard_seconds: int = 86_400,
    num_partitions: int = 16,
    hot_key_threshold: int = HOT_KEY_THRESHOLD_ROWS,
    probe_ds: rd.Dataset | None = None,
    probe_hottest: int | None = None,
) -> rd.Dataset:
    """``analytics.keyed_running_total`` with skew dispatch.
    ``probe_ds``: optional key-only stand-in for the probe;
    ``probe_hottest``: caller-supplied statistic that skips the probe
    (see :func:`asof_join_auto` / :func:`max_key_rows_parquet`)."""
    from . import analytics, timeshard

    hottest = probe_hottest if probe_hottest is not None else max_key_rows(
        probe_ds if probe_ds is not None else ds, by
    )
    if choose_windowed_path(hottest, hot_key_threshold) == "sharded":
        return timeshard.keyed_running_total_timesharded(
            ds, by=by, order=order, value_col=value_col, out_col=out_col,
            shard_seconds=shard_seconds, num_partitions=num_partitions,
        )
    return analytics.keyed_running_total(
        ds, by=by, order=order, value_col=value_col, out_col=out_col,
        num_partitions=num_partitions,
    )


def hot_keys(ds: rd.Dataset, key: str, threshold: int) -> list:
    """The distinct ``key`` values with more than ``threshold`` rows —
    the skew SET (vs ``max_key_rows``' scalar). Same partial-first
    count plan; only the > threshold survivors (≤ rows/threshold of
    them by construction, so always driver-safe) are collected."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([key]).group_by([key]).aggregate([([], "count_all")])
        return g.rename_columns([key, "n"])

    import pyarrow.compute as pc

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(key)
        .aggregate(Sum("n", alias_name="n"))
    )
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("n"), pa.scalar(threshold, pa.int64()))).select([key]),
        batch_format="pyarrow",
    )
    return hot.unique(key)


_HOT_KEYS_CACHE: dict[tuple, list] = {}


def hot_keys_parquet(path: str, key: str, threshold: int) -> list:
    """:func:`hot_keys` over one parquet file's ``key`` column, memoized
    on the file's identity like :func:`max_key_rows_parquet` — and
    derived for FREE from the scalar stats cache when possible: if the
    densest key is already known to be ≤ threshold, the hot set is
    provably empty with no probe at all (the common case: one scalar
    probe per table serves both the windowed dispatchers and the salted
    join)."""
    st = os.stat(path)
    base = (os.path.realpath(path), st.st_mtime_ns, st.st_size, key)
    mx = _KEY_STATS_CACHE.get(base)
    if mx is not None and mx <= threshold:
        return []
    fp = base + (threshold,)
    hit = _HOT_KEYS_CACHE.get(fp)
    if hit is not None:
        return hit
    val = hot_keys(rd.read_parquet(path, columns=[key]), key, threshold)
    _HOT_KEYS_CACHE[fp] = val
    return val


def salted_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str,
    n_salts: int = 16,
    hot_threshold: int = HOT_KEY_THRESHOLD_ROWS,
    num_partitions: int | None = None,
    probe_hot: list | None = None,
) -> rd.Dataset:
    """Skew-safe inner hash join — the JOIN-side sibling of the
    time-sharded window family: Ray's hash join sends every row of a
    key to ONE aggregator, so a bot-scale hot key is a straggler/OOM.
    Here the ``hot_keys`` probe finds the > threshold keys; hot LEFT
    rows spread across ``n_salts`` sub-keys (position % n_salts inside
    each block), matching RIGHT rows replicate once per salt, cold keys
    ride salt 0 with no replication — then one ordinary hash join on
    (key, salt). Result rows are EXACTLY the plain join's (salting is
    an implementation detail), which is what the planted hot-key test
    and the SQL mirror of any query built on this assert.

    ASSUMPTION — left = fact, right = dimension: only LEFT-side skew is
    probed and salted. A key hot only on the RIGHT still funnels all
    its joined rows through one aggregator, and a key hot on BOTH sides
    replicates the hot right rows n_salts times (output explosion is
    inherent to the join, but the shuffle cost multiplies). Fine for
    the events⋈customer call sites this serves; to reuse against a
    possibly-skewed right side, probe both sides (``hot_keys`` on each)
    and pass the bigger one as ``left``.

    ``probe_hot``: caller-supplied hot-key set (e.g. from the
    :func:`hot_keys_parquet` snapshot cache) — skips the probe."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    from ..util import adaptive_partitions

    hot = probe_hot if probe_hot is not None else hot_keys(left, left_key, hot_threshold)
    if not hot:
        return left.join(
            right, join_type="inner",
            num_partitions=num_partitions or adaptive_partitions(16),
            on=(left_key,), right_on=(right_key,),
        )
    key_type = dict(zip(left.schema().names, left.schema().types))[left_key]
    hot_ref = ray.put(pa.array(hot, key_type))

    def salt_left(t: pa.Table) -> pa.Table:
        is_hot = pc.is_in(t.column(left_key), value_set=ray.get(hot_ref)).to_numpy(zero_copy_only=False)
        salt = np.zeros(t.num_rows, np.int64)
        salt[is_hot] = np.arange(int(is_hot.sum())) % n_salts
        return t.append_column("__salt", pa.array(salt))

    def replicate_right(t: pa.Table) -> pa.Table:
        is_hot = pc.is_in(t.column(right_key), value_set=ray.get(hot_ref)).to_numpy(zero_copy_only=False)
        cold = t.filter(pa.array(~is_hot)).append_column(
            "__salt", pa.array(np.zeros(int((~is_hot).sum()), np.int64))
        )
        hot_t = t.filter(pa.array(is_hot))
        reps = [
            hot_t.append_column("__salt", pa.array(np.full(hot_t.num_rows, s, np.int64)))
            for s in range(n_salts)
        ]
        return pa.concat_tables([cold, *reps])

    ls = left.map_batches(salt_left, batch_format="pyarrow")
    rs = right.map_batches(replicate_right, batch_format="pyarrow")
    out = ls.join(
        rs, join_type="inner",
        num_partitions=num_partitions or adaptive_partitions(16),
        on=(left_key, "__salt"), right_on=(right_key, "__salt"),
    )
    return out.drop_columns(["__salt"])


def events_value_by_segment(sf_dir: str) -> rd.Dataset:
    """events ⋈ customer (user_id = c_custkey) rolled up by market
    segment, through :func:`salted_join` — the hot-key probe runs on the
    real fact table (no hot user in the driver data ⇒ plain hash join;
    the planted-hot-key test drives the salted path). The value sum is
    per-row micro-integer (``round(value·10⁶)`` BIGINT) so the mirror is
    hash-exact regardless of float summation order."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as _rd

    from ..util import adaptive_partitions

    events = _rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    cust = _rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    # hot-key set from the snapshot cache (free when the windowed
    # dispatchers already probed events.user_id this process)
    joined = salted_join(
        events, cust, "user_id", "c_custkey",
        probe_hot=hot_keys_parquet(
            f"{sf_dir}/events.parquet", "user_id", HOT_KEY_THRESHOLD_ROWS
        ),
    )

    def partial(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        micro = np.trunc(v * 1e6 + np.copysign(0.5, v)).astype(np.int64)
        pt = pa.table(
            {"c_mktsegment": t.column("c_mktsegment"),
             "ones": pa.array(np.ones(t.num_rows, np.int64)),
             "v": pa.array(micro)}
        )
        g = pt.group_by(["c_mktsegment"]).aggregate([("ones", "sum"), ("v", "sum")])
        return g.rename_columns(["c_mktsegment", "n_events", "sum_value_micro"])

    return (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("c_mktsegment")
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value_micro", alias_name="sum_value_micro"))
    )


EVENTS_VALUE_BY_SEGMENT_SQL = """
SELECT c.c_mktsegment, COUNT(*)::BIGINT AS n_events,
       SUM(CAST(ROUND(e.value * 1000000) AS BIGINT))::BIGINT AS sum_value_micro
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""
