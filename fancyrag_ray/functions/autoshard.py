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


def choose_windowed_path(
    max_rows: int, threshold: int = HOT_KEY_THRESHOLD_ROWS
) -> str:
    """'sharded' iff the densest key exceeds the one-block budget."""
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
) -> rd.Dataset:
    """``relational.asof_join`` with data-driven skew dispatch: probes
    the densest ``by`` key on BOTH sides (either side's hot key lands in
    the same co-partitioned block) and picks the sharded plan only when
    needed."""
    from . import relational, timeshard

    hottest = max(
        max_key_rows(left, by), max_key_rows(right, right_by or by)
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
) -> rd.Dataset:
    """``relational.rolling_window_aggregate`` with skew dispatch."""
    from . import relational, timeshard

    if choose_windowed_path(max_key_rows(ds, by), hot_key_threshold) == "sharded":
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
) -> rd.Dataset:
    """``relational.range_join`` with skew dispatch (both sides probed)."""
    from . import relational, timeshard

    hottest = max(max_key_rows(left, by), max_key_rows(right, right_by or by))
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
) -> rd.Dataset:
    """``analytics.keyed_running_total`` with skew dispatch."""
    from . import analytics, timeshard

    if choose_windowed_path(max_key_rows(ds, by), hot_key_threshold) == "sharded":
        return timeshard.keyed_running_total_timesharded(
            ds, by=by, order=order, value_col=value_col, out_col=out_col,
            shard_seconds=shard_seconds, num_partitions=num_partitions,
        )
    return analytics.keyed_running_total(
        ds, by=by, order=order, value_col=value_col, out_col=out_col,
        num_partitions=num_partitions,
    )
