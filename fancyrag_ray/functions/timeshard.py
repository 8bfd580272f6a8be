"""Hot-key-safe (time-sharded) variants of the windowed-relational family.

The plain operators (``relational.asof_join`` / ``range_join`` /
``rolling_window_aggregate``, ``analytics.keyed_running_total``)
hash-co-partition by the ``by`` key and run one vectorized kernel per
block — correct and fast, but their documented partitioning assumption
is "all rows of one key fit one block". A single pathological key (one
bot user with 10⁹ events) lands whole on one reducer: straggler or OOM.
These variants remove that assumption the same way
``relational.events_sessions_sharded`` does for sessionization: shard
each key's rows by a TIME BUCKET (``floor(t / width)``), replicate the
minimal boundary state between adjacent shards, and merge per-shard
results where needed. Per-block row counts are then bounded by the
densest single (key, bucket) window, not by the hottest key.

Boundary state per operator (the "replication" column of the design):

=====================  ====================================================
asof join              the last (backward) / first (forward) right row of
                       every (key, bucket), forward-/back-filled across
                       buckets so each left shard holds the one carry row
                       its earliest rows may match — O(keys × buckets)
                       summary rows ever shuffle, never the raw right side
rolling window         each row whose trailing ``window`` tail crosses the
                       next bucket start is replicated once into bucket+1
                       as a context-only row (bucket width ≥ window ⇒ one
                       replica max per row)
range join             each interval is replicated into every bucket it
                       overlaps (copies = ⌈length / width⌉); a left row
                       lives in exactly one bucket, so each (row, interval)
                       pair is found exactly once — no output dedup
running total          per-(key, bucket) sums take an exclusive prefix sum
                       per key (O(buckets) rows), and the offsets join/
                       broadcast back onto the locally-cumsummed shards
=====================  ====================================================

All four are semantically identical to the unsharded operators (pinned
in tests/test_timeshard.py, including a planted-hot-key case) and the
``*_sharded`` driver queries registered in ``__ray_entry__`` share the
unsharded queries' SQL oracles verbatim.

Reference parity note: the reference engine has no analogue — its
windowed work is delegated to the database (e.g. session queries in
``src/fancyrag/kg/neo4j_queries.py``); these exist because a 100 TB
corpus makes the hot-key failure mode real.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..util import (
    adaptive_partitions,
    dataset_mean_row_bytes,
    fits_broadcast,
    hash_partitioned_combine,
)

_US = 1_000_000  # timestamp("us") ticks per second


def _bucket(col: pa.ChunkedArray | pa.Array, width_us: int) -> pa.Array:
    """floor(t / width) over a timestamp column — int64 bucket ids
    (floor_divide is correct for pre-epoch times too)."""
    t = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return pa.array(np.floor_divide(t, width_us), pa.int64())


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def asof_join_timesharded(
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
) -> rd.Dataset:
    """``relational.asof_join`` without the one-key-one-block assumption.

    Three phases:
      1. tag + bucket both sides; reduce the right side per block to one
         boundary row per (key, bucket) (the last row by (time, payload)
         for ``backward``, the first for ``forward``) and the left side
         to its distinct (key, bucket) markers;
      2. shuffle ONLY those O(keys × buckets) summary/marker rows by key
         and forward-fill (backward-fill for ``forward``) the boundary
         payload onto each marker — the carry row a left shard needs
         from outside its own bucket;
      3. shuffle left rows + right rows + carry rows by (key, bucket)
         and run the same per-block ``pandas.merge_asof`` kernel as the
         unsharded operator.

    Tie semantics match ``asof_join`` exactly: the boundary row is
    selected under the same (time, payload) sort the per-block merge
    uses, so equal-time ties resolve to the same right row.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction {direction!r}")
    right_on = right_on or on
    right_by = right_by or by
    width_us = shard_seconds * _US

    lsch, rsch = left.schema(), right.schema()
    lcols = list(lsch.names)
    rcols = [c for c in rsch.names if c != right_by and not (c == right_on and c in lcols)]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"payload column collision: {sorted(overlap)}")
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    if ltypes[by] != rtypes[right_by] or ltypes[on] != rtypes[right_on]:
        raise ValueError("by/on dtypes must match across sides")

    tag_schema = pa.schema(
        [
            pa.field("__k", ltypes[by]),
            pa.field("__b", pa.int64()),
            pa.field("__t", ltypes[on]),
            pa.field("__side", pa.int8()),
        ]
        + [pa.field(c, ltypes[c]) for c in lcols]
        + [pa.field(c, rtypes[c]) for c in rcols]
    )

    def _std_left(t: pa.Table) -> pa.Table:
        cols = {
            "__k": t.column(by),
            "__b": _bucket(t.column(on), width_us),
            "__t": t.column(on),
            "__side": pa.array([0] * len(t), pa.int8()),
        }
        for c in lcols:
            cols[c] = t.column(c)
        for c in rcols:
            cols[c] = pa.nulls(len(t), rtypes[c])
        return pa.table(cols, schema=tag_schema)

    def _std_right(t: pa.Table) -> pa.Table:
        cols = {
            "__k": t.column(right_by),
            "__b": _bucket(t.column(right_on), width_us),
            "__t": t.column(right_on),
            "__side": pa.array([1] * len(t), pa.int8()),
        }
        for c in lcols:
            cols[c] = pa.nulls(len(t), ltypes[c])
        for c in rcols:
            cols[c] = t.column(c)
        return pa.table(cols, schema=tag_schema)

    tagged_left = left.map_batches(_std_left, batch_format="pyarrow").materialize()
    tagged_right = right.map_batches(_std_right, batch_format="pyarrow").materialize()

    # -- phase 1: per-block boundary partials (tiny vs the raw sides) ------
    sum_schema = pa.schema(
        [
            pa.field("__k", ltypes[by]),
            pa.field("__b", pa.int64()),
            pa.field("__f", pa.int8()),  # 0 = left marker, 1 = right summary
            pa.field("__t", ltypes[on]),
        ]
        + [pa.field(c, rtypes[c]) for c in rcols]
    )
    last = direction == "backward"

    def _right_boundary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return sum_schema.empty_table()
        df = t.to_pandas()
        df = df.sort_values(["__k", "__b", "__t", *rcols], kind="mergesort")
        g = df.groupby(["__k", "__b"], sort=False)
        b = (g.tail(1) if last else g.head(1)).assign(__f=np.int8(1))
        arrays = [
            pa.Array.from_pandas(b[c], type=sum_schema.field(c).type) for c in sum_schema.names
        ]
        return pa.Table.from_arrays(arrays, schema=sum_schema)

    def _left_markers(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return sum_schema.empty_table()
        kb = (
            pa.table({"__k": t.column("__k"), "__b": t.column("__b")})
            .group_by(["__k", "__b"])
            .aggregate([])
        )
        cols = {
            "__k": kb.column("__k"),
            "__b": kb.column("__b"),
            "__f": pa.array([0] * len(kb), pa.int8()),
            "__t": pa.nulls(len(kb), ltypes[on]),
        }
        for c in rcols:
            cols[c] = pa.nulls(len(kb), rtypes[c])
        return pa.table(cols, schema=sum_schema)

    partials = tagged_right.map_batches(
        _right_boundary, batch_format="pyarrow", batch_size=None
    ).union(tagged_left.map_batches(_left_markers, batch_format="pyarrow", batch_size=None))

    # -- phase 2: fill carries per key over the bucket sequence ------------
    carry_schema = pa.schema(
        [
            pa.field("__k", ltypes[by]),
            pa.field("__b", pa.int64()),
            pa.field("__t", ltypes[on]),
            pa.field("__side", pa.int8()),
        ]
        + [pa.field(c, ltypes[c]) for c in lcols]
        + [pa.field(c, rtypes[c]) for c in rcols]
    )

    def _fill(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return carry_schema.empty_table()
        df = t.to_pandas()
        # backward: markers (__f 0) sort BEFORE same-bucket summaries so
        # ffill reaches them only from strictly earlier buckets; forward:
        # flip the flag so bfill skips the marker's own bucket likewise
        # (__t, *rcols) in the sort: two blocks' partials can tie on time,
        # and the fill must pick the same row the per-block merge's
        # (time, payload) tie-break would
        if last:
            df = df.sort_values(["__k", "__b", "__f", "__t", *rcols], kind="mergesort")
            filled = df.groupby("__k", sort=False)[["__t", *rcols]].ffill()
        else:
            df = df.assign(__f=np.int8(1) - df["__f"])
            df = df.sort_values(["__k", "__b", "__f", "__t", *rcols], kind="mergesort")
            filled = df.groupby("__k", sort=False)[["__t", *rcols]].bfill()
            df["__f"] = np.int8(1) - df["__f"]
        df[["__t", *rcols]] = filled
        carries = df[(df["__f"] == 0) & df["__t"].notna()]
        # markers for one (key, bucket) can arrive from several left
        # blocks; their fills are identical, keep one carry each
        carries = carries.drop_duplicates(subset=["__k", "__b"])
        if not len(carries):
            return carry_schema.empty_table()
        cols = {}
        for name in carry_schema.names:
            if name == "__side":
                cols[name] = pa.array(np.full(len(carries), 1, np.int8()), pa.int8())
            elif name in carries.columns:
                cols[name] = pa.Array.from_pandas(
                    carries[name], type=carry_schema.field(name).type
                )
            else:  # left payload columns: null on a right-side carry row
                cols[name] = pa.nulls(len(carries), carry_schema.field(name).type)
        return pa.table(cols, schema=carry_schema)

    carries = hash_partitioned_combine(partials, ["__k"], _fill, num_partitions)

    # -- phase 3: the unsharded per-block merge, now per (key, bucket) -----
    def _project(t: pa.Table) -> pa.Table:
        return t.select(carry_schema.names)

    union = tagged_left.map_batches(_project, batch_format="pyarrow").union(
        tagged_right.map_batches(_project, batch_format="pyarrow"), carries
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
        r = r.assign(__m=np.int8(1))
        merged = pd.merge_asof(
            l, r, on="__t", by="__k", direction=direction, allow_exact_matches=True
        )
        if how == "inner":
            merged = merged[merged["__m"].notna()]
        arrays = [
            pa.Array.from_pandas(merged[c], type=out_schema.field(c).type)
            for c in out_schema.names
        ]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return hash_partitioned_combine(union, ["__k", "__b"], _merge, num_partitions)


# ---------------------------------------------------------------------------
# rolling window
# ---------------------------------------------------------------------------


def rolling_window_aggregate_timesharded(
    ds: rd.Dataset,
    on: str,
    by: str,
    value_col: str,
    window_seconds: int,
    out_sum: str = "win_sum",
    out_n: str = "win_n",
    shard_seconds: int | None = None,
    num_partitions: int = 16,
) -> rd.Dataset:
    """``relational.rolling_window_aggregate`` sharded by time bucket.

    Bucket width is ``max(shard_seconds, window_seconds)`` so a row's
    trailing window spans at most its own bucket and the previous one;
    rows in the last ``window`` of a bucket are replicated ONCE into the
    next bucket as context-only rows — they contribute to sums there but
    emit no output row. Replication factor ≤ window / width.
    """
    width_s = max(shard_seconds or 4 * window_seconds, window_seconds)
    width_us, window_us = width_s * _US, window_seconds * _US

    sch = ds.schema()
    out_schema = pa.schema(
        [pa.field(n, t) for n, t in zip(sch.names, sch.types)]
        + [pa.field(out_sum, pa.int64()), pa.field(out_n, pa.int64())]
    )

    def _shard(t: pa.Table) -> pa.Table:
        tt = t.column(on).cast(pa.int64()).to_numpy(zero_copy_only=False)
        b = np.floor_divide(tt, width_us)
        base = t.append_column("__b", pa.array(b, pa.int64())).append_column(
            "__ctx", pa.array(np.zeros(len(t), np.int8()), pa.int8())
        )
        # tail rows whose window crosses into bucket+1
        tail = tt - b * width_us >= width_us - window_us
        if not tail.any():
            return base
        rep = t.filter(pa.array(tail))
        rep = rep.append_column("__b", pa.array(b[tail] + 1, pa.int64())).append_column(
            "__ctx", pa.array(np.ones(int(tail.sum()), np.int8()), pa.int8())
        )
        return pa.concat_tables([base, rep])

    def _roll(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        # every grouping includes __b: a block may hold MANY (key, bucket)
        # shards of the same key, and an original row plus its next-bucket
        # replica share (key, time) — only the shard id separates them
        g = (
            df.groupby([by, "__b", on], sort=True)[value_col]
            .agg(["sum", "size"])
            .reset_index()
        )
        # groupby().rolling() returns groups in the grouper's INTERNAL
        # order (observed ≠ appearance order for composite keys), so the
        # result must be joined back BY KEY — positional assignment onto
        # g silently scrambles rows; (by, __b, on) is unique in g, and
        # the on-column rides through as a result-index level
        r = (
            g.groupby([by, "__b"], sort=False)
            .rolling(pd.Timedelta(seconds=window_seconds), on=on, closed="both")[["sum", "size"]]
            .sum()
            .reset_index()
        )
        r = r[[by, "__b", on, "sum", "size"]].rename(columns={"sum": out_sum, "size": out_n})
        r[out_sum] = r[out_sum].astype("int64")
        r[out_n] = r[out_n].astype("int64")
        real = df[df["__ctx"] == 0]
        merged = real.merge(r, on=[by, "__b", on], how="left")
        arrays = [
            pa.Array.from_pandas(merged[c], type=out_schema.field(c).type)
            for c in out_schema.names
        ]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    return hash_partitioned_combine(
        ds.map_batches(_shard, batch_format="pyarrow"), [by, "__b"], _roll, num_partitions
    )


# ---------------------------------------------------------------------------
# range join
# ---------------------------------------------------------------------------


def range_join_timesharded(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    by: str,
    lower: str,
    upper: str,
    right_by: str | None = None,
    shard_seconds: int = 86_400,
    num_partitions: int = 16,
) -> rd.Dataset:
    """``relational.range_join`` sharded by time bucket: a left row lives
    in exactly one bucket; each right interval is replicated into every
    bucket it overlaps (⌈length / width⌉ copies), so every (row,
    interval) containment pair co-locates exactly once — no dedup. The
    per-block matcher is the unsharded searchsorted/expand kernel."""
    right_by = right_by or by
    width_us = shard_seconds * _US

    lsch, rsch = left.schema(), right.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))

    def _left_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _bucket(t.column(on), width_us))

    def _right_expand(t: pa.Table) -> pa.Table:
        lo = t.column(lower).cast(pa.int64()).to_numpy(zero_copy_only=False)
        hi = t.column(upper).cast(pa.int64()).to_numpy(zero_copy_only=False)
        b0 = np.floor_divide(lo, width_us)
        b1 = np.floor_divide(hi, width_us)
        counts = (b1 - b0 + 1).astype(np.int64)
        total = int(counts.sum())
        idx = np.repeat(np.arange(len(t)), counts)
        offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        buckets = b0[idx] + offs
        rep = t.take(pa.array(idx))
        return rep.append_column("__b", pa.array(buckets, pa.int64()))

    lb = left.map_batches(_left_bucket, batch_format="pyarrow")
    rb = right.map_batches(_right_expand, batch_format="pyarrow")
    # the unsharded kernel co-partitions by its `by` key — handing it a
    # composite (key, bucket) co-partition is exactly the sharding: wrap
    # __b into the partition via a composite key column on both sides
    joined = _composite_range_match(
        lb, rb, on=on, by=by, lower=lower, upper=upper, right_by=right_by,
        num_partitions=num_partitions,
        lcols=list(lsch.names), rcols=[c for c in rsch.names if c != right_by],
        ltypes=ltypes, rtypes=rtypes,
    )
    return joined


def _composite_range_match(
    lb: rd.Dataset,
    rb: rd.Dataset,
    on: str,
    by: str,
    lower: str,
    upper: str,
    right_by: str,
    num_partitions: int,
    lcols: list[str],
    rcols: list[str],
    ltypes: dict,
    rtypes: dict,
) -> rd.Dataset:
    """Tag-union-partition on (key, bucket) and run the same per-block
    interval matcher as ``relational.range_join._match`` (keyed on the
    original ``by`` inside the block — blocks only ever hold complete
    (key, bucket) shards, so the in-block key segmentation is what
    bounds candidate scans, same as unsharded)."""
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"payload column collision: {sorted(overlap)}")
    if ltypes[by] != rtypes[right_by] or ltypes[on] != rtypes[lower] or ltypes[on] != rtypes[upper]:
        raise ValueError("by/on/bound dtypes must match across sides")

    tag_schema = pa.schema(
        [
            pa.field("__k", ltypes[by]),
            pa.field("__b", pa.int64()),
            pa.field("__side", pa.int8()),
        ]
        + [pa.field(c, ltypes[c]) for c in lcols]
        + [pa.field(c, rtypes[c]) for c in rcols]
    )

    def _std_left(t: pa.Table) -> pa.Table:
        cols = {
            "__k": t.column(by),
            "__b": t.column("__b"),
            "__side": pa.array([0] * len(t), pa.int8()),
        }
        for c in lcols:
            cols[c] = t.column(c)
        for c in rcols:
            cols[c] = pa.nulls(len(t), rtypes[c])
        return pa.table(cols, schema=tag_schema)

    def _std_right(t: pa.Table) -> pa.Table:
        cols = {
            "__k": t.column(right_by),
            "__b": t.column("__b"),
            "__side": pa.array([1] * len(t), pa.int8()),
        }
        for c in lcols:
            cols[c] = pa.nulls(len(t), ltypes[c])
        for c in rcols:
            cols[c] = t.column(c)
        return pa.table(cols, schema=tag_schema)

    tagged = lb.map_batches(_std_left, batch_format="pyarrow").union(
        rb.map_batches(_std_right, batch_format="pyarrow")
    )
    out_schema = pa.schema(
        [pa.field(c, ltypes[c]) for c in lcols] + [pa.field(c, rtypes[c]) for c in rcols]
    )

    from .relational import interval_match_block

    def _match(t: pa.Table) -> pa.Table:
        # segment by (key, bucket): a block can hold several buckets of
        # one key, each with its own copy of a spanning interval
        return interval_match_block(
            t, on, lower, upper, lcols, rcols, out_schema, seg_cols=["__k", "__b"]
        )

    return hash_partitioned_combine(tagged, ["__k", "__b"], _match, num_partitions)


# ---------------------------------------------------------------------------
# keyed running total
# ---------------------------------------------------------------------------


def keyed_running_total_timesharded(
    ds: rd.Dataset,
    by: str,
    order: list[str],
    value_col: str,
    out_col: str = "running_cents",
    shard_seconds: int = 86_400,
    num_partitions: int = 16,
) -> rd.Dataset:
    """``analytics.keyed_running_total`` sharded by time bucket: local
    cumsums per (key, bucket) shard, then an exclusive per-key prefix sum
    over the O(keys × buckets) shard totals provides each shard's
    carry-in offset (broadcast under the byte budget, hash-joined
    above it). ``order[0]`` must be the time column the buckets derive
    from; the bucket is a pure function of it, so equal-time tie groups
    never straddle a boundary."""
    from ..util import to_cents

    width_us = shard_seconds * _US
    time_col = order[0]

    def _prep(t: pa.Table) -> pa.Table:
        cents = pa.array(to_cents(t.column(value_col).to_numpy(zero_copy_only=False)))
        return (
            t.drop_columns([value_col])
            .append_column("__c", cents)
            .append_column("__b", _bucket(t.column(time_col), width_us))
        )

    prepped = ds.map_batches(_prep, batch_format="pyarrow").materialize()
    n = prepped.count()
    parts = adaptive_partitions(num_partitions, n_rows=n)

    # phase 1: local cumsum per (key, bucket) shard
    local_names = [c for c in prepped.schema().names if c != "__c"] + ["__local"]

    def _local(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values([by, "__b", *order], kind="mergesort")
        df["__local"] = df.groupby([by, "__b"], sort=False)["__c"].cumsum()
        return pa.Table.from_pandas(df.drop(columns=["__c"]), preserve_index=False)

    local = hash_partitioned_combine(prepped, [by, "__b"], _local, parts).materialize()

    # phase 2: exclusive prefix of shard totals per key (summary rows only)
    def _shard_sums(t: pa.Table) -> pa.Table:
        g = pa.table(
            {by: t.column(by), "__b": t.column("__b"), "__c": t.column("__c")}
        ).group_by([by, "__b"]).aggregate([("__c", "sum")])
        return g.rename_columns([by, "__b", "__sum"])

    def _exclusive_prefix(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.groupby([by, "__b"], as_index=False)["__sum"].sum()
        df = df.sort_values([by, "__b"], kind="mergesort")
        cum = df.groupby(by, sort=False)["__sum"].cumsum()
        df["__off"] = (cum - df["__sum"]).astype("int64")
        return pa.Table.from_pandas(df[[by, "__b", "__off"]], preserve_index=False)

    offsets = hash_partitioned_combine(
        prepped.map_batches(_shard_sums, batch_format="pyarrow", batch_size=None),
        [by],
        _exclusive_prefix,
        num_partitions,
    ).materialize()
    n_off = offsets.count()

    out_cols = [c for c in local_names if c not in ("__b", "__local")] + [out_col]

    if fits_broadcast(n_off, dataset_mean_row_bytes(offsets, n_off) + 8.0):
        import ray

        off_df = pd.concat(
            [b.to_pandas() for b in offsets.iter_batches(batch_format="pyarrow")],
            ignore_index=True,
        )
        off_ref = ray.put(off_df)

        def _apply(t: pa.Table) -> pa.Table:
            df = t.to_pandas().merge(ray.get(off_ref), on=[by, "__b"], how="left")
            df[out_col] = (df["__local"] + df["__off"].fillna(0)).astype("int64")
            return pa.Table.from_pandas(df[out_cols], preserve_index=False)

        return local.map_batches(_apply, batch_format="pyarrow")

    joined = local.join(offsets, join_type="left_outer", num_partitions=parts, on=(by, "__b"))

    def _apply_joined(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df[out_col] = (df["__local"] + df["__off"].fillna(0)).astype("int64")
        return pa.Table.from_pandas(df[out_cols], preserve_index=False)

    return joined.map_batches(_apply_joined, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# driver queries — same SQL oracles as the unsharded family
# ---------------------------------------------------------------------------


def events_last_order_sharded(sf_dir: str) -> rd.Dataset:
    """``events_last_order`` through the time-sharded as-of join (1-week
    buckets split both the 30-day event stream and the multi-year order
    history); shares ``EVENTS_LAST_ORDER_SQL``."""
    from .relational import _read

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"])

    def _pre(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_custkey", "o_orderdate"]).aggregate([("o_orderkey", "max")])
        g = g.rename_columns(["o_custkey", "o_orderdate", "o_orderkey"])
        return g.set_column(
            g.schema.get_field_index("o_orderdate"),
            "o_orderdate",
            g.column("o_orderdate").cast(pa.timestamp("us")),
        )

    reduced = orders.map_batches(_pre, batch_format="pyarrow").materialize()
    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    return asof_join_timesharded(
        events,
        reduced,
        on="ts",
        by="user_id",
        right_on="o_orderdate",
        right_by="o_custkey",
        shard_seconds=7 * 86_400,
        num_partitions=adaptive_partitions(16, n_rows=n_events),
    )


def events_rolling_hour_sharded(sf_dir: str) -> rd.Dataset:
    """``events_rolling_hour`` through the time-sharded rolling window
    (6-hour buckets, 1-hour boundary replication); shares
    ``EVENTS_ROLLING_HOUR_SQL``."""
    from ..util import to_cents
    from .relational import _read

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def _cents(t: pa.Table) -> pa.Table:
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
    return rolling_window_aggregate_timesharded(
        ds.map_batches(_cents, batch_format="pyarrow"),
        on="ts",
        by="user_id",
        value_col="value_cents",
        window_seconds=3600,
        out_sum="win_sum_cents",
        shard_seconds=6 * 3600,
        num_partitions=adaptive_partitions(16, n_rows=n_events),
    ).select_columns(["event_id", "user_id", "ts", "win_sum_cents", "win_n"])


def events_session_attribution_sharded(sf_dir: str) -> rd.Dataset:
    """``events_session_attribution`` through the time-sharded range join
    (1-day buckets; session intervals replicate into each day they
    touch); shares ``EVENTS_SESSION_ATTRIBUTION_SQL``."""
    from .relational import _read, events_sessions_sharded

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    sessions = events_sessions_sharded(sf_dir).select_columns(
        ["user_id", "session_id", "t_start", "t_end"]
    )

    def _recast(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s_user": t.column("user_id").cast(pa.int64()),
                "session_id": t.column("session_id"),
                "t_start": t.column("t_start").cast(pa.timestamp("us")),
                "t_end": t.column("t_end").cast(pa.timestamp("us")),
            }
        )

    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    return range_join_timesharded(
        events,
        sessions.map_batches(_recast, batch_format="pyarrow").materialize(),
        on="ts",
        by="user_id",
        lower="t_start",
        upper="t_end",
        right_by="s_user",
        shard_seconds=86_400,
        num_partitions=adaptive_partitions(16, n_rows=n_events),
    ).select_columns(["event_id", "user_id", "ts", "session_id"])


def events_running_value_sharded(sf_dir: str) -> rd.Dataset:
    """``events_running_value`` through the time-sharded running total
    (1-day buckets + carry-in offsets); shares
    ``EVENTS_RUNNING_VALUE_SQL``."""
    from .relational import _read

    n = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    return keyed_running_total_timesharded(
        ds,
        by="user_id",
        order=["ts", "event_id"],
        value_col="value",
        shard_seconds=86_400,
        num_partitions=adaptive_partitions(16, n_rows=n),
    )
