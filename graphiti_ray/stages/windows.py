"""Event-time windowed aggregates over stream-shaped tables (events).

Ray Data is a batch engine; stream semantics are recovered by treating the
input as an ordered, partitioned log (ray_guide "Streaming-shaped
workloads"): partition by key, order by event time within partition.

- ``tumbling_window``  fixed-size buckets: vectorized bucket column +
                       per-batch partial aggregate + small final groupby
                       (combiner pattern — the shuffle carries partials)
- ``sliding_window``   overlapping buckets via explode (size/slide)
- ``session_window``   gap-based sessions per key (sorted_run_map kernel)

Ordering assumption: none for tumbling/sliding (bucket is a pure function
of ts); session windows sort within each key group, so late rows are
handled correctly as long as all rows of a key are present (batch
semantics, T5 in SURVEY §2.7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

US = 1_000_000


def _floor_div(us: pa.Array, div: int) -> pa.Array:
    """Integer division of an int64 Arrow array matching DuckDB ``//``.

    Measured on this DuckDB: ``(-7) // 2 = -3`` — SQL ``//`` TRUNCATES
    toward zero (not floor), same as ``pc.divide`` on int64. A
    floor-division kernel (np.floor_divide) would bucket pre-epoch
    timestamps one day earlier than the oracle. Keeping the name for the
    call sites; the semantic contract is "whatever the oracle's ``//``
    does", pinned by the probe in tests/test_textstats_windows.py."""
    import pyarrow.compute as pc

    return pc.divide(pc.cast(us, pa.int64()), div)


def _bucket_col(batch: pa.Table, ts_col: str, size_s: int, offset_s: int = 0) -> pa.Array:
    import pyarrow.compute as pc

    # normalize unit first: inputs may be timestamp[s]/[ms]/[us]/[ns]
    us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")), pa.int64())
    size_us = size_s * US
    start = pc.multiply(
        _floor_div(pc.subtract(us, offset_s * US), size_us), size_us
    )
    return pc.cast(
        pc.add(pc.cast(start, pa.int64()), offset_s * US), pa.timestamp("us")
    )


def tumbling_window(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    size_s: int = 600,
) -> rd.Dataset:
    """(key, window_start) → n_events, sum/min/max(value).

    Pre-aggregates inside map_batches (one partial row per key×window per
    batch) before the keyed shuffle — the wide step moves partials, not
    events."""

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.append_column("window_start", _bucket_col(batch, ts_col, size_s))
        t = b.group_by([key_col, "window_start"]).aggregate(
            [(value_col, "sum"), (value_col, "min"), (value_col, "max"), ([], "count_all")]
        )
        return t.rename_columns(
            [key_col, "window_start", "p_sum", "p_min", "p_max", "p_n"]
        )

    partials = events.select_columns([key_col, ts_col, value_col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    out = partials.groupby([key_col, "window_start"]).aggregate(
        Sum("p_sum", alias_name="sum_value"),
        Min("p_min", alias_name="min_value"),
        Max("p_max", alias_name="max_value"),
        Sum("p_n", alias_name="n_events"),
    )
    return out


def sliding_window(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    size_s: int = 600,
    slide_s: int = 300,
) -> rd.Dataset:
    """Overlapping windows: each event explodes into size/slide buckets."""
    assert size_s % slide_s == 0, "size must be a multiple of slide"
    n_over = size_s // slide_s

    def explode(batch: pa.Table) -> pa.Table:
        us = (
            batch.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        slide_us = slide_s * US
        last = (us // slide_us) * slide_us  # last slide boundary ≤ ts
        o_k, o_w, o_v = [], [], []
        for i in range(n_over):
            start = last - i * slide_us
            o_k.append(keys)
            o_w.append(start)
            o_v.append(vals)
        return pa.table(
            {
                key_col: pa.array(np.concatenate(o_k)),
                "window_start": pa.array(
                    np.concatenate(o_w), pa.timestamp("us")
                ),
                value_col: pa.array(np.concatenate(o_v)),
            }
        )

    exploded = events.select_columns([key_col, ts_col, value_col]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )
    return exploded.groupby([key_col, "window_start"]).aggregate(
        Count(alias_name="n_events"), Sum(value_col, alias_name="sum_value")
    )


def _session_block(tbl: pa.Table, key_col: str, ts_col: str, gap_s: int) -> pa.Table:
    """Vectorized gaps-and-islands kernel over COMPLETE key runs
    (sorted_run_map contract: rows sorted by (key, ts)): a session break is
    a key change OR a gap > gap_s; session bounds/counts come from the
    break offsets — one Python call per BLOCK, not per key."""
    import pyarrow.compute as pc

    key_type = tbl.schema.field(key_col).type if tbl.num_rows else pa.string()
    if tbl.num_rows == 0:
        return pa.table(
            {
                key_col: pa.array([], key_type),
                "session_start": pa.array([], pa.timestamp("us")),
                "session_end": pa.array([], pa.timestamp("us")),
                "n_events": pa.array([], pa.int64()),
            }
        )
    keys = np.array(tbl.column(key_col).to_pylist(), dtype=object)
    us = pc.cast(
        pc.cast(tbl.column(ts_col), pa.timestamp("us")), pa.int64()
    ).to_numpy(zero_copy_only=False)
    n = len(us)
    new_sess = np.ones(n, dtype=bool)
    if n > 1:
        new_sess[1:] = (keys[1:] != keys[:-1]) | ((us[1:] - us[:-1]) > gap_s * US)
    starts = np.nonzero(new_sess)[0]
    bounds = np.concatenate([starts[1:], [n]])
    return pa.table(
        {
            key_col: pa.array(keys[starts].tolist(), key_type),
            "session_start": pa.array(us[starts], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "session_end": pa.array(us[bounds - 1], pa.int64()).cast(
                pa.timestamp("us")
            ),
            "n_events": pa.array(bounds - starts, pa.int64()),
        }
    )


def session_window(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> rd.Dataset:
    """Gap-based sessions: per key, sorted by ts; a gap > gap_s starts a new
    session. → (key, session_start, session_end, n_events).

    Shape: one range sort on (key, ts), then a vectorized per-block
    gaps-and-islands kernel over complete key runs (``ops.sorted_run_map``)
    — no per-key Python dispatch (the former per-key ``map_groups`` paid
    one Python call per user)."""
    import functools

    from graphiti_ray.stages.ops import sorted_run_map

    return sorted_run_map(
        events.select_columns([key_col, ts_col]),
        key_cols=[key_col],
        order_cols=[ts_col],
        block_fn=functools.partial(
            _session_block, key_col=key_col, ts_col=ts_col, gap_s=gap_s
        ),
    )


def zscore_outliers(
    events: rd.Dataset,
    z: int = 3,
    quant: int = 1000,
    key_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
) -> rd.Dataset:
    """Per-key z-score outlier flagging — the standard telemetry/quality
    screen (|x − μ_key| > z·σ_key) — in EXACT integer arithmetic so the
    SQL twin never touches a float comparison: values quantize to
    ``floor(v·quant)`` and the test becomes

        (n·x − s)² > z² · (n·ssq − s²)        (all int64)

    which is |x − s/n| > z·σ with every division cleared. Two-pass
    shape: per-block partial (n, Σx, Σx²) combiner → one keyed reduce →
    one hash join back onto the events — the canonical
    stats-then-annotate pattern. An int64-range guard raises rather than
    silently overflowing (quantized |x|·n must stay under ~3·10⁹·z⁻¹).

    Output: (event_id, user_id, v_q, dev2, bound, is_outlier).
    """
    import numpy as np
    import pyarrow.compute as pc

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    def quantize(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        vq = np.floor(v * quant).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                key_col: batch.column(key_col),
                "v_q": pa.array(vq, pa.int64()),
            }
        )

    ev = events.map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        vq = batch.column("v_q").to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                key_col: batch.column(key_col),
                "n": pa.array(np.ones(len(vq), np.int64), pa.int64()),
                "s": pa.array(vq, pa.int64()),
                "ssq": pa.array(vq * vq, pa.int64()),
            }
        )
        return t.group_by([key_col]).aggregate(
            [("n", "sum"), ("s", "sum"), ("ssq", "sum")]
        ).rename_columns([key_col, "n", "s", "ssq"])

    stats = (
        ev.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .sum(["n", "s", "ssq"])
        .map_batches(
            lambda t: t.rename_columns([key_col, "n", "s", "ssq"]),
            batch_format="pyarrow",
        )
    )

    joined = safe_join(
        ev,
        stats,
        join_type="inner",
        num_partitions=default_join_partitions(),
        on=(key_col,),
    )

    def flag(batch: pa.Table) -> pa.Table:
        x = batch.column("v_q").to_numpy(zero_copy_only=False)
        n = batch.column("n").to_numpy(zero_copy_only=False)
        s = batch.column("s").to_numpy(zero_copy_only=False)
        ssq = batch.column("ssq").to_numpy(zero_copy_only=False)
        if len(x) and int((n * np.abs(x)).max()) > 3_000_000_000 // max(z, 1):
            raise ValueError(
                "zscore_outliers: quantized magnitudes exceed the int64-safe "
                "bound — lower `quant` or pre-scale the value column"
            )
        d = n * x - s
        dev2 = d * d
        bound = (z * z) * (n * ssq - s * s)
        return pa.table(
            {
                id_col: batch.column(id_col),
                key_col: batch.column(key_col),
                "v_q": batch.column("v_q"),
                "dev2": pa.array(dev2, pa.int64()),
                "bound": pa.array(bound, pa.int64()),
                "is_outlier": pa.array(dev2 > bound, pa.bool_()),
            }
        )

    return joined.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


def funnel_conversion(
    events: rd.Dataset,
    step_a: str = "signup",
    step_b: str = "purchase",
    within_s: int = 600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> rd.Dataset:
    """Two-step funnel: per key, the FIRST ``step_a`` event and the first
    ``step_b`` at-or-after it within ``within_s`` seconds — the standard
    product-analytics conversion kernel. Only step rows ride into the
    shuffle (streaming pre-filter), then one range sort on (key, ts) and
    a vectorized gaps-and-islands block kernel over complete key runs
    (``ops.sorted_run_map``) — no per-key dispatch.

    Output: (key, t_a, t_b, converted, delay_us) — one row per key with
    ≥1 ``step_a`` event; t_b/delay_us null when unconverted.
    """
    import functools

    import pyarrow.compute as pc

    from graphiti_ray.stages.ops import sorted_run_map

    def prefilter(batch: pa.Table) -> pa.Table:
        tv = batch.column(type_col)
        keep = pc.or_(pc.equal(tv, step_a), pc.equal(tv, step_b))
        t = batch.filter(keep)
        return t.select([key_col, ts_col, type_col])

    steps = events.map_batches(
        prefilter, batch_format="pyarrow", zero_copy_batch=True
    )
    return sorted_run_map(
        steps,
        key_cols=[key_col],
        order_cols=[ts_col],
        block_fn=functools.partial(
            _funnel_block,
            step_a=step_a,
            step_b=step_b,
            within_s=within_s,
            key_col=key_col,
            ts_col=ts_col,
            type_col=type_col,
        ),
    )


def _funnel_block(
    tbl: pa.Table,
    step_a: str,
    step_b: str,
    within_s: int,
    key_col: str,
    ts_col: str,
    type_col: str,
) -> pa.Table:
    import numpy as np

    key_type = tbl.schema.field(key_col).type
    empty = pa.table(
        {
            key_col: pa.array([], key_type),
            "t_a": pa.array([], pa.timestamp("us")),
            "t_b": pa.array([], pa.timestamp("us")),
            "converted": pa.array([], pa.bool_()),
            "delay_us": pa.array([], pa.int64()),
        }
    )
    n = tbl.num_rows
    if n == 0:
        return empty
    from graphiti_ray.stages.ops import _table_run_starts

    starts = _table_run_starts(tbl, [key_col])[:-1]
    run_id = np.zeros(n, dtype=np.int64)
    run_id[starts] = 1
    run_id = np.cumsum(run_id) - 1
    n_runs = len(starts)
    us = tbl.column(ts_col).cast(pa.timestamp("us")).to_numpy(
        zero_copy_only=False
    ).astype("datetime64[us]").astype(np.int64)
    types = np.asarray(tbl.column(type_col).to_pylist(), dtype=object)
    BIG = np.iinfo(np.int64).max
    # first step_a timestamp per run (rows are ts-sorted within a run)
    t_a = np.full(n_runs, BIG, dtype=np.int64)
    mask_a = types == step_a
    np.minimum.at(t_a, run_id[mask_a], us[mask_a])
    has_a = t_a != BIG
    # first step_b at-or-after t_a within the window, per run
    t_b = np.full(n_runs, BIG, dtype=np.int64)
    mask_b = (types == step_b) & (us >= t_a[run_id]) & (
        us - np.where(t_a[run_id] == BIG, 0, t_a[run_id]) <= within_s * 1_000_000
    )
    np.minimum.at(t_b, run_id[mask_b], us[mask_b])
    keep = np.nonzero(has_a)[0]
    conv = t_b[keep] != BIG
    ta_k = t_a[keep]
    tb_k = np.where(conv, t_b[keep], 0)
    key_idx = pa.array(starts[keep], pa.int64())
    return pa.table(
        {
            key_col: tbl.column(key_col).take(key_idx),
            "t_a": pa.array(ta_k, pa.int64()).cast(pa.timestamp("us")),
            "t_b": pa.Array.from_pandas(
                pd.Series(np.where(conv, tb_k, None), dtype="object"),
                type=pa.int64(),
            ).cast(pa.timestamp("us")),
            "converted": pa.array(conv, pa.bool_()),
            "delay_us": pa.Array.from_pandas(
                pd.Series(np.where(conv, tb_k - ta_k, None), dtype="object"),
                type=pa.int64(),
            ),
        }
    )


def fixed_histogram(
    ds: rd.Dataset,
    value_col: str,
    lo: int,
    hi: int,
    n_bins: int,
    by: str | None = None,
) -> rd.Dataset:
    """Equi-width histogram with EXACT integer binning — the profiling
    staple. bin = (v − lo)·n_bins // (hi − lo) for integer v, clamped to
    −1 (underflow) / n_bins (overflow), so the SQL twin is pure integer
    division with no float boundary cases. Per-batch ``np.unique`` count
    partials → one keyed sum over ≤ |groups|·(n_bins+2) rows — the
    combiner-then-tiny-reduce shape, never a row-per-value shuffle.

    Output: (bin, n) or (by, bin, n)."""
    import numpy as np

    from ray.data.aggregate import Sum

    width = hi - lo
    assert width > 0 and n_bins > 0

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = (v - lo) * n_bins // width
        b = np.where(v < lo, -1, np.where(v >= hi, n_bins, b)).astype(np.int64)
        if by is None:
            ub, cnt = np.unique(b, return_counts=True)
            return pa.table(
                {"bin": pa.array(ub, pa.int64()), "p_n": pa.array(cnt, pa.int64())}
            )
        g = np.asarray(batch.column(by).to_pylist(), dtype=object)
        ug, gidx = np.unique(g, return_inverse=True)
        key = gidx * (n_bins + 2) + (b + 1)
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                by: pa.array(ug[uk // (n_bins + 2)].tolist(), pa.string()),
                "bin": pa.array(uk % (n_bins + 2) - 1, pa.int64()),
                "p_n": pa.array(cnt, pa.int64()),
            }
        )

    keys = ["bin"] if by is None else [by, "bin"]
    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(keys if len(keys) > 1 else keys[0])
        .aggregate(Sum("p_n", alias_name="n"))
    )


def rolling_sum(
    events: rd.Dataset,
    window_rows: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value_cents",
) -> rd.Dataset:
    """Per-key rolling sum over the last ``window_rows`` rows in time
    order (``ROWS window_rows-1 PRECEDING``) — the moving-aggregate
    kernel. One range sort on (key, ts, id), then each complete key run
    computes its rolling sums with two prefix-sum subtractions — no
    per-key dispatch, no self-join. Integer value column in, exact
    integer sums out.

    Output: (id, key, ts, roll_sum)."""
    import functools

    from graphiti_ray.stages.ops import sorted_run_map

    def kernel(tbl: pa.Table, w: int) -> pa.Table:
        import numpy as np

        from graphiti_ray.stages.ops import _table_run_starts

        empty = pa.table(
            {
                id_col: pa.array([], tbl.schema.field(id_col).type
                                 if tbl.num_rows else pa.int64()),
                key_col: pa.array([], tbl.schema.field(key_col).type
                                  if tbl.num_rows else pa.int64()),
                ts_col: pa.array([], pa.timestamp("us")),
                "roll_sum": pa.array([], pa.int64()),
            }
        )
        n = tbl.num_rows
        if n == 0:
            return empty
        v = tbl.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        starts = _table_run_starts(tbl, [key_col])[:-1]
        run_id = np.zeros(n, dtype=np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        pos = np.arange(n) - starts[run_id]  # 0-based offset within run
        c = np.cumsum(v)
        run_base = np.where(starts > 0, c[starts - 1], 0)[run_id]
        # rolling = prefix[i] − prefix[i−w], clamped to the run start
        roll = c - np.where(pos >= w, c[np.arange(n) - w], run_base)
        return pa.table(
            {
                id_col: tbl.column(id_col),
                key_col: tbl.column(key_col),
                ts_col: tbl.column(ts_col).cast(pa.timestamp("us")),
                "roll_sum": pa.array(roll, pa.int64()),
            }
        )

    return sorted_run_map(
        events,
        key_cols=[key_col],
        order_cols=[ts_col, id_col],
        block_fn=functools.partial(kernel, w=window_rows),
    )


def mad_outliers(
    events: rd.Dataset,
    z: int = 3,
    quant: int = 1000,
    key_col: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
) -> rd.Dataset:
    """Median-absolute-deviation outlier screen — the robust twin of
    ``zscore_outliers`` (immune to the outliers inflating their own
    threshold). Entirely on the integer lattice: v_q = floor(v·quant),
    med = exact 'lower' median of v_q per key, absdev = |v_q − med|,
    MAD = exact 'lower' median of absdev, flag absdev > z·MAD — every
    quantity int64, no float comparison anywhere. Built from two
    ``ops.group_quantiles`` passes (range sort + complete-run kernel)
    and two keyed joins.

    Output: (id, key, v_q, med, absdev, mad, is_outlier)."""
    import numpy as np

    from graphiti_ray.stages.link import default_join_partitions, safe_join
    from graphiti_ray.stages.ops import group_quantiles

    def quantize(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch.column(id_col),
                key_col: batch.column(key_col),
                "v_q": pa.array(np.floor(v * quant).astype(np.int64), pa.int64()),
            }
        )

    ev = events.map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True)
    parts = default_join_partitions()
    med = (
        group_quantiles(ev.select_columns([key_col, "v_q"]), [key_col], "v_q", [0.5])
        .drop_columns(["q"])
        .map_batches(
            lambda t: t.rename_columns([key_col, "med"]), batch_format="pyarrow"
        )
    )
    withmed = safe_join(ev, med, join_type="inner", num_partitions=parts, on=(key_col,))

    def add_absdev(batch: pa.Table) -> pa.Table:
        vq = batch.column("v_q").to_numpy(zero_copy_only=False)
        m = batch.column("med").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "absdev", pa.array(np.abs(vq - m), pa.int64())
        )

    withdev = withmed.map_batches(
        add_absdev, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    mad = (
        group_quantiles(
            withdev.select_columns([key_col, "absdev"]), [key_col], "absdev", [0.5]
        )
        .drop_columns(["q"])
        .map_batches(
            lambda t: t.rename_columns([key_col, "mad"]), batch_format="pyarrow"
        )
    )
    joined = safe_join(withdev, mad, join_type="inner", num_partitions=parts, on=(key_col,))

    def flag(batch: pa.Table) -> pa.Table:
        a = batch.column("absdev").to_numpy(zero_copy_only=False)
        m = batch.column("mad").to_numpy(zero_copy_only=False)
        return batch.append_column("is_outlier", pa.array(a > z * m, pa.bool_()))

    return joined.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


MAX_INTERVAL_BUCKETS = 1024  # per-interval explosion guard


def interval_overlap_pairs(
    intervals: rd.Dataset,
    key_col: str = "user_id",
    start_col: str = "session_start",
    end_col: str = "session_end",
    bucket_s: int = 21600,
) -> rd.Dataset:
    """Interval self-join: all cross-key pairs of intervals that overlap
    in time — the range-join operator (distinct from as-of). Candidate
    generation explodes each interval into its covered ``bucket_s``
    tumbling buckets (guarded at MAX_INTERVAL_BUCKETS per interval);
    same-bucket rows meet in one ``sorted_run_map`` pairwise kernel. A
    pair is emitted ONLY in bucket max(start_bucket_a, start_bucket_b)
    — overlapping intervals both cover that bucket, and floor is
    monotone, so each true pair is emitted exactly once with NO distinct
    shuffle (the MinHash first-band trick, applied to time).

    Output: (a_key, a_start, b_key, b_start, overlap_us) with
    (a_key, a_start) < (b_key, b_start) lexicographically and
    a_key ≠ b_key."""
    import functools

    from graphiti_ray.stages.ops import sorted_run_map

    B = bucket_s * US

    def explode(batch: pa.Table) -> pa.Table:
        s = (
            batch.column(start_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        e = (
            batch.column(end_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        sb = s // B
        eb = e // B
        nb = eb - sb + 1
        if len(nb) and nb.max() > MAX_INTERVAL_BUCKETS:
            raise ValueError(
                "interval_overlap_pairs: an interval covers more than "
                f"{MAX_INTERVAL_BUCKETS} buckets — raise bucket_s"
            )
        idx = np.repeat(np.arange(len(s)), nb)
        off = np.arange(int(nb.sum())) - np.repeat(np.cumsum(nb) - nb, nb)
        return pa.table(
            {
                "bucket": pa.array(sb[idx] + off, pa.int64()),
                "k": pa.array(keys[idx]),
                "s_us": pa.array(s[idx], pa.int64()),
                "e_us": pa.array(e[idx], pa.int64()),
                "sb": pa.array(sb[idx], pa.int64()),
            }
        )

    exploded = intervals.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )

    def pair_kernel(tbl: pa.Table) -> pa.Table:
        kt = tbl.schema.field("k").type if tbl.num_rows else pa.int64()
        empty = pa.table(
            {
                "a_key": pa.array([], kt),
                "a_start": pa.array([], pa.timestamp("us")),
                "b_key": pa.array([], kt),
                "b_start": pa.array([], pa.timestamp("us")),
                "overlap_us": pa.array([], pa.int64()),
            }
        )
        n = tbl.num_rows
        if n < 2:
            return empty
        from graphiti_ray.stages.dedup import _run_pair_indices, _run_starts

        bucket = tbl.column("bucket").to_numpy(zero_copy_only=False)
        k = tbl.column("k").to_numpy(zero_copy_only=False)
        s = tbl.column("s_us").to_numpy(zero_copy_only=False)
        e = tbl.column("e_us").to_numpy(zero_copy_only=False)
        sb = tbl.column("sb").to_numpy(zero_copy_only=False)
        px, py = _run_pair_indices(_run_starts(bucket), cap=1 << 30)
        if len(px) == 0:
            return empty
        overlap = (s[px] <= e[py]) & (s[py] <= e[px])
        first = np.maximum(sb[px], sb[py]) == bucket[px]
        diff_key = k[px] != k[py]
        keep = overlap & first & diff_key
        px, py = px[keep], py[keep]
        if len(px) == 0:
            return empty
        # canonical orientation: (key, start) lexicographic
        swap = (k[px] > k[py]) | ((k[px] == k[py]) & (s[px] > s[py]))
        ax = np.where(swap, py, px)
        bx = np.where(swap, px, py)
        ov = np.minimum(e[ax], e[bx]) - np.maximum(s[ax], s[bx])
        return pa.table(
            {
                "a_key": pa.array(k[ax]),
                "a_start": pa.array(s[ax], pa.int64()).cast(pa.timestamp("us")),
                "b_key": pa.array(k[bx]),
                "b_start": pa.array(s[bx], pa.int64()).cast(pa.timestamp("us")),
                "overlap_us": pa.array(ov, pa.int64()),
            }
        )

    return sorted_run_map(
        exploded,
        key_cols=["bucket"],
        order_cols=["k", "s_us"],
        block_fn=pair_kernel,
    )


def transition_counts(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> rd.Dataset:
    """First-order Markov transition counts over per-key event streams:
    (from_type, to_type, n) for consecutive events in (ts, id) order
    within each key — the sequence-statistics primitive behind
    session-flow and anomaly models. One range sort; each complete key
    run contributes its adjacent pairs, pre-counted per block before
    the tiny |types|² keyed reduce."""
    import functools

    from ray.data.aggregate import Sum

    from graphiti_ray.stages.ops import sorted_run_map

    def kernel(tbl: pa.Table) -> pa.Table:
        import pandas as pd_

        from graphiti_ray.stages.ops import _table_run_starts

        empty = pa.table(
            {
                "from_type": pa.array([], pa.string()),
                "to_type": pa.array([], pa.string()),
                "p_n": pa.array([], pa.int64()),
            }
        )
        n = tbl.num_rows
        if n < 2:
            return empty
        starts = _table_run_starts(tbl, [key_col])
        types = tbl.column(type_col).to_pylist()
        ends = np.zeros(n, dtype=bool)
        ends[starts[1:] - 1] = True  # last row of each run has no successor
        frm = [t for t, e in zip(types, ends) if not e]
        nxt = [types[i + 1] for i, e in enumerate(ends) if not e]
        if not frm:
            return empty
        df = pd_.DataFrame({"from_type": frm, "to_type": nxt})
        out = df.groupby(["from_type", "to_type"], sort=False).size().reset_index(
            name="p_n"
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    pairs = sorted_run_map(
        events.select_columns([key_col, ts_col, id_col, type_col]),
        key_cols=[key_col],
        order_cols=[ts_col, id_col],
        block_fn=kernel,
    )
    return pairs.groupby(["from_type", "to_type"]).aggregate(
        Sum("p_n", alias_name="n")
    )


def forward_fill(
    events: rd.Dataset,
    value_col: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    out_col: str = "filled",
) -> rd.Dataset:
    """LOCF (last observation carried forward) per key in (ts, id) order —
    the stateful gap-fill of time-series ETL. One range sort; each
    complete key run forward-fills its nulls with one
    ``np.maximum.accumulate`` over valid-row indices (no Python loop, no
    per-key dispatch). Rows before a key's first observation stay null.

    Output: (id, key, ts, value, filled)."""
    import functools

    from graphiti_ray.stages.ops import sorted_run_map

    def kernel(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from graphiti_ray.stages.ops import _table_run_starts

        n = tbl.num_rows
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    key_col: pa.array([], pa.int64()),
                    ts_col: pa.array([], pa.timestamp("us")),
                    value_col: pa.array([], pa.float64()),
                    out_col: pa.array([], pa.float64()),
                }
            )
        starts = _table_run_starts(tbl, [key_col])[:-1]
        val = tbl.column(value_col)
        valid = pc.is_valid(val).to_numpy(zero_copy_only=False)
        # index of the last valid row at-or-before each position, reset at
        # run starts by seeding them as barriers
        idx = np.where(valid, np.arange(n), -1)
        run_id = np.zeros(n, dtype=np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        # offset per run so accumulate cannot leak across runs: shift
        # indices by run_id·(n+1), accumulate, then undo
        shifted = np.where(valid, idx + run_id * (n + 1), run_id * (n + 1) - 1)
        acc = np.maximum.accumulate(shifted)
        src = acc - run_id * (n + 1)
        has = src >= 0
        take_idx = pa.array(np.where(has, src, 0), pa.int64())
        filled = val.take(take_idx)
        if not has.all():
            filled = pc.if_else(pa.array(has), filled, pa.scalar(None, val.type))
        return pa.table(
            {
                id_col: tbl.column(id_col),
                key_col: tbl.column(key_col),
                ts_col: tbl.column(ts_col).cast(pa.timestamp("us")),
                value_col: val,
                out_col: filled,
            }
        )

    return sorted_run_map(
        events,
        key_cols=[key_col],
        order_cols=[ts_col, id_col],
        block_fn=kernel,
    )


def cohort_retention(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period_s: int = 7 * 86400,
) -> rd.Dataset:
    """Cohort retention counts — the product-analytics staple: keys are
    cohorted by the period of their FIRST event (integer µs division —
    no calendar arithmetic, exact on both sides), and each (cohort,
    offset) cell counts the keys active offset periods later. Shape:
    one keyed min-reduce for first-seen, one hash join back, per-batch
    distinct partials, one small keyed reduce over ≤ periods² cells.

    Output: (cohort, offset, n_active)."""
    from ray.data.aggregate import Min, Sum

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    P = period_s * US

    def to_period(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        us = pc.cast(pc.cast(batch.column(ts_col), pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                key_col: batch.column(key_col),
                "period": _floor_div(us, P),
            }
        )

    periods = events.select_columns([key_col, ts_col]).map_batches(
        to_period, batch_format="pyarrow", zero_copy_batch=True
    )
    first = (
        periods.groupby(key_col)
        .aggregate(Min("period", alias_name="cohort"))
        .materialize()
    )
    joined = safe_join(
        periods,
        first,
        join_type="inner",
        num_partitions=default_join_partitions(),
        on=(key_col,),
    )

    def cell_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table(
            {
                key_col: batch.column(key_col),
                "cohort": batch.column("cohort"),
                "offset": pc.subtract(batch.column("period"), batch.column("cohort")),
            }
        )
        # distinct (key, cohort, offset) per batch BEFORE the reduce
        g = t.group_by([key_col, "cohort", "offset"]).aggregate([([], "count_all")])
        g = g.drop_columns([g.column_names[-1]])
        return g

    cells = (
        joined.map_batches(cell_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "cohort", "offset"])
        .aggregate(Min("cohort", alias_name="_c"))
    )

    def one(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort": batch.column("cohort"),
                "offset": batch.column("offset"),
                "p_n": pa.array(np.ones(batch.num_rows, np.int64), pa.int64()),
            }
        )

    return (
        cells.map_batches(one, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["cohort", "offset"])
        .aggregate(Sum("p_n", alias_name="n_active"))
    )


def scd2_intervals(
    ds: rd.Dataset,
    key: str,
    value: str,
    ts_col: str,
    tiebreak: str,
) -> rd.Dataset:
    """Slowly-changing-dimension (type 2) interval build: collapse each
    key's ordered value sequence into change intervals —
    (key, value, valid_from, valid_to, first ``tiebreak``), where
    ``valid_from`` is the timestamp of the first row of a maximal
    consecutive equal-``value`` run (an "island") and ``valid_to`` is the
    next island's ``valid_from`` (NULL for the key's current value). The
    warehouse dimension-history transform, and the same
    supersede-without-delete temporal semantics as the KG edge sweep
    (stages/temporal.py), applied to a relational stream.

    One global range sort + a vectorized per-block island kernel over
    COMPLETE key runs (``sorted_run_map``), no per-key dispatch. Island
    detection is positional (adjacent-change on (key, value)), so a value
    that recurs later opens a NEW interval, as SCD2 requires. A key whose
    history exceeds ``carry_cap`` rows raises rather than truncating.
    """
    from graphiti_ray.stages.ops import (
        _col_array,
        _rows_equal_at,
        _table_run_starts,
        sorted_run_map,
    )

    def block_fn(t: pa.Table) -> pa.Table:
        starts = _table_run_starts(t, [key, value])
        idx = starts[:-1]  # island start offsets
        k = len(idx)
        if k == 0:
            return pa.table(
                {
                    key: pa.array([], pa.int64()),
                    value: pa.array([], pa.string()),
                    "valid_from": pa.array([], pa.timestamp("us")),
                    "valid_to": pa.array([], pa.timestamp("us")),
                    tiebreak: pa.array([], pa.int64()),
                }
            )
        take = pa.array(idx, pa.int64())
        vf = _col_array(t, ts_col).take(take)
        # valid_to[i] = valid_from[i+1] iff islands i, i+1 share the key
        same = (
            _rows_equal_at(t, [key], idx[:-1], idx[1:])
            if k > 1
            else np.zeros(0, dtype=bool)
        )
        vf_us = vf.cast(pa.int64()).to_numpy(zero_copy_only=False)
        vt_us = np.concatenate([vf_us[1:], [0]])
        null_mask = np.concatenate([~same, [True]])
        vt = pa.array(vt_us, pa.int64(), mask=null_mask).cast(pa.timestamp("us"))
        return pa.table(
            {
                key: _col_array(t, key).take(take),
                value: _col_array(t, value).take(take),
                "valid_from": vf,
                "valid_to": vt,
                tiebreak: _col_array(t, tiebreak).take(take),
            }
        )

    return sorted_run_map(
        ds.select_columns([key, value, ts_col, tiebreak]),
        [key],
        block_fn,
        order_cols=[ts_col, tiebreak],
    )


def grouped_ols(
    events: rd.Dataset,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    quant: int = 1000,
    x_unit_s: int = 3600,
    origin_us: int = 1704067200000000,  # 2024-01-01T00:00:00Z
) -> rd.Dataset:
    """Per-group ordinary-least-squares trend (value vs time) computed as
    a DISTRIBUTED SUFFICIENT-STATISTICS reduce — the canonical way to fit
    per-key linear models over a corpus too large for any single pass to
    hold a group: each block emits partial (n, Σx, Σy, Σxy, Σx²) per key
    (a combiner), one small keyed sum merges them, and the closed form

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    is evaluated on the vocabulary-sized stats table. All arithmetic is
    EXACT on an integer lattice so the DuckDB twin can reproduce it
    bit-for-bit: x quantizes to ``(ts − origin) // x_unit_s`` whole units,
    y to ``floor(value·quant)``, and the emitted ``slope_e6`` is the
    numerator×10⁶ over the denominator with TRUNCATION TOWARD ZERO
    (DuckDB's integer ``//``; Python's floors, so the kernel adjusts).
    The driver sees only one row per key — never the events.

    Reference analogue: graphiti's telemetry/eval summaries fit simple
    trends over episode streams driver-side; here the same statistic is a
    two-shuffle-free Dataset reduce (one combiner pass + one small
    groupby), the shape a 100-TB event log requires.

    Output: (key, n, sum_x, sum_y, num, den, slope_e6) where
    num = n·Σxy − Σx·Σy and den = n·Σx² − (Σx)² are carried exactly so a
    consumer can re-derive the unrounded slope.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = (
            batch.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        x = (ts_us - origin_us) // (x_unit_s * 1_000_000)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        y = np.floor(v * quant).astype(np.int64)
        # numpy int64 wraps silently — bound-check the block BEFORE the
        # products so an out-of-lattice input raises instead of corrupting
        if len(x) and int(np.abs(x).max()) * max(int(np.abs(y).max()), 1) * len(
            x
        ) >= 2**62:
            raise ValueError(
                "grouped_ols int64 lattice overflow — raise x_unit_s or "
                "lower quant"
            )
        t = pa.table(
            {
                key_col: batch.column(key_col),
                "n": pa.array(np.ones(len(x), np.int64), pa.int64()),
                "sum_x": pa.array(x, pa.int64()),
                "sum_y": pa.array(y, pa.int64()),
                "sum_xy": pa.array(x * y, pa.int64()),
                "sum_xx": pa.array(x * x, pa.int64()),
            }
        )
        g = t.group_by([key_col]).aggregate(
            [
                ("n", "sum"),
                ("sum_x", "sum"),
                ("sum_y", "sum"),
                ("sum_xy", "sum"),
                ("sum_xx", "sum"),
            ]
        )
        return g.rename_columns(
            [key_col, "n", "sum_x", "sum_y", "sum_xy", "sum_xx"]
        )

    stats = (
        events.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .sum(["n", "sum_x", "sum_y", "sum_xy", "sum_xx"])
        .map_batches(
            lambda t: t.rename_columns(
                [key_col, "n", "sum_x", "sum_y", "sum_xy", "sum_xx"]
            ),
            batch_format="pyarrow",
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        # Python ints (arbitrary precision) for the closed form: n·Σxy
        # brushes int64 at sandbox scale already, and HUGEINT is the SQL
        # twin's type. Truncate-toward-zero to match DuckDB's ``//``.
        n = batch.column("n").to_pylist()
        sx = batch.column("sum_x").to_pylist()
        sy = batch.column("sum_y").to_pylist()
        sxy = batch.column("sum_xy").to_pylist()
        sxx = batch.column("sum_xx").to_pylist()
        num, den, slope = [], [], []
        for ni, sxi, syi, sxyi, sxxi in zip(n, sx, sy, sxy, sxx):
            nu = ni * sxyi - sxi * syi
            de = ni * sxxi - sxi * sxi
            if abs(nu) >= 2**63 or abs(de) >= 2**63:
                raise ValueError(
                    "grouped_ols int64 lattice overflow — raise x_unit_s "
                    f"or lower quant (num={nu}, den={de})"
                )
            num.append(nu)
            den.append(de)
            if de == 0:
                slope.append(0)
            else:
                q = (abs(nu) * 1_000_000) // abs(de)
                slope.append(-q if (nu < 0) != (de < 0) else q)
        return pa.table(
            {
                key_col: batch.column(key_col),
                "n": batch.column("n"),
                "sum_x": batch.column("sum_x"),
                "sum_y": batch.column("sum_y"),
                "num": pa.array(num, pa.int64()),
                "den": pa.array(den, pa.int64()),
                "slope_e6": pa.array(slope, pa.int64()),
            }
        )

    return stats.map_batches(finish, batch_format="pyarrow")


def funnel_sequence(
    events: rd.Dataset,
    steps: list[str],
    within_s: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> rd.Dataset:
    """N-step funnel — the general sequence-conversion kernel
    (funnel_conversion is the 2-step special case): per key, t₁ = first
    ``steps[0]`` event, then tᵢ = first ``steps[i]`` at-or-after tᵢ₋₁
    within ``within_s`` seconds PER HOP. Same scale shape as the 2-step
    kernel: streaming step-row prefilter, ONE range sort on (key, ts),
    one vectorized ``np.minimum.at`` pass per step over complete key runs
    — no per-key dispatch, hop count is a constant factor, never a
    shuffle multiplier.

    Output: (key, t_1 … t_k nullable timestamps, reached) — one row per
    key with ≥1 first-step event; ``reached`` counts completed steps.
    """
    import functools

    import pyarrow.compute as pc

    from graphiti_ray.stages.ops import sorted_run_map

    step_set = list(steps)

    def prefilter(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch.column(type_col), pa.array(sorted(set(step_set)), pa.string())
        )
        return batch.filter(keep).select([key_col, ts_col, type_col])

    rows = events.map_batches(
        prefilter, batch_format="pyarrow", zero_copy_batch=True
    )

    def block(tbl: pa.Table) -> pa.Table:
        from graphiti_ray.stages.ops import _table_run_starts

        key_type = tbl.schema.field(key_col).type
        cols = {key_col: pa.array([], key_type)}
        for i in range(len(step_set)):
            cols[f"t_{i + 1}"] = pa.array([], pa.timestamp("us"))
        cols["reached"] = pa.array([], pa.int64())
        empty = pa.table(cols)
        n = tbl.num_rows
        if n == 0:
            return empty
        starts = _table_run_starts(tbl, [key_col])[:-1]
        run_id = np.zeros(n, dtype=np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        n_runs = len(starts)
        us = (
            tbl.column(ts_col)
            .cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        types = np.asarray(tbl.column(type_col).to_pylist(), dtype=object)
        BIG = np.iinfo(np.int64).max
        w_us = within_s * 1_000_000
        t_steps = []
        t_prev = None
        for i, st in enumerate(step_set):
            t_i = np.full(n_runs, BIG, dtype=np.int64)
            mask = types == st
            if i > 0:
                prev = t_prev[run_id]
                mask = mask & (us >= prev) & (us - prev <= w_us)
            np.minimum.at(t_i, run_id[mask], us[mask])
            t_steps.append(t_i)
            t_prev = t_i
        keep = np.nonzero(t_steps[0] != BIG)[0]
        reached = np.zeros(len(keep), dtype=np.int64)
        out = {key_col: tbl.column(key_col).take(pa.array(starts[keep], pa.int64()))}
        for i, t_i in enumerate(t_steps):
            hit = t_i[keep] != BIG
            reached += hit.astype(np.int64)
            vals = pa.array(
                np.where(hit, t_i[keep], 0), pa.int64(), mask=~hit
            ).cast(pa.timestamp("us"))
            out[f"t_{i + 1}"] = vals
        out["reached"] = pa.array(reached, pa.int64())
        return pa.table(out)

    return sorted_run_map(rows, [key_col], block, order_cols=[ts_col])


def markov_stationary(
    events: rd.Dataset,
    rounds: int = 6,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> rd.Dataset:
    """Stationary distribution of the first-order event-type Markov
    chain (the user-flow equilibrium a behavior model reads off): the
    row-stochastic transition matrix from :func:`transition_counts`,
    power-iterated ``rounds`` times from a uniform start — the pagerank
    fixed-round unroll convention so the SQL twin replays the identical
    recurrence. Dangling states (types never observed as a source) keep
    their mass (self-loop convention).

    Scale note: the DISTRIBUTED stage is the transition-count reduce
    (corpus-sized input); the chain itself is |types|² — an event-type
    vocabulary, parameter-sized at any corpus scale — so the iteration
    runs in driver numpy by design.

    Output: (event_type, prob) after ``rounds`` rounds.
    """
    tc = transition_counts(
        events, key_col=key_col, ts_col=ts_col, id_col=id_col, type_col=type_col
    ).to_pandas()

    from graphiti_ray.stages.ops import distinct_by_key

    all_types = sorted(
        r["event_type"]
        for r in distinct_by_key(
            events.map_batches(
                lambda t: pa.table({"event_type": t.column(type_col)}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            "event_type",
        ).take_all()
    )
    idx = {t: i for i, t in enumerate(all_types)}
    k = len(all_types)
    if k == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "prob": pa.array([], pa.float64()),
                }
            )
        )
    cnt = np.zeros((k, k), dtype=np.float64)
    for f, t, n in zip(tc["from_type"], tc["to_type"], tc["n"]):
        cnt[idx[f], idx[t]] = float(n)
    rowsum = cnt.sum(axis=1)
    dangling = rowsum == 0
    p = np.divide(cnt, np.where(dangling, 1.0, rowsum)[:, None])
    pi = np.full(k, 1.0 / k)
    for _ in range(rounds):
        pi = pi @ p + pi * dangling
    return rd.from_arrow(
        pa.table(
            {
                "event_type": pa.array(all_types, pa.string()),
                "prob": pa.array(pi, pa.float64()),
            }
        )
    )


def basket_pairs(
    events: rd.Dataset,
    min_support: int = 2,
    key_col: str = "user_id",
    type_col: str = "event_type",
) -> rd.Dataset:
    """Level-2 frequent itemset mining (the Apriori pair census /
    'co-visit' statistic of recommender pipelines): each key's DISTINCT
    item set is a basket; a pair (a < b) is supported by every basket
    containing both. Emits the exact support counts a lift/confidence
    computation needs — all integers, floats stay derived.

    Scale shape: one distinct pass over (key, item) (sort + adjacent
    dedup), then per-key pair partials pre-counted per block
    (``sorted_run_map`` — baskets are item-vocabulary-bounded, so the
    pair fan-out per key is bounded) → one |items|²-keyed sum; per-item
    counts ride the same distinct pass and re-attach from a broadcast
    vocabulary-sized map.

    Output: (type_a, type_b, n_ab, n_a, n_b, n_keys) for n_ab ≥
    min_support.
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count, Sum

    from graphiti_ray.stages.link import _cached_lut
    from graphiti_ray.stages.ops import distinct_by_key, sorted_run_map

    def keyed(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t.column(key_col), pa.string()),
            pc.cast(t.column(type_col), pa.string()),
            "\x00",
        )
        return pa.table(
            {
                "k": k,
                key_col: t.column(key_col),
                type_col: t.column(type_col),
            }
        )

    ut = distinct_by_key(
        events.select_columns([key_col, type_col]).map_batches(
            keyed, batch_format="pyarrow", zero_copy_batch=True
        ),
        "k",
    ).materialize()

    item_counts = {
        r[type_col]: int(r["n"])
        for r in ut.groupby(type_col).aggregate(Count(alias_name="n")).take_all()
    }
    n_keys = int(
        ut.groupby(key_col)
        .aggregate(Count(alias_name="c"))
        .count()
    )
    cref = ray.put((item_counts, n_keys))

    def pair_kernel(tbl: pa.Table) -> pa.Table:
        from graphiti_ray.stages.ops import _table_run_starts

        empty = pa.table(
            {
                "type_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        starts = _table_run_starts(tbl, [key_col])
        types = tbl.column(type_col).to_pylist()
        from collections import Counter

        cnt: Counter = Counter()
        for s, e in zip(starts[:-1], starts[1:]):
            basket = sorted(types[s:e])
            for i in range(len(basket)):
                for j in range(i + 1, len(basket)):
                    cnt[(basket[i], basket[j])] += 1
        if not cnt:
            return empty
        return pa.table(
            {
                "type_a": pa.array([k[0] for k in cnt], pa.string()),
                "type_b": pa.array([k[1] for k in cnt], pa.string()),
                "n": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    pairs = (
        sorted_run_map(
            ut, key_cols=[key_col], order_cols=[type_col], block_fn=pair_kernel
        )
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n_ab"))
    )

    def finish(t: pa.Table, _ref=cref) -> pa.Table:
        ic, nk = _cached_lut(_ref)
        ta = t.column("type_a").to_pylist()
        tb = t.column("type_b").to_pylist()
        nab = pc.cast(t.column("n_ab"), pa.int64())
        out = pa.table(
            {
                "type_a": t.column("type_a"),
                "type_b": t.column("type_b"),
                "n_ab": nab,
                "n_a": pa.array([ic[a] for a in ta], pa.int64()),
                "n_b": pa.array([ic[b] for b in tb], pa.int64()),
                "n_keys": pa.array([nk] * len(ta), pa.int64()),
            }
        )
        return out.filter(pc.greater_equal(out.column("n_ab"), min_support))

    return pairs.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def user_streaks(
    events: rd.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> rd.Dataset:
    """Longest consecutive-day activity streak per key — the retention
    analytic next to cohorts: distinct active days per key, then the
    maximal run of day-adjacent values (the day − row_number
    gaps-and-islands trick, computed per complete key run on the
    ``sorted_run_map`` contract with one vectorized diff pass).

    Output: (key, n_active_days, max_streak)."""
    import functools

    import pyarrow.compute as pc

    from graphiti_ray.stages.ops import distinct_by_key, sorted_run_map

    def to_day(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")), pa.int64())
        day = _floor_div(us, 86400 * 1_000_000)
        k = pc.binary_join_element_wise(
            pc.cast(t.column(key_col), pa.string()),
            pc.cast(day, pa.string()),
            "\x00",
        )
        return pa.table({"k": k, key_col: t.column(key_col), "day": day})

    ud = distinct_by_key(
        events.select_columns([key_col, ts_col]).map_batches(
            to_day, batch_format="pyarrow", zero_copy_batch=True
        ),
        "k",
    )

    def kernel(tbl: pa.Table) -> pa.Table:
        from graphiti_ray.stages.ops import _table_run_starts

        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "n_active_days": pa.array([], pa.int64()),
                "max_streak": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        starts = _table_run_starts(tbl, [key_col])
        days = tbl.column("day").to_numpy(zero_copy_only=False)
        keys = tbl.column(key_col)
        o_k, o_n, o_s = [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            d = days[s:e]  # ascending distinct days
            breaks = np.nonzero(np.diff(d) != 1)[0]
            bounds = np.concatenate([[-1], breaks, [len(d) - 1]])
            o_k.append(keys[s].as_py())
            o_n.append(len(d))
            o_s.append(int(np.diff(bounds).max()))
        return pa.table(
            {
                key_col: pa.array(o_k),
                "n_active_days": pa.array(o_n, pa.int64()),
                "max_streak": pa.array(o_s, pa.int64()),
            }
        )

    return sorted_run_map(ud, key_cols=[key_col], order_cols=["day"], block_fn=kernel)


def watermark_late_events(
    events: rd.Dataset,
    delay_s: int = 3600,
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> rd.Dataset:
    """Streaming watermark / late-data census (T5 made first-class — the
    Flink/Beam bounded-out-of-orderness watermark replayed over the
    batch log): events are processed in ARRIVAL order (``order_col``);
    at each event the watermark is ``max(ts) over the strict arrival
    prefix − delay``, and the event is LATE if its own ts is below that
    watermark — exactly the rows a streaming engine would drop or
    side-output.

    Scale shape: one global range sort by arrival order, per-block
    vectorized exclusive running max, ONE int64 carried between
    neighbouring blocks (the ``sorted_prefix_sum`` boundary protocol with
    max instead of sum) — no per-key grouping, no driver loop over rows.

    Output: (event_id, ts, watermark, late) — watermark NULL for the
    first arrival, late 0/1 int64.
    """
    import numpy as np

    import ray

    from graphiti_ray.stages.ops import _as_arrow, _sort_coalesced

    US_ = 1_000_000
    delay_us = delay_s * US_
    SENTINEL = np.iinfo(np.int64).min

    narrow = events.select_columns([order_col, ts_col]).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    mat = _sort_coalesced(narrow, [order_col])

    @ray.remote
    def block_max(block) -> int:
        block = _as_arrow(block)
        if block.num_rows == 0:
            return SENTINEL
        import pyarrow.compute as pc

        us = pc.cast(pc.cast(block.column(ts_col), pa.timestamp("us")), pa.int64())
        return int(pc.max(us).as_py())

    @ray.remote
    def late_block(block, carry_in: int) -> pa.Table:
        block = _as_arrow(block)
        n = block.num_rows
        if n == 0:
            return pa.table(
                {
                    order_col: pa.array([], pa.int64()),
                    ts_col: pa.array([], pa.timestamp("us")),
                    "watermark": pa.array([], pa.timestamp("us")),
                    "late": pa.array([], pa.int64()),
                }
            )
        import pyarrow.compute as pc

        us = pc.cast(
            pc.cast(block.column(ts_col), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        inc = np.maximum.accumulate(us)
        excl = np.concatenate(([SENTINEL], inc[:-1]))
        excl = np.maximum(excl, carry_in)
        has_wm = excl != SENTINEL
        wm = np.where(has_wm, excl - delay_us, 0)
        late = (has_wm & (us < wm)).astype(np.int64)
        return pa.table(
            {
                order_col: block.column(order_col),
                ts_col: pc.cast(block.column(ts_col), pa.timestamp("us")),
                "watermark": pa.Array.from_pandas(
                    np.where(has_wm, wm, None), type=pa.timestamp("us")
                ),
                "late": pa.array(late, pa.int64()),
            }
        )

    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    if not refs:
        return mat.limit(0)
    maxes = ray.get([block_max.remote(r) for r in refs])
    out_refs = []
    cur = SENTINEL
    for r, m in zip(refs, maxes):
        out_refs.append(late_block.remote(r, cur))
        if m != SENTINEL:
            cur = max(cur, m)
    return rd.from_arrow_refs(out_refs)
