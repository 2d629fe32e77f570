"""Distributed sketches: HyperLogLog cardinality + count-min frequency.

The custom-sketch operators of a corpus-stats pipeline: estimate the
number of DISTINCT values (HLL) and per-value frequencies / heavy
hitters (CMS) without a distinct shuffle or a vocabulary-sized state.
Two-phase associative shape — per-batch register partials (one
``np.maximum.at`` pass), NARROW (bucket, max_rank) rows, one max-groupby
over at most 2^p keys — so the corpus streams and the reduce is
register-sized regardless of input size.

Everything up to the registers is integer-deterministic (md5-based
hash, exact float64 ``frexp`` bit-length on < 2^52 values), so the
DuckDB oracle reproduces the register table bit-for-bit; the float
estimate is a pure driver-side function of the registers whose accuracy
(~1.04/sqrt(2^p)) is pytest-asserted against the exact distinct count.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Max

HLL_P = 12  # 4096 registers → ~1.6% standard error


def hll_hash64(value) -> int:
    """First 16 hex chars of md5(str(value)) as a big-endian uint64 —
    chosen because DuckDB reproduces it exactly with
    ('0x' || substr(md5(v), 1, 16))::UBIGINT."""
    return int(hashlib.md5(str(value).encode()).hexdigest()[:16], 16)


def hll_registers(ds: rd.Dataset, col: str, p: int = HLL_P) -> rd.Dataset:
    """(bucket, max_rank) register rows — only buckets that were hit.
    bucket = top p hash bits; rank = leading-zero count of the low
    (64-p) bits + 1 (the classic HLL register update)."""
    m = 1 << p
    low_bits = 64 - p
    low_mask = np.uint64((1 << low_bits) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        if not vals:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "max_rank": pa.array([], pa.int64()),
                }
            )
        h = np.array([hll_hash64(v) for v in vals], dtype=np.uint64)
        bucket = (h >> np.uint64(low_bits)).astype(np.int64)
        low = h & low_mask
        # bit_length via frexp: exact for values < 2^52 (all fit float64)
        bl = np.zeros(len(low), dtype=np.int64)
        nz = low != 0
        bl[nz] = np.frexp(low[nz].astype(np.float64))[1]
        rank = low_bits - bl + 1
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, bucket, rank)
        hit = np.nonzero(regs)[0]
        return pa.table(
            {
                "bucket": pa.array(hit, pa.int64()),
                "max_rank": pa.array(regs[hit], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Max("max_rank", alias_name="max_rank"))
    )


def _hash_slice(h, r: int, m: int):
    """The shared 16-bit md5 slice → bucket formula used by BOTH the
    register writers and the read-out probes (CMS and Bloom): keeping
    write and read in one function is what makes the
    never-underestimate / no-false-negative guarantees hold."""
    return ((h >> np.uint64(16 * r)) & np.uint64(0xFFFF)) % m


CMS_WIDTH = 2048  # counters per hash row
CMS_DEPTH = 4  # independent hash rows; estimate = min over rows


def cms_registers(
    ds: rd.Dataset, col: str, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> rd.Dataset:
    """Count-min sketch registers over a column: for each of ``depth``
    md5-derived hash rows, per-batch partial counters (one bincount),
    then a sum-groupby bounded at depth × width keys — heavy-hitter
    frequency estimation without materializing the value vocabulary.
    Registers are exact integers (the same md5 hash the DuckDB twin
    computes), so the sketch itself is oracle-checkable; only the
    ``cms_estimate`` min-over-rows read-out is approximate."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        o_row, o_bucket, o_count = [], [], []
        if vals:
            h = np.array([hll_hash64(v) for v in vals], dtype=np.uint64)
            for r in range(depth):
                # row r uses 16 independent md5 bits (depth ≤ 4 × 16 = 64)
                buckets = _hash_slice(h, r, width)
                counts = np.bincount(buckets.astype(np.int64), minlength=width)
                hit = np.nonzero(counts)[0]
                o_row.extend([r] * len(hit))
                o_bucket.extend(hit.tolist())
                o_count.extend(counts[hit].tolist())
        return pa.table(
            {
                "sketch_row": pa.array(o_row, pa.int64()),
                "bucket": pa.array(o_bucket, pa.int64()),
                "n": pa.array(o_count, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["sketch_row", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
    )


def cms_estimate(
    registers, value, width: int = CMS_WIDTH, depth: int = CMS_DEPTH
) -> int:
    """Point frequency estimate: min over the value's counters (classic
    CMS read-out — an overestimate, never an underestimate)."""
    h = np.uint64(hll_hash64(value))
    lut = {
        (int(r), int(b)): int(c)
        for r, b, c in zip(
            registers["sketch_row"], registers["bucket"], registers["n"]
        )
    }
    return min(
        lut.get((r, int(_hash_slice(h, r, width))), 0) for r in range(depth)
    )


BLOOM_BITS = 1 << 15  # 32768-bit filter
BLOOM_K = 4  # hash functions per value


def bloom_bits(
    ds: rd.Dataset, col: str, m: int = BLOOM_BITS, k: int = BLOOM_K
) -> rd.Dataset:
    """Bloom-filter bit table over a column: the k md5-derived 16-bit
    slices of each value's hash (same slicing as the count-min rows)
    set bits mod ``m``; per-batch partial bitsets union through one
    distinct — output is the sorted set of lit bits (≤ m narrow rows).
    Integer-exact end to end, so the DuckDB twin reproduces the bit set
    exactly; membership semantics (no false negatives, bounded false
    positives) are pytest-asserted via ``bloom_contains``."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        if not vals:
            return pa.table({"bit": pa.array([], pa.int64())})
        h = np.array([hll_hash64(v) for v in vals], dtype=np.uint64)
        bits = np.concatenate(
            [_hash_slice(h, r, m).astype(np.int64) for r in range(k)]
        )
        return pa.table({"bit": pa.array(np.unique(bits), pa.int64())})

    from graphiti_ray.stages.ops import distinct_by_key

    return distinct_by_key(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "bit",
    )


def bloom_contains(
    bits: set, value, m: int = BLOOM_BITS, k: int = BLOOM_K
) -> bool:
    """Membership probe: True iff every one of the value's k bits is lit
    (definitely-absent when False; maybe-present when True)."""
    h = np.uint64(hll_hash64(value))
    return all(int(_hash_slice(h, r, m)) in bits for r in range(k))


def hll_estimate(registers, p: int = HLL_P) -> float:
    """Standard HLL estimator (Flajolet et al.) with the small-range
    linear-counting correction. ``registers``: pandas DataFrame with
    (bucket, max_rank) rows for hit buckets."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.float64)
    regs[registers["bucket"].to_numpy()] = registers["max_rank"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return float(est)


def hll_registers_by(
    ds: rd.Dataset, col: str, by: str, p: int = HLL_P
) -> rd.Dataset:
    """Per-group HLL register table (group, bucket, max_rank) — distinct
    cardinality PER KEY without a distinct shuffle. Same register
    arithmetic as ``hll_registers``; the per-batch partial collapses to
    one dense (groups-in-batch × 2^p) ``np.maximum.at`` pass, so the
    reduce stays ≤ |groups|·2^p rows no matter the input size — the
    grouped-sketch shape a 100-TB per-domain/per-language cardinality
    report needs (registers merge by max, so shards and batches combine
    associatively)."""
    m = 1 << p
    low_bits = 64 - p
    low_mask = np.uint64((1 << low_bits) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        groups = np.asarray(batch.column(by).to_pylist(), dtype=object)
        empty = pa.table(
            {
                by: pa.array([], pa.string()),
                "bucket": pa.array([], pa.int64()),
                "max_rank": pa.array([], pa.int64()),
            }
        )
        if not vals:
            return empty
        h = np.array([hll_hash64(v) for v in vals], dtype=np.uint64)
        bucket = (h >> np.uint64(low_bits)).astype(np.int64)
        low = h & low_mask
        bl = np.zeros(len(low), dtype=np.int64)
        nz = low != 0
        bl[nz] = np.frexp(low[nz].astype(np.float64))[1]
        rank = low_bits - bl + 1
        ug, gidx = np.unique(groups, return_inverse=True)
        if len(ug) * m > 1 << 26:  # dense partial would exceed ~512 MB
            raise ValueError(
                "hll_registers_by: too many distinct groups per batch for "
                "the dense register partial — shrink batch_size or "
                "pre-partition by the group column"
            )
        regs = np.zeros((len(ug), m), dtype=np.int64)
        np.maximum.at(regs, (gidx, bucket), rank)
        gi, hit = np.nonzero(regs)
        return pa.table(
            {
                by: pa.array(ug[gi].tolist(), pa.string()),
                "bucket": pa.array(hit, pa.int64()),
                "max_rank": pa.array(regs[gi, hit], pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([by, "bucket"])
        .aggregate(Max("max_rank", alias_name="max_rank"))
    )


def bloom_semi_join(
    probe: rd.Dataset,
    build: rd.Dataset,
    col: str,
    m: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> rd.Dataset:
    """Bloom semi-join — the filter-pushdown pattern that replaces a
    shuffle join when the build side's KEY SET only needs approximate
    membership: build a Bloom bit set from ``build[col]`` (≤ m narrow
    rows, m is a CONSTANT — 16 Ki bits default — so the driver/broadcast
    cost is fixed regardless of build size), broadcast the m-bit mask
    once via ``ray.put``, and stream the probe side through a vectorized
    all-k-bits-lit filter. No false negatives; false positives bounded
    by the classic (1−e^{−kn/m})^k. Deterministic bit arithmetic end to
    end, so even the FPs are value-exact against the SQL twin."""
    import ray

    bitrows = bloom_bits(build, col, m=m, k=k).to_pandas()  # ≤ m rows
    mask = np.zeros(m, dtype=bool)
    if len(bitrows):
        mask[bitrows["bit"].to_numpy()] = True
    ref = ray.put(mask)

    def keep(batch: pa.Table, _ref=ref) -> pa.Table:
        from graphiti_ray.stages.link import _cached_lut

        mk = _cached_lut(_ref)
        vals = batch.column(col).to_pylist()
        if not vals:
            return batch
        h = np.array([hll_hash64(v) for v in vals], dtype=np.uint64)
        ok = np.ones(len(vals), dtype=bool)
        for r in range(k):
            ok &= mk[_hash_slice(h, r, m).astype(np.int64)]
        return batch.filter(pa.array(ok))

    return probe.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def cms_registers_by(
    ds: rd.Dataset,
    col: str,
    by: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> rd.Dataset:
    """Per-group count-min registers (group, sketch_row, bucket, n) —
    heavy-hitter frequencies PER KEY with a ≤ |groups|·depth·width
    reduce, completing the grouped-sketch pair with ``hll_registers_by``.
    Per-batch partials collapse via one flat bincount over
    (group, row, bucket) composite indices."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        groups = np.asarray(batch.column(by).to_pylist(), dtype=object)
        empty = pa.table(
            {
                by: pa.array([], pa.string()),
                "sketch_row": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if not vals:
            return empty
        h = np.array([hll_hash64(v) for v in vals], dtype=np.uint64)
        ug, gidx = np.unique(groups, return_inverse=True)
        o_g, o_r, o_b, o_n = [], [], [], []
        for r in range(depth):
            buckets = _hash_slice(h, r, width).astype(np.int64)
            key = gidx * width + buckets
            counts = np.bincount(key, minlength=len(ug) * width)
            hit = np.nonzero(counts)[0]
            o_g.extend(ug[hit // width].tolist())
            o_r.extend([r] * len(hit))
            o_b.extend((hit % width).tolist())
            o_n.extend(counts[hit].tolist())
        return pa.table(
            {
                by: pa.array(o_g, pa.string()),
                "sketch_row": pa.array(o_r, pa.int64()),
                "bucket": pa.array(o_b, pa.int64()),
                "n": pa.array(o_n, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([by, "sketch_row", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
    )


# --- KLL/MRL quantile sketch -------------------------------------------------

KLL_CAP_EXACT = 1 << 17  # capacity at/above which no compaction happens at
# test scale → the sketch stores every value and quantiles are EXACT (the
# oracle-gate mode, same trick as knn_ivf_full / dedup_embedding_lsh_full)


def _kll_compact(levels: list, capacity: int) -> list:
    """Deterministic Munro-Paterson-style compaction: while total stored
    items exceed ``capacity``, the LOWEST level with >= 2 items sorts its
    buffer and promotes alternate items of its even-length prefix to the
    next level (weight doubles; total weight is preserved exactly, an odd
    tail item stays behind). The alternation offset is a deterministic
    function of the buffer (parity of its half-length), so the sketch is
    reproducible run-to-run — the rank-error bound of the classic
    randomized rule is asserted empirically in pytest instead."""
    while sum(len(b) for b in levels) > capacity:
        for i in range(len(levels)):
            buf = levels[i]
            if len(buf) >= 2:
                buf = np.sort(buf)
                even = len(buf) - (len(buf) % 2)
                off = (even // 2) % 2  # deterministic alternation
                promoted = buf[off:even:2]
                levels[i] = buf[even:]
                if i + 1 == len(levels):
                    levels.append(np.empty(0, np.int64))
                levels[i + 1] = np.concatenate([levels[i + 1], promoted])
                break
        else:  # nothing compactable (capacity < 2): keep as-is
            break
    return levels


def _kll_add(levels: list, values: np.ndarray, capacity: int) -> list:
    levels = list(levels)
    levels[0] = np.concatenate([levels[0], values.astype(np.int64)])
    return _kll_compact(levels, capacity)


def _kll_merge(a: list, b: list, capacity: int) -> list:
    out = []
    for i in range(max(len(a), len(b))):
        bufs = []
        if i < len(a):
            bufs.append(a[i])
        if i < len(b):
            bufs.append(b[i])
        out.append(np.concatenate(bufs) if bufs else np.empty(0, np.int64))
    return _kll_compact(out, capacity)


def kll_aggregate(ds: rd.Dataset, col: str, capacity: int) -> list:
    """One mergeable quantile sketch over a whole int column, built as a
    Ray Data ``AggregateFn`` — per-block accumulate, associative merges
    in Ray's distributed reduce, only the capacity-bounded sketch ever
    moves. The missing member of the sketch family next to HLL
    (cardinality), CMS (frequency) and Bloom (membership): quantiles."""
    from ray.data.aggregate import AggregateFn

    def acc(levels, block) -> list:
        vals = block.column(col).to_numpy(zero_copy_only=False)
        return _kll_add(levels, vals, capacity)

    fn = AggregateFn(
        init=lambda k: [np.empty(0, np.int64)],
        merge=lambda x, y: _kll_merge(x, y, capacity),
        accumulate_block=acc,
        name="kll",
    )
    return ds.aggregate(fn)["kll"]


def _kll_expand(levels: list):
    """(sorted values, cumulative weights, total weight N)."""
    vals = np.concatenate(levels) if levels else np.empty(0, np.int64)
    wts = np.concatenate(
        [np.full(len(b), 1 << i, np.int64) for i, b in enumerate(levels)]
    ) if levels else np.empty(0, np.int64)
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    return vals, np.cumsum(wts), int(wts.sum())


def kll_rank_value(levels: list, q6: int) -> tuple[int, int]:
    """(value at quantile q6/1e6, total weight N) — the value is the
    smallest stored item whose cumulative weight reaches the EXACT
    integer target rank max(1, ceil(q6 * N / 1e6)) (pure int ceiling, no
    float division, so at full capacity this equals the explicit
    row_number rule of the SQL twin)."""
    vals, cumw, n = _kll_expand(levels)
    if n == 0:
        return 0, 0
    r = max(1, (q6 * n + 999_999) // 1_000_000)
    idx = int(np.searchsorted(cumw, r, side="left"))
    idx = min(idx, len(vals) - 1)
    return int(vals[idx]), n


DEFAULT_Q6 = (100_000, 250_000, 500_000, 750_000, 900_000)


def kll_quantiles(
    ds: rd.Dataset,
    col: str,
    qs6: tuple = DEFAULT_Q6,
    capacity: int = KLL_CAP_EXACT,
) -> rd.Dataset:
    """Quantiles of an int64 column via the KLL aggregate. Output: one
    row per requested quantile — (q6, value, n). With ``capacity`` >= the
    column length the sketch is lossless and the result is the exact
    order statistic (oracle mode); smaller capacities trade memory for a
    bounded rank error (pytest-asserted)."""
    levels = kll_aggregate(ds, col, capacity)
    rows = []
    for q6 in qs6:
        v, n = kll_rank_value(levels, q6)
        rows.append({"q6": int(q6), "value": v, "n": n})
    return rd.from_items(rows)


def kll_quantiles_by(
    ds: rd.Dataset,
    col: str,
    by: str,
    qs6: tuple = DEFAULT_Q6,
    capacity: int = KLL_CAP_EXACT,
) -> rd.Dataset:
    """Grouped KLL quantiles — the per-key variant of
    :func:`kll_quantiles`, completing the grouped-sketch family next to
    ``hll_registers_by`` / ``cms_registers_by``: one mergeable sketch per
    group rides the keyed reduce (per-block accumulate, associative
    merge), then each group's rank rule runs on its own sketch. At
    ``capacity`` >= the largest group the result is the exact per-group
    order statistic (oracle mode).

    Output: (by, q6, value, n) — one row per group × quantile."""
    from ray.data.aggregate import AggregateFn

    def acc(levels, block) -> list:
        vals = block.column(col).to_numpy(zero_copy_only=False)
        return _kll_add(levels, vals, capacity)

    fn = AggregateFn(
        init=lambda k: [np.empty(0, np.int64)],
        merge=lambda x, y: _kll_merge(x, y, capacity),
        accumulate_block=acc,
        name="kll",
    )
    rows = []
    for r in ds.groupby(by).aggregate(fn).take_all():  # vocabulary-sized
        levels = [np.asarray(b, np.int64) for b in r["kll"]]
        for q6 in qs6:
            v, n = kll_rank_value(levels, q6)
            rows.append({by: r[by], "q6": int(q6), "value": v, "n": n})
    return rd.from_items(rows)


# --- Misra-Gries heavy hitters -------------------------------------------------

MG_CAP_EXACT = 1 << 16  # >= corpus distinct-token count → sketch is lossless


def _mg_shrink(c: dict, capacity: int) -> dict:
    """Misra-Gries decrement: if over capacity, subtract the (capacity+1)-th
    largest count from every counter and drop the non-positive ones."""
    if len(c) <= capacity:
        return c
    m = sorted(c.values(), reverse=True)[capacity]
    return {t: v - m for t, v in c.items() if v - m > 0}


def mg_aggregate(ds: rd.Dataset, col: str, capacity: int) -> dict:
    """One mergeable Misra-Gries heavy-hitter summary over a string
    column, built as a Ray Data ``AggregateFn`` — per-block vectorized
    accumulate (np.unique counts), associative merges via counter-sum +
    decrement (Agarwal et al. 2012's mergeable-summaries rule), only the
    capacity-bounded dict moves through the reduce. The deterministic
    counter-based cousin of CMS: every estimate undercounts by at most
    N/(capacity+1), and with ``capacity`` >= the distinct count the
    summary is EXACT (the KLL full-capacity gate convention)."""
    from collections import Counter

    from ray.data.aggregate import AggregateFn

    def acc(c: dict, block) -> dict:
        vals, cnts = np.unique(
            np.asarray(block.column(col).to_pylist(), dtype=object),
            return_counts=True,
        )
        merged = Counter(c)
        merged.update(dict(zip(vals.tolist(), cnts.tolist())))
        return _mg_shrink(dict(merged), capacity)

    def merge(a: dict, b: dict) -> dict:
        from collections import Counter as _C

        m = _C(a)
        m.update(b)
        return _mg_shrink(dict(m), capacity)

    fn = AggregateFn(
        init=lambda k: {},
        merge=merge,
        accumulate_block=acc,
        name="mg",
    )
    return ds.aggregate(fn)["mg"]


def mg_top_tokens(
    docs: rd.Dataset,
    k: int = 50,
    capacity: int = MG_CAP_EXACT,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Top-k corpus tokens via the Misra-Gries aggregate: tokenize
    (whitespace, the corpus convention) → one MG reduce → top k by
    (count desc, token asc). At full capacity this equals the exact
    GROUP BY/ORDER BY twin; compacted capacities keep the N/(cap+1)
    error guarantee (pytest-asserted).

    Output: (token, n)."""
    import re as _re

    ws = _re.compile(r"\s+", _re.ASCII)

    def toks(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column(text_col).to_pylist():
            out.extend(x for x in ws.split(t or "") if x)
        return pa.table({"token": pa.array(out, pa.string())})

    stream = docs.map_batches(toks, batch_format="pyarrow", zero_copy_batch=True)
    counters = mg_aggregate(stream, "token", capacity)
    top = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return rd.from_items([{"token": t, "n": int(n)} for t, n in top])
