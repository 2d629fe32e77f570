"""General relational operator coverage (S8/K1-K3/A-family shapes on the
TPC-H-ish driver tables): grouped aggregates with combiners, broadcast
joins, sort/limit top-k — the building blocks the KG pipeline composes,
exposed as standalone oracle-checked operators.

Float policy: money sums are integer-ized per row as floor(x*100 + 0.5)
(cents) before aggregation so Ray and the SQL oracle produce bit-identical
values (float sum order is engine-dependent; integer sums are not).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _cents(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    import pyarrow.compute as pc

    return pc.cast(pc.floor(pc.add(pc.multiply(arr, 100.0), 0.5)), pa.int64())


def pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1 shape over lineitem: per (returnflag, linestatus) totals.
    Columns pruned at the read; revenue integer-ized per row."""
    import pyarrow.compute as pc

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def prep(batch: pa.Table) -> pa.Table:
        revenue = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(1.0, batch.column("l_discount")),
        )
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty_c": _cents(batch.column("l_quantity")),
                "price_c": _cents(batch.column("l_extendedprice")),
                "revenue_c": _cents(revenue),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="sum_qty_cents"),
            Sum("price_c", alias_name="sum_price_cents"),
            Sum("revenue_c", alias_name="sum_revenue_cents"),
            Count(alias_name="n_rows"),
        )
    )


def top_customers(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Broadcast join orders→customer + grouped totals + deterministic
    top-k: the small-side dimension table is put in the object store once
    and looked up per batch (no shuffle join for a dimension table)."""
    import ray

    customers = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    ).to_pandas()
    lut_ref = ray.put(
        {
            int(k_): (n, s)
            for k_, n, s in zip(
                customers["c_custkey"], customers["c_name"], customers["c_mktsegment"]
            )
        }
    )

    class JoinCustomer:
        def __init__(self, ref):
            import ray as _ray

            self.lut = _ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            names, segs, keep = [], [], []
            for i, ck in enumerate(keys):
                hit = self.lut.get(int(ck))
                if hit is None:
                    continue
                keep.append(i)
                names.append(hit[0])
                segs.append(hit[1])
            out = batch.take(pa.array(keep, pa.int64()))
            out = out.append_column("c_name", pa.array(names, pa.string()))
            out = out.append_column("c_mktsegment", pa.array(segs, pa.string()))
            return out

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "c_name": batch.column("c_name"),
                "c_mktsegment": batch.column("c_mktsegment"),
                "total_c": _cents(batch.column("o_totalprice")),
            }
        )

    joined = orders.map_batches(
        JoinCustomer,
        fn_constructor_args=(lut_ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    ).map_batches(prep, batch_format="pyarrow")
    agg = joined.groupby(["o_custkey", "c_name", "c_mktsegment"]).aggregate(
        Sum("total_c", alias_name="sum_total_cents"),
        Count(alias_name="n_orders"),
    )
    topk = agg.sort(["sum_total_cents", "o_custkey"], descending=[True, False]).limit(k)
    return topk


def lang_doc_stats(sf_dir: str) -> rd.Dataset:
    """Grouped aggregate over documents: per lang row count + char totals +
    min/max doc id (S8 cursored-scan shape)."""
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    return ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
        Min("doc_id", alias_name="min_doc_id"),
        Max("doc_id", alias_name="max_doc_id"),
    )


def regional_supplier_volume(sf_dir: str, region_name: str = "ASIA") -> rd.Dataset:
    """TPC-H Q5 shape — revenue per nation where the ordering customer
    and the shipping supplier sit in the SAME nation of one region. Join
    plan by side size: region→nation is a driver dict (≤ 25 rows —
    true dimension broadcast); customer/supplier/orders/lineitem all go
    through keyed hash joins (at real scale none of them broadcast).
    Revenue on the exact cent lattice: floor(price·(1−disc)·100 + 0.5).

    Output: (n_name, revenue_cents, n_items)."""
    import numpy as np

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    nations = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    regions = rd.read_parquet(f"{sf_dir}/region.parquet").to_pandas()
    rkey = int(regions[regions.r_name == region_name].r_regionkey.iloc[0])
    in_region = nations[nations.n_regionkey == rkey]
    nat_name = {int(k): str(n) for k, n in zip(in_region.n_nationkey, in_region.n_name)}
    keys = sorted(nat_name)

    parts = default_join_partitions()

    def nation_filter(batch: pa.Table, col: str) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(
            pc.is_in(batch.column(col), value_set=pa.array(keys, pa.int64()))
        )

    import functools

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        functools.partial(nation_filter, col="c_nationkey"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        functools.partial(nation_filter, col="s_nationkey"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    oc = safe_join(
        orders,
        cust.rename_columns({"c_custkey": "o_custkey"}),
        join_type="inner",
        num_partitions=parts,
        on=("o_custkey",),
    ).select_columns(["o_orderkey", "c_nationkey"])
    lo = safe_join(
        li.rename_columns({"l_orderkey": "o_orderkey"}),
        oc,
        join_type="inner",
        num_partitions=parts,
        on=("o_orderkey",),
    )
    ls = safe_join(
        lo.rename_columns({"l_suppkey": "s_suppkey"}),
        supp,
        join_type="inner",
        num_partitions=parts,
        on=("s_suppkey",),
    )

    def revenue_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        same = batch.filter(
            pc.equal(batch.column("c_nationkey"), batch.column("s_nationkey"))
        )
        p = same.column("l_extendedprice").to_numpy(zero_copy_only=False)
        d = same.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(p * (1.0 - d) * 100.0 + 0.5).astype(np.int64)
        t = pa.table(
            {
                "n_key": same.column("c_nationkey"),
                "rev": pa.array(cents, pa.int64()),
                "one": pa.array(np.ones(len(cents), np.int64), pa.int64()),
            }
        )
        g = t.group_by(["n_key"]).aggregate([("rev", "sum"), ("one", "sum")])
        return g.rename_columns(["n_key", "p_rev", "p_n"])

    agg = (
        ls.map_batches(revenue_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_key")
        .aggregate(
            Sum("p_rev", alias_name="revenue_cents"),
            Sum("p_n", alias_name="n_items"),
        )
    )

    def name(batch: pa.Table, _m=nat_name) -> pa.Table:
        names = [
            _m[int(k)] for k in batch.column("n_key").to_pylist()
        ]
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "revenue_cents": batch.column("revenue_cents"),
                "n_items": batch.column("n_items"),
            }
        )

    return agg.map_batches(name, batch_format="pyarrow", zero_copy_batch=True)


def customer_orders_histogram(sf_dir: str) -> rd.Dataset:
    """TPC-H Q13 shape — the customer-order-count distribution INCLUDING
    zero-order customers (the left-outer-join census: an inner join would
    silently drop the inactive majority). Per-batch order-count combiner
    → one keyed sum → LEFT join customers ← counts (customer side
    preserved, null → 0) → one tiny histogram groupby.

    Output: (c_count, custdist) — how many customers placed exactly
    c_count orders."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    parts = default_join_partitions()

    def count_partial(batch: pa.Table) -> pa.Table:
        t = (
            batch.select(["o_custkey"])
            .group_by(["o_custkey"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "p_n": pc.cast(t.column("count_all"), pa.int64()),
            }
        )

    per_cust = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_custkey")
        .aggregate(Sum("p_n", alias_name="n_orders"))
    )
    custs = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    joined = safe_join(
        custs,
        per_cust,
        join_type="left_outer",
        num_partitions=parts,
        on=("c_custkey",),
    )

    def fill(batch: pa.Table) -> pa.Table:
        n = pc.coalesce(
            pc.cast(batch.column("n_orders"), pa.int64()),
            pa.scalar(0, pa.int64()),
        )
        return pa.table({"c_count": n})

    return (
        joined.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("c_count")
        .aggregate(Count(alias_name="custdist"))
    )


def shipping_priority(
    sf_dir: str, segment: str = "BUILDING", k: int = 10
) -> rd.Dataset:
    """TPC-H Q3 shape — top-k unshipped-revenue orders for one market
    segment: segment-filtered customers ⋈ orders ⋈ lineitem, revenue on
    the exact cent lattice, per-batch combiner before the keyed sum, one
    sort-limit head (Q3's date predicates are omitted — the synthetic
    tables have no ship/order date correlation worth slicing).

    Output: (o_orderkey, o_orderdate, revenue_cents) — top k by
    (revenue desc, orderkey asc)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    parts = default_join_partitions()
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t.filter(
                    pc.equal(t.column("c_mktsegment"), segment)
                ).column("c_custkey")
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    oc = safe_join(
        orders, cust, join_type="inner", num_partitions=parts, on=("o_custkey",)
    ).select_columns(["o_orderkey", "o_orderdate"])
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(batch: pa.Table) -> pa.Table:
        cents = _cents(
            pc.multiply(
                batch.column("l_extendedprice"),
                pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
            )
        )
        t = (
            pa.table({"o_orderkey": batch.column("l_orderkey"), "c": cents})
            .group_by(["o_orderkey"])
            .aggregate([("c", "sum")])
        )
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "p_rev": pc.cast(t.column("c_sum"), pa.int64()),
            }
        )

    rev = (
        li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("o_orderkey")
        .aggregate(Sum("p_rev", alias_name="revenue_cents"))
    )
    joined = safe_join(
        rev, oc, join_type="inner", num_partitions=parts, on=("o_orderkey",)
    )

    def fix(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
                "o_orderdate": t.column("o_orderdate"),
                "revenue_cents": pc.cast(t.column("revenue_cents"), pa.int64()),
            }
        )

    return (
        joined.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["revenue_cents", "o_orderkey"], descending=[True, False])
        .limit(k)
    )


def nation_trade_matrix(sf_dir: str) -> rd.Dataset:
    """TPC-H Q7 shape — the full bilateral trade matrix: revenue per
    (customer nation, supplier nation) pair across ALL nations, the
    cross-border flow census Q7 restricts to one nation pair. Same join
    plan as Q5 (nation names are a ≤25-row driver dict; every large side
    is a keyed hash join) with the per-batch cent-lattice revenue
    combiner emitting (cust_nation, supp_nation, cents, items) partials
    before the 25×25-sized final groupby.

    Output: (cust_nation, supp_nation, revenue_cents, n_items)."""
    import numpy as np

    from ray.data.aggregate import Sum

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    nations = rd.read_parquet(f"{sf_dir}/nation.parquet").to_pandas()
    nat_name = {
        int(k): str(n) for k, n in zip(nations.n_nationkey, nations.n_name)
    }
    parts = default_join_partitions()

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    oc = safe_join(
        orders,
        cust.rename_columns({"c_custkey": "o_custkey"}),
        join_type="inner",
        num_partitions=parts,
        on=("o_custkey",),
    ).select_columns(["o_orderkey", "c_nationkey"])
    lo = safe_join(
        li.rename_columns({"l_orderkey": "o_orderkey"}),
        oc,
        join_type="inner",
        num_partitions=parts,
        on=("o_orderkey",),
    )
    ls = safe_join(
        lo.rename_columns({"l_suppkey": "s_suppkey"}),
        supp,
        join_type="inner",
        num_partitions=parts,
        on=("s_suppkey",),
    )

    def partial(batch: pa.Table, _names=nat_name) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        cn = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        sn = batch.column("s_nationkey").to_numpy(zero_copy_only=False)
        key = cn.astype(np.int64) * 1000 + sn.astype(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        csum = np.zeros(len(uk), np.int64)
        cnum = np.zeros(len(uk), np.int64)
        np.add.at(csum, inv, cents)
        np.add.at(cnum, inv, 1)
        return pa.table(
            {
                "cust_nation": pa.array(
                    [_names[int(k // 1000)] for k in uk], pa.string()
                ),
                "supp_nation": pa.array(
                    [_names[int(k % 1000)] for k in uk], pa.string()
                ),
                "revenue_cents": pa.array(csum, pa.int64()),
                "n_items": pa.array(cnum, pa.int64()),
            }
        )

    return (
        ls.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["cust_nation", "supp_nation"])
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_items", alias_name="n_items"),
        )
    )
