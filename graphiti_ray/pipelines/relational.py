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
