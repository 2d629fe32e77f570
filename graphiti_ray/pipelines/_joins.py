"""Hash-join fallbacks for the linking application (used above
link.BROADCAST_LIMIT where the canonical map no longer fits a broadcast)."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from graphiti_ray.functions.text import md5_hex
from graphiti_ray.stages.link import _with_key, default_join_partitions


def mention_edges_join(
    mentions: rd.Dataset, canon: rd.Dataset, num_partitions: int | None = None
) -> rd.Dataset:
    """MENTIONS edges via hash-partitioned join (scale path of
    pipelines/kg.mention_edges_broadcast)."""
    if num_partitions is None:
        num_partitions = default_join_partitions()
    cmap = _with_key(
        canon.select_columns(["group_id", "name", "entity_uuid"]), "mkey", "name"
    ).drop_columns(["group_id", "name"])
    m = _with_key(
        mentions.select_columns(["episode_uuid", "group_id", "name"]), "mkey", "name"
    )
    from graphiti_ray.stages.link import safe_join

    joined = safe_join(
        m, cmap, join_type="inner", num_partitions=num_partitions, on=("mkey",)
    ).drop_columns(["mkey", "name"])

    def dedup_batch(batch: pa.Table) -> pa.Table:
        return batch.group_by(["episode_uuid", "entity_uuid", "group_id"]).aggregate([])

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.binary_join_element_wise(
            batch.column("episode_uuid"), batch.column("entity_uuid"), "|"
        )
        return pa.table(
            {
                "uuid": pa.array(
                    [md5_hex(k) for k in key.to_pylist()], pa.string()
                ),
                "group_id": batch.column("group_id"),
                "episode_uuid": batch.column("episode_uuid"),
                "entity_uuid": batch.column("entity_uuid"),
            }
        )

    # per-batch combiner → content-hash uuid → exact distinct via sort +
    # adjacent dedup (ops.distinct_by_key) — the same shape as the
    # broadcast path, with NO per-pair map_groups dispatch (this is the
    # above-BROADCAST_LIMIT web-scale path, where pair count is
    # corpus-sized and per-key Python would dominate)
    from graphiti_ray.stages.ops import distinct_by_key

    mapped = joined.map_batches(dedup_batch, batch_format="pyarrow").map_batches(
        finish, batch_format="pyarrow"
    )
    return distinct_by_key(mapped, "uuid")
