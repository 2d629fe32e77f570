"""Hash-join fallbacks for the linking application (used above
link.BROADCAST_LIMIT where the canonical map no longer fits a broadcast)."""

from __future__ import annotations

import pandas as pd
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

    def first_row(g: pd.DataFrame) -> pd.DataFrame:
        r = g.iloc[[0]][["episode_uuid", "entity_uuid", "group_id"]].copy()
        r["uuid"] = md5_hex(f"{r['episode_uuid'].iloc[0]}|{r['entity_uuid'].iloc[0]}")
        return r

    return (
        joined.map_batches(dedup_batch, batch_format="pyarrow")
        .groupby(["episode_uuid", "entity_uuid"])
        .map_groups(first_row, batch_format="pandas")
    )
