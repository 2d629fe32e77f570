"""Maintenance / CRUD surface over the materialized tables (S8/S10/§2.10).

The reference exposes per-element getters and cascade deletes through
Neo4j; here they are thin, predicate-pushdown dataset ops over the parquet
tables. Broadcast membership filters replace key lookups (no shuffle).

- ``get_by_uuids``        uuid-list semi-join (nodes.py:178-294 family)
- ``get_by_group_ids``    cursored scan: uuid < cursor DESC LIMIT n
                          (nodes.py:238-259 pagination shape)
- ``add_triplet``         direct fact injection bypassing extraction
                          (graphiti.py:736-774): builds the two entity
                          rows + one edge row with deterministic ids and
                          unions them into the tables
- ``remove_episode``      cascade delete (graphiti.py:776-805): drop the
                          episode, its MENTIONS edges, edges whose ONLY
                          provenance it was, and entities mentioned by no
                          other episode — anti-joins via broadcast sets
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa

import ray.data as rd

from graphiti_ray.functions.text import edge_uuid, entity_uuid
from graphiti_ray.stages.extract import DEFAULT_RUN_TS


def _broadcast_filter(ds: rd.Dataset, col: str, keep: set, negate: bool = False):
    import ray

    ref = ray.put(frozenset(keep))

    class F:
        def __init__(self, r):
            import ray as _r

            self.keys = _r.get(r)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vals = batch.column(col).to_pylist()
            mask = pa.array(
                [(v not in self.keys) if negate else (v in self.keys) for v in vals],
                pa.bool_(),
            )
            return batch.filter(mask)

    return ds.map_batches(
        F, fn_constructor_args=(ref,), batch_format="pyarrow",
        zero_copy_batch=True, concurrency=(1, 4),
    )


def get_by_uuids(ds: rd.Dataset, uuids: list[str], col: str = "uuid") -> rd.Dataset:
    """Semi-join on a uuid list (broadcast set, streaming filter)."""
    return _broadcast_filter(ds, col, set(uuids))


def get_by_group_ids(
    ds: rd.Dataset,
    group_ids: list[str],
    limit: int = 100,
    uuid_cursor: str | None = None,
) -> rd.Dataset:
    """Cursored pagination: rows in the groups with uuid < cursor,
    ordered uuid DESC, first `limit` (reference cursor scan shape)."""
    out = _broadcast_filter(ds, "group_id", set(group_ids))
    if uuid_cursor is not None:
        import pyarrow.compute as pc

        out = out.map_batches(
            lambda t: t.filter(pc.less(t.column("uuid"), uuid_cursor)),
            batch_format="pyarrow",
        )
    return out.sort("uuid", descending=True).limit(limit)


def add_triplet(
    tables: dict[str, rd.Dataset],
    group_id: str,
    subj_name: str,
    predicate: str,
    obj_name: str,
    fact: str | None = None,
    valid_at: datetime | None = None,
    run_ts: datetime = DEFAULT_RUN_TS,
) -> dict[str, rd.Dataset]:
    """Inject one fact directly (add_triplet, graphiti.py:736-774).

    Deterministic ids mean re-adding the same triplet is idempotent after
    the next merge pass; here we union rows in (callers re-run
    merge/invalidation when batching many injections).
    """
    s_uuid = entity_uuid(group_id, subj_name)
    o_uuid = entity_uuid(group_id, obj_name)
    e_uuid = edge_uuid(group_id, s_uuid, predicate, o_uuid)
    fact = fact or f"{subj_name} {predicate.lower().replace('_', ' ')} {obj_name}."
    valid_at = valid_at or run_ts

    def rows_as(ds: rd.Dataset, rows: list[dict]) -> rd.Dataset:
        """Build an arrow table matching ds's schema exactly (missing
        fields → nulls) so union() doesn't hit schema drift."""
        sch = ds.schema().base_schema
        cols = {
            f.name: pa.array([r.get(f.name) for r in rows], f.type) for f in sch
        }
        return rd.from_arrow(pa.table(cols))

    node_rows = [
        {
            "uuid": u,
            "name": n,
            "group_id": group_id,
            "labels": ["Entity"],
            "summary": f"Entity {n}",
            "mention_count": 0,
        }
        for u, n in [(s_uuid, subj_name), (o_uuid, obj_name)]
    ]
    edge_rows = [
        {
            "uuid": e_uuid,
            "group_id": group_id,
            "subj_uuid": s_uuid,
            "pred": predicate,
            "obj_uuid": o_uuid,
            "subj_canonical": subj_name,
            "obj_canonical": obj_name,
            "fact": fact,
            "valid_at": valid_at,
            "episodes": [],
            "episode_count": 0,
            "created_at": run_ts,
            "invalid_at": None,
            "expired_at": None,
        }
    ]
    existing_node_uuids = {
        r["uuid"] for r in tables["nodes"].select_columns(["uuid"]).take_all()
    }
    node_rows = [r for r in node_rows if r["uuid"] not in existing_node_uuids]
    out = dict(tables)
    if node_rows:
        out["nodes"] = tables["nodes"].union(rows_as(tables["nodes"], node_rows))
    out["edges"] = tables["edges"].union(rows_as(tables["edges"], edge_rows))
    return out


def episode_entity_edges(edges: rd.Dataset) -> rd.Dataset:
    """(episode_uuid, entity_edges): the fact-edge uuids each episode
    produced (EpisodicNode.entity_edges, nodes.py:156; filled at
    graphiti.py:421) — explode edge provenance, group by episode.
    Combiner-first: explode emits (episode, edge) pairs per batch, the
    groupby collects the (small) per-episode lists."""
    import pandas as pd

    def explode(batch: pa.Table) -> pa.Table:
        eps_lists = batch.column("episodes").to_pylist()
        uuids = batch.column("uuid").to_pylist()
        o_ep, o_edge = [], []
        for u, lst in zip(uuids, eps_lists):
            for ep in lst or []:
                o_ep.append(ep)
                o_edge.append(u)
        return pa.table(
            {
                "episode_uuid": pa.array(o_ep, pa.string()),
                "edge_uuid": pa.array(o_edge, pa.string()),
            }
        )

    def collect_block(tbl: pa.Table) -> pa.Table:
        """COMPLETE episode runs, rows sorted by (episode_uuid, edge_uuid)
        — one Python call per block, not per episode (episode count is
        corpus-sized). Fully Arrow: run detection, the per-run edge list
        assembly (ListArray from run offsets) and the join all stay in C++."""
        import pyarrow.compute as pc

        if tbl.num_rows == 0:
            return pa.table(
                {
                    "episode_uuid": pa.array([], pa.string()),
                    "entity_edges": pa.array([], pa.string()),
                }
            )
        from graphiti_ray.stages.ops import _col_array, _table_run_starts

        starts = _table_run_starts(tbl, ["episode_uuid"])
        lists = pa.ListArray.from_arrays(
            pa.array(starts, pa.int32()), _col_array(tbl, "edge_uuid")
        )
        return pa.table(
            {
                "episode_uuid": tbl.column("episode_uuid").take(
                    pa.array(starts[:-1], pa.int64())
                ),
                # edge uuids already sorted by the range sort
                "entity_edges": pc.binary_join(lists, ","),
            }
        )

    from graphiti_ray.stages.ops import sorted_run_map

    return sorted_run_map(
        edges.select_columns(["uuid", "episodes"]).map_batches(
            explode, batch_format="pyarrow", zero_copy_batch=True
        ),
        key_cols=["episode_uuid"],
        order_cols=["edge_uuid"],
        block_fn=collect_block,
    )


def clear_groups(
    tables: dict[str, rd.Dataset], group_ids: list[str]
) -> dict[str, rd.Dataset]:
    """Wipe whole graph partitions (clear_data with group_ids,
    graph_data_operations.py:97-112): drop every row of the given groups
    from every table — a streaming anti-filter, no shuffle."""
    gs = set(group_ids)
    return {
        name: _broadcast_filter(ds, "group_id", gs, negate=True)
        if "group_id" in ds.schema().names
        else ds
        for name, ds in tables.items()
    }


def remove_episode(
    tables: dict[str, rd.Dataset], episode_uuid: str
) -> dict[str, rd.Dataset]:
    """Cascade delete (graphiti.py:776-805): remove the episode; drop edges
    whose only provenance was this episode (otherwise just strip it from
    their provenance); drop entities mentioned only here."""
    mentions = tables["mentions"]
    # entities mentioned by this episode vs by others
    mine = {
        r["entity_uuid"]
        for r in _broadcast_filter(mentions, "episode_uuid", {episode_uuid})
        .select_columns(["entity_uuid"])
        .take_all()
    }
    others = {
        r["entity_uuid"]
        for r in _broadcast_filter(mentions, "episode_uuid", {episode_uuid}, negate=True)
        .select_columns(["entity_uuid"])
        .take_all()
    }
    orphan_entities = mine - others

    def strip_edges(batch: pa.Table) -> pa.Table:
        eps = batch.column("episodes").to_pylist()
        keep_rows, new_eps, new_counts = [], [], []
        for i, lst in enumerate(eps):
            lst = [e for e in (lst or []) if e != episode_uuid]
            if not lst and (batch.column("episode_count")[i].as_py() or 0) > 0:
                continue  # only provenance was this episode → drop edge
            keep_rows.append(i)
            new_eps.append(lst)
            new_counts.append(len(lst))
        out = batch.take(pa.array(keep_rows, pa.int64()))
        idx = out.column_names.index("episodes")
        out = out.set_column(idx, "episodes", pa.array(new_eps, pa.list_(pa.string())))
        idx = out.column_names.index("episode_count")
        return out.set_column(idx, "episode_count", pa.array(new_counts, pa.int64()))

    out = dict(tables)
    out["episodes"] = _broadcast_filter(
        tables["episodes"], "uuid", {episode_uuid}, negate=True
    )
    out["mentions"] = _broadcast_filter(
        mentions, "episode_uuid", {episode_uuid}, negate=True
    )
    out["edges"] = tables["edges"].map_batches(
        strip_edges, batch_format="pyarrow", zero_copy_batch=True
    )
    out["nodes"] = _broadcast_filter(tables["nodes"], "uuid", orphan_entities, negate=True)
    return out


def integrity_counts(tables: dict[str, rd.Dataset]) -> rd.Dataset:
    """Referential-integrity audit over the KG tables — the data-quality
    gate a production graph pipeline runs after every build (reference
    analogue: Neo4j's FK-by-construction via MERGE; a parquet-table graph
    must CHECK instead): table row totals plus dangling-FK counts, all
    dataset-side via hash-partitioned ``left_anti`` joins (never a driver
    set).

    Output (one row, int64): n_episodes, n_nodes, n_edges,
    edges_dangling_subj, edges_dangling_obj, nodes_without_edges.
    The dangling counts are structurally 0 for this engine (edges are
    built FROM the canonical map that builds nodes) — the audit proves
    that invariant end-to-end, and reports honest nonzero counts for
    externally-loaded tables.
    """
    from graphiti_ray.stages.link import default_join_partitions, safe_join

    parts = default_join_partitions()
    nodes_u = tables["nodes"].select_columns(["uuid"])

    def anti_count(left: rd.Dataset, right: rd.Dataset) -> int:
        return safe_join(
            left, right, join_type="left_anti", num_partitions=parts, on=("uuid",)
        ).count()

    def ref_col(col: str) -> rd.Dataset:
        return tables["edges"].select_columns([col]).map_batches(
            lambda t, _c=col: pa.table({"uuid": t.column(_c)}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    dang_subj = anti_count(ref_col("subj_uuid"), nodes_u)
    dang_obj = anti_count(ref_col("obj_uuid"), nodes_u)
    refs = ref_col("subj_uuid").union(ref_col("obj_uuid"))
    from graphiti_ray.stages.ops import distinct_by_key

    no_edges = anti_count(nodes_u, distinct_by_key(refs, "uuid"))

    return rd.from_arrow(
        pa.table(
            {
                "n_episodes": pa.array([tables["episodes"].count()], pa.int64()),
                "n_nodes": pa.array([tables["nodes"].count()], pa.int64()),
                "n_edges": pa.array([tables["edges"].count()], pa.int64()),
                "edges_dangling_subj": pa.array([dang_subj], pa.int64()),
                "edges_dangling_obj": pa.array([dang_obj], pa.int64()),
                "nodes_without_edges": pa.array([no_edges], pa.int64()),
            }
        )
    )
