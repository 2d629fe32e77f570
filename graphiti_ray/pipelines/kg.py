"""The flagship pipeline: pages → temporal knowledge graph tables.

Generalizes ``Graphiti.add_episode`` (graphiti.py:267-484) /
``add_episode_bulk`` (graphiti.py:487-598) to a dataset-parallel run —
including the temporal invalidation pass that bulk mode skips
(graphiti.py:520-523 marks that a WIP; we run T1 always):

    pages ─ mb ─→ episodes ─ mb-actor ─→ mentions ─ gb ─→ canonical map
                     │                                        │
                     └─ mb-actor ─→ triples ── join ──────────┤
                                                              ▼
        nodes ←─ gb ── canonical map          resolved triples
        mention_edges ←─ join                 │ gb(edge key) merge
                                              ▼
                              edges ←─ gb(inval key) temporal sweep

Two drivers:
- ``build_kg``      in-memory datasets (tests, driver queries);
- ``run_kg``        checkpointed parquet run (bench, production shape):
                    each table lands under <out_root>/<table>/ with
                    MANIFEST.json lineage + _SUCCESS (state/checkpoint.py),
                    so a killed run resumes at the first incomplete table.
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa

import ray.data as rd

import graphiti_ray as gr
from graphiti_ray.functions.text import md5_hex
from graphiti_ray.sources.pages import pages_dataset
from graphiti_ray.stages.extract import DEFAULT_RUN_TS, episodes_dataset
from graphiti_ray.stages.embed import with_embedding
from graphiti_ray.stages.link import (
    apply_canonical,
    canonical_map,
    nodes_from_canonical,
    _with_key,
)
from graphiti_ray.stages.nlp import mentions_dataset, triples_dataset
from graphiti_ray.stages.temporal import (
    episodes_to_list,
    invalidation_sweep,
    merged_edges,
)


def mention_edges(
    mentions: rd.Dataset, canon: rd.Dataset, num_partitions: int | None = None
) -> rd.Dataset:
    """MENTIONS provenance edges (EpisodicEdge, edges.py:94-108; built per
    (episode, extracted entity) like build_episodic_edges,
    edge_operations.py:45-62) — distinct (episode_uuid, entity_uuid)."""
    from graphiti_ray.stages.link import default_join_partitions

    if num_partitions is None:
        num_partitions = default_join_partitions()
    cmap = _with_key(
        canon.select_columns(["group_id", "name", "entity_uuid"]), "mkey", "name"
    ).drop_columns(["group_id", "name"])
    m = _with_key(
        mentions.select_columns(["episode_uuid", "group_id", "name"]), "mkey", "name"
    )
    joined = m.join(
        cmap, join_type="inner", num_partitions=num_partitions, on=("mkey",)
    ).drop_columns(["mkey", "name"])

    def dedup_batch(batch: pa.Table) -> pa.Table:
        return batch.group_by(
            ["episode_uuid", "entity_uuid", "group_id"]
        ).aggregate([])

    # batch-level combiner, then exact distinct via groupby on the pair
    import pandas as pd

    def first_row(g: pd.DataFrame) -> pd.DataFrame:
        r = g.iloc[[0]][["episode_uuid", "entity_uuid", "group_id"]].copy()
        r["uuid"] = md5_hex(f"{r['episode_uuid'].iloc[0]}|{r['entity_uuid'].iloc[0]}")
        return r

    return (
        joined.map_batches(dedup_batch, batch_format="pyarrow")
        .groupby(["episode_uuid", "entity_uuid"])
        .map_groups(first_row, batch_format="pandas")
    )


def build_kg(
    pages: rd.Dataset,
    run_ts: datetime = DEFAULT_RUN_TS,
    num_partitions: int | None = None,
    nlp_concurrency=(1, 8),
    embeddings: bool = True,
) -> dict[str, rd.Dataset]:
    """All KG tables as (mostly lazy) datasets from an in-memory pages input.

    Episodes are materialized once — they feed two extraction branches and
    re-running HTML extraction per consumer would double the heaviest map.
    At production scale use ``run_kg`` (parquet checkpoint instead of
    object-store pin).
    """
    episodes = episodes_dataset(pages, run_ts=run_ts).materialize()
    mentions = mentions_dataset(episodes, concurrency=nlp_concurrency)
    canon = canonical_map(mentions).materialize()  # small: distinct surfaces
    nodes = nodes_from_canonical(canon)
    if embeddings:
        nodes = with_embedding(nodes, "name", "name_embedding")

    triples = triples_dataset(episodes, concurrency=nlp_concurrency)
    resolved = apply_canonical(triples, canon, num_partitions=num_partitions)
    edges = invalidation_sweep(merged_edges(resolved, run_ts), run_ts)
    if embeddings:
        edges = with_embedding(edges, "fact", "fact_embedding")
    edges = episodes_to_list(edges)

    m_edges = mention_edges(mentions, canon, num_partitions=num_partitions)
    return {
        "episodes": episodes,
        "mentions": m_edges,
        "nodes": nodes,
        "edges": edges,
        "canonical_map": canon,
    }


def run_kg(
    sf_dir: str,
    out_root: str,
    run_ts: datetime = DEFAULT_RUN_TS,
    num_partitions: int | None = None,
    nlp_concurrency=(1, 8),
    embeddings: bool = True,
) -> list[dict]:
    """Checkpointed staged run: every stage boundary is a parquet table with
    lineage + metrics; a rerun skips completed tables (resumability
    criterion, BASELINE.md)."""
    from graphiti_ray.state.checkpoint import (
        checkpointed_write,
        is_complete,
        read_table,
    )

    lineage = {
        "input": sf_dir,
        "versions": {
            "pagegen": gr.PAGEGEN_VERSION,
            "extract": gr.TEXT_EXTRACT_VERSION,
            "embed": gr.EMBED_VERSION,
        },
    }
    metrics: list[dict] = []

    if not is_complete(out_root, "episodes"):
        episodes = episodes_dataset(pages_dataset(sf_dir), run_ts=run_ts)
        metrics.append(checkpointed_write(episodes, out_root, "episodes", lineage))
    else:
        metrics.append({"table": "episodes", "skipped": True})
    episodes = read_table(out_root, "episodes")

    if not is_complete(out_root, "canonical_map"):
        canon = canonical_map(mentions_dataset(episodes, concurrency=nlp_concurrency))
        metrics.append(checkpointed_write(canon, out_root, "canonical_map", lineage))
    else:
        metrics.append({"table": "canonical_map", "skipped": True})
    canon = read_table(out_root, "canonical_map")

    if not is_complete(out_root, "nodes"):
        nodes = nodes_from_canonical(canon)
        if embeddings:
            nodes = with_embedding(nodes, "name", "name_embedding")
        metrics.append(checkpointed_write(nodes, out_root, "nodes", lineage))
    else:
        metrics.append({"table": "nodes", "skipped": True})

    if not is_complete(out_root, "mention_edges"):
        m = mentions_dataset(episodes, concurrency=nlp_concurrency)
        metrics.append(
            checkpointed_write(
                mention_edges(m, canon, num_partitions), out_root, "mention_edges", lineage
            )
        )
    else:
        metrics.append({"table": "mention_edges", "skipped": True})

    if not is_complete(out_root, "edges"):
        triples = triples_dataset(episodes, concurrency=nlp_concurrency)
        resolved = apply_canonical(triples, canon, num_partitions=num_partitions)
        edges = invalidation_sweep(merged_edges(resolved, run_ts), run_ts)
        if embeddings:
            edges = with_embedding(edges, "fact", "fact_embedding")
        edges = episodes_to_list(edges)
        metrics.append(checkpointed_write(edges, out_root, "edges", lineage))
    else:
        metrics.append({"table": "edges", "skipped": True})
    return metrics
