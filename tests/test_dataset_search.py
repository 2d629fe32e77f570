"""Dataset-mode search parity with the pandas KGSearcher + the
actor-pool cross-encoder stage (ST3/ST4)."""

import numpy as np
import pandas as pd
import pytest

from graphiti_ray.pipelines.dataset_search import KGDatasetSearcher
from graphiti_ray.pipelines.search import (
    COMBINED_HYBRID_SEARCH_CROSS_ENCODER,
    COMBINED_HYBRID_SEARCH_RRF,
    EDGE_HYBRID_SEARCH_EPISODE_MENTIONS,
    KGSearcher,
    cross_encoder_rerank,
    default_cross_encoder,
)


@pytest.fixture(scope="module")
def kg_tables(ray_session):
    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.sources.pages import pages_dataset

    tables = build_kg(pages_dataset("/root/testdata/sf0.001"), embeddings=True)
    # materialize so both searchers see identical inputs
    return {k: v.materialize() for k, v in tables.items()}


def _pandas_searcher(tables):
    return KGSearcher.from_tables(tables)


@pytest.mark.parametrize(
    "config",
    [
        COMBINED_HYBRID_SEARCH_RRF,
        COMBINED_HYBRID_SEARCH_CROSS_ENCODER,
        EDGE_HYBRID_SEARCH_EPISODE_MENTIONS,
    ],
    ids=["rrf", "cross_encoder", "episode_mentions"],
)
def test_dataset_search_matches_pandas(ray_session, kg_tables, config):
    query = "Alice Smith works at"
    a = _pandas_searcher(kg_tables).search(query, config)
    b = KGDatasetSearcher(kg_tables).search(query, config)
    for kind in ("edges", "nodes", "episodes"):
        pa_df, ds_df = getattr(a, kind), getattr(b, kind)
        assert list(pa_df.get("uuid", [])) == list(ds_df.get("uuid", [])), kind


def test_dataset_search_group_scoped(ray_session, kg_tables):
    query = "Alice Smith works at"
    # deterministic group choice: the top unscoped hit's group (block order
    # of take(1) varies across executions)
    top = _pandas_searcher(kg_tables).search(query, COMBINED_HYBRID_SEARCH_RRF)
    groups = [top.edges["group_id"].iloc[0]]
    a = _pandas_searcher(kg_tables).search(
        query, COMBINED_HYBRID_SEARCH_RRF, group_ids=groups
    )
    b = KGDatasetSearcher(kg_tables).search(
        query, COMBINED_HYBRID_SEARCH_RRF, group_ids=groups
    )
    assert list(a.edges["uuid"]) == list(b.edges["uuid"])
    assert set(b.edges["group_id"]) <= set(groups)


def test_cross_encoder_stage_actor_pool(ray_session, kg_tables):
    """The dataset-mode reranker stage: actor pool scores, sort, limit —
    must agree with the driver-side kernel on the same rows."""
    edges = kg_tables["edges"]
    query = "works at Initech"
    top = cross_encoder_rerank(edges, query, "fact", limit=5).to_pandas()
    assert len(top) == 5
    # oracle: score every fact with the same deterministic model
    df = edges.to_pandas()
    scores = default_cross_encoder(query, df["fact"].tolist())
    want = (
        pd.DataFrame({"uuid": df["uuid"], "s": scores})
        .sort_values(["s", "uuid"], ascending=[False, True])
        .head(5)["uuid"]
        .tolist()
    )
    assert top["uuid"].tolist() == want
    assert list(top["ce_score"]) == sorted(top["ce_score"], reverse=True)
