"""Search layer: RRF/MMR/rerankers kernels (FIXTURES F6) + hybrid search
end-to-end over a small built graph."""

from datetime import datetime

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graphiti_ray.pipelines.search import (
    BM25Index,
    COMBINED_HYBRID_SEARCH_MMR,
    COMBINED_HYBRID_SEARCH_RRF,
    DateFilter,
    EDGE_HYBRID_SEARCH_EPISODE_MENTIONS,
    KGSearcher,
    SearchFilters,
    episode_mentions_rerank,
    maximal_marginal_relevance,
    node_distance_rerank,
    rrf,
)


def test_rrf_hand_computed():
    # uuid b: ranks 0 and 1 → 1/1 + 1/2 = 1.5 ; a: 1/1 = 1.0 ; c: 1/2 = 0.5
    out = rrf([["b", "c"], ["a", "b"]])
    assert out == ["b", "a", "c"]


def test_rrf_deterministic_tiebreak():
    out = rrf([["a"], ["b"]])
    assert out == ["a", "b"]  # equal scores → uuid order


def test_mmr_lambda_extremes():
    q = np.array([1.0, 0.0])
    cands = {
        "dup1": np.array([1.0, 0.0]),
        "dup2": np.array([1.0, 0.001]),
        "diverse": np.array([0.6, 0.8]),
    }
    # λ=1 → pure relevance: exact match first
    rel_first = maximal_marginal_relevance(q, cands, lambda_param=1.0)
    assert rel_first[0] in ("dup1", "dup2")
    # λ=0 → pure anti-redundancy: the diverse vector wins (one-shot MMR,
    # score = -max pairwise sim; dups score ≈ -1, diverse ≈ -0.6)
    div_first = maximal_marginal_relevance(q, cands, lambda_param=0.0)
    assert div_first[0] == "diverse"


def test_episode_mentions_rerank():
    assert episode_mentions_rerank(["a", "b", "c"], {"a": 1, "b": 5}) == ["b", "a", "c"]


def test_node_distance_rerank():
    out = node_distance_rerank(["x", "y", "center"], {"x": 2, "y": 1}, "center")
    assert out == ["center", "y", "x"]


def test_bm25_index_ranks_rarer_terms_higher():
    idx = BM25Index(
        n_docs=10, avg_len=5, df={"common": 9, "rare": 1}
    )
    assert idx.idf("rare") > idx.idf("common")
    assert idx.score(["rare"], "rare words here") > idx.score(
        ["common"], "common words here"
    )


def test_date_filter_ops():
    s = pd.Series([datetime(2024, 1, 1), datetime(2024, 6, 1), pd.NaT])
    assert DateFilter(datetime(2024, 3, 1), ">").apply(s).tolist() == [
        False,
        True,
        False,
    ]
    assert DateFilter(None, "is_null").apply(s).tolist() == [False, False, True]


@pytest.fixture(scope="module")
def searcher(ray_session):
    from graphiti_ray.pipelines.kg import build_kg
    from tests.test_pipeline_e2e import _pages_table

    T = [datetime(2024, 1, d + 1) for d in range(6)]
    pages = rd.from_arrow(
        _pages_table(
            [
                ("Alice Smith works at Acme Corp.", "g1", T[0]),
                ("Alice Smith likes Bob Jones.", "g1", T[1]),
                ("Bob Jones works at Globex Inc.", "g1", T[2]),
                ("Acme Corp is located in Paris.", "g1", T[3]),
                ("Alice Smith likes Bob Jones.", "g1", T[4]),
            ]
        )
    )
    tables = build_kg(pages, num_partitions=2, nlp_concurrency=(1, 2))
    return KGSearcher.from_tables(tables)


def test_hybrid_node_search(searcher):
    res = searcher.search("Alice Smith", COMBINED_HYBRID_SEARCH_RRF)
    assert res.nodes.iloc[0]["name"] == "Alice Smith"


def test_hybrid_edge_search_finds_fact(searcher):
    res = searcher.search("works at Acme", COMBINED_HYBRID_SEARCH_RRF)
    assert any("works at" in f for f in res.edges["fact"])


def test_episode_mentions_reranker_prefers_repeated_fact(searcher):
    res = searcher.search("likes", EDGE_HYBRID_SEARCH_EPISODE_MENTIONS)
    top = res.edges.iloc[0]
    assert top["pred"] == "LIKES" and top["episode_count"] == 2


def test_mmr_recipe_runs(searcher):
    res = searcher.search("Alice", COMBINED_HYBRID_SEARCH_MMR)
    assert len(res.nodes) >= 1


def test_group_scope(searcher):
    res = searcher.search(
        "Alice Smith", COMBINED_HYBRID_SEARCH_RRF, group_ids=["nope.example.com"]
    )
    assert res.nodes.empty and res.edges.empty


def test_temporal_filter(searcher):
    flt = SearchFilters(
        valid_at=[[DateFilter(datetime(2024, 1, 3), ">=")]]
    )
    res = searcher.search("works at", COMBINED_HYBRID_SEARCH_RRF, search_filter=flt)
    assert (res.edges["valid_at"] >= datetime(2024, 1, 3)).all()


def test_cross_encoder_hook(searcher):
    def fake_ce(query, passages):
        return [float(query.split()[0] in p) for p in passages]

    searcher.cross_encoder = fake_ce
    from graphiti_ray.pipelines.search import MethodConfig, SearchConfig

    cfg = SearchConfig(
        edge_config=MethodConfig(reranker="cross_encoder"),
        node_config=None,
        episode_config=None,
    )
    res = searcher.search("Paris located", cfg)
    if len(res.edges):
        assert "Paris" in res.edges.iloc[0]["fact"]


def test_bm25_dataset_resident_stats_match_dict_path(ray_session):
    """Above the driver-term limit, build_bm25_index keeps stats in the
    object store (DatasetBM25Stats); scores must equal the dict path and
    the driver must hold only the queried terms' dfs."""
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from graphiti_ray.pipelines.search import (
        BM25Index,
        DatasetBM25Stats,
        _tokens,
        bm25_score_texts,
        build_bm25_index,
    )

    texts = [
        f"alpha beta gamma doc{i} unique{i} filler{i % 7} spark stream"
        for i in range(50)
    ]
    ds = rd.from_items([{"text": t} for t in texts])
    small = build_bm25_index(ds, "text")
    assert isinstance(small, BM25Index)
    big = build_bm25_index(ds, "text", max_driver_terms=5)
    assert isinstance(big, DatasetBM25Stats)
    assert big.n == small.n and abs(big.avg_len - small.avg_len) < 1e-12

    q = _tokens("alpha spark unique3 missingterm")
    s_small = bm25_score_texts(small, q, pd.Series(texts))
    s_big = bm25_score_texts(big, q, pd.Series(texts))
    assert np.allclose(s_small, s_big, rtol=0, atol=0)
    # per-doc scorer agrees with the vectorized kernel
    s_rows = np.array([small.score(q, t) for t in texts])
    assert np.allclose(s_small, s_rows, rtol=0, atol=1e-12)
    # driver footprint: only queried terms cached, nothing vocabulary-sized
    assert set(big._df_cache) == set(q)
    assert big._df_cache["missingterm"] == 0


def test_phrase_search_adjacency_and_boundaries(ray_session):
    import ray.data as rd

    from graphiti_ray.pipelines.search import phrase_search

    docs = [
        {"doc_id": 0, "text": "alpha beta gamma delta"},
        {"doc_id": 1, "text": "beta gamma"},            # phrase at the end
        {"doc_id": 2, "text": "alpha gamma beta"},      # terms present, wrong order
        {"doc_id": 3, "text": "beta gamma beta gamma"}, # repeated — one row
        {"doc_id": 4, "text": "betagamma"},             # no token boundary
    ]
    out = phrase_search(
        rd.from_items(docs).repartition(2), ["beta gamma", "gamma delta"]
    ).to_pandas()
    got = set(zip(out.phrase, out.doc_id))
    assert got == {
        ("beta gamma", 0), ("beta gamma", 1), ("beta gamma", 3),
        ("gamma delta", 0),
    }


def test_proximity_search_window_and_order(ray_session):
    import ray.data as rd_

    from graphiti_ray.pipelines.search import proximity_search

    docs = rd_.from_items(
        [
            # 'alpha' at 0, 'beta' at 3 -> dist 3 (boundary hit)
            {"doc_id": 1, "text": "alpha x y beta"},
            # reversed order: 'beta' at 0, 'alpha' at 2 -> dist 2
            {"doc_id": 2, "text": "beta z alpha"},
            # too far: dist 4
            {"doc_id": 3, "text": "alpha a b c beta"},
            # repeated occurrences: nearest pair wins (alpha@5, beta@6 -> 1)
            {"doc_id": 4, "text": "alpha q q q q alpha beta"},
            # one term missing
            {"doc_id": 5, "text": "alpha only here"},
        ]
    )
    out = proximity_search(docs, [("alpha", "beta")], window=3).to_pandas()
    got = {r.doc_id: r.min_dist for r in out.itertuples()}
    assert got == {1: 3, 2: 2, 4: 1}


def test_yesno_classifier_scorer_margins(ray_session):
    from graphiti_ray.pipelines.search import yesno_classifier_scorer

    scores = yesno_classifier_scorer(
        "alice smith", ["Alice Smith Corp", "alice only", "nobody here", ""]
    )
    assert scores == [1_000_000.0, 0.0, -1_000_000.0, -1_000_000.0]
    # empty query -> all zeros
    assert yesno_classifier_scorer("", ["x"]) == [0.0]


def test_classifier_rerank_through_actor_pool(ray_session):
    import ray.data as rd_

    from graphiti_ray.pipelines.search import classifier_rerank

    ds = rd_.from_items(
        [
            {"uuid": "u1", "name": "alice smith"},
            {"uuid": "u2", "name": "bob smith"},
            {"uuid": "u3", "name": "charlie"},
        ]
    )
    out = classifier_rerank(ds, "alice smith", "name", limit=3).to_pandas()
    assert out.uuid.tolist() == ["u1", "u2", "u3"]
    assert out.ce_score.tolist() == [1_000_000.0, 0.0, -1_000_000.0]


def test_best_snippet_density_and_ties(ray_session):
    import ray.data as rd_

    from graphiti_ray.pipelines.search import best_snippet

    docs = rd_.from_items(
        [
            # hits at 0 and 9 (inside w=10 from 0), denser pair at 20,21
            {"doc_id": 1, "text": "hit a b c d e f g h hit "
                                  + "x " * 10 + "hit hit"},
            # single hit
            {"doc_id": 2, "text": "a hit b"},
            # no hits -> absent
            {"doc_id": 3, "text": "nothing here"},
        ]
    )
    out = (
        best_snippet(docs, ["hit"], window=10)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.index.tolist() == [1, 2]
    assert out.loc[1].tolist() == [0, 2] or out.loc[1].tolist() == [20, 2]
    # tie between window@0 (hits 0,9) and window@20 (hits 20,21): the
    # smaller anchor wins
    assert out.loc[1, "anchor_pos"] == 0
    assert out.loc[2].tolist() == [1, 1]


def test_bm25_batch_per_query_topk(ray_session):
    import __ray_entry__ as e

    out = e.queries()["docs_bm25_batch"]("/root/testdata/sf0.001").to_pandas()
    # 3 queries x top-10, each block sorted desc with doc_id ties asc
    assert sorted(out.query_id.unique()) == [0, 1, 2]
    for qi, grp in out.groupby("query_id"):
        assert len(grp) == 10
        s = grp.sort_values(["bm25", "doc_id"], ascending=[False, True])
        assert (s.doc_id.values == grp.doc_id.values).all()
        assert (grp.bm25 > 0).all()
