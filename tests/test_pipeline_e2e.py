"""End-to-end Ray pipeline tests on tiny in-memory fixtures (FIXTURES F3/F4).

The canonical Alice/Bob temporal scenario from the reference's integration
tests (tests/utils/maintenance/test_temporal_operations_int.py:44-120) run
through the full dataset pipeline: pages → episodes → extraction → linking
→ merge → invalidation sweep.
"""

from datetime import datetime

import pyarrow as pa
import pytest

import ray.data as rd

from graphiti_ray.pipelines.kg import build_kg
from graphiti_ray.sources.pages import render_page

T = [datetime(2024, 1, d + 1) for d in range(10)]


def _pages_table(rows, start: int = 0):
    """rows: list of (doc_like_text, source, ts). Builds a pages table whose
    html wraps the text (render_page injects the pg1 facts — avoid that here
    by wrapping manually). ``start`` offsets the url index (distinct urls
    across incremental batches)."""
    urls, htmls, texts, tss = [], [], [], []
    for i, (text, source, ts) in enumerate(rows, start=start):
        url = f"https://{source}.example.com/p/{i}"
        body = "".join(f"<p>{p}</p>" for p in text.split("\n"))
        html = (
            f'<html><body><nav>x</nav><div id="main">{body}</div>'
            f"<footer>f</footer></body></html>"
        ).encode()
        urls.append(url)
        htmls.append(html)
        texts.append(text)
        tss.append(ts)
    return pa.table(
        {
            "url": pa.array(urls),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(rows)),
        }
    )


@pytest.fixture(scope="module")
def alice_graph(ray_session):
    pages = rd.from_arrow(
        _pages_table(
            [
                ("Alice Smith likes Bob Jones.", "g1", T[0]),
                ("Alice dislikes Bob Jones.", "g1", T[2]),
                ("Alice Smith likes Bob Jones.", "g1", T[4]),  # re-assertion
                ("A. Smith works at Acme Corp.", "g1", T[1]),
                ("Alice Smith works at Globex Inc.", "g1", T[3]),
                ("Paris is nice.", "g2", T[0]),
                ("Alice likes Bob Jones.", "g2", T[1]),  # other group
            ]
        )
    )
    tables = build_kg(pages, num_partitions=2, nlp_concurrency=(1, 2))
    return {k: v.to_pandas() for k, v in tables.items()}


def test_alias_cluster_one_node(alice_graph):
    nodes = alice_graph["nodes"]
    g1 = nodes[nodes.group_id == "g1.example.com"]
    # Alice Smith (+ Alice, A. Smith) is ONE node
    assert (g1.name == "Alice Smith").sum() == 1
    assert "Alice" not in set(g1.name) and "A. Smith" not in set(g1.name)


def test_cross_group_entities_not_merged(alice_graph):
    nodes = alice_graph["nodes"]
    # "Alice" in g2 has no in-group full form → its own canonical, distinct uuid
    g2 = nodes[nodes.group_id == "g2.example.com"]
    assert "Alice" in set(g2.name)
    alice_uuids = set(nodes[nodes.name.isin(["Alice", "Alice Smith"])].uuid)
    assert len(alice_uuids) == 2


def test_temporal_supersede_and_provenance(alice_graph):
    edges = alice_graph["edges"]
    g1 = edges[edges.group_id == "g1.example.com"]
    likes = g1[(g1.pred == "LIKES")].iloc[0]
    dislikes = g1[(g1.pred == "DISLIKES")].iloc[0]
    # duplicate LIKES (T0, T4) merged into one edge with 2-episode provenance
    assert likes.episode_count == 2
    assert likes.valid_at == T[0]
    # DISLIKES at T2 invalidates the (merged) LIKES edge
    assert likes.invalid_at == T[2]
    assert dislikes.invalid_at is None or str(dislikes.invalid_at) == "NaT"


def test_works_at_supersede(alice_graph):
    edges = alice_graph["edges"]
    works = edges[edges.pred == "WORKS_AT"].sort_values("valid_at")
    assert len(works) == 2
    assert works.iloc[0].obj_canonical == "Acme Corp"
    assert works.iloc[0].invalid_at == T[3]  # superseded by Globex
    import pandas as pd

    assert pd.isna(works.iloc[1].invalid_at)


def test_mention_edges_link_episodes_to_entities(alice_graph):
    m = alice_graph["mentions"]
    nodes = alice_graph["nodes"]
    assert set(m.entity_uuid) <= set(nodes.uuid)
    assert m.uuid.is_unique


def test_edges_have_embeddings(alice_graph):
    edges = alice_graph["edges"]
    vec = edges.fact_embedding.iloc[0]
    assert len(vec) == 64
    import numpy as np

    assert abs(float(np.linalg.norm(np.asarray(vec, dtype="float64"))) - 1.0) < 1e-5


def test_greedy_coverage_select(ray_session):
    import ray.data as rd_

    from graphiti_ray.pipelines.corpus import greedy_coverage_select

    docs = rd_.from_items(
        [
            # bigram sets: d0 {a b, b c, c d} (3), d1 {x y, y z} (2),
            # d2 {a b, b c} (subset of d0 -> gain 0 after d0)
            {"doc_id": 0, "text": "a b c d"},
            {"doc_id": 1, "text": "x y z"},
            {"doc_id": 2, "text": "a b c"},
        ]
    )
    out = greedy_coverage_select(docs, k=5).to_pandas()
    assert out[["round", "doc_id", "gain"]].values.tolist() == [
        [1, 0, 3],
        [2, 1, 2],
    ]  # d2 contributes nothing -> greedy stops after round 2


def test_balanced_sample_equal_classes(ray_session):
    import ray.data as rd_

    from graphiti_ray.pipelines.corpus import balanced_sample

    rows = (
        [{"doc_id": i, "lang": "en"} for i in range(10)]
        + [{"doc_id": 100 + i, "lang": "de"} for i in range(3)]
    )
    out = balanced_sample(rd_.from_items(rows)).to_pandas()
    assert out.lang.value_counts().to_dict() == {"en": 3, "de": 3}
    # determinism: same subset twice
    out2 = balanced_sample(rd_.from_items(rows)).to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_training_mix_composition(ray_session):
    import ray.data as rd_

    from graphiti_ray.pipelines.corpus import training_mix

    rows = (
        [{"doc_id": i, "text": f"unique text {i}", "lang": "en"} for i in range(8)]
        + [{"doc_id": 100, "text": "dup", "lang": "de"},
           {"doc_id": 101, "text": "dup", "lang": "de"},   # exact-dup loser
           {"doc_id": 102, "text": "other de", "lang": "de"}]
    )
    out = training_mix(rd_.from_items(rows)).to_pandas()
    # dedup dropped 101; balanced: de has 2 distinct -> en capped at 2
    assert 101 not in set(out.doc_id)
    assert out.lang.value_counts().to_dict() == {"en": 2, "de": 2}
    assert set(out.split) <= {"train", "val", "test"}
