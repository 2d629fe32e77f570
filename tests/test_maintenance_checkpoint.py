"""Maintenance CRUD ops + checkpoint/resume + union-find pointer jumping."""

import json
import os
from datetime import datetime

import pytest

import ray.data as rd

from graphiti_ray.pipelines.maintenance import (
    add_triplet,
    get_by_group_ids,
    get_by_uuids,
    remove_episode,
)
from graphiti_ray.stages.link import compress_mapping


@pytest.fixture(scope="module")
def graph(ray_session):
    from graphiti_ray.pipelines.kg import build_kg
    from tests.test_pipeline_e2e import _pages_table

    T = [datetime(2024, 1, d + 1) for d in range(4)]
    pages = rd.from_arrow(
        _pages_table(
            [
                ("Alice Smith works at Acme Corp.", "g1", T[0]),
                ("Alice Smith likes Bob Jones.", "g1", T[1]),
                ("Alice Smith likes Bob Jones.", "g1", T[2]),
                ("Carol White works at Globex Inc.", "g2", T[3]),
            ]
        )
    )
    return build_kg(pages, num_partitions=2, nlp_concurrency=(1, 2))


def test_get_by_uuids(ray_session, graph):
    nodes = graph["nodes"].to_pandas()
    want = sorted(nodes.uuid)[:2]
    out = get_by_uuids(graph["nodes"], want).to_pandas()
    assert sorted(out.uuid) == want


def test_get_by_group_ids_cursored(ray_session, graph):
    out = get_by_group_ids(graph["nodes"], ["g1.example.com"], limit=2).to_pandas()
    assert len(out) == 2
    assert list(out.uuid) == sorted(out.uuid, reverse=True)
    # paginate past the first page
    page2 = get_by_group_ids(
        graph["nodes"], ["g1.example.com"], limit=2, uuid_cursor=out.uuid.iloc[-1]
    ).to_pandas()
    assert set(page2.uuid).isdisjoint(set(out.uuid))


def test_add_triplet(ray_session, graph):
    import pandas as pd

    out = add_triplet(
        graph, "g1.example.com", "Zara Quinn", "WORKS_AT", "Acme Corp"
    )
    # take_all: to_pandas on a unioned list-column table trips ray's tensor
    # extension; row materialization is fine at test scale
    edges = pd.DataFrame(out["edges"].take_all())
    assert (edges.pred == "WORKS_AT").sum() >= 2
    nodes = pd.DataFrame(out["nodes"].take_all())
    assert "Zara Quinn" in set(nodes.name)
    # existing entity not duplicated
    assert (nodes.name == "Acme Corp").sum() == 1


def test_remove_episode_cascade(ray_session, graph):
    eps = graph["episodes"].to_pandas().sort_values("valid_at")
    target = eps.iloc[3]  # the only g2 episode (Carol/Globex)
    out = remove_episode(graph, target.uuid)
    assert target.uuid not in set(out["episodes"].to_pandas().uuid)
    nodes = out["nodes"].to_pandas()
    # Carol White & Globex Inc were mentioned only there → gone
    assert "Carol White" not in set(nodes.name)
    edges = out["edges"].to_pandas()
    assert "g2.example.com" not in set(edges.group_id)
    # the duplicated LIKES edge loses one provenance but survives elsewhere
    likes = edges[edges.pred == "LIKES"]
    assert len(likes) == 1


def test_remove_episode_keeps_shared_provenance(ray_session, graph):
    eps = graph["episodes"].to_pandas().sort_values("valid_at")
    # remove ONE of the two LIKES assertions: edge must survive with count 1
    out = remove_episode(graph, eps.iloc[1].uuid)
    likes = out["edges"].to_pandas()
    likes = likes[likes.pred == "LIKES"]
    assert len(likes) == 1 and likes.iloc[0].episode_count == 1


def test_episode_entity_edges(ray_session, graph):
    from graphiti_ray.pipelines.maintenance import episode_entity_edges

    out = episode_entity_edges(graph["edges"]).to_pandas()
    eps = graph["episodes"].to_pandas()
    edges = graph["edges"].to_pandas()
    assert set(out.episode_uuid) <= set(eps.uuid)
    # every edge uuid appears under each of its provenance episodes
    for r in edges.itertuples(index=False):
        for ep in r.episodes:
            row = out[out.episode_uuid == ep]
            assert r.uuid in row.iloc[0].entity_edges


def test_node_attributes_extractor(ray_session):
    import ray.data as rd

    from graphiti_ray.stages.link import canonical_map, nodes_from_canonical

    m = rd.from_items(
        [
            {
                "episode_uuid": "e1",
                "group_id": "g",
                "name": "Acme Corp",
                "label_hint": "Organization",
                "valid_at": None,
            }
        ]
    )
    canon = canonical_map(m)
    nodes = nodes_from_canonical(
        canon,
        attribute_extractors={
            "Organization": lambda name, label: {"industry": "unknown", "len": len(name)}
        },
    ).to_pandas()
    import json

    attrs = json.loads(nodes.iloc[0].attributes)
    assert json.loads(attrs["industry"]) == "unknown"
    assert json.loads(attrs["len"]) == 9


def test_clear_groups(ray_session, graph):
    from graphiti_ray.pipelines.maintenance import clear_groups

    out = clear_groups(graph, ["g1.example.com"])
    for name in ["episodes", "nodes", "edges", "mentions"]:
        df = out[name].to_pandas()
        if "group_id" in df.columns:
            assert "g1.example.com" not in set(df.group_id)
    # g2 survives
    assert "g2.example.com" in set(out["nodes"].to_pandas().group_id)


def test_compress_mapping_pointer_jumping(ray_session):
    # chain a→b→c→d and e→e: compress to roots in O(log n) rounds
    m = rd.from_items(
        [
            {"uuid": "a", "parent": "b"},
            {"uuid": "b", "parent": "c"},
            {"uuid": "c", "parent": "d"},
            {"uuid": "d", "parent": "d"},
            {"uuid": "e", "parent": "e"},
        ]
    )
    out = compress_mapping(m, num_partitions=2).to_pandas()
    parent = dict(zip(out.uuid, out.parent))
    assert parent == {"a": "d", "b": "d", "c": "d", "d": "d", "e": "e"}


def test_run_kg_checkpoint_resume(ray_session, tmp_path):
    from graphiti_ray.pipelines.kg import run_kg

    out_root = str(tmp_path / "kg")
    m1 = run_kg("/root/testdata/sf0.001", out_root, nlp_concurrency=(1, 2))
    assert all(not m.get("skipped") for m in m1)
    edges_dir = os.path.join(out_root, "edges")
    rows1 = sum(1 for _ in open(os.path.join(edges_dir, "MANIFEST.json")))

    # simulate a crash after 'nodes': drop completion of edges + mention_edges
    os.remove(os.path.join(edges_dir, "_SUCCESS"))
    m2 = run_kg("/root/testdata/sf0.001", out_root, nlp_concurrency=(1, 2))
    by_table = {m["table"]: m for m in m2}
    assert by_table["episodes"]["skipped"]
    assert by_table["extracted"]["skipped"]
    assert by_table["canonical_map"]["skipped"]
    assert by_table["nodes"]["skipped"]
    assert not by_table["edges"]["skipped"]  # recomputed from checkpoints

    manifest = json.load(open(os.path.join(edges_dir, "MANIFEST.json")))
    assert manifest["lineage"]["input"] == "/root/testdata/sf0.001"
    assert manifest["rows"] == 380


def test_run_kg_communities_checkpoint_resume(ray_session, tmp_path):
    """The optional communities stages checkpoint + resume like core ones."""
    from graphiti_ray.pipelines.kg import run_kg

    out_root = str(tmp_path / "kgc")
    m1 = run_kg(
        "/root/testdata/sf0.001", out_root, nlp_concurrency=(1, 2), communities=True
    )
    tables = {m["table"] for m in m1}
    assert {"communities", "community_edges"} <= tables

    # rerun: everything skips, including the community stages
    m2 = run_kg(
        "/root/testdata/sf0.001", out_root, nlp_concurrency=(1, 2), communities=True
    )
    by_table = {m["table"]: m for m in m2}
    assert by_table["communities"]["skipped"]
    assert by_table["community_edges"]["skipped"]

    # drop community_edges completion: only it recomputes
    os.remove(os.path.join(out_root, "community_edges", "_SUCCESS"))
    m3 = run_kg(
        "/root/testdata/sf0.001", out_root, nlp_concurrency=(1, 2), communities=True
    )
    by_table = {m["table"]: m for m in m3}
    assert by_table["communities"]["skipped"]
    assert not by_table["community_edges"]["skipped"]


def test_partitioned_write_resumes_at_partition_granularity(ray_session, tmp_path):
    """One subtree + _SUCCESS per partition value; a rerun after a
    simulated crash rewrites ONLY the incomplete partition (completed
    partitions' files untouched), and read_table sees the union."""
    import os

    import ray.data as rd_

    from graphiti_ray.state.checkpoint import (
        checkpointed_write_partitioned,
        is_complete,
        read_table,
    )

    root = str(tmp_path)
    rows = [
        {"doc_id": i, "lang": ["en", "de", "fr"][i % 3], "text": f"doc {i}"}
        for i in range(90)
    ]
    m = checkpointed_write_partitioned(
        rd_.from_items(rows), root, "docs", "lang"
    )
    assert m["rows"] == 90 and len(m["partitions"]) == 3
    assert is_complete(root, "docs")
    assert read_table(root, "docs").count() == 90

    # completed table → whole write skipped
    m2 = checkpointed_write_partitioned(rd_.from_items(rows), root, "docs", "lang")
    assert m2["skipped"] is True

    # simulate a crash that lost the 'fr' partition mid-write
    fr = os.path.join(root, "docs", "lang=fr")
    os.remove(os.path.join(fr, "_SUCCESS"))
    os.remove(os.path.join(root, "docs", "_SUCCESS"))
    before = {
        p: os.path.getmtime(os.path.join(root, "docs", p))
        for p in ("lang=en", "lang=de")
    }
    m3 = checkpointed_write_partitioned(rd_.from_items(rows), root, "docs", "lang")
    by_part = {p["partition"]: p for p in m3["partitions"]}
    assert by_part["lang=en"]["skipped"] and by_part["lang=de"]["skipped"]
    assert not by_part["lang=fr"]["skipped"]
    after = {
        p: os.path.getmtime(os.path.join(root, "docs", p))
        for p in ("lang=en", "lang=de")
    }
    assert before == after  # completed partitions untouched
    assert read_table(root, "docs").count() == 90
    assert is_complete(root, "docs")


def test_partitioned_write_refuses_silent_row_loss(ray_session, tmp_path):
    """The durability primitive is LOUD: null partition values, explicit
    values that don't cover the data, and stale subtrees all raise
    instead of stamping a lossy _SUCCESS."""
    import os

    import pytest as _pytest
    import ray.data as rd_

    from graphiti_ray.state.checkpoint import checkpointed_write_partitioned

    with _pytest.raises(ValueError, match="nulls"):
        checkpointed_write_partitioned(
            rd_.from_items([{"doc_id": 1, "lang": None}, {"doc_id": 2, "lang": "en"}]),
            str(tmp_path), "t1", "lang",
        )

    rows = [{"doc_id": i, "lang": ["en", "fr"][i % 2]} for i in range(10)]
    with _pytest.raises(ValueError, match="outside"):
        checkpointed_write_partitioned(
            rd_.from_items(rows), str(tmp_path), "t2", "lang", values=["en"]
        )

    checkpointed_write_partitioned(rd_.from_items(rows), str(tmp_path), "t3", "lang")
    os.remove(os.path.join(tmp_path, "t3", "_SUCCESS"))
    with _pytest.raises(ValueError, match="stale"):
        checkpointed_write_partitioned(
            rd_.from_items([r for r in rows if r["lang"] == "en"]),
            str(tmp_path), "t3", "lang",
        )
