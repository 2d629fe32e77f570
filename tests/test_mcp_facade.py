"""S4 MCP-shaped serving façade: tool surface, queued episode processing,
getters/deletes, protocol dispatch (graphiti_mcp_server.py:653-1092 parity,
minus the network transport this environment cannot host)."""

import pytest

from graphiti_ray.serving.mcp_facade import GraphitiFacade, episode_to_page


@pytest.fixture(scope="module")
def kg_root(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mcp_kg"))
    from graphiti_ray.pipelines.kg import run_kg

    run_kg("/root/testdata/sf0.001", root, embeddings=False)
    return root


def test_episode_page_roundtrips_byte_identical():
    from graphiti_ray.functions.text import extract_text_from_html
    from graphiti_ray.stages.extract import DEFAULT_RUN_TS

    row = episode_to_page(
        "meeting notes", "Alice met Bob.\n  Extra   spaces  here. ",
        "mcp.example.com", DEFAULT_RUN_TS,
    )
    assert extract_text_from_html(row["html"]) == row["text"]


def test_tool_surface_matches_reference(kg_root):
    f = GraphitiFacade(kg_root)
    names = {t.name for t in f.list_tools()}
    assert names == {
        "add_episode", "search_nodes", "search_facts", "delete_entity_edge",
        "delete_episode", "get_entity_edge", "get_episodes", "clear_graph",
        "get_status",
    }


def test_status_search_and_getters(kg_root):
    f = GraphitiFacade(kg_root)
    status = f.call_tool("get_status")
    assert status["status"] == "ok" and status["tables"]["edges"] > 0

    facts = f.call_tool("search_facts", {"query": "Alice Smith works at"})
    assert facts["facts"], facts
    top = facts["facts"][0]
    assert {"uuid", "source_node_uuid", "target_node_uuid", "fact"} <= set(top)

    nodes = f.call_tool("search_nodes", {"query": "Alice Smith"})
    assert any(n["name"] == "Alice Smith" for n in nodes["nodes"])

    edge = f.call_tool("get_entity_edge", {"uuid": top["uuid"]})
    assert edge["uuid"] == top["uuid"] and "fact_embedding" not in edge

    eps = f.call_tool("get_episodes", {"last_n": 3})
    assert len(eps) == 3


def test_protocol_dispatch_validation(kg_root):
    f = GraphitiFacade(kg_root)
    assert "error" in f.call_tool("no_such_tool")
    assert "missing required" in f.call_tool("search_facts")["error"]
    assert "unknown argument" in f.call_tool(
        "get_status", {"bogus": 1}
    )["error"]


def test_add_episode_queue_then_process(kg_root, ray_session):
    f = GraphitiFacade(kg_root)
    n_before = f.get_status()["tables"]["episodes"]
    r = f.call_tool(
        "add_episode",
        {"name": "note1", "episode_body": "Grace Wilson works at Initech LLC."},
    )
    assert "queued" in r["message"]
    assert f.get_status()["pending_episodes"] == 1
    assert "processed 1" in f.process_pending()["message"]
    assert f.get_status()["tables"]["episodes"] == n_before + 1
    eps = f.get_episodes(group_id="mcp.example.com", last_n=5)
    assert any(e["name"].startswith("https://mcp.example.com/mcp/") for e in eps)
    # idempotent: re-queue the same episode → upsert appends nothing
    f.add_episode("note1", "Grace Wilson works at Initech LLC.")
    f.process_pending()
    assert f.get_status()["tables"]["episodes"] == n_before + 1


def test_delete_edge_and_episode_cascade(kg_root, ray_session):
    f = GraphitiFacade(kg_root)
    facts = f.search_facts("located in", max_facts=1)["facts"]
    uuid = facts[0]["uuid"]
    assert "deleted" in f.call_tool("delete_entity_edge", {"uuid": uuid})["message"]
    assert "not found" in f.get_entity_edge(uuid)["error"]

    eps = f.get_episodes(last_n=1)
    n_eps = f.get_status()["tables"]["episodes"]
    assert "deleted" in f.call_tool("delete_episode", {"uuid": eps[0]["uuid"]})["message"]
    assert f.get_status()["tables"]["episodes"] == n_eps - 1
