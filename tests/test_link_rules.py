"""Unit tests: alias-resolution rules (D1/J1/D4 stand-in) — FIXTURES.md F4."""

import pandas as pd

from graphiti_ray.stages.link import is_full_form, is_initial_form, resolve_group


def _resolve(rows):
    df = pd.DataFrame(rows, columns=["group_id", "name", "label_hint", "cnt"])
    out = resolve_group(df)
    return dict(zip(out["name"], out["canonical"]))


def test_alias_cluster_merges():
    canon = _resolve(
        [
            ("g", "Alice Smith", "Person", 3),
            ("g", "Alice", "Person", 2),
            ("g", "A. Smith", "Person", 1),
        ]
    )
    assert canon == {
        "Alice Smith": "Alice Smith",
        "Alice": "Alice Smith",
        "A. Smith": "Alice Smith",
    }


def test_near_miss_not_merged_when_ambiguous():
    # "Acme" is ambiguous between Acme Corp and Acme Labs → stays itself
    canon = _resolve(
        [
            ("g", "Acme Corp", "Organization", 2),
            ("g", "Acme Labs", "Organization", 2),
            ("g", "Acme", "Organization", 1),
        ]
    )
    assert canon["Acme"] == "Acme"
    assert canon["Acme Corp"] == "Acme Corp"
    assert canon["Acme Labs"] == "Acme Labs"


def test_alias_without_full_form_stays_itself():
    canon = _resolve([("g", "Alice", "Person", 1), ("g", "Paris", "Place", 2)])
    assert canon == {"Alice": "Alice", "Paris": "Paris"}


def test_initial_form_ambiguity():
    canon = _resolve(
        [
            ("g", "A. Smith", "Person", 1),
            ("g", "Alice Smith", "Person", 1),
            ("g", "Anna Smith", "Person", 1),
        ]
    )
    # two candidate fulls share initial+last → no merge
    assert canon["A. Smith"] == "A. Smith"


def test_form_predicates():
    assert is_full_form("Alice Smith")
    assert not is_full_form("Alice")
    assert not is_full_form("A. Smith")
    assert is_initial_form("A. Smith")
    assert not is_initial_form("Alice Smith")


def test_label_vote_majority_and_priority():
    df = pd.DataFrame(
        [
            ("g", "Acme", "Organization", 3),
            ("g", "Acme", "Entity", 1),
        ],
        columns=["group_id", "name", "label_hint", "cnt"],
    )
    out = resolve_group(df)
    assert out.loc[out["name"] == "Acme", "label"].iloc[0] == "Organization"


def test_with_node_summaries_fact_digest(ray_session):
    """M5 parity: a node's summary becomes the event-time-ordered digest of
    its facts; nodes without facts keep the template summary."""
    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.sources.pages import pages_dataset

    tables = build_kg(
        pages_dataset("/root/testdata/sf0.001"),
        embeddings=False,
        node_summaries=True,
    )
    nodes = tables["nodes"].to_pandas()
    edges = tables["edges"].to_pandas()
    with_facts = set(edges["subj_uuid"]) | set(edges["obj_uuid"])
    by_uuid = dict(zip(nodes["uuid"], nodes["summary"]))
    # every entity with facts gets a digest containing its earliest fact
    first_fact = (
        edges.sort_values(["valid_at", "uuid"], kind="mergesort")
        .drop_duplicates("subj_uuid")
        .set_index("subj_uuid")["fact"]
    )
    checked = 0
    for u, fact in first_fact.items():
        assert fact in by_uuid[u], u
        assert not by_uuid[u].startswith("Entity "), u
        checked += 1
    assert checked > 10
    # entities without any fact keep the template
    for u in set(nodes["uuid"]) - with_facts:
        assert by_uuid[u].startswith("Entity ")
