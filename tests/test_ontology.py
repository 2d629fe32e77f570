"""Custom ontology surface: type validation, attribute bag, edge gating."""

import pytest

from graphiti_ray.functions.ontology import (
    EntityType,
    EntityTypeError,
    allowed_predicates,
    decode_attributes,
    encode_attributes,
    validate_entity_types,
)


def test_validate_rejects_protected_shadow():
    types = {"Person": EntityType("Person", attribute_names=["uuid"])}
    with pytest.raises(EntityTypeError):
        validate_entity_types(types)


def test_validate_accepts_clean_types():
    types = {
        "Person": EntityType("Person", attribute_names=["age", "title"]),
        "Org": EntityType("Org", attribute_names=["industry"]),
    }
    validate_entity_types(types)  # no raise


def test_attribute_bag_roundtrip():
    attrs = {"age": 42, "tags": ["a", "b"], "active": True}
    enc = encode_attributes(attrs)
    assert all(isinstance(v, str) for v in enc.values())
    assert decode_attributes(enc) == attrs


def test_allowed_predicates_gating():
    etm = {
        ("Person", "Organization"): ["WORKS_AT", "CEO_OF"],
        ("Entity", "Entity"): ["RELATES_TO"],
    }
    assert allowed_predicates(etm, "Person", "Organization") == ["WORKS_AT", "CEO_OF"]
    # unknown pair → wildcard fallback (edge_operations.py:296-320)
    assert allowed_predicates(etm, "Place", "Place") == ["RELATES_TO"]
    assert allowed_predicates(None, "Person", "Organization") is None


def test_filter_triples_by_edge_types(ray_session):
    import ray.data as rd

    from graphiti_ray.functions.ontology import filter_triples_by_edge_types

    triples = rd.from_items(
        [
            {"subj_name": "Alice", "pred": "WORKS_AT", "obj_name": "Acme"},
            {"subj_name": "Alice", "pred": "LOCATED_IN", "obj_name": "Acme"},
        ]
    )
    etm = {("Person", "Organization"): ["WORKS_AT"]}
    labels = {"Alice": "Person", "Acme": "Organization"}
    out = filter_triples_by_edge_types(triples, etm, labels).take_all()
    assert [r["pred"] for r in out] == ["WORKS_AT"]


def test_runtime_model_validates_like_create_model():
    """M5: build_runtime_model is the pydantic.create_model analogue —
    undeclared attrs raise (extra='forbid'), protected names raise at
    build time, values coerce to str."""
    import pytest

    from graphiti_ray.functions.ontology import EntityType, EntityTypeError
    from graphiti_ray.stages.attributes import build_runtime_model

    model = build_runtime_model(EntityType("Person", ["employer", "ceo_of"]))
    assert model({"employer": "Acme Corp"}) == {"employer": "Acme Corp"}
    assert model({"employer": 42}) == {"employer": "42"}
    assert model({"employer": None}) == {}
    with pytest.raises(EntityTypeError):
        model({"favorite_color": "blue"})
    with pytest.raises(EntityTypeError):
        build_runtime_model(EntityType("Bad", ["summary"]))


def test_with_typed_attributes_fills_and_gates(ray_session):
    """Typed attributes fill from the latest currently-valid edge and only
    land on nodes whose labels match the declaring type."""
    import json
    from datetime import datetime

    import ray.data as rd

    from graphiti_ray.stages.attributes import with_typed_attributes

    t1, t2 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    edges = rd.from_items(
        [
            # Alice's old employer was invalidated; Globex is current
            {"subj_uuid": "u_alice", "pred": "WORKS_AT", "obj_canonical": "Acme Corp",
             "valid_at": t1, "invalid_at": t2},
            {"subj_uuid": "u_alice", "pred": "WORKS_AT", "obj_canonical": "Globex Inc",
             "valid_at": t2, "invalid_at": None},
            {"subj_uuid": "u_acme", "pred": "LOCATED_IN", "obj_canonical": "Paris",
             "valid_at": t1, "invalid_at": None},
            # a LIKES edge never becomes an attribute
            {"subj_uuid": "u_alice", "pred": "LIKES", "obj_canonical": "Bob Jones",
             "valid_at": t1, "invalid_at": None},
        ]
    )
    nodes = rd.from_items(
        [
            {"uuid": "u_alice", "labels": ["Entity", "Person"], "attributes": "{}"},
            {"uuid": "u_acme", "labels": ["Entity", "Organization"], "attributes": "{}"},
            # same uuid shape but NOT a Person → employer must not land
            {"uuid": "u_alice2", "labels": ["Entity", "Place"], "attributes": "{}"},
        ]
    )
    out = {r["uuid"]: json.loads(r["attributes"])
           for r in with_typed_attributes(nodes, edges).take_all()}
    assert json.loads(out["u_alice"]["employer"]) == "Globex Inc"
    assert "ceo_of" not in out["u_alice"]
    assert json.loads(out["u_acme"]["location"]) == "Paris"
    assert out["u_alice2"] == {}


def test_build_kg_typed_attributes_flag(ray_session):
    """End-to-end: build_kg(typed_attributes=True) fills Person employer /
    Organization location bags on the synthetic corpus."""
    import json

    from graphiti_ray.pipelines.kg import build_kg
    from graphiti_ray.sources.pages import pages_dataset

    tables = build_kg(
        pages_dataset("/root/testdata/sf0.001"),
        embeddings=False,
        typed_attributes=True,
    )
    nodes = tables["nodes"].to_pandas()
    bags = {r["name"]: json.loads(r["attributes"]) for _, r in nodes.iterrows()}
    filled = [b for b in bags.values() if b]
    assert filled, "no attribute bag was filled"
    assert any("employer" in b or "ceo_of" in b for b in filled)
    assert any("location" in b for b in filled)
