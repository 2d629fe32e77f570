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
