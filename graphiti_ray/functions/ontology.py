"""Custom-ontology surface (SURVEY §2.10 parity).

- ``EntityType`` / ``validate_entity_types`` ← the reference's custom
  entity ontology (graphiti.py:277, ontology_utils/entity_types_utils.py:
  23-37): user-supplied types whose attribute schemas must not shadow
  protected EntityNode fields;
- ``edge_type_map`` gating ← (graphiti.py:279-280,
  edge_operations.py:296-320): (source_label, target_label) → allowed
  predicate list, applied as a post-extraction filter;
- dynamic ``attributes`` ← EntityNode.attributes (nodes.py:300-302): an
  open bag kept Arrow-stable as map<string,string> with JSON-encoded
  values (SURVEY §1.3).

The reference fills attributes with an LLM against a runtime Pydantic
model; here an attribute extractor is any callable
``(name, label, mentions_context) -> dict[str, str]`` registered per type
— deterministic by contract.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Callable

# EntityNode core fields that a custom ontology must not shadow
# (entity_types_utils.py:23-37)
PROTECTED_FIELDS = frozenset(
    {
        "uuid",
        "name",
        "group_id",
        "labels",
        "created_at",
        "summary",
        "attributes",
        "name_embedding",
    }
)


class EntityTypeError(ValueError):
    """Raised when a custom type shadows a protected field."""


@dataclass
class EntityType:
    name: str
    attribute_names: list[str] = field(default_factory=list)
    extractor: Callable[[str, str], dict] | None = None  # (name, label) → attrs


def validate_entity_types(entity_types: dict[str, EntityType]) -> None:
    """Reject attribute names shadowing protected EntityNode fields."""
    for tname, et in entity_types.items():
        for attr in et.attribute_names:
            if attr in PROTECTED_FIELDS:
                raise EntityTypeError(
                    f"entity type {tname!r} attribute {attr!r} shadows a "
                    f"protected EntityNode field"
                )


def encode_attributes(attrs: dict) -> dict[str, str]:
    """Open attribute bag → Arrow-stable map<string,string> (JSON values)."""
    return {k: json.dumps(v, sort_keys=True, default=str) for k, v in attrs.items()}


def decode_attributes(encoded: dict[str, str]) -> dict:
    return {k: json.loads(v) for k, v in (encoded or {}).items()}


def allowed_predicates(
    edge_type_map: dict[tuple[str, str], list[str]] | None,
    subj_label: str,
    obj_label: str,
) -> list[str] | None:
    """(src_label, tgt_label) → allowed predicate list; None = allow all
    (edge_operations.py:296-320 gating). Falls back to the ('Entity',
    'Entity') wildcard entry like the reference."""
    if not edge_type_map:
        return None
    if (subj_label, obj_label) in edge_type_map:
        return edge_type_map[(subj_label, obj_label)]
    return edge_type_map.get(("Entity", "Entity"))


def filter_triples_by_edge_types(
    triples,  # rd.Dataset with subj/obj label columns or a label lookup
    edge_type_map: dict[tuple[str, str], list[str]] | None,
    label_of: dict[str, str],
):
    """Post-extraction predicate gating: drop triples whose predicate is not
    allowed between the endpoint labels. ``label_of`` is the broadcastable
    (entity name → label) mapping from the canonical map."""
    if not edge_type_map:
        return triples
    import pyarrow as pa

    import ray

    ref = ray.put((edge_type_map, label_of))

    def gate(batch: pa.Table) -> pa.Table:
        etm, labels = ray.get(ref)
        keep = []
        for i, (s, p, o) in enumerate(
            zip(
                batch.column("subj_name").to_pylist(),
                batch.column("pred").to_pylist(),
                batch.column("obj_name").to_pylist(),
            )
        ):
            allowed = allowed_predicates(etm, labels.get(s, "Entity"), labels.get(o, "Entity"))
            if allowed is None or p in allowed:
                keep.append(i)
        return batch.take(pa.array(keep, pa.int64()))

    return triples.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
