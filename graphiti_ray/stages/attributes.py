"""M5 runtime-typed attribute extraction (node_operations.py:449-536 parity).

The reference builds a Pydantic model per custom entity type at runtime
(``pydantic.create_model`` over the type's attribute schema) and has the
LLM fill typed attributes from the entity's context. The deterministic
analogue here keeps every piece of that contract:

- ``build_runtime_model`` — the ``create_model`` analogue: compiles an
  :class:`~graphiti_ray.functions.ontology.EntityType` into a validator
  that accepts exactly the declared attribute names (extra keys raise,
  like a Pydantic model with ``extra='forbid'``) and coerces values to
  strings;
- ``current_edge_attributes`` — the context-derivation analogue: each
  typed attribute is declared as *the object of the entity's latest
  currently-valid edge with a given predicate* (ties on valid_at resolve
  to the lexicographically last object). Where the reference asks the LLM
  "fill employer from these facts", this reads the same answer off the
  bi-temporal edge table — deterministic, so a DuckDB twin can re-derive
  it (driver query ``kg_node_attributes``);
- ``with_typed_attributes`` — merges the extracted values into the nodes
  table's ``attributes`` bag (map<string,string>, JSON-encoded values)
  after validating through the runtime model.

Scale shape: the winner-per-(entity, predicate) pick is one range sort +
a vectorized run kernel (``ops.sorted_run_map``, run ends), and the merge
onto nodes is the same vocabulary-sized broadcast used for node digests —
the corpus-sized side is never shuffled.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data as rd

from graphiti_ray.functions.ontology import (
    EntityType,
    PROTECTED_FIELDS,
    EntityTypeError,
    validate_entity_types,
)

# default ontology: attribute name → source predicate, per entity type
# (the per-type schema the reference would express as a Pydantic model)
DEFAULT_TYPED_ENTITY_TYPES: dict[str, EntityType] = {
    "Person": EntityType("Person", attribute_names=["employer", "ceo_of"]),
    "Organization": EntityType("Organization", attribute_names=["location"]),
}
DEFAULT_ATTRIBUTE_SOURCES: dict[str, dict[str, str]] = {
    "Person": {"employer": "WORKS_AT", "ceo_of": "CEO_OF"},
    "Organization": {"location": "LOCATED_IN"},
}


def build_runtime_model(et: EntityType):
    """``pydantic.create_model`` analogue: a validator for one type's
    attribute bag. Unknown attribute names raise (``extra='forbid'``);
    protected EntityNode field names raise at build time
    (entity_types_utils.py:23-37); values coerce to ``str``."""
    for attr in et.attribute_names:
        if attr in PROTECTED_FIELDS:
            raise EntityTypeError(
                f"entity type {et.name!r} attribute {attr!r} shadows a "
                f"protected EntityNode field"
            )
    allowed = frozenset(et.attribute_names)

    def validate(attrs: dict) -> dict[str, str]:
        extra = set(attrs) - allowed
        if extra:
            raise EntityTypeError(
                f"entity type {et.name!r} got undeclared attribute(s) "
                f"{sorted(extra)!r}"
            )
        return {k: str(v) for k, v in attrs.items() if v is not None}

    return validate


def _pred_to_attr(sources: dict[str, dict[str, str]]) -> dict[str, str]:
    out: dict[str, str] = {}
    for attr_map in sources.values():
        for attr, pred in attr_map.items():
            out[pred] = attr
    return out


def current_edge_attributes(
    edges: rd.Dataset,
    sources: dict[str, dict[str, str]] | None = None,
) -> rd.Dataset:
    """(uuid, attr_name, attr_value) rows: per entity and typed attribute,
    the object of its latest currently-valid (``invalid_at IS NULL``)
    source-predicate edge; valid_at ties resolve to the lexicographically
    LAST object. One sorted pass, vectorized run kernel (run ends)."""
    import functools

    from graphiti_ray.stages.ops import sorted_run_map

    pred_attr = _pred_to_attr(sources or DEFAULT_ATTRIBUTE_SOURCES)
    preds = pa.array(sorted(pred_attr), pa.string())

    def narrow(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.is_null(batch.column("invalid_at")),
            pc.is_in(batch.column("pred"), value_set=preds),
        )
        kept = batch.filter(mask)
        return kept.select(["subj_uuid", "pred", "obj_canonical", "valid_at"])

    cur = edges.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
    return sorted_run_map(
        cur,
        key_cols=["subj_uuid", "pred"],
        order_cols=["valid_at", "obj_canonical"],
        block_fn=functools.partial(_winner_block, pred_attr=pred_attr),
    )


def _winner_block(tbl: pa.Table, pred_attr: dict[str, str]) -> pa.Table:
    """Run ENDS of (subj_uuid, pred) runs sorted by (valid_at, obj) — the
    latest-then-lexicographically-last winner per entity/predicate."""
    import pandas as pd

    if tbl.num_rows == 0:
        return pa.table(
            {
                "uuid": pa.array([], pa.string()),
                "attr_name": pa.array([], pa.string()),
                "attr_value": pa.array([], pa.string()),
            }
        )
    from graphiti_ray.stages.ops import _table_run_starts

    starts = _table_run_starts(tbl, ["subj_uuid", "pred"])
    ends = pa.array(starts[1:] - 1, pa.int64())  # last row of each run
    pred_ends = tbl.column("pred").take(ends)
    return pa.table(
        {
            "uuid": tbl.column("subj_uuid").take(ends),
            "attr_name": pa.array(
                pd.Series(pred_ends.to_numpy(zero_copy_only=False))
                .map(pred_attr)
                .tolist(),
                pa.string(),
            ),
            "attr_value": tbl.column("obj_canonical").take(ends),
        }
    )


def with_typed_attributes(
    nodes: rd.Dataset,
    edges: rd.Dataset,
    entity_types: dict[str, EntityType] | None = None,
    sources: dict[str, dict[str, str]] | None = None,
) -> rd.Dataset:
    """Fill each node's ``attributes`` bag with its runtime-typed values.

    A node receives a typed attribute only when one of its ``labels``
    matches the declaring entity type (the reference only fills attributes
    for entities matching a custom type, node_operations.py:449-470), and
    every filled bag passes the type's runtime model validator. The
    attribute rows are entity-vocabulary-sized → broadcast dict, one
    streaming pass over nodes (same shape as with_node_summaries)."""
    import ray

    entity_types = entity_types or DEFAULT_TYPED_ENTITY_TYPES
    sources = sources or DEFAULT_ATTRIBUTE_SOURCES
    validate_entity_types(entity_types)
    models = {name: build_runtime_model(et) for name, et in entity_types.items()}
    # attr name → owning type (to gate on node labels)
    attr_owner = {
        attr: tname for tname, amap in sources.items() for attr in amap
    }

    attrs_df = current_edge_attributes(edges, sources).to_pandas()
    lut: dict[str, dict[str, str]] = {}
    for u, k, v in zip(attrs_df["uuid"], attrs_df["attr_name"], attrs_df["attr_value"]):
        lut.setdefault(u, {})[k] = v
    ref = ray.put((lut, attr_owner, models))

    def apply(batch: pa.Table, _ref=ref) -> pa.Table:
        from graphiti_ray.stages.link import _cached_lut

        lut, owner, models = _cached_lut(_ref)
        uuids = batch.column("uuid").to_pylist()
        labels = batch.column("labels").to_pylist()
        current = batch.column("attributes").to_pylist()
        out = []
        for u, ls, cur in zip(uuids, labels, current):
            vals = lut.get(u)
            if not vals:
                out.append(cur)
                continue
            lset = set(ls or [])
            by_type: dict[str, dict] = {}
            for k, v in vals.items():
                t = owner.get(k)
                if t in lset:
                    by_type.setdefault(t, {})[k] = v
            if not by_type:
                out.append(cur)
                continue
            bag = json.loads(cur) if cur else {}
            for t, d in by_type.items():
                bag.update(
                    {k: json.dumps(v, sort_keys=True) for k, v in models[t](d).items()}
                )
            out.append(json.dumps(bag, sort_keys=True))
        i = batch.column_names.index("attributes")
        return batch.set_column(i, "attributes", pa.array(out, pa.string()))

    return nodes.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)
