"""Stage 3: entity linking + canonicalization (the shuffles).

Reference parity:
- exact-name dedup (D1) ← ``node_name_match`` (utils/bulk_utils.py:278-288):
  first the exact normalized-name fast path;
- candidate generation (J1) ← ``get_relevant_nodes``
  (search_utils.py:662-750): group-scoped candidates; here alias rules
  (first-token / initial matching) are the deterministic stand-in for the
  cosine>0.6 ∪ BM25 candidate set + LLM resolution (node_operations.py:
  271-380), with an optional MinHash-LSH + embedding-cosine scale path;
- uuid-map path compression (A6) ← ``compress_uuid_map``
  (utils/bulk_utils.py:387-396): distributed pointer jumping;
- pointer rewrite (M13) ← ``resolve_edge_pointers`` (bulk_utils.py:402-426).

Scale shape (two-phase, hub-safe):
  1. mentions → per-batch partial counts → groupby(group_id, name): the
     shuffle moves one row per distinct (host, surface), not per mention;
  2. groupby(group_id).map_groups(resolve): per-host *vocabulary* (distinct
     surfaces), bounded even for hub hosts with millions of mentions;
  3. canonical map joins back to mentions/triples via a hash-partitioned
     ``Dataset.join`` on (group_id, name).
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

import ray.data as rd

from graphiti_ray.functions.text import entity_uuid

LINK_VERSION = "link1"


def auto_pool(weight: float = 0.5, min_actors: int | None = None) -> tuple:
    """Actor-pool (min, max) sized to the session: max = weight * CPUs, and
    a warm min so chained stages don't pay scale-up lag per execution."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    hi = max(2, int(cpus * weight))
    lo = min_actors if min_actors is not None else max(1, hi // 4)
    return (lo, hi)


def default_join_partitions() -> int:
    """Join/aggregator parallelism sized to the session: one hash-shuffle
    aggregator actor per partition, so never ask for more than the CPUs we
    have (a 32-partition join on an 8-cpu session deadlocks on actor
    allocation)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(16, cpus // 2))

def _drop_empty_blocks(ds: rd.Dataset) -> rd.Dataset:
    """Remove zero-row blocks (which carry NO schema in ray 2.49).

    Aggregates emit an empty block per empty hash partition; ``map_batches``
    SKIPS empty blocks (so they can't be coerced), and ``Dataset.join``'s
    per-partition pyarrow join dies on a schema-less table with "No match
    for key field … on right side". Materializes and rebuilds from the
    non-empty block refs (cheap: metadata-only filter)."""
    mat = ds.materialize()
    refs = []
    try:
        for bundle in mat.iter_internal_ref_bundles():
            for block_ref, meta in zip(bundle.block_refs, bundle.metadata):
                if meta.num_rows:
                    refs.append(block_ref)
    except Exception:
        return mat
    if not refs:
        return mat
    return rd.from_arrow_refs(refs)


def safe_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    join_type: str,
    num_partitions: int,
    on: tuple,
    **kw,
) -> rd.Dataset:
    """Dataset.join with the 2.49 landmines defused: empty schema-less
    blocks dropped from both sides, identical key names required on both
    sides (right_on name resolution is broken upstream), and an
    ENTIRELY-empty input side short-circuited — the hash shuffle's
    schema broadcast rides the first non-empty block
    (hash_shuffle.py:223), so a 0-row side leaves the join aggregators
    schema-less and pyarrow dies with "No match for key field". The
    short-circuit synthesizes the join's result from schemas alone
    (inner/left_semi → empty; left_anti/left_outer with empty right →
    left, padded with null right columns for outer); when a needed
    schema is unavailable it falls through to the real join (no behavior
    change vs before)."""
    assert "right_on" not in kw, "rename the right key to match `on` instead"
    L, R = _drop_empty_blocks(left), _drop_empty_blocks(right)
    if not kw:
        try:
            ln, rn = L.count(), R.count()
        except Exception:
            ln = rn = None
        if ln == 0 or rn == 0:
            out = _empty_side_join(L, R, ln, rn, join_type, on)
            if out is not None:
                return out
    return L.join(
        R,
        join_type=join_type,
        num_partitions=num_partitions,
        on=on,
        **kw,
    )


def _arrow_schema(ds: rd.Dataset):
    try:
        sch = ds.schema(fetch_if_missing=False)
        base = getattr(sch, "base_schema", None)
        return base if isinstance(base, pa.Schema) else None
    except Exception:
        return None


def _empty_side_join(L, R, ln, rn, join_type: str, on: tuple):
    """Synthesized result for a join with a 0-row side; None = punt to
    the real join (caller falls through, preserving old behavior)."""
    lsch, rsch = _arrow_schema(L), _arrow_schema(R)
    if join_type == "left_anti" and rn == 0 and ln:
        return L
    if join_type in ("left_anti", "left_semi") and ln == 0:
        return L
    if join_type == "left_outer" and rn == 0 and ln:
        if lsch is None or rsch is None:
            return None

        def pad(t: pa.Table, _r=rsch, _on=tuple(on)) -> pa.Table:
            for f in _r:
                if f.name not in t.column_names and f.name not in _on:
                    t = t.append_column(f.name, pa.nulls(t.num_rows, f.type))
            return t

        return L.map_batches(pad, batch_format="pyarrow")
    if lsch is None or rsch is None:
        return None
    if join_type in ("inner", "left_semi", "left_outer", "left_anti"):
        cols: dict = {f.name: pa.array([], f.type) for f in lsch}
        if join_type in ("inner", "left_outer"):
            for f in rsch:
                if f.name not in cols:
                    cols[f.name] = pa.array([], f.type)
        return rd.from_arrow(pa.table(cols))
    return None


_INITIAL_RE = re.compile(r"^[A-Z]\. ")

_LABEL_PRIORITY = {"Person": 0, "Organization": 1, "Place": 2, "Entity": 3}


def is_initial_form(name: str) -> bool:
    return bool(_INITIAL_RE.match(name))


def is_full_form(name: str) -> bool:
    return " " in name and not is_initial_form(name)


def mention_partials(mentions: rd.Dataset) -> rd.Dataset:
    """Per-batch partial aggregation: (group_id, name, label_hint) → cnt.

    Combiner before the wide groupby — the shuffle then carries one row per
    distinct key per batch instead of one per mention (guide: pre-aggregate
    inside map_batches).
    """

    def agg(batch: pa.Table) -> pa.Table:
        df = batch.select(["group_id", "name", "label_hint"]).to_pandas()
        out = (
            df.groupby(["group_id", "name", "label_hint"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    return mentions.map_batches(agg, batch_format="pyarrow")


def resolve_group(g: pd.DataFrame) -> pd.DataFrame:
    """Alias resolution over one group's distinct surfaces (link1 rules).

    Rules (deterministic stand-in for node_operations.py:271-380 resolution):
    - a full form (contains a space, not "X. Last") is its own canonical;
    - "X. Last" merges into the unique in-group full form with the same
      first initial and last token, if exactly one exists;
    - a single token merges into the unique in-group full form whose first
      token equals it, if exactly one exists;
    - otherwise the surface stays its own canonical ("do NOT merge if
      related but distinct", prompts/dedupe_nodes.py:107).
    Output rows: group_id, name, canonical, entity_uuid, label, mention_count.
    """
    group_id = g["group_id"].iloc[0]
    # per-surface totals and label vote (max count; tie → priority order).
    # Vectorized: sort votes once and take the head per name — the naive
    # per-name filter is O(V²) and hurts on big host vocabularies.
    totals = g.groupby("name")["cnt"].sum()
    votes = g.groupby(["name", "label_hint"])["cnt"].sum().reset_index()
    votes["prio"] = votes["label_hint"].map(lambda l: _LABEL_PRIORITY.get(l, 9))
    votes = votes.sort_values(
        ["name", "cnt", "prio", "label_hint"],
        ascending=[True, False, True, True],
        kind="mergesort",
    )
    best_label = dict(
        zip(votes.drop_duplicates("name")["name"], votes.drop_duplicates("name")["label_hint"])
    )

    def pick_label(name: str) -> str:
        return best_label[name]

    names = sorted(totals.index)
    fulls = [n for n in names if is_full_form(n)]
    by_first_tok: dict[str, list[str]] = {}
    by_init_last: dict[tuple[str, str], list[str]] = {}
    for f in fulls:
        toks = f.split(" ")
        by_first_tok.setdefault(toks[0], []).append(f)
        by_init_last.setdefault((f[0], toks[-1]), []).append(f)

    canonicals = []
    for n in names:
        if is_full_form(n):
            canonicals.append(n)
        elif is_initial_form(n):
            cands = by_init_last.get((n[0], n.split(" ")[-1]), [])
            canonicals.append(cands[0] if len(cands) == 1 else n)
        else:
            cands = by_first_tok.get(n, [])
            canonicals.append(cands[0] if len(cands) == 1 else n)

    return pd.DataFrame(
        {
            "group_id": group_id,
            "name": names,
            "canonical": canonicals,
            "entity_uuid": [entity_uuid(group_id, c) for c in canonicals],
            "label": [pick_label(n) for n in names],
            "mention_count": [int(totals[n]) for n in names],
        }
    )


def _resolve_block(tbl: pa.Table) -> pa.Table:
    """Alias resolution over COMPLETE group runs (sorted_run_map contract):
    one Python call per BLOCK of host groups instead of a ``map_groups``
    dispatch per host — at web scale group count is host count (millions),
    so the per-group slicing layer matters even though the rule work
    itself is per-vocabulary Python."""
    if tbl.num_rows == 0:
        return pa.table(
            {
                "group_id": pa.array([], pa.string()),
                "name": pa.array([], pa.string()),
                "canonical": pa.array([], pa.string()),
                "entity_uuid": pa.array([], pa.string()),
                "label": pa.array([], pa.string()),
                "mention_count": pa.array([], pa.int64()),
            }
        )
    from graphiti_ray.stages.ops import _table_run_starts

    df = tbl.to_pandas()
    starts = _table_run_starts(tbl, ["group_id"])
    frames = [
        resolve_group(df.iloc[s:e]) for s, e in zip(starts[:-1], starts[1:])
    ]
    out = pd.concat(frames, ignore_index=True)
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
        None
    ).cast(
        pa.schema(
            [
                ("group_id", pa.string()),
                ("name", pa.string()),
                ("canonical", pa.string()),
                ("entity_uuid", pa.string()),
                ("label", pa.string()),
                ("mention_count", pa.int64()),
            ]
        )
    )


def canonical_map(mentions: rd.Dataset) -> rd.Dataset:
    """mentions → (group_id, name) → canonical/entity_uuid mapping table.

    Shape: per-batch partial counts (combiner) → one range sort on
    group_id → per-block resolution over complete group runs
    (``ops.sorted_run_map``) — no per-host ``map_groups`` dispatch."""
    from graphiti_ray.stages.ops import sorted_run_map

    partials = mention_partials(mentions)
    return sorted_run_map(partials, key_cols=["group_id"], block_fn=_resolve_block)


def _nodes_block(tbl: pa.Table, attribute_extractors: dict | None) -> pa.Table:
    """Vectorized per-block node builder over COMPLETE (group_id,
    entity_uuid) runs (sorted_run_map contract). reduceat for the
    mention-count sums; tiny per-run work only for the label-set /
    summary-string assembly (string formatting per entity is irreducible)."""
    import json as _json

    import numpy as np

    if tbl.num_rows == 0:
        return pa.table(
            {
                "uuid": pa.array([], pa.string()),
                "name": pa.array([], pa.string()),
                "group_id": pa.array([], pa.string()),
                "labels": pa.array([], pa.list_(pa.string())),
                "summary": pa.array([], pa.string()),
                "mention_count": pa.array([], pa.int64()),
                "attributes": pa.array([], pa.string()),
            }
        )
    from graphiti_ray.stages.ops import _table_run_starts

    starts = _table_run_starts(tbl, ["group_id", "entity_uuid"])
    firsts = starts[:-1]
    firsts_idx = pa.array(firsts, pa.int64())
    counts = tbl.column("mention_count").to_numpy(zero_copy_only=False)
    sums = np.add.reduceat(counts.astype(np.int64), firsts)
    canon_arr = tbl.column("canonical").to_pylist()
    label_arr = tbl.column("label").to_pylist()
    names, summaries, attrs_json = [], [], []
    labels_flat: list[str] = []
    label_offsets = [0]
    extractors = attribute_extractors or {}
    if extractors:
        from graphiti_ray.functions.ontology import encode_attributes
    for s, e in zip(starts[:-1], starts[1:]):
        canonical = canon_arr[s]
        labels = sorted(set(label_arr[s:e]))
        if len(labels) > 1 and "Entity" in labels:
            labels.remove("Entity")
        primary = labels[0] if labels else "Entity"
        attrs: dict[str, str] = {}
        if primary in extractors:
            attrs = encode_attributes(extractors[primary](canonical, primary) or {})
        names.append(canonical)
        summaries.append(f"Entity {canonical} ({', '.join(labels)})")
        attrs_json.append(_json.dumps(attrs, sort_keys=True))
        labels_flat.extend(["Entity"] + [l for l in labels if l != "Entity"])
        label_offsets.append(len(labels_flat))
    return pa.table(
        {
            "uuid": tbl.column("entity_uuid").take(firsts_idx),
            "name": pa.array(names, pa.string()),
            "group_id": tbl.column("group_id").take(firsts_idx),
            "labels": pa.ListArray.from_arrays(
                pa.array(label_offsets, pa.int32()),
                pa.array(labels_flat, pa.string()),
            ),
            "summary": pa.array(summaries, pa.string()),
            "mention_count": pa.array(sums.tolist(), pa.int64()),
            "attributes": pa.array(attrs_json, pa.string()),
        }
    )


def nodes_from_canonical(
    canon: rd.Dataset, attribute_extractors: dict | None = None
) -> rd.Dataset:
    """canonical map → entity nodes table (EntityNode parity,
    nodes.py:297-302): uuid, name, group_id, labels, summary,
    mention_count, attributes (map<string,string>, JSON-encoded values —
    the open bag of §1.3; filled by per-label extractors from
    functions/ontology.py when supplied, M5 stand-in).

    Shape: one range sort on (group_id, entity_uuid), then a vectorized
    per-block kernel over complete key runs (``ops.sorted_run_map``) — no
    per-entity Python dispatch (the former per-group ``map_groups`` paid
    one Python call per entity)."""
    import functools

    from graphiti_ray.stages.ops import sorted_run_map

    return sorted_run_map(
        canon,
        key_cols=["group_id", "entity_uuid"],
        block_fn=functools.partial(
            _nodes_block, attribute_extractors=attribute_extractors
        ),
    )


def _summary_block(tbl: pa.Table, max_facts: int, max_words: int) -> pa.Table:
    """Per-block digest kernel for with_node_summaries (sorted_run_map
    contract: complete (uuid) runs, rows in (valid_at, edge_uuid) order)."""
    import numpy as np

    if tbl.num_rows == 0:
        return pa.table(
            {"uuid": pa.array([], pa.string()), "fact_summary": pa.array([], pa.string())}
        )
    uuids = np.array(tbl.column("uuid").to_pylist())
    facts = tbl.column("fact").to_pylist()
    starts = np.concatenate(
        [[0], np.nonzero(uuids[1:] != uuids[:-1])[0] + 1, [len(uuids)]]
    )
    out_u, out_s = [], []
    for s, e in zip(starts[:-1], starts[1:]):
        digest = "; ".join(facts[s : min(e, s + max_facts)])
        words = digest.split(" ")
        if len(words) > max_words:
            digest = " ".join(words[:max_words])
        out_u.append(uuids[s])
        out_s.append(digest)
    return pa.table(
        {
            "uuid": pa.array(out_u, pa.string()),
            "fact_summary": pa.array(out_s, pa.string()),
        }
    )


def with_node_summaries(
    nodes: rd.Dataset,
    edges: rd.Dataset,
    max_facts: int = 5,
    max_words: int = 250,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """M5 summary parity (node_operations.py:449-536): the reference fills
    each entity's ``summary`` with an LLM digest (≤250 words) of the facts
    that mention it; here the digest is deterministic — the entity's first
    ``max_facts`` facts in event-time order joined with '; ', capped at
    ``max_words`` words. Shape: edges explode to (entity, fact) rows from
    BOTH endpoints → ``sorted_run_map`` digest per entity (no per-group
    Python dispatch) → hash join back onto nodes; entities with no facts
    keep their template summary."""
    import functools

    from graphiti_ray.stages.ops import sorted_run_map

    def explode(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "uuid": pa.concat_arrays(
                    [
                        batch.column("subj_uuid").combine_chunks(),
                        batch.column("obj_uuid").combine_chunks(),
                    ]
                ),
                "edge_uuid": pa.concat_arrays(
                    [batch.column("uuid").combine_chunks()] * 2
                ),
                "valid_at": pa.concat_arrays(
                    [batch.column("valid_at").combine_chunks()] * 2
                ),
                "fact": pa.concat_arrays([batch.column("fact").combine_chunks()] * 2),
            }
        )

    per_entity = edges.select_columns(
        ["uuid", "subj_uuid", "obj_uuid", "valid_at", "fact"]
    ).map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    digests = sorted_run_map(
        per_entity,
        key_cols=["uuid"],
        order_cols=["valid_at", "edge_uuid"],
        block_fn=functools.partial(
            _summary_block, max_facts=max_facts, max_words=max_words
        ),
        # digest reads only the run's first max_facts rows (event-time
        # order) — a hub entity's tail is provably unused
        on_carry_overflow="truncate",
    ).materialize()

    # digests are entity-vocabulary-sized (one row per entity WITH facts),
    # the same scale as the canonical map — broadcast below BROADCAST_LIMIT.
    # The hash-join fallback can't carry list-typed non-key columns through
    # acero, so the wide nodes table side stays un-shuffled in both paths:
    # above the limit, digests apply in partition-sized broadcast chunks.
    if digests.count() <= BROADCAST_LIMIT:
        lut_refs = [_digest_lut_ref(digests)]
    else:  # chunked broadcast: each chunk is a bounded dict; N passes
        lut_refs = [
            _digest_lut_ref(part) for part in digests.split(max(2, num_partitions or 8))
        ]

    out = nodes
    for ref in lut_refs:
        out = out.map_batches(
            functools.partial(_apply_digest_fn, lut_ref=ref),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return out


def _digest_lut_ref(digests: rd.Dataset):
    import ray

    df = digests.select_columns(["uuid", "fact_summary"]).to_pandas()
    return ray.put(dict(zip(df["uuid"], df["fact_summary"])))


def _apply_digest_fn(batch: pa.Table, lut_ref=None) -> pa.Table:
    lut = _cached_lut(lut_ref)
    uuids = batch.column("uuid").to_pylist()
    current = batch.column("summary").to_pylist()
    merged = [lut.get(u, s) for u, s in zip(uuids, current)]
    i = batch.column_names.index("summary")
    return batch.set_column(i, "summary", pa.array(merged, pa.string()))


def _with_key(ds: rd.Dataset, out_col: str, name_col: str) -> rd.Dataset:
    def add(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.binary_join_element_wise(
            batch.column("group_id"), batch.column(name_col), "|"
        )
        return batch.append_column(out_col, key)

    return ds.map_batches(add, batch_format="pyarrow")


def apply_canonical(
    triples: rd.Dataset, canon: rd.Dataset, num_partitions: int | None = None
) -> rd.Dataset:
    """M13: rewrite triple endpoints through the canonical map.

    Hash-partitioned joins on (group_id|name) — both sides shuffled once per
    endpoint. Triples with an endpoint missing from the map are dropped,
    mirroring resolve_edge_pointers' unmapped-endpoint drop
    (bulk_utils.py:402-426) — with NER-derived endpoints the map always
    covers them, so this is a safety net, not a data path.
    """
    if num_partitions is None:
        num_partitions = default_join_partitions()
    cmap = canon.select_columns(["group_id", "name", "canonical", "entity_uuid"])
    cmap_s = _with_key(cmap, "subj_key", "name").drop_columns(["group_id", "name"])
    cmap_o = _with_key(cmap, "obj_key", "name").drop_columns(["group_id", "name"])

    t = _with_key(triples, "subj_key", "subj_name")
    t = _with_key(t, "obj_key", "obj_name")

    t = safe_join(
        t,
        cmap_s,
        join_type="inner",
        num_partitions=num_partitions,
        on=("subj_key",),
        right_suffix="_subj",
    ).rename_columns(
        {"canonical": "subj_canonical", "entity_uuid": "subj_uuid"}
    )
    t = safe_join(
        t,
        cmap_o,
        join_type="inner",
        num_partitions=num_partitions,
        on=("obj_key",),
        right_suffix="_obj",
    ).rename_columns({"canonical": "obj_canonical", "entity_uuid": "obj_uuid"})
    return t.drop_columns(["subj_key", "obj_key"])


BROADCAST_LIMIT = 2_000_000  # canon rows; above this use the hash join


def canon_lookup_ref(canon: rd.Dataset):
    """Materialize the canonical map as one broadcast dict in the object
    store: {"group|name": (canonical, entity_uuid)}.

    The small-side broadcast pattern (ray_guide "Joins and lookups"): put
    once on the driver, read zero-copy-ish in every task — no shuffle of the
    large mentions/triples side at all. The map holds one entry per distinct
    (host, surface), which is vocabulary-sized, not corpus-sized; above
    BROADCAST_LIMIT fall back to ``apply_canonical`` (hash join).
    """
    import ray

    if isinstance(canon, pd.DataFrame):
        # small-side fast path: a checkpointed canonical_map is read back
        # with plain pyarrow (state.checkpoint.read_table_pandas) — spinning
        # up a whole streaming execution to fetch a vocabulary-sized table
        # costs ~1s of fixed overhead per run_kg stage boundary
        df = canon[["group_id", "name", "canonical", "entity_uuid"]]
    else:
        df = canon.select_columns(
            ["group_id", "name", "canonical", "entity_uuid"]
        ).to_pandas()
    # broadcast payload: a pandas hash Index over "group|name" keys plus
    # parallel value arrays — built once, cached per worker (_cached_lut),
    # probed with vectorized get_indexer instead of a Python dict.get per
    # row (round-1 verdict item: Arrow/C lookups on the broadcast side)
    keys = pd.Index((df["group_id"] + "|" + df["name"]).to_numpy())
    return ray.put(
        (keys, df["canonical"].to_numpy(), df["entity_uuid"].to_numpy())
    )


def _join_key(batch: pa.Table, a: str, b: str):
    """Vectorized 'group|name' key column → numpy object array."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(
        batch.column(a), batch.column(b), "|"
    ).to_numpy(zero_copy_only=False)


# worker-global cache for broadcast lookups: same amortization as an actor
# pool without per-execution actor spin-up (ObjectRef → materialized dict)
_LUT_CACHE: dict = {}


def _cached_lut(lut_ref):
    import ray

    key = lut_ref.hex() if hasattr(lut_ref, "hex") else id(lut_ref)
    lut = _LUT_CACHE.get(key)
    if lut is None:
        lut = ray.get(lut_ref)
        _LUT_CACHE.clear()  # one live lut per worker is plenty
        _LUT_CACHE[key] = lut
    return lut


def _canon_apply_fn(batch: pa.Table, lut_ref=None) -> pa.Table:
    """Rewrite subj/obj through the broadcast lookup, dropping rows with
    unmapped endpoints (resolve_edge_pointers drop semantics,
    bulk_utils.py:402-426). Fully vectorized: one hash-index probe per
    column, numpy fancy-indexing for the value pulls."""
    import numpy as np

    keys, canon_arr, uuid_arr = _cached_lut(lut_ref)
    si = keys.get_indexer(_join_key(batch, "group_id", "subj_name"))
    oi = keys.get_indexer(_join_key(batch, "group_id", "obj_name"))
    m = (si >= 0) & (oi >= 0)
    out = batch.filter(pa.array(m))
    si, oi = si[m], oi[m]
    out = out.append_column("subj_canonical", pa.array(canon_arr[si], pa.string()))
    out = out.append_column("subj_uuid", pa.array(uuid_arr[si], pa.string()))
    out = out.append_column("obj_canonical", pa.array(canon_arr[oi], pa.string()))
    out = out.append_column("obj_uuid", pa.array(uuid_arr[oi], pa.string()))
    return out


def _mention_apply_fn(batch: pa.Table, lut_ref=None) -> pa.Table:
    """Mention rows → MENTIONS edge rows via the broadcast hash index +
    vectorized per-batch distinct on (episode, entity); only the
    content-hash uuid of the surviving (deduped) rows costs Python."""
    from graphiti_ray.functions.text import md5_hex

    keys, _, uuid_arr = _cached_lut(lut_ref)
    mi = keys.get_indexer(_join_key(batch, "group_id", "name"))
    m = mi >= 0
    df = pd.DataFrame(
        {
            "episode_uuid": batch.column("episode_uuid").to_numpy(
                zero_copy_only=False
            )[m],
            "entity_uuid": uuid_arr[mi[m]],
            "group_id": batch.column("group_id").to_numpy(zero_copy_only=False)[m],
        }
    ).drop_duplicates(["episode_uuid", "entity_uuid"])
    uuids = [
        md5_hex(f"{e}|{t}")
        for e, t in zip(df["episode_uuid"], df["entity_uuid"])
    ]
    return pa.table(
        {
            "uuid": pa.array(uuids, pa.string()),
            "group_id": pa.array(df["group_id"], pa.string()),
            "episode_uuid": pa.array(df["episode_uuid"], pa.string()),
            "entity_uuid": pa.array(df["entity_uuid"], pa.string()),
        }
    )


def apply_canonical_broadcast(triples: rd.Dataset, lut_ref) -> rd.Dataset:
    import functools

    return triples.map_batches(
        functools.partial(_canon_apply_fn, lut_ref=lut_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def mention_edges_broadcast(mentions: rd.Dataset, lut_ref) -> rd.Dataset:
    """MENTIONS edges via broadcast map + exact ZERO-SHUFFLE distinct.

    The per-batch seen-set removes almost all duplicates; an episode whose
    rows straddle a batch/block boundary can still emit the same
    (episode, entity) twice when two aliases map to one entity. Those
    duplicates can only occur within one episode's contiguous run of rows
    (extraction emits each episode's mentions together, and every
    order-preserving hop keeps them contiguous within a block), so the
    exact distinct is ops.distinct_by_key_contiguous — per-block dedup plus
    a boundary fix for episodes split across blocks. mention_edges is the
    LARGEST table of the build (≈4 rows/doc with long content-hash uuids);
    replacing the old sort-based distinct with the contiguous kernel
    removes the build's single biggest all-to-all shuffle. Exact because
    the uuid is a content hash (equal uuid ⇒ identical row).
    """
    from graphiti_ray.stages.ops import distinct_by_key_contiguous

    import functools

    mapped = mentions.select_columns(
        ["episode_uuid", "group_id", "name"]
    ).map_batches(
        functools.partial(_mention_apply_fn, lut_ref=lut_ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return distinct_by_key_contiguous(mapped, "uuid", "episode_uuid")


# --- fuzzy merge path (J1 cosine re-rank / D2 semantic dedup) ---------------


def fuzzy_merge_pairs(
    canon: rd.Dataset, threshold: float = 0.85, max_group: int = 2048
) -> rd.Dataset:
    """Near-duplicate canonical names within each group: char-3gram hashing
    embeddings + cosine ≥ threshold (the deterministic stand-in for the
    reference's name_embedding cosine > 0.6 candidate generation,
    search_utils.py:662-750). Groups larger than ``max_group`` are blocked
    by MinHash band first (dedup.MinHashStage machinery) instead of
    all-pairs. Output: (group_id, a, b, cosine) with a < b."""
    import numpy as np

    from graphiti_ray.stages.dedup import minhash_sig, BANDS, ROWS_PER_BAND
    from graphiti_ray.stages.embed import embed_texts

    ents = canon.map_batches(
        lambda t: t.select(["group_id", "canonical"])
        .group_by(["group_id", "canonical"])
        .aggregate([]),
        batch_format="pyarrow",
    )

    def run_pairs(group_id: str, names: list[str], rows: list) -> None:
        import zlib

        if len(names) < 2:
            return
        # block to keep candidate sets sub-quadratic on big vocabularies
        if len(names) > max_group:
            buckets: dict[int, list[str]] = {}
            for n in names:
                sig = minhash_sig(n.lower())
                sb = sig.astype("<i8").tobytes()
                for b in range(BANDS):
                    chunk = sb[b * ROWS_PER_BAND * 8 : (b + 1) * ROWS_PER_BAND * 8]
                    buckets.setdefault(zlib.crc32(chunk) ^ (b << 28), []).append(n)
            cand_sets = [sorted(set(v)) for v in buckets.values() if len(v) > 1]
        else:
            cand_sets = [names]
        seen = set()
        for cset in cand_sets:
            vecs = embed_texts([n.lower() for n in cset]).astype(np.float64)
            sims = vecs @ vecs.T
            # vectorized upper-triangle threshold: Python only touches HITS
            iu, ju = np.triu_indices(len(cset), k=1)
            hit = sims[iu, ju] >= threshold
            for x, y, s in zip(iu[hit], ju[hit], sims[iu, ju][hit]):
                pair = (cset[x], cset[y])
                if pair not in seen:
                    seen.add(pair)
                    rows.append((group_id, pair[0], pair[1], float(round(s, 6))))

    def pairs_block(tbl: pa.Table) -> pa.Table:
        """COMPLETE group runs (sorted_run_map contract) — one Python call
        per block of groups, not a map_groups dispatch per group_id (the
        round-3 verdict's last opt-in per-key dispatch site)."""
        empty = pa.table(
            {
                "group_id": pa.array([], pa.string()),
                "a": pa.array([], pa.string()),
                "b": pa.array([], pa.string()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        from graphiti_ray.stages.ops import _table_run_starts

        starts = _table_run_starts(tbl, ["group_id"])
        gids = tbl.column("group_id").to_pylist()
        canon_names = tbl.column("canonical").to_pylist()
        rows: list[tuple] = []
        for s, e in zip(starts[:-1], starts[1:]):
            # names arrive sorted by the range sort; set() drops the
            # cross-batch duplicates the per-batch combiner can leave
            run_pairs(gids[s], sorted(set(canon_names[s:e])), rows)
        if not rows:
            return empty
        g, a, b, c = zip(*rows)
        return pa.table(
            {
                "group_id": pa.array(list(g), pa.string()),
                "a": pa.array(list(a), pa.string()),
                "b": pa.array(list(b), pa.string()),
                "cosine": pa.array(list(c), pa.float64()),
            }
        )

    from graphiti_ray.stages.ops import sorted_run_map

    return sorted_run_map(
        ents, key_cols=["group_id"], order_cols=["canonical"], block_fn=pairs_block
    )


def apply_fuzzy_merges(canon: rd.Dataset, pairs: rd.Dataset) -> rd.Dataset:
    """Collapse fuzzy-merge pairs into the canonical map: union-find over
    (group, name) pairs (winner = lexicographically smaller canonical, the
    reference's deterministic 'first occurrence wins' analogue), then
    rewrite canonical + entity_uuid. Pair sets are vocabulary-sized, so
    union-find runs on the driver (guide: small candidate sets)."""
    import ray

    pdf = pairs.select_columns(["group_id", "a", "b"]).to_pandas()
    parent: dict[tuple, tuple] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pdf.itertuples(index=False):
        ra, rb = find((r.group_id, r.a)), find((r.group_id, r.b))
        if ra != rb:
            win, lose = (ra, rb) if ra[1] <= rb[1] else (rb, ra)
            parent[lose] = win

    merge_map = {
        f"{k[0]}|{k[1]}": find(k)[1] for k in list(parent) if find(k) != k
    }
    if not merge_map:
        return canon
    ref = ray.put(merge_map)

    def rewrite(batch: pa.Table) -> pa.Table:
        m = _cached_lut(ref)
        groups = batch.column("group_id").to_pylist()
        canonicals = batch.column("canonical").to_pylist()
        new_canon, new_uuid = [], []
        for g, c in zip(groups, canonicals):
            w = m.get(f"{g}|{c}", c)
            new_canon.append(w)
            new_uuid.append(entity_uuid(g, w))
        i = batch.column_names.index("canonical")
        batch = batch.set_column(i, "canonical", pa.array(new_canon, pa.string()))
        i = batch.column_names.index("entity_uuid")
        return batch.set_column(i, "entity_uuid", pa.array(new_uuid, pa.string()))

    return canon.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True)


def fuzzy_canonical_map(
    mentions: rd.Dataset, threshold: float = 0.85
) -> rd.Dataset:
    """Full linking with the fuzzy pass stacked on the rule pass: exact +
    alias rules (canonical_map) → cosine near-dup merge (D2 semantic dedup
    scale path). OFF in the default pipeline: the correctness oracle pins
    the rule-only behavior; enable for noisy real-world corpora."""
    canon = canonical_map(mentions).materialize()
    pairs = fuzzy_merge_pairs(canon, threshold=threshold)
    return apply_fuzzy_merges(canon, pairs)


# --- distributed union-find (A6 / G5) --------------------------------------


def compress_mapping(
    mapping: rd.Dataset, max_rounds: int = 16, num_partitions: int | None = None
) -> rd.Dataset:
    """Path compression of a uuid→parent mapping by pointer jumping.

    ``compress_uuid_map`` (bulk_utils.py:387-396) walks chains recursively on
    the driver; at scale the mapping is a Dataset of (uuid, parent) edges and
    each round does parent := parent.parent via a hash join — O(log chain)
    rounds (GraphX / BTS-style connected components, PAPERS.md).

    Converges when a round changes nothing (checked with a cheap count of
    rows whose parent changed).
    """
    if num_partitions is None:
        num_partitions = default_join_partitions()
    m = mapping.select_columns(["uuid", "parent"])
    for _ in range(max_rounds):
        # same-name key join (ray 2.49 right_on name resolution is buggy)
        parents = m.rename_columns({"parent": "grandparent"}).rename_columns(
            {"uuid": "parent"}
        )
        joined = safe_join(
            m,
            parents,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("parent",),
        )

        def jump(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            gp = batch.column("grandparent")
            parent = batch.column("parent")
            new_parent = pc.if_else(pc.is_valid(gp), gp, parent)
            changed = pc.cast(pc.not_equal(new_parent, parent), pa.int64())
            return pa.table(
                {
                    "uuid": batch.column("uuid"),
                    "parent": new_parent,
                    "changed": changed,
                }
            )

        jumped = joined.map_batches(jump, batch_format="pyarrow").materialize()
        n_changed = jumped.sum("changed")
        m = jumped.drop_columns(["changed"])
        if not n_changed:
            break
    return m
