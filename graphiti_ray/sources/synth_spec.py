"""Pinned spec (version pg1) for synthesizing Common-Crawl-style ``pages``
from the driver's ``documents`` table — pure arithmetic on ``doc_id``.

Why arithmetic: the whole KG pipeline (HTML wrap → byte-identical extract →
NER/relations → linking → temporal sweep) can then be checked end-to-end by a
DuckDB oracle that *independently* re-derives the expected triples from
``doc_id`` with SQL — no shared code path with the Ray engine beyond this spec.

Fixture shapes follow FIXTURES.md (F1/F2/F3): alias variants exercise entity
linking (reference dedup semantics prompts/dedupe_nodes.py:100-108), the
LIKES/DISLIKES pair exercises temporal contradiction
(edge_operations.py:364-394), SCREAMING_SNAKE predicates follow
prompts/extract_edges.py:26.

Every page text = three paragraphs: fact1 (person relation), fact2 (org
location), then the original document text. ``warc_ts = 2024-01-01 +
doc_id hours``; ``url = https://{source}.example.com/doc/{doc_id}``;
``group_id = host``.
"""

from __future__ import annotations

from datetime import datetime

PERSONS = [
    "Alice Smith",
    "Bob Jones",
    "Carol White",
    "David Brown",
    "Eve Davis",
    "Frank Miller",
    "Grace Wilson",
    "Henry Moore",
]
ORGS = [
    "Acme Corp",
    "Globex Inc",
    "Initech LLC",
    "Umbrella Labs",
    "Stark Industries",
    "Wayne Enterprises",
]
PLACES = ["Paris", "Berlin", "Tokyo", "London", "Madrid"]

TS0 = datetime(2024, 1, 1)  # naive UTC (Arrow/DuckDB default)

PRED_BY_KIND = ["WORKS_AT", "CEO_OF", "LIKES", "DISLIKES"]

# Mutual-exclusion classes driving the temporal invalidation sweep (T1,
# edge_operations.py:364-394). 'pair' → a newer edge with the same
# (subj, obj) but different predicate in the class invalidates the older;
# 'subj' → a newer edge with the same subj and different obj invalidates.
EXCLUSION_CLASSES: dict[str, tuple[str, frozenset[str]]] = {
    "LIKES": ("pair", frozenset({"LIKES", "DISLIKES"})),
    "DISLIKES": ("pair", frozenset({"LIKES", "DISLIKES"})),
    "WORKS_AT": ("subj", frozenset({"WORKS_AT"})),
    "CEO_OF": ("subj", frozenset({"CEO_OF"})),
    "LOCATED_IN": ("subj", frozenset({"LOCATED_IN"})),
}


def person_alias(idx: int, alias_idx: int) -> str:
    full = PERSONS[idx]
    first, last = full.split(" ")
    if alias_idx == 1:
        return first
    if alias_idx == 2:
        return f"{first[0]}. {last}"
    return full


def org_alias(idx: int, alias_idx: int) -> str:
    full = ORGS[idx]
    return full.split(" ")[0] if alias_idx == 1 else full


def derive(doc_id: int) -> dict:
    """All per-doc generation parameters, pure function of doc_id."""
    p_idx = doc_id % 8
    kind = (doc_id // 8) % 4
    alias_idx = (doc_id // 8) % 3
    q_idx = (doc_id + 3) % 8
    o_idx = doc_id % 6
    org_alias_idx = (doc_id // 6) % 2
    place_idx = (doc_id // 6) % 5
    return dict(
        p_idx=p_idx,
        kind=kind,
        alias_idx=alias_idx,
        q_idx=q_idx,
        o_idx=o_idx,
        org_alias_idx=org_alias_idx,
        place_idx=place_idx,
    )


def fact_sentences(doc_id: int) -> tuple[str, str]:
    """(fact1, fact2) paragraph strings for one doc."""
    d = derive(doc_id)
    subj = person_alias(d["p_idx"], d["alias_idx"])
    kind = d["kind"]
    if kind == 0:
        obj = org_alias(d["o_idx"], d["org_alias_idx"])
        fact1 = f"{subj} works at {obj}."
    elif kind == 1:
        obj = org_alias(d["o_idx"], d["org_alias_idx"])
        fact1 = f"{subj} is the CEO of {obj}."
    elif kind == 2:
        fact1 = f"{subj} likes {PERSONS[d['q_idx']]}."
    else:
        fact1 = f"{subj} dislikes {PERSONS[d['q_idx']]}."
    fact2 = f"{ORGS[d['o_idx']]} is located in {PLACES[d['place_idx']]}."
    return fact1, fact2


def page_url(source: str, doc_id: int) -> str:
    return f"https://{source}.example.com/doc/{doc_id}"


def page_host(source: str) -> str:
    return f"{source}.example.com"


# ---------------------------------------------------------------------------
# SQL snippets for the DuckDB oracle (same arithmetic, independent engine).
# All take the documents view columns (doc_id, text, lang, source).
# ---------------------------------------------------------------------------


def _sql_list(items: list[str]) -> str:
    inner = ",".join("'" + i.replace("'", "''") + "'" for i in items)
    return f"[{inner}]"


PERSONS_FULL_SQL = _sql_list(PERSONS)
PERSONS_FIRST_SQL = _sql_list([p.split(" ")[0] for p in PERSONS])
PERSONS_INIT_SQL = _sql_list(
    [f"{p.split(' ')[0][0]}. {p.split(' ')[1]}" for p in PERSONS]
)
ORGS_FULL_SQL = _sql_list(ORGS)
ORGS_FIRST_SQL = _sql_list([o.split(" ")[0] for o in ORGS])
PLACES_SQL = _sql_list(PLACES)

SQL_GROUP_ID = "source || '.example.com'"
SQL_URL = "'https://' || source || '.example.com/doc/' || doc_id"
SQL_VALID_AT = "TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 HOUR"

SQL_SUBJ_SURFACE = f"""CASE ((doc_id//8)%3)
  WHEN 0 THEN {PERSONS_FULL_SQL}[(doc_id%8)+1]
  WHEN 1 THEN {PERSONS_FIRST_SQL}[(doc_id%8)+1]
  ELSE {PERSONS_INIT_SQL}[(doc_id%8)+1] END"""

SQL_PRED1 = """CASE ((doc_id//8)%4)
  WHEN 0 THEN 'WORKS_AT' WHEN 1 THEN 'CEO_OF'
  WHEN 2 THEN 'LIKES' ELSE 'DISLIKES' END"""

SQL_OBJ1_SURFACE = f"""CASE WHEN ((doc_id//8)%4) IN (2,3)
  THEN {PERSONS_FULL_SQL}[((doc_id+3)%8)+1]
  ELSE (CASE ((doc_id//6)%2) WHEN 0 THEN {ORGS_FULL_SQL}[(doc_id%6)+1]
        ELSE {ORGS_FIRST_SQL}[(doc_id%6)+1] END) END"""

SQL_SUBJ2_SURFACE = f"{ORGS_FULL_SQL}[(doc_id%6)+1]"
SQL_OBJ2_SURFACE = f"{PLACES_SQL}[((doc_id//6)%5)+1]"

SQL_FACT1 = f"""CASE ((doc_id//8)%4)
  WHEN 0 THEN ({SQL_SUBJ_SURFACE}) || ' works at ' || ({SQL_OBJ1_SURFACE}) || '.'
  WHEN 1 THEN ({SQL_SUBJ_SURFACE}) || ' is the CEO of ' || ({SQL_OBJ1_SURFACE}) || '.'
  WHEN 2 THEN ({SQL_SUBJ_SURFACE}) || ' likes ' || ({SQL_OBJ1_SURFACE}) || '.'
  ELSE ({SQL_SUBJ_SURFACE}) || ' dislikes ' || ({SQL_OBJ1_SURFACE}) || '.' END"""

SQL_FACT2 = f"({SQL_SUBJ2_SURFACE}) || ' is located in ' || ({SQL_OBJ2_SURFACE}) || '.'"

# NOTE: canonical (post-linking) surfaces are NOT derived arithmetically in
# the oracle — the oracle replicates the engine's conditional alias-merge rule
# (merge only when a unique in-group full form exists) via SQL joins, so the
# two sides agree even when a group never saw the full form. See
# __ray_entry__.oracle_sql()['kg_nodes' / 'kg_edges'].
