"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash).

Design note: the KG pipeline's input ``pages`` table is synthesized from
``documents.parquet`` by *pure arithmetic on doc_id* (graphiti_ray/sources/
synth_spec.py, version pg1). That lets the DuckDB oracle re-derive the
expected output of the entire Ray chain — HTML render → byte-identical
text extraction → regex NER/relations → group-scoped entity linking →
edge merge → temporal invalidation sweep — *independently*, from the raw
documents table. Column names match exactly on both sides.

No ray.init()/ray.shutdown() here (driver owns the session).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from graphiti_ray.sources import synth_spec as spec

# ---------------------------------------------------------------------------
# shared oracle CTEs (documents → derived pages/mentions/canonical entities)
# ---------------------------------------------------------------------------

_BASE_CTE = f"""
base AS (
  SELECT doc_id,
         {spec.SQL_GROUP_ID} AS group_id,
         {spec.SQL_URL} AS url,
         {spec.SQL_VALID_AT} AS valid_at,
         ({spec.SQL_SUBJ_SURFACE}) AS subj1,
         ({spec.SQL_PRED1}) AS pred1,
         ({spec.SQL_OBJ1_SURFACE}) AS obj1,
         ({spec.SQL_SUBJ2_SURFACE}) AS subj2,
         'LOCATED_IN' AS pred2,
         ({spec.SQL_OBJ2_SURFACE}) AS obj2,
         ({spec.SQL_FACT1}) AS fact1,
         ({spec.SQL_FACT2}) AS fact2,
         text
  FROM documents
)"""

# per-episode distinct mention surfaces (engine: MentionExtractor seen-set)
_MENTIONS_CTE = """
ment AS (
  SELECT DISTINCT md5(url) AS episode_uuid, group_id, name, valid_at FROM (
    SELECT url, group_id, subj1 AS name, valid_at FROM base
    UNION ALL SELECT url, group_id, obj1, valid_at FROM base
    UNION ALL SELECT url, group_id, subj2, valid_at FROM base
    UNION ALL SELECT url, group_id, obj2, valid_at FROM base
  )
)"""

# the engine's conditional alias-merge rule (stages/link.py resolve_group),
# replicated relationally: merge only when a unique in-group full form exists
_CANON_CTE = r"""
surf AS (SELECT group_id, name, count(*) AS mention_count
         FROM ment GROUP BY 1, 2),
fulls AS (SELECT DISTINCT group_id, name FROM surf
          WHERE name LIKE '% %' AND NOT regexp_matches(name, '^[A-Z]\. ')),
ff AS (SELECT group_id, split_part(name, ' ', 1) AS tok,
              min(name) AS full_name, count(DISTINCT name) AS c
       FROM fulls GROUP BY 1, 2),
fi AS (SELECT group_id, substr(name, 1, 1) AS ini,
              string_split(name, ' ')[-1] AS last_tok,
              min(name) AS full_name, count(DISTINCT name) AS c
       FROM fulls GROUP BY 1, 2, 3),
canon AS (
  SELECT s.group_id, s.name, s.mention_count,
    CASE
      WHEN s.name LIKE '% %' AND NOT regexp_matches(s.name, '^[A-Z]\. ')
        THEN s.name
      WHEN regexp_matches(s.name, '^[A-Z]\. ')
        THEN coalesce(CASE WHEN fi.c = 1 THEN fi.full_name END, s.name)
      ELSE coalesce(CASE WHEN ff.c = 1 THEN ff.full_name END, s.name)
    END AS canonical
  FROM surf s
  LEFT JOIN fi ON fi.group_id = s.group_id
              AND fi.ini = substr(s.name, 1, 1)
              AND fi.last_tok = string_split(s.name, ' ')[-1]
  LEFT JOIN ff ON ff.group_id = s.group_id AND ff.tok = s.name
)"""

_RESOLVED_CTE = """
resolved AS (
  SELECT b.group_id, b.valid_at, md5(b.url) AS episode_uuid,
         cs.canonical AS subj_canonical, b.pred1 AS pred,
         co.canonical AS obj_canonical
  FROM base b
  JOIN canon cs ON cs.group_id = b.group_id AND cs.name = b.subj1
  JOIN canon co ON co.group_id = b.group_id AND co.name = b.obj1
  UNION ALL
  SELECT b.group_id, b.valid_at, md5(b.url),
         cs.canonical, b.pred2, co.canonical
  FROM base b
  JOIN canon cs ON cs.group_id = b.group_id AND cs.name = b.subj2
  JOIN canon co ON co.group_id = b.group_id AND co.name = b.obj2
),
merged AS (
  SELECT group_id,
         md5(group_id || '|' || lower(subj_canonical)) AS subj_uuid,
         pred,
         md5(group_id || '|' || lower(obj_canonical)) AS obj_uuid,
         min(subj_canonical) AS subj_canonical,
         min(obj_canonical) AS obj_canonical,
         min(valid_at) AS valid_at,
         count(DISTINCT episode_uuid) AS episode_count
  FROM resolved
  GROUP BY 1, 2, 3, 4
),
merged_id AS (
  SELECT md5(group_id || '|' || subj_uuid || '|' || pred || '|' || obj_uuid)
           AS uuid, *
  FROM merged
),
pair_inv AS (
  SELECT uuid, lead(valid_at) OVER (
           PARTITION BY group_id, subj_uuid, obj_uuid
           ORDER BY valid_at, uuid) AS inv
  FROM merged_id WHERE pred IN ('LIKES', 'DISLIKES')
),
subj_inv AS (
  SELECT uuid, lead(valid_at) OVER (
           PARTITION BY group_id, subj_uuid, pred
           ORDER BY valid_at, uuid) AS inv
  FROM merged_id WHERE pred IN ('WORKS_AT', 'CEO_OF', 'LOCATED_IN')
)"""


def _pages(sf_dir: str):
    from graphiti_ray.sources.pages import pages_dataset

    return pages_dataset(sf_dir)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full KG build, returns
    the final bi-temporal edges table."""
    from graphiti_ray.pipelines.kg import build_kg

    tables = build_kg(_pages("/root/testdata/sf0.001"), num_partitions=8)
    return tables["edges"]


# ---------------------------------------------------------------------------
# queries (Ray) — column names match oracle_sql exactly
# ---------------------------------------------------------------------------


def _q_kg_episodes(sf_dir: str):
    from graphiti_ray.stages.extract import episodes_dataset

    eps = episodes_dataset(_pages(sf_dir))
    return eps.select_columns(
        ["uuid", "name", "group_id", "content", "valid_at", "summary_text"]
    )


def _q_kg_mentions(sf_dir: str):
    from graphiti_ray.stages.extract import episodes_dataset
    from graphiti_ray.stages.nlp import mentions_dataset

    m = mentions_dataset(episodes_dataset(_pages(sf_dir)))
    return m.select_columns(["episode_uuid", "group_id", "name", "valid_at"])


def _q_kg_triples_raw(sf_dir: str):
    from graphiti_ray.stages.extract import episodes_dataset
    from graphiti_ray.stages.nlp import triples_dataset

    t = triples_dataset(episodes_dataset(_pages(sf_dir)))
    return t.select_columns(
        ["episode_uuid", "group_id", "subj_name", "pred", "obj_name", "fact", "valid_at"]
    )


def _q_kg_nodes(sf_dir: str):
    from graphiti_ray.stages.extract import episodes_dataset
    from graphiti_ray.stages.link import canonical_map, nodes_from_canonical
    from graphiti_ray.stages.nlp import mentions_dataset

    canon = canonical_map(mentions_dataset(episodes_dataset(_pages(sf_dir))))
    nodes = nodes_from_canonical(canon)
    return nodes.select_columns(["uuid", "name", "group_id", "mention_count"])


def _q_kg_edges(sf_dir: str):
    from graphiti_ray.pipelines.kg import build_kg

    tables = build_kg(_pages(sf_dir), embeddings=False)
    return tables["edges"].select_columns(
        [
            "uuid",
            "group_id",
            "subj_canonical",
            "pred",
            "obj_canonical",
            "valid_at",
            "invalid_at",
            "episode_count",
        ]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "kg_episodes": _q_kg_episodes,
        "kg_mentions": _q_kg_mentions,
        "kg_triples_raw": _q_kg_triples_raw,
        "kg_nodes": _q_kg_nodes,
        "kg_edges": _q_kg_edges,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "kg_episodes": f"""
WITH {_BASE_CTE.lstrip()}
SELECT md5(url) AS uuid, url AS name, group_id,
       fact1 || chr(10) || fact2 || chr(10) || trim(text) AS content,
       valid_at,
       coalesce(nullif(left(regexp_extract(
           fact1 || chr(10) || fact2 || chr(10) || trim(text),
           '^[^.!?\n]*[.!?\n]'), 250), ''),
         left(fact1 || chr(10) || fact2 || chr(10) || trim(text), 250))
         AS summary_text
FROM base
""",
        "kg_mentions": f"""
WITH {_BASE_CTE.lstrip()},
{_MENTIONS_CTE.lstrip()}
SELECT episode_uuid, group_id, name, valid_at FROM ment
""",
        "kg_triples_raw": f"""
WITH {_BASE_CTE.lstrip()}
SELECT md5(url) AS episode_uuid, group_id, subj1 AS subj_name, pred1 AS pred,
       obj1 AS obj_name, fact1 AS fact, valid_at
FROM base
UNION ALL
SELECT md5(url), group_id, subj2, pred2, obj2, fact2, valid_at FROM base
""",
        "kg_nodes": f"""
WITH {_BASE_CTE.lstrip()},
{_MENTIONS_CTE.lstrip()},
{_CANON_CTE.lstrip()}
SELECT md5(group_id || '|' || lower(canonical)) AS uuid,
       min(canonical) AS name, group_id,
       sum(mention_count)::BIGINT AS mention_count
FROM canon
GROUP BY group_id, md5(group_id || '|' || lower(canonical))
""",
        "kg_edges": f"""
WITH {_BASE_CTE.lstrip()},
{_MENTIONS_CTE.lstrip()},
{_CANON_CTE.lstrip()},
{_RESOLVED_CTE.lstrip()}
SELECT m.uuid, m.group_id, m.subj_canonical, m.pred, m.obj_canonical,
       m.valid_at, coalesce(p.inv, s.inv) AS invalid_at,
       m.episode_count::BIGINT AS episode_count
FROM merged_id m
LEFT JOIN pair_inv p USING (uuid)
LEFT JOIN subj_inv s USING (uuid)
""",
    }
