"""The composite web-corpus preparation pipeline — the Common-Crawl
pre-processing chain a training-data or KG-construction user runs before
anything in ``pipelines/kg.py`` sees a page (reference analogue: the
upstream corpus prep graphiti's ingest assumes, SURVEY.md §2 S11):

    raw pages ─ robots gate ─→ allowed pages
             ─ per-host boilerplate removal ─→ (url, cleaned text)
             ─ quality gate (min cleaned length) ─→ survivors
             ─ exact dedup (min-url winner per distinct text) ─→ corpus

Every stage is one of the repo's oracle-proven operators; this module is
pure composition, and the DuckDB twin composes the same CTEs in the same
order — so the whole chain is value-exact end-to-end, not just each link.

Scale shape: the gates are stateless map_batches filters; boilerplate is
two range sorts (df annotate + reconstruction); dedup is one more sort
via ``head_k_per_key``. No driver materialization anywhere.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd


def clean_web_corpus(
    pages: rd.Dataset,
    robots_rules: rd.Dataset,
    min_len: int = 200,
) -> rd.Dataset:
    """robots → boilerplate → length gate → exact dedup; returns
    (url, text) with one winner (min url) per distinct cleaned text."""
    from graphiti_ray.stages.boilerplate import remove_boilerplate
    from graphiti_ray.stages.dedup import md5_hex_column
    from graphiti_ray.stages.ops import head_k_per_key
    from graphiti_ray.stages.urls import robots_gate

    gated = robots_gate(pages, robots_rules)
    cleaned = remove_boilerplate(gated)  # (url, text, n_lines)

    def quality(t: pa.Table) -> pa.Table:
        keep = pc.greater_equal(pc.utf8_length(t.column("text")), min_len)
        return t.filter(keep).select(["url", "text"])

    survivors = cleaned.map_batches(
        quality, batch_format="pyarrow", zero_copy_batch=True
    )

    def add_hash(t: pa.Table) -> pa.Table:
        return t.append_column(
            "text_hash", pa.array(md5_hex_column(t.column("text")), pa.string())
        )

    hashed = survivors.map_batches(
        add_hash, batch_format="pyarrow", zero_copy_batch=True
    )
    winners = head_k_per_key(hashed, ["text_hash"], ["url"], k=1)
    return winners.drop_columns(["text_hash"])
