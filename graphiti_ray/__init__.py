"""graphiti_ray — a Ray-Data-native temporal knowledge-graph construction engine.

A from-scratch rebuild of the *capabilities* of graphiti (reference:
/root/reference, graphiti-core v0.11.6) as an offline, dataset-parallel
pipeline: ``ray.data.read_parquet`` over Common-Crawl-style pages →
zero-copy Arrow ``map_batches`` for deterministic HTML→text extraction →
actor-pool NER / relation extraction → groupby-shuffle entity linking +
union-find canonicalization → sorted per-partition temporal invalidation
sweep → Parquet node/edge tables.

The reference is an online per-episode system (LLM + Neo4j); this engine
re-expresses the same semantics (bi-temporal edges, group-scoped entity
resolution, provenance) as streaming batch transforms over Arrow blocks.
Nothing here is a port: extraction is deterministic (regex/gazetteer), state
lives in Parquet tables, and every wide step is an explicit keyed shuffle.
"""

__version__ = "0.1.0"

# Pinned stage versions: bump on any behavior change (resumability contract).
TEXT_EXTRACT_VERSION = "tx1"
# pg2: warc_ts wraps for bench replicas (doc_id % 100_000 hours +
# doc_id // 100_000 ms) — identical to pg1 for every real doc_id < 100_000,
# so goldens/oracles are unchanged; only replicated bench inputs differ.
PAGEGEN_VERSION = "pg2"
EMBED_VERSION = "he1"


def __getattr__(name):
    """Lazy convenience exports (keep `import graphiti_ray` cheap — no ray
    import at module load)."""
    lazy = {
        "build_kg": ("graphiti_ray.pipelines.kg", "build_kg"),
        "run_kg": ("graphiti_ray.pipelines.kg", "run_kg"),
        "add_pages": ("graphiti_ray.pipelines.incremental", "add_pages"),
        "KGSearcher": ("graphiti_ray.pipelines.search", "KGSearcher"),
        "SearchConfig": ("graphiti_ray.pipelines.search", "SearchConfig"),
        "SearchFilters": ("graphiti_ray.pipelines.search", "SearchFilters"),
        "read_pages": ("graphiti_ray.sources.pages", "read_pages"),
        "pages_dataset": ("graphiti_ray.sources.pages", "pages_dataset"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
