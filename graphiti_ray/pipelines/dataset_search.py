"""Dataset-mode hybrid search over the KG tables (SURVEY §2.9 at scale).

``KGSearcher`` (pipelines/search.py) materializes the tables with
``to_pandas`` — right for entity-sized graphs, wrong at web scale (the
round-1 verdict's "pandas-resident searcher"). ``KGDatasetSearcher`` keeps
every table a ``ray.data.Dataset``:

- each method's scoring pass is a ``map_batches`` over the table emitting
  NARROW (uuid, _score) rows, then a global ``sort`` + ``limit`` — only a
  candidate-list (≤ 2×limit uuids) ever reaches the driver;
- rerank kernels (rrf / mmr / episode_mentions / node_distance /
  cross_encoder — pipelines/search.py) run driver-side over those tiny
  candidate lists, exactly as the reference reranks over fetched rows
  (search/search.py:67-159);
- final hydration is a broadcast uuid-set filter over the table (one
  streaming pass), never a full materialization.

Result parity: identical top-k to ``KGSearcher`` by construction — the
same BM25 sidecar statistics (build_bm25_index), the same float64 +
round(9) cosine, the same tie order (_score desc, uuid asc), the same
rerank kernels; asserted by tests/test_dataset_search.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from graphiti_ray.pipelines.search import (
    BM25Index,
    MethodConfig,
    SearchConfig,
    SearchResults,
    COMBINED_HYBRID_SEARCH_RRF,
    _tokens,
    build_bm25_index,
    default_cross_encoder,
    episode_mentions_rerank,
    maximal_marginal_relevance,
    node_distance_rerank,
    rrf,
)
from graphiti_ray.stages.embed import embed_texts


def _broadcast_uuid_filter(ds: rd.Dataset, uuids: list[str]) -> pd.DataFrame:
    """One streaming pass keeping only rows whose uuid is in the (tiny)
    candidate set; returns the ≤len(uuids) surviving rows as pandas."""
    import ray

    # broadcast an Arrow array so the filter is one vectorized pc.is_in probe
    ref = ray.put(pa.array(sorted(set(uuids)), pa.string()))

    def keep(batch: pa.Table, _ref=ref) -> pa.Table:
        import pyarrow.compute as pc

        from graphiti_ray.stages.link import _cached_lut

        return batch.filter(
            pc.is_in(batch.column("uuid"), value_set=_cached_lut(_ref))
        )

    return ds.map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()


class KGDatasetSearcher:
    """Hybrid searcher whose scoring passes stream over Datasets.

    ``tables``: dict with Datasets for ``nodes`` / ``edges`` / ``episodes``
    (optionally ``communities``). Same search surface as ``KGSearcher``.
    """

    def __init__(
        self, tables: dict[str, rd.Dataset], cross_encoder=None
    ):
        self.tables = tables
        self.cross_encoder = cross_encoder
        self._bm25: dict[str, BM25Index] = {}

    def _ds(self, kind: str) -> rd.Dataset | None:
        name = {"edge": "edges", "node": "nodes", "episode": "episodes",
                "community": "communities"}[kind]
        return self.tables.get(name)

    def _index_for(self, kind: str, ds: rd.Dataset, col: str) -> BM25Index:
        if kind not in self._bm25:
            self._bm25[kind] = build_bm25_index(
                ds.select_columns([col]), col
            )
        return self._bm25[kind]

    # -- scoring passes (narrow output, sort+limit) --------------------------

    def _bm25_rank(self, kind, ds, col, query, group_ids, flt, limit):
        import ray

        q = _tokens(query)
        # broadcast only the query-scoped stats (O(|query|) bytes), never
        # the vocabulary — works identically for the dict-resident and
        # dataset-resident (corpus-scale) index variants
        idx_ref = ray.put(self._index_for(kind, ds, col).subset(q))

        def score(batch: pa.Table, _ref=idx_ref) -> pa.Table:
            from graphiti_ray.pipelines.search import bm25_score_texts
            from graphiti_ray.stages.link import _cached_lut

            index = _cached_lut(_ref)
            df = batch.to_pandas()
            if group_ids:
                df = df[df["group_id"].isin(group_ids)]
            if flt is not None:
                df = df[flt.mask(df, kind)]
            s = bm25_score_texts(index, q, df[col])
            out = pd.DataFrame({"uuid": df["uuid"], "_score": s.astype(float)})
            out = out[out._score > 0]
            return pa.Table.from_pandas(out, preserve_index=False).cast(
                pa.schema([("uuid", pa.string()), ("_score", pa.float64())])
            )

        top = (
            ds.map_batches(score, batch_format="pyarrow")
            .sort(["_score", "uuid"], descending=[True, False])
            .limit(limit)
            .to_pandas()
        )
        # a zero-hit query yields an empty frame with NO columns — guard
        # before the column lookup
        return top["uuid"].tolist() if "uuid" in top.columns else []

    def _cosine_rank(
        self, kind, ds, emb_col, query_vec, group_ids, flt, limit, min_sim=0.0
    ):
        qv = query_vec.astype(np.float64)
        qn = np.linalg.norm(qv) or 1.0
        qn_vec = qv / qn

        def score(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            if group_ids:
                df = df[df["group_id"].isin(group_ids)]
            if flt is not None:
                df = df[flt.mask(df, kind)]
            df = df[df[emb_col].notna()]
            empty = pa.table(
                {"uuid": pa.array([], pa.string()), "_score": pa.array([], pa.float64())}
            )
            if df.empty:
                return empty
            mat = np.stack(df[emb_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1
            sims = np.round((mat / norms) @ qn_vec, 9)
            out = pd.DataFrame({"uuid": df["uuid"], "_score": sims})
            out = out[out._score >= min_sim]
            return pa.Table.from_pandas(out, preserve_index=False).cast(
                pa.schema([("uuid", pa.string()), ("_score", pa.float64())])
            )

        top = (
            ds.map_batches(score, batch_format="pyarrow")
            .sort(["_score", "uuid"], descending=[True, False])
            .limit(limit)
            .to_pandas()
        )
        # a zero-hit query yields an empty frame with NO columns — guard
        # before the column lookup
        return top["uuid"].tolist() if "uuid" in top.columns else []

    def _bfs_rank(self, ds, origin_uuids, limit):
        import ray

        ref = ray.put(pa.array(sorted(set(origin_uuids)), pa.string()))

        def hit(batch: pa.Table, _ref=ref) -> pa.Table:
            import pyarrow.compute as pc

            from graphiti_ray.stages.link import _cached_lut

            origin = _cached_lut(_ref)
            mask = pc.or_(
                pc.is_in(batch.column("subj_uuid"), value_set=origin),
                pc.is_in(batch.column("obj_uuid"), value_set=origin),
            )
            return batch.filter(mask).select(["uuid"])

        top = (
            ds.map_batches(hit, batch_format="pyarrow", zero_copy_batch=True)
            .limit(limit)
            .to_pandas()
        )
        # a zero-hit query yields an empty frame with NO columns — guard
        # before the column lookup
        return top["uuid"].tolist() if "uuid" in top.columns else []

    # -- sub-search (union of methods → rerank → hydrate) --------------------

    def _run(
        self, kind, ds, text_col, emb_col, cfg, query, qv, group_ids, flt,
        limit, center_uuid, min_score,
    ) -> pd.DataFrame:
        over = 2 * limit
        schema_names = ds.schema().names
        lists = []
        if "bm25" in cfg.methods:
            lists.append(
                self._bm25_rank(kind, ds, text_col, query, group_ids, flt, over)
            )
        if "cosine" in cfg.methods and emb_col and emb_col in schema_names:
            lists.append(
                self._cosine_rank(kind, ds, emb_col, qv, group_ids, flt, over)
            )
        if "bfs" in cfg.methods and cfg.bfs_origin_uuids and kind == "edge":
            lists.append(self._bfs_rank(ds, cfg.bfs_origin_uuids, over))

        cand = rrf(lists, min_score=0)  # candidate pool in rrf order
        if cfg.reranker == "rrf":
            ranked = rrf(lists, min_score=min_score)
        elif cfg.reranker == "mmr":
            pool = sorted(set().union(*map(set, lists))) if lists else []
            sub = self._hydrate(ds, pool) if pool else pd.DataFrame()
            vecs = (
                {
                    r.uuid: np.asarray(getattr(r, emb_col), dtype=np.float64)
                    for r in sub.itertuples(index=False)
                }
                if emb_col and emb_col in schema_names and len(sub)
                else {}
            )
            ranked = maximal_marginal_relevance(qv, vecs, cfg.mmr_lambda, min_score)
        elif cfg.reranker == "episode_mentions":
            sub = self._hydrate(ds, cand) if cand else pd.DataFrame()
            counts = (
                dict(zip(sub["uuid"], sub["episode_count"]))
                if "episode_count" in sub
                else dict(zip(sub.get("uuid", []), sub.get("mention_count", [])))
            )
            ranked = episode_mentions_rerank(cand, counts)
        elif cfg.reranker == "node_distance":
            assert center_uuid, "node_distance reranker needs center_node_uuid"
            from graphiti_ray.stages.graph import node_distances

            ddf = node_distances(self.tables["edges"], center_uuid)
            dist = dict(zip(ddf["entity_uuid"], ddf["depth"]))
            if kind == "edge":
                sub = self._hydrate(ds, cand) if cand else pd.DataFrame()
                edge_d = {
                    r.uuid: min(
                        dist.get(r.subj_uuid, float("inf")),
                        dist.get(r.obj_uuid, float("inf")),
                    )
                    for r in sub.itertuples(index=False)
                }

                def edge_score(u):
                    d = edge_d.get(u, float("inf"))
                    return 1.0 / max(d, 0.1) if d != float("inf") else 0.0

                ranked = sorted(
                    (u for u in cand if edge_score(u) >= min_score),
                    key=lambda u: (edge_d.get(u, float("inf")), u),
                )
            else:
                ranked = node_distance_rerank(cand, dist, center_uuid, min_score)
        elif cfg.reranker == "cross_encoder":
            sub = self._hydrate(ds, cand) if cand else pd.DataFrame()
            passages = sub[text_col].fillna("").tolist() if len(sub) else []
            scores = (self.cross_encoder or default_cross_encoder)(query, passages)
            order = sorted(
                zip(sub["uuid"], scores) if len(sub) else [],
                key=lambda kv: (-kv[1], kv[0]),
            )
            ranked = [u for u, s in order if s >= min_score]
        else:
            ranked = rrf(lists, min_score=min_score)

        ranked = ranked[:limit]
        if not ranked:
            # keep the table's columns so callers can select on empty results
            return pd.DataFrame(columns=schema_names)
        out = self._hydrate(ds, ranked)
        pos = {u: i for i, u in enumerate(ranked)}
        out["_rank"] = out["uuid"].map(pos)
        return out.sort_values("_rank").drop(columns=["_rank"]).reset_index(drop=True)

    def _hydrate(self, ds: rd.Dataset, uuids: list[str]) -> pd.DataFrame:
        return _broadcast_uuid_filter(ds, uuids)

    def search(
        self,
        query: str,
        config: SearchConfig = COMBINED_HYBRID_SEARCH_RRF,
        group_ids: list[str] | None = None,
        center_node_uuid: str | None = None,
        search_filter=None,
    ) -> SearchResults:
        qv = embed_texts([query])[0]
        limit = config.limit
        empty = pd.DataFrame()

        def run(kind, text_col, emb_col, cfg):
            ds = self._ds(kind)
            if cfg is None or ds is None:
                return empty
            return self._run(
                kind, ds, text_col, emb_col, cfg, query, qv, group_ids,
                search_filter, limit, center_node_uuid,
                config.reranker_min_score,
            )

        return SearchResults(
            edges=run("edge", "fact", "fact_embedding", config.edge_config),
            nodes=run("node", "name", "name_embedding", config.node_config),
            episodes=run("episode", "content", None, config.episode_config),
            communities=run("community", "summary", None, config.community_config),
        )
