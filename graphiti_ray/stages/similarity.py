"""Similarity search over an embedding column (list<float>).

- ``knn_brute_force``  exact cosine top-k: broadcast query matrix
  (ray.put once), per-batch numpy matmul emits batch-local top-k
  candidates, then a tiny per-query reduction — the corpus is streamed,
  never gathered.
- ``knn_lsh``          IVF-style scale path: random-hyperplane buckets
  (same family as dedup.embedding_near_dup); queries only search their own
  bucket — approximate, documented.

The exact variant is the oracle-checked baseline (DuckDB
list_cosine_similarity + row_number window); the LSH variant is rows-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1
    return mat / n


def query_matrix_from_first(
    emb: rd.Dataset, n_queries: int, vec_col="embedding", id_col="vec_id"
):
    """Deterministic query workload: the first n_queries vectors by id."""
    head = emb.sort(id_col).limit(n_queries).to_pandas()
    ids = head[id_col].to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float32) for v in head[vec_col]])
    return ids, mat


class _BatchTopK:
    """Per-batch exact cosine: emits (query_id, vec_id, cosine) for the
    batch-local top-k of every query. Query matrix fetched from the object
    store once per actor."""

    def __init__(self, qref, k: int, vec_col: str, id_col: str):
        import ray

        self.q_ids, qmat = ray.get(qref)
        self.qmat = _normalize(qmat.astype(np.float64)).T  # (dim, nq)
        self.k = k
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from graphiti_ray.stages.embed import column_to_matrix

        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        # float64 throughout + round(6) BEFORE selection: keeps the total
        # order (cosine desc, vec_id asc) identical to the SQL oracle even
        # at tie boundaries; matrix reshaped zero-copy from the list column
        mat = column_to_matrix(batch.column(self.vec_col), np.float64)
        sims = np.round(_normalize(mat) @ self.qmat, 6)  # (n, nq)
        k = min(self.k, len(ids))
        o_q, o_v, o_s = [], [], []
        for qi in range(sims.shape[1]):
            order = np.lexsort((ids, -sims[:, qi]))[:k]
            o_q.extend([int(self.q_ids[qi])] * len(order))
            o_v.extend(int(ids[r]) for r in order)
            o_s.extend(float(sims[r, qi]) for r in order)
        return pa.table(
            {
                "query_id": pa.array(o_q, pa.int64()),
                "vec_id": pa.array(o_v, pa.int64()),
                "cosine": pa.array(o_s, pa.float64()),
            }
        )


def _final_topk(k: int):
    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return f


def knn_brute_force(
    emb: rd.Dataset,
    n_queries: int = 32,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Exact top-k cosine neighbours of the first ``n_queries`` vectors.

    Output: (query_id, vec_id, cosine, rank), rank 1..k per query; ties
    broken by vec_id ascending (same total order as the SQL oracle).
    """
    import ray

    qref = ray.put(query_matrix_from_first(emb, n_queries, vec_col, id_col))
    candidates = emb.map_batches(
        _BatchTopK,
        fn_constructor_args=(qref, k, vec_col, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    # candidates: ≤ k per (query, batch) — the reduction input is tiny
    return candidates.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pandas"
    )


def hard_negatives(
    emb: rd.Dataset,
    n_queries: int = 32,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> rd.Dataset:
    """Contrastive hard-negative mining (the in-batch-negatives upgrade
    every embedding-model trainer runs — Karpukhin et al. 2020, DPR): for
    each of the first ``n_queries`` vectors, the top-k most COSINE-similar
    vectors whose ``label`` DIFFERS from the query's — the confusable
    cross-class examples worth training against.

    Same scale shape as :func:`knn_brute_force`: queries (ids, labels,
    matrix) broadcast once via ``ray.put``, per-batch vectorized top-k
    with the cross-label mask applied BEFORE selection, then a tiny
    per-query reduce. round(6) before selection keeps the (cosine desc,
    vec_id) total order identical to the SQL twin.

    Output: (query_id, vec_id, cosine, rank), rank 1..k per query.
    """
    import ray

    head = emb.sort(id_col).limit(n_queries).to_pandas()
    q_ids = head[id_col].to_numpy()
    q_labels = head[label_col].to_numpy()
    qmat = np.array([np.asarray(v, dtype=np.float32) for v in head[vec_col]])
    qref = ray.put((q_ids, q_labels, qmat))

    class _BatchTopKCrossLabel:
        def __init__(self):
            self.q_ids, self.q_labels, qm = ray.get(qref)
            self.qmat = _normalize(qm.astype(np.float64)).T  # (dim, nq)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from graphiti_ray.stages.embed import column_to_matrix

            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            labels = batch.column(label_col).to_numpy(zero_copy_only=False)
            mat = column_to_matrix(batch.column(vec_col), np.float64)
            sims = np.round(_normalize(mat) @ self.qmat, 6)  # (n, nq)
            o_q, o_v, o_s = [], [], []
            for qi in range(sims.shape[1]):
                keep = labels != self.q_labels[qi]  # cross-label only
                if not keep.any():
                    continue
                cand_ids = ids[keep]
                cand = sims[keep, qi]
                order = np.lexsort((cand_ids, -cand))[: min(k, len(cand_ids))]
                o_q.extend([int(self.q_ids[qi])] * len(order))
                o_v.extend(int(cand_ids[r]) for r in order)
                o_s.extend(float(cand[r]) for r in order)
            return pa.table(
                {
                    "query_id": pa.array(o_q, pa.int64()),
                    "vec_id": pa.array(o_v, pa.int64()),
                    "cosine": pa.array(o_s, pa.float64()),
                }
            )

    candidates = emb.map_batches(
        _BatchTopKCrossLabel,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    return candidates.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pandas"
    )


def _kmeans_fit(sample: np.ndarray, k: int, iters: int = 10, seed: int = 42):
    """Tiny deterministic spherical k-means (numpy): sample-sized, runs on
    the driver once; centroids are broadcast. Empty clusters re-seed to the
    farthest points, so k centroids always survive."""
    rng = np.random.RandomState(seed)
    x = _normalize(sample.astype(np.float64))
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T  # (n, k) cosine (unit vectors)
        assign = sims.argmax(axis=1)
        new = np.zeros_like(cent)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
            else:  # re-seed dead centroid to the worst-served point
                new[c] = x[sims.max(axis=1).argmin()]
        cent = _normalize(new)
    return cent


def knn_ivf(
    emb: rd.Dataset,
    n_queries: int = 32,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """IVF approximate top-k: a coarse k-means quantizer (fit on a driver
    sample, centroids broadcast) partitions the corpus; each query scores
    only vectors whose cluster is among its ``nprobe`` closest centroids.

    The scale path vs ``knn_lsh``: recall is tunable via ``nprobe``
    (nprobe=n_clusters degenerates to exact brute force), and the
    assignment pass streams — no shuffle at all, the candidate filter is a
    per-batch mask. Output schema matches ``knn_brute_force``; per-query
    rows may be < k (the approximation)."""
    import functools

    import ray

    from graphiti_ray.stages.embed import column_to_matrix

    q_ids, qmat = query_matrix_from_first(emb, n_queries, vec_col, id_col)
    sample = emb.limit(sample_size).to_pandas()
    smat = np.stack([np.asarray(v, dtype=np.float64) for v in sample[vec_col]])
    cent = _kmeans_fit(smat, n_clusters, seed=seed)
    qn = _normalize(qmat.astype(np.float64))
    # per query: the nprobe closest centroids
    order = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    probe_sets = [frozenset(map(int, row)) for row in order]
    ref = ray.put((q_ids, qn, cent, probe_sets))

    def run(batch: pa.Table, _ref=ref) -> pa.Table:
        from graphiti_ray.stages.link import _cached_lut

        q_ids, qn, cent, probe_sets = _cached_lut(_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat = column_to_matrix(batch.column(vec_col), np.float64)
        if len(ids) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        matn = _normalize(mat)
        assign = (matn @ cent.T).argmax(axis=1)
        o_q, o_v, o_s = [], [], []
        for qi in range(len(q_ids)):
            mask = np.isin(assign, list(probe_sets[qi]))
            if not mask.any():
                continue
            sims = np.round(matn[mask] @ qn[qi], 6)
            sub_ids = ids[mask]
            sel = np.lexsort((sub_ids, -sims))[:k]
            o_q.extend([int(q_ids[qi])] * len(sel))
            o_v.extend(int(sub_ids[s]) for s in sel)
            o_s.extend(float(sims[s]) for s in sel)
        return pa.table(
            {
                "query_id": pa.array(o_q, pa.int64()),
                "vec_id": pa.array(o_v, pa.int64()),
                "cosine": pa.array(o_s, pa.float64()),
            }
        )

    candidates = emb.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)
    return candidates.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pandas"
    )


def knn_lsh(
    emb: rd.Dataset,
    n_queries: int = 32,
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Approximate top-k: hyperplane-sign bucketing; each query searches only
    its own bucket (IVF-style probe=1). Output as knn_brute_force (may have
    fewer than k rows per query — that is the approximation)."""
    import ray

    q_ids, qmat = query_matrix_from_first(emb, n_queries, vec_col, id_col)

    def run(batch: pa.Table, planes, qbuckets, qn) -> pa.Table:
        from graphiti_ray.stages.embed import column_to_matrix

        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        mat = column_to_matrix(batch.column(vec_col), np.float32)
        buckets = ((mat @ planes) > 0) @ (1 << np.arange(planes.shape[1]))
        o_q, o_v, o_s = [], [], []
        for qi in range(len(q_ids)):
            mask = buckets == qbuckets[qi]
            if not mask.any():
                continue
            sims = _normalize(mat[mask]) @ qn[qi]
            sel = np.argsort(-sims)[:k]
            sub_ids = ids[mask]
            o_q.extend([int(q_ids[qi])] * len(sel))
            o_v.extend(int(sub_ids[s]) for s in sel)
            o_s.extend(float(round(sims[s], 6)) for s in sel)
        return pa.table(
            {
                "query_id": pa.array(o_q, pa.int64()),
                "vec_id": pa.array(o_v, pa.int64()),
                "cosine": pa.array(o_s, pa.float64()),
            }
        )

    planes = np.random.RandomState(seed).randn(qmat.shape[1], n_planes)
    qn = _normalize(qmat.astype(np.float32))
    qbuckets = ((qmat @ planes) > 0) @ (1 << np.arange(n_planes))
    import functools

    candidates = emb.map_batches(
        functools.partial(run, planes=planes, qbuckets=qbuckets, qn=qn),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return candidates.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pandas"
    )


# --- distributed Lloyd's k-means (integer lattice, oracle-exact) -------------

KMEANS_QUANT = 1000


def kmeans_assign(
    emb: rd.Dataset,
    k: int = 8,
    n_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_vector: bool = False,
) -> rd.Dataset:
    """Distributed Lloyd's k-means over an embedding column — the
    clustering primitive of training-data curation (SemDeDup-style
    semantic bucketing, data-mixing strata, IVF index builds that need
    the FULL corpus rather than a driver sample).

    Shape per iteration (the blessed combiner → keyed-reduce pattern):
    centroids broadcast via ``ray.put`` (k×dim, tiny) → one streaming
    ``map_batches`` pass emits per-block partial sums in long format
    (cid, pos, s; pos -1 carries the member count) → ``groupby(cid,
    pos).sum`` reduces k×(dim+1) keys → the driver folds that k×(dim+1)
    row table into the next centroid matrix. No all-to-all over the
    data, no driver residency beyond k×dim.

    Arithmetic is on an INTEGER lattice so the DuckDB oracle is
    value-exact with zero float-associativity risk: vectors quantize as
    ``floor(v * 1000)`` (int64), distances are exact integer squared-L2,
    centroid updates are ``floor(sum / count)``, and argmin ties break
    to the lowest cluster id (= SQL ``ORDER BY d, cid``). Empty clusters
    drop (both sides). Init = the k lowest-``id_col`` vectors.

    Output: (vec_id, cluster, dist) — final-iteration assignment with
    its exact integer squared distance.

    Reference analogue: community clustering over node embeddings
    (graphiti_core/utils/maintenance/community_operations.py builds
    communities via label propagation; k-means is the embedding-space
    counterpart a corpus pipeline needs).
    """
    import ray

    from graphiti_ray.stages.embed import column_to_matrix

    init = emb.sort(id_col).limit(k).to_pandas()
    cents = np.stack(
        [
            np.floor(np.asarray(v, np.float64) * KMEANS_QUANT).astype(np.int64)
            for v in init[vec_col]
        ]
    )
    cids = np.arange(len(cents), dtype=np.int64)
    dim = cents.shape[1]

    def _quant(batch: pa.Table) -> np.ndarray:
        x = column_to_matrix(batch.column(vec_col), dtype=np.float64)
        return np.floor(x * KMEANS_QUANT).astype(np.int64)

    def _assign(x: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # exact integer squared-L2; argmin returns the FIRST minimum →
        # lowest cluster id on ties (cids stay ascending)
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        return a, d2[np.arange(len(a)), a]

    for _ in range(n_iters - 1):
        ref = ray.put((cids, cents))

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            import ray as _ray

            cids_, c = _ray.get(_ref)
            x = _quant(batch)
            a, _ = _assign(x, c)
            kk = len(cids_)
            sums = np.zeros((kk, dim), np.int64)
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=kk).astype(np.int64)
            # long format: pos -1 row carries the count, pos 0..dim-1 the sums
            vals = np.concatenate([counts[:, None], sums], axis=1).ravel()
            return pa.table(
                {
                    "cid": pa.array(np.repeat(cids_, dim + 1), pa.int64()),
                    "pos": pa.array(
                        np.tile(np.arange(-1, dim), kk), pa.int64()
                    ),
                    "s": pa.array(vals, pa.int64()),
                }
            )

        reduced = (
            emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["cid", "pos"])
            .sum("s")
            .to_pandas()
        )  # k×(dim+1) rows — the keyed reduce's output is centroid-sized
        piv = reduced.pivot(index="cid", columns="pos", values="sum(s)")
        piv = piv.sort_index()
        n = piv[-1].to_numpy()
        keep = n > 0  # empty clusters drop (SQL twin: absent from GROUP BY)
        sums = piv[[p for p in range(dim)]].to_numpy()[keep]
        cids = piv.index.to_numpy()[keep].astype(np.int64)
        cents = np.floor(sums / n[keep][:, None]).astype(np.int64)

    ref = ray.put((cids, cents))

    def final(batch: pa.Table, _ref=ref) -> pa.Table:
        import ray as _ray

        cids_, c = _ray.get(_ref)
        x = _quant(batch)
        a, d = _assign(x, c)
        cols = {
            id_col: batch.column(id_col),
            "cluster": pa.array(cids_[a], pa.int64()),
            "dist": pa.array(d, pa.int64()),
        }
        if keep_vector:
            cols[vec_col] = batch.column(vec_col)
        return pa.table(cols)

    return emb.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


# --- SemDeDup: k-means bucketing + within-cluster cosine dominance ----------

SEMDEDUP_NORM_BOUND = 150_000_000  # quantized norm^2 cap keeping den^2*dot^2 in int64


def semantic_dedup(
    emb: rd.Dataset,
    k: int = 8,
    n_iters: int = 3,
    t_num: int = 7,
    t_den: int = 20,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    carry_cap: int = 65536,
) -> rd.Dataset:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means bucket the corpus, then search for
    near-duplicates ONLY within a cluster — pairwise work drops from
    O(n^2) to O(sum c_i^2), and with k grown proportionally to n the
    expected cluster stays constant-sized, which is the published
    algorithm's scale argument. Clustering is the distributed
    ``kmeans_assign`` above (full corpus, not a driver sample); the
    within-cluster pass is one range sort on ``cluster`` +
    ``sorted_run_map`` (no per-group Python dispatch).

    Dedup rule (deterministic, SQL-expressible): a vector is DOMINATED —
    ``keep = false`` — iff some same-cluster vector with a LOWER id has
    cosine >= t with it. ``n_dups`` counts all same-cluster neighbors at
    or above the threshold. The threshold t = t_num/t_den is evaluated
    EXACTLY on the integer lattice: cos(x, y) >= t  <=>  dot > 0  and
    t_den^2 * dot^2 >= t_num^2 * |x|^2 * |y|^2, all int64 (guarded by
    ``SEMDEDUP_NORM_BOUND``; requires t_den <= 20), so the DuckDB twin
    needs no float comparison at all.

    Output: (id_col, cluster, n_dups, keep).

    Reference analogue: semantic node dedup / duplicate resolution
    (graphiti_core/utils/maintenance/node_operations.py resolves
    near-duplicate entities via embedding similarity); this is the
    corpus-scale counterpart over documents.
    """
    assert t_den <= 20, "t_den > 20 can overflow the int64 dominance test"
    from graphiti_ray.stages.embed import column_to_matrix
    from graphiti_ray.stages.ops import sorted_run_map

    assigned = kmeans_assign(
        emb, k=k, n_iters=n_iters, vec_col=vec_col, id_col=id_col, keep_vector=True
    ).drop_columns(["dist"])

    td2 = t_den * t_den
    tn2 = t_num * t_num

    def _kernel(tbl: pa.Table) -> pa.Table:
        clusters = tbl.column("cluster").to_numpy()
        ids = tbl.column(id_col).to_numpy()
        x = np.floor(
            column_to_matrix(tbl.column(vec_col), dtype=np.float64) * KMEANS_QUANT
        ).astype(np.int64)
        n_dups = np.zeros(len(ids), np.int64)
        keep = np.ones(len(ids), bool)
        starts = np.flatnonzero(np.r_[True, clusters[1:] != clusters[:-1]])
        bounds = np.r_[starts, len(ids)]
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            xi = x[s:e]
            g = xi @ xi.T  # exact int64 gram
            nn = np.diagonal(g).copy()
            if nn.max() > SEMDEDUP_NORM_BOUND:
                raise ValueError(
                    "semantic_dedup: quantized norm^2 exceeds the int64-safe "
                    "bound — lower KMEANS_QUANT or pre-normalize the vectors"
                )
            cond = (g > 0) & (td2 * g * g >= tn2 * np.outer(nn, nn))
            np.fill_diagonal(cond, False)
            run_ids = ids[s:e]
            n_dups[s:e] = cond.sum(axis=1)
            keep[s:e] = ~(cond & (run_ids[None, :] < run_ids[:, None])).any(axis=1)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(clusters, pa.int64()),
                "n_dups": pa.array(n_dups, pa.int64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    return sorted_run_map(assigned, ["cluster"], _kernel, carry_cap=carry_cap)


def mutual_knn(
    emb: rd.Dataset,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Reciprocal (mutual) k-nearest-neighbour pairs: (a, b) kept iff each
    vector is in the other's top-k cosine list with SELF EXCLUDED — the
    high-precision near-dup/clustering primitive (mutual-NN graphs drive
    agglomerative clustering and dedup validation). Exact broadcast
    baseline: every vector is a query (same scale class as
    ``embedding_near_dup_exact``, the documented oracle-baseline path;
    IVF/LSH are the 100-TB candidate routes). Self rows are dropped
    AFTER a k+1 overfetch and re-ranked with ``ops.top_k_per_group`` so
    duplicate vectors (cosine 1.0 ties) cannot displace true
    neighbours; mutuality is one keyed reduce over canonical (a, b) —
    no second pass over the corpus.

    Output: (a, b, cosine) with a < b."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    from graphiti_ray.stages.ops import top_k_per_group

    n_all = emb.count()
    fwd = knn_brute_force(emb, n_queries=n_all, k=k + 1, vec_col=vec_col, id_col=id_col)

    def drop_self(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.not_equal(batch.column("query_id"), batch.column("vec_id"))
        ).drop_columns(["rank"])

    nonself = fwd.map_batches(drop_self, batch_format="pyarrow", zero_copy_batch=True)
    # re-rank the survivors per query by the same (cosine desc, id asc)
    # total order: negate the 1e-6-lattice cosine for an ascending sort
    def lattice(batch: pa.Table) -> pa.Table:
        c = batch.column("cosine").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "neg_c6", pa.array(-np.rint(c * 1e6).astype(np.int64), pa.int64())
        )

    ranked = top_k_per_group(
        nonself.map_batches(lattice, batch_format="pyarrow", zero_copy_batch=True),
        keys=["query_id"],
        order_cols=["neg_c6", "vec_id"],
        k=k,
    )

    def canonical(batch: pa.Table) -> pa.Table:
        q = batch.column("query_id").to_numpy(zero_copy_only=False)
        v = batch.column("vec_id").to_numpy(zero_copy_only=False)
        c = batch.column("cosine").to_numpy(zero_copy_only=False)
        a = np.minimum(q, v)
        b = np.maximum(q, v)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "fwd": pa.array((q < v).astype(np.int64), pa.int64()),
                "bwd": pa.array((q > v).astype(np.int64), pa.int64()),
                "cosine": pa.array(c, pa.float64()),
            }
        )

    flags = (
        ranked.map_batches(canonical, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(
            Max("fwd", alias_name="fwd"),
            Max("bwd", alias_name="bwd"),
            Min("cosine", alias_name="cosine"),
        )
    )

    def pick(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(batch.column("fwd"), 1), pc.equal(batch.column("bwd"), 1)
        )
        return batch.filter(keep).select(["a", "b", "cosine"])

    return flags.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


# --- Product quantization (integer lattice, oracle-exact) -------------------


def _pq_fit(
    emb: rd.Dataset,
    m: int,
    k: int,
    n_iters: int,
    vec_col: str,
    id_col: str,
):
    """Train ``m`` per-subspace codebooks with Lloyd's on the engine's
    integer lattice — ALL subspaces in the SAME streaming pass (one
    corpus scan per iteration, not one per subspace): broadcast the m
    codebooks via ``ray.put`` (m*k*sub_dim ints, tiny) → per-block
    partial (sum, count) in long (sub, cid, pos, s) form →
    ``groupby(sub, cid, pos).sum`` reduces to m*k*(sub_dim+1) keys → the
    driver folds only that. Same arithmetic contract as
    ``kmeans_assign`` (floor(v*1000) int64, exact int squared-L2,
    floor-divide update, argmin ties → lowest cid, empty clusters drop),
    so the DuckDB twin is value-exact per subspace.

    Init: the k lowest-``id_col`` vectors' subvectors, cid = rank-1 in
    every subspace. Returns (dim, sub_dim, books) with books[s] =
    (cids_s, cents_s).
    """
    import ray

    from graphiti_ray.stages.embed import column_to_matrix

    init = emb.sort(id_col).limit(k).to_pandas()
    mat0 = np.stack(
        [
            np.floor(np.asarray(v, np.float64) * KMEANS_QUANT).astype(np.int64)
            for v in init[vec_col]
        ]
    )
    dim = mat0.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    sd = dim // m
    kk0 = len(mat0)
    books = [
        (np.arange(kk0, dtype=np.int64), mat0[:, s * sd : (s + 1) * sd].copy())
        for s in range(m)
    ]

    def _quant(batch: pa.Table) -> np.ndarray:
        x = column_to_matrix(batch.column(vec_col), dtype=np.float64)
        return np.floor(x * KMEANS_QUANT).astype(np.int64)

    for _ in range(n_iters - 1):
        ref = ray.put(books)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            import ray as _ray

            bks = _ray.get(_ref)
            x = _quant(batch)
            subs, cids_l, poss, vals = [], [], [], []
            for s, (cids_s, cents_s) in enumerate(bks):
                xs = x[:, s * sd : (s + 1) * sd]
                d2 = ((xs[:, None, :] - cents_s[None, :, :]) ** 2).sum(axis=2)
                a = d2.argmin(axis=1) if len(xs) else np.zeros(0, np.int64)
                kk = len(cids_s)
                sums = np.zeros((kk, sd), np.int64)
                np.add.at(sums, a, xs)
                counts = np.bincount(a, minlength=kk).astype(np.int64)
                subs.append(np.full(kk * (sd + 1), s, np.int64))
                cids_l.append(np.repeat(cids_s, sd + 1))
                poss.append(np.tile(np.arange(-1, sd), kk))
                vals.append(
                    np.concatenate([counts[:, None], sums], axis=1).ravel()
                )
            return pa.table(
                {
                    "sub": pa.array(np.concatenate(subs), pa.int64()),
                    "cid": pa.array(np.concatenate(cids_l), pa.int64()),
                    "pos": pa.array(np.concatenate(poss), pa.int64()),
                    "s": pa.array(np.concatenate(vals), pa.int64()),
                }
            )

        reduced = (
            emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(["sub", "cid", "pos"])
            .sum("s")
            .to_pandas()
        )  # m*k*(sub_dim+1) rows — codebook-sized, never corpus-sized
        new_books = []
        for s in range(m):
            r = reduced[reduced["sub"] == s]
            piv = r.pivot(index="cid", columns="pos", values="sum(s)").sort_index()
            n = piv[-1].to_numpy()
            keep = n > 0  # empty clusters drop (SQL twin: absent from GROUP BY)
            sums = piv[[p for p in range(sd)]].to_numpy()[keep]
            cids_s = piv.index.to_numpy()[keep].astype(np.int64)
            cents_s = np.floor(sums / n[keep][:, None]).astype(np.int64)
            new_books.append((cids_s, cents_s))
        books = new_books
    return dim, sd, books


def pq_encode(
    emb: rd.Dataset,
    m: int = 4,
    k: int = 8,
    n_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Product quantization (Jégou et al. 2011): split each vector into
    ``m`` subvectors, vector-quantize every subspace with its own k-entry
    codebook → each vector compresses to m small codes (here m*log2(k)
    bits of payload vs 4*dim bytes), the memory trick that lets a
    billion-vector ANN index live in RAM. Training is ``_pq_fit`` (one
    streaming pass per Lloyd iteration for ALL subspaces); encoding is
    one more streaming pass (broadcast codebooks, vectorized argmin per
    subspace). Integer-lattice arithmetic end to end → the DuckDB twin
    reproduces every code and distance exactly.

    Output (long form, SQL-friendly): (vec_id, sub, code, d2) — one row
    per (vector, subspace), ``d2`` the exact int squared-L2 quantization
    error of that subvector.

    Reference analogue: the embedder seam (graphiti_core/embedder/
    client.py) stores full float vectors in Neo4j; PQ is the
    corpus-scale compression counterpart a 100-TB pipeline needs.
    """
    import ray

    from graphiti_ray.stages.embed import column_to_matrix

    _, sd, books = _pq_fit(emb, m, k, n_iters, vec_col, id_col)
    ref = ray.put(books)

    def final(batch: pa.Table, _ref=ref) -> pa.Table:
        from graphiti_ray.stages.link import _cached_lut

        bks = _cached_lut(_ref)
        x = np.floor(
            column_to_matrix(batch.column(vec_col), dtype=np.float64)
            * KMEANS_QUANT
        ).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        o_id, o_sub, o_code, o_d2 = [], [], [], []
        for s, (cids_s, cents_s) in enumerate(bks):
            xs = x[:, s * sd : (s + 1) * sd]
            d2 = ((xs[:, None, :] - cents_s[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1) if len(xs) else np.zeros(0, np.int64)
            o_id.append(ids)
            o_sub.append(np.full(len(ids), s, np.int64))
            o_code.append(cids_s[a])
            o_d2.append(d2[np.arange(len(a)), a] if len(a) else np.zeros(0, np.int64))
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(o_id), pa.int64()),
                "sub": pa.array(np.concatenate(o_sub), pa.int64()),
                "code": pa.array(np.concatenate(o_code), pa.int64()),
                "d2": pa.array(np.concatenate(o_d2), pa.int64()),
            }
        )

    return emb.map_batches(final, batch_format="pyarrow", zero_copy_batch=True)


def _final_topk_asc(k: int, score_col: str = "adc"):
    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [score_col, "vec_id"], ascending=True, kind="mergesort"
        ).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return f


def knn_pq(
    emb: rd.Dataset,
    n_queries: int = 16,
    k_top: int = 10,
    m: int = 4,
    k: int = 8,
    n_iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """PQ asymmetric-distance (ADC) top-k search: queries stay
    full-precision, corpus vectors are represented only by their m codes;
    per query a distance TABLE (m × k exact int subspace distances to
    every codebook entry) is precomputed once on the driver, and a
    candidate's approximate distance is m table lookups + a sum — no
    float math in the scan at all. The corpus streams through ONE
    map_batches pass (encode + lookup fused, so codes never round-trip
    through a shuffle); per-batch local top-k then a tiny per-query
    reduce, exactly the ``knn_brute_force`` reduction shape.

    Approximate by construction (quantization error), but deterministic:
    the DuckDB twin reproduces codes, distance tables, ADC sums and the
    (adc, vec_id) tie order exactly, so the oracle is value-exact on the
    approximation itself. With m=1, k >= n_vectors, n_iters=1 the codes
    are the identity and ADC degenerates to exact integer squared-L2 —
    the full-fidelity gate (pytest).

    Output: (query_id, vec_id, adc, rank), rank 1..k_top ascending adc.
    """
    import ray

    from graphiti_ray.stages.embed import column_to_matrix

    _, sd, books = _pq_fit(emb, m, k, n_iters, vec_col, id_col)
    q_ids, qmat = query_matrix_from_first(emb, n_queries, vec_col, id_col)
    qx = np.floor(qmat.astype(np.float64) * KMEANS_QUANT).astype(np.int64)
    # per-subspace (n_q, kk_s) exact int distance tables, indexed by
    # CODEBOOK POSITION (not cid — surviving cids can be sparse)
    dtabs = [
        ((qx[:, s * sd : (s + 1) * sd][:, None, :] - cents_s[None, :, :]) ** 2).sum(
            axis=2
        )
        for s, (_, cents_s) in enumerate(books)
    ]
    ref = ray.put((q_ids, books, dtabs))

    def run(batch: pa.Table, _ref=ref) -> pa.Table:
        from graphiti_ray.stages.link import _cached_lut

        q_ids_, bks, dts = _cached_lut(_ref)
        x = np.floor(
            column_to_matrix(batch.column(vec_col), dtype=np.float64)
            * KMEANS_QUANT
        ).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        adc = np.zeros((n, len(q_ids_)), np.int64)
        for s, (cids_s, cents_s) in enumerate(bks):
            xs = x[:, s * sd : (s + 1) * sd]
            d2 = ((xs[:, None, :] - cents_s[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1) if n else np.zeros(0, np.int64)
            adc += dts[s][:, a].T  # (n_q, n) gather → (n, n_q)
        kk = min(k_top, n)
        o_q, o_v, o_s = [], [], []
        for qi in range(len(q_ids_)):
            order = np.lexsort((ids, adc[:, qi]))[:kk]
            o_q.extend([int(q_ids_[qi])] * len(order))
            o_v.extend(int(ids[r]) for r in order)
            o_s.extend(int(adc[r, qi]) for r in order)
        return pa.table(
            {
                "query_id": pa.array(o_q, pa.int64()),
                "vec_id": pa.array(o_v, pa.int64()),
                "adc": pa.array(o_s, pa.int64()),
            }
        )

    candidates = emb.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)
    return candidates.groupby("query_id").map_groups(
        _final_topk_asc(k_top), batch_format="pandas"
    )


# --- DBSCAN over an embedding column (cosine proximity) ----------------------

DBSCAN_EPS = 0.35  # cosine-similarity proximity threshold (>= eps → neighbor)
DBSCAN_MIN_PTS = 3  # neighbors (EXCLUDING self) required for a core point


def dbscan_cosine(
    emb: rd.Dataset,
    eps: float = DBSCAN_EPS,
    min_pts: int = DBSCAN_MIN_PTS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """DBSCAN (Ester et al. 1996) over an embedding column with cosine
    proximity — the density clustering a training-data pipeline uses for
    topic grouping / outlier isolation before mixture sampling.

    Deterministic variant (plain DBSCAN's border assignment is
    scan-order-dependent): a border point joins the MINIMUM cluster id
    among its core neighbors; cluster id = min core vec_id in the
    core-core component (the repo's CC min-label convention); noise = -1.
    Similarities are float64 + round(6) BEFORE thresholding so the DuckDB
    twin's boundary is identical (the dedup_embedding convention).

    Like :func:`graphiti_ray.stages.dedup.embedding_near_dup_exact`, the
    normalized corpus matrix is broadcast once and every pass streams
    batches against it — the EXACT oracle baseline (O(n²/batch) work,
    documented as the small/medium-corpus default; LSH-bucket the
    neighbor search for a 100-TB corpus). Three streamed passes:
    neighbor counts → core-core pairs → labels; core→cluster map is
    core-sized, broadcast via ``ray.put``.

    Output: (vec_id, label, is_core, n_nbrs), label int64, is_core 0/1.
    """
    import pyarrow.compute as pc
    import ray

    from graphiti_ray.stages.dedup import connected_components
    from graphiti_ray.stages.embed import column_to_matrix
    from graphiti_ray.stages.link import _cached_lut

    full = emb.select_columns([id_col, vec_col]).to_pandas()
    ids_all = full[id_col].to_numpy(dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in full[vec_col]])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1
    ref = ray.put((ids_all, (mat / norms).T))  # (dim, n)

    def _sims(batch: pa.Table):
        ids_a, matT = _cached_lut(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        rows = (
            column_to_matrix(batch.column(vec_col), np.float64)
            if batch.num_rows
            else np.zeros((0, matT.shape[0]))
        )
        n = np.linalg.norm(rows, axis=1, keepdims=True)
        n[n == 0] = 1
        sims = np.round((rows / n) @ matT, 6)
        nbr = (sims >= eps) & (ids[:, None] != ids_a[None, :])
        return ids, ids_a, nbr

    # pass 1: exact neighbor counts → the core set (corpus-bounded ids)
    def count_nbrs(batch: pa.Table) -> pa.Table:
        ids, _, nbr = _sims(batch)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_nbrs": pa.array(nbr.sum(axis=1).astype(np.int64), pa.int64()),
            }
        )

    counts = emb.map_batches(
        count_nbrs, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # narrow (id, n) — same driver bound as the matrix above
    core_ids = np.sort(
        counts.loc[counts["n_nbrs"] >= min_pts, id_col].to_numpy(dtype=np.int64)
    )
    core_ref = ray.put(core_ids)

    # pass 2: core-core pairs (a < b) → components → core→cluster map
    def core_pairs(batch: pa.Table) -> pa.Table:
        cores = _cached_lut(core_ref)
        ids, ids_a, nbr = _sims(batch)
        row_core = np.isin(ids, cores)
        col_core = np.isin(ids_a, cores)
        m = nbr & row_core[:, None] & col_core[None, :] & (
            ids[:, None] < ids_a[None, :]
        )
        r, c = np.nonzero(m)
        return pa.table(
            {
                "a": pa.array(ids[r], pa.int64()),
                "b": pa.array(ids_a[c], pa.int64()),
            }
        )

    pair_ds = emb.map_batches(
        core_pairs, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    cluster: dict[int, int] = {int(i): int(i) for i in core_ids}  # singletons
    # guard the components pass on pairs existing — cores with no
    # core-core edge stay singleton clusters, and connected_components
    # never sees an empty dataset
    if core_ids.size and pair_ds.count() > 0:
        comp = connected_components(pair_ds)
        for row in comp.take_all():
            cluster[int(row["doc_id"])] = int(row["component"])
    clus_ref = ray.put(cluster)

    # pass 3: labels — core → own cluster; border → min core-neighbor
    # cluster; noise → -1
    def label(batch: pa.Table) -> pa.Table:
        cores = _cached_lut(core_ref)
        cmap = _cached_lut(clus_ref)
        ids, ids_a, nbr = _sims(batch)
        col_cluster = np.array(
            [cmap.get(int(i), -1) for i in ids_a], dtype=np.int64
        )
        col_core = col_cluster >= 0
        cand = np.where(
            nbr & col_core[None, :], col_cluster[None, :], np.iinfo(np.int64).max
        )
        border_lab = cand.min(axis=1) if len(ids) else np.zeros(0, np.int64)
        border_lab = np.where(
            border_lab == np.iinfo(np.int64).max, -1, border_lab
        )
        row_core = np.isin(ids, cores)
        own = np.array([cmap.get(int(i), -1) for i in ids], dtype=np.int64)
        lab = np.where(row_core, own, border_lab)
        nn = nbr.sum(axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "label": pa.array(lab, pa.int64()),
                "is_core": pa.array(row_core.astype(np.int64), pa.int64()),
                "n_nbrs": pa.array(nn, pa.int64()),
            }
        )

    return emb.map_batches(label, batch_format="pyarrow", zero_copy_batch=True)


def ood_margin(
    emb: rd.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> rd.Dataset:
    """Per-vector out-of-distribution margin for labeled embeddings — the
    mislabel/outlier filter a curation pipeline runs before training
    (confident-learning-lite): cosine to the OWN label's centroid minus
    the best cosine to any OTHER label's centroid; negative margin ⇒ the
    vector sits closer to a foreign class.

    Exactness: centroids are derived from EXACT integer moment sums
    (n, Σ floor(e_j·1e6)) per (label, dim) — the lang_centroids
    convention — so both engines divide identical integers; per-vector
    cosines are rounded to 1e-6 before the margin subtraction.

    Scale shape: dense per-batch ``np.add.at`` partials → one
    |labels|·dim keyed sum (parameter-sized to the driver) → centroid
    matrix broadcast once via ``ray.put`` → one streamed scoring pass.

    Output: (vec_id, label, own_cos, best_other_cos, margin).
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from graphiti_ray.stages.embed import column_to_matrix
    from graphiti_ray.stages.link import _cached_lut

    def moments(batch: pa.Table) -> pa.Table:
        mat = column_to_matrix(batch.column(vec_col), np.float64)
        labs = batch.column(label_col).to_numpy(zero_copy_only=False)
        q = np.floor(mat * 1e6).astype(np.int64)
        out_l, out_j, out_s, out_n = [], [], [], []
        for lab in np.unique(labs):
            sel = q[labs == lab]
            s = sel.sum(axis=0)
            out_l.extend([int(lab)] * q.shape[1])
            out_j.extend(range(q.shape[1]))
            out_s.extend(int(v) for v in s)
            out_n.extend([sel.shape[0]] * q.shape[1])
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "j": pa.array(out_j, pa.int64()),
                "sum_q": pa.array(out_s, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    stats = (
        emb.select_columns([vec_col, label_col])
        .map_batches(moments, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["label", "j"])
        .aggregate(Sum("sum_q", alias_name="sum_q"), Sum("n", alias_name="n"))
        .take_all()  # |labels|·dim rows — parameter-sized
    )
    labels = sorted({int(r["label"]) for r in stats})
    lab_ix = {l: i for i, l in enumerate(labels)}
    dim = max(int(r["j"]) for r in stats) + 1
    cent = np.zeros((len(labels), dim), np.float64)
    for r in stats:
        cent[lab_ix[int(r["label"])], int(r["j"])] = r["sum_q"] / (
            r["n"] * 1e6
        )
    cnorm = np.linalg.norm(cent, axis=1, keepdims=True)
    cnorm[cnorm == 0] = 1
    ref = ray.put((np.array(labels, np.int64), (cent / cnorm).T))

    def score(batch: pa.Table, _ref=ref) -> pa.Table:
        labels_, centT = _cached_lut(_ref)
        mat = column_to_matrix(batch.column(vec_col), np.float64)
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0] = 1
        cos = np.round((mat / n) @ centT, 6)  # (rows, L)
        labs = batch.column(label_col).to_numpy(zero_copy_only=False)
        own_ix = np.searchsorted(labels_, labs)
        rows = np.arange(len(labs))
        own = cos[rows, own_ix]
        masked = cos.copy()
        masked[rows, own_ix] = -np.inf
        best = masked.max(axis=1)
        return pa.table(
            {
                id_col: pc.cast(batch.column(id_col), pa.int64()),
                "label": pa.array(labs.astype(np.int64), pa.int64()),
                "own_cos": pa.array(own, pa.float64()),
                "best_other_cos": pa.array(best, pa.float64()),
                "margin": pa.array(np.round(own - best, 6), pa.float64()),
            }
        )

    return emb.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def pca_top_component(
    emb: rd.Dataset,
    rounds: int = 4,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Top principal component of the embedding corpus by exact-integer
    power iteration over the e3-lattice covariance Gram — the direction a
    data-mixing/dedup pipeline projects onto for diversity scoring, and
    the one distributed linear-algebra primitive (Gram reduce) the
    similarity family didn't yet expose.

    Fully distributed, parameter-sized driver state:
      1. per-position sums (one combiner pass) → dim rows → floor-div
         means ``mu`` on the driver,
      2. per-block partial centered Gram ``(V−μ)ᵀ(V−μ)`` (one int64
         matmul per block, emitted long) → ``groupby(i,j).sum`` →
         dim² rows folded on the driver — never a vector-count-sized
         materialization,
      3. power iteration in exact Python ints: x₀ = 1000·𝟙, per round
         y = G·x then renormalize x ← trunc((y·1000) / max|y|) —
         TRUNCATION toward zero, DuckDB's ``//`` semantics on negatives
         (Python's ``//`` floors; ``_tdiv`` bridges) — eigenvalue =
         Rayleigh quotient trunc((xᵀGx) / (xᵀx)).

    Everything after the floor(v·1000) quantization (the kmeans_assign
    convention) is exact integer arithmetic, so the unrolled SQL twin
    hashes bit-for-bit. Gram is PSD, so iterates keep their sign and no
    sign convention is needed. Assumes dim² is parameter-sized (dim ≲
    2k); rows scale freely. → (pos 1-based, x_e3, lam)."""
    from ray.data.aggregate import Sum

    quant = KMEANS_QUANT

    def q3(t: pa.Table) -> np.ndarray:
        import numpy as _np

        vs = t.column(col).to_pylist()
        return _np.floor(_np.asarray(vs, _np.float64) * quant).astype(_np.int64)

    def pos_partial(t: pa.Table) -> pa.Table:
        v3 = q3(t)
        s = v3.sum(axis=0)
        d = v3.shape[1]
        return pa.table(
            {
                "pos": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "s": pa.array(s, pa.int64()),
                "n": pa.array(np.full(d, v3.shape[0], np.int64)),
            }
        )

    sums = (
        emb.map_batches(pos_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pos")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
        .take_all()
    )
    sums.sort(key=lambda r: r["pos"])

    def _tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a < 0) == (b < 0) else -q

    mu = np.array([_tdiv(int(r["s"]), int(r["n"])) for r in sums], np.int64)
    dim = len(mu)

    def gram_partial(t: pa.Table, _mu=mu) -> pa.Table:
        v3 = q3(t) - _mu
        g = v3.T @ v3
        ii, jj = np.meshgrid(
            np.arange(1, dim + 1, dtype=np.int64),
            np.arange(1, dim + 1, dtype=np.int64),
            indexing="ij",
        )
        return pa.table(
            {
                "i": pa.array(ii.ravel(), pa.int64()),
                "j": pa.array(jj.ravel(), pa.int64()),
                "g": pa.array(g.ravel(), pa.int64()),
            }
        )

    gram_rows = (
        emb.map_batches(gram_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["i", "j"])
        .sum("g")
        .take_all()
    )
    G = [[0] * dim for _ in range(dim)]
    for r in gram_rows:
        G[int(r["i"]) - 1][int(r["j"]) - 1] = int(r["sum(g)"])

    x = [int(quant)] * dim
    for _ in range(rounds):
        y = [sum(G[i][j] * x[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(v) for v in y)
        if m == 0:
            break
        x = [_tdiv(v * quant, m) for v in y]
    yf = [sum(G[i][j] * x[j] for j in range(dim)) for i in range(dim)]
    num = sum(x[i] * yf[i] for i in range(dim))
    den = sum(v * v for v in x)
    lam = _tdiv(num, den) if den else 0
    return pa.table(
        {
            "pos": pa.array(range(1, dim + 1), pa.int64()),
            "x_e3": pa.array(x, pa.int64()),
            "lam": pa.array([lam] * dim, pa.int64()),
        }
    )


def cosine_histogram(
    emb: rd.Dataset,
    n_probes: int = 128,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Pairwise cosine-similarity histogram census → ``(bucket,
    n_pairs)`` with bucket = floor(cos·10) ∈ [−10, 10] — the distribution
    a pipeline inspects to pick an embedding-dedup / ANN threshold before
    committing to one.

    Probe-vs-corpus shape (the knn_brute_force contract): the ``n_probes``
    lowest-id vectors are collected once (driver-small) and broadcast;
    the corpus streams through one ``map_batches`` doing an int64 matmul
    per block on the e3 lattice. At 100-TB scale the probe set IS the
    sample — the census needs distributional, not exhaustive, coverage.
    Determinism: dot products and squared norms are exact lattice
    integers; the single ``dot / sqrt(na²·nb²) · 10`` per pair is one
    IEEE-correctly-rounded sqrt + divide + multiply on identical inputs,
    then floor — bit-stable across both engines. Zero vectors are
    excluded on both sides."""
    import ray

    from ray.data.aggregate import Sum

    quant = KMEANS_QUANT
    probes = emb.sort(id_col).limit(n_probes).take_all()
    pid = np.array([int(r[id_col]) for r in probes], np.int64)
    pmat = np.floor(
        np.asarray([r[col] for r in probes], np.float64) * quant
    ).astype(np.int64)
    pn2 = (pmat * pmat).sum(axis=1)
    keep_p = pn2 > 0
    pid, pmat, pn2 = pid[keep_p], pmat[keep_p], pn2[keep_p]
    ref = ray.put((pid, pmat, pn2))

    def score(batch: pa.Table, _ref=ref) -> pa.Table:
        qid, qmat, qn2 = ray.get(_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        v3 = np.floor(
            np.asarray(batch.column(col).to_pylist(), np.float64) * quant
        ).astype(np.int64)
        n2 = (v3 * v3).sum(axis=1)
        ok = n2 > 0
        ids, v3, n2 = ids[ok], v3[ok], n2[ok]
        if ids.size == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        dot = v3 @ qmat.T  # (n, n_probes) exact int64
        prod = (n2[:, None] * qn2[None, :]).astype(np.float64)
        cos = dot / np.sqrt(prod)
        bucket = np.floor(cos * 10).astype(np.int64)
        mask = ids[:, None] != qid[None, :]  # exclude self-pairs
        b, c = np.unique(bucket[mask], return_counts=True)
        return pa.table(
            {"bucket": pa.array(b, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    return (
        emb.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Sum("c", alias_name="n_pairs"))
    )
