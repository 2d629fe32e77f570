"""Dedup family: exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding."""

import numpy as np
import pytest

import ray.data as rd

from graphiti_ray.stages.dedup import (
    connected_components,
    embedding_near_dup,
    est_jaccard,
    exact_dedup_documents,
    hamming64,
    minhash_near_dup,
    minhash_sig,
    ngram_jaccard,
    simhash64,
    simhash_near_dup,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill in the afternoon sun near the garden"
)


def _docs(texts):
    return rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])


def test_minhash_sig_deterministic():
    a = minhash_sig(BASE)
    b = minhash_sig(BASE)
    assert np.array_equal(a, b)
    assert len(a) == 64


def test_est_jaccard_tracks_exact():
    near = BASE.replace("lazy", "sleepy")
    far = "completely different words with nothing shared at all whatsoever"
    exact_near = ngram_jaccard(BASE, near)
    exact_far = ngram_jaccard(BASE, far)
    assert exact_near > 0.7 and exact_far < 0.2
    assert abs(est_jaccard(minhash_sig(BASE), minhash_sig(near)) - exact_near) < 0.25
    assert est_jaccard(minhash_sig(BASE), minhash_sig(far)) < 0.3


def test_exact_dedup(ray_session):
    out = exact_dedup_documents(_docs([BASE, BASE, "other text", BASE])).to_pandas()
    row = out[out.dup_count == 3].iloc[0]
    assert row.keep_id == 0
    assert len(out) == 2


def test_minhash_near_dup_clusters(ray_session):
    near = BASE.replace("lazy", "sleepy")
    texts = [BASE, near, "unrelated totally different content here entirely", BASE]
    out = minhash_near_dup(_docs(texts), threshold=0.7).to_pandas()
    comp = dict(zip(out.doc_id, out.component))
    assert comp[0] == comp[1] == comp[3] == 0
    assert 2 not in comp  # the unrelated doc joins no cluster


def test_connected_components_chain(ray_session):
    pairs = rd.from_items([{"a": 1, "b": 2}, {"a": 2, "b": 3}, {"a": 10, "b": 11}])
    out = connected_components(pairs).to_pandas()
    comp = dict(zip(out.doc_id, out.component))
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10


def test_connected_components_distributed_path(ray_session, monkeypatch):
    """With SMALL_CC_LIMIT forced tiny, the distributed min-label rounds must
    run (not raise) and agree with the driver union-find on the same input."""
    import graphiti_ray.stages.dedup as dedup_mod

    fixtures = [
        # int ids: a 4-chain, a triangle, an isolated pair
        [
            {"a": 1, "b": 2},
            {"a": 2, "b": 3},
            {"a": 3, "b": 4},
            {"a": 7, "b": 8},
            {"a": 8, "b": 9},
            {"a": 9, "b": 7},
            {"a": 20, "b": 21},
        ],
        # string uuids
        [
            {"a": "b1", "b": "a1"},
            {"a": "c1", "b": "b1"},
            {"a": "d1", "b": "c1"},
            {"a": "x9", "b": "z2"},
        ],
    ]
    for rows in fixtures:
        want = {
            (r["doc_id"], r["component"])
            for r in connected_components(rd.from_items(rows)).take_all()
        }
        monkeypatch.setattr(dedup_mod, "SMALL_CC_LIMIT", 2)
        got = {
            (r["doc_id"], r["component"])
            for r in connected_components(rd.from_items(rows)).take_all()
        }
        monkeypatch.setattr(dedup_mod, "SMALL_CC_LIMIT", 1_000_000)
        assert got == want and len(got) == len({d for d, _ in got})


def test_simhash_hamming():
    a = simhash64(BASE)
    b = simhash64(BASE.replace("lazy", "sleepy"))
    c = simhash64("entirely different material with other topics")
    assert hamming64(a, a) == 0
    assert hamming64(a, b) < hamming64(a, c)


def test_simhash_near_dup(ray_session):
    texts = [BASE, BASE, "wholly different content"]
    out = simhash_near_dup(_docs(texts), max_hamming=3).to_pandas()
    assert {(0, 1)} == set(zip(out.a, out.b))
    assert (out.hamming == 0).all()


def test_embedding_near_dup(ray_session):
    rng = np.random.RandomState(0)
    v = rng.randn(8).astype(np.float32)
    rows = [
        {"vec_id": 0, "embedding": list(map(float, v))},
        {"vec_id": 1, "embedding": list(map(float, v * 2.0))},  # same direction
        {"vec_id": 2, "embedding": list(map(float, rng.randn(8)))},
    ]
    out = embedding_near_dup(rd.from_items(rows), threshold=0.95).to_pandas()
    assert (0, 1) in set(zip(out.a, out.b))


def test_embedding_lsh_full_probe_equals_exact(ray_session):
    """n_planes=0 + n_tables=1 + uncapped bucket ⇒ the LSH path's candidate
    set is all pairs, so its output must EQUAL the exact baseline; and any
    partial-plane configuration's pairs must be a SUBSET of the exact ones
    (LSH only prunes candidates — the cosine verify is shared)."""
    from graphiti_ray.stages.dedup import embedding_near_dup, embedding_near_dup_exact

    emb = rd.read_parquet(
        "/root/testdata/sf0.01/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    exact = embedding_near_dup_exact(emb, threshold=0.45).to_pandas()
    exact_pairs = set(zip(exact.a, exact.b))

    full = embedding_near_dup(
        emb, threshold=0.45, n_planes=0, n_tables=1, max_bucket=1_000_000
    ).to_pandas()
    assert set(zip(full.a, full.b)) == exact_pairs and len(exact_pairs) > 0
    merged = full.merge(exact, on=["a", "b"], suffixes=("_lsh", "_exact"))
    assert (merged.cosine_lsh == merged.cosine_exact).all()

    partial = embedding_near_dup(emb, threshold=0.45, n_planes=6, n_tables=2).to_pandas()
    assert set(zip(partial.a, partial.b)) <= exact_pairs


def test_truncation_counter_fires_on_hot_bucket(ray_session):
    """A bucket over MAX_BUCKET must be counted + logged, never silent."""
    from graphiti_ray.stages.dedup import MAX_BUCKET, TRUNCATION_STATS, minhash_near_dup

    n = MAX_BUCKET + 20
    texts = [BASE] * n  # identical docs → every band bucket holds n docs
    out = minhash_near_dup(_docs(texts), threshold=0.9).to_pandas()
    stats = TRUNCATION_STATS["minhash_lsh"]
    assert stats["hot_buckets"] >= 1
    assert stats["truncated_docs"] >= 20
    # the capped bucket still clusters its surviving members
    assert len(out) == MAX_BUCKET
    assert set(out["component"]) == {0}


def test_embedding_near_dup_exact_matches_duckdb(ray_session):
    """Exact all-pairs variant against a DuckDB all-pairs oracle."""
    import duckdb
    import pandas as pd

    from graphiti_ray.stages.dedup import embedding_near_dup_exact

    emb = rd.read_parquet(
        "/root/testdata/sf0.01/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    got = (
        embedding_near_dup_exact(emb, threshold=0.45)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        """
        SELECT a.vec_id AS a, b.vec_id AS b,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 6) AS cosine
        FROM '/root/testdata/sf0.01/embeddings.parquet' a
        JOIN '/root/testdata/sf0.01/embeddings.parquet' b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[]), 6) >= 0.45
        ORDER BY a, b
        """
    ).df()
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got.astype({"a": "int64", "b": "int64"}), want.astype({"a": "int64", "b": "int64"})
    )


def test_connected_components_string_ids(ray_session):
    """CC works on string uuids (entity graph use) with min-label output."""
    pairs = rd.from_items(
        [{"a": "b1", "b": "a1"}, {"a": "c1", "b": "b1"}, {"a": "x9", "b": "z2"}]
    )
    out = connected_components(pairs).to_pandas()
    got = dict(zip(out["doc_id"], out["component"]))
    assert got == {"a1": "a1", "b1": "a1", "c1": "a1", "x9": "x9", "z2": "x9"}


def test_clean_corpus_full_pipeline(ray_session):
    """Composite cleaning: the near-dup stage removes non-winner members of
    MinHash components from the exact-dedup survivor set."""
    import ray.data as rd_

    from graphiti_ray.pipelines.corpus import clean_corpus, clean_corpus_exact

    docs = rd_.read_parquet(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    )
    exact = set(r["doc_id"] for r in clean_corpus_exact(docs).take_all())
    full = set(r["doc_id"] for r in clean_corpus(docs).take_all())
    assert full <= exact
    assert len(full) < len(exact)  # synthetic corpus HAS near-dups
    # every dropped doc is a non-minimal member of some near-dup component
    from graphiti_ray.stages.dedup import minhash_near_dup

    comps = {
        r["doc_id"]: r["component"] for r in minhash_near_dup(docs).take_all()
    }
    for dropped in exact - full:
        assert dropped in comps and comps[dropped] != dropped


def test_clean_corpus_anti_join_path(ray_session, monkeypatch):
    """Above NEAR_DUP_DROP_BROADCAST_LIMIT the drop set applies as a
    distributed left_anti join (no driver materialization); forcing the
    bound to 0 must produce exactly the broadcast path's survivor set."""
    import ray.data as rd_

    import graphiti_ray.pipelines.corpus as corpus

    docs = rd_.read_parquet(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    )
    broadcast = set(r["doc_id"] for r in corpus.clean_corpus(docs).take_all())
    monkeypatch.setattr(corpus, "NEAR_DUP_DROP_BROADCAST_LIMIT", 0)
    anti = set(r["doc_id"] for r in corpus.clean_corpus(docs).take_all())
    assert anti == broadcast and len(anti) > 0


def test_deterministic_sample_stability(ray_session):
    import ray.data as rd_

    from graphiti_ray.pipelines.corpus import deterministic_sample

    docs = rd_.read_parquet(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id"]
    )
    a = sorted(r["doc_id"] for r in deterministic_sample(docs, 0.25).take_all())
    b = sorted(
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(13), 0.25).take_all()
    )
    assert a == b  # partitioning-independent
    assert 0.15 < len(a) / 500 < 0.35


def test_minhash_lsh_recall_precision_vs_exact(ray_session):
    """Calibration: LSH candidate clusters vs exact char-5-gram Jaccard
    ground truth at τ=0.8 — recall and precision floors (measure, don't
    guess: quantifies banding + MAX_BUCKET effects on a real corpus)."""
    import itertools

    import pyarrow.parquet as pq

    from graphiti_ray.stages.dedup import minhash_near_dup, shingle_hashes

    tbl = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    )
    ids = tbl.column("doc_id").to_pylist()
    shingles = {
        i: set(map(int, shingle_hashes(t)))
        for i, t in zip(ids, tbl.column("text").to_pylist())
    }
    exact_pairs = set()
    for a, b in itertools.combinations(ids, 2):
        sa, sb = shingles[a], shingles[b]
        inter = len(sa & sb)
        if inter and inter / (len(sa) + len(sb) - inter) >= 0.8:
            exact_pairs.add((min(a, b), max(a, b)))
    assert exact_pairs  # corpus has true near-dups

    docs = rd.from_arrow(tbl)
    comps = {
        r["doc_id"]: r["component"] for r in minhash_near_dup(docs, 0.8).take_all()
    }
    lsh_pairs = {
        (min(a, b), max(a, b))
        for a, b in itertools.combinations(sorted(comps), 2)
        if comps[a] == comps[b]
    }
    recall = len(exact_pairs & lsh_pairs) / len(exact_pairs)
    # clusters are transitive closures, so precision is vs "same component
    # implies high similarity chain" — measure against exact pairs directly
    precision = len(exact_pairs & lsh_pairs) / max(1, len(lsh_pairs))
    assert recall >= 0.9, recall
    assert precision >= 0.8, precision


def test_ngram_jaccard_pairs_matches_bruteforce(ray_session):
    """Exact operator vs per-pair kernel brute force: same pair set, same
    jaccard values — across a multi-block input (sorted_run_map path)."""
    import itertools

    from graphiti_ray.stages.dedup import ngram_jaccard_pairs

    texts = [
        BASE,
        BASE.replace("lazy", "sleepy"),
        BASE + " with a few extra trailing words appended",
        "unrelated totally different content here entirely about spaceships",
        BASE.replace("quick", "swift").replace("cat", "kitten"),
        "another unrelated document describing databases and query engines",
    ]
    out = ngram_jaccard_pairs(_docs(texts).repartition(5), threshold=0.6).to_pandas()
    got = {(int(r.a), int(r.b)): float(r.jaccard) for r in out.itertuples()}
    expect = {
        (i, j): ngram_jaccard(texts[i], texts[j])
        for i, j in itertools.combinations(range(len(texts)), 2)
        if ngram_jaccard(texts[i], texts[j]) >= 0.6
    }
    assert expect  # non-vacuous
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-9


def test_ngram_jaccard_hub_drop_keeps_recall(ray_session):
    """A 72-doc shared template makes its low-hash shingles hubs
    (candidate-df > NGRAM_HOT_DF → dropped); the one true near-dup pair
    must still be found via its non-hub tail shingles, and the hub drop
    must be recorded."""
    from graphiti_ray.stages.dedup import TRUNCATION_STATS, ngram_jaccard_pairs

    template = (
        "common boilerplate header repeated across every page of this site "
        "including navigation links and copyright footer text sections "
    )
    # filler tails must be mutually DISSIMILAR (long unique number runs),
    # otherwise the fillers are legitimately near-dups of each other
    texts = [
        template
        + f"section {i}: "
        + " ".join(str(i * 1000003 + j * 7919 + 12345) for j in range(15))
        for i in range(70)
    ]
    texts.append(
        template
        + "special tail about quantum flux capacitors and time travel adventures"
    )
    texts.append(
        template
        + "special tail about quantum flux capacitors and time travel adventure"
    )
    out = ngram_jaccard_pairs(_docs(texts), threshold=0.8).to_pandas()
    got = {(int(r.a), int(r.b)) for r in out.itertuples()}
    assert got == {(70, 71)}
    stats = TRUNCATION_STATS["ngram_jaccard"]
    assert stats["hub_keys"] >= 1  # template minima were dropped, loudly


def test_ngram_jaccard_pairs_random_corpus_vs_bruteforce(ray_session):
    """Randomized word-soup corpus with planted mutations: the blocked
    operator must reproduce the brute-force pair set exactly."""
    import itertools

    from graphiti_ray.stages.dedup import ngram_jaccard_pairs

    rng = np.random.RandomState(7)
    words = [f"w{i:03d}" for i in range(60)]
    texts = []
    for _ in range(24):
        texts.append(" ".join(rng.choice(words, size=20)))
    for i in range(0, 8, 2):  # plant 4 near-dup pairs by 1-word mutation
        t = list(texts[i].split())
        t[rng.randint(len(t))] = "mutated"
        texts.append(" ".join(t))
    out = ngram_jaccard_pairs(_docs(texts).repartition(6), threshold=0.7).to_pandas()
    got = {(int(r.a), int(r.b)): float(r.jaccard) for r in out.itertuples()}
    expect = {
        (i, j): ngram_jaccard(texts[i], texts[j])
        for i, j in itertools.combinations(range(len(texts)), 2)
        if ngram_jaccard(texts[i], texts[j]) >= 0.7
    }
    assert len(expect) >= 4  # the planted pairs are present
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-9


def test_stratified_sample_rates_and_determinism(ray_session):
    """Per-stratum thresholds: rate 1.0 keeps EVERY row (the 'g' sentinel
    guards the lexicographic compare), rate 0 keeps none, fractional
    rates are deterministic and repeatable."""
    import ray.data as rd_

    from graphiti_ray.pipelines.corpus import stratified_sample

    rows = [
        {"doc_id": i, "lang": ["de", "en", "es"][i % 3]} for i in range(300)
    ]
    ds = rd_.from_items(rows)
    out = stratified_sample(ds, {"de": 1.0, "en": 0.5}).to_pandas()
    by_lang = out.groupby("lang").size().to_dict()
    assert by_lang.get("de") == 100  # rate 1.0 == everything
    assert "es" not in by_lang  # default rate 0 == nothing
    assert 25 <= by_lang.get("en", 0) <= 75  # deterministic ~half
    out2 = stratified_sample(rd_.from_items(rows), {"de": 1.0, "en": 0.5}).to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_duplicated_ngram_stats(ray_session):
    """Docs sharing a 32-char span report matching dup-gram counts; a doc
    with all-unique content reports zero; short docs are excluded."""
    import ray.data as rd_

    from graphiti_ray.stages.dedup import duplicated_ngram_stats

    shared = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        {"doc_id": 0, "text": shared + " alpha unique tail zero zero"},
        {"doc_id": 1, "text": shared + " beta different ending here!"},
        {"doc_id": 2, "text": "completely unrelated content with no overlap at all xyzzy"},
        {"doc_id": 3, "text": "short"},  # < k chars: excluded
    ]
    out = (
        duplicated_ngram_stats(rd_.from_items(rows), k=32)
        .to_pandas()
        .set_index("doc_id")
    )
    assert 3 not in out.index
    assert out.loc[2, "n_dup_grams"] == 0 and out.loc[2, "dup_fraction"] == 0.0
    # independent reference: distinct grams + pairwise intersections
    import numpy as np_

    from graphiti_ray.stages.dedup import shingle_hashes

    g = {r["doc_id"]: shingle_hashes(r["text"], 32) for r in rows[:3]}
    shared01 = np_.intersect1d(g[0], g[1])
    assert len(shared01) > 0
    for d in (0, 1):
        assert out.loc[d, "n_grams"] == len(g[d])
        assert out.loc[d, "n_dup_grams"] == len(shared01)
        assert out.loc[d, "dup_fraction"] == len(shared01) / len(g[d])


def test_pack_sequences_quota_rule(ray_session):
    """Contiguous-quota packing: pack_id = exclusive prefix // budget per
    shard, offsets restart at the quota line, one-doc-per-shard inputs
    pack alone."""
    import ray.data as rd_

    from graphiti_ray.pipelines.corpus import pack_sequences

    # one shard (n_shards=1), budget 10, token counts 4,4,4,4 → prefixes
    # 0,4,8,12 → packs 0,0,0,1 (the 8-prefix doc straddles and overflows)
    rows = [{"doc_id": i, "text": "a b c d"} for i in range(4)]
    out = (
        pack_sequences(rd_.from_items(rows), budget_tokens=10, n_shards=1)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out.pack_id) == [0, 0, 0, 1]
    assert list(out.pack_offset) == [0, 4, 8, 2]
    assert (out.n_tokens == 4).all()
    assert (out.shard == 0).all()

    # sharding: docs split into independent streams by doc_id % n
    out2 = (
        pack_sequences(rd_.from_items(rows), budget_tokens=10, n_shards=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out2.shard) == [0, 1, 0, 1]
    assert list(out2.pack_id) == [0, 0, 0, 0]


def test_remove_duplicated_spans_planted(ray_session):
    """Lee et al. span removal: a 40-char span planted in two docs is cut
    from BOTH (plus the k-gram bleed into surrounding chars), unique docs
    and sub-k docs come back untouched (lowered)."""
    import numpy as np
    import ray.data as rd

    from graphiti_ray.stages.dedup import DUPSPAN_K, remove_duplicated_spans

    k = DUPSPAN_K
    rng = np.random.default_rng(5)

    def rand_text(n):
        return "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz "), n))

    span = "THE EXACT SAME BOILERPLATE SENTENCE HERE!!!"  # 43 chars > k
    u0, u1, u2 = rand_text(120), rand_text(120), rand_text(120)
    texts = [
        u0 + span + rand_text(60),
        u1 + span + rand_text(60),
        u2,          # unique, len >= k: untouched
        "short",     # < k: untouched
        "",
    ]
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(3)
    out = (
        remove_duplicated_spans(ds, k=k)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.doc_id.tolist() == [0, 1, 2, 3, 4]
    # the planted span is gone from both carriers
    assert span.lower() not in out.cleaned_text[0]
    assert span.lower() not in out.cleaned_text[1]
    # at least the span's k-grams' coverage is removed from each
    assert (out.n_removed[:2] >= len(span)).all()
    # untouched docs come back as their lowered selves, n_removed 0
    assert out.cleaned_text[2] == u2.lower() and out.n_removed[2] == 0
    assert out.cleaned_text[3] == "short" and out.n_removed[3] == 0
    assert out.cleaned_text[4] == "" and out.n_removed[4] == 0

    # brute-force twin: positional k-gram df over the whole fixture
    from graphiti_ray.stages.dedup import shingle_hash_seq
    from collections import Counter

    occ = Counter()
    for t in texts:
        if len(t) >= k:
            occ.update(map(int, shingle_hash_seq(t, k)))
    for i, t in enumerate(texts):
        tl = t.lower()
        if len(tl) < k:
            expect = tl
            n_rm = 0
        else:
            hs = shingle_hash_seq(t, k)
            covered = np.zeros(len(tl), bool)
            for p, h in enumerate(map(int, hs)):
                if occ[h] >= 2:
                    covered[p : p + k] = True
            expect = "".join(c for c, m in zip(tl, covered) if not m)
            n_rm = int(covered.sum())
        assert out.cleaned_text[i] == expect
        assert out.n_removed[i] == n_rm


def test_gram_novelty_first_seen_semantics(ray_session):
    """Novelty: the doc that introduces a shared span owns its grams;
    later carriers don't. Dual invariant vs duplicated_ngram_stats."""
    import numpy as np
    import ray.data as rd

    from graphiti_ray.stages.dedup import (
        DUPSPAN_K,
        gram_novelty,
        shingle_hashes,
    )

    k = DUPSPAN_K
    rng = np.random.default_rng(9)

    def rand_text(n):
        return "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz "), n))

    shared = "a boilerplate sentence shared verbatim by two documents"
    t0 = rand_text(100) + shared
    t1 = rand_text(100) + shared   # doc 1 repeats doc 0's span
    t2 = rand_text(150)            # fully novel
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate([t0, t1, t2])]
    ).repartition(3)
    out = (
        gram_novelty(ds, k=k)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    sets = [set(map(int, shingle_hashes(t, k))) for t in [t0, t1, t2]]
    expect_novel = [
        len(sets[0]),                      # doc 0 first-sees everything it has
        len(sets[1] - sets[0]),            # doc 1 loses the shared grams
        len(sets[2] - sets[0] - sets[1]),
    ]
    assert out.n_grams.tolist() == [len(s) for s in sets]
    assert out.n_novel.tolist() == expect_novel
    assert out.novelty_fraction[0] == 1.0
    assert out.novelty_fraction[1] < 1.0
    assert out.novelty_fraction[2] == 1.0


def test_cdc_chunks_reconstruction_and_insertion_locality(ray_session):
    """CDC: chunks reconstruct the (lowered) doc exactly, and an
    insertion near the head leaves the tail chunk digests unchanged —
    the property fixed-grid chunking cannot have."""
    import numpy as np
    import ray.data as rd

    from graphiti_ray.stages.dedup import cdc_chunks

    rng = np.random.default_rng(3)
    base = "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz "), 3000))
    edited = base[:10] + "INSERTED!" + base[10:]
    ds = rd.from_items(
        [{"doc_id": 0, "text": base}, {"doc_id": 1, "text": edited},
         {"doc_id": 2, "text": "tiny"}]
    )
    out = cdc_chunks(ds).to_pandas()

    for d, t in [(0, base), (1, edited), (2, "tiny")]:
        sub = out[out.doc_id == d].sort_values("chunk_id")
        assert (sub.chunk_id.to_numpy() == np.arange(len(sub))).all()
        # starts/lengths tile the doc exactly
        assert sub.start.iloc[0] == 1
        assert (
            sub.start.to_numpy()[1:]
            == (sub.start + sub.length).to_numpy()[:-1]
        ).all()
        assert int((sub.start + sub.length).iloc[-1]) - 1 == len(t)

    # locality: the tail of the edited doc re-synchronizes to base's chunks
    h0 = out[out.doc_id == 0].sort_values("chunk_id").chunk_md5.tolist()
    h1 = out[out.doc_id == 1].sort_values("chunk_id").chunk_md5.tolist()
    shared_tail = 0
    while (
        shared_tail < min(len(h0), len(h1))
        and h0[-1 - shared_tail] == h1[-1 - shared_tail]
    ):
        shared_tail += 1
    assert shared_tail >= max(2, len(h0) - 4)


def test_levenshtein_distance_matches_reference():
    import random

    from graphiti_ray.stages.dedup import levenshtein_distance

    def ref(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            cur = [i + 1]
            for j, cb in enumerate(b):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = random.Random(11)
    assert levenshtein_distance("kitten", "sitting") == 3
    assert levenshtein_distance("", "abc") == 3
    assert levenshtein_distance("abc", "") == 3
    assert levenshtein_distance("same", "same") == 0
    for _ in range(60):
        a = "".join(rng.choice("abcd ") for _ in range(rng.randrange(0, 25)))
        b = "".join(rng.choice("abcd ") for _ in range(rng.randrange(0, 25)))
        assert levenshtein_distance(a, b) == ref(a, b), (a, b)


def test_levenshtein_verified_pairs_pipeline(ray_session):
    import ray.data as rd

    from graphiti_ray.stages.dedup import (
        levenshtein_verified_pairs,
        minhash_signatures,
        candidate_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "across the wide green field toward the distant hills tonight"
    )
    docs = [{"doc_id": 0, "text": base},
            {"doc_id": 1, "text": base.replace("quick", "swift")},
            {"doc_id": 2, "text": "completely unrelated text about databases "
                                  "and distributed query execution engines"}]
    ds = rd.from_items(docs).repartition(2)
    out = levenshtein_verified_pairs(ds).to_pandas()
    # the near-identical pair is proposed and confirmed; the unrelated doc
    # never pairs
    assert set(zip(out.a, out.b)) == {(0, 1)}
    row = out.iloc[0]
    assert row.lev_dist == 4  # quick -> swift (the shared 'i' aligns)
    assert row.is_dup
    # verified pair count never exceeds candidate count
    cands = candidate_pairs(minhash_signatures(ds)).count()
    assert len(out) == cands


def test_temperature_sample_flattens_mixture(ray_session):
    import math

    import ray.data as rd

    from graphiti_ray.pipelines.corpus import temperature_sample

    rows = (
        [{"doc_id": i, "lang": "en"} for i in range(1600)]
        + [{"doc_id": 10_000 + i, "lang": "fr"} for i in range(400)]
        + [{"doc_id": 20_000 + i, "lang": "de"} for i in range(100)]
    )
    out = temperature_sample(rd.from_items(rows).repartition(4)).to_pandas()
    by = out.groupby("lang").size()
    # the min stratum is kept whole; others thin at sqrt(n_min/n), so the
    # expected kept sizes are sqrt(n_min·n) = 400, 200, 100
    assert by["de"] == 100
    assert abs(by["en"] - 400) / 400 < 0.15
    assert abs(by["fr"] - 200) / 200 < 0.15
    # deterministic: same input, same sample
    out2 = temperature_sample(rd.from_items(rows)).to_pandas()
    assert sorted(out2.doc_id) == sorted(out.doc_id)
    # flattening: post-sample ratio max/min shrinks from 16× toward 4×
    assert by.max() / by.min() < 16 / 2


def test_weighted_sample_bias_and_determinism(ray_session):
    """Heavier rows win more often (weight-proportional inclusion), the
    draw is deterministic, and k rows come back."""
    from graphiti_ray.pipelines.corpus import weighted_sample

    rows = [{"doc_id": i, "n_chars": 1000 if i < 100 else 10} for i in range(1000)]
    out = weighted_sample(rd.from_items(rows).repartition(4), "n_chars", k=100).to_pandas()
    assert len(out) == 100
    heavy = (out.doc_id < 100).sum()
    assert heavy > 50  # 100 heavy rows (100× weight) dominate the sample
    out2 = weighted_sample(rd.from_items(rows), "n_chars", k=100).to_pandas()
    assert sorted(out2.doc_id) == sorted(out.doc_id)


def test_rendezvous_shards_balanced_and_stable(ray_session):
    """Assignments are deterministic, roughly balanced, and adding a shard
    moves only ~1/(n+1) of the keys (the consistent-hashing property)."""
    from graphiti_ray.pipelines.corpus import rendezvous_shards

    rows = [{"doc_id": i} for i in range(2000)]
    a = rendezvous_shards(rd.from_items(rows).repartition(3), n_shards=8).to_pandas()
    counts = a.groupby("shard").size()
    assert len(counts) == 8 and counts.min() > 2000 / 8 * 0.6
    b = rendezvous_shards(rd.from_items(rows), n_shards=9).to_pandas()
    merged = a.merge(b, on="doc_id", suffixes=("_8", "_9"))
    moved = (merged.shard_8 != merged.shard_9).mean()
    assert moved < 0.2  # ~1/9 expected; mod-N would move ~8/9


def test_encode_documents_roundtrip_vocab(ray_session):
    from graphiti_ray.pipelines.corpus import encode_documents

    rows = [
        {"doc_id": 0, "text": "the cat sat on the mat"},
        {"doc_id": 1, "text": "the dog sat quietly"},
        {"doc_id": 2, "text": "unseen words only zyx wvu"},
    ]
    out = (
        encode_documents(rd.from_items(rows).repartition(2), vocab_size=3)
        .to_pandas()
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    # vocab: the(3)→1, sat(2)→2, cat(1, token-asc tie)→3
    d0 = out[out.doc_id == 0].token_id.tolist()
    assert d0 == [1, 3, 2, 0, 1, 0]  # the cat sat on the mat
    d2 = out[out.doc_id == 2].token_id.tolist()
    assert d2 == [0, 0, 0, 0, 0]  # all OOV
    # positions are contiguous 0..n-1 per doc
    for _, g in out.groupby("doc_id"):
        assert g.pos.tolist() == list(range(len(g)))


def test_dedup_lines_corpus_keep_first(ray_session):
    """Corpus-order first occurrence survives, later copies drop; empty
    lines always survive; an all-duplicate doc drops out."""
    import pyarrow as pa
    import ray.data as rd_

    from graphiti_ray.stages.dedup import dedup_lines_corpus

    docs = rd_.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    "alpha\nbeta",
                    "beta\n\ngamma",   # beta dup; empty line kept
                    "beta\nalpha",     # all duplicates → doc vanishes
                ],
            }
        )
    )
    out = {r["doc_id"]: r["text"] for r in dedup_lines_corpus(docs).take_all()}
    assert out == {1: "alpha\nbeta", 2: "\ngamma"}


def test_sorted_neighborhood_pairs_window_and_lattice(ray_session):
    import pyarrow as pa

    from graphiti_ray.stages.dedup import sorted_neighborhood_pairs

    # two planted near-dup clusters with shared prefixes, plus decoys whose
    # prefixes sort far apart; many tiny blocks force window carries
    texts = {
        10: "the quick brown fox jumps over the lazy dog tonight",
        11: "the quick brown fox jumps over the lazy dog today",
        12: "the quick brown fox jumps over a lazy dog tonight",
        20: "zebra yak xylophone walrus vulture turtle snake",
        21: "zebra yak xylophone walrus vulture turtle shark",
        30: "completely unrelated middle text about databases",
    }
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": [texts[k] for k in sorted(texts)],
            }
        )
    ).repartition(6)
    out = sorted_neighborhood_pairs(docs, window=4, key_len=24).to_pandas()
    got = {(a, b) for a, b in zip(out.doc_a, out.doc_b)}
    # prefix-adjacent near-dups found in both clusters
    assert (10, 11) in got and (20, 21) in got
    # the decoy pairs with nothing: no pair involves 30
    assert not any(30 in p for p in got)
    # exact lattice: re-derive one pair's jaccard by hand
    row = out[(out.doc_a == 10) & (out.doc_b == 11)].iloc[0]
    a = set(texts[10].split())
    b = set(texts[11].split())
    assert row.jacc_e6 == (1_000_000 * len(a & b)) // len(a | b)
    # window bound respected: sort order is (prefix, doc_id); 12 shares
    # the 24-char prefix so (10,12)/(11,12) are in-window candidates
    assert (11, 12) in got


def test_minimizers_shared_substring_guarantee(ray_session):
    import pyarrow as pa

    from graphiti_ray.stages.dedup import minimizers

    shared = "the quick brown fox jumps over the lazy dog"  # 44 > w+k-1 = 12
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    "AAAA " + shared + " BBBB",
                    "CCCCCCCC " + shared + " DD",
                    "nothing in common here at all with others",
                ],
            }
        )
    )
    out = minimizers(docs, k=5, w=8).to_pandas()
    h1 = set(out[out.doc_id == 1].h)
    h2 = set(out[out.doc_id == 2].h)
    h3 = set(out[out.doc_id == 3].h)
    # the (w,k)-minimizer guarantee: a shared >= w+k-1 byte substring
    # forces at least one shared minimizer hash
    assert h1 & h2
    # density: ~2/(w+1) of positions, never more than the window count
    n_pos = len("AAAA " + shared + " BBBB") - 5 + 1
    assert len(out[out.doc_id == 1]) <= n_pos
    assert len(out[out.doc_id == 1]) >= n_pos // 9
    # decoy shares far less than the twins share with each other
    assert len(h1 & h3) < len(h1 & h2)


def test_minimizers_short_doc_single_window(ray_session):
    import pyarrow as pa

    from graphiti_ray.stages.dedup import minimizers

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["abcdefgh", "abc"],  # m=4 ≤ w; len<k excluded
            }
        )
    )
    out = minimizers(docs, k=5, w=8).to_pandas()
    assert set(out.doc_id) == {1}
    assert len(out) == 1  # one global-argmin window


def test_minimizer_dedup_pairs_planted_and_hub_drop(ray_session):
    import pyarrow as pa

    from graphiti_ray.stages.dedup import minimizer_dedup_pairs

    shared = "an unmistakably long shared passage that dominates both docs"
    hub = "common boilerplate"  # present in EVERY doc → its hashes are hubs
    texts = {
        1: hub + " alpha " + shared,
        2: hub + " omega " + shared,
        3: hub + " unrelated text number three entirely",
        4: hub + " different again and saying nothing shared",
    }
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": [texts[i] for i in sorted(texts)],
            }
        )
    ).repartition(3)
    out = minimizer_dedup_pairs(docs, min_shared=3, hot_df=3).to_pandas()
    got = {(a, b): s for a, b, s in zip(out.doc_a, out.doc_b, out.shared)}
    # the planted pair survives with several shared minimizers
    assert (1, 2) in got and got[(1, 2)] >= 3
    # hub grams (df=4 > hot_df=3) generate no pairs: 3 and 4 share only
    # the boilerplate, so they never pair
    assert not any(3 in p or 4 in p for p in got)


def test_containment_catches_subset_jaccard_misses(ray_session):
    import pyarrow as pa

    from graphiti_ray.stages.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the exact passage lifted verbatim into a much longer article"
    filler = (
        " surrounding prose that goes on at considerable length about other "
        "matters entirely unrelated to the quoted material and keeps adding "
        "more and more distinct content so the union grows far past the "
        "intersection while the short document stays fully contained inside"
    )
    texts = {
        1: quote,                     # short doc = pure subset
        2: quote + filler + filler,   # long doc quoting it
        3: "completely different text with nothing in common at all here",
    }
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), pa.int64()),
                "text": [texts[i] for i in sorted(texts)],
            }
        )
    ).repartition(2)
    cont = ngram_containment_pairs(docs, threshold=0.9).to_pandas()
    jac = ngram_jaccard_pairs(docs, threshold=0.8).to_pandas()
    # the subset pair: containment ~1.0, jaccard far below 0.8
    assert [(a, b) for a, b in zip(cont.a, cont.b)] == [(1, 2)]
    assert cont.containment.iloc[0] >= 0.95
    assert jac.empty


def test_incremental_near_dup_flags_only_new(ray_session):
    import pyarrow as pa

    from graphiti_ray.stages.dedup import incremental_near_dup

    base = (
        "a genuinely long shared passage that repeats across documents and "
        "dominates the shingle set entirely for near duplicate detection "
    ) * 3
    other = (
        "completely different content about unrelated matters that shares "
        "nothing with the first passage at all in any shingle whatsoever "
    ) * 3
    existing = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 2, 4], pa.int64()),
                "text": [base + "v0", base + "v2", other + "x"],
            }
        )
    )
    new = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 3, 5], pa.int64()),
                # 1 dups the existing family; 3 and 5 dup each other only
                "text": [base + "v1", other + "y", other + "z"],
            }
        )
    )
    out = (
        incremental_near_dup(existing, new)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # existing-only dup pair (0,2) is NOT reported; every new dup is
    assert out.index.tolist() == [1, 3, 5]
    assert out.loc[1, "min_partner"] in (0, 2)
    assert out.loc[3, "min_partner"] in (4, 5) and out.loc[5, "min_partner"] in (3, 4)
