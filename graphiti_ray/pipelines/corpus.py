"""Corpus cleaning: the composite training-data pipeline over documents.

The canonical 100 TB use case — language gate → quality gate → exact
dedup → MinHash near-dup removal — composed from the stage-level
operators (stages/textstats.py, stages/dedup.py) as ONE streaming
pipeline with no full materialization:

    docs ─ mb(lang+quality gate, vectorized) ─→ kept
              │ groupby(text_hash) exact-dedup winners
              ▼
           winners ─ minhash LSH ─→ near-dup components ─ anti-broadcast ─→ clean

Every gate is a per-batch vectorized filter (no shuffle); the only wide
steps are exact dedup's hash aggregate and the LSH collision count. The
near-dup removal keeps each component's min doc_id (the same winner rule
as exact dedup).

``clean_corpus_exact`` (gates + exact dedup only) is the deterministic,
SQL-expressible core — its driver query has a DuckDB oracle twin;
``clean_corpus`` adds the near-dup stage (approximate by construction →
pytest-covered).

Also here: ``deterministic_sample`` — hash-threshold row sampling that is
reproducible across runs/engines (md5-prefix compare), the standard way to
carve stable subsets out of a web-scale corpus; SQL-expressible, so
oracle-checked too.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from graphiti_ray.stages.textstats import STOPWORDS

DEFAULT_MIN_CHARS = 150
DEFAULT_MAX_CHARS = 450
DEFAULT_MIN_WORDS = 30

# near-dup drop ids broadcast bound: below, the drop set ships as ONE sorted
# int64 Arrow array (ray.put once, pc.is_in per batch — ~16 MB at the bound);
# above, the removal is a hash-partitioned ANTI-join on the component table,
# so a web-scale drop set (10^8-10^9 ids ≈ corpus-sized) never lands on the
# driver. Same two-path contract as link.BROADCAST_LIMIT.
NEAR_DUP_DROP_BROADCAST_LIMIT = 2_000_000


def _gate_batch(
    batch: pa.Table,
    langs: tuple,
    min_chars: int,
    max_chars: int,
    min_words: int,
) -> pa.Table:
    """Vectorized language + quality gate; emits (doc_id, text)."""
    texts = batch.column("text").to_pylist()
    profiles = {l: STOPWORDS[l] for l in STOPWORDS}
    keep = []
    for t in texts:
        n_chars = len(t)
        if not (min_chars <= n_chars <= max_chars):
            keep.append(False)
            continue
        words = t.split()
        if len(words) < min_words:
            keep.append(False)
            continue
        lowered = [w.lower() for w in words]
        best_lang, best = "und", 0
        for lang in sorted(profiles):
            h = sum(1 for w in lowered if w in profiles[lang])
            if h > best:
                best_lang, best = lang, h
        keep.append(best_lang in langs)
    return batch.filter(pa.array(keep, pa.bool_()))


def _gated_winners(
    docs: rd.Dataset,
    langs: tuple,
    min_chars: int,
    max_chars: int,
    min_words: int,
) -> rd.Dataset:
    """Gates + exact dedup keeping FULL rows: the min-doc_id winner per
    distinct gate-passing text, with its text still attached (so the
    near-dup stage downstream never rescans the corpus). One sort-based
    distinct (ops.distinct_by_key) instead of a hash aggregate — the
    winner row rides along for free."""
    import functools
    import hashlib

    from graphiti_ray.stages.ops import distinct_by_key

    gated = docs.map_batches(
        functools.partial(
            _gate_batch,
            langs=langs,
            min_chars=min_chars,
            max_chars=max_chars,
            min_words=min_words,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def add_hash(batch: pa.Table) -> pa.Table:
        from graphiti_ray.stages.dedup import md5_hex_column

        return batch.append_column(
            "text_hash", pa.array(md5_hex_column(batch.column("text")), pa.string())
        )

    hashed = gated.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    return distinct_by_key(hashed, "text_hash", order_cols=["doc_id"])


def clean_corpus_exact(
    docs: rd.Dataset,
    langs: tuple = ("en",),
    min_chars: int = DEFAULT_MIN_CHARS,
    max_chars: int = DEFAULT_MAX_CHARS,
    min_words: int = DEFAULT_MIN_WORDS,
) -> rd.Dataset:
    """Gates + exact dedup: one surviving (keep) doc_id per distinct text
    among gate-passing docs. Output: (doc_id,)."""
    winners = _gated_winners(docs, langs, min_chars, max_chars, min_words)
    return winners.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id")}),
        batch_format="pyarrow",
    )


def clean_corpus(
    docs: rd.Dataset,
    langs: tuple = ("en",),
    min_chars: int = DEFAULT_MIN_CHARS,
    max_chars: int = DEFAULT_MAX_CHARS,
    min_words: int = DEFAULT_MIN_WORDS,
    near_dup_threshold: float = 0.8,
) -> rd.Dataset:
    """Full cleaning: gates → exact dedup → MinHash near-dup removal
    (keep each near-dup component's min doc_id). Output: (doc_id,).

    The winners keep their text through the exact dedup (sort-distinct
    carries whole rows), so the near-dup stage feeds straight off them with
    no second corpus scan. Drop-set application is size-gated (see
    ``NEAR_DUP_DROP_BROADCAST_LIMIT``): broadcast ``pc.is_in`` below the
    bound, distributed anti-join above it — never a driver Python set."""
    from graphiti_ray.stages.dedup import minhash_near_dup

    winners = _gated_winners(docs, langs, min_chars, max_chars, min_words)
    winners = winners.materialize()

    clusters = minhash_near_dup(
        winners.select_columns(["doc_id", "text"]), threshold=near_dup_threshold
    )
    kept = _apply_near_dup_drops(winners, clusters)
    return kept.map_batches(
        lambda t: pa.table({"doc_id": t.column("doc_id")}), batch_format="pyarrow"
    )


def _apply_near_dup_drops(winners: rd.Dataset, clusters: rd.Dataset) -> rd.Dataset:
    """Remove near-dup losers (component members that are not the component
    representative) from ``winners``.

    At web scale the loser set is a large fraction of the corpus, so it must
    never become a driver-side Python set. Two paths:

    - ``n_drops <= NEAR_DUP_DROP_BROADCAST_LIMIT``: the ids ship as one
      sorted int64 Arrow array (``ray.put`` once per run) and each batch
      filters with vectorized ``pc.is_in`` — the incremental upsert's exact
      pattern (pipelines/incremental.py).
    - above the bound: hash-partitioned ``left_anti`` join against the loser
      table (reference analogue: the dedup fixpoint family,
      bulk_utils.py:357-396, whose uuid_map is graph-sized state).
    """
    import numpy as np
    import pyarrow.compute as pc

    import ray

    def losers_only(batch: pa.Table) -> pa.Table:
        keep = pc.invert(
            pc.equal(batch.column("doc_id"), batch.column("component"))
        )
        return pa.table({"doc_id": batch.filter(keep).column("doc_id")})

    drops = clusters.map_batches(
        losers_only, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_drops = drops.count()
    if n_drops == 0:
        return winners

    if n_drops <= NEAR_DUP_DROP_BROADCAST_LIMIT:
        ids = np.sort(
            np.concatenate(
                [
                    b.column("doc_id").to_numpy(zero_copy_only=False)
                    for b in drops.iter_batches(batch_format="pyarrow")
                ]
            )
        )
        dref = ray.put(pa.array(ids, pa.int64()))

        def drop_near_dups(batch: pa.Table, _ref=dref) -> pa.Table:
            from graphiti_ray.stages.link import _cached_lut

            return batch.filter(
                pc.invert(
                    pc.is_in(batch.column("doc_id"), value_set=_cached_lut(_ref))
                )
            )

        return winners.map_batches(
            drop_near_dups, batch_format="pyarrow", zero_copy_batch=True
        )

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    return safe_join(
        winners,
        drops,
        join_type="left_anti",
        num_partitions=default_join_partitions(),
        on=("doc_id",),
    )


def _hash_threshold(rate: float) -> str:
    """8-hex-char md5 prefix threshold for a keep rate. Rate ≥ 1 must keep
    EVERY row: the comparison is lexicographic, so 'g' (> 'f') beats every
    hash, whereas the naive nine-digit '100000000' would sort BELOW
    'ffffffff' and keep almost nothing."""
    return "g" if rate >= 1.0 else format(int(rate * 16**8), "08x")


def deterministic_sample(
    ds: rd.Dataset, fraction: float, id_col: str = "doc_id"
) -> rd.Dataset:
    """Stable hash-threshold sampling: keep a row iff the first 8 hex chars
    of md5(str(id)) compare below the fraction threshold. Reproducible
    across runs, engines and partitionings (no RNG state), and
    SQL-expressible — the standard carve-a-subset primitive for a corpus
    too big to shuffle."""
    import hashlib

    threshold = _hash_threshold(fraction)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        mask = pa.array(
            [
                hashlib.md5(str(i).encode()).hexdigest()[:8] < threshold
                for i in ids
            ],
            pa.bool_(),
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds: rd.Dataset,
    rates: dict[str, float],
    strata_col: str = "lang",
    default_rate: float = 0.0,
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Per-stratum deterministic sampling — the data-mixing primitive of
    training-corpus assembly (e.g. keep 100% of low-resource languages,
    10% of English). Same md5-threshold rule as ``deterministic_sample``
    but the threshold comes from the row's stratum, so mixture weights
    are exact in expectation, reproducible, and shuffle-free (a plain
    streaming filter; no groupby). Strata absent from ``rates`` use
    ``default_rate``."""
    import hashlib

    thresholds = {s: _hash_threshold(r) for s, r in rates.items()}
    default_thr = _hash_threshold(default_rate)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        strata = batch.column(strata_col).to_pylist()
        mask = pa.array(
            [
                hashlib.md5(str(i).encode()).hexdigest()[:8]
                < thresholds.get(s, default_thr)
                for i, s in zip(ids, strata)
            ],
            pa.bool_(),
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


# --- sequence packing (training-batch assembly) ------------------------------

PACK_BUDGET_TOKENS = 512
PACK_SHARDS = 8


def pack_sequences(
    docs: rd.Dataset,
    budget_tokens: int = PACK_BUDGET_TOKENS,
    n_shards: int = PACK_SHARDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Document-granular contiguous sequence packing for training-batch
    assembly: docs are hash-sharded (``doc_id % n_shards`` — each shard is
    an independent packing stream, the unit of parallelism), ordered by
    doc_id within the shard, and assigned ``pack_id = prefix_tokens //
    budget`` where ``prefix_tokens`` is the exclusive running token count.
    A pack therefore fills until its cumulative quota crosses the budget;
    the straddling doc overflows its pack and the next pack starts at the
    quota line. This contiguous-quota rule is the SHUFFLE-FREE equivalent
    of greedy first-fit (which is order-sequential and cannot scale past
    one stream): the only distributed primitive it needs is
    ``ops.sorted_prefix_sum`` — one range sort plus one integer of carry
    per block boundary, hub shards free.

    Output: (doc_id, shard, n_tokens, pack_id, pack_offset) — pack_offset
    is the doc's start position in its pack's token stream (offsets past
    ``budget_tokens`` mark the overflow doc of each pack).
    """
    import pandas as pd
    import pyarrow.compute as pc

    from graphiti_ray.stages.ops import sorted_prefix_sum

    def tokenize(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch.column(text_col).to_pylist()).fillna("")
        n_tok = texts.str.lower().str.count(r"\w+").astype("int64")
        ids = batch.column(id_col)
        shard = pc.subtract(
            ids, pc.multiply(pc.divide(ids, n_shards), n_shards)
        )  # ids ≥ 0: truncated div reconstructs %, which pyarrow lacks
        return pa.table(
            {
                "doc_id": ids,
                "shard": shard,
                "n_tokens": pa.array(n_tok.to_numpy(), pa.int64()),
            }
        )

    toks = docs.map_batches(tokenize, batch_format="pyarrow", zero_copy_batch=True)
    summed = sorted_prefix_sum(
        toks, by=["shard"], order_cols=["doc_id"], delta_col="n_tokens",
        out_col="cum_tokens",
    )

    def assign(batch: pa.Table) -> pa.Table:
        cum = batch.column("cum_tokens").to_numpy(zero_copy_only=False)
        tok = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        prefix = cum - tok  # exclusive prefix
        pack = prefix // budget_tokens
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shard": batch.column("shard"),
                "n_tokens": batch.column("n_tokens"),
                "pack_id": pa.array(pack, pa.int64()),
                "pack_offset": pa.array(
                    prefix - pack * budget_tokens, pa.int64()
                ),
            }
        )

    return summed.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def temperature_sample(
    ds: rd.Dataset,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> rd.Dataset:
    """Temperature-flattened mixture sampling (the Gopher/XLM-R α-sampling
    rule): keep rate r_s = (n_min / n_s)^(1-α) per stratum, so after
    sampling the stratum sizes follow n_s^α — low-resource strata are kept
    whole, dominant ones are thinned. Two-phase: one vocabulary-sized
    count groupby decides the DATA-DEPENDENT rates, then the same
    shuffle-free md5-threshold filter as ``stratified_sample`` applies
    them. With the default α=0.5 the rate is ``math.sqrt`` — correctly
    rounded per IEEE-754, so the DuckDB oracle's floor(sqrt(...)·16⁸)
    threshold matches bit-for-bit (other α go through pow(), which is
    not cross-library bit-exact — still correct, just not hash-provable).
    """
    import math

    from ray.data.aggregate import Count

    counts = {
        r[strata_col]: int(r["n"])
        for r in ds.groupby(strata_col).aggregate(Count(alias_name="n")).take_all()
    }
    if not counts:
        return ds
    n_min = min(counts.values())
    rates = {}
    for s, n in counts.items():
        ratio = n_min / n
        rates[s] = math.sqrt(ratio) if alpha == 0.5 else ratio ** (1.0 - alpha)
    return stratified_sample(
        ds, rates, strata_col=strata_col, default_rate=0.0, id_col=id_col
    )


def epoch_shuffle_positions(
    ds: rd.Dataset, epoch: int = 1, id_col: str = "doc_id"
) -> rd.Dataset:
    """Deterministic per-epoch global shuffle order — the training-loader
    primitive: position = rank of md5(f"{epoch}|{id}") (ties by id). One
    range sort on the hash, then contiguous 0-based positions via
    ``ops.sorted_prefix_sum`` over a constant partition — the global
    row-number primitive, one integer of carry per block boundary (the
    whole corpus is one 'partition', and that costs nothing more).

    Output: (id, pos)."""
    import hashlib

    import numpy as np

    from graphiti_ray.stages.ops import sorted_prefix_sum

    def hashed(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        hs = [
            hashlib.md5(f"{epoch}|{i}".encode()).hexdigest() for i in ids
        ]
        n = batch.num_rows
        return pa.table(
            {
                id_col: batch.column(id_col),
                "h": pa.array(hs, pa.string()),
                "_k": pa.array(np.zeros(n, np.int64), pa.int64()),
                "_one": pa.array(np.ones(n, np.int64), pa.int64()),
            }
        )

    hashed_ds = ds.map_batches(hashed, batch_format="pyarrow", zero_copy_batch=True)
    summed = sorted_prefix_sum(
        hashed_ds, by=["_k"], order_cols=["h", id_col], delta_col="_one",
        out_col="pos1",
    )

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                id_col: batch.column(id_col),
                "pos": pc.subtract(batch.column("pos1"), 1),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(
    ds: rd.Dataset,
    weight_col: str,
    k: int = 50,
    id_col: str = "doc_id",
    seed: int = 1,
) -> rd.Dataset:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each row draws u ∈ (0,1) from its salted md5 hash
    and scores key = ln(u)/w (the log form of u^(1/w) — same order);
    the k LARGEST keys win. Weighted-mix subset selection that needs no
    global state: one streaming score pass, one k-row sort/limit. The
    score is quantized to the repo's 1e-6 lattice with (hash, id) ties,
    so the SQL twin's ORDER BY matches exactly.

    Output: (id, w, key6) of the k winners."""
    import hashlib

    import numpy as np

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        h = np.array(
            [
                int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:8], 16)
                for i in ids
            ],
            dtype=np.float64,
        )
        u = (h + 1.0) / 4294967296.0  # (0, 1]
        key = np.log(u) / np.maximum(w, 1.0)  # ≤ 0; larger is better
        return pa.table(
            {
                id_col: batch.column(id_col),
                "w": pa.array(w.astype(np.int64), pa.int64()),
                "key6": pa.array(np.rint(key * 1e6).astype(np.int64), pa.int64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(["key6", id_col], descending=[True, False]).limit(k)


def rendezvous_shards(
    ds: rd.Dataset, n_shards: int = 8, id_col: str = "doc_id", seed: int = 1
) -> rd.Dataset:
    """Rendezvous (highest-random-weight) shard assignment: each row goes
    to argmax over shards of md5(f"{seed}|{shard}|{id}") — the
    consistent-placement primitive (adding a shard moves only ~1/(n+1)
    of the keys, unlike mod-N which moves almost all). Pure streaming
    map; scores are uint32 slices of md5 with deterministic ties to the
    smaller shard id.

    Output: (id, shard)."""
    import hashlib

    import numpy as np

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        scores = np.empty((len(ids), n_shards), dtype=np.int64)
        for s in range(n_shards):
            scores[:, s] = [
                int(hashlib.md5(f"{seed}|{s}|{i}".encode()).hexdigest()[:8], 16)
                for i in ids
            ]
        shard = scores.argmax(axis=1).astype(np.int64)  # ties → smaller shard
        return pa.table(
            {
                id_col: batch.column(id_col),
                "shard": pa.array(shard, pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


VOCAB_SIZE = 100
OOV_ID = 0


def encode_documents(
    ds: rd.Dataset,
    vocab_size: int = VOCAB_SIZE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Corpus encoding — the training-prep step that turns text into id
    sequences: a frequency-ranked vocabulary (top ``vocab_size`` tokens,
    ties token-asc; ids 1..V, OOV → 0) is built with the combiner →
    vocabulary-keyed-sum → top-k shape, broadcast once via ``ray.put``
    (vocab is a PARAMETER-sized dict, never corpus-sized), and the
    encode pass streams: (doc_id, pos, token_id) long-form rows.

    Output: (id, pos, token_id)."""
    import re as _re

    import numpy as np
    import ray

    from graphiti_ray.stages.textstats import top_tokens_by_group

    ws = _re.compile(r"\s+", _re.ASCII)

    # reuse the heavy-hitter machinery with one global group
    tagged = ds.map_batches(
        lambda t: t.append_column("_g", pa.array(["_"] * t.num_rows, pa.string())),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    vocab_rows = top_tokens_by_group(
        tagged, k=vocab_size, group_col="_g", text_col=text_col
    ).to_pandas()
    vocab = {
        t: int(r) for t, r in zip(vocab_rows["token"], vocab_rows["rank"])
    }
    ref = ray.put(vocab)

    def encode(batch: pa.Table, _ref=ref) -> pa.Table:
        from graphiti_ray.stages.link import _cached_lut

        v = _cached_lut(_ref)
        ids, pos, tid = [], [], []
        for i, t in zip(
            batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()
        ):
            p = 0
            for tok in ws.split(t or ""):
                if not tok:
                    continue
                ids.append(i)
                pos.append(p)
                tid.append(v.get(tok, OOV_ID))
                p += 1
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "token_id": pa.array(tid, pa.int64()),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def greedy_coverage_select(
    ds: rd.Dataset,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Greedy maximum-coverage corpus selection (the classic 1−1/e
    submodular data-selection baseline — pick the k documents that
    together cover the most distinct vocabulary): round r picks the doc
    with the most coverage units NOT yet covered by rounds 1..r−1, ties
    by doc_id ascending, stopping when the marginal gain reaches 0. The
    coverage unit is the word BIGRAM (adjacent token pair) — a corpus
    vocabulary big enough that greedy runs genuinely multi-round.

    Scale shape: greedy is inherently sequential in k, so the pipeline
    is k streaming passes — each pass computes every doc's marginal gain
    against the BROADCAST covered-token set (vocabulary-sized via
    ``ray.put``) with a per-batch argmax partial, and only one (gain,
    doc_id) candidate per batch reaches the driver-side k-way argmax.
    The SQL twin unrolls the same k rounds. Each batch candidate carries
    its own unit set, so the winner's cover update needs no second
    corpus scan — exactly k passes total.

    Output: (round, doc_id, gain) — gain = newly covered distinct word
    BIGRAMS, round 1-based.
    """
    import re as _re

    import ray

    from graphiti_ray.stages.link import _cached_lut

    ws = _re.compile(r"\s+", _re.ASCII)

    def units(text: str) -> set:
        toks = [x for x in ws.split(text or "") if x]
        return {f"{a} {b}" for a, b in zip(toks, toks[1:])}

    covered: set[str] = set()
    out_rows = []
    for r in range(1, k + 1):
        cov_ref = ray.put(frozenset(covered))

        def gains(batch: pa.Table, _ref=cov_ref) -> pa.Table:
            cov = _cached_lut(_ref)
            best_gain, best_id, best_units = -1, None, None
            for i, t in zip(
                batch.column(id_col).to_pylist(),
                batch.column(text_col).to_pylist(),
            ):
                u = units(t)
                g = len(u - cov)
                if g > best_gain or (g == best_gain and i < best_id):
                    best_gain, best_id, best_units = g, i, u
            if best_id is None:
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "gain": pa.array([], pa.int64()),
                        "units": pa.array([], pa.list_(pa.string())),
                    }
                )
            return pa.table(
                {
                    "doc_id": pa.array([best_id], pa.int64()),
                    "gain": pa.array([best_gain], pa.int64()),
                    "units": pa.array(
                        [sorted(best_units)], pa.list_(pa.string())
                    ),
                }
            )

        cands = ds.map_batches(
            gains, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()
        if not cands:
            break
        win = min(cands, key=lambda c: (-c["gain"], c["doc_id"]))
        if win["gain"] <= 0:  # vocabulary exhausted — greedy stops
            break
        out_rows.append(
            {"round": r, "doc_id": int(win["doc_id"]), "gain": int(win["gain"])}
        )
        covered |= set(win["units"])
    return rd.from_items(out_rows)


def balanced_sample(
    docs: rd.Dataset,
    class_col: str = "lang",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Class-balanced downsampling — the minority-match rebalancing step
    of training-mix preparation: every class keeps exactly n_min docs
    (the size of the smallest class), chosen DETERMINISTICALLY as the
    n_min smallest md5(doc_id) keys per class (the repo's
    reproducible-"random" convention; same subset on every run/engine).

    Shape: one parameter-sized class-count aggregate → one
    ``window_rank`` range sort on (class, md5key, id) → rank ≤ n_min
    filter. Hub classes cost only the sort.

    Output: (id, class) for the kept docs.
    """
    import hashlib

    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from graphiti_ray.stages.ops import window_rank

    counts = (
        docs.groupby(class_col).aggregate(Count(alias_name="c")).take_all()
    )
    if not counts:
        return rd.from_items([])
    n_min = min(int(r["c"]) for r in counts)

    def add_key(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        k = [
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) for i in ids
        ]
        return pa.table(
            {
                id_col: t.column(id_col),
                class_col: t.column(class_col),
                "mk": pa.array(k, pa.int64()),
            }
        )

    keyed = docs.select_columns([id_col, class_col]).map_batches(
        add_key, batch_format="pyarrow", zero_copy_batch=True
    )
    ranked = window_rank(keyed, [class_col], ["mk", id_col])
    return ranked.map_batches(
        lambda t, _n=n_min: t.filter(
            pc.less_equal(t.column("rank"), _n)
        ).select([id_col, class_col]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def training_mix(
    docs: rd.Dataset,
    class_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """The end-to-end training-mix composite (the docs-side flagship,
    mirroring web_pipeline's composition proof): exact dedup winners →
    class-balanced downsampling → deterministic 80/10/10 split — each
    stage the already-oracle-proven operator, chained.

    Output: (id, class, split)."""
    import hashlib

    import pyarrow.compute as pc
    import ray

    from graphiti_ray.stages.dedup import exact_dedup_documents
    from graphiti_ray.stages.link import _cached_lut

    winners = exact_dedup_documents(docs, text_col=text_col, id_col=id_col)
    keep = pa.concat_arrays(
        [
            b.column("keep_id").combine_chunks().cast(pa.int64())
            for b in winners.select_columns(["keep_id"]).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        ]
    )
    kref = ray.put(keep)
    deduped = docs.select_columns([id_col, class_col]).map_batches(
        lambda t, _r=kref: t.filter(
            pc.is_in(t.column(id_col), value_set=_cached_lut(_r))
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    balanced = balanced_sample(deduped, class_col=class_col, id_col=id_col)

    def assign(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_pylist()
        splits = []
        for i in ids:
            h = hashlib.md5(str(i).encode()).hexdigest()[:8]
            splits.append(
                "train" if h < "cc000000" else ("val" if h < "e6000000" else "test")
            )
        return t.append_column("split", pa.array(splits, pa.string()))

    return balanced.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


def ccnet_buckets(
    docs: rd.Dataset,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2019
    §4.3 — the quality tiers Common Crawl corpora actually ship in): score
    every doc with the corpus-trained bigram LM
    (:func:`~graphiti_ray.stages.textstats.bigram_lm_scores`), then split
    the corpus into ``n_buckets`` equal tiles by average log-prob — head
    = best (highest avg logp / lowest perplexity), tail = worst.

    Exactness: the per-doc ordering key is the INTEGER round-half-away
    lattice ``avg_lp6 = rha(sum_lp6 / n_bigrams)`` (the docs_lm_score
    convention), so the (avg_lp6 desc, doc_id) total order — and hence
    every tile boundary — is bit-identical to the SQL twin's
    ``NTILE(n) OVER (ORDER BY avg_lp6 DESC, doc_id)``. One extra range
    sort on top of the LM scoring; docs with < 2 tokens emit nothing
    (no bigrams, no score), exactly like the scorer.

    Output: (doc_id, n_bigrams, avg_lp6, tile, bucket) with bucket in
    head/middle/tail for n_buckets=3, "b<tile>" otherwise.
    """
    import numpy as np
    import pyarrow.compute as pc

    from graphiti_ray.stages.ops import window_ntile
    from graphiti_ray.stages.textstats import bigram_lm_scores

    scores = bigram_lm_scores(docs, text_col=text_col, id_col=id_col)

    def prep(t: pa.Table) -> pa.Table:
        s = t.column("sum_lp6").to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("n_bigrams").to_numpy(zero_copy_only=False).astype(np.int64)
        # round-half-away-from-zero of sum/n in exact integer arithmetic
        m6 = np.where(
            s < 0, -((-2 * s + n) // (2 * n)), (2 * s + n) // (2 * n)
        ).astype(np.int64)
        return pa.table(
            {
                "_g": pa.array(np.zeros(len(s), np.int64)),
                id_col: t.column(id_col),
                "n_bigrams": t.column("n_bigrams"),
                "avg_lp6": pa.array(m6, pa.int64()),
                "neg_lp6": pa.array(-m6, pa.int64()),
            }
        )

    tiled = window_ntile(
        scores.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True),
        ["_g"],
        ["neg_lp6", id_col],
        n_buckets,
    )

    names = (
        {1: "head", 2: "middle", 3: "tail"}
        if n_buckets == 3
        else {i: f"b{i}" for i in range(1, n_buckets + 1)}
    )

    def finish(t: pa.Table) -> pa.Table:
        tiles = t.column("tile").to_pylist()
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_bigrams": pc.cast(t.column("n_bigrams"), pa.int64()),
                "avg_lp6": t.column("avg_lp6"),
                "tile": pc.cast(t.column("tile"), pa.int64()),
                "bucket": pa.array([names[x] for x in tiles], pa.string()),
            }
        )

    return tiled.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def source_epochs(
    docs: rd.Dataset,
    budget_multiplier: int = 2,
    text_col: str = "text",
    source_col: str = "source",
) -> rd.Dataset:
    """Training-mix epoch planning per source (the LLaMA-1 Table-1 /
    DoReMi-lite question: given a total token budget, how many EPOCHS of
    each source does its mixture weight imply?). Weights follow the
    sqrt-of-size heuristic — up-weights small high-value sources less
    brutally than uniform, on the exact integer lattice so the SQL twin
    replays every division:

        sqrt6        = rint(sqrt(n_tokens) · 1e6)
        weight_ppm   = (sqrt6 · 1e6) // Σ sqrt6
        budget       = budget_multiplier · Σ n_tokens   (total tokens)
        budget_tokens= (budget · weight_ppm) // 1e6     (per source)
        epochs_e6    = (budget_tokens · 1e6) // n_tokens

    Shape: one per-batch (source, docs, whitespace-token) combiner → one
    |sources|-row keyed sum; the finish arithmetic runs over that
    parameter-sized table. Output: (source, n_docs, n_tokens, sqrt6,
    weight_ppm, budget_tokens, epochs_e6) sorted by source.
    """
    import re as _re

    import numpy as np
    from ray.data.aggregate import Sum

    ws = _re.compile(r"\s+")

    def partial(batch: pa.Table) -> pa.Table:
        srcs = batch.column(source_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        agg: dict[str, list[int]] = {}
        for s, t in zip(srcs, texts):
            n_tok = sum(1 for x in ws.split(t or "") if x)
            row = agg.setdefault(s, [0, 0])
            row[0] += 1
            row[1] += n_tok
        keys = sorted(agg)
        return pa.table(
            {
                source_col: pa.array(keys, pa.string()),
                "n_docs": pa.array([agg[k][0] for k in keys], pa.int64()),
                "n_tokens": pa.array([agg[k][1] for k in keys], pa.int64()),
            }
        )

    per_source = (
        docs.select_columns([source_col, text_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(source_col)
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
        .take_all()  # |sources| rows — parameter-sized by definition
    )
    rows = sorted(per_source, key=lambda r: r[source_col])
    n_tok = np.array([int(r["n_tokens"]) for r in rows], dtype=np.int64)
    sqrt6 = np.rint(np.sqrt(n_tok.astype(np.float64)) * 1e6).astype(np.int64)
    ss = int(sqrt6.sum())
    budget = budget_multiplier * int(n_tok.sum())
    w_ppm = (sqrt6 * 1_000_000) // ss
    b_tok = (budget * w_ppm) // 1_000_000
    epochs = (b_tok * 1_000_000) // n_tok
    return rd.from_arrow(
        pa.table(
            {
                source_col: pa.array([r[source_col] for r in rows], pa.string()),
                "n_docs": pa.array(
                    [int(r["n_docs"]) for r in rows], pa.int64()
                ),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "sqrt6": pa.array(sqrt6, pa.int64()),
                "weight_ppm": pa.array(w_ppm, pa.int64()),
                "budget_tokens": pa.array(b_tok, pa.int64()),
                "epochs_e6": pa.array(epochs, pa.int64()),
            }
        )
    )
