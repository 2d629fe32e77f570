"""Graph-structural operators over the materialized edge table (SURVEY §2.8).

- ``node_degrees``        per-entity incident-edge counts (G3 shape)
- ``bfs_frontier``        depth-bounded BFS via iterative hash joins (G1,
                          edge_bfs_search/node_bfs_search
                          search_utils.py:272-324,427-463, MAX_DEPTH=3)
- ``node_distances``      shortest-path hops from a center node (G2,
                          search_utils.py:912-916) — bounded BFS rounds
- ``label_propagation``   community detection (A4,
                          community_operations.py:79-125): each node adopts
                          the plurality community among neighbors
                          (edge-count weighted, ties → larger id) until
                          fixpoint
- ``build_communities``   communities + HAS_MEMBER edges + deterministic
                          tree-reduced summaries (A5,
                          community_operations.py:154-193 — pairwise merge,
                          here a deterministic concat-merge instead of LLM)

Iteration is driver-orchestrated bounded rounds (Ray Data has no native
loops); each round is one keyed shuffle. Edge lists are symmetrized once
up front.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from graphiti_ray.functions.text import md5_hex


def ensure_schema(ds: rd.Dataset, schema: pa.Schema) -> rd.Dataset:
    """Coerce every block to an explicit Arrow schema.

    pandas ``map_groups`` outputs can contain schema-less empty blocks;
    feeding those into ``Dataset.join`` makes the per-partition pyarrow
    join fail with "No match for key field". This pass rebuilds each batch
    (including empties) with the pinned schema."""

    def coerce(df: pd.DataFrame) -> pa.Table:
        cols = {}
        for f in schema:
            if f.name in df.columns:
                cols[f.name] = pa.array(df[f.name], f.type)
            else:
                cols[f.name] = pa.array([None] * len(df), f.type)
        return pa.table(cols)

    return ds.map_batches(coerce, batch_format="pandas")


def _symmetric(edges: rd.Dataset, src="subj_uuid", dst="obj_uuid") -> rd.Dataset:
    def sym(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": pa.concat_arrays(
                    [batch.column(src).combine_chunks(), batch.column(dst).combine_chunks()]
                ),
                "y": pa.concat_arrays(
                    [batch.column(dst).combine_chunks(), batch.column(src).combine_chunks()]
                ),
            }
        )

    return edges.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)


def node_degrees(edges: rd.Dataset, src="subj_uuid", dst="obj_uuid") -> rd.Dataset:
    """(entity_uuid, degree): incident edge count, both directions.
    Pre-aggregated per batch before the keyed shuffle."""
    sym = _symmetric(edges, src, dst)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["x"]).aggregate([([], "count_all")])
        return t.rename_columns(["entity_uuid", "p_n"])

    return (
        sym.map_batches(partial, batch_format="pyarrow")
        .groupby("entity_uuid")
        .aggregate(Sum("p_n", alias_name="degree"))
    )


def bfs_frontier(
    edges: rd.Dataset,
    origin_uuids: list[str],
    max_depth: int = 3,
    src="subj_uuid",
    dst="obj_uuid",
) -> pd.DataFrame:
    """Nodes reachable within max_depth hops: (entity_uuid, depth).

    Frontier expansion via broadcast membership filter per round — the
    frontier is small relative to the edge table, so each round is one
    streaming pass over edges, no all-to-all. Returns a pandas frame
    (result is frontier-sized)."""
    sym = _symmetric(edges, src, dst).materialize()
    dist: dict[str, int] = {u: 0 for u in origin_uuids}
    frontier = set(origin_uuids)
    for depth in range(1, max_depth + 1):
        if not frontier:
            break
        import ray

        fref = ray.put(frontier)

        class Step:
            def __init__(self, ref):
                import ray as _r

                self.frontier = pa.array(sorted(_r.get(ref)), pa.string())

            def __call__(self, batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                mask = pc.is_in(batch.column("x"), value_set=self.frontier)
                nxt = pc.unique(batch.column("y").filter(mask).combine_chunks())
                return pa.table({"y": nxt})

        reached = sym.map_batches(
            Step, fn_constructor_args=(fref,), batch_format="pyarrow",
            concurrency=(1, 4),
        ).to_pandas()
        nxt = {y for y in reached["y"] if y not in dist}
        for y in nxt:
            dist[y] = depth
        frontier = nxt
    return pd.DataFrame(
        sorted(dist.items()), columns=["entity_uuid", "depth"]
    )


def node_distances(
    edges: rd.Dataset, center_uuid: str, max_depth: int = 3
) -> pd.DataFrame:
    """Hop distance from a center node (node_distance reranker input)."""
    return bfs_frontier(edges, [center_uuid], max_depth)


def _vote_block(tbl: pa.Table) -> pa.Table:
    """Vectorized plurality vote over COMPLETE node runs (sorted_run_map
    contract: rows sorted by (x, nbr_comm)). One Python call per BLOCK —
    the former per-node ``map_groups(vote)`` paid a Python dispatch per
    node PER ROUND. reduceat sums weights per (node, community) segment;
    winner selection (max weight, ties → larger community id) is one
    pandas sort + drop_duplicates, both C-level."""
    import numpy as np

    empty = pa.table(
        {
            "node": pa.array([], pa.string()),
            "community": pa.array([], pa.string()),
            "changed": pa.array([], pa.int64()),
        }
    )
    if tbl.num_rows == 0:
        return empty
    import pyarrow.compute as pc

    from graphiti_ray.stages.ops import _table_run_starts

    xa, ca = tbl.column("x"), tbl.column("nbr_comm")
    w = tbl.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
    # current label per node: the zero-weight self row (one per node)
    self_mask = pa.array(w == 0)
    old = pd.Series(
        pc.filter(ca, self_mask).to_numpy(zero_copy_only=False),
        index=pc.filter(xa, self_mask).to_numpy(zero_copy_only=False),
    )
    # per-(node, community) weight segments — Arrow-native run detection
    seg_starts = _table_run_starts(tbl, ["x", "nbr_comm"])[:-1]
    seg_sum = np.add.reduceat(w, seg_starts)
    idx = pa.array(seg_starts, pa.int64())
    seg = pd.DataFrame(
        {
            "x": xa.take(idx).to_numpy(zero_copy_only=False),
            "comm": ca.take(idx).to_numpy(zero_copy_only=False),
            "w": seg_sum,
        }
    )
    # the reference tallies REAL neighbor rows only; a community present
    # solely via the zero-weight self row (sum 0) never wins
    seg = seg[seg["w"] > 0]
    # winner per node: max weight, ties → LARGER community id — ascending
    # sort on (w, comm) then keep the last row per node
    seg = seg.sort_values(["x", "w", "comm"], kind="mergesort")
    win = seg.drop_duplicates("x", keep="last").set_index("x")
    # a node with no real neighbor rows keeps its current label (defensive:
    # the join guarantees ≥1 real row per labeled node)
    winners = win["comm"].reindex(old.index.union(win.index))
    winners = winners.fillna(old.reindex(winners.index))
    changed = (winners != old.reindex(winners.index)).astype("int64")
    return pa.table(
        {
            "node": pa.array(winners.index.to_numpy(), pa.string()),
            "community": pa.array(winners.to_numpy(), pa.string()),
            "changed": pa.array(changed.to_numpy(), pa.int64()),
        }
    )


def label_propagation(
    edges: rd.Dataset,
    max_rounds: int = 10,
    src="subj_uuid",
    dst="obj_uuid",
) -> rd.Dataset:
    """(entity_uuid, community): plurality-neighbor label propagation.

    Reference semantics (community_operations.py:79-125): each node adopts
    the most frequent community among its neighbors, weighted by edge
    count; ties break to the LARGER community id; iterate to fixpoint.
    Labels are the md5 uuids; initial community = own uuid.

    Convergence is a DATASET-side changed-count: each node's current label
    rides into the vote groupby as a zero-weight row, so the vote emits a
    ``changed`` flag and one ``sum`` aggregate decides the fixpoint —
    labels never materialize on the driver (the per-round ``to_pandas``
    was round 1's scale bug).
    """
    sym = _symmetric(edges, src, dst)
    # neighbor multiplicity: (x, y, w)
    weights = (
        sym.groupby(["x", "y"]).aggregate(Count(alias_name="w")).materialize()
    )
    labels = weights.groupby("x").aggregate(Min("y", alias_name="_drop")).map_batches(
        lambda t: pa.table(
            {"node": t.column("x"), "community": t.column("x")}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(max_rounds):
        # NOTE: same-name join keys on both sides — ray 2.49's hash-shuffle
        # join mis-resolves differing right_on names at finalize
        from graphiti_ray.stages.link import default_join_partitions, safe_join

        lab = labels.rename_columns({"node": "y", "community": "nbr_comm"})
        msgs = safe_join(
            weights, lab, join_type="inner", num_partitions=default_join_partitions(), on=("y",)
        ).select_columns(["x", "nbr_comm", "w"])
        # each node's own current label as a zero-weight row (never wins a
        # tally; lets the vote detect change without a driver diff)
        own = labels.map_batches(
            lambda t: pa.table(
                {
                    "x": t.column("node"),
                    "nbr_comm": t.column("community"),
                    "w": pa.array([0] * t.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        msgs = msgs.map_batches(lambda t: t, batch_format="pyarrow").union(own)

        from graphiti_ray.stages.ops import sorted_run_map

        new_labels = sorted_run_map(
            msgs,
            key_cols=["x"],
            order_cols=["nbr_comm"],
            block_fn=_vote_block,
            carry_cap=65536,  # rows per node ≤ distinct neighbor communities
        ).materialize()
        n_changed = new_labels.sum("changed")
        labels = new_labels.drop_columns(["changed"]).materialize()
        if not n_changed:
            break
    return labels


def build_communities(
    nodes: rd.Dataset, edges: rd.Dataset, max_rounds: int = 10
) -> dict[str, rd.Dataset]:
    """CommunityNode + HAS_MEMBER tables (community_operations.py:128-193).

    Summaries are deterministic tree-reductions: member summaries are
    pairwise concat-merged in sorted order, halving until one remains —
    the same reduction shape as the reference's LLM summarizer (A5), with
    a pure merge function.
    """
    comm = label_propagation(edges, max_rounds=max_rounds)
    members = comm.rename_columns({"node": "entity_uuid"})

    # rename via an arrow map: ray 2.49's Project rename fails on pandas
    # blocks ('DataFrame' has no attribute 'rename_columns')
    node_info = nodes.select_columns(
        ["uuid", "name", "group_id", "summary"]
    ).map_batches(
        lambda t: t.rename_columns(["entity_uuid", "name", "group_id", "summary"]),
        batch_format="pyarrow",
    )
    from graphiti_ray.stages.link import default_join_partitions, safe_join

    joined = safe_join(
        members, node_info, join_type="inner", num_partitions=default_join_partitions(), on=("entity_uuid",)
    )

    def community_block(tbl: pa.Table) -> pa.Table:
        """COMPLETE community runs (sorted_run_map contract, rows sorted by
        (community, name)): one Python call per BLOCK of communities; the
        per-run work is the A5 tree reduction itself."""
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "uuid": pa.array([], pa.string()),
                    "name": pa.array([], pa.string()),
                    "group_id": pa.array([], pa.string()),
                    "summary": pa.array([], pa.string()),
                    "n_members": pa.array([], pa.int64()),
                }
            )
        from graphiti_ray.stages.ops import _table_run_starts

        comm = tbl.column("community").to_pylist()
        names = tbl.column("name").to_pylist()
        summaries = tbl.column("summary").to_pylist()
        groups = tbl.column("group_id").to_pylist()
        starts = _table_run_starts(tbl, ["community"])
        uuids, out_names, out_groups, out_sums, counts = [], [], [], [], []
        for s, e in zip(starts[:-1], starts[1:]):
            # pairwise tree reduction of member summaries (A5 shape)
            level = sorted(summaries[s:e])
            while len(level) > 1:
                level = [
                    level[i] if i + 1 >= len(level) else f"{level[i]} | {level[i+1]}"
                    for i in range(0, len(level), 2)
                ]
            uuids.append(md5_hex(f"community|{comm[s]}"))
            out_names.append(f"Community of {names[s]}")  # names sorted in-run
            out_groups.append(groups[s])
            out_sums.append(level[0] if level else "")
            counts.append(e - s)
        return pa.table(
            {
                "uuid": pa.array(uuids, pa.string()),
                "name": pa.array(out_names, pa.string()),
                "group_id": pa.array(out_groups, pa.string()),
                "summary": pa.array(out_sums, pa.string()),
                "n_members": pa.array(counts, pa.int64()),
            }
        )

    from graphiti_ray.stages.ops import sorted_run_map

    communities = sorted_run_map(
        joined.select_columns(["community", "name", "group_id", "summary"]),
        key_cols=["community"],
        order_cols=["name"],
        block_fn=community_block,
    )

    def member_edges(batch: pa.Table) -> pa.Table:
        comms = batch.column("community").to_pylist()
        ents = batch.column("entity_uuid").to_pylist()
        return pa.table(
            {
                "uuid": pa.array(
                    [md5_hex(f"hm|{c}|{e}") for c, e in zip(comms, ents)], pa.string()
                ),
                "community_uuid": pa.array(
                    [md5_hex(f"community|{c}") for c in comms], pa.string()
                ),
                "entity_uuid": pa.array(ents, pa.string()),
                "group_id": batch.column("group_id"),
            }
        )

    # group_id rides on HAS_MEMBER so incremental updates can swap the
    # affected groups' membership rows (edges.py:374-388 + group_id field)
    has_member = joined.map_batches(member_edges, batch_format="pyarrow")
    return {"communities": communities, "community_edges": has_member}


def pagerank(
    edges: rd.Dataset,
    damping: float = 0.85,
    rounds: int = 5,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
    seeds: list[str] | None = None,
    weight: str | None = None,
) -> rd.Dataset:
    """Simplified PageRank over the directed edge list: fixed round count
    (so a SQL twin can unroll the recurrence), uniform 1/N start, and
    NO dangling-mass redistribution — rank flowing into sink nodes
    evaporates, the standard simplification when the twin must stay a
    pure per-round join+sum. Multi-edges contribute once per edge row.

    Per round (all dataset-side): contributions = edge ⋈ ranks on src
    (pr / outdeg per edge row) UNION a zero row per node (so sinks and
    isolated nodes survive the groupby without an outer join), one
    sum-groupby on dst, then rank = (1-d)/N + d·acc. Two shuffles per
    round — the same iterative shape as label_propagation.

    ``seeds`` switches on PERSONALIZED PageRank (topic-sensitive, Haveliwala
    2002): teleport mass goes only to the seed nodes present in the graph
    (|S| of them) — start 1/|S| on seeds else 0, per round
    rank = d·acc + (1-d)/|S|·1_S. The seed list is a driver-side constant
    (a topic whitelist, a trusted-host set) broadcast into each batch via
    ``pc.is_in`` — no join; everything else is the same kernel, so the SQL
    twin reuses the same unrolled chain with a seed indicator.
    """
    import numpy as np

    from graphiti_ray.stages.link import default_join_partitions, safe_join
    from graphiti_ray.stages.ops import distinct_by_key

    # endpoints via the module's shared symmetric flattening
    nodes = distinct_by_key(
        _symmetric(edges, src, dst).map_batches(
            lambda t: pa.table({"node": t.column("x")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "node",
    ).materialize()
    n = nodes.count()
    seed_arr = (
        pa.array(sorted(set(seeds)), pa.string()) if seeds is not None else None
    )
    if seed_arr is not None:
        n = nodes.map_batches(
            lambda t, _s=seed_arr: t.filter(pc.is_in(t.column("node"), _s)),
            batch_format="pyarrow",
        ).count()  # |S ∩ graph|: teleport mass only lands on present seeds
    if n == 0:  # empty graph / no present seed → empty ranking
        return rd.from_arrow(
            pa.table(
                {
                    "entity_uuid": pa.array([], pa.string()),
                    "rank": pa.array([], pa.float64()),
                }
            )
        )
    base = (1.0 - damping) / n

    # ``weight``: WEIGHTED PageRank — contributions split by edge weight
    # (pr·w / Σ_out w) instead of uniformly by out-degree; the host link
    # graph's n_links column is the canonical weight. weight=None keeps
    # the classic kernel byte-identical.
    if weight is None:
        outdeg = edges.groupby(src).aggregate(Count(alias_name="od"))
        edge_cols = edges.select_columns([src, dst]).map_batches(
            lambda t: t.rename_columns(["s", "t"]), batch_format="pyarrow"
        )
    else:
        outdeg = edges.groupby(src).aggregate(Sum(weight, alias_name="od"))
        edge_cols = edges.select_columns([src, dst, weight]).map_batches(
            lambda t: t.rename_columns(["s", "t", "w"]), batch_format="pyarrow"
        )
    msgs = safe_join(
        edge_cols,
        outdeg.map_batches(
            lambda t: t.rename_columns(["s", "od"]), batch_format="pyarrow"
        ),
        join_type="inner",
        num_partitions=default_join_partitions(),
        on=("s",),
    ).materialize()

    def _init_pr(t: pa.Table, _p=1.0 / n, _s=seed_arr) -> pa.Table:
        if _s is None:
            pr = np.full(t.num_rows, _p)
        else:
            mask = pc.is_in(t.column("node"), _s).to_numpy(
                zero_copy_only=False
            )
            pr = np.where(mask, _p, 0.0)
        return t.append_column("pr", pa.array(pr, pa.float64()))

    ranks = nodes.map_batches(_init_pr, batch_format="pyarrow").materialize()

    zero_rows = nodes.map_batches(
        lambda t: t.append_column(
            "contrib", pa.array(np.zeros(t.num_rows), pa.float64())
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(rounds):
        joined = safe_join(
            msgs,
            ranks.map_batches(
                lambda t: t.rename_columns(["s", "pr"]), batch_format="pyarrow"
            ),
            join_type="inner",
            num_partitions=default_join_partitions(),
            on=("s",),
        )
        def _contrib(t: pa.Table, _w=weight) -> pa.Table:
            num = t.column("pr").to_numpy(zero_copy_only=False)
            if _w is not None:
                num = num * t.column("w").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": t.column("t"),
                    "contrib": pa.array(
                        num / t.column("od").to_numpy(zero_copy_only=False),
                        pa.float64(),
                    ),
                }
            )

        contribs = joined.map_batches(
            _contrib, batch_format="pyarrow"
        ).union(zero_rows)
        def _finish_round(
            t: pa.Table, _b=base, _d=damping, _s=seed_arr
        ) -> pa.Table:
            acc = t.column("acc").to_numpy(zero_copy_only=False)
            if _s is None:
                pr = _b + _d * acc
            else:
                mask = pc.is_in(t.column("node"), _s).to_numpy(
                    zero_copy_only=False
                )
                pr = np.where(mask, _b, 0.0) + _d * acc
            return pa.table(
                {
                    "node": t.column("node"),
                    "pr": pa.array(pr, pa.float64()),
                }
            )

        ranks = (
            contribs.groupby("node")
            .aggregate(Sum("contrib", alias_name="acc"))
            .map_batches(_finish_round, batch_format="pyarrow")
            .materialize()
        )
    return ranks.map_batches(
        lambda t: pa.table(
            {"entity_uuid": t.column("node"), "rank": t.column("pr")}
        ),
        batch_format="pyarrow",
    )


def reciprocity_moments(
    edges: rd.Dataset,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
) -> rd.Dataset:
    """Link reciprocity sufficient statistics (Garlaschelli & Loffredo
    2004) over the directed DISTINCT edge set, self-loops excluded:
    one row (n_edges, n_recip) — the reciprocity ratio r = n_recip/n_edges
    is a driver-side division kept off the value hash (oracle convention:
    emit exact integer moments). n_recip counts ordered edges whose
    reverse also exists (so a mutual pair contributes 2). Shape: one
    distinct pass + one distinct set-intersection — two narrow shuffles
    on (s, t) pairs, nothing wider."""
    from graphiti_ray.stages.ops import dataset_intersect

    def norm(t: pa.Table) -> pa.Table:
        out = pa.table({"s": t.column(src), "t": t.column(dst)})
        return out.filter(pc.invert(pc.equal(out.column("s"), out.column("t"))))

    e = edges.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
    # distinct via the set-op machinery (intersect with itself dedups)
    e_dist = dataset_intersect(e, e, ["s", "t"]).materialize()
    rev = e_dist.map_batches(
        lambda t: pa.table({"s": t.column("t"), "t": t.column("s")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    n_edges = e_dist.count()
    n_recip = dataset_intersect(e_dist, rev, ["s", "t"]).count()
    return rd.from_arrow(
        pa.table(
            {
                "n_edges": pa.array([n_edges], pa.int64()),
                "n_recip": pa.array([n_recip], pa.int64()),
            }
        )
    )


def harmonic_centrality(
    edges: rd.Dataset,
    seeds: list[str],
    max_depth: int = 6,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
) -> rd.Dataset:
    """Seed-set harmonic centrality (Boldi & Vigna 2014, seed-restricted —
    the web-graph centrality that, unlike closeness, is defined on
    disconnected graphs): hc(v) = Σ_{s ∈ S, 0 < d(s,v) ≤ max_depth} 1/d(s,v)
    with directed forward BFS distances, emitted on the exact integer
    lattice ``hc_e6 = Σ 1_000_000 // d`` so the SQL twin (a bounded
    recursive CTE per seed) hashes bit-for-bit.

    Dataset-side layered BFS over (seed, node) pairs — the frontier and
    visited sets are Datasets (|S|·|V| worst case), never driver
    residents: per round one hash join frontier⋈edges, one distinct set
    difference against visited (``ops.dataset_except``), and a
    vocabulary-sized count per newly-reached node. Rounds are bounded by
    ``max_depth`` (contributions beyond it are < 1/max_depth each and cut
    off, as the docstring twin documents)."""
    from ray.data.aggregate import Count

    from graphiti_ray.stages.link import default_join_partitions, safe_join
    from graphiti_ray.stages.ops import dataset_except

    e = edges.select_columns([src, dst]).map_batches(
        lambda t: t.rename_columns(["node", "nxt"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    seed_tbl = pa.table(
        {
            "seed": pa.array(sorted(set(seeds)), pa.string()),
            "node": pa.array(sorted(set(seeds)), pa.string()),
        }
    )
    frontier = rd.from_arrow(seed_tbl).materialize()
    visited = frontier
    partials: list[rd.Dataset] = []
    for depth in range(1, max_depth + 1):
        stepped = safe_join(
            frontier,
            e,
            join_type="inner",
            num_partitions=default_join_partitions(),
            on=("node",),
        ).map_batches(
            lambda t: pa.table(
                {"seed": t.column("seed"), "node": t.column("nxt")}
            ),
            batch_format="pyarrow",
        )
        fresh = dataset_except(stepped, visited, ["seed", "node"]).materialize()
        if fresh.count() == 0:
            break
        visited = visited.union(fresh).materialize()
        frontier = fresh
        contrib = 1_000_000 // depth
        partials.append(
            fresh.groupby("node")
            .aggregate(Count(alias_name="n_seeds"))
            .map_batches(
                lambda t, _c=contrib: pa.table(
                    {
                        "node": t.column("node"),
                        "hc_e6": pc.multiply(
                            pc.cast(t.column("n_seeds"), pa.int64()), _c
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        )
    if not partials:
        return rd.from_arrow(
            pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "hc_e6": pa.array([], pa.int64()),
                }
            )
        )
    acc = partials[0]
    for p in partials[1:]:
        acc = acc.union(p)
    return (
        acc.groupby("node")
        .aggregate(Sum("hc_e6", alias_name="hc_e6"))
        .map_batches(
            lambda t: pa.table(
                {"host": t.column("node"), "hc_e6": t.column("hc_e6")}
            ),
            batch_format="pyarrow",
        )
    )


def hits(
    edges: rd.Dataset,
    rounds: int = 4,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
) -> rd.Dataset:
    """HITS hubs & authorities (Kleinberg 1999) over the directed edge
    list, fixed round count with per-round L1 normalization so a SQL twin
    can unroll the recurrence and magnitudes stay bounded near 1/N
    (unnormalized HITS grows exponentially, which would push the two
    engines' ~1e-15 sum-order differences past the round(6) compare —
    the pagerank convention, stated there, extended with a scalar-sum
    normalizer per half-round).

    Per round: authority(t) = Σ_{s→t} hub(s), normalized by Σ authority;
    then hub(s) = Σ_{s→t} authority(t), normalized by Σ hub. Uniform 1/N
    start; nodes with no in-edges (resp. out-edges) keep score 0 via the
    zero-row union, never an outer join. Two joins + two groupbys + two
    scalar reduces per round — the same dataset-side iterative shape as
    :func:`pagerank`. Multi-edges contribute once per edge row.

    Output: (entity_uuid, hub, authority) after ``rounds`` rounds.
    """
    import numpy as np

    from graphiti_ray.stages.link import default_join_partitions, safe_join
    from graphiti_ray.stages.ops import distinct_by_key

    nodes = distinct_by_key(
        _symmetric(edges, src, dst).map_batches(
            lambda t: pa.table({"node": t.column("x")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "node",
    ).materialize()
    n = nodes.count()
    if n == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "entity_uuid": pa.array([], pa.string()),
                    "hub": pa.array([], pa.float64()),
                    "authority": pa.array([], pa.float64()),
                }
            )
        )

    e = edges.select_columns([src, dst]).map_batches(
        lambda t: t.rename_columns(["s", "t"]), batch_format="pyarrow"
    ).materialize()
    nparts = default_join_partitions()

    def _zero(col: str) -> rd.Dataset:
        return nodes.map_batches(
            lambda t, _c=col: pa.table(
                {
                    "node": t.column("node"),
                    _c: pa.array(np.zeros(t.num_rows), pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )

    zero_rows = _zero("v").materialize()

    def _push(scores: rd.Dataset, score_col: str, join_key: str, out_key: str):
        """One half-round: join scores onto edges at ``join_key``, sum the
        pushed mass at ``out_key``, L1-normalize by the global sum."""
        joined = safe_join(
            e,
            scores.map_batches(
                lambda t, _k=join_key: t.rename_columns([_k, "sc"]),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=nparts,
            on=(join_key,),
        )
        contrib = joined.map_batches(
            lambda t, _o=out_key: pa.table(
                {"node": t.column(_o), "v": t.column("sc")}
            ),
            batch_format="pyarrow",
        ).union(zero_rows)
        acc = contrib.groupby("node").aggregate(Sum("v", alias_name="acc")).materialize()
        total = float(acc.sum("acc"))
        norm = total if total != 0.0 else 1.0
        return acc.map_batches(
            lambda t, _n=norm: pa.table(
                {
                    "node": t.column("node"),
                    "sc": pa.array(
                        t.column("acc").to_numpy(zero_copy_only=False) / _n,
                        pa.float64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    hub = nodes.map_batches(
        lambda t, _p=1.0 / n: t.append_column(
            "sc", pa.array(np.full(t.num_rows, _p), pa.float64())
        ),
        batch_format="pyarrow",
    ).materialize()
    auth = hub
    for _ in range(rounds):
        auth = _push(hub, "sc", "s", "t")  # authority ← hubs pointing in
        hub = _push(auth, "sc", "t", "s")  # hub ← authorities pointed at

    merged = safe_join(
        hub.map_batches(
            lambda t: t.rename_columns(["node", "hub"]), batch_format="pyarrow"
        ),
        auth.map_batches(
            lambda t: t.rename_columns(["node", "authority"]),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=nparts,
        on=("node",),
    )
    return merged.map_batches(
        lambda t: pa.table(
            {
                "entity_uuid": t.column("node"),
                "hub": t.column("hub"),
                "authority": t.column("authority"),
            }
        ),
        batch_format="pyarrow",
    )


def salsa(
    edges: rd.Dataset,
    rounds: int = 4,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
) -> rd.Dataset:
    """SALSA (Lempel & Moran 2000) — the stochastic cousin of HITS used
    by web/social link analysis (e.g. Twitter's who-to-follow): each push
    is DEGREE-NORMALIZED, i.e. a random-walk transition, so within a
    component authorities converge toward indegree-proportional mass
    instead of HITS's principal-eigenvector concentration.

    Per round: authority(t) = Σ_{s→t} hub(s)/outdeg(s), then
    hub(s) = Σ_{s→t} authority(t)/indeg(t); uniform 1/N start, L1
    normalization per half-round (the :func:`hits` convention — mass is
    already conserved by the stochastic transition, the normalizer only
    guards the all-zero component case and float drift). Degrees count
    edge ROWS (multi-edges weight the walk, as in the reference
    multigraph). Same dataset-side shape as :func:`hits`: degrees joined
    onto the edge table once, then two joins + two groupbys per round.

    Output: (entity_uuid, hub, authority) after ``rounds`` rounds.
    """
    import numpy as np

    from graphiti_ray.stages.link import default_join_partitions, safe_join
    from graphiti_ray.stages.ops import distinct_by_key

    nodes = distinct_by_key(
        _symmetric(edges, src, dst).map_batches(
            lambda t: pa.table({"node": t.column("x")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "node",
    ).materialize()
    n = nodes.count()
    if n == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "entity_uuid": pa.array([], pa.string()),
                    "hub": pa.array([], pa.float64()),
                    "authority": pa.array([], pa.float64()),
                }
            )
        )

    nparts = default_join_partitions()
    e0 = edges.select_columns([src, dst]).map_batches(
        lambda t: t.rename_columns(["s", "t"]), batch_format="pyarrow"
    ).materialize()

    def _deg(col: str, out: str) -> rd.Dataset:
        return (
            e0.map_batches(
                lambda t, _c=col: pa.table({_c: t.column(_c)}),
                batch_format="pyarrow",
            )
            .groupby(col)
            .aggregate(Count(alias_name=out))
        )

    e = safe_join(
        safe_join(
            e0, _deg("s", "od"), join_type="inner", num_partitions=nparts, on=("s",)
        ),
        _deg("t", "idg"),
        join_type="inner",
        num_partitions=nparts,
        on=("t",),
    ).materialize()

    zero_rows = nodes.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "v": pa.array(np.zeros(t.num_rows), pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def _push(scores: rd.Dataset, join_key: str, out_key: str, deg_col: str):
        """One stochastic half-round: join scores at ``join_key``, push
        sc/deg to ``out_key``, sum, L1-normalize."""
        joined = safe_join(
            e,
            scores.map_batches(
                lambda t, _k=join_key: t.rename_columns([_k, "sc"]),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=nparts,
            on=(join_key,),
        )

        def contrib_fn(t: pa.Table, _o=out_key, _d=deg_col) -> pa.Table:
            v = t.column("sc").to_numpy(zero_copy_only=False) / t.column(
                _d
            ).to_numpy(zero_copy_only=False)
            return pa.table({"node": t.column(_o), "v": pa.array(v, pa.float64())})

        contrib = joined.map_batches(contrib_fn, batch_format="pyarrow").union(
            zero_rows
        )
        acc = (
            contrib.groupby("node")
            .aggregate(Sum("v", alias_name="acc"))
            .materialize()
        )
        total = float(acc.sum("acc"))
        norm = total if total != 0.0 else 1.0
        return acc.map_batches(
            lambda t, _n=norm: pa.table(
                {
                    "node": t.column("node"),
                    "sc": pa.array(
                        t.column("acc").to_numpy(zero_copy_only=False) / _n,
                        pa.float64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    hub = nodes.map_batches(
        lambda t, _p=1.0 / n: t.append_column(
            "sc", pa.array(np.full(t.num_rows, _p), pa.float64())
        ),
        batch_format="pyarrow",
    ).materialize()
    auth = hub
    for _ in range(rounds):
        auth = _push(hub, "s", "t", "od")  # authority ← walk s→t over outdeg
        hub = _push(auth, "t", "s", "idg")  # hub ← walk t→s over indeg

    merged = safe_join(
        hub.map_batches(
            lambda t: t.rename_columns(["node", "hub"]), batch_format="pyarrow"
        ),
        auth.map_batches(
            lambda t: t.rename_columns(["node", "authority"]),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=nparts,
        on=("node",),
    )
    return merged.map_batches(
        lambda t: pa.table(
            {
                "entity_uuid": t.column("node"),
                "hub": t.column("hub"),
                "authority": t.column("authority"),
            }
        ),
        batch_format="pyarrow",
    )


def _pair_key(a, b):
    import pyarrow.compute as pc

    # collision-free pair key for ARBITRARY string ids: the length
    # prefix pins where `a` ends, so ("x|y","z") and ("x","y|z")
    # cannot produce the same key (a plain separator join would)
    return pc.binary_join_element_wise(
        pc.cast(pc.utf8_length(a), pa.string()), a, b, ":"
    )


def _undirected_distinct_edges(
    edges: rd.Dataset, src: str, dst: str
) -> rd.Dataset:
    """Materialized DISTINCT undirected edge set (a < b, self-loops
    dropped) with the collision-free pair key in column ``ek``."""
    import pyarrow.compute as pc

    from graphiti_ray.stages.ops import distinct_by_key

    def orient_by_id(batch: pa.Table) -> pa.Table:
        s, t = batch.column(src), batch.column(dst)
        a = pc.min_element_wise(s, t)
        b = pc.max_element_wise(s, t)
        tbl = pa.table({"a": a, "b": b})
        tbl = tbl.filter(pc.not_equal(tbl.column("a"), tbl.column("b")))
        return tbl.append_column("ek", _pair_key(tbl.column("a"), tbl.column("b")))

    return distinct_by_key(
        edges.map_batches(orient_by_id, batch_format="pyarrow", zero_copy_batch=True),
        "ek",
    ).materialize()


def _undirected_degrees(e: rd.Dataset) -> rd.Dataset:
    """(node, deg) distinct-neighbor degrees over a distinct edge set."""
    return (
        e.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            t.column("a").combine_chunks(),
                            t.column("b").combine_chunks(),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
        .materialize()
    )


def clustering_coefficients(
    edges: rd.Dataset, src: str = "subj_uuid", dst: str = "obj_uuid"
) -> rd.Dataset:
    """Local clustering coefficient per node over the undirected distinct
    edge set (Watts–Strogatz): cc = 2·T / (d·(d−1)). Emitted on the exact
    integer lattice — ``cc_e6 = (2·T·1_000_000) // (d·(d−1))`` — so the
    SQL twin's integer division matches bit-for-bit (oracle convention:
    clear every division). Nodes with degree < 2 are excluded (undefined
    denominator); triangle-free nodes report 0.

    Scale shape: triangle counts come from the degree-ordered wedge join
    (O(m^1.5) wedges), degrees from one narrow groupby over the distinct
    edge set, and the final combine is a left join on the vocabulary-sized
    node table — nothing materializes on the driver."""
    import numpy as np
    import pyarrow.compute as pc

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    e = _undirected_distinct_edges(edges, src, dst)
    empty = pa.table(
        {
            "entity_uuid": pa.array([], pa.string()),
            "degree": pa.array([], pa.int64()),
            "n_triangles": pa.array([], pa.int64()),
            "cc_e6": pa.array([], pa.int64()),
        }
    )
    if e.count() == 0:
        return rd.from_arrow(empty)

    deg2 = _undirected_degrees(e).map_batches(
        lambda t: pa.table(
            {"entity_uuid": t.column("node"), "degree": t.column("deg")}
        ).filter(pc.greater_equal(t.column("deg"), 2)),
        batch_format="pyarrow",
    )
    tri = triangle_counts(edges, src=src, dst=dst)
    if tri.count() == 0:
        joined = deg2.map_batches(
            lambda t: t.append_column(
                "n_triangles", pa.array([None] * t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        )
    else:
        joined = safe_join(
            deg2,
            tri,
            join_type="left_outer",
            num_partitions=default_join_partitions(),
            on=("entity_uuid",),
        )

    def finish(t: pa.Table) -> pa.Table:
        d = t.column("degree").to_numpy(zero_copy_only=False).astype(np.int64)
        tr = pc.fill_null(t.column("n_triangles"), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        cc = (2 * tr * 1_000_000) // (d * (d - 1))
        return pa.table(
            {
                "entity_uuid": t.column("entity_uuid"),
                "degree": pa.array(d, pa.int64()),
                "n_triangles": pa.array(tr, pa.int64()),
                "cc_e6": pa.array(cc, pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def triangle_counts(
    edges: rd.Dataset, src: str = "subj_uuid", dst: str = "obj_uuid"
) -> rd.Dataset:
    """Per-node triangle participation counts over the UNDIRECTED distinct
    edge set (self-loops dropped), via DEGREE-ORDERED wedge counting: each
    edge is oriented from its lower-(degree, id) endpoint to the higher
    one, wedges are built by a self-join on the LOW endpoint, and a wedge
    closes iff its (x, y) pair appears in the oriented edge set. Degree
    orientation bounds the wedge count at O(m^1.5) even with hub nodes —
    the lexicographic variant blows up quadratically on a hub's edge list.
    Each triangle is found exactly once (at its minimum-(degree, id)
    vertex). Output: (entity_uuid, n_triangles) for nodes in ≥ 1
    triangle; triangle-free inputs return an empty, schema-stable result
    instead of tripping Ray's empty-side join."""
    import numpy as np
    import pyarrow.compute as pc

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    pair_key = _pair_key
    e = _undirected_distinct_edges(edges, src, dst)

    empty = pa.table(
        {
            "entity_uuid": pa.array([], pa.string()),
            "n_triangles": pa.array([], pa.int64()),
        }
    )
    if e.count() == 0:
        return rd.from_arrow(empty)

    parts = default_join_partitions()
    deg = _undirected_degrees(e)

    def joined_deg(side: str, out: str) -> rd.Dataset:
        return deg.map_batches(
            lambda t, _s=side, _o=out: pa.table(
                {_s: t.column("node"), _o: t.column("deg")}
            ),
            batch_format="pyarrow",
        )

    ed = safe_join(
        safe_join(
            e.select_columns(["a", "b"]),
            joined_deg("a", "da"),
            join_type="inner",
            num_partitions=parts,
            on=("a",),
        ),
        joined_deg("b", "db"),
        join_type="inner",
        num_partitions=parts,
        on=("b",),
    )

    def orient_by_degree(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("a").to_pylist(), dtype=object)
        b = np.asarray(t.column("b").to_pylist(), dtype=object)
        da = t.column("da").to_numpy(zero_copy_only=False)
        db = t.column("db").to_numpy(zero_copy_only=False)
        # lower (degree, id) endpoint becomes the wedge pivot
        a_first = (da < db) | ((da == db) & (a < b))
        lo = np.where(a_first, a, b)
        hi = np.where(a_first, b, a)
        dhi = np.where(a_first, db, da)
        out = pa.table(
            {
                "lo": pa.array(lo.tolist(), pa.string()),
                "hi": pa.array(hi.tolist(), pa.string()),
                "dhi": pa.array(dhi, pa.int64()),
            }
        )
        return out.append_column(
            "ok", pair_key(out.column("lo"), out.column("hi"))
        )

    e_or = ed.map_batches(orient_by_degree, batch_format="pyarrow").materialize()

    wedges = safe_join(
        e_or.select_columns(["lo", "hi", "dhi"]),
        e_or.select_columns(["lo", "hi", "dhi"]).map_batches(
            lambda t: t.rename_columns(["lo", "hi2", "dhi2"]),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=parts,
        on=("lo",),
    )

    def keep_ordered_wedges(t: pa.Table) -> pa.Table:
        # (deg, id)-ordered so each unordered wedge pair emits once, and
        # the closing edge — if it exists — is oriented exactly hi → hi2
        keep = pc.or_(
            pc.less(t.column("dhi"), t.column("dhi2")),
            pc.and_(
                pc.equal(t.column("dhi"), t.column("dhi2")),
                pc.less(t.column("hi"), t.column("hi2")),
            ),
        )
        t = t.filter(keep)
        return t.append_column("ok", pair_key(t.column("hi"), t.column("hi2")))

    wedges = wedges.map_batches(
        keep_ordered_wedges, batch_format="pyarrow"
    ).materialize()
    if wedges.count() == 0:  # triangle-free graph — nothing to close
        return rd.from_arrow(empty)

    closed = safe_join(
        wedges.select_columns(["lo", "hi", "hi2", "ok"]),
        e_or.select_columns(["ok"]).map_batches(
            lambda t: t.append_column(
                "_hit", pa.array([1] * t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=parts,
        on=("ok",),
    )

    def explode_vertices(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity_uuid": pa.concat_arrays(
                    [
                        batch.column("lo").combine_chunks(),
                        batch.column("hi").combine_chunks(),
                        batch.column("hi2").combine_chunks(),
                    ]
                )
            }
        )

    counted = (
        closed.map_batches(
            explode_vertices, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("entity_uuid")
        .aggregate(Count(alias_name="n_triangles"))
        .materialize()
    )
    return counted if counted.count() else rd.from_arrow(empty)


def k_core(
    edges: rd.Dataset,
    k: int = 2,
    rounds: int = 6,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
) -> rd.Dataset:
    """k-core decomposition by iterative peeling with a FIXED round bound
    (so a SQL twin can unroll the recurrence, the pagerank convention):
    each round recomputes undirected degrees and drops every node with
    degree < k plus its incident edges; early-stops when a round removes
    nothing (further rounds are no-ops, so an R-round SQL unroll still
    matches). Degree counts incident edge ROWS (multi-edges count each).

    All dataset-side: degrees via the per-batch partial + keyed sum
    (node_degrees), survivor filtering via two hash semi-joins per round
    (src then dst) — no driver-resident node set, so a web-scale peel
    where most of the graph survives never materializes on one machine.

    Returns (entity_uuid, degree): the surviving nodes with their degree
    inside the final core.
    """
    import pyarrow.compute as pc

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    cur = edges.select_columns([src, dst]).map_batches(
        lambda t: t.rename_columns(["s", "t"]), batch_format="pyarrow"
    ).materialize()

    n_edges = cur.count()
    for _ in range(rounds):
        if n_edges == 0:
            break
        deg = node_degrees(cur, "s", "t").materialize()
        keep = deg.map_batches(
            lambda t, _k=k: t.filter(pc.greater_equal(t.column("degree"), _k)),
            batch_format="pyarrow",
        ).materialize()
        n_keep = keep.count()
        if n_keep == 0:  # everything peeled — joining on an empty side
            n_edges = 0  # trips Arrow's hash shuffle, so short-circuit
            break
        if n_keep == deg.count():  # fixpoint: nothing peeled — skip the
            break  # two joins the round would waste
        nxt = safe_join(
            cur,
            keep.map_batches(
                lambda t: pa.table({"s": t.column("entity_uuid")}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=default_join_partitions(),
            on=("s",),
        )
        nxt = safe_join(
            nxt.map_batches(
                lambda t: t.select(["s", "t"]), batch_format="pyarrow"
            ),
            keep.map_batches(
                lambda t: pa.table({"t": t.column("entity_uuid")}),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=default_join_partitions(),
            on=("t",),
        ).map_batches(lambda t: t.select(["s", "t"]), batch_format="pyarrow")
        nxt = nxt.materialize()
        cur, n_edges = nxt, nxt.count()

    if n_edges == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "entity_uuid": pa.array([], pa.string()),
                    "degree": pa.array([], pa.int64()),
                }
            )
        )
    # final degrees inside the core (NOT re-filtered: after convergence all
    # are ≥ k; before convergence the SQL twin reports the same R-round cut)
    return node_degrees(cur, "s", "t")


MODULARITY_INT64_2M_BOUND = 3_000_000_000  # sqrt(int64 max): d_c² stays exact


def modularity(
    edges: rd.Dataset,
    labels: rd.Dataset,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
) -> rd.Dataset:
    """Per-community Newman modularity contributions in EXACT int64
    arithmetic — the standard quality score for a community assignment
    (reference analogue: community_operations.py's LPA output, which
    ships unscored). On the weighted undirected multigraph where
    w(x, y) = number of edges between x and y (both orientations),
    with 2m = Σw and d_x = Σ_y w(x, y):

        Q = Σ_c [ S_A(c)/2m − (d_c/2m)² ]
        → Q·(2m)² = Σ_c (2m·S_A(c) − d_c²)   (every division cleared)

    Output per community: (community, n_nodes, s_a, d_tot, q_num, two_m)
    with q_num = 2m·s_a − d_tot² — all int64, exact while 2m ≤ 3·10⁹
    (guarded; beyond that the score needs int128/float and stops being
    hash-comparable). All joins are keyed dataset joins; only the single
    scalar 2m touches the driver."""
    from graphiti_ray.stages.link import default_join_partitions, safe_join

    weights = (
        _symmetric(edges, src, dst)
        .groupby(["x", "y"])
        .aggregate(Count(alias_name="w"))
        .materialize()
    )
    two_m = int(weights.sum("w") or 0)
    if two_m > MODULARITY_INT64_2M_BOUND:
        raise ValueError(
            "modularity: 2m exceeds the int64-exact bound — use a float or "
            "int128 variant at this edge count"
        )
    parts = default_join_partitions()
    lab_x = labels.rename_columns({"node": "x", "community": "cx"})
    lab_y = labels.rename_columns({"node": "y", "community": "cy"})
    wx = safe_join(weights, lab_x, join_type="inner", num_partitions=parts, on=("x",))
    wxy = safe_join(wx, lab_y, join_type="inner", num_partitions=parts, on=("y",))

    def internal(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = batch.filter(pc.equal(batch.column("cx"), batch.column("cy")))
        return pa.table(
            {"community": keep.column("cx"), "p_w": keep.column("w")}
        )

    sa_schema = pa.schema([("community", pa.string()), ("s_a", pa.int64())])
    s_a = ensure_schema(
        wxy.map_batches(internal, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("community")
        .aggregate(Sum("p_w", alias_name="s_a")),
        sa_schema,
    ).materialize()
    deg = weights.groupby("x").aggregate(Sum("w", alias_name="d"))
    degc = safe_join(
        deg.rename_columns({"x": "node"}),
        labels,
        join_type="inner",
        num_partitions=parts,
        on=("node",),
    )

    def deg_partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["community", "d"]).group_by(["community"]).aggregate(
            [("d", "sum"), ([], "count_all")]
        )
        return t.rename_columns(["community", "p_d", "p_n"])

    per_c = (
        degc.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("community")
        .aggregate(Sum("p_d", alias_name="d_tot"), Sum("p_n", alias_name="n_nodes"))
    )
    if s_a.count() == 0:
        # no community has an internal edge: an ALL-empty join side stays
        # schema-less through every coercion (map_batches skips empty
        # blocks, the hash partitioner emits nothing) — add the null s_a
        # column directly instead of joining
        joined = per_c.map_batches(
            lambda t: t.append_column(
                "s_a", pa.array([None] * t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        )
    else:
        joined = safe_join(
            per_c, s_a, join_type="left_outer", num_partitions=parts, on=("community",)
        )

    def finish(batch: pa.Table, _2m=two_m) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        sa = pc.fill_null(batch.column("s_a"), 0).to_numpy(zero_copy_only=False)
        d = batch.column("d_tot").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "community": batch.column("community"),
                "n_nodes": batch.column("n_nodes"),
                "s_a": pa.array(sa, pa.int64()),
                "d_tot": pa.array(d, pa.int64()),
                "q_num": pa.array(_2m * sa - d * d, pa.int64()),
                "two_m": pa.array(np.full(len(d), _2m), pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def adamic_adar(
    edges: rd.Dataset,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
    top_n: int = 200,
    edge_key_broadcast_limit: int = 5_000_000,
) -> rd.Dataset:
    """Adamic-Adar link prediction over the UNDIRECTED distinct edge set
    (reference analogue: the relevance/rerank family, search_utils.py —
    AA is the classic KG link-prediction score the reference's LLM edge
    proposals approximate): for every non-adjacent pair (a, b) sharing at
    least one neighbor v, score = sum over common v of 1/ln(deg(v)).

    Exactness convention (so the DuckDB twin hash-matches): per-center
    weight is the INTEGER lattice value ``10**12 // rint(ln(deg)*1e6)``
    (float AA = aa_score_micro / 1e6 to ~6 places); SQL twin:
    ``1000000000000 // CAST(round(ln(deg)*1000000) AS BIGINT)``.

    Shape: adjacency both directions → self-join on the CENTER v (one
    keyed shuffle; wedge count is sum(deg^2) — at web scale cap centers
    with a degree filter, a hub's 1/ln weight is negligible anyway) →
    per-batch combiner → groupby(a, b) sum → drop already-adjacent pairs
    via a BROADCAST edge-key array + ``pc.is_in`` (bounded by
    ``edge_key_broadcast_limit``; above it, a hash-partitioned
    ``left_anti`` join against the edge table — never a driver set) →
    top_n by (score desc, a, b).

    Output: (node_a, node_b, common_neighbors, aa_score_micro).
    """
    import numpy as np
    import pyarrow.compute as pc

    import ray

    from graphiti_ray.stages.link import default_join_partitions, safe_join
    from graphiti_ray.stages.ops import distinct_by_key

    def pair_key(a, b):
        return pc.binary_join_element_wise(
            pc.cast(pc.utf8_length(a), pa.string()), a, b, ":"
        )

    def orient(batch: pa.Table) -> pa.Table:
        s, t = batch.column(src), batch.column(dst)
        a = pc.min_element_wise(s, t)
        b = pc.max_element_wise(s, t)
        tbl = pa.table({"a": a, "b": b})
        tbl = tbl.filter(pc.not_equal(tbl.column("a"), tbl.column("b")))
        return tbl.append_column("ek", pair_key(tbl.column("a"), tbl.column("b")))

    e = distinct_by_key(
        edges.map_batches(orient, batch_format="pyarrow", zero_copy_batch=True),
        "ek",
    ).materialize()

    empty = pa.table(
        {
            "node_a": pa.array([], pa.string()),
            "node_b": pa.array([], pa.string()),
            "common_neighbors": pa.array([], pa.int64()),
            "aa_score_micro": pa.array([], pa.int64()),
        }
    )
    n_edges = e.count()
    if n_edges == 0:
        return rd.from_arrow(empty)
    # adjacency drop strategy: broadcast sorted edge keys + pc.is_in under
    # the bound, hash-partitioned left_anti join above it (the
    # _apply_near_dup_drops convention, pipelines/corpus.py)
    broadcast_ok = n_edges <= edge_key_broadcast_limit

    parts = default_join_partitions()

    def symmetrize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": pa.concat_arrays(
                    [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [t.column("b").combine_chunks(), t.column("a").combine_chunks()]
                ),
            }
        )

    adj = e.map_batches(
        symmetrize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # per-center weight on the log lattice; centers of a wedge have deg >= 2
    deg = adj.groupby("v").aggregate(Count(alias_name="deg"))

    def weight(t: pa.Table) -> pa.Table:
        d = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
        lat = np.rint(np.log(d) * 1e6).astype(np.int64)
        w = np.where(lat > 0, 10**12 // np.maximum(lat, 1), 0)
        tbl = pa.table({"v": t.column("v"), "w": pa.array(w, pa.int64())})
        return tbl.filter(pc.greater(tbl.column("w"), 0))

    wdeg = deg.map_batches(weight, batch_format="pyarrow")

    adj_w = safe_join(
        adj, wdeg, join_type="inner", num_partitions=parts, on=("v",)
    )

    wedges = safe_join(
        adj_w,
        adj.map_batches(
            lambda t: t.rename_columns(["v", "nbr2"]), batch_format="pyarrow"
        ),
        join_type="inner",
        num_partitions=parts,
        on=("v",),
    )

    def combine(t: pa.Table) -> pa.Table:
        # ordered pair (nbr < nbr2) emits each wedge once; per-batch
        # combiner so the global groupby shuffles pre-summed partials
        t = t.filter(pc.less(t.column("nbr"), t.column("nbr2")))
        if t.num_rows == 0:
            return pa.table(
                {
                    "node_a": pa.array([], pa.string()),
                    "node_b": pa.array([], pa.string()),
                    "cn": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                }
            )
        part = (
            pa.table(
                {
                    "node_a": t.column("nbr"),
                    "node_b": t.column("nbr2"),
                    "w": t.column("w"),
                }
            )
            .group_by(["node_a", "node_b"])
            .aggregate([("w", "sum"), ("w", "count")])
        )
        return pa.table(
            {
                "node_a": part.column("node_a"),
                "node_b": part.column("node_b"),
                "cn": pc.cast(part.column("w_count"), pa.int64()),
                "w": pc.cast(part.column("w_sum"), pa.int64()),
            }
        )

    pairs = (
        wedges.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["node_a", "node_b"])
        .aggregate(
            Sum("cn", alias_name="common_neighbors"),
            Sum("w", alias_name="aa_score_micro"),
        )
    )

    # drop pairs that are already edges
    if broadcast_ok:
        ek_arr = pa.concat_arrays(
            [c.combine_chunks() for c in
             (b.column("ek") for b in e.select_columns(["ek"]).iter_batches(
                 batch_format="pyarrow", batch_size=None))]
        )
        ek_ref = ray.put(ek_arr)

        def drop_adjacent(t: pa.Table, _ref=ek_ref) -> pa.Table:
            keys = pair_key(t.column("node_a"), t.column("node_b"))
            mask = pc.invert(pc.is_in(keys, value_set=ray.get(_ref)))
            return t.filter(mask)

        scored = pairs.map_batches(
            drop_adjacent, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        scored = safe_join(
            pairs,
            e.map_batches(
                lambda t: pa.table(
                    {"node_a": t.column("a"), "node_b": t.column("b")}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            join_type="left_anti",
            num_partitions=parts,
            on=("node_a", "node_b"),
        )

    out = scored.sort(
        ["aa_score_micro", "node_a", "node_b"],
        descending=[True, False, False],
    ).limit(top_n)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node_a": pc.cast(t.column("node_a"), pa.string()),
                "node_b": pc.cast(t.column("node_b"), pa.string()),
                "common_neighbors": pc.cast(
                    t.column("common_neighbors"), pa.int64()
                ),
                "aa_score_micro": pc.cast(t.column("aa_score_micro"), pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def neighborhood_jaccard(
    edges: rd.Dataset,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
    top_n: int = 200,
    edge_key_broadcast_limit: int = 5_000_000,
) -> rd.Dataset:
    """Neighborhood-Jaccard link prediction (Liben-Nowell & Kleinberg
    2003) over the UNDIRECTED distinct edge set: for every non-adjacent
    pair (a, b) with at least one common neighbor,

        J(a, b) = |Γ(a)∩Γ(b)| / |Γ(a)∪Γ(b)| = cn / (deg(a)+deg(b)−cn)

    emitted on the exact integer lattice ``jaccard_micro =
    (cn·10^6) // (deg_a+deg_b−cn)`` so the DuckDB twin hash-matches
    (the adamic_adar convention, with the denominator exact instead of
    log-lattice). Same shape as :func:`adamic_adar`: one keyed self-join
    on the wedge center, per-batch combiner, pair-count groupby, two
    degree joins, broadcast edge-key ``pc.is_in`` adjacency drop
    (bounded; hash-partitioned ``left_anti`` join above the bound),
    top_n by (score desc, a, b).

    Output: (node_a, node_b, common_neighbors, jaccard_micro).
    """
    import numpy as np
    import pyarrow.compute as pc

    import ray

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    e = _undirected_distinct_edges(edges, src, dst)
    empty = pa.table(
        {
            "node_a": pa.array([], pa.string()),
            "node_b": pa.array([], pa.string()),
            "common_neighbors": pa.array([], pa.int64()),
            "jaccard_micro": pa.array([], pa.int64()),
        }
    )
    n_edges = e.count()
    if n_edges == 0:
        return rd.from_arrow(empty)
    # same two-path adjacency drop as adamic_adar: broadcast is_in under
    # the bound, left_anti join above it
    broadcast_ok = n_edges <= edge_key_broadcast_limit
    parts = default_join_partitions()

    def symmetrize(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": pa.concat_arrays(
                    [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [t.column("b").combine_chunks(), t.column("a").combine_chunks()]
                ),
            }
        )

    adj = e.map_batches(
        symmetrize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    deg = _undirected_degrees(e)

    wedges = safe_join(
        adj,
        adj.map_batches(
            lambda t: t.rename_columns(["v", "nbr2"]), batch_format="pyarrow"
        ),
        join_type="inner",
        num_partitions=parts,
        on=("v",),
    )

    def combine(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("nbr"), t.column("nbr2")))
        if t.num_rows == 0:
            return pa.table(
                {
                    "node_a": pa.array([], pa.string()),
                    "node_b": pa.array([], pa.string()),
                    "cn": pa.array([], pa.int64()),
                }
            )
        part = (
            pa.table({"node_a": t.column("nbr"), "node_b": t.column("nbr2")})
            .group_by(["node_a", "node_b"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "node_a": part.column("node_a"),
                "node_b": part.column("node_b"),
                "cn": pc.cast(part.column("count_all"), pa.int64()),
            }
        )

    pairs = (
        wedges.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["node_a", "node_b"])
        .aggregate(Sum("cn", alias_name="common_neighbors"))
    )

    for side in ("node_a", "node_b"):
        pairs = safe_join(
            pairs,
            deg.map_batches(
                lambda t, _s=side: t.rename_columns([_s, f"deg_{_s[-1]}"]),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=parts,
            on=(side,),
        )

    if broadcast_ok:
        ek_arr = pa.concat_arrays(
            [
                b.column("ek").combine_chunks()
                for b in e.select_columns(["ek"]).iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            ]
        )
        ek_ref = ray.put(ek_arr)

        def drop_adjacent(t: pa.Table, _ref=ek_ref) -> pa.Table:
            keys = _pair_key(t.column("node_a"), t.column("node_b"))
            return t.filter(
                pc.invert(pc.is_in(keys, value_set=ray.get(_ref)))
            )

        pairs = pairs.map_batches(
            drop_adjacent, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        pairs = safe_join(
            pairs,
            e.map_batches(
                lambda t: pa.table(
                    {"node_a": t.column("a"), "node_b": t.column("b")}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ),
            join_type="left_anti",
            num_partitions=parts,
            on=("node_a", "node_b"),
        )

    def score(t: pa.Table) -> pa.Table:
        cn = t.column("common_neighbors").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg_b").to_numpy(zero_copy_only=False)
        jm = (cn.astype(np.int64) * 1_000_000) // (da + db - cn)
        return pa.table(
            {
                "node_a": pc.cast(t.column("node_a"), pa.string()),
                "node_b": pc.cast(t.column("node_b"), pa.string()),
                "common_neighbors": pc.cast(
                    t.column("common_neighbors"), pa.int64()
                ),
                "jaccard_micro": pa.array(jm, pa.int64()),
            }
        )

    return (
        pairs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .sort(
            ["jaccard_micro", "node_a", "node_b"],
            descending=[True, False, False],
        )
        .limit(top_n)
    )


def degree_assortativity_moments(
    edges: rd.Dataset, src: str = "subj_uuid", dst: str = "obj_uuid"
) -> rd.Dataset:
    """Degree-assortativity moment sums over the undirected distinct edge
    set — the Newman (2002) mixing coefficient's sufficient statistics,
    emitted as EXACT int64 sums so the SQL twin matches bit-for-bit
    (oracle convention: keep the derived float ratio off the hash):

        n_ends = 2·m          (each edge contributes both orientations)
        s_d    = Σ (dx + dy)  over edges  = Σ over ends of end-degree
        s_d2   = Σ (dx² + dy²)
        s_dxdy = Σ dx·dy      (per edge, counted once)

    Pearson assortativity r = (n_ends·2·s_dxdy − s_d²) /
    (n_ends·s_d2 − s_d²) is a driver-side ratio of these.

    Scale shape: distinct undirected edges (one narrow shuffle), degrees
    from one vocabulary-sized groupby, two hash joins keyed on the edge
    endpoints, then a per-batch partial sum → single 1-row keyed reduce —
    nothing materializes on the driver."""
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    e = _undirected_distinct_edges(edges, src, dst)
    empty = pa.table(
        {
            "n_ends": pa.array([], pa.int64()),
            "s_d": pa.array([], pa.int64()),
            "s_d2": pa.array([], pa.int64()),
            "s_dxdy": pa.array([], pa.int64()),
        }
    )
    if e.count() == 0:
        return rd.from_arrow(empty)

    deg = _undirected_degrees(e)
    parts = default_join_partitions()
    da = deg.map_batches(
        lambda t: pa.table({"a": t.column("node"), "da": t.column("deg")}),
        batch_format="pyarrow",
    )
    db = deg.map_batches(
        lambda t: pa.table({"b": t.column("node"), "db": t.column("deg")}),
        batch_format="pyarrow",
    )
    j = safe_join(
        e.map_batches(
            lambda t: t.select(["a", "b"]), batch_format="pyarrow"
        ),
        da,
        join_type="inner",
        num_partitions=parts,
        on=("a",),
    )
    j = safe_join(j, db, join_type="inner", num_partitions=parts, on=("b",))

    def partial(t: pa.Table) -> pa.Table:
        dx = t.column("da").to_numpy(zero_copy_only=False).astype(np.int64)
        dy = t.column("db").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n_ends": pa.array([2 * len(dx)], pa.int64()),
                "s_d": pa.array([int((dx + dy).sum())], pa.int64()),
                "s_d2": pa.array([int((dx * dx + dy * dy).sum())], pa.int64()),
                "s_dxdy": pa.array([int((dx * dy).sum())], pa.int64()),
            }
        )

    return (
        j.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(
            Sum("n_ends", alias_name="n_ends"),
            Sum("s_d", alias_name="s_d"),
            Sum("s_d2", alias_name="s_d2"),
            Sum("s_dxdy", alias_name="s_dxdy"),
        )
        .map_batches(
            lambda t: t.select(["n_ends", "s_d", "s_d2", "s_dxdy"]),
            batch_format="pyarrow",
        )
    )


SCC_SMALL_LIMIT = 100_000


def _scc_minlabel_fixpoint(
    nodes: rd.Dataset, edges: rd.Dataset, forward: bool, max_rounds: int
) -> rd.Dataset:
    """Directed min-label propagation to fixpoint: lbl(v) = min id v can
    reach (forward=True) / min id that can reach v (forward=False),
    labels and convergence both dataset-side (the label_propagation
    convention: a changed-flag column + one sum aggregate per round, no
    driver materialization)."""
    import numpy as np

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    labels = nodes.map_batches(
        lambda t: pa.table({"node": t.column("node"), "lbl": t.column("node")}),
        batch_format="pyarrow",
    ).materialize()
    # forward: v hears from its out-neighbor w over edge (v, w);
    # backward: v hears from its in-neighbor u over edge (u, v)
    recv, send = ("s", "t") if forward else ("t", "s")
    msg = edges.map_batches(
        lambda t, _r=recv, _s=send: pa.table(
            {"_rv": t.column(_r), "_sd": t.column(_s)}
        ),
        batch_format="pyarrow",
    ).materialize()
    parts = default_join_partitions()
    for _ in range(max_rounds):
        lab_s = labels.map_batches(
            lambda t: pa.table({"_sd": t.column("node"), "_slbl": t.column("lbl")}),
            batch_format="pyarrow",
        )
        inc = (
            safe_join(msg, lab_s, join_type="inner", num_partitions=parts, on=("_sd",))
            .groupby("_rv")
            .aggregate(Min("_slbl", alias_name="_m"))
            .map_batches(
                lambda t: pa.table({"node": t.column("_rv"), "_m": t.column("_m")}),
                batch_format="pyarrow",
            )
        )
        joined = safe_join(
            labels, inc, join_type="left_outer", num_partitions=parts, on=("node",)
        )

        def step(t: pa.Table) -> pa.Table:
            old = t.column("lbl")
            m = t.column("_m")
            new = pc.min_element_wise(old, pc.coalesce(m, old))
            changed = pc.cast(pc.less(new, old), pa.int64())
            return pa.table(
                {"node": t.column("node"), "lbl": new, "changed": changed}
            )

        stepped = joined.map_batches(step, batch_format="pyarrow").materialize()
        n_changed = stepped.sum("changed")
        labels = stepped.drop_columns(["changed"]).materialize()
        if not n_changed:
            break
    return labels


def scc(
    edges: rd.Dataset,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
    max_peels: int = 50,
    max_rounds: int = 50,
) -> rd.Dataset:
    """Strongly connected components of a DIRECTED edge list →
    (node, scc_id), scc_id = the SCC's minimum member id — the web-graph
    structure primitive (Broder 2000's bowtie analysis runs on exactly
    this) the undirected connected_components cannot express.

    Small edge sets (≤ SCC_SMALL_LIMIT after distinct) collapse on the
    driver with iterative Tarjan — the connected_components gate
    convention. Above it: FW-BW-style PEELING, each round two directed
    min-label fixpoints over the still-active subgraph (fwd(v) = min id
    reachable from v, bwd(v) = min id reaching v); every node with
    fwd == bwd is mutually reachable with that min id, so the whole SCC
    of the current minimum ids retires per round (assignment is provably
    complete per SCC: fwd/bwd are constant on an SCC). Removing a
    complete SCC never disconnects a surviving one — any path between
    two members of one SCC lies entirely inside it — so peeling is safe.
    All label state, convergence tests and survivor filtering stay
    dataset-side (anti-join via left_outer + null filter; the
    incremental path's pattern).
    """
    from graphiti_ray.stages.link import default_join_partitions, safe_join
    from graphiti_ray.stages.ops import distinct_by_key

    def norm(t: pa.Table) -> pa.Table:
        s = t.column(src).cast(pa.string())
        d = t.column(dst).cast(pa.string())
        return pa.table(
            {
                "s": s,
                "t": d,
                "_k": pc.binary_join_element_wise(s, d, "\x01"),
            }
        )

    e = distinct_by_key(
        edges.select_columns([src, dst]).map_batches(
            norm, batch_format="pyarrow", zero_copy_batch=True
        ),
        "_k",
    ).drop_columns(["_k"]).materialize()
    n_edges = e.count()
    empty = pa.table(
        {"node": pa.array([], pa.string()), "scc_id": pa.array([], pa.string())}
    )
    if n_edges == 0:
        return rd.from_arrow(empty)

    if n_edges <= SCC_SMALL_LIMIT:
        df = e.to_pandas()
        adj: dict[str, list[str]] = {}
        node_set: set[str] = set()
        for a, b in zip(df["s"], df["t"]):
            adj.setdefault(a, []).append(b)
            node_set.add(a)
            node_set.add(b)
        index: dict[str, int] = {}
        low: dict[str, int] = {}
        on_stack: set[str] = set()
        stack: list[str] = []
        comp_of: dict[str, str] = {}
        counter = 0
        for root in sorted(node_set):
            if root in index:
                continue
            # iterative Tarjan: (node, child-iterator position) frames
            work = [(root, 0)]
            while work:
                v, pi = work.pop()
                if pi == 0:
                    index[v] = low[v] = counter
                    counter += 1
                    stack.append(v)
                    on_stack.add(v)
                recurse = False
                children = adj.get(v, ())
                for i in range(pi, len(children)):
                    w = children[i]
                    if w not in index:
                        work.append((v, i + 1))
                        work.append((w, 0))
                        recurse = True
                        break
                    if w in on_stack:
                        low[v] = min(low[v], index[w])
                if recurse:
                    continue
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on_stack.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    cid = min(comp)
                    for w in comp:
                        comp_of[w] = cid
                if work:
                    parent = work[-1][0]
                    low[parent] = min(low[parent], low[v])
        out = sorted(comp_of)
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(out, pa.string()),
                    "scc_id": pa.array([comp_of[x] for x in out], pa.string()),
                }
            )
        )

    # distributed peeling path
    parts = default_join_partitions()
    nodes = distinct_by_key(
        e.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            t.column("s").combine_chunks(),
                            t.column("t").combine_chunks(),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        ),
        "node",
    ).materialize()
    active_nodes = nodes
    active_edges = e
    assigned: list[rd.Dataset] = []
    for _ in range(max_peels):
        if active_nodes.count() == 0:
            break
        if active_edges.count() == 0:
            # every surviving node is edge-less → singleton SCCs
            assigned.append(
                active_nodes.map_batches(
                    lambda t: pa.table(
                        {"node": t.column("node"), "scc_id": t.column("node")}
                    ),
                    batch_format="pyarrow",
                )
            )
            break
        f = _scc_minlabel_fixpoint(active_nodes, active_edges, True, max_rounds)
        b = _scc_minlabel_fixpoint(active_nodes, active_edges, False, max_rounds)
        fb = safe_join(
            f,
            b.map_batches(
                lambda t: pa.table(
                    {"node": t.column("node"), "_blbl": t.column("lbl")}
                ),
                batch_format="pyarrow",
            ),
            join_type="inner",
            num_partitions=parts,
            on=("node",),
        )
        done = fb.map_batches(
            lambda t: pa.table(
                {"node": t.column("node"), "scc_id": t.column("lbl")}
            ).filter(pc.equal(t.column("lbl"), t.column("_blbl"))),
            batch_format="pyarrow",
        ).materialize()
        if done.count() == 0:  # unreachable: the min active id always retires
            break
        assigned.append(done)
        flag = done.map_batches(
            lambda t: pa.table(
                {"node": t.column("node"), "_gone": pa.array([1] * t.num_rows, pa.int8())}
            ),
            batch_format="pyarrow",
        ).materialize()
        active_nodes = (
            safe_join(
                active_nodes, flag, join_type="left_outer",
                num_partitions=parts, on=("node",),
            )
            .map_batches(
                lambda t: t.filter(pc.is_null(t.column("_gone"))),
                batch_format="pyarrow",
            )
            .select_columns(["node"])
            .materialize()
        )
        for col in ("s", "t"):
            # materialize + count per endpoint: an all-empty dataset loses
            # its schema, and a join against it raises — the loop-top
            # singleton branch then owns whatever nodes remain
            if active_edges.count() == 0:
                break
            active_edges = (
                safe_join(
                    active_edges.map_batches(
                        lambda t, _c=col: t.append_column(
                            "node", t.column(_c)
                        ),
                        batch_format="pyarrow",
                    ),
                    flag,
                    join_type="left_outer",
                    num_partitions=parts,
                    on=("node",),
                )
                .map_batches(
                    lambda t: t.filter(pc.is_null(t.column("_gone"))),
                    batch_format="pyarrow",
                )
                .select_columns(["s", "t"])
                .materialize()
            )
    result = assigned[0]
    for d in assigned[1:]:
        result = result.union(d)
    return result


def random_walks(
    edges: rd.Dataset,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
    walks_per_node: int = 2,
    length: int = 4,
) -> rd.Dataset:
    """Deterministic 'random' walk corpus over a directed edge list — the
    DeepWalk / node2vec preprocessing stage (Perozzi 2014): every node
    starts ``walks_per_node`` walks of ≤``length`` steps; at step k a
    walk at node c moves to c's sorted-neighbor number
    ``md5(c:walk:k)[:8] % outdeg(c)`` — a pure function of (node, walk,
    step), so the corpus is reproducible on any cluster size and the SQL
    twin replays every hop exactly (the salted-md5-uniform convention the
    epoch shuffle and A-ES sampler already use).

    Ray shape: neighbor indices come from ONE ``ops.window_rank`` sort
    (idx = row_number−1 and outdeg per src run — no per-node dispatch);
    each step is one hash join of the live frontier against the indexed
    edge table on (node, picked_idx). Walks leaving a sink node simply
    end (inner join drops them), matching the twin's join semantics.
    Output: (start_host, walk_id, step, host) — step 0 is the start node.
    """
    import hashlib

    from graphiti_ray.stages.link import default_join_partitions, safe_join
    from graphiti_ray.stages.ops import distinct_by_key, window_rank

    def norm(t: pa.Table) -> pa.Table:
        s = t.column(src).cast(pa.string())
        d = t.column(dst).cast(pa.string())
        return pa.table(
            {"s": s, "t": d, "_k": pc.binary_join_element_wise(s, d, "\x01")}
        )

    e = (
        distinct_by_key(
            edges.select_columns([src, dst]).map_batches(
                norm, batch_format="pyarrow", zero_copy_batch=True
            ),
            "_k",
        )
        .drop_columns(["_k"])
    )
    eidx = (
        window_rank(e, ["s"], ["t"], rank_col="_r", count_col="_od")
        .map_batches(
            lambda t: pa.table(
                {
                    "s": t.column("s"),
                    "_nxt": t.column("t"),
                    "_pick": pc.subtract(t.column("_r"), 1),
                    "_od": t.column("_od"),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    nodes = distinct_by_key(
        e.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            t.column("s").combine_chunks(),
                            t.column("t").combine_chunks(),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        ),
        "node",
    )

    def fanout(t: pa.Table, _w=walks_per_node) -> pa.Table:
        node = t.column("node")
        reps = pa.concat_arrays(
            [node.combine_chunks()] * _w
        ) if _w > 1 else node.combine_chunks()
        walk = pa.array(
            [w for w in range(_w) for _ in range(len(node))], pa.int64()
        )
        return pa.table({"start_host": reps, "walk_id": walk, "cur": reps})

    frontier = nodes.map_batches(fanout, batch_format="pyarrow").materialize()
    parts = default_join_partitions()

    def emit(step: int):
        return frontier.map_batches(
            lambda t, _k=step: pa.table(
                {
                    "start_host": t.column("start_host"),
                    "walk_id": t.column("walk_id"),
                    "step": pa.array([_k] * t.num_rows, pa.int64()),
                    "host": t.column("cur"),
                }
            ),
            batch_format="pyarrow",
        )

    out = emit(0)
    for k in range(1, length + 1):
        if frontier.count() == 0:
            break

        def pick_fn(t: pa.Table, _k=k) -> pa.Table:
            cur = t.column("cur").to_pylist()
            wid = t.column("walk_id").to_pylist()
            od = t.column("_od").to_pylist()
            pick = [
                int(
                    hashlib.md5(f"{c}:{w}:{_k}".encode()).hexdigest()[:8], 16
                )
                % o
                for c, w, o in zip(cur, wid, od)
            ]
            return pa.table(
                {
                    "start_host": t.column("start_host"),
                    "walk_id": t.column("walk_id"),
                    "s": t.column("cur"),
                    "_pick": pa.array(pick, pa.int64()),
                }
            )

        # join 1: frontier ⋈ per-src degree (the _pick computation needs
        # outdeg BEFORE the edge join); the degree row is eidx's idx-0 row
        deg = eidx.map_batches(
            lambda t: pa.table(
                {"cur": t.column("s"), "_od": t.column("_od")}
            ).filter(pc.equal(t.column("_pick"), 0)),
            batch_format="pyarrow",
        )
        with_od = safe_join(
            frontier, deg, join_type="inner", num_partitions=parts, on=("cur",)
        )
        picked = with_od.map_batches(pick_fn, batch_format="pyarrow")
        nxt = safe_join(
            picked,
            eidx.map_batches(
                lambda t: t.drop_columns(["_od"]), batch_format="pyarrow"
            ),
            join_type="inner",
            num_partitions=parts,
            on=("s", "_pick"),
        )
        frontier = nxt.map_batches(
            lambda t: pa.table(
                {
                    "start_host": t.column("start_host"),
                    "walk_id": t.column("walk_id"),
                    "cur": t.column("_nxt"),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        out = out.union(emit(k))
    return out


def _directed_reach(
    start: rd.Dataset, edges: rd.Dataset, forward: bool, max_rounds: int
) -> rd.Dataset:
    """Fixpoint reachability set from a starting node set over directed
    edges (forward=False follows edges backwards) — the harmonic-
    centrality BFS loop without per-seed bookkeeping: visited and
    frontier are (node) Datasets, each round one hash join + one distinct
    set difference (``ops.dataset_except``)."""
    from graphiti_ray.stages.link import default_join_partitions, safe_join
    from graphiti_ray.stages.ops import dataset_except

    s, t = ("s", "t") if forward else ("t", "s")
    e = edges.map_batches(
        lambda b, _s=s, _t=t: pa.table(
            {"node": b.column(_s), "_nxt": b.column(_t)}
        ),
        batch_format="pyarrow",
    ).materialize()
    visited = start.materialize()
    frontier = visited
    for _ in range(max_rounds):
        if frontier.count() == 0:
            break
        stepped = safe_join(
            frontier,
            e,
            join_type="inner",
            num_partitions=default_join_partitions(),
            on=("node",),
        ).map_batches(
            lambda b: pa.table({"node": b.column("_nxt")}),
            batch_format="pyarrow",
        )
        fresh = dataset_except(stepped, visited, ["node"]).materialize()
        if fresh.count() == 0:
            break
        visited = visited.union(fresh).materialize()
        frontier = fresh
    return visited


def bowtie(
    edges: rd.Dataset,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
    max_rounds: int = 50,
) -> rd.Dataset:
    """Broder-2000 bowtie decomposition of a directed graph — THE
    structural census of the web graph: every node labeled

      - ``core``  — member of the largest SCC (ties → smaller scc_id),
      - ``in``    — reaches the core but is not in it,
      - ``out``   — reachable from the core but not in it,
      - ``other`` — tendrils/tubes/disconnected (everything else).

    fwd-reach(core) ∩ bwd-reach(core) = core exactly (a node in both is
    mutually reachable with core members, hence in the core SCC), so the
    four zones partition the nodes with no ambiguity.

    Composition of proven pieces: :func:`scc` for the partition, a
    vocabulary-sized groupby + sort-limit for the champion component,
    then two :func:`_directed_reach` BFS fixpoints seeded with the whole
    core. ``max_rounds`` bounds BFS depth (beyond any real web graph's
    diameter; the SQL twin uses the full closure, so graphs deeper than
    the bound would diverge — raise it rather than lowering).
    Output: (node, zone).
    """
    from ray.data.aggregate import Count

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    def norm(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s": t.column(src).cast(pa.string()),
                "t": t.column(dst).cast(pa.string()),
            }
        )

    e = edges.select_columns([src, dst]).map_batches(
        norm, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    labels = scc(e, src="s", dst="t").materialize()
    champion = (
        labels.groupby("scc_id")
        .aggregate(Count(alias_name="sz"))
        .sort(["sz", "scc_id"], descending=[True, False])
        .limit(1)
        .take_all()
    )
    core_id = champion[0]["scc_id"]
    core = labels.map_batches(
        lambda t, _c=core_id: pa.table(
            {"node": t.column("node")}
        ).filter(pc.equal(t.column("scc_id"), _c)),
        batch_format="pyarrow",
    ).materialize()
    fwd = _directed_reach(core, e, True, max_rounds)
    bwd = _directed_reach(core, e, False, max_rounds)
    parts = default_join_partitions()

    def flagged(ds: rd.Dataset, name: str) -> rd.Dataset:
        return ds.map_batches(
            lambda t, _n=name: pa.table(
                {
                    "node": t.column("node"),
                    _n: pa.array([1] * t.num_rows, pa.int8()),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    nodes = labels.select_columns(["node"])
    j = safe_join(
        nodes, flagged(core, "_core"), join_type="left_outer",
        num_partitions=parts, on=("node",),
    )
    j = safe_join(
        j, flagged(fwd, "_fwd"), join_type="left_outer",
        num_partitions=parts, on=("node",),
    )
    j = safe_join(
        j, flagged(bwd, "_bwd"), join_type="left_outer",
        num_partitions=parts, on=("node",),
    )

    def classify(t: pa.Table) -> pa.Table:
        import numpy as np

        is_core = pc.is_valid(t.column("_core")).to_numpy(zero_copy_only=False)
        is_fwd = pc.is_valid(t.column("_fwd")).to_numpy(zero_copy_only=False)
        is_bwd = pc.is_valid(t.column("_bwd")).to_numpy(zero_copy_only=False)
        zone = np.where(
            is_core, "core",
            np.where(is_fwd, "out", np.where(is_bwd, "in", "other")),
        )
        return pa.table(
            {
                "node": t.column("node"),
                "zone": pa.array(zone.tolist(), pa.string()),
            }
        )

    return j.map_batches(classify, batch_format="pyarrow")


def _edge_support(e: rd.Dataset) -> rd.Dataset:
    """Per-undirected-edge triangle support (ok_pair_key, support) over a
    distinct (a, b) edge set — triangle_counts' degree-ordered wedge join
    with the EDGES of each closed triangle exploded instead of its
    vertices (each triangle supports exactly its 3 edges). Edges in no
    triangle emit no row (support 0 by absence)."""
    import numpy as np

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    parts = default_join_partitions()
    deg = _undirected_degrees(e)

    def joined_deg(side: str, out: str) -> rd.Dataset:
        return deg.map_batches(
            lambda t, _s=side, _o=out: pa.table(
                {_s: t.column("node"), _o: t.column("deg")}
            ),
            batch_format="pyarrow",
        )

    ed = safe_join(
        safe_join(
            e.select_columns(["a", "b"]),
            joined_deg("a", "da"),
            join_type="inner",
            num_partitions=parts,
            on=("a",),
        ),
        joined_deg("b", "db"),
        join_type="inner",
        num_partitions=parts,
        on=("b",),
    )

    def orient_by_degree(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("a").to_pylist(), dtype=object)
        b = np.asarray(t.column("b").to_pylist(), dtype=object)
        da = t.column("da").to_numpy(zero_copy_only=False)
        db = t.column("db").to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        lo = np.where(a_first, a, b)
        hi = np.where(a_first, b, a)
        dhi = np.where(a_first, db, da)
        out = pa.table(
            {
                "lo": pa.array(lo.tolist(), pa.string()),
                "hi": pa.array(hi.tolist(), pa.string()),
                "dhi": pa.array(dhi, pa.int64()),
            }
        )
        return out.append_column(
            "ok", _pair_key(out.column("lo"), out.column("hi"))
        )

    e_or = ed.map_batches(orient_by_degree, batch_format="pyarrow").materialize()
    empty = pa.table(
        {"ok": pa.array([], pa.string()), "support": pa.array([], pa.int64())}
    )
    wedges = safe_join(
        e_or.select_columns(["lo", "hi", "dhi"]),
        e_or.select_columns(["lo", "hi", "dhi"]).map_batches(
            lambda t: t.rename_columns(["lo", "hi2", "dhi2"]),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=parts,
        on=("lo",),
    )

    def keep_ordered_wedges(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.or_(
            pc.less(t.column("dhi"), t.column("dhi2")),
            pc.and_(
                pc.equal(t.column("dhi"), t.column("dhi2")),
                pc.less(t.column("hi"), t.column("hi2")),
            ),
        )
        t = t.filter(keep)
        return t.append_column("ok3", _pair_key(t.column("hi"), t.column("hi2")))

    wedges = wedges.map_batches(
        keep_ordered_wedges, batch_format="pyarrow"
    ).materialize()
    if wedges.count() == 0:
        return rd.from_arrow(empty)

    def canon_key(x, y):
        # the wedge columns are DEGREE-oriented; support keys must match
        # the lexicographic (a < b) canonical edge key the peel joins on
        import pyarrow.compute as pc

        return _pair_key(pc.min_element_wise(x, y), pc.max_element_wise(x, y))

    closed = safe_join(
        wedges.map_batches(
            lambda t: pa.table(
                {
                    "ok12": canon_key(t.column("lo"), t.column("hi")),
                    "ok13": canon_key(t.column("lo"), t.column("hi2")),
                    "ok23": canon_key(t.column("hi"), t.column("hi2")),
                    "ok": t.column("ok3"),
                }
            ),
            batch_format="pyarrow",
        ),
        e_or.select_columns(["ok"]).map_batches(
            lambda t: t.append_column(
                "_hit", pa.array([1] * t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        ),
        join_type="inner",
        num_partitions=parts,
        on=("ok",),
    )

    def explode_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "ok": pa.concat_arrays(
                    [
                        t.column("ok12").combine_chunks(),
                        t.column("ok13").combine_chunks(),
                        t.column("ok23").combine_chunks(),
                    ]
                )
            }
        )

    sup = (
        closed.map_batches(explode_edges, batch_format="pyarrow")
        .groupby("ok")
        .aggregate(Count(alias_name="support"))
        .materialize()
    )
    return sup if sup.count() else rd.from_arrow(empty)


def k_truss(
    edges: rd.Dataset,
    k: int = 3,
    rounds: int = 4,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
) -> rd.Dataset:
    """k-truss decomposition (Cohen 2008): the maximal subgraph where
    every EDGE sits in ≥ k−2 triangles — the cohesion mesh between k-core
    (too loose) and cliques (too strict). Iterative edge peeling with a
    FIXED round bound and early stop (the k_core convention, so a SQL
    twin unrolls the identical recurrence and extra rounds are no-ops):
    each round computes per-edge triangle support via the degree-ordered
    wedge join (O(m^1.5) wedges even with hubs) and drops edges below
    k−2; the FINAL support is recomputed once over the surviving set, so
    the emitted numbers describe the truss itself, matching the twin's
    last CTE. Output: (node_a, node_b, support), a < b.
    """
    import pyarrow.compute as pc

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    parts = default_join_partitions()
    cur = _undirected_distinct_edges(edges, src, dst).materialize()
    empty = pa.table(
        {
            "node_a": pa.array([], pa.string()),
            "node_b": pa.array([], pa.string()),
            "support": pa.array([], pa.int64()),
        }
    )

    def filtered(support: rd.Dataset) -> rd.Dataset:
        return support.map_batches(
            lambda t, _m=k - 2: t.filter(
                pc.greater_equal(t.column("support"), _m)
            ),
            batch_format="pyarrow",
        )

    for _ in range(rounds):
        n_cur = cur.count()
        if n_cur == 0:
            return rd.from_arrow(empty)
        sup = _edge_support(cur)
        keep = filtered(sup).materialize()
        if keep.count() == 0:
            return rd.from_arrow(empty)
        nxt = safe_join(
            cur.map_batches(
                lambda t: t.append_column(
                    "ok", _pair_key(t.column("a"), t.column("b"))
                ),
                batch_format="pyarrow",
            ),
            keep.select_columns(["ok"]),
            join_type="inner",
            num_partitions=parts,
            on=("ok",),
        ).select_columns(["a", "b"]).materialize()
        if nxt.count() == n_cur:  # fixpoint — no edge dropped this round
            cur = nxt
            break
        cur = nxt
    if cur.count() == 0:
        return rd.from_arrow(empty)
    final_sup = filtered(_edge_support(cur)).materialize()
    if final_sup.count() == 0:
        return rd.from_arrow(empty)
    out = safe_join(
        cur.map_batches(
            lambda t: t.append_column(
                "ok", _pair_key(t.column("a"), t.column("b"))
            ),
            batch_format="pyarrow",
        ),
        final_sup,
        join_type="inner",
        num_partitions=parts,
        on=("ok",),
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "node_a": t.column("a"),
                "node_b": t.column("b"),
                "support": t.column("support"),
            }
        ),
        batch_format="pyarrow",
    )


def hill_alpha(
    edges: rd.Dataset,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
    dmin: int = 2,
) -> rd.Dataset:
    """Hill maximum-likelihood estimator of the degree-distribution
    power-law exponent (Clauset–Shalizi–Newman 2009's discrete
    approximation): α = 1 + n / Σ ln(d_i/dmin) over the tail d_i ≥ dmin —
    the one-number web-graph-shape diagnostic (the web's in-degree tail
    famously sits near α ≈ 2.1). Log terms quantize to the int 1e-6
    lattice (the docs_entropy convention) so the SQL twin is value-exact;
    the division is HUGEINT-ranged with truncation.

    Scale shape: distinct directed edges → symmetric explode → one keyed
    degree count (vocabulary-sized); the only driver residents are the
    two sufficient statistics (n, Σlog). Output: one row
    (n_tail, s_e6, alpha_e6); alpha_e6 = 0 when the tail is empty or
    every tail degree equals dmin (Σ = 0, the estimator diverges).
    """
    import numpy as np

    from graphiti_ray.stages.ops import distinct_by_key

    def norm(t: pa.Table) -> pa.Table:
        s = t.column(src).cast(pa.string())
        d = t.column(dst).cast(pa.string())
        return pa.table(
            {"s": s, "t": d, "_k": pc.binary_join_element_wise(s, d, "\x01")}
        )

    e = distinct_by_key(
        edges.select_columns([src, dst]).map_batches(
            norm, batch_format="pyarrow", zero_copy_batch=True
        ),
        "_k",
    ).drop_columns(["_k"])
    deg = (
        e.map_batches(
            lambda t: pa.table(
                {
                    "node": pa.concat_arrays(
                        [
                            t.column("s").combine_chunks(),
                            t.column("t").combine_chunks(),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .aggregate(Count(alias_name="deg"))
    )

    def tail_terms(t: pa.Table, _m=dmin) -> pa.Table:
        d = t.column("deg").to_numpy(zero_copy_only=False)
        d = d[d >= _m]
        li = np.rint(np.log(d.astype(np.float64)) * 1_000_000).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(d)], pa.int64()),
                "sl": pa.array([int(li.sum())], pa.int64()),
            }
        )

    stats = deg.map_batches(tail_terms, batch_format="pyarrow")
    n = stats.sum("n") or 0
    sl = stats.sum("sl") or 0
    lmin = int(np.rint(np.log(float(dmin)) * 1_000_000))
    s_e6 = sl - n * lmin
    if n == 0 or s_e6 <= 0:
        alpha = 0
    else:
        alpha = 1_000_000 + (n * 10**12) // s_e6
    return rd.from_arrow(
        pa.table(
            {
                "n_tail": pa.array([n], pa.int64()),
                "s_e6": pa.array([s_e6], pa.int64()),
                "alpha_e6": pa.array([alpha], pa.int64()),
            }
        )
    )


def rich_club(
    edges: rd.Dataset,
    ks: list[int] | None = None,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
    rich_broadcast_limit: int = 5_000_000,
) -> rd.Dataset:
    """Rich-club coefficient (Zhou & Mondragón 2004) over the undirected
    distinct edge set: for each threshold k, the subgraph on nodes with
    degree > k has φ(k) = 2·E_k / (N_k·(N_k−1)) — how preferentially the
    hubs wire to EACH OTHER, the web/internet-topology census statistic.
    Exact integer lattice: phi_e6 = (2·E_k·10⁶) // (N_k·(N_k−1)).

    One degree pass + per-k membership test, two-path (the adamic_adar
    convention): the rich-node set ships ONCE via ``ray.put`` and each
    batch filters with ``pc.is_in`` while it fits
    ``rich_broadcast_limit``; above that (small k ≈ the whole node
    vocabulary) two hash-partitioned semi-joins on the edge endpoints
    count E_k without any driver-side node set. Output: (k, n_nodes,
    n_edges, phi_e6); degenerate club (N_k < 2) → phi_e6 = 0.
    """
    import ray

    from graphiti_ray.stages.link import (
        _cached_lut,
        default_join_partitions,
        safe_join,
    )

    ks = list(ks) if ks is not None else [1, 2, 3, 4, 5]
    e = _undirected_distinct_edges(edges, src, dst).materialize()
    deg = _undirected_degrees(e).materialize()
    rows = []
    for k in sorted(set(ks)):
        rich = (
            deg.map_batches(
                lambda t, _k=k: t.filter(pc.greater(t.column("deg"), _k)),
                batch_format="pyarrow",
            )
            .select_columns(["node"])
            .materialize()
        )
        n_nodes = rich.count()
        if n_nodes <= rich_broadcast_limit:
            rich_arr = pa.concat_arrays(
                [
                    b.column("node").combine_chunks()
                    for b in rich.iter_batches(
                        batch_format="pyarrow", batch_size=None
                    )
                ]
            ) if n_nodes else pa.array([], pa.string())
            rref = ray.put(rich_arr)

            def in_club(t: pa.Table, _ref=rref) -> pa.Table:
                arr = _cached_lut(_ref)
                keep = pc.and_(
                    pc.is_in(t.column("a"), value_set=arr),
                    pc.is_in(t.column("b"), value_set=arr),
                )
                return t.filter(keep)

            n_edges = e.map_batches(in_club, batch_format="pyarrow").count()
        else:
            parts = default_join_partitions()
            club = e.select_columns(["a", "b"])
            for side in ("a", "b"):
                club = safe_join(
                    club,
                    rich.map_batches(
                        lambda t, _s=side: t.rename_columns([_s]),
                        batch_format="pyarrow",
                    ),
                    join_type="inner",
                    num_partitions=parts,
                    on=(side,),
                )
            n_edges = club.count()
        denom = n_nodes * (n_nodes - 1)
        phi = (2 * n_edges * 1_000_000) // denom if denom > 0 else 0
        rows.append((k, n_nodes, n_edges, phi))
    return rd.from_arrow(
        pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "n_nodes": pa.array([r[1] for r in rows], pa.int64()),
                "n_edges": pa.array([r[2] for r in rows], pa.int64()),
                "phi_e6": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
    )


def negative_samples(
    edges: rd.Dataset,
    attempts: int = 4,
    id_col: str = "uuid",
    src: str = "subj_uuid",
    pred_col: str = "pred",
    dst: str = "obj_uuid",
    triple_key_broadcast_limit: int = 5_000_000,
) -> rd.Dataset:
    """Filtered negative sampling for KG link-prediction training
    (Bordes et al. 2013, TransE): every positive (subj, pred, obj) edge
    spawns up to ``attempts`` corrupted negatives by replacing the
    object with a DETERMINISTIC pick from the entity vocabulary —
    candidate(a) = entities[int(md5(uuid ':' a)[:8], 16) % n] (the
    web_walks md5 arithmetic, so the SQL twin replays every pick) —
    keeping a candidate only if it differs from the true object and the
    corrupted triple is not itself a real edge (the 'filtered' setting).

    Scale shape: one streaming pass; the entity vocabulary is broadcast
    once via ``ray.put`` (vocabulary-sized). The true-triple key set is
    edge-count-sized, so its 'filtered' check is two-path (the
    adamic_adar convention): broadcast + ``pc.is_in`` under
    ``triple_key_broadcast_limit`` edges, hash-partitioned ``left_anti``
    join of the candidate triples against the edge table above it.

    Output: (uuid, attempt, neg_obj_uuid).
    """
    import hashlib

    import numpy as np
    import pyarrow.compute as pc
    import ray

    from graphiti_ray.stages.link import _cached_lut
    from graphiti_ray.stages.ops import distinct_by_key

    narrow = edges.select_columns([id_col, src, pred_col, dst]).materialize()
    ents_ds = distinct_by_key(
        _symmetric(narrow, src, dst).map_batches(
            lambda t: pa.table({"e": t.column("x")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "e",
    )
    ents = np.sort(
        np.asarray(ents_ds.to_pandas()["e"].to_numpy(), dtype=object)
    )
    n_ents = len(ents)
    empty = pa.table(
        {
            "uuid": pa.array([], pa.string()),
            "attempt": pa.array([], pa.int64()),
            "neg_obj_uuid": pa.array([], pa.string()),
        }
    )
    if n_ents == 0:
        return rd.from_arrow(empty)

    def triple_key(s, p, o) -> pa.Array:
        return pc.binary_join_element_wise(s, p, o, "|")

    broadcast_ok = narrow.count() <= triple_key_broadcast_limit
    if broadcast_ok:
        keys = pa.concat_arrays(
            [
                triple_key(b.column(src), b.column(pred_col), b.column(dst))
                .combine_chunks()
                for b in narrow.select_columns(
                    [src, pred_col, dst]
                ).iter_batches(batch_format="pyarrow", batch_size=None)
            ]
        )
    else:
        keys = None  # filtered check moves to a left_anti join below
    ref = ray.put((ents, keys))

    def corrupt(batch: pa.Table, _ref=ref) -> pa.Table:
        ents_, keys_ = _cached_lut(_ref)
        uu = batch.column(id_col).to_pylist()
        ss = batch.column(src).to_pylist()
        pp = batch.column(pred_col).to_pylist()
        oo = batch.column(dst).to_pylist()
        o_u, o_a, o_n, o_s, o_p = [], [], [], [], []
        for u, s, p, o in zip(uu, ss, pp, oo):
            for a in range(attempts):
                h = int(hashlib.md5(f"{u}:{a}".encode()).hexdigest()[:8], 16)
                cand = ents_[h % len(ents_)]
                if cand == o:
                    continue
                o_u.append(u)
                o_a.append(a)
                o_n.append(cand)
                o_s.append(s)
                o_p.append(p)
        if not o_u:
            return empty if keys_ is not None else empty.append_column(
                "_tk", pa.array([], pa.string())
            )
        tbl = pa.table(
            {
                "uuid": pa.array(o_u, pa.string()),
                "attempt": pa.array(o_a, pa.int64()),
                "neg_obj_uuid": pa.array(o_n, pa.string()),
                "_s": pa.array(o_s, pa.string()),
                "_p": pa.array(o_p, pa.string()),
            }
        )
        tk = triple_key(
            tbl.column("_s"), tbl.column("_p"), tbl.column("neg_obj_uuid")
        )
        if keys_ is not None:
            real = pc.is_in(tk, value_set=keys_)
            return tbl.filter(pc.invert(real)).select(
                ["uuid", "attempt", "neg_obj_uuid"]
            )
        return tbl.append_column("_tk", tk).select(
            ["uuid", "attempt", "neg_obj_uuid", "_tk"]
        )

    cands = narrow.map_batches(
        corrupt, batch_format="pyarrow", zero_copy_batch=True
    )
    if broadcast_ok:
        return cands

    from graphiti_ray.stages.link import default_join_partitions, safe_join

    true_keys = narrow.map_batches(
        lambda t: pa.table(
            {"_tk": triple_key(t.column(src), t.column(pred_col), t.column(dst))}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return safe_join(
        cands,
        true_keys,
        join_type="left_anti",
        num_partitions=default_join_partitions(),
        on=("_tk",),
    ).select_columns(["uuid", "attempt", "neg_obj_uuid"])


def common_neighbor_counts(
    edges: rd.Dataset,
    join_on: str = "src",
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
    top_n: int = 200,
) -> rd.Dataset:
    """Co-citation (Small 1973) / bibliographic coupling (Kessler 1963)
    over the DIRECTED distinct edge set — the two classic directional
    common-neighbor statistics of web/citation analysis:

    - ``join_on="src"`` → co-citation: n(a, b) = |{v : v→a and v→b}|
      (pages cited together — wedges share their SOURCE);
    - ``join_on="dst"`` → coupling: n(a, b) = |{v : a→v and b→v}|
      (pages citing the same things — wedges share their TARGET).

    One keyed self-join on the shared endpoint, per-batch pair-count
    combiner, one keyed sum, top_n by (n desc, a, b) — the
    :func:`neighborhood_jaccard` shape on the directed graph with no
    degree joins. Output: (node_a, node_b, n).
    """
    import pyarrow.compute as pc

    from graphiti_ray.stages.link import default_join_partitions, safe_join
    from graphiti_ray.stages.ops import distinct_by_key

    def orient(batch: pa.Table) -> pa.Table:
        tbl = pa.table({"s": batch.column(src), "t": batch.column(dst)})
        tbl = tbl.filter(pc.not_equal(tbl.column("s"), tbl.column("t")))
        return tbl.append_column("ek", _pair_key(tbl.column("s"), tbl.column("t")))

    e = distinct_by_key(
        edges.map_batches(orient, batch_format="pyarrow", zero_copy_batch=True),
        "ek",
    ).materialize()
    shared, other = ("s", "t") if join_on == "src" else ("t", "s")

    adj = e.map_batches(
        lambda t: pa.table({"v": t.column(shared), "nbr": t.column(other)}),
        batch_format="pyarrow",
    ).materialize()
    wedges = safe_join(
        adj,
        adj.map_batches(
            lambda t: t.rename_columns(["v", "nbr2"]), batch_format="pyarrow"
        ),
        join_type="inner",
        num_partitions=default_join_partitions(),
        on=("v",),
    )

    def combine(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("nbr"), t.column("nbr2")))
        if t.num_rows == 0:
            return pa.table(
                {
                    "node_a": pa.array([], pa.string()),
                    "node_b": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                }
            )
        part = (
            pa.table({"node_a": t.column("nbr"), "node_b": t.column("nbr2")})
            .group_by(["node_a", "node_b"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "node_a": part.column("node_a"),
                "node_b": part.column("node_b"),
                "c": pc.cast(part.column("count_all"), pa.int64()),
            }
        )

    return (
        wedges.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["node_a", "node_b"])
        .aggregate(Sum("c", alias_name="n"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node_a": pc.cast(t.column("node_a"), pa.string()),
                    "node_b": pc.cast(t.column("node_b"), pa.string()),
                    "n": pc.cast(t.column("n"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["n", "node_a", "node_b"], descending=[True, False, False])
        .limit(top_n)
    )


def distance_histogram(
    edges: rd.Dataset,
    max_depth: int = 6,
    src: str = "subj_uuid",
    dst: str = "obj_uuid",
) -> rd.Dataset:
    """Directed distance histogram (the neighbourhood function N(d) of
    web-graph analysis — HyperANF's exact small-graph counterpart):
    n_pairs(d) = |{(u, v) : d(u, v) = d}| for 1 ≤ d ≤ max_depth; the
    diameter is the largest d with a row, the effective diameter the
    d where the cumulative sum crosses 90%. Same dataset-side layered
    BFS as :func:`harmonic_centrality`, seeded with EVERY node — the
    (seed, node) frontier/visited sets are Datasets, one hash join + one
    distinct set-difference per round, one count per depth.

    Output: (d, n_pairs)."""
    from ray.data.aggregate import Count

    from graphiti_ray.stages.link import default_join_partitions, safe_join
    from graphiti_ray.stages.ops import dataset_except, distinct_by_key

    e = edges.select_columns([src, dst]).map_batches(
        lambda t: t.rename_columns(["node", "nxt"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    nodes = distinct_by_key(
        _symmetric(edges, src, dst).map_batches(
            lambda t: pa.table({"node": t.column("x")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        "node",
    )
    frontier = nodes.map_batches(
        lambda t: pa.table({"seed": t.column("node"), "node": t.column("node")}),
        batch_format="pyarrow",
    ).materialize()
    visited = frontier
    rows = []
    for depth in range(1, max_depth + 1):
        stepped = safe_join(
            frontier,
            e,
            join_type="inner",
            num_partitions=default_join_partitions(),
            on=("node",),
        ).map_batches(
            lambda t: pa.table({"seed": t.column("seed"), "node": t.column("nxt")}),
            batch_format="pyarrow",
        )
        fresh = dataset_except(stepped, visited, ["seed", "node"]).materialize()
        n = fresh.count()
        if n == 0:
            break
        rows.append({"d": depth, "n_pairs": int(n)})
        visited = visited.union(fresh).materialize()
        frontier = fresh
    if not rows:
        return rd.from_arrow(
            pa.table(
                {"d": pa.array([], pa.int64()), "n_pairs": pa.array([], pa.int64())}
            )
        )
    return rd.from_items(rows)


def stress_centrality(
    edges: rd.Dataset,
    src: str = "src_host",
    dst: str = "dst_host",
    max_depth: int = 6,
) -> rd.Dataset:
    """Stress centrality (Shimbel 1953): ``stress(v) = Σ_{s≠t≠v} σ_st(v)``
    — the number of shortest directed s→t paths passing through v. The
    integer-exact sibling of betweenness (which divides by σ_st and would
    leave the exact lattice), so the SQL twin hashes bit-for-bit.

    Three dataset-side phases, never a driver-resident graph (extends the
    layered-BFS shape of ``harmonic_centrality`` / reference BFS
    search_utils.py:272-324 with Brandes-style path counting):

    1. **all-sources BFS with σ counting** — frontier rows ``(s, node,
       sigma)``; per round one hash join frontier⋈edges, a ``groupby(s,
       node)`` summing σ (the Brandes recurrence σ(s,v) = Σ_{u∈pred}
       σ(s,u) — only last-layer nodes are in the frontier, so every
       contribution is from depth d−1), then a ``left_anti`` join against
       the visited set so only first-reached (= shortest-distance) layers
       survive. Bounded by ``max_depth``.
    2. **midpoint join** — AP(s,v) ⋈ AP(v,t) on v gives candidate routes
       with length d1+d2 and path product σ1·σ2 (s≠t filtered; v≠s and
       v≠t hold automatically since layers have d ≥ 1).
    3. **shortest-only filter** — join candidates back to AP on (s,t) and
       keep d1+d2 = d(s,t); ``groupby(v)`` sums σ1·σ2.

    The all-sources phase is |S|·|V| pairs: run it on a vocabulary-sized
    graph (the per-host graph after the distributed page-level link
    extraction) or pass a seed-restricted edge set — same contract as
    harmonic_centrality. The SQL twin computes σ as bounded aggregated
    matrix powers: a walk of length exactly d(s,t) cannot revisit a node,
    so the level-d(s,t) walk count equals σ_st."""
    from graphiti_ray.stages.link import default_join_partitions, safe_join

    nparts = default_join_partitions()

    def as_edge(t: pa.Table) -> pa.Table:
        tt = pa.table(
            {
                "node": t.column(src).cast(pa.string()),
                "nxt": t.column(dst).cast(pa.string()),
            }
        )
        g = tt.group_by(["node", "nxt"]).aggregate([([], "count_all")])
        return g.drop_columns([g.column_names[-1]])

    e = (
        edges.select_columns([src, dst])
        .map_batches(as_edge, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["node", "nxt"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .materialize()
    )

    def node_sides(t: pa.Table) -> pa.Table:
        arr = pa.concat_arrays(
            [t.column("node").combine_chunks(), t.column("nxt").combine_chunks()]
        )
        return pa.table({"node": pc.unique(arr)})

    nodes = (
        e.map_batches(node_sides, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
    )
    frontier = nodes.map_batches(
        lambda t: pa.table(
            {
                "s": t.column("node"),
                "node": t.column("node"),
                "sigma": pa.array([1] * t.num_rows, pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    visited = frontier.select_columns(["s", "node"]).materialize()
    layers: list[rd.Dataset] = []
    for depth in range(1, max_depth + 1):
        stepped = safe_join(
            frontier, e, join_type="inner", num_partitions=nparts, on=("node",)
        ).map_batches(
            lambda t: pa.table(
                {
                    "s": t.column("s"),
                    "node": t.column("nxt"),
                    "sigma": t.column("sigma"),
                }
            ),
            batch_format="pyarrow",
        )
        agg = stepped.groupby(["s", "node"]).aggregate(
            Sum("sigma", alias_name="sigma")
        ).materialize()
        # ray 2.49 landmine: an ALL-empty join input crashes the hash
        # shuffle (the empty block early-returns before the schema
        # broadcast — hash_shuffle.py:223 — leaving the aggregators
        # schema-less); a frontier of pure sinks produces exactly that,
        # so stop before the anti-join, not after it.
        if agg.count() == 0:
            break
        fresh = safe_join(
            agg,
            visited,
            join_type="left_anti",
            num_partitions=nparts,
            on=("s", "node"),
        ).materialize()
        if fresh.count() == 0:
            break
        # fresh is already materialized: the depth-stamp map and the
        # visited union stay lazy (metadata-only over materialized
        # blocks) — 2 fewer barriers per BFS round
        layers.append(
            fresh.map_batches(
                lambda t, _d=depth: t.append_column(
                    "d", pa.array([_d] * t.num_rows, pa.int64())
                ),
                batch_format="pyarrow",
            )
        )
        visited = visited.union(fresh.select_columns(["s", "node"]))
        frontier = fresh
    if not layers:
        return rd.from_arrow(
            pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "stress": pa.array([], pa.int64()),
                }
            )
        )
    ap = layers[0]
    for layer in layers[1:]:
        ap = ap.union(layer)
    ap = ap.materialize()

    left = ap.map_batches(
        lambda t: pa.table(
            {
                "s": t.column("s"),
                "v": t.column("node"),
                "d1": t.column("d"),
                "sig1": t.column("sigma"),
            }
        ),
        batch_format="pyarrow",
    )
    right = ap.map_batches(
        lambda t: pa.table(
            {
                "v": t.column("s"),
                "t2": t.column("node"),
                "d2": t.column("d"),
                "sig2": t.column("sigma"),
            }
        ),
        batch_format="pyarrow",
    )

    def route(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t.column("s"), t.column("t2"))
        t = t.filter(keep)
        return pa.table(
            {
                "s": t.column("s"),
                "t2": t.column("t2"),
                "v": t.column("v"),
                "dsum": pc.add(t.column("d1"), t.column("d2")),
                "sp": pc.multiply(t.column("sig1"), t.column("sig2")),
            }
        )

    mid = safe_join(
        left, right, join_type="inner", num_partitions=nparts, on=("v",)
    ).map_batches(route, batch_format="pyarrow").materialize()
    if mid.count() == 0:  # e.g. single-edge graphs: no 2-hop routes at all
        return rd.from_arrow(
            pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "stress": pa.array([], pa.int64()),
                }
            )
        )
    dist = ap.map_batches(
        lambda t: pa.table(
            {
                "s": t.column("s"),
                "t2": t.column("node"),
                "dmin": t.column("d"),
            }
        ),
        batch_format="pyarrow",
    )
    on_path = safe_join(
        mid, dist, join_type="inner", num_partitions=nparts, on=("s", "t2")
    ).map_batches(
        lambda t: t.filter(pc.equal(t.column("dsum"), t.column("dmin"))),
        batch_format="pyarrow",
    )
    return (
        on_path.groupby("v")
        .aggregate(Sum("sp", alias_name="stress"))
        .map_batches(
            lambda t: pa.table(
                {"host": t.column("v"), "stress": t.column("stress")}
            ),
            batch_format="pyarrow",
        )
    )


def _triad_tables():
    """(canon, names): canon maps each of the 64 directed pair-state
    configs (s_ab·16 + s_ac·4 + s_bc; s = bit0 fwd | bit1 back) to its
    canonical orbit representative under the 6 node permutations; names
    maps the 16 orbits to the standard Holland–Leinhardt MAN labels.
    Brute-forced at import (64·6 tiny ops) so both engines share the
    identical literal table — the SQL twin embeds it as VALUES rows."""
    from itertools import permutations, product

    def edges_of(cfg):
        s_ab, s_ac, s_bc = cfg
        e = set()
        if s_ab & 1:
            e.add((0, 1))
        if s_ab & 2:
            e.add((1, 0))
        if s_ac & 1:
            e.add((0, 2))
        if s_ac & 2:
            e.add((2, 0))
        if s_bc & 1:
            e.add((1, 2))
        if s_bc & 2:
            e.add((2, 1))
        return e

    def idx_of(e):
        def st(x, y):
            return (1 if (x, y) in e else 0) | (2 if (y, x) in e else 0)

        return st(0, 1) * 16 + st(0, 2) * 4 + st(1, 2)

    canon = {}
    for cfg in product(range(4), repeat=3):
        e = edges_of(cfg)
        best = min(
            idx_of({(p[u], p[v]) for u, v in e})
            for p in permutations(range(3))
        )
        canon[cfg[0] * 16 + cfg[1] * 4 + cfg[2]] = best
    names = {
        0: "003", 1: "012", 3: "102", 5: "021U", 6: "021C", 10: "021D",
        7: "111D", 11: "111U", 21: "030T", 25: "030C", 15: "201",
        23: "120D", 27: "120C", 30: "120U", 31: "210", 63: "300",
    }
    return canon, names


TRIAD_CANON, TRIAD_NAMES = _triad_tables()


def triad_census(
    edges: rd.Dataset, src: str = "src_host", dst: str = "dst_host"
) -> rd.Dataset:
    """Directed triad census (Holland & Leinhardt 1976; the motif
    fingerprint of Milo et al. 2002) → ``(triad, n)`` over all unordered
    node triples, classified into the 16 isomorphism classes (003 … 300).

    Scale contract (same as stress/ego): the distributed work is the
    page-level edge extraction feeding this; the HOST graph itself is
    vocabulary-sized, so the distinct edge set and sorted node array are
    broadcast once and the O(V³) triple enumeration fans out over node
    batches (each node a owns the triples where it is the smallest
    element). For graphs where V³ is not tractable, sample the node set
    upstream — the census is distribution-shaped, not row-exact, at that
    point. Self-loops are ignored (they belong to no pair state)."""
    import ray

    from ray.data.aggregate import Sum

    e = (
        edges.select_columns([src, dst])
        .map_batches(
            lambda t: pa.table(
                {
                    "s": t.column(src).cast(pa.string()),
                    "t": t.column(dst).cast(pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby(["s", "t"])
        .aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .take_all()
    )
    edge_set = {(r["s"], r["t"]) for r in e}
    nodes = sorted({x for p in edge_set for x in p})
    ref = ray.put((edge_set, nodes))
    nodes_ds = rd.from_arrow(pa.table({"node": pa.array(nodes, pa.string())}))

    def census(batch: pa.Table, _ref=ref) -> pa.Table:
        import ray as _ray

        es, nd = _ray.get(_ref)
        pos = {v: i for i, v in enumerate(nd)}

        def st(x, y):
            return (1 if (x, y) in es else 0) | (2 if (y, x) in es else 0)

        counts: dict[str, int] = {}
        for a in batch.column("node").to_pylist():
            ia = pos[a]
            for ib in range(ia + 1, len(nd)):
                b = nd[ib]
                sab = st(a, b)
                for ic in range(ib + 1, len(nd)):
                    c = nd[ic]
                    idx = sab * 16 + st(a, c) * 4 + st(b, c)
                    name = TRIAD_NAMES[TRIAD_CANON[idx]]
                    counts[name] = counts.get(name, 0) + 1
        return pa.table(
            {
                "triad": pa.array(list(counts), pa.string()),
                "c": pa.array(list(counts.values()), pa.int64()),
            }
        )

    return (
        nodes_ds.map_batches(census, batch_format="pyarrow")
        .groupby("triad")
        .aggregate(Sum("c", alias_name="n"))
    )
