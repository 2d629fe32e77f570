"""Graph-structural operators: degrees, BFS, label propagation, communities."""

import pandas as pd
import pytest

import ray.data as rd

from graphiti_ray.stages.graph import (
    bfs_frontier,
    build_communities,
    label_propagation,
    node_degrees,
    node_distances,
)


def _edges(pairs):
    return rd.from_items([{"subj_uuid": a, "obj_uuid": b} for a, b in pairs])


def test_node_degrees(ray_session):
    out = node_degrees(_edges([("a", "b"), ("a", "c"), ("b", "c")])).to_pandas()
    deg = dict(zip(out.entity_uuid, out.degree))
    assert deg == {"a": 2, "b": 2, "c": 2}


def test_bfs_frontier_depths(ray_session):
    # chain a-b-c-d-e: from a, depth 3 reaches d but not e
    out = bfs_frontier(
        _edges([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]), ["a"], max_depth=3
    )
    d = dict(zip(out.entity_uuid, out.depth))
    assert d == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_node_distances_center(ray_session):
    out = node_distances(_edges([("x", "y"), ("y", "z")]), "x")
    d = dict(zip(out.entity_uuid, out.depth))
    assert d["x"] == 0 and d["y"] == 1 and d["z"] == 2


def test_label_propagation_two_cliques(ray_session):
    # two triangles joined by nothing → two communities
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z")]
    out = label_propagation(_edges(pairs)).to_pandas()
    comm = dict(zip(out.node, out.community))
    assert comm["a"] == comm["b"] == comm["c"]
    assert comm["x"] == comm["y"] == comm["z"]
    assert comm["a"] != comm["x"]


def test_build_communities(ray_session):
    nodes = rd.from_items(
        [
            {"uuid": u, "name": f"N{u}", "group_id": "g", "summary": f"S{u}"}
            for u in ["a", "b", "c"]
        ]
    )
    edges = _edges([("a", "b"), ("b", "c"), ("a", "c")])
    out = build_communities(nodes, edges)
    comms = out["communities"].to_pandas()
    members = out["community_edges"].to_pandas()
    assert len(comms) == 1
    assert comms.iloc[0].n_members == 3
    assert len(members) == 3
    assert set(members.entity_uuid) == {"a", "b", "c"}
    # deterministic tree-reduced summary contains every member summary
    for s in ["Sa", "Sb", "Sc"]:
        assert s in comms.iloc[0].summary


def test_label_propagation_50k_nodes_round_time(ray_session):
    """Scale smoke: the vectorized vote (sorted_run_map kernel) must handle
    a 50k-node graph in bounded wall time. The former per-node map_groups
    dispatch cost ~1ms/node/round (≥50s/round at this size); the block
    kernel runs in seconds. Bound is generous for hypervisor noise."""
    import time

    import numpy as np

    n = 50_000
    rng = np.random.RandomState(7)
    # ring + random chords: connected, converges slowly enough to run
    # the full 2 rounds we time
    src = np.arange(n)
    dst = (src + 1) % n
    chord_src = rng.randint(0, n, size=n // 2)
    chord_dst = rng.randint(0, n, size=n // 2)
    tbl = {
        "subj_uuid": [f"n{i:06d}" for i in np.concatenate([src, chord_src])],
        "obj_uuid": [f"n{i:06d}" for i in np.concatenate([dst, chord_dst])],
    }
    import pyarrow as pa

    edges = rd.from_arrow(pa.table(tbl))
    t0 = time.monotonic()
    out = label_propagation(edges, max_rounds=2)
    n_labeled = out.count()
    wall = time.monotonic() - t0
    assert n_labeled == n
    assert wall < 90, f"2 LPA rounds on 50k nodes took {wall:.1f}s"


def test_pagerank_matches_dense_reference(ray_session):
    """Distributed rounds vs a dense numpy evaluation of the same
    recurrence (simplified PageRank, dangling mass evaporates): equal to
    float tolerance; the hub out-ranks leaves."""
    import numpy as np
    import ray.data as rd_

    from graphiti_ray.stages.graph import pagerank

    # star into 'hub' + a chain + a sink
    pairs = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "d"),
             ("d", "e"), ("a", "b")]
    edges = rd_.from_items(
        [{"subj_uuid": s, "obj_uuid": t} for s, t in pairs]
    )
    got = {
        r["entity_uuid"]: r["rank"]
        for r in pagerank(edges, damping=0.85, rounds=5).take_all()
    }

    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s, _t in pairs:
        outdeg[idx[s]] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(5):
        acc = np.zeros(n)
        for s, t in pairs:
            acc[idx[t]] += pr[idx[s]] / outdeg[idx[s]]
        pr = (1.0 - 0.85) / n + 0.85 * acc
    for v in nodes:
        assert abs(got[v] - pr[idx[v]]) < 1e-9, v
    # the hub out-ranks each of its in-neighbors (rank flows downhill
    # through the funnel, so d/e legitimately rank above the hub)
    assert all(got["hub"] > got[v] for v in ("a", "b", "c"))
    assert sum(got.values()) <= 1.0 + 1e-9  # evaporating dangling mass


def test_triangle_counts_toy_graph(ray_session):
    """One triangle + a dangling edge: exactly the triangle's vertices
    counted once each; direction and duplicate edges are irrelevant
    (undirected distinct orientation)."""
    import ray.data as rd_

    from graphiti_ray.stages.graph import triangle_counts

    edges = rd_.from_items(
        [
            {"subj_uuid": "a", "obj_uuid": "b"},
            {"subj_uuid": "b", "obj_uuid": "a"},  # duplicate, reversed
            {"subj_uuid": "b", "obj_uuid": "c"},
            {"subj_uuid": "c", "obj_uuid": "a"},
            {"subj_uuid": "c", "obj_uuid": "d"},  # dangles
            {"subj_uuid": "e", "obj_uuid": "e"},  # self-loop dropped
        ]
    )
    out = {
        r["entity_uuid"]: r["n_triangles"]
        for r in triangle_counts(edges).take_all()
    }
    assert out == {"a": 1, "b": 1, "c": 1}


def test_pagerank_empty_graph_and_triangle_key_collisions(ray_session):
    """Edge cases: an empty edge set yields an empty ranking (no
    ZeroDivisionError), and node ids containing the pair-key separator
    can't collide (length-prefixed keys)."""
    import ray.data as rd_

    from graphiti_ray.stages.graph import pagerank, triangle_counts

    empty = rd_.from_items([]).map_batches(
        lambda t: t, batch_format="pandas"
    )
    import pyarrow as pa

    empty_edges = rd_.from_arrow(
        pa.table(
            {"subj_uuid": pa.array([], pa.string()),
             "obj_uuid": pa.array([], pa.string())}
        )
    )
    assert pagerank(empty_edges).count() == 0

    # with a plain '|' join, edges (x|y, z) and (x, y|z) would share a key
    edges = _edges([("x|y", "z"), ("x", "y|z")])
    out = triangle_counts(edges).take_all()
    assert out == []  # two disjoint edges — no phantom triangles


def test_k_core_peels_tail_and_keeps_clique(ray_session):
    """Classic 2-core: a triangle with a pendant path. Peeling removes the
    path (degree-1 ends cascade) and keeps the triangle, where every node
    has degree 2."""
    from graphiti_ray.stages.graph import k_core

    edges = pd.DataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "a"),  # triangle = the 2-core
            ("c", "d"), ("d", "e"),  # pendant path, peeled in 2 rounds
        ],
        columns=["subj_uuid", "obj_uuid"],
    )
    out = k_core(rd.from_pandas(edges), k=2, rounds=6).to_pandas()
    assert sorted(out.entity_uuid) == ["a", "b", "c"]
    assert (out.degree == 2).all()


def test_k_core_empty_and_whole_graph(ray_session):
    """k=1 keeps every non-isolated node; a high k empties the graph
    without a ZeroDivision/schema error."""
    from graphiti_ray.stages.graph import k_core

    edges = pd.DataFrame(
        [("a", "b"), ("b", "c")], columns=["subj_uuid", "obj_uuid"]
    )
    full = k_core(rd.from_pandas(edges), k=1, rounds=4).to_pandas()
    assert sorted(full.entity_uuid) == ["a", "b", "c"]
    empty = k_core(rd.from_pandas(edges), k=5, rounds=4).to_pandas()
    assert len(empty) == 0


def test_hits_matches_dense_reference(ray_session):
    """HITS: the distributed join+sum rounds must match a dense numpy
    power iteration with the same per-half-round L1 normalization."""
    import numpy as np

    from graphiti_ray.stages.graph import hits

    edges = pd.DataFrame(
        [
            ("a", "b"), ("a", "c"), ("a", "d"),   # a is a strong hub
            ("b", "d"), ("c", "d"),               # d is a strong authority
            ("e", "a"),
        ],
        columns=["subj_uuid", "obj_uuid"],
    )
    rounds = 4
    out = (
        hits(rd.from_pandas(edges), rounds=rounds)
        .to_pandas()
        .sort_values("entity_uuid")
        .reset_index(drop=True)
    )

    nodes = sorted(set(edges.subj_uuid) | set(edges.obj_uuid))
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, t in edges.itertuples(index=False):
        A[idx[s], idx[t]] += 1.0
    h = np.full(n, 1.0 / n)
    for _ in range(rounds):
        a = A.T @ h
        a = a / (a.sum() or 1.0)
        h = A @ a
        h = h / (h.sum() or 1.0)
    assert out.entity_uuid.tolist() == nodes
    assert np.allclose(out.hub.to_numpy(), h, atol=1e-12)
    assert np.allclose(out.authority.to_numpy(), a, atol=1e-12)
    # structure: a tops hubs, d tops authorities
    assert out.loc[out.hub.idxmax(), "entity_uuid"] == "a"
    assert out.loc[out.authority.idxmax(), "entity_uuid"] == "d"


def test_hits_empty_graph(ray_session):
    from graphiti_ray.stages.graph import hits

    edges = pd.DataFrame([], columns=["subj_uuid", "obj_uuid"])
    assert hits(rd.from_pandas(edges), rounds=3).count() == 0


def test_modularity_exact_on_two_cliques(ray_session):
    """Two disjoint triangles, one community each: S_A(c)=6 (3 undirected
    edges counted as ordered pairs), d_c=6, 2m=12 → q_num = 12·6 − 36 =
    36 per community; Q = 72/144 = 0.5, the textbook value."""
    import pyarrow as pa

    import ray.data as rd

    from graphiti_ray.stages.graph import modularity

    edges = [
        {"subj_uuid": a, "obj_uuid": b}
        for a, b in [("a", "b"), ("b", "c"), ("c", "a"),
                     ("x", "y"), ("y", "z"), ("z", "x")]
    ]
    labels = rd.from_items(
        [{"node": n, "community": "t1"} for n in "abc"]
        + [{"node": n, "community": "t2"} for n in "xyz"]
    )
    out = (
        modularity(rd.from_items(edges).repartition(2), labels)
        .to_pandas()
        .sort_values("community")
        .reset_index(drop=True)
    )
    assert out.community.tolist() == ["t1", "t2"]
    assert out.n_nodes.tolist() == [3, 3]
    assert out.s_a.tolist() == [6, 6]
    assert out.d_tot.tolist() == [6, 6]
    assert out.two_m.tolist() == [12, 12]
    assert out.q_num.tolist() == [36, 36]
    # Q = sum(q_num) / (2m)^2
    assert sum(out.q_num) / (12 * 12) == 0.5


def test_modularity_guard_and_empty_internal(ray_session):
    """A community with no internal edges contributes s_a=0 and a
    negative q_num (the −d² penalty)."""
    import ray.data as rd

    from graphiti_ray.stages.graph import modularity

    edges = [{"subj_uuid": "p", "obj_uuid": "q"}]
    labels = rd.from_items(
        [{"node": "p", "community": "cp"}, {"node": "q", "community": "cq"}]
    )
    out = modularity(rd.from_items(edges), labels).to_pandas()
    assert sorted(out.s_a) == [0, 0]
    assert (out.q_num == -1).all()  # 2m=2: q = 2·0 − 1² = −1 per side


def test_adamic_adar_path_graph(ray_session):
    """Path a-b-c-d: non-adjacent pairs (a,c),(b,d) share center b resp. c
    (deg 2 → weight 10^12 // rint(ln(2)*1e6)); (a,d) shares none. Adjacent
    pairs are excluded even when they also share a neighbor."""
    import numpy as np
    import ray.data as rd_

    from graphiti_ray.stages.graph import adamic_adar

    edges = rd_.from_items(
        [
            {"subj_uuid": "a", "obj_uuid": "b"},
            {"subj_uuid": "b", "obj_uuid": "c"},
            {"subj_uuid": "c", "obj_uuid": "d"},
        ]
    )
    out = {
        (r["node_a"], r["node_b"]): (r["common_neighbors"], r["aa_score_micro"])
        for r in adamic_adar(edges).take_all()
    }
    w2 = 10**12 // int(np.rint(np.log(2.0) * 1e6))
    assert out == {("a", "c"): (1, w2), ("b", "d"): (1, w2)}


def test_adamic_adar_excludes_adjacent_and_sums_centers(ray_session):
    """Square a-b-c-d-a plus diagonal a-c: pair (b,d) shares BOTH a and c
    (deg 3 each → two lattice weights summed); (a,c) is adjacent so it
    never appears despite sharing b and d."""
    import numpy as np
    import ray.data as rd_

    from graphiti_ray.stages.graph import adamic_adar

    edges = rd_.from_items(
        [
            {"subj_uuid": "a", "obj_uuid": "b"},
            {"subj_uuid": "b", "obj_uuid": "c"},
            {"subj_uuid": "c", "obj_uuid": "d"},
            {"subj_uuid": "d", "obj_uuid": "a"},
            {"subj_uuid": "a", "obj_uuid": "c"},
        ]
    )
    rows = adamic_adar(edges).take_all()
    out = {
        (r["node_a"], r["node_b"]): (r["common_neighbors"], r["aa_score_micro"])
        for r in rows
    }
    w3 = 10**12 // int(np.rint(np.log(3.0) * 1e6))
    assert out == {("b", "d"): (2, 2 * w3)}


def test_personalized_pagerank_matches_dense_reference(ray_session):
    """seeds=... restricts the teleport vector to present seeds: dense
    numpy twin to 1e-9; nodes unreachable from the seed set rank 0;
    absent seeds don't dilute the mass."""
    import numpy as np
    import ray.data as rd_

    from graphiti_ray.stages.graph import pagerank

    pairs = [("s1", "a"), ("a", "b"), ("b", "a"), ("s2", "b"),
             ("x", "y")]  # x/y unreachable from {s1, s2}
    edges = rd_.from_items(
        [{"subj_uuid": s, "obj_uuid": t} for s, t in pairs]
    )
    seeds = ["s1", "s2", "ghost-not-in-graph"]
    got = {
        r["entity_uuid"]: r["rank"]
        for r in pagerank(edges, damping=0.85, rounds=5, seeds=seeds).take_all()
    }

    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    seed_mask = np.array([v in ("s1", "s2") for v in nodes])
    ns = int(seed_mask.sum())  # ghost seed is NOT in the graph
    outdeg = np.zeros(n)
    for s, _t in pairs:
        outdeg[idx[s]] += 1
    pr = np.where(seed_mask, 1.0 / ns, 0.0)
    for _ in range(5):
        acc = np.zeros(n)
        for s, t in pairs:
            acc[idx[t]] += pr[idx[s]] / outdeg[idx[s]]
        pr = np.where(seed_mask, (1.0 - 0.85) / ns, 0.0) + 0.85 * acc
    for v in nodes:
        assert abs(got[v] - pr[idx[v]]) < 1e-9, v
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got["a"] > 0 and got["b"] > 0


def test_harmonic_centrality_hand_graph(ray_session):
    """Chain s→a→b, cycle b→s, second seed t→a, unreachable x→y:
    hand-checked integer-lattice contributions, min-depth semantics."""
    import ray.data as rd_

    from graphiti_ray.stages.graph import harmonic_centrality

    pairs = [("s", "a"), ("a", "b"), ("b", "s"), ("t", "a"), ("x", "y")]
    edges = rd_.from_items(
        [{"subj_uuid": u, "obj_uuid": v} for u, v in pairs]
    )
    got = {
        r["host"]: r["hc_e6"]
        for r in harmonic_centrality(
            edges, seeds=["s", "t"], max_depth=6
        ).take_all()
    }
    # d(s,a)=1 d(s,b)=2; d(t,a)=1 d(t,b)=2 d(t,s)=3; s reaches itself at 3
    assert got["a"] == 2 * 1_000_000
    assert got["b"] == 2 * (1_000_000 // 2)
    # (s,s) is visited at depth 0, so s's round trip through the cycle is
    # excluded (min-depth 0 on both sides); only t's path counts
    assert got["s"] == 1_000_000 // 3
    assert "y" not in got and "x" not in got


def test_reciprocity_moments_hand_graph(ray_session):
    import ray.data as rd_

    from graphiti_ray.stages.graph import reciprocity_moments

    pairs = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c"),  # self-loop out
             ("a", "b")]  # duplicate edge collapses
    edges = rd_.from_items(
        [{"subj_uuid": s, "obj_uuid": t} for s, t in pairs]
    )
    r = reciprocity_moments(edges).take_all()[0]
    assert r["n_edges"] == 3  # ab, ba, ac (cc self-loop dropped, dup ab once)
    assert r["n_recip"] == 2  # ab and ba are each reciprocated


def _scc_fixture():
    import pyarrow as pa

    edges = [
        ("a", "b"), ("b", "c"), ("c", "a"),   # 3-cycle
        ("c", "d"), ("d", "e"), ("e", "d"),   # 2-cycle downstream
        ("e", "f"),                             # sink singleton
        ("g", "a"),                             # source singleton
        ("h", "h"),                             # self-loop singleton SCC
        ("a", "b"),                             # duplicate edge
    ]
    return pa.table(
        {
            "s": pa.array([e[0] for e in edges], pa.string()),
            "t": pa.array([e[1] for e in edges], pa.string()),
        }
    )


_SCC_WANT = {
    "a": "a", "b": "a", "c": "a",
    "d": "d", "e": "d",
    "f": "f", "g": "g", "h": "h",
}


def test_scc_tarjan_small_path(ray_session):
    import ray.data as rd_

    from graphiti_ray.stages.graph import scc

    out = scc(rd_.from_arrow(_scc_fixture()), src="s", dst="t").to_pandas()
    got = dict(zip(out.node, out.scc_id))
    assert got == _SCC_WANT


def test_scc_distributed_peeling_matches_tarjan(ray_session, monkeypatch):
    import ray.data as rd_

    import graphiti_ray.stages.graph as g

    monkeypatch.setattr(g, "SCC_SMALL_LIMIT", 0)
    out = g.scc(
        rd_.from_arrow(_scc_fixture()).repartition(4), src="s", dst="t"
    ).to_pandas()
    got = dict(zip(out.node, out.scc_id))
    assert got == _SCC_WANT


def test_random_walks_deterministic_replay(ray_session):
    import hashlib

    import pyarrow as pa
    import ray.data as rd_

    from graphiti_ray.stages.graph import random_walks

    edges = [("a", "b"), ("a", "c"), ("b", "a"), ("c", "a"), ("c", "d")]
    t = pa.table(
        {
            "s": pa.array([e[0] for e in edges], pa.string()),
            "t": pa.array([e[1] for e in edges], pa.string()),
        }
    )
    out = random_walks(
        rd_.from_arrow(t).repartition(3), src="s", dst="t",
        walks_per_node=2, length=3,
    ).to_pandas()
    # driver replay of the md5 step rule over sorted adjacency
    adj: dict = {}
    for s, d in sorted(set(edges)):
        adj.setdefault(s, []).append(d)
    want = []
    for n in sorted({x for e in edges for x in e}):
        for w in range(2):
            cur = n
            want.append((n, w, 0, n))
            for k in range(1, 4):
                if cur not in adj:
                    break  # sink: the walk ends (d has no out-edges)
                pick = int(
                    hashlib.md5(f"{cur}:{w}:{k}".encode()).hexdigest()[:8], 16
                ) % len(adj[cur])
                cur = adj[cur][pick]
                want.append((n, w, k, cur))
    got = sorted(zip(out.start_host, out.walk_id, out.step, out.host))
    assert got == sorted(want)


def test_bowtie_decomposition_hand_graph(ray_session):
    import pyarrow as pa
    import ray.data as rd_

    from graphiti_ray.stages.graph import bowtie

    edges = [
        ("c1", "c2"), ("c2", "c1"),  # the core 2-cycle
        ("i", "c1"),                   # IN
        ("c2", "o"),                   # OUT
        ("i", "t"),                    # tendril off IN → other
        ("d1", "d2"),                  # disconnected pair → other
    ]
    t = pa.table(
        {
            "s": pa.array([e[0] for e in edges], pa.string()),
            "t": pa.array([e[1] for e in edges], pa.string()),
        }
    )
    out = bowtie(rd_.from_arrow(t).repartition(3), src="s", dst="t").to_pandas()
    got = dict(zip(out.node, out.zone))
    assert got == {
        "c1": "core", "c2": "core",
        "i": "in", "o": "out",
        "t": "other", "d1": "other", "d2": "other",
    }


def test_k_truss_clique_triangle_tail(ray_session):
    import itertools

    import pyarrow as pa
    import ray.data as rd_

    from graphiti_ray.stages.graph import k_truss

    clique = list(itertools.combinations(["a", "b", "c", "d"], 2))
    tri = [("d", "x"), ("d", "y"), ("x", "y")]      # triangle off the clique
    tail = [("y", "z")]                                # in no triangle
    edges = clique + tri + tail
    t = pa.table(
        {
            "s": pa.array([e[0] for e in edges], pa.string()),
            "t": pa.array([e[1] for e in edges], pa.string()),
        }
    )
    ds = rd_.from_arrow(t).repartition(3)
    # k=3: every edge in ≥1 triangle survives — the tail edge does not
    out3 = k_truss(ds, k=3, src="s", dst="t").to_pandas()
    got3 = {(a, b): s for a, b, s in zip(out3.node_a, out3.node_b, out3.support)}
    assert set(got3) == set(clique) | set(tri)
    # clique edges sit in 2 triangles, triangle edges in 1
    assert all(got3[e] == 2 for e in clique)
    assert all(got3[e] == 1 for e in tri)
    # k=4: only the 4-clique (every edge in ≥2 triangles within the truss)
    out4 = k_truss(ds, k=4, src="s", dst="t").to_pandas()
    got4 = {(a, b): s for a, b, s in zip(out4.node_a, out4.node_b, out4.support)}
    assert set(got4) == set(clique) and all(v == 2 for v in got4.values())


def test_neighborhood_jaccard_square_and_path(ray_session):
    """Square a-b-c-d-a: (a,c) shares {b,d}, deg 2 each -> J = 2/(2+2-2)
    = 1.0; (b,d) symmetric. Path x-y-z appended: (x,z) -> J = 1/1 = 1.0
    via center y. Adjacent pairs never appear."""
    import ray.data as rd_

    from graphiti_ray.stages.graph import neighborhood_jaccard

    edges = rd_.from_items(
        [
            {"subj_uuid": "a", "obj_uuid": "b"},
            {"subj_uuid": "b", "obj_uuid": "c"},
            {"subj_uuid": "c", "obj_uuid": "d"},
            {"subj_uuid": "d", "obj_uuid": "a"},
            {"subj_uuid": "x", "obj_uuid": "y"},
            {"subj_uuid": "y", "obj_uuid": "z"},
        ]
    )
    out = {
        (r["node_a"], r["node_b"]): (r["common_neighbors"], r["jaccard_micro"])
        for r in neighborhood_jaccard(edges).take_all()
    }
    assert out == {
        ("a", "c"): (2, 1_000_000),
        ("b", "d"): (2, 1_000_000),
        ("x", "z"): (1, 1_000_000),
    }


def test_neighborhood_jaccard_partial_overlap(ray_session):
    """Star centers: u-{m,n}, v-{m,p}: pair (u,v) cn=1 (m), deg(u)=deg(v)=2
    -> J = 1/3 -> 333333 on the floor lattice. (n,p) shares nothing."""
    import ray.data as rd_

    from graphiti_ray.stages.graph import neighborhood_jaccard

    edges = rd_.from_items(
        [
            {"subj_uuid": "u", "obj_uuid": "m"},
            {"subj_uuid": "u", "obj_uuid": "n"},
            {"subj_uuid": "v", "obj_uuid": "m"},
            {"subj_uuid": "v", "obj_uuid": "p"},
        ]
    )
    out = {
        (r["node_a"], r["node_b"]): r["jaccard_micro"]
        for r in neighborhood_jaccard(edges).take_all()
    }
    assert out[("u", "v")] == 333_333
    assert ("n", "p") not in out


def test_salsa_indegree_proportional(ray_session):
    """Bipartite s1,s2 -> {t1,t2,t3} with t1 doubly cited: SALSA
    authorities are indegree-proportional at stationarity (t1 = 2/4,
    t2 = t3 = 1/4 of authority mass within the component); HITS would
    concentrate toward the principal eigenvector instead. Hubs with
    identical out-profiles score equally."""
    import ray.data as rd_

    from graphiti_ray.stages.graph import salsa

    edges = rd_.from_items(
        [
            {"subj_uuid": "s1", "obj_uuid": "t1"},
            {"subj_uuid": "s1", "obj_uuid": "t2"},
            {"subj_uuid": "s2", "obj_uuid": "t1"},
            {"subj_uuid": "s2", "obj_uuid": "t3"},
        ]
    )
    out = {r["entity_uuid"]: r for r in salsa(edges, rounds=8).take_all()}
    auth_mass = sum(r["authority"] for r in out.values())
    assert abs(out["t1"]["authority"] / auth_mass - 0.5) < 1e-6
    assert abs(out["t2"]["authority"] - out["t3"]["authority"]) < 1e-12
    assert abs(out["s1"]["hub"] - out["s2"]["hub"]) < 1e-12
    # sources get no authority, sinks no hub mass
    assert out["s1"]["authority"] == 0.0 and out["t1"]["hub"] == 0.0


def test_negative_samples_filtered_and_deterministic(ray_session):
    import hashlib

    import ray.data as rd_

    from graphiti_ray.stages.graph import negative_samples

    edges = rd_.from_items(
        [
            {"uuid": "e1", "subj_uuid": "a", "pred": "P", "obj_uuid": "b"},
            {"uuid": "e2", "subj_uuid": "a", "pred": "P", "obj_uuid": "c"},
        ]
    )
    out = negative_samples(edges, attempts=8).to_pandas()
    ents = ["a", "b", "c"]
    # replay the md5 picks: every emitted row must match, and every
    # filtered row must be either the true object or a real triple
    for r in out.itertuples():
        h = int(hashlib.md5(f"{r.uuid}:{r.attempt}".encode()).hexdigest()[:8], 16)
        assert ents[h % 3] == r.neg_obj_uuid
        assert r.neg_obj_uuid != {"e1": "b", "e2": "c"}[r.uuid]
        # filtered setting: corrupted triple is never a real edge
        assert (r.neg_obj_uuid, r.uuid) not in {("c", "e1"), ("b", "e2")}
    # determinism: a second run is identical
    out2 = negative_samples(edges, attempts=8).to_pandas()
    assert out.sort_values(["uuid", "attempt"]).reset_index(drop=True).equals(
        out2.sort_values(["uuid", "attempt"]).reset_index(drop=True)
    )


def test_transitivity_stats_triangle_plus_tail(ray_session):
    """Triangle a-b-c plus pendant c-d: T=1 -> t3=3; wedges = C(2,2)*2
    + C(3,2)... degrees a:2 b:2 c:3 d:1 -> 1+1+3+0 = 5."""
    from ray.data.aggregate import Sum

    import ray.data as rd_

    from graphiti_ray.stages.graph import (
        _undirected_degrees,
        _undirected_distinct_edges,
        triangle_counts,
    )

    edges = rd_.from_items(
        [
            {"subj_uuid": "a", "obj_uuid": "b"},
            {"subj_uuid": "b", "obj_uuid": "c"},
            {"subj_uuid": "c", "obj_uuid": "a"},
            {"subj_uuid": "c", "obj_uuid": "d"},
        ]
    )
    tri = triangle_counts(edges)
    t3 = int(tri.aggregate(Sum("n_triangles"))["sum(n_triangles)"])
    deg = _undirected_degrees(
        _undirected_distinct_edges(edges, "subj_uuid", "obj_uuid")
    ).take_all()
    wedges = sum(int(r["deg"]) * (int(r["deg"]) - 1) // 2 for r in deg)
    assert (t3, wedges) == (3, 5)


def test_stress_centrality_hand_graph(ray_session):
    """Diamond c→s→{a,b}→t: hand-counted shortest-path transits.
    σ_ct = 2 (via a / via b); s carries (c,a),(c,b) and both (c,t)
    paths; a and b each carry one (s,t) and one (c,t) path."""
    import ray.data as rd_

    from graphiti_ray.stages.graph import stress_centrality

    pairs = [("c", "s"), ("s", "a"), ("s", "b"), ("a", "t"), ("b", "t")]
    edges = rd_.from_items(
        [{"src_host": u, "dst_host": v} for u, v in pairs]
    )
    got = {
        r["host"]: r["stress"]
        for r in stress_centrality(edges, max_depth=6).take_all()
    }
    assert got == {"s": 4, "a": 2, "b": 2}


def test_stress_centrality_shortest_only(ray_session):
    """A longer alternative route contributes nothing: s→t direct edge
    plus s→v→t detour — v lies on no SHORTEST path, so no output rows."""
    import ray.data as rd_

    from graphiti_ray.stages.graph import stress_centrality

    pairs = [("s", "t"), ("s", "v"), ("v", "t")]
    edges = rd_.from_items(
        [{"src_host": u, "dst_host": v} for u, v in pairs]
    )
    got = stress_centrality(edges, max_depth=6).take_all()
    assert got == []
