"""Web link graph: outlink arithmetic, extraction, host PageRank plumbing."""

from collections import Counter

import pyarrow as pa
import pytest

import ray.data as rd

from graphiti_ray.functions.text import extract_text_from_html
from graphiti_ray.sources.pages import documents_to_pages, outlinks, render_page
from graphiti_ray.stages.urls import extract_link_graph


def test_outlinks_arithmetic():
    for doc_id in [0, 1, 2, 3, 17, 499, 12345]:
        links = outlinks(doc_id)
        assert len(links) == 1 + doc_id % 3
        for j, u in enumerate(links, start=1):
            host = u.split("://", 1)[1].split("/", 1)[0]
            assert host == f"src{(doc_id * 31 + 97 * j) % 20}.example.com"
            assert u.endswith(f"/doc/{(doc_id * 7 + j) % 1000}")


def test_outlinks_do_not_perturb_extraction():
    # links live in the footer, outside <div id="main"> — byte identity holds
    for doc_id in [0, 5, 41]:
        url, html, golden = render_page(doc_id, "some words", f"src{doc_id % 20}")
        assert extract_text_from_html(html) == golden
        for u in outlinks(doc_id):
            assert f'href="{u}"'.encode() in html


@pytest.fixture
def pages_ds(ray_session):
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 40], pa.int64()),
            "text": pa.array(["a", "b", "c", "d"]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["src0", "src1", "src2", "src0"]),
        }
    )
    return rd.from_arrow(docs).map_batches(
        documents_to_pages, batch_format="pyarrow"
    )


def test_extract_link_graph_matches_arithmetic(ray_session, pages_ds):
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in extract_link_graph(pages_ds).take_all()
    }
    want: Counter = Counter()
    for doc_id, source in [(0, "src0"), (1, "src1"), (2, "src2"), (40, "src0")]:
        for u in outlinks(doc_id):
            dst = u.split("://", 1)[1].split("/", 1)[0]
            want[(f"{source}.example.com", dst)] += 1
    assert got == dict(want)


def test_host_pagerank_mass(ray_session, pages_ds):
    from graphiti_ray.stages.graph import pagerank

    lg = extract_link_graph(pages_ds).select_columns(["src_host", "dst_host"])
    pr = pagerank(lg, damping=0.85, rounds=3, src="src_host", dst="dst_host")
    rows = pr.take_all()
    assert rows and all(r["rank"] > 0 for r in rows)
    # evaporating-sink formulation: total mass never exceeds 1
    assert sum(r["rank"] for r in rows) <= 1.0 + 1e-9


def test_hill_alpha_planted_powerlaw(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd_

    from graphiti_ray.stages.graph import hill_alpha

    # star-ish graph: hub h linked by many leaves (deg 1 leaves are below
    # dmin and excluded), plus a chain so several nodes clear the tail
    edges = [("h", f"l{i}") for i in range(20)]
    edges += [(f"l{i}", f"l{i+1}") for i in range(10)]
    t = pa.table(
        {
            "s": pa.array([e[0] for e in edges], pa.string()),
            "t": pa.array([e[1] for e in edges], pa.string()),
        }
    )
    out = hill_alpha(
        rd_.from_arrow(t).repartition(3), src="s", dst="t", dmin=2
    ).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    # replicate on the driver
    deg: dict = {}
    for a, b in sorted(set(edges)):
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    tail = [d for d in deg.values() if d >= 2]
    sl = sum(int(np.rint(np.log(d) * 1e6)) for d in tail)
    s_e6 = sl - len(tail) * int(np.rint(np.log(2) * 1e6))
    assert row.n_tail == len(tail) and row.s_e6 == s_e6
    assert row.alpha_e6 == 1_000_000 + (len(tail) * 10**12) // s_e6
    # degenerate: all tail degrees == dmin → diverges → sentinel 0
    t2 = pa.table(
        {
            "s": pa.array(["a", "b"], pa.string()),
            "t": pa.array(["b", "a"], pa.string()),
        }
    )
    out2 = hill_alpha(rd_.from_arrow(t2), src="s", dst="t", dmin=2).to_pandas()
    assert out2.iloc[0].alpha_e6 == 0


def test_weighted_pagerank_favors_heavy_edge(ray_session):
    import pyarrow as pa
    import ray.data as rd_

    from graphiti_ray.stages.graph import pagerank

    # a splits its rank between b (weight 9) and c (weight 1)
    t = pa.table(
        {
            "s": pa.array(["a", "a"], pa.string()),
            "t": pa.array(["b", "c"], pa.string()),
            "w": pa.array([9, 1], pa.int64()),
        }
    )
    out = (
        pagerank(rd_.from_arrow(t), rounds=3, src="s", dst="t", weight="w")
        .to_pandas()
        .set_index("entity_uuid")
    )
    assert out.loc["b", "rank"] > out.loc["c", "rank"]
    # unweighted twin treats them equally
    out_u = (
        pagerank(
            rd_.from_arrow(t.select(["s", "t"])), rounds=3, src="s", dst="t"
        )
        .to_pandas()
        .set_index("entity_uuid")
    )
    assert abs(out_u.loc["b", "rank"] - out_u.loc["c", "rank"]) < 1e-12
    # weight ratio shows up in the first-hop contribution split: the
    # b:c rank GAP above the teleport base is 9:1
    base = out.loc["a", "rank"]  # a receives only teleport mass
    assert abs(
        (out.loc["b", "rank"] - base) / (out.loc["c", "rank"] - base) - 9.0
    ) < 1e-6


def test_rich_club_hand_graph(ray_session):
    import pyarrow as pa
    import ray.data as rd_

    from graphiti_ray.stages.graph import rich_club

    # triangle of hubs (a,b,c) + leaves hanging off each hub
    edges = [("a", "b"), ("b", "c"), ("a", "c"),
             ("a", "l1"), ("b", "l2"), ("c", "l3")]
    t = pa.table(
        {
            "s": pa.array([e[0] for e in edges], pa.string()),
            "t": pa.array([e[1] for e in edges], pa.string()),
        }
    )
    out = (
        rich_club(rd_.from_arrow(t), ks=[1, 2], src="s", dst="t")
        .to_pandas()
        .set_index("k")
    )
    # k=1: club = {a,b,c} (deg 3 each; leaves deg 1 excluded) — a perfect
    # triangle → phi = 1
    assert out.loc[1].n_nodes == 3 and out.loc[1].n_edges == 3
    assert out.loc[1].phi_e6 == 1_000_000
    # k=2: same club (deg 3 > 2) — still 1; k above max degree → empty
    assert out.loc[2].phi_e6 == 1_000_000
    out5 = rich_club(rd_.from_arrow(t), ks=[5], src="s", dst="t").to_pandas()
    assert out5.iloc[0].n_nodes == 0 and out5.iloc[0].phi_e6 == 0


def test_cocitation_vs_coupling_direction(ray_session):
    import ray.data as rd_

    from graphiti_ray.stages.graph import common_neighbor_counts

    edges = rd_.from_items(
        [
            {"src_host": "v", "dst_host": "a"},
            {"src_host": "v", "dst_host": "b"},   # a,b co-cited by v
            {"src_host": "a", "dst_host": "x"},
            {"src_host": "b", "dst_host": "x"},   # a,b couple via x
            {"src_host": "w", "dst_host": "a"},   # second co-citer of a only
        ]
    )
    co = {
        (r["node_a"], r["node_b"]): r["n"]
        for r in common_neighbor_counts(
            edges, join_on="src", src="src_host", dst="dst_host"
        ).take_all()
    }
    cp = {
        (r["node_a"], r["node_b"]): r["n"]
        for r in common_neighbor_counts(
            edges, join_on="dst", src="src_host", dst="dst_host"
        ).take_all()
    }
    assert co == {("a", "b"): 1}
    # coupling: (a,b) via x; also (v,w) both cite a — and (a,v),(b,v)? no:
    # v cites a,b; a cites x — no shared target with v
    assert cp == {("a", "b"): 1, ("v", "w"): 1}


def test_distance_histogram_path_and_cycle(ray_session):
    import ray.data as rd_

    from graphiti_ray.stages.graph import distance_histogram

    # directed path a->b->c->d plus cycle edge d->a
    edges = rd_.from_items(
        [
            {"src_host": "a", "dst_host": "b"},
            {"src_host": "b", "dst_host": "c"},
            {"src_host": "c", "dst_host": "d"},
            {"src_host": "d", "dst_host": "a"},
        ]
    )
    out = {
        r["d"]: r["n_pairs"]
        for r in distance_histogram(
            edges, max_depth=6, src="src_host", dst="dst_host"
        ).take_all()
    }
    # 4-cycle: every node reaches the 3 others at d=1,2,3; never itself
    assert out == {1: 4, 2: 4, 3: 4}


def test_triad_census_hand(ray_session):
    """Hand graph: a→b, b→a (mutual), a→c, d isolated-ish via d→e.
    5 nodes → C(5,3)=10 triples; verify a few known classes."""
    import ray.data as rd_

    from graphiti_ray.stages.graph import triad_census

    pairs = [("a", "b"), ("b", "a"), ("a", "c"), ("d", "e")]
    edges = rd_.from_items(
        [{"src_host": u, "dst_host": v} for u, v in pairs]
    )
    got = {r["triad"]: r["n"] for r in triad_census(edges).take_all()}
    # (a,b,c): mutual ab + asym a->c  => 111U (asym OUT of the dyad... a
    # is IN the dyad and sends to c)  — canonical class for
    # (s_ab=3, s_ac=1, s_bc=0): permute → check engine agrees with table
    from graphiti_ray.stages.graph import TRIAD_CANON, TRIAD_NAMES

    idx = 3 * 16 + 1 * 4 + 0
    assert got[TRIAD_NAMES[TRIAD_CANON[idx]]] >= 1
    # (a,b,d)/(a,b,e): mutual + null pair twice => 102
    assert got["102"] == 2
    # exactly one asym edge → 012: (a,c,d),(a,c,e) carry a→c;
    # (c,d,e),(b,d,e),(a,d,e) carry d→e — five in total
    assert got["012"] == 5
    assert sum(got.values()) == 10
