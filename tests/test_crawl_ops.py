"""Crawl snapshot selection + degree assortativity moments."""

import pyarrow as pa
import pytest

import ray.data as rd

from graphiti_ray.stages.graph import degree_assortativity_moments
from graphiti_ray.stages.urls import latest_snapshots, synthesize_recrawls


def test_synthesize_recrawls_arithmetic(ray_session):
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 5], pa.int64()),
            "source": pa.array(["src0", "src1", "src2", "src5"]),
        }
    )
    rows = synthesize_recrawls(rd.from_arrow(docs)).take_all()
    # doc_id d → 1 + d % 3 snapshots
    per_url = {}
    for r in rows:
        per_url.setdefault(r["url"], []).append(r["crawl_rev"])
    assert sorted(per_url["https://src0.example.com/doc/0"]) == [0]
    assert sorted(per_url["https://src1.example.com/doc/1"]) == [0, 1]
    assert sorted(per_url["https://src2.example.com/doc/2"]) == [0, 1, 2]
    assert sorted(per_url["https://src5.example.com/doc/5"]) == [0, 1, 2]
    # snapshots 7 days apart
    ts = sorted(
        r["warc_ts"] for r in rows if r["url"].endswith("/doc/2")
    )
    assert (ts[1] - ts[0]).days == 7 and (ts[2] - ts[1]).days == 7


def test_latest_snapshots_matches_pandas(ray_session):
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(40)), pa.int64()),
            "source": pa.array([f"src{i % 4}" for i in range(40)]),
        }
    )
    snaps = synthesize_recrawls(rd.from_arrow(docs))
    # force key runs to straddle blocks
    got = (
        latest_snapshots(snaps.repartition(7))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pdf = snaps.to_pandas()
    want = (
        pdf.loc[pdf.groupby("url")["warc_ts"].idxmax()]
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(got["url"]) == list(want["url"])
    assert list(got["warc_ts"]) == list(want["warc_ts"])
    assert list(got["crawl_rev"]) == list(want["crawl_rev"])
    # exactly one row per url
    assert got["url"].is_unique


def _edges(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "subj_uuid": pa.array([a for a, _ in pairs]),
                "obj_uuid": pa.array([b for _, b in pairs]),
            }
        )
    )


def test_assortativity_path_graph(ray_session):
    # P3: a-b, b-c → degrees a:1 b:2 c:1
    row = degree_assortativity_moments(_edges([("a", "b"), ("b", "c")])).take_all()
    assert row == [{"n_ends": 4, "s_d": 6, "s_d2": 10, "s_dxdy": 4}]


def test_assortativity_dedups_and_ignores_direction(ray_session):
    # duplicate + reversed + self-loop all collapse to the same P3
    row = degree_assortativity_moments(
        _edges([("a", "b"), ("b", "a"), ("b", "c"), ("c", "c"), ("b", "c")])
    ).take_all()
    assert row == [{"n_ends": 4, "s_d": 6, "s_d2": 10, "s_dxdy": 4}]


def test_assortativity_empty(ray_session):
    out = degree_assortativity_moments(_edges([]).limit(0)).take_all()
    assert out == []


def test_resolve_redirects_chains(ray_session):
    """Pointer jumping resolves multi-hop chains to the final target and
    leaves targets that aren't sources untouched."""
    from graphiti_ray.stages.urls import resolve_redirects

    pairs = rd.from_arrow(
        pa.table(
            {
                "url": ["a", "b", "c", "x"],
                "target": ["b", "c", "d", "y"],
            }
        )
    )
    out = {r["url"]: r["final_url"] for r in resolve_redirects(pairs).take_all()}
    assert out == {"a": "d", "b": "d", "c": "d", "x": "y"}


def test_synthesize_redirects_closed_form(ray_session):
    """On DENSE doc_ids the rd1 chains bottom out at the enclosing multiple
    of 8: final(/u/d) = /u/(8*(d//8)). (The oracle never assumes density;
    this closed form holds only on this fixture.)"""
    from graphiti_ray.stages.urls import resolve_redirects, synthesize_redirects

    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(list(range(40)), pa.int64())})
    )
    out = {
        r["url"]: r["final_url"]
        for r in resolve_redirects(synthesize_redirects(docs)).take_all()
    }
    assert len(out) == 40 - 5
    for d in range(40):
        if d % 8 == 0:
            continue
        assert (
            out[f"https://l.example.com/u/{d}"]
            == f"https://l.example.com/u/{8 * (d // 8)}"
        )


def test_page_quality_signals(ray_session):
    from graphiti_ray.stages.urls import page_quality

    pages = rd.from_arrow(
        pa.table(
            {
                "url": ["https://h.example.com/doc/1"],
                "html": pa.array(
                    [
                        b'<body><div id="main"><p>abcde</p></div>'
                        b'<footer><a href="https://x.org/"></a>'
                        b'<a href="https://y.org/"></a></footer></body>'
                    ],
                    pa.binary(),
                ),
            }
        )
    )
    r = page_quality(pages).take_all()[0]
    assert r["text_len"] == 5
    assert r["n_links"] == 2
    assert r["link_density_e6"] == 2_000_000 // 5


def test_crawl_schedule_politeness(ray_session):
    from graphiti_ray.stages.urls import crawl_schedule

    ts = pa.array([3, 1, 2, 5], pa.timestamp("us"))
    pages = rd.from_arrow(
        pa.table(
            {
                "url": [
                    "https://a.com/1",
                    "https://a.com/2",
                    "https://a.com/3",
                    "https://b.com/1",
                ],
                "warc_ts": ts,
            }
        )
    )
    rows = {r["url"]: r for r in crawl_schedule(pages, crawl_delay_s=2).take_all()}
    # within a.com: order by warc_ts → /2 (t=1), /3 (t=2), /1 (t=3)
    assert rows["https://a.com/2"]["wave"] == 0
    assert rows["https://a.com/3"]["wave"] == 1
    assert rows["https://a.com/1"]["wave"] == 2
    assert rows["https://a.com/1"]["fetch_offset_s"] == 4
    assert rows["https://b.com/1"]["wave"] == 0


def test_apply_robots_prefix_semantics(ray_session):
    from graphiti_ray.stages.urls import apply_robots

    rules = rd.from_arrow(
        pa.table(
            {
                "host": ["a.com", "a.com", "b.com"],
                "prefix": ["/private", "/tmp/x", "/"],
            }
        )
    )
    pages = rd.from_arrow(
        pa.table(
            {
                "url": [
                    "https://a.com/private/page",   # blocked (prefix)
                    "https://a.com/privateer",      # blocked: startswith
                    "https://a.com/public",         # allowed
                    "https://a.com/tmp/xy",         # blocked
                    "https://a.com/tmp/y",          # allowed
                    "https://b.com/anything",       # blocked: '/' blocks all
                    "https://c.com/whatever",       # no rules → allowed
                    "https://a.com",                # empty path → '/'
                ],
            }
        )
    )
    got = {r["url"]: r["allowed"] for r in apply_robots(pages, rules).take_all()}
    assert got["https://a.com/private/page"] == 0
    assert got["https://a.com/privateer"] == 0
    assert got["https://a.com/public"] == 1
    assert got["https://a.com/tmp/xy"] == 0
    assert got["https://a.com/tmp/y"] == 1
    assert got["https://b.com/anything"] == 0
    assert got["https://c.com/whatever"] == 1
    assert got["https://a.com"] == 1


def test_synthesize_robots_rb1(ray_session):
    from graphiti_ray.stages.urls import synthesize_robots

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "source": ["src2", "src3", "src2", "src12"],
            }
        )
    )
    rows = {(r["host"], r["prefix"]) for r in synthesize_robots(docs).take_all()}
    assert rows == {
        ("src2.example.com", "/doc/2"),
        ("src2.example.com", "/admin"),
        ("src12.example.com", "/doc/2"),
        ("src12.example.com", "/admin"),
    }  # src3: N % 4 == 3 → allow-all, no rows


def test_cdx_index_surt_and_digest(ray_session):
    import hashlib

    from graphiti_ray.stages.urls import cdx_index

    html = b"<html>payload</html>"
    pages = rd.from_arrow(
        pa.table(
            {
                "url": ["https://News.Sub.Example.org/path/x?q=1"],
                "warc_ts": pa.array(
                    [1_700_000_000_000_000], pa.timestamp("us")
                ),
                "html": pa.array([html], pa.binary()),
            }
        )
    )
    r = cdx_index(pages).take_all()[0]
    # SURT: labels reversed, lowercased, ')' + path (query kept in path part)
    assert r["urlkey"] == "org,example,sub,news)/path/x?q=1"
    assert r["ts14"] == "20231114221320"  # 2023-11-14T22:13:20Z
    assert r["digest"] == hashlib.md5(html).hexdigest()
    assert r["length"] == len(html)


def test_crawl_budget_hamilton_exact_sum(ray_session):
    import pyarrow as pa
    import ray.data as rd_

    from graphiti_ray.stages.urls import crawl_budget

    hosts = ["a"] * 7 + ["b"] * 2 + ["c"] * 1
    ds = rd_.from_arrow(
        pa.table({"host": pa.array(hosts, pa.string())})
    ).repartition(3)
    out = crawl_budget(ds, budget=10).to_pandas().set_index("host")
    # proportional: 7/2/1 of 10 — exact, no remainder needed
    assert out.alloc.to_dict() == {"a": 7, "b": 2, "c": 1}
    # a remainder case: budget 11 → floors 7.7/2.2/1.1 → 7/2/1 + 1 bonus
    # to the largest remainder (a: .7)
    out11 = crawl_budget(ds, budget=11).to_pandas().set_index("host")
    assert out11.alloc.to_dict() == {"a": 8, "b": 2, "c": 1}
    assert int(out11.alloc.sum()) == 11
    # ties break host-ascending: equal counts, budget not divisible
    ds2 = rd_.from_arrow(
        pa.table({"host": pa.array(["x", "y", "z"], pa.string())})
    )
    out2 = crawl_budget(ds2, budget=4).to_pandas().set_index("host")
    assert out2.alloc.to_dict() == {"x": 2, "y": 1, "z": 1}
