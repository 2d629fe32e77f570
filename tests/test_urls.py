"""URL canonicalization + per-domain cap (stages/urls.py, ops.head_k_per_key)."""

import pyarrow as pa

from graphiti_ray.stages.urls import _normalize_block


def _norm(urls):
    t = pa.table({"url": pa.array(urls, pa.string())})
    out = _normalize_block(t, "url")
    return out.column("url_norm").to_pylist(), out


def test_normalize_rules_individually():
    got, out = _norm(
        [
            "HTTPS://WWW.Example.COM/a/b#frag",          # case + www + fragment
            "https://example.com:443/a",                  # default https port
            "http://example.com:80/a",                    # default http port
            "http://example.com:8080/a",                  # NON-default port kept
            "https://user:pw@example.com/a",              # userinfo stripped
            "https://example.com/a/",                     # trailing slash (path only)
            "https://example.com/",                       # root slash kept
            "https://example.com",                        # empty path -> /
            "https://example.com/a?utm_source=x&id=1&utm_campaign=y",
            "https://example.com/a?id=1&fbclid=z",
            "https://example.com/a?gclid=z",              # all-tracking -> no query
            "https://example.com/a/?id=1",                # slash kept before query
        ]
    )
    assert got == [
        "https://example.com/a/b",
        "https://example.com/a",
        "http://example.com/a",
        "http://example.com:8080/a",
        "https://example.com/a",
        "https://example.com/a",
        "https://example.com/",
        "https://example.com/",
        "https://example.com/a?id=1",
        "https://example.com/a?id=1",
        "https://example.com/a",
        "https://example.com/a/?id=1",
    ]


def test_registered_domain_heuristic():
    _, out = _norm(["https://a.b.news.example.com/x", "https://example.com/x"])
    assert out.column("registered_domain").to_pylist() == [
        "example.com",
        "example.com",
    ]
    assert out.column("host").to_pylist() == [
        "a.b.news.example.com",
        "example.com",
    ]


def test_head_k_per_key_keeps_ordered_head(ray_session):
    import ray.data as rd_

    from graphiti_ray.stages.ops import head_k_per_key

    rows = [
        {"host": h, "rank": r, "val": f"{h}:{r}"}
        for h in ("a", "b", "c")
        for r in range(7)
    ]
    # shuffle input order so the sort is load-bearing
    rows = rows[::-1]
    ds = rd_.from_items(rows)
    out = head_k_per_key(ds, ["host"], ["rank"], k=3).take_all()
    got = sorted((r["host"], r["rank"]) for r in out)
    assert got == [(h, r) for h in ("a", "b", "c") for r in range(3)]


def test_extract_page_meta_fields(ray_session):
    import pyarrow as pa
    import ray.data as rd_

    from graphiti_ray.stages.urls import extract_page_meta

    html = (
        b"<html><head><title>My Title</title></head><body>"
        b'<h1 class="x">Heading</h1><p>one</p><p>two</p>'
        b'<a href="/a">x</a><a href="/b"></a></body></html>'
    )
    pages = rd_.from_arrow(
        pa.table(
            {
                "url": pa.array(["u1", "u2"], pa.string()),
                "html": pa.array([html, b"<html></html>"], pa.binary()),
            }
        )
    )
    out = extract_page_meta(pages).to_pandas().set_index("url")
    assert out.loc["u1"].tolist() == ["My Title", "Heading", 2, 2]
    assert out.loc["u2"].tolist() == ["", "", 0, 0]
