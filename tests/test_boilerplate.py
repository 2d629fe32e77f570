"""Per-host boilerplate/template removal (stages/boilerplate.py, rule bp1)."""

import pyarrow as pa

import ray.data as rd

from graphiti_ray.stages.boilerplate import (
    _page_visible_lines,
    remove_boilerplate,
    visible_lines,
)

SF = "/root/testdata/sf0.001"


def test_page_visible_lines_spec():
    html = (
        b"<html><head><title>T</title><script>var x=1;</script></head>"
        b'<body><header><h1 class="s">example.com</h1></header>'
        b'<nav><a href="/">home</a> | <a href="/about">about</a></nav>'
        b'<div id="main"><p>Alpha &amp; beta.</p><p>  padded  </p></div>'
        b'<footer>&copy; example.com <a href="https://x.org/"></a></footer>'
        b"</body></html>"
    )
    assert _page_visible_lines(html) == [
        "example.com",
        "home | about",
        "Alpha & beta.",
        "padded",
        "© example.com",
    ]


def test_visible_lines_long_form(ray_session):
    pages = rd.from_arrow(
        pa.table(
            {
                "url": ["https://h.example.com/doc/1"],
                "html": pa.array(
                    [b"<body><p>one</p><p>two</p></body>"], pa.binary()
                ),
            }
        )
    )
    rows = visible_lines(pages).take_all()
    assert [(r["host"], r["line_no"], r["line"]) for r in rows] == [
        ("h.example.com", 1, "one"),
        ("h.example.com", 2, "two"),
    ]


def test_remove_boilerplate_recovers_golden_text(ray_session):
    """The north-star invariant through the HARDER path: template stripping
    over full visible text (header/nav/footer included) must recover the
    byte-identical golden main-content text on the pg1.2 fixture."""
    from graphiti_ray.sources.pages import pages_dataset

    out = {r["url"]: r["text"] for r in remove_boilerplate(pages_dataset(SF)).take_all()}
    golden = {
        r["url"]: r["text"]
        for r in pages_dataset(SF).select_columns(["url", "text"]).take_all()
    }
    assert set(out) == set(golden)
    assert all(out[u] == golden[u] for u in golden)


def test_remove_boilerplate_join_fallback_matches_broadcast(ray_session):
    """broadcast_limit=0 forces the hash-join merge path; results must be
    identical to the broadcast path."""
    from graphiti_ray.sources.pages import pages_dataset

    a = {
        (r["url"], r["text"], r["n_lines"])
        for r in remove_boilerplate(pages_dataset(SF)).take_all()
    }
    b = {
        (r["url"], r["text"], r["n_lines"])
        for r in remove_boilerplate(
            pages_dataset(SF), broadcast_limit=0
        ).take_all()
    }
    assert a == b


def test_all_boilerplate_page_drops_out(ray_session):
    """A host whose pages are pure template (every line at 100% df)
    disappears; a mixed host keeps only its content lines."""
    tmpl = b"<body><p>same</p></body>"
    pages = rd.from_arrow(
        pa.table(
            {
                "url": [
                    "https://t.example.com/doc/1",
                    "https://t.example.com/doc/2",
                    "https://m.example.com/doc/1",
                    "https://m.example.com/doc/2",
                    "https://m.example.com/doc/3",
                ],
                "html": pa.array(
                    [
                        tmpl,
                        tmpl,
                        b"<body><p>nav</p><p>alpha</p></body>",
                        b"<body><p>nav</p><p>beta</p></body>",
                        b"<body><p>nav</p><p>gamma</p></body>",
                    ],
                    pa.binary(),
                ),
            }
        )
    )
    rows = {r["url"]: r["text"] for r in remove_boilerplate(pages).take_all()}
    assert "https://t.example.com/doc/1" not in rows
    assert rows["https://m.example.com/doc/1"] == "alpha"
    assert rows["https://m.example.com/doc/3"] == "gamma"
