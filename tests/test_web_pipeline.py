"""Composite web-corpus pipeline (pipelines/web.py)."""

import pyarrow as pa

import ray.data as rd

from graphiti_ray.pipelines.web import clean_web_corpus


def _page(url: str, body_lines: list[str]) -> bytes:
    paras = "".join(f"<p>{ln}</p>" for ln in body_lines)
    return f"<body><p>site-nav</p><div>{paras}</div></body>".encode()


def test_clean_web_corpus_stages_compose(ray_session):
    """robots blocks /private, boilerplate strips the nav line, the length
    gate drops shorties, and dedup keeps the min-url winner per text."""
    long_a = "x" * 60
    long_b = "y" * 60
    fillers = [f"filler-{i}-" + "z" * 60 for i in range(4)]
    # 8 pages survive robots on h.com, so the duplicated long_a line
    # (occ 2, 2·2 < 8) stays CONTENT — only site-nav (occ 8) is template
    pages = rd.from_arrow(
        pa.table(
            {
                "url": [
                    "https://h.com/a",
                    "https://h.com/b",          # exact dup of /a after clean
                    "https://h.com/private/z",  # robots-blocked
                    "https://h.com/short",      # fails the length gate
                    "https://h.com/c",
                ]
                + [f"https://h.com/f{i}" for i in range(4)],
                "html": pa.array(
                    [
                        _page("https://h.com/a", [long_a]),
                        _page("https://h.com/b", [long_a]),
                        _page("https://h.com/p", [long_b]),
                        _page("https://h.com/s", ["tiny"]),
                        _page("https://h.com/c", [long_b]),
                    ]
                    + [
                        _page(f"https://h.com/f{i}", [fillers[i]])
                        for i in range(4)
                    ],
                    pa.binary(),
                ),
            }
        )
    )
    rules = rd.from_arrow(
        pa.table({"host": ["h.com"], "prefix": ["/private"]})
    )
    out = {
        r["url"]: r["text"]
        for r in clean_web_corpus(pages, rules, min_len=50).take_all()
    }
    # /b deduped into /a (min url); /private/z robots-blocked; /short gated
    assert set(out) == {"https://h.com/a", "https://h.com/c"} | {
        f"https://h.com/f{i}" for i in range(4)
    }
    # the shared nav line is boilerplate (occ 8 of 8 surviving host pages)
    assert out["https://h.com/a"] == long_a
    assert out["https://h.com/c"] == long_b
    assert out["https://h.com/f0"] == fillers[0]
