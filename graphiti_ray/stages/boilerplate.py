"""Per-host template/boilerplate removal over raw web pages — the CCNet /
Common-Crawl preprocessing step graphiti's ingest assumes happened upstream
(reference analogue: the corpus-parser family around ingest, SURVEY.md §2
S11; here made an explicit, oracle-checked operator).

Semantics (version bp1): extract ALL visible text lines from the raw
``html`` bytes — header / nav / footer INCLUDED, unlike the main-content
extraction invariant (functions/text.py tx1, which keeps only
``<div id="main">``) — then drop every line whose occurrence count within
its host reaches half that host's page count (``2·occ ≥ n_pages``): lines
the site template stamps on every page (site name, nav, copyright) hit
100% and vanish; real content stays far below the bar. The cleaned text is
the kept lines re-joined with ``\\n`` in document order.

Scale shape (the part that matters at 10^12 pages):
- visible-line extraction is a stateless ``map_batches`` stage (compiled
  byte-regexes; parsing is inherently per-document, same cost class as the
  tx1 extraction stage);
- per-(host, line) occurrence counts ride on ONE range sort via
  ``ops.annotate_run_lengths`` (hub lines — a nav bar on a million pages —
  cost one integer of carry per block boundary, never a grouped
  materialization);
- host page counts are a vocabulary-sized aggregate, broadcast once under
  a documented bound with a hash-join fallback above it;
- reconstruction is ``ops.sorted_run_map`` over complete url runs — one
  more range sort, no per-page dispatch.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

# visible-text spec vl1: drop <head>/<script>/<style> subtrees, break lines
# at block-level closing tags, strip every remaining tag, unescape, strip.
_DROP_RES = [
    re.compile(rb"<head[ >].*?</head>", re.S),
    re.compile(rb"<head>.*?</head>", re.S),
    re.compile(rb"<script[^>]*>.*?</script>", re.S),
    re.compile(rb"<style[^>]*>.*?</style>", re.S),
]
_BLOCK_CLOSE_RE = re.compile(
    rb"</(?:p|h[1-6]|li|div|nav|footer|header|title|tr|ul|ol|table|"
    rb"blockquote)>|<br\s*/?>"
)
_TAG_RE = re.compile(rb"<[^>]*>")

# hosts→page-count broadcast bound: above this the counts stay a Dataset
# and merge via a hash join on host (one row per host either way; 4M hosts
# ≈ a few hundred MB of strings — the web's registered-domain count fits).
HOST_COUNT_BROADCAST_LIMIT = 4_000_000


def _page_visible_lines(html_bytes: bytes) -> list[str]:
    """Visible text lines of one page per spec vl1. Pure."""
    h = html_bytes
    for rx in _DROP_RES:
        h = rx.sub(b"", h)
    h = _BLOCK_CLOSE_RE.sub(b"\n", h)
    h = _TAG_RE.sub(b"", h)
    text = _html.unescape(h.decode("utf-8", "replace"))
    return [ln for ln in (s.strip(" \t\r") for s in text.split("\n")) if ln]


def visible_lines(pages: rd.Dataset) -> rd.Dataset:
    """Long-form visible-line stream: (url, host, line_no, line), line_no
    1-based in document order. Stateless vectorized-per-batch stage."""

    def per_batch(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        htmls = t.column("html").to_pylist()
        out_url: list[str] = []
        out_host: list[str] = []
        out_no: list[int] = []
        out_line: list[str] = []
        for u, hb in zip(urls, htmls):
            host = u.split("://", 1)[1].split("/", 1)[0].split(":", 1)[0]
            lines = _page_visible_lines(hb)
            out_url.extend([u] * len(lines))
            out_host.extend([host] * len(lines))
            out_no.extend(range(1, len(lines) + 1))
            out_line.extend(lines)
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "host": pa.array(out_host, pa.string()),
                "line_no": pa.array(out_no, pa.int64()),
                "line": pa.array(out_line, pa.string()),
            }
        )

    return pages.select_columns(["url", "html"]).map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _host_counts(pages: rd.Dataset) -> rd.Dataset:
    """Pages per host — a vocabulary-sized aggregate off the pruned url
    column (urls are unique per page by input contract)."""
    from ray.data.aggregate import Count

    def to_host(t: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(t.column("url"), r"^[^:/?#]+://(?P<h>[^/?#:]+)"),
            "h",
        )
        return pa.table({"host": host})

    return (
        pages.select_columns(["url"])
        .map_batches(to_host, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("host")
        .aggregate(Count(alias_name="n_pages"))
    )


def remove_boilerplate(
    pages: rd.Dataset,
    broadcast_limit: int = HOST_COUNT_BROADCAST_LIMIT,
) -> rd.Dataset:
    """Strip per-host template lines from every page (rule bp1:
    drop line ⇔ 2·occ(host, line) ≥ n_pages(host)); returns
    (url, text, n_lines) with text = kept lines joined by ``\\n`` —
    pages whose every line is boilerplate drop out entirely."""
    from graphiti_ray.stages.link import default_join_partitions, safe_join
    from graphiti_ray.stages.ops import annotate_run_lengths, sorted_run_map

    lines = visible_lines(pages)
    annotated = annotate_run_lengths(lines, ["host", "line"], out_col="n_occ")

    counts = _host_counts(pages)
    n_hosts = counts.count()
    if n_hosts <= broadcast_limit:
        lut = {
            r["host"]: r["n_pages"] for r in counts.take_all()
        }  # vocabulary-sized by the bound just checked
        lut_ref = ray.put(lut)

        def filt(t: pa.Table, _ref=lut_ref) -> pa.Table:
            if t.num_rows == 0:
                return t
            m = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
            hosts = t.column("host").to_pylist()
            npages = np.fromiter(
                (m.get(h, 0) for h in hosts), dtype=np.int64, count=len(hosts)
            )
            occ = t.column("n_occ").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(2 * occ < npages))

        kept = annotated.map_batches(
            filt, batch_format="pyarrow", zero_copy_batch=True
        )
    else:  # join fallback: counts stay a Dataset, merge keyed on host
        joined = safe_join(
            annotated,
            counts,
            join_type="inner",
            num_partitions=default_join_partitions(),
            on=("host",),
        )

        def filt_joined(t: pa.Table) -> pa.Table:
            occ = t.column("n_occ").to_numpy(zero_copy_only=False)
            npages = t.column("n_pages").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(2 * occ < npages)).drop_columns(
                ["n_pages"]
            )

        kept = joined.map_batches(
            filt_joined, batch_format="pyarrow", zero_copy_batch=True
        )

    def reconstruct(tbl: pa.Table) -> pa.Table:
        """Complete url runs (sorted by url, line_no) → one row per url."""
        if tbl.num_rows == 0:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "text": pa.array([], pa.string()),
                    "n_lines": pa.array([], pa.int64()),
                }
            )
        urls = tbl.column("url").to_numpy(zero_copy_only=False)
        lines = tbl.column("line").to_pylist()
        starts = np.flatnonzero(
            np.concatenate(([True], urls[1:] != urls[:-1]))
        )
        bounds = np.append(starts, len(urls))
        out_url = [urls[s] for s in starts]
        out_text = [
            "\n".join(lines[bounds[i] : bounds[i + 1]])
            for i in range(len(starts))
        ]
        out_n = (bounds[1:] - bounds[:-1]).astype(np.int64)
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "text": pa.array(out_text, pa.string()),
                "n_lines": pa.array(out_n, pa.int64()),
            }
        )

    narrow = kept.select_columns(["url", "line_no", "line"])
    return sorted_run_map(narrow, ["url"], reconstruct, order_cols=["line_no"])
