"""URL canonicalization for web-scale corpora (the Common-Crawl prep step
graphiti's ingest assumes has already happened upstream; reference
analogue: the url/group_id identity plumbing around nodes.py and the
fulltext group filters — here made an explicit, testable operator).

- ``synthesize_messy_urls``  deterministic fixture stage: re-introduces the
  real-world URL mess (case, www., default ports, tracking params,
  fragments, trailing slashes) as pure ``doc_id`` arithmetic, so the
  DuckDB oracle can re-derive the EXPECTED canonical form independently.
- ``normalize_urls``         the actual operator: vectorized RE2 kernels
  (pyarrow.compute, zero Python per row) producing
  ``url_norm``/``host``/``registered_domain`` columns.

Canonicalization rules (each a standard member of the WHATWG/crawler
canon): strip fragment; lowercase scheme + host; strip userinfo; strip
``www.``; strip default port (``:443`` https / ``:80`` http); drop
tracking query params (``utm_*``, ``fbclid``, ``gclid``) keeping the
rest in original order; collapse a TRAILING slash on a non-root path
when no query string follows; empty path becomes ``/``.

``registered_domain`` is the last-two-labels heuristic — a real public
suffix list is a data file this sandbox doesn't ship; the seam is the
single regex in ``_REGISTERED_RE`` (swap for a PSL-driven longest-match
at deploy time).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

_SPLIT_RE = r"^(?P<scheme>[^:/?#]+)://(?P<hostport>[^/?#]*)(?P<rest>.*)$"
_REGISTERED_RE = r"(?P<rd>[^.]+\.[^.]+)$"
_TRACKING = r"(?:utm_[a-z]+|fbclid|gclid)"


def _normalize_block(batch: pa.Table, col: str) -> pa.Table:
    u = pc.replace_substring_regex(batch.column(col), r"#.*$", "")
    parts = pc.extract_regex(u, _SPLIT_RE)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    hostport = pc.utf8_lower(pc.struct_field(parts, "hostport"))
    hostport = pc.replace_substring_regex(hostport, r"^[^@]*@", "")
    hostport = pc.replace_substring_regex(hostport, r"^www\.", "")
    host = pc.if_else(
        pc.equal(scheme, "https"),
        pc.replace_substring_regex(hostport, r":443$", ""),
        pc.if_else(
            pc.equal(scheme, "http"),
            pc.replace_substring_regex(hostport, r":80$", ""),
            hostport,
        ),
    )
    rest = pc.struct_field(parts, "rest")
    rest = pc.replace_substring_regex(rest, rf"&{_TRACKING}=[^&]*", "")
    rest = pc.replace_substring_regex(rest, rf"\?{_TRACKING}=[^&]*&", "?")
    rest = pc.replace_substring_regex(rest, rf"\?{_TRACKING}=[^&]*$", "")
    rest = pc.if_else(pc.equal(rest, ""), pa.scalar("/", pa.string()), rest)
    rest = pc.replace_substring_regex(rest, r"^(/.+)/$", r"\1")
    rd_dom = pc.struct_field(pc.extract_regex(host, _REGISTERED_RE), "rd")
    url_norm = pc.binary_join_element_wise(
        pc.binary_join_element_wise(scheme, host, "://"), rest, ""
    )
    out = batch.drop_columns([col]) if col in batch.column_names else batch
    return (
        out.append_column("url_norm", url_norm)
        .append_column("host", host)
        .append_column("registered_domain", pc.fill_null(rd_dom, ""))
    )


def normalize_urls(ds: rd.Dataset, col: str = "url") -> rd.Dataset:
    """Add ``url_norm`` / ``host`` / ``registered_domain`` columns derived
    from ``col`` by the module's canonicalization rules; drops the raw
    column. Stateless vectorized map_batches — streams at any scale."""
    import functools

    return ds.map_batches(
        functools.partial(_normalize_block, col=col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def synthesize_messy_urls(pages: rd.Dataset) -> rd.Dataset:
    """FIXTURE stage: replace the canonical ``url`` with a deterministically
    messy variant (pure doc_id arithmetic, doc_id parsed back from the
    canonical url), exercising every normalization rule:

    - doc_id % 2 == 0  → scheme+host UPPERCASED
    - doc_id % 17 == 0 → ``www.`` host prefix
    - doc_id % 7 == 0  → explicit ``:443`` port
    - doc_id % 13 == 0 → trailing slash on the path
    - doc_id % 3 == 0  → ``?utm_source=feed&id=N&utm_campaign=wK`` params
      (elif % 5 == 0   → ``?id=N&fbclid=fbN``) — ``id`` must SURVIVE
    - doc_id % 11 == 0 → ``#secK`` fragment

    The oracle twin re-derives the expected canonical form directly from
    doc_id (see the pages_url_normalize SQL)."""

    def mess(batch: pa.Table) -> pa.Table:
        url = batch.column("url")
        parts = pc.extract_regex(url, _SPLIT_RE)
        host = pc.struct_field(parts, "hostport")
        rest = pc.struct_field(parts, "rest")
        did = pc.cast(
            pc.struct_field(pc.extract_regex(url, r"/doc/(?P<id>\d+)$"), "id"),
            pa.int64(),
        )
        id_str = pc.cast(did, pa.string())

        def mod(m: int):
            # pyarrow has no modulo kernel: n - (n // m) * m (int divide)
            return pc.equal(
                pc.subtract(did, pc.multiply(pc.divide(did, m), m)), 0
            )

        host = pc.if_else(
            mod(17),
            pc.binary_join_element_wise(pa.scalar("www."), host, ""),
            host,
        )
        host = pc.if_else(
            mod(7),
            pc.binary_join_element_wise(host, pa.scalar(":443"), ""),
            host,
        )
        scheme_host = pc.binary_join_element_wise(pa.scalar("https://"), host, "")
        scheme_host = pc.if_else(mod(2), pc.utf8_upper(scheme_host), scheme_host)
        rest = pc.if_else(
            mod(13),
            pc.binary_join_element_wise(rest, pa.scalar("/"), ""),
            rest,
        )
        k5 = pc.cast(pc.subtract(did, pc.multiply(pc.divide(did, 5), 5)), pa.string())
        k4 = pc.cast(pc.subtract(did, pc.multiply(pc.divide(did, 4), 4)), pa.string())
        params3 = pc.binary_join_element_wise(
            pa.scalar("?utm_source=feed&id="), id_str,
            pa.scalar("&utm_campaign=w"), k5, ""
        )
        params5 = pc.binary_join_element_wise(
            pa.scalar("?id="), id_str, pa.scalar("&fbclid=fb"), id_str, ""
        )
        params = pc.if_else(
            mod(3), params3,
            pc.if_else(mod(5), params5, pa.scalar("", pa.string())),
        )
        frag = pc.if_else(
            mod(11),
            pc.binary_join_element_wise(pa.scalar("#sec"), k4, ""),
            pa.scalar("", pa.string()),
        )
        messy = pc.binary_join_element_wise(scheme_host, rest, params, frag, "")
        idx = batch.column_names.index("url")
        return batch.set_column(idx, "url", messy)

    return pages.map_batches(mess, batch_format="pyarrow", zero_copy_batch=True)
