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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
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


# --- web link graph ---------------------------------------------------------

_ABS_HREF_HOST_RE = None  # compiled lazily per worker process (see below)


def _href_host_re():
    # module-level lazy compile: one compile per worker process, shared by
    # every batch (re module caches, but skip its lock + dict lookup).
    global _ABS_HREF_HOST_RE
    if _ABS_HREF_HOST_RE is None:
        import re

        _ABS_HREF_HOST_RE = re.compile(rb'href="https?://([^"/:]+)')
    return _ABS_HREF_HOST_RE


def extract_link_graph(pages: rd.Dataset) -> rd.Dataset:
    """Host-level web link graph from raw HTML — the Common-Crawl web-graph
    construction step (reference analogue: the corpus-parser family around
    graphiti's ingest; SURVEY.md §2 S11).

    Scans each page's ``html`` bytes for ABSOLUTE hrefs (relative links
    carry no cross-host signal and are skipped), combines
    (src_host, dst_host) counts inside the batch (partial aggregation), then
    one small groupby-sum. Host-pair cardinality is ~|hosts|² ≪ |pages|, so
    the shuffle moves a vocabulary-sized table no matter the corpus size —
    the right shape at 10^12 documents. HTML parsing is inherently
    per-document (a compiled byte-regex per page, no per-char Python); the
    partial Counter keeps the per-batch output rows bounded by the distinct
    pairs seen, not the link count.

    Output: (src_host:string, dst_host:string, n_links:int64).
    """
    from collections import Counter

    from ray.data.aggregate import Sum

    def per_batch(t: pa.Table) -> pa.Table:
        href = _href_host_re()
        urls = t.column("url").to_pylist()
        htmls = t.column("html").to_pylist()
        c: Counter = Counter()
        for u, h in zip(urls, htmls):
            src = u.split("://", 1)[1].split("/", 1)[0].split(":", 1)[0]
            for m in href.finditer(h):
                c[(src, m.group(1).decode("utf-8", "replace"))] += 1
        keys = sorted(c)
        return pa.table(
            {
                "src_host": pa.array([k[0] for k in keys], pa.string()),
                "dst_host": pa.array([k[1] for k in keys], pa.string()),
                "n_links": pa.array([c[k] for k in keys], pa.int64()),
            }
        )

    partial = pages.select_columns(["url", "html"]).map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )
    return partial.groupby(["src_host", "dst_host"]).aggregate(
        Sum("n_links", alias_name="n_links")
    )


# --- page quality signals -----------------------------------------------------

_A_TAG_RE = None


def _a_tag_re():
    global _A_TAG_RE
    if _A_TAG_RE is None:
        import re

        _A_TAG_RE = re.compile(rb"<a\s")
    return _A_TAG_RE


def page_quality(pages: rd.Dataset) -> rd.Dataset:
    """Per-page quality signals computed off the RAW bytes — the standard
    crawl-filtering features (C4/Gopher lineage, adapted to what the page
    payload itself supports): extracted-text length via the REAL tx1
    extraction (so the signal exercises the same parser as the KG path),
    anchor-tag count, and integer link density
    ``n_links·1e6 // max(text_len, 1)``. Stateless map_batches; downstream
    filters threshold these columns. Output:
    (url, text_len, n_links, link_density_e6), all exact int64."""
    from graphiti_ray.functions.text import extract_text_from_html

    def per_batch(t: pa.Table) -> pa.Table:
        a_re = _a_tag_re()
        htmls = t.column("html").to_pylist()
        text_len = np.empty(len(htmls), np.int64)
        n_links = np.empty(len(htmls), np.int64)
        for i, hb in enumerate(htmls):
            text_len[i] = len(extract_text_from_html(hb))
            n_links[i] = len(a_re.findall(hb))
        density = n_links * 1_000_000 // np.maximum(text_len, 1)
        return pa.table(
            {
                "url": t.column("url"),
                "text_len": pa.array(text_len, pa.int64()),
                "n_links": pa.array(n_links, pa.int64()),
                "link_density_e6": pa.array(density, pa.int64()),
            }
        )

    return pages.select_columns(["url", "html"]).map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# --- CDX capture index ----------------------------------------------------------


def cdx_index(pages: rd.Dataset) -> rd.Dataset:
    """Common-Crawl-style CDX(J) capture index off the raw page stream:
    one row per capture with the canonical SURT ``urlkey`` (host labels
    reversed and comma-joined + ')' + path — the sort key every CC index
    shards on), the 14-digit timestamp, the payload md5 digest, and the
    payload byte length. Stateless map_batches; host reversal is
    dict-encoded per batch (unique hosts only), digest/length ride the
    Arrow binary buffers. Output:
    (urlkey, ts14, url, digest, length)."""
    import hashlib

    def per_batch(t: pa.Table) -> pa.Table:
        urls = t.column("url")
        parts = pc.extract_regex(
            urls, r"^[^:/?#]+://(?P<h>[^/?#]+)(?P<p>/.*)?$"
        )
        hosts = pc.struct_field(parts, "h").to_numpy(zero_copy_only=False)
        paths = pc.fill_null(pc.struct_field(parts, "p"), "/").to_numpy(
            zero_copy_only=False
        )
        uniq, inv = np.unique(hosts, return_inverse=True)
        surt_host = np.array(
            [",".join(reversed(h.lower().split("."))) for h in uniq],
            dtype=object,
        )
        urlkey = np.char.add(
            np.char.add(surt_host[inv].astype(str), ")"), paths.astype(str)
        )
        ts_us = t.column("warc_ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        # 14-digit UTC timestamp without per-row datetime objects
        ts14 = np.empty(len(ts_us), object)
        import datetime as _dt

        cache: dict[int, str] = {}
        for i, v in enumerate(ts_us):
            sec = int(v) // 1_000_000
            s = cache.get(sec)
            if s is None:
                s = _dt.datetime.fromtimestamp(
                    sec, tz=_dt.timezone.utc
                ).strftime("%Y%m%d%H%M%S")
                cache[sec] = s
            ts14[i] = s
        htmls = t.column("html").to_pylist()
        digests = [hashlib.md5(h).hexdigest() for h in htmls]
        lengths = np.fromiter(
            (len(h) for h in htmls), np.int64, count=len(htmls)
        )
        return pa.table(
            {
                "urlkey": pa.array(urlkey.tolist(), pa.string()),
                "ts14": pa.array(ts14.tolist(), pa.string()),
                "url": urls,
                "digest": pa.array(digests, pa.string()),
                "length": pa.array(lengths, pa.int64()),
            }
        )

    return pages.select_columns(["url", "warc_ts", "html"]).map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# --- robots.txt gating ---------------------------------------------------------


def synthesize_robots(docs: rd.Dataset) -> rd.Dataset:
    """FIXTURE stage (version rb1): a per-host robots rule table as pure
    source arithmetic — host ``srcN.example.com`` with ``N % 4 == 3``
    publishes no rules (allow-all); every other host disallows the path
    prefixes ``/doc/{N % 10}`` and ``/admin``. Output: (host, prefix),
    one row per Disallow line — the vocabulary-sized table a crawler's
    robots cache holds. The DuckDB oracle re-derives the ALLOW decision
    from the same arithmetic."""

    def mk(t: pa.Table) -> pa.Table:
        srcs = sorted(set(t.column("source").to_pylist()))
        hosts, prefixes = [], []
        for s in srcs:
            n = int(s[3:])
            if n % 4 == 3:
                continue
            host = f"{s}.example.com"
            hosts.extend([host, host])
            prefixes.extend([f"/doc/{n % 10}", "/admin"])
        return pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "prefix": pa.array(prefixes, pa.string()),
            }
        )

    from graphiti_ray.stages.ops import distinct_by_key

    per_batch = docs.select_columns(["source"]).map_batches(
        mk, batch_format="pyarrow", zero_copy_batch=True
    )

    def key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("host"), t.column("prefix"), "|"
        )
        return t.append_column("__k", k)

    return distinct_by_key(
        per_batch.map_batches(key, batch_format="pyarrow"), "__k"
    ).drop_columns(["__k"])


def _robots_table_ref(rules: rd.Dataset):
    rule_rows = rules.take_all()  # vocabulary-sized by contract
    table: dict[str, list[str]] = {}
    for r in rule_rows:
        table.setdefault(r["host"], []).append(r["prefix"])
    return ray.put(table)


def _robots_allowed_mask(t: pa.Table, table: dict) -> "np.ndarray":
    """int64 0/1 allow decision per row of ``t`` (needs a ``url`` column).
    Vectorized per (host-in-batch, prefix): numpy ``startswith`` over the
    batch's path array, no per-row Python."""
    parts = pc.extract_regex(
        t.column("url"), r"^[^:/?#]+://(?P<h>[^/?#]+)(?P<p>/[^?#]*)?"
    )
    hosts = pc.struct_field(parts, "h").to_numpy(zero_copy_only=False)
    paths = pc.fill_null(pc.struct_field(parts, "p"), "/").to_numpy(
        zero_copy_only=False
    )
    allowed = np.ones(len(hosts), np.int64)
    for h in np.unique(hosts):
        prefixes = table.get(h)
        if not prefixes:
            continue
        sel = hosts == h
        sub = paths[sel].astype(str)
        blocked = np.zeros(sub.shape[0], bool)
        for p in prefixes:
            blocked |= np.char.startswith(sub, p)
        out = allowed[sel]
        out[blocked] = 0
        allowed[sel] = out
    return allowed


def apply_robots(pages: rd.Dataset, rules: rd.Dataset) -> rd.Dataset:
    """Robots.txt gating — the crawl-side politeness filter: a page is
    allowed unless ANY of its host's Disallow prefixes matches its path
    (prefix semantics per RFC 9309's longest-match simplification with no
    Allow overrides). The rule table is vocabulary-sized (hosts × a few
    lines) and broadcast once via ``ray.put`` — exactly how production
    crawlers hold their robots cache; a multi-billion-host deployment
    shards this stage by host hash and broadcasts per shard (documented
    seam). Output: (url, allowed:int64 0/1)."""
    ref = _robots_table_ref(rules)

    def per_batch(t: pa.Table, _ref=ref) -> pa.Table:
        m = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        return pa.table(
            {
                "url": t.column("url"),
                "allowed": pa.array(_robots_allowed_mask(t, m), pa.int64()),
            }
        )

    return pages.select_columns(["url"]).map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def robots_gate(pages: rd.Dataset, rules: rd.Dataset) -> rd.Dataset:
    """Same decision as ``apply_robots`` but FILTERS the page stream in
    place (all columns kept) — the composition-friendly form used by the
    web corpus pipeline."""
    ref = _robots_table_ref(rules)

    def per_batch(t: pa.Table, _ref=ref) -> pa.Table:
        m = ray.get(_ref) if isinstance(_ref, ray.ObjectRef) else _ref
        return t.filter(pa.array(_robots_allowed_mask(t, m) == 1))

    return pages.map_batches(
        per_batch, batch_format="pyarrow", zero_copy_batch=True
    )


# --- politeness-aware crawl scheduling ----------------------------------------


def crawl_schedule(
    pages: rd.Dataset, crawl_delay_s: int = 1
) -> rd.Dataset:
    """Politeness-aware fetch plan: within each host, order captures by
    (warc_ts, url) and assign ``wave`` = 0-based position; a crawler
    honouring one request per ``crawl_delay_s`` per host fetches the page
    at ``fetch_offset_s = wave · crawl_delay_s`` after that host's crawl
    opens. ONE range sort via the window_rank primitive — hub hosts
    (millions of pages) cost only the sort, no per-host dispatch.
    Output: (url, host, wave, fetch_offset_s)."""
    from graphiti_ray.stages.ops import window_rank

    def to_host(t: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(t.column("url"), r"^[^:/?#]+://(?P<h>[^/?#:]+)"),
            "h",
        )
        return pa.table(
            {
                "url": t.column("url"),
                "host": host,
                "warc_ts": t.column("warc_ts"),
            }
        )

    narrow = pages.select_columns(["url", "warc_ts"]).map_batches(
        to_host, batch_format="pyarrow", zero_copy_batch=True
    )
    ranked = window_rank(
        narrow, ["host"], ["warc_ts", "url"], rank_col="rank", count_col="n"
    )

    def finish(t: pa.Table) -> pa.Table:
        wave = pc.subtract(t.column("rank"), 1)
        return pa.table(
            {
                "url": t.column("url"),
                "host": t.column("host"),
                "wave": wave,
                "fetch_offset_s": pc.multiply(wave, crawl_delay_s),
            }
        )

    return ranked.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


# --- redirect chain resolution ----------------------------------------------


def synthesize_redirects(docs: rd.Dataset) -> rd.Dataset:
    """FIXTURE stage (version rd1): a short-link redirect map as pure
    doc_id arithmetic — doc ``d`` with ``d % 8 != 0`` contributes the
    redirect ``/u/d → /u/(d-1)`` on the synthetic ``l.example.com``
    namespace. Dense doc_ids chain up to 7 hops before hitting a multiple
    of 8 (which is never a source), exercising multi-round pointer
    jumping. The DuckDB oracle re-derives the pair table from documents
    and unrolls the SAME doubling rounds."""

    def mk(t: pa.Table) -> pa.Table:
        did = t.column("doc_id")
        m8 = pc.subtract(did, pc.multiply(pc.divide(did, 8), 8))
        keep = pc.not_equal(m8, 0)
        tt = t.filter(keep)
        d = pc.cast(tt.column("doc_id"), pa.int64())
        base = pa.scalar("https://l.example.com/u/", pa.string())
        url = pc.binary_join_element_wise(base, pc.cast(d, pa.string()), "")
        tgt = pc.binary_join_element_wise(
            base, pc.cast(pc.subtract(d, 1), pa.string()), ""
        )
        return pa.table({"url": url, "target": tgt})

    return docs.select_columns(["doc_id"]).map_batches(
        mk, batch_format="pyarrow", zero_copy_batch=True
    )


def resolve_redirects(pairs: rd.Dataset, max_rounds: int = 16) -> rd.Dataset:
    """Redirect-chain resolution — the crawl-frontier canonicalization step:
    every redirect source maps to its FINAL destination (follow ``target``
    while the intermediate is itself a redirect source). Distributed
    pointer jumping via ``link.compress_mapping`` (parent := parent.parent
    per round, O(log chain) hash-join rounds, converges on no-change) —
    never a driver-side walk. Output: (url, final_url)."""
    from graphiti_ray.stages.link import compress_mapping

    m = pairs.map_batches(
        lambda t: pa.table(
            {"uuid": t.column("url"), "parent": t.column("target")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    closed = compress_mapping(m, max_rounds=max_rounds)
    return closed.map_batches(
        lambda t: pa.table(
            {"url": t.column("uuid"), "final_url": t.column("parent")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# --- crawl snapshot selection ------------------------------------------------


def synthesize_recrawls(docs: rd.Dataset) -> rd.Dataset:
    """Deterministic multi-crawl snapshot stream (fixture, version rc1):
    page ``doc_id`` was crawled ``1 + doc_id % 3`` times; crawl ``r``
    (0-based) is stamped ``warc_ts + r · 7 days``. Emits the narrow
    (url, warc_ts, crawl_rev) stream — column-pruned: snapshot selection
    never needs the html payload, so it never leaves storage. The DuckDB
    oracle re-derives the stream with generate_series."""
    import numpy as np

    from graphiti_ray.sources.synth_spec import TS0, page_url

    base_us = np.datetime64(TS0, "us").astype("int64")
    week_us = 7 * 24 * 3600 * 1_000_000

    def explode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = t.column("source").to_pylist()
        n_crawls = 1 + ids % 3
        rep = np.repeat(np.arange(len(ids)), n_crawls)
        # crawl_rev = position within each doc's run
        starts = np.zeros(len(ids), np.int64)
        np.cumsum(n_crawls[:-1], out=starts[1:])
        rev = np.arange(int(n_crawls.sum()), dtype=np.int64) - starts[rep]
        urls = [page_url(srcs[i], int(ids[i])) for i in rep]
        ts = base_us + ids[rep] * 3_600_000_000 + rev * week_us
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "crawl_rev": pa.array(rev, pa.int64()),
            }
        )

    return docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)


def latest_snapshots(
    ds: rd.Dataset, key: str = "url", ts_col: str = "warc_ts"
) -> rd.Dataset:
    """Latest-crawl-wins snapshot selection — the standard Common-Crawl
    dedup step (one row per url, the most recent capture; ties on
    ``ts_col`` must not occur — the caller guarantees per-key timestamp
    uniqueness, as real WARC capture times do).

    Scale shape: a per-batch partial argmax first shrinks every batch to
    one candidate row per key seen in it (so the sort input is bounded by
    distinct keys × blocks, not snapshots), then ``head_k_per_key`` takes
    the global per-key head via ONE range sort + the run-boundary kernel —
    no per-key dispatch, no driver materialization."""
    import pyarrow.compute as pc

    from graphiti_ray.stages.ops import _table_run_starts, head_k_per_key

    def with_neg(t: pa.Table) -> pa.Table:
        neg = pc.multiply(pc.cast(t.column(ts_col), pa.int64()), -1)
        return t.append_column("__neg_us", neg)

    def partial_argmax(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        s = t.sort_by([(key, "ascending"), ("__neg_us", "ascending")])
        starts = _table_run_starts(s, [key])[:-1]
        return s.take(pa.array(starts, pa.int64()))

    candidates = ds.map_batches(
        with_neg, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(partial_argmax, batch_format="pyarrow")
    out = head_k_per_key(candidates, [key], ["__neg_us"], k=1)
    return out.drop_columns(["__neg_us"])


def crawl_budget(
    pages: rd.Dataset,
    budget: int = 1000,
    host_col: str = "host",
) -> rd.Dataset:
    """Proportional crawl-budget allocation by the largest-remainder
    (Hamilton) method — the crawl-planning step that turns host page
    counts into integer fetch quotas summing EXACTLY to ``budget``:
    alloc_i = ⌊budget·n_i/T⌋ plus one bonus fetch for the R hosts with
    the largest remainders (R = budget − Σ⌊·⌋; ties → host ascending).
    All integer arithmetic — remainder ordering uses (budget·n_i) mod T,
    which orders identically to the fractional parts — so the SQL twin
    (two window functions) is value-exact.

    Scale shape: per-batch partial host counts (combiner) → one
    vocabulary-sized keyed sum → the ranking runs on the HOST table (one
    row per host), never the pages; the only driver scalars are T and R.
    Output: (host, n_pages, alloc).
    """
    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from graphiti_ray.stages.ops import window_rank

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    host_col: t.column(host_col),
                    "n": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
                }
            )
            .group_by([host_col])
            .aggregate([("n", "sum")])
        )
        return g.rename_columns([host_col, "n"])

    counts = (
        pages.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(host_col)
        .aggregate(Sum("n", alias_name="n_pages"))
        .materialize()
    )
    total = counts.sum("n_pages") or 0
    if total == 0:
        return rd.from_arrow(
            pa.table(
                {
                    host_col: pa.array([], pa.string()),
                    "n_pages": pa.array([], pa.int64()),
                    "alloc": pa.array([], pa.int64()),
                }
            )
        )

    def base_alloc(t: pa.Table, _T=total, _B=budget) -> pa.Table:
        n = t.column("n_pages").to_numpy(zero_copy_only=False)
        prod = n.astype(np.int64) * _B
        base = prod // _T
        rem = prod % _T
        return pa.table(
            {
                host_col: t.column(host_col),
                "n_pages": t.column("n_pages"),
                "_base": pa.array(base, pa.int64()),
                "_negrem": pa.array(-rem, pa.int64()),
                "_one": pa.array(np.zeros(len(n), np.int8), pa.int8()),
            }
        )

    allocs = counts.map_batches(base_alloc, batch_format="pyarrow").materialize()
    leftover = budget - (allocs.sum("_base") or 0)
    ranked = window_rank(
        allocs, ["_one"], ["_negrem", host_col], rank_col="_rk", count_col="_n"
    )

    def finish(t: pa.Table, _R=leftover) -> pa.Table:
        bonus = pc.cast(pc.less_equal(t.column("_rk"), _R), pa.int64())
        return pa.table(
            {
                host_col: t.column(host_col),
                "n_pages": t.column("n_pages"),
                "alloc": pc.add(t.column("_base"), bonus),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


_META_RES: dict = {}


def _meta_res():
    import re

    global _META_RES
    if not _META_RES:
        _META_RES = {
            "title": re.compile(rb"<title>([^<]*)</title>"),
            "h1": re.compile(rb"<h1[^>]*>([^<]*)</h1>"),
            "p": re.compile(rb"<p>"),
            "a": re.compile(rb"<a "),
        }
    return _META_RES


def extract_page_meta(pages: rd.Dataset) -> rd.Dataset:
    """Page-metadata extraction off the raw html bytes — the header
    fields a web-corpus index materializes next to the CDX record
    (title, first h1, paragraph and anchor censuses). Compiled byte
    regexes, one streaming pass, no shuffle; column-pruned to
    (url, html).

    Output: (url, title, h1, n_paragraphs, n_anchors)."""
    def meta(batch: pa.Table) -> pa.Table:
        res = _meta_res()
        urls = batch.column("url")
        titles, h1s, nps, nas = [], [], [], []
        for h in batch.column("html").to_pylist():
            m = res["title"].search(h)
            titles.append((m.group(1) if m else b"").decode("utf-8"))
            m = res["h1"].search(h)
            h1s.append((m.group(1) if m else b"").decode("utf-8"))
            nps.append(len(res["p"].findall(h)))
            nas.append(len(res["a"].findall(h)))
        return pa.table(
            {
                "url": urls,
                "title": pa.array(titles, pa.string()),
                "h1": pa.array(h1s, pa.string()),
                "n_paragraphs": pa.array(nps, pa.int64()),
                "n_anchors": pa.array(nas, pa.int64()),
            }
        )

    return pages.select_columns(["url", "html"]).map_batches(
        meta, batch_format="pyarrow", zero_copy_batch=True
    )
