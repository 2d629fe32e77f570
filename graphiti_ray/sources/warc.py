"""WARC source/sink: the Common-Crawl native record format as a real
binary connector (ISO 28500 / RFC-aligned subset — response records with
the headers this pipeline consumes). Production ingest reads WARC segments
written by the crawler; this module gives the repo that path end-to-end:

- ``write_warc``  pages Dataset → ``.warc`` files (one per output block,
  so the layout is partitioned and a resumable re-read can skip files);
- ``read_warc``   ``.warc`` files → the standard pages table
  (url, warc_ts, html, lang) via ``ray.data.read_binary_files`` + a
  streaming per-record parser (Content-Length-driven, not delimiter
  splitting, so payloads containing blank lines or stray ``WARC/1.0``
  text can't corrupt the framing).

Parsing is per-record Python (format decoding is inherently sequential
within a file); files are the parallelism unit, exactly how Common Crawl
shards its segments.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pyarrow as pa

import ray.data as rd

_CRLF = b"\r\n"


def _format_record(url: str, ts_us: int, lang: str, html: bytes) -> bytes:
    iso = (
        datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%S.%f")
        + "Z"
    )
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"WARC-Date: " + iso.encode() + _CRLF
        + b"WARC-Identified-Content-Language: " + lang.encode() + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF
    )
    return head + html + _CRLF + _CRLF


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC file's bytes into page dicts. Content-Length framing:
    read headers up to the blank line, then exactly that many payload
    bytes — never split on delimiters inside payloads."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        headers: dict[str, str] = {}
        version_line, *lines = data[pos:head_end].split(_CRLF)
        if not version_line.startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line: {version_line[:40]!r}")
        for ln in lines:
            k, _, v = ln.partition(b":")
            headers[k.strip().decode().lower()] = v.strip().decode()
        clen = int(headers["content-length"])
        body_start = head_end + 4
        payload = data[body_start : body_start + clen]
        if len(payload) != clen:
            raise ValueError("truncated WARC payload")
        iso = headers["warc-date"].rstrip("Z")
        ts = datetime.strptime(iso, "%Y-%m-%dT%H:%M:%S.%f").replace(
            tzinfo=timezone.utc
        )
        out.append(
            {
                "url": headers["warc-target-uri"],
                # integer µs via timedelta arithmetic (float
                # .timestamp()*1e6 loses µs on far-future dates)
                "warc_ts_us": (
                    (ts - datetime(1970, 1, 1, tzinfo=timezone.utc))
                    // timedelta(microseconds=1)
                ),
                "html": payload,
                "lang": headers.get(
                    "warc-identified-content-language", ""
                ),
            }
        )
        pos = body_start + clen
    return out


def write_warc(pages: rd.Dataset, out_dir: str) -> int:
    """Serialize the pages Dataset to ``<out_dir>/part-*.warc`` — one file
    per task via ``write_datasink``-free map_batches + driver-side rename
    kept simple: each batch writes one uniquely-named file (uuid from the
    first url's md5), so re-runs overwrite deterministically and a reader
    can parallelize per file. Returns the number of files written."""
    import hashlib
    import os

    os.makedirs(out_dir, exist_ok=True)

    def dump(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string())})
        urls = t.column("url").to_pylist()
        ts = t.column("warc_ts").cast(pa.int64()).to_pylist()
        langs = t.column("lang").to_pylist()
        htmls = t.column("html").to_pylist()
        blob = b"".join(
            _format_record(u, s, lg, hb)
            for u, s, lg, hb in zip(urls, ts, langs, htmls)
        )
        name = "part-" + hashlib.md5(urls[0].encode()).hexdigest()[:16] + ".warc"
        path = os.path.join(out_dir, name)
        with open(path, "wb") as f:
            f.write(blob)
        return pa.table({"file": pa.array([name], pa.string())})

    files = pages.map_batches(
        dump, batch_format="pyarrow", zero_copy_batch=True
    )
    return files.count()


def read_warc(paths: str | list[str]) -> rd.Dataset:
    """``.warc`` files → pages table (url, warc_ts, html, lang); one
    parse task per file."""

    raw = rd.read_binary_files(paths, file_extensions=["warc"])

    def parse(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for blob in t.column("bytes").to_pylist():
            rows.extend(parse_warc_bytes(blob))
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "warc_ts": pa.array(
                    [r["warc_ts_us"] for r in rows], pa.int64()
                ).cast(pa.timestamp("us")),
                "html": pa.array([r["html"] for r in rows], pa.binary()),
                "lang": pa.array([r["lang"] for r in rows], pa.string()),
            }
        )

    return raw.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
