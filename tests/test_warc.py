"""WARC connector (sources/warc.py): framing, tricky payloads, roundtrip."""

import pyarrow as pa

import ray.data as rd

from graphiti_ray.sources.warc import (
    _format_record,
    parse_warc_bytes,
    read_warc,
    write_warc,
)


def test_parse_content_length_framing_survives_tricky_payloads():
    """Payloads containing blank lines and literal 'WARC/1.0' text must not
    break record framing — Content-Length is the only authority."""
    evil = b"<html>\r\n\r\nWARC/1.0\r\nContent-Length: 999\r\n\r\n</html>"
    blob = _format_record(
        "https://a.com/x", 1_700_000_000_123_456, "en", evil
    ) + _format_record("https://b.com/y", 42, "de", b"")
    recs = parse_warc_bytes(blob)
    assert len(recs) == 2
    assert recs[0]["url"] == "https://a.com/x"
    assert recs[0]["html"] == evil
    assert recs[0]["warc_ts_us"] == 1_700_000_000_123_456  # µs exact
    assert recs[0]["lang"] == "en"
    assert recs[1] == {
        "url": "https://b.com/y",
        "warc_ts_us": 42,
        "html": b"",
        "lang": "de",
    }


def test_parse_truncated_payload_raises():
    import pytest

    blob = _format_record("https://a.com/x", 0, "en", b"abcdef")
    with pytest.raises(ValueError):
        parse_warc_bytes(blob[:-10])


def test_write_read_roundtrip(ray_session, tmp_path):
    pages = rd.from_arrow(
        pa.table(
            {
                "url": ["https://a.com/1", "https://a.com/2"],
                "warc_ts": pa.array(
                    [1_000_000, 2_000_000], pa.timestamp("us")
                ),
                "html": pa.array([b"<p>one</p>", b"<p>two</p>"], pa.binary()),
                "lang": ["en", "fr"],
            }
        )
    )
    out = str(tmp_path / "warc")
    n_files = write_warc(pages, out)
    assert n_files >= 1
    back = sorted(
        (r["url"], r["warc_ts"], r["html"], r["lang"])
        for r in read_warc(out).take_all()
    )
    assert [b[0] for b in back] == ["https://a.com/1", "https://a.com/2"]
    assert [b[2] for b in back] == [b"<p>one</p>", b"<p>two</p>"]
    assert [b[3] for b in back] == ["en", "fr"]
