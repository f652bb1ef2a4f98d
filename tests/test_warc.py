"""WARC source (sources/warc.py): framing, gzip-member looping, HTTP
body extraction, malformed-stream rejection.  warc_corpus_scan is
oracle-gated in test_oracle."""

from __future__ import annotations

import zlib

import pytest

from hainan_big_data_recommend_system_spark.sources.warc import (
    make_warc,
    parse_warc,
)

PAGES = [
    ("https://a.example/1", b"<html><body><p>hello page one</p></body></html>"),
    ("https://a.example/2",
     "<html><body><p>élève two</p></body></html>".encode()),
]


def test_roundtrip_plain_and_gzipped():
    for gz in (False, True):
        recs = parse_warc(make_warc(PAGES, gzip_records=gz))
        assert recs[0]["type"] == "warcinfo"
        resp = recs[1:]
        assert [r["target_uri"] for r in resp] == [u for u, _ in PAGES]
        assert [r["body"] for r in resp] == [b for _, b in PAGES]
        assert all(r["http_status"] == 200 for r in resp)


def test_gzip_members_are_independent():
    """Common Crawl layout: each record its own gzip member — a reader
    inflating only the FIRST member would see one record; ours must loop
    the unused tail."""
    w = make_warc(PAGES, gzip_records=True)
    # first member alone decodes to only the warcinfo record
    do = zlib.decompressobj(31)
    first = do.decompress(w) + do.flush()
    assert first.startswith(b"WARC/1.0") and b"response" not in first
    assert do.unused_data  # more members follow
    assert len(parse_warc(w)) == 3


def test_content_length_framing_is_authoritative():
    """A body containing CRLF CRLF must NOT end the record early — only
    Content-Length frames the payload."""
    tricky = b"<p>a\r\n\r\nb</p>"
    recs = parse_warc(make_warc([("u", tricky)]))
    assert recs[1]["body"] == tricky


def test_rejects_malformed():
    good = make_warc(PAGES)
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"XARC/1.0" + good[8:])
    with pytest.raises(ValueError, match="truncated|separator"):
        parse_warc(good[:-9])
    # corrupt gzip member
    gz = bytearray(make_warc(PAGES, gzip_records=True))
    gz[len(gz) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        parse_warc(bytes(gz))


def test_http_chunked_and_gzip_bodies_decode():
    """Round 7: transport decodings — chunked framing (uneven chunk
    sizes, extensions-free) and gzip content-coding both recover the
    original body; malformed framing quarantines."""
    import pytest as _pytest

    from hainan_big_data_recommend_system_spark.sources.warc import (
        make_warc,
        parse_warc,
    )

    body = b"the quick brown fox jumps over the lazy dog " * 9
    for enc in ("chunked", "gzip"):
        recs = parse_warc(
            make_warc([("https://x.example/a", body)], http_encoding=enc)
        )
        resp = [r for r in recs if r["type"] == "response"][0]
        assert resp["body"] == body
        if enc == "chunked":
            assert resp["http_headers"]["transfer-encoding"] == "chunked"
        else:
            assert resp["http_headers"]["content-encoding"] == "gzip"

    # identity path unchanged, headers exposed
    recs = parse_warc(make_warc([("https://x.example/b", b"plain")]))
    resp = [r for r in recs if r["type"] == "response"][0]
    assert resp["body"] == b"plain"
    assert resp["http_headers"]["content-length"] == "5"

    with _pytest.raises(ValueError, match="unsupported http_encoding"):
        make_warc([("u", b"x")], http_encoding="br")

    # broken chunk framing: size line lies about remaining data
    import re

    payload = make_warc([("https://x.example/c", body)], http_encoding="chunked")
    broken = re.sub(rb"\n25\r\n", b"\nff\r\n", payload, count=1)
    assert broken != payload, "fixture lost its 0x25 chunk-size line"
    with _pytest.raises(ValueError, match="chunk"):
        parse_warc(broken)


def test_revisit_records_roundtrip():
    from hainan_big_data_recommend_system_spark.sources.warc import (
        make_warc,
        parse_warc,
    )

    recs = parse_warc(
        make_warc(
            [("https://a.example/p", b"content")],
            revisits=[("https://b.example/p", "https://a.example/p")],
            gzip_records=True,
        )
    )
    types = [r["type"] for r in recs]
    assert types == ["warcinfo", "response", "revisit"]
    rv = recs[2]
    assert rv["refers_to"] == "https://a.example/p"
    assert rv["target_uri"] == "https://b.example/p"
    assert recs[1]["refers_to"] is None
