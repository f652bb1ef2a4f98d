"""WARC (Web ARChive) source — the container web crawls actually ship in.

Common Crawl distributes its corpus as WARC files: a sequence of
records, each a ``WARC/1.0`` header block (CRLF lines, blank-line
terminated) followed by exactly ``Content-Length`` payload bytes and a
CRLF CRLF record separator.  ``response`` records wrap a raw HTTP
response (status line + headers + body); the standard distribution
gzips each record as its OWN gzip member and concatenates them — a
reader must loop ``zlib`` members, not decompress once.

This module is the ingestion edge of the text pipeline: WARC record
framing → HTTP body extraction → (downstream) ``operators/html``
boilerplate removal → C4 cleaning → dedup — the actual Common Crawl
processing chain.  Both directions are real:

- :func:`make_warc` emits spec-shaped records (warcinfo + response),
  plain or per-record-gzipped;
- :func:`parse_warc` walks members/records with strict framing
  (ValueError quarantine on truncated payloads, bad version lines,
  missing lengths) and returns typed records with the HTTP body
  separated from its headers.

Public knowledge: ISO 28500 (WARC 1.0/1.1); RFC 9112 (HTTP framing).
"""

from __future__ import annotations

import zlib


def _record(headers: dict[str, str], payload: bytes) -> bytes:
    head = "".join(
        f"{k}: {v}\r\n" for k, v in headers.items()
    )
    return (
        f"WARC/1.0\r\n{head}Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii") + payload + b"\r\n\r\n"


def make_warc(
    pages: list[tuple[str, bytes]],
    gzip_records: bool = False,
    revisits: list[tuple[str, str]] | None = None,
    http_encoding: str | None = None,
) -> bytes:
    """A WARC stream with one ``warcinfo`` record followed by one
    ``response`` record per ``(target_uri, html_body)`` page.

    ``revisits`` — ``(target_uri, refers_to_uri)`` pairs — appends the
    crawl-time dedup markers real crawls carry (ISO 28500 §6.7.2 /
    Common Crawl's ``identical-payload-digest`` profile): a ``revisit``
    record asserts the fetched payload was identical to an earlier
    capture of ``refers_to_uri``, shipping only the HTTP headers."""
    records = [
        _record(
            {
                "WARC-Type": "warcinfo",
                "WARC-Record-ID": "<urn:uuid:00000000-0000-0000-0000-000000000000>",
                "Content-Type": "application/warc-fields",
            },
            b"software: hainan_big_data_recommend_system_spark\r\n",
        )
    ]
    for i, (uri, body) in enumerate(pages):
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            + f"Content-Length: {len(body)}\r\n\r\n".encode("ascii")
            + body
        )
        if http_encoding == "chunked":
            # RFC 9112 §7.1: size-in-hex CRLF data CRLF …, 0-chunk last
            chunks = bytearray()
            for off in range(0, len(body), 37):  # odd size: uneven chunks
                part = body[off : off + 37]
                chunks += f"{len(part):x}\r\n".encode() + part + b"\r\n"
            chunks += b"0\r\n\r\n"
            http = (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                b"Transfer-Encoding: chunked\r\n\r\n" + bytes(chunks)
            )
        elif http_encoding == "gzip":
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            gz = co.compress(body) + co.flush()
            http = (
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: text/html; charset=utf-8\r\n"
                b"Content-Encoding: gzip\r\n"
                + f"Content-Length: {len(gz)}\r\n\r\n".encode("ascii")
                + gz
            )
        elif http_encoding is not None:
            raise ValueError(f"unsupported http_encoding {http_encoding!r}")
        records.append(
            _record(
                {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:{i:032x}>",
                    "WARC-Target-URI": uri,
                    "Content-Type": "application/http; msgtype=response",
                },
                http,
            )
        )
    for uri, refers_to in revisits or []:
        http_head = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n\r\n"
        )
        records.append(
            _record(
                {
                    "WARC-Type": "revisit",
                    "WARC-Record-ID": (
                        "<urn:uuid:"
                        + __import__("hashlib").md5(uri.encode()).hexdigest()
                        + ">"
                    ),
                    "WARC-Target-URI": uri,
                    "WARC-Refers-To-Target-URI": refers_to,
                    "WARC-Profile": (
                        "http://netpreserve.org/warc/1.0/revisit/"
                        "identical-payload-digest"
                    ),
                    "Content-Type": "application/http; msgtype=response",
                },
                http_head,
            )
        )
    if not gzip_records:
        return b"".join(records)
    out = bytearray()
    for r in records:  # one gzip MEMBER per record, like Common Crawl
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        out += co.compress(r) + co.flush()
    return bytes(out)


def _split_members(payload: bytes) -> bytes:
    """Concatenated-gzip-member decode (the CC layout): loop
    decompressobj over unused tails."""
    out = bytearray()
    rest = payload
    while rest:
        do = zlib.decompressobj(31)
        try:
            out += do.decompress(rest)
        except zlib.error as e:
            raise ValueError(f"bad gzip member in WARC stream: {e}") from e
        out += do.flush()
        if not do.eof:
            raise ValueError("truncated gzip member in WARC stream")
        rest = do.unused_data
    return bytes(out)


def _dechunk(raw: bytes) -> bytes:
    """RFC 9112 §7.1 chunked-body decode: hex size CRLF data CRLF …,
    terminated by a zero chunk (trailers ignored).  Strict ValueError
    quarantine on bad framing."""
    out = bytearray()
    pos = 0
    while True:
        nl = raw.find(b"\r\n", pos)
        if nl < 0:
            raise ValueError("unterminated chunk-size line")
        size_tok = raw[pos:nl].split(b";", 1)[0].strip()  # drop extensions
        try:
            size = int(size_tok, 16)
        except ValueError as e:
            raise ValueError(f"bad chunk size {size_tok!r}") from e
        pos = nl + 2
        if size == 0:
            return bytes(out)
        if pos + size + 2 > len(raw):
            raise ValueError("chunk data truncated")
        out += raw[pos : pos + size]
        if raw[pos + size : pos + size + 2] != b"\r\n":
            raise ValueError("missing CRLF after chunk data")
        pos += size + 2


def parse_warc(payload: bytes) -> list[dict]:
    """Parse a (possibly per-record-gzipped) WARC stream into records:
    ``{"type", "target_uri", "headers", "payload"}`` plus, for
    ``response`` records, ``"http_status"`` and ``"body"``."""
    if payload[:2] == b"\x1f\x8b":
        payload = _split_members(payload)
    records: list[dict] = []
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 5] != b"WARC/":
            raise ValueError(f"bad WARC version line at offset {pos}")
        hdr_end = payload.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header block")
        lines = payload[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            if ":" not in line:
                raise ValueError(f"malformed WARC header line {line!r}")
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        try:
            clen = int(headers["content-length"])
        except ValueError as e:
            raise ValueError("non-integer Content-Length") from e
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError("WARC payload truncated")
        body = payload[body_start : body_start + clen]
        rec: dict = {
            "type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri"),
            # revisit records (crawl-time dedup markers) point at the
            # capture whose payload they matched
            "refers_to": headers.get("warc-refers-to-target-uri"),
            "headers": headers,
            "payload": body,
        }
        if rec["type"] == "response" and body[:5] == b"HTTP/":
            he = body.find(b"\r\n\r\n")
            if he < 0:
                raise ValueError("unterminated HTTP header block")
            status_line = body[: body.find(b"\r\n")].decode("ascii", "replace")
            parts = status_line.split(" ")
            if len(parts) < 2 or not parts[1].isdigit():
                raise ValueError(f"bad HTTP status line {status_line!r}")
            rec["http_status"] = int(parts[1])
            hhdr: dict[str, str] = {}
            for line in body[:he].decode("latin-1").split("\r\n")[1:]:
                if ":" in line:
                    hk, hv = line.split(":", 1)
                    hhdr[hk.strip().lower()] = hv.strip()
            raw = body[he + 4 :]
            # transport decodings real crawl captures carry (round 7):
            # RFC 9112 chunked framing, then RFC 9110 content-coding
            if hhdr.get("transfer-encoding", "").lower() == "chunked":
                raw = _dechunk(raw)
            if hhdr.get("content-encoding", "").lower() == "gzip":
                do = zlib.decompressobj(31)
                try:
                    raw = do.decompress(raw) + do.flush()
                except zlib.error as e:
                    raise ValueError(f"bad gzip HTTP body: {e}") from e
                if not do.eof:
                    raise ValueError("truncated gzip HTTP body")
            rec["http_headers"] = hhdr
            rec["body"] = raw
        records.append(rec)
        pos = body_start + clen
        if payload[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError("missing WARC record separator")
        pos += 4
    return records
