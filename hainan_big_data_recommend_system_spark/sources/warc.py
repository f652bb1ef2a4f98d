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
            rec["body"] = body[he + 4 :]
        records.append(rec)
        pos = body_start + clen
        if payload[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError("missing WARC record separator")
        pos += 4
    return records
