"""MIME/EML and mbox walk — mailing-list archives as a corpus source.

RFC 5322 message framing + RFC 2045 MIME, the honest subset real
archive dumps need:

- header blocks with FOLDING (a CRLF followed by whitespace is removed
  on unfolding, the whitespace retained), case-insensitive names,
  ``name: value`` syntax enforced;
- ``multipart/*`` bodies split on ``--boundary`` lines (preamble and
  epilogue ignored, terminal ``--boundary--`` required);
- per-part Content-Transfer-Encoding: ``quoted-printable`` (=HH hex
  escapes, ``=`` + line break as a soft break) and ``base64`` decoded
  by hand / stdlib, ``7bit``/``8bit`` passthrough;
- mbox framing: messages delimited by envelope lines starting
  ``From ``, body lines that would collide are From-STUFFED with ``>``
  (the mboxrd convention) and unstuffed one level on parse.

Everything quarantines as ValueError (``binascii.Error`` from base64
is a ValueError subclass), matching the fleet-wide decoder contract.
Public knowledge: RFC 5322 / RFC 2045 / the mboxrd convention (qmail
documentation).  Reference parity: the reference ingests only scraped
HTML (scrapy notebook cell-4); list archives are the adjacent corpus
source a crawl pipeline meets next.
"""

from __future__ import annotations

import base64

_HEX = "0123456789ABCDEF"


def qp_encode(data: bytes, width: int = 72) -> str:
    out = []
    line_len = 0
    for b in data:
        if line_len >= width:
            out.append("=\n")  # soft break
            line_len = 0
        c = chr(b)
        if b in (0x3D,) or not (0x20 <= b <= 0x7E):
            out.append(f"={_HEX[b >> 4]}{_HEX[b & 15]}")
            line_len += 3
        else:
            out.append(c)
            line_len += 1
    return "".join(out)


def qp_decode(text: str) -> bytes:
    out = bytearray()
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c == "=":
            if i + 1 < n and text[i + 1] == "\n":  # soft break
                i += 2
                continue
            if i + 2 >= n:
                raise ValueError("quoted-printable escape truncated")
            hx = text[i + 1 : i + 3]
            try:
                out.append(int(hx, 16))
            except ValueError:
                raise ValueError(f"bad quoted-printable escape ={hx}")
            i += 3
        elif c in ("\n", "\t") or 0x20 <= ord(c) <= 0x7E:
            # TAB is legal raw in quoted-printable (RFC 2045 §6.7 rule
            # 3) and stdlib quopri leaves it unencoded
            out.append(ord(c))
            i += 1
        else:
            raise ValueError("raw non-ASCII byte in quoted-printable body")
    return bytes(out)


def _parse_headers(block: str) -> dict[str, str]:
    headers: dict[str, str] = {}
    lines = block.split("\n")
    i = 0
    while i < len(lines):
        line = lines[i]
        if not line:
            i += 1
            continue
        if line[0] in " \t":
            raise ValueError("continuation line without a header")
        if ":" not in line:
            raise ValueError(f"malformed header line {line[:40]!r}")
        name, _, value = line.partition(":")
        i += 1
        while i < len(lines) and lines[i][:1] in (" ", "\t"):
            value += lines[i]  # unfold: CRLF removed, WSP retained
            i += 1
        headers[name.strip().lower()] = value.strip()
    return headers


def _boundary_of(content_type: str) -> str | None:
    if not content_type.lower().startswith("multipart/"):
        return None
    for piece in content_type.split(";")[1:]:
        k, _, v = piece.strip().partition("=")
        if k.lower() == "boundary":
            v = v.strip()
            if v[:1] == '"' and v[-1:] == '"':
                v = v[1:-1]
            if not v:
                raise ValueError("empty multipart boundary")
            return v
    raise ValueError("multipart content-type without boundary")


def _decode_body(headers: dict[str, str], body: str) -> bytes:
    enc = headers.get("content-transfer-encoding", "7bit").lower()
    if enc == "quoted-printable":
        return qp_decode(body)
    if enc == "base64":
        compact = "".join(body.split())
        try:
            return base64.b64decode(compact, validate=True)
        except ValueError:
            raise ValueError("bad base64 part body")
    if enc in ("7bit", "8bit", "binary"):
        return body.encode("utf-8")
    raise ValueError(f"unsupported transfer encoding {enc!r}")


def parse_eml(text: str) -> dict:
    """One RFC 5322 message → ``{headers, n_parts, parts}`` where
    ``parts`` is ``[(content_type, decoded_bytes), ...]`` (a non-MIME
    body is one implicit text part)."""
    if "\n\n" not in text:
        raise ValueError("message has no header/body separator")
    head, _, body = text.partition("\n\n")
    headers = _parse_headers(head)
    ctype = headers.get("content-type", "text/plain")
    boundary = _boundary_of(ctype)
    if boundary is None:
        return {
            "headers": headers,
            "n_parts": 1,
            "parts": [(ctype.split(";")[0].strip(), _decode_body(headers, body))],
        }
    marker = f"--{boundary}"
    lines = body.split("\n")
    sections: list[list[str]] = []
    current: list[str] | None = None
    terminated = False
    for ln in lines:
        if ln == marker + "--":
            terminated = True
            break
        if ln == marker:
            if current is not None:
                sections.append(current)
            current = []
        elif current is not None:
            current.append(ln)
    if not terminated:
        raise ValueError("multipart body missing terminal boundary")
    if current is not None:
        sections.append(current)
    if not sections:
        raise ValueError("multipart body with no parts")
    parts = []
    for sec in sections:
        sec_text = "\n".join(sec)
        if "\n\n" not in sec_text:
            raise ValueError("part has no header/body separator")
        phead, _, pbody = sec_text.partition("\n\n")
        ph = _parse_headers(phead)
        pct = ph.get("content-type", "text/plain").split(";")[0].strip()
        parts.append((pct, _decode_body(ph, pbody)))
    return {"headers": headers, "n_parts": len(parts), "parts": parts}


def make_mbox(messages: list[str]) -> bytes:
    """mboxrd framing: envelope line per message, body lines matching
    ``>*From `` get one more ``>``."""
    out = []
    for i, msg in enumerate(messages):
        out.append(f"From archive@example.org Mon Jan  1 00:00:0{i % 10} 2024")
        for ln in msg.split("\n"):
            stripped = ln.lstrip(">")
            if stripped.startswith("From "):
                ln = ">" + ln
            out.append(ln)
    return ("\n".join(out) + "\n").encode("utf-8")


def parse_mbox(payload: bytes) -> list[dict]:
    """Split on envelope lines, unstuff one ``>`` level, parse each
    message."""
    text = payload.decode("utf-8", "strict")
    if not text.startswith("From "):
        raise ValueError("mbox must start with an envelope line")
    messages: list[list[str]] = []
    for ln in text.split("\n"):
        if ln.startswith("From "):
            messages.append([])
            continue  # envelope line itself is not message content
        if not messages:
            raise ValueError("content before first envelope")
        stripped = ln.lstrip(">")
        if stripped.startswith("From ") and ln.startswith(">"):
            ln = ln[1:]  # unstuff one level
        messages[-1].append(ln)
    out = []
    for lines in messages:
        while lines and lines[-1] == "":
            lines.pop()
        out.append(parse_eml("\n".join(lines)))
    return out
