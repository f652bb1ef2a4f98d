"""Minimal PDF text extraction — the document format crawled corpora
actually drown in.

Scope (documented, enforced): PDF 1.4-style files whose page content
streams are plain or FlateDecode, with text shown via ``Tj`` strings
and ``TJ`` arrays inside ``BT``/``ET`` blocks — the shape the fixture
encoder (`make_pdf`) emits and the common shape of simple text PDFs.
Everything inside that scope is REAL:

- object scan: ``N G obj … endobj`` walk (recovery-mode reading — the
  xref table is written by the encoder for validity but the reader does
  not require it, like real extractors' damage recovery);
- stream extraction: ``/Length`` framing, ``/Filter /FlateDecode``
  inflate via zlib;
- text operators: ``(…) Tj`` and ``[(…) -250 (…)] TJ`` with full
  string-escape handling (``\\\\``, ``\\(``, ``\\)``, ``\\n``, ``\\r``,
  ``\\t``, octal ``\\ddd``) — arbitrary text (parens, backslashes)
  round-trips exactly.

Out-of-scope constructs (encrypted files, cross-reference streams,
CID/Type0 fonts, other filters) raise ValueError — the quarantine
contract of every decoder in this repo.

Public knowledge: PDF 1.7 specification (ISO 32000-1).
"""

from __future__ import annotations

import re
import zlib

_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", "b": "\b", "f": "\f",
            "(": "(", ")": ")", "\\": "\\"}


def _escape_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(lines: list[str], compress: bool = True) -> bytes:
    """A valid single-page PDF showing each line as one ``Tj`` run (odd
    lines are split into a ``TJ`` array to exercise that operator)."""
    ops = ["BT", "/F1 12 Tf", "72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append("0 -14 Td")
        if i % 2 == 1 and len(line) > 2:
            mid = len(line) // 2
            ops.append(
                f"[({_escape_string(line[:mid])}) -250 "
                f"({_escape_string(line[mid:])})] TJ"
            )
        else:
            ops.append(f"({_escape_string(line)}) Tj")
    ops.append("ET")
    content = "\n".join(ops).encode("latin-1", "replace")
    if compress:
        blob = zlib.compress(content, 6)
        filt = " /Filter /FlateDecode"
    else:
        blob = content
        filt = ""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        f"<< /Length {len(blob)}{filt} >>".encode() + b"\nstream\n" + blob
        + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _unescape(raw: str) -> str:
    out = []
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:
            raise ValueError("dangling backslash in PDF string")
        nxt = raw[i + 1]
        if nxt in _ESCAPES:
            out.append(_ESCAPES[nxt])
            i += 2
        elif nxt.isdigit():
            j = i + 1
            while j < n and j < i + 4 and raw[j].isdigit():
                j += 1
            out.append(chr(int(raw[i + 1 : j], 8) & 0xFF))
            i = j
        else:
            out.append(nxt)  # unknown escape: the char itself (spec rule)
            i += 2
    return "".join(out)


def _strings_in(segment: str):
    """Yield PDF literal strings in ``segment`` honoring escapes and
    balanced parens."""
    i = 0
    n = len(segment)
    while i < n:
        if segment[i] != "(":
            i += 1
            continue
        depth = 1
        j = i + 1
        buf = []
        while j < n and depth:
            c = segment[j]
            if c == "\\" and j + 1 < n:
                buf.append(c)
                buf.append(segment[j + 1])
                j += 2
                continue
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            buf.append(c)
            j += 1
        if depth:
            raise ValueError("unbalanced PDF string parenthesis")
        yield "".join(buf), i, j + 1
        i = j + 1


def extract_pdf_text(payload: bytes) -> list[str]:
    """Text runs (one per ``Tj``; ``TJ`` arrays concatenated) from every
    content stream, in document order."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF: missing %PDF header")
    if b"/Encrypt" in payload:
        raise ValueError("encrypted PDFs unsupported")
    runs: list[str] = []
    for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", payload):
        start = m.end()
        end = payload.find(b"endobj", start)
        if end < 0:
            raise ValueError("object without endobj")
        body = payload[start:end]
        sm = re.search(rb"stream\r?\n", body)
        if sm is None:
            continue
        head = body[: sm.start()]
        lm = re.search(rb"/Length\s+(\d+)\b", head)
        if lm is None:
            raise ValueError("stream without direct /Length")
        length = int(lm.group(1))
        data = body[sm.end() : sm.end() + length]
        if len(data) < length:
            raise ValueError("stream shorter than /Length")
        if b"/Filter" in head:
            if b"/FlateDecode" not in head:
                raise ValueError("unsupported stream filter")
            try:
                data = zlib.decompress(data)
            except zlib.error as e:
                raise ValueError(f"bad FlateDecode stream: {e}") from e
        text = data.decode("latin-1")
        for bt in re.finditer(r"BT(.*?)ET", text, re.S):
            seg = bt.group(1)
            # walk strings; classify by what follows each one: `Tj`
            # shows the string directly; otherwise the string is a TJ
            # array element, accumulated until its `] TJ` close so
            # ADJACENT arrays stay separate runs
            acc: list[str] | None = None
            for raw, _s0, s1 in _strings_in(seg):
                tail = seg[s1:].lstrip()
                if tail.startswith("Tj"):
                    if acc is not None:
                        runs.append("".join(acc))
                        acc = None
                    runs.append(_unescape(raw))
                    continue
                if acc is None:
                    acc = []
                acc.append(_unescape(raw))
                if tail.startswith("]"):  # this fragment closes its array
                    runs.append("".join(acc))
                    acc = None
            if acc is not None:
                runs.append("".join(acc))
    return runs
