"""Minimal PDF text extraction (operators/pdftext.py): Tj/TJ operators,
string escapes, FlateDecode, adjacent-array separation, malformed
rejection.  pdf_text_extract is oracle-gated in test_oracle."""

from __future__ import annotations

import zlib

import pytest

from hainan_big_data_recommend_system_spark.operators.pdftext import (
    extract_pdf_text,
    make_pdf,
)


def test_roundtrip_plain_and_compressed():
    cases = [
        ["first line of text.", "second (with parens) and \\ backslash",
         "third short", "x", "fifth"],
        ["aaaa", "bbbb", "cccc", "dddd"],  # alternating Tj / TJ
        ["(((", ")))", "\\\\\\", "mix)(ed\\"],  # escape torture
        [""],
        ["latin-1 text: caf\xe9 na\xefve"],
    ]
    for lines in cases:
        for comp in (True, False):
            assert extract_pdf_text(make_pdf(lines, compress=comp)) == lines


def test_adjacent_tj_arrays_stay_separate_runs():
    content = b"BT [(ab) -2 (cd)] TJ [(ef)] TJ (gh) Tj ET"
    blob = zlib.compress(content)
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(blob)).encode()
           + b" /Filter /FlateDecode >>\nstream\n" + blob
           + b"\nendstream\nendobj\n%%EOF\n")
    assert extract_pdf_text(pdf) == ["abcd", "ef", "gh"]


def test_octal_and_letter_escapes():
    content = rb"BT (\101\102\103 and \n tab \t done) Tj ET"
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n")
    assert extract_pdf_text(pdf) == ["ABC and \n tab \t done"]


def test_rejects_out_of_scope_and_malformed():
    good = make_pdf(["hello world"])
    with pytest.raises(ValueError, match="PDF"):
        extract_pdf_text(b"not a pdf")
    with pytest.raises(ValueError, match="[Ee]ncrypt"):
        extract_pdf_text(good.replace(b"/Root", b"/Encrypt /X /Root"))
    with pytest.raises(ValueError, match="filter"):
        extract_pdf_text(good.replace(b"/FlateDecode", b"/LZWDecode\x20\x20"))
    # truncated stream: /Length promises more bytes than exist
    i = good.find(b"stream")
    with pytest.raises(ValueError, match="shorter|endobj"):
        extract_pdf_text(good[: i + 20])
