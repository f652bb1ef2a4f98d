"""MIME/mbox walk semantics (operators/mime.py): header unfolding,
boundary framing, transfer decodings pinned against Python's OWN email
and quopri/base64 machinery — interop with the stdlib reference
implementation, the strongest local gate available."""

from __future__ import annotations

import quopri

import pytest

from hainan_big_data_recommend_system_spark.operators.mime import (
    make_mbox,
    parse_eml,
    parse_mbox,
    qp_decode,
    qp_encode,
)

MSG = "\n".join([
    "From: a@example.com",
    "Subject: Hello",
    " folded tail",
    'Content-Type: multipart/mixed; boundary="XY"',
    "",
    "preamble",
    "--XY",
    "Content-Type: text/plain",
    "Content-Transfer-Encoding: quoted-printable",
    "",
    "caf=C3=A9 =3D ok",
    "--XY",
    "Content-Type: application/octet-stream",
    "Content-Transfer-Encoding: base64",
    "",
    "AAEC/w==",
    "--XY--",
    "trailer",
])


def test_unfold_boundaries_and_decodings():
    r = parse_eml(MSG)
    assert r["headers"]["subject"] == "Hello folded tail"
    assert r["n_parts"] == 2
    assert r["parts"][0] == ("text/plain", "café = ok".encode())
    assert r["parts"][1] == ("application/octet-stream", b"\x00\x01\x02\xff")


def test_qp_roundtrip_matches_stdlib():
    for s in ["plain", "café = naïve\nline2", "=weird=", "a" * 200,
              "tab\there = kept\traw"]:
        enc = qp_encode(s.encode())
        assert qp_decode(enc) == s.encode()
        # stdlib decodes our encoding identically (soft breaks included)
        assert quopri.decodestring(enc.encode()) == s.encode()
        # and we decode the stdlib's encoding
        std = quopri.encodestring(s.encode()).decode()
        assert qp_decode(std) == s.encode()


def test_stdlib_email_agrees_on_structure():
    import email

    m = email.message_from_string(MSG)
    assert m["Subject"].replace("\n", "") == "Hello folded tail"
    parts = [p for p in m.walk() if not p.is_multipart()]
    ours = parse_eml(MSG)["parts"]
    assert [p.get_content_type() for p in parts] == [ct for ct, _ in ours]
    assert [p.get_payload(decode=True) for p in parts] == [b for _, b in ours]


def test_mbox_roundtrip_with_from_stuffing():
    body_with_from = MSG.replace("preamble", "From the start")
    payload = make_mbox([body_with_from, MSG])
    assert b"\n>From the start" in payload  # stuffed on disk
    msgs = parse_mbox(payload)
    assert len(msgs) == 2
    assert msgs[0]["n_parts"] == msgs[1]["n_parts"] == 2


@pytest.mark.parametrize(
    "bad",
    [
        MSG.replace("--XY--", "--XY"),          # unterminated multipart
        " orphan lead\n" + MSG,                   # continuation first
        MSG.replace("=C3", "=ZZ"),               # bad qp escape
        MSG.replace("AAEC/w==", "!!notb64!!"),   # bad base64
        "no separator at all",
        MSG.replace('boundary="XY"', 'boundary=""'),
    ],
)
def test_malformed_quarantines(bad):
    with pytest.raises(ValueError):
        parse_eml(bad)
