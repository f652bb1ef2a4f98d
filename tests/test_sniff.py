"""Magic-byte detection (operators/sniff.py): every format this repo
writes must be identified from its own writer's output, and junk must
quarantine as ValueError."""

from __future__ import annotations

import pytest

from hainan_big_data_recommend_system_spark.operators.sniff import (
    detect_format,
)


def _cases():
    from hainan_big_data_recommend_system_spark.operators.avrocf import (
        make_avro,
    )
    from hainan_big_data_recommend_system_spark.operators.avi import (
        make_fixture_avi,
    )
    from hainan_big_data_recommend_system_spark.operators.flac import (
        make_flac,
    )
    from hainan_big_data_recommend_system_spark.operators.gif import make_gif
    from hainan_big_data_recommend_system_spark.operators.jpeg import (
        make_jpeg,
    )
    from hainan_big_data_recommend_system_spark.operators.mime import (
        make_mbox,
    )
    from hainan_big_data_recommend_system_spark.operators.mkv import (
        make_webm,
    )
    from hainan_big_data_recommend_system_spark.operators.mp3 import make_mp3
    from hainan_big_data_recommend_system_spark.operators.mp4 import (
        make_fixture_mp4,
    )
    from hainan_big_data_recommend_system_spark.operators.multimodal import (
        make_bmp,
        make_png,
    )
    from hainan_big_data_recommend_system_spark.operators.ogg import (
        make_ogg_opus,
    )
    from hainan_big_data_recommend_system_spark.operators.orclite import (
        make_orc,
    )
    from hainan_big_data_recommend_system_spark.operators.parquetfmt import (
        make_parquet,
    )
    from hainan_big_data_recommend_system_spark.operators.pdftext import (
        make_pdf,
    )
    from hainan_big_data_recommend_system_spark.operators.tiff import (
        make_tiff,
    )
    from hainan_big_data_recommend_system_spark.operators.wav import make_wav
    from hainan_big_data_recommend_system_spark.operators.webp import (
        make_webp,
    )
    from hainan_big_data_recommend_system_spark.sources.archives import (
        make_tar,
        make_zip,
    )
    from hainan_big_data_recommend_system_spark.sources.warc import make_warc

    rows = [(1, "a"), (2, "b")]
    return {
        "parquet": make_parquet([rows]),
        "orc": make_orc([rows]),
        "avro": make_avro(
            {"type": "record", "name": "r",
             "fields": [{"name": "id", "type": "long"}]},
            [[{"id": 1}]],
        ),
        "warc": make_warc([("u", b"x")]),
        "tar": make_tar([("a", b"x")]),
        "zip": make_zip([("a", b"x")]),
        "pdf": make_pdf(["l"]),
        "mbox": make_mbox(["Subject: s\n\nbody"]),
        "png": make_png(4, 3, b"\x01\x02\x03"),
        "jpeg": make_jpeg(8, 8, b"\x01\x02\x03"),
        "gif": make_gif(4, 3, b"\x01\x02\x03"),
        "bmp": make_bmp(4, 3, b"\x01\x02\x03"),
        "flac": make_flac(44100, 1, 16, 100),
        "ogg": make_ogg_opus(1, 100, 44100, [10]),
        "webm": make_webm([(1, "V_VP9", 8, 6)], [(0, [0])]),
        "mp3": make_mp3([(9, 0, 0, 1)], id3_payload=b"t"),
        "tiff": make_tiff([(2, 2, bytes(4))]),
        "wav": make_wav("s", 10),
        "webp": make_webp("vp8x", 10, 10),
        "avi": make_fixture_avi(1),
        "mp4": make_fixture_mp4(1),
    }


def test_every_writer_output_is_identified():
    for want, payload in _cases().items():
        assert detect_format(payload) == want, want


@pytest.mark.parametrize(
    "junk",
    [b"", b"\x00" * 400, b"hello world", b"RIFF1234XXXX", b"PAR0" + b"x"],
)
def test_unknown_quarantines(junk):
    with pytest.raises(ValueError):
        detect_format(junk)
