"""HTML → text extraction: hand-pinned cases (the oracle covers the
corpus-scale path; these pin the semantics on adversarial literals)."""

from __future__ import annotations

from hainan_big_data_recommend_system_spark.operators.html import (
    html_extract_text,
)


def _extract(spark, html: str) -> dict:
    df = spark.createDataFrame([(1, html)], "id long, html string")
    return html_extract_text(df, "id", "html").collect()[0].asDict()


def test_boilerplate_blocks_dropped_content_and_all(spark):
    r = _extract(
        spark,
        '<body><script>var x="<p>not text</p>";</script>'
        "<style>p{color:red}</style>"
        '<nav><a href="/">home</a></nav>'
        "<header>site</header><aside>ads</aside>"
        "<p>real prose</p>"
        '<footer><a href="/t">terms</a></footer></body>',
    )
    assert r["main_text"] == "real prose"
    # every anchor lived inside dropped chrome → zero link chars
    assert r["link_chars"] == 0
    assert r["link_density_micros"] == 0


def test_entities_decoded_in_order_and_whitespace_collapsed(spark):
    r = _extract(
        spark,
        "<p>a &lt;tag&gt; &amp;amp; &quot;q&quot;&nbsp;&#39;s&#39;</p>\n\n<p>b</p>",
    )
    # &amp;amp; decodes to &amp; (amp decoded LAST, exactly once)
    assert r["main_text"] == 'a <tag> &amp; "q" \'s\' b'


def test_comment_dropped_across_lines(spark):
    r = _extract(spark, "<p>keep</p><!-- drop\nme --><p>too</p>")
    assert r["main_text"] == "keep too"


def test_link_density_counts_surviving_anchor_bodies(spark):
    r = _extract(
        spark,
        '<p>word <a href="/x">link <b>bold</b></a> tail</p>',
    )
    # anchor body 'link <b>bold</b>' → inner tags stripped → 'link bold' = 9
    assert r["link_chars"] == 9
    assert r["main_text"] == "word link bold tail"
    assert r["main_len"] == len("word link bold tail")
    assert r["link_density_micros"] == round(9 * 1000000.0 / 19)


def test_empty_and_tagless_inputs(spark):
    assert _extract(spark, "")["main_text"] == ""
    assert _extract(spark, "")["link_density_micros"] == 0
    r = _extract(spark, "plain words, no markup")
    assert r["main_text"] == "plain words, no markup"
    assert r["link_chars"] == 0
