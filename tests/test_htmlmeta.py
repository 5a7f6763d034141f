"""HTML head-metadata extraction + anchor-text rollup unit coverage."""

from pyspark.sql import functions as F

from distributed_web_crawler_spark.operators.htmlmeta import (
    extract_page_metadata,
)
from distributed_web_crawler_spark.pipeline.graph import anchor_text_rollup


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_html_meta_full_head(spark):
    row = extract_page_metadata(_pages(spark, [(
        "http://a/x",
        '<html><head><title>T1</title>'
        '<meta name="description" content="desc here">'
        '<link rel="canonical" href="http://a/canon">'
        '<meta name="robots" content="noindex,nofollow">'
        '<meta property="og:image" content="http://i/1.jpg">'
        "</head><body>b</body></html>")])).collect()[0]
    assert row.title == "T1"
    assert row.description == "desc here"
    assert row.canonical == "http://a/canon"
    assert row.og_image == "http://i/1.jpg"
    assert row.noindex is True


def test_html_meta_missing_fields_null_and_canonical_fallback(spark):
    row = extract_page_metadata(_pages(spark, [(
        "http://a/y", "<html><head></head><body>no head tags</body></html>"
    )])).collect()[0]
    assert row.title is None
    assert row.description is None
    assert row.og_image is None
    assert row.canonical == "http://a/y"  # fallback to fetch URL
    assert row.noindex is False


def test_html_meta_robots_without_noindex_is_indexable(spark):
    row = extract_page_metadata(_pages(spark, [(
        "http://a/z",
        '<head><title>x</title>'
        '<meta name="robots" content="nofollow"></head>')])).collect()[0]
    assert row.noindex is False


def test_anchor_rollup_modal_pick_and_tiebreak(spark):
    edges = spark.createDataFrame(
        [(1, 10, "blue"), (2, 10, "blue"), (3, 10, "red"),
         # dst 20: 2-way tie 'aa' vs 'bb' -> lexicographic winner 'aa'
         (1, 20, "bb"), (2, 20, "aa"), (3, 20, "bb"), (4, 20, "aa")],
        "src long, dst long, anchor string")
    got = {r.dst: r for r in anchor_text_rollup(edges).collect()}
    assert got[10].inlinks == 3
    assert got[10].distinct_anchors == 2
    assert got[10].top_anchor == "blue"
    assert got[10].top_anchor_count == 2
    assert got[20].top_anchor == "aa"
    assert got[20].top_anchor_count == 2
    assert got[20].inlinks == 4


def test_anchor_rollup_plan_has_no_window(spark):
    edges = spark.range(100).select(
        F.col("id").alias("src"), (F.col("id") % 7).alias("dst"),
        (F.col("id") % 3).cast("string").alias("anchor"))
    plan = anchor_text_rollup(edges)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_html_to_text_semantics(spark):
    from distributed_web_crawler_spark.operators.htmlmeta import (
        html_to_text,
    )
    html = ('<html><head><title>T</title>'
            '<style media="all">body { x: "<div>" }</style></head>'
            '<body><SCRIPT>if (a < b) { run("</p>") }</SCRIPT>'
            '<h1>Head</h1>'
            '<p>line one</p>'
            '<p>  spaced   out  </p>'
            '<ul><li>item 1</li><li>item 2</li></ul>'
            'a<br/>b'
            '<!-- hidden --><!-- more\nhidden -->'
            '<div>Tom &amp; Jerry &lt;3 &amp;lt;one-level&gt;</div>'
            '</body></html>')
    df = spark.createDataFrame([("u", html)], "url string, html string")
    got = html_to_text(df).collect()[0]["text"]
    # <br/> is a line break; opening tags strip without a break, so the
    # 'b' runs into the following div's text
    assert got == ("THead\nline one\nspaced out\nitem 1\nitem 2\n"
                   "a\nbTom & Jerry <3 &lt;one-level>")


def test_html_to_text_plain_text_passthrough(spark):
    from distributed_web_crawler_spark.operators.htmlmeta import (
        html_to_text,
    )
    df = spark.createDataFrame([("u", "no markup here")],
                               "url string, html string")
    assert html_to_text(df).collect()[0]["text"] == "no markup here"
