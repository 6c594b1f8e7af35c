"""html_to_text: the north-rule extraction step (byte-identical extracted
text per url), JVM expression chain vs DuckDB replay, adversarial HTML."""

import duckdb

from pyspark.sql import functions as F

from ddsketch_ruby_spark.functions.html import (
    HTML_ENTITIES,
    html_to_text,
    html_to_text_sql,
)
from ddsketch_ruby_spark.sources.webpages import web_pages

CASES = [
    # (html, expected)
    ("<html><body>hello world</body></html>", "hello world"),
    # raw-text elements removed wholesale, incl. tag-like strings inside
    (
        '<script>var s = "</b>"; if (1 < 2) { x(); }</script>after',
        "after",
    ),
    ('<SCRIPT TYPE="text/javascript">s</SCRIPT>ok', "ok"),
    # Unicode case trap: 'ſ' folds to 's' under RE2's (?i) but not
    # Java's — with explicit [sS] classes BOTH engines treat '<ſcript>'
    # as a plain tag (stripped, body kept), never as raw text
    ("<ſcript>alert()</ſcript>kept", "alert()kept"),
    ("<style>body { margin: 0; }</style>ok", "ok"),
    # multiline raw text ((?s) dotall)
    ("<script>\nline1\nline2\n</script>rest", "rest"),
    # '<scripted>' is a PLAIN tag, not a raw-text element
    ("<scripted>inner</scripted>", "inner"),
    # closing tag with trailing whitespace
    ("<script>x</script  >done", "done"),
    # comments removed AFTER raw text: '<!--' inside script is inert
    ("<script>// <!-- not a comment</script>kept", "kept"),
    ("a<!-- hidden <b>bold</b> -->b", "ab"),
    ("a<!-- multi\nline -->b", "ab"),
    # tags (with attributes) stripped, inline semantics (no whitespace)
    ('<p id="p1">x</p><br/><div class="c">y</div>', "xy"),
    ("<a href='u?a=1&b=2'>link</a>", "link"),
    # entities: one level of decoding, &amp; last
    ("&lt;b&gt; &quot;q&quot; &#39;s&#39; &apos;t&apos;", "<b> \"q\" 's' 't'"),
    ("&amp;lt;", "&lt;"),
    ("x&nbsp;y", "x y"),
    ("AT&amp;T", "AT&T"),
    # documented limit: a literal '>' in an attribute ends the tag early
    ('<img alt="a>b">', 'b">'),
    # empty body
    ("<html><body></body></html>", ""),
]


def test_adversarial_cases_spark(spark):
    df = spark.createDataFrame(
        [(i, h.encode()) for i, (h, _) in enumerate(CASES)], "i int, html binary"
    )
    got = {
        r.i: r.text
        for r in df.select("i", html_to_text("html")).collect()
    }
    for i, (_, expected) in enumerate(CASES):
        assert got[i] == expected, CASES[i]


def test_adversarial_cases_duckdb_parity():
    con = duckdb.connect()
    expr = html_to_text_sql("html", binary=False)
    for html, expected in CASES:
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS html)", [html]
        ).fetchone()[0]
        assert got == expected, (html, got, expected)


def test_string_input_column(spark):
    df = spark.createDataFrame([("<b>x</b> &amp; y",)], "html string")
    assert (
        df.select(html_to_text("html", binary=False)).collect()[0].text
        == "x & y"
    )


def test_web_pages_byte_identity(spark):
    """The north-rule pin: extracting the html column recovers the text
    column byte-for-byte on every row of the synthetic web table."""
    df = web_pages(spark, 3000, partitions=5)
    bad = (
        df.select(
            F.col("text").alias("want"), html_to_text("html").alias("got")
        )
        .where(~(F.col("got") == F.col("want")))
        .count()
    )
    assert bad == 0


def test_entity_order_amp_last():
    assert HTML_ENTITIES[-1][0] == "&amp;"


def test_roundtrip_escaped_payload(spark):
    """Escape-then-extract is the identity for arbitrary payload text —
    the invariant the driver gate (extract_text_documents) asserts."""
    payloads = [
        "plain words",
        "a < b > c & d",
        "already &lt;escaped&gt; stays one level",
        'quotes " and \' mixed',
        "tab\tand\nnewline",
    ]
    esc = F.replace(
        F.replace(
            F.replace(F.col("t"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    df = spark.createDataFrame([(p,) for p in payloads], "t string")
    rows = (
        df.withColumn(
            "html",
            F.encode(
                F.concat(F.lit("<html><body><p>"), esc, F.lit("</p></body></html>")),
                "UTF-8",
            ),
        )
        .select("t", html_to_text("html").alias("got"))
        .collect()
    )
    for r in rows:
        assert r.got == r.t


def test_driver_gate_roundtrip_all_true(spark, sf_dir):
    """extract_text_documents' roundtrip_ok column must be TRUE on every
    row — the oracle hash proves engine agreement; this pins the
    invariant itself."""
    import __spark_entry__ as entry

    df = entry._q_extract_text_documents(spark, sf_dir)
    assert df.where(~F.col("roundtrip_ok")).count() == 0
    assert df.count() > 0
