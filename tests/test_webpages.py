"""web_pages synthesizer: schema, determinism (byte-identical text per url
across partitionings — the north-rule extraction invariant), distributions."""

from pyspark.sql import functions as F

from ddsketch_ruby_spark.sources.webpages import WEB_PAGES_SCHEMA, web_pages


def _digest(df):
    # order-insensitive per-url content digest (xor avoids ANSI overflow)
    return df.select(
        F.expr("bit_xor(xxhash64(url, text, lang)) as d").alias("d")
    ).collect()[0].d


def test_schema(spark):
    df = web_pages(spark, 100)
    assert [f.name for f in df.schema.fields] == [
        f.name for f in WEB_PAGES_SCHEMA.fields
    ]
    row = df.first()
    assert row.url.startswith("https://host")
    assert row.html.startswith(b"<html><body>")
    assert isinstance(row.text, str) and len(row.text) >= 1


def test_byte_identical_per_url_across_partitionings(spark):
    d1 = _digest(web_pages(spark, 5000, partitions=3))
    d2 = _digest(web_pages(spark, 5000, partitions=17))
    assert d1 == d2


def test_text_length_matches_html(spark):
    rows = web_pages(spark, 200).select(
        F.length("text").alias("lt"), F.length("html").alias("lh")
    ).collect()
    for r in rows:
        assert r.lh == r.lt + len("<html><body>") + len("</body></html>")


def test_host_skew_present(spark):
    hosts = (
        web_pages(spark, 5000)
        .select(F.regexp_extract("url", r"host(\d+)", 1).alias("h"))
        .groupBy("h")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .collect()
    )
    # zipf-ish: the hottest host should hold a large share
    assert hosts[0]["count"] > 5000 * 0.05


def test_length_distributions_differ(spark):
    stats = {}
    for dist in ("uniform", "lognormal", "exponential"):
        df = web_pages(spark, 2000, dist=dist)
        stats[dist] = df.select(F.avg(F.length("text"))).collect()[0][0]
    assert stats["uniform"] > 3000  # mean ~5000
    assert stats["lognormal"] < 1000  # mean ~165
