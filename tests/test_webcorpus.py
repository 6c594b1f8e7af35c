"""prepare_web_corpus / web_corpus_quantiles: the one-call north-star
pipeline — bit-exact parity with the individually-gated pieces, the
byte-identity invariant on the synthetic crawl table, and the zero-
shuffle plan shape."""

import pytest

from pyspark.sql import functions as F

from ddsketch_ruby_spark.functions.html import html_to_text
from ddsketch_ruby_spark.functions.text import (
    bpe_token_estimate,
    lang_id,
    quality_score,
    token_count,
)
from ddsketch_ruby_spark.functions.url import (
    redact_pii,
    registrable_domain,
    url_host,
    url_normalize,
)
from ddsketch_ruby_spark.operators.webcorpus import (
    prepare_web_corpus,
    web_corpus_quantiles,
)
from ddsketch_ruby_spark.sources.webpages import web_pages


@pytest.fixture(scope="module")
def corpus(spark):
    pages = web_pages(spark, 800, partitions=4)
    c = prepare_web_corpus(pages).cache()
    c.count()
    yield pages, c
    c.unpersist()


def test_extraction_byte_identity(corpus):
    """The north-rule pin survives the composed pipeline: extracted
    text == the table's text column on every row."""
    _, c = corpus
    assert c.where(F.col("text_extracted") != F.col("text")).count() == 0


def test_parity_with_pieces(corpus):
    """Every derived column equals the hand-composed gated piece,
    bit-exactly (so the per-piece DuckDB oracles transfer)."""
    pages, c = corpus
    te = html_to_text("html")
    manual = pages.select(
        "url",
        url_host("url").alias("m_host"),
        registrable_domain(url_host("url")).alias("m_domain"),
        url_normalize("url").alias("m_url_norm"),
        te.alias("m_text"),
        redact_pii(te).alias("m_clean"),
        F.xxhash64(te).alias("m_fp"),
    ).withColumns(
        {
            "m_lang": lang_id("m_text"),
            "m_tok": token_count("m_text"),
            "m_bpe": bpe_token_estimate("m_text"),
            "m_q": quality_score("m_text"),
        }
    )
    j = c.join(manual, "url")
    pairs = [
        ("host", "m_host"),
        ("domain", "m_domain"),
        ("url_norm", "m_url_norm"),
        ("text_extracted", "m_text"),
        ("text_clean", "m_clean"),
        ("fingerprint", "m_fp"),
        ("lang_guess", "m_lang"),
        ("n_tokens", "m_tok"),
        ("n_bpe_tokens", "m_bpe"),
        ("quality", "m_q"),
    ]
    bad = j.where(
        " OR ".join(f"(NOT ({a} <=> {b}))" for a, b in pairs)
    ).count()
    assert bad == 0


def test_split_assignment(corpus):
    """Split is total, frozen to hash_split semantics, and roughly
    follows the 98/1/1 default weights."""
    _, c = corpus
    counts = dict(
        (r.split, r["count"]) for r in c.groupBy("split").count().collect()
    )
    assert set(counts) <= {"train", "val", "test"}
    n = sum(counts.values())
    assert counts["train"] / n > 0.9


def test_n_chars_and_host_nonempty(corpus):
    _, c = corpus
    assert c.where(F.length("text_extracted") != F.col("n_chars")).count() == 0
    assert c.where((F.col("host") == "") | F.col("host").isNull()).count() == 0


def test_prepare_plan_zero_shuffle(corpus):
    """One scan, projections only: no Exchange, no Python eval, and the
    heavy extraction chain is NOT inlined per feature (it appears as a
    bound column exactly once in the final project)."""
    _, c = corpus
    # rebuild uncached for a clean plan
    pages = web_pages(c.sparkSession, 100, partitions=2)
    plan = (
        prepare_web_corpus(pages)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the raw-text strip regex would appear once per feature if
    # CollapseProject had inlined the extraction chain
    assert plan.count("</script") <= 1


def test_text_col_passthrough(spark):
    """text_col= skips extraction and uses the named column."""
    pages = web_pages(spark, 50, partitions=1)
    c = prepare_web_corpus(pages, text_col="text")
    assert c.where(F.col("text_extracted") != F.col("text")).count() == 0


def test_redact_false(spark):
    pages = web_pages(spark, 50, partitions=1)
    c = prepare_web_corpus(pages, redact=False)
    assert c.where(F.col("text_clean") != F.col("text_extracted")).count() == 0


def test_quantiles_rollup(corpus):
    """The north-star rollup: per-domain q50/q95/q99 of n_chars and
    latency_ms, each within the sketch's relative-accuracy bound of the
    exact per-domain quantile."""
    _, c = corpus
    q = web_corpus_quantiles(c).cache()
    try:
        rows = q.collect()
        assert rows
        # both value columns present, joined on (domain, qname)
        assert {"domain", "qname", "n_chars_q", "latency_ms_q"} == set(
            q.columns
        )
        by_domain: dict[str, list[int]] = {}
        for row in c.select("domain", "n_chars").collect():
            by_domain.setdefault(row.domain, []).append(row.n_chars)
        for vals in by_domain.values():
            vals.sort()
        for r in rows:
            vals = by_domain[r.domain]
            p = {"q50": 0.5, "q95": 0.95, "q99": 0.99}[r.qname]
            want = vals[int(p * (len(vals) - 1))]
            assert abs(r.n_chars_q - want) <= 0.012 * want + 1e-9, (
                r.domain,
                r.qname,
                r.n_chars_q,
                want,
            )
    finally:
        q.unpersist()


def test_quantiles_accepts_raw_frame(spark):
    """A raw crawl frame is prepared implicitly."""
    pages = web_pages(spark, 200, partitions=2)
    q = web_corpus_quantiles(pages, quantiles=(0.5,))
    assert q.where(F.col("n_chars_q") <= 0).count() == 0


def test_quantiles_missing_values_raise(spark):
    pages = web_pages(spark, 20, partitions=1)
    c = prepare_web_corpus(pages)
    with pytest.raises(ValueError):
        web_corpus_quantiles(c, value_cols=("nope",))


def test_latest_capture(spark):
    """Newest capture per url wins; ties broken by the tie_breaker; one
    row per key; columns preserved."""
    from ddsketch_ruby_spark.operators.webcorpus import latest_capture

    rows = [
        ("u1", "2025-01-02 00:00:00", 1, "old"),
        ("u1", "2025-01-03 00:00:00", 2, "new"),
        ("u2", "2025-01-01 00:00:00", 5, "only"),
        # tied timestamps: higher fetch_id wins
        ("u3", "2025-01-01 00:00:00", 7, "lo"),
        ("u3", "2025-01-01 00:00:00", 9, "hi"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts string, fetch_id long, body string"
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    got = {
        r.url: (r.fetch_id, r.body)
        for r in latest_capture(df, "url", "warc_ts", tie_breakers=("fetch_id",)).collect()
    }
    assert got == {"u1": (2, "new"), "u2": (5, "only"), "u3": (9, "hi")}
    assert set(
        latest_capture(df, "url", "warc_ts").columns
    ) == {"url", "warc_ts", "fetch_id", "body"}


def test_latest_capture_partitioning_invariant(spark):
    """Same winners at 1 partition and 16 partitions (the arg-max order
    key is unique, so the monoid is deterministic)."""
    from ddsketch_ruby_spark.operators.webcorpus import latest_capture

    pages = web_pages(spark, 400, partitions=4)
    # synthesize multiple captures: 3 snapshots per url, later ts wins
    multi = pages.unionByName(
        pages.withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY"))
    ).unionByName(
        pages.withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 2 DAY"))
    )
    a = latest_capture(multi.coalesce(1), "url", "warc_ts").select("url", "warc_ts")
    b = latest_capture(multi.repartition(16), "url", "warc_ts").select("url", "warc_ts")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() == 400


def test_extract_links_semantics(spark):
    from ddsketch_ruby_spark.functions.html import extract_links

    cases = [
        (0, '<a href="https://x.com/a">t</a>'),
        (1, '<a data-href="NOT">t</a>'),          # delimiter required
        (2, "<a href='single'>no</a>"),           # double-quoted only
        (3, '<A HREF="UPPER">t</A>'),             # case classes
        (4, '<a\thref="tabbed">x</a>'),
        (5, '<a href="first" href="second">x</a>'),  # last wins (probed)
        (6, '<abbr href="NOT-AN-ANCHOR">x</abbr>'),
        (7, '<a href="a">1</a> mid <a href="b">2</a>'),
        (8, "no anchors"),
    ]
    df = spark.createDataFrame(cases, "i int, h string")
    got = {
        r["i"]: list(r["links"])
        for r in df.select(
            "i", extract_links(F.col("h"), binary=False).alias("links")
        ).collect()
    }
    assert got == {
        0: ["https://x.com/a"],
        1: [],
        2: [],
        3: ["UPPER"],
        4: ["tabbed"],
        5: ["second"],
        6: [],
        7: ["a", "b"],
        8: [],
    }


def test_outlinks_resolution(spark):
    from ddsketch_ruby_spark.operators.webcorpus import outlinks

    rows = [
        (
            "https://Host1.example.com/d/1",
            '<a href="https://ext.example.org/p/1">x</a>'
            '<a href="/local?a=1&amp;b=2">y</a>'
            '<a href="//cdn.example.net/i.png">z</a>'
            '<a href="mailto:u@example.org">drop</a>'
            '<a href="rel/no-slash">drop</a>'
            '<a href="#frag">drop</a>',
        ),
    ]
    df = spark.createDataFrame(rows, "url string, page string")
    got = {
        r["href"]: r.asDict()
        for r in outlinks(
            df, html_col="page", url_col="url", binary=False
        ).collect()
    }
    assert set(got) == {
        "https://ext.example.org/p/1",
        "/local?a=1&b=2",  # entity-decoded
        "//cdn.example.net/i.png",
    }
    ext = got["https://ext.example.org/p/1"]
    assert ext["dst_host"] == "ext.example.org" and ext["external"]
    loc = got["/local?a=1&b=2"]
    assert loc["dst_url"] == "https://Host1.example.com/local?a=1&b=2"
    assert loc["dst_host"] == "host1.example.com" and not loc["external"]
    cdn = got["//cdn.example.net/i.png"]
    assert cdn["dst_url"] == "https://cdn.example.net/i.png"
    assert cdn["external"]


def test_outlinks_plan_scan_only(spark):
    """Extraction + resolution stay one Exchange-free scan projection."""
    from ddsketch_ruby_spark.operators.webcorpus import outlinks

    df = spark.createDataFrame(
        [("https://a.example.com/", b'<a href="/x">y</a>')],
        "url string, html binary",
    )
    plan = (
        outlinks(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_outlinks_duckdb_parity(spark):
    """Fuzz the href grammar across both regex engines: random
    attribute soup around anchors must extract and resolve identically
    in Spark (Java regex) and DuckDB (RE2)."""
    import random

    import duckdb

    from ddsketch_ruby_spark.functions.html import (
        HTML_ENTITIES,
        extract_links_sql,
    )
    from ddsketch_ruby_spark.functions.url import url_host_sql
    from ddsketch_ruby_spark.operators.webcorpus import (
        outlinks,
        outlinks_resolve_sql,
    )

    rng = random.Random(7)
    frag = ["<a ", "href=", '"', "/p", "?a=1", "&amp;b=2", "'", ">", "x",
            "</a>", " ", "\t", "data-href=", "https://e.org/", "//c.net/",
            "mailto:u@e.org", "name=", "<b>", "=", "#f"]
    anchors = [
        '<a href="https://e{}.org/p">x</a>',
        '<a class="c" href="/l/{}?a=1&amp;b=2">y</a>',
        '<a\thref="//c{}.net/i">z</a>',
        '<a href="mailto:u{}@e.org">m</a>',
    ]
    pages = [
        (
            f"https://H{i}.example.com/d/{i}",
            "".join(rng.choice(frag) for _ in range(rng.randint(3, 15)))
            + rng.choice(anchors).format(i)
            + "".join(rng.choice(frag) for _ in range(rng.randint(3, 15))),
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(pages, "url string, page string")
    got = sorted(
        (r["url"], r["href"], r["dst_url"], r["src_host"], r["dst_host"],
         r["external"])
        for r in outlinks(
            df, html_col="page", url_col="url", binary=False
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pages(url VARCHAR, page VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", pages)
    dec = "href_raw"
    for entity, ch in HTML_ENTITIES:
        rep = "chr(160)" if ch == " " else "'" + ch.replace("'", "''") + "'"
        dec = f"replace({dec}, '{entity}', {rep})"
    want = sorted(
        tuple(r)
        for r in con.execute(f"""
            WITH links AS (
              SELECT url,
                unnest({extract_links_sql('page', binary=False)}) AS href_raw
              FROM pages),
            dec AS (SELECT url, {dec} AS href FROM links),
            res AS (SELECT url, href,
                      {outlinks_resolve_sql('href', 'url')} AS dst_url
                    FROM dec),
            hosts AS (SELECT url, href, dst_url,
                        {url_host_sql('url')} AS src_host,
                        {url_host_sql('dst_url')} AS dst_host
                      FROM res WHERE dst_url IS NOT NULL)
            SELECT url, href, dst_url, src_host, dst_host,
                   (dst_host != src_host) AS external
            FROM hosts
        """).fetchall()
    )
    assert got == want and len(got) > 50
