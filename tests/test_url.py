"""url functions: host extraction, normalization, registrable domain,
PII redaction — JVM expression chain vs DuckDB replay, adversarial URLs."""

import duckdb
import pytest

from pyspark.sql import functions as F

from ddsketch_ruby_spark.functions.url import (
    MULTI_PART_SUFFIXES,
    PII_RULES,
    redact_pii,
    redact_pii_sql,
    registrable_domain,
    registrable_domain_sql,
    url_host,
    url_host_sql,
    url_normalize,
    url_normalize_sql,
)

HOST_CASES = [
    # (url, host)
    ("http://example.com/path", "example.com"),
    ("HTTPS://WWW.Example.COM:443/A?q=1#f", "www.example.com"),
    ("http://user:pw@host.net:8080/x", "host.net"),
    ("ftp://Files.Example.ORG/dir/", "files.example.org"),
    # schemeless network form
    ("example.com/path", "example.com"),
    # trailing dot stripped
    ("http://example.com./", "example.com"),
    # userinfo cannot cross a path boundary
    ("http://example.com/a@b", "example.com"),
    # userinfo splits at the LAST pre-path '@' (WHATWG): the real host
    # is evil.com, not 'trusted.com@evil.com'
    ("https://a@trusted.com@evil.com/", "evil.com"),
    # non-ASCII hosts are NOT case-folded (ASCII-only translate; the
    # JVM's full Unicode lower() and DuckDB's simple mapping diverge)
    ("http://İstanbul.Example.com/x", "İstanbul.example.com"),
    # IPv6-ish and empty edge: '[' is not /:?# so it stays (documented
    # regex-grade limit: bracketed IPv6 hosts keep their brackets)
    ("http://127.0.0.1:80/x", "127.0.0.1"),
    ("/relative/path", ""),
    ("mailto:user@example.com", "example.com"),
]

NORM_CASES = [
    # (url, normalized)
    ("HTTP://Example.COM", "http://example.com/"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    # non-default port kept
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # :443 is NOT http's default
    ("http://example.com:443/", "http://example.com:443/"),
    # fragment dropped, query kept; bare query gets a '/'
    ("http://example.com/a?q=1#frag", "http://example.com/a?q=1"),
    ("http://example.com?q=1", "http://example.com/?q=1"),
    # path case preserved, host case folded
    ("http://Example.com/CaseSensitive/Path", "http://example.com/CaseSensitive/Path"),
    # userinfo preserved byte-identical
    ("http://User:Pw@example.com/", "http://User:Pw@example.com/"),
    # trailing host dot dropped (no port)
    ("http://example.com./x", "http://example.com/x"),
    # percent-encoding untouched
    ("http://example.com/a%20b?x=%2F", "http://example.com/a%20b?x=%2F"),
    # schemeless: no scheme invented
    ("Example.COM/Path", "example.com/Path"),
]

DOMAIN_CASES = [
    # (host, registrable domain)
    ("www.example.com", "example.com"),
    ("a.b.c.example.org", "example.org"),
    ("news.bbc.co.uk", "bbc.co.uk"),
    ("deep.sub.shop.example.com.au", "example.com.au"),
    ("example.co.jp", "example.co.jp"),
    # host that IS a suffix falls back to its last two labels
    ("co.uk", "co.uk"),
    # IPv4 passes through whole
    ("192.168.0.1", "192.168.0.1"),
    # dotless host returns itself
    ("localhost", "localhost"),
    ("example.com", "example.com"),
]

PII_CASES = [
    # (text, redacted)
    ("contact bob.smith+x@corp-mail.example.com now", "contact <EMAIL> now"),
    ("server at 10.0.255.3 rebooted", "server at <IP> rebooted"),
    ("call +1 (555) 010-1234 today", "call <PHONE> today"),
    ("(020) 7946-0958 office", "<PHONE> office"),
    # email wins over its own host's digit-dots
    ("x 1.2.3.4@mail.example.com y", "x <EMAIL> y"),
    # version strings with <4 octets survive
    ("spark 4.1.2 released", "spark 4.1.2 released"),
    # short digit runs survive
    ("room 4211", "room 4211"),
    # marker-less dashed runs survive: redacting them would also destroy
    # every ISO date/timestamp in the corpus (documented trade-off)
    ("ip 1.2.3.4 then 555 123-4567", "ip <IP> then 555 123-4567"),
    ("released 2024-12-31 at 10 00", "released 2024-12-31 at 10 00"),
    ("meeting 2025-01-01 12:30:45", "meeting 2025-01-01 12:30:45"),
    # 9+-digit bare runs are ids/phones-without-separators
    ("ticket 9876543210 open", "ticket <NUMBER> open"),
    ("ref 12345678 ok", "ref 12345678 ok"),
    # self-delimiting (no \b — Java/RE2 diverge on it): 4+ dotted octets
    # over-redact rather than leak (documented safe direction)
    ("v1.2.3.456789 build", "v<IP>789 build"),
    ("no pii here", "no pii here"),
]


def _duck(expr_sql: str, value: str) -> str:
    return duckdb.execute(
        f"SELECT {expr_sql} FROM (SELECT ? AS s)", [value]
    ).fetchone()[0]


@pytest.mark.parametrize("url,want", HOST_CASES)
def test_host_duckdb(url, want):
    assert _duck(url_host_sql("s"), url) == want


@pytest.mark.parametrize("url,want", NORM_CASES)
def test_normalize_duckdb(url, want):
    assert _duck(url_normalize_sql("s"), url) == want


@pytest.mark.parametrize("host,want", DOMAIN_CASES)
def test_domain_duckdb(host, want):
    assert _duck(registrable_domain_sql("s"), host) == want


@pytest.mark.parametrize("text,want", PII_CASES)
def test_pii_duckdb(text, want):
    assert _duck(redact_pii_sql("s"), text) == want


def test_all_cases_spark(spark):
    """One job covers every case table on the JVM engine."""
    rows = (
        [("h", u, w) for u, w in HOST_CASES]
        + [("n", u, w) for u, w in NORM_CASES]
        + [("d", u, w) for u, w in DOMAIN_CASES]
        + [("p", u, w) for u, w in PII_CASES]
    )
    df = spark.createDataFrame(rows, "kind string, s string, want string")
    got = df.select(
        "kind",
        "s",
        "want",
        url_host("s").alias("h"),
        url_normalize("s").alias("n"),
        registrable_domain("s").alias("d"),
        redact_pii("s").alias("p"),
    ).collect()
    for r in got:
        assert r[r.kind] == r.want, (r.kind, r.s, r[r.kind], r.want)


def test_host_domain_compose(spark):
    """registrable_domain(url_host(url)) — the intended pipeline."""
    df = spark.createDataFrame(
        [("HTTP://User@News.BBC.CO.UK.:80/Story?id=1#top",)], "u string"
    )
    row = df.select(
        url_host("u").alias("h"),
        registrable_domain(url_host("u")).alias("d"),
        url_normalize("u").alias("n"),
    ).collect()[0]
    assert row.h == "news.bbc.co.uk"
    assert row.d == "bbc.co.uk"
    assert row.n == "http://User@news.bbc.co.uk/Story?id=1"


def test_suffixes_sorted_and_two_label():
    assert tuple(sorted(MULTI_PART_SUFFIXES)) == MULTI_PART_SUFFIXES
    assert all(s.count(".") == 1 for s in MULTI_PART_SUFFIXES)


def test_pii_rule_order():
    assert [r[0] for r in PII_RULES] == [
        "email", "ipv4", "phone_intl", "phone_paren", "id_digits",
    ]


def test_engine_parity_fuzz(spark):
    """Deterministic adversarial fuzz: both engines must agree byte-for-
    byte on messy composed inputs (the gate's guarantee, concentrated)."""
    pieces = [
        "HTTP://", "https://", "", "User.Name+tag@", "WWW.", "sub.",
        "Example", ".CO.UK", ".com", ".", ":80", ":443", ":8080",
        "/Path/To;x", "?q=a%20b&r=1.2.3.4", "#frag@x", "/a@b",
        " mail me at a.b@c.de or 10.0.0.1 ", "(555) 010-1234",
        # trailing-newline anchors: Java's $ matches BEFORE a final
        # line terminator, RE2's does not — \z is the shared anchor,
        # and these pieces make a wrong $ fail the parity assert
        "\n", ".com\n", ":80\n",
        # Unicode case traps: lower('İ') is 2 codepoints in the JVM and
        # 1 in DuckDB (ASCII translate avoids it); 'ſ' folds to 's'
        # under RE2's (?i) but not Java's (explicit classes avoid it)
        "İstanbul.", "ſ.de", "@last.Example.com",
    ]
    urls = []
    for i in range(200):
        h = i
        s = ""
        for _ in range(4):
            h = (h * 1103515245 + 12345) % (1 << 31)
            s += pieces[h % len(pieces)]
        urls.append(s)
    df = spark.createDataFrame([(u,) for u in urls], "s string")
    got = df.select(
        "s",
        url_host("s").alias("h"),
        url_normalize("s").alias("n"),
        registrable_domain(url_host("s")).alias("d"),
        redact_pii("s").alias("p"),
    ).collect()
    con = duckdb.connect()
    qh, qn = url_host_sql("s"), url_normalize_sql("s")
    qd = registrable_domain_sql(url_host_sql("s"))
    qp = redact_pii_sql("s")
    for r in got:
        dh, dn, dd, dp = con.execute(
            f"SELECT {qh}, {qn}, {qd}, {qp} FROM (SELECT ? AS s)", [r.s]
        ).fetchone()
        assert (r.h, r.n, r.d, r.p) == (dh, dn, dd, dp), r.s


def test_driver_gate_url_invariants(spark, sf_dir):
    """url_normalize_documents' derived keys must be well-formed on
    every row — the oracle hash proves engine agreement; this pins the
    semantics themselves."""
    import __spark_entry__ as entry

    df = entry._q_url_normalize_documents(spark, sf_dir).cache()
    try:
        n = df.count()
        assert n > 0
        # host: lowercase, no scheme/port/path residue, no trailing dot
        assert df.where(~F.col("host").rlike("^[a-z0-9.\\-]+$")).count() == 0
        assert df.where(F.col("host").endswith(".")).count() == 0
        # domain is a suffix of host with <= 3 labels
        bad = df.where(
            ~F.col("host").endswith(F.col("domain"))
            | (F.size(F.split(F.col("domain"), "\\.")) > 3)
        ).count()
        assert bad == 0
        # normalized form never carries a fragment or default port
        assert df.where(F.col("url_norm").contains("#")).count() == 0
        assert df.where(F.col("url_norm").rlike(":(80|443)/")).count() == 0
        # multi-part suffix rows keep three labels (co.uk / org.au)
        assert (
            df.where(F.col("domain").rlike("\\.(co\\.uk|org\\.au)$")).count()
            > 0
        )
    finally:
        df.unpersist()


def test_driver_gate_pii_invariants(spark, sf_dir):
    """redact_pii_documents must redact all three planted PII spans on
    every row and keep the corpus text byte-identical after them."""
    import __spark_entry__ as entry

    red = entry._q_redact_pii_documents(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    joined = red.join(docs, "doc_id").cache()
    try:
        n = joined.count()
        assert n > 0
        for tok in ("<EMAIL>", "<IP>", "<PHONE>"):
            assert joined.where(~F.col("redacted").contains(tok)).count() == 0
        # the corpus text survives redaction byte-identically
        assert (
            joined.where(
                ~F.col("redacted").endswith(F.col("text"))
            ).count()
            == 0
        )
        # no raw digits leak from the planted spans before the text
        prefix = F.substring_index(F.col("redacted"), ". ", 1)
        assert (
            joined.where(prefix.rlike("[0-9]{5,}")).count() == 0
        )
    finally:
        joined.unpersist()
