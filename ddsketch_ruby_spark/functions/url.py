"""URL parsing / normalization / PII redaction, JVM-side and
oracle-replayable.

The north star groups and skews by *host* ("salted repartitioning for
host-skewed URL distributions") over a web table keyed by ``url`` — this
module is the parsing step that turns raw crawl URLs into the grouping
keys (host, registrable domain) and a canonical url form, plus the PII
redaction pass a training-data pipeline runs before text ships. All of
it is pure column expressions (whole-stage codegen, no Python in the hot
path) with SQL builders emitting the op-identical DuckDB expression, so
every function sits under the hard oracle gate with two independent
regex engines (Java vs RE2) agreeing on the documented common subset:
inline ``(?s)`` flags, explicit character classes (never ``\\s``), no
lookaround (RE2 has none), no ``\\b`` (Java's word boundary is
Unicode-aware — even though Java's ``\\w`` is ASCII — while RE2's is
ASCII-only: a digit next to ``ſ`` is word-internal in Java but a
boundary in RE2; measured, fuzz-pinned), and ``\\z`` (never ``$``) for
end-of-string anchors — Java's default ``$`` also matches BEFORE a
final line terminator, RE2's does not, so a host or URL ending in a
newline would silently diverge under ``$``.

Semantics (documented, deliberately regex-grade — RFC-3986-lite):

- ``url_host``: strip scheme (``X://``) and userinfo (up to the LAST
  ``@`` before any ``/?#`` — the WHATWG split), take chars up to the
  first ``/:?#``, ASCII-lowercase (translate, never lower(): the JVM's
  full Unicode case mapping and DuckDB's simple mapping diverge on e.g.
  ``İ``, and host folding is ASCII-only per WHATWG anyway), drop one
  trailing dot.
- ``url_normalize``: ASCII-lowercase scheme and host:port, strip the scheme's
  default port (http:80 / https:443), drop one trailing host dot (only
  when no port remains — documented limit), drop the fragment, and give
  an empty path a ``/`` (also before a bare query). Userinfo, path,
  query stay byte-identical (percent-decoding is NOT attempted: decoding
  reserved characters changes meaning, and partial decoding breaks the
  byte-identity contract).
- ``registrable_domain``: eTLD+1 with an embedded multi-part public
  suffix subset (the high-traffic two-label suffixes below — a compact
  stand-in for the full Mozilla PSL; swap ``suffixes=`` for the full
  list at deploy time). IPv4 literals pass through whole; a host with
  no dot returns itself.
- ``redact_pii``: ordered global replaces — emails, IPv4 literals,
  marker-bearing phone shapes (``+``-prefixed or parenthesized-group
  runs; bare digit/dash runs would also match every ISO date in the
  corpus), then 9+-digit bare runs (ids). Order matters: an email's
  host digits must not survive as an "IP".

Reference parity note: ddsketch-ruby has no URL handling — this is
north-rule surface (BASELINE.json input_hint url column), not reference
surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ddsketch_ruby_spark.functions.sqltext import sql_quote as _sql_quote

__all__ = [
    "url_host",
    "url_host_sql",
    "url_normalize",
    "url_normalize_sql",
    "registrable_domain",
    "registrable_domain_sql",
    "redact_pii",
    "redact_pii_sql",
    "MULTI_PART_SUFFIXES",
    "PII_RULES",
]

_SCHEME_PAT = "^[a-zA-Z][a-zA-Z0-9+.\\-]*://"
_SCHEME_GRP = "^([a-zA-Z][a-zA-Z0-9+.\\-]*)://"
# userinfo cannot cross the authority boundary (the class excludes /?#)
# and runs to the LAST '@' before it (greedy star + literal '@' — the
# WHATWG split; 'a@trusted.com@evil.com' must not leave '@' in the host)
_USERINFO_PAT = "^[^/?#]*@"
_USERINFO_GRP = "^([^/?#]*@)"
_HOSTPORT_GRP = "^([^/?#]*)"
_HOST_ONLY_GRP = "^([^/:?#]*)"
_FRAGMENT_PAT = "(?s)#.*\\z"
_TRAILING_DOT = "\\.\\z"

# compact multi-part public-suffix subset (full PSL is a deploy-time
# swap via suffixes=); keep sorted for a stable regex alternation
MULTI_PART_SUFFIXES: tuple[str, ...] = (
    "ac.jp", "ac.uk", "co.in", "co.jp", "co.kr", "co.nz", "co.uk",
    "co.za", "com.ar", "com.au", "com.br", "com.cn", "com.hk", "com.mx",
    "com.my", "com.sg", "com.tr", "com.tw", "edu.au", "go.jp", "gov.au",
    "gov.br", "gov.cn", "gov.uk", "ne.jp", "net.au", "net.br", "net.cn",
    "net.in", "net.nz", "net.uk", "or.jp", "or.kr", "org.au", "org.br",
    "org.cn", "org.in", "org.nz", "org.uk", "sch.uk",
)

_IPV4_HOST_PAT = "^[0-9]+(\\.[0-9]+){3}\\z"

# ordered: emails first (their host digits must not re-match as IPs),
# then IPv4 literals, then phone shapes, then long bare digit runs.
# Phone rules require an explicit phone MARKER (+ prefix or a
# parenthesized group): a bare digits/space/dash run would also match
# every ISO date and timestamp in the corpus ('2025-01-01 12 30'),
# destroying dates in training text — dashed dates have <=4-digit runs,
# so they survive all four rules while +intl / (area) formats and
# 9+-digit ids are caught.
# No \b anywhere: Java's \b is Unicode-aware (a digit next to 'ſ' is
# word-internal) while RE2's is ASCII-only — the engines diverge, so
# the patterns are self-delimiting instead. Bare matches over-redact
# inside longer dotted/digit runs ('v1.2.3.456' loses its tail), which
# is the SAFE direction for redaction — a boundary-dependent rule would
# instead silently LEAK the second of two adjacent IPs.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", "[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("phone_intl", "\\+[0-9][0-9()\\- ]{5,}[0-9]", "<PHONE>"),
    ("phone_paren", "\\([0-9]{1,4}\\)[0-9()\\- ]{4,}[0-9]", "<PHONE>"),
    ("id_digits", "[0-9]{9,}", "<NUMBER>"),
)

_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c




def _ascii_lower(c: Column) -> Column:
    """ASCII-only lowercase via translate — NOT lower(): Java's full
    Unicode case mapping and DuckDB's utf8proc simple mapping diverge
    (lower('İ') is 2 codepoints in the JVM, 1 in DuckDB), and host
    case-folding is ASCII-only per WHATWG anyway (non-ASCII hosts go
    through IDNA, out of scope here)."""
    return F.translate(c, _ASCII_UPPER, _ASCII_LOWER)


def _ascii_lower_sql(expr: str) -> str:
    return f"translate({expr}, '{_ASCII_UPPER}', '{_ASCII_LOWER}')"


def url_host(c: str | Column) -> Column:
    """ASCII-lowercased host of a URL column (no port, no trailing dot)."""
    r = F.regexp_replace(_col(c), _SCHEME_PAT, "")
    r = F.regexp_replace(r, _USERINFO_PAT, "")
    h = _ascii_lower(F.regexp_extract(r, _HOST_ONLY_GRP, 1))
    return F.regexp_replace(h, _TRAILING_DOT, "").alias("host")


def url_host_sql(expr: str) -> str:
    """DuckDB expression replaying :func:`url_host` op-for-op."""
    r = f"regexp_replace(({expr}), {_sql_quote(_SCHEME_PAT)}, '')"
    r = f"regexp_replace({r}, {_sql_quote(_USERINFO_PAT)}, '')"
    h = _ascii_lower_sql(f"regexp_extract({r}, {_sql_quote(_HOST_ONLY_GRP)}, 1)")
    return f"regexp_replace({h}, {_sql_quote(_TRAILING_DOT)}, '')"


def url_normalize(c: str | Column) -> Column:
    """Canonical URL form (see module docstring for the exact rules).

    Op order matches :func:`url_normalize_sql` exactly (oracle
    invariant): scheme off, userinfo off, host:port lowercased, default
    port off, trailing dot off, fragment off, empty path -> '/'.
    """
    u = _col(c)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_GRP, 1))
    rest = F.regexp_replace(u, _SCHEME_PAT, "")
    user = F.regexp_extract(rest, _USERINFO_GRP, 1)
    rest2 = F.regexp_replace(rest, _USERINFO_PAT, "")
    hp = _ascii_lower(F.regexp_extract(rest2, _HOSTPORT_GRP, 1))
    hp = F.when(scheme == "http", F.regexp_replace(hp, ":80\\z", "")).when(
        scheme == "https", F.regexp_replace(hp, ":443\\z", "")
    ).otherwise(hp)
    hp = F.regexp_replace(hp, _TRAILING_DOT, "")
    tail = F.regexp_replace(rest2, _HOSTPORT_GRP, "")
    tail = F.regexp_replace(tail, _FRAGMENT_PAT, "")
    path = (
        F.when(tail == "", F.lit("/"))
        .when(F.substring(tail, 1, 1) == "?", F.concat(F.lit("/"), tail))
        .otherwise(tail)
    )
    prefix = F.when(scheme == "", F.lit("")).otherwise(
        F.concat(scheme, F.lit("://"))
    )
    return F.concat(prefix, user, hp, path).alias("url_norm")


def url_normalize_sql(expr: str) -> str:
    """DuckDB expression replaying :func:`url_normalize` op-for-op."""
    scheme = f"lower(regexp_extract(({expr}), {_sql_quote(_SCHEME_GRP)}, 1))"
    rest = f"regexp_replace(({expr}), {_sql_quote(_SCHEME_PAT)}, '')"
    user = f"regexp_extract({rest}, {_sql_quote(_USERINFO_GRP)}, 1)"
    rest2 = f"regexp_replace({rest}, {_sql_quote(_USERINFO_PAT)}, '')"
    hp = _ascii_lower_sql(
        f"regexp_extract({rest2}, {_sql_quote(_HOSTPORT_GRP)}, 1)"
    )
    hp = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({hp}, ':80\\z', '')"
        f" WHEN {scheme} = 'https' THEN regexp_replace({hp}, ':443\\z', '')"
        f" ELSE {hp} END"
    )
    hp = f"regexp_replace({hp}, {_sql_quote(_TRAILING_DOT)}, '')"
    tail = f"regexp_replace({rest2}, {_sql_quote(_HOSTPORT_GRP)}, '')"
    tail = f"regexp_replace({tail}, {_sql_quote(_FRAGMENT_PAT)}, '')"
    path = (
        f"CASE WHEN {tail} = '' THEN '/'"
        f" WHEN substr({tail}, 1, 1) = '?' THEN '/' || {tail}"
        f" ELSE {tail} END"
    )
    prefix = f"CASE WHEN {scheme} = '' THEN '' ELSE {scheme} || '://' END"
    return f"({prefix} || {user} || {hp} || {path})"


def _suffix_patterns(suffixes: tuple[str, ...]) -> tuple[str, str]:
    alt = "|".join(s.replace(".", "\\.") for s in suffixes)
    return (f"([^.]+\\.(?:{alt}))\\z", "([^.]+\\.[^.]+)\\z")


def registrable_domain(
    c: str | Column, *, suffixes: tuple[str, ...] = MULTI_PART_SUFFIXES
) -> Column:
    """eTLD+1 of a (already-lowercased) host column.

    IPv4 literals pass through whole; a dotless host returns itself;
    a host that IS a listed suffix falls back to its last two labels.
    """
    h = _col(c)
    pat3, pat2 = _suffix_patterns(suffixes)
    d3 = F.regexp_extract(h, pat3, 1)
    d2 = F.regexp_extract(h, pat2, 1)
    return (
        F.when(h.rlike(_IPV4_HOST_PAT), h)
        .when(d3 != "", d3)
        .when(d2 != "", d2)
        .otherwise(h)
        .alias("domain")
    )


def registrable_domain_sql(
    expr: str, *, suffixes: tuple[str, ...] = MULTI_PART_SUFFIXES
) -> str:
    """DuckDB expression replaying :func:`registrable_domain`."""
    pat3, pat2 = _suffix_patterns(suffixes)
    d3 = f"regexp_extract(({expr}), {_sql_quote(pat3)}, 1)"
    d2 = f"regexp_extract(({expr}), {_sql_quote(pat2)}, 1)"
    return (
        f"CASE WHEN regexp_matches(({expr}), {_sql_quote(_IPV4_HOST_PAT)})"
        f" THEN ({expr}) WHEN {d3} <> '' THEN {d3}"
        f" WHEN {d2} <> '' THEN {d2} ELSE ({expr}) END"
    )


def redact_pii(c: str | Column) -> Column:
    """Replace emails / IPv4s / phone-shaped runs with placeholders."""
    s = _col(c)
    for _, pat, rep in PII_RULES:
        s = F.regexp_replace(s, pat, rep)
    return s.alias("redacted")


def redact_pii_sql(expr: str) -> str:
    """DuckDB expression replaying :func:`redact_pii` op-for-op."""
    s = f"({expr})"
    for _, pat, rep in PII_RULES:
        s = f"regexp_replace({s}, {_sql_quote(pat)}, {_sql_quote(rep)}, 'g')"
    return s
