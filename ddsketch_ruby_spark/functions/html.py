"""HTML -> text extraction, JVM-side and oracle-replayable.

The north rule derives sketch measures from *extracted text* and pins
"byte-identical extracted text per url". This module is the extraction
step itself: a pure column-expression pipeline (whole-stage codegen, no
Python in the hot path) that recovers the text payload from the ``html``
binary column, plus a SQL builder that emits the op-identical DuckDB
expression so the extraction sits under the hard oracle gate.

Extraction semantics (documented, deliberately regex-grade — a fixed
six-step pipeline both engines can replay bit-for-bit; NOT a browser
parser):

1. UTF-8 decode of the binary payload.
2. Raw-text elements first: ``<script ...>...</script>`` and
   ``<style ...>...</style>`` blocks are removed wholesale (their bodies
   may contain tag-like strings and comment markers — HTML5 treats them
   as raw text, so they are stripped before any other rule can see their
   contents).
3. Comments ``<!-- ... -->`` are removed (after raw-text elements, so a
   ``<!--`` inside a script cannot eat the document).
4. Every remaining tag ``<[^>]*>`` is replaced by the empty string
   (inline semantics; block tags do NOT inject whitespace — byte
   identity with the source text is the contract, and the synthetic
   web_pages fixture plus the driver gate both pin it).
5. The six ubiquitous named/numeric entities are decoded:
   ``&lt; &gt; &quot; &#39; &apos; &nbsp;`` — then ``&amp;`` strictly
   LAST, so double-escaped entities decode exactly one level
   (``&amp;lt;`` -> ``&lt;``), matching HTML semantics.
6. Nothing else: no whitespace collapsing, no case folding. Compose with
   :func:`ddsketch_ruby_spark.functions.text.normalize_text` when a
   normalized view is wanted.

Known regex-grade limits (documented, tested): an attribute value that
contains a literal ``>`` ends the tag early, and mismatched raw-text
closers are not recovered. Real-world extractors (trafilatura, jusText)
accept the same class of failure or pay a full parser; at 10^12 docs the
scan-bound regex pipeline is the right default and the parser is a
per-row UDF swap-in.

Every regex below sticks to the common Java-regex / RE2 subset: inline
``(?s)`` (dotall — identical in both), lazy ``.*?``, explicit character
classes (never ``\\s`` — Java and RE2 disagree on its membership; never
``(?i)`` — Java folds ASCII only, RE2 folds Unicode, so
case-insensitivity is explicit ``[sS]``-style classes). Whitespace in
patterns is the explicit ``[ \\t\\r\\n]`` class per project invariant.

Reference parity note: ddsketch-ruby has no HTML handling — this is
north-rule surface (BASELINE.json input_hint), not reference surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ddsketch_ruby_spark.functions.sqltext import sql_quote as _sql_quote

__all__ = [
    "html_to_text",
    "html_to_text_sql",
    "extract_links",
    "extract_links_sql",
    "HTML_ENTITIES",
]

# strictly ordered: '&amp;' LAST (single-level decode of double escapes)
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", "\u00a0"),
    ("&amp;", "&"),
)

# raw-text elements whose bodies are opaque to the tag grammar.
# Case-insensitivity is EXPLICIT [sS]-style classes, never (?i): Java's
# inline (?i) folds ASCII only while RE2's applies Unicode simple
# folding, so '<ſcript>' (long s) would be raw text in DuckDB but a
# plain tag in Spark — with explicit classes both engines treat it as a
# plain tag and byte-identity holds.
_RAW_TEXT_PATTERNS: tuple[str, ...] = (
    # tag-name boundary: '<script>' or '<script<ws>attrs...>' only, so
    # e.g. '<scripted>' (a plain element) is NOT treated as raw text
    "(?s)<[sS][cC][rR][iI][pP][tT]([ \\t\\r\\n][^>]*)?>"
    ".*?</[sS][cC][rR][iI][pP][tT][ \\t\\r\\n]*>",
    "(?s)<[sS][tT][yY][lL][eE]([ \\t\\r\\n][^>]*)?>"
    ".*?</[sS][tT][yY][lL][eE][ \\t\\r\\n]*>",
)
_COMMENT_PATTERN = "(?s)<!--.*?-->"
_TAG_PATTERN = "<[^>]*>"


def html_to_text(c: str | Column, *, binary: bool = True) -> Column:
    """Extract visible text from an HTML column (binary or string).

    Pure JVM expression chain — decode, strip raw-text elements,
    comments, tags, then entity-decode. Op order matches
    :func:`html_to_text_sql` exactly (oracle invariant).
    """
    col = F.col(c) if isinstance(c, str) else c
    s = F.decode(col, "UTF-8") if binary else col
    for pat in _RAW_TEXT_PATTERNS:
        s = F.regexp_replace(s, pat, "")
    s = F.regexp_replace(s, _COMMENT_PATTERN, "")
    s = F.regexp_replace(s, _TAG_PATTERN, "")
    for entity, ch in HTML_ENTITIES:
        s = F.replace(s, F.lit(entity), F.lit(ch))
    return s.alias("text")




def html_to_text_sql(expr: str, *, binary: bool = True) -> str:
    """DuckDB expression replaying :func:`html_to_text` op-for-op.

    RE2 accepts the same inline-flag / lazy-quantifier subset the Java
    patterns use; DuckDB needs the explicit 'g' option for global
    replacement (Java replaceAll is global by default). The non-ASCII
    nbsp replacement goes through chr(160) so the SQL string stays
    ASCII-clean regardless of how the driver ships it.
    """
    s = f"decode({expr})" if binary else f"({expr})"
    for pat in _RAW_TEXT_PATTERNS:
        s = f"regexp_replace({s}, {_sql_quote(pat)}, '', 'g')"
    s = f"regexp_replace({s}, {_sql_quote(_COMMENT_PATTERN)}, '', 'g')"
    s = f"regexp_replace({s}, {_sql_quote(_TAG_PATTERN)}, '', 'g')"
    for entity, ch in HTML_ENTITIES:
        rep = "chr(160)" if ch == "\u00a0" else _sql_quote(ch)
        s = f"replace({s}, {_sql_quote(entity)}, {rep})"
    return s


# Anchor-href extraction. Semantics (documented, regex-grade like the
# extractor above): double-quoted href attributes of <a> tags only; the
# attribute name must be delimited by whitespace (so data-href does not
# match); values
# are returned RAW — entity-decode them per HTML_ENTITIES after
# exploding (operators/webcorpus.py outlinks does). Group 2 is the
# value; group 1 is the lazy attribute skip (NOTE: a tag carrying a
# duplicated href resolves to the LAST one — the optional attr-skip
# group is tried before its absence, and both engines agree; probed in
# tests). Same Java/RE2 common
# subset: explicit case classes (never (?i)), explicit [ \t\r\n]
# whitespace, no lookaround, no \b.
_HREF_PATTERN = (
    "<[aA][ \\t\\r\\n]([^>]*?[ \\t\\r\\n])?"
    "[hH][rR][eE][fF][ \\t\\r\\n]*=[ \\t\\r\\n]*\"([^\"]*)\""
)
_HREF_GROUP = 2


def extract_links(c: str | Column, *, binary: bool = True) -> Column:
    """All double-quoted ``<a href="...">`` values as ``array<string>``.

    Pure JVM expression (``regexp_extract_all``) — one scan-stage pass,
    no Python. Values are raw attribute text; resolution (relative ->
    absolute) and entity decoding live in ``outlinks``
    (operators/webcorpus.py), which explodes this array.
    """
    col = F.col(c) if isinstance(c, str) else c
    s = F.decode(col, "UTF-8") if binary else col
    return F.regexp_extract_all(s, F.lit(_HREF_PATTERN), _HREF_GROUP)


def extract_links_sql(expr: str, *, binary: bool = True) -> str:
    """DuckDB expression replaying :func:`extract_links` op-for-op."""
    s = f"decode({expr})" if binary else f"({expr})"
    return (
        f"regexp_extract_all({s}, {_sql_quote(_HREF_PATTERN)},"
        f" {_HREF_GROUP})"
    )
