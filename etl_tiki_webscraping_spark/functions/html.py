"""HTML -> text extraction for the training-data-pipeline surface.

Web crawl dumps arrive as HTML; every LLM corpus pipeline starts by
stripping markup down to running text (the reference scrapes product
pages but lets pandas' HTML readers do this implicitly; here it is a
first-class, oracle-checkable operator).

Everything is a chain of built-in ``regexp_replace`` / ``replace``
column expressions — JVM-side, codegen-friendly, embarrassingly
parallel, no Python and no shuffle — and every step is deliberately
restricted to regex features BOTH Java regex (Spark) and RE2 (DuckDB)
support identically: inline ``(?is)`` flags, lazy ``.*?``, character
classes.  No backreferences (RE2 lacks them — script and style blocks
are therefore two patterns, not one with ``\\1``), no lookarounds.
That shared dialect is what lets the catalog oracle replay the whole
extraction in ANSI SQL.

Step order is the standard one:

1. drop ``<script>``/``<style>`` ELEMENT CONTENT (their text is code,
   not prose) and ``<!-- comments -->``;
2. replace every remaining tag with a space (so ``a</p><p>b`` keeps a
   word boundary);
3. decode the common character entities, ``&amp;`` LAST so
   ``&amp;lt;`` decodes to the literal ``&lt;`` and not to ``<``
   (double-decode is the classic sanitizer bug);
4. collapse whitespace runs and trim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# (pattern, replacement) — applied in order.  Java regex and RE2 agree
# on every construct used here; DuckDB replays each as
# regexp_replace(x, pattern, replacement, 'g').
HTML_STRIP_PATTERNS: "list[tuple[str, str]]" = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
]

# literal (not regex) entity decodes, in order; ``&amp;`` must be last.
HTML_ENTITY_DECODES: "list[tuple[str, str]]" = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
]


def strip_tags(col: Column | str) -> Column:
    """Markup removal only (steps 1-2): script/style/comment content
    dropped, every other tag replaced by a space.  Entities are left
    encoded — compose with :func:`decode_entities` or use
    :func:`html_to_text` for the full chain."""
    out = _col(col)
    for pat, rep in HTML_STRIP_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def decode_entities(col: Column | str) -> Column:
    """Decode the common HTML character entities (literal string
    replaces — no regex involved), ``&amp;`` last to avoid
    double-decoding ``&amp;lt;``."""
    out = _col(col)
    for ent, ch in HTML_ENTITY_DECODES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def html_to_text(col: Column | str) -> Column:
    """The full HTML -> running-text chain: strip markup, decode
    entities, collapse whitespace runs to single spaces, trim.  NULL
    propagates (a NULL page stays NULL rather than becoming '').

    The run class is the explicit ``[ \\t\\n\\f\\r]`` — Java ``\\s``
    additionally matches U+000B, which RE2 (the oracle twin below)
    does not (ADVICE r13)."""
    return F.trim(
        F.regexp_replace(decode_entities(strip_tags(col)), "[ \t\n\f\r]+", " ")
    )


def html_to_text_sql(expr: str) -> str:
    """The DuckDB replay of :func:`html_to_text` over SQL expression
    ``expr`` — generated from the SAME pattern tables so the two
    engines cannot drift.  Used by the catalog oracle."""
    out = expr
    for pat, rep in HTML_STRIP_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    for ent, ch in HTML_ENTITY_DECODES:
        lit = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"
