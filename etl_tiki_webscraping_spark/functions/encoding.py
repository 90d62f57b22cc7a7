"""Encoding-quality signals: mojibake and decode-damage detection.

Web-crawl text arrives through lossy charset guesses; the classic
damage patterns are (a) UTF-8 bytes decoded as CP1252/Latin-1 —
``café`` becomes ``cafÃ©``, ``don’t`` becomes ``donâ€™t`` — and (b)
undecodable bytes replaced by U+FFFD.  Corpus pipelines score this
damage per document and drop or re-decode the worst.  (C4 and Gopher
both carry an encoding screen; the reference's pandas scraper inherits
requests' charset guessing and never checks.)

Detection is marker counting: a small set of high-precision substrings
that are vanishingly rare in clean text because each one is the
CP1252 rendering of a UTF-8 lead byte pair (``Ã``, ``â€``, ``Â``) or
the replacement character itself.  Counts are literal (non-regex)
substring occurrences, computed with the replace-length identity
``(len(s) - len(replace(s, m, ''))) / len(m)`` — pure codegen'd
column arithmetic both engines share bit-for-bit, zero UDF, zero
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# high-precision mojibake markers (CP1252 renderings of UTF-8 lead
# bytes, plus the replacement character).  Each entry is (marker,
# weight) — weights are all 1 today but the schema leaves room for
# rarer/surer markers to count more.
MOJIBAKE_MARKERS: "list[str]" = ["Ã", "â€", "Â", "�"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def marker_count(col: Column | str, marker: str) -> Column:
    """Occurrences of the literal ``marker`` in ``col`` via the
    replace-length identity (no regex, so markers never need
    escaping)."""
    s = _col(col)
    return (
        (F.length(s) - F.length(F.replace(s, F.lit(marker), F.lit(""))))
        / F.lit(len(marker))
    ).cast("long")


def mojibake_hits(col: Column | str) -> Column:
    """Total marker occurrences (the document's damage count)."""
    out = F.lit(0).cast("long")
    for m in MOJIBAKE_MARKERS:
        out = out + marker_count(col, m)
    return out


def mojibake_hits_sql(expr: str) -> str:
    """DuckDB replay of :func:`mojibake_hits`, generated from the same
    marker table.  Uses ``length()`` (CHARACTERS — matching Spark's
    ``F.length``), never ``strlen`` (BYTES — the markers are multi-byte
    UTF-8, so byte counts would divide wrong)."""
    parts = []
    for m in MOJIBAKE_MARKERS:
        lit = m.replace("'", "''")
        parts.append(
            f"(length({expr}) - length(replace({expr}, '{lit}', ''))) "
            f"// {len(m)}"
        )
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"
