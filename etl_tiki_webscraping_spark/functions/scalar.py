"""Scalar column functions (SURVEY.md §2.6 F1-F3).

All JVM-side built-ins — no Python UDFs — so they stay inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_html_suffix(col: Column | str) -> Column:
    """F1: the reference's ``product_path.replace('.html', '')``
    (/root/reference/dags/etl.py:91).  Anchored at end-of-string —
    stricter than str.replace, which is the intended semantics (the
    path suffix, not an interior substring).
    """
    return F.regexp_replace(F.col(col) if isinstance(col, str) else col, r"\.html$", "")


def parse_day_first_date(col: Column | str, fmt: str = "dd/MM/yyyy") -> Column:
    """F3: day-first date parse — the reference's
    ``pd.to_datetime(col, format="%d/%m/%Y")`` (dags/etl.py:164-166).

    Divergence note (SURVEY §7 risk register): pandas raises on a
    malformed string, and Spark 4's default ANSI mode makes ``to_date``
    raise too.  We pin null-on-error via ``try_to_date`` (the engine
    treats malformed dates as data-quality filters, not job failures).
    """
    return F.try_to_date(F.col(col) if isinstance(col, str) else col, fmt)


def build_url(template: str, *cols: Column) -> Column:
    """F2: URL construction from key + page columns — the reference's
    f-string interpolation (dags/etl.py:53,91,135) as a codegen'd
    format_string.  ``template`` uses printf placeholders (%s, %d).
    """
    return F.format_string(template, *cols)
