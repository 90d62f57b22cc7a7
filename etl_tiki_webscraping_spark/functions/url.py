"""URL canonicalization for web-crawl curation.

Crawl corpora key on URLs: near-identical pages differ only in tracking
parameters, fragment anchors, host casing, default ports, or trailing
slashes, and URL-level dedup/host rollups need one canonical form.
The reference builds URLs by string concatenation (dags/etl.py's
category/product path assembly); this is the inverse, curation-side
operator.

Like :mod:`.html`, every step is a built-in column expression in the
Java-regex/RE2 shared dialect (no backreferences, no lookarounds, no
capture-group REPLACEMENTS — Java spells those ``$1`` and RE2 ``\\1``,
so the chain avoids them entirely), and the DuckDB replay is GENERATED
from the same rules so the engines cannot drift.

Canonical form, in order:

1. trim; drop the ``#fragment``;
2. lowercase the ``scheme://host[:port]`` head (ONLY the head — paths
   are case-significant), strip default ports ``:80``/``:443``;
3. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``),
   sort the survivors bytewise so parameter order never splits a URL
   into two identities, rebuild ``?a=1&b=2``;
4. strip trailing slashes from the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# the scheme://host[:port] head (everything before path/query/fragment)
_HEAD_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
# tracking parameters dropped during canonicalization
_TRACKING_RE = r"^(utm_|fbclid=|gclid=)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def canonicalize_url(col: Column | str) -> Column:
    """The canonical form (see module doc).  NULL propagates; a string
    with no ``scheme://host`` head canonicalizes to its trimmed,
    fragment-less self (head = '')."""
    u = F.trim(_col(col))
    u = F.regexp_replace(u, r"#.*$", "")
    head = F.regexp_extract(u, _HEAD_RE, 0)
    head = F.lower(head)
    head = F.regexp_replace(head, r":80$", "")
    head = F.regexp_replace(head, r":443$", "")
    rest = F.substring(u, F.length(F.regexp_extract(u, _HEAD_RE, 0)) + 1, 1 << 30)
    path = F.regexp_replace(rest, r"\?.*$", "")
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != F.lit("")) & ~p.rlike(_TRACKING_RE),
        )
    )
    qstr = F.array_join(params, "&")
    return F.concat(
        head,
        path,
        F.when(qstr != F.lit(""), F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )


def extract_host(col: Column | str) -> Column:
    """Lowercased host with port and a leading ``www.`` stripped — the
    rollup key for per-site statistics and domain-level filters."""
    head = F.lower(F.regexp_extract(F.trim(_col(col)), _HEAD_RE, 0))
    host = F.regexp_replace(head, r"^[a-z][a-z0-9+.-]*://", "")
    host = F.regexp_replace(host, r":[0-9]+$", "")
    return F.regexp_replace(host, r"^www\.", "")


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB replay of :func:`canonicalize_url`, generated from the
    same rules (list_filter/list_sort mirror filter/array_sort; both
    engines sort strings bytewise)."""
    u = f"trim({expr})"
    u = f"regexp_replace({u}, '#.*$', '', 'g')"
    head_raw = f"regexp_extract({u}, '{_HEAD_RE}', 0)"
    head = f"lower({head_raw})"
    head = f"regexp_replace({head}, ':80$', '')"
    head = f"regexp_replace({head}, ':443$', '')"
    # length() = CHARACTERS (matches Spark F.length); strlen is BYTES
    rest = f"substr({u}, CAST(length({head_raw}) + 1 AS INT))"
    path = f"regexp_replace({rest}, '\\?.*$', '')"
    path = f"regexp_replace({path}, '/+$', '')"
    query = f"regexp_extract({rest}, '\\?(.*)$', 1)"
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}')))"
    )
    qstr = f"array_to_string({params}, '&')"
    return (
        f"({head} || {path} || "
        f"CASE WHEN {qstr} <> '' THEN '?' || {qstr} ELSE '' END)"
    )


def extract_host_sql(expr: str) -> str:
    """DuckDB replay of :func:`extract_host`."""
    head = f"lower(regexp_extract(trim({expr}), '{_HEAD_RE}', 0))"
    host = f"regexp_replace({head}, '^[a-z][a-z0-9+.-]*://', '')"
    host = f"regexp_replace({host}, ':[0-9]+$', '')"
    return f"regexp_replace({host}, '^www\\.', '')"


def robots_rules(df, id_col: str = "doc_id", text_col: str = "robots_txt"):
    """robots.txt rule extraction (round-14) — the crawl-governance
    twin of the sitemap scan: one row per Allow/Disallow/Sitemap
    directive with the GOVERNING user-agent attached.

    Pure Spark composition, no UDF: posexplode the lines, mark
    ``User-agent:`` lines, and carry the agent forward with
    ``last(ignorenulls)`` over a (file, line-order) window — the
    standard group semantics (directives bind to the most recent
    agent line; ``Sitemap:`` is global, agent NULL).  Lines are split
    on \\n with \\r trimmed (both line conventions), directive names
    match case-insensitively, values are whitespace-trimmed.  Scale
    shape: one narrow explode + ONE window partitioned by file id —
    robots files are tiny, so the per-file window state is bounded by
    the line count."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.regexp_replace(F.col(text_col), "\r", ""), "\n")
        ).alias("pos", "line"),
    )
    agent = F.when(
        F.lower(F.col("line")).rlike("^user-agent:"),
        F.trim(F.substring_index(F.col("line"), ":", -1)),
    )
    directive = F.regexp_extract(
        F.col("line"), r"(?i)^(allow|disallow|sitemap):\s*(.*)$", 1
    )
    value = F.regexp_extract(
        F.col("line"), r"(?i)^(allow|disallow|sitemap):\s*(.*)$", 2
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = lines.select(
        id_col,
        "pos",
        F.last(agent, ignorenulls=True).over(w).alias("agent"),
        F.lower(directive).alias("rule"),
        F.trim(value).alias("value"),
    )
    return tagged.filter(F.col("rule") != "").select(
        id_col,
        "pos",
        F.when(F.col("rule") != "sitemap", F.col("agent")).alias("agent"),
        "rule",
        "value",
    )
