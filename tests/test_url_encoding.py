"""Unit tests for URL canonicalization (functions/url.py) and
encoding-quality signals (functions/encoding.py), including the
cross-engine byte-identity of their generated DuckDB replays."""

import duckdb
from pyspark.sql import functions as F

URL_CASES = [
    # host casing + default https port + tracking strip + param sort
    (
        "https://WWW.Example.COM:443/A/b?utm_source=x&b=2&a=1#frag",
        "https://www.example.com/A/b?a=1&b=2",
        "example.com",
    ),
    # default http port, trailing slash, gclid-only query vanishes
    ("http://Shop.Net:80/cart/?gclid=99", "http://shop.net/cart", "shop.net"),
    # non-default port survives; empty path; fragment only
    ("https://cdn.example.net:8443#x", "https://cdn.example.net:8443", "cdn.example.net"),
    # params already sorted, no tracking: unchanged
    ("https://a.org/p?a=1&b=2", "https://a.org/p?a=1&b=2", "a.org"),
    # path case preserved; multiple trailing slashes
    ("https://a.org/CaseD///", "https://a.org/CaseD", "a.org"),
    # no scheme head: trimmed, fragment-less self
    ("  not-a-url#f  ", "not-a-url", ""),
]


def test_canonicalize_url_cases(spark):
    from etl_tiki_webscraping_spark.functions.url import (
        canonicalize_url,
        extract_host,
    )

    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(URL_CASES)] + [(99, None)],
        "i long, raw string",
    )
    got = {
        r["i"]: (r["canon"], r["host"])
        for r in df.select(
            "i",
            canonicalize_url("raw").alias("canon"),
            extract_host("raw").alias("host"),
        ).collect()
    }
    for i, (_, canon, host) in enumerate(URL_CASES):
        assert got[i] == (canon, host), (i, got[i], (canon, host))
    assert got[99] == (None, None)


def test_url_sql_replay_matches_spark(spark):
    from etl_tiki_webscraping_spark.functions.url import (
        canonicalize_url,
        canonicalize_url_sql,
        extract_host,
        extract_host_sql,
    )

    rows = [(i, raw) for i, (raw, _, _) in enumerate(URL_CASES)]
    df = spark.createDataFrame(rows, "i long, raw string")
    spark_out = {
        r["i"]: (r["canon"], r["host"])
        for r in df.select(
            "i",
            canonicalize_url("raw").alias("canon"),
            extract_host("raw").alias("host"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE u (i BIGINT, raw VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?, ?)", rows)
    duck_out = {
        i: (c, h)
        for i, c, h in con.execute(
            f"SELECT i, {canonicalize_url_sql('raw')}, "
            f"{extract_host_sql('raw')} FROM u"
        ).fetchall()
    }
    assert spark_out == duck_out


MOJI_CASES = [
    ("clean ascii text", 0),
    ("cafÃ©", 1),  # CP1252 rendering of é
    ("donâ€™t costâ€¦", 2),  # â€ twice
    ("Â» quoted Â«", 2),  # Â twice (inside Ã? no — distinct)
    ("bad�byte�", 2),  # replacement chars
    ("cafÃ© donâ€™t Â» x�", 4),  # one of each
]


def test_mojibake_hits_cases(spark):
    from etl_tiki_webscraping_spark.functions.encoding import mojibake_hits

    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(MOJI_CASES)], "i long, s string"
    )
    got = {
        r["i"]: r["h"]
        for r in df.select("i", mojibake_hits("s").alias("h")).collect()
    }
    for i, (_, want) in enumerate(MOJI_CASES):
        assert got[i] == want, (i, MOJI_CASES[i], got[i])


def test_mojibake_sql_replay_matches_spark(spark):
    """Chars-not-bytes: the markers are multi-byte UTF-8, so the DuckDB
    replay must count with length() (characters).  Byte counting
    (strlen) would inflate every count and this test would fail."""
    from etl_tiki_webscraping_spark.functions.encoding import (
        mojibake_hits,
        mojibake_hits_sql,
    )

    rows = [(i, s) for i, (s, _) in enumerate(MOJI_CASES)]
    df = spark.createDataFrame(rows, "i long, s string")
    spark_out = {
        r["i"]: r["h"]
        for r in df.select("i", mojibake_hits("s").alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE m (i BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO m VALUES (?, ?)", rows)
    duck_out = dict(
        con.execute(f"SELECT i, {mojibake_hits_sql('s')} FROM m").fetchall()
    )
    assert spark_out == duck_out


def test_canonicalize_idempotent_property(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) over a URL
    grammar covering every rule (hypothesis): a canonical form must be
    a fixed point or URL-level dedup double-counts pages."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_tiki_webscraping_spark.functions.url import canonicalize_url

    host = st.sampled_from(
        ["Example.COM", "www.Shop.net", "a.b.org", "CDN.example.net"]
    )
    port = st.sampled_from(["", ":80", ":443", ":8443"])
    path = st.lists(
        st.sampled_from(["Posts", "a", "B2", "x-y"]), max_size=3
    ).map(lambda seg: "".join("/" + s for s in seg))
    slash = st.sampled_from(["", "/", "//"])
    params = st.lists(
        st.sampled_from(["a=1", "b=2", "utm_source=x", "fbclid=z", "c=3&d=4"]),
        max_size=3,
    ).map(lambda ps: "?" + "&".join(ps) if ps else "")
    frag = st.sampled_from(["", "#f", "#Sec-2"])
    urls = st.tuples(
        st.sampled_from(["http", "https"]), host, port, path, slash, params, frag
    ).map(lambda t: f"{t[0]}://{t[1]}{t[2]}{t[3]}{t[4]}{t[5]}{t[6]}")

    collected: list[str] = []

    @settings(max_examples=60, deadline=None)
    @given(urls)
    def gen(u):
        collected.append(u)

    gen()
    df = spark.createDataFrame([(i, u) for i, u in enumerate(collected)], "i long, u string")
    once = df.select("i", canonicalize_url("u").alias("c1"))
    twice = once.select("i", "c1", canonicalize_url("c1").alias("c2"))
    for r in twice.collect():
        assert r["c1"] == r["c2"], (r["c1"], r["c2"])


def test_robots_rules_rfc9309_groups(spark):
    from etl_tiki_webscraping_spark.functions.url import robots_rules

    txt = (
        "Disallow: /orphan\n"        # before any group -> agent NULL
        "User-agent: *\n"
        "User-agent: FooBot\n"       # consecutive UA lines = ONE group
        "User-agent: FooBot\n"       # duplicate agent dedupes
        "Disallow: /a\n"
        "Allow: /a/b\n"
        "User-agent: bar:bot/2.0\n"  # agent value keeps its colon
        "Disallow: /c\n"
        "Sitemap: https://x/s.xml\n"
    )
    df = spark.createDataFrame([(1, txt)], "doc_id long, robots_txt string")
    rows = {
        (r["pos"], r["agent"], r["rule"], r["value"])
        for r in robots_rules(df).collect()
    }
    assert rows == {
        (0, None, "disallow", "/orphan"),
        (4, "*", "disallow", "/a"),
        (4, "FooBot", "disallow", "/a"),
        (5, "*", "allow", "/a/b"),
        (5, "FooBot", "allow", "/a/b"),
        (7, "bar:bot/2.0", "disallow", "/c"),
        (8, None, "sitemap", "https://x/s.xml"),
    }


def test_robots_match_pattern_parity():
    """Spark and DuckDB compile the same pattern from the same rule,
    and both engines agree on match verdicts."""
    import duckdb
    from pyspark.sql import functions as F

    from etl_tiki_webscraping_spark.functions.url import (
        robots_match_pattern_sql,
    )

    cases = [
        ("/a*", "/a/b", True), ("/a*", "/b/a", False),
        ("/a$", "/a", True), ("/a$", "/a/", False),
        ("/p.x*", "/p.x/q", True), ("/p.x*", "/pYx/q", False),  # '.' literal
        ("/m$n", "/m$n", True),  # mid-string '$' is literal
        ("/*/end$", "/x/end", True), ("/*/end$", "/x/end2", False),
        ("/q(1)", "/q(1)", True), ("/q[2]", "/q[2]", True),
    ]
    con = duckdb.connect()
    for rule, path, want in cases:
        pat_sql = robots_match_pattern_sql(f"'{rule}'")
        got = con.execute(
            f"SELECT regexp_matches('{path}', {pat_sql})"
        ).fetchone()[0]
        assert got == want, (rule, path, "duckdb")


def test_robots_url_gate_precedence(spark):
    from etl_tiki_webscraping_spark.functions.url import robots_url_gate

    rules = spark.createDataFrame(
        [
            ("h", "*", "disallow", "/dir"),
            ("h", "*", "allow", "/dir"),      # equal length: Allow wins
            ("h", "*", "disallow", "/dir/x"), # longer: Disallow wins
            ("h", "mybot", "allow", "/"),
            ("h", "mybot", "disallow", "/sec*"),
            ("h", "*", "disallow", ""),       # empty value = unrestricted
        ],
        "host string, agent string, rule string, value string",
    )
    urls = spark.createDataFrame(
        [
            ("h", "/dir/a", "other"),   # tie at /dir -> Allow-first
            ("h", "/dir/x/y", "other"), # /dir/x longer -> disallowed
            ("h", "/none", "other"),    # no match -> allowed, NULL rule
            ("h", "/sec/z", "MyBot"),   # exact group, case-folded
            ("h", "/ok", "MyBot"),      # exact group Allow /
            ("h2", "/any", "other"),    # host with no rules -> allowed
        ],
        "host string, path string, bot string",
    )
    got = {
        (r["host"], r["path"], r["bot"]):
            (r["allowed"], r["matched_rule"], r["matched_value"])
        for r in robots_url_gate(urls, rules).collect()
    }
    assert got[("h", "/dir/a", "other")] == (True, "allow", "/dir")
    assert got[("h", "/dir/x/y", "other")] == (False, "disallow", "/dir/x")
    assert got[("h", "/none", "other")] == (True, None, None)
    assert got[("h", "/sec/z", "MyBot")] == (False, "disallow", "/sec*")
    assert got[("h", "/ok", "MyBot")] == (True, "allow", "/")
    assert got[("h2", "/any", "other")] == (True, None, None)


def test_robots_url_gate_keeps_duplicate_urls(spark):
    # ADVICE r15: the precedence window partitioned only by
    # (host, path, bot), so duplicate input URL rows collapsed into
    # ONE output row — 'one row per input URL' contract violation.
    from etl_tiki_webscraping_spark.functions.url import robots_url_gate

    rules = spark.createDataFrame(
        [("h", "*", "disallow", "/sec")],
        "host string, agent string, rule string, value string",
    )
    urls = spark.createDataFrame(
        [("h", "/sec/a", "bot")] * 3 + [("h", "/ok", "bot")] * 2,
        "host string, path string, bot string",
    )
    rows = robots_url_gate(urls, rules).collect()
    assert len(rows) == 5
    assert sum(1 for r in rows if not r["allowed"]) == 3
    assert sum(1 for r in rows if r["allowed"]) == 2
