"""Unit tests for the Aho-Corasick dictionary tagger
(operators/dicttag.py) and the HTML -> text extraction chain
(functions/html.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.operators.dicttag import (
    _scan,
    blocklist_filter,
    build_aho_corasick,
    tag_terms,
)


def _count_all(text, terms):
    goto, fail, out = build_aho_corasick(terms)
    counts = [0] * len(terms)
    _scan(text, goto, fail, out, counts)
    return dict(zip(terms, counts))


def _brute(text, terms):
    return {
        t: sum(
            1
            for p in range(len(text) - len(t) + 1)
            if text[p : p + len(t)] == t
        )
        for t in terms
    }


def test_aho_corasick_matches_bruteforce():
    """Overlaps, nested terms, shared prefixes/suffixes — all counted
    exactly as position enumeration does (the oracle's semantics)."""
    terms = ["batch batch", "spark", "a", "ab", "aba", "he", "she", "his", "hers"]
    texts = [
        "batch batch batch",  # 'batch batch' overlaps itself -> 2
        "ushers she his hers",  # classic AC fixture: nested he/she/hers
        "ababab a ab",  # aba overlapping chain
        "",
        "zzz",  # zero matches
    ]
    for tx in texts:
        assert _count_all(tx, terms) == _brute(tx, terms), tx


def test_aho_corasick_random_property():
    import random

    random.seed(17)
    terms = ["ab", "ba", "aab", "bb", "abab"]
    for _ in range(20):
        tx = "".join(random.choice("ab ") for _ in range(300))
        assert _count_all(tx, terms) == _brute(tx, terms)


def test_tag_terms_spark(spark):
    df = spark.createDataFrame(
        [
            (1, "Batch batch BATCH"),  # case folding + self-overlap
            (2, "spark spark and spark"),
            (3, None),  # NULL text emits nothing
            (4, "no hits here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id"], r["term"]): r["n_matches"]
        for r in tag_terms(df, ["batch batch", "spark"]).collect()
    }
    assert got == {(1, "batch batch"): 2, (2, "spark"): 3}


def test_blocklist_filter_threshold(spark):
    df = spark.createDataFrame(
        [(1, "bad bad bad"), (2, "bad once only"), (3, "clean"), (4, None)],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in blocklist_filter(df, ["bad"], max_hits=1).collect()
    )
    assert kept == [2, 3, 4]  # >1 hits drops; NULL text never drops
    kept0 = sorted(
        r["doc_id"] for r in blocklist_filter(df, ["bad"]).collect()
    )
    assert kept0 == [3, 4]  # default: any hit drops


HTML_CASES = [
    # script/style content dropped, not just the tags
    (
        '<p>keep</p><script a="b">drop();</script><style>p{}</style>tail',
        "keep tail",
    ),
    # multi-line script body ((?s) dotall) + comment
    ("<script>\nvar x = 1;\n</script>ok<!-- \n note -->", "ok"),
    # entity decode order: &amp;lt; is the LITERAL '&lt;', never '<'
    ("&amp;lt; &lt;b&gt; &nbsp;&quot;q&quot; &#39;s&#39;", "&lt; <b> \"q\" 's'"),
    # tags become word boundaries
    ("a</p><p>b", "a b"),
    ("plain text, no markup", "plain text, no markup"),
]


def test_html_to_text_cases(spark):
    from etl_tiki_webscraping_spark.functions.html import html_to_text

    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(HTML_CASES)] + [(99, None)],
        "i long, raw string",
    )
    got = {
        r["i"]: r["clean"]
        for r in df.select("i", html_to_text("raw").alias("clean")).collect()
    }
    for i, (_, want) in enumerate(HTML_CASES):
        assert got[i] == want, (i, got[i], want)
    assert got[99] is None  # NULL propagates


def test_html_sql_replay_matches_spark(spark):
    """html_to_text_sql is generated from the same pattern tables as
    html_to_text; run both engines on the same strings and require
    byte identity — the cross-engine contract the catalog oracle
    stands on."""
    from etl_tiki_webscraping_spark.functions.html import (
        html_to_text,
        html_to_text_sql,
    )

    rows = [(i, raw) for i, (raw, _) in enumerate(HTML_CASES)]
    df = spark.createDataFrame(rows, "i long, raw string")
    spark_out = {
        r["i"]: r["clean"]
        for r in df.select("i", html_to_text("raw").alias("clean")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE pages (i BIGINT, raw VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", rows)
    duck_out = dict(
        con.execute(
            f"SELECT i, {html_to_text_sql('raw')} FROM pages"
        ).fetchall()
    )
    assert spark_out == duck_out
