"""Text-analysis and scalar function semantics (SURVEY.md §2.6 +
extension surface)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_tiki_webscraping_spark.functions.scalar import (
    build_url,
    parse_day_first_date,
    strip_html_suffix,
)
from etl_tiki_webscraping_spark.functions.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    language_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)


def _one(spark, text):
    return spark.createDataFrame([(text,)], "t string")


def test_token_count(spark):
    row = _one(spark, "  a  b   c ").select(token_count("t").alias("n")).collect()[0]
    assert row["n"] == 3  # repeated spaces don't create ghost tokens


def test_bpe_ish_token_count(spark):
    row = _one(spark, "it's 42%").select(bpe_ish_token_count("t").alias("n")).collect()[0]
    # it / ' / s / 42 / % = 5
    assert row["n"] == 5


def test_punct_ratio_bounds(spark):
    assert _one(spark, "!!!").select(punct_ratio("t").alias("r")).collect()[0]["r"] == 1.0
    assert _one(spark, "abc").select(punct_ratio("t").alias("r")).collect()[0]["r"] == 0.0


def test_stopword_ratio(spark):
    r = _one(spark, "the cat and the hat").select(stopword_ratio("t").alias("r")).collect()[0]["r"]
    assert abs(r - 3 / 5) < 1e-9


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat is in the house and it is warm",),
            ("el gato que vive en la casa con un perro",),
            ("der hund ist von den kindern und das haus",),
            ("zzz qqq www",),
        ],
        "t string",
    )
    langs = [r["l"] for r in df.select(language_id("t").alias("l")).collect()]
    assert langs == ["en", "es", "de", "und"]


def test_doc_fingerprint_order_sensitive_ws_insensitive(spark):
    df = spark.createDataFrame(
        [("a b c",), ("a  b   c",), ("c b a",)], "t string"
    )
    fps = [r["f"] for r in df.select(doc_fingerprint("t").alias("f")).collect()]
    assert fps[0] == fps[1]  # whitespace-normalized
    assert fps[0] != fps[2]  # order-sensitive


def test_quality_score_range(spark):
    df = spark.createDataFrame(
        [("the quick brown fox is a good and normal sentence with the usual words",), ("!!!",)],
        "t string",
    )
    scores = [r["q"] for r in df.select(quality_score("t").alias("q")).collect()]
    assert scores[0] == 1.0
    assert 0.0 <= scores[1] < scores[0]


def test_strip_html_suffix_anchored(spark):
    df = spark.createDataFrame([("shop/item.html",), ("a.html/b",)], "t string")
    out = [r["s"] for r in df.select(strip_html_suffix("t").alias("s")).collect()]
    assert out == ["shop/item", "a.html/b"]  # interior '.html' untouched


def test_parse_day_first_date(spark):
    df = spark.createDataFrame([("25/12/2024",), ("not-a-date",)], "t string")
    out = [r["d"] for r in df.select(parse_day_first_date("t").alias("d")).collect()]
    assert out[0] == datetime.date(2024, 12, 25)
    assert out[1] is None  # null-on-error, documented divergence from pandas


def test_build_url(spark):
    df = spark.createDataFrame([("phones", 3)], "cat string, page int")
    out = df.select(build_url("https://x/api?c=%s&p=%d", F.col("cat"), F.col("page")).alias("u")).collect()
    assert out[0]["u"] == "https://x/api?c=phones&p=3"


def test_redact_pii_scrubs_emails_and_phones(spark):
    from etl_tiki_webscraping_spark.functions.text import redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("mail bob.smith+x@corp.example.co.uk now",),
            ("call +84 123 4567 or +1 555-0100 today",),
            ("no pii here at all",),
        ],
        "text string",
    )
    got = [r.c for r in df.select(redact_pii("text").alias("c")).collect()]
    assert got[0] == "mail <EMAIL> now"
    assert got[1] == "call <PHONE> or <PHONE> today"
    assert got[2] == "no pii here at all"


class TestBigramPmi:
    def test_collocation_ranks_above_frequent_pair(self, spark):
        import math

        from etl_tiki_webscraping_spark.functions.text import bigram_pmi

        # "new york" always co-occurs; "of the" is frequent but both
        # tokens appear all over -> PMI(new york) > PMI(of the)
        docs = [
            "new york is one of the cities of the north of the east",
            "new york has many of the parks of the region",
            "new york draws many of the visitors of the world",
            "new york leads many of the rankings of the decade",
            "new york anchors many of the routes of the coast",
        ]
        df = spark.createDataFrame([(d,) for d in docs], "text string")
        got = {(r.tok_a, r.tok_b): (r.n_ab, r.pmi)
               for r in bigram_pmi(df, "text", min_count=5).collect()}
        assert ("new", "york") in got and ("of", "the") in got
        assert got[("new", "york")][1] > got[("of", "the")][1]
        # hand-check one PMI value: c(new york)=5, left c(new)=5,
        # right c(york)=5, N = total bigrams
        total = sum(len(d.split()) - 1 for d in docs)
        want = round(math.log(total * 5 / (5 * 5)), 6)
        assert abs(got[("new", "york")][1] - want) < 1e-9

    def test_min_count_drops_rare_pairs(self, spark):
        from etl_tiki_webscraping_spark.functions.text import bigram_pmi

        df = spark.createDataFrame(
            [("alpha beta",), ("alpha beta",), ("gamma delta",)],
            "text string",
        )
        got = {(r.tok_a, r.tok_b)
               for r in bigram_pmi(df, "text", min_count=2).collect()}
        assert got == {("alpha", "beta")}


def test_kneser_ney_catalog_query_matches_python_replay(spark, tmp_path):
    """Pin the interpolated-KN formula (D=0.75) against a pure-python
    replay on a small fixture, including the integer-unit
    quantization: P(w|v) = (c(vw)-D)/c(v) + D*N1+(v,.)/c(v) *
    N1+(.,w)/T."""
    import math
    from collections import Counter

    import pandas as pd

    from etl_tiki_webscraping_spark.plans.catalog import QUERIES

    texts = {
        1: "the cat sat on the mat",
        2: "the cat ate the fish",
        3: "a dog sat on a log",
        4: "one",          # single token: no bigrams -> absent
    }
    df = pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [len(t) for t in texts.values()],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)

    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in QUERIES["doc_kneser_ney_logprob"].fn(
            spark, str(tmp_path)
        ).collect()
    }
    assert 4 not in got

    # python replay
    bigrams = {d: list(zip(t.split(), t.split()[1:])) for d, t in texts.items()}
    c2 = Counter(bg for bgs in bigrams.values() for bg in bgs)
    c1 = Counter()
    nv = Counter()
    nw = Counter()
    for (v, w), n in c2.items():
        c1[v] += n
        nv[v] += 1
        nw[w] += 1
    T = len(c2)
    for d, bgs in bigrams.items():
        if not bgs:
            continue
        units = 0
        for v, w in bgs:
            p = (c2[(v, w)] - 0.75) / c1[v] + (0.75 * nv[v] / c1[v]) * (
                nw[w] / T
            )
            units += math.floor(math.log(p) * 1e8 + 0.5)
        want = units / len(bgs) / 1e8
        n_b, avg = got[d]
        assert n_b == len(bgs)
        assert abs(avg - want) < 1e-12, (d, avg, want)


# --- mixed-script (CJK / no-space) segmentation -----------------------------

def _mixed_toks(spark, text, n=2):
    from etl_tiki_webscraping_spark.functions.text import tokenize_mixed

    df = _one(spark, text)
    return df.select(tokenize_mixed(F.col("t"), n).alias("tk")).first()["tk"]


def test_tokenize_mixed_expands_runs_to_char_bigrams(spark):
    toks = _mixed_toks(spark, "hello 世界真好 world こんにちは ok 안녕하세요")
    assert toks == [
        "hello", "世界", "界真", "真好", "world",
        "こん", "んに", "にち", "ちは", "ok",
        "안녕", "녕하", "하세", "세요",
    ]


def test_tokenize_mixed_single_char_run_passes_whole(spark):
    # a 1-char run is shorter than the n-gram width: kept as-is
    assert _mixed_toks(spark, "a 山 b") == ["a", "山", "b"]


def test_tokenize_mixed_is_ws_tokenize_on_spaced_scripts(spark):
    from etl_tiki_webscraping_spark.functions.text import tokenize_ws

    df = _one(spark, "  The quick  brown fox.  ")
    r = df.select(
        tokenize_ws(F.col("t")).alias("ws"),
    ).first()
    assert _mixed_toks(spark, "  The quick  brown fox.  ") == r["ws"]


def test_tokenize_mixed_embedded_run_splits_out(spark):
    # run glued to Latin text: the spacing step isolates it; adjacent
    # Han + kana form ONE run (the class is script-union), so bigrams
    # cross the script boundary — same contract as the DuckDB replay
    assert _mixed_toks(spark, "abc漢字かなdef") == [
        "abc", "漢字", "字か", "かな", "def",
    ]


def test_tokenize_mixed_trigram_width(spark):
    assert _mixed_toks(spark, "世界真好", n=3) == ["世界真", "界真好"]


def test_gopher_stats_not_degenerate_on_cjk_with_flag(spark):
    """A space-less CJK doc with a repeated phrase: whitespace
    tokenization sees ONE token (no 2-gram exists -> all masses 0);
    segment_cjk=True sees the repetition."""
    from etl_tiki_webscraping_spark.operators.repetition import (
        repetition_signals,
    )

    docs = spark.createDataFrame(
        [(1, "世界真好世界真好世界真好")], "doc_id long, text string"
    )
    ws = repetition_signals(docs).first()
    mixed = repetition_signals(docs, segment_cjk=True).first()
    assert ws["n_words"] == 1 and ws["top2gram_mass"] == 0
    assert mixed["n_words"] == 11  # 11 overlapping bigrams of a 12-char run
    assert mixed["top2gram_mass"] > 0
    assert mixed["dup5gram_mass"] > 0


def test_shingles_not_degenerate_on_cjk_with_flag(spark):
    """Near-dup shingling on CJK: without the flag every doc is one
    whole-doc shingle (pairwise Jaccard blind); with it the two
    near-identical docs share most character-bigram shingles."""
    from etl_tiki_webscraping_spark.operators.dedup import shingles

    docs = spark.createDataFrame(
        [(1, "今日は良い天気ですね"), (2, "今日は良い天気でした")],
        "doc_id long, text string",
    )
    ws = docs.select(shingles("text", n=1).alias("s")).collect()
    mixed = docs.select(
        shingles("text", n=1, segment_cjk=True).alias("s")
    ).collect()
    assert all(len(r["s"]) == 1 for r in ws)  # degenerate: 1 shingle/doc
    a, b = (set(r["s"]) for r in mixed)
    jac = len(a & b) / len(a | b)
    assert len(a) > 5 and 0.5 < jac < 1.0


def test_tokenize_mixed_py_matches_expression_form(spark):
    """The Arrow-kernel twin (tokenize_mixed_py) must produce the SAME
    token stream as the Spark expression for mixed scripts, ASCII-only
    whitespace, and the U+3000 ideographic-space edge the Python
    default split would mishandle."""
    from etl_tiki_webscraping_spark.functions.text import (
        tokenize_mixed,
        tokenize_mixed_py,
    )

    samples = [
        "hello 世界平和 world",
        "日月火 mixed かな and ascii",
        "a\tb\nc 山川",
        "ideographic　space 田中大",  # U+3000 is NOT a separator
        "한국어 텍스트 spaced hangul",
        "ไทยข้อความ thai run",
        "",
        "no cjk at all",
        "単",  # single-char run passes whole
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    from pyspark.sql import functions as F

    got_expr = [
        r["tk"]
        for r in df.select(tokenize_mixed(F.col("t")).alias("tk")).collect()
    ]
    got_py = [tokenize_mixed_py(s) for s in samples]
    assert got_expr == got_py, list(zip(samples, got_expr, got_py))


def test_language_id_script_closes_cjk_blindspot(spark):
    """The stopword classifier alone returns 'und' for every no-space-
    script text; the script tier classifies them and still defers to
    stopwords for spaced scripts."""
    from pyspark.sql import functions as F

    from etl_tiki_webscraping_spark.functions.text import (
        language_id,
        language_id_script,
    )

    samples = [
        ("zh", "日月火水木金土山川田中大小上下人日月火水"),
        ("ja", "日月火水木金土あいうえお山川田中"),   # Han + kana -> ja
        ("ko", "가나다라마바사아자차카타파하거너가나다라"),
        ("th", "กขคงจฉชซญดตถทนบปกขคง"),
        ("en", "the cat sat on the mat and it was good"),
        ("und", "zxqv wvut 12345"),
    ]
    df = spark.createDataFrame([(e, t) for e, t in samples], "exp string, t string")
    rows = df.select(
        "exp",
        language_id_script(F.col("t")).alias("script_pred"),
        language_id(F.col("t")).alias("stopword_pred"),
    ).collect()
    for r in rows:
        assert r["script_pred"] == r["exp"], (r["exp"], r["script_pred"])
    # the blindspot itself: stopword-only says 'und' for all CJK rows
    assert all(
        r["stopword_pred"] == "und"
        for r in rows if r["exp"] in ("zh", "ja", "ko", "th")
    )
