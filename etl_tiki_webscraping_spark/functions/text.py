"""Text-analysis functions for the training-data-pipeline surface
(BASELINE.json north star; exercised on the ``documents`` fixture).

The reference's only text data is rating ``comment`` / product ``name``
(/root/reference/sql/dwh.sql:10,19) with no analysis applied; these
operators are the engine extension mandated by BASELINE.json.

Everything here is built-in-function compositions (split / transform /
aggregate / filter on arrays) — JVM-side, codegen-friendly, no Python
in the hot path.  At 100 TB these are embarrassingly parallel
narrow ops: no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deliberately small: the heuristic's job is cheap routing,
# not linguistics.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "por", "con"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "dans"],
}

_ENGLISH_STOPWORDS = STOPWORDS["en"]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokenize_ws(col: Column | str) -> Column:
    """Whitespace tokenization; empty strings filtered so repeated
    spaces don't yield ghost tokens.

    Splits on the EXPLICIT class ``[ \\t\\n\\f\\r]`` rather than ``\\s``:
    Java regex ``\\s`` includes U+000B (vertical tab) but RE2's — the
    engine behind the DuckDB oracles — does not, so ``\\s`` here would
    diverge from every oracle on \\x0B-containing text (ADVICE r13).
    The explicit class is the one spelling with identical semantics in
    Java, RE2, and Python."""
    return F.filter(
        F.split(F.trim(_col(col)), "[ \t\n\f\r]+"), lambda t: t != F.lit("")
    )


#: Character-class body (no brackets) matching scripts conventionally
#: written WITHOUT inter-word spaces, where whitespace tokenization
#: degenerates to one giant token per sentence: CJK ideographs
#: (unified + extension A + compatibility), kana, hangul syllables,
#: and the space-less Southeast-Asian scripts (Thai, Lao, Myanmar,
#: Khmer).  Spelled as explicit ``\x{...}`` codepoint ranges — NOT
#: ``\p{script=...}`` — because hex escapes are the one syntax shared
#: verbatim by Java regex (Spark) and RE2 (DuckDB), so the exact same
#: class string drives both the operator and its oracle.  Hangul does
#: use spaces in running text, but character-bigram indexing is still
#: the standard Korean IR treatment (agglutinative morphology defeats
#: whitespace tokens), so it is included deliberately.
NO_SPACE_SCRIPT_CLASS = (
    r"\x{3400}-\x{4DBF}"   # CJK unified ideographs extension A
    r"\x{4E00}-\x{9FFF}"   # CJK unified ideographs
    r"\x{F900}-\x{FAFF}"   # CJK compatibility ideographs
    r"\x{3040}-\x{309F}"   # hiragana
    r"\x{30A0}-\x{30FF}"   # katakana
    r"\x{AC00}-\x{D7AF}"   # hangul syllables
    r"\x{0E00}-\x{0E7F}"   # Thai
    r"\x{0E80}-\x{0EFF}"   # Lao
    r"\x{1000}-\x{109F}"   # Myanmar
    r"\x{1780}-\x{17FF}"   # Khmer
)

#: full-run pattern: a token that is entirely no-space-script chars.
_NO_SPACE_RUN_PATTERN = f"^[{NO_SPACE_SCRIPT_CLASS}]+$"


def tokenize_mixed(col: Column | str, cjk_ngram: int = 2) -> Column:
    """Mixed-script tokenization: whitespace tokens for spaced scripts,
    overlapping character ``cjk_ngram``-grams for no-space-script runs
    (the standard CJK IR treatment — character bigrams approximate
    word units without a dictionary segmenter).

    Pipeline (pure built-ins, one codegen'd expression, no UDF, no
    shuffle — same 100 TB shape as ``tokenize_ws``):

    1. delimit every ``NO_SPACE_SCRIPT_CLASS`` run with spaces
       (``regexp_replace`` with a capture group),
    2. whitespace-tokenize,
    3. per token: if it is entirely a no-space-script run of length
       >= ``cjk_ngram``, expand to its overlapping character n-grams;
       shorter runs and spaced-script tokens pass through whole.

    Engine-portable by construction: DuckDB replays it as
    ``flatten(list_transform(list_filter(string_split_regex(
    regexp_replace(s, '([CLASS]+)', ' \\1 ', 'g'), '\\s+'),
    x -> x <> ''), t -> CASE WHEN regexp_matches(t, '^[CLASS]+$')
    AND length(t) >= 2 THEN list_transform(range(1, length(t)),
    i -> substring(t, i, 2)) ELSE [t] END))`` with the identical
    class body (both engines count characters, not bytes).
    """
    spaced = F.regexp_replace(
        _col(col), f"([{NO_SPACE_SCRIPT_CLASS}]+)", " $1 "
    )
    toks = tokenize_ws(spaced)
    return F.flatten(
        F.transform(
            toks,
            lambda t: F.when(
                t.rlike(_NO_SPACE_RUN_PATTERN) & (F.length(t) >= cjk_ngram),
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - (cjk_ngram - 1)),
                    lambda i: F.substring(t, i, F.lit(cjk_ngram)),
                ),
            ).otherwise(F.array(t)),
        )
    )


def _mixed_res():
    """Compiled (run, full-run) Python regexes for the no-space-script
    class — built once per process from the same ``\\x{...}`` source
    string the Spark/DuckDB expressions use."""
    global _MIXED_RES
    try:
        return _MIXED_RES
    except NameError:
        pass
    import re

    cls = re.sub(
        r"\\x\{([0-9A-Fa-f]+)\}",
        lambda m: chr(int(m.group(1), 16)),
        NO_SPACE_SCRIPT_CLASS,
    )
    _MIXED_RES = (re.compile(f"([{cls}]+)"), re.compile(f"^[{cls}]+$"))
    return _MIXED_RES


def tokenize_mixed_py(text: str, cjk_ngram: int = 2) -> "list[str]":
    """Python twin of :func:`tokenize_mixed` for Arrow kernels (the
    MinHash signature kernel tokenizes inside mapInPandas, where the
    column expression cannot reach).  MUST stay semantically identical
    to the Spark/DuckDB expression — same codepoint class, the same
    EXPLICIT ASCII whitespace class ``[ \\t\\n\\f\\r]`` (RE2's ``\\s``;
    Java's ``\\s`` additionally matches U+000B and Python's default
    ``str.split`` is fully Unicode-aware — both would diverge from the
    DuckDB oracle, so all three sides spell the class out), same
    full-run n-gram expansion.  Lowercasing is the CALLER's job (as
    with the expression form)."""
    import re

    run_re, full_re = _mixed_res()
    toks = [
        t
        for t in re.split("[ \t\n\f\r]+", run_re.sub(r" \1 ", text))
        if t
    ]
    out: "list[str]" = []
    for t in toks:
        if full_re.match(t) and len(t) >= cjk_ngram:
            out.extend(t[i : i + cjk_ngram] for i in range(len(t) - cjk_ngram + 1))
        else:
            out.append(t)
    return out


def token_count(col: Column | str) -> Column:
    """Whitespace token count (long)."""
    return F.size(tokenize_ws(col)).cast("bigint")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: splits on word/number/punct boundaries
    the way BPE pre-tokenizers do (letters runs, digit runs, single
    punct marks each count once).
    """
    toks = F.filter(
        F.split(_col(col), r"(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
        lambda t: (t != F.lit("")) & (t != F.lit(" ")),
    )
    return F.size(toks).cast("bigint")


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are punctuation."""
    c = _col(col)
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return (punct.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double"))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (English, by default) stopwords."""
    words = stopwords or _ENGLISH_STOPWORDS
    toks = tokenize_ws(F.lower(_col(col)))
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def mean_token_len(col: Column | str) -> Column:
    toks = tokenize_ws(col)
    total = F.aggregate(toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_features(col: Column | str) -> dict[str, Column]:
    """Quality-scoring feature bundle (length / punctuation / stopword
    ratios) — the standard pretraining-corpus heuristics (C4/Gopher
    style).  Returned as named columns for select(**) use.
    """
    c = _col(col)
    return {
        "n_chars": F.length(c).cast("bigint"),
        "n_tokens": token_count(c),
        "punct_ratio": punct_ratio(c),
        "stopword_ratio": stopword_ratio(c),
        "mean_token_len": mean_token_len(c),
    }


def quality_score(col: Column | str) -> Column:
    """Single [0,1] quality score combining the heuristics: rewards
    mid-length docs, some stopwords, low punctuation noise."""
    f = quality_features(col)
    len_ok = F.when((f["n_tokens"] >= 5) & (f["n_tokens"] <= 100_000), 1.0).otherwise(0.0)
    stop_ok = F.when(f["stopword_ratio"] >= 0.01, 1.0).otherwise(0.5)
    punct_ok = F.when(f["punct_ratio"] <= 0.3, 1.0).otherwise(0.3)
    tok_ok = F.when((f["mean_token_len"] >= 2.0) & (f["mean_token_len"] <= 12.0), 1.0).otherwise(0.5)
    return (len_ok * stop_ok * punct_ok * tok_ok).alias("quality_score")


def language_id(col: Column | str) -> Column:
    """Stopword-hit language ID: score each candidate language by its
    stopword hits in the doc, return the argmax ('und' when no
    stopword of any language appears).  Pure array built-ins — the
    whole classifier is one codegen'd expression, no shuffle, no UDF.
    """
    toks = tokenize_ws(F.lower(_col(col)))

    def hits(words: list[str]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    scores = F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in STOPWORDS]),
        F.array(*[hits(words) for words in STOPWORDS.values()]),
    )
    entries = F.map_entries(scores)  # array<struct<key,value>>
    best = F.array_max(F.transform(entries, lambda e: F.struct(e["value"].alias("v"), e["key"].alias("k"))))
    return F.when(best["v"] > 0, best["k"]).otherwise(F.lit("und"))


# PII patterns kept to syntax shared by Java regex (Spark) and RE2
# (DuckDB/Go scrubbers): no lookarounds, no backrefs — so the exact
# same scrub is reproducible across engines.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+\d{1,3}[ -]\d{3}[ -]\d{3,4}"


def redact_pii(col: Column | str) -> Column:
    """Scrub emails and international-format phone numbers to typed
    placeholder tokens — the pretraining-corpus PII pass (C4-style).
    Two chained ``regexp_replace`` calls: pure codegen'd JVM regex,
    no UDF, no shuffle; at 100 TB this is scan-bound, exactly as it
    should be.
    """
    c = _col(col)
    c = F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(c, PHONE_PATTERN, "<PHONE>")


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic 60-bit document fingerprint: rolling hash-chain of
    tokens — acc' = md5(acc || '|' || token) folded left-to-right from
    the md5('') seed, truncated to the first 15 hex digits as a bigint.
    Order-sensitive (unlike a bag-of-words hash) so re-ordered text
    fingerprints differently; whitespace-normalized so formatting
    doesn't.  Hash-chaining instead of polynomial multiply keeps the
    fold overflow-free under ANSI mode, and md5 (not xxhash64) makes
    the chain ENGINE-PORTABLE: DuckDB replays it exactly via
    ``list_reduce(list_prepend(md5(''), toks), (a, b) -> md5(a||'|'||b))``
    (round-11 VERDICT ask #4 — the language_id-style oracle upgrade).
    15 hex digits = 60 bits: always positive, never overflows a signed
    bigint cast on either engine.
    """
    toks = tokenize_ws(_col(col))
    chain = F.aggregate(
        toks,
        # md5('') — a fixed hex seed, so the empty-token fold is valid
        # hex for the final conv on both engines
        F.lit("d41d8cd98f00b204e9800998ecf8427e"),
        lambda acc, t: F.md5(F.concat(acc, F.lit("|"), t)),
    )
    return F.conv(F.substring(chain, 1, 15), 16, 10).cast("bigint")


def bigram_pmi(
    docs: "DataFrame",
    text_col: str,
    min_count: int = 5,
) -> "DataFrame":
    """Pointwise mutual information of adjacent token bigrams over a
    corpus: PMI(a, b) = ln(N * c(ab) / (c(a) * c(b))) with N = total
    bigram occurrences — the collocation-mining statistic (Church &
    Hanks) that ranks "new york" above "of the" where raw counts
    cannot.  ``min_count`` drops rare bigrams whose PMI estimates are
    noise (the standard correction: a 1-in-a-corpus pair maximizes
    PMI spuriously).

    Shape: the corpus is scanned ONCE — the (token, next_token) explode
    feeds a single bigram-count aggregate, and every marginal cascades
    from that vocabulary-pair-bounded table (``n_a = Σ_b c(a,b)``,
    ``n_b = Σ_a c(a,b)``, ``N = Σ c(a,b)``) instead of re-aggregating
    corpus-sized pair streams; the bigram table persists for its four
    consumers.  The marginal joins carry vocabulary-sized rows, never
    corpus-sized, and N rides a 1-row broadcast (no driver action).
    Counts are exact integers; only the final ln is float, rounded to
    6 for cross-engine replay.

    Returns (tok_a, tok_b, n_ab, pmi).
    """
    toks = docs.select(tokenize_ws(F.lower(F.col(text_col))).alias("tk"))
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("tk") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 1),
                    lambda i: F.struct(
                        F.element_at("tk", i).alias("tok_a"),
                        F.element_at("tk", i + 1).alias("tok_b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<tok_a:string,tok_b:string>>"))
        ).alias("p")
    ).select("p.tok_a", "p.tok_b")
    # persisted: vocab-pair-bounded (NOT corpus-bounded), read by the
    # total/left-marginal/right-marginal aggregates + the output filter.
    # Cache lifecycle (same contract as ordered_budget_select): the
    # returned DataFrame is lazy, so the entry cannot be unpersisted
    # here; repeated calls on the same (input, params) reuse one entry,
    # entries evict under LRU pressure, and a long-lived session
    # releases them explicitly via spark.catalog.clearCache().
    bi = (
        pairs.groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .persist()
    )
    # unigram counts IN BIGRAM POSITIONS (left + right occurrence
    # totals), the standard PMI marginals over the pair distribution —
    # derived from the bigram table, never from a corpus re-scan
    ua = bi.groupBy("tok_a").agg(F.sum("n_ab").alias("n_a"))
    ub = bi.groupBy("tok_b").agg(F.sum("n_ab").alias("n_b"))
    total = bi.agg(F.sum("n_ab").alias("__total"))
    return (
        bi.filter(F.col("n_ab") >= min_count)
        .join(ua, "tok_a")
        .join(ub, "tok_b")
        .join(F.broadcast(total))  # 1-row scalar
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            F.round(
                F.log(
                    F.col("__total").cast("double")
                    * F.col("n_ab")
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )


#: per-language script-range class bodies (the NO_SPACE_SCRIPT_CLASS
#: vocabulary, split by language): shared \x{...} syntax, so the same
#: strings drive Spark AND the DuckDB oracle.
SCRIPT_RANGES = {
    "zh": r"\x{4E00}-\x{9FFF}\x{3400}-\x{4DBF}\x{F900}-\x{FAFF}",  # Han
    "ja": r"\x{3040}-\x{309F}\x{30A0}-\x{30FF}",                   # kana
    "ko": r"\x{AC00}-\x{D7AF}",                                    # hangul
    "th": r"\x{0E00}-\x{0E7F}",                                    # Thai
}


def script_char_count(col: Column | str, ranges: str) -> Column:
    """Characters of ``col`` inside the ``\\x{...}`` class body —
    length minus length-after-strip, chars not bytes (both engines
    count codepoints)."""
    c = _col(col)
    return (
        F.length(c) - F.length(F.regexp_replace(c, f"[{ranges}]", ""))
    ).cast("bigint")


def language_id_script(col: Column | str) -> Column:
    """Script-aware language ID — closes the stopword classifier's CJK
    blindspot (no-space scripts have no whitespace-token stopwords, so
    :func:`language_id` returns 'und' for ALL CJK text):

    1. kana anywhere above 5% of chars -> 'ja' (Japanese mixes Han +
       kana, so kana presence outranks a Han majority — the standard
       heuristic);
    2. else the first of hangul/'ko', Thai/'th', Han/'zh' whose script
       covers > 30% of chars;
    3. else fall back to the stopword classifier.

    One codegen'd CASE chain over regexp strip-counts — no UDF, no
    shuffle, and the identical expression replays in DuckDB with the
    shared ``\\x{...}`` class bodies."""
    c = _col(col)
    n = F.greatest(F.length(c), F.lit(1)).cast("double")
    kana = script_char_count(c, SCRIPT_RANGES["ja"]).cast("double")
    ko = script_char_count(c, SCRIPT_RANGES["ko"]).cast("double")
    th = script_char_count(c, SCRIPT_RANGES["th"]).cast("double")
    zh = script_char_count(c, SCRIPT_RANGES["zh"]).cast("double")
    return (
        F.when(kana / n > 0.05, F.lit("ja"))
        .when(ko / n > 0.3, F.lit("ko"))
        .when(th / n > 0.3, F.lit("th"))
        .when(zh / n > 0.3, F.lit("zh"))
        .otherwise(language_id(c))
    )
