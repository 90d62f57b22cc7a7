"""BM25 ranked text retrieval over a document corpus.

Extension surface (no reference analog — the reference stores scraped
text but cannot query it, sql/dwh.sql:31-45): keyword search is the
third leg of the training-data stack next to dedup and embedding
ANN — used for targeted corpus slicing ("all docs about X"), eval-set
mining, and retrieval baselines.  Spark-first shape:

- posting-list build: tokenize with one codegen'd regexp split,
  ``explode`` → ``groupBy(doc, term)`` — a single shuffle keyed on the
  term, exactly how a distributed inverted index partitions.  Corpus
  statistics (N, avgdl) reduce to ONE row and ride a broadcast.
- scoring: the query term set is tiny and broadcasts onto the postings
  (map-side hash join); each (query, doc, term) contribution is a pure
  JVM expression; per-term contributions are cast to DECIMAL(18, 8)
  before the sum so the score is accumulation-order-independent —
  rank ties then resolve identically on any cluster size.
- top-k: ``row_number`` window per query over the ROUNDED score with a
  doc-id tie-break (total order ⇒ deterministic result set).

At 100 TB the postings build is scan + one shuffle; only terms that
appear in some query survive the broadcast join, so the scored
intermediate is |query terms| × postings, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(col) -> "F.Column":
    """Lowercased alnum tokens; the same split the DuckDB oracle runs
    (``regexp_split_to_array(lower(text), '[^a-z0-9]+')``)."""
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT), lambda t: t != F.lit(""))


def tokenize_cjk(col) -> "F.Column":
    """Mixed-script index tokenization (r12 VERDICT ask #5): everything
    that is neither lowercase-alnum nor a no-space-script character
    becomes a separator, then no-space-script runs (CJK ideographs,
    kana, hangul, Thai/Lao/...) expand to overlapping character
    bigrams via ``functions.text.tokenize_mixed`` — the standard CJK
    IR treatment.  Without it a CJK sentence is ONE term: its postings
    never match a query term and BM25 is blind to the document.  Pure
    built-ins (one codegen'd expression); the identical chain replays
    in DuckDB with the shared ``\\x{...}`` class body."""
    from etl_tiki_webscraping_spark.functions.text import (
        NO_SPACE_SCRIPT_CLASS,
        tokenize_mixed,
    )

    cleaned = F.regexp_replace(
        F.lower(col), f"[^a-z0-9{NO_SPACE_SCRIPT_CLASS}]+", " "
    )
    return tokenize_mixed(cleaned)


def build_index(
    docs: DataFrame,
    *,
    doc_id: str = "doc_id",
    text: str = "text",
    segment_cjk: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Inverted index of a corpus (or corpus BATCH): returns
    ``(postings, doclens)`` where postings = (doc_id, dl, term, tf) and
    doclens = (doc_id, dl) — doclens keeps zero-token docs visible to
    the corpus stats, which postings alone would lose.

    The index of a corpus is the UNION of its batches' indexes (new
    docs have disjoint ids), so index maintenance under ingest is an
    append of the new batch's partitions — no rebuild; see
    :func:`merge_index`.
    """
    tok_fn = tokenize_cjk if segment_cjk else tokenize
    toks = docs.select(
        F.col(doc_id).alias("doc_id"), tok_fn(F.col(text)).alias("toks")
    ).withColumn("dl", F.size("toks"))
    doclens = toks.select("doc_id", "dl")
    postings = (
        toks.select("doc_id", "dl", F.explode("toks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return postings, doclens


def merge_index(
    a: tuple[DataFrame, DataFrame], b: tuple[DataFrame, DataFrame]
) -> tuple[DataFrame, DataFrame]:
    """Merge the indexes of two DISJOINT document batches: postings and
    doclens simply append (a new crawl batch never rewrites existing
    docs' rows).  Corpus-level statistics (df_t, N, avgdl) are
    aggregates over the merged index and stay correct automatically —
    or can be maintained additively via ``rollup.merge_additive`` when
    even the term-level aggregation pass is too much."""
    return a[0].unionByName(b[0]), a[1].unionByName(b[1])


def bm25_from_index(
    postings: DataFrame,
    doclens: DataFrame,
    queries: DataFrame,
    *,
    query_id: str = "query_id",
    term: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Top-``top_k`` docs per query scored from a prebuilt index —
    see :func:`bm25_topk` for the scoring contract."""
    # corpus stats: one row, broadcast onto every posting
    stats = doclens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(term).alias("term")
    ).distinct()
    # queries are tiny: broadcast-semi-filter the postings FIRST so only
    # searched terms' rows survive — the broadcast filter pushes below
    # the tf groupBy (grouping keys include the term), so the postings
    # exchange itself shrinks to searched-term tokens.  df_t then counts
    # over the filtered slice (identical values: postings are unique per
    # (doc, term)), which deletes the r16 full-VOCABULARY groupBy that
    # aggregated every term to keep a handful (guide §2.3).  Persisted:
    # the slice feeds BOTH the df_t count and the scoring join — without
    # the pin each leg re-runs the corpus tokenize+explode+groupBy
    # (bounded by |query terms| x docs, never corpus size; released via
    # LRU / spark.catalog.clearCache()).
    p_searched = postings.join(
        F.broadcast(q.select("term").distinct()), on="term", how="left_semi"
    ).persist()
    dft_searched = p_searched.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    scored_terms = (
        p_searched.join(F.broadcast(q), on="term")
        .join(F.broadcast(dft_searched), on="term")
        .join(F.broadcast(stats))
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dft") + F.lit(0.5)) / (F.col("dft") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    # order-independent accumulation: per-term contribution rounds to a
    # fixed decimal before the sum, so ranking is engine/cluster-stable
    contrib = (idf * tf_part).cast("decimal(18,8)")

    doc_scores = (
        scored_terms.groupBy("query_id", "doc_id")
        .agg(F.sum(contrib).alias("score_dec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_dec").desc(), F.col("doc_id").asc()
    )
    return (
        doc_scores.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "query_id",
            "doc_id",
            "rank",
            F.col("score_dec").cast("double").alias("score"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    doc_id: str = "doc_id",
    text: str = "text",
    query_id: str = "query_id",
    term: str = "term",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    segment_cjk: bool = False,
) -> DataFrame:
    """Top-``top_k`` documents per query under BM25.

    ``queries`` is a (query_id, term) DataFrame — one row per query
    term, already tokenized the same way as the corpus.  IDF uses the
    BM25+ form ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (never
    negative).  Returns (query_id, doc_id, rank, score).  Composition
    of :func:`build_index` + :func:`bm25_from_index`; keep the index
    halves separate when the corpus is ingested in batches
    (:func:`merge_index`).  ``segment_cjk=True`` indexes mixed-script
    corpora through :func:`tokenize_cjk` (character bigrams for
    no-space scripts — query terms must then be bigrams too).
    """
    postings, doclens = build_index(
        docs, doc_id=doc_id, text=text, segment_cjk=segment_cjk
    )
    return bm25_from_index(
        postings, doclens, queries,
        query_id=query_id, term=term, k1=k1, b=b, top_k=top_k,
    )
