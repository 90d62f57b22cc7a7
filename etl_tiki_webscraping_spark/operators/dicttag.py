"""Dictionary tagging: multi-pattern substring search over a corpus
(Aho-Corasick), the workhorse behind blocklist filtering, topic
tagging, PII keyword screens, and contamination probes in an LLM data
pipeline — one scan of each document finds ALL occurrences of EVERY
dictionary term at once.

The reference filters rows by literal membership only
(dags/etl.py:96-ish ``isin`` projections); this is the text-scale
generalisation mandated by BASELINE.json.

Scale shape: the dictionary is small (thousands of terms) and ships to
every task — a closure for the list-argument form, or pass an already
``spark.sparkContext.broadcast(...)`` handle for dictionaries big
enough that per-task pickling would hurt.  The automaton builds ONCE
per task (not per row, not per batch) and each document is scanned in
a single O(len + matches) pass inside an Arrow-batched mapInPandas
kernel.  Nothing but ``(id, term, count)`` rows cross an exchange;
documents never shuffle.  At 100 TB this is a pure map-side operator
followed by whatever aggregation the caller composes.

Match semantics: EVERY occurrence at every start position counts —
overlapping matches included (``"batch batch batch"`` contains
``"batch batch"`` at two positions), and occurrences of one term
inside another both count.  That is exactly what the classic
Aho-Corasick output function yields, and it is SQL-replayable by
position enumeration (the catalog oracle enumerates every start
offset with substr equality), which keeps the operator on a full
DuckDB oracle rather than rows-only.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def build_aho_corasick(terms: "list[str]") -> "tuple[list[dict], list[int], list[list[int]]]":
    """Build the goto/fail/output automaton for ``terms``.

    Returns ``(goto, fail, out)`` where ``goto[state]`` maps a
    character to the next state, ``fail[state]`` is the longest proper
    suffix state, and ``out[state]`` lists the indices of terms ending
    at this state (own outputs plus the fail chain's, precomputed so
    the scan never walks fail links for output).
    """
    goto: "list[dict]" = [{}]
    out: "list[list[int]]" = [[]]
    for ti, term in enumerate(terms):
        state = 0
        for ch in term:
            nxt = goto[state].get(ch)
            if nxt is None:
                goto.append({})
                out.append([])
                nxt = len(goto) - 1
                goto[state][ch] = nxt
            state = nxt
        out[state].append(ti)
    fail = [0] * len(goto)
    q: "deque[int]" = deque()
    for s in goto[0].values():
        q.append(s)
    while q:
        state = q.popleft()
        for ch, nxt in goto[state].items():
            q.append(nxt)
            f = fail[state]
            while f and ch not in goto[f]:
                f = fail[f]
            fail[nxt] = goto[f].get(ch, 0)
            out[nxt] = out[nxt] + out[fail[nxt]]
    return goto, fail, out


def _scan(text: str, goto: "list[dict]", fail: "list[int]", out: "list[list[int]]", counts: "list[int]") -> None:
    state = 0
    for ch in text:
        while state and ch not in goto[state]:
            state = fail[state]
        state = goto[state].get(ch, 0)
        for ti in out[state]:
            counts[ti] += 1


TAGGED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("n_matches", T.LongType(), False),
    ]
)


def tag_terms(
    df: DataFrame,
    terms: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """One row per ``(document, dictionary term)`` with the number of
    (overlapping) occurrences; documents/terms with zero matches emit
    nothing.  ``lowercase`` folds BOTH the text and the terms, the
    usual blocklist convention.

    Output schema: ``id: bigint, term: string, n_matches: bigint``.
    """
    dict_terms = [t.lower() for t in terms] if lowercase else list(terms)
    originals = list(terms)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        goto, fail, out = build_aho_corasick(dict_terms)
        for batch in batches:
            ids: "list[int]" = []
            term_col: "list[str]" = []
            n_col: "list[int]" = []
            for did, text in zip(batch[id_col], batch[text_col]):
                if text is None:
                    continue
                t = text.lower() if lowercase else text
                counts = [0] * len(dict_terms)
                _scan(t, goto, fail, out, counts)
                for ti, c in enumerate(counts):
                    if c:
                        ids.append(int(did))
                        term_col.append(originals[ti])
                        n_col.append(c)
            yield pd.DataFrame({"id": ids, "term": term_col, "n_matches": n_col})

    return df.select(id_col, text_col).mapInPandas(run, schema=TAGGED_SCHEMA)


def blocklist_filter(
    df: DataFrame,
    blocked_terms: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hits: int = 0,
) -> DataFrame:
    """Drop documents whose total blocked-term occurrences exceed
    ``max_hits`` (default 0: any hit drops).  The tag scan emits bare
    ``(id, count)`` rows; the survivors re-join by id (left_anti on
    the offender set), so full documents never shuffle."""
    hits = (
        tag_terms(df, blocked_terms, text_col, id_col)
        .groupBy("id")
        .agg(F.sum("n_matches").alias("total"))
        .filter(F.col("total") > max_hits)
        .select(F.col("id").alias(id_col))
    )
    return df.join(hits, on=id_col, how="left_anti")
