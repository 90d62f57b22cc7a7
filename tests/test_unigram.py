"""Unigram-LM tokenizer training vs a single-node reference replay
(the test_bpe.py pattern), plus the pinned-artifact and encode
contracts."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest


def _reference_unigram(
    word_counts: "dict[str, int]",
    vocab_size: int = 400,
    num_iters: int = 4,
    max_piece_len: int = 4,
    seed_size: int = 1000,
    max_word_len: int = 20,
):
    """Independent single-node replay of the trainer: substring seed
    (top-N by (count DESC, piece ASC) + all chars), hard-EM with the
    packed-integer Viterbi (ties to the smallest start position),
    add-one char smoothing, one final prune."""

    def lp_units(c: int, total: int) -> int:
        return int(math.floor(math.log(c / total) * 1e6 + 0.5))

    sub: "defaultdict[str, int]" = defaultdict(int)
    for w, c in word_counts.items():
        for s in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - s) + 1):
                sub[w[s : s + l]] += c
    order = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = dict(order[:seed_size])
    for p, c in sub.items():
        if len(p) == 1:
            kept[p] = c
    total = sum(kept.values())
    lp = {p: lp_units(c, total) for p, c in kept.items()}

    def viterbi(w: str):
        n = len(w)
        dp = [None] * (n + 1)
        back = [None] * (n + 1)
        dp[0] = 63
        for k in range(1, n + 1):
            best = bj = None
            for j in range(max(0, k - max_piece_len), k):
                if dp[j] is None:
                    continue
                u = lp.get(w[j:k])
                if u is None:
                    continue
                v = dp[j] + 64 * u - 1
                if best is None or v > best:
                    best, bj = v, j
            if best is not None:
                dp[k] = best
                back[k] = bj
        if dp[n] is None:
            return None
        path = []
        k = n
        while k > 0:
            j = back[k]
            path.append(w[j:k])
            k = j
        return path[::-1]

    for it in range(num_iters):
        cnt: "defaultdict[str, int]" = defaultdict(int)
        for w, c in word_counts.items():
            path = viterbi(w) if len(w) <= max_word_len else None
            if path is None:
                path = list(w)
            for p in path:
                cnt[p] += c
        c2 = {
            p: cnt.get(p, 0) + (1 if len(p) == 1 else 0)
            for p in lp
            if cnt.get(p, 0) > 0 or len(p) == 1
        }
        if it == num_iters - 1:
            order = sorted(c2.items(), key=lambda kv: (-kv[1], kv[0]))
            keep = {p for p, _ in order[:vocab_size]}
            keep |= {p for p in c2 if len(p) == 1}
            c2 = {p: c for p, c in c2.items() if p in keep}
        tot = sum(c2.values())
        lp = {p: lp_units(c, tot) for p, c in c2.items()}
    return sorted(lp.items())


def test_unigram_train_matches_reference_on_fixture(spark, sf_dir):
    from etl_tiki_webscraping_spark.operators.bpe import build_word_vocab
    from etl_tiki_webscraping_spark.operators.unigram import unigram_train

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = build_word_vocab(docs, "text")
    counts = {r.word: r.cnt for r in vocab.collect()}
    got = unigram_train(vocab)
    want = _reference_unigram(counts)
    assert got == want and len(got) > 0
    # coverage invariant: every character of every word is a piece
    chars = {c for w in counts for c in w}
    pieces = {p for p, _ in got}
    assert chars <= pieces


def test_pinned_pieces_are_the_trainers_output(spark):
    """The deployed artifact in the catalog IS the trainer's exact
    sf0.001 output (the _BPE_PINNED_MERGES contract)."""
    from etl_tiki_webscraping_spark.operators.bpe import build_word_vocab
    from etl_tiki_webscraping_spark.operators.unigram import unigram_train
    from etl_tiki_webscraping_spark.plans.catalog import _UNIGRAM_PINNED

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = unigram_train(build_word_vocab(docs, "text"))
    assert got == _UNIGRAM_PINNED


def test_train_driver_collect_ceiling(spark):
    """local_piece_limit guards every driver-side materialization: a
    seed_size past the ceiling fails fast, and an EM iteration whose
    piece table outgrows it raises instead of OOMing the driver."""
    from etl_tiki_webscraping_spark.operators.bpe import build_word_vocab
    from etl_tiki_webscraping_spark.operators.unigram import unigram_train

    docs = spark.createDataFrame(
        [("abcd efgh abcd",), ("ijkl mnop",)], "text string"
    )
    vocab = build_word_vocab(docs, "text")
    with pytest.raises(ValueError, match="seed_size"):
        unigram_train(vocab, seed_size=100, local_piece_limit=50)
    with pytest.raises(ValueError, match="local_piece_limit"):
        unigram_train(vocab, seed_size=5, local_piece_limit=5)


def test_viterbi_packed_objective_and_ties():
    from etl_tiki_webscraping_spark.operators.unigram import (
        combined_to_ntok,
        viterbi_combined,
    )

    # 'abab': with pieces ab (cheap) and a/b (expensive), Viterbi must
    # pick [ab, ab] — higher score AND fewer tokens
    pieces = {"a": -3_000_000, "b": -3_000_000, "ab": -2_000_000}
    combined, path = viterbi_combined("abab", pieces, 4)
    assert path == ["ab", "ab"]
    assert combined_to_ntok(combined) == 2
    # equal-score tie: 'aa' via [aa] vs [a, a] with lp(aa) = 2*lp(a):
    # packed objective prefers FEWER tokens (the -1 per piece)
    pieces2 = {"a": -1_000_000, "aa": -2_000_000}
    combined2, path2 = viterbi_combined("aa", pieces2, 4)
    assert path2 == ["aa"] and combined_to_ntok(combined2) == 1
    # unreachable: char outside the table
    c3, p3 = viterbi_combined("ax", {"a": -1}, 4)
    assert c3 is None and p3 == []


def test_encode_corpus_counts_and_fallback(spark):
    from etl_tiki_webscraping_spark.operators.unigram import (
        unigram_encode_corpus,
    )

    pieces = [("a", -1_000_000), ("b", -1_500_000), ("ab", -1_200_000)]
    docs = spark.createDataFrame(
        [
            (1, "ab ab b"),            # 1 + 1 + 1 tokens
            (2, "abz a"),              # 'z' unreachable -> 3 chars; 'a' -> 1
            (3, "a" * 25),             # over max_word_len -> 25 chars
            (4, None),                 # no tokens: no row
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in unigram_encode_corpus(
            docs, "doc_id", "text", pieces
        ).collect()
    }
    assert rows[1] == (3, 3)
    assert rows[2] == (2, 4)
    assert rows[3] == (1, 25)
    assert 4 not in rows


def test_seed_candidates_top_n_plus_chars(spark):
    from etl_tiki_webscraping_spark.operators.unigram import seed_candidates

    vocab = spark.createDataFrame(
        [("aba", 10), ("cd", 1)], "word string, cnt bigint"
    )
    seeds = dict(seed_candidates(vocab, max_piece_len=2, seed_size=2))
    # substrings of 'aba' x10: a(x2), b, ab, ba; of 'cd': c, d, cd
    # top-2 by count: a=20, then ab/b/ba=10 tie -> 'ab' wins by piece ASC
    # single chars a, b, c, d always join
    assert seeds["a"] == 20 and seeds["ab"] == 10
    assert {"a", "b", "c", "d"} <= set(seeds)
    assert "cd" not in seeds and "ba" not in seeds
