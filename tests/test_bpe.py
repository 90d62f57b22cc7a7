"""BPE merge training vs a single-node reference implementation."""

from __future__ import annotations


def _reference_bpe(word_counts: dict[str, int], num_merges: int,
                   min_pair_count: int = 2):
    """Textbook BPE (Sennrich et al.): pair counts over the word
    vocab, argmax with (count DESC, left ASC, right ASC) tie-break,
    greedy left-to-right non-overlapping merge application."""
    syms = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(num_merges):
        pairs: dict[tuple, int] = {}
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + word_counts[w]
        if not pairs:
            break
        (l, r), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_pair_count:
            break
        merges.append((rank, l, r))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if out and out[-1] == l and s[i] == r:
                    out[-1] = l + r
                else:
                    out.append(s[i])
                i += 1
            # NOTE: the fold form merges against the ACCUMULATOR tail,
            # so a fresh merge output can immediately pair again; the
            # loop above replicates that exactly
            syms[w] = out
    return merges


def test_bpe_matches_reference_on_fixture(spark, sf_dir):
    from etl_tiki_webscraping_spark.operators.bpe import (
        bpe_train,
        build_word_vocab,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = build_word_vocab(docs, "text")
    counts = {r.word: r.cnt for r in vocab.collect()}
    got = bpe_train(vocab, num_merges=10)
    want = _reference_bpe(counts, 10)
    assert got == want and len(got) == 10


def test_bpe_handcrafted_ties_and_overlaps(spark):
    from etl_tiki_webscraping_spark.operators.bpe import (
        bpe_train,
        build_word_vocab,
    )

    # "aaab" x3: pair (a,a) appears twice per word but greedy
    # non-overlap counts... merges fold left-to-right; tie between
    # ('a','a') count 6 and nothing else that high
    docs = spark.createDataFrame(
        [("aaab aaab aaab",), ("ccdd ccdd",)], "text string"
    )
    vocab = build_word_vocab(docs, "text")
    counts = {r.word: r.cnt for r in vocab.collect()}
    got = bpe_train(vocab, num_merges=4)
    assert got == _reference_bpe(counts, 4)


def test_bpe_stops_when_no_pair_reaches_floor(spark):
    from etl_tiki_webscraping_spark.operators.bpe import (
        bpe_train,
        build_word_vocab,
    )

    docs = spark.createDataFrame([("ab cd ef",)], "text string")
    vocab = build_word_vocab(docs, "text")
    got = bpe_train(vocab, num_merges=5, min_pair_count=2)
    assert got == []  # every pair occurs once: below the floor
