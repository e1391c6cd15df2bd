"""Cross-engine parity + serial ground truth for continuation
batches 105 (functions/textstats.bpe_merges) and 106
(functions/textstats.bpe_compression)."""

from __future__ import annotations

import collections

import pytest

from compare_util import compare, duck_con

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF)
    yield c
    c.close()


def test_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["bpe_merges"](spark, SF),
                      con.sql(ORACLE["bpe_merges"]).df())
    assert ok, msg


def _serial_bpe(word_counts, n_merges):
    """Reference BPE trainer over the SAME paren-delimited strings the
    operator carries, so Python's str.replace supplies the identical
    leftmost non-overlapping merge semantics."""
    words = [("".join(f"({c})" for c in w) + "(</w>)", n)
             for w, n in word_counts.items()]
    out = []
    for rank in range(1, n_merges + 1):
        pairs = collections.Counter()
        for s, n in words:
            syms = s[1:-1].split(")(")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(),
                   key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (lhs, rhs), c = best
        merged = lhs + rhs
        out.append((rank, lhs, rhs, c, merged))
        pat, rep = f"({lhs})({rhs})", f"({merged})"
        words = [(s.replace(pat, rep), n) for s, n in words]
    return out


def test_matches_serial_replica(spark):
    """Planted corpus exercising frequency ties (broken lhs asc, rhs
    asc) and multi-round cascades (l+o, lo+w merging into 'low')."""
    from ehr_relation_extraction_spark.functions.textstats import (
        bpe_merges)

    corpus = ["low low low low low lower lower newest newest",
              "newest newest newest newest widest widest widest",
              "low lower widest newest"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)],
        "doc_id long, text string")
    got = [(r.merge_rank, r.lhs, r.rhs, r.pair_count, r.new_symbol)
           for r in bpe_merges(df, n_merges=8)
           .orderBy("merge_rank").collect()]

    wc = collections.Counter(
        tok for t in corpus for tok in t.split(" ") if tok)
    assert got == _serial_bpe(wc, 8)


def test_overlap_is_leftmost_nonoverlapping(spark):
    """The planted aaaa word: (a)(a)(a)(a)(</w>) counts pair (a,a)
    three times, but the merge must fuse leftmost non-overlapping ->
    (aa)(aa)(</w>), NOT (aa)(a)(a)... — the convention every BPE
    trainer and both engines' replace() share."""
    from ehr_relation_extraction_spark.functions.textstats import (
        bpe_merges)

    df = spark.createDataFrame([(0, "aaaa aaaa")],
                               "doc_id long, text string")
    got = [(r.merge_rank, r.lhs, r.rhs, r.pair_count, r.new_symbol)
           for r in bpe_merges(df, n_merges=3)
           .orderBy("merge_rank").collect()]
    # round 1: (a,a) seen 3x per word, 2 words -> 6
    assert got[0] == (1, "a", "a", 6, "aa")
    # round 2 sees (aa)(aa)(</w>): pair (aa,aa) count 2 beats
    # (aa,</w>) count 2 on lhs/rhs tie-break? both count 2 ->
    # tie broken by lhs asc then rhs asc: ('aa','</w>') < ('aa','aa')
    # because '<' (0x3c) sorts before 'a' (0x61)
    assert got[1] == (2, "aa", "</w>", 2, "aa</w>")
    # round 3 sees (aa)(aa</w>): the only pair left
    assert got[2] == (3, "aa", "aa</w>", 2, "aaaa</w>")
    assert got == _serial_bpe({"aaaa": 2}, 3)


def test_compression_oracle_parity(spark, con):
    from ehr_relation_extraction_spark.driver_queries import QUERIES
    from ehr_relation_extraction_spark.oracle.sqlgen import ORACLE

    ok, msg = compare(QUERIES["bpe_compression"](spark, SF),
                      con.sql(ORACLE["bpe_compression"]).df())
    assert ok, msg


def _serial_compression(word_counts, n_merges):
    """Replay _serial_bpe's rounds, snapshotting (corpus_symbols,
    vocab_symbols) after each merge — rank 0 is the char baseline."""
    words = [("".join(f"({c})" for c in w) + "(</w>)", n)
             for w, n in word_counts.items()]

    def _stat(rank):
        syms_of = [(s[1:-1].split(")("), n) for s, n in words]
        corpus = sum(len(sy) * n for sy, n in syms_of)
        vocab = len({x for sy, _ in syms_of for x in sy})
        return (rank, corpus, vocab)

    out = [_stat(0)]
    for rank, (lhs, rhs, merged) in enumerate(
            [(m[1], m[2], m[4]) for m in
             _serial_bpe(word_counts, n_merges)], start=1):
        pat, rep = f"({lhs})({rhs})", f"({merged})"
        words = [(s.replace(pat, rep), n) for s, n in words]
        out.append(_stat(rank))
    return out


def test_compression_matches_serial_replica(spark):
    """The curve must be monotone non-increasing in corpus_symbols
    (each merge can only fuse), and every value must equal the serial
    replay of the learned rules."""
    from ehr_relation_extraction_spark.functions.textstats import (
        bpe_compression)

    corpus = ["low low low low low lower lower newest newest",
              "newest newest newest newest widest widest widest",
              "low lower widest newest"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)],
        "doc_id long, text string")
    got = [(r.merge_rank, r.corpus_symbols, r.vocab_symbols)
           for r in bpe_compression(df, n_merges=6)
           .orderBy("merge_rank").collect()]
    wc = collections.Counter(
        tok for t in corpus for tok in t.split(" ") if tok)
    assert got == _serial_compression(wc, 6)
    corpus_curve = [g[1] for g in got]
    assert corpus_curve == sorted(corpus_curve, reverse=True)
    # each merge fuses at least one occurrence -> strictly decreasing
    assert len(set(corpus_curve)) == len(corpus_curve)


def test_exhausts_when_no_pairs_remain(spark):
    from ehr_relation_extraction_spark.functions.textstats import (
        bpe_merges)

    df = spark.createDataFrame([(0, "a b")],
                               "doc_id long, text string")
    out = bpe_merges(df, n_merges=10).collect()
    # 'a</w>' and 'b</w>' fuse in 2 merges; after that every word is
    # a single symbol and training stops early
    assert len(out) == 2
