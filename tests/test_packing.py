"""Sequence-packing invariants (GPT-style fixed-length training
sequences): the driver contract exact-checks values; these pin the
structural properties packing must satisfy."""

from __future__ import annotations

from pyspark.sql import functions as F

from ehr_relation_extraction_spark.functions.textstats import pack_sequences

L = 16


def _docs(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(n)), "en", src, 0)
            for i, (n, src) in enumerate([
                (5, "a"), (20, "a"), (16, "a"), (0, "a"), (3, "a"),
                (40, "b"), (1, "b")])]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")


def test_every_nonfinal_sequence_is_full(spark):
    out = pack_sequences(_docs(spark), L)
    s = out.groupBy("source", "seq_id").agg(F.sum("n_tokens").alias("t"))
    mx = s.groupBy("source").agg(F.max("seq_id").alias("m"))
    assert s.join(mx, "source").where(
        (F.col("seq_id") < F.col("m")) & (F.col("t") != L)).count() == 0


def test_token_conservation_and_doc_splits(spark):
    out = pack_sequences(_docs(spark), L)
    # every token of every non-empty doc lands in exactly one sequence
    per_doc = {r["doc_id"]: r["t"] for r in
               out.groupBy("doc_id").agg(F.sum("n_tokens").alias("t")).collect()}
    assert per_doc == {0: 5, 1: 20, 2: 16, 4: 3, 5: 40, 6: 1}  # doc 3 empty
    # doc 1 (20 tokens starting at offset 5) spans sequences 0 and 1
    rows = sorted((r["seq_id"], r["doc_tok_start"], r["doc_tok_end"],
                   r["seq_tok_start"], r["seq_tok_end"])
                  for r in out.where("doc_id = 1").collect())
    assert rows == [(0, 0, 11, 5, 16), (1, 11, 20, 0, 9)]


def _pack_reference(n_toks: list[int], L: int) -> list[tuple]:
    """Pure-Python packing reference: walk the concatenated stream."""
    out, start = [], 0
    for doc_id, n in enumerate(n_toks):
        if n == 0:
            continue
        end = start + n
        s = start
        while s < end:
            seq = s // L
            e = min(end, (seq + 1) * L)
            out.append((seq, doc_id, s - start, e - start,
                        s - seq * L, e - seq * L, e - s))
            s = e
        start = end
    return sorted(out)


def test_packing_matches_reference_on_random_corpora(spark):
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(st.lists(st.integers(0, 40), min_size=1, max_size=12),
           st.integers(4, 24))
    def check(n_toks, L):
        rows = [(i, " ".join(f"w{j}" for j in range(n)), "en", "s", 0)
                for i, n in enumerate(n_toks)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, "
                  "source string, n_chars long")
        got = sorted((r["seq_id"], r["doc_id"], r["doc_tok_start"],
                      r["doc_tok_end"], r["seq_tok_start"],
                      r["seq_tok_end"], r["n_tokens"])
                     for r in pack_sequences(docs, L).collect())
        assert got == _pack_reference(n_toks, L)

    check()


def test_coordinates_are_consistent(spark):
    out = pack_sequences(_docs(spark), L)
    assert out.where(
        "doc_tok_end - doc_tok_start <> n_tokens"
        " OR seq_tok_end - seq_tok_start <> n_tokens"
        " OR seq_tok_start < 0 OR seq_tok_end > 16"
        " OR n_tokens <= 0").count() == 0


def test_two_level_cumsum_is_shard_invariant_and_parallel(spark):
    """The two-level cumsum must (a) produce bit-identical output for
    any shard size — shards are contiguous doc_id blocks, so (shard,
    doc_id) order IS doc_id order — and (b) spread a SINGLE-source
    corpus across >1 level-1 window partition (the scale fix: one
    dominant source must not serialize the pack)."""
    rows = [(i, " ".join(f"w{j}" for j in range(1 + i % 7)), "en", "crawl", 0)
            for i in range(200)]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long")
    key = ["source", "seq_id", "doc_id", "doc_tok_start", "doc_tok_end",
           "seq_tok_start", "seq_tok_end", "n_tokens"]
    big = {tuple(r[k] for k in key)
           for r in pack_sequences(docs, L, shard_docs=10**9).collect()}
    sharded = {tuple(r[k] for k in key)
               for r in pack_sequences(docs, L, shard_docs=16).collect()}
    assert big == sharded
    # level-1 parallelism: distinct (source, shard) groups > 1
    from pyspark.sql import functions as F2
    n_shards = (docs.select(
        F2.floor(F2.col("doc_id") / 16).alias("s")).distinct().count())
    assert n_shards > 1
