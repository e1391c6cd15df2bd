"""Text analysis columns: token counts, quality features, language-id,
document fingerprints.  All built-in JVM expressions (codegen) —
integer outputs for cross-engine stability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import STOPWORDS


def _toks():
    return F.filter(F.split(F.col("text"), "[\n \t]"), lambda t: t != "")


def quality_features(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, n_distinct_tokens, n_stopwords,
    avg_token_len_x100): the classic length/stopword/diversity quality
    signals as integers."""
    toks = _toks()
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size(toks)
    sum_len = F.aggregate(F.transform(toks, lambda t: F.length(t)),
                          F.lit(0), lambda a, b: a + b)
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, F.lower(t))))
            .cast("long").alias("n_stopwords"),
        F.when(n > 0, F.floor(F.lit(100) * sum_len / n)).otherwise(F.lit(0))
            .cast("long").alias("avg_token_len_x100"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language id: predict 'en' when stopword density is
    high (n-gram/stopword-profile heuristic in its simplest integer
    form): 20 * n_stopwords >= n_tokens -> 'en' else 'unk'.
    Output: (doc_id, lang, pred_lang, is_match)."""
    q = quality_features(docs).select("doc_id", "n_tokens", "n_stopwords")
    out = docs.select("doc_id", "lang").join(q, "doc_id")
    pred = F.when(F.lit(20) * F.col("n_stopwords") >= F.col("n_tokens"),
                  F.lit("en")).otherwise(F.lit("unk"))
    return (out.withColumn("pred_lang", pred)
            .withColumn("is_match", (F.col("pred_lang") == F.col("lang")).cast("int"))
            .select("doc_id", "lang", "pred_lang", "is_match"))


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_ish): whitespace tokens vs a
    BPE-ish sub-token count (alnum runs + single non-alnum marks) —
    the standard cheap token estimator.  Expressed via
    ``regexp_extract_all`` run-counting (portable: RE2 oracles have no
    lookaround)."""
    toks = _toks()
    runs = F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9A-Za-z]+"), 0))
    marks = F.size(F.regexp_extract_all(F.col("text"), F.lit("[^0-9A-Za-z \n\t]"), 0))
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_ws_tokens"),
        (runs + marks).cast("long").alias("n_bpe_ish"),
    )


def top_terms_tfidf(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-doc top-k terms by tf-idf:
    (doc_id, rank, term, tf, df, tfidf_micro6).

    tf = in-doc count, df = docs containing the term, idf = ln(N/df).
    Two aggregates + a broadcast-sized term-df join; ranking uses the
    floor-scaled score with the term as tie-break so ordering is
    deterministic cross-engine."""
    toks = docs.select("doc_id", F.explode(_toks()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"))
    df_ = (toks.dropDuplicates(["doc_id", "term"])
           .groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df")))
    n_docs = docs.select(F.countDistinct("doc_id").alias("n")).first()["n"]
    scored = tf.join(df_, "term").withColumn(
        "tfidf_micro6",
        F.floor(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
                * 1000000).cast("long"))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_micro6").desc(), F.col("term"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= k)
            .select("doc_id", "rank", "term", "tf", "df", "tfidf_micro6"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint, n_shingles): rolling-hash doc fingerprint =
    min md5 over token 3-gram shingles (minhash with one permutation),
    plus the distinct shingle count."""
    from ..operators.dedup import shingles

    sh = shingles(docs, 3)
    return (sh.groupBy("doc_id")
            .agg(F.min(F.md5("shingle")).alias("fingerprint"),
                 F.count(F.lit(1)).cast("long").alias("n_shingles")))
