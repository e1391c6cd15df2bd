"""Cross-engine parity + serial ground truth for continuation
batch 108 (functions/textstats.rake_keywords)."""

from __future__ import annotations

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

    ok, msg = compare(QUERIES["rake_keywords"](spark, SF),
                      con.sql(ORACLE["rake_keywords"]).df())
    assert ok, msg


def _serial_rake(rows, stopwords, k):
    """Serial reference: classic RAKE over whitespace tokens with the
    STOPWORDS tuple as the delimiter vocabulary."""
    occurrences = []          # list of word tuples, one per phrase occ
    for _doc, text in rows:
        run = []
        for tok in text.split():
            w = tok.lower()
            if w in stopwords:
                if run:
                    occurrences.append(tuple(run))
                    run = []
            else:
                run.append(w)
        if run:
            occurrences.append(tuple(run))
    freq, deg = {}, {}
    for occ in occurrences:
        for w in occ:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(occ)
    wscore = {w: (1000 * deg[w]) // freq[w] for w in freq}
    agg = {}
    for occ in occurrences:
        phrase = " ".join(occ)
        score = sum(wscore[w] for w in occ)
        n, cnt, _ = agg.get(phrase, (len(occ), 0, score))
        agg[phrase] = (n, cnt + 1, score)
    ranked = sorted(agg.items(),
                    key=lambda kv: (-kv[1][2], -kv[1][1], kv[0]))[:k]
    return [(i + 1, p, n, c, s)
            for i, (p, (n, c, s)) in enumerate(ranked)]


def test_matches_serial_rake(spark):
    """Hand-built corpus with multi-word phrases, repeated phrases,
    stopword runs, consecutive separators, and mixed case — the Spark
    result must equal a serial RAKE implementation row for row."""
    from ehr_relation_extraction_spark.config import STOPWORDS
    from ehr_relation_extraction_spark.functions.textstats import (
        rake_keywords)

    rows = [
        (0, "deep learning of the neural network and deep learning"),
        (1, "the Neural  Network\ttrains a deep learning model"),
        (2, "graph to graph matching in a sparse graph"),
        (3, "of and the to in a"),            # all-stopword doc
        (4, "deep learning"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [(r.rank, r.phrase, r.n_words, r.occurrences, r.score_x1000)
           for r in rake_keywords(df, k=10).orderBy("rank").collect()]
    want = _serial_rake(rows, set(STOPWORDS), 10)
    assert got == want
    # multi-word phrases must outrank their singleton constituents
    # (the RAKE property the deg/freq ratio exists to produce)
    by_phrase = {p: s for _, p, _, _, s in got}
    assert by_phrase["deep learning"] > by_phrase.get("graph", 0)
