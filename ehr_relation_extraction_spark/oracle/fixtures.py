"""Deterministic synthetic web-page fixtures (FIXTURES.md §1).

Pure function of (seed, n_pages): Zipfian host skew (host 0 gets ~half
the pages), multi-paragraph text with sentence-end newlines (exercises
all three split branches of ehr.py:353-432), planted gazetteer aliases
+ Quantity patterns, a few non-'en' rows, plus the FIXTURES.md edge
docs: an empty doc, a punctuation-only doc, and a one-paragraph doc
longer than max_len (hard-cut branch).
"""

from __future__ import annotations

import random

from ..config import GAZETTEER

FILLER = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
          "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron")
HOSTS = ("big-host.example.com",) + tuple(
    f"host{i}.example.org" for i in range(1, 8))
LANGS = ("en", "en", "en", "en", "de", "fr")


def _sentence(rng: random.Random) -> str:
    words = []
    n = rng.randint(4, 10)
    for _ in range(n):
        r = rng.random()
        if r < 0.30:
            words.append(rng.choice(GAZETTEER)[0])  # may be a bigram alias
        elif r < 0.34:
            words.append(f"{rng.randint(1, 99)} {rng.choice(['kg', 'km', 'usd'])}")
        elif r < 0.36:
            w = rng.choice([g[0] for g in GAZETTEER if " " not in g[0]])
            words.append(f"{w} {w}")  # adjacent same-type run (quirk case)
        else:
            words.append(rng.choice(FILLER))
    return " ".join(words) + " ."


def _paragraph(rng: random.Random) -> str:
    return "\n".join(_sentence(rng) for _ in range(rng.randint(1, 4)))


def make_pages(seed: int = 42, n_pages: int = 120) -> list[dict]:
    """Returns dicts: url, warc_ts_epoch, text, lang, html (bytes)."""
    rng = random.Random(seed)
    pages = []
    for i in range(n_pages):
        host = HOSTS[0] if rng.random() < 0.5 else rng.choice(HOSTS[1:])
        if i == 0:
            text = ""
        elif i == 1:
            text = ".. -- ;; !!"
        elif i == 2:
            # one huge paragraph, no sentence markers -> hard cuts
            text = " ".join(rng.choice(FILLER + ("spark", "value"))
                            for _ in range(120))
        else:
            text = "\n\n".join(_paragraph(rng)
                               for _ in range(rng.randint(1, 5)))
        pages.append({
            "doc_id": i,
            "url": f"https://{host}/p/{i}",
            "warc_ts_epoch": 1704067200 + i,
            "text": text,
            "lang": rng.choice(LANGS),
        })
    return pages


def pages_df(spark, seed: int = 42, n_pages: int = 120):
    from ..sources.pages import HTML_PREFIX, HTML_SUFFIX

    rows = [
        (p["doc_id"], p["url"], p["warc_ts_epoch"],
         (HTML_PREFIX + p["text"] + HTML_SUFFIX).encode("utf-8"), p["lang"])
        for p in make_pages(seed, n_pages)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, epoch long, html binary, lang string")
    from pyspark.sql import functions as F

    return df.select("doc_id", "url",
                     F.timestamp_seconds("epoch").alias("warc_ts"),
                     "html", "lang")
