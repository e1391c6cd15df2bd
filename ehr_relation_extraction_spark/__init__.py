"""PySpark-native knowledge-graph construction engine.

A brand-new engine modeled on the dataflow semantics of
smitkiri/ehr-relation-extraction (NER -> relation extraction -> triple
emit -> entity linking -> canonicalization), re-expressed Spark-first
over Common-Crawl-style web pages (url, warc_ts, html, text, lang).

Layout
------
- ``config``      : shared deterministic parameters (gazetteer, shard
                    length, relation-rule distance, hash seeds). Single
                    source of truth for both the Spark engine and the
                    DuckDB oracle SQL generator.
- ``functions``   : pure-Python kernels (tokenize-with-offsets, greedy
                    split points, masking, portable hashing) reused by
                    the Arrow UDFs and by the driver-side oracle.
- ``sources``     : readers/writers (pages table builder, brat/CoNLL/TSV
                    fixture readers, checkpointed stage tables).
- ``operators``   : the relational stages (NER, candidate pairs, rule
                    RE, triples, linking, connected components, eval,
                    dedup, similarity).
- ``plans``       : end-to-end pipeline orchestration with stage
                    checkpoints, per-partition lineage and resume.
- ``streaming``   : Structured Streaming incremental variants.
- ``oracle``      : DuckDB ANSI-SQL generators mirroring each operator
                    (the correctness oracle) plus a pure-Python
                    per-document reference pipeline.
"""

__version__ = "0.1.0"
