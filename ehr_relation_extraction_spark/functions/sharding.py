"""Rendezvous (highest-random-weight) sharding — deterministic,
coordination-free key→shard assignment and the rebalance planner.

HRW hashing (Thaler & Ravishankar, ToN'98): key k lands on
``argmax_s md5("hrw:<s>:<k>")``.  The property that matters at
100 TB: growing the fleet from N to N+1 shards moves ONLY the keys
whose new argmax is the new shard — an expected 1/(N+1) of the
corpus — and every mover's destination IS the new shard (no
peer-to-peer reshuffling).  That is the planning table for enlarging
a bucketed store or an executor fleet without a full re-shuffle.

Everything is per-row JVM expressions (md5 + the 15-nibble integer
device shared with the KMV/HLL family) — assignment itself needs ZERO
shuffle, and the rebalance diff is one grouped aggregate on the
(old, new) pair.  The DuckDB oracle replays the same Horner nibble
arithmetic byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HRW_TAG = "hrw"


def _hrw_score(key_col: str, shard: int, tag: str = HRW_TAG):
    """60-bit integer score of (shard, key): the first 15 md5 hex
    nibbles of ``<tag>:<shard>:<key>`` — exact BIGINT on both
    engines."""
    return F.expr(
        f"CAST(conv(substring(md5(concat('{tag}:{shard}:', "
        f"CAST({key_col} AS STRING))), 1, 15), 16, 10) AS BIGINT)")


def rendezvous_shard(items: DataFrame, key_col: str, n_shards: int,
                     out_col: str = "shard",
                     tag: str = HRW_TAG) -> DataFrame:
    """Append ``out_col``: the HRW shard (0..n_shards-1) of
    ``key_col``.  argmax over the per-shard scores via a GREATEST of
    (score, shard) structs — one projection, no shuffle, no UDF.
    Hash ties (never observed; distinct preimages) break to the
    larger shard id by the struct comparison."""
    cand = [F.struct(_hrw_score(key_col, s, tag).alias("h"),
                     F.lit(s).alias("s")) for s in range(n_shards)]
    pick = cand[0] if n_shards == 1 else F.greatest(*cand)
    return items.withColumn(out_col, pick["s"].cast("int"))


def shard_rebalance(items: DataFrame, key_col: str,
                    n_old: int, n_new: int,
                    tag: str = HRW_TAG) -> DataFrame:
    """The rebalance planning table for growing (or shrinking) an
    HRW-sharded store from ``n_old`` to ``n_new`` shards: per
    (shard_old, shard_new) cell, how many DISTINCT keys sit there and
    whether the cell is a move.  HRW's minimal-disruption contract —
    when n_new = n_old + 1, every mover's shard_new is the added
    shard and the expected mover share is 1/n_new — is what the
    audit columns (and the pytest) pin.

    Output: (shard_old, shard_new, n_keys, moved) sorted nowhere —
    one distinct + one grouped aggregate over the key universe."""
    keys = (items.where(F.col(key_col).isNotNull())
            .select(F.col(key_col).alias("_k")).dropDuplicates())
    both = rendezvous_shard(
        rendezvous_shard(keys, "_k", n_old, "shard_old", tag),
        "_k", n_new, "shard_new", tag)
    return (both.groupBy("shard_old", "shard_new")
            .agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
            .withColumn("moved",
                        (F.col("shard_old") != F.col("shard_new"))
                        .cast("int")))
