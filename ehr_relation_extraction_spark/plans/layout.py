"""Multi-dimensional data-layout planning: Z-order (Morton) file
assignment vs single-dimension linear sort, with an exact min/max
file-skipping audit.

The 100 TB question this answers at WRITE time: when two independent
dimensions are both query predicates (crawl-cycle slot and host
bucket here), a linear layout prunes perfectly on its leading
dimension and not at all on the other, while Z-order interleaving
gives BOTH dimensions ~sqrt(n_files) pruning from the same min/max
footer stats readers already collect.  Everything below is exact
integer arithmetic — file ids are pure map-side expressions (no
global sort, no window), so the audit itself shuffles only the
per-file stat rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BITS = 8            # 8 bits per dimension -> 16-bit z keys
ZSPAN = 1 << (2 * BITS)
LSPAN = 1 << (2 * BITS)


def interleave_expr(d: str, b: str, bits: int = BITS) -> str:
    """Morton interleave as a plain SQL expression — identical text
    runs in Spark SQL and DuckDB (both floor `>>`/`&`/`<<` on
    non-negative ints), which is how the oracle stays byte-equal.
    Bit i of ``d`` lands at position 2i, bit i of ``b`` at 2i+1;
    the terms never overlap so ``+`` is bitwise OR."""
    terms = []
    for i in range(bits):
        terms.append(f"((({d} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def layout_files(docs: DataFrame, n_files: int = 16,
                 bits: int = BITS) -> DataFrame:
    """Assign every doc to a file under BOTH layouts and roll up
    per-(layout, file) min/max stats — the parquet footer stats a
    reader prunes with.

    Dimensions: d = doc_id % 256 (crawl-cycle slot), b = the first
    two md5 nibbles of the host (host bucket 0..255).  Layouts:
    ``zorder`` files split the interleaved key range evenly,
    ``linear`` files split the d-major concatenated key range.

    Output: (layout, file_id, n_rows, min_d, max_d, min_b, max_b).

    Scale: file ids are map-side expressions; ONE hash aggregate
    produces the stats.  No join, no window, no sort."""
    span = 1 << (2 * bits)
    docs = docs.withColumn(
        "_mh", F.md5(F.regexp_extract("url", r"^https?://([^/]*)", 1)))
    base = docs.select(
        (F.col("doc_id") % 256).cast("int").alias("d"),
        # first md5 byte as int 0..255 (oracle: the strpos-nibble
        # formula over the same lowercase hex — identical values)
        F.conv(F.substring("_mh", 1, 2), 16, 10).cast("int")
        .alias("b"),
    ).withColumn("z", F.expr(interleave_expr("d", "b", bits)))
    tagged = (base.select(
        F.lit("zorder").alias("layout"),
        F.expr(f"CAST(z * {n_files} DIV {span} AS INT)")
        .alias("file_id"), "d", "b")
        .unionByName(base.select(
            F.lit("linear").alias("layout"),
            F.expr(f"CAST((d * 256 + b) * {n_files} DIV {span} AS INT)")
            .alias("file_id"), "d", "b")))
    return (tagged.groupBy("layout", "file_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.min("d").cast("int").alias("min_d"),
                 F.max("d").cast("int").alias("max_d"),
                 F.min("b").cast("int").alias("min_b"),
                 F.max("b").cast("int").alias("max_b")))


def layout_pruning_audit(docs: DataFrame, n_files: int = 16,
                         q_d: int = 17, q_b: int = 42) -> DataFrame:
    """The skip audit: for a point query on each dimension, how many
    files (and rows) survive min/max pruning under each layout.

    Output: one row per layout — (layout, n_files, n_rows,
    hit_files_d, hit_rows_d, hit_files_b, hit_rows_b).  Linear wins
    dimension d outright and loses dimension b completely; Z-order
    pays a modest d regression for large b wins — the exact numbers
    this prints are the write-layout decision."""
    stats = layout_files(docs, n_files)
    hit_d = (F.col("min_d") <= q_d) & (F.col("max_d") >= q_d)
    hit_b = (F.col("min_b") <= q_b) & (F.col("max_b") >= q_b)
    return (stats.groupBy("layout")
            .agg(F.count(F.lit(1)).cast("long").alias("n_files"),
                 F.sum("n_rows").cast("long").alias("n_rows"),
                 F.sum(hit_d.cast("long")).cast("long")
                 .alias("hit_files_d"),
                 F.sum(F.when(hit_d, F.col("n_rows")).otherwise(0))
                 .cast("long").alias("hit_rows_d"),
                 F.sum(hit_b.cast("long")).cast("long")
                 .alias("hit_files_b"),
                 F.sum(F.when(hit_b, F.col("n_rows")).otherwise(0))
                 .cast("long").alias("hit_rows_b")))
