"""Stream==serial parity, DGIM invariants, and the estimate band for
continuation batch 67 (streaming/stateful.incremental_dgim)."""

from __future__ import annotations

WINDOW_S = 6 * 3600


def _serial_dgim(arrivals: list[int], window_s: int):
    """Independent textbook DGIM replica: newest-first bucket list,
    merge the two oldest of any size-triple keeping the newer ts,
    evict buckets whose newest element left the window."""
    buckets: list[tuple[int, int]] = []  # (size, newest_ts)
    for ts in arrivals:
        buckets.insert(0, (1, ts))
        s = 1
        while True:
            idxs = [i for i, (sz, _) in enumerate(buckets) if sz == s]
            if len(idxs) < 3:
                break
            a, b = idxs[-2], idxs[-1]
            buckets[a] = (2 * s, buckets[a][1])
            del buckets[b]
            s *= 2
    now = arrivals[-1]
    buckets = [(sz, t) for sz, t in buckets if t > now - window_s]
    return buckets, now


def _estimate(buckets, now, window_s):
    inside = [sz for sz, t in buckets if t > now - window_s]
    if not inside:
        return 0
    return sum(inside[:-1]) + (inside[-1] + 1) // 2


def _latest(spark, out_dir):
    from pyspark.sql import Window, functions as F

    df = spark.read.parquet(out_dir)
    w = Window.partitionBy("grp")
    return {r.grp: r for r in
            (df.withColumn("_mx", F.max("ver").over(w))
             .where(F.col("ver") == F.col("_mx")).collect())}


def test_incremental_dgim(spark, tmp_path):
    from ehr_relation_extraction_spark.streaming.stateful import (
        incremental_dgim)

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # DGIM's contract is event-time-ordered feeds: split by TIME (the
    # append-only log replay), not by id parity
    cut = "2024-01-16"
    a = ev.where(f"ts < '{cut}'")
    b = ev.where(f"ts >= '{cut}'")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # one file per feed: micro-batches must be time-ordered (multiple
    # hash-partitioned files per feed would interleave timestamps
    # across triggers, violating the arrival-order contract)
    a.coalesce(1).write.mode("append").parquet(src)

    incremental_dgim(spark, src, out, ckpt,
                     window_s=WINDOW_S).awaitTermination(300)
    b.coalesce(1).write.mode("append").parquet(src)
    incremental_dgim(spark, src, out, ckpt,
                     window_s=WINDOW_S).awaitTermination(300)
    got = _latest(spark, out)

    rows = sorted(ev.collect(), key=lambda r: (int(r.ts.timestamp()),
                                               r.event_id))
    series: dict[str, list[int]] = {}
    for r in rows:
        series.setdefault(r.event_type, []).append(
            int(r.ts.timestamp()))

    # single-feed rerun: same content, one micro-batch — state must
    # match both the serial replica AND the two-feed restart run
    src2 = str(tmp_path / "src2")
    out2 = str(tmp_path / "out2")
    ckpt2 = str(tmp_path / "ckpt2")
    ev.coalesce(1).write.mode("append").parquet(src2)
    q = incremental_dgim(spark, src2, out2, ckpt2, window_s=WINDOW_S)
    q.awaitTermination(300)
    got2 = _latest(spark, out2)

    for et, arr in series.items():
        buckets, now = _serial_dgim(arr, WINDOW_S)
        r = got2[et]
        assert r.newest_ts == now
        assert r.n_buckets == len(buckets)
        assert r.est_in_window == _estimate(buckets, now, WINDOW_S)

        # DGIM guarantee on the true windowed count
        exact = sum(1 for t in arr if t > now - WINDOW_S)
        est = r.est_in_window
        assert 2 * est >= exact, (et, est, exact)
        assert 2 * est <= 3 * exact + 2, (et, est, exact)

    # bucket boundaries are NOT batch-split invariant (mid-stream
    # eviction legitimately compacts earlier) — the GUARANTEE is:
    # same newest_ts, and the split-feed estimate sits in the same
    # DGIM band around the true windowed count
    for et, arr in series.items():
        r1 = got[et]
        assert r1.newest_ts == got2[et].newest_ts
        now = r1.newest_ts
        exact = sum(1 for t in arr if t > now - WINDOW_S)
        est = r1.est_in_window
        assert 2 * est >= exact and 2 * est <= 3 * exact + 2, \
            (et, est, exact)


def test_dgim_invariants_and_mass(spark, tmp_path):
    """At most two buckets per size, sizes are powers of two, and —
    before any eviction — total bucket mass equals the arrival count."""
    from ehr_relation_extraction_spark.streaming.stateful import (
        _dgim_insert)

    import random
    rng = random.Random(7)
    ts = 0
    sizes: list[int] = []
    newest: list[int] = []
    n = 0
    for _ in range(500):
        ts += rng.randint(1, 30)
        _dgim_insert(sizes, newest, ts)
        n += 1
        assert sum(sizes) == n
        from collections import Counter
        for sz, c in Counter(sizes).items():
            assert c <= 2 and (sz & (sz - 1)) == 0, (sz, c)
        # newest-first, sizes non-decreasing toward the old end
        assert all(a <= b for a, b in zip(sizes, sizes[1:]))
        assert all(a >= b for a, b in zip(newest, newest[1:]))
