"""Stream==serial parity, restart idempotency, gap-drain semantics
for continuation batch 101 (streaming/stateful.incremental_cusum)."""

from __future__ import annotations

import datetime

MU, K, H = 3, 1, 14


def _mk_events(spark, counts_by_type):
    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1)
    for etype, counts in counts_by_type.items():
        for day, n in enumerate(counts):
            for i in range(n):
                rows.append((eid, base + datetime.timedelta(
                    days=day, minutes=i), 1, etype, 0.0, "{}"))
                eid += 1
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value",
               "props"])


def _serial(counts, mu=MU, k=K, h=H):
    """Completed days only (the last day stays pending)."""
    out, s, p, minp = [], 0, 0, None
    for day, r in enumerate(counts[:-1]):
        p += r - mu - k
        minp = p if minp is None else min(minp, p)
        s = p - min(0, minp)
        out.append((day, r, s, int(s > h)))
    return out


def test_stream_equals_serial_and_restart_is_idempotent(
        spark, tmp_path):
    from ehr_relation_extraction_spark.streaming.stateful import (
        incremental_cusum)

    day0 = (datetime.datetime(2024, 1, 1)
            - datetime.datetime(1970, 1, 1)).days
    plan = {
        "surge": [3, 3, 3, 12, 12, 12, 3, 3, 3, 3],
        "steady": [4, 4, 4, 4, 4, 4, 4, 4, 4, 4],
        # active day 0, SILENT days 1-4 (gap zero-fill must drain),
        # spike day 5, then quiet
        "gappy": [20, 0, 0, 0, 0, 20, 3, 3, 3, 3],
    }
    ev = _mk_events(spark, plan)
    cut = "2024-01-06"
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev.where(f"ts < '{cut}'").coalesce(1) \
        .write.mode("append").parquet(src)
    incremental_cusum(spark, src, out, ckpt,
                      mu=MU, k=K, h=H).awaitTermination(300)
    ev.where(f"ts >= '{cut}'").coalesce(1) \
        .write.mode("append").parquet(src)
    incremental_cusum(spark, src, out, ckpt,
                      mu=MU, k=K, h=H).awaitTermination(300)
    n_rows = spark.read.parquet(out).count()

    # restart on the same checkpoint: no new input -> no new rows
    incremental_cusum(spark, src, out, ckpt,
                      mu=MU, k=K, h=H).awaitTermination(300)
    assert spark.read.parquet(out).count() == n_rows

    got = {}
    for r in spark.read.parquet(out).collect():
        key = (r.etype, r.day_idx - day0)
        assert key not in got, f"duplicate emit {key}"
        got[key] = (r.r, r.cusum, r.alarm)

    for etype, counts in plan.items():
        want = _serial(counts)
        mine = sorted((d, v) for (t, d), v in got.items()
                      if t == etype)
        assert [(d, *v) for d, v in mine] == [
            (d, r, s, a) for d, r, s, a in want], etype
    # the surge trips and resets; steady never trips; gappy drains
    # across the silent gap, then the day-5 spike re-arms it
    assert any(a for d, r, s, a in _serial(plan["surge"]))
    assert not any(a for d, r, s, a in _serial(plan["steady"]))
    gap = dict((d, (s, a)) for d, r, s, a in _serial(plan["gappy"]))
    assert gap[0][1] == 1 and gap[4][0] == 0 and gap[5][1] == 1
