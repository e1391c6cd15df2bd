"""Tests: brat/CoNLL/TSV fixture formats, masking, multimodal plumbing."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F


def test_parse_brat(spark):
    from ehr_relation_extraction_spark.sources.annotations import parse_brat

    lines = spark.createDataFrame([
        ("d1", "T1\tTopic 0 5\tspark"),
        ("d1", "T2\tMoney 10 13;15 18\tkey aaa"),   # multi-range collapse
        ("d1", "R1\tMoney-Topic Arg1:T1 Arg2:T2"),
        ("d1", "R2\tMoney-Topic Arg1:T1 Arg2:T9"),  # dangling ref -> dropped
    ], "doc_id string, line string")
    ents, rels = parse_brat(lines)
    e = {r["ent_id"]: r for r in ents.collect()}
    assert e["T1"]["ent_type"] == "Topic" and e["T1"]["start"] == 0
    assert e["T2"]["start"] == 10 and e["T2"]["end"] == 18  # collapsed
    r = rels.collect()
    assert len(r) == 1 and r[0]["rel_id"] == "R1"
    assert r[0]["arg1_id"] == "T1" and r[0]["arg2_id"] == "T2"


def test_conll_roundtrip(spark, tmp_path):
    from ehr_relation_extraction_spark.sources.annotations import (
        read_conll, write_conll)

    rows = spark.createDataFrame(
        [(0, 0, "spark", "B-Topic"), (0, 1, "runs", "O"),
         (1, 0, "value", "B-Money")],
        "sent_id int, tok_idx int, token string, label string")
    path = str(tmp_path / "conll")
    write_conll(rows, path)
    back = read_conll(spark, path)
    got = {(r["sent_id"], r["tok_idx"], r["token"], r["label"])
           for r in back.collect()}
    assert got == {(0, 0, "spark", "B-Topic"), (0, 1, "runs", "O"),
                   (2, 0, "value", "B-Money")} or len(got) == 3


def test_masking_operator(spark):
    """T7/T8: masked window text, later span replaced first."""
    from ehr_relation_extraction_spark.oracle.fixtures import pages_df
    from ehr_relation_extraction_spark.plans.pipeline import build
    from ehr_relation_extraction_spark.operators.relations import (
        build_masked_inputs)

    fr = build(pages_df(spark, n_pages=25))
    masked = build_masked_inputs(fr.relations, fr.shards, fr.pages)
    rows = masked.collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert "@Topic$" in r["masked_text"]
        assert "@" in r["masked_text"].split("@Topic$")[0] + \
               r["masked_text"].split("@Topic$")[-1]
        assert "\n" not in r["masked_text"] and "\t" not in r["masked_text"]


def test_re_tsv_roundtrip(spark, tmp_path):
    from ehr_relation_extraction_spark.oracle.fixtures import pages_df
    from ehr_relation_extraction_spark.plans.pipeline import build
    from ehr_relation_extraction_spark.operators.relations import (
        build_masked_inputs)
    from ehr_relation_extraction_spark.sources.annotations import (
        read_re_tsv, write_re_tsv)

    fr = build(pages_df(spark, n_pages=25))
    masked = build_masked_inputs(fr.relations, fr.shards, fr.pages)
    path = str(tmp_path / "re_tsv")
    write_re_tsv(masked, path)
    back = read_re_tsv(spark, path)
    assert back.count() == masked.count()
    assert set(back.columns) == {"index", "sentence", "url", "rel_id", "rel_type"}


def test_multimodal_decode_features(spark):
    from ehr_relation_extraction_spark.operators.multimodal import (
        decode_features, _fake_features)

    media = spark.createDataFrame(
        [(1, "u1", "image", b"\x89PNG fake"),
         (2, "u2", "audio", b"RIFF fake"),
         (3, "u3", "video", None)],
        "media_id long, url string, media_type string, payload binary")
    out = {r["media_id"]: r for r in decode_features(media).collect()}
    assert out[1]["n_bytes"] == 9
    assert out[3]["n_bytes"] == 0
    assert out[1]["features"] == _fake_features(b"\x89PNG fake")
    assert len(out[2]["features"]) == 8
    # deterministic: same payload -> same features
    h = hashlib.md5(b"RIFF fake").hexdigest()
    assert abs(out[2]["features"][0] - int(h[:4], 16) / 65536.0) < 1e-12


def test_multimodal_stubs_raise(spark):
    from ehr_relation_extraction_spark.operators import multimodal as mm

    media = spark.createDataFrame(
        [(1, "u", "image", b"x")],
        "media_id long, url string, media_type string, payload binary")
    for fn in (mm.decode_image, mm.resample_audio, mm.sample_frames):
        with pytest.raises(NotImplementedError):
            fn(media)


def _media(spark):
    from ehr_relation_extraction_spark.operators import multimodal as mm

    return mm, spark.createDataFrame(
        [(1, "u1", "image", b"\x89PNG" + b"a" * 200),
         (2, "u2", "audio", bytes(range(256)) * 400),   # 102400 "samples"
         (3, "u3", "video", b"v" * 9000),               # 90 fake frames
         (4, "u4", "video", None)],                     # degenerate
        "media_id long, url string, media_type string, payload binary"
    ).repartition(3)  # plumbing must be partition-invariant


def test_decode_image_fixed_shape(spark):
    mm, media = _media(spark)
    out = {r["media_id"]: r for r in
           mm.decode_image(media, size=(8, 8),
                           codec=mm.fake_image_codec).collect()}
    assert len(out) == 4
    for r in out.values():
        assert (r["width"], r["height"], r["n_channels"]) == (8, 8, 3)
        assert len(r["pixels"]) == 8 * 8 * 3  # fixed batch shape
    assert out[1]["pixels"] == mm.fake_image_codec(b"\x89PNG" + b"a" * 200,
                                                   (8, 8))


def test_resample_audio_chunk_explode(spark):
    mm, media = _media(spark)
    out = mm.resample_audio(media, rate=16000, chunk_s=1,
                            codec=mm.fake_audio_codec)
    rows = sorted((r["media_id"], r["chunk_idx"], r["n_samples"])
                  for r in out.where("media_id = 2").collect())
    # 102400 samples @44100 -> 37151 @16000 -> chunks 16000/16000/5151
    assert rows == [(2, 0, 16000), (2, 1, 16000), (2, 2, 5151)]
    # every media row yields at least one chunk row (even empty payloads)
    assert out.select("media_id").distinct().count() == 4
    # exact deterministic energy
    again = mm.resample_audio(media, rate=16000, chunk_s=1,
                              codec=mm.fake_audio_codec)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_sample_frames_explode_and_timestamps(spark):
    mm, media = _media(spark)
    out = mm.sample_frames(media, every_n=30, fps=30,
                           codec=mm.fake_video_codec)
    rows = sorted((r["frame_idx"], r["ts_ms"]) for r in
                  out.where("media_id = 3").collect())
    assert rows == [(0, 0), (30, 1000), (60, 2000)]  # 90 frames, every 30th
    assert out.where("media_id = 4").count() == 0    # no frames, no rows
    frames = {r["frame_idx"]: r["frame"] for r in
              out.where("media_id = 3").collect()}
    assert len(set(frames.values())) == 3            # per-frame distinct bytes
    assert all(len(f) == 16 for f in frames.values())
