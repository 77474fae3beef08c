"""Text analysis, multimodal decode plumbing, streaming jobs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from simple_vector_spark.operators import multimodal as MM
from simple_vector_spark.operators import text_analysis as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat and the dog, of course!", "en"),
        (2, "der hund und die katze ist da", "de"),
        (3, "xyzzy qwerty plugh", "zz"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_token_quality_counts(docs):
    out = {r.doc_id: r for r in T.token_quality(docs).collect()}
    assert out[1].n_tokens == 7
    # 'the' x2 + 'and' + 'of' = 4 stopword hits
    assert out[1].stop_ratio == pytest.approx(4 / 7, abs=1e-6)
    # punct: ',' + '!'
    assert out[1].punct_ratio == pytest.approx(2 / 31, abs=1e-6)
    assert out[3].stop_ratio == 0.0


def test_langid_prediction(docs):
    out = {r.doc_id: r.predicted for r in T.langid_predict(docs).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "unk"


def test_fingerprint_order_sensitive(spark):
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "ba"), (3, "ab")], "doc_id long, text string"
    )
    fp = {r.doc_id: r.fp for r in T.fingerprint(docs).collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]  # rolling hash is order-sensitive
    # h("ab") = (0*31 + 97)*31 + 98 = 3105
    assert fp[1] == 97 * 31 + 98


def test_multimodal_payload_and_decode(docs):
    wp = MM.with_payload(docs)
    assert dict(wp.dtypes)["payload"] == "binary"
    decoded = MM.decode_features(wp)
    rows = {r.doc_id: r for r in decoded.collect()}
    assert len(rows) == 3
    r1 = rows[1]
    assert r1.byte_len == 31
    assert r1.width == (31 % 97) + 16 and r1.height == (31 // 97) + 16
    assert len(r1.feat) == MM.FEAT_DIM
    assert all(0.0 <= x <= 1.0 for x in r1.feat)


def test_streaming_matches_batch(spark):
    """availableNow streaming tumbling agg == batch tumbling agg."""
    from simple_vector_spark.operators.events import tumbling_agg
    from simple_vector_spark.sources.loaders import load_table
    from simple_vector_spark.streaming import jobs as SJ

    sf_dir = "/root/testdata/sf0.001"
    batch = {
        (r.bucket, r.event_type): (r.n, r.sum_value)
        for r in tumbling_agg(load_table(spark, sf_dir, "events"), "1 hour").collect()
    }
    stream = {
        (r.bucket, r.event_type): (r.n, r.sum_value)
        for r in SJ.tumbling_agg_stream(spark, sf_dir, "1 hour").collect()
    }
    assert stream == batch


def test_streaming_dedup_drops_all_duplicates(spark):
    from simple_vector_spark.sources.loaders import load_table
    from simple_vector_spark.streaming import jobs as SJ

    sf_dir = "/root/testdata/sf0.001"
    n_events = load_table(spark, sf_dir, "events").count()
    out = SJ.dedup_stream(spark, sf_dir)
    assert out.agg(F.sum("n")).collect()[0][0] == n_events


def test_frame_sampler_matches_audit(spark, sf_dir):
    """The mapInPandas frame fan-out must emit exactly the row counts
    the metadata-only audit predicts, per doc."""
    from simple_vector_spark.operators import multimodal as MM
    from simple_vector_spark.sources.loaders import load_table

    import pyspark.sql.functions as F

    wp = MM.with_payload(load_table(spark, sf_dir, "documents"))
    audit = {r["doc_id"]: r for r in MM.frame_audit(wp).collect()}
    per_doc = {
        r["doc_id"]: r["n"]
        for r in MM.sample_frames(wp).groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_doc) == set(audit)
    for d, n in per_doc.items():
        assert n == audit[d]["n_sampled"], d
    one = MM.sample_frames(wp).filter(F.col("frame_idx") == 0).limit(5).collect()
    assert all(r["frame_off"] == 0 and r["thumb_w"] == 32 for r in one)


def test_checkpoint_resume_exactly_once(spark, tmp_path):
    """O17 recovery contract (doc/wal.md:7, src/persistence.cc:84-135):
    kill a stream mid-backlog, restart from the SAME checkpointLocation,
    and the final state equals the batch answer — every input row exactly
    once, nothing lost from unprocessed files, nothing duplicated from
    reprocessed ones."""
    import time

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n_files, rows_per = 6, 100
    for f in range(n_files):
        spark.range(f * rows_per, (f + 1) * rows_per).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 17).alias("user_id"),
            (F.col("id") * 2.5).alias("value"),
        ).coalesce(1).write.mode("append").parquet(src)

    schema = "event_id long, user_id long, value double"

    def start(trigger_kwargs):
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kwargs)
            .start()
        )

    # run 1: process part of the backlog, then kill the query
    q1 = start({"processingTime": "200 milliseconds"})
    deadline = time.time() + 60
    while time.time() < deadline:
        done = sum(p["numInputRows"] for p in q1.recentProgress)
        if done >= rows_per:
            break
        time.sleep(0.2)
    q1.stop()
    q1.awaitTermination()
    part = spark.read.parquet(out).count()
    assert part >= rows_per  # some progress committed before the kill
    # run 2: resume from the checkpoint, drain the remaining backlog
    q2 = start({"availableNow": True})
    q2.awaitTermination()

    got = spark.read.parquet(out)
    assert got.count() == n_files * rows_per  # no loss, no duplication
    assert got.select("event_id").distinct().count() == n_files * rows_per
    batch_sum = n_files * rows_per * (n_files * rows_per - 1) // 2 * 2.5
    assert abs(got.agg(F.sum("value")).collect()[0][0] - batch_sum) < 1e-6


def _tiny_bmp(w=3, h=2):
    """Hand-assembled 24-bit BMP (no image lib needed to CREATE one):
    14-byte file header + 40-byte BITMAPINFOHEADER + zeroed pixel rows
    padded to 4 bytes."""
    import struct

    row = (w * 3 + 3) // 4 * 4
    size = 54 + row * h
    return (
        struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, row * h, 2835, 2835, 0, 0)
        + b"\x00" * (row * h)
    )


def test_decode_payload_dispatch():
    """octet-stream always stub-decodes (the oracle-green path);
    image/* goes through PIL when available and must report the REAL
    raster dims from the BMP header, not the stub's length-derived
    ones."""
    bmp = _tiny_bmp(3, 2)
    stub = MM._fake_decode(bmp)
    assert MM.decode_payload(bmp, "application/octet-stream") == stub
    if MM.codec_available():
        w, h, ck = MM.decode_payload(bmp, "image/bmp")
        assert (w, h) == (3, 2)
        assert ck == stub[2]  # checksum arithmetic shared across paths
    else:
        # no codec in this container: image/* falls back to the stub
        assert MM.decode_payload(bmp, "image/bmp") == stub
    # undecodable image bytes fall back to the stub instead of failing
    assert MM.decode_payload(b"not an image", "image/png") == MM._fake_decode(
        b"not an image"
    )
