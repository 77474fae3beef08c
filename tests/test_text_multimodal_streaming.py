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
