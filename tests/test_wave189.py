"""Wave-189 operator: span-corruption masking audit."""

from __future__ import annotations

from simple_vector_spark.operators import curation as CU


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_masking_deterministic_and_consistent(spark):
    docs = _docs(
        spark,
        [(0, "web", "alpha beta gamma delta " * 25),
         (1, "web", "one two three four five " * 20),
         (2, "book", "lorem ipsum dolor sit amet " * 20)],
    )
    a = {r["source"]: r for r in CU.span_masking_audit(docs).collect()}
    b = {r["source"]: r for r in CU.span_masking_audit(docs).collect()}
    assert a == b  # content-keyed: same corpus, same plan
    for src, r in a.items():
        # internal consistency: rate = masked/total; spans <= masked;
        # mean span >= 1
        assert 0.0 < r["mask_rate"] < 0.5
        assert r["n_spans"] <= r["masked_tokens"]
        assert r["mean_span_len"] >= 1.0
        assert abs(
            r["mask_rate"] - r["masked_tokens"] / r["n_tokens"]
        ) < 1e-6


def test_masking_rate_near_density(spark):
    # over ~4000 tokens the realized rate concentrates near 15%
    docs = _docs(
        spark, [(i, "web", "tok " * 400) for i in range(10)]
    )
    out = CU.span_masking_audit(docs).collect()[0]
    assert out["n_tokens"] == 4000
    assert 0.10 < out["mask_rate"] < 0.20
    # sentinel share below mask rate (spans fuse adjacent positions)
    assert out["sentinel_share"] <= out["mask_rate"] + 1e-9
