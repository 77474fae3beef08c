"""Wave-195 operator: weighted MinHash by integer expansion."""

from __future__ import annotations

from simple_vector_spark.operators import dedup as D


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_weighted_minhash_exact_duplicates(spark):
    docs = _docs(
        spark,
        [(1, "spam spam spam ham"), (2, "spam spam spam ham"),
         (3, "totally different words here")],
    )
    rows = D.weighted_minhash_pairs(docs).collect()
    pair = [(r["doc_a"], r["doc_b"]) for r in rows]
    assert (1, 2) in pair
    r = rows[pair.index((1, 2))]
    assert r["exact_wjaccard"] == 1.0
    assert r["est_wjaccard"] == 1.0  # identical multisets, identical sigs
    assert r["abs_err"] == 0.0


def test_weighted_jaccard_sees_tf_difference(spark):
    # same token SET {spam, ham}: set Jaccard = 1, but weights differ:
    # A = spam*9 + ham, B = spam + ham*9
    # wJ = (1+1)/(9+9+... ) = sum min (1+1) / sum max (9+9) = 2/18
    docs = _docs(
        spark,
        [(1, " ".join(["spam"] * 9 + ["ham"])),
         (2, " ".join(["spam"] + ["ham"] * 9))],
    )
    rows = D.weighted_minhash_pairs(docs).collect()
    if rows:  # only if banding surfaced the pair
        r = rows[0]
        assert abs(r["exact_wjaccard"] - 2.0 / 18.0) < 1e-6
    # exact check independent of banding: near-identical weights pair
    docs2 = _docs(
        spark,
        [(1, " ".join(["spam"] * 8 + ["ham"] * 2)),
         (2, " ".join(["spam"] * 8 + ["ham"] * 2 + ["x"]))],
    )
    rows2 = D.weighted_minhash_pairs(docs2).collect()
    assert rows2, "near-identical multisets must band together"
    assert abs(rows2[0]["exact_wjaccard"] - 10.0 / 11.0) < 1e-6
