"""Wave-53 operators: FK integrity, Luhn PII gate, KMV intersection,
preference pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import curation as C
from simple_vector_spark.operators import events as E
from simple_vector_spark.operators import sketches as SK
from simple_vector_spark.operators import validate as V


def _luhn_ok(s: str) -> bool:
    total = 0
    for i, ch in enumerate(reversed(s), start=1):
        d = int(ch)
        if i % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        total += d
    return total % 10 == 0


def test_luhn_matches_reference_implementation(spark):
    rows = [
        (45320151, 12830366, "1-URGENT"),   # 4532015112830366 (known valid)
        (45320151, 12830367, "1-URGENT"),   # off-by-one -> invalid
        (11111111, 11111111, "2-HIGH"),
        (12345678, 87654321, "2-HIGH"),
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderpriority string"
    )
    out = {r["o_orderpriority"]: r for r in C.luhn_card_audit(orders).collect()}
    expect = {}
    for ok, ck, pr in rows:
        cand = f"{ok:08d}{ck:08d}"[:16]
        expect.setdefault(pr, [0, 0])
        expect[pr][0] += 1
        expect[pr][1] += int(_luhn_ok(cand))
    for pr, (n, valid) in expect.items():
        assert out[pr]["n_candidates"] == n
        assert out[pr]["n_luhn_valid"] == valid
    assert out["1-URGENT"]["n_luhn_valid"] == 1


def test_fk_orphans_detected(spark):
    nation = spark.createDataFrame(
        [(0, "A", 0), (1, "B", 0)], "n_nationkey long, n_name string, n_regionkey long"
    )
    region = spark.createDataFrame([(0, "R")], "r_regionkey long, r_name string")
    customer = spark.createDataFrame(
        [(10, 0), (11, 1), (12, 99)], "c_custkey long, c_nationkey long"
    )
    edges_subset = [
        e for e in V.FK_EDGES if e[0] in ("customer->nation", "nation->region")
    ]
    orig = V.FK_EDGES
    try:
        V.FK_EDGES = edges_subset  # type: ignore[misc]
        out = {
            r["fk"]: r
            for r in V.fk_orphan_audit(
                {"nation": nation, "region": region, "customer": customer}
            ).collect()
        }
    finally:
        V.FK_EDGES = orig  # type: ignore[misc]
    assert out["customer->nation"]["n_child_rows"] == 3
    assert out["customer->nation"]["n_orphans"] == 1  # c_nationkey=99
    assert out["nation->region"]["n_orphans"] == 0


def test_kmv_intersection_small_sets_exact(spark):
    # fewer distinct users than K on both sides -> the sketch IS the
    # set, so jaccard_est == jaccard_exact and inter_est == exact
    rows = []
    for u in range(20):
        rows.append((u, "click"))
    for u in range(10, 25):
        rows.append((u, "purchase"))
    ev = spark.createDataFrame(
        [(i, u, t, 1.0) for i, (u, t) in enumerate(rows)],
        "event_id long, user_id long, event_type string, value double",
    )
    r = SK.kmv_intersection_audit(ev).collect()[0]
    assert r["inter_exact"] == 10  # users 10..19
    assert abs(r["jaccard_est"] - r["jaccard_exact"]) < 1e-9
    assert abs(r["inter_est"] - 10.0) < 1e-6
    assert r["rel_err"] < 1e-9


def test_preference_pairs_tiebreaks_and_join(spark):
    ev = spark.createDataFrame(
        [
            (1, 1, "purchase", 9.0),
            (2, 1, "purchase", 9.0),   # tie on value -> smaller event_id
            (3, 1, "view", 2.0),
            (4, 1, "view", 1.0),
            (5, 2, "purchase", 5.0),   # user 2 has no view -> excluded
            (6, 3, "view", 1.0),       # user 3 has no purchase -> excluded
        ],
        "event_id long, user_id long, event_type string, value double",
    )
    out = E.preference_pairs(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 1
    assert r["chosen_event_id"] == 1
    assert r["rejected_event_id"] == 4
    assert r["margin"] == 8.0
