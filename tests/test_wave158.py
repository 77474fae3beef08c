"""Wave-158 operator: isotonic calibration (minimax PAV)."""

from __future__ import annotations

from decimal import Decimal

from simple_vector_spark.operators import relational as R


def _pav(pairs):
    """Reference pool-adjacent-violators on (n, pos) bins."""
    blocks = []  # [pos, n]
    for n, p in pairs:
        blocks.append([p, n])
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] > blocks[-1][0] * blocks[-2][1]
        ):
            p2, n2 = blocks.pop()
            blocks[-1][0] += p2
            blocks[-1][1] += n2
    fitted = []
    i = 0
    for p, n in blocks:
        # each block covers as many ORIGINAL bins as merged: reconstruct
        # by walking counts
        covered = []
        acc = 0
        while acc < n:
            acc += pairs[i][0]
            covered.append(i)
            i += 1
        fitted.extend([p / n] * len(covered))
    return fitted


def _orders(spark, bin_specs):
    """bin_specs: per bin (n, pos). Build orders whose cents land in
    equal-width bins 0..B-1 over [0, B*100): bin i gets values
    i*100+5 cents; lo=5, hi=(B-1)*100+5 so bin math maps back to i."""
    rows = []
    oid = 0
    B = len(bin_specs)
    for i, (n, p) in enumerate(bin_specs):
        for j in range(n):
            pri = "1-URGENT" if j < p else "5-LOW"
            cents = i * 100 + 5
            rows.append((oid, Decimal(cents) / 100, pri))
            oid += 1
    # pin lo/hi to exact bin edges: add sentinel rows at 0 and B*100-1
    rows.append((oid, Decimal(0), "5-LOW"))
    rows.append((oid + 1, Decimal(B * 100 - 1) / 100, "1-URGENT"))
    return spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice decimal(15,2), o_orderpriority string"
    )


def test_isotonic_matches_reference_pav(spark):
    import simple_vector_spark.operators.relational as RR

    specs = [(10, 1), (10, 5), (10, 3), (10, 2), (10, 9), (10, 7),
             (10, 8), (10, 8), (10, 9), (10, 10)]
    df = _orders(spark, specs)
    out = sorted(
        RR.isotonic_calibration(df).collect(), key=lambda r: r["bin"]
    )
    # sentinels: one extra LOW row lands in bin 0 and one in bin B-1
    adj = [list(s) for s in specs]
    adj[0][0] += 1
    adj[-1][0] += 1
    adj[-1][1] += 1
    ref = _pav([tuple(x) for x in adj])
    assert len(out) == len(specs)
    for r, exp in zip(out, ref):
        assert abs(r["iso_rate"] - round(exp, 6)) < 1e-6
    # monotone non-decreasing
    iso = [r["iso_rate"] for r in out]
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:]))


def test_isotonic_already_monotone_is_identity(spark):
    specs = [(10, 0), (10, 2), (10, 5), (10, 7), (10, 10)]
    df = _orders(spark, specs)
    out = sorted(
        R.isotonic_calibration(df, bins=len(specs)).collect(),
        key=lambda r: r["bin"],
    )
    # inner bins (no sentinel contamination) keep their raw rate
    for r in out[1:-1]:
        assert abs(r["iso_rate"] - r["raw_rate"]) < 1e-9
