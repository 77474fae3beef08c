"""Guards for the round-5 decimal->double parity class.

Two cross-engine hazards were caught by the full-scale (sf0.1) oracle
sweep and fixed; these tests pin the recipes so they cannot silently
regress:

1. A Spark DECIMAL product whose ideal type exceeds precision 38 is
   silently SCALE-TRIMMED (allowPrecisionLoss), while DuckDB computes
   the same product in f64 — two different quantizations of x*x.
   dim_variance_profile therefore squares decimal(12,6) (ideal square
   type (25,12): representable, exact).

2. DuckDB's direct DECIMAL -> DOUBLE cast is not correctly rounded
   once the significand exceeds 2^53 (observed 1-ulp error), while
   Spark's BigDecimal cast is correctly rounded.  Oracles route such
   casts through VARCHAR (strtod is correctly rounded in both).

A third class was found by the degenerate-fixture parity sweep and
fixed at the operator level (bigram_nucleus_audit): DuckDB's windowed
SUM accumulates through a segment tree (pairwise association) while
Spark folds sequentially, so a raw f64 running sum is NOT portable
even in a fixed ORDER BY — running masses are ROUND-9 DECIMAL so the
cumsum is exact in both engines.

Residual transcendental exposure: both engines' transcendental
functions (log2/ln/exp) are <=1 ulp accurate but not correctly
rounded, so they can differ by 1 ulp from each other.  The repo
quantizes every transcendental term to 9 dp before folding, which
confines the exposure to terms within ~1 ulp of a 5e-10 rounding
boundary — and a result flip additionally needs the SUM to sit on the
output's 5e-7 boundary.  Natural data makes this a ~measure-zero
double coincidence (all 514 queries hash-match at all three scale
factors).  The one query where ENGINEERED dyadic distributions DID
hit it (multimodal_entropy_sniff, round-5 degenerate sweep) was fixed
in round 6 by restricting its log2 calls to the integers
1..ENTROPY_PREFIX_BYTES (exhaustively parity-checked below) and doing
every rounding step after that in exact integer arithmetic — ROUND on
a double never runs in that query anymore, closing both the 1-ulp
class AND the ROUND-tie class (Spark HALF_UPs the shortest decimal
repr while DuckDB scales the binary value, so identical doubles can
still round apart at an exact 5e-7 midpoint).
"""

from __future__ import annotations

import struct
from decimal import Decimal

from pyspark.sql import functions as F


def test_dim_variance_square_is_exact_decimal(spark):
    """The (12,6) square must keep its full ideal type (25,12) — if an
    edit widens the input back to (21,6) the square's ideal (43,12)
    overflows precision 38 and Spark trims the scale, quantizing x*x
    differently from the DuckDB oracle."""
    x = F.lit("0.123456").cast("decimal(12,6)")
    t = spark.range(1).select((x * x).alias("sq")).schema["sq"].dataType
    assert t.simpleString() == "decimal(25,12)", t.simpleString()
    # and the value itself is the exact 12-dp square
    row = spark.range(1).select((x * x).alias("sq")).collect()[0]
    assert row.sq == Decimal("0.015241383936")


def test_wide_decimal_square_is_trimmed_by_spark(spark):
    """Documents WHY (12,6) matters: the (21,6) square loses scale.
    If Spark ever stops trimming (different overflow rules), this
    fails and the (12,6) defensive cast can be revisited."""
    x = F.lit("0.123456").cast("decimal(21,6)")
    t = spark.range(1).select((x * x).alias("sq")).schema["sq"].dataType
    assert t.simpleString() != "decimal(43,12)"  # ideal type impossible
    assert int(t.simpleString().split(",")[1].rstrip(")")) < 12  # scale lost


def test_duckdb_varchar_routed_cast_is_correctly_rounded():
    """The oracle recipe: CAST(CAST(x AS VARCHAR) AS DOUBLE) must equal
    the correctly rounded double (what Spark's BigDecimal cast and
    Python's Decimal->float produce) even when the decimal's
    significand exceeds 2^53.  The raw direct cast was observed 1 ulp
    off for the first value (nation_gravity_model, sf0.1)."""
    import duckdb

    con = duckdb.connect()
    for v in (
        "262470.838665363236257497",
        "222456.006000491298285871",
        "262349.465385570689557296",
        "-12545.942387712000000001",
    ):
        routed = con.sql(
            f"SELECT CAST(CAST(CAST('{v}' AS DECIMAL(38,18)) AS VARCHAR)"
            " AS DOUBLE)"
        ).fetchone()[0]
        want = float(Decimal(v))
        assert struct.pack("<d", routed) == struct.pack("<d", want), v


def test_entropy_log2_integer_domain_exhaustive_parity(spark):
    """multimodal_entropy_sniff only ever evaluates log2 on the
    INTEGERS 1..ENTROPY_PREFIX_BYTES (byte counts and prefix lengths),
    quantized as L9(k) = ROUND(log2(k), 9) DECIMAL(18,9) before any
    fold — so the whole transcendental surface of that query is this
    finite table.  Check Spark vs DuckDB equality of L9 EXHAUSTIVELY:
    while engines' log2 may differ by 1 ulp, a VALUE flip needs the
    ulp to straddle a 5e-10 boundary, and this asserts no k does (if
    either engine's libm ever changes and a k starts straddling, this
    test localizes it immediately)."""
    import duckdb

    from simple_vector_spark.operators.multimodal import (
        ENTROPY_PREFIX_BYTES,
    )

    n = ENTROPY_PREFIX_BYTES
    got_spark = {
        r.k: r.l9
        for r in spark.range(1, n + 1)
        .select(
            F.col("id").alias("k"),
            F.round(F.log2(F.col("id").cast("double")), 9)
            .cast("decimal(18,9)")
            .alias("l9"),
        )
        .collect()
    }
    con = duckdb.connect()
    got_duck = dict(
        con.sql(
            f"SELECT k, CAST(ROUND(log2(CAST(k AS DOUBLE)), 9)"
            f" AS DECIMAL(18,9)) FROM range(1, {n + 1}) t(k)"
        ).fetchall()
    )
    bad = {
        k: (got_spark[k], got_duck[k])
        for k in range(1, n + 1)
        if got_spark[k] != got_duck[k]
    }
    assert not bad, f"L9 diverges on integer args: {bad}"


def test_finalize_double_guards_unscaled_significand(spark):
    """finalize_double's exactness precondition (unscaled < 2^53) is
    ENFORCED (ADVICE r06): a decimal final whose significand exceeds
    2^53 raises instead of silently crossing the canon boundary with
    a possibly-unrepresentable value (and reopening DuckDB's 1-ulp
    direct decimal->double cast on the oracle side).  In-bound values
    cast exactly; NULLs pass through."""
    import pytest

    from simple_vector_spark.registry import finalize_double

    # 2^53 = 9007199254740992; at scale 2 the bound is 2^53/100.
    ok = spark.sql(
        "SELECT CAST('90071992547409.91' AS DECIMAL(38,2)) AS v"
        " UNION ALL SELECT CAST(NULL AS DECIMAL(38,2))"
    )
    got = {r.v for r in finalize_double(ok, "v").collect()}
    assert got == {90071992547409.91, None}
    bad = spark.sql("SELECT CAST('90071992547409.92' AS DECIMAL(38,2)) AS v")
    with pytest.raises(Exception, match="finalize_double"):
        finalize_double(bad, "v").collect()
    # non-decimal columns keep the plain cast path
    plain = spark.range(1).select(F.lit(7).alias("v"))
    assert finalize_double(plain, "v").collect()[0].v == 7.0


def test_long_to_decimal19_cast_covers_every_int64(spark):
    """abc_xyz_matrix routes per-part LONG cents through DECIMAL before
    the corpus-growing prefix sum.  The cast width must be >= 19 digits:
    decimal(18,0) tops out at 1e18-1, so a per-part sum in
    [1e18, 2^63) would cast to NULL in non-ANSI mode and silently drop
    that part from cum/total (ADVICE r07) — the very silent-divergence
    class the finalize_double guard exists to close.  decimal(19,0)
    represents every int64 exactly and still promotes SUM to
    decimal(29,0), keeping the LONG-wrap fix."""
    import inspect

    from simple_vector_spark.operators import relational

    src = inspect.getsource(relational.abc_xyz_matrix)
    assert 'cast("decimal(19,0)")' in src, (
        "abc_xyz_matrix's rev prefix-sum cast must stay decimal(19,0)"
    )
    assert '("rev", F.col("rev").cast("decimal(18,0)")' not in src
    # behavioral proof of the class: an 18,0 cast of an int64 endpoint
    # is a failure either way (NULL when ANSI is off — the silent-drop
    # hazard; an ArithmeticException when ANSI is on), while 19,0 is
    # exact for both endpoints under both modes
    edges = spark.sql(
        "SELECT CAST(9223372036854775807 AS LONG) AS v"
        " UNION ALL SELECT CAST(-9223372036854775808 AS LONG)"
    )
    ansi_before = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        narrow = [r.d for r in edges.select(
            F.col("v").cast("decimal(18,0)").alias("d")).collect()]
        assert narrow == [None, None]
        wide = {r.d for r in edges.select(
            F.col("v").cast("decimal(19,0)").alias("d")).collect()}
        assert wide == {Decimal(9223372036854775807),
                        Decimal(-9223372036854775808)}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_before)
    wide_ansi = {r.d for r in edges.select(
        F.col("v").cast("decimal(19,0)").alias("d")).collect()}
    assert wide_ansi == {Decimal(9223372036854775807),
                         Decimal(-9223372036854775808)}
