"""Relational operators: aggregation, joins, windows, set ops, as-of.

The reference has NO joins/aggregations/windows (SURVEY.md §2.2) — its
only relational act is projecting stored JSON back (O21).  These are
the capability extensions the Spark engine gets "for free" from
Catalyst, declared as first-class queries so the engine covers what a
100-TB training-data pipeline needs around the vector core.

Determinism: monetary aggregates are computed in DECIMAL (exact,
order-insensitive — double summation order differs between Spark's
partial aggregates and DuckDB), then cast to DOUBLE and ROUNDed for a
stable cross-engine hash.  Rounding doubles to >=1 decimal is tie-free
(odd multiples of 5e-k are not binary-representable).

Scale notes per operator are in the docstrings; the common themes:
dimension tables broadcast, fact tables aggregate map-side first
(partial aggregation), windows shuffle once by their partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Exact money type: double -> DECIMAL(15,2)/(8,6) casts are tie-free
# (doubles never land exactly on half-cent boundaries).
DEC_PRICE = "decimal(15,2)"
DEC_RATE = "decimal(8,6)"


def _dec(col: str, typ: str = DEC_PRICE) -> Column:
    return F.col(col).cast(typ)


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1 shape: scan -> pushed-down date filter -> partial agg ->
    final agg.  One shuffle on (l_returnflag, l_linestatus); all money
    math in DECIMAL so partial-agg order cannot perturb results."""
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast(DEC_RATE) - _dec("l_discount", DEC_RATE))
    charge = disc_price * (F.lit(1).cast(DEC_RATE) + _dec("l_tax", DEC_RATE))
    agg = (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("_sum_qty"),
            F.sum(_dec("l_extendedprice")).alias("_sum_base"),
            F.sum(disc_price).alias("_sum_disc"),
            F.sum(charge).alias("_sum_charge"),
            F.count("*").alias("count_order"),
        )
    )
    n = F.col("count_order")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("_sum_qty").cast("double"), 2).alias("sum_qty"),
        F.round(F.col("_sum_base").cast("double"), 2).alias("sum_base_price"),
        F.round(F.col("_sum_disc").cast("double"), 4).alias("sum_disc_price"),
        F.round(F.col("_sum_charge").cast("double"), 4).alias("sum_charge"),
        F.round(F.col("_sum_qty").cast("double") / n, 6).alias("avg_qty"),
        F.round(F.col("_sum_base").cast("double") / n, 6).alias("avg_price"),
        n,
    )


def revenue_by_nation(
    customer: DataFrame, orders: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Star join: fact (orders) joined through customer to broadcast
    dims.  Catalyst/AQE picks broadcast-hash for nation/region
    (25/5 rows); customer<->orders is the only real shuffle, and at
    scale both sides would be bucketed by custkey to remove it."""
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def rollup_revenue(
    customer: DataFrame, orders: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Grouping-set rollup (region -> nation -> grand total) — the
    hierarchy the reference cannot express at all."""
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


def cube_revenue(
    customer: DataFrame, orders: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Full CUBE over (region, order status): every grouping-set
    combination in one pass (Spark expands to a union of aggregates
    over one shuffle)."""
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.cube("r_name", "o_orderstatus").agg(
        F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


def order_value_percentiles(orders: DataFrame) -> DataFrame:
    """Exact interpolated percentiles of order value per priority
    class (SQL PERCENTILE_CONT semantics — matches DuckDB
    quantile_cont).  Exact percentiles need the group sorted; at
    100 TB switch to approx_percentile (t-digest sketch, map-side
    mergeable, no sort) and accept the documented error bound."""
    return orders.groupBy("o_orderpriority").agg(
        *[
            F.round(F.percentile("o_totalprice", F.lit(q)), 4).alias(f"p{int(q*100)}")
            for q in (0.25, 0.5, 0.75, 0.95)
        ],
        F.count("*").alias("n"),
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Per-group top-k window — the same rank-limit pattern the k-NN
    join uses; WindowGroupLimit keeps the shuffle at k rows/key/task."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1997-06-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: double-filtered 3-way join (customer segment,
    order date, ship date), revenue agg per order, global top-k.
    Plan: both date filters push to the fact scans; the customer
    filter shrinks the dim before the join; the final top-k is
    TakeOrderedAndProject (no full sort).  Revenue in DECIMAL."""
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast(DEC_RATE) - _dec("l_discount", DEC_RATE)
    )
    return (
        lineitem.filter(F.col("l_shipdate") > F.lit(cutoff))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit(cutoff)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == segment)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(k)
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Set difference (EXCEPT): distinct custkeys minus order custkeys.
    Compiles to a left-anti aggregate; at scale prefer the anti-join
    form directly (identical result, no distinct shuffle of both sides)."""
    return customer.select(F.col("c_custkey").alias("custkey")).exceptAll(
        orders.select(F.col("o_custkey").alias("custkey"))
    ).distinct()


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Set intersection (INTERSECT DISTINCT)."""
    return customer.select(F.col("c_custkey").alias("custkey")).intersect(
        orders.select(F.col("o_custkey").alias("custkey"))
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join — revenue from orders where the
    customer and the line's supplier share a nation, one region, one
    year.  Plan: the region filter prunes nation, nation prunes
    supplier/customer, and all four dims broadcast — so the only
    shuffle is lineitem⋈orders on orderkey (two fact tables, the one
    genuinely unavoidable shuffle).  The same-nation constraint rides
    the supplier join as an extra equi-key, never a post-filter over a
    wider join."""
    nations = F.broadcast(
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    cust = F.broadcast(
        customer.join(
            nations, F.col("c_nationkey") == F.col("n_nationkey")
        ).select("c_custkey", "c_nationkey")
    )
    supp = F.broadcast(
        supplier.join(
            nations, F.col("s_nationkey") == F.col("n_nationkey")
        ).select("s_suppkey", "s_nationkey", "n_name")
    )
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(year_start))
        & (F.col("o_orderdate") < F.lit(year_end))
    ).select("o_orderkey", "o_custkey")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast(DEC_RATE) - _dec("l_discount", DEC_RATE)
    )
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(rev).cast("double"), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def salted_join(
    big: DataFrame, small: DataFrame, on: str, n_salt: int = 8
) -> DataFrame:
    """Skew-buster inner equi-join: the big side gets a deterministic
    salt (row-hash mod n_salt) appended to the key; the small side is
    replicated n_salt times.  A hot key's rows then spread over n_salt
    reducers instead of one.  Use when AQE's skew split isn't enough
    (single-key skew inside one partition); identical results to the
    plain join (asserted in tests)."""
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt))
    )
    replicated = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>")),
    )
    return salted_big.join(replicated, [on, "__salt"]).drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Keyed as-of join: each left row gets the payload of the latest
    right row with ``right.ts <= left.ts`` within the same ``by`` keys
    (Spark has no native ASOF; DuckDB does — the oracle).

    Implementation: tag + union + per-key running ``last(ignoreNulls)``
    window ordered by (ts, tag) so a right row at the exact same
    timestamp is visible (>= semantics).  ONE shuffle by key — never a
    range cross-join — so it scales with the key cardinality; skewed
    keys fall to AQE.  Reference analog: none (WAL replay O17 is the
    closest temporal concept).
    """
    lcols = left.columns
    tagged_r = right.select(
        *by,
        F.col(ts_col),
        F.lit(0).alias("__tag"),
        *[F.col(c) for c in payload_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by and c != ts_col],
    )
    tagged_l = left.select(
        *by,
        F.col(ts_col),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload_cols],
        *[F.col(c) for c in lcols if c not in by and c != ts_col],
    )
    u = tagged_r.unionByName(tagged_l)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"__asof_{c}") for c in payload_cols],
    )
    return (
        filled.filter(F.col("__tag") == 1)
        .select(
            *by,
            F.col(ts_col),
            *[F.col(c) for c in lcols if c not in by and c != ts_col],
            *[F.col(f"__asof_{c}").alias(c) for c in payload_cols],
        )
    )


def orders_with_returns(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape (EXISTS decorrelated to LEFT SEMI): count orders
    per priority having at least one returned line.  The semi join
    never materializes the match — one probe bit per order row, and
    the returnflag filter pushes to the lineitem scan."""
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )


def orders_without_returns(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """NOT EXISTS as LEFT ANTI over the same shape."""
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_anti"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
    )


def orders_above_customer_avg(orders: DataFrame) -> DataFrame:
    """Correlated scalar subquery (order > its customer's average
    order value), decorrelated to ONE window pass: per-custkey sum and
    count ride a window, and the comparison is the exact integer-ish
    form price * n > sum (DECIMAL both sides) — no float average whose
    last-ulp could flip boundary rows between engines."""
    w = Window.partitionBy("o_custkey")
    price = _dec("o_totalprice")
    return (
        orders.withColumn("__sum", F.sum(price).over(w))
        .withColumn("__n", F.count("*").over(w))
        .filter(price * F.col("__n") > F.col("__sum"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice").cast("double"), 2).alias("totalprice"),
        )
    )


def promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation — promo revenue as a
    share of total revenue for one ship-month.  sum(CASE WHEN) and the
    total ride the SAME aggregate pass (one scan, one shuffle of two
    partial sums); part broadcasts.  Share is exact-DECIMAL sums
    divided in f64 and rounded."""
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast(DEC_RATE) - _dec("l_discount", DEC_RATE)
    )
    # no otherwise: non-promo rows contribute NULL, which sum() skips —
    # same as CASE WHEN ... ELSE 0 but keeps the DECIMAL type of rev
    promo = F.when(F.col("p_type").startswith("PROMO"), rev)
    joined = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01"))
        & (F.col("l_shipdate") < F.lit("1997-10-01"))
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        F.round(
            (
                F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            )
            * 100.0,
            6,
        ).alias("promo_share_pct"),
        F.round(F.sum(rev).cast("double"), 4).alias("total_revenue"),
    )


def order_value_quartiles(orders: DataFrame) -> DataFrame:
    """ntile(4) bucketing per priority class: quartile membership plus
    per-quartile aggregates — the distribution-audit window shape
    (equal-count buckets, unlike percentile cutpoints)."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("q", F.ntile(4).over(w).cast("int"))
        .groupBy("o_orderpriority", "q")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias("sum_value"),
        )
    )
