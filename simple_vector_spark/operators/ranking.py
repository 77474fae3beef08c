"""Scale-safe global ranking: two-phase row_number / ntile without a
single-partition window.

``Window.orderBy(...)`` with no partitionBy funnels every row through
one task ("Moving all data to a single partition" — the one plan shape
that cannot survive a 100x scale-up).  The distributed equivalent is
the zipWithIndex pattern, expressed declaratively:

1. ``repartitionByRange`` on the sort key — non-overlapping sorted
   ranges, one per partition, each partition-sized.
2. ``row_number`` windowed by ``spark_partition_id()`` — a local sort
   per partition, never a global one.
3. global rank = local rank + the summed row counts of all lower
   partitions.  The offsets come from a broadcast triangle join over
   the per-partition COUNT table (#groups x #partitions rows — bounded
   by cluster layout, not data volume), so no orderBy-only window
   appears anywhere in the plan.

The partitioned frame is localCheckpoint'ed: the counts branch and the
rank branch MUST observe the same physical partitioning (AQE may
re-coalesce a recomputed exchange differently), and the checkpoint also
keeps the upstream lineage to a single computation.

Reference parity: the reference assigns ids with a serial counter
(src/persistence.cc:43-48) and ranks results in one thread; these
helpers are the distributed equivalents of that total order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked_global(
    df: DataFrame,
    sort_exprs: Sequence[Column],
    group_cols: Sequence[str] = (),
    rank_name: str = "grank",
    total_name: str | None = None,
) -> DataFrame:
    """Exact global (or per-group) row_number over ``sort_exprs``.

    Returns ``df`` plus ``rank_name`` (long, 1-based, row_number
    semantics — sort_exprs must include a unique tiebreak) and, when
    ``total_name`` is given, the per-group row count (long) every row
    of the group carries (for ntile / percentile arithmetic).
    """
    gc = list(group_cols)
    part = df.repartitionByRange(
        *[F.col(g).asc() for g in gc], *sort_exprs
    ).withColumn("_pid", F.spark_partition_id())
    lw = Window.partitionBy(*gc, "_pid").orderBy(*sort_exprs)
    local = part.withColumn(
        "_lrank", F.row_number().over(lw).cast("long")
    ).localCheckpoint()

    counts = local.groupBy(*gc, "_pid").agg(F.count("*").alias("_pn"))
    lower = counts.select(
        *[F.col(g).alias(f"_bg_{g}") for g in gc],
        F.col("_pid").alias("_bpid"),
        F.col("_pn").alias("_bpn"),
    )
    cond = F.col("_bpid") < F.col("_pid")
    for g in gc:
        cond = cond & (F.col(g) == F.col(f"_bg_{g}"))
    offs = (
        counts.join(F.broadcast(lower), cond, "left")
        .groupBy(*gc, "_pid")
        .agg(F.coalesce(F.sum("_bpn"), F.lit(0)).cast("long").alias("_off"))
    )

    out = local.join(F.broadcast(offs), [*gc, "_pid"]).withColumn(
        rank_name, (F.col("_off") + F.col("_lrank")).cast("long")
    )
    if total_name is not None:
        if gc:
            tot = counts.groupBy(*gc).agg(
                F.sum("_pn").cast("long").alias(total_name)
            )
            out = out.join(F.broadcast(tot), gc)
        else:
            tot = counts.agg(F.sum("_pn").cast("long").alias(total_name))
            out = out.crossJoin(F.broadcast(tot))
    return out.drop("_pid", "_lrank", "_off")


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL-standard ntile(k) computed from an exact 1-based rank and the
    group size: the first ``n % k`` buckets get ``n div k + 1`` rows,
    the rest ``n div k`` — identical to Spark's and DuckDB's NTILE.
    """
    i = rank.cast("double")
    base = F.floor(n / k).cast("long")
    rem = (n % k).cast("long")
    big = (base + F.lit(1)).cast("double")
    in_big = rank <= rem * (base + F.lit(1))
    bucket = F.when(in_big, F.ceil(i / big)).otherwise(
        rem
        + F.ceil(
            (i - (rem * (base + F.lit(1))).cast("double"))
            / F.greatest(base, F.lit(1)).cast("double")
        )
    )
    return bucket.cast("int")


def grouped_ntile(
    df: DataFrame,
    sort_exprs: Sequence[Column],
    k: int,
    out_name: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """ntile(k) over ``sort_exprs`` within each group (global when
    ``group_cols`` is empty), built on :func:`ranked_global` — the
    scale-safe replacement for ``ntile(k).over(Window.orderBy(...))``.
    """
    ranked = ranked_global(
        df, sort_exprs, group_cols, rank_name="_ntile_rank", total_name="_ntile_n"
    )
    return ranked.withColumn(
        out_name, ntile_from_rank(F.col("_ntile_rank"), F.col("_ntile_n"), k)
    ).drop("_ntile_rank", "_ntile_n")


def ranked_prefix_sum(
    df: DataFrame,
    sort_exprs: Sequence[Column],
    value_col: str,
    cum_name: str = "cum",
    total_name: str = "total",
) -> DataFrame:
    """Exact global INCLUSIVE prefix sum of ``value_col`` over
    ``sort_exprs`` — the scale-safe replacement for
    ``SUM(v) OVER (ORDER BY ...)`` with no partition (which plans an
    Exchange SinglePartition).  Same two-phase shape as
    :func:`ranked_global`: range-partition on the sort key, local
    running sum per partition, then broadcast per-partition totals as
    offsets.  Every row also carries the grand total.

    ``value_col`` should be an exact type (long / DECIMAL) so the
    distributed fold is order-insensitive."""
    part = df.repartitionByRange(*sort_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    lw = (
        Window.partitionBy("_pid")
        .orderBy(*sort_exprs)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = part.withColumn("_lcum", F.sum(value_col).over(lw)).localCheckpoint()

    sums = local.groupBy("_pid").agg(F.sum(value_col).alias("_pn"))
    lower = sums.select(
        F.col("_pid").alias("_bpid"), F.col("_pn").alias("_bpn")
    )
    offs = (
        sums.join(F.broadcast(lower), F.col("_bpid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.sum("_bpn").alias("_off"))
    )
    tot = sums.agg(F.sum("_pn").alias(total_name))
    return (
        local.join(F.broadcast(offs), "_pid")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            cum_name,
            F.col("_lcum") + F.coalesce(F.col("_off"), F.lit(0)),
        )
        .drop("_pid", "_lcum", "_off")
    )


def ranked_prefix_max(
    df: DataFrame,
    sort_exprs: Sequence[Column],
    value_col: str,
    cum_name: str = "cum_max",
) -> DataFrame:
    """Exact global INCLUSIVE prefix max of ``value_col`` over
    ``sort_exprs`` — the streaming-watermark shape (max event-time seen
    so far in arrival order) without a single-partition window.  Same
    two-phase recipe as :func:`ranked_prefix_sum` with max in place of
    sum (max is associative, so partition offsets compose the same
    way)."""
    part = df.repartitionByRange(*sort_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    lw = (
        Window.partitionBy("_pid")
        .orderBy(*sort_exprs)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = part.withColumn("_lmax", F.max(value_col).over(lw)).localCheckpoint()

    maxes = local.groupBy("_pid").agg(F.max(value_col).alias("_pm"))
    lower = maxes.select(
        F.col("_pid").alias("_bpid"), F.col("_pm").alias("_bpm")
    )
    offs = (
        maxes.join(F.broadcast(lower), F.col("_bpid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.max("_bpm").alias("_off"))
    )
    return (
        local.join(F.broadcast(offs), "_pid")
        .withColumn(
            cum_name,
            F.when(
                F.col("_off").isNull(), F.col("_lmax")
            ).otherwise(F.greatest(F.col("_lmax"), F.col("_off"))),
        )
        .drop("_pid", "_lmax", "_off")
    )


def avg_rank2(
    df: DataFrame,
    value_col: str,
    tiebreak: Sequence[Column],
    out_name: str = "avg2",
) -> DataFrame:
    """Twice the tie-averaged (fractional) rank of ``value_col``, as an
    exact long — the quantity every rank statistic (Spearman rho,
    Kruskal-Wallis H, Mann-Whitney U) is built from, with no
    single-partition window anywhere in the plan.

    avg_rank(v) = min_rank(v) + (ties(v) - 1) / 2, so
    2*avg_rank(v) = 2*min_rank(v) + ties(v) - 1 is an integer; keeping
    the doubled value exact means downstream moment sums can run in
    DECIMAL (order-insensitive) and only the final statistic touches
    float64.

    Plan shape: :func:`ranked_global` row_number over
    (value, tiebreak) — range-partitioned two-phase rank — then one
    window partitioned BY THE VALUE (min rank + tie count per distinct
    value; values are hash-distributed, so no funnel).  ``tiebreak``
    must make the sort total; it only disambiguates equal values and
    cancels out of the tie-averaged result.
    """
    ranked = ranked_global(
        df, [F.col(value_col).asc(), *tiebreak], rank_name="_ar_rank"
    )
    vw = Window.partitionBy(value_col)
    return ranked.withColumn(
        out_name,
        (
            F.lit(2) * F.min("_ar_rank").over(vw)
            + F.count(F.lit(1)).over(vw)
            - F.lit(1)
        ).cast("long"),
    ).drop("_ar_rank")


def ordered_cdf(
    df: DataFrame,
    sort_exprs: Sequence[Column],
    value_cols: Sequence[str],
    rank_name: str = "grank",
    suffix: str = "_cum",
) -> DataFrame:
    """One two-phase pass producing BOTH the exact global row_number
    (``rank_name``) and the exact inclusive prefix sum of every column
    in ``value_cols`` (as ``<col><suffix>``) over ``sort_exprs`` — the
    empirical-CDF primitive (sorted support + cumulative masses) with
    no single-partition window.

    Same recipe as :func:`ranked_prefix_sum`, but rank and all the
    sums share one range partitioning, one local-window stage and one
    broadcast offsets table, instead of N separate passes.  Sum
    columns should be exact types (long / DECIMAL)."""
    part = df.repartitionByRange(*sort_exprs).withColumn(
        "_pid", F.spark_partition_id()
    )
    lw = (
        Window.partitionBy("_pid")
        .orderBy(*sort_exprs)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = part.withColumn("_lrank", F.row_number().over(lw).cast("long"))
    for c in value_cols:
        local = local.withColumn(f"_l_{c}", F.sum(c).over(lw))
    local = local.localCheckpoint()

    aggs = [F.count(F.lit(1)).cast("long").alias("_pn_rows")] + [
        F.sum(c).alias(f"_pn_{c}") for c in value_cols
    ]
    sums = local.groupBy("_pid").agg(*aggs)
    lower = sums.select(
        F.col("_pid").alias("_bpid"),
        F.col("_pn_rows").alias("_bpn_rows"),
        *[F.col(f"_pn_{c}").alias(f"_bpn_{c}") for c in value_cols],
    )
    offs = (
        sums.join(F.broadcast(lower), F.col("_bpid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(
            F.coalesce(F.sum("_bpn_rows"), F.lit(0)).cast("long").alias("_off_rows"),
            *[F.sum(f"_bpn_{c}").alias(f"_off_{c}") for c in value_cols],
        )
    )
    out = local.join(F.broadcast(offs), "_pid").withColumn(
        rank_name, (F.col("_off_rows") + F.col("_lrank")).cast("long")
    )
    for c in value_cols:
        out = out.withColumn(
            c + suffix, F.col(f"_l_{c}") + F.coalesce(F.col(f"_off_{c}"), F.lit(0))
        )
    drop = ["_pid", "_lrank", "_off_rows"]
    drop += [f"_l_{c}" for c in value_cols] + [f"_off_{c}" for c in value_cols]
    return out.drop(*drop)
