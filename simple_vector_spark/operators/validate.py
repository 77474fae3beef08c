"""Ingest validation — the reference's request-validation layer (O2).

The reference checks presence/type of ``id`` and ``vectors`` per HTTP
request (src/http_server.cc:43-64 ``isRequestValid``) but never checks
vector dimension against the index (SURVEY.md §1.2 flags this gap: dim
is fixed at init and unvalidated).  The Spark engine makes validation a
first-class scan-stage operator: classify every record, report counts,
and let the pipeline route rejects to quarantine instead of corrupting
the corpus.

Scale: a single map-side classification expression + one tiny
aggregation — no shuffle of the data itself; the classified frame can
be written out partitioned by status for quarantine handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def classify(
    emb_df: DataFrame, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> Column:
    """Validation status expression: 'ok' | 'null_id' | 'null_vec' |
    'bad_dim'.  Evaluation order mirrors the reference's check order
    (id first, then vectors — src/http_server.cc:46-60)."""
    return (
        F.when(F.col(id_col).isNull(), F.lit("null_id"))
        .when(F.col(vec_col).isNull(), F.lit("null_vec"))
        .when(F.size(F.col(vec_col)) != dim, F.lit("bad_dim"))
        .otherwise(F.lit("ok"))
    )


def validation_report(
    emb_df: DataFrame, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-status counts + smallest offending id (for triage)."""
    return (
        emb_df.withColumn("status", classify(emb_df, dim, id_col, vec_col))
        .groupBy("status")
        .agg(
            F.count("*").alias("n"),
            F.min(id_col).alias("min_id"),
        )
    )


def valid_rows(
    emb_df: DataFrame, dim: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """The pass-through side: rows safe to index."""
    return emb_df.filter(
        classify(emb_df, dim, id_col, vec_col) == F.lit("ok")
    )


FK_EDGES = (
    # (name, child table, child key, parent table, parent key)
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
)


def fk_orphan_audit(tables: dict[str, DataFrame]) -> DataFrame:
    """Referential-integrity audit across the star schema: for every
    declared FK edge, the child row count and the number of orphans
    (child keys with no parent) — the dbt-style relationship test, as
    one engine query.

    Scale: each edge is child LEFT ANTI JOIN parent on the key.  The
    parent side is keys-only (column-pruned to one column, distinct at
    dim size), so Catalyst broadcasts every dim-sized parent and the
    two fact-sized edges (orders, part) hash-join after a key-only
    dedup; no edge ever shuffles more than the child keys."""
    import functools

    from pyspark.sql import functions as F

    parts = []
    for name, child_t, child_k, parent_t, parent_k in FK_EDGES:
        child = tables[child_t].select(F.col(child_k).alias("k"))
        parent = tables[parent_t].select(F.col(parent_k).alias("k")).distinct()
        orphans = child.join(parent, "k", "left_anti")
        parts.append(
            child.agg(
                F.lit(name).alias("fk"),
                F.count("*").cast("long").alias("n_child_rows"),
            ).crossJoin(
                orphans.agg(F.count("*").cast("long").alias("n_orphans"))
            )
        )
    return functools.reduce(lambda a, b: a.unionByName(b), parts)


FINGERPRINT_MOD = 2305843009213693951  # 2^61 - 1, Mersenne


def table_fingerprint(df: DataFrame, cols: list, name: str) -> DataFrame:
    """Order-insensitive content fingerprint of a table: sum (mod
    2^61-1) of a 32-bit hash of each row's canonical string — the
    replica-comparison primitive: two copies of a 100-TB table compare
    by exchanging ONE number each, no sort, no co-shuffle, and the sum
    is associative so partial fingerprints merge map-side.

    Callers pass canonically-cast columns (DECIMAL-rendered money,
    never raw doubles) so the string form is engine-portable."""
    from pyspark.sql import functions as F

    from ..functions.text import md5_int

    row_str = F.concat_ws("|", *cols)
    h = md5_int(row_str)
    return df.agg(
        F.lit(name).alias("table_name"),
        F.count("*").cast("long").alias("n_rows"),
        (
            F.sum(h.cast("decimal(38,0)")).cast("decimal(38,0)")
            % FINGERPRINT_MOD
        )
        .cast("long")
        .alias("fingerprint"),
    )


REPLICA_BUCKETS = 256
REPLICA_TAMPER_MOD = 1009  # planted divergence: o_orderkey % 1009 == 0


def replica_bucket_diff(orders: DataFrame) -> DataFrame:
    """Merkle-style anti-entropy: two replicas of the orders table
    (replica B carries a planted status mutation on o_orderkey %
    {REPLICA_TAMPER_MOD} == 0) are fingerprinted PER HASH BUCKET; only
    buckets whose fingerprints disagree are reported — the narrowing
    step a replica-repair protocol runs before exchanging any rows.
    At 100 TB each side computes 256 numbers map-side; the comparison
    moves 256 rows.

    Output: the differing buckets with both fingerprints and row
    counts (row counts match here — the corruption is an update, the
    nastier case checksums exist to catch)."""
    from pyspark.sql import functions as F

    from ..functions.text import md5_int

    def fp(df: DataFrame, status_col) -> DataFrame:
        row_str = F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            status_col,
            F.col("o_totalprice").cast("decimal(15,2)").cast("string"),
        )
        bucket = (md5_int(F.col("o_orderkey").cast("string")) % REPLICA_BUCKETS).cast("int")
        return df.groupBy(bucket.alias("bucket")).agg(
            F.count("*").cast("long").alias("n_rows"),
            (
                F.sum(md5_int(row_str).cast("decimal(38,0)"))
                .cast("decimal(38,0)")
                % FINGERPRINT_MOD
            )
            .cast("long")
            .alias("fp"),
        )
    a = fp(orders, F.col("o_orderstatus"))
    tampered = F.when(
        F.col("o_orderkey") % REPLICA_TAMPER_MOD == 0, F.lit("X")
    ).otherwise(F.col("o_orderstatus"))
    b = fp(orders, tampered)
    a2 = a.select("bucket", F.col("n_rows").alias("n_rows_a"), F.col("fp").alias("fp_a"))
    b2 = b.select("bucket", F.col("n_rows").alias("n_rows_b"), F.col("fp").alias("fp_b"))
    return (
        a2.join(b2, "bucket")
        .filter(F.col("fp_a") != F.col("fp_b"))
        .select("bucket", "n_rows_a", "n_rows_b", "fp_a", "fp_b")
    )


def id_gap_audit(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Surrogate-key integrity: gaps in the id sequence found WITHOUT a
    global sort — a gap starts at id where id+1 is absent (left-anti
    self-join on the shifted key, hash-partitioned); totals come from
    min/max/count arithmetic.  One summary row: span, present, missing,
    gap-start count."""
    from pyspark.sql import functions as F

    ids = docs.select(F.col(id_col).alias("id"))
    stats = ids.agg(
        F.min("id").alias("_min"),
        F.max("id").alias("_max"),
        F.count("*").cast("long").alias("n_present"),
    )
    # id is a gap start iff (id + 1) is absent, i.e. id never appears
    # in the set shifted down by one
    shifted = ids.select((F.col("id") - 1).alias("id"))
    gap_starts = (
        ids.join(F.broadcast(stats.select("_max")), F.col("id") < F.col("_max"))
        .select("id")
        .join(shifted, "id", "left_anti")
    )
    n_gaps = gap_starts.agg(F.count("*").cast("long").alias("n_gap_starts"))
    return stats.crossJoin(F.broadcast(n_gaps)).select(
        F.col("_min").alias("min_id"),
        F.col("_max").alias("max_id"),
        "n_present",
        (F.col("_max") - F.col("_min") + 1 - F.col("n_present"))
        .cast("long")
        .alias("n_missing"),
        "n_gap_starts",
    )


RANGE_CONSTRAINTS = (
    # (name, column expr SQL-side handled in registry; here col + lo + hi)
    ("l_quantity_1_50", "l_quantity", 1.0, 50.0),
    ("l_discount_0_to_0p1", "l_discount", 0.0, 0.1),
    ("l_tax_0_to_0p08", "l_tax", 0.0, 0.08),
    ("l_extendedprice_pos", "l_extendedprice", 0.0, None),
)


def range_constraint_audit(lineitem: DataFrame) -> DataFrame:
    """dbt accepted_range tests as one engine query: every declared
    (column, lo, hi) contract checked in a single scan — one
    conditional-count aggregate, |constraints| output rows (null
    bounds mean unbounded on that side; NULL values count as
    violations of a range contract)."""
    from pyspark.sql import functions as F

    aggs = [F.count("*").cast("long").alias("n_rows")]
    for name, col, lo, hi in RANGE_CONSTRAINTS:
        c = F.col(col).cast("double")
        ok = c.isNotNull()
        if lo is not None:
            ok = ok & (c >= lo)
        if hi is not None:
            ok = ok & (c <= hi)
        aggs.append(F.sum((~ok).cast("long")).cast("long").alias(name))
    wide = lineitem.agg(*aggs)
    stack = ", ".join(f"'{name}', {name}" for name, *_ in RANGE_CONSTRAINTS)
    return wide.selectExpr(
        "n_rows",
        f"stack({len(RANGE_CONSTRAINTS)}, {stack}) AS (constraint, n_violations)",
    ).select(
        "constraint",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("holds"),
    )


ACCEPTED_VALUES = (
    ("o_orderstatus", ("F", "O", "P")),
    (
        "o_orderpriority",
        ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
    ),
)


def accepted_values_audit(orders: DataFrame) -> DataFrame:
    """dbt accepted_values tests: every declared categorical domain
    checked in one scan — per column, the row count outside the
    declared set (NULLs violate) and the count of distinct offending
    values."""
    from pyspark.sql import functions as F

    parts = []
    for col, allowed in ACCEPTED_VALUES:
        bad = ~F.col(col).isin(*allowed) | F.col(col).isNull()
        parts.append(
            orders.agg(
                F.lit(col).alias("column_name"),
                F.count("*").cast("long").alias("n_rows"),
                F.sum(bad.cast("long")).cast("long").alias("n_violations"),
                F.countDistinct(F.when(bad, F.col(col)))
                .cast("long")
                .alias("n_bad_values"),
            )
        )
    import functools

    return functools.reduce(lambda a, b: a.unionByName(b), parts).select(
        "column_name",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("holds"),
    )


def unit_price_consistency(lineitem: DataFrame) -> DataFrame:
    """Derived-column CONSISTENCY audit: is l_extendedprice /
    l_quantity a stable per-part unit price?  For every part: line
    count, distinct observed unit prices (cents-rounded), and the
    min/max spread — then one summary row per violation class.  This
    is the dbt-style 'derived column honors its formula' contract the
    schema can't express, and the first query a migration runs to
    catch silently-reconstructed columns.

    One shuffle on partkey; unit price is exact DECIMAL division
    rounded to cents inside the scan."""
    from pyspark.sql import functions as F

    unit = F.round(
        F.col("l_extendedprice").cast("decimal(18,6)")
        / F.col("l_quantity").cast("decimal(18,6)"),
        2,
    ).cast("decimal(18,2)")
    per = (
        lineitem.select(F.col("l_partkey").alias("pk"), unit.alias("u"))
        .groupBy("pk")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("u").alias("n_units"),
            F.min("u").alias("lo"),
            F.max("u").alias("hi"),
        )
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum((F.col("n_units") == 1).cast("long"))
        .cast("long")
        .alias("n_consistent"),
        F.round(
            F.sum((F.col("n_units") == 1).cast("long")) / F.count(F.lit(1)), 6
        ).alias("consistent_share"),
        F.max("n_units").cast("long").alias("max_distinct_units"),
        F.round(
            F.max((F.col("hi") - F.col("lo")).cast("double")), 2
        ).alias("max_unit_spread"),
    )


def line_number_integrity(lineitem: DataFrame) -> DataFrame:
    """GROUPED sequence-integrity contract: within every order,
    l_linenumber must run 1..n with no gaps or duplicates (the
    per-group sibling of the global doc_id gap audit).  The check
    needs NO sort: a group satisfies 1..n contiguity iff
    count = distinct count, min = 1 and max = count — four aggregates
    per order key, one shuffle.

    Output: one summary row (orders checked, violations by class) —
    the contract a line-grain ingest must re-establish after any
    repartition/merge step."""
    from pyspark.sql import functions as F

    per = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_linenumber").alias("nd"),
        F.min("l_linenumber").alias("mn"),
        F.max("l_linenumber").alias("mx"),
    )
    dup = F.col("nd") != F.col("n")
    base = F.col("mn") != 1
    gap = (F.col("mx") != F.col("n")) & ~dup & ~base
    ok = ~dup & ~base & (F.col("mx") == F.col("n"))
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(ok.cast("long")).cast("long").alias("n_contiguous"),
        F.sum(dup.cast("long")).cast("long").alias("n_duplicate_lines"),
        F.sum(base.cast("long")).cast("long").alias("n_bad_base"),
        F.sum(gap.cast("long")).cast("long").alias("n_gapped"),
        F.round(F.sum(ok.cast("long")) / F.count(F.lit(1)), 6).alias(
            "contiguous_share"
        ),
    )
