"""Declared-query registry: the driver contract surface.

Every implemented operator from SURVEY.md §2 is registered here as
(name, spark_callable, duckdb_oracle_sql).  ``__spark_entry__.py``
re-exports this as ``queries()`` / ``oracle_sql()``.

Determinism rules (FIXTURES.md §C): distances/similarities are computed
in float64 (both engines cast FLOAT[] -> DOUBLE[]), ROUNDed to 6
decimals, and ranked on the rounded value with an id tiebreak; money
aggregates use DECIMAL arithmetic (exact, order-insensitive); COUNTs
cast to BIGINT; window ranks cast to INT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import knn as K
from .operators import mutation as M
from .sources.loaders import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# --------------------------------------------------------------------------
# Shared parameters (fixed so Spark + oracle agree).
# --------------------------------------------------------------------------
KNN_K = 10
BATCH_K = 5
N_QUERIES = 8  # batch search: query vectors = embeddings with vec_id < 8
FILTER_LABEL = 7  # the int_field analog (FIXTURES.md: label == int_field)
LOOKUP_IDS = [7, 42, 99]
DELETE_MOD = 10  # tombstones: vec_id % 10 == 0

# DuckDB fragment: per-(corpus row, query row) parallel-unnest of the two
# double-cast vectors; DuckDB zips parallel unnests positionally, giving
# one row per dimension — SUM() then folds exactly the same f64 terms
# Spark's aggregate() folds.
_PAIR_L2 = "ROUND(SUM((x - y) * (x - y)), 6)"
_PAIR_IP = "ROUND(SUM(x * y), 6)"
_PAIR_COS = "ROUND(SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))), 6)"


def _single_query_oracle(score: str, order: str, where: str = "TRUE") -> str:
    return f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
),
pairs AS (
  SELECT e.vec_id, e.label,
         unnest(CAST(e.embedding AS DOUBLE[])) AS x,
         unnest(q.qv) AS y
  FROM embeddings e CROSS JOIN q
  WHERE {where}
),
d AS (
  SELECT vec_id, label, {score} AS {order.split()[0]}
  FROM pairs GROUP BY vec_id, label
)
SELECT * FROM d ORDER BY {order}, vec_id LIMIT {KNN_K}
"""


# --------------------------------------------------------------------------
# Reference query surface: exact k-NN (O3/O5/O9)
# --------------------------------------------------------------------------
@query("knn_exact_topk", _single_query_oracle(_PAIR_L2, "dist ASC"))
def knn_exact_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/O9: brute-force squared-L2 top-k, query = embedding of vec_id 0.
    Plan: broadcast 1-row query x corpus scan -> TakeOrderedAndProject."""
    emb = load_table(spark, sf_dir, "embeddings")
    return K.knn_topk(emb, emb.filter(F.col("vec_id") == 0), KNN_K, "sqL2")


@query("knn_ip_topk", _single_query_oracle(_PAIR_IP, "sim DESC"))
def knn_ip_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: inner-product metric — similarity, larger=better, DESC order
    (FAISS METRIC_INNER_PRODUCT convention)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return K.knn_topk(emb, emb.filter(F.col("vec_id") == 0), KNN_K, "ip")


@query("knn_cosine_topk", _single_query_oracle(_PAIR_COS, "sim DESC"))
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension of O5: cosine = IP / norms, computed directly."""
    emb = load_table(spark, sf_dir, "embeddings")
    return K.knn_topk(emb, emb.filter(F.col("vec_id") == 0), KNN_K, "cosine")


# --------------------------------------------------------------------------
# Filtered k-NN (O6/O7/O8): pre-filter semantics
# --------------------------------------------------------------------------
@query(
    "knn_filtered_eq",
    _single_query_oracle(_PAIR_L2, "dist ASC", where=f"e.label = {FILTER_LABEL}"),
)
def knn_filtered_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6+O8: ``label = v`` pushed below the ranking — k valid results,
    mirroring the reference's bitmap pre-filter (src/faiss_index.cc:40-47)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return K.knn_topk(
        emb,
        emb.filter(F.col("vec_id") == 0),
        KNN_K,
        "sqL2",
        pred=K.eq_filter("label", FILTER_LABEL),
    )


@query(
    "knn_filtered_ne",
    _single_query_oracle(
        _PAIR_L2,
        "dist ASC",
        where=f"e.label IS NOT NULL AND e.label != {FILTER_LABEL}",
    ),
)
def knn_filtered_ne(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7+O8: reference ``!=`` = union of all other values' bitmaps =>
    field must be present AND differ (src/filter_index.cc:70-79)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return K.knn_topk(
        emb,
        emb.filter(F.col("vec_id") == 0),
        KNN_K,
        "sqL2",
        pred=K.ne_filter("label", FILTER_LABEL),
    )


# --------------------------------------------------------------------------
# Batch k-NN join (O15)
# --------------------------------------------------------------------------
@query(
    "knn_batch_join",
    f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
         unnest(CAST(e.embedding AS DOUBLE[])) AS x,
         unnest(CAST(q.embedding AS DOUBLE[])) AS y
  FROM embeddings q CROSS JOIN embeddings e
  WHERE q.vec_id < {N_QUERIES}
),
d AS (
  SELECT query_id, vec_id, {_PAIR_L2} AS dist
  FROM pairs GROUP BY query_id, vec_id
),
r AS (
  SELECT query_id, vec_id, dist,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS INT) AS rnk
  FROM d
)
SELECT query_id, vec_id, dist, rnk FROM r WHERE rnk <= {BATCH_K}
""",
)
def knn_batch_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O15: multi-query batch search as a broadcast k-NN join; window
    rank-limit => WindowGroupLimit partial top-k before the shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = K.knn_join(emb, emb.filter(F.col("vec_id") < N_QUERIES), BATCH_K, "sqL2")
    return out.select("query_id", "vec_id", "dist", "rnk")


# --------------------------------------------------------------------------
# Point lookup + metadata projection (O10/O21)
# --------------------------------------------------------------------------
@query(
    "point_lookup",
    f"""
SELECT e.vec_id, e.label, d.lang, d.source, d.n_chars
FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
WHERE e.vec_id IN ({", ".join(str(i) for i in LOOKUP_IDS)})
""",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10+O21: point fetch by id, full record projected back via a
    broadcast equi-join to the doc-store table (RocksDB-get analog)."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    hits = K.point_lookup(emb, LOOKUP_IDS)
    return hits.join(
        F.broadcast(docs), hits.vec_id == docs.doc_id, "inner"
    ).select("vec_id", "label", "lang", "source", "n_chars")


# --------------------------------------------------------------------------
# Mutation semantics (O12/O13/O20)
# --------------------------------------------------------------------------
@query(
    "upsert_latest_wins",
    """
SELECT user_id, event_id, event_type, value FROM (
  SELECT user_id, event_id, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def upsert_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13+O20: the events table is the WAL; current state = latest row
    per key (one shuffle-by-key window, WindowGroupLimit partial)."""
    events = load_table(spark, sf_dir, "events")
    cur = M.latest_wins(events, ["user_id"], ["ts", "event_id"])
    return cur.select("user_id", "event_id", "event_type", "value")


@query(
    "delete_then_count",
    f"""
SELECT label, CAST(COUNT(*) AS BIGINT) AS n
FROM embeddings
WHERE NOT (vec_id % {DELETE_MOD} = 0)
GROUP BY label
""",
)
def delete_then_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O12: delete = anti-filter (tombstone pattern); verified via a
    post-delete aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    alive = M.delete_ids(emb, F.col("vec_id") % DELETE_MOD == 0)
    return alive.groupBy("label").agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# Relational extensions (SURVEY.md §2.2: joins/aggs/windows/set-ops are
# absent from the reference; first-class here).
# --------------------------------------------------------------------------
from .operators import events as E  # noqa: E402
from .operators import relational as R  # noqa: E402

_DEC_PRICE_SQL = "CAST(l_extendedprice AS DECIMAL(15,2))"
_DEC_DISC_SQL = "(CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)))"
_DEC_TAX_SQL = "(CAST(1 AS DECIMAL(8,6)) + CAST(l_tax AS DECIMAL(8,6)))"


@query(
    "tpch_q1_pricing",
    f"""
WITH src AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS DECIMAL(15,2)) AS qty,
         {_DEC_PRICE_SQL} AS price,
         CAST({_DEC_PRICE_SQL} * {_DEC_DISC_SQL} AS DECIMAL(28,8)) AS disc_price,
         CAST({_DEC_PRICE_SQL} * {_DEC_DISC_SQL} AS DECIMAL(28,8)) * {_DEC_TAX_SQL} AS charge
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
  ROUND(CAST(SUM(qty) AS DOUBLE), 2) AS sum_qty,
  ROUND(CAST(SUM(price) AS DOUBLE), 2) AS sum_base_price,
  ROUND(CAST(SUM(disc_price) AS DOUBLE), 4) AS sum_disc_price,
  ROUND(CAST(SUM(charge) AS DOUBLE), 4) AS sum_charge,
  ROUND(CAST(SUM(qty) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
  ROUND(CAST(SUM(price) AS DOUBLE) / COUNT(*), 6) AS avg_price,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM src GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing(spark, sf_dir):
    """TPC-H Q1 shape: pushed-down date filter + two-key agg, exact
    DECIMAL money math (order-insensitive under partial aggregation)."""
    return R.pricing_summary(load_table(spark, sf_dir, "lineitem"))


@query(
    "revenue_by_nation",
    """
SELECT r_name, n_name,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE), 2) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r_name, n_name
""",
)
def revenue_by_nation(spark, sf_dir):
    """Star join with broadcast dims (nation/region)."""
    return R.revenue_by_nation(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@query(
    "rollup_revenue",
    """
SELECT r_name, n_name,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE), 2) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r_name, n_name)
""",
)
def rollup_revenue(spark, sf_dir):
    """Grouping-set rollup: region -> nation -> grand total."""
    return R.rollup_revenue(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@query(
    "top_orders_per_customer",
    """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 3
""",
)
def top_orders_per_customer(spark, sf_dir):
    """Per-group top-k window (rank-limit; WindowGroupLimit partials)."""
    return R.top_orders_per_customer(load_table(spark, sf_dir, "orders"), 3)


@query(
    "customers_without_orders",
    "SELECT c_custkey AS custkey FROM customer "
    "EXCEPT SELECT o_custkey AS custkey FROM orders",
)
def customers_without_orders(spark, sf_dir):
    """Set difference (EXCEPT DISTINCT)."""
    return R.customers_without_orders(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@query(
    "customers_with_orders",
    "SELECT c_custkey AS custkey FROM customer "
    "INTERSECT SELECT o_custkey AS custkey FROM orders",
)
def customers_with_orders(spark, sf_dir):
    """Set intersection (INTERSECT DISTINCT)."""
    return R.customers_with_orders(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@query(
    "asof_join_checkpoints",
    """
WITH cp AS (
  SELECT user_id, ts, event_id AS cp_event_id, value AS cp_value
  FROM events WHERE event_id % 5 = 0
)
SELECT e.user_id, e.event_id, cp.cp_event_id, cp.cp_value
FROM events e ASOF LEFT JOIN cp
  ON e.user_id = cp.user_id AND e.ts >= cp.ts
""",
)
def asof_join_checkpoints(spark, sf_dir):
    """Keyed as-of join (Spark has no native ASOF; composed as
    tag+union+running last(ignoreNulls) — ONE shuffle by key).  Every
    event is matched to its user's latest checkpoint event at-or-before
    its timestamp; DuckDB's native ASOF JOIN is the oracle."""
    ev = load_table(spark, sf_dir, "events")
    left = ev.select("user_id", "ts", "event_id")
    right = ev.filter(F.col("event_id") % 5 == 0).select(
        "user_id",
        "ts",
        F.col("event_id").alias("cp_event_id"),
        F.col("value").alias("cp_value"),
    )
    out = R.asof_join(left, right, ["user_id"], "ts", ["cp_event_id", "cp_value"])
    return out.select("user_id", "event_id", "cp_event_id", "cp_value")


# --------------------------------------------------------------------------
# Event-log extensions: JSON extraction + time windows
# --------------------------------------------------------------------------
@query(
    "events_json_kv",
    """
WITH kv AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(k) AS BIGINT) AS sum_k,
  ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(k), 6) AS avg_k
FROM kv GROUP BY event_type
""",
)
def events_json_kv(spark, sf_dir):
    """JSON path extraction over free-form props (the reference's
    auto-indexed int JSON members, src/vector_database.cc:119-138)."""
    return E.json_kv_stats(load_table(spark, sf_dir, "events"))


@query(
    "events_tumbling_1h",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
FROM events GROUP BY 1, 2
""",
)
def events_tumbling_1h(spark, sf_dir):
    """Tumbling 1h window agg (batch form; the availableNow streaming
    run in streaming/jobs.py must produce exactly this)."""
    return E.tumbling_agg(load_table(spark, sf_dir, "events"), "1 hour")


@query(
    "events_sliding_2h",
    """
WITH expanded AS (
  SELECT date_trunc('hour', ts) - o * INTERVAL 1 HOUR AS bucket_ts, value
  FROM events, unnest([0, 1]) AS t(o)
)
SELECT strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
FROM expanded GROUP BY 1
""",
)
def events_sliding_2h(spark, sf_dir):
    """Sliding window (2h width, 1h slide): each event in 2 windows."""
    return E.sliding_agg(load_table(spark, sf_dir, "events"), "2 hours", "1 hour")
