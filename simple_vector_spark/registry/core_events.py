"""Registry part: see package docstring (registration order = file order)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import knn as K
from ..operators import mutation as M
from ..sources.loaders import load_table

from . import query
from .core_relational import E


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


EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@query(
    "events_type_pivot",
    f"""
SELECT user_id,
  {", ".join(f"CAST(COUNT(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}" for t in EVENT_TYPES)}
FROM events GROUP BY user_id
""",
)
def events_type_pivot(spark, sf_dir):
    """PIVOT to per-user wide counts (explicit value list — no
    infer-values distinct pass)."""
    return E.type_pivot(load_table(spark, sf_dir, "events"), EVENT_TYPES)


@query(
    "events_monthly_growth",
    """
WITH m AS (
  SELECT date_trunc('month', ts) AS month_ts,
         CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS s
  FROM events GROUP BY 1
)
SELECT strftime(month_ts, '%Y-%m') AS month, n,
       ROUND(CAST(s AS DOUBLE), 6) AS sum_value,
       ROUND(CAST(s - lag(s) OVER (ORDER BY month_ts) AS DOUBLE), 6) AS growth
FROM m
""",
)
def events_monthly_growth(spark, sf_dir):
    """Monthly rollup + MoM growth via lag window."""
    return E.monthly_value_growth(load_table(spark, sf_dir, "events"))


@query(
    "events_props_typed",
    """
WITH keys AS (
  SELECT unnest(json_keys(props)) AS k, props FROM events
),
kv AS (
  SELECT k, CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS v FROM keys
)
SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       MIN(v) AS min_v, MAX(v) AS max_v
FROM kv GROUP BY k
""",
)
def events_props_typed(spark, sf_dir):
    """Schema-full JSON map parse (from_json -> MAP<STRING,BIGINT>) +
    explode + per-key aggregate."""
    return E.props_typed_extract(load_table(spark, sf_dir, "events"))


@query(
    "events_running_totals",
    """
SELECT user_id, event_id,
  CAST(ROW_NUMBER() OVER w AS BIGINT) AS run_n,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE), 6) AS run_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
""",
)
def events_running_totals(spark, sf_dir):
    """Per-user running aggregates — the continuously-materialized WAL
    view (running frame window, one shuffle by key)."""
    return E.running_totals(load_table(spark, sf_dir, "events"))


@query(
    "events_rolling_1h_avg",
    """
SELECT user_id, event_id,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
        / COUNT(*) OVER w, 6) AS trail_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
""",
)
def events_rolling_1h_avg(spark, sf_dir):
    """Per-user trailing-hour average on a RANGE frame (time-based, not
    row-count — correct under uneven event spacing)."""
    return E.rolling_range_avg(load_table(spark, sf_dir, "events"))


_SESSION_ORACLE = """
WITH o AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
  SELECT user_id, ts, value, event_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
FROM g GROUP BY user_id, sid
"""


@query("events_sessionize", _SESSION_ORACLE)
def events_sessionize(spark, sf_dir):
    """Session windows per user (30-min gap) — batch form; the
    streaming run (stream_sessionize) must produce exactly this.
    Oracle: gaps-and-islands."""
    return E.sessionize(load_table(spark, sf_dir, "events"), "30 minutes")


