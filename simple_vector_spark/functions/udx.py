"""User-defined extension surface beyond scalar pandas UDFs: a Python
UDTF (table function, used via SQL LATERAL) and a grouped-aggregate
pandas UDAF.

The reference has no extension surface at all (SURVEY.md §2.2 UDF
row); these are north-star additions that exercise the remaining two
UDF shapes Spark offers:

- UDTF: one input row -> many output rows, schema declared up front.
  Runs as a Python worker per partition — the per-row fan-out happens
  distributed, never on the driver.
- GROUPED_AGG pandas UDF: the whole group's column arrives as ONE
  pandas Series per group (no partial aggregation) — use only when the
  aggregate genuinely can't be expressed with built-ins, and keep the
  kernel order-insensitive (here: a median over integers, exact).
"""

from __future__ import annotations

import pandas

from pyspark.sql.functions import pandas_udf, udtf


@udtf(returnType="start int, chunk_tok int")
class ChunkUDTF:
    """Emit (start, chunk_tok) for each size-128/stride-96 context
    window of a token count — the chunking rule of
    operators/curation.py:chunk_audit as a table function.  eval()
    receives one row's n_tok and yields its chunks; Spark runs it
    inside the scan stage, so the fan-out is distributed exactly like
    the explode() form."""

    SIZE = 128
    STRIDE = 96

    def eval(self, n_tok: int):  # noqa: A003 - UDTF contract name
        if n_tok is None or n_tok < 1:
            return
        start = 1
        while start <= n_tok:
            yield start, min(self.SIZE, n_tok - start + 1)
            start += self.STRIDE


@pandas_udf("double")
def median_agg(v: pandas.Series) -> float:
    """Exact median as a grouped-agg pandas UDF.  Order-insensitive by
    construction (sorting is internal to the median), exact over
    integer inputs — safe to hash-compare against a SQL oracle's
    median()."""
    return float(v.median())
