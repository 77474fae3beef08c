"""Vector distance/similarity expression builders.

The reference computes distances inside FAISS / hnswlib with two
metrics fixed at index init — squared L2 and inner product
(src/index_factory.cc:16-18, src/hnswlib_index.cc:12-16).  FAISS
``METRIC_L2`` returns *squared* L2 (no sqrt) and IP is returned as a
similarity where larger is better; this engine standardizes on the same
conventions (SURVEY.md §4.2) and adds cosine (= IP over normalized
vectors) as an extension.

These are pure ``pyspark.sql.functions`` higher-order-function
compositions over ``array<double>`` columns — they run JVM-side per row
with no Python in the loop, so a k-NN scan stays inside one Spark stage
reading the Parquet corpus.  All arithmetic is double-precision so the
DuckDB oracle (which casts ``FLOAT[] -> DOUBLE[]``) computes bit-equal
terms; results are compared rounded to 6 decimals (FIXTURES.md §C).

Scale note: at 100 TB the distance expression is evaluated inside the
corpus scan stage (map-side); nothing here shuffles.  If expression
evaluation ever dominates, the drop-in fast path is a Pandas UDF doing
a NumPy matmul per Arrow batch — same signature, same output schema.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column | str) -> Column:
    """Cast array<float> -> array<double> so all arithmetic is f64."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def squared_l2(a: Column, b: Column) -> Column:
    """Squared Euclidean distance (FAISS METRIC_L2 convention: no sqrt)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_product(a: Column, b: Column) -> Column:
    """Inner product similarity (larger = more similar)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity = IP / (|a||b|); the reference approximates this
    by normalizing at ingest and using IP — we compute it directly."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_pandas_udf():
    """Arrow-batched cosine kernel for the SQL UDF surface (the
    reference has no extension point at all — SURVEY.md §2.2 UDF row).
    Whole batches cross the JVM/Python boundary as Arrow arrays and the
    math is one stacked NumPy einsum per batch, never a per-row Python
    call.  Built-in zip_with/aggregate (cosine_similarity above) stays
    the default hot path; this is the escape hatch users register for
    kernels Catalyst can't express."""
    import numpy as np
    import pandas
    from pyspark.sql.functions import pandas_udf

    # NOTE: the annotations below must reference a module-level name
    # ("pandas.Series", not an alias imported into this closure) —
    # PEP 563 turns them into strings and pyspark resolves them against
    # the function's __globals__ when inferring the UDF eval type.
    globals()["pandas"] = pandas

    @pandas_udf("double")
    def cos_sim(a: pandas.Series, b: pandas.Series) -> pandas.Series:
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        return pandas.Series(num / den)

    return cos_sim
