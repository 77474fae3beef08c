"""Text expression builders shared by dedup + text-analysis operators.

All pure ``pyspark.sql.functions`` array/string compositions — JVM-side,
no UDFs, no shuffles.  Cross-engine determinism: the shingle hash is the
first 8 hex chars of md5 parsed as an integer (DuckDB:
``CAST('0x'||substr(md5(s),1,8) AS BIGINT)``) because Spark's
``hash()``/``xxhash64()`` seeds differ from DuckDB's ``hash()``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# MinHash parameters: 8 universal-hash functions h_i(x) = (a_i*x + b_i) mod P,
# banded 2-row x 4 bands for LSH candidate generation.  P = 2^31 - 1;
# a*x stays < 2^63 (x < 2^32, a ~ 1e6).
MINHASH_P = 2_147_483_647
MINHASH_A = [1000003, 1000033, 1000037, 1000039, 1000081, 1000099, 1000117, 1000121]
MINHASH_B = [12345, 23456, 34567, 45678, 56789, 67890, 78901, 89012]
SIMHASH_BITS = 16


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped (split keeps
    trailing empties in both engines; the filter aligns them)."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda x: x != F.lit(""))


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-word shingles joined by single spaces; [] when fewer than n
    tokens."""
    last = F.size(toks) - n
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), last),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def md5_int(col: Column) -> Column:
    """First 8 md5 hex chars as a non-negative int in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _perm(a: int, b: int):
    # Spark inspects the lambda's arity, so defaults like
    # ``lambda x, a=a`` would be mis-read as a 3-arg lambda — bind
    # the constants via a closure instead.
    return lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_P


def minhash_from_hashes(hashed: Column) -> list[Column]:
    """The 8 minhash values of an already-hashed shingle array.

    Callers MUST materialize the md5-hash array in its own projection
    (``select(transform(shingles, md5_int).alias(...))``) and pass the
    column reference here: codegen does not common-subexpression-
    eliminate higher-order-function arguments, so inlining the hash
    expression would recompute every md5 once per hash function
    (measured 6x slower at sf0.1)."""
    return [
        F.array_min(F.transform(hashed, _perm(a, b))).alias(f"mh{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]


def minhash_signature(shingles: Column) -> list[Column]:
    """Single-projection form (hash inlined 8x — prefer the two-step
    ``minhash_from_hashes`` path in anything performance-sensitive)."""
    return minhash_from_hashes(F.transform(shingles, md5_int))


def simhash_from_hashes(hashed: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash fingerprint: bit b of the fingerprint is 1 iff the sum of
    (+1/-1) votes of token-hash bit b is positive.  Bit extraction via
    floor(h / 2^b) % 2 so the same arithmetic runs in DuckDB (token
    hashes < 2^32, so the double division is exact).  Per-row nested
    array expressions — linear scan, no shuffle.

    Takes an already-hashed token array (materialize it in its own
    projection — see ``minhash_from_hashes`` for why)."""

    def bit_votes(b: Column) -> Column:
        return F.aggregate(
            hashed,
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + (F.lit(2) * ((F.floor(x / F.pow(F.lit(2), b)).cast("long")) % 2) - 1),
        )

    return F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda b: F.when(bit_votes(b) > 0, F.pow(F.lit(2), b).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def simhash(toks: Column, bits: int = SIMHASH_BITS) -> Column:
    """Single-projection form (token hash inlined once per bit — prefer
    the two-step ``simhash_from_hashes`` path when it matters)."""
    return simhash_from_hashes(F.transform(toks, md5_int), bits)
