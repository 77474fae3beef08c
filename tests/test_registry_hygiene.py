"""Registry contract guards: every oracle parses in DuckDB, names are
consistent, the driver-order rotation references real queries, and no
declared query emits a complex-typed output column (the driver-canon
hashability contract).  All checks but the schema walk are pure
metadata (no Spark jobs); the schema walk builds each non-stream plan
at sf0.001 once."""

from __future__ import annotations

import duckdb
import pytest

from simple_vector_spark import registry

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_driver_recorded_names_exist():
    missing = registry._DRIVER_RECORDED - set(registry._QUERIES)
    assert not missing, f"rotation references unknown queries: {missing}"


def test_every_oracle_has_a_query():
    dangling = set(registry._ORACLES) - set(registry._QUERIES)
    assert not dangling


def test_rotation_puts_unrecorded_first():
    order = list(registry.queries())
    seen_recorded = False
    for n in order:
        if n in registry._DRIVER_RECORDED:
            seen_recorded = True
        else:
            assert not seen_recorded, f"unrecorded query {n} after recorded ones"


def test_all_oracles_parse_in_duckdb(con):
    bad = {}
    for name, sql in registry._ORACLES.items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as ex:  # noqa: BLE001
            bad[name] = str(ex).splitlines()[0]
    assert not bad, f"oracles failing to parse: {bad}"


def test_no_complex_typed_output_columns(spark, sf_dir):
    """Driver-canon contract: the round gate hashes results through
    pandas ``sort_values`` over every column, and list/dict cells are
    unhashable there — so NO declared query may emit an array, map, or
    struct column (r04's only red row, ``text_inverted_postings``,
    was exactly this hazard).  Builds every non-stream declared query
    at sf0.001 and walks the analyzed schema; streams are excluded
    (constructing them runs checkpointed jobs) but all were
    driver-green in r04 with flat schemas."""
    from pyspark.sql import types as T

    offenders = {}
    for name, fn in registry._QUERIES.items():
        if name.startswith("stream_"):
            continue
        df = fn(spark, sf_dir)
        bad = [
            f.name
            for f in df.schema.fields
            if isinstance(
                f.dataType, (T.ArrayType, T.MapType, T.StructType)
            )
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "queries emitting complex-typed columns (driver canonicalizer "
        f"cannot hash them): {offenders}"
    )


def test_no_duplicate_query_names_in_source():
    # @query registration is a dict write, so a re-used name silently
    # SHADOWS the earlier query; catch collisions at the source level.
    import pathlib
    import re

    pkg = (
        pathlib.Path(__file__).parent.parent
        / "simple_vector_spark"
        / "registry"
    )
    names = []
    for f in sorted(pkg.glob("*.py")):
        names += re.findall(r'@query\(\s*\n?\s*"([^"]+)"', f.read_text())
    assert len(names) > 500, "registry package parts not found"
    dupes = {n for n in names if names.count(n) > 1}
    assert not dupes, f"duplicate @query names: {sorted(dupes)}"
