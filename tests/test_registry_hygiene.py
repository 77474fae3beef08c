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


def test_driver_recorded_matches_correctness_artifacts():
    """The rotation's _DRIVER_RECORDED set must equal the union of
    names the driver actually recorded across the committed
    CORRECTNESS_r*.json artifacts (hash-green, or the r02-era
    rows-only 'no_oracle' checks) — the round-start bookkeeping this
    enforces is what keeps the ~50-record/round rotation landing on
    never-checked queries.  Renamed queries map through the alias
    table."""
    import json
    import pathlib

    aliases = {"ann_ivf_trained": "ann_ivf"}  # renamed in round 3
    root = pathlib.Path(__file__).parent.parent
    derived: set[str] = set()
    for f in sorted(root.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(f.read_text()).items():
            green = row.get("hash_match") is True
            rows_only = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if green or rows_only:
                derived.add(aliases.get(name, name))
    assert derived, "no CORRECTNESS artifacts found"
    # _REFRONTED: names with a green artifact row that no longer
    # certifies the current code (output schema / semantics changed
    # since it was recorded) — deliberately subtracted from
    # _DRIVER_RECORDED so the driver re-records them.
    missing = derived - registry._DRIVER_RECORDED - registry._REFRONTED
    stale = registry._DRIVER_RECORDED - derived
    assert not missing, (
        f"driver-green names not yet appended to _DRIVER_RECORDED "
        f"(round-start bookkeeping): {sorted(missing)}"
    )
    assert not stale, (
        f"_DRIVER_RECORDED names with no green artifact row: "
        f"{sorted(stale)}"
    )


def test_no_complex_or_decimal_typed_output_columns(spark, sf_dir):
    """Driver-canon contract: the round gate hashes results through
    pandas ``sort_values`` over every column, and list/dict cells are
    unhashable there — so NO declared query may emit an array, map, or
    struct column (r04's only red row, ``text_inverted_postings``,
    was exactly this hazard).  DecimalType finals are banned too:
    r05's only red row (``aqe_skew_join``, decimal(38,2)) diverged at
    the driver-canon layer despite exact value equality in both
    engines (DuckDB->pandas renders DECIMAL as float64 while
    Spark->pandas yields ``decimal.Decimal`` objects) — DECIMAL stays
    internal for exact money folds and crosses the boundary as an
    explicitly cast double/long.  Builds every non-stream declared
    query at sf0.001 and walks the analyzed schema; streams are
    excluded (constructing them runs checkpointed jobs) but all were
    driver-green in r04 with flat schemas."""
    from pyspark.sql import types as T

    offenders = {}
    for name, fn in registry._QUERIES.items():
        if name.startswith("stream_"):
            continue
        df = fn(spark, sf_dir)
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(
                f.dataType,
                (T.ArrayType, T.MapType, T.StructType, T.DecimalType),
            )
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "queries emitting complex- or decimal-typed columns (driver "
        f"canonicalizer hazard): {offenders}"
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


def test_bench_warm_set_names_exist():
    """bench.py guards its warm-up list with ``if wq in qs`` so a
    renamed query silently stops being warmed — and the family it was
    pre-compiling (Python worker pool, tokenize codegen, tile kernels)
    then pays its one-time cost inside a timed lap, which reads as a
    phantom regression.  Pin every warm name to a real registry
    entry."""
    import pathlib
    import re

    src = (pathlib.Path(__file__).parent.parent / "bench.py").read_text()
    warm = re.findall(
        r'"((?:knn|tpch|vocab|dedup|embedding|ann|part)[a-z0-9]*_[a-z0-9_]*)"',
        src,
    )
    assert len(warm) >= 10, f"bench warm set not found (got {warm})"
    missing = [w for w in warm if w not in registry._QUERIES]
    assert not missing, f"bench.py warms unknown queries: {missing}"
