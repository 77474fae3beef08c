"""Registry contract guards: every oracle parses in DuckDB, names are
consistent, and the driver-order rotation references real queries.
Pure metadata checks — no Spark jobs, so this file runs in seconds and
catches oracle SQL typos before the round gate does."""

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
