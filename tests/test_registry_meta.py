"""Registry-level guards: every query has a DuckDB-parseable oracle,
the bench and correctness-window name lists resolve, and the driver
contract exposes exactly the registry."""

import duckdb
import pytest

from storagetapper_spark.plans import registry

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS "
              f"SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


# Empty since round 8: the three approx twins carry ε-certificate
# oracles (round 7) and sample_pack_sequences carries an FFD-invariant
# certificate oracle (round 8) — every registered query now has oracle
# SQL.  Kept as a set so any future genuinely-unoracleable query must
# be listed here explicitly.
ROWS_ONLY: set[str] = set()


def test_every_query_has_an_oracle():
    missing = set(registry.QUERIES) - set(registry.ORACLES) - ROWS_ONLY
    assert not missing, f"queries without oracle SQL: {sorted(missing)}"


def test_all_oracles_parse_in_duckdb(con):
    # EXPLAIN parses + binds without executing — catches syntax drift
    # and schema mismatches in seconds instead of a full check.py run
    bad = {}
    for name, sql in registry.ORACLES.items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad[name] = str(e).splitlines()[0]
    assert not bad, bad


def test_bench_names_resolve():
    import bench

    unknown = [n for n in bench.BENCH_QUERIES if n not in registry.QUERIES]
    assert not unknown, unknown
    assert len(set(bench.BENCH_QUERIES)) == len(bench.BENCH_QUERIES)


def test_check_window_is_exactly_fifty():
    assert len(registry._CHECK_FIRST) == 50
    assert list(registry.QUERIES)[:50] == registry._CHECK_FIRST


def test_driver_contract_mirrors_registry():
    import __spark_entry__ as e

    assert set(e.queries()) == set(registry.QUERIES)
    assert set(e.oracle_sql()) == set(registry.ORACLES)
