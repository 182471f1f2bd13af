"""Oracle-parity tests for every registry query (the local mirror of the
driver's CORRECTNESS gate, at sf0.001 for speed; the driver runs sf0.01)."""

import pytest

from mariadb_postgres_migration_spark.registry import REGISTRY, load_all_query_modules
from tests.oracle import compare, duck_connection

load_all_query_modules()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, sf_dir, duck, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, mirroring the driver
    else:
        compare(df, duck, q.oracle, name)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
