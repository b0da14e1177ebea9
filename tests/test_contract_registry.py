"""Driver-contract registry invariants + the two media gates' oracle
equality, in-suite. Round 4's correctness file silently covered 50 of the
52 registered queries (`media_frame_sample`, `media_features` had no row);
these tests make a silent subset impossible to miss: the registry size is
pinned, every query has an oracle (or a documented rows-only waiver), and
the two media gates run Spark-vs-DuckDB right here with the driver's own
order-insensitive value-hash compare."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from check_contract import EXPECTED_REGISTERED, value_hash  # noqa: E402

from gobblin_spark.queries import QUERIES, TABLES, oracle_sqls  # noqa: E402


def test_registry_is_pinned_and_fully_oracled():
    assert len(QUERIES) == EXPECTED_REGISTERED, (
        "registered-query count drifted — a driver CORRECTNESS file built "
        "from this registry would silently cover a different set; update "
        "the pin in scripts/check_contract.py with intent")
    sqls = oracle_sqls()
    assert set(sqls) == set(QUERIES), (
        "oracle_sql() keys must match queries() exactly: "
        f"missing={sorted(set(QUERIES) - set(sqls))} "
        f"extra={sorted(set(sqls) - set(QUERIES))}")
    assert all(isinstance(s, str) and s.strip() for s in sqls.values())


@pytest.mark.parametrize("name", ["media_metadata", "media_frame_sample",
                                  "media_features"])
def test_media_gates_match_duckdb_oracle(spark, sf_dir, name):
    """The exact Spark-vs-DuckDB compare the driver runs, for the gates
    that fell out of CORRECTNESS_r04: rows, columns, and value hash."""
    spdf = QUERIES[name](spark, sf_dir).toPandas()
    con = duckdb.connect()
    try:
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        opdf = con.execute(oracle_sqls()[name]).df()
    finally:
        con.close()
    assert len(spdf) == len(opdf) > 0
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert value_hash(spdf) == value_hash(opdf)
