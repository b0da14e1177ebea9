"""asof_join: semantics vs DuckDB's native ASOF JOIN, and the plan shape
that makes it scale (one shuffle, no nested-loop join)."""

import duckdb
import pytest

from gobblin_spark.operators.temporal import asof_join


def test_asof_join_matches_duckdb(spark):
    l_rows = [(1, 5, 50.0), (1, 9, 90.0), (2, 3, 30.0), (3, 7, 70.0)]
    r_rows = [(1, 4, "a"), (1, 5, "b"), (1, 8, "c"), (2, 9, "z")]
    left = spark.createDataFrame(l_rows, "k int, t int, v double")
    right = spark.createDataFrame(r_rows, "k int, rt int, p string")

    got = sorted(
        (r["k"], r["t"], r["v"], r["p"])
        for r in asof_join(left, right, ["k"], "t", "rt").collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE l(k int, t int, v double)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", l_rows)
    con.execute("CREATE TABLE r(k int, rt int, p varchar)")
    con.executemany("INSERT INTO r VALUES (?,?,?)", r_rows)
    want = sorted(con.execute(
        "SELECT l.k, l.t, l.v, r.p FROM l ASOF LEFT JOIN r "
        "ON l.k = r.k AND l.t >= r.rt"
    ).fetchall())
    assert got == want
    # spot-pin the semantics: inclusive match at t=5, null when nothing
    # precedes, latest-not-just-any at t=9
    assert (1, 5, 50.0, "b") in got
    assert (1, 9, 90.0, "c") in got
    assert (2, 3, 30.0, None) in got
    assert (3, 7, 70.0, None) in got

    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("p", "v"), ["k"], "t", "rt")


def test_asof_join_single_shuffle_no_nested_loop(spark):
    left = spark.range(1000).selectExpr("id % 7 AS k", "id AS t",
                                        "CAST(id AS DOUBLE) AS v")
    right = spark.range(300).selectExpr("id % 7 AS k", "id * 3 AS rt",
                                        "CONCAT('p', id) AS p")
    out = asof_join(left, right, ["k"], "t", "rt")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    plan = out._jdf.queryExecution().explainString(mode.fromString("formatted"))
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan
    n_exchanges = plan.count(") Exchange")
    assert n_exchanges == 1, f"expected 1 shuffle, got {n_exchanges}"
    # row-level sanity at scale-ish size
    # right rows with k=0 are ids 0,7,14,... at rt=0,21,42,...: at t=7 the
    # latest preceding is rt=0 (p0); at t=25 it's rt=21 (p7)
    assert out.filter("k = 0 AND t = 7").collect()[0]["p"] == "p0"
    assert out.filter("k = 0 AND t = 28").collect()[0]["p"] == "p7"
