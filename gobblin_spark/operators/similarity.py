"""Approximate-nearest-neighbor search over embedding columns.

Two tiers, per the scale doctrine:
- ``brute_force_topk`` — exact cosine top-k; the correctness baseline. One
  broadcast of the (small) query set; O(n·q) JVM-side math, no Python.
- ``lsh_topk`` — random-hyperplane LSH bucketing: candidates = rows sharing
  a signature band with the query, re-ranked exactly. At 100 TB the bucket
  join replaces the full cross product; buckets are pruned by the same
  hash-partitioning the table is stored with.

All vector math uses zip_with/aggregate (Tungsten codegen), doubles for
order-stable sums, and deterministic (score desc, id asc) tie-breaks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from gobblin_spark.operators.dedup import cosine_expr


def brute_force_topk(
    data: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    queries: (query_id, vec) — small; broadcast to avoid a shuffle of data.
    Returns (query_id, vec_id, cosine, rank) with deterministic ordering.
    """
    d = data.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__dv"))
    # spread the scan even when the source is one file; queries broadcast
    d = d.repartition(data.sparkSession.sparkContext.defaultParallelism)
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("__qv"))
    joined = d.crossJoin(F.broadcast(q))
    scored = joined.select(
        "query_id",
        "vec_id",
        cosine_expr(F.col("__dv"), F.col("__qv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _rh_signature(vec_col, n_planes: int, dim: int, seed: int = 42):
    """Random-hyperplane signature: bit i = sign(v · h_i) where h_i is a
    deterministic ±1 hyperplane derived from md5(seed,i,j) — reproducible on
    any engine, no stored model. Returns an int signature column."""
    bits = []
    for i in range(n_planes):
        # ±1 pattern per dimension from a hash — computed once by Catalyst
        # constant folding per plane (the transform lambda sees only v).
        signs = F.array(
            *[
                F.when(
                    F.conv(
                        F.substring(F.md5(F.lit(f"{seed}:{i}:{j}")), 1, 4), 16, 10
                    ).cast("long") % 2 == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
                for j in range(dim)
            ]
        )
        dot = F.aggregate(
            F.zip_with(vec_col, signs, lambda x, s: (x * s).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_topk(
    data: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: candidates share an LSH bucket with the query in ANY of
    n_tables signature tables; candidates re-ranked by exact cosine.

    Recall/cost dial: more tables → higher recall, more candidates. The
    candidate join shuffles on (table, signature) — cardinality ~n/2^planes
    per bucket, so the join is sparse at scale.
    """
    sigs = [
        (t, _rh_signature(F.col("__v"), n_planes, dim, seed + 1000 * t))
        for t in range(n_tables)
    ]

    def with_sigs(df, idc, vc):
        base = df.select(F.col(idc).alias(idc), F.col(vc).alias("__v"))
        sig_arr = F.array(
            *[F.struct(F.lit(t).alias("t"), s.alias("sig")) for t, s in sigs]
        )
        # ids + signatures only: vectors stay out of the join/dedup shuffle
        return base.select(idc, F.explode(sig_arr).alias("__s"))

    dd = data.repartition(data.sparkSession.sparkContext.defaultParallelism)
    d = with_sigs(dd, id_col, vec_col)
    q = with_sigs(queries, query_id_col, vec_col)
    cand = (
        d.join(F.broadcast(q), on=[d["__s"] == q["__s"]])
        .select(
            F.col(query_id_col).alias("query_id"),
            F.col(id_col).alias("vec_id"),
        )
        .dropDuplicates(["query_id", "vec_id"])
    )
    dv = dd.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__dv"))
    qv = queries.select(F.col(query_id_col).alias("query_id"),
                        F.col(vec_col).alias("__qv"))
    scored = (
        cand.join(dv, "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "vec_id",
                cosine_expr(F.col("__dv"), F.col("__qv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
