"""Approximate-nearest-neighbor search over embedding columns.

Three tiers, per the scale doctrine:
- ``brute_force_topk`` — exact cosine top-k; the correctness baseline. One
  broadcast of the (small) query set; O(n·q) JVM-side math, no Python.
- ``lsh_topk`` — random-hyperplane LSH bucketing: candidates = rows sharing
  a signature band with the query, re-ranked exactly. At 100 TB the bucket
  join replaces the full cross product; buckets are pruned by the same
  hash-partitioning the table is stored with.
- ``ivf_topk`` — inverted-file (coarse-quantizer) ANN: vectors are assigned
  to their nearest centroid map-side (centroids constant-folded into the
  row expression — zero shuffle), queries probe the nearest ``n_probe``
  lists, and only those lists are scored. At 100 TB the assignment is a
  pure map stage and candidate selection is a broadcast join on the
  centroid id, so the scan never shuffles the data by content.

All vector math uses zip_with/aggregate (Tungsten codegen), doubles for
order-stable sums, and deterministic (score desc, id asc) tie-breaks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def _plane_sign(seed: int, i: int, j: int) -> float:
    """Deterministic ±1 hyperplane coefficient from md5(seed:i:j) — no
    stored model; any process derives the identical hyperplanes."""
    import hashlib

    h = hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:4]
    return 1.0 if int(h, 16) % 2 == 0 else -1.0


def _signatures_udf(n_planes: int, n_tables: int, dim: int, seed: int):
    """All n_tables random-hyperplane signatures in ONE Arrow-vectorized
    pandas UDF: (n, dim) @ (dim, T·P) numpy matmul, bits packed per table.
    A JVM-expression variant (aggregate/zip_with per plane) is semantically
    identical but builds a ~n_tables·n_planes·dim-node plan — seconds of
    driver-side analysis; the UDF keeps the plan O(1) and the math BLAS-
    vectorized. Returns array<int> of length n_tables.

    The dot product is computed over components QUANTIZED to integers
    (floor(v·10^6 + 0.5)) with ±1 integer plane coefficients: an integer
    sum is order-insensitive and bit-exact, so an independent engine (the
    DuckDB oracle) replays the identical signatures — a float matmul's
    sign test could flip on near-zero dots under different summation
    orders. Quantization at 1e-6 is far below any embedding's signal."""
    from pyspark.sql.functions import pandas_udf

    mats = np.array(
        [
            [_plane_sign(seed + 1000 * t, i, j) for j in range(dim)]
            for t in range(n_tables)
            for i in range(n_planes)
        ]
    ).astype(np.int64)  # (T*P, dim) of ±1
    weights = 1 << np.arange(n_planes)

    @pandas_udf("array<int>")
    def sigs(v: pd.Series) -> pd.Series:
        m = np.vstack(v.to_numpy()).astype(np.float64)  # (n, dim)
        q = np.floor(m * 1_000_000.0 + 0.5).astype(np.int64)
        bits = (q @ mats.T >= 0).astype(np.int64)  # (n, T*P)
        packed = (bits.reshape(len(m), -1, len(weights)) * weights).sum(axis=2)
        return pd.Series([row.tolist() for row in packed.astype(np.int32)])

    return sigs


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
    sig_udf = _signatures_udf(n_planes, n_tables, dim, seed)

    def with_sigs(df, idc, vc):
        base = df.select(F.col(idc).alias(idc),
                         sig_udf(F.col(vc)).alias("__sigs"))
        # ids + (table, signature) only: vectors stay out of the join/dedup
        return base.select(
            idc,
            F.posexplode("__sigs").alias("__t", "__sig"),
        ).select(idc, F.struct(F.col("__t"), F.col("__sig")).alias("__s"))

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


# --------------------------------------------------------------- IVF ANN tier
QUANT_SCALE = 1_000_000


def _quant_expr(vec_sql: str) -> str:
    """SQL for an integer-quantized copy of a float vector.

    floor(v·10^6 + 0.5) as BIGINT. With |v| ≲ 1 the per-component magnitude
    is ≤ ~10^6, a 64-dim dot is ≤ ~10^14 ≪ 2^53, so every intermediate is
    exactly representable even in double accumulation — an independent
    engine (the DuckDB oracle) reproduces bit-identical cosines regardless
    of summation order."""
    return (f"transform(cast({vec_sql} as array<double>), "
            f"x -> CAST(floor(x * {QUANT_SCALE}.0D + 0.5D) AS BIGINT))")


def _qdot_sql(a: str, b: str) -> str:
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
            f"0L, (acc, x) -> acc + x)")


def _qcos_sql(dot: str, norm_a: str, norm_b: str) -> str:
    """cosine from quantized integer dot/norms; one fixed IEEE op order."""
    return (f"(CAST({dot} AS DOUBLE) / (sqrt(CAST({norm_a} AS DOUBLE)) * "
            f"sqrt(CAST({norm_b} AS DOUBLE))))")


def select_centroids(
    data: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> list[tuple[int, list[int], int]]:
    """Deterministic coarse-quantizer codebook: the ``n_centroids`` rows
    with the lexicographically smallest ``md5(cast(id as string))`` — a
    uniform pseudo-random sample any engine can replay (the DuckDB oracle
    derives the identical codebook). Returns [(centroid_id, quantized_vec,
    quantized_self_dot)].

    At 100 TB you would refine this sample with a few k-means iterations
    (each a map + 1 tiny shuffle on centroid id); sampled codebooks are the
    standard IVF bootstrap and keep this replayable."""
    rows = (
        data.selectExpr(
            f"{id_col} AS __cid_src",
            _quant_expr(vec_col) + " AS __qv",
            f"md5(cast({id_col} as string)) AS __hk",
        )
        .orderBy("__hk", "__cid_src")
        .limit(n_centroids)
        .collect()  # codebook only: n_centroids × dim ints, never data
    )
    out = []
    for cid, r in enumerate(rows):
        qv = list(r["__qv"])
        out.append((cid, qv, sum(x * x for x in qv)))
    return out


def _scores_array_sql(cents) -> str:
    """One SQL string computing array(cos_to_c0, cos_to_c1, …) for a row
    with quantized vector __qv / self-dot __qn. Centroids are constant-
    folded literals (K·dim ints ≈ a few KB of plan), so assignment is a
    pure map: no join, no shuffle, whole-stage codegen."""
    parts = []
    for cid, qv, qn in cents:
        lit = "array(" + ",".join(f"{x}L" for x in qv) + ")"
        parts.append(_qcos_sql(_qdot_sql("__qv", lit), "__qn", f"{qn}L"))
    return "array(" + ",".join(parts) + ")"


def ivf_topk(
    data: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF ANN top-k: score only the ``n_probe`` nearest inverted lists.

    Plan shape (the 100 TB story):
      1. codebook: one tiny driver-side collect of K sampled vectors;
      2. assignment: map-only — each data row picks argmax cosine over the
         constant-folded codebook (first-index tie-break = lowest centroid
         id), zero shuffle;
      3. probes: the (small, broadcast) query set picks its top n_probe
         centroids the same way;
      4. candidates: broadcast join on centroid id — scans ~n_probe/K of
         the data, never shuffles it;
      5. exact integer-quantized cosine re-rank, per-query top-k.
    Recall dial: n_probe/K. The brute-force tier is the recall oracle.
    """
    cents = select_centroids(data, id_col, vec_col, n_centroids)
    scores = _scores_array_sql(cents)

    def with_best(df, idc, extra_cols=()):
        q = df.selectExpr(
            idc, *extra_cols, _quant_expr(vec_col) + " AS __qv"
        ).selectExpr(idc, *extra_cols, "__qv",
                     _qdot_sql("__qv", "__qv") + " AS __qn")
        return q.selectExpr(idc, *extra_cols, "__qv", "__qn",
                            scores + " AS __scores")

    d = with_best(data, id_col).selectExpr(
        id_col, "__qv", "__qn",
        # array_position = FIRST occurrence of the max → (cos desc, cid asc)
        "CAST(array_position(__scores, array_max(__scores)) - 1 AS INT)"
        " AS __cid",
    )

    qd = with_best(
        queries.select(F.col(query_id_col).alias("query_id"), vec_col),
        "query_id",
    )
    probes = (
        qd.selectExpr("query_id", "posexplode(__scores) AS (__cid, __cos)")
        .withColumn(
            "__pr",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("__cos"), F.asc("__cid"))),
        )
        .filter(F.col("__pr") <= n_probe)
        .select("query_id", F.col("__cid").cast("int").alias("__cid"))
    )
    qv = qd.select("query_id", F.col("__qv").alias("__qqv"),
                   F.col("__qn").alias("__qqn"))

    cand = d.join(F.broadcast(probes), "__cid").join(
        F.broadcast(qv), "query_id")
    scored = cand.selectExpr(
        "query_id",
        f"{id_col} AS vec_id",
        "round(" + _qcos_sql(_qdot_sql("__qv", "__qqv"), "__qn", "__qqn")
        + ", 6) AS cosine",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
