"""Deduplication operators for large-scale training-data pipelines.

The reference's dedup is key-based MR compaction
(gobblin-compaction/.../avro/AvroKeyDedupReducer.java:31-65 — shuffle by key,
keep last). These operators generalize that to content-based dedup at 100 TB
scale, each designed so the expensive pairing step is bucketed (LSH) rather
than O(n²), with the brute-force variants kept as correctness oracles.

Portability note: all hashing is md5-based (not xxhash) so an independent
SQL engine (DuckDB) can replay the exact same computation for the
correctness gate — lexicographic min over hex digests is a valid uniform
min-hash and is engine-agnostic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


# --------------------------------------------------------------- exact dedup
def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Exact duplicate groups by content hash: keep the min-id canonical row,
    emit (kept_id, dup_id) pairs for every shed duplicate.

    One shuffle on the content hash (not the full row), map-side combine
    applies. ≙ compaction dedup with key = content digest.
    """
    h = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"),
                                               F.lit("\x00")) for c in cols]))
    with_h = df.select(F.col(id_col), h.alias("__h"))
    # min-per-group + join-back, NOT collect_list: a degenerate group (e.g.
    # 10^9 empty documents) must never materialize as one giant array row on
    # a single executor. Both sides shuffle on the same hash key, so the
    # join is co-partitioned with the aggregate.
    groups = with_h.groupBy("__h").agg(F.min(id_col).alias("kept_id"))
    return (
        with_h.join(groups, "__h")
        .filter(F.col(id_col) != F.col("kept_id"))
        .select("kept_id", F.col(id_col).alias("dup_id"))
    )


def balance_input(df: DataFrame, target: int | None = None) -> DataFrame:
    """Spread an under-partitioned input across the cluster before a
    compute-heavy per-row projection (md5 signatures, shingling). A small
    parquet source arrives as 1-2 partitions, serializing everything up to
    the first shuffle onto one core; at real scale the input is already
    wide and this is a no-op (the partition check avoids an always-shuffle).
    Explicit repartition(n) so AQE's small-data coalescing can't undo it."""
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ------------------------------------------------------------------ shingles
def tokens_expr(text_col, lowercase: bool = True):
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    if lowercase:
        t = F.lower(t)
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def shingles_expr(text_col, n: int = 3):
    """Distinct word n-grams as an array<string> — pure JVM expressions
    (no UDF): slice+concat over the token array."""
    toks = tokens_expr(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(grams)


def jaccard_expr(a, b):
    """Set Jaccard for arrays that are ALREADY distinct (shingles_expr
    guarantees it): |A∩B| / (|A|+|B|-|A∩B|). Computing the union size by
    inclusion-exclusion skips materializing the union array — one hash-set
    pass per pair instead of two, which halves the dominant cost of the
    all-pairs and LSH-candidate verify stages."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# ----------------------------------------------------------- n-gram jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Brute-force all-pairs n-gram Jaccard ≥ threshold (the exact oracle;
    O(n²) — use only on samples or as the verify stage after LSH).
    Returns (id_a, id_b, jaccard) with id_a < id_b."""
    s = df.select(F.col(id_col).alias("__id"),
                  shingles_expr(text_col, n).alias("__sh"))
    # Stream side repartitioned so the O(n²) comparison parallelizes even
    # when the source is a single file; build side broadcast (oracle tier —
    # only ever run on samples, the scale path is minhash_lsh_pairs).
    spark = df.sparkSession
    a = s.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = F.broadcast(s).alias("b")
    pairs = a.join(b, F.col(f"a.__id") < F.col(f"b.__id"))
    jac = jaccard_expr(F.col("a.__sh"), F.col("b.__sh"))
    return (
        pairs.select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------------------- minhash LSH
def minhash_signature_exprs(shingle_col, n_hashes: int,
                            hash_fn: str = "md5") -> list:
    """n_hashes independent min-hashes: min over shingles of
    hash("<i>:" || shingle).

    hash_fn='md5' (default): lexicographic min over hex digests —
    engine-agnostic, replayable in any SQL dialect with md5 (the oracle
    tier). hash_fn='xxhash64': numeric min over 64-bit hashes — the
    production tier; xxhash64 is a JVM intrinsic ~10x cheaper per shingle
    than md5 with the same banding behavior."""
    if hash_fn == "md5":
        mk = lambda s, i: F.md5(F.concat(F.lit(f"{i}:"), s))  # noqa: E731
    elif hash_fn == "xxhash64":
        mk = lambda s, i: F.xxhash64(F.concat(F.lit(f"{i}:"), s))  # noqa: E731
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn}")
    return [
        F.array_min(
            F.transform(shingle_col, lambda s, i=i: mk(s, i))
        ).alias(f"mh{i}")
        for i in range(n_hashes)
    ]


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    hash_fn: str = "md5",
) -> DataFrame:
    """MinHash + LSH near-duplicate pairs.

    Pipeline: shingle → n_hashes min-hashes → ``bands`` band keys (each a
    digest of rows_per_band consecutive min-hashes) → explode to (band_key,
    id) → self-join per bucket (candidate pairs share ≥1 band) → verify with
    TRUE Jaccard ≥ threshold.

    Scale shape: the only shuffle on the full data is groupBy/join on band
    keys; buckets are tiny (near-dup clusters), so the candidate join is
    sparse — this is the 100 TB path, vs O(n²) brute force.
    """
    assert n_hashes % bands == 0
    rpb = n_hashes // bands
    s = balance_input(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("__id"),
        shingles_expr(text_col, n).alias("__sh"),
    ).withColumn("__sh", F.when(F.size("__sh") > 0, F.col("__sh"))
                 .otherwise(F.array(F.lit(""))))
    sig = s.select("__id", *minhash_signature_exprs(F.col("__sh"), n_hashes,
                                                    hash_fn))
    band_digest = F.md5 if hash_fn == "md5" else F.xxhash64
    band_keys = [
        band_digest(
            F.concat_ws("|", F.lit(str(b)),
                        *[F.col(f"mh{b * rpb + j}") for j in range(rpb)])
        ).cast("string").alias(f"band{b}")
        for b in range(bands)
    ]
    # Physical shape matters at scale: the band self-join and pair-dedup
    # move ONLY (id, band) rows — the heavy shingle arrays (and the md5
    # signature computation) never enter the shuffle or get recomputed on
    # both join sides. Shingles are re-attached to the (small) candidate
    # set afterwards for exact-Jaccard verification.
    exploded = sig.select(
        "__id",
        F.explode(F.array(*band_keys)).alias("__band"),
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    cand = (
        a.join(b, (F.col("a.__band") == F.col("b.__band"))
               & (F.col("a.__id") < F.col("b.__id")))
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh = s.select(F.col("__id"), F.col("__sh"))
    pairs = (
        cand.join(sh.withColumnRenamed("__id", "id_a")
                  .withColumnRenamed("__sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("__id", "id_b")
              .withColumnRenamed("__sh", "sh_b"), "id_b")
    )
    jac = jaccard_expr(F.col("sh_a"), F.col("sh_b"))
    return (
        pairs.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------------- simhash
def simhash_expr(text_col, bits: int = 32):
    """SimHash fingerprint over word tokens (md5-derived per-token hash so
    an external SQL oracle can replay it bit-for-bit).

    Per token: h = first 8 hex chars of md5(token) as a 32-bit int. The
    fingerprint's bit b is 1 iff sum over tokens of (±1 per bit b) > 0.
    Pure JVM expressions: aggregate over the token array.
    """
    toks = tokens_expr(text_col)
    # Hash each token ONCE into an array of 32-bit ints, then aggregate bits
    # over the hash array — the naive formulation re-derived md5(token)
    # inside the per-bit lambda (32 md5 evaluations per token unless
    # Catalyst happens to CSE it), which dominated the query's cost.
    hashes = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    # accumulate per-bit ±1 counts via aggregate into an array of counts.
    # Bit extraction uses floor(h / 2^b) % 2 because shiftright needs a
    # literal shift count; h < 2^32 so double math is exact.
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda b: F.when(
                    F.pmod(
                        F.floor(
                            h / F.pow(F.lit(2.0), b.cast("double"))
                        ).cast("long"),
                        F.lit(2),
                    )
                    == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1)).cast("long"),
            ),
            lambda c, d: c + d,
        ),
    )
    # fold sign bits into a long: sum of 2^b where count > 0
    return F.aggregate(
        F.zip_with(
            counts,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda c, b: F.when(
                c > 0, F.pow(F.lit(2.0), b.cast("double")).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash_dedup(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32,
    max_hamming: int = 3, band_bits: int = 8,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the fingerprint into bits/band_bits
    blocks (a pair within hamming distance d must share ≥1 identical block
    if d < n_blocks), candidate-join per block, verify true hamming ≤
    max_hamming."""
    n_blocks = bits // band_bits
    s = balance_input(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("__id"),
        simhash_expr(text_col, bits).alias("__sim"))
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("__sim"), i * band_bits)
                .bitwiseAND(F.lit((1 << band_bits) - 1))
                .alias("val"),
            )
            for i in range(n_blocks)
        ]
    )
    e = s.select("__id", "__sim", F.explode(blocks).alias("__b"))
    a, b = e.alias("a"), e.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__b") == F.col("b.__b"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sim").alias("sim_a"),
            F.col("b.__sim").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select(
        "id_a", "id_b", ham.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# -------------------------------------------------- embedding cosine near-dup
def cosine_expr(a, b, decimals: int = 6):
    # cast BEFORE multiply: float×float then widen loses ulps vs an oracle
    # that computes in double end-to-end; sums are sequential in array order
    # on both engines, so double-throughout is bit-reproducible.
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x,
        )
    )
    return F.round(dot / (na * nb), decimals)


def embedding_neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Brute-force cosine near-dup pairs (exact; O(n²) — the oracle/baseline;
    LSH-bucketed scale path in gobblin_spark.operators.similarity)."""
    s = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    spark = df.sparkSession
    a = s.repartition(spark.sparkContext.defaultParallelism).alias("a")
    b = F.broadcast(s).alias("b")
    cos = cosine_expr(F.col("a.__v"), F.col("b.__v"))
    return (
        a.join(b, F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# -------------------------------------------------- near-dup cluster assign
def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over a near-dup pair graph: returns
    ``(node, component)`` for every node appearing in ``pairs``, where
    ``component`` is the minimum node id reachable from it.

    This is the cluster-assignment step real training pipelines run after
    LSH pairing — near-dup dedup keeps ONE representative per connected
    cluster (here: the min id, so ``node == component`` marks the kept doc),
    not one per pair.

    Algorithm: min-label propagation with pointer jumping. Each round does
    (1) label(v) := min(label(v), min over neighbors u of label(u)) — one
    shuffle on the edge key — and (2) label(v) := label(label(v)) — one
    self-join that halves the remaining pointer depth, so convergence is
    O(log(max component diameter)) rounds, not O(diameter). Every round
    the label frontier is localCheckpoint()ed to cut the iterative plan
    lineage (a growing lineage otherwise re-executes all prior rounds on
    every action). Convergence is detected by the sum of labels — the label
    vector is component-wise non-increasing, so an unchanged sum means a
    fixpoint; that is one tiny aggregate per round instead of a full
    old-vs-new anti-join.

    Near-dup graphs at 100 TB: edges come pre-bucketed from LSH (O(n·bands)
    rows, not O(n²)); each round is two key-partitioned shuffles over the
    current labels; component count never matters, only the log of the
    largest cluster's diameter (typically ≤ 3 rounds in practice).
    """
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # initial label: min(self, min neighbor)
    lbl = (
        edges.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(F.col("u"), F.least(F.col("u"), F.col("mn")).alias("l"))
        .localCheckpoint(eager=False)
    )
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        # (1) neighbor-min propagation
        nb = (
            edges.join(
                lbl.select(F.col("u").alias("v"), F.col("l").alias("lv")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("lv").alias("nl"))
        )
        stepped = (
            lbl.join(nb, "u", "left")
            .select(
                "u",
                F.least(F.col("l"), F.coalesce(F.col("nl"), F.col("l")))
                .alias("l"),
            )
        )
        # (2) pointer jump: l(u) := l(l(u))
        jump = stepped.select(F.col("u").alias("l"), F.col("l").alias("ll"))
        lbl = (
            stepped.join(jump, "l", "left")
            .select(
                "u",
                F.least(F.col("l"), F.coalesce(F.col("ll"), F.col("l")))
                .alias("l"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = lbl.agg(F.sum("l")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Partially-converged labels would silently under-deduplicate the
        # corpus (multiple "representatives" per true cluster) — fail loudly
        # instead; with pointer jumping, max_iter rounds cover components of
        # diameter 2^max_iter, so hitting this means something is wrong.
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            "rounds (label-sum fixpoint not reached); raise max_iter or "
            "inspect the pair graph"
        )
    return lbl.select(F.col("u").alias("node"), F.col("l").alias("component"))


def neardup_clusters(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Cluster assignment for near-dup dedup: (doc_id, component,
    cluster_size, is_kept) for every node in the pair graph; the kept
    representative per cluster is the min id (is_kept = true)."""
    cc = connected_components(pairs, src, dst)
    sizes = cc.groupBy("component").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return (
        cc.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component"),
            F.col("cluster_size"),
            (F.col("node") == F.col("component")).alias("is_kept"),
        )
    )
