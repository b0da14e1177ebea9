"""Deterministic synthetic input: repo table (F1) + change-event stream (F2).

Mirrors the role of the reference's synthetic test source
(gobblin-runtime/src/test/java/gobblin/test/TestSource.java /
TestExtractor.java:55 — fixed golden record counts) scaled up: every column
is a pure Spark SQL expression of the row id and a seed, so the same
(seed, n) always produces byte-identical tables on any cluster size, with
no driver-side data loops — generation itself is distributed and scales to
10^10 rows by changing one parameter.

Knobs (all seeded, FIXTURES.md §F2): hot-key skew exponent (a few giant
repos), delete ratio, duplicate-delivery fraction, out-of-order shuffle
window, schema-change positions.

Event table columns:
  seq            long    — global delivery order (THE watermark axis,
                           ≙ Kafka offset / MultiLongWatermark)
  event_group    int     — stream partition id (≙ Kafka partition):
                           seq is monotone within each group
  op             string  — I / U / D / S
  repo, path     string  — upsert key
  commit         string  — 40-hex payload (deterministic from key+version)
  lang           string  — small enum
  content        string  — file body; sha256(content) is the per-row
                           equality invariant vs the oracle replay
  schema_version int     — payload schema version at this seq
  version        long    — logical per-key version (generator bookkeeping;
                           the engine must NOT rely on it)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

LANGS = ["py", "java", "scala", "ts", "go", "rs", "md", "yaml"]


def _u01(*cols) -> F.Column:
    """Deterministic uniform [0,1) from arbitrary columns."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1 << 31)) / F.lit(float(1 << 31)))


def _content_expr(repo, path, version, n_tokens: int = 24) -> F.Column:
    """Deterministic pseudo source text, a function of (key, version) ONLY —
    duplicates re-delivered at a later seq carry identical content, which is
    what makes sha256-equality a valid convergence check.

    Built from ceil(n_tokens/8) top-level sha2 calls (each 64 hex chars ≈
    eight 8-char tokens) re-chunked by one regexp — all whole-stage-codegen
    expressions. The obvious alternative (transform(sequence(1, n)) with a
    sha2 lambda) drops Spark into per-element interpreted eval, which made
    fixture generation ~100× slower at n_tokens=96."""
    n_chunks = max(1, (n_tokens + 7) // 8)
    joined = F.concat(
        *[
            F.sha2(
                F.concat_ws("|", repo, path, version.cast("string"),
                            F.lit(str(i))),
                256,
            )
            for i in range(1, n_chunks + 1)
        ]
    )
    # 8-char tokens separated by single spaces (trailing space trimmed)
    return F.trim(F.regexp_replace(joined, "(.{8})", "$1 "))


def generate_repo_table(
    spark: SparkSession,
    n_rows: int,
    n_repos: int = 100,
    seed: int = 42,
    skew: float = 2.0,
) -> DataFrame:
    """F1: the source-code repository table
    (repo, path, commit, lang, content) — BASELINE.json input_hint shape.

    Zipf-ish repo skew: rank = floor(n_repos * u^skew) concentrates mass on
    low ranks (a few giant repos = the hot keys the planner must salt).
    """
    df = spark.range(n_rows).withColumn("__seed", F.lit(seed))
    u = _u01(F.col("id"), F.col("__seed"))
    repo_rank = F.floor(F.lit(n_repos) * F.pow(u, F.lit(skew))).cast("int")
    repo = F.concat(F.lit("repo_"), F.format_string("%04d", repo_rank))
    path_id = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(1 << 20))
    lang_idx = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(len(LANGS)))
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), lang_idx.cast("int") + 1)
    out = df.select(
        repo.alias("repo"),
        F.concat(
            F.lit("src/"),
            F.format_string("%02d", F.pmod(path_id, F.lit(64)).cast("int")),
            F.lit("/file_"),
            path_id.cast("string"),
            F.lit("."),
            lang,
        ).alias("path"),
        F.substring(
            F.sha2(F.concat_ws("|", repo, path_id.cast("string")), 256), 1, 40
        ).alias("commit"),
        lang.alias("lang"),
    )
    return out.withColumn(
        "content", _content_expr(F.col("repo"), F.col("path"), F.lit(1))
    )


def generate_change_events(
    spark: SparkSession,
    n_updates: int,
    n_repos: int = 50,
    paths_per_repo: int = 200,
    seed: int = 42,
    skew: float = 2.0,
    delete_frac: float = 0.05,
    dup_frac: float = 0.05,
    ooo_window: int = 100,
    n_groups: int = 8,
    schema_change_seqs: dict[int, int] | None = None,
    content_tokens: int = 24,
) -> DataFrame:
    """F2: the ordered change-event stream derived from the F1 key space.

    Construction (all deterministic in (seed, args)):
      1. n_updates logical updates; key = (repo, path) with Zipf repo skew.
      2. per-key logical ``version`` = arrival rank of the update for that key.
      3. delivery permutation: position = id + jitter(±ooo_window) → late /
         out-of-order arrivals relative to logical time.
      4. a dup_frac sample is RE-DELIVERED later (same key/version/content,
         later seq) — duplicate delivery.
      5. seq = dense delivery rank; event_group = hash(key) % n_groups (seq
         stays globally monotone, hence monotone within each group).
      6. op: version 1 → I; later versions → D with prob delete_frac else U.
         Deletes carry null payload. A deleted key CAN be re-inserted by a
         later version (op I is only cosmetic — LWW treats I/U identically).
      7. schema_change_seqs {approx_seq: new_version} injects op='S' marker
         rows and flips schema_version for all later events.

    The generator uses two window shuffles — it is a test/bench *fixture*
    (pre-materialized to parquet before timing), not part of the engine path.
    """
    base = spark.range(n_updates)
    u_repo = _u01(F.col("id"), F.lit(seed))
    repo_rank = F.floor(F.lit(n_repos) * F.pow(u_repo, F.lit(skew))).cast("int")
    path_rank = F.pmod(
        F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(paths_per_repo)
    ).cast("int")
    df = base.select(
        F.col("id"),
        F.concat(F.lit("repo_"), F.format_string("%04d", repo_rank)).alias("repo"),
        F.concat(
            F.lit("src/f"), path_rank.cast("string"), F.lit(".txt")
        ).alias("path"),
    )
    w_key = Window.partitionBy("repo", "path").orderBy("id")
    df = df.withColumn("version", F.row_number().over(w_key).cast("long"))

    # Delivery permutation (out-of-order window).
    jitter = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 2)), F.lit(2 * ooo_window + 1)) - F.lit(ooo_window)
    df = df.withColumn("pos", (F.col("id") + jitter).cast("double"))

    # Duplicate re-delivery: same logical event, strictly later position.
    dup_cut = int(dup_frac * (1 << 31))
    dups = df.filter(
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 3)), F.lit(1 << 31)) < dup_cut
    ).withColumn(
        "pos",
        F.col("pos")
        + F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 4)), F.lit(3 * ooo_window)).cast("double")
        + F.lit(0.5),
    )
    df = df.unionByName(dups)

    # seq = dense global delivery rank (ties broken by id for determinism).
    # Scalable two-phase rank instead of a single-partition global window:
    # bucket by a VALUE-derived range key (floor(pos/chunk) — pos ≈ id, so
    # buckets are balanced), rank locally per bucket, then add cumulative
    # bucket offsets — O(P) driver metadata, every downstream expression
    # stays parallel. The bucket MUST be a pure function of the row, never
    # spark_partition_id() over repartitionByRange: range boundaries come
    # from SAMPLING, which is not stable across recomputes of a lazy plan
    # (observed: a warm session re-sampled different boundaries, so the
    # collected offsets map disagreed with later recomputes and seq
    # assignment silently shifted).
    n_part = max(spark.sparkContext.defaultParallelism, n_groups)
    chunk = float(max(1, n_updates // n_part))
    persisted = (
        df.withColumn(
            "__b", F.floor(F.col("pos") / F.lit(chunk)).cast("long"))
        .persist()
    )
    w_local = Window.partitionBy("__b").orderBy("pos", "id")
    df = persisted.withColumn(
        "__lrank", F.row_number().over(w_local).cast("long")
    )
    counts = {
        r["__b"]: r["cnt"]
        for r in persisted.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    offset_col = F.element_at(
        F.create_map(
            *[F.lit(x) for b in sorted(offsets) for x in (b, offsets[b])]
        ),
        F.col("__b"),
    ).cast("long")
    df = df.withColumn("seq", offset_col + F.col("__lrank") - 1).drop(
        "__b", "__lrank"
    )

    del_cut = int(delete_frac * (1 << 31))
    is_delete = (F.col("version") > 1) & (
        F.pmod(
            F.xxhash64(F.col("repo"), F.col("path"), F.col("version"), F.lit(seed + 5)),
            F.lit(1 << 31),
        )
        < del_cut
    )
    op = F.when(is_delete, "D").when(F.col("version") == 1, "I").otherwise("U")
    lang_idx = F.pmod(
        F.xxhash64(F.col("repo"), F.col("path"), F.lit(seed + 6)), F.lit(len(LANGS))
    )
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), lang_idx.cast("int") + 1)

    sv = F.lit(1)
    for at_seq, ver in sorted((schema_change_seqs or {}).items()):
        sv = F.when(F.col("seq") >= at_seq, F.lit(ver)).otherwise(sv)

    events = df.select(
        F.col("seq"),
        F.pmod(F.xxhash64(F.col("repo"), F.col("path")), F.lit(n_groups))
        .cast("int")
        .alias("event_group"),
        op.alias("op"),
        F.col("repo"),
        F.col("path"),
        F.when(is_delete, F.lit(None)).otherwise(
            F.substring(
                F.sha2(
                    F.concat_ws("|", F.col("repo"), F.col("path"),
                                F.col("version").cast("string")),
                    256,
                ),
                1,
                40,
            )
        ).alias("commit"),
        F.when(is_delete, F.lit(None)).otherwise(lang).alias("lang"),
        F.when(is_delete, F.lit(None)).otherwise(
            _content_expr(F.col("repo"), F.col("path"), F.col("version"),
                          n_tokens=content_tokens)
        ).alias("content"),
        sv.cast("int").alias("schema_version"),
        F.col("version"),
    )
    # Evolved payload column (FIXTURES.md §F3): size_bytes exists from
    # schema v2 on; v1-era events carry null. The int→long widen happens in
    # the TARGET schema (v2 int → v3 long), exercised by the registry.
    events = events.withColumn(
        "size_bytes",
        F.when(
            (F.col("schema_version") >= 2) & F.col("content").isNotNull(),
            F.length("content").cast("long"),
        ),
    )

    if schema_change_seqs:
        from pyspark.sql.types import StructField, StructType

        nullable_schema = StructType(
            [StructField(f.name, f.dataType, True) for f in events.schema.fields]
        )
        markers = spark.createDataFrame(
            [
                (int(at_seq), 0, "S", None, None, None, None, None, int(ver), 0,
                 None)
                for at_seq, ver in sorted(schema_change_seqs.items())
            ],
            schema=nullable_schema,
        )
        events = events.unionByName(markers)
    # Release the rank-stage cache: the bucket offsets were collected from
    # a pure function of the rows (not physical partitioning), so a later
    # recompute of the returned (lazy) plan yields identical rows — the
    # cache only saves the double pass during generation. Callers still
    # materialize the fixture to parquet before timing anything.
    persisted.unpersist()
    return events


EVENT_SCHEMA_FIELDS = [
    "seq", "event_group", "op", "repo", "path",
    "commit", "lang", "content", "schema_version", "version", "size_bytes",
]


def expected_final_state(events: DataFrame) -> DataFrame:
    """Oracle replay in pure DataFrame form: per key, the max-seq event wins;
    winners with op='D' vanish. Used by tests alongside the independent
    DuckDB SQL oracle (tests/oracle.py)."""
    w = Window.partitionBy("repo", "path").orderBy(F.desc("seq"))
    return (
        events.filter(F.col("op").isin("I", "U", "D"))
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op") != "D"))
        .select("repo", "path", "commit", "lang", "content")
    )
