"""Last-writer-wins MERGE apply into a LakeTable (copy-on-write).

Semantics (the one relational heavy-hitter the reference lacks natively and
approximates via MR compaction): per key, the event with the greatest ``seq``
wins — reference: gobblin-compaction/src/main/java/gobblin/compaction/mapreduce/avro/AvroKeyDedupReducer.java:52-55
(keep-last per key), key selection ≙ MRCompactorAvroKeyDedupJobRunner.java:80
(primary-key annotated fields).

Correctness under out-of-order + duplicate delivery ACROSS batches: deletes
are kept as **tombstone rows** (``__deleted = true``) carrying their seq, so
a late update with a smaller seq than an already-applied delete loses the LWW
comparison instead of resurrecting the row. Tombstones are garbage-collected
once the low watermark passes the out-of-order horizon (``gc_tombstones``) —
the reference's analog is late-data recompaction
(gobblin-compaction/.../mapreduce/MRCompactor.java:147-157).

Physical plan (designed for 100 TB):
  1. bucket pruning — only table buckets containing batch keys are read and
     rewritten (k/B of the table for k affected buckets); the bucket set is
     a distinct over a hash expression on the raw batch (no reduce needed).
  2. union(target-subset, normalized batch) → ONE LWW reduce by key.
     No join: a union + aggregate has strictly less shuffle than an outer
     join and the same result. No separate in-batch pre-reduce either:
     max_by is a declarative aggregate, so Spark's partial (map-side)
     aggregation already collapses duplicate keys before the single
     shuffle — a pre-reduce would just add a second shuffle of the batch.
     Optional explicit two-stage salting for flagged hot keys.
  3. atomic snapshot commit (kept files + new files).

Idempotent: re-applying the same batch yields byte-identical visible state
(max-seq is order- and duplicate-insensitive), which is what makes crash
recovery a blind re-run (≙ CommitStep.verify()/execute(),
gobblin-core/src/main/java/gobblin/commit/FsRenameCommitStep.java:38,135).
"""

from __future__ import annotations

from typing import Any, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from gobblin_spark.lakehouse.table import (
    ConcurrentCommitError,
    LakeTable,
    Snapshot,
    bucket_expr,
    file_spec_n,
    mapped_buckets,
)

# System columns stored in the target table.
SEQ_COL = "__seq"
DELETED_COL = "__deleted"
# Cell-dialect extras: per-column write seqs + retained max delete seq.
CELLS_COL = "__cells"
DELSEQ_COL = "__del_seq"
META_COLS = (SEQ_COL, DELETED_COL, CELLS_COL, DELSEQ_COL)


def lww_reduce(
    df: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    salt_buckets: int = 0,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Per key, keep the row with max ``seq`` (deterministic tie: row wins by
    (seq, op-rank) so a delete beats a same-seq upsert — duplicates of the
    same event are byte-identical so ties are content-neutral anyway).

    salt_buckets>0 enables an explicit two-stage reduce: stage 1 groups by
    (key, salt) — spreading one hot key over ``salt_buckets`` reducers —
    stage 2 merges the per-salt winners. With ``hot_keys`` given (a DataFrame
    of key columns), only flagged keys take the salted path; the rest use the
    single-stage reduce (skew fix without doubling shuffle for cold keys).
    ≙ the reference's bi-level packing tradeoff
    (gobblin-core/.../packer/KafkaBiLevelWorkUnitPacker.java:42-47).
    """
    # op-rank breaks exact seq ties deterministically (D > U > I > S); after
    # normalization the delete bit lives in __deleted instead of op.
    # SQL strings, one F.expr each: per-operator Column construction is
    # py4j round-trips — serial driver cost on every batch (see
    # Planner.batch_predicate).
    cols = df.columns
    payload_sql = "struct(" + ", ".join(f"`{c}`" for c in cols) + ")"
    if "op" in cols:
        rank_sql = ("CASE WHEN op = 'D' THEN 3 WHEN op = 'U' THEN 2"
                    " WHEN op = 'I' THEN 1 ELSE 0 END")
    elif DELETED_COL in cols:
        rank_sql = f"CASE WHEN `{DELETED_COL}` THEN 3 ELSE 2 END"
    else:
        rank_sql = "0"
    order_sql = f"struct(`{seq_col}` AS s, {rank_sql} AS r)"

    if salt_buckets <= 0:
        return (
            df.groupBy(*keys)
            .agg(F.expr(f"max_by({payload_sql}, {order_sql}) AS __w"))
            .select("__w.*")
        )
    payload = F.expr(payload_sql)
    order = F.expr(order_sql)

    if hot_keys is not None:
        flagged = df.join(F.broadcast(hot_keys.select(*keys).distinct()),
                          on=list(keys), how="leftsemi")
        cold = df.join(F.broadcast(hot_keys.select(*keys).distinct()),
                       on=list(keys), how="leftanti")
        hot_reduced = _two_stage(flagged, keys, payload, order, salt_buckets)
        cold_reduced = (
            cold.groupBy(*keys)
            .agg(F.max_by(payload, order).alias("__w"))
            .select("__w.*")
        )
        # A key can only be in one side, so union needs no final reduce.
        return hot_reduced.unionByName(cold_reduced)
    return _two_stage(df, keys, payload, order, salt_buckets)


def lww_patch_reduce(
    df: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    payload_cols: Sequence[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Partial-update (patch) CDC merge: per key, each payload column takes
    its LATEST NON-NULL value by seq — a null column in an update means
    "unchanged", not "set to null" (Debezium/Mongo patch semantics; the
    reference's row-level LWW in AvroKeyDedupReducer has no per-column
    variant — this is the column-granular generalization a patch stream
    needs). A delete clears ALL state: columns from before the key's last
    'D' never resurface, and a key whose last event is the delete vanishes.

    Plan shape: one window (last-delete seq per key) followed by a groupBy
    on the SAME keys — Catalyst reuses the window's hash partitioning for
    the aggregate, so the whole reduce costs a single shuffle; max_by's
    ordering expression is null for rows where the column is null, which
    excludes them from that column's race without a per-column filter pass.
    """
    payload_cols = [c for c in (payload_cols or df.columns)
                    if c not in (*keys, seq_col, op_col)]
    w = Window.partitionBy(*keys)
    last_del = F.max(
        F.when(F.col(op_col) == "D", F.col(seq_col))).over(w)
    live = (
        df.withColumn("__last_del", last_del)
        .filter((F.col(op_col) != "D")
                & (F.col(seq_col) > F.coalesce(F.col("__last_del"),
                                               F.lit(-(1 << 62)))))
    )
    aggs = [F.max(seq_col).alias(seq_col)] + [
        F.max_by(F.col(c),
                 F.when(F.col(c).isNotNull(), F.col(seq_col))).alias(c)
        for c in payload_cols
    ]
    return live.groupBy(*keys).agg(*aggs)


def patch_reduce_stored(
    df: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Patch (column-granular) resolution over the STORED row shape
    (payload + __seq + __deleted): one output row per key —

    - a key with any live row after its last tombstone folds to per-column
      latest-non-null values, ``__seq`` = max live seq, ``__deleted`` false
      (the tombstone is superseded: every pre-delete row is removed by this
      same fold, so nothing it guarded can resurface);
    - a key whose last word is the tombstone keeps ONE tombstone row at the
      delete's seq (dropped only by compaction's gc_horizon, same contract
      as the row dialect).

    Safe to apply to already-folded data (idempotent: a folded row is a
    single live row that wins every per-column race). Plan: one window
    (last-delete seq) + an aggregate on the same keys reusing the window's
    partitioning — a single shuffle, mirroring lww_patch_reduce."""
    payload_cols = [c for c in df.columns
                    if c not in (*keys, SEQ_COL, DELETED_COL)]
    w = Window.partitionBy(*keys)
    last_del = F.max(
        F.when(F.col(DELETED_COL), F.col(SEQ_COL))).over(w)
    live = (~F.col(DELETED_COL)) & (
        F.col(SEQ_COL) > F.coalesce(F.col("__last_del"),
                                    F.lit(-(1 << 62))))
    agg = (
        df.withColumn("__last_del", last_del)
        .withColumn("__live", live)
        .groupBy(*keys)
        .agg(
            F.max(F.when(F.col("__live"), F.col(SEQ_COL))).alias("__live_seq"),
            F.max(F.when(F.col(DELETED_COL), F.col(SEQ_COL))).alias("__del_seq"),
            *[
                F.max_by(
                    F.col(c),
                    F.when(F.col("__live") & F.col(c).isNotNull(),
                           F.col(SEQ_COL)),
                ).alias(c)
                for c in payload_cols
            ],
        )
    )
    dead = F.col("__live_seq").isNull()

    def out_col(c: str):
        if c in keys:
            return F.col(c)
        if c == SEQ_COL:
            return F.coalesce(
                F.col("__live_seq"), F.col("__del_seq")).alias(SEQ_COL)
        if c == DELETED_COL:
            return dead.alias(DELETED_COL)
        return F.when(~dead, F.col(c)).alias(c)

    # preserve the input column order — writers/readers union by name, but
    # a stable order keeps written files schema-identical to the row path
    return agg.select(*[out_col(c) for c in df.columns])


def batch_to_stored(
    batch: DataFrame,
    payload_cols: Sequence[str],
    seq_col: str,
    op_col: str,
    dialect: str,
) -> DataFrame:
    """Normalize a raw change-event batch (payload + seq + op) to the stored
    row shape of a target table: delete → tombstone row, and for the 'cell'
    dialect additionally ``__cells`` (payload column → the seq that wrote it,
    only for columns this event actually set) and ``__del_seq`` (the seq of a
    delete event, else null)."""
    exprs = [f"`{c}`" for c in payload_cols] + [
        f"CAST(`{seq_col}` AS BIGINT) AS `{SEQ_COL}`",
        f"(`{op_col}` = 'D') AS `{DELETED_COL}`",
    ]
    if dialect == "cell":
        pairs = ", ".join(
            f"'{c}', IF(`{op_col}` <> 'D' AND `{c}` IS NOT NULL, "
            f"CAST(`{seq_col}` AS BIGINT), CAST(NULL AS BIGINT))"
            for c in payload_cols
        )
        cells = (f"map_filter(map({pairs}), (k, v) -> v IS NOT NULL)"
                 if pairs else "CAST(map() AS MAP<STRING, BIGINT>)")
        exprs.append(f"{cells} AS `{CELLS_COL}`")
        exprs.append(
            f"IF(`{op_col}` = 'D', CAST(`{seq_col}` AS BIGINT), "
            f"CAST(NULL AS BIGINT)) AS `{DELSEQ_COL}`")
    return batch.selectExpr(*exprs)


def cell_reduce_stored(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Patch resolution over the CELL-dialect stored shape (payload +
    ``__seq`` + ``__deleted`` + ``__cells`` map<col,seq> + ``__del_seq``):
    one output row per key.

    Unlike ``patch_reduce_stored`` — which attributes every surviving column
    of a folded row to the row's max seq and is therefore only correct when
    folds happen in seq-monotone order (the batch planner's admission
    guarantee) — this fold carries each column's ORIGINAL write seq in the
    ``__cells`` map and the maximum delete seq in ``__del_seq`` even when the
    key is live (Cassandra-style cell timestamps + tombstone retention). That
    makes the fold **associative and commutative**: fold(fold(A), B) =
    fold(A ∪ B) for any split and any arrival order, so COW merges,
    compaction and STREAMING epochs may fold in any order without
    resurrecting stale columns or dropped pre-delete state. The two failure
    modes this closes (both reachable in the 'column' dialect under
    cross-epoch disorder):

    - stale-cell win: fold attributes col a (set at seq 3) to the row max
      seq 7; a late a@4 would lose 4 < 7. Here a's cell seq stays 3 → 4 wins.
    - tombstone loss: fold sees D@4 superseded by b@7 and drops the delete;
      a late c@3 (pre-delete state) would resurface. Here ``__del_seq`` = 4
      is retained on the live row and kills any cell ≤ 4.

    Per-column race: latest cell by cell seq, cells ≤ the key's max delete
    seq excluded. Key liveness: any non-tombstone row with ``__seq`` greater
    than the max delete seq (an all-null patch still counts, mirroring
    ``lww_patch_reduce``). Plan shape: one window (max delete seq per key) +
    one aggregate on the same keys reusing the window's partitioning — a
    single shuffle, same as the other stored reduces. Retained ``__del_seq``
    on live keys costs 8 bytes/key and is nulled only by tombstone GC
    semantics (events older than the horizon are out of contract)."""
    payload_cols = [c for c in df.columns if c not in (*keys, *META_COLS)]
    w = Window.partitionBy(*keys)
    neg = F.lit(-(1 << 62))
    df2 = df.withColumn(
        "__last_del", F.coalesce(F.max(F.col(DELSEQ_COL)).over(w), neg))

    def cell_seq(c: str):
        s = F.element_at(F.col(CELLS_COL), F.lit(c))
        return F.when(s > F.col("__last_del"), s)

    aggs = [
        F.max(
            F.when((~F.col(DELETED_COL))
                   & (F.col(SEQ_COL) > F.col("__last_del")),
                   F.col(SEQ_COL))
        ).alias("__live_seq"),
        F.max(F.col(DELSEQ_COL)).alias("__del_max"),
    ]
    for c in payload_cols:
        aggs.append(F.max_by(F.col(c), cell_seq(c)).alias(c))
        aggs.append(F.max(cell_seq(c)).alias(f"__cs_{c}"))
    agg = df2.groupBy(*keys).agg(*aggs)
    dead = F.col("__live_seq").isNull()
    if payload_cols:
        cells_out = F.map_filter(
            F.map_from_arrays(
                F.array(*[F.lit(c) for c in payload_cols]),
                F.array(*[F.col(f"__cs_{c}") for c in payload_cols]),
            ),
            lambda k, v: v.isNotNull(),
        )
    else:
        cells_out = F.expr("CAST(map() AS MAP<STRING, BIGINT>)")

    def out_col(c: str):
        if c in keys:
            return F.col(c)
        if c == SEQ_COL:
            return F.coalesce(
                F.col("__live_seq"), F.col("__del_max")).alias(SEQ_COL)
        if c == DELETED_COL:
            return dead.alias(DELETED_COL)
        if c == CELLS_COL:
            return F.when(~dead, cells_out).otherwise(
                F.expr("CAST(map() AS MAP<STRING, BIGINT>)")
            ).alias(CELLS_COL)
        if c == DELSEQ_COL:
            return F.col("__del_max").alias(DELSEQ_COL)
        return F.when(~dead, F.col(c)).alias(c)

    return agg.select(*[out_col(c) for c in df.columns])


def stored_reduce(
    snap: Snapshot,
    df: DataFrame,
    keys: Sequence[str],
    salt_buckets: int = 0,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Dialect-routed LWW resolution over stored rows. Salting applies only
    to the row dialect: the patch/cell folds are single declarative
    aggregates whose per-column races a two-stage row fold would break."""
    if snap.merge_dialect == "column":
        return patch_reduce_stored(df, keys)
    if snap.merge_dialect == "cell":
        return cell_reduce_stored(df, keys)
    return lww_reduce(df, keys, SEQ_COL,
                      salt_buckets=salt_buckets, hot_keys=hot_keys)


def _two_stage(df: DataFrame, keys, payload, order, salt_buckets: int) -> DataFrame:
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns if c not in keys]),
                  F.lit(salt_buckets)).alias("__salt")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(*[F.col(k) for k in keys], F.col("__salt"))
        .agg(F.max_by(payload, order).alias("__w"), F.max(order).alias("__o"))
    )
    order2 = F.col("__o")
    return (
        stage1.groupBy(*[F.col(k) for k in keys])
        .agg(F.max_by(F.col("__w"), order2).alias("__w"))
        .select("__w.*")
    )


def merge_lww(
    table: LakeTable,
    batch: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    salt_buckets: int = 0,
    hot_keys: DataFrame | None = None,
    properties: dict[str, Any] | None = None,
    expected_version: int | None = None,
) -> Snapshot:
    """MERGE a change-event batch into the table, last-writer-wins by seq.

    batch columns: keys + [seq_col, op_col] + payload columns matching the
    table schema minus system columns. op ∈ {I, U, D}.
    """
    snap = table.snapshot()
    if expected_version is None:
        expected_version = snap.version
    if snap.key_cols and set(keys) != set(snap.merge_keys):
        raise ValueError(
            f"merge keys {list(keys)} != table keys {snap.merge_keys}"
        )
    payload_cols = [
        f.name for f in snap.schema.fields if f.name not in META_COLS
    ]

    # 1. Normalize batch rows to the target row shape (delete → tombstone;
    # cell dialect adds per-column write seqs + delete seq).
    batch_rows = batch_to_stored(
        batch, payload_cols, seq_col, op_col, snap.merge_dialect)

    # 2. Bucket pruning: which table buckets do batch keys hash into?
    # (distinct over a hash expr on the raw batch — no reduce, O(B) result)
    # Residue-mapped across bucket-spec evolution: a pre-rescale file is
    # affected when any affected current-spec bucket ≡ its bucket (mod its
    # spec); its untouched sibling keys just pass through the fold and get
    # rewritten under the current spec (progressive migration).
    affected = table.buckets_of(batch)
    res: dict[int, set[int]] = {}
    def _affected(f) -> bool:
        s = file_spec_n(f, snap)
        if s not in res:
            res[s] = {b % s for b in affected}
        return f.bucket in res[s]
    keep = [f for f in snap.files if not _affected(f)]
    target_subset = table.read(buckets=affected)

    # 3. Union + ONE LWW reduce (tombstones included on both sides; partial
    # aggregation collapses in-batch duplicate keys map-side, so a separate
    # in-batch pre-reduce would only add a shuffle). The 'column' dialect
    # resolves per-column latest-non-null instead (salting doesn't apply:
    # its two-stage row fold would erase which column came from which seq).
    combined = target_subset.unionByName(batch_rows)
    hot_norm = (hot_keys.select(*keys).distinct()
                if hot_keys is not None else None)
    final = stored_reduce(snap, combined, keys,
                          salt_buckets=salt_buckets, hot_keys=hot_norm)

    # Tombstones whose key never had a live target row are still kept so
    # later out-of-order updates can't resurrect; physical drop is GC's job.
    new_files = table.write_data_files(final, seq_col=SEQ_COL)
    return table.commit(
        keep_files=keep,
        add_files=new_files,
        properties=properties,
        expected_version=expected_version,
    )


def merge_lww_mor(
    table: LakeTable,
    batch: DataFrame,
    keys: Sequence[str],
    seq_col: str = "seq",
    op_col: str = "op",
    salt_buckets: int = 0,
    hot_keys: DataFrame | None = None,
    properties: dict[str, Any] | None = None,
    expected_version: int | None = None,
    pre_reduce: bool = False,
    distribution: str = "cluster",
) -> Snapshot:
    """Merge-on-read apply: the 100 TB scale path.

    Writes the batch as NEW delta files — the target is never read or
    rewritten at apply time, so apply cost is O(batch), not O(affected
    table buckets). Readers resolve LWW across base+delta files
    (``read_current``); ``compact`` folds deltas back to one row per key.

    The apply's ONLY wide operation is the single repartition that clusters
    rows by storage bucket for the write — and ``distribution="fanout"``
    removes even that (per-task bucketed files, Iceberg's
    distribution-mode=none; compaction folds the extra files).
    ``pre_reduce=True`` additionally
    collapses in-batch duplicate keys with a keyed LWW shuffle before
    writing — smaller deltas at the cost of a second full-payload shuffle
    per batch. Measured on the bench input (~5% duplicates + in-batch key
    collisions) the extra shuffle costs more than the delta shrink saves,
    so the default is off; turn it on for pathological batches where most
    rows share few keys (there the delta shrink also defuses read-side
    skew).

    This is the faithful Spark rendering of the reference's own
    architecture: ingest appends (FsDataWriter/BaseDataPublisher publish
    new files only), and dedup is a SEPARATE compaction job
    (gobblin-compaction/.../MRCompactorAvroKeyDedupJobRunner.java:76-156,
    AvroKeyDedupReducer.java:52-55 keep-last). Copy-on-write ``merge_lww``
    is the strict alternative when read amplification must be zero.

    Idempotent for crash recovery in the visible-state sense: re-appending
    the same batch adds byte-identical (key, seq) rows; LWW resolution and
    the next compaction collapse them, so the visible table converges.
    """
    snap = table.snapshot()
    if expected_version is None:
        expected_version = snap.version
    if snap.key_cols and set(keys) != set(snap.merge_keys):
        raise ValueError(
            f"merge keys {list(keys)} != table keys {snap.merge_keys}"
        )
    payload_cols = [
        f.name for f in snap.schema.fields if f.name not in META_COLS
    ]
    batch_rows = batch_to_stored(
        batch, payload_cols, seq_col, op_col, snap.merge_dialect)
    if snap.merge_dialect in ("column", "cell"):
        # patch deltas stay RAW: a row fold would collapse each key to one
        # row; for 'column' that loses which column was set at which seq
        # (resolution belongs to read_current/compact), and for 'cell' the
        # raw append is simply the cheapest correct delta (the cell fold
        # WOULD be safe, but folding per batch buys nothing MOR wants).
        pre_reduce = False
    if pre_reduce:
        batch_rows = lww_reduce(batch_rows, keys, SEQ_COL, salt_buckets,
                                hot_keys)
    new_files = table.write_data_files(batch_rows, seq_col=SEQ_COL,
                                       reduced=pre_reduce,
                                       distribution=distribution)
    props = dict(properties or {})
    props["mor_deltas"] = int(snap.properties.get("mor_deltas", 0)) + 1
    # exact applied-row count for free from the indexed parquet footers
    # (without pre_reduce the delta holds precisely the batch's rows)
    props["batch_rows"] = sum(f.rows for f in new_files)
    return table.commit(
        keep_files=snap.files,
        add_files=new_files,
        properties=props,
        expected_version=expected_version,
    )


def _discard_files(table: LakeTable, files) -> None:
    """Best-effort removal of freshly-written files a conflicting commit
    invalidated — anything missed is an unreferenced orphan that vacuum()
    collects, never visible data. Data-plane removal (Hadoop FS for the
    table URI), not the metadata CommitFs — the two differ in hybrid
    deployments."""
    import os as _os
    for f in files:
        try:
            table._remove_data_file(_os.path.join(table.root, f.path))
        except OSError:
            pass


def _rebase_rewrite(
    table: LakeTable,
    base: Snapshot,
    consumed: list,
    new_files: list,
    properties: dict[str, Any] | None,
    max_retries: int = 5,
) -> tuple[Snapshot | None, set[int]]:
    """Iceberg-style commit rebase for a file rewrite that lost an
    optimistic-concurrency race (≙ the reference running compaction as a
    SEPARATE job family, MRCompactor vs ingest — the race is a production
    shape there, so losing it must not discard the rewrite work).

    ``consumed`` are the exact input files the rewrite folded; a bucket of
    the rewrite is still VALID on top of the winning commit iff its file
    set is byte-identical in the new current snapshot (the winner didn't
    touch it) and the schema didn't move. Valid buckets re-commit
    METADATA-ONLY — cur's files minus that bucket's consumed inputs plus
    its rewrite outputs (files of the bucket the rewrite did NOT consume
    are kept); invalid buckets are the caller's to re-fold. Returns
    (new snapshot or None, buckets landed).

    Mixed bucket specs are NOT rebased: while a rescale migration is in
    flight, bucket ids of pre-rescale files live in a different modulus
    space, so the per-bucket file-set equality below would compare apples
    to oranges — the caller re-folds from the fresh snapshot instead
    (correct, just less salvage during the transitional window)."""
    if any(file_spec_n(f, base) != base.n_buckets
           for f in list(consumed) + list(base.files)):
        return None, set()
    consumed_by_bucket: dict[int, set[str]] = {}
    for f in consumed:
        consumed_by_bucket.setdefault(f.bucket, set()).add(f.path)
    valid = set(consumed_by_bucket)
    by_bucket: dict[int, set[str]] = {}
    for f in base.files:
        by_bucket.setdefault(f.bucket, set()).add(f.path)
    for _ in range(max_retries):
        cur = table.snapshot()
        if (cur.schema_version != base.schema_version
                or cur.schema_json != base.schema_json):
            # schema evolved under us: every rewritten file carries the old
            # layout — nothing is salvageable metadata-only
            return None, set()
        cur_by_bucket: dict[int, set[str]] = {}
        for f in cur.files:
            cur_by_bucket.setdefault(f.bucket, set()).add(f.path)
        valid = {b for b in valid
                 if cur_by_bucket.get(b, set()) == by_bucket.get(b, set())}
        if not valid:
            return None, set()
        drop = set().union(*(consumed_by_bucket[b] for b in valid))
        keep = [f for f in cur.files if f.path not in drop]
        add = [f for f in new_files if f.bucket in valid]
        props = dict(properties or {})
        # inherit the WINNER's delta flag, never our stale plan's: if the
        # winner appended fresh deltas (necessarily to buckets we are not
        # swapping — ours are validated untouched), they are still
        # unfolded; if the winner left the table clean, replacing consumed
        # files with a valid fold of them keeps it clean
        props["mor_deltas"] = int(cur.properties.get("mor_deltas", 0))
        if "gc_horizon_seq" in props:
            props["gc_horizon_seq"] = max(
                int(props["gc_horizon_seq"]),
                int(cur.properties.get("gc_horizon_seq", -1)))
        try:
            snap = table.commit(keep_files=keep, add_files=add,
                                properties=props,
                                expected_version=cur.version)
            return snap, valid
        except ConcurrentCommitError:
            continue  # another writer raced the rebase itself: revalidate
    return None, set()


def hot_buckets(snap: Snapshot, delta_ratio: float) -> set[int]:
    """Per-bucket compaction temperature from manifest metadata only
    (O(files) driver math, no scan): a bucket is HOT when its outstanding
    delta rows reach ``delta_ratio`` of its reduced base rows — or when it
    has deltas but no base yet (all-delta bucket: the ratio is infinite).

    This is the per-bucket refinement of the table-wide adaptive trigger
    (≙ MRCompactor.java:147-157 recompacting only datasets whose
    late-data ratio crossed the threshold — here the 'dataset' is one
    hash bucket): a hot bucket compacts WITHOUT rewriting cold ones, so
    skewed write patterns (one tenant/repo churning) pay O(hot bucket),
    not O(table), per compaction cycle."""
    delta: dict[int, float] = {}
    base: dict[int, float] = {}
    for f in snap.files:
        d = delta if not f.reduced else base
        # residue-mapped across bucket-spec evolution: a pre-rescale file
        # spans several current buckets — split its rows evenly across
        # them (an estimate; exact per-bucket counts would need a scan)
        m = mapped_buckets(f, snap)
        share = f.rows / len(m)
        for b in m:
            d[b] = d.get(b, 0.0) + share
    return {
        b for b, rows in delta.items()
        if rows > 0 and (base.get(b, 0) == 0
                         or rows / base[b] >= delta_ratio)
    }


def compact(
    table: LakeTable,
    salt_buckets: int = 0,
    hot_keys: DataFrame | None = None,
    properties: dict[str, Any] | None = None,
    buckets: set[int] | None = None,
    min_files_per_bucket: int = 2,
    gc_horizon_seq: int | None = None,
    max_commit_retries: int = 3,
    max_rows_per_file: int | None = None,
) -> Snapshot:
    """Fold MOR delta files into one row per key (LWW by __seq) — the
    reference's standalone compaction job (MRCompactor), as one bucketed
    Spark job: shuffle by key is bucket-aligned with the storage layout.

    ``gc_horizon_seq`` folds tombstone GC into the same rewrite: tombstones
    at or below the horizon (no event with smaller seq can still arrive —
    planning only admits seq > committed watermark) are dropped from the
    compacted output, for free. A separate ``gc_tombstones`` pass after
    compaction would read and rewrite the whole live table AGAIN — at 100 TB
    that second rewrite is the difference between compaction being O(table)
    and O(2·table) per cycle. Buckets this incremental pass skips
    (single-file, no deltas) keep their dead tombstones until they next
    receive writes; ``gc_tombstones`` remains for forcing those clean.

    Incremental by default: only buckets holding ≥ min_files_per_bucket
    files are rewritten (a bucket with one file is already one-row-per-key);
    pass ``buckets`` to restrict further. At 100 TB this is what bounds
    compaction cost to the actively-written part of the table — the analog
    of the reference recompacting only datasets whose late-data ratio
    crossed a threshold (MRCompactor.java:147-157).

    Concurrent-writer safe: the commit is optimistic, and on losing the
    race to another writer (ingest appending deltas, another compactor)
    the rewrite is REBASED rather than discarded — buckets whose input
    file sets the winner didn't touch re-commit metadata-only on top of
    the winning snapshot; invalidated buckets are re-planned and re-folded
    from the new snapshot, up to ``max_commit_retries`` rounds. ≙ the
    reference running compaction as a separate job family (MRCompactor
    racing ingest is the production shape), with Iceberg's
    validate-and-retry instead of its job-level lock."""
    last_exc: Exception | None = None
    for _ in range(max_commit_retries + 1):
        snap = table.snapshot()
        if int(snap.properties.get("mor_deltas", 0)) == 0:
            return snap
        # Current-spec bucket occupancy, residue-mapped across bucket-spec
        # evolution: a pre-rescale file counts into every current bucket it
        # can hold keys for.
        per_bucket: dict[int, int] = {}
        unreduced: set[int] = set()
        mapped: dict[str, range] = {}
        for f in snap.files:
            mapped[f.path] = mapped_buckets(f, snap)
            for b in mapped[f.path]:
                per_bucket[b] = per_bucket.get(b, 0) + 1
                if not f.reduced:
                    unreduced.add(b)
        # a bucket needs folding when files can conflict on a key: ≥2
        # files, or a single raw-append delta (not guaranteed
        # one-row-per-key internally)
        target_buckets = {
            b for b, n in per_bucket.items() if n >= min_files_per_bucket
        } | unreduced
        need_fold = set(target_buckets)
        if buckets is not None:
            target_buckets &= buckets
        # CLOSURE under spec mapping: a pre-rescale file straddling the
        # target boundary must be consumed exactly once, so every current
        # bucket it covers joins the fold (its whole key range is rewritten
        # under the current spec — this is how rescale migration happens).
        while True:
            grown = set(target_buckets)
            for f in snap.files:
                m = mapped[f.path]
                if len(m) > 1 and any(b in target_buckets for b in m):
                    grown.update(m)
            if grown == target_buckets:
                break
            target_buckets = grown
        if not target_buckets:
            props = dict(properties or {})
            props["mor_deltas"] = int(bool(need_fold))
            try:
                return table.commit(keep_files=snap.files, add_files=[],
                                    properties=props,
                                    expected_version=snap.version)
            except ConcurrentCommitError as exc:
                last_exc = exc
                continue  # metadata-only: replan from the winner, cheap
        keep = [f for f in snap.files
                if not any(b in target_buckets for b in mapped[f.path])]
        # pinned read: fold exactly the snapshot the commit will validate
        # against, never files a concurrent commit lands mid-job
        df = table.read(snap.version, buckets=target_buckets)
        final = stored_reduce(snap, df, snap.merge_keys, salt_buckets,
                              hot_keys)
        if gc_horizon_seq is not None:
            final = final.filter(
                ~(F.col(DELETED_COL) & (F.col(SEQ_COL) <= gc_horizon_seq)))
        # compaction is the write that pays for read layout: key-sorted
        # files give narrow parquet row-group stats, so point lookups skip
        # row groups in-file on top of manifest bucket + key_bounds skipping
        splits = None
        if max_rows_per_file:
            # giant-bucket guard (one tenant holding most of a table):
            # hash-split a bucket whose row count exceeds the cap over
            # ceil(rows/cap) tasks/files — bounds the compaction straggler
            # task and the output file size without touching cold buckets.
            # Row counts from manifest metadata (upper bound: pre-fold).
            rows_per_bucket: dict[int, float] = {}
            for f in snap.files:
                m = mapped[f.path]
                if any(b in target_buckets for b in m):
                    share = f.rows / len(m)
                    for b in m:
                        if b in target_buckets:
                            rows_per_bucket[b] = (
                                rows_per_bucket.get(b, 0.0) + share)
            splits = {
                b: int(-(-r // max_rows_per_file))
                for b, r in rows_per_bucket.items()
                if r > max_rows_per_file
            } or None
        new_files = table.write_data_files(final, seq_col=SEQ_COL,
                                           sort_cols=list(snap.merge_keys),
                                           splits_by_bucket=splits)
        props = dict(properties or {})
        if gc_horizon_seq is not None:
            props["gc_horizon_seq"] = gc_horizon_seq
        # deltas remain only if a bucket subset was explicitly requested
        # and some conflict-prone bucket was left unfolded
        props["mor_deltas"] = 0 if buckets is None else int(
            any(any(b in need_fold for b in mapped[f.path]) for f in keep)
        )
        try:
            return table.commit(
                keep_files=keep,
                add_files=new_files,
                properties=props,
                expected_version=snap.version,
            )
        except ConcurrentCommitError as exc:
            last_exc = exc
            consumed = [f for f in snap.files
                        if any(b in target_buckets for b in mapped[f.path])]
            rebased, landed = _rebase_rewrite(
                table, snap, consumed, new_files, props)
            _discard_files(
                table, [f for f in new_files if f.bucket not in landed])
            if (rebased is not None and landed == target_buckets
                    and int(rebased.properties.get("mor_deltas", 0)) == 0):
                return rebased  # everything folded, winner added nothing
            # invalidated buckets, a failed rebase, or deltas the winner
            # appended re-fold from the fresh snapshot next round; work
            # already landed metadata-only stays landed
            continue
    raise last_exc  # type: ignore[misc]


def read_current(
    table: LakeTable,
    version: int | None = None,
    value_eq: dict[str, Any] | None = None,
    value_range: dict[str, dict] | None = None,
) -> DataFrame:
    """The visible (non-tombstone) state of a CDC target table. For a table
    with outstanding MOR deltas, resolves LWW across base+delta files first
    (merge-on-read).

    ``value_eq``: equality predicate on configured stats columns. On a
    compacted table (no outstanding deltas: one stored row per key) the
    value-stats blooms skip non-matching FILES at planning time — a
    secondary-predicate scan reads O(matching files), not O(table). With
    unresolved deltas file-level skipping before LWW resolution would be
    UNSOUND (a key's winning row may live in a file the predicate
    excludes, resurrecting an older matching row), so the read falls back
    to the full resolve and filters rows only. Either way the row filter
    is always applied (blooms are approximate).

    ``value_range``: interval predicate per stats column —
    {col: {"lo": v|None, "hi": v|None, "lo_strict": bool, "hi_strict":
    bool}} — pruned at planning time via the per-file [min,max] value
    bounds under the same compacted-only soundness gate, with the exact
    row filter always applied."""
    snap = table.snapshot(version)
    deltas = int(snap.properties.get("mor_deltas", 0)) > 0
    df = table.read(version,
                    value_eq=value_eq if not deltas else None,
                    value_range=value_range if not deltas else None)
    if deltas:
        df = stored_reduce(snap, df, snap.merge_keys)
    if DELETED_COL in df.columns:
        df = (df.filter(~F.col(DELETED_COL))
                .drop(DELETED_COL, SEQ_COL, CELLS_COL, DELSEQ_COL))
    if value_eq:
        from gobblin_spark.lakehouse.table import (
            _coerce_probe, _coerce_probe_extended,
        )
        types = {f.name: f.dataType.typeName() for f in snap.schema.fields}
        for c, v in value_eq.items():
            if v is None:
                df = df.filter(F.col(c).isNull())
                continue
            # coerce CLI-string probes to the column type (ANSI mode would
            # otherwise throw on the implicit cast inside the comparison);
            # a typed probe of a type _coerce_probe doesn't know passes
            # through; a STRING probe on a type neither coercion knows
            # raises — silently matching nothing would make
            # `delete --where date_col=...` report deleted:0 and succeed
            t = types.get(c, "string")
            cv = _coerce_probe(v, t)
            if cv is None and not isinstance(v, str):
                cv = v
            if cv is None:
                cv = _coerce_probe_extended(v, t)
            df = df.filter(F.col(c) == F.lit(cv))
    if value_range:
        from gobblin_spark.lakehouse.table import (
            _coerce_probe, _coerce_probe_extended,
        )
        import operator

        types = {f.name: f.dataType.typeName() for f in snap.schema.fields}
        for c, iv in value_range.items():
            t = types.get(c, "string")
            for side, op_strict, op in (("lo", operator.gt, operator.ge),
                                        ("hi", operator.lt, operator.le)):
                v = iv.get(side)
                if v is None:
                    continue
                cv = _coerce_probe(v, t)
                if cv is None and not isinstance(v, str):
                    cv = v
                if cv is None:
                    cv = _coerce_probe_extended(v, t)
                cmp = op_strict if iv.get(f"{side}_strict") else op
                df = df.filter(cmp(F.col(c), F.lit(cv)))
    return df


def delete_where(
    table: LakeTable,
    predicate: dict[str, Any] | None = None,
    seq: int | None = None,
    properties: dict[str, Any] | None = None,
    range_predicate: dict[str, dict] | None = None,
) -> dict[str, Any]:
    """Targeted deletion — ``DELETE FROM t WHERE col = v [AND ...]`` as a
    CDC-native operation (the right-to-be-forgotten / tenant-offboarding
    maintenance op a 100 TB upsert table needs):

    1. find the matching LIVE keys via ``read_current(value_eq=predicate)``
       — on a compacted table with value-stats blooms on the predicate
       column this plans O(matching files), not O(table);
    2. emit one TOMBSTONE per matched key (payload columns NULLED — a
       tombstone must not itself retain the data being deleted) at ``seq``
       (default: the table's max stored seq + 1, computed from manifest
       stats, no scan) and MERGE it through the normal LWW apply — so the
       deletion is crash-safe, replayable, and visible in the changelog
       (``table_changes`` shows 'delete' rows) and to downstream syncs.

    LWW semantics are preserved exactly: a FUTURE event for the key with a
    higher seq recreates the row (Iceberg-DELETE-like); choose ``seq``
    consciously if the table is still being fed by a stream whose offsets
    can pass the default.

    PHYSICAL erasure is completed by the normal maintenance pipeline —
    the merge rewrites the affected buckets (old files leave the live
    manifest immediately), then ``gc_tombstones``/compaction drops the
    tombstones, ``expire_snapshots`` retires the manifests that still
    reference the old files, and ``vacuum`` deletes them from disk. The
    ``purge`` CLI composes exactly that sequence.

    ``range_predicate``: interval clauses in read_current's value_range
    form — DELETE WHERE col >= v / BETWEEN, victim discovery pruned by
    the per-file [min,max] value bounds. ANDed with ``predicate``.

    Returns {"deleted": n, "seq": s, "snapshot_version": v}."""
    if not predicate and not range_predicate:
        raise ValueError("delete_where needs a predicate (an unqualified "
                         "full-table delete must be spelled explicitly "
                         "by the caller, not defaulted into)")
    snap = table.snapshot()
    if seq is None:
        seqs = [f.max_seq for f in snap.files if f.max_seq is not None]
        seq = (max(seqs) + 1) if seqs else 1
    keys = snap.merge_keys
    payload = [f.name for f in snap.schema.fields
               if f.name not in META_COLS and f.name not in keys]
    victims = read_current(table, value_eq=predicate or None,
                           value_range=range_predicate).select(*keys)
    # merge_lww runs several actions over the batch (bucket planning, the
    # write, the stats pass), so an Observation can't count it — one extra
    # count over the bloom-pruned read is the simple correct thing
    n = victims.count()
    if n == 0:
        return {"deleted": 0, "seq": int(seq),
                "snapshot_version": snap.version}
    types = {f.name: f.dataType for f in snap.schema.fields}
    batch = victims.select(
        *keys,
        F.lit(int(seq)).cast("long").alias("seq"),
        F.lit("D").alias("op"),
        *[F.lit(None).cast(types[c]).alias(c) for c in payload],
    )
    props = dict(properties or {})
    props["delete_where"] = {k: str(v) for k, v in (predicate or {}).items()}
    if range_predicate:
        props["delete_where_range"] = {
            c: {k: (str(v) if v is not None and not isinstance(v, bool)
                    else v)
                for k, v in iv.items()}
            for c, iv in range_predicate.items()}
    new = merge_lww(table, batch, keys, properties=props)
    return {"deleted": n, "seq": int(seq),
            "snapshot_version": new.version}


def table_fingerprint(
    table: LakeTable,
    version: int | None = None,
    algo: str = "sha256",
) -> dict[str, Any]:
    """Order-independent content fingerprint of the visible table state —
    the verification primitive behind replay-convergence checks: two tables
    (or one table replayed twice, in any batch order, with any crash/retry
    history) hold identical visible state iff their fingerprints match.

    ≙ the reference's converged-output validation
    (gobblin-compaction/.../CompactionVerifier and the task-state row-count
    audits): here rendered as ONE aggregate over the LWW-resolved state.

    algo:
    - ``sha256`` (default): per row, sha2-256 over the concatenation of
      fixed-length per-column digests (sha2-256 hex of each value's string
      rendering, columns in sorted-name order; NULL rendered as a 64-char
      non-hex sentinel no digest can equal). Fixed-length fields make the
      rendering INJECTIVE over the row tuple — no separator character a
      value could contain can shift field boundaries — so distinct rows
      hash equal only with cryptographic-collision probability.
      Content-stable across file layout, bucket count, batch order,
      engine version; 48 bits/row summed exactly in decimal(38,0).
    - ``xxhash64``: JVM-native hash of the column values, ~10× faster at
      100 TB; stable within Spark but tied to its binary encodings.

    Sum-of-hashes is order-independent, collision-negligible (2^-48/row for
    sha256 prefixes), and one whole-stage-codegen aggregate: no sort, no
    shuffle beyond the final single-row reduce."""
    df = read_current(table, version)
    cols = sorted(df.columns)
    if algo == "sha256":
        # per-column digest is always exactly 64 chars (sha2 hex, or the
        # all-'n' NULL sentinel — 'n' is not a hex digit, so no value's
        # digest can equal it); concat of fixed-length fields is injective
        canon = F.concat(
            *[F.coalesce(F.sha2(F.col(c).cast("string"), 256),
                         F.lit("n" * 64))
              for c in cols])
        row_h = F.conv(F.substring(F.sha2(canon, 256), 1, 12), 16, 10)
    elif algo == "xxhash64":
        row_h = F.xxhash64(*[F.col(c) for c in cols])
    else:
        raise ValueError(f"unknown fingerprint algo: {algo}")
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(row_h.cast("decimal(38,0)")).alias("fp"),
    ).first()
    snap = table.snapshot(version)
    return {
        "version": snap.version,
        "rows": int(r["n"]),
        "fingerprint": str(r["fp"]) if r["fp"] is not None else "0",
        "algo": algo,
        "columns": cols,
    }


def point_lookup(
    table: LakeTable,
    key: dict[str, Any],
    version: int | None = None,
    prefer_local: bool = True,
) -> DataFrame:
    """Current visible state of ONE merge key without scanning the table:
    hash the key to its storage bucket (one local-relation Spark job, no
    data scan), read only that bucket's files, LWW-resolve, filter. At
    100 TB with 4096 buckets a lookup touches 1/4096 of the files — the
    primary-key read a CDC consumer expects from an upsert table (≙ Hive
    consumers of the reference's published tables predicate-pushing on the
    partition; here the merge-key hash layout IS the index). Valid with
    unfolded MOR deltas (resolves across base+delta like read_current).

    ``prefer_local``: first try the DRIVER-side read (pointread.py) — the
    manifest plus pyarrow row-group stats answer a single-key read in
    milliseconds with zero Spark jobs; the result is wrapped in a local
    DataFrame for an unchanged API. Falls back to the distributed path
    (all three merge dialects fold locally) for schema-version drift or
    oversized candidate sets."""
    snap = table.snapshot(version)
    if prefer_local:
        from gobblin_spark.lakehouse.pointread import (
            FALLBACK,
            point_lookup_local,
        )
        row = point_lookup_local(table, key, version)
        if row is not FALLBACK:
            from pyspark.sql.types import StructType
            visible = StructType(
                [f for f in snap.schema.fields if f.name not in META_COLS])
            return table.spark.createDataFrame(
                [row] if row is not None else [], schema=visible)
    missing = [k for k in snap.bucket_cols if k not in key]
    if missing:
        raise ValueError(f"point_lookup needs all merge keys; missing {missing}")
    # bucket id under the PINNED snapshot's spec (buckets_of would use the
    # current spec — wrong for a version pinned from before a rescale)
    one = table.spark.createDataFrame(
        [tuple(key[k] for k in snap.bucket_cols)], list(snap.bucket_cols))
    bucket = one.select(
        bucket_expr(snap.bucket_cols, snap.n_buckets).alias("b")
    ).first()["b"]
    # two-level skipping: the key's hash bucket, then key_bounds — within
    # the bucket, MOR delta files each hold only their batch's keys, so
    # most are excluded by their recorded per-column bounds without a read
    df = table.read(version, buckets={bucket},
                    key_eq={k: key[k] for k in snap.merge_keys if k in key})
    for k in snap.bucket_cols:
        df = df.filter(F.col(k) == F.lit(key[k]))
    df = stored_reduce(snap, df, snap.merge_keys)
    if DELETED_COL in df.columns:
        df = (df.filter(~F.col(DELETED_COL))
                .drop(DELETED_COL, SEQ_COL, CELLS_COL, DELSEQ_COL))
    return df


def changed_units(
    snap_old: Snapshot, snap_new: Snapshot
) -> tuple[set[int], int, bool]:
    """Driver-side O(files) manifest math: the NEW-spec bucket units whose
    file sets differ between two snapshots — the pruning unit of
    ``table_changes`` and the cost signal regime choosers (aggview's
    incremental-vs-full, maintenance planners) read. Every file on either
    side is residue-mapped into the units it can hold keys for, so the set
    is exact across bucket-spec evolution. Returns (changed units, unit
    modulus, dividable); when some file's spec does not divide the unit
    modulus (possible only after a rollback across a rescale) pruning is
    impossible and EVERY unit counts as changed — a correct superset."""
    unit_n = snap_new.n_buckets
    dividable = all(
        unit_n % file_spec_n(f, s) == 0
        for s in (snap_old, snap_new) for f in s.files
    )
    if not dividable:
        return set(range(unit_n)), unit_n, False

    def _by_unit(snap: Snapshot) -> dict[int, set[str]]:
        out: dict[int, set[str]] = {}
        for f in snap.files:
            s = file_spec_n(f, snap)
            for b in range(f.bucket % s, unit_n, s):
                out.setdefault(b, set()).add(f.path)
        return out

    by_bucket_old = _by_unit(snap_old)
    by_bucket_new = _by_unit(snap_new)
    changed = {
        b
        for b in set(by_bucket_old) | set(by_bucket_new)
        if by_bucket_old.get(b, set()) != by_bucket_new.get(b, set())
    }
    return changed, unit_n, True


def table_changes(
    table: LakeTable,
    from_version: int,
    to_version: int | None = None,
    change_col: str = "_change_type",
    emit_preimages: bool = False,
) -> DataFrame:
    """Incremental changelog read: the row-level changes between two
    committed snapshots (≙ Iceberg's ``changes`` incremental read; the
    reference's nearest analog is consumers re-reading a time partition
    after late-data recompaction, MRCompactor.java:147-157 — here the diff
    is first-class instead of "re-read everything").

    Returns one row per key whose LWW state differs between ``from_version``
    and ``to_version`` (default: current), with ``_change_type`` ∈
    {'insert','update','delete'}:

    - insert: live in new, absent-or-tombstoned in old
    - update: live in both with a different winning ``__seq`` (events are
      immutable, so state identity IS (key, seq) — no payload compare)
    - delete: tombstoned-or-absent in new, live in old. The row carries the
      tombstone's ``__seq`` (the deleting event) but the DELETED ROW'S
      payload wherever the tombstone is null — consumers get the image of
      what was removed, Iceberg-changelog style.

    ``emit_preimages=True`` (≙ Delta Lake CDF): updates emit TWO rows —
    'update_preimage' (old payload + old seq) and 'update_postimage' — and
    delete rows carry strictly the old image, so derived-state consumers
    (incremental aggregates, secondary indexes — see aggview.agg_sync) can
    retract old contributions exactly. Same single diff join, images
    exploded from one array — never evaluated twice.

    Scale shape (100 TB): bucket-pruned — a bucket whose manifest file set
    is IDENTICAL at both versions is untouched (its visible state is a pure
    function of its files), so only rewritten/delta'd buckets are read on
    either side. COW merges rewrite exactly the affected buckets and MOR
    appends delta files only into written buckets, so the diff reads
    O(changed buckets), not O(table), and the single key-keyed join shuffles
    only those buckets' rows. Both sides resolve LWW first, so the diff is
    valid with outstanding MOR deltas on either end. Both reads conform to
    the NEW snapshot's schema via the schema_log, so diffs span schema
    evolution (renamed/added columns compare correctly)."""
    snap_old = table.snapshot(from_version)
    snap_new = table.snapshot(to_version)
    if snap_new.version < snap_old.version:
        raise ValueError(
            f"to_version v{snap_new.version} < from_version v{snap_old.version}"
        )
    keys = snap_new.merge_keys

    # Diff unit = a bucket of the NEW snapshot's spec, with every file on
    # either side residue-mapped into the units it can hold keys for —
    # exact across bucket-spec evolution (rescale itself is metadata-only:
    # identical file sets per unit ⇒ empty diff). If any file's spec does
    # not divide the unit modulus (possible only after a rollback across a
    # rescale), pruning is abandoned: every unit is treated as changed —
    # a correct superset, just unpruned.
    changed, unit_n, dividable = changed_units(snap_old, snap_new)

    def _state(snap: Snapshot) -> DataFrame:
        if dividable:
            files = [
                f for f in snap.files
                if any(b in changed for b in range(
                    f.bucket % file_spec_n(f, snap), unit_n,
                    file_spec_n(f, snap)))
            ]
        else:
            files = list(snap.files)
        df = table.read_file_set(files, snap_new)  # conform to NEW schema
        return stored_reduce(snap_new, df, keys)

    old = _state(snap_old)
    new = _state(snap_new)
    payload = [c for c in new.columns if c not in (*keys, *META_COLS)]

    n = new.alias("n")
    o = old.alias("o")
    j = n.join(o, on=list(keys), how="full_outer")
    n_live = F.col(f"n.{DELETED_COL}").isNotNull() & ~F.col(f"n.{DELETED_COL}")
    o_live = F.col(f"o.{DELETED_COL}").isNotNull() & ~F.col(f"o.{DELETED_COL}")
    if snap_new.merge_dialect == "cell":
        # Cell state identity is the cell map, not the row max seq: a late
        # patch OLDER than the key's max seq still changes a column without
        # moving __seq. Maps aren't directly comparable — compare sorted
        # entry arrays.
        ident_changed = (
            F.sort_array(F.map_entries(F.col(f"n.{CELLS_COL}")))
            != F.sort_array(F.map_entries(F.col(f"o.{CELLS_COL}")))
        )
    else:
        ident_changed = F.col(f"n.{SEQ_COL}") != F.col(f"o.{SEQ_COL}")
    if not emit_preimages:
        change = (
            F.when(n_live & ~o_live, F.lit("insert"))
            .when(~n_live & o_live, F.lit("delete"))
            .when(n_live & o_live & ident_changed, F.lit("update"))
        )
        sel = list(keys) + [
            F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}")).alias(c)
            for c in payload
        ] + [
            F.coalesce(F.col(f"n.{SEQ_COL}"),
                       F.col(f"o.{SEQ_COL}")).alias(SEQ_COL),
            change.alias(change_col),
        ]
        return j.select(*sel).filter(F.col(change_col).isNotNull())

    # Preimage mode (≙ Delta Lake CDF row types): updates emit TWO rows —
    # 'update_preimage' (the replaced state: old payload, old seq) and
    # 'update_postimage' — so consumers that maintain derived state
    # (incremental aggregates, secondary indexes) can retract the old
    # contribution and apply the new one. insert/delete rows are identical
    # to the default mode. Single pass: one array-of-images per joined key,
    # exploded — the diff join is never evaluated twice.
    def _img(pay, seq_expr, label: str):
        return F.struct(
            *[pay(c).alias(c) for c in payload],
            seq_expr.alias(SEQ_COL),
            F.lit(label).alias(change_col),
        )

    img_ins = _img(lambda c: F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}")),
                   F.coalesce(F.col(f"n.{SEQ_COL}"), F.col(f"o.{SEQ_COL}")),
                   "insert")
    # delete payload = strictly the OLD image (the retraction a derived-
    # state consumer must apply); a delete only fires when o was live, so
    # the old side is always present. seq stays the deleting event's.
    img_del = _img(lambda c: F.col(f"o.{c}"),
                   F.coalesce(F.col(f"n.{SEQ_COL}"), F.col(f"o.{SEQ_COL}")),
                   "delete")
    img_pre = _img(lambda c: F.col(f"o.{c}"), F.col(f"o.{SEQ_COL}"),
                   "update_preimage")
    img_post = _img(lambda c: F.col(f"n.{c}"), F.col(f"n.{SEQ_COL}"),
                    "update_postimage")
    images = (
        F.when(n_live & ~o_live, F.array(img_ins))
        .when(~n_live & o_live, F.array(img_del))
        .when(n_live & o_live & ident_changed, F.array(img_pre, img_post))
    )
    # explode drops null arrays, so unchanged keys vanish here
    out = j.select(*keys, F.explode(images).alias("_img"))
    return out.select(
        *keys,
        *[F.col(f"_img.{c}").alias(c) for c in payload],
        F.col(f"_img.{SEQ_COL}").alias(SEQ_COL),
        F.col(f"_img.{change_col}").alias(change_col),
    )


def gc_tombstones(table: LakeTable, horizon_seq: int,
                  max_commit_retries: int = 3) -> Snapshot:
    """Physically drop tombstones with seq <= horizon (safe once the
    out-of-order horizon passed: no event with smaller seq can still arrive).
    Rewrites only files that contain qualifying tombstones (min_seq stats).

    Requires a compacted table (no outstanding MOR deltas): with multiple
    rows per key on disk, dropping a tombstone could resurrect an older
    update row — compact() first.

    Concurrent-writer safe like compact(): on losing the commit race, the
    per-bucket rewrite rebases metadata-only where the winner didn't touch
    the inputs and re-runs only invalidated buckets."""
    last_exc: Exception | None = None
    for _ in range(max_commit_retries + 1):
        snap = table.snapshot()
        if int(snap.properties.get("mor_deltas", 0)) > 0:
            raise ValueError(
                "gc_tombstones on a MOR table: run compact() first")
        rewrite = [
            f
            for f in snap.files
            if (f.min_seq is None or f.min_seq <= horizon_seq)
            and f.has_tombstones is not False  # stats-pruned: skip clean
        ]
        keep = [f for f in snap.files if f not in rewrite]
        if not rewrite:
            return snap
        # Schema-aware read: old-schema-version files (single-file buckets
        # that incremental compaction skipped) must be conformed to the
        # current schema before the rewrite is re-labeled at the current
        # version — a raw parquet read would silently null renamed/added
        # columns.
        df = table.read_file_set(rewrite, snap)
        cleaned = df.filter(
            ~(F.col(DELETED_COL) & (F.col(SEQ_COL) <= horizon_seq)))
        new_files = table.write_data_files(cleaned, seq_col=SEQ_COL)
        try:
            return table.commit(
                keep_files=keep,
                add_files=new_files,
                properties={"gc_horizon_seq": horizon_seq},
                expected_version=snap.version,
            )
        except ConcurrentCommitError as exc:
            last_exc = exc
            rebased, landed = _rebase_rewrite(
                table, snap, rewrite, new_files,
                {"gc_horizon_seq": horizon_seq})
            _discard_files(
                table, [f for f in new_files if f.bucket not in landed])
            if rebased is not None and landed == {f.bucket for f in rewrite}:
                return rebased
            continue
    raise last_exc  # type: ignore[misc]
