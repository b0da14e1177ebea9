"""Incrementally-maintained aggregate views over a CDC table's changelog.

The CDC-native derived table: a downstream LakeTable keyed by GROUP columns
holding per-group ``n_rows`` (COUNT(*)) and ``sum_<col>`` / ``nn_<col>``
(SUM and non-null count per configured numeric column) over the upstream's
visible LWW state — maintained by consuming `table_changes` with
preimages instead of re-aggregating the table (classic incremental view
maintenance via signed retractions).

≙ the reference's publish-then-recompute chain for derived datasets (a
downstream Gobblin job re-reading whole time partitions that recompaction
republished, MRCompactor.java:147-157): here the derived state advances by
exactly the rows whose visible state changed.

Per sync step (crash-safe at every point, exactly-once):
1. from_v = the view's committed source-version watermark (StateStore
   commit log, single lane); first run = BOOTSTRAP: one full aggregate of
   the upstream's current state into a fresh view table.
2. changes = table_changes(upstream, from_v, to_v, emit_preimages=True).
   Signed weight: +1 for insert/update_postimage, -1 for
   delete/update_preimage. Group deltas = one groupBy over the changes:
   d_n = sum(w), d_sum_c = sum(w*c), d_nn_c = sum(w*(c is not null)).
3. Old totals for ONLY the affected groups: the deltas' group keys hash to
   a set of view buckets (driver-side O(buckets) collect); the view is
   read bucket-pruned and left-joined onto the deltas. New totals =
   old (+) delta; a group whose n_rows reaches 0 becomes a tombstone.
4. merge_lww the upserts into the view at seq = to_v (monotone across
   syncs) with snapshot property ``agg_source_version = to_v``; then
   commit the watermark to the state store. A crash between the two
   commits reruns the same range and SKIPS the apply (the view's latest
   snapshot already records ``agg_source_version >= to_v``) — the delta is
   never applied twice.

Scale shape (100 TB upstream): each step reads O(changed buckets) of the
upstream twice (the diff), shuffles O(changed rows) once into O(touched
groups) delta rows, reads O(touched view buckets) of the view, and writes
O(touched view buckets) — never O(table) after bootstrap.

Semantics notes:
- COUNT(*) / SUM(col) with SQL null semantics: n_rows counts rows;
  sum_<col> ignores nulls and is NULL when the group has no non-null
  values (the per-column non-null count ``nn_<col>`` makes that exact
  under retractions).
- Integer sums are exact. Float sums accumulate retraction round-off
  drift relative to a from-scratch aggregate (standard IVM caveat) —
  prefer integer/decimal measures for bit-stable views.
- NULL group values are refused (Spark's null-unsafe join equality cannot
  maintain a null group; SQL GROUP BY would). One cheap probe per sync.
- MIN/MAX (``min_<col>``/``max_<col>``) are not invertible: inserts update
  them monotonically (least/greatest), and ONLY groups where a retracted
  value ties-or-beats the stored extremum are recomputed from the
  upstream state, restricted to those groups via a broadcast semi-join —
  zero upstream reads in the common append/update-upward regime, the
  standard IVM treatment for non-invertible aggregates.
"""

from __future__ import annotations

import os
import time
from typing import Any, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StructField, StructType

from gobblin_spark.lakehouse import LakeTable
from gobblin_spark.lakehouse.merge import (
    DELETED_COL, SEQ_COL, merge_lww, stored_reduce, table_changes,
)
from gobblin_spark.state.store import StateStore, WorkUnitState

_GROUP = 0  # the view's single watermark lane
_PRE = "update_preimage"
_POST = "update_postimage"

# sum result type per source column type (Spark's SUM typing)
_SUM_TYPES = {
    "integer": "long", "long": "long", "short": "long", "byte": "long",
    "float": "double", "double": "double",
}


# orderable types MIN/MAX supports (beyond the numeric sum types)
_MINMAX_EXTRA = {"string", "date", "timestamp"}


def _view_schema(src_schema: StructType, group_cols: Sequence[str],
                 sum_cols: Sequence[str],
                 minmax_cols: Sequence[str] = ()) -> StructType:
    by_name = {f.name: f for f in src_schema.fields}
    missing = [c for c in (*group_cols, *sum_cols, *minmax_cols)
               if c not in by_name]
    if missing:
        raise ValueError(f"columns not in source schema: {missing}")
    bad = [c for c in sum_cols
           if by_name[c].dataType.typeName() not in _SUM_TYPES]
    if bad:
        raise ValueError(
            f"sum_cols must be numeric (int/long/float/double): {bad}")
    bad = [c for c in minmax_cols
           if by_name[c].dataType.typeName() not in
           (set(_SUM_TYPES) | _MINMAX_EXTRA)]
    if bad:
        raise ValueError(f"minmax_cols must be orderable scalars: {bad}")
    overlap = set(group_cols) & (set(sum_cols) | set(minmax_cols))
    if overlap:
        raise ValueError(
            f"columns cannot be both group and measure: {overlap}")
    from pyspark.sql.types import BooleanType, DoubleType

    sum_type = {"long": LongType(), "double": DoubleType()}
    fields = [StructField(c, by_name[c].dataType) for c in group_cols]
    fields.append(StructField("n_rows", LongType()))
    for c in sum_cols:
        fields.append(StructField(
            f"sum_{c}",
            sum_type[_SUM_TYPES[by_name[c].dataType.typeName()]]))
        fields.append(StructField(f"nn_{c}", LongType()))
    for c in minmax_cols:
        fields.append(StructField(f"min_{c}", by_name[c].dataType))
        fields.append(StructField(f"max_{c}", by_name[c].dataType))
    # stored-row meta columns (LakeTable.create takes the STORED schema)
    fields.append(StructField(SEQ_COL, LongType()))
    fields.append(StructField(DELETED_COL, BooleanType()))
    return StructType(fields)


def _delta(changes: DataFrame, group_cols: Sequence[str],
           sum_cols: Sequence[str], minmax_cols: Sequence[str] = (),
           change_col: str = "_change_type") -> DataFrame:
    pos = F.col(change_col).isin("insert", _POST)
    w = F.when(pos, F.lit(1)).otherwise(F.lit(-1)).cast("long")
    aggs = [F.sum(w).alias("d_n")]
    for c in sum_cols:
        aggs.append(F.sum(w * F.col(c)).alias(f"d_sum_{c}"))
        aggs.append(
            F.sum(F.when(F.col(c).isNotNull(), w).otherwise(F.lit(0)))
            .alias(f"d_nn_{c}"))
    for c in minmax_cols:
        # inserted extrema feed the monotone update; retracted extrema
        # decide whether a stored extremum may have been removed
        aggs.append(F.min(F.when(pos, F.col(c))).alias(f"ins_min_{c}"))
        aggs.append(F.max(F.when(pos, F.col(c))).alias(f"ins_max_{c}"))
        aggs.append(F.min(F.when(~pos, F.col(c))).alias(f"ret_min_{c}"))
        aggs.append(F.max(F.when(~pos, F.col(c))).alias(f"ret_max_{c}"))
    return changes.groupBy(*group_cols).agg(*aggs)


def _combine(old: DataFrame, delta: DataFrame, group_cols: Sequence[str],
             sum_cols: Sequence[str],
             minmax_cols: Sequence[str] = ()) -> DataFrame:
    """new totals = old (+) delta, per touched group. Returns merge-ready
    rows: op='D' tombstone when the group's row count reaches zero.

    MIN/MAX are not invertible: inserts update them monotonically
    (least/greatest — Spark's skip nulls), but a RETRACTION that ties or
    beats the stored extremum may have removed the extremal row, so those
    groups get ``__rescan`` = true and the caller recomputes them from the
    upstream state (the standard IVM treatment for non-invertible
    aggregates). Ties are conservative — retracting one of two equal
    minima rescans even though the min survives."""
    o, d = old.alias("vo"), delta.alias("vd")
    j = d.join(o, on=list(group_cols), how="left")
    z = F.lit(0).cast("long")
    n_new = F.coalesce(F.col("vo.n_rows"), z) + F.col("vd.d_n")
    sel = list(group_cols) + [n_new.alias("n_rows")]
    for c in sum_cols:
        nn_new = (F.coalesce(F.col(f"vo.nn_{c}"), z)
                  + F.col(f"vd.d_nn_{c}"))
        s_new = (F.coalesce(F.col(f"vo.sum_{c}"), F.lit(0))
                 + F.coalesce(F.col(f"vd.d_sum_{c}"), F.lit(0)))
        # SQL SUM over a group with zero non-null values is NULL
        sel.append(F.when(nn_new > 0, s_new).alias(f"sum_{c}"))
        sel.append(nn_new.alias(f"nn_{c}"))
    rescan = F.lit(False)
    for c in minmax_cols:
        sel.append(F.least(F.col(f"vo.min_{c}"),
                           F.col(f"vd.ins_min_{c}")).alias(f"min_{c}"))
        sel.append(F.greatest(F.col(f"vo.max_{c}"),
                              F.col(f"vd.ins_max_{c}")).alias(f"max_{c}"))
        rescan = rescan | (
            F.col(f"vd.ret_min_{c}") <= F.col(f"vo.min_{c}")) | (
            F.col(f"vd.ret_max_{c}") >= F.col(f"vo.max_{c}"))
    sel.append(F.coalesce(rescan, F.lit(False)).alias("__rescan"))
    out = j.select(*sel)
    return out.withColumn(
        "op", F.when(F.col("n_rows") <= 0, F.lit("D")).otherwise(F.lit("U")))


def agg_sync(
    spark: SparkSession,
    source_root: str,
    state_root: str,
    view_root: str,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    minmax_cols: Sequence[str] = (),
    n_buckets: int = 32,
    fs=None,
    full_reaggregate_threshold: float | None = 0.5,
) -> dict[str, Any]:
    """One maintenance step: advance the aggregate view from its committed
    source-version watermark to the upstream's current version. Rerunning
    is a no-op until the upstream advances. The spec (group_cols/sum_cols/
    minmax_cols) is pinned at bootstrap and validated on every later call.

    MIN/MAX maintenance: inserts update extrema monotonically; only groups
    where a RETRACTED value ties-or-beats the stored extremum are
    recomputed from the upstream state (one scan restricted to those
    groups — zero scans in the common append/update-upward regime).

    REGIME CHOOSER: the incremental path reads the changed upstream
    buckets at BOTH versions (the diff) plus the touched view buckets —
    ~2× the changed fraction of the upstream. When the advance touched
    most of the table (bulk backfill, wide recompaction), a from-scratch
    re-aggregate (ONE upstream scan, like bootstrap, reconciled against
    the view) is strictly cheaper. The chooser reads the changed-unit
    fraction from manifest math alone (merge.changed_units — O(files)
    driver-side, no scan) and takes the full path when it reaches
    ``full_reaggregate_threshold`` (default 0.5, the break-even of the
    2×-changed vs 1×-table read costs; None forces incremental). Both
    paths commit identical view state — the choice is cost-only."""
    group_cols = list(group_cols)
    sum_cols = list(sum_cols)
    minmax_cols = list(minmax_cols)
    src = LakeTable(spark, source_root, fs=fs)
    store = StateStore(state_root, fs=fs)
    to_v = src.current_version()
    if to_v is None:
        raise ValueError(f"no table at {source_root}")
    src_snap = src.snapshot()
    schema = _view_schema(src_snap.schema, group_cols, sum_cols,
                          minmax_cols)

    wm = store.last_committed_watermarks().get(_GROUP)
    bid = f"aggsync-v{to_v:010d}"
    t0 = time.time()

    # The view's OWN `agg_source_version` snapshot property is the
    # authoritative "applied" cursor (the view commit precedes the log
    # commit, so applied >= watermark always): a crash between the two,
    # followed by upstream advances, must resume the changelog from
    # APPLIED — resuming from the watermark would re-apply the
    # already-applied range (double-counted retractions). Inspected BEFORE
    # the no-op skips so a mis-specified poll errors instead of silently
    # skipping.
    view: LakeTable | None = None
    applied = -1
    if LakeTable.exists(view_root, fs=fs):
        view = LakeTable(spark, view_root, fs=fs)
        vsnap0 = view.snapshot()
        applied = int(vsnap0.properties.get("agg_source_version", -1))
        if applied >= 0:
            _check_spec(view, group_cols, sum_cols, minmax_cols)
            src_of = vsnap0.properties.get("agg_view_of")
            if src_of is not None and src_of != src.root:
                raise ValueError(
                    f"view at {view_root} is maintained from {src_of}, "
                    f"not {source_root}")
        elif vsnap0.files:
            raise ValueError(
                f"table at {view_root} has data but no "
                "agg_source_version — not an aggregate view of anything; "
                "refusing to adopt it")
        # else: empty crash-remnant from a bootstrap that died between
        # create and merge — safe to bootstrap INTO it

    if wm is not None and int(wm) >= to_v:
        return {"from_version": int(wm), "to_version": to_v,
                "groups_touched": 0, "skipped": True}
    if store.is_committed(bid):
        return {"from_version": int(wm) if wm is not None else None,
                "to_version": to_v, "groups_touched": 0, "skipped": True}

    unit = WorkUnitState(
        workunit_id=f"{bid}-g{_GROUP}", batch_id=bid, event_group=_GROUP,
        low_seq=int(wm) if wm is not None else to_v, high_seq=to_v)
    store.begin_batch(bid, [unit])

    mode = "bootstrap"
    changed_frac = None
    if applied < 0:
        view, n_groups = _bootstrap(
            spark, src, view_root, schema, group_cols, sum_cols,
            minmax_cols, n_buckets, to_v, fs, reuse=view)
    elif applied >= to_v:
        mode = "noop"
        n_groups = 0  # crash landed between view commit and log commit
    else:
        from gobblin_spark.lakehouse.merge import changed_units

        ch, unit_n, _ = changed_units(src.snapshot(applied), src_snap)
        changed_frac = len(ch) / max(1, unit_n)
        if (full_reaggregate_threshold is not None
                and changed_frac >= full_reaggregate_threshold):
            mode = "full"
            n_groups = _reaggregate(
                spark, src, view, group_cols, sum_cols, minmax_cols, to_v)
        else:
            mode = "incremental"
            n_groups = _apply_range(
                spark, src, view, group_cols, sum_cols, minmax_cols,
                applied, to_v)

    unit.rows_read = n_groups
    unit.rows_written = n_groups
    unit.wall_ms = int((time.time() - t0) * 1000)
    store.commit_batch(bid, [unit], snapshot_version=to_v,
                       metrics={"kind": "agg_sync", "groups": n_groups,
                                "mode": mode, "view": view_root})
    return {"from_version": int(wm) if wm is not None else None,
            "to_version": to_v, "groups_touched": n_groups,
            "mode": mode, "changed_unit_fraction": changed_frac,
            "skipped": False}


def _check_spec(view: LakeTable, group_cols, sum_cols,
                minmax_cols=()) -> None:
    snap = view.snapshot()
    want = list(group_cols) + ["n_rows"] + [
        x for c in sum_cols for x in (f"sum_{c}", f"nn_{c}")] + [
        x for c in minmax_cols for x in (f"min_{c}", f"max_{c}")]
    have = [f.name for f in snap.schema.fields
            if f.name not in (SEQ_COL, DELETED_COL)]
    if have != want:
        raise ValueError(
            f"view spec mismatch: view has {have}, call wants {want}")


def _refuse_null_groups(df: DataFrame, group_cols) -> None:
    """df must be SMALL (one row per touched group) and already persisted —
    the probe is an O(groups) filter, not a table scan."""
    pred = None
    for c in group_cols:
        p = F.col(c).isNull()
        pred = p if pred is None else (pred | p)
    if df.filter(pred).limit(1).count() > 0:
        raise ValueError(
            f"NULL group value in {list(group_cols)}: aggregate views "
            "cannot maintain a null group (null-unsafe join equality)")


def _bootstrap(spark, src: LakeTable, view_root: str, schema: StructType,
               group_cols, sum_cols, minmax_cols, n_buckets: int,
               to_v: int, fs, reuse: LakeTable | None = None):
    """First run: ONE full aggregate of the upstream's visible state at
    to_v, written as the view's initial contents. ``reuse`` is an empty
    crash-remnant view table (created, never written) to write into."""
    from gobblin_spark.lakehouse.merge import read_current

    state = read_current(src, version=to_v)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in sum_cols:
        aggs.append(F.sum(c).alias(f"sum_{c}"))
        aggs.append(F.count(c).alias(f"nn_{c}"))
    for c in minmax_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    totals = (state.groupBy(*group_cols).agg(*aggs)
              .withColumn("op", F.lit("U"))
              .persist())  # one full aggregate: probed, then written
    try:
        _refuse_null_groups(totals, group_cols)
        if reuse is not None:
            view = reuse
        else:
            view = LakeTable.create(
                spark, view_root, schema, list(group_cols),
                n_buckets=n_buckets, fs=fs,
                properties={"agg_view_of": src.root,
                            "agg_group_cols": list(group_cols),
                            "agg_sum_cols": list(sum_cols),
                            "agg_minmax_cols": list(minmax_cols)})
        snap = merge_lww(
            view, totals.withColumn("seq", F.lit(to_v).cast("long")),
            list(group_cols),
            properties={"agg_source_version": to_v,
                        "agg_view_of": src.root,
                        "agg_group_cols": list(group_cols),
                        "agg_sum_cols": list(sum_cols),
                        "agg_minmax_cols": list(minmax_cols)})
    finally:
        totals.unpersist()
    return view, sum(f.rows for f in snap.files if f.rows)


def _reaggregate(spark, src: LakeTable, view: LakeTable, group_cols,
                 sum_cols, minmax_cols, to_v: int) -> int:
    """The wide-touch regime: ONE full aggregate of the upstream's visible
    state at to_v (exactly the bootstrap plan), committed as a wholesale
    snapshot REPLACE of the view (``overwrite`` — optimistic-concurrency
    commit like merge). No diff join, no preimage explode, no read of the
    old view at all: groups that vanished upstream are simply absent from
    the new snapshot, which is the same visible state the incremental
    path's tombstones produce (absent ≡ tombstoned to every reader, and a
    later incremental sync merges on top at a higher seq either way).
    table_changes across the overwrite still diffs correctly — both sides
    resolve from their snapshot's files."""
    from pyspark.sql.observation import Observation

    from gobblin_spark.lakehouse.merge import read_current

    state = read_current(src, version=to_v)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in sum_cols:
        aggs.append(F.sum(c).alias(f"sum_{c}"))
        aggs.append(F.count(c).alias(f"nn_{c}"))
    for c in minmax_cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    totals = (state.groupBy(*group_cols).agg(*aggs)
              .persist())  # probed for null groups, then written
    try:
        _refuse_null_groups(totals, group_cols)
        stored = totals.select(
            *totals.columns,
            F.lit(int(to_v)).cast("long").alias(SEQ_COL),
            F.lit(False).alias(DELETED_COL))
        obs = Observation(f"aggreagg-{to_v}")
        stored = stored.observe(obs, F.count(F.lit(1)).alias("n"))
        view.overwrite(stored, seq_col=SEQ_COL,
                       properties={"agg_source_version": to_v})
        return int(obs.get["n"])
    finally:
        totals.unpersist()


def _apply_range(spark, src: LakeTable, view: LakeTable, group_cols,
                 sum_cols, minmax_cols, from_v: int, to_v: int) -> int:
    changes = table_changes(src, from_v, to_v, emit_preimages=True)
    # the per-group delta is one row per touched group — persist it so the
    # diff join is evaluated ONCE across the null probe, the bucket
    # collect, and the view write
    delta = _delta(changes, group_cols, sum_cols, minmax_cols).persist()
    persisted = [delta]
    try:
        _refuse_null_groups(delta, group_cols)
        # affected view buckets: driver-side O(n_buckets) collect — the
        # view read below prunes to them
        touched = view.buckets_of(delta)
        if not touched:
            # upstream advanced with zero visible row changes (e.g. pure
            # compaction commits) — still advances the watermark, writes
            # nothing
            return 0
        vsnap = view.snapshot()
        old = stored_reduce(vsnap, view.read(buckets=touched),
                            list(group_cols))
        old = (old.filter(~F.col(DELETED_COL))
                  .drop(DELETED_COL, SEQ_COL))
        upserts = _combine(old, delta, group_cols, sum_cols, minmax_cols)
        if minmax_cols:
            # persisted so the (diff join + view read) plan under it is
            # evaluated once across the rescan collect and the final
            # write; released in this function's finally
            upserts = upserts.persist()
            persisted.append(upserts)
            upserts = _patch_minmax_rescans(
                spark, src, upserts, group_cols, minmax_cols, to_v)
        upserts = upserts.drop("__rescan")
        from pyspark.sql.observation import Observation
        obs = Observation(f"aggsync-{to_v}")
        upserts = upserts.observe(obs, F.count(F.lit(1)).alias("n"))
        merge_lww(
            view, upserts.withColumn("seq", F.lit(to_v).cast("long")),
            list(group_cols),
            properties={"agg_source_version": to_v},
            expected_version=vsnap.version)
        return int(obs.get["n"])
    finally:
        for df in persisted:
            df.unpersist()


def _patch_minmax_rescans(spark, src: LakeTable, upserts: DataFrame,
                          group_cols, minmax_cols, to_v: int) -> DataFrame:
    """Recompute min/max from the upstream state for the (usually empty)
    set of groups whose stored extremum may have been retracted. The
    rescan set is collected driver-side (it is a subset of the touched
    groups); when empty — the common append/update-upward regime — the
    upstream is NOT read at all. When non-empty, ONE upstream read
    restricted to those groups (broadcast semi-join) is re-aggregated.
    ``upserts`` must arrive persisted (the caller owns the release)."""
    from pyspark.sql.observation import Observation

    from gobblin_spark.lakehouse.merge import read_current

    need = (upserts.filter(F.col("__rescan") & (F.col("op") == "U"))
            .select(*group_cols))
    need_rows = need.collect()
    if not need_rows:
        return upserts  # caller drops __rescan
    need_df = F.broadcast(
        spark.createDataFrame(need_rows, need.schema))
    state = read_current(src, version=to_v).join(
        need_df, on=list(group_cols), how="leftsemi")
    aggs = []
    for c in minmax_cols:
        aggs.append(F.min(c).alias(f"rs_min_{c}"))
        aggs.append(F.max(c).alias(f"rs_max_{c}"))
    rescanned = state.groupBy(*group_cols).agg(*aggs)
    u, r = upserts.alias("u"), rescanned.alias("r")
    j = u.join(r, on=list(group_cols), how="left")
    keep = [c for c in upserts.columns
            if c not in [x for mc in minmax_cols
                         for x in (f"min_{mc}", f"max_{mc}")]]
    sel = [F.col(f"u.{c}").alias(c) for c in keep]
    for c in minmax_cols:
        # a rescanned group takes the recomputed extremum VERBATIM (it is
        # NULL when the group has no non-null values left); non-rescanned
        # groups keep the monotone update
        sel.append(
            F.when(F.col("u.__rescan"), F.col(f"r.rs_min_{c}"))
            .otherwise(F.col(f"u.min_{c}")).alias(f"min_{c}"))
        sel.append(
            F.when(F.col("u.__rescan"), F.col(f"r.rs_max_{c}"))
            .otherwise(F.col(f"u.max_{c}")).alias(f"max_{c}"))
    return j.select(*sel)


def read_view(spark: SparkSession, view_root: str, fs=None) -> DataFrame:
    """The view's visible state with internal ``nn_*`` columns dropped —
    exactly the GROUP BY result a from-scratch aggregate would produce."""
    from gobblin_spark.lakehouse.merge import read_current

    view = LakeTable(spark, view_root, fs=fs)
    df = read_current(view)
    return df.drop(*[c for c in df.columns if c.startswith("nn_")])
