"""Table clone / replication: ship a pinned snapshot to a new root.

≙ the reference's dataset replication job family (gobblin-data-management's
CopySource/distcp-ng: copy a dataset's files between clusters, then
re-register the copy as a first-class dataset) — here the "re-register"
step is publishing a fresh v1 manifest whose entries are the SOURCE
snapshot's, byte-copied data files included, so the clone is a fully
independent LakeTable with identical visible state (fingerprint-equal),
time-travel reset to depth 1.

What is preserved: schema + schema_version + schema_log (evolution
lineage), bucket spec incl. ``legacy_spec_n`` mixed-spec residue mapping
(rides in properties), merge dialect, partition spec, key/bucket columns,
outstanding MOR delta files + their ``mor_deltas`` counter (a clone of an
uncompacted table still folds correctly), value-stats blooms and key
bounds (file-level metadata travels with the entries). Tags are NOT
copied (they are refs into the source's history, which the clone resets).

Disaster recovery: pass ``state_src``/``state_dst`` to also copy the
ingest checkpoint (the StateStore commit log), and copy order is STATE
FIRST, table second. Under a concurrent writer the table may then be
AHEAD of the state — safe: the planner re-admits events above the stale
watermark and LWW re-application of already-applied (key, seq) rows is
idempotent, so replay reconverges (the same argument as crash replay).
State behind table is recoverable; table behind state is not — never
copy the table before the state.

Scale shape: the data copy is executor-distributed (one task per file
batch, plain byte copy — the distcp analog; no decode/re-encode), the
manifest publish is O(metadata). Copying through the driver would bound
DR bandwidth by one NIC; this parallelizes across the cluster.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from gobblin_spark.lakehouse import LakeTable
from gobblin_spark.lakehouse.table import _DATA, _META, Snapshot


def _copy_file_local(pair: tuple[str, str]) -> int:
    """Executor-side byte copy (posix data plane; object stores would swap
    in their client here, like the reference's fs-specific distcp)."""
    import shutil

    src, dst = pair
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + ".inprogress"
    shutil.copyfile(src, tmp)
    os.replace(tmp, dst)  # atomic visibility per file
    return os.path.getsize(dst)


def clone_table(
    spark,
    src_root: str,
    dst_root: str,
    version: int | None = None,
    tag: str | None = None,
    state_src: str | None = None,
    state_dst: str | None = None,
    fs=None,
    slices: int = 64,
) -> dict[str, Any]:
    """Clone ``src_root``'s snapshot (current, or pinned by version/tag)
    to ``dst_root``. Refuses an existing destination table. Returns copy
    stats. The clone's history starts at v1."""
    src = LakeTable(spark, src_root, fs=fs)
    if tag is not None:
        version = src.resolve_tag(tag)
    snap = src.snapshot(version)
    if LakeTable.exists(dst_root, fs=fs):
        raise ValueError(f"destination already has a table: {dst_root}")
    if bool(state_src) != bool(state_dst):
        raise ValueError(
            "state_src and state_dst must be given together (copying a "
            "state checkpoint without a destination, or vice versa, is "
            "never what a DR clone means)")

    dst = LakeTable(spark, dst_root, fs=fs)
    dfs = dst.fs

    # 1. STATE FIRST (see module docstring: table-ahead-of-state replays
    # idempotently; state-ahead-of-table would skip unapplied batches)
    state_files = 0
    if state_src and state_dst:
        sfs = src.fs
        for full in sfs.walk_files(state_src):
            rel = os.path.relpath(full, state_src)
            target = os.path.join(state_dst, rel)
            dfs.makedirs(os.path.dirname(target))
            dfs.write_replace(sfs.read(full), target)
            state_files += 1

    # 2. data files: executor-distributed byte copy, one manifest entry
    # per task element (plain copy, no decode — the distcp analog)
    pairs = [
        (os.path.join(src_root, f.path), os.path.join(dst_root, f.path))
        for f in snap.files
    ]
    dfs.makedirs(os.path.join(dst_root, _DATA))
    dfs.makedirs(os.path.join(dst_root, _META))
    if pairs:
        n = min(slices, len(pairs))
        copied_bytes = (
            spark.sparkContext.parallelize(pairs, n)
            .map(_copy_file_local).sum())
    else:
        copied_bytes = 0

    # 3. fresh v1 manifest carrying the source snapshot verbatim —
    # properties travel wholesale (merge_dialect, legacy_spec_n,
    # mor_deltas, stats config), plus clone provenance
    props = dict(snap.properties)
    props["cloned_from"] = src_root
    props["cloned_version"] = snap.version
    shard_refs = None
    if snap.shard_map is not None:
        shard_refs = []
        for _, flist in snap.shard_map:
            name = dst._write_shard(flist)
            shard_refs.append({"name": name, "n": len(flist)})
    new_snap = Snapshot(
        version=1,
        parent=None,
        timestamp_ms=int(time.time() * 1000),
        schema_json=snap.schema_json,
        schema_version=snap.schema_version,
        schema_log=snap.schema_log,
        n_buckets=snap.n_buckets,
        bucket_cols=snap.bucket_cols,
        key_cols=snap.key_cols,
        partition_spec=snap.partition_spec,
        properties=props,
        files=snap.files,
        shard_refs=shard_refs,
    )
    dfs.publish_if_absent(
        json.dumps(new_snap.to_json()).encode(), dst._manifest_path(1))
    return {
        "cloned_from": src_root,
        "cloned_version": snap.version,
        "dst": dst_root,
        "files": len(pairs),
        "bytes": int(copied_bytes),
        "state_files": state_files,
    }
