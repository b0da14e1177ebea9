"""Checkpoint + commit-log state store (exactly-once bookkeeping).

From-scratch filesystem state store mirroring the reference's semantics:

- per-batch checkpoint records with work-unit lifecycle states
  (≙ FsDatasetStateStore `.jst` files,
  gobblin-runtime/src/main/java/gobblin/runtime/FsDatasetStateStore.java:55,212-222;
  lifecycle enum PENDING→RUNNING→SUCCESSFUL→COMMITTED/FAILED,
  gobblin-api/src/main/java/gobblin/configuration/WorkUnitState.java:61-68)
- an append-only commit log whose entries are published atomically; the
  *presence* of an entry is the "this batch is applied" predicate checked
  before any re-apply — the verify()-then-execute() idempotency pattern
  (gobblin-core/src/main/java/gobblin/commit/FsRenameCommitStep.java:38,135;
  docs/miscellaneous/Exactly-Once-Support.md:7-23)
- watermark rollback on failure: uncommitted work units re-planned from
  their LOW watermark next run (≙ WorkUnitState.backoffActualHighWatermark,
  gobblin-api/.../configuration/WorkUnitState.java:177-183;
  AbstractSource.getPreviousWorkUnitsForRetry,
  gobblin-core/.../extract/AbstractSource.java:124)

All records are driver-side plan/metric metadata — O(work units), never
O(rows) — so a plain JSON-file store is the right scale tradeoff even for a
10^10-event run (a few thousand batch files). Commit atomicity uses the same
link(2) publish as the lakehouse manifest.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any

from gobblin_spark.fsio import DEFAULT_FS, CommitConflict, CommitFs

# Work-unit lifecycle (≙ WorkUnitState.WorkingState)
PENDING = "PENDING"
RUNNING = "RUNNING"
SUCCESSFUL = "SUCCESSFUL"
COMMITTED = "COMMITTED"
FAILED = "FAILED"


@dataclass
class WorkUnitState:
    workunit_id: str
    batch_id: str
    event_group: int
    low_seq: int  # exclusive
    high_seq: int  # inclusive (expected high watermark)
    state: str = PENDING
    actual_high_seq: int | None = None
    rows_read: int = 0
    rows_written: int = 0
    wall_ms: int = 0
    salted: bool = False
    extra: dict[str, Any] = field(default_factory=dict)


class StateStore:
    """Filesystem checkpoint + commit-log store for one dataset/pipeline."""

    def __init__(self, root: str, fs: CommitFs | None = None):
        self.root = root
        self.fs = fs or DEFAULT_FS
        self.ckpt_dir = os.path.join(root, "checkpoints")
        self.log_dir = os.path.join(root, "commit_log")
        self.fs.makedirs(self.ckpt_dir)
        self.fs.makedirs(self.log_dir)

    # ----------------------------------------------------------- checkpoint
    def _ckpt_path(self, batch_id: str) -> str:
        return os.path.join(self.ckpt_dir, f"batch-{batch_id}.json")

    def begin_batch(self, batch_id: str, units: list[WorkUnitState]) -> None:
        self._write_ckpt(batch_id, units, status="RUNNING")

    def update_batch(self, batch_id: str, units: list[WorkUnitState],
                     status: str = "RUNNING") -> None:
        self._write_ckpt(batch_id, units, status=status)

    def _write_ckpt(self, batch_id: str, units: list[WorkUnitState],
                    status: str) -> None:
        doc = {
            "batch_id": batch_id,
            "status": status,
            "updated_ms": int(time.time() * 1000),
            "units": [asdict(u) for u in units],
        }
        # atomic overwrite (re-writable lifecycle record, not a commit)
        self.fs.write_replace(json.dumps(doc).encode(),
                              self._ckpt_path(batch_id))

    def read_batch(self, batch_id: str) -> dict[str, Any] | None:
        p = self._ckpt_path(batch_id)
        if not self.fs.exists(p):
            return None
        doc = json.loads(self.fs.read(p))
        doc["units"] = [WorkUnitState(**u) for u in doc["units"]]
        return doc

    def all_batches(self) -> list[dict[str, Any]]:
        out = []
        for name in sorted(self.fs.listdir(self.ckpt_dir)):
            if name.startswith("batch-") and name.endswith(".json"):
                out.append(self.read_batch(name[len("batch-"):-len(".json")]))
        return [b for b in out if b is not None]

    # ------------------------------------------------------------ commit log
    def _log_path(self, batch_id: str) -> str:
        return os.path.join(self.log_dir, f"commit-{batch_id}.json")

    def _rollup_names(self) -> list[str]:
        return sorted(
            n for n in self.fs.listdir(self.log_dir)
            if n.startswith("rollup-") and n.endswith(".json")
        )

    def latest_rollup(self) -> dict[str, Any] | None:
        """Highest-seq commit-log rollup (see checkpoint_log). Cached:
        rollups are written only by this (single-writer) pipeline, and
        checkpoint_log refreshes the cache after publishing a new one."""
        if getattr(self, "_rollup_cache", None) is not None:
            return self._rollup_cache or None
        names = self._rollup_names()
        self._rollup_cache = (
            json.loads(self.fs.read(os.path.join(self.log_dir, names[-1])))
            if names else {}
        ) or False
        return self._rollup_cache or None

    def is_committed(self, batch_id: str) -> bool:
        """The verify() step: has this batch already been applied+committed?"""
        if self.fs.exists(self._log_path(batch_id)):
            return True
        roll = self.latest_rollup()
        return bool(roll and batch_id in roll.get("folded_batch_ids", []))

    def commit_batch(
        self,
        batch_id: str,
        units: list[WorkUnitState],
        snapshot_version: int | None,
        metrics: dict[str, Any] | None = None,
    ) -> bool:
        """Atomic commit-log publish. Returns False if already committed
        (idempotent re-run after crash — the caller must treat that as
        success, not error)."""
        for u in units:
            u.state = COMMITTED
            if u.actual_high_seq is None:
                u.actual_high_seq = u.high_seq
        self._write_ckpt(batch_id, units, status="COMMITTED")
        doc = {
            "batch_id": batch_id,
            "committed_ms": int(time.time() * 1000),
            "snapshot_version": snapshot_version,
            "watermarks": {
                str(u.event_group): u.actual_high_seq for u in units
            },
            "metrics": metrics or {},
            # lineage: input seq ranges → output snapshot
            "lineage": [
                {
                    "workunit_id": u.workunit_id,
                    "event_group": u.event_group,
                    "low_seq": u.low_seq,
                    "high_seq": u.actual_high_seq,
                    "rows_read": u.rows_read,
                    "rows_written": u.rows_written,
                    "wall_ms": u.wall_ms,
                }
                for u in units
            ],
        }
        try:
            self.fs.publish_if_absent(json.dumps(doc).encode(),
                                      self._log_path(batch_id))
        except CommitConflict:
            return False
        return True

    def read_commit(self, batch_id: str) -> dict[str, Any] | None:
        p = self._log_path(batch_id)
        if not self.fs.exists(p):
            return None
        return json.loads(self.fs.read(p))

    def committed_batches(self) -> list[dict[str, Any]]:
        """All committed history: the latest rollup (if any) as one
        aggregate record, then the live (un-folded) commit files. A commit
        file whose id the rollup already folded is skipped — reachable only
        if a checkpoint crashed mid-cleanup, in which case counting it
        twice would double its metrics."""
        roll = self.latest_rollup()
        folded = set(roll.get("folded_batch_ids", [])) if roll else set()
        out = [roll] if roll else []
        for name in sorted(self.fs.listdir(self.log_dir)):
            if name.startswith("commit-") and name.endswith(".json"):
                doc = json.loads(
                    self.fs.read(os.path.join(self.log_dir, name)))
                if doc["batch_id"] not in folded:
                    out.append(doc)
        return out

    def checkpoint_log(self, keep_last: int = 16) -> dict[str, Any] | None:
        """Fold all but the newest ``keep_last`` commit records (plus any
        prior rollup) into ONE rollup record holding the merged per-group
        watermarks, summed metrics, and the folded batch-id set.

        Why: every ``plan_batch`` reads the full commit log to derive
        watermarks — append-only forever means batch B pays O(B) metadata
        reads, O(B²) over a run (a 10^10-event stream at 50M-row batches is
        only ~200 commits, but a long-lived tail at minutes-per-batch is
        unbounded). After a checkpoint the log is O(keep_last) regardless
        of stream age. ≙ the reference's bounded job-history store
        (FsDatasetStateStore retention), done as a fold so NOTHING the
        planner or replay needs is lost: watermarks merge by max, folded
        ids still answer ``is_committed``, and the recent window keeps full
        lineage for the density/cost estimators (which only ever read the
        last few batches).

        Crash-safe: the new rollup (seq N+1, superset of rollup N) is
        published before any old file is removed; readers use only the
        highest-seq rollup and skip commit files it already folded, so a
        crash mid-cleanup double-counts nothing. Leftovers are removed by
        the next checkpoint."""
        roll = self.latest_rollup()
        prior_folded = set(roll.get("folded_batch_ids", [])) if roll else set()
        names = sorted(
            n for n in self.fs.listdir(self.log_dir)
            if n.startswith("commit-") and n.endswith(".json")
        )
        docs = []
        for n in names:
            d = json.loads(self.fs.read(os.path.join(self.log_dir, n)))
            if d["batch_id"] not in prior_folded:
                docs.append((n, d))
        docs.sort(key=lambda nd: nd[1].get("committed_ms", 0))
        if len(docs) <= keep_last:
            return None
        fold = docs[:-keep_last]

        wm: dict[str, int] = dict(roll.get("watermarks", {})) if roll else {}
        for _, c in fold:
            for g, hi in c.get("watermarks", {}).items():
                if hi is not None:
                    wm[g] = max(wm.get(g, -1), int(hi))
        m_keys = ("rows_read", "rows_merged", "wall_ms")
        sums = {k: (roll or {}).get("metrics", {}).get(k, 0) for k in m_keys}
        for _, c in fold:
            for k in m_keys:
                sums[k] += c.get("metrics", {}).get(k, 0) or 0
        sv = [c.get("snapshot_version") for _, c in fold
              if c.get("snapshot_version") is not None]
        if roll and roll.get("snapshot_version") is not None:
            sv.append(roll["snapshot_version"])
        new = {
            "batch_id": "_rollup",
            "kind": "rollup",
            "rollup_seq": (roll.get("rollup_seq", 0) + 1) if roll else 1,
            "committed_ms": max(
                [c.get("committed_ms", 0) for _, c in fold]
                + ([roll.get("committed_ms", 0)] if roll else [])),
            "snapshot_version": max(sv) if sv else None,
            "watermarks": wm,
            "folded_batch_ids": sorted(
                prior_folded | {c["batch_id"] for _, c in fold}),
            "metrics": sums,
            "lineage": [],
        }
        new["folded_count"] = len(new["folded_batch_ids"])
        self.fs.publish_if_absent(
            json.dumps(new).encode(),
            os.path.join(self.log_dir,
                         f"rollup-{new['rollup_seq']:08d}.json"))
        self._rollup_cache = new
        # cleanup AFTER publish: every commit file the rollup now covers
        # (including leftovers from a previously crashed cleanup — the file
        # name embeds the batch_id, no read needed), their lifecycle
        # checkpoints, and superseded rollups
        folded_all = set(new["folded_batch_ids"])
        for n in names:
            bid = n[len("commit-"):-len(".json")]
            if bid in folded_all:
                self.fs.remove(os.path.join(self.log_dir, n))
                p = self._ckpt_path(bid)
                if self.fs.exists(p):
                    self.fs.remove(p)
        for n in self._rollup_names():
            if n != f"rollup-{new['rollup_seq']:08d}.json":
                self.fs.remove(os.path.join(self.log_dir, n))
        return new

    def maybe_checkpoint_log(self, keep_last: int = 64) -> dict[str, Any] | None:
        """Checkpoint when the live log has grown past 2×keep_last — the
        amortized trigger the engine calls after each commit (one name
        listing per batch; the O(n) fold runs every ~keep_last batches)."""
        live = sum(
            1 for n in self.fs.listdir(self.log_dir)
            if n.startswith("commit-") and n.endswith(".json")
        )
        if live > 2 * keep_last:
            return self.checkpoint_log(keep_last)
        return None

    # ------------------------------------------------------------ watermarks
    def last_committed_watermarks(self) -> dict[int, int]:
        """Per-event-group high watermark over all committed batches
        (≙ MultiLongWatermark, gobblin-core/.../kafka/MultiLongWatermark.java:33).
        Failed/uncommitted batches contribute nothing — their ranges are
        re-planned (watermark backoff)."""
        wm: dict[int, int] = {}
        for c in self.committed_batches():
            for g, hi in c.get("watermarks", {}).items():
                g = int(g)
                if hi is not None:
                    wm[g] = max(wm.get(g, -1), int(hi))
        return wm

    def global_low_watermark(self) -> int:
        """Max seq known committed across ALL groups only if every group
        agrees; conservative global low = min over groups (safe horizon for
        tombstone GC)."""
        wm = self.last_committed_watermarks()
        return min(wm.values()) if wm else -1

    def pending_batches(self) -> list[dict[str, Any]]:
        """Checkpointed batches that never reached the commit log — their
        work units must be re-run FIRST next start
        (≙ getPreviousWorkUnitsForRetry + unfinished CommitSequence replay,
        AbstractJobLauncher.java:229-233)."""
        return [
            b for b in self.all_batches() if not self.is_committed(b["batch_id"])
        ]

    # ------------------------------------------------------------ estimators
    def observed_seq_density(self, last_k: int = 5) -> float | None:
        """Rows observed per unit of GLOBAL seq width over this consumer's
        last K committed batches (chronological). 1.0 for a consumer that
        sees every event; ~1/S for an executor owning 1/S of the event
        groups (sharded deployment: each executor tails its own
        Kafka-partition assignment, ≙ KafkaWorkUnitPacker container
        assignment). The planner divides its record cap by this to size the
        seq admission window, so sharded consumers still fill batches to
        the cap instead of running S× more batches at 1/S size. None until
        the first commit (no evidence yet).
        ≙ the reference sizing work units from persisted run history
        (KafkaAvgRecordTimeBasedWorkUnitSizeEstimator.java:51,66)."""
        commits = sorted(self.committed_batches(),
                         key=lambda c: c.get("committed_ms", 0))[-last_k:]
        rows = 0
        width = 0
        for c in commits:
            lineage = [ln for ln in c.get("lineage", [])
                       if ln.get("high_seq") is not None]
            if not lineage:
                continue
            lo = min(ln["low_seq"] for ln in lineage)
            hi = max(ln["high_seq"] for ln in lineage)
            rows += sum(ln.get("rows_read", 0) for ln in lineage)
            width += max(0, hi - lo)
        if width <= 0:
            return None
        return rows / width

    def group_cost_stats(self) -> dict[int, dict[str, float]]:
        """Per-group avg ms/record and avg rows/batch from committed history
        (≙ KafkaAvgRecordTimeBasedWorkUnitSizeEstimator.java:51,66, stats
        persisted across runs via KafkaExtractor.java:271-280)."""
        acc: dict[int, list[tuple[int, int]]] = {}
        for c in self.committed_batches():
            for ln in c.get("lineage", []):
                acc.setdefault(ln["event_group"], []).append(
                    (ln.get("rows_read", 0), ln.get("wall_ms", 0))
                )
        out: dict[int, dict[str, float]] = {}
        for g, samples in acc.items():
            rows = sum(r for r, _ in samples)
            ms = sum(m for _, m in samples)
            out[g] = {
                "avg_ms_per_record": (ms / rows) if rows else 1.0,
                "avg_rows_per_batch": rows / max(1, len(samples)),
            }
        return out
