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

    def is_committed(self, batch_id: str) -> bool:
        """The verify() step: has this batch already been applied+committed?"""
        return self.fs.exists(self._log_path(batch_id))

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
        out = []
        for name in sorted(self.fs.listdir(self.log_dir)):
            if name.startswith("commit-") and name.endswith(".json"):
                out.append(json.loads(
                    self.fs.read(os.path.join(self.log_dir, name))))
        return out

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
