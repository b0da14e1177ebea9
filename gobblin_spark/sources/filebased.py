"""Incremental file-based source: snapshot-diff directory ingest.

≙ FileBasedSource.getWorkunits
(gobblin-core/src/main/java/gobblin/source/extractor/filebased/
FileBasedSource.java:74-140): the previous run's filesystem snapshot —
entries of ``path|mtime`` — is diffed against the current listing; a file
is pulled when its (path, mtime) pair was not seen before, so both new
files AND modified files (mtime change) are re-pulled. Pulled files are
packed into at most ``max_partitions`` work units
(FileBasedSource.java:118-140), and the CURRENT snapshot is persisted with
the run so the next plan diffs against it.

Spark shape: the "extract" for a plan is one ``spark.read.<fmt>(files)``
over ONLY the new/changed files — at 100 TB the per-run scan is O(delta),
not O(directory), and Spark parallelizes within files by split. The
snapshot listing itself is driver-side metadata, O(#files) strings, stored
in the same JSON-per-run pattern as the checkpoint store.

Exactly-once: ``plan()`` → process the files → ``commit(plan)``. A crash
before commit leaves the previous snapshot in place, so the next run
re-plans the same delta (at-least-once at the file level; downstream LWW
merge makes the pipeline idempotent end-to-end, and an append-only sink
gets the reference's semantics: re-pull the whole delta).
"""

from __future__ import annotations

import fnmatch
import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from gobblin_spark.fsio import CommitFs, DEFAULT_FS

SPLIT = "|"


@dataclass
class FilePlan:
    run_id: str
    files_to_pull: list[str]
    work_units: list[list[str]]  # files grouped into units
    snapshot: list[str] = field(default_factory=list)  # path|mtime entries
    # run number claimed at PLAN time: commit publishes run-{seq} with
    # publish-if-absent, so a concurrent planner that committed first makes
    # this plan's commit fail loudly (its diff was computed against a stale
    # snapshot) instead of silently clobbering. 0 = legacy (resolve at
    # commit).
    seq: int = 0

    @property
    def empty(self) -> bool:
        return not self.files_to_pull


class FileDiffSource:
    def __init__(
        self,
        state_root: str,
        pattern: str = "*",
        max_partitions: int = 32,
        fs: CommitFs | None = None,
    ):
        """fs: all metadata I/O (listing the data dir, reading/publishing
        run snapshots) goes through a CommitFs, so the source runs
        unchanged over an object store (prefix LIST + Last-Modified stand
        in for walk+mtime; see gobblin_spark/fsio.py)."""
        self.fs = fs or DEFAULT_FS
        self.state_root = os.path.join(state_root, "fs_snapshots")
        self.fs.makedirs(self.state_root)
        self.pattern = pattern
        self.max_partitions = max_partitions

    # ------------------------------------------------------------- snapshot
    def current_snapshot(self, data_dir: str) -> list[str]:
        """Current listing as path|mtime entries (recursive, pattern-
        filtered, hidden/in-progress files skipped)."""
        out: list[str] = []
        for full in self.fs.walk_files(data_dir):
            name = os.path.basename(full)
            if name.startswith((".", "_")):
                continue
            if not fnmatch.fnmatch(name, self.pattern):
                continue
            out.append(f"{full}{SPLIT}{self.fs.mtime_ms(full)}")
        return sorted(out)

    def _committed_runs(self) -> list[str]:
        return sorted(
            n for n in self.fs.listdir(self.state_root)
            if n.startswith("run-") and n.endswith(".json")
        )

    def previous_snapshot(self) -> list[str]:
        runs = self._committed_runs()
        if not runs:
            return []
        doc = json.loads(
            self.fs.read(os.path.join(self.state_root, runs[-1])))
        return doc["snapshot"]

    # ----------------------------------------------------------------- plan
    def plan(self, data_dir: str) -> FilePlan:
        """Diff current vs previous snapshot → files to pull, packed into
        at most max_partitions units (≙ filesPerPartition rounding,
        FileBasedSource.java:124-127)."""
        current = self.current_snapshot(data_dir)
        prev = set(self.previous_snapshot())
        to_pull = [e.split(SPLIT)[0] for e in current if e not in prev]
        n = min(self.max_partitions, len(to_pull)) or 1
        per = -(-len(to_pull) // n) if to_pull else 0
        units = [to_pull[i:i + per] for i in range(0, len(to_pull), per)] \
            if to_pull else []
        return FilePlan(
            run_id=uuid.uuid4().hex[:16],
            files_to_pull=to_pull,
            work_units=units,
            snapshot=current,
            seq=len(self._committed_runs()) + 1,
        )

    # -------------------------------------------------------------- extract
    def read(self, spark: SparkSession, plan: FilePlan,
             fmt: str = "parquet") -> DataFrame:
        """One DataFrame over ONLY the plan's delta files."""
        if plan.empty:
            raise ValueError("empty plan has nothing to read")
        return spark.read.format(fmt).load(plan.files_to_pull)

    # --------------------------------------------------------------- commit
    def commit(self, plan: FilePlan) -> None:
        """Persist the run's full snapshot atomically; the next plan() diffs
        against it. Crash before commit → same delta re-planned."""
        doc = {
            "run_id": plan.run_id,
            "committed_ms": int(time.time() * 1000),
            "files_pulled": plan.files_to_pull,
            "snapshot": plan.snapshot,
        }
        # publish-if-absent on the run number CLAIMED AT PLAN TIME: exactly
        # one planner wins a concurrent race (CommitConflict for the loser,
        # whose diff is stale) — stronger than the previous last-writer-wins
        # os.replace, and portable to conditional-PUT object stores
        seq = plan.seq or (len(self._committed_runs()) + 1)
        self.fs.publish_if_absent(
            json.dumps(doc).encode(),
            os.path.join(self.state_root, f"run-{seq:08d}.json"),
        )

    def lineage(self) -> list[dict]:
        """Per-run pulled-file lineage (which files entered which run)."""
        out = []
        for name in self._committed_runs():
            d = json.loads(self.fs.read(os.path.join(self.state_root, name)))
            out.append({"run_id": d["run_id"],
                        "files_pulled": d["files_pulled"]})
        return out
