"""gobblin_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch reimagining of the capabilities of StunlockStudios/gobblin
(LinkedIn Gobblin 0.6.2 fork) on idiomatic Spark:

- ``sources``    — deterministic change-event derivation + file/table sources
                   (reference: gobblin-core/.../source/extractor/extract/*)
- ``plans``      — work-unit planning: watermarks, key-range splits, bin
                   packing, skew/salting (reference: KafkaSource.getWorkunits,
                   KafkaWorkUnitPacker)
- ``operators``  — converter registry (vectorized Arrow/pandas transforms),
                   forks, row/task quality policies, dedup/similarity/text ops
                   (reference: gobblin.converter.*, gobblin.fork.*,
                   gobblin.qualitychecker.*, gobblin-compaction)
- ``lakehouse``  — snapshot-based ACID table format on Parquet with
                   last-writer-wins MERGE (reference: FsDataWriter staging→
                   publish + BaseDataPublisher + compaction dedup, re-expressed
                   as copy-on-write snapshot commits)
- ``state``      — checkpoint + commit-log state store for exactly-once resume
                   (reference: gobblin-metastore FsStateStore / CommitSequence)
- ``engine``     — the batch loop: plan → convert → apply → commit
                   (reference: AbstractJobLauncher.launchJob / JobContext.commit)
"""

__version__ = "0.1.0"
