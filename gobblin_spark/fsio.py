"""Filesystem abstraction for the commit protocol.

Everything ACID in this engine reduces to ONE primitive: *publish-if-absent*
— write bytes to a target path such that exactly one writer wins and losers
get a distinguishable conflict. The manifest commit (lakehouse/table.py) and
the commit-log publish (state/store.py) both go through this interface, so
porting the engine to a different storage system means implementing one
small class, not auditing every os.* call.

Implementations / strategies:

- ``LocalFs`` (implemented, default): stage to a temp file in the target
  directory, then ``os.link(tmp, target)`` — POSIX link(2) fails with EEXIST
  atomically, which is the optimistic-concurrency conflict signal. Replaces
  the reference's rename-with-retry publish
  (gobblin-core/src/main/java/gobblin/publisher/BaseDataPublisher.java:190-244,
  FsRenameCommitStep.java:38,135).

- HDFS (strategy, for a cluster deployment): ``FileSystem.create(path,
  overwrite=false)`` is atomic-exclusive on the NameNode — write the staged
  manifest content directly with overwrite=false and map
  ``FileAlreadyExistsException`` to the conflict signal. (``rename`` into
  place also works: HDFS rename is atomic and fails if the destination
  exists.) Everything else here (list/read/delete) maps 1:1 onto
  ``FileSystem`` calls.

- ``ObjectStoreFs`` (implemented): S3/GCS-shaped semantics — conditional
  PUT with ``If-None-Match: *`` (supported by S3 since 2024, and by GCS via
  ``x-goog-if-generation-match: 0``) gives the same exactly-one-winner
  publish; 412 Precondition Failed maps to the conflict signal. No link(2),
  no rename-into-place, prefix listings, no directories. Backed by local
  disk here so the whole engine test-drives over it; a real S3/GCS port
  swaps the four I/O calls for client-library calls. On object stores
  WITHOUT conditional writes, the standard fallback is a DynamoDB/JDBC-style
  commit coordinator holding the version counter — the table format is
  unchanged, only publish_if_absent is.

All paths are plain strings; the interface is intentionally tiny and
synchronous — commits are O(manifest) metadata operations on the driver.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Iterator


class CommitConflict(FileExistsError):
    """Another writer published this target first."""


class CommitFs:
    """The minimal filesystem surface the commit protocol needs."""

    # -- atomic primitives
    def publish_if_absent(self, content: bytes, target: str) -> None:
        """Atomically create ``target`` with ``content``; raise
        CommitConflict if it already exists. Durable on return."""
        raise NotImplementedError

    def write_replace(self, content: bytes, target: str) -> None:
        """Atomically overwrite ``target`` with ``content`` (last writer
        wins — used for re-writable checkpoints, not commits)."""
        raise NotImplementedError

    # -- plain operations
    def read(self, path: str) -> bytes:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def walk_files(self, root: str) -> Iterator[str]:
        """All file paths under root (recursive)."""
        raise NotImplementedError

    def mtime_ms(self, path: str) -> int:
        """Last-modified time in epoch ms (object stores: Last-Modified /
        generation metadata from the LIST — no extra round trip)."""
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def remove_tree(self, root: str) -> None:
        """Delete every file under ``root`` (recursive) and, where the
        store has directories, the directories themselves — after this,
        ``exists(root)`` is False. Object stores: a keyed DELETE per
        object under the prefix (what s3a's delete(path, recursive) is).
        NOT atomic anywhere — callers must tolerate a crash mid-delete
        leaving an arbitrary subset."""
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def prune_empty_dirs(self, root: str) -> None:
        """Best-effort removal of empty directories under root (no-op on
        object stores, which have no real directories)."""


class LocalFs(CommitFs):
    """POSIX implementation: link(2) publish, fsync'd staging."""

    def _stage(self, content: bytes, directory: str) -> str:
        tmp = os.path.join(directory, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(content)
            fh.flush()
            os.fsync(fh.fileno())
        return tmp

    def publish_if_absent(self, content: bytes, target: str) -> None:
        tmp = self._stage(content, os.path.dirname(target))
        try:
            os.link(tmp, target)
        except FileExistsError as exc:
            raise CommitConflict(target) from exc
        finally:
            os.unlink(tmp)

    def write_replace(self, content: bytes, target: str) -> None:
        tmp = self._stage(content, os.path.dirname(target))
        os.replace(tmp, target)

    def read(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def walk_files(self, root: str) -> Iterator[str]:
        for dirpath, _d, names in os.walk(root):
            for name in names:
                yield os.path.join(dirpath, name)

    def mtime_ms(self, path: str) -> int:
        return int(os.path.getmtime(path) * 1000)

    def remove(self, path: str) -> None:
        os.unlink(path)

    def remove_tree(self, root: str) -> None:
        shutil.rmtree(root, ignore_errors=True)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def prune_empty_dirs(self, root: str) -> None:
        for dirpath, dirnames, names in os.walk(root, topdown=False):
            if not dirnames and not names and dirpath != root:
                shutil.rmtree(dirpath, ignore_errors=True)


class ObjectStoreFs(CommitFs):
    """Object-store-semantics implementation (S3 / GCS shaped), backed by
    the local disk so it runs everywhere — the engine-visible CONTRACT is
    exactly what a conditional-PUT object store gives you, and none of the
    POSIX affordances LocalFs leans on:

    - ``publish_if_absent`` is a SINGLE conditional create
      (``O_CREAT|O_EXCL`` — the local analog of S3 ``PUT If-None-Match: *``
      / GCS ``x-goog-if-generation-match: 0``): no staging file, no
      link(2), no rename-into-place; EEXIST is the 412-Precondition-Failed
      conflict signal. Exactly one racing writer wins.
    - ``write_replace`` is an atomic whole-object PUT (emulated with a
      private temp + ``os.replace`` because POSIX has no atomic
      whole-file write; on a real store this is just PUT).
    - Directories don't exist: ``prune_empty_dirs`` is a no-op, listings
      are prefix LISTs, and ``exists`` on a "directory" means "some key
      has this prefix" (what s3a emulates). ``makedirs`` only materializes
      the local parent so the backing disk can hold the key — on a real
      store it would be a no-op.

    A real S3/GCS port subclasses this and swaps the four I/O calls for
    boto3/gcs-client calls; everything above the CommitFs interface
    (LakeTable, StateStore, the engine) is untouched — ≙ porting the
    publish contract of StunlockPartitionedHiveDataPublisher.java:137-163
    off HDFS without touching job code."""

    def publish_if_absent(self, content: bytes, target: str) -> None:
        os.makedirs(os.path.dirname(target), exist_ok=True)
        try:
            fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError as exc:
            raise CommitConflict(target) from exc
        try:
            os.write(fd, content)
            os.fsync(fd)
        finally:
            os.close(fd)

    def write_replace(self, content: bytes, target: str) -> None:
        os.makedirs(os.path.dirname(target), exist_ok=True)
        tmp = os.path.join(os.path.dirname(target),
                           f".put-{uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(content)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, target)  # emulation of the atomic whole-object PUT

    def read(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def exists(self, path: str) -> bool:
        # object stores have no directories: a "directory" exists iff some
        # key carries the prefix — os.path.isdir on the backing disk plays
        # that role; a plain key is a HEAD
        return os.path.exists(path)

    def listdir(self, path: str) -> list[str]:
        # LIST with delimiter='/' — first-level key components under prefix
        if not os.path.isdir(path):
            return []
        return os.listdir(path)

    def walk_files(self, root: str) -> Iterator[str]:
        # LIST without delimiter: every key under the prefix
        for dirpath, _d, names in os.walk(root):
            for name in names:
                yield os.path.join(dirpath, name)

    def mtime_ms(self, path: str) -> int:
        # Last-Modified from the object metadata (generation on GCS); the
        # backing disk's mtime plays that role here
        return int(os.path.getmtime(path) * 1000)

    def remove(self, path: str) -> None:
        os.unlink(path)

    def remove_tree(self, root: str) -> None:
        # a DELETE per key under the prefix — the only bulk delete an
        # object store has (s3a delete(path, recursive=true) fans out the
        # same way). The trailing rmtree only clears the now-empty local
        # backing directories so exists(prefix) correctly flips to False,
        # as it would on a real store once the last key is gone.
        for p in list(self.walk_files(root)):
            os.unlink(p)
        shutil.rmtree(root, ignore_errors=True)

    def makedirs(self, path: str) -> None:
        # no-op semantically (no directories); materialize locally so the
        # backing disk can hold keys under the prefix
        os.makedirs(path, exist_ok=True)

    def prune_empty_dirs(self, root: str) -> None:
        """No-op: object stores have no empty directories to prune."""


class S3Fs(CommitFs):
    """Real S3 metadata plane via boto3 — the wire-level port of
    ObjectStoreFs's contract (which it is tested against, moto-gated, in
    tests/test_s3fs.py):

    - ``publish_if_absent`` = conditional PUT with ``If-None-Match: *``
      (S3 conditional writes); HTTP 412 PreconditionFailed is the
      CommitConflict signal — exactly one racing writer wins, enforced by
      the STORE, no client-side locking.
    - ``write_replace`` = plain PUT (whole-object replace is atomic).
    - ``exists`` on a "directory" = any key under the prefix (one LIST
      with MaxKeys=1), matching s3a's directory emulation.
    - ``remove_tree`` = paginated LIST + batched DeleteObjects.

    Path convention: the engine addresses everything with one absolute
    path string (e.g. ``/lake/t/_meta/v1.json``); the key is that path
    minus the leading slash, under an optional ``prefix``. Paths returned
    by ``walk_files``/``listdir`` reconstruct the same convention, so
    ``os.path`` composition in callers keeps working.

    Scope: this is the COMMIT-PROTOCOL plane (manifests, state store,
    catalog, quarantine metadata). The bulk data plane at scale stays on
    Spark's own s3a:// reader/writer — Spark executors never route
    multi-GB parquet through the driver's boto3 client."""

    def __init__(self, bucket: str, prefix: str = "", client=None,
                 endpoint_url: str | None = None):
        if client is None:
            import boto3

            client = boto3.client("s3", endpoint_url=endpoint_url)
        self.bucket = bucket
        self.prefix = prefix.strip("/")
        self.client = client

    def _key(self, path: str) -> str:
        k = path.lstrip("/")
        return f"{self.prefix}/{k}" if self.prefix else k

    def _path(self, key: str) -> str:
        if self.prefix:
            key = key[len(self.prefix) + 1:]
        return "/" + key

    # -- atomic primitives
    def publish_if_absent(self, content: bytes, target: str) -> None:
        from botocore.exceptions import ClientError

        try:
            self.client.put_object(Bucket=self.bucket,
                                   Key=self._key(target),
                                   Body=content, IfNoneMatch="*")
        except ClientError as exc:
            code = exc.response.get("Error", {}).get("Code", "")
            if code in ("PreconditionFailed", "ConditionalRequestConflict",
                        "412"):
                raise CommitConflict(target) from exc
            raise

    def write_replace(self, content: bytes, target: str) -> None:
        self.client.put_object(Bucket=self.bucket, Key=self._key(target),
                               Body=content)

    # -- plain operations
    def read(self, path: str) -> bytes:
        from botocore.exceptions import ClientError

        try:
            r = self.client.get_object(Bucket=self.bucket,
                                       Key=self._key(path))
        except ClientError as exc:
            if exc.response.get("Error", {}).get("Code") in ("NoSuchKey",
                                                             "404"):
                raise FileNotFoundError(path) from exc
            raise
        return r["Body"].read()

    def exists(self, path: str) -> bool:
        from botocore.exceptions import ClientError

        key = self._key(path)
        try:
            self.client.head_object(Bucket=self.bucket, Key=key)
            return True
        except ClientError as exc:
            if exc.response.get("Error", {}).get("Code") not in ("404",
                                                                 "NoSuchKey"):
                raise
        r = self.client.list_objects_v2(Bucket=self.bucket,
                                        Prefix=key.rstrip("/") + "/",
                                        MaxKeys=1)
        return r.get("KeyCount", 0) > 0

    def listdir(self, path: str) -> list[str]:
        prefix = self._key(path).rstrip("/") + "/"
        names: set[str] = set()
        token = None
        while True:
            kw = dict(Bucket=self.bucket, Prefix=prefix, Delimiter="/")
            if token:
                kw["ContinuationToken"] = token
            r = self.client.list_objects_v2(**kw)
            for c in r.get("Contents", []):
                names.add(c["Key"][len(prefix):])
            for p in r.get("CommonPrefixes", []):
                names.add(p["Prefix"][len(prefix):].rstrip("/"))
            if not r.get("IsTruncated"):
                break
            token = r.get("NextContinuationToken")
        return sorted(n for n in names if n)

    def walk_files(self, root: str) -> Iterator[str]:
        prefix = self._key(root).rstrip("/") + "/"
        token = None
        while True:
            kw = dict(Bucket=self.bucket, Prefix=prefix)
            if token:
                kw["ContinuationToken"] = token
            r = self.client.list_objects_v2(**kw)
            for c in r.get("Contents", []):
                yield self._path(c["Key"])
            if not r.get("IsTruncated"):
                return
            token = r.get("NextContinuationToken")

    def mtime_ms(self, path: str) -> int:
        r = self.client.head_object(Bucket=self.bucket,
                                    Key=self._key(path))
        return int(r["LastModified"].timestamp() * 1000)

    def remove(self, path: str) -> None:
        if not self.exists(path):
            raise FileNotFoundError(path)  # match LocalFs error contract
        self.client.delete_object(Bucket=self.bucket, Key=self._key(path))

    def remove_tree(self, root: str) -> None:
        batch: list[dict] = []
        for p in self.walk_files(root):
            batch.append({"Key": self._key(p)})
            if len(batch) == 1000:  # DeleteObjects cap
                self.client.delete_objects(Bucket=self.bucket,
                                           Delete={"Objects": batch})
                batch = []
        if batch:
            self.client.delete_objects(Bucket=self.bucket,
                                       Delete={"Objects": batch})

    def makedirs(self, path: str) -> None:
        """No-op: keys don't need parents."""

    def prune_empty_dirs(self, root: str) -> None:
        """No-op: object stores have no empty directories to prune."""


class HadoopFs(CommitFs):
    """Hadoop ``FileSystem`` metadata plane via the Spark driver's py4j
    gateway — the HDFS port of the commit protocol, the deployment most
    Gobblin users run (≙ the rename-into-place publish of
    gobblin-core/.../publisher/BaseDataPublisher.java:190-244 and
    FsRenameCommitStep.java:38,135, done create-exclusive instead):

    - ``publish_if_absent`` = ``FileSystem.create(path, overwrite=false)``
      + write + close. On HDFS the exclusive create is ATOMIC on the
      NameNode (exactly one racing writer wins; the loser's
      FileAlreadyExistsException maps to CommitConflict). A contender that
      crashes mid-write leaves a short/empty target; callers of the commit
      protocol already treat an unparseable manifest as absent-for-read
      (and HDFS leases block a second writer while the first holds the
      stream). This is strictly stronger than the reference's
      rename-with-retry: no staging file to garbage-collect on the commit
      path.
    - ``write_replace`` = stage + delete + rename. The FileSystem API has
      no public atomic-overwrite rename; the microscopic missing-file
      window is acceptable for what write_replace carries (re-writable
      checkpoints and tags — a reader finding none re-derives from the
      commit log, which only ever moves through publish_if_absent).
    - Caveat for the local test double: driven against ``file://`` the
      suite exercises Hadoop's RawLocalFileSystem, whose exclusive create
      is check-then-open (no O_EXCL) — every protocol property holds
      except the multi-writer race, which only the real NameNode
      arbitrates. The race test is HDFS-gated accordingly.

    Needs an active SparkSession only for its JVM (the commit plane is
    driver-side metadata; executors never route through this). Raw
    (non-checksummed) local filesystem is unwrapped automatically so
    ``.crc`` shadow files never pollute manifest listings."""

    def __init__(self, spark=None, uri: str = ""):
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise RuntimeError(
                    "HadoopFs needs an active SparkSession for the JVM "
                    "gateway")
        self._jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        if uri:
            self._fs = self._Path(uri).getFileSystem(conf)
        else:
            self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(conf)
        # file:// resolves to ChecksumFileSystem — unwrap so .crc shadows
        # never appear in listings the manifest protocol reads
        if hasattr(self._fs, "getRawFileSystem"):
            try:
                self._fs = self._fs.getRawFileSystem()
            except Exception:
                pass

    def _p(self, path: str):
        return self._Path(path)

    @staticmethod
    def _is_missing(exc) -> bool:
        s = str(exc)
        return ("FileNotFoundException" in s
                or "PathNotFoundException" in s)

    # -- atomic primitives
    def publish_if_absent(self, content: bytes, target: str) -> None:
        self._fs.mkdirs(self._p(os.path.dirname(target)))
        try:
            out = self._fs.create(self._p(target), False)
        except Exception as exc:  # py4j Py4JJavaError
            if ("FileAlreadyExistsException" in str(exc)
                    or "already exists" in str(exc)):
                raise CommitConflict(target) from exc
            raise
        try:
            out.write(bytearray(content))
            try:
                out.hsync()  # durable on datanodes before we report success
            except Exception:
                pass  # local fs: close() suffices
        finally:
            out.close()

    def write_replace(self, content: bytes, target: str) -> None:
        d = os.path.dirname(target)
        self._fs.mkdirs(self._p(d))
        tmp = os.path.join(d, f".put-{uuid.uuid4().hex}")
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(content))
        finally:
            out.close()
        self._fs.delete(self._p(target), False)
        if not self._fs.rename(self._p(tmp), self._p(target)):
            self._fs.delete(self._p(tmp), False)
            raise IOError(f"rename into {target} failed")

    # -- plain operations
    def read(self, path: str) -> bytes:
        try:
            stream = self._fs.open(self._p(path))
        except Exception as exc:
            if self._is_missing(exc):
                raise FileNotFoundError(path) from exc
            raise
        try:
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(
                stream)
        finally:
            stream.close()
        return bytes(data)

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def listdir(self, path: str) -> list[str]:
        try:
            statuses = self._fs.listStatus(self._p(path))
        except Exception as exc:
            if self._is_missing(exc):
                raise FileNotFoundError(path) from exc
            raise
        return [s.getPath().getName() for s in statuses]

    def walk_files(self, root: str) -> Iterator[str]:
        try:
            it = self._fs.listFiles(self._p(root), True)
        except Exception as exc:
            if self._is_missing(exc):
                return
            raise
        while it.hasNext():
            # scheme-stripped so callers' os.path string composition and
            # manifest-path comparisons keep working unchanged
            yield it.next().getPath().toUri().getPath()

    def mtime_ms(self, path: str) -> int:
        return int(self._fs.getFileStatus(self._p(path))
                   .getModificationTime())

    def remove(self, path: str) -> None:
        if not self._fs.delete(self._p(path), False):
            raise FileNotFoundError(path)

    def remove_tree(self, root: str) -> None:
        self._fs.delete(self._p(root), True)

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def prune_empty_dirs(self, root: str) -> None:
        try:
            statuses = self._fs.listStatus(self._p(root))
        except Exception as exc:
            if self._is_missing(exc):
                return
            raise
        for s in statuses:
            if s.isDirectory():
                p = s.getPath().toUri().getPath()
                self.prune_empty_dirs(p)
                if not self._fs.listStatus(self._p(p)):
                    self._fs.delete(self._p(p), False)


DEFAULT_FS = LocalFs()
