"""Filesystem facade for the metadata path (log replay + catalog).

The reference reads S3 via the AWS SDK and Hadoop s3a
(/root/reference/DeltaMetadataHandler.scala:25-31,42-55); the rebuild must
likewise work against object storage, not just the local disk. Two
implementations behind one interface:

- LocalFS: plain os/pyarrow fast path for bare paths and file:// URIs;
- HadoopFS: driver-side org.apache.hadoop.fs.FileSystem via spark._jvm for
  ANY scheme the Spark runtime has a connector for (s3a://, gs://, abfs://,
  hdfs://...). Listing and small-file reads go over py4j (names + JSON
  commits are small); checkpoint Parquet is read THROUGH SPARK
  (spark.read.parquet -> collect), which both avoids shipping bytes through
  py4j and scales to checkpoints larger than driver py4j buffers.

Data files are always read by Spark's own readers, which are
scheme-agnostic already; this facade carries the METADATA reads (log
replay + catalog) AND, since round 7, the engine-side WRITES — commit
JSON (put-if-absent), checkpoints, _last_checkpoint, staged-file
promotion, clone copies, VACUUM/log-cleanup deletes — so write_delta /
DML / OPTIMIZE / VACUUM work on any scheme the Spark runtime has a
connector for, matching the reference's object-store habitat
(/root/reference/src/.../Config.scala:4 `data_bucket`; build.sbt
hadoop-aws + S3 SDK).

Commit atomicity matrix (the put-if-absent primitive behind optimistic
concurrency — see atomic_put_capability for the probe):

  scheme                capability          mechanism
  ------                ----------          ---------
  local / file://       native-exclusive    os.open(O_EXCL)
  hdfs / viewfs         atomic-rename       temp + FileContext.rename(NONE)
  abfs(s)               atomic-rename       temp + FileContext.rename(NONE)
  s3 / s3a / s3n, gs,   conditional-put     registered put-if-absent hook
   oss, cos, ...                            (register_put_if_absent; a
                                            boto3-backed S3 If-None-Match
                                            implementation — the primitive
                                            delta-rs uses — registers when
                                            ADLS_S3_CONDITIONAL_PUT=1;
                                            opt-in because boto3's
                                            endpoint/credential chain need
                                            not match fs.s3a.* config)
  same, no hook         non-atomic-rename   temp + rename DEGRADES to
                                            copy+delete: two concurrent
                                            committers can both "win".
                                            Policy via ADLS_NONATOMIC_COMMIT:
                                            warn (default, once per scheme)
                                            | refuse | allow.

FileContext.rename(..., Options.Rename.NONE) (LocalFS uses O_EXCL
directly) gives complete-or-absent visibility for concurrent replayers
AND a contract-guaranteed no-overwrite check — FileSystem.rename on
RawLocalFileSystem is POSIX rename(2), which silently replaces. Single-
writer S3 is always safe (set ADLS_NONATOMIC_COMMIT=allow); concurrent
S3 writers need the conditional-put hook or an external coordination
layer, the same stance as delta-spark's LogStore docs (S3 conditional
puts / DynamoDB LogStore).

`ADLS_FORCE_HADOOP_FS=1` routes even local/file:// paths through the
HadoopFS implementation — the test lever proving the JVM connector path
end-to-end without a real object store in the sandbox.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

_LOCAL_SCHEMES = ("file",)

# Schemes whose FileContext.rename(NONE) is a true atomic metadata
# operation (HDFS semantics). Everything else either needs a registered
# put-if-absent hook or degrades to copy+delete (see module docstring).
_ATOMIC_RENAME_SCHEMES = {"file", "hdfs", "viewfs", "abfs", "abfss"}

# scheme -> put_if_absent(path, data) raising FileExistsError on conflict.
# The pluggable conditional-PUT layer: object stores expose a native
# exclusive-create (S3 If-None-Match, GCS if-generation-match=0) that no
# Hadoop rename can emulate; registering one here upgrades commits on
# that scheme from non-atomic-rename to conditional-put.
_PUT_IF_ABSENT: dict = {}


def register_put_if_absent(scheme: str, fn) -> None:
    """Register `fn(path: str, data: bytes)` as the commit primitive for
    `scheme`. Must write all-or-nothing and raise FileExistsError when
    the object already exists (the optimistic-concurrency loser signal)."""
    _PUT_IF_ABSENT[scheme] = fn


def _s3_put_if_absent(path: str, data: bytes) -> None:
    """S3-native conditional PUT (If-None-Match: *): atomic put-if-absent
    without any rename, the primitive delta-rs builds its S3 commits on.
    Registered for s3/s3a/s3n when ADLS_S3_CONDITIONAL_PUT=1 and boto3
    is importable — OPT-IN, never automatic: boto3 resolves endpoint and
    credentials from the AWS default chain, which need not agree with
    the cluster's Hadoop config (fs.s3a.endpoint / per-bucket
    credentials); hijacking every S3 commit on mere importability would
    break MinIO/Ceph deployments or, worse, land commits in a same-named
    bucket on real AWS while the data files went elsewhere."""
    import boto3
    from botocore.exceptions import ClientError

    rest = path.split("://", 1)[1]
    bucket, _, key = rest.partition("/")
    try:
        boto3.client("s3").put_object(
            Bucket=bucket, Key=key, Body=data, IfNoneMatch="*"
        )
    except ClientError as e:
        code = str(e.response.get("Error", {}).get("Code"))
        status = (
            e.response.get("ResponseMetadata", {}).get("HTTPStatusCode")
        )
        # 412 PreconditionFailed: the object exists — the plain OCC loser.
        # 409 ConditionalRequestConflict: a CONCURRENT conditional PUT is
        # racing this one; surfacing it as FileExistsError routes the
        # caller into the same retry-at-next-version loop (it re-reads
        # the log, sees whichever writer won, and retries), instead of
        # aborting the whole DML with a raw S3 error. Deliberately NOT
        # a bare status==409 check: other 409s (OperationAborted, bucket
        # conflicts) are real failures that must surface, not loop as
        # phantom OCC losses.
        if code in ("PreconditionFailed", "ConditionalRequestConflict") or (
            status == 412
        ):
            raise FileExistsError(path) from None
        raise


def _maybe_register_s3_hook() -> None:
    """Opt-in S3 conditional-put registration (ADLS_S3_CONDITIONAL_PUT=1).
    Re-invoked by get_fs so the env var works even when set after
    import."""
    if os.environ.get("ADLS_S3_CONDITIONAL_PUT") != "1":
        return
    try:
        import boto3 as _boto3  # noqa: F401
    except ImportError:
        return
    for _s in ("s3", "s3a", "s3n"):
        _PUT_IF_ABSENT.setdefault(_s, _s3_put_if_absent)


_maybe_register_s3_hook()


def atomic_put_capability(path: str) -> str:
    """How safe a concurrent commit to `path` is — pure scheme probe:

    - 'native-exclusive': local O_EXCL (LocalFS);
    - 'conditional-put': a registered put-if-absent hook serves the scheme;
    - 'atomic-rename': FileContext.rename(NONE) is atomic there;
    - 'non-atomic-rename': rename degrades to copy+delete — concurrent
      writers can both win; policy below decides warn/refuse/allow."""
    scheme = _scheme(path)
    if scheme is None or (
        scheme in _LOCAL_SCHEMES
        and os.environ.get("ADLS_FORCE_HADOOP_FS") != "1"
    ):
        return "native-exclusive"
    if scheme in _PUT_IF_ABSENT:
        return "conditional-put"
    if scheme in _ATOMIC_RENAME_SCHEMES:
        return "atomic-rename"
    return "non-atomic-rename"


_WARNED_SCHEMES: set = set()


def _nonatomic_commit_policy(path: str) -> None:
    """Refuse-or-warn gate for schemes whose commit degrades to a
    non-atomic copy+delete rename. ADLS_NONATOMIC_COMMIT: 'warn'
    (default; once per scheme), 'refuse', or 'allow' (documented
    single-writer deployments)."""
    policy = os.environ.get("ADLS_NONATOMIC_COMMIT", "warn")
    if policy == "allow":
        return
    scheme = _scheme(path) or "file"
    msg = (
        f"commit to {scheme}:// uses a NON-ATOMIC rename (copy+delete): "
        "two concurrent writers can both win the same table version. "
        "Safe only with a single writer. Register a conditional-PUT "
        "primitive (fs.register_put_if_absent; ADLS_S3_CONDITIONAL_PUT=1 "
        "enables the boto3 S3 If-None-Match path) or set "
        "ADLS_NONATOMIC_COMMIT=allow to acknowledge single-writer mode."
    )
    if policy == "refuse":
        raise OSError(msg)
    if scheme not in _WARNED_SCHEMES:
        _WARNED_SCHEMES.add(scheme)
        import warnings

        warnings.warn(msg, stacklevel=3)


def _scheme(path: str) -> str | None:
    if "://" in path:
        return path.split("://", 1)[0]
    return None


def strip_file_scheme(path: str) -> str:
    if path.startswith("file://"):
        return path[len("file://") :]
    return path


def is_uri(path: str) -> bool:
    """True when `path` carries any scheme (file://, s3a://, hdfs://...)."""
    return "://" in path


def is_remote(path: str) -> bool:
    """True when `path` needs a non-local filesystem implementation."""
    s = _scheme(path)
    return s is not None and s not in _LOCAL_SCHEMES


def executor_fs_safe(path: str) -> bool:
    """True iff get_fs(path) works in a BARE PYTHON WORKER (executor
    task): plain/file-scheme paths, which resolve to posix LocalFS there
    even under ADLS_FORCE_HADOOP_FS (the forced-Hadoop lever is
    best-effort pre-session). Remote schemes need HadoopFS, whose py4j
    gateway exists only on the driver — distributed fan-outs (vacuum
    deletes, checkpoint part writes) must route those through the driver
    facade instead of calling get_fs() inside a task."""
    return not is_remote(path)


def normalize_table_path(path: str) -> str:
    """The write-side replacement for os.path.abspath: absolute-ize bare
    local paths, pass URIs through untouched (abspath would mangle the
    scheme) minus any trailing slash."""
    if is_uri(path):
        return path.rstrip("/")
    return os.path.abspath(path)


@dataclass(frozen=True)
class FileInfo:
    name: str
    size: int
    mtime_ms: int


class LocalFS:
    """os-backed implementation (bare paths and file:// URIs)."""

    def listdir(self, path: str) -> list[FileInfo]:
        path = strip_file_scheme(path)
        out = []
        with os.scandir(path) as it:
            for e in it:
                st = e.stat()
                out.append(
                    FileInfo(e.name, st.st_size, int(st.st_mtime * 1000))
                )
        return sorted(out, key=lambda f: f.name)

    def read_text(self, path: str) -> str:
        with open(strip_file_scheme(path)) as f:
            return f.read()

    def exists(self, path: str) -> bool:
        return os.path.exists(strip_file_scheme(path))

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(strip_file_scheme(path))

    def read_checkpoint_rows(
        self, paths: list[str], columns: list[str], drop_all_null: bool = False
    ):
        """Yield checkpoint action rows as dicts (pyarrow, batched)."""
        import pyarrow.parquet as pq

        for p in paths:
            pf = pq.ParquetFile(strip_file_scheme(p))
            cols = [c for c in columns if c in pf.schema_arrow.names]
            for batch in pf.iter_batches(columns=cols):
                for row in batch.to_pylist():
                    if drop_all_null and not any(
                        v is not None for v in row.values()
                    ):
                        continue
                    yield row

    def read_checkpoint_batches(self, paths: list[str], columns: list[str]):
        """Yield pyarrow RecordBatches of checkpoint actions — the
        COLUMNAR fast path: log.py folds the dense `add` column via
        per-field array extraction instead of per-row nested dicts
        (to_pylist was ~10x the cost of the columnar fold at 10^6 adds,
        tools/meta_scale.py)."""
        import pyarrow.parquet as pq

        for p in paths:
            pf = pq.ParquetFile(strip_file_scheme(p))
            cols = [c for c in columns if c in pf.schema_arrow.names]
            yield from pf.iter_batches(columns=cols)

    # ------------------------------------------------------ write surface

    def mkdirs(self, path: str) -> None:
        os.makedirs(strip_file_scheme(path), exist_ok=True)

    def create_atomic(self, path: str, data: bytes) -> None:
        """Put-if-absent — the Delta optimistic-concurrency commit
        primitive. Raises FileExistsError when `path` already exists."""
        fd = os.open(
            strip_file_scheme(path),
            os.O_WRONLY | os.O_CREAT | os.O_EXCL,
            0o644,
        )
        with os.fdopen(fd, "wb") as f:
            f.write(data)

    def create_atomic_stream(self, path: str, chunks) -> None:
        """Put-if-absent from an ITERABLE of byte chunks — the streaming
        variant of create_atomic for commits too large to hold driver-side
        (a shallow CLONE of a 10^7-file table is a multi-GiB JSON).

        The bytes stream into a tmp file under a `.tmp/` SIBLING DIR
        first (the staged-write scratch area VACUUM's .tmp sweep already
        owns — a SIGKILL mid-stream must not leave a multi-GiB orphan
        loose in _delta_log forever), then hard-link into place: link(2)
        fails with EEXIST when the target exists — the same put-if-absent
        guarantee as O_EXCL. Writing straight to the final path would
        leave a torn, permanent commit JSON if a chunk read failed
        mid-stream, and every reader would replay it while every retry
        hit FileExistsError. Filesystems without hard links (CIFS, VFAT,
        some FUSE mounts) fall back to an O_EXCL copy whose partial
        target is unlinked on failure — safe because O_EXCL proves WE
        created it. Peak memory is one chunk."""
        import uuid as _uuid

        final = strip_file_scheme(path)
        if os.path.exists(final):
            # cheap early refusal before streaming GiBs; link/O_EXCL
            # below still decides the race
            raise FileExistsError(path)
        tmp_dir = os.path.join(os.path.dirname(final), ".tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        tmp = os.path.join(
            tmp_dir,
            f"{os.path.basename(final)}.stream-{_uuid.uuid4().hex}",
        )
        try:
            fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
            with os.fdopen(fd, "wb") as f:
                for c in chunks:
                    f.write(c)
            try:
                os.link(tmp, final)
            except FileExistsError:
                raise FileExistsError(path) from None
            except OSError:
                # no hard-link support: O_EXCL create-and-copy; the
                # partial target is OURS to unlink on failure
                fd = os.open(
                    final, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644
                )
                try:
                    with os.fdopen(fd, "wb") as out, open(tmp, "rb") as src:
                        shutil.copyfileobj(src, out, 8 * 1024 * 1024)
                except BaseException:
                    try:
                        os.remove(final)
                    except OSError:
                        pass
                    raise
        finally:
            try:
                os.remove(tmp)
            except OSError:
                pass

    def write_bytes(self, path: str, data: bytes) -> None:
        with open(strip_file_scheme(path), "wb") as f:
            f.write(data)

    def read_bytes(self, path: str) -> bytes:
        with open(strip_file_scheme(path), "rb") as f:
            return f.read()

    def delete(self, path: str, recursive: bool = False) -> None:
        p = strip_file_scheme(path)
        if recursive and os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.isdir(p):
            os.rmdir(p)
        else:
            os.remove(p)

    def move(self, src: str, dst: str) -> None:
        """Move a file within ONE filesystem (staging promotion)."""
        shutil.move(strip_file_scheme(src), strip_file_scheme(dst))

    def copy(self, src: str, dst: str) -> None:
        shutil.copy2(strip_file_scheme(src), strip_file_scheme(dst))

    def walk_files(self, path: str):
        """Yield (path-relative-to-`path`, size, mtime_ms) for every file
        under `path`, '/'-separated, depth-first."""
        root_p = strip_file_scheme(path)
        for root, _dirs, files in os.walk(root_p):
            for name in files:
                full = os.path.join(root, name)
                rel = os.path.relpath(full, root_p).replace(os.sep, "/")
                st = os.stat(full)
                yield rel, st.st_size, int(st.st_mtime * 1000)

    def getsize(self, path: str) -> int:
        return os.path.getsize(strip_file_scheme(path))


def _is_already_exists_java_error(e) -> bool:
    """True when a py4j-surfaced Hadoop error is the OCC lost-race signal
    (the destination exists). Checks the JAVA EXCEPTION CLASS chain first
    — FileAlreadyExistsException / PathExistsException — because an FS
    implementation that wraps or localizes the exception would defeat
    free-text message matching and skip the ConcurrentWriteError re-plan
    path; the message substrings stay as a fallback."""
    java_exc = getattr(e, "java_exception", None)
    seen = 0
    while java_exc is not None and seen < 8:
        seen += 1
        try:
            name = java_exc.getClass().getName()
        except Exception:
            break
        if "AlreadyExists" in name or "PathExists" in name:
            return True
        try:
            java_exc = java_exc.getCause()
        except Exception:
            break
    return "AlreadyExists" in str(e) or "already exists" in str(e)


class HadoopFS:
    """Hadoop FileSystem via the Spark JVM — any configured scheme."""

    def __init__(self, spark):
        self.spark = spark
        self._jvm = spark._jvm
        self._conf = spark._jsc.hadoopConfiguration()

    def _fs_path(self, path: str):
        jpath = self._jvm.org.apache.hadoop.fs.Path(path)
        return jpath.getFileSystem(self._conf), jpath

    def listdir(self, path: str) -> list[FileInfo]:
        fs, jpath = self._fs_path(path)
        out = []
        try:
            statuses = fs.listStatus(jpath)
        except Exception as e:  # uniform not-found semantics with LocalFS
            if "FileNotFound" in str(e) or "does not exist" in str(e):
                raise FileNotFoundError(path) from None
            raise
        for st in statuses:
            out.append(
                FileInfo(
                    st.getPath().getName(),
                    st.getLen(),
                    st.getModificationTime(),
                )
            )
        return sorted(out, key=lambda f: f.name)

    def read_text(self, path: str) -> str:
        fs, jpath = self._fs_path(path)
        try:
            stream = fs.open(jpath)
        except Exception as e:  # uniform not-found semantics across impls
            if "FileNotFound" in str(e) or "does not exist" in str(e):
                raise FileNotFoundError(path) from None
            raise
        try:
            util = self._jvm.org.apache.commons.io.IOUtils
            data = util.toByteArray(stream)
            return bytes(data).decode("utf-8")
        finally:
            stream.close()

    def exists(self, path: str) -> bool:
        fs, jpath = self._fs_path(path)
        return bool(fs.exists(jpath))

    def is_dir(self, path: str) -> bool:
        fs, jpath = self._fs_path(path)
        return bool(fs.exists(jpath) and fs.getFileStatus(jpath).isDirectory())

    def read_checkpoint_rows(
        self, paths: list[str], columns: list[str], drop_all_null: bool = False
    ):
        """drop_all_null: filter out rows where EVERY requested column is
        null BEFORE collecting — the header-only fold of snapshot_light
        needs ~5 rows of a 10^7-row checkpoint, not 10^7 null Rows shipped
        through py4j."""
        from pyspark.sql import functions as F

        df = self.spark.read.parquet(*paths)
        cols = [c for c in columns if c in df.columns]
        out = df.select(*cols)
        if drop_all_null and cols:
            keep = None
            for c in cols:
                e = F.col(c).isNotNull()
                keep = e if keep is None else (keep | e)
            out = out.filter(keep)
        for row in out.collect():
            yield row.asDict(recursive=True)

    # ------------------------------------------------------ write surface

    def mkdirs(self, path: str) -> None:
        fs, jpath = self._fs_path(path)
        fs.mkdirs(jpath)

    def create_atomic(self, path: str, data: bytes) -> None:
        """Put-if-absent with NO torn-commit window: the bytes are fully
        written to a temp sibling, then renamed into place with
        FileContext.rename(..., Options.Rename.NONE) — the delta-spark
        HDFSLogStore protocol. FileContext (unlike FileSystem.rename,
        which on RawLocalFileSystem is POSIX rename(2) and silently
        REPLACES an existing destination) contract-guarantees the
        no-overwrite check and throws FileAlreadyExistsException for the
        OCC loser; a concurrent replayer either sees the complete file or
        no file. Plain S3A degrades to copy+delete (module docstring).
        Raises FileExistsError when the target exists.

        Dispatch order: a registered put-if-absent hook for the scheme
        (conditional-put — S3 If-None-Match class primitives) wins; else
        the rename protocol, gated by _nonatomic_commit_policy on schemes
        where rename degrades to copy+delete."""
        import uuid as _uuid

        hook = _PUT_IF_ABSENT.get(_scheme(path) or "")
        if hook is not None:
            hook(path, data)
            return
        if atomic_put_capability(path) == "non-atomic-rename":
            _nonatomic_commit_policy(path)
        fs, jpath = self._fs_path(path)
        if fs.exists(jpath):  # cheap early refusal; rename still decides
            raise FileExistsError(path)
        # stage under the `.tmp/` sibling dir (like create_atomic_stream
        # below and LocalFS): a driver kill between create and rename must
        # leave the orphan where VACUUM's .tmp sweep reclaims it, not
        # loose in _delta_log forever (round-11 review)
        tmp_dir = os.path.dirname(path) + "/.tmp"
        tmp = (
            f"{tmp_dir}/{os.path.basename(path)}.tmp-{_uuid.uuid4().hex}"
        )
        self.mkdirs(tmp_dir)
        _fs2, jtmp = self._fs_path(tmp)
        stream = fs.create(jtmp, True)
        try:
            stream.write(bytearray(data))
        finally:
            stream.close()
        ok = False
        try:
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                jpath.toUri(), self._conf
            )
            rename_cls = self._jvm.org.apache.hadoop.fs.Options.Rename
            gw = self.spark.sparkContext._gateway
            opts = gw.new_array(rename_cls, 1)
            opts[0] = rename_cls.NONE
            fc.rename(jtmp, jpath, opts)
            ok = True
        except Exception as e:
            if _is_already_exists_java_error(e):
                raise FileExistsError(path) from None
            raise
        finally:
            if not ok:
                try:
                    fs.delete(jtmp, False)
                except Exception:
                    pass

    def create_atomic_stream(self, path: str, chunks) -> None:
        """Put-if-absent from an ITERABLE of byte chunks. Conditional-put
        backends (registered hooks) need the full payload in one call, so
        that branch joins the chunks (memory O(commit bytes) — still far
        below the AddFile materialization this streaming path avoids);
        the rename protocol streams chunk-by-chunk through the Hadoop
        output stream, peak memory one chunk."""
        import uuid as _uuid

        hook = _PUT_IF_ABSENT.get(_scheme(path) or "")
        if hook is not None:
            hook(path, b"".join(chunks))
            return
        if atomic_put_capability(path) == "non-atomic-rename":
            _nonatomic_commit_policy(path)
        fs, jpath = self._fs_path(path)
        if fs.exists(jpath):  # cheap early refusal; rename still decides
            raise FileExistsError(path)
        # stage under the `.tmp/` SIBLING DIR (like LocalFS above and
        # _staged_tmp_dir): streamed commits are multi-GiB, and a driver
        # SIGKILL mid-stream must leave the orphan where VACUUM's .tmp
        # sweep reclaims it — a direct `<commit>.json.tmp-<uuid>` sibling
        # in _delta_log would linger forever
        tmp_dir = os.path.dirname(path) + "/.tmp"
        tmp = (
            f"{tmp_dir}/{os.path.basename(path)}"
            f".stream-{_uuid.uuid4().hex}"
        )
        self.mkdirs(tmp_dir)
        _fs2, jtmp = self._fs_path(tmp)
        stream = fs.create(jtmp, True)
        try:
            try:
                for c in chunks:
                    stream.write(bytearray(c))
            finally:
                stream.close()
        except Exception:
            # a failed chunk read must not leak the partial tmp file
            # (create_atomic's failure path deletes too)
            try:
                fs.delete(jtmp, False)
            except Exception:
                pass
            raise
        ok = False
        try:
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                jpath.toUri(), self._conf
            )
            rename_cls = self._jvm.org.apache.hadoop.fs.Options.Rename
            gw = self.spark.sparkContext._gateway
            opts = gw.new_array(rename_cls, 1)
            opts[0] = rename_cls.NONE
            fc.rename(jtmp, jpath, opts)
            ok = True
        except Exception as e:
            if _is_already_exists_java_error(e):
                raise FileExistsError(path) from None
            raise
        finally:
            if not ok:
                try:
                    fs.delete(jtmp, False)
                except Exception:
                    pass

    def write_bytes(self, path: str, data: bytes) -> None:
        fs, jpath = self._fs_path(path)
        stream = fs.create(jpath, True)
        try:
            stream.write(bytearray(data))
        finally:
            stream.close()

    def read_bytes(self, path: str) -> bytes:
        fs, jpath = self._fs_path(path)
        try:
            stream = fs.open(jpath)
        except Exception as e:
            if "FileNotFound" in str(e) or "does not exist" in str(e):
                raise FileNotFoundError(path) from None
            raise
        try:
            util = self._jvm.org.apache.commons.io.IOUtils
            return bytes(util.toByteArray(stream))
        finally:
            stream.close()

    def delete(self, path: str, recursive: bool = False) -> None:
        fs, jpath = self._fs_path(path)
        fs.delete(jpath, recursive)

    def move(self, src: str, dst: str) -> None:
        """FileSystem.rename — metadata-only on HDFS/ABFS, copy+delete
        under the hood on S3A (the connector handles it)."""
        fs, jsrc = self._fs_path(src)
        _fs2, jdst = self._fs_path(dst)
        if not fs.rename(jsrc, jdst):
            raise OSError(f"rename failed: {src} -> {dst}")

    def copy(self, src: str, dst: str) -> None:
        fs, jsrc = self._fs_path(src)
        fs2, jdst = self._fs_path(dst)
        util = self._jvm.org.apache.hadoop.fs.FileUtil
        if not util.copy(fs, jsrc, fs2, jdst, False, True, self._conf):
            raise OSError(f"copy failed: {src} -> {dst}")

    def walk_files(self, path: str):
        """Yield (path-relative-to-`path`, size, mtime_ms) for every file
        under `path` — ONE recursive listFiles call (object stores serve
        this as a flat prefix listing; no per-directory round trips)."""
        fs, jpath = self._fs_path(path)
        base = jpath.toUri().getPath().rstrip("/")
        it = fs.listFiles(jpath, True)
        while it.hasNext():
            st = it.next()
            full = st.getPath().toUri().getPath()
            rel = full[len(base) + 1 :] if full.startswith(base + "/") else full
            yield rel, st.getLen(), st.getModificationTime()

    def getsize(self, path: str) -> int:
        fs, jpath = self._fs_path(path)
        return fs.getFileStatus(jpath).getLen()


def get_fs(path: str, spark=None):
    """Pick the implementation for `path`. Non-file schemes require a
    SparkSession (for the JVM Hadoop connectors). ADLS_FORCE_HADOOP_FS=1
    forces HadoopFS even for local paths — the sandbox test lever for the
    object-store code path (Hadoop's LocalFileSystem serves file://)."""
    _maybe_register_s3_hook()
    scheme = _scheme(path)
    if (
        scheme is None or scheme in _LOCAL_SCHEMES
    ) and os.environ.get("ADLS_FORCE_HADOOP_FS") != "1":
        return LocalFS()
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            if scheme is None or scheme in _LOCAL_SCHEMES:
                return LocalFS()  # forced-Hadoop is best-effort pre-session
            raise ValueError(
                f"reading {path!r} requires an active SparkSession "
                "(Hadoop filesystem connectors live in the JVM)"
            )
    return HadoopFS(spark)


__all__ = [
    "FileInfo",
    "atomic_put_capability",
    "register_put_if_absent",
    "LocalFS",
    "HadoopFS",
    "get_fs",
    "strip_file_scheme",
    "is_uri",
    "is_remote",
    "normalize_table_path",
]
