"""Thin filesystem abstraction for driver-side index MAINTENANCE
metadata ops (atomic-ish directory swaps, crash-recovery replay,
cell enumeration) — the operations `ivf_index_compact` /
`ivf_index_refresh` need beyond what Spark's writers do.

Why it exists: the data path (parquet read/append) already goes
through Spark and works on any supported filesystem, but the
maintenance path needs rename/list/delete of DIRECTORIES, which
round 9 drove with bare ``os.rename``/``isdir`` — correct in this
sandbox, silently wrong the moment ``path`` is ``hdfs://`` or
``s3a://`` (flagged in ADVICE/VERDICT r9 as the last named blocker
for the 100 TB deployment story). This module routes those ops
through a scheme-dispatched backend:

- :class:`LocalPathIO` — os/shutil; bare paths and ``file:`` URIs.
- :class:`HadoopPathIO` — the Hadoop FileSystem API via the active
  SparkSession's JVM (py4j): the SAME single-directory rename
  contract, available for every scheme the cluster has a connector
  for (hdfs, s3a, gs, abfs, …). Exercised in tests against
  ``file:`` URIs, which drive the identical code path.

Semantics every backend must honor (the swap protocol depends on
them):

- ``rename`` moves a whole directory and RAISES on failure (Hadoop's
  boolean false is converted to OSError — a silent false would turn
  the compact swap into data loss).
- ``rmtree``/``unlink`` ignore a missing target (recovery paths
  delete best-effort).
- ``listdir`` of a missing directory is ``[]``, not an error.

One rename caveat worth naming: HDFS renames are atomic; S3A's are
copy+delete (not atomic). The compact protocol tolerates that — the
crash-recovery replay restores from the surviving scratch copy — but
an object-store deployment should still prefer a manifest-pointer
swap; this abstraction is the seam where that backend would plug in.
"""

from __future__ import annotations

import glob as _glob
import os as _os
import shutil as _shutil


class LocalPathIO:
    """os/shutil-backed PathIO for bare local paths and file: URIs."""

    @staticmethod
    def _strip(p: str) -> str:
        # file: URIs may carry an authority (file://host/tmp/x). Blind
        # prefix stripping would turn that into the RELATIVE path
        # 'host/tmp/x' and silently run maintenance against a wrong
        # local directory (ADVICE r10) — parse properly and refuse any
        # non-local authority instead.
        if p.startswith("file:"):
            from urllib.parse import unquote, urlparse
            u = urlparse(p)
            if u.netloc not in ("", "localhost"):
                raise ValueError(
                    f"file: URI with remote authority {u.netloc!r} is "
                    f"not a local path: {p}")
            # percent-decode: a table path containing spaces arrives
            # as %20 in a file: URI, and tableformat._local_path
            # already decodes — the two file:-URI interpreters must
            # agree or maintenance runs against a wrong dir (ADVICE
            # r11)
            return unquote(u.path)
        return p

    def join(self, *parts: str) -> str:
        return _os.path.join(*parts)

    def isdir(self, p: str) -> bool:
        return _os.path.isdir(self._strip(p))

    def exists(self, p: str) -> bool:
        return _os.path.exists(self._strip(p))

    def rename(self, src: str, dst: str) -> None:
        _os.rename(self._strip(src), self._strip(dst))

    def makedirs(self, p: str) -> None:
        _os.makedirs(self._strip(p), exist_ok=True)

    def rmtree(self, p: str) -> None:
        _shutil.rmtree(self._strip(p), ignore_errors=True)

    def unlink(self, p: str) -> None:
        try:
            _os.unlink(self._strip(p))
        except FileNotFoundError:
            pass

    def listdir(self, p: str) -> list[str]:
        p = self._strip(p)
        if not _os.path.isdir(p):
            return []
        return sorted(_os.listdir(p))

    def read_bytes(self, p: str) -> bytes:
        """Whole-file read (manifest-sized payloads — the CowTable log
        reads route through this, mirroring publish_if_absent)."""
        with open(self._strip(p), "rb") as fh:
            return fh.read()

    def getmtime(self, p: str) -> float:
        return _os.path.getmtime(self._strip(p))

    # glob kept for parity with the pre-abstraction code; prefix-only
    def list_prefixed(self, p: str, prefix: str) -> list[str]:
        p = self._strip(p)
        return sorted(
            _os.path.basename(m) for m in _glob.glob(
                _os.path.join(_glob.escape(p), _glob.escape(prefix) + "*")))

    def publish_if_absent(self, dst: str, data: bytes) -> bool:
        """Atomic create-if-absent publish — the POSIX spelling of an
        object-store conditional PUT (``If-None-Match: *``): stage the
        bytes to a unique temp name in dst's directory, then hard-link
        to dst. ``os.link`` is atomic, so exactly one of N racing
        writers wins; the losers see FileExistsError -> False (the
        412 Precondition Failed of this protocol). This is the commit
        primitive the CowTable manifest log publishes through."""
        dst = self._strip(dst)
        d = _os.path.dirname(dst)
        _os.makedirs(d, exist_ok=True)
        tmp = _os.path.join(d, f".tmp-{_os.getpid()}-{id(data)}")
        try:
            # staging inside the same try/finally as the link: a
            # failed stage (disk full mid-write) must not leak the
            # .tmp-* file into the log directory (ADVICE r11)
            with open(tmp, "wb") as fh:
                fh.write(data)
            try:
                _os.link(tmp, dst)
                return True
            except FileExistsError:
                return False
        finally:
            try:
                _os.unlink(tmp)
            except FileNotFoundError:
                pass


class HadoopPathIO:
    """Hadoop FileSystem API via the SparkSession JVM — the production
    backend for hdfs/s3a/gs/abfs URIs (and file:, used by the tests to
    drive this exact code path). Each call resolves the FileSystem for
    the path's scheme from the session's Hadoop configuration."""

    def __init__(self, spark):
        self._jvm = spark._jvm
        self._gw = spark._sc._gateway
        self._conf = spark._jsc.hadoopConfiguration()

    def _path(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, p: str):
        return self._path(p).getFileSystem(self._conf)

    def join(self, *parts: str) -> str:
        return "/".join(s.rstrip("/") for s in parts[:-1]) + "/" + parts[-1]

    def isdir(self, p: str) -> bool:
        fs = self._fs(p)
        jp = self._path(p)
        return bool(fs.exists(jp) and fs.getFileStatus(jp).isDirectory())

    def exists(self, p: str) -> bool:
        return bool(self._fs(p).exists(self._path(p)))

    def rename(self, src: str, dst: str) -> None:
        # Hadoop rename returns FALSE on some failure modes and THROWS
        # on others (scheme-dependent); a silent false would corrupt
        # the compact swap — normalize both to OSError.
        try:
            ok = self._fs(src).rename(self._path(src), self._path(dst))
        except Exception as e:  # noqa: BLE001 — py4j exception classes
            raise OSError(
                f"hadoop rename failed: {src} -> {dst}: {e}") from e
        if not ok:
            raise OSError(f"hadoop rename failed: {src} -> {dst}")

    def makedirs(self, p: str) -> None:
        self._fs(p).mkdirs(self._path(p))

    def rmtree(self, p: str) -> None:
        fs = self._fs(p)
        jp = self._path(p)
        if fs.exists(jp):
            fs.delete(jp, True)

    def unlink(self, p: str) -> None:
        fs = self._fs(p)
        jp = self._path(p)
        if fs.exists(jp):
            fs.delete(jp, False)

    def listdir(self, p: str) -> list[str]:
        fs = self._fs(p)
        jp = self._path(p)
        if not fs.exists(jp):
            return []
        return sorted(st.getPath().getName() for st in fs.listStatus(jp))

    def list_prefixed(self, p: str, prefix: str) -> list[str]:
        return [n for n in self.listdir(p) if n.startswith(prefix)]

    def read_bytes(self, p: str) -> bytes:
        """Whole-file read through the FileSystem API (manifest-sized
        payloads). Missing files map to FileNotFoundError so callers
        see ONE exception type across backends."""
        fs = self._fs(p)
        jp = self._path(p)
        if not fs.exists(jp):
            raise FileNotFoundError(p)
        stream = fs.open(jp)
        try:
            # commons-io ships with Hadoop; reads the full stream
            data = self._jvm.org.apache.commons.io.IOUtils.toByteArray(
                stream)
        finally:
            stream.close()
        return bytes(data)

    def getmtime(self, p: str) -> float:
        fs = self._fs(p)
        jp = self._path(p)
        if not fs.exists(jp):
            raise FileNotFoundError(p)
        return fs.getFileStatus(jp).getModificationTime() / 1000.0

    #: Schemes whose FileSystem ``rename`` is a non-atomic copy+delete
    #: (an unconditional overwrite on the store): the stage-then-rename
    #: claim would lose exactly-one-winner there, so these publish
    #: through conditional create instead. Every other scheme (hdfs,
    #: file, viewfs, o3fs, ...) has a metadata-arbitrated rename and
    #: claims via FileContext.rename (fails if dst exists).
    _RENAME_IS_COPY = frozenset({
        "s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs",
        "oss", "cos", "swift"})

    @staticmethod
    def _lost_race(e: Exception) -> bool:
        """True when a py4j exception is the create-if-absent race
        being lost, in any of the spellings the stores use: HDFS/local
        raise *AlreadyExists*/*FileExists* at create or rename time;
        S3A's conditional PUT executes at close() and surfaces the
        lost If-None-Match as a 412 Precondition Failed /
        RemoteFileChangedException (ADVICE r11)."""
        msg = f"{type(e).__name__}: {e}"
        return any(m in msg for m in (
            "AlreadyExists", "FileExists", "RemoteFileChanged",
            "PreconditionFailed", "Precondition Failed", "412",
            "If-None-Match"))

    def publish_if_absent(self, dst: str, data: bytes) -> bool:
        """Atomic create-if-absent publish, scheme-adaptive:

        - **rename-capable filesystems** (HDFS, local, viewfs, ...):
          stage the full content to a unique temp name, then claim via
          ``FileContext.rename`` WITHOUT the OVERWRITE option — atomic
          at the namenode and fails if dst exists. The name is claimed
          only once the content is complete; a plain
          ``create(overwrite=false)`` would claim it BEFORE any bytes
          land, so a writer crash between create and close left a
          permanently claimed, unparseable manifest no retry could
          reclaim (ADVICE r11 — the os.link path never had this gap
          because it also stages first).
        - **copy-rename object stores** (s3a, gs, abfs, ...): rename
          there is an unconditional copy+delete, so stage-then-rename
          would clobber a rival — publish via ``create(path,
          overwrite=false)``, a conditional PUT (``If-None-Match: *``)
          on Hadoop 3.4.1+ with ``fs.s3a.create.conditional.enabled``.
          On S3A the PUT executes at ``close()`` (create is lazy and
          never contacts S3), so the lost race can surface out of
          write/close as a 412/RemoteFileChangedException — mapped to
          False exactly like the create-time AlreadyExists. On older
          S3A builds the exists check is NOT atomic, which is why the
          CowTable commit protocol keeps the optimistic retry loop
          around this primitive rather than assuming the primitive
          alone (tested against a mocked conditional-put backend in
          tests/test_tableformat.py).

        A lost race returns False; any other failure raises (a silent
        False on a transient I/O error would abort an append that
        should have retried)."""
        fs = self._fs(dst)
        scheme = (_scheme(dst)
                  or str(fs.getUri().getScheme() or "")).lower()
        if scheme in self._RENAME_IS_COPY:
            return self._publish_conditional_create(fs, dst, data)
        return self._publish_stage_rename(fs, dst, data)

    def _publish_stage_rename(self, fs, dst: str, data: bytes) -> bool:
        jdst = self._path(dst)
        tmp = self._path(f"{dst}.tmp-{_os.getpid()}-{id(data)}")
        out = fs.create(tmp, True)
        try:
            out.write(bytearray(data))
        finally:
            out.close()
        try:
            fc = self._jvm.org.apache.hadoop.fs.FileContext \
                .getFileContext(jdst.toUri(), self._conf)
            # varargs Options.Rename... with NO options = fail if dst
            # exists (FileAlreadyExistsException), unlike
            # FileSystem.rename whose dst-exists behavior is
            # scheme-dependent (RawLocal silently overwrites)
            fc.rename(tmp, jdst,
                      self._gw.new_array(
                          self._jvm.org.apache.hadoop.fs.Options.Rename, 0))
            return True
        except Exception as e:  # noqa: BLE001 — py4j exception classes
            if self._lost_race(e):
                return False
            raise OSError(
                f"manifest publish rename failed: {dst}: {e}") from e
        finally:
            if fs.exists(tmp):
                fs.delete(tmp, False)

    def _publish_conditional_create(self, fs, dst: str,
                                    data: bytes) -> bool:
        jp = self._path(dst)
        try:
            out = fs.create(jp, False)
        except Exception as e:  # noqa: BLE001 — py4j exception classes
            if self._lost_race(e):
                return False
            raise
        err = None
        try:
            out.write(bytearray(data))
        except Exception as e:  # noqa: BLE001
            err = e
        try:
            out.close()
        except Exception as e:  # noqa: BLE001
            err = err or e
        if err is None:
            return True
        if self._lost_race(err):
            # the conditional PUT executed at close() and lost
            return False
        raise err


#: Test seam: map a URI scheme to a PathIO factory ``(spark) -> io``.
#: Real schemes resolve through HadoopPathIO; tests register mock
#: schemes here to drive the maintenance protocol without a cluster.
SCHEME_OVERRIDES: dict[str, object] = {}


_SCHEME_RE = None


def _scheme(path: str) -> str | None:
    """Extract a URI scheme per RFC 3986 (letter, then letters/digits/
    +-.), requiring >= 2 chars so a Windows drive path ('C:/data') or a
    relative path containing 'x:/' resolves locally instead of routing
    to HadoopPathIO and failing (ADVICE r10)."""
    global _SCHEME_RE
    if _SCHEME_RE is None:
        import re
        _SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]+):/")
    m = _SCHEME_RE.match(path)
    return m.group(1) if m else None


def pathio_for(spark, path: str):
    """Resolve the PathIO backend for ``path`` by scheme: bare paths
    and ``file:`` URIs get the os-backed LocalPathIO; any other scheme
    goes through the Hadoop FileSystem API (raising a clear error if
    the session has no connector for it, instead of half-running with
    os.* calls that cannot see the remote store)."""
    scheme = _scheme(path)
    if scheme in SCHEME_OVERRIDES:
        return SCHEME_OVERRIDES[scheme](spark)
    if scheme is None or scheme == "file":
        return LocalPathIO()
    try:
        io = HadoopPathIO(spark)
        io._fs(path)  # force connector resolution now, loudly
        return io
    except Exception as e:  # noqa: BLE001 — rewrap with the contract
        raise NotImplementedError(
            f"index maintenance on scheme {scheme!r} needs a Hadoop "
            f"FileSystem connector on the session classpath "
            f"(resolution failed: {e}); the data path may still work "
            f"through Spark, but the maintenance swap will not run "
            f"half-local") from e


def replay_interrupted_swap(io, path: str, scratch: str) -> int:
    """Crash-recovery replay for the compact swap protocol, over any
    PathIO: a cell directory missing from the table is restored from
    its surviving scratch copy (old-N preferred — it is the
    authoritative pre-compact data; new-N only if old-N is gone).
    Returns the number of cells restored. Pure PathIO logic so the
    protocol is testable against a mock backend."""
    restored = 0
    if not io.isdir(scratch):
        return 0
    for prefix in ("old-", "new-"):  # old first: authoritative copy
        for name in io.list_prefixed(scratch, prefix):
            cid_s = name[len(prefix):]
            cdir = io.join(path, f"cell_id={cid_s}")
            if not io.isdir(cdir):
                io.rename(io.join(scratch, name), cdir)
                restored += 1
    return restored
