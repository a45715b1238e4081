"""PathIO abstraction tests (operators/pathio.py): the seam that
takes IVF index maintenance off bare os.* calls (VERDICT r9 ask #5 —
the last named blocker for running maintenance against non-local
storage).

Three tiers:
1. the swap-recovery protocol driven through a MOCK non-local scheme
   (pure-PathIO logic, no cluster needed),
2. the real HadoopPathIO backend over ``file:`` URIs — the exact
   FileSystem-API code path a hdfs/s3a deployment runs,
3. scheme dispatch: local for bare paths, loud NotImplementedError
   for schemes with no connector on the classpath.
"""

from __future__ import annotations

import os

import pytest

from lakehouse_automation_spark.operators import pathio as P


class MemPathIO:
    """In-memory mock backend for a fake non-local scheme: directories
    are a set of path strings, renames move whole subtrees."""

    def __init__(self, spark=None):
        self.dirs: set[str] = set()

    def join(self, *parts):
        return "/".join(s.rstrip("/") for s in parts[:-1]) + "/" + parts[-1]

    def isdir(self, p):
        return p in self.dirs

    def exists(self, p):
        return p in self.dirs

    def makedirs(self, p):
        # like os.makedirs: ancestors come into existence too
        scheme, _, rest = p.partition("://")
        parts = rest.split("/")
        for i in range(1, len(parts) + 1):
            self.dirs.add(f"{scheme}://" + "/".join(parts[:i]))

    def rmtree(self, p):
        self.dirs = {d for d in self.dirs
                     if d != p and not d.startswith(p + "/")}

    def unlink(self, p):
        self.dirs.discard(p)

    def rename(self, src, dst):
        if src not in self.dirs:
            raise OSError(f"rename: missing {src}")
        moved = {d for d in self.dirs if d == src or d.startswith(src + "/")}
        self.dirs -= moved
        self.dirs |= {dst + d[len(src):] for d in moved}

    def listdir(self, p):
        kids = set()
        for d in self.dirs:
            if d.startswith(p + "/"):
                kids.add(d[len(p) + 1:].split("/", 1)[0])
        return sorted(kids)

    def list_prefixed(self, p, prefix):
        return [n for n in self.listdir(p) if n.startswith(prefix)]


def test_replay_interrupted_swap_over_mock_nonlocal_scheme():
    """The crash-recovery replay restores a missing cell from scratch
    (old-N authoritative, new-N fallback) through ANY PathIO — driven
    here via a mock scheme registered in SCHEME_OVERRIDES, proving the
    protocol never touches os.* directly."""
    P.SCHEME_OVERRIDES["mock"] = MemPathIO
    try:
        io = P.pathio_for(None, "mock://idx")
        assert isinstance(io, MemPathIO)
        root, scratch = "mock://idx", "mock://idx/_compact_tmp"
        # cell 0 intact; cell 1 mid-swap (only old-1 survives); cell 2
        # lost its old- copy, new-2 is the only copy
        for d in (f"{root}/cell_id=0", f"{scratch}/old-1",
                  f"{scratch}/new-2",
                  f"{scratch}/old-0"):  # cell 0 present -> must NOT restore
            io.makedirs(d)
        restored = P.replay_interrupted_swap(io, root, scratch)
        assert restored == 2
        assert io.isdir(f"{root}/cell_id=0")
        assert io.isdir(f"{root}/cell_id=1")
        assert io.isdir(f"{root}/cell_id=2")
        # the stale old-0 stays in scratch (cell present), for the wipe
        assert io.isdir(f"{scratch}/old-0")
        assert not io.isdir(f"{scratch}/old-1")
    finally:
        P.SCHEME_OVERRIDES.pop("mock", None)


def test_hadoop_pathio_drives_the_filesystem_api_on_file_uris(spark, tmp_path):
    """HadoopPathIO over file: URIs runs the SAME FileSystem-API calls
    a hdfs://, s3a://, or gs:// deployment would — rename/list/delete
    of directories, boolean-false rename surfaced as OSError."""
    io = P.HadoopPathIO(spark)
    base = f"file://{tmp_path}"
    a, b = f"{base}/cell_id=1", f"{base}/cell_id=2"
    io.makedirs(a)
    assert io.isdir(a) and not io.isdir(b)
    io.rename(a, b)
    assert io.isdir(b) and not io.isdir(a)
    assert io.list_prefixed(base, "cell_id=") == ["cell_id=2"]
    # rename with a missing source returns Hadoop false -> OSError
    with pytest.raises(OSError, match="rename failed"):
        io.rename(f"{base}/nope", f"{base}/also_nope")
    io.rmtree(b)
    assert not io.isdir(b)
    assert io.listdir(base) == []
    assert io.listdir(f"{base}/never_made") == []


def test_ivf_compact_runs_through_hadoop_backend_on_file_uri(spark, tmp_path):
    """End-to-end: build a small IVF index at a file: URI (so
    pathio_for resolves HadoopPathIO, not the os backend) and compact
    it — content set-equal before/after, exactly the local contract."""
    from lakehouse_automation_spark.operators.vector import (
        ivf_index_compact,
        ivf_index_write,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = f"file://{tmp_path}/ivf"
    ivf_index_write(emb, path, n_centroids=4)
    before = sorted(
        (r.vec_id, r.cell_id)
        for r in spark.read.parquet(path).select("vec_id", "cell_id")
        .collect())
    # route file: through the REAL Hadoop backend for this test so the
    # whole compact swap (recovery, renames, wipes) runs FileSystem-API
    P.SCHEME_OVERRIDES["file"] = P.HadoopPathIO
    try:
        n = ivf_index_compact(spark, path)
    finally:
        P.SCHEME_OVERRIDES.pop("file", None)
    assert n >= 1
    after = sorted(
        (r.vec_id, r.cell_id)
        for r in spark.read.parquet(path).select("vec_id", "cell_id")
        .collect())
    assert before == after
    # compact to one file per cell
    for d in os.listdir(tmp_path / "ivf"):
        if d.startswith("cell_id="):
            parts = [f for f in os.listdir(tmp_path / "ivf" / d)
                     if f.endswith(".parquet")]
            assert len(parts) == 1, (d, parts)


def test_scheme_dispatch_and_unsupported_scheme_raises(spark):
    assert isinstance(P.pathio_for(spark, "/plain/local"), P.LocalPathIO)
    assert isinstance(P.pathio_for(spark, "file:///x"), P.LocalPathIO)
    with pytest.raises(NotImplementedError, match="maintenance"):
        P.pathio_for(spark, "definitelynotascheme://bucket/idx")


def test_scheme_windows_drive_and_short_prefix_resolve_locally(spark):
    """RFC-3986 scheme parsing (ADVICE r10): a Windows drive path or a
    relative path containing 'x:/' must resolve to LocalPathIO, not
    route to HadoopPathIO and die on connector resolution."""
    assert P._scheme("C:/data/idx") is None
    assert P._scheme("x:/weird/rel") is None
    assert P._scheme("hdfs://nn/x") == "hdfs"
    assert P._scheme("s3a://bucket/x") == "s3a"
    assert P._scheme("file:/x") == "file"
    assert isinstance(P.pathio_for(spark, "C:/data/idx"), P.LocalPathIO)


def test_file_uri_authority_handling(tmp_path):
    """file: URI parsing (ADVICE r10): an empty or 'localhost'
    authority resolves to the local path; a REMOTE authority raises
    instead of silently running against a wrong relative path."""
    io = P.LocalPathIO()
    assert io._strip(f"file://{tmp_path}/x") == f"{tmp_path}/x"
    assert io._strip(f"file:{tmp_path}/x") == f"{tmp_path}/x"
    assert io._strip(f"file://localhost{tmp_path}/x") == f"{tmp_path}/x"
    with pytest.raises(ValueError, match="remote authority"):
        io._strip("file://otherhost/tmp/x")


def test_local_publish_if_absent_single_winner(tmp_path):
    """The commit primitive: exactly one create-if-absent publish of a
    given destination succeeds; the loser gets False (the local
    spelling of an object store's 412 Precondition Failed), and the
    winner's bytes are untouched by the losing attempt."""
    io = P.LocalPathIO()
    dst = str(tmp_path / "log" / "v1.json")
    assert io.publish_if_absent(dst, b'{"v": 1, "writer": "a"}') is True
    assert io.publish_if_absent(dst, b'{"v": 1, "writer": "b"}') is False
    with open(dst, "rb") as fh:
        assert fh.read() == b'{"v": 1, "writer": "a"}'
    # no staging litter left behind
    assert [f for f in os.listdir(tmp_path / "log")
            if f.startswith(".tmp")] == []


def test_hadoop_publish_if_absent_on_file_uri(spark, tmp_path):
    """HadoopPathIO's publish on a rename-capable scheme stages the
    full content then claims via FileContext.rename (fails if dst
    exists) — the loser gets False, the winner's bytes are untouched,
    and no staging litter survives (ADVICE r11: create(overwrite=
    false) claimed the name BEFORE any bytes landed, so a writer crash
    left a permanently claimed empty manifest)."""
    io = P.HadoopPathIO(spark)
    dst = f"file://{tmp_path}/log/v7.json"
    assert io.publish_if_absent(dst, b"first") is True
    assert io.publish_if_absent(dst, b"second") is False
    with open(tmp_path / "log" / "v7.json", "rb") as fh:
        assert fh.read() == b"first"
    assert [f for f in os.listdir(tmp_path / "log")
            if ".tmp-" in f] == [], "staging litter leaked"


def test_hadoop_publish_conditional_create_maps_close_time_412(
        spark, tmp_path, monkeypatch):
    """Object-store tier (ADVICE r11): on S3A the conditional PUT
    executes at close() — create() is lazy and never contacts S3 — so
    a lost If-None-Match race surfaces as a 412/RemoteFileChanged out
    of write/close. The mapping must catch it THERE and return False
    (the optimistic-retry contract), not let it abort the commit."""
    io = P.HadoopPathIO(spark)

    class LazyPutStream:
        """create() succeeded; the PUT fails at close, like S3A."""

        def write(self, b):
            pass

        def close(self):
            raise RuntimeError(
                "org.apache.hadoop.fs.s3a.RemoteFileChangedException: "
                "PUT ...: 412 Precondition Failed (If-None-Match)")

    class FakeFS:
        def create(self, jp, overwrite):
            assert overwrite is False
            return LazyPutStream()

    assert io._publish_conditional_create(
        FakeFS(), "s3a://bucket/log/v1.json", b"doc") is False

    class BrokenStream(LazyPutStream):
        def close(self):
            raise RuntimeError("java.io.IOException: connection reset")

    class BrokenFS(FakeFS):
        def create(self, jp, overwrite):
            return BrokenStream()

    # a transient I/O failure must RAISE (silent False would abort an
    # append that should have retried)
    with pytest.raises(RuntimeError, match="connection reset"):
        io._publish_conditional_create(
            BrokenFS(), "s3a://bucket/log/v1.json", b"doc")


def test_hadoop_publish_scheme_routing(spark):
    """s3a-family schemes publish through conditional create (rename
    there is a non-atomic copy); hdfs/file through stage-then-rename."""
    io = P.HadoopPathIO(spark)
    routed = {}
    io._publish_conditional_create = (
        lambda fs, dst, data: routed.setdefault("cond", dst) or True)
    io._publish_stage_rename = (
        lambda fs, dst, data: routed.setdefault("rename", dst) or True)
    io._fs = lambda p: None  # routing decision only needs the scheme
    io.publish_if_absent("s3a://b/log/v1.json", b"x")
    io.publish_if_absent("file:///tmp/t/log/v1.json", b"x")
    assert routed == {"cond": "s3a://b/log/v1.json",
                      "rename": "file:///tmp/t/log/v1.json"}


def test_local_publish_failed_stage_leaves_no_litter(tmp_path, monkeypatch):
    """A stage-time failure (disk full mid-write) must not leak the
    .tmp-* file into the log directory (ADVICE r11)."""
    io = P.LocalPathIO()
    dst = str(tmp_path / "log" / "v1.json")

    class ExplodingBytes(bytes):
        pass

    real_open = open

    def failing_open(path, mode="r", *a, **kw):
        if "w" in mode and ".tmp-" in str(path):
            fh = real_open(path, mode, *a, **kw)

            class FailWrite:
                def __enter__(self):
                    return self

                def __exit__(self, *exc):
                    fh.close()
                    return False

                def write(self, data):
                    raise OSError(28, "No space left on device")

            return FailWrite()
        return real_open(path, mode, *a, **kw)

    monkeypatch.setattr("builtins.open", failing_open)
    with pytest.raises(OSError, match="No space left"):
        io.publish_if_absent(dst, b"doc")
    monkeypatch.undo()
    assert [f for f in os.listdir(tmp_path / "log")
            if f.startswith(".tmp")] == [], "staging litter leaked"
    # the destination was never claimed: a retry can still win
    assert io.publish_if_absent(dst, b"doc") is True


def test_local_strip_percent_decodes_file_uris(tmp_path):
    """file: URIs are percent-encoded (a path with spaces arrives as
    %20); _strip must decode exactly like tableformat._local_path or
    the two file:-URI interpreters disagree (ADVICE r11)."""
    io = P.LocalPathIO()
    assert io._strip("file:///tmp/a%20b/x") == "/tmp/a b/x"
    d = tmp_path / "with space"
    d.mkdir()
    from urllib.parse import quote
    assert io.isdir("file://" + quote(str(d)))
