"""Minimal copy-on-write table format: parquet data + an atomic JSON
manifest log — the Delta/Iceberg transaction pattern re-expressed with
no extra jars.

The reference's whole job is a *transactional* external-table refresh:
``sys.heatwave_load`` re-points the lakehouse table at a new file set
in one step (reference ``check_lakehouse.py:146-150``), and readers
never see a half-loaded table. Plain ``df.write.parquet`` has no such
boundary (readers can observe partial file sets), and the Delta jars
are not in this image (``engine.session.delta_available`` probes and
logs). This module supplies the missing boundary with the same
public-protocol design Delta uses:

- data is immutable parquet, added in commit-sized chunks;
- a table IS its newest manifest: ``<table>/_log/v{N}.json`` lists the
  data chunks of snapshot N;
- a commit writes data first, then publishes the manifest with an
  atomic create-if-absent (``os.link``); two racing writers cannot
  both claim version N (optimistic concurrency, exactly Delta's
  protocol on a POSIX fs; on object stores the same step is a
  conditional PUT). The loser's next move depends on the operation:
  APPENDS conflict with nothing, so they re-read the tip and retry
  with the reconciled chunk list; snapshot REWRITES (merge / delete /
  compact) abort with :class:`ConcurrentWriteError` because their
  chunk list was derived from a stale snapshot — blindly re-claiming
  the next version would silently drop the concurrent commit;
- old manifests stay readable -> time travel; ``vacuum`` reclaims
  chunks no retained snapshot references.

Scale notes (100-TB design):
- Manifests carry chunk NAMES, never data; the driver-side log read is
  O(#chunks), the same contract as Delta's log.
- ``merge``/``delete_where`` are file-pruned copy-on-write: only
  chunks that actually contain matched keys / matched rows are
  rewritten, discovered with one semi-join over ``input_file_name()``
  — untouched chunks are carried into the new manifest by name. A
  MERGE touching 0.1% of keys rewrites ~0.1% of the table.
- Data skipping is two-level: per-chunk AND per-file [min, max] for
  the opted-in ``stats_cols`` live in the manifest (Delta/Iceberg's
  file-statistics pattern), so ``scan()`` admits individual files —
  both pruning levels are driver-side dict lookups with zero file
  I/O before the surviving files are read.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .operators.upsert import merge_upsert

_LOG = "_log"
_PAD = 12


class ConcurrentWriteError(RuntimeError):
    """A snapshot transaction (merge/delete/compact) lost the commit
    race: its rewrite was computed against a tip another writer has
    since advanced. Re-run the operation against the new tip."""


class ConstraintViolationError(ValueError):
    """A write contained rows failing a table CHECK constraint; the
    commit was refused and the table is unchanged. ``.violations``
    carries the offending row count, ``.constraint`` the first
    violated expression."""

    def __init__(self, constraint: str, violations: int):
        super().__init__(
            f"CHECK constraint violated by {violations} row(s): "
            f"{constraint}")
        self.constraint = constraint
        self.violations = violations


# reserved key inside per-file stats entries holding the file's row
# count (integrity audits + Delta-export numRecords); a stats column
# may not use this name
ROWS_KEY = "__rows__"

# reserved key inside per-file stats entries holding per-column Bloom
# filters ({col: [m_bits, k_hashes, dtype, base64 words]} — dtype
# recorded because xxhash64 hashes by Catalyst type, so the probe
# must cast its literal to the WRITER's column type) for point-lookup
# file skipping on high-cardinality columns where [min, max] ranges
# prune nothing (Delta's BLOOMFILTER INDEX pattern)
BLOOM_KEY = "__bloom__"
_BLOOM_BITS_PER_ROW = 10   # sizing: m = pow2ceil(10 * rows) per file
_BLOOM_MIN_BITS = 8192     # 1 KB floor
_BLOOM_MAX_BITS = 1 << 21  # 256 KB cap per file per column
_BLOOM_K = 5               # ~0.1% FP at the 10-bits/row sizing; FPs
#                            only cost a wasted file read, never a
#                            wrong row
# reserved key inside per-chunk stats entries mapping each stats
# column to its Spark dtype at write time. The scan side gates the
# date-padding prune heuristic on the COLUMN's recorded dtype — gating
# on the probe bound's Python type silently reverts a DATE/TIMESTAMP
# column probed with ISO-string bounds to raw string comparison,
# re-introducing the mixed-granularity misprune ('1997-06-01' vs
# '1997-06-01T00:00:00') the padding exists to fix (review r7)
DTYPES_KEY = "__dtypes__"

# reserved key inside per-chunk stats entries holding the chunk's
# parquet footer-schema fingerprint, recorded in the same write-time
# pass that computes stats. The schema-grouped pruned read
# (_read_pruned) groups chunks by this manifest entry instead of
# re-opening a parquet footer per kept chunk per fresh table handle
# (review r7: repeated driver I/O on many-chunk tables); footer reads
# remain only as the fallback for manifests predating the key.
SCHEMA_KEY = "__schema__"

_RESERVED_STAT_KEYS = (ROWS_KEY, BLOOM_KEY, DTYPES_KEY, SCHEMA_KEY)


def _vname(v: int) -> str:
    return f"v{v:0{_PAD}d}.json"


def _local_path(uri: str) -> str:
    """Filesystem path for a Spark ``input_file_name()`` value. The
    value is a URI: percent-encoded (a table path containing spaces
    arrives as ``%20``) with an optional ``file:`` scheme — comparing
    or relpath-ing it against plain ``os.path`` strings without
    decoding silently mismatches every file of such a table."""
    from urllib.parse import unquote, urlparse

    p = urlparse(uri)
    return unquote(p.path) if p.scheme else unquote(uri)


def _js(v):
    """JSON-encodable stat value (numbers/strings kept, rest stringified
    — timestamps become sortable ISO strings)."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    try:
        return v.isoformat()  # datetime/date: sortable text
    except AttributeError:
        return str(v)


_DATE_ONLY = re.compile(r"\d{4}-\d{2}-\d{2}")


def _prune_key(v, temporal: bool = True):
    """Comparable form of a stat/bound for pruning. A datetime bound
    renders as '1997-06-01T00:00:00' while a DATE-column stat renders
    as '1997-06-01'; compared raw, the longer string sorts GREATER and
    an equal-date boundary chunk gets wrongly pruned (losing its
    midnight rows). Pad date-only strings to midnight so mixed
    temporal granularity compares consistently.

    ``temporal=False`` disables the padding: a genuine STRING column
    whose values merely look like dates must compare as raw strings —
    padding '2024-01-15' to '...T00:00:00' sorts it ABOVE
    '2024-01-15 10:00:00' (' ' < 'T') and a range scan would falsely
    prune files holding matching rows. Callers gate on the bound's
    Python type (scan side) or the column's Spark dtype (stats fold)."""
    v = _js(v)
    if temporal and isinstance(v, str) and _DATE_ONLY.fullmatch(v):
        return v + "T00:00:00"
    return v


def _temporal_bound(lo, hi) -> bool:
    """True when a scan's bounds are real date/datetime objects — the
    only case the date-padding heuristic is safe for."""
    import datetime as _dt

    return isinstance(lo, (_dt.date, _dt.datetime)) \
        or isinstance(hi, (_dt.date, _dt.datetime))


def _z_as_long_sql(df: DataFrame, c: str) -> str:
    """SQL text of a z-order column as comparable long (timestamps →
    epoch µs). A STRING, not a Column: the z expression is built as
    one SQL literal and parsed JVM-side in a single call — the
    Column-object tree cost ~4 s of py4j round-trips per compact at
    255 cuts × 2 columns (the same driver-side plan-construction trap
    operators/vector.py's `dot` documents)."""
    dt = dict(df.dtypes)[c]
    if dt.startswith("timestamp"):
        return f"unix_micros(cast(`{c}` as timestamp))"
    return f"cast(`{c}` as bigint)"


def _z_spread(bucket: int, bits: int, k: int, i: int) -> int:
    """Bucket index bit-spread to its interleaved z positions: bit b
    of ``bucket`` lands at z bit b*k + i (column i of k)."""
    z = 0
    for b in range(bits):
        z |= ((bucket >> b) & 1) << (b * k + i)
    return z


def _z_case_sql(x_sql: str, cuts: list[int], leaves: list[int],
                lo: int, hi: int) -> str:
    """Binary-search CASE tree over ``cuts`` whose leaves are the
    PRE-SPREAD z contributions (count of cuts <= x, already
    interleaved to this column's bit positions). Folding the spread
    into the leaf literals means the whole per-column contribution is
    ONE tree evaluation per row — the earlier shape (tree → bucket →
    8 shift/mask references per bit) inlined the tree 8× per column
    under CollapseProject, and with the >8 KB projection falling out
    of whole-stage codegen each copy was evaluated interpreted,
    per row. A NULL x fails every comparison and lands on the
    leftmost leaf — bucket 0, the curve origin (skippable by every
    range predicate, which NULL never satisfies anyway). A when-TREE,
    not an array fold: F.aggregate over a 255-literal array allocates
    and folds the array PER ROW (measured 5.75 s vs 0.6 s over sf0.1
    orders)."""
    if lo >= hi:
        return f"{leaves[lo]}L"
    mid = (lo + hi) // 2
    return (f"(CASE WHEN {x_sql} >= {cuts[mid]}L "
            f"THEN {_z_case_sql(x_sql, cuts, leaves, mid + 1, hi)} "
            f"ELSE {_z_case_sql(x_sql, cuts, leaves, lo, mid)} END)")


def _murmur3_int32(x: int, seed: int = 42) -> int:
    """Spark's Murmur3Hash of one IntegerType value (x86_32, the
    hashInt path) — what HashPartitioning computes for a single int
    shuffle key, byte-for-byte. Re-implemented from the public
    Murmur3 spec so the planner can choose hash-bucket TOKENS
    driver-side with zero probe jobs; tests/test_zorder_sketch.py
    pins it against F.hash on a value sweep, and a drift would also
    fail tf_zorder's pruned-booleans oracle loudly (scrambled files
    stop pruning)."""
    m = 0xFFFFFFFF

    def rotl(v: int, r: int) -> int:
        return ((v << r) | (v >> (32 - r))) & m

    k = (x & m) * 0xCC9E2D51 & m
    k = rotl(k, 15) * 0x1B873593 & m
    h = (seed ^ k) & m
    h = (rotl(h, 13) * 5 + 0xE6546B64) & m
    h ^= 4  # total bytes hashed
    h = (h ^ (h >> 16)) * 0x85EBCA6B & m
    h = (h ^ (h >> 13)) * 0xC2B2AE35 & m
    h ^= h >> 16
    # back to JVM signed int, as Pmod sees it
    return h - (1 << 32) if h >= (1 << 31) else h


def _hash_bucket_tokens(n: int) -> list[int]:
    """For each shuffle bucket b < n, the smallest non-negative int32
    t with pmod(murmur3(t), n) == b — repartition(n, token_col) then
    places token b's rows in partition b exactly, no collisions and
    no empty buckets. Search cost is O(n·H_n) expected (~6n probes)."""
    tokens: dict[int, int] = {}
    t = 0
    while len(tokens) < n:
        b = _murmur3_int32(t) % n  # Python % is already pmod
        if b not in tokens:
            tokens[b] = t
        t += 1
    return [tokens[b] for b in range(n)]


class CowTable:
    """Handle to a copy-on-write table rooted at ``path``.

    ``stats_cols`` opts columns into per-chunk min/max stats in the
    manifest — the Delta/Iceberg data-skipping pattern: ``scan()``
    prunes chunks whose [min, max] cannot intersect the predicate
    range BEFORE Spark ever lists their files, so a key-range query
    over a range-clustered table (see ``compact(sort_by=...)``) reads
    ~1 chunk instead of all of them. The column set is recorded in the
    manifest, so reopening a table by path recovers it."""

    def __init__(self, spark: SparkSession, path: str,
                 stats_cols: list[str] | None = None,
                 constraints: dict[str, str] | None = None,
                 bloom_cols: list[str] | None = None,
                 log_io=None):
        self.spark = spark
        # The manifest LOG — publish AND read — routes through one
        # PathIO backend (_log_io): local paths get the os.link
        # create-if-absent protocol, and the round-trip through the
        # Hadoop FileSystem API is pinned by test
        # (tests/test_tableformat.py, the log_io seam below). The DATA
        # plane (chunk writes' mkdir claim, footer walks, vacuum's
        # chunk reclaim ages) uses os.* against a local dir and is
        # DECLARED local-scoped (SURVEY §2 tf_* row, r14 final):
        # construction refuses remote table URIs loudly, and the
        # remote/object-store story is the Delta export
        # (to_delta_manifest) — Delta's data plane already speaks
        # every Hadoop filesystem, so conditional-PUT chunk claims
        # here would duplicate what the export buys.
        from .operators.pathio import LocalPathIO, _scheme
        scheme = _scheme(path)
        if scheme not in (None, "file"):
            raise NotImplementedError(
                f"CowTable supports local table paths only (got scheme "
                f"{scheme!r}); the manifest log is backend-routed "
                f"(_log_io) but the chunk data plane is os-local")
        # _strip unquotes file: URIs and rejects remote authorities —
        # the same interpretation the maintenance PathIO uses
        self.path = os.path.abspath(LocalPathIO._strip(path))
        # test/extension seam: force the log backend (e.g. a real
        # HadoopPathIO, or a mocked conditional-put store). None =
        # scheme-dispatched per call, the production behavior.
        self._log_io_override = log_io
        self._stats_cols_arg = list(stats_cols or [])
        self._bloom_cols_arg = list(bloom_cols or [])
        for arg in (self._stats_cols_arg, self._bloom_cols_arg):
            bad = set(arg) & set(_RESERVED_STAT_KEYS)
            if bad:
                # row counts and Bloom words share the per-file stats
                # dict under these keys; a column of the same name
                # would overwrite its own entry and corrupt the cstats
                # fold / Delta export
                raise ValueError(
                    f"stats/bloom cols may not use reserved keys {bad}")
        self._constraints_arg = dict(constraints or {})
        # chunk dir -> parquet footer schema string; chunks are
        # immutable (append/rewrite create NEW dirs) so entries never
        # go stale for this instance's lifetime
        self._chunk_schema_cache: dict[str, str] = {}
        # versions whose manifest is known to parse — committed
        # manifests are immutable, so the set only grows
        self._parse_ok: set[int] = set()

    @property
    def stats_cols(self) -> list[str]:
        if self.version() >= 0:
            return self.manifest().get("stats_cols", [])
        return self._stats_cols_arg

    @property
    def bloom_cols(self) -> list[str]:
        """Columns with per-file Bloom filters in the manifest —
        point-lookup file skipping for high-cardinality columns where
        [min, max] ranges prune nothing. Manifest-recorded, so
        reopening by path recovers the set."""
        if self.version() >= 0:
            return self.manifest().get("bloom_cols", [])
        return self._bloom_cols_arg

    @property
    def constraints(self) -> dict[str, str]:
        """Named CHECK constraints (Delta's ADD CONSTRAINT): SQL
        boolean expressions every written row must satisfy. Recorded
        in the manifest, so reopening by path recovers them and every
        later writer enforces them."""
        if self.version() >= 0:
            return self.manifest().get("constraints", {})
        return self._constraints_arg

    def _enforce(self, df: DataFrame) -> None:
        """Refuse the write if any row violates a CHECK constraint.
        SQL CHECK semantics: only rows where the expression evaluates
        to FALSE violate (NULL/unknown passes — express NOT NULL as
        ``col IS NOT NULL``). ALL constraints are validated in ONE
        aggregation job over the incoming batch (a sum of per-
        constraint violation flags), the same scan-validate Delta
        performs; the base table is never re-validated.

        Determinism assumption: validation executes the incoming plan
        once and the write executes it again, so a non-deterministic
        input (``rand()``, sampling, a non-deterministic UDF) can pass
        validation yet materialize different rows. Callers feeding
        such plans must materialize first (persist / checkpoint /
        write-then-read), exactly as Delta requires."""
        items = list(self.constraints.items())
        if not items:
            return
        counts = df.agg(*[
            F.sum((~F.coalesce(F.expr(expr), F.lit(True))).cast("long"))
            .alias(f"__v{i}")
            for i, (_, expr) in enumerate(items)]).collect()[0]
        for i, (name, expr) in enumerate(items):
            bad = counts[f"__v{i}"] or 0
            if bad:
                raise ConstraintViolationError(f"{name}: {expr}", int(bad))

    def _read_chunks(self, chunks: list[str]) -> DataFrame:
        """Snapshot-REWRITE read: always mergeSchema, because a rewrite
        (merge/delete/compact) REPLACES chunks — a plain multi-chunk
        read infers the schema from one file's footer and can silently
        drop a column only some chunks carry (additive evolution),
        making the loss permanent. Plain snapshot READS keep
        mergeSchema opt-in (:meth:`read`) since they can't lose data."""
        return (self.spark.read.option("mergeSchema", "true")
                .parquet(*[os.path.join(self.path, c) for c in chunks]))

    # ------------------------------------------------------------ log

    def _log_dir(self) -> str:
        return os.path.join(self.path, _LOG)

    def _parseable(self, v: int) -> bool:
        """True if manifest ``v`` parses as JSON. Under every publish
        path (os.link, stage-then-FileContext.rename, conditional PUT)
        manifest content appears atomically-complete, so an
        unparseable file is NOT a committed version — it is litter
        from a crashed pre-protocol writer or external corruption.
        Parse results are cached (manifests are immutable)."""
        if v in self._parse_ok:
            return True
        try:
            self.manifest(v)
        except (json.JSONDecodeError, UnicodeDecodeError):
            return False
        self._parse_ok.add(v)
        return True

    def version(self) -> int:
        """Newest committed version, -1 when the table doesn't exist.

        Reader-side guard (ADVICE r11): a manifest file that exists
        but does not parse is treated as UNCOMMITTED — readers step
        back to the newest parseable snapshot instead of crashing in
        ``manifest()``. Writers hitting such a blocker get a loud
        error from ``_try_commit`` rather than an infinite retry.

        Listed through the SAME PathIO backend the log publishes
        through (both backends return [] for a missing log dir)."""
        try:
            names = self._log_io().listdir(self._log_dir())
        except FileNotFoundError:
            return -1
        vs = [int(f[1:-5]) for f in names
              if f.startswith("v") and f.endswith(".json")]
        for v in sorted(vs, reverse=True):
            if self._parseable(v):
                return v
        return -1

    def manifest(self, version: int | None = None) -> dict:
        v = self.version() if version is None else version
        io = self._log_io()
        raw = io.read_bytes(io.join(self._log_dir(), _vname(v)))
        return json.loads(raw.decode())

    def history(self) -> list[dict]:
        """Retained manifests, oldest first. Manifests older than the
        vacuum retention horizon are gone — skip them rather than
        crash (the caller sees exactly the snapshots still readable)."""
        out = []
        for v in range(self.version() + 1):
            try:
                out.append(self.manifest(v))
            except (FileNotFoundError, json.JSONDecodeError,
                    UnicodeDecodeError):
                # vacuumed-away or unparseable (uncommitted) manifest
                continue
        return out

    def chunk_paths(self, version: int | None = None) -> list[str]:
        return [os.path.join(self.path, c)
                for c in self.manifest(version)["chunks"]]

    def _chunk_stats(self, chunk: str) -> tuple[dict, dict]:
        """(chunk_stats, file_stats) for a just-written chunk: ONE
        per-file aggregation over its contents — ``file_stats`` maps
        each data file to {col: [min, max]}, and the chunk-level range
        is folded from the file ranges driver-side. (A production
        writer reads these from the parquet footers it just wrote,
        paying nothing extra; the manifest protocol is identical.)"""
        df = self.spark.read.parquet(os.path.join(self.path, chunk))
        cols = [c for c in self.stats_cols if c in df.columns]
        # per-file row counts ride the same aggregation (integrity
        # audits via verify(); Delta-export numRecords) — recorded
        # even for tables with no stats columns
        aggs = [F.count(F.lit(1)).alias("__nr")]
        for c in cols:
            aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
        rows = (df.withColumn("_f", F.input_file_name())
                .groupBy("_f").agg(*aggs).collect())
        cdir = os.path.join(self.path, chunk)
        fstats: dict[str, dict] = {}
        for r in rows:
            # key by chunk-relative path (not basename): nested layouts
            # would collide basenames across subdirectories
            fname = os.path.relpath(_local_path(r["_f"]), cdir)
            fstats[fname] = {
                c: [_js(r[f"lo_{c}"]), _js(r[f"hi_{c}"])] for c in cols
            }
            fstats[fname][ROWS_KEY] = int(r["__nr"])
        # ZERO-row part files never group under input_file_name, but
        # the writer does emit them (task 0 of a write whose split had
        # every row filtered away — routine under real cluster read
        # geometry; the round-8 partition sweep caught verify() blind
        # to their deletion). Walk the just-written dir so EVERY data
        # file is manifest-accounted: rows=0, ranges unknowable.
        for dirpath, _dirs, files in os.walk(cdir):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, f), cdir)
                if rel not in fstats:
                    fstats[rel] = {c: [None, None] for c in cols}
                    fstats[rel][ROWS_KEY] = 0
        cstats = {}
        dtypes = dict(df.dtypes)
        for c in cols:
            # the date-padding fold key applies only to genuinely
            # temporal columns; a STRING column's date-looking values
            # must fold in raw string order
            tmp = dtypes.get(c, "").startswith(("date", "timestamp"))
            los = [s[c][0] for s in fstats.values() if s[c][0] is not None]
            his = [s[c][1] for s in fstats.values() if s[c][1] is not None]
            if los and his:
                cstats[c] = [min(los, key=lambda v: _prune_key(v, tmp)),
                             max(his, key=lambda v: _prune_key(v, tmp))]
        if cstats:
            # record the writer's dtype per stats column so the scan
            # side can gate date-padding on the COLUMN type, not the
            # probe bound's Python type (see DTYPES_KEY). cols is
            # filtered to df.columns, so dtypes always has an entry —
            # no "" fallback, which _stat_temporal would otherwise
            # have to treat as missing (review r7)
            cstats[DTYPES_KEY] = {c: dtypes[c] for c in cols
                                  if c in cstats}
        # footer-schema fingerprint, so pruned scans group chunks
        # without re-reading parquet footers (see SCHEMA_KEY) —
        # recorded even for stats-less tables
        cstats[SCHEMA_KEY] = self._dir_footer_schema(cdir)
        self._attach_blooms(df, cdir, fstats)
        return cstats, fstats

    def _attach_blooms(self, df: DataFrame, cdir: str,
                       fstats: dict[str, dict]) -> None:
        """Per-file Bloom filters for the opted-in ``bloom_cols``: ONE
        aggregation per column — k double-hashed bit positions per row
        (Kirsch-Mitzenmacher: pos_i = h1 + i*h2 mod m, JVM-side),
        OR-folded into m/64 words per (file, word) — so the driver
        collects <= files x m/64 longs (128 at the 8 KB floor, 32768
        at the 256 KB cap), never values. (A production
        writer computes these in the same pass that writes the file;
        the manifest protocol is what matters.)"""
        import base64
        import struct

        bcols = [c for c in self.bloom_cols if c in df.columns]
        if not bcols:
            return
        # size m from the chunk's largest file (ROWS_KEY is already in
        # fstats): ~10 bits/row -> ~0.1% FP at k=5. One m per chunk so
        # the positions compute in ONE expression over all its files.
        # (At 100 TB these words live in sidecar index files, not the
        # JSON manifest; the skipping protocol is identical.)
        max_rows = max((s.get(ROWS_KEY, 0) for s in fstats.values()),
                       default=0)
        m = _BLOOM_MIN_BITS
        while m < min(_BLOOM_BITS_PER_ROW * max(max_rows, 1),
                      _BLOOM_MAX_BITS):
            m *= 2
        k = _BLOOM_K
        for c in bcols:
            # mod-BEFORE-combine: (h1 + i*h2) mod m == (h1%m + i*(h2%m))
            # mod m, and the reduced operands cannot overflow ANSI longs
            h1 = F.pmod(F.xxhash64(F.col(c)), F.lit(m))
            h2 = F.pmod(F.xxhash64(F.col(c), F.lit(1)), F.lit(m))
            pos = F.explode(F.array(*[
                F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]))
            rows = (df.select(F.input_file_name().alias("_f"),
                              pos.alias("pos"))
                    .select("_f", F.expr("pos div 64").alias("w"),
                            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))")
                            .alias("mask"))
                    .groupBy("_f", "w").agg(F.bit_or("mask").alias("bits"))
                    .collect())
            words: dict[str, list[int]] = {}
            for r in rows:
                fname = os.path.relpath(_local_path(r["_f"]), cdir)
                words.setdefault(fname, [0] * (m // 64))[r["w"]] = r["bits"]
            dtype = dict(df.dtypes)[c]
            for fname, ws in words.items():
                packed = base64.b64encode(
                    struct.pack(f"<{m // 64}q", *ws)).decode("ascii")
                fstats.setdefault(fname, {}).setdefault(
                    BLOOM_KEY, {})[c] = [m, k, dtype, packed]

    def _carry_stats(self, chunks: list[str],
                     man: dict | None = None,
                     key: str = "stats") -> dict:
        tip = (man or self.manifest()).get(key, {})
        return {c: tip[c] for c in chunks if c in tip}

    def _log_io(self):
        """PathIO backend the manifest log publishes through AND reads
        back from (r13: version/manifest/history/vacuum log reads
        routed here too, so a backend that can publish can always
        read its own log) — scheme-dispatched (operators/pathio.py):
        local paths get the os.link create-if-absent protocol; remote
        URIs stage-then-``FileContext.rename`` on rename-capable
        filesystems (HDFS) or ``create(path, overwrite=false)`` (a
        conditional PUT — ``If-None-Match: *``) on object stores that
        support it. Also the test seam: the ``log_io`` constructor
        arg forces a backend (a real HadoopPathIO for the round-trip
        pin, or a mocked conditional-put store to drive the
        optimistic-retry loop through simulated 412 conflicts)."""
        # getattr: driver-side bare handles (CowTable.__new__ in the
        # multiprocess commit tests) skip __init__ — treat as no
        # override rather than require every handle to carry the slot
        override = getattr(self, "_log_io_override", None)
        if override is not None:
            return override
        from .operators.pathio import pathio_for

        return pathio_for(self.spark, self._log_dir())

    def _try_commit(self, v: int, chunks: list[str], op: str,
                    stats: dict | None = None,
                    file_stats: dict | None = None) -> bool:
        """Attempt to publish version ``v`` atomically through PathIO's
        ``publish_if_absent`` — an atomic create-if-absent on
        POSIX/HDFS, a conditional PUT on object stores. False =
        another writer claimed ``v`` first."""
        import time

        doc = {"version": v, "op": op, "chunks": sorted(chunks),
               "n_chunks": len(chunks), "stats": stats or {},
               "file_stats": file_stats or {},
               "stats_cols": self.stats_cols,
               "bloom_cols": self.bloom_cols,
               "constraints": self.constraints,
               "committed_at": time.time()}
        io = self._log_io()
        if io.publish_if_absent(
                io.join(self._log_dir(), _vname(v)),
                json.dumps(doc).encode()):
            return True
        try:
            blocker_ok = self._parseable(v)
        except FileNotFoundError:
            # publish lost the race yet the rival file is already gone
            # (vacuumed, or a simulated race): nothing blocks — retry
            blocker_ok = True
        if not blocker_ok:
            # the blocker exists but is garbage (crashed pre-protocol
            # writer / external corruption): version() skips it for
            # readers, but retrying this publish would loop forever —
            # surface it for operator intervention instead
            raise ConcurrentWriteError(
                f"manifest {_vname(v)} of {self.path} exists but is "
                f"unparseable — a corrupt, uncommitted file is blocking "
                f"version {v}; remove it to unblock writers")
        return False

    def _commit(self, chunks: list[str], op: str,
                stats: dict | None = None,
                file_stats: dict | None = None, *,
                base_version: int) -> int:
        """Snapshot-transaction commit: ``chunks`` was derived from the
        manifest at ``base_version`` (captured when the transaction
        READ the tip, before its Spark rewrite ran), so the only
        version this transaction may publish is ``base_version + 1``.
        If ANY other commit claimed it meanwhile — including commits
        that landed during a minutes-long rewrite job — blindly taking
        the next free number would publish a chunk list that silently
        drops the concurrent commit (lost update). Abort instead
        (Delta's conflicting-transaction semantics); the caller re-runs
        its rewrite against the new tip. ``append`` does NOT come
        through here — an append conflicts with nothing and reconciles
        by re-reading the tip (see :meth:`append`).

        Data chunks are immutable and uniquely named per attempt, so an
        aborted transaction leaks at worst an unreferenced chunk for
        ``vacuum``."""
        v = base_version + 1
        if self._try_commit(v, chunks, op, stats, file_stats):
            return v
        raise ConcurrentWriteError(
            f"version {v} of {self.path} was claimed by another writer; "
            f"re-run this {op} against the new tip")

    # ----------------------------------------------------------- data

    def _write_chunk(self, df: DataFrame, tag: str) -> str:
        """Write one immutable data chunk; returns its table-relative
        name. Chunk names embed (next-version, tag, attempt) so racing
        writers never collide on the data path either."""
        os.makedirs(self.path, exist_ok=True)
        base = self.version() + 1
        n = 0
        while True:
            name = f"d{base:0{_PAD}d}-{tag}" + (f"-{n}" if n else "")
            full = os.path.join(self.path, name)
            try:
                os.mkdir(full)  # atomic claim: exactly one writer wins
            except FileExistsError:
                n += 1
                continue
            # a non-atomic existence check instead of this mkdir lets
            # two racing writers MERGE part-files into one dir and both
            # commit the same chunk name (observed: every appended row
            # multiplied by the writer count). The write into the
            # claimed dir must be APPEND mode: overwrite DELETES the
            # target dir first, destroying the claim for exactly the
            # window the mkdir exists to close. The dir is empty by
            # construction, so append == write-fresh.
            df.write.mode("append").parquet(full)
            return name

    def read(self, version: int | None = None,
             merge_schema: bool = False) -> DataFrame:
        """Snapshot read: exactly the chunks manifest ``version`` lists
        (newest when None) — a reader holding a manifest is isolated
        from every later commit.

        ``merge_schema=True`` unions the chunk schemas by name (Delta's
        schema-evolution read): a column added by a later append comes
        back null-filled for pre-evolution chunks. Off by default —
        schema merging reads every chunk's footer, so fixed-schema
        tables shouldn't pay for it."""
        r = self.spark.read
        if merge_schema:
            r = r.option("mergeSchema", "true")
        return r.parquet(*self.chunk_paths(version))

    def pruned_chunks(self, col: str, lo, hi,
                      version: int | None = None) -> list[str]:
        """Chunks whose manifest [min, max] for ``col`` can intersect
        [lo, hi]. Chunks with no recorded stats are kept (pruning must
        never lose rows). Driver-side, O(#chunks), zero file I/O."""
        man = self.manifest(version)
        stats = man.get("stats", {})
        kept = []
        for c in man["chunks"]:
            s = stats.get(c, {}).get(col)
            if s is None:
                kept.append(c)
                continue
            tmp = self._stat_temporal(stats.get(c, {}), col, lo, hi)
            try:
                if not (_prune_key(lo, tmp) > _prune_key(s[1], tmp)
                        or _prune_key(hi, tmp) < _prune_key(s[0], tmp)):
                    kept.append(c)
            except TypeError:  # incomparable types: never prune blind
                kept.append(c)
        return kept

    @staticmethod
    def _stat_temporal(chunk_stats: dict, col: str, lo, hi) -> bool:
        """Should [lo, hi] vs this chunk's ``col`` range use the
        date-padding comparison? Gate on the column dtype the WRITER
        recorded (per chunk — schema evolution can change it between
        appends); only manifests predating DTYPES_KEY fall back to
        the probe bound's Python type, the old heuristic that
        silently compared a DATE column's stats as raw strings when
        probed with ISO-string bounds (review r7)."""
        dt = chunk_stats.get(DTYPES_KEY, {}).get(col)
        if dt:  # absent OR empty string -> dtype unknown, use heuristic
            return dt.startswith(("date", "timestamp"))
        return _temporal_bound(lo, hi)

    def pruned_files(self, col: str, lo, hi,
                     version: int | None = None) -> list[str]:
        """Two-level data skipping, both levels driver-side with zero
        file I/O: chunk [min, max] first (:meth:`pruned_chunks`), then
        per-file [min, max] inside each surviving chunk. Returns
        absolute paths — individual data files where the manifest
        recorded file stats, the whole chunk dir where it didn't
        (pruning must never lose rows). Empty part files are recorded
        with ``__rows__ = 0`` (so verify() audits their existence) and
        skipped here exactly; a file absent from a pre-zero-recording
        manifest likewise holds zero rows, so skipping it is exact."""
        man = self.manifest(version)
        fstats_all = man.get("file_stats", {})
        cstats_all = man.get("stats", {})
        paths: list[str] = []
        for c in self.pruned_chunks(col, lo, hi, version):
            cdir = os.path.join(self.path, c)
            fstats = fstats_all.get(c)
            if not fstats:
                paths.append(cdir)
                continue
            # files of a chunk share the chunk's written dtype
            tmp = self._stat_temporal(cstats_all.get(c, {}), col, lo, hi)
            for fname in sorted(fstats):
                if fstats[fname].get(ROWS_KEY) == 0:
                    continue  # recorded empty part file: skip exactly
                rng = fstats[fname].get(col)
                keep = True
                if rng is not None and None not in rng:
                    try:
                        keep = not (
                            _prune_key(lo, tmp) > _prune_key(rng[1], tmp)
                            or _prune_key(hi, tmp) < _prune_key(rng[0], tmp))
                    except TypeError:  # incomparable: never prune blind
                        keep = True
                if keep:
                    paths.append(os.path.join(cdir, fname))
        return paths

    def _bloom_positions(self, value, m: int, k: int,
                         dtype: str) -> list[int]:
        """The k bit positions ``value`` sets, computed with the SAME
        xxhash64 the writers used (one 1-row local job — no scan; the
        Python side has no xxhash64 implementation to drift from). The
        literal is CAST to the writer's column dtype first — xxhash64
        hashes by Catalyst type, so an int literal probed against a
        bigint column would hash differently and skip live files. The
        Kirsch-Mitzenmacher combine reduces each hash mod m BEFORE
        combining, exactly as the writer does (ANSI mode forbids the
        overflow-wrapping direct form); Python's % on the pmod-reduced
        non-negative operands matches JVM pmod."""
        lit = F.lit(value).cast(dtype)
        r = self.spark.range(1).select(
            F.xxhash64(lit).alias("h1"),
            F.xxhash64(lit, F.lit(1)).alias("h2")).collect()[0]
        h1, h2 = r.h1 % m, r.h2 % m  # Python %: non-negative, == pmod
        return [(h1 + i * h2) % m for i in range(k)]

    def bloom_pruned_files(self, col: str, value,
                           version: int | None = None) -> list[str]:
        """Files that can contain ``col = value``: [min, max] pruning
        first (free), then each surviving file's Bloom filter — a file
        is skipped when ANY of the k probed bits is clear (a Bloom
        no is definite; a yes is a maybe the residual filter settles).
        Files without a recorded Bloom are kept. Driver-side bit
        tests on manifest bytes; zero file I/O before the survivors."""
        import base64
        import struct

        man = self.manifest(version)
        fstats_all = man.get("file_stats", {})
        # resolve each file path back to its manifest (chunk, fname)
        # entry by chunk-dir prefix — chunk keys may be table-relative
        # OR absolute (shallow clones reference source chunks by
        # absolute path), so a relpath against the table root is wrong
        # for the latter
        cdirs = {c: os.path.join(self.path, c) for c in fstats_all}
        kept = []
        # cache key MUST include the per-file dtype: xxhash64 hashes
        # by Catalyst type, so two chunks whose bloom column evolved
        # int -> bigint need DIFFERENT probe positions — a cache keyed
        # by (m, k) alone would test the second chunk's files with the
        # first chunk's positions and silently prune live files
        pos_cache: dict[tuple[int, int, str], list[int]] = {}
        for path in self.pruned_files(col, value, value, version):
            entry = None
            for c, cdir in cdirs.items():
                if path.startswith(cdir + os.sep):
                    fname = os.path.relpath(path, cdir)
                    entry = fstats_all[c].get(
                        fname.replace(os.sep, "/"),
                        fstats_all[c].get(fname))
                    break
            spec = (entry or {}).get(BLOOM_KEY, {}).get(col)
            if not spec:
                kept.append(path)  # whole-chunk dir or no Bloom: keep
                continue
            m, k, dtype, packed = spec
            ck = (m, k, dtype)
            if ck not in pos_cache:
                pos_cache[ck] = self._bloom_positions(value, m, k, dtype)
            words = struct.unpack(f"<{m // 64}q", base64.b64decode(packed))
            if all(words[p // 64] & (1 << (p % 64))
                   for p in pos_cache[ck]):
                kept.append(path)
        return kept

    @staticmethod
    def _dir_footer_schema(chunk_dir: str) -> str:
        """Footer schema fingerprint of one (immutable) chunk dir: one
        driver-side metadata read of a single file. Files within a
        chunk share a schema (a chunk is one write job's output)."""
        import glob as _glob

        import pyarrow.parquet as pq
        files = sorted(_glob.glob(
            os.path.join(_glob.escape(chunk_dir), "**", "*.parquet"),
            recursive=True))
        return pq.read_schema(files[0]).to_string() if files else ""

    def _footer_schema(self, chunk_dir: str,
                       stats: dict | None = None) -> str:
        """Schema fingerprint of one (immutable) chunk, for grouping
        pruned reads. Resolution order: per-handle cache -> the
        SCHEMA_KEY the writer recorded in the manifest alongside the
        chunk's stats (zero extra I/O — the caller already holds the
        manifest) -> one parquet footer read (manifests predating
        SCHEMA_KEY, or chunks the tip no longer references)."""
        sch = self._chunk_schema_cache.get(chunk_dir)
        if sch is None:
            rel = os.path.relpath(chunk_dir, self.path)
            chunk = rel.split(os.sep)[0]
            if stats is None:
                stats = self.manifest().get("stats", {})
            sch = stats.get(chunk, {}).get(SCHEMA_KEY)
            if sch is None:
                sch = self._dir_footer_schema(chunk_dir)
            self._chunk_schema_cache[chunk_dir] = sch
        return sch

    def _read_pruned(self, paths: list[str],
                     version: int | None = None) -> DataFrame:
        """Read a stats/Bloom-pruned file subset schema-safely. A
        plain multi-path read infers ONE footer's schema, so when
        pruning keeps files spanning a type-evolution boundary (the
        int -> bigint append case) the result is footer-order
        dependent — a parquet conversion error or a silently narrowed
        column — and ``mergeSchema`` cannot reconcile it either
        (42KD9: INT vs BIGINT don't merge). Group paths by their
        chunk's footer schema and union the groups by name instead:
        set-operation type coercion widens INT -> BIGINT and
        ``allowMissingColumns`` null-fills additive evolution. The
        overwhelmingly common single-schema case collapses to the one
        multi-path read — identical plan, zero extra I/O (fingerprints
        come from the manifest the writer recorded; a parquet footer
        is opened only for pre-SCHEMA_KEY manifests)."""
        version = version if version is not None else self.version()
        stats = self.manifest(version).get("stats", {})
        groups: dict[str, list[str]] = {}
        for p in paths:
            cdir = p if os.path.isdir(p) else os.path.dirname(p)
            groups.setdefault(self._footer_schema(cdir, stats), []).append(p)
        reads = [self.spark.read.parquet(*g) for g in groups.values()]
        df = reads[0]
        for r in reads[1:]:
            df = df.unionByName(r, allowMissingColumns=True)
        return df

    def point_scan(self, col: str, value,
                   version: int | None = None) -> DataFrame:
        """Bloom-pruned point lookup: ``col = value`` reading only the
        files whose Bloom filter admits the value — on a
        high-cardinality column scattered across every file, [min,
        max] stats keep everything and this is the level that prunes.
        The equality filter still applies (false positives cost a
        file read, never a wrong row)."""
        kept = self.bloom_pruned_files(col, value, version)
        if not kept:
            return self.read(version).filter(F.lit(False))
        return self._read_pruned(kept, version).filter(F.col(col) == value)

    def scan(self, col: str, lo, hi, version: int | None = None) -> DataFrame:
        """Stats-pruned range scan: ``col BETWEEN lo AND hi`` reading
        ONLY the files the manifest stats admit (chunk level, then file
        level) — at 100 TB the difference between listing/opening every
        file of the table and the handful covering the key range. The
        residual predicate still applies (stats prune files, not rows),
        and Spark pushes it to the parquet row groups of the surviving
        files."""
        kept = self.pruned_files(col, lo, hi, version)
        if not kept:
            return self.read(version).filter(F.lit(False))
        return self._read_pruned(kept, version).filter(
            F.col(col).between(lo, hi))

    def changes(self, v_from: int, v_to: int | None = None) -> DataFrame:
        """Change data feed between two snapshots (Delta CDF's
        snapshot-diff semantics), derived from the MANIFEST diff:
        chunks present only in ``v_to`` hold candidate inserts, chunks
        present only in ``v_from`` hold candidate deletes, and their
        multiset difference (``exceptAll``, so duplicate rows count)
        is the net row-level change — an UPDATE surfaces as the
        delete of the old row plus the insert of the new one.

        Scale shape: only the symmetric-difference chunks are read.
        A copy-on-write MERGE that rewrote 0.1% of the table feeds a
        CDC read of ~0.2% of it; chunks carried by name cancel out at
        the manifest level for free, and rewritten-but-identical rows
        cancel in the exceptAll — never a full-table diff. Returns the
        changed rows with a ``_change_type`` ('insert' | 'delete')
        column.

        Schema evolution: ADDITIVE only, by design. ``append`` never
        rewrites old chunks, so a column can appear but an existing
        column's type never changes between snapshots — the
        mergeSchema read + null-fill below is therefore total. A
        type-changing evolution (unreachable via the public API)
        would need both sides cast to a widened common type first."""
        man_to = self.manifest(v_to)
        man_from = self.manifest(v_from)
        old, new = set(man_from["chunks"]), set(man_to["chunks"])

        def rd(chunks: list[str]) -> DataFrame:
            if not chunks:
                return self.read(v_from).limit(0)
            # mergeSchema: a diff spanning a schema-evolution boundary
            # must surface every column (a plain multi-chunk read can
            # silently drop a column only some chunks carry)
            return (self.spark.read.option("mergeSchema", "true")
                    .parquet(*[os.path.join(self.path, c) for c in chunks]))

        added, removed = rd(sorted(new - old)), rd(sorted(old - new))
        # column-align the two sides before exceptAll (which requires
        # identical width): a column present on one side only — the
        # schema-evolution case — is null-filled on the other, exactly
        # how a mergeSchema read surfaces pre-evolution rows
        a_cols, r_cols = dict(added.dtypes), dict(removed.dtypes)
        all_cols = list(a_cols) + [c for c in r_cols if c not in a_cols]
        added = added.select(*[
            F.col(c) if c in a_cols
            else F.lit(None).cast(r_cols[c]).alias(c) for c in all_cols])
        removed = removed.select(*[
            F.col(c) if c in r_cols
            else F.lit(None).cast(a_cols[c]).alias(c) for c in all_cols])
        return (
            added.exceptAll(removed)
            .withColumn("_change_type", F.lit("insert"))
            .unionByName(
                removed.exceptAll(added)
                .withColumn("_change_type", F.lit("delete")))
        )

    def changes_with_updates(self, key: str | list[str], v_from: int,
                             v_to: int | None = None) -> DataFrame:
        """Delta CDF's full row contract on top of :meth:`changes`:
        rows whose merge ``key`` appears on BOTH sides of the diff are
        paired into ``update_preimage`` (the deleted image) /
        ``update_postimage`` (the inserted one); one-sided rows keep
        ``insert`` / ``delete``. Every row is stamped with
        ``_commit_version`` (the ``v_to`` snapshot that published the
        change) and ``_commit_timestamp`` (its manifest's publish
        time) — the columns a Delta CDF consumer joins on.

        Multiset semantics: if several rows share a key on one side,
        ALL of them classify as update images (pairing is by key, not
        by row) — matching CDF's behavior for multi-row-per-key
        merges. Scale shape: four joins keyed on the DIFF (already
        ~2x the rewritten fraction of the table, never table-sized),
        with the distinct key sides typically broadcastable."""
        import datetime as dt

        v_to = self.version() if v_to is None else v_to
        keys = [key] if isinstance(key, str) else list(key)
        # materialize the diff once: ins/dele each feed two joins plus
        # a distinct-key side, so the lazy changes() subtree (chunk
        # reads + exceptAll shuffle) would otherwise recompute ~6x in
        # one action. The diff is ~2x the rewritten fraction — small
        # relative to the table — so an eager local checkpoint is the
        # right trade at any scale.
        diff = self.changes(v_from, v_to).localCheckpoint(eager=True)
        ins = diff.filter(F.col("_change_type") == "insert") \
                  .drop("_change_type")
        dele = diff.filter(F.col("_change_type") == "delete") \
                   .drop("_change_type")
        ins_keys = ins.select(*keys).distinct()
        del_keys = dele.select(*keys).distinct()
        out = (
            ins.join(del_keys, keys, "left_anti")
            .withColumn("_change_type", F.lit("insert"))
            .unionByName(
                dele.join(ins_keys, keys, "left_anti")
                .withColumn("_change_type", F.lit("delete")))
            .unionByName(
                dele.join(ins_keys, keys, "left_semi")
                .withColumn("_change_type", F.lit("update_preimage")))
            .unionByName(
                ins.join(del_keys, keys, "left_semi")
                .withColumn("_change_type", F.lit("update_postimage")))
        )
        # committed_at is recorded INSIDE the manifest at publish time,
        # so it survives rsync/cp/object-store gateways that rewrite
        # file mtimes; mtime is only the fallback for pre-committed_at
        # manifests. The fallback routes through _log_io like every
        # other log read — os.path.getmtime here would be the one
        # os-routed log access left and would break for pre-
        # committed_at manifests under a non-local log backend.
        man_v_to = self.manifest(v_to)
        epoch = man_v_to.get("committed_at")
        if not epoch:
            io = self._log_io()
            epoch = io.getmtime(io.join(self._log_dir(), _vname(v_to)))
        # naive UTC, because the session timezone is pinned to UTC
        # (engine/session.py): a host-local naive datetime would be
        # reinterpreted as UTC and shift the stamp by the host offset
        publish_ts = dt.datetime.fromtimestamp(
            epoch, dt.timezone.utc).replace(tzinfo=None)
        return (out.withColumn("_commit_version", F.lit(v_to))
                   .withColumn("_commit_timestamp",
                               F.lit(publish_ts).cast("timestamp")))

    @classmethod
    def create(cls, spark: SparkSession, df: DataFrame, path: str,
               stats_cols: list[str] | None = None,
               constraints: dict[str, str] | None = None,
               bloom_cols: list[str] | None = None,
               log_io=None) -> "CowTable":
        tbl = cls(spark, path, stats_cols=stats_cols,
                  constraints=constraints, bloom_cols=bloom_cols,
                  log_io=log_io)
        if tbl.version() >= 0:
            raise FileExistsError(f"table exists at {path}")
        tbl._enforce(df)
        chunk = tbl._write_chunk(df, "create")
        stats, fstats = tbl._new_stats(chunk)
        tbl._commit([chunk], "create", stats=stats, file_stats=fstats,
                    base_version=-1)
        return tbl

    def _new_stats(self, chunk: str,
                   carry_from: list[str] | None = None,
                   man: dict | None = None) -> tuple[dict, dict]:
        """(stats, file_stats) for a commit that adds ``chunk`` and
        carries ``carry_from`` unchanged from manifest ``man``."""
        stats = self._carry_stats(carry_from, man) if carry_from else {}
        fstats = (self._carry_stats(carry_from, man, "file_stats")
                  if carry_from else {})
        cs, fs = self._chunk_stats(chunk)
        if cs:
            stats[chunk] = cs
        if fs:
            fstats[chunk] = fs
        return stats, fstats

    def append(self, df: DataFrame) -> int:
        """Blind append: one new chunk + manifest extending the tip.

        Appends conflict with nothing, so a lost manifest race
        reconciles instead of aborting: re-read the tip IN ONE manifest
        read (version + chunk list must come from the same snapshot or
        a concurrent commit between the two reads is silently dropped)
        and retry with the new chunk list."""
        if self.version() < 0:
            # fail BEFORE writing data: a chunk written first would be
            # orphaned (no manifest ever references it, and vacuum
            # needs a manifest too) and the eventual manifest read
            # would die with a baffling v-1 FileNotFoundError
            raise FileNotFoundError(
                f"no table at {self.path}; use CowTable.create first")
        self._enforce(df)
        chunk = self._write_chunk(df, "append")
        # the new chunk's stats are loop-invariant: one agg job here,
        # never one per lost race
        own_cs, own_fs = self._chunk_stats(chunk)
        while True:
            man = self.manifest()
            v = man["version"] + 1
            stats = self._carry_stats(man["chunks"], man)
            fstats = self._carry_stats(man["chunks"], man, "file_stats")
            if own_cs:
                stats[chunk] = own_cs
            if own_fs:
                fstats[chunk] = own_fs
            if self._try_commit(v, man["chunks"] + [chunk], "append",
                                stats, fstats):
                return v

    # ----------------------------------------- copy-on-write rewrites

    def _touched_chunks(self, flagged: DataFrame, man: dict) -> list[str]:
        """Chunks of snapshot ``man`` that physically contain >=1 row
        of ``flagged`` (a DataFrame carrying ``_file`` =
        ``input_file_name()``). Driver-side result is O(#chunks)."""
        files = [_local_path(r["_file"]) for r in
                 flagged.select("_file").distinct().collect()]
        touched = []
        for c in man["chunks"]:
            prefix = os.path.join(self.path, c) + os.sep
            if any(f.startswith(prefix) for f in files):
                touched.append(c)
        return touched

    def merge(self, updates: DataFrame, key: str | list[str],
              broadcast_keys: bool = True) -> int:
        """File-pruned ACID MERGE (updates win, unmatched base rows
        survive, unmatched updates insert). Only chunks containing a
        matched key are rewritten; the rest carry over by name. The
        whole transaction — touch detection, rewrite, commit — runs
        against ONE manifest read; a commit that lands meanwhile makes
        :meth:`_commit` abort rather than lose it.

        ``broadcast_keys``: the touch-detection semi-join broadcasts
        the distinct update keys — right for the common MERGE whose
        batch is small relative to the table. A backfill-sized batch
        (hundreds of millions of distinct keys) must pass False so
        both the semi-join here and the upsert join inside shuffle
        instead of forcing the key set through the driver."""
        keys = [key] if isinstance(key, str) else list(key)
        self._enforce(updates)  # only the incoming rows re-validate
        man = self.manifest()
        base = (self._read_chunks(man["chunks"])
                .withColumn("_file", F.input_file_name()))
        ukeys = updates.select(*keys).distinct()
        matched = base.join(
            F.broadcast(ukeys) if broadcast_keys else ukeys,
            on=keys, how="left_semi")
        touched = self._touched_chunks(matched, man)
        untouched = [c for c in man["chunks"] if c not in touched]
        to_rewrite = (
            self._read_chunks(touched)
            if touched else base.drop("_file").limit(0)
        )
        merged = merge_upsert(to_rewrite, updates, keys,
                              broadcast_updates=broadcast_keys)
        chunk = self._write_chunk(merged, "merge")
        stats, fstats = self._new_stats(chunk, untouched, man)
        return self._commit(untouched + [chunk], "merge",
                            stats=stats, file_stats=fstats,
                            base_version=man["version"])

    def delete_where(self, cond) -> int:
        """File-pruned ACID DELETE — the transactional form of the
        reference's retention sweep (check_lakehouse retention window;
        pipelines/retention.py restates it non-atomically). Chunks with
        no matching row carry over untouched; matching chunks are
        rewritten without the condemned rows. SQL DELETE semantics:
        only rows where ``cond`` IS TRUE are deleted — a bare
        ``filter(~cond)`` would also drop rows where the predicate
        evaluates to NULL (e.g. a null column), losing rows that no
        DELETE statement would touch."""
        man = self.manifest()
        base = (self._read_chunks(man["chunks"])
                .withColumn("_file", F.input_file_name()))
        touched = self._touched_chunks(base.filter(cond), man)
        untouched = [c for c in man["chunks"] if c not in touched]
        chunks = list(untouched)
        stats = self._carry_stats(untouched, man)
        fstats = self._carry_stats(untouched, man, "file_stats")
        if touched:
            keep = (
                self._read_chunks(touched)
                .filter(cond.isNull() | ~cond)
            )
            chunk = self._write_chunk(keep, "delete")
            chunks.append(chunk)
            own_cs, own_fs = self._chunk_stats(chunk)
            if own_cs:
                stats[chunk] = own_cs
            if own_fs:
                fstats[chunk] = own_fs
        return self._commit(chunks, "delete", stats=stats,
                            file_stats=fstats,
                            base_version=man["version"])

    def compact(self, n_files: int = 1,
                sort_by: list[str] | None = None,
                zorder_by: list[str] | None = None,
                zorder_layout: str = "sampled") -> int:
        """OPTIMIZE analog: rewrite the live snapshot into one chunk of
        ``n_files`` files; readers of older manifests are unaffected.

        With ``sort_by``, files are range-partitioned and sorted on
        those columns — single-dimension clustering: each file covers
        a narrow leading-key range, so parquet row-group min/max stats
        prune leading-key scans to ~1 file, but a predicate on any
        OTHER column prunes nothing.

        With ``zorder_by`` (mutually exclusive), files are clustered
        on a true Z-order key — each column is min/max-normalized to
        16 bits (integer math, deterministic) and the bits interleaved
        — so EVERY listed dimension gets partial locality: a range
        predicate on any one of k columns prunes toward
        files^(1-1/k), the multi-dimensional OPTIMIZE ZORDER
        trade-off. The z-value is computed, clustered on, and dropped
        — never persisted into the data files (Delta's behavior).
        ``zorder_layout`` picks the clustering strategy: "sampled"
        (default — one data scan, driver-side sample supplies rank
        cuts AND file boundaries, see :meth:`_zorder_layout`) or
        "persist" (the r12 approxQuantile + cached-range-partition
        path, kept for A/B reference)."""
        if sort_by and zorder_by:
            raise ValueError("sort_by and zorder_by are mutually exclusive")
        if zorder_layout not in ("sampled", "persist"):
            raise ValueError(f"unknown zorder_layout {zorder_layout!r}")
        man = self.manifest()
        df = self._read_chunks(man["chunks"])
        cached = None
        if sort_by:
            df = (df.repartitionByRange(n_files, *sort_by)
                  .sortWithinPartitions(*sort_by))
        elif zorder_by and zorder_layout == "sampled":
            df = self._zorder_layout(df, n_files, zorder_by, man)
        elif zorder_by:
            from pyspark import StorageLevel

            # The r12 layout, kept for A/B reference (see
            # _zorder_layout for why "sampled" replaced it as the
            # default): evaluate the z expression ONCE per row —
            # without the persist, the range partitioner's sampling
            # job and the sort job each recompute scan + rank tree
            # (VERDICT r11). The sampling job reads every partition,
            # so it populates the cache; the sort then reads cached
            # rows. Scoped strictly to this compact (unpersist in
            # finally). Note: persisting the BASE rows as well (to
            # also dedup the approxQuantile pass's scan) was measured
            # SLOWER at sf0.1 (4.65 s vs 3.34 s min-of-6) — double
            # cache materialization costs more than one columnar
            # re-scan.
            cached = (df.withColumn(
                "__z", self._zorder_value(df, zorder_by))
                .persist(StorageLevel.MEMORY_AND_DISK))
            df = (cached.repartitionByRange(n_files, "__z")
                  .sortWithinPartitions("__z")
                  .drop("__z"))  # projection after sort: order survives
        else:
            df = df.repartition(n_files)
        # publish the write-side plan for the plan report / pins (the
        # committed chunk hides it): the "sampled" z layout must show
        # NO InMemoryRelation — its one-scan guarantee — while the
        # "persist" reference layout shows the cache by design
        from .operators.plancapture import capture_plan
        df = capture_plan("cowtable:compact_write", df)
        try:
            chunk = self._write_chunk(df, "compact")
        finally:
            if cached is not None:
                cached.unpersist()
        stats, fstats = self._new_stats(chunk)
        return self._commit([chunk], "compact",
                            stats=stats, file_stats=fstats,
                            base_version=man["version"])

    _Z_BITS = 16

    def _zorder_value(self, df: DataFrame, cols: list[str]) -> Column:
        """Interleaved-bit Z-value over ``cols`` (numeric or
        timestamp), with each column mapped through its empirical CDF
        first: one ``approxQuantile`` pass yields up to 255 cut points
        per column, and a row's per-column coordinate is its RANK
        BUCKET (count of cuts <= value — a short JVM-side codegen'd
        array fold), not a linearly scaled value.

        Rank, not min/max scaling (r11, found by the relational
        time-edge gate): under raw-range scaling a 2% tail of outlier
        values (year-9999 placeholder dates, epoch-zero sentinels,
        fat-finger amounts) owns virtually the whole scale, the real
        distribution compresses into a few z-cells, and that
        dimension's file pruning silently dies — at 100 TB exactly
        the corpus shape (long-tailed, dirty) z-ordering exists for.
        Rank buckets give every population decile the same share of
        the curve regardless of magnitude — the same reason production
        z-ordering (Delta OPTIMIZE ZORDER) interleaves range-partition
        ids rather than raw values. Skewed/heavy-hitter columns are
        fine too: duplicate cut points collapse (dedup below), a
        heavy value simply spans fewer buckets.

        The rank lookup is a BINARY-SEARCH when-tree (depth 8, pure
        comparisons), not an array fold: the first cut of this change
        used ``F.aggregate`` over a 255-literal array, which allocates
        and folds the array PER ROW — measured 5.75 s vs 0.6 s for the
        tree over sf0.1 orders, which turned a 1.4 s tf_zorder into
        14 s. Since r12 the compact persists the ``__z``-augmented
        rows, so the tree is evaluated exactly once per row (the range
        partitioner's sampling pass populates the cache and the sort
        reads it back).
        Quantile relativeError is 0.01 (±2.5 buckets of 256 — curve
        placement, not a correctness boundary), which halves the
        sketch pass versus 0.001.

        Bit budget: per-column width is ``min(16, 63 // len(cols))``
        capped at the 8 bits a 255-cut CDF can discriminate (the
        interleaved value must fit the 63 non-sign bits of a long —
        Delta's interleaving does the same budget split). 2^8 buckets
        per dimension is orders of magnitude finer than any realistic
        file count, so the cap costs pruning nothing. NULLs fold to
        bucket 0 (they cluster at the curve origin and stay skippable
        for every range predicate, which NULL never satisfies)."""
        k = len(cols)
        bits = min(self._Z_BITS, 63 // k, 8)
        n_cuts = (1 << bits) - 1
        probs = [(j + 1) / (n_cuts + 1) for j in range(n_cuts)]
        # one pass over the projected columns; nulls are ignored by
        # approxQuantile and an all-null column comes back empty
        proj = df.select(*[F.expr(_z_as_long_sql(df, c)).alias(f"__zq_{i}")
                           for i, c in enumerate(cols)])
        quants = proj.stat.approxQuantile(
            [f"__zq_{i}" for i in range(k)], probs, 0.01)
        col_cuts = [sorted({int(q) for q in quants[i]}) if quants[i] else []
                    for i in range(k)]
        return self._z_interleave(df, cols, col_cuts, bits)

    def _z_interleave(self, df: DataFrame, cols: list[str],
                      col_cuts: list[list[int]], bits: int) -> Column:
        """The interleaved-bit z expression over rank buckets given
        the per-column cut points (shared by both layout paths): one
        pre-spread CASE tree per column, OR'd — exactly one tree
        evaluation per column per row, built as a single SQL string
        (see _z_case_sql / _z_as_long_sql for why both properties
        are load-bearing)."""
        k = len(cols)
        terms = []
        for i, c in enumerate(cols):
            cuts = col_cuts[i]
            if not cuts:
                # all-NULL column (or empty table): no discriminating
                # bits to contribute — constant 0, like a constant col
                continue
            leaves = [_z_spread(b, bits, k, i) for b in range(len(cuts) + 1)]
            terms.append(_z_case_sql(_z_as_long_sql(df, c), cuts, leaves,
                                     0, len(cuts)))
        if not terms:
            return F.lit(0).cast("long")
        return F.expr("(" + " | ".join(terms) + ")")

    def _snapshot_rows(self, man: dict) -> int | None:
        """Live row count from the manifest's per-file stats —
        driver-side metadata, no job. None if any file predates the
        ROWS_KEY records (pre-r8 manifests)."""
        total = 0
        for chunk in man["chunks"]:
            fs = man.get("file_stats", {}).get(chunk)
            if not fs:
                return None
            for stats in fs.values():
                n = stats.get(ROWS_KEY)
                if n is None:
                    return None
                total += int(n)
        return total

    _Z_SAMPLE_ROWS = 65_536

    def _zorder_layout(self, df: DataFrame, n_files: int,
                       cols: list[str], man: dict) -> DataFrame:
        """One-scan z-order clustering (r13, VERDICT r12 ask #6): the
        r12 path cost three passes over the snapshot — approxQuantile,
        the range partitioner's sampling job (persisting full-width
        rows to dodge a re-scan), and the cached sort — because
        repartitionByRange must sample ITS key, and the z key was only
        knowable after a quantile pass. This path moves both rank cuts
        AND partition boundaries to one driver-side sample, so the
        full-width data is scanned exactly once, with no persist:

        1. ONE cheap sample job over the projected z columns (seeded,
           ~64k rows; the live row count comes free from the
           manifest's per-file stats, so the fraction needs no count
           job). Exact numpy quantiles of the sample replace
           approxQuantile's full-scan sketch — at 64k rows the
           sampling error (~0.2%) is under the 1/256 bucket width the
           cuts feed.
        2. The sample's own z-values (numpy searchsorted + interleave,
           the same integer math as the column expression) yield an
           equal-FREQUENCY assignment of 256 equal-width z CELLS to
           files — the range split repartitionByRange would have
           sampled a full pass for. Cells (top-8 z bits) rather than
           exact boundaries because the file lookup must reference
           __z exactly ONCE: a binary-search when-tree over z
           boundaries inlines the whole rank tree at every comparison
           under CollapseProject (measured: a 300 KB optimized plan
           and a 2.6x SLOWDOWN vs the persist path), while
           shiftright + element_at into a constant-folded 256-int
           array is one reference and O(1) per row.
        3. The write pass computes __z once per row, reads its file
           token from the cell array, and routes through
           repartition(n_files, token) where the TOKENS are
           driver-chosen ints with pmod(murmur3(t), n_files) == file
           id (_hash_bucket_tokens) — hash partitioning with
           collision-free placement, i.e. range partitioning without
           the sampling job. sortWithinPartitions("__z") then orders
           each file. (Contiguous cell ranges per file keep every
           file a narrow z interval even when the z-ordered columns
           are correlated and mass concentrates in few cells.)

        Same layout contract as the r12 path (each file covers one
        narrow z range; every z-ordered dimension prunes), measured
        A/B in bench/ZORDER_AB_r13.json. At 100 TB the win compounds:
        the deleted passes were FULL-WIDTH scans (one of them a
        cluster-memory persist), while the surviving extra job reads
        only the z columns at sample fraction."""
        import numpy as np

        k = len(cols)
        bits = min(self._Z_BITS, 63 // k, 8)
        n_cuts = (1 << bits) - 1
        proj = df.select(*[F.expr(_z_as_long_sql(df, c)).alias(f"__zq_{i}")
                           for i, c in enumerate(cols)])
        n_rows = self._snapshot_rows(man)
        if n_rows is None:
            n_rows = proj.count()  # pre-ROWS_KEY manifests only
        if n_rows > self._Z_SAMPLE_ROWS:
            # 1.3x oversample so the realized sample stays near target
            frac = min(1.0, 1.3 * self._Z_SAMPLE_ROWS / n_rows)
            proj = proj.sample(False, frac, seed=42)
        pdf = proj.toPandas()

        probs = [(j + 1) / (n_cuts + 1) for j in range(n_cuts)]
        col_cuts: list[list[int]] = []
        sample_z = np.zeros(len(pdf), dtype=np.int64)
        for i in range(k):
            vals = pdf[f"__zq_{i}"].dropna().to_numpy(dtype=np.int64)
            if vals.size == 0:
                col_cuts.append([])
                continue
            cuts = sorted({int(q) for q in
                           np.quantile(vals, probs, method="lower")})
            col_cuts.append(cuts)
            # the sample's z coordinates, same integer math as the
            # column expression (searchsorted 'right' == count of
            # cuts <= x; NULL -> bucket 0, the curve origin)
            filled = pdf[f"__zq_{i}"].fillna(0).to_numpy(dtype=np.int64)
            bucket = np.searchsorted(cuts, filled, side="right")
            bucket[pdf[f"__zq_{i}"].isna().to_numpy()] = 0
            for b in range(bits):
                sample_z |= ((bucket >> b) & 1) << (b * k + i)

        z = self._z_interleave(df, cols, col_cuts, bits)
        z_bits = bits * k
        cell_bits = min(8, z_bits)
        n_cells = 1 << cell_bits
        # equal-frequency assignment of contiguous cell ranges to
        # files, from the sample's cell histogram (cumulative greedy:
        # file j takes cells until its share of sampled rows fills)
        cell_file = [0] * n_cells
        if len(pdf) and n_files > 1:
            hist = np.bincount(sample_z >> (z_bits - cell_bits),
                               minlength=n_cells)
            cum = np.cumsum(hist)
            total = int(cum[-1]) or 1
            for c in range(n_cells):
                f_id = min(n_files - 1, int(cum[c] * n_files // total)
                           if cum[c] else 0)
                cell_file[c] = f_id
        tokens = _hash_bucket_tokens(n_files)
        cell_tok = F.array(*[F.lit(tokens[cell_file[c]])
                             for c in range(n_cells)])  # constant-folded
        cell = F.shiftright(F.col("__z"), z_bits - cell_bits).cast("int")
        return (df.withColumn("__z", z)
                .withColumn("__zt", F.element_at(cell_tok, cell + F.lit(1)))
                .repartition(n_files, "__zt")
                .sortWithinPartitions("__z")
                .drop("__z", "__zt"))

    def restore(self, version: int) -> int:
        """RESTORE TABLE ... TO VERSION (Delta's RESTORE): publish a
        NEW commit whose chunk list is exactly snapshot ``version``'s.
        History is preserved — time travel still reaches every
        intermediate version — and the operation is pure metadata:
        chunks are re-referenced by name, zero data I/O at any scale.
        Stats/file-stats are carried from the restored manifest, so
        data skipping keeps working on the restored tip. Goes through
        the snapshot-transaction commit: a concurrent writer claiming
        the next version aborts the restore, never silently drops it."""
        base = self.version()
        man = self.manifest(version)
        return self._commit(list(man["chunks"]), "restore",
                            stats=dict(man.get("stats", {})),
                            file_stats=dict(man.get("file_stats", {})),
                            base_version=base)

    def clone(self, dest: str, version: int | None = None) -> "CowTable":
        """Shallow zero-copy clone (Delta SHALLOW CLONE): the clone's
        v0 manifest references the source snapshot's chunks by
        ABSOLUTE path — no data file is copied, so cloning a 100-TB
        table is a metadata write. ``chunk_paths``/``read``/``scan``
        handle absolute refs transparently (``os.path.join`` passes
        them through), writes to the clone land new chunks under the
        clone's own root, and the clone's :meth:`vacuum` only reclaims
        dirs under its root — source-owned chunks are never deleted.
        The source table is never mutated by clone-side operations."""
        man = self.manifest(version)
        out = CowTable(self.spark, dest,
                       stats_cols=man.get("stats_cols", []),
                       bloom_cols=man.get("bloom_cols", []))
        if out.version() >= 0:
            raise ValueError(f"clone destination {dest} already exists")
        out._constraints_arg = dict(man.get("constraints", {}))
        ab = {c: os.path.join(self.path, c) for c in man["chunks"]}
        stats = {ab[c]: s for c, s in man.get("stats", {}).items()
                 if c in ab}
        fstats = {ab[c]: s for c, s in man.get("file_stats", {}).items()
                  if c in ab}
        if not out._try_commit(0, list(ab.values()), "clone",
                               stats, fstats):
            raise ConcurrentWriteError(
                f"clone destination {dest} was created concurrently")
        return out

    def to_delta_manifest(self) -> str:
        """Export this table's log as a Delta Lake ``_delta_log`` —
        the documented interop path while the sandbox ships no Delta
        jars (``engine.session.delta_available`` probes; a real
        cluster reads the result as a native Delta table).

        The two commit protocols are isomorphic for this table's
        operation set: a CowTable manifest is a full chunk list per
        version, a Delta version is a diff of ``add``/``remove`` file
        actions — so each retained manifest converts exactly into the
        file-set delta against its predecessor (public protocol:
        delta.io PROTOCOL.md; no Delta code involved). Retained
        manifests are renumbered 0..k — pre-vacuum-horizon history is
        unreadable either way, and Delta requires version 0 to open a
        log without a checkpoint. Per-file [min, max] stats from the
        manifest become Delta per-add ``stats`` (numRecords from the
        parquet footer, a metadata-only read), so Delta data skipping
        sees the same pruning bounds :meth:`scan` uses. ``metaData``
        is re-emitted whenever the snapshot schema changes (additive
        evolution, see :meth:`changes`)."""
        import time

        import pyarrow.parquet as pq_meta

        log_dir = os.path.join(self.path, "_delta_log")
        os.makedirs(log_dir, exist_ok=True)
        # a re-export after VACUUM emits FEWER versions than before
        # (renumbered from the new horizon); stale higher-numbered
        # files from the previous export would replay on top of the
        # fresh log and point readers at vacuumed data — clear first
        for stale in os.listdir(log_dir):
            if stale.endswith(".json"):
                os.unlink(os.path.join(log_dir, stale))
        now_ms = int(time.time() * 1000)

        # chunks are immutable after commit: walk each chunk dir ONCE
        # across the whole history (snapshots share most chunks; a
        # per-manifest walk would re-open every footer O(V) times)
        chunk_files: dict[str, dict[str, tuple]] = {}

        def _files_of(chunk: str) -> dict[str, tuple]:
            if chunk in chunk_files:
                return chunk_files[chunk]
            out: dict[str, tuple] = {}
            cdir = os.path.join(self.path, chunk)
            for root, _, fnames in os.walk(cdir):
                for fn in fnames:
                    if not fn.endswith(".parquet"):
                        continue
                    full = os.path.join(root, fn)
                    n_rows = pq_meta.ParquetFile(full).metadata.num_rows
                    if n_rows == 0:
                        continue  # Spark's empty part files: no-op adds
                    st = os.stat(full)
                    # chunks under the table root export as relative
                    # paths; a shallow clone's source-owned chunks live
                    # OUTSIDE the root, and a '../'-relative path would
                    # break as soon as the clone directory moves — the
                    # Delta protocol allows absolute URIs for exactly
                    # this (its own shallow clones use them)
                    inside = (os.path.commonpath([full, self.path])
                              == self.path)
                    key = (os.path.relpath(full, self.path) if inside
                           else "file://" + full)
                    out[key] = (
                        chunk, os.path.relpath(full, cdir),
                        st.st_size, int(st.st_mtime * 1000), n_rows)
            chunk_files[chunk] = out
            return out

        prev_files: dict[str, tuple] = {}
        prev_schema: str | None = None
        # schema per CHUNK-SET, not per version: a mergeSchema read
        # sweeps every file's footer, and retained versions mostly
        # share chunks (restore/clone/compact re-reference them) — an
        # uncached loop pays O(versions x files) footer I/O for
        # schemas that can only change when the chunk set does
        schema_cache: dict[frozenset, str] = {}
        for i, man in enumerate(self.history()):
            files: dict[str, tuple] = {}
            for chunk in man["chunks"]:
                files.update(_files_of(chunk))
            actions: list[dict] = []
            if i == 0:
                actions.append({"protocol": {"minReaderVersion": 1,
                                             "minWriterVersion": 2}})
            cset = frozenset(man["chunks"])
            schema = schema_cache.get(cset)
            if schema is None:
                schema = self.read(man["version"],
                                   merge_schema=True).schema.json()
                schema_cache[cset] = schema
            if schema != prev_schema:
                actions.append({"metaData": {
                    "id": f"cowtable-{os.path.basename(self.path)}",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema,
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": now_ms,
                }})
            for rel in sorted(set(files) - set(prev_files)):
                chunk, chunk_rel, size, mtime, n_rows = files[rel]
                add = {"path": rel.replace(os.sep, "/"),
                       "partitionValues": {}, "size": size,
                       "modificationTime": mtime, "dataChange": True}
                fstats = man.get("file_stats", {}).get(chunk, {}) \
                            .get(chunk_rel.replace(os.sep, "/"),
                                 man.get("file_stats", {}).get(chunk, {})
                                    .get(chunk_rel))
                stats = {"numRecords": n_rows}
                ranges = {c: v for c, v in (fstats or {}).items()
                          if c not in _RESERVED_STAT_KEYS}
                if ranges:
                    stats["minValues"] = {c: v[0] for c, v in ranges.items()}
                    stats["maxValues"] = {c: v[1] for c, v in ranges.items()}
                add["stats"] = json.dumps(stats)
                actions.append({"add": add})
            for rel in sorted(set(prev_files) - set(files)):
                actions.append({"remove": {
                    "path": rel.replace(os.sep, "/"),
                    "deletionTimestamp": now_ms, "dataChange": True}})
            with open(os.path.join(log_dir, f"{i:020d}.json"), "w") as fh:
                fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
            prev_files, prev_schema = files, schema
        return log_dir

    def vacuum(self, retain_versions: int = 1,
               grace_s: float = 600.0) -> tuple[int, int]:
        """Delete data chunks referenced by NO retained snapshot (the
        newest ``retain_versions`` manifests survive; older manifests
        are dropped — time travel ends at the retention horizon, like
        Delta's VACUUM). Returns (live_chunks, removed_chunks).

        ``grace_s``: chunks younger than this are NEVER reclaimed even
        if unreferenced — an in-flight writer has written its chunk but
        not yet published the manifest, and deleting it would make that
        commit reference missing data. This is Delta's retention-age
        check; tests pass 0 to exercise full reclamation."""
        import time

        tip = self.version()
        keep_versions = range(max(0, tip - retain_versions + 1), tip + 1)
        live: set[str] = set()
        for v in keep_versions:
            try:
                live.update(self.manifest(v)["chunks"])
            except FileNotFoundError:
                # a PREVIOUS, more aggressive vacuum already dropped
                # this manifest (e.g. retain=1 then retain=3 before
                # the tip advanced) — nothing to keep alive from it,
                # same tolerance history() applies
                continue
        io = self._log_io()
        now = time.time()
        removed = 0
        for entry in io.listdir(self.path):
            if entry == _LOG or entry in live:
                continue
            full = io.join(self.path, entry)
            if not (entry.startswith("d") and io.isdir(full)):
                continue
            try:
                if now - io.getmtime(full) < grace_s:
                    continue  # possibly an uncommitted in-flight chunk
            except FileNotFoundError:
                continue
            io.rmtree(full)
            removed += 1
        for v in range(0, max(0, tip - retain_versions + 1)):
            # both backends' unlink tolerates already-gone files
            io.unlink(io.join(self._log_dir(), _vname(v)))
        return len(live), removed

    def verify(self, deep: bool = True,
               version: int | None = None) -> dict:
        """Integrity audit of a snapshot against its manifest — the
        fsck a lakehouse runs after a storage incident or before
        promoting a clone. Two levels:

        - existence (always): every manifest-listed chunk dir and
          every file with recorded stats is present on storage.
          Driver-side listing, O(#files) metadata.
        - ``deep``: re-count rows of every present file carrying a
          recorded ``__rows__`` and compare. ONE Spark job for the
          whole table (read all audited files, group by
          ``input_file_name``) — never a job per file.

        Returns ``{"ok", "missing", "mismatched", "files_checked"}``;
        ``missing``/``mismatched`` list offending paths. Files written
        before row counts were recorded are existence-checked only."""
        man = self.manifest(version)
        missing: list[str] = []
        expected: dict[str, int] = {}
        for c in man["chunks"]:
            cdir = os.path.join(self.path, c)
            if not os.path.isdir(cdir):
                missing.append(c)
                continue
            for fname, st in man.get("file_stats", {}).get(c, {}).items():
                fp = os.path.join(cdir, fname)
                if not os.path.exists(fp):
                    missing.append(fp)
                    continue
                if isinstance(st, dict) and ROWS_KEY in st:
                    expected[fp] = int(st[ROWS_KEY])
        mismatched: list[str] = []
        if deep and expected:
            def counts_of(paths: list[str]) -> dict[str, int]:
                return {
                    _local_path(r["_f"]): r["n"]
                    for r in (self.spark.read.parquet(*paths)
                              .withColumn("_f", F.input_file_name())
                              .groupBy("_f")
                              .agg(F.count(F.lit(1)).alias("n")).collect())
                }

            try:
                counted = counts_of(sorted(expected))
            except Exception:
                # a file so damaged it aborts the batch read (checksum
                # failure, truncated footer) IS the corruption this
                # audit exists to find — isolate it per file; the
                # per-file fallback runs only on the corruption path
                counted = {}
                for fp in sorted(expected):
                    try:
                        counted.update(counts_of([fp]))
                    except Exception:
                        counted[fp] = -1  # unreadable: never matches
            for fp, want in expected.items():
                if counted.get(fp, 0) != want:
                    mismatched.append(fp)
        return {"ok": not missing and not mismatched,
                "missing": sorted(missing),
                "mismatched": sorted(mismatched),
                "files_checked": len(expected) if deep else 0}
