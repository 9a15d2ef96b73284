"""LakeTable — a minimal write-once versioned-Parquet lakehouse table.

This environment ships no Delta/Iceberg jars, so the silver layer is backed
by this self-contained format with the same operational properties the
strategies need:

  <root>/
    _manifest/v00000.json ...   (one JSON per committed version; latest wins)
    data/v00000/ ...            (immutable parquet segments, optionally
                                 hive-partitioned via partitionBy)

A manifest lists *segments*; each segment owns either the whole table
(unpartitioned) or an explicit set of partition values. Reads union the
segments, filtering each to the partitions it still owns — the same
file-provenance idea Delta's log encodes, at partition granularity.

Why this scales:
* Writes are never in-place: a merge writes ONLY the touched partitions
  into a fresh segment directory and flips the manifest — identical I/O
  shape to Delta's copy-on-write MERGE, and crash-safe via
  write-temp-then-rename of the manifest file.
* Reads prune: the per-segment partition filter is an ordinary predicate
  on hive partition directories, so Spark's partition discovery skips
  non-owned directories entirely (no data I/O).
* Dynamic partition overwrite (Full loads) replaces ownership of exactly
  the partitions present in the incoming slice (Full.scala:38-50 parity).
* Old versions remain readable (time travel) until `vacuum()`.

Single-writer assumption (same as the reference's per-entity Processing
run); concurrent writers would need a lock/CAS on the manifest commit,
which object stores provide via conditional puts.
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

import logging

from datalakefoundation_spark.core.exceptions import ConcurrentCommitException
from datalakefoundation_spark.tables.fs import fs_for_path

logger = logging.getLogger(__name__)


@dataclass
class Segment:
    dir: str
    # None => owns the whole (unpartitioned) table.
    # Otherwise: list of partition-value dicts {col: string_value}.
    partitions: list[dict[str, str]] | None = None
    # Per-column min/max recorded at write time (the Delta file-statistics
    # analog at segment granularity): {col: {"min": v, "max": v, "t": kind}}
    # where kind is "num" (compare as float) or "str" (ISO timestamps/dates/
    # strings — lexicographic compare is order-correct for the fixed-width
    # ISO encodings the engine writes). A column entry with min=max=None
    # means the column was recorded and is all-NULL in the segment (no row
    # can satisfy a range predicate on it). None/missing => unknown, never
    # prunable. Collected via df.observe DURING the write action — zero
    # extra scan.
    stats: dict[str, dict] | None = None
    # Rows written into the segment (same free observe); None on segments
    # written before row counting existed or via driver-side arrow appends.
    rows: int | None = None
    # Per-FILE min/max stats: {relative_file_path: {col: {...same encoding
    # as `stats`...}}}. Finer-grained than the segment-level `stats` — lets
    # a windowed read prune individual files inside a surviving segment
    # (the full Delta file-skipping analog; `stats` alone skips only whole
    # segments). None => unknown, read every file.
    files: dict[str, dict] | None = None
    # True iff the recorded `partitions` ownership still covers every
    # hive dir physically inside this segment's directory (set at write
    # time, flipped to False forever once replace_partitions shrinks the
    # segment's ownership). Ownership-full segments can be read WITHOUT a
    # per-segment ownership filter — the batched multi-dir read path
    # depends on this. Old manifests deserialize as False (conservative:
    # per-segment read with dir-pruned ownership filters).
    owns_all: bool = True
    # Deletion-vector refs (merge-on-read): entries {"dir": <data-relative
    # dir of key parquet>, "keys": [col, ...], "flag": <bool col or None>}.
    # A read of THIS segment anti-joins each entry's key projection
    # (rows where `flag` is true, when set) — masking row versions
    # superseded or hard-deleted by a later commit without rewriting this
    # segment (the Delta deletion-vector / Iceberg merge-on-read idea at
    # key granularity). Attached only to segments that existed BEFORE the
    # masking commit, so re-inserted keys in later segments resurface.
    dv: list[dict] = field(default_factory=list)


@dataclass
class Manifest:
    version: int
    partition_by: list[str] = field(default_factory=list)
    segments: list[Segment] = field(default_factory=list)
    operation: str = ""
    timestamp: float = 0.0
    metrics: dict = field(default_factory=dict)
    # {"pk": <col>, "n": <buckets>} when the table is PK-hash bucketed.
    # Persisted so every writer uses the layout the table was created with —
    # a config that drifts from the stored modulus would prune to the wrong
    # bucket dirs and silently lose/duplicate rows.
    bucketing: dict | None = None

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "partition_by": self.partition_by,
                "segments": [
                    {
                        "dir": s.dir,
                        "partitions": s.partitions,
                        "stats": s.stats,
                        "rows": s.rows,
                        "files": s.files,
                        "dv": s.dv,
                        "owns_all": s.owns_all,
                    }
                    for s in self.segments
                ],
                "operation": self.operation,
                "timestamp": self.timestamp,
                "metrics": self.metrics,
                "bucketing": self.bucketing,
            },
            indent=1,
        )

    @classmethod
    def from_json(cls, text: str) -> "Manifest":
        obj = json.loads(text)
        return cls(
            version=obj["version"],
            partition_by=list(obj.get("partition_by", [])),
            segments=[
                Segment(
                    dir=s["dir"],
                    partitions=s.get("partitions"),
                    stats=s.get("stats"),
                    rows=s.get("rows"),
                    files=s.get("files"),
                    dv=list(s.get("dv") or []),
                    owns_all=bool(s.get("owns_all", False)),
                )
                for s in obj.get("segments", [])
            ],
            operation=obj.get("operation", ""),
            timestamp=obj.get("timestamp", 0.0),
            metrics=obj.get("metrics", {}),
            bucketing=obj.get("bucketing"),
        )


def _pv_key(pv: dict[str, str]) -> tuple:
    return tuple(sorted(pv.items()))


# Implicit partition column for PK-hash bucketing of otherwise-unpartitioned
# tables. The PK is a sha256 hex string, so its first 4 hex chars are uniform
# over [0, 65536) and `conv(substr(pk,1,4),16,10) % n` gives evenly-filled
# buckets with zero skew by construction.
BUCKET_COL = "__dlf_bucket"

# Internal marker column persisted in merge-on-read patch segments: true on
# rows whose key should mask the superseded version in older segments (see
# Segment.dv / LakeTable.merge_patch). Dropped from every read, like the
# bucket column.
MASK_COL = "__dlf_mask"

# Commit version a deletion-vector key was created at (persisted into
# coalesced dv dirs; derived from the dir name otherwise) and the segment
# version attached to rows during the global mask join. Internal.
DV_V_COL = "__dlf_dv_v"
SEG_V_COL = "__dlf_seg_v"

_DIR_V_RE = None


def _dir_version(rel_dir: str) -> int | None:
    """Commit version encoded in a data dir name (data/vNNNNN[-suffix])."""
    global _DIR_V_RE
    if _DIR_V_RE is None:
        import re

        _DIR_V_RE = re.compile(r"^data/v(\d{5})")
    m = _DIR_V_RE.match(rel_dir)
    return int(m.group(1)) if m else None


def bucket_expr(pk_col: str, n_buckets: int) -> Column:
    return F.pmod(F.conv(F.substring(F.col(pk_col), 1, 4), 16, 10).cast("int"), F.lit(n_buckets))


def zorder_numeric(col: Column, dtype: str) -> Column:
    """Monotone DOUBLE normalization of an orderable column for z-order
    bucketing. DATE cannot cast to DOUBLE directly (AnalysisException) and
    TIMESTAMP_NTZ's double cast is version-sensitive, so temporal types
    go through their integral epoch forms; only monotonicity matters."""
    if dtype == "date":
        return F.unix_date(col).cast("double")
    if dtype == "timestamp":
        return F.unix_micros(col).cast("double")
    if dtype == "timestamp_ntz":
        return F.unix_micros(col.cast("timestamp")).cast("double")
    if dtype == "boolean":
        return col.cast("int").cast("double")
    return col.cast("double")


def zorder_column(
    cols: Sequence[str],
    bounds: dict[str, tuple[float, float]],
    bits: int = 16,
    dtypes: dict[str, str] | None = None,
) -> Column:
    """Interleaved-bit (Morton / Z-order) clustering key over numeric or
    temporal columns. Each column is normalized to ``2**bits`` equal-width
    buckets between its observed min/max, then bucket bits are interleaved
    (bit ``j`` of column ``i`` lands at position ``j*n_cols + i``), so
    sorting on the key gives every column locality simultaneously — the
    property that makes per-file min/max stats selective on ALL clustered
    dimensions, where a lexicographic sort helps only the leading one.
    NULLs and values outside the observed bounds clamp to the edge buckets.
    Pure codegen'd bit arithmetic — no UDF, no shuffle of its own.

    ``bits`` is capped so the interleaved key fits in 63 bits: bit 63 is
    the long sign bit (setting it would sort high buckets FIRST), and Java
    shift amounts wrap mod 64, so an uncapped 5-column x 16-bit key would
    silently alias unrelated columns onto the same positions."""
    n = len(cols)
    if n < 1:
        raise ValueError("zorder needs at least one column")
    bits = min(int(bits), 63 // n)
    if bits < 1:
        raise ValueError(f"zorder cannot interleave {n} columns in 63 bits")
    buckets = 1 << bits
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        lo, hi = bounds[c]
        if not (hi > lo):  # constant or all-NULL column: every row bucket 0
            hi = lo + 1.0
        norm = zorder_numeric(F.col(c), (dtypes or {}).get(c, ""))
        v = F.width_bucket(
            norm, F.lit(float(lo)), F.lit(float(hi)), F.lit(buckets)
        ) - 1
        v = F.coalesce(v, F.lit(0))
        v = F.least(F.greatest(v, F.lit(0)), F.lit(buckets - 1)).cast("long")
        for bit in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(v, bit).bitwiseAND(F.lit(1)), bit * n + ci)
            )
    return z


# ------------------------------------------------------------ segment stats
def _encode_stat(v):
    """JSON-encode one observed min/max value -> (value, kind). kind "num"
    compares as float; "str" compares lexicographically — order-correct for
    the fixed-width ISO encodings str(datetime)/str(date) produce, and for
    string columns it matches Spark's UTF8 binary comparison (UTF-8 byte
    order preserves code-point order)."""
    import datetime as dt
    import decimal

    if v is None:
        return None, None
    if isinstance(v, bool):
        return int(v), "num"
    if isinstance(v, (int, float)):
        return v, "num"
    if isinstance(v, decimal.Decimal):
        return float(v), "num"
    if isinstance(v, (dt.datetime, dt.date)):
        return str(v), "str"
    return str(v), "str"


def _cond_may_match(stats: dict | None, col: str, lo, hi) -> bool:
    """Can any row of a segment with ``stats`` satisfy lo <= col <= hi?
    Missing stats/column -> unknown -> True (never prune blind). A recorded
    all-NULL column (min=max=None) satisfies no range predicate -> False."""
    if not stats or col not in stats:
        return True
    e = stats[col]
    mn, mx = e.get("min"), e.get("max")
    if mn is None and mx is None:
        return False
    try:
        if e.get("t") == "num":
            mn, mx = float(mn), float(mx)
            lo = None if lo is None else float(lo)
            hi = None if hi is None else float(hi)
        else:
            mn, mx = str(mn), str(mx)
            lo = None if lo is None else str(lo)
            hi = None if hi is None else str(hi)
            # Datetime-looking values compare as parsed datetimes so mixed
            # ISO separators ('T' vs ' ') can't mis-order; non-datetime
            # strings fall back to lexicographic (= Spark's UTF8 order).
            parsed = [_try_iso(v) for v in (mn, mx, lo, hi)]
            if all(p is not None for v, p in zip((mn, mx, lo, hi), parsed) if v is not None):
                mn, mx, lo, hi = parsed
        if lo is not None and mx < lo:
            return False
        if hi is not None and mn > hi:
            return False
    except (TypeError, ValueError):
        return True  # uncomparable bound -> unknown, conservative
    return True


def _try_iso(v):
    """datetime.fromisoformat if v parses as an ISO date/datetime, else None."""
    import datetime as dt

    if v is None:
        return None
    try:
        return dt.datetime.fromisoformat(v)
    except (TypeError, ValueError):
        return None


def prune_spec_for(predicates) -> list:
    """Interval prune-spec for ``LakeTable.read(prune_spec=...)`` from
    simple comparison predicates — the user-facing door to segment/file
    data skipping for ad-hoc range queries (the watermark window builder
    covers only delete-inference reads).

    ``predicates``: iterable of ``(column, op, value)`` with op one of
    >=, >, <=, <, ==, = or ``(column, "between", (lo, hi))``. Each
    predicate becomes its own AND group, so the spec means their
    conjunction. Strict bounds are widened to inclusive (conservative —
    pruning may read one boundary row extra, never drops a match).
    Values are encoded exactly like the recorded stats (datetimes/dates
    to ISO strings), so comparisons agree with the write-time encoding.
    The caller still applies the row-level filter; the spec only skips
    provably-disjoint storage."""
    spec: list[list[tuple]] = []
    for col, op, val in predicates:
        if op == "between":
            lo, hi = val
            lo, _ = _encode_stat(lo)
            hi, _ = _encode_stat(hi)
            spec.append([("and", col, lo, hi)])
            continue
        v, _ = _encode_stat(val)
        if op in (">=", ">"):
            spec.append([("and", col, v, None)])
        elif op in ("<=", "<"):
            spec.append([("and", col, None, v)])
        elif op in ("==", "="):
            spec.append([("and", col, v, v)])
        else:
            raise ValueError(f"prune_spec_for: unsupported op {op!r} for {col}")
    return spec


def _in_may_match(stats: dict | None, col: str, values) -> bool:
    """Can any row of a segment with ``stats`` have col IN values?
    ``values`` is a SORTED tuple encoded like the recorded stats
    (prune_spec_isin). Bisect instead of per-value interval checks: the
    point-membership spec exists for joins against thousands of collected
    keys (the banded dedup index), where an OR-group of point intervals
    would cost O(files x keys) driver time."""
    import bisect

    if not stats or col not in stats:
        return True
    e = stats[col]
    mn, mx = e.get("min"), e.get("max")
    if mn is None and mx is None:
        return False  # recorded all-NULL: equals nothing
    try:
        # convert only the two BOUNDS to the values' type — converting the
        # value list per file would cost O(files x values) over a whole
        # read (measured 131 s for 190k keys x 8k files before this)
        if e.get("t") == "num":
            mn, mx = float(mn), float(mx)
        else:
            mn, mx = str(mn), str(mx)
        i = bisect.bisect_left(values, mn)
        return i < len(values) and values[i] <= mx
    except (TypeError, ValueError):
        return True  # uncomparable -> unknown, conservative


def prune_spec_isin(col: str, values) -> list:
    """Point-membership prune spec: skip storage whose [min, max] range
    provably contains NONE of ``values`` — the data-skipping door for
    "join against these collected keys" reads (e.g. the frontier band
    keys against a band-key-clustered signature index). Values are
    encoded like the recorded stats and sorted once; evaluation is a
    bisect per segment/file. The caller still applies the real join/IN
    row-level — the spec only skips provably-disjoint storage."""
    enc = sorted({_encode_stat(v)[0] for v in values})
    return [[("in", col, tuple(enc))]]


def segment_may_match(stats: dict | None, spec) -> bool:
    """Conservative interval evaluation of a window ``spec`` (see
    watermark.build_window_spec: groups AND together; inside a group each
    condition folds with its own and/or) against a segment's recorded
    stats. True = the segment MIGHT hold a matching row; False = provably
    none does (safe to skip the segment entirely). Over-approximates by
    construction: may(A AND B) <= may(A) AND may(B), may(A OR B) ==
    may(A) OR may(B). A 3-tuple ``("in", col, sorted_values)`` condition
    (prune_spec_isin) is point membership, folded like an "and"."""
    if not spec:
        return True
    for group in spec:
        g_may: bool | None = None
        for cond in group:
            if cond[0] == "in":
                _, col, values = cond
                may = _in_may_match(stats, col, values)
                op = "and"
            else:
                op, col, lo, hi = cond
                may = _cond_may_match(stats, col, lo, hi)
            if g_may is None:
                g_may = may
            elif op == "or":
                g_may = g_may or may
            else:
                g_may = g_may and may
        if g_may is False:
            return False
    return True


class LakeTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        partition_by: Sequence[str] = (),
        bucket_pk: str | None = None,
        n_buckets: int = 32,
        warn_on_layout_mismatch: bool = True,
        stats_columns: Sequence[str] = (),
    ) -> None:
        """``bucket_pk`` (only honored when ``partition_by`` is empty) stores
        the table hive-partitioned by a PK-hash bucket so incremental merges
        rewrite only the buckets a slice touches instead of the whole table —
        segment-level copy-on-write, the unpartitioned analog of Delta MERGE
        rewriting only files containing matches (Merge.scala:96-125). The
        bucket column is internal: writes derive it, reads drop it.

        If the table already exists with a recorded bucketing layout, that
        layout WINS over the constructor arguments (with a warning on
        mismatch): the bucket modulus is baked into the stored directory
        structure, so changing it per-run would prune merges against the
        wrong dirs and silently lose/duplicate rows. A layout change
        requires a full rewrite (overwrite/optimize with the new config)."""
        self.spark = spark
        self.path = path.rstrip("/")
        # Control-plane I/O (manifests, dir listings, vacuum) goes through a
        # filesystem abstraction: LocalFS for bare paths, the JVM Hadoop
        # FileSystem for scheme-qualified URIs (hdfs://, s3a://, file://...).
        # Data-plane segment I/O is always Spark and needs no abstraction.
        self.fs = fs_for_path(spark, self.path)
        # Columns to record per-segment min/max for at write time (the Delta
        # file-statistics analog): typically the entity's watermark +
        # businesskey columns. Collected via df.observe during the write
        # action, so recording them costs no extra scan.
        self.stats_columns = tuple(stats_columns)
        self.bucket_pk = bucket_pk if not partition_by else None
        self.n_buckets = n_buckets
        self.partition_by = list(partition_by) if partition_by else (
            [BUCKET_COL] if bucket_pk else []
        )
        if not partition_by:
            mf = self.latest_manifest()
            stored = mf.bucketing if mf is not None else None
            if stored:
                if warn_on_layout_mismatch and (self.bucket_pk, self.n_buckets) != (
                    stored["pk"],
                    int(stored["n"]),
                ):
                    logger.warning(
                        "table %s was written with bucketing %s; ignoring configured "
                        "(pk=%s, n=%s) — rewrite the table to change its layout",
                        self.path, stored, self.bucket_pk, self.n_buckets,
                    )
                self.bucket_pk = stored["pk"]
                self.n_buckets = int(stored["n"])
                self.partition_by = [BUCKET_COL]
            elif mf is not None and self.bucket_pk:
                # existing table written WITHOUT bucketing: the stored layout
                # wins here too — a plain directory stays a plain directory
                # (writing bucket-partitioned segments into it would mix
                # layouts). Upgrading a grown table happens explicitly via
                # set_layout(force=True) under a full overwrite
                # (Processing._process_full) or optimize().
                self.bucket_pk = None
                self.partition_by = []

    def set_layout(self, bucket_pk: str | None, n_buckets: int, force: bool = False) -> None:
        """Change the PK-hash bucket layout of this instance.

        Only legal when the stored directory structure is about to be (re)built
        wholesale: before the first commit, or immediately before a full
        overwrite (``force=True``). Changing the modulus under live bucketed
        segments would prune merges against the wrong dirs — that path raises.
        """
        if self.partition_by and self.partition_by != [BUCKET_COL]:
            raise ValueError("set_layout only applies to unpartitioned tables")
        if self.exists() and not force:
            raise ValueError(
                f"{self.path} already has committed segments; bucket layout can "
                "only change under a full overwrite (force=True)"
            )
        self.bucket_pk = bucket_pk
        self.n_buckets = int(n_buckets)
        self.partition_by = [BUCKET_COL] if bucket_pk else []

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        if self.bucket_pk and BUCKET_COL not in df.columns:
            df = df.withColumn(BUCKET_COL, bucket_expr(self.bucket_pk, self.n_buckets))
            # Cluster output files by bucket dir: without this every write
            # task emits a file into every bucket dir (tasks x buckets small
            # files). When there are fewer buckets than cores, clustering on
            # the bucket alone would also CAP the write stage at n_buckets
            # tasks — so each bucket is salted into ceil(cores/n_buckets)
            # splits: write parallelism stays ~cores, files per bucket stay
            # bounded at the split factor.
            par = self.spark.sparkContext.defaultParallelism
            split = max(1, -(-par // max(1, self.n_buckets)))  # ceil
            if split > 1:
                df = df.repartition(
                    self.n_buckets * split,
                    BUCKET_COL,
                    F.pmod(F.hash(F.col(self.bucket_pk)), F.lit(split)),
                )
            else:
                df = df.repartition(min(self.n_buckets, par), BUCKET_COL)
        return df

    # ------------------------------------------------------------ manifest io
    @property
    def _manifest_dir(self) -> str:
        return f"{self.path}/_manifest"

    def latest_manifest(self) -> Manifest | None:
        d = self._manifest_dir
        versions = [f for f in self.fs.listdir(d) if f.endswith(".json")]
        if not versions:
            return None
        return Manifest.from_json(self.fs.read_text(f"{d}/{max(versions)}"))

    def manifest_at(self, version: int) -> Manifest:
        return Manifest.from_json(
            self.fs.read_text(f"{self._manifest_dir}/v{version:05d}.json")
        )

    def exists(self) -> bool:
        return self.latest_manifest() is not None

    def _commit(self, manifest: Manifest) -> None:
        """Atomic compare-and-swap commit: the version file is created with
        the filesystem's create-if-absent primitive (hard-link on LocalFS,
        ``create(path, overwrite=false)`` on HadoopFS), so two writers racing
        for the same version cannot silently drop each other's segments — the
        loser gets ConcurrentCommitException and must re-read + retry. This
        is the same one-immutable-file-per-version protocol Delta/Iceberg
        use for their commit files; object-store caveats live in fs.py."""
        if manifest.bucketing is None and self.bucket_pk:
            manifest.bucketing = {"pk": self.bucket_pk, "n": self.n_buckets}
        final = f"{self._manifest_dir}/v{manifest.version:05d}.json"
        try:
            self.fs.create_exclusive(final, manifest.to_json())
        except FileExistsError:
            raise ConcurrentCommitException(
                f"version {manifest.version} of {self.path} was committed concurrently"
            )

    # At most this many files per segment get footer-level stats recorded;
    # beyond it only segment-level stats are kept (a manifest entry per file
    # must stay control-plane-sized). At 100 TB the per-file stats would be
    # collected by the write tasks themselves (the Delta approach) instead
    # of driver-side footer reads — the manifest format is already shaped
    # for that swap.
    file_stats_max_files = 256

    def _collect_file_stats(self, seg_rel: str) -> dict[str, dict] | None:
        """Per-file min/max for ``stats_columns``, read from the parquet
        footers of a just-written segment (seek-based: a few KB per file,
        no data pages). Local filesystems only — on object stores the
        production path is collecting the same numbers in the write tasks.

        Parquet writers may truncate long BYTE_ARRAY min/max values, but
        always conservatively (stored min <= actual min, stored max >=
        actual max), so pruning on them can never drop a matching file.
        A column without statistics in any row group is omitted for that
        file (=> unknown => never pruned)."""
        from datalakefoundation_spark.tables.fs import LocalFS

        if not self.stats_columns or not isinstance(self.fs, LocalFS):
            return None
        import os

        import pyarrow.parquet as pq

        base = f"{self.path}/{seg_rel}"
        paths: list[str] = []
        for root, _dirs, names in os.walk(base):
            paths.extend(
                os.path.join(root, n) for n in names if n.endswith(".parquet")
            )
        if not paths or len(paths) > self.file_stats_max_files:
            return None
        out: dict[str, dict] = {}
        for f in sorted(paths):
            md = pq.ParquetFile(f).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            fstats: dict[str, dict] = {}
            for c in self.stats_columns:
                if c not in idx:
                    continue
                i = idx[c]
                mn = mx = None
                ok = True
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(i)
                    st = col.statistics
                    if st is None:
                        ok = False
                        break
                    if (
                        st.null_count is not None
                        and st.null_count == md.row_group(rg).num_rows
                    ):
                        continue  # all-NULL row group: no min/max to add
                    if not st.has_min_max:
                        ok = False
                        break
                    mn = st.min if mn is None else min(mn, st.min)
                    mx = st.max if mx is None else max(mx, st.max)
                if not ok:
                    continue
                lo, k_lo = _encode_stat(mn)
                hi, k_hi = _encode_stat(mx)
                # mn=mx=None here means every row group was all-NULL — the
                # same "no row can match a range predicate" encoding the
                # segment-level stats use
                fstats[c] = {"min": lo, "max": hi, "t": k_lo or k_hi or "str"}
            out[os.path.relpath(f, base)] = fstats
        return out

    # ------------------------------------------------------------ segment io
    def _write_segment(self, df: DataFrame) -> tuple[str, dict | None, int, dict | None]:
        """Write one immutable segment; returns (relative dir, per-column
        min/max stats or None, row count, per-file stats or None). Segment
        stats + count are collected with ``df.observe`` DURING the write
        action — no second pass; file stats come from the written footers
        (metadata-only reads)."""
        from pyspark.sql import Observation

        mf = self.latest_manifest()
        next_v = (mf.version + 1) if mf else 0
        # writer-unique dir (same rule as append_arrow / dv writers): two
        # same-entity writers racing for next_v must never share a segment
        # path — the Hadoop committer renames task files into the dir, so a
        # shared path let the CAS LOSER's part files land inside the
        # WINNER's committed segment (silent row duplication) or fail the
        # loser with an opaque rename IOException instead of the clean
        # ConcurrentCommitException (caught by tests/test_merge_race.py)
        seg_rel = f"data/v{next_v:05d}-{uuid.uuid4().hex[:8]}"
        df = self._with_bucket(df)
        stat_cols = [
            f.name
            for f in df.schema.fields
            if f.name in self.stats_columns and "<" not in f.dataType.simpleString()
        ]
        obs = Observation()
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in stat_cols:
            aggs.append(F.min(F.col(c)).alias(f"mn_{c}"))
            aggs.append(F.max(F.col(c)).alias(f"mx_{c}"))
        df = df.observe(obs, *aggs)
        writer = df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(f"{self.path}/{seg_rel}")
        got = obs.get
        rows = int(got["__n"] or 0)
        stats = None
        if stat_cols:
            stats = {}
            for c in stat_cols:
                mn, kind_mn = _encode_stat(got[f"mn_{c}"])
                mx, kind_mx = _encode_stat(got[f"mx_{c}"])
                stats[c] = {"min": mn, "max": mx, "t": kind_mn or kind_mx or "str"}
        return seg_rel, stats, rows, self._collect_file_stats(seg_rel)

    def _partition_values(self, df: DataFrame) -> list[dict[str, str]]:
        """Distinct partition values present in df (Processing.scala:144-156).
        One small distinct-agg job; values come back as strings to match
        hive partition-dir encoding."""
        if not self.partition_by:
            return []
        rows = (
            df.select(*[F.col(c).cast("string").alias(c) for c in self.partition_by])
            .distinct()
            .collect()
        )
        return [dict(r.asDict()) for r in rows]

    def _partition_filter(self, pvs: list[dict[str, str]]) -> Column:
        # single-column ownership (the bucketed-table norm): one IN list
        # instead of an OR-of-AND chain — with 32 buckets per segment and
        # dozens of live segments the chained form made driver-side plan
        # ANALYSIS the dominant read cost (measured 11 s of pure plan
        # build at 33 segments x 32 values; isin analyzes in millis)
        keys = {k for pv in pvs for k in pv.keys()}
        if len(keys) == 1:
            (k,) = keys
            vals = [pv[k] for pv in pvs if pv.get(k) is not None]
            cond = F.col(k).cast("string").isin(vals) if vals else F.lit(False)
            if any(pv.get(k) is None for pv in pvs):
                cond = cond | F.col(k).isNull()
            return cond
        cond = F.lit(False)
        for pv in pvs:
            c = F.lit(True)
            for k, v in pv.items():
                if v is None:
                    # NULL partition value: equality to lit(None) is NULL
                    # (never true) and would exclude every NULL-partition
                    # row from pruning/replacement — match explicitly
                    c = c & F.col(k).isNull()
                else:
                    c = c & (F.col(k).cast("string") == F.lit(v))
            cond = cond | c
        return cond

    def version_at_timestamp(self, ts: float) -> int:
        """Latest committed version whose commit timestamp is <= ts (the
        ``timestampAsOf`` lookup). Raises if the table has no commit that
        old."""
        versions = [m.version for m in self.history() if m.timestamp <= ts]
        if not versions:
            raise FileNotFoundError(
                f"no version of {self.path} committed at or before {ts}"
            )
        return max(versions)

    # ------------------------------------------------------------ read
    def read(
        self,
        version: int | None = None,
        keep_bucket: bool = False,
        as_of_timestamp: float | None = None,
        prune_spec=None,
    ) -> DataFrame:
        """``keep_bucket=True`` retains the internal bucket column so callers
        can prune to specific buckets (predicates on it are pure hive-dir
        pruning) before dropping it themselves. ``as_of_timestamp`` reads
        the newest version committed at or before the given unix time
        (ignored when an explicit ``version`` is passed).

        ``prune_spec`` (a window spec from ``watermark.build_window_spec``)
        skips segments whose recorded min/max stats prove no row can match —
        data skipping at segment granularity, the Delta file-statistics
        analog. The result is a SUPERSET of the matching rows (callers still
        apply the row-level predicate); segments without stats are always
        read."""
        if version is None and as_of_timestamp is not None:
            version = self.version_at_timestamp(as_of_timestamp)
        mf = self.manifest_at(version) if version is not None else self.latest_manifest()
        if mf is None:
            raise FileNotFoundError(f"LakeTable does not exist: {self.path}")
        segs = list(mf.segments)
        if prune_spec is not None:
            segs = [s for s in segs if segment_may_match(s.stats, prune_spec)]
        # Deletion vectors apply as ONE global broadcast join after the
        # union (masks keyed by commit version — see _global_dv_masks for
        # the equivalence argument). The per-segment anti-join form built
        # O(live patches^2) distinct broadcast exchanges across a read
        # (measured 0.5 s -> 19.6 s over 32 patches at 2M rows); the
        # global join costs one small build regardless of patch count.
        # None => an entry's commit version couldn't be derived (foreign
        # manifest) -> conservative per-segment application.
        masks = self._global_dv_masks(segs)
        dv_frames = self._dv_frames(segs) if masks is None else {}
        # Segment reads are BATCHED: every plain whole-dir segment (no
        # ownership filter, no per-segment dv tagging, no file-level
        # selection) lands in ONE multi-path spark.read.parquet(*dirs)
        # call instead of its own reader + unionByName node. The
        # per-segment union loop built an O(live segments) driver plan —
        # measured 6.1 s of pure plan build at 100 tiny segments and
        # 60.3 s at 1000 (tools/segment_probe.py) — while the batched read
        # is one relation whose file listing Spark parallelizes
        # (parallelPartitionDiscovery) and whose splits coalesce by
        # maxPartitionBytes instead of one task per tiny file.
        # mergeSchema keeps unionByName(allowMissingColumns) semantics for
        # additively-evolved segments (old files read typed NULLs).
        # Per-segment reads remain where the semantics are per-segment:
        # partition/bucket ownership filters (seg.partitions) and
        # stats-pruned partial file lists. Global-dv-masked tables (MoR
        # with live patches — the case that accumulates segments FASTEST,
        # one per trickle merge) also batch: the per-row commit version the
        # mask join needs is derived from the segment dir name inside
        # _metadata.file_path instead of a per-segment literal, provided
        # every batched dir's version parses (else per-segment fallback).
        parts: list[DataFrame] = []
        # two homogeneous batches: hive-layout segments (bucket/partition
        # subdirs) cannot share one multi-path read with plain segments
        # (Spark rejects conflicting directory structures)
        batched_plain: list[str] = []
        batched_hive: list[str] = []
        for seg in segs:
            base = f"{self.path}/{seg.dir}"
            whole_dir = True
            if prune_spec is not None and seg.files:
                # file-level skipping inside the surviving segment: read only
                # the files whose footer stats might hold a matching row.
                # basePath keeps the hive partition columns of bucketed/
                # partitioned segments intact on an explicit file list.
                keep = [
                    p
                    for p, fstats in seg.files.items()
                    if segment_may_match(fstats, prune_spec)
                ]
                if not keep:
                    continue
                if len(keep) < len(seg.files):
                    whole_dir = False
                    df = self.spark.read.option("basePath", base).parquet(
                        *[f"{base}/{p}" for p in sorted(keep)]
                    )
            if (
                whole_dir
                # ownership-full segments need NO per-segment filter: plain
                # segments own everything by definition, and BUCKET-layout
                # segments whose recorded ownership still covers their
                # physical dirs (owns_all — tracked in the manifest,
                # flipped when replace_partitions shrinks them) read
                # identically without it. Bucketed segments batch via their
                # LEAF bucket dirs (multi-root hive discovery conflicts on
                # the non-hive vNNNNN level), so the bucket column is not
                # materialized — only keep_bucket=False reads qualify; the
                # merge path (keep_bucket=True + bucket-pruned reads) keeps
                # per-segment hive reads with real dir pruning. Real
                # partitioned tables always read per-segment: their
                # partition VALUES live in the dir names.
                and (
                    seg.partitions is None
                    or (
                        seg.owns_all
                        and not keep_bucket
                        and self.partition_by == [BUCKET_COL]
                    )
                )
                and not (masks is None and seg.dv)
                and (not masks or _dir_version(seg.dir) is not None)
            ):
                if seg.partitions is None:
                    batched_plain.append(base)
                else:
                    batched_hive.extend(
                        f"{base}/{d}"
                        for d in self.fs.listdir(base)
                        if d.startswith(f"{BUCKET_COL}=")
                    )
                continue
            if whole_dir:
                df = self.spark.read.parquet(base)
            if seg.partitions is not None and self.partition_by:
                # equality predicates on hive partition dirs -> pure dir pruning
                df = df.where(self._partition_filter(seg.partitions))
            if masks is None:
                df = self._apply_dv(df, seg, dv_frames)
            elif masks:
                df = df.withColumn(
                    SEG_V_COL, F.lit(_dir_version(seg.dir)).cast("long")
                )
            parts.append(df)
        for batched_dirs in (batched_plain, batched_hive):
            if not batched_dirs:
                continue
            if len(batched_dirs) == 1:
                bdf = self.spark.read.parquet(batched_dirs[0])
            else:
                bdf = self.spark.read.option("mergeSchema", "true").parquet(
                    *batched_dirs
                )
            if masks:
                # per-row commit version parsed from the segment dir inside
                # the file path: the greedy '.*' pins the LAST
                # '/data/vNNNNN' occurrence, which is this table's segment
                # dir regardless of hive-subdir depth (bucketed/partitioned
                # segments nest one level deeper than plain ones); segments
                # whose dir doesn't parse were excluded from the batch
                bdf = bdf.withColumn(
                    SEG_V_COL,
                    F.regexp_extract(
                        F.col("_metadata.file_path"), r".*/data/v(\d{5})", 1
                    ).cast("long"),
                )
            parts.insert(0, bdf)
        if not parts:
            if not mf.segments:
                raise FileNotFoundError(f"LakeTable has no segments: {self.path}")
            # everything pruned: preserve the schema with a zero-row scan of
            # one segment (limit 0 — footer read only)
            empty = (
                self.spark.read.parquet(f"{self.path}/{mf.segments[0].dir}").limit(0)
            )
            for c in (BUCKET_COL, MASK_COL):
                if c in empty.columns and not (keep_bucket and c == BUCKET_COL):
                    empty = empty.drop(c)
            return empty
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        for keys, mask in (masks or {}).items():
            cond = None
            for k in keys:
                # rows from segments predating an evolved key column read
                # NULL -> no match -> kept (same as the per-segment rule)
                c = F.col(k) == F.col(f"__dv_{k}")
                cond = c if cond is None else (cond & c)
            out = (
                out.join(F.broadcast(mask), cond, "left")
                .where(
                    F.col(DV_V_COL).isNull()
                    | (F.col(DV_V_COL) <= F.col(SEG_V_COL))
                )
                .drop(DV_V_COL, *[f"__dv_{k}" for k in keys])
            )
        if SEG_V_COL in out.columns:
            out = out.drop(SEG_V_COL)
        # the bucket/mask columns are internal regardless of this instance's
        # config (e.g. a reader constructed with bucketing disabled on a
        # bucketed table must not leak them as data columns)
        if not keep_bucket and BUCKET_COL in out.columns:
            out = out.drop(BUCKET_COL)
        if MASK_COL in out.columns:
            out = out.drop(MASK_COL)
        return out

    def _global_dv_masks(self, segs: list[Segment]):
        """One broadcastable mask table per deletion-vector key set:
        ``(keys..., __dlf_dv_v = max commit version masking that key)``,
        with mask-side columns pre-renamed to ``__dv_<k>``.

        Equivalence with the per-segment attachment lists: an entry
        created at commit d is attached to exactly the segments in the
        manifest at d — all of which have version < d — and never to
        later segments (re-inserted keys resurface). Segment versions are
        monotone in commit order and encoded in the dir names, so
        "entry attached to seg" <=> "d > seg_version", and masking by
        ``max(d) per key > seg_version`` reproduces every list exactly.
        Coalesced dv dirs persist the per-key ``__dlf_dv_v`` column, so
        merging never widens a key's mask window.

        Returns {} when no segment carries dv refs, or None when an
        entry's version cannot be derived (conservative fallback to
        per-segment application)."""
        entries: dict[str, tuple[tuple, str | None, int | None]] = {}
        for seg in segs:
            for e in seg.dv or []:
                v = e.get("v")
                if v is None:
                    v = _dir_version(e["dir"])
                if v is None:
                    return None
                entries[e["dir"]] = (tuple(e["keys"]), e.get("flag"), int(v))
        if not entries:
            return {}
        by_keys: dict[tuple, list[DataFrame]] = {}
        # entry dirs whose name encodes their commit version batch into ONE
        # multi-path read per (keys, flag) group — the per-entry reader
        # loop made every live patch its own relation (O(patches) plan
        # nodes on exactly the trickle-ingest path that accumulates
        # patches fastest). The per-row version comes from the dir name
        # via the same last-'/data/vNNNNN' regexp the batched data read
        # uses; dirs carrying a persisted DV_V_COL (coalesced dvs) keep it
        # via coalesce. Entries with an explicit version differing from
        # their dir name fall back to the single-dir form.
        batchable: dict[tuple, list[str]] = {}
        for d, (keys, flag, v) in entries.items():
            if _dir_version(d) == v:
                batchable.setdefault((keys, flag), []).append(d)
                continue
            f = self.spark.read.parquet(f"{self.path}/{d}")
            if flag:
                f = f.where(F.col(flag))
            if DV_V_COL in f.columns:
                f = f.select(*keys, DV_V_COL)
            else:
                f = f.select(*keys).withColumn(DV_V_COL, F.lit(v).cast("long"))
            by_keys.setdefault(keys, []).append(f)
        for (keys, flag), dirs in batchable.items():
            # expand bucketed patch segments to their __dlf_bucket leaf
            # dirs: multi-root reads reject mixed/hive structures, and leaf
            # roots need no partition discovery. Dirs with any OTHER hive
            # structure (real-partitioned patches — multi-level nesting,
            # values live in dir names) read alone via single-root hive
            # discovery instead of joining the batch.
            paths: list[str] = []
            alone: list[str] = []
            for d in dirs:
                base = f"{self.path}/{d}"
                names = self.fs.listdir(base)
                buckets = [n for n in names if n.startswith(f"{BUCKET_COL}=")]
                other_hive = any(
                    "=" in n and not n.startswith((BUCKET_COL, "_", "."))
                    for n in names
                )
                if other_hive:
                    alone.append(base)
                elif buckets:
                    paths.extend(f"{base}/{n}" for n in buckets)
                else:
                    paths.append(base)
            for base in alone:
                f = self.spark.read.parquet(base)
                if flag and flag in f.columns:
                    f = f.where(F.col(flag))
                path_v = F.regexp_extract(
                    F.col("_metadata.file_path"), r".*/data/v(\d{5})", 1
                ).cast("long")
                if DV_V_COL in f.columns:
                    f = f.select(
                        *keys, F.coalesce(F.col(DV_V_COL), path_v).alias(DV_V_COL)
                    )
                else:
                    f = f.select(*keys, path_v.alias(DV_V_COL))
                by_keys.setdefault(keys, []).append(f)
            if not paths:
                continue
            if len(paths) == 1:
                f = self.spark.read.parquet(paths[0])
            else:
                f = self.spark.read.option("mergeSchema", "true").parquet(*paths)
            if flag and flag in f.columns:
                # NULL flag (row from a dir without the column, or a
                # non-masking patch row) correctly drops from the mask
                f = f.where(F.col(flag))
            path_v = F.regexp_extract(
                F.col("_metadata.file_path"), r".*/data/v(\d{5})", 1
            ).cast("long")
            if DV_V_COL in f.columns:
                f = f.select(
                    *keys, F.coalesce(F.col(DV_V_COL), path_v).alias(DV_V_COL)
                )
            else:
                f = f.select(*keys, path_v.alias(DV_V_COL))
            by_keys.setdefault(keys, []).append(f)
        masks: dict[tuple, DataFrame] = {}
        for keys, frames in by_keys.items():
            u = frames[0]
            for f in frames[1:]:
                u = u.unionByName(f)
            masks[keys] = (
                u.groupBy(*keys)
                .agg(F.max(DV_V_COL).alias(DV_V_COL))
                .select(
                    *[F.col(k).alias(f"__dv_{k}") for k in keys], DV_V_COL
                )
            )
        return masks

    def _dv_key(self, entry: dict) -> tuple:
        return (entry["dir"], tuple(entry["keys"]), entry.get("flag"))

    def _dv_frames(self, segs: list[Segment]) -> dict[tuple, DataFrame]:
        """One key-projection DataFrame per distinct deletion-vector entry
        across ``segs`` (column-pruned scan of the masking commit's keys)."""
        frames: dict[tuple, DataFrame] = {}
        for seg in segs:
            for entry in seg.dv or []:
                k = self._dv_key(entry)
                if k in frames:
                    continue
                df = self.spark.read.parquet(f"{self.path}/{entry['dir']}")
                flag = entry.get("flag")
                if flag:
                    df = df.where(F.col(flag))
                frames[k] = df.select(*entry["keys"])
        return frames

    def _apply_dv(
        self, df: DataFrame, seg: Segment, dv_frames: dict[tuple, DataFrame]
    ) -> DataFrame:
        """Anti-join out the row versions this segment's deletion vectors
        mask. Masking keys are non-null by construction (PK hashes /
        temporal columns), so a plain LEFT ANTI equi-join is exact; the key
        sides are change-sized, so AQE broadcasts them.

        Entries sharing a key set are UNIONED and applied as ONE anti-join:
        a long-lived segment accumulates one dv ref per later patch, and
        joining per-entry made read plans grow O(patches^2) across the
        table (measured 0.47 s -> 19.6 s over 32 patches at 2M rows); the
        union form is one join per segment per key set."""
        by_keys: dict[tuple, list[DataFrame]] = {}
        for entry in seg.dv or []:
            keys = tuple(entry["keys"])
            if any(k not in df.columns for k in keys):
                continue  # segment predates the masked columns — nothing to mask
            by_keys.setdefault(keys, []).append(dv_frames[self._dv_key(entry)])
        for keys, frames in by_keys.items():
            dv = frames[0]
            for f in frames[1:]:
                dv = dv.unionByName(f)
            cond = None
            d = df.alias("__t")
            m = dv.alias("__d")
            for k in keys:
                c = F.col(f"__t.{k}") == F.col(f"__d.{k}")
                cond = c if cond is None else (cond & c)
            df = d.join(m, cond, "left_anti").select("__t.*")
        return df

    # ------------------------------------------------------------ write ops
    def overwrite(
        self,
        df: DataFrame,
        dynamic: bool = False,
        metrics: dict | None = None,
        operation: str | None = None,
        metrics_fn=None,
    ) -> None:
        """Full overwrite, or dynamic partition overwrite (only partitions
        present in df are replaced — Full.scala:38-50).

        ``metrics_fn`` (no-arg callable) is evaluated AFTER the write action
        and merged into the commit metrics — the hook for observation-based
        counts (e.g. total_rows) that only exist once the job has run."""
        mf = self.latest_manifest()
        seg_rel, stats, rows, fstats = self._write_segment(df)
        if metrics_fn is not None:
            metrics = {**(metrics or {}), **metrics_fn()}
        next_v = (mf.version + 1) if mf else 0
        if not dynamic or not self.partition_by or mf is None:
            segments = [
                Segment(
                    seg_rel,
                    None if not self.partition_by else self._read_segment_partitions(seg_rel),
                    stats=stats,
                    rows=rows,
                    files=fstats,
                )
            ]
        else:
            new_pvs = self._read_segment_partitions(seg_rel)
            new_keys = {_pv_key(pv) for pv in new_pvs}
            segments = []
            for seg in mf.segments:
                if seg.partitions is None:
                    continue  # fully replaced below is wrong; but unpartitioned+dynamic can't happen
                kept = [pv for pv in seg.partitions if _pv_key(pv) not in new_keys]
                if kept:
                    # dv refs MUST survive partition handoff: the kept rows
                    # are still masked by any later patches/deletes —
                    # dropping the refs would resurrect superseded versions
                    segments.append(
                        Segment(
                            seg.dir, kept, stats=seg.stats, rows=seg.rows,
                            files=seg.files, dv=list(seg.dv or []),
                            owns_all=seg.owns_all and len(kept) == len(seg.partitions),
                        )
                    )
            segments.append(Segment(seg_rel, new_pvs, stats=stats, rows=rows, files=fstats))
        self._commit(
            Manifest(
                version=next_v,
                partition_by=self.partition_by,
                segments=segments,
                operation=operation or ("overwrite_dynamic" if dynamic else "overwrite"),
                timestamp=time.time(),
                metrics=metrics or {},
            )
        )

    def optimize(
        self,
        cluster_by: Sequence[str] = (),
        target_partitions: int | None = None,
        zorder: bool = False,
        zorder_bits: int = 16,
    ) -> None:
        """Table maintenance (the OPTIMIZE / ZORDER BY analog for a parquet
        lakehouse): rewrite the current version into one fresh compacted
        segment, optionally range-clustered on ``cluster_by``.

        * Compaction folds the many small segments that accumulate from
          incremental merges into one — fewer files to list/open, full-size
          row groups.
        * ``cluster_by`` range-repartitions + sorts within partitions on the
          given columns, so each output file/row-group covers a narrow value
          range — parquet min/max stats then skip most of the table for
          selective predicates on those columns (the data-skipping effect
          Z-ORDER provides; for a single clustering dimension range-sort is
          strictly better, for 2+ it is the practical linear-order stand-in).

        Runs as one shuffle + one write; old versions stay readable until
        ``vacuum()``.

        Bucketed tables keep their bucket dirs, so clustering happens WITHIN
        each bucket: repartition on the (retained) bucket column + sort
        within partitions on (bucket, cluster_by) — one file per bucket with
        min/max stats on the cluster columns. A global range-repartition
        here would be undone by the bucket-directory write and just waste
        two shuffles.

        ``zorder=True`` (with 2+ numeric/temporal ``cluster_by`` columns)
        clusters on an interleaved-bit Morton key instead of the
        lexicographic range sort: every clustered column gets locality, so
        the per-file min/max stats recorded at write time prune selective
        predicates on ANY of the dimensions, not just the leading one (the
        Delta ZORDER BY trade — slightly wider per-file ranges on the first
        column, bounded ranges on all of them). Costs one extra min/max
        aggregation to fix the normalization bounds.
        """
        if zorder and cluster_by:
            zcols = list(cluster_by)
            cur = self.read()
            numeric_ok = {
                f.name
                for f in cur.schema.fields
                if f.dataType.simpleString()
                in ("tinyint", "smallint", "int", "bigint", "float", "double",
                    "date", "timestamp", "timestamp_ntz", "boolean")
                or f.dataType.simpleString().startswith("decimal")
            }
            bad = [c for c in zcols if c not in numeric_ok]
            if bad:
                # equal-width bucketing needs an ordered numeric domain; a
                # string column would normalize to NULL -> bucket 0 and
                # silently destroy the clustering. Range sort handles any
                # orderable type, so fall back to it.
                logger.warning(
                    "zorder skipped for %s: non-numeric cluster columns %s; "
                    "using lexicographic range clustering",
                    self.path, bad,
                )
                zorder = False
        if zorder and cluster_by:
            dtypes = {
                f.name: f.dataType.simpleString()
                for f in cur.schema.fields
                if f.name in zcols
            }
            agg = []
            for c in zcols:
                norm = zorder_numeric(F.col(c), dtypes.get(c, ""))
                agg.append(F.min(norm).alias(f"mn_{c}"))
                agg.append(F.max(norm).alias(f"mx_{c}"))
            row = cur.agg(*agg).first()
            bounds = {
                c: (
                    row[f"mn_{c}"] if row[f"mn_{c}"] is not None else 0.0,
                    row[f"mx_{c}"] if row[f"mx_{c}"] is not None else 0.0,
                )
                for c in zcols
            }
            zkey = zorder_column(zcols, bounds, bits=zorder_bits, dtypes=dtypes)
            if self.bucket_pk:
                df = (
                    cur.withColumn(BUCKET_COL, bucket_expr(self.bucket_pk, self.n_buckets))
                    .withColumn("__dlf_z", zkey)
                    .repartition(
                        min(self.n_buckets, self.spark.sparkContext.defaultParallelism),
                        BUCKET_COL,
                    )
                    .sortWithinPartitions(BUCKET_COL, "__dlf_z")
                    .drop("__dlf_z")
                )
            else:
                df = cur.withColumn("__dlf_z", zkey)
                if target_partitions:
                    df = df.repartitionByRange(target_partitions, "__dlf_z")
                else:
                    df = df.repartitionByRange("__dlf_z")
                df = df.sortWithinPartitions("__dlf_z").drop("__dlf_z")
            self.overwrite(
                df,
                operation="optimize",
                metrics={"cluster_by": list(cluster_by), "zorder": True},
            )
            return
        if self.bucket_pk:
            # Recompute the bucket column from the CURRENT layout instead of
            # reusing the stored one: stored values are stale after
            # set_layout(force=True), which makes optimize() the tool for
            # re-bucketing a grown incremental table (full rewrite anyway).
            # The repartition on the bucket folds each bucket's accumulated
            # small files into one.
            df = self.read().withColumn(
                BUCKET_COL, bucket_expr(self.bucket_pk, self.n_buckets)
            ).repartition(
                min(self.n_buckets, self.spark.sparkContext.defaultParallelism),
                BUCKET_COL,
            )
            if cluster_by:
                df = df.sortWithinPartitions(
                    BUCKET_COL, *[F.col(c) for c in cluster_by]
                )
        else:
            df = self.read()
            if cluster_by:
                cols = [F.col(c) for c in cluster_by]
                if target_partitions:
                    df = df.repartitionByRange(target_partitions, *cols)
                else:
                    df = df.repartitionByRange(*cols)
                df = df.sortWithinPartitions(*cols)
            elif target_partitions:
                df = df.repartition(target_partitions)
        self.overwrite(
            df,
            operation="optimize",
            metrics={"cluster_by": list(cluster_by)},
        )

    def compact_small_segments(self, small_rows: int = 100_000) -> list[str]:
        """Incremental compaction: fold only the segments smaller than
        ``small_rows`` rows (or with unknown counts) into one fresh
        segment; large segments keep their files untouched. This is the
        maintenance shape that survives 100 TB — a full ``optimize()``
        rewrites the entire table to fold a handful of micro-batch
        segments, while this reads and rewrites only the small tail
        (Delta/Iceberg bin-packing OPTIMIZE makes the same trade at file
        granularity).

        Recorded ``rows`` are the counts at write time; a segment that
        later lost partition ownership may be smaller than recorded and
        merely waits for a later pass — conservative, never wrong.
        Returns the folded segment dirs ([] if fewer than two
        candidates)."""
        mf = self.latest_manifest()
        if mf is None:
            return []
        small = [s for s in mf.segments if s.rows is None or s.rows < small_rows]
        if self.partition_by:
            # a None-ownership segment means "whole table" — never fold it
            # into explicit partition ownership (shouldn't exist on a
            # partitioned table, but stay safe)
            small = [s for s in small if s.partitions is not None]
        if len(small) < 2:
            return []
        dv_frames = self._dv_frames(small)
        parts: list[DataFrame] = []
        for seg in small:
            df = self.spark.read.parquet(f"{self.path}/{seg.dir}")
            if seg.partitions is not None and self.partition_by:
                df = df.where(self._partition_filter(seg.partitions))
            # deletion vectors materialize here: the folded segment holds
            # the post-mask rows and needs no dv refs of its own (other
            # segments' refs to a folded patch dir stay valid — the dir
            # outlives the fold until vacuum)
            parts.append(self._apply_dv(df, seg, dv_frames))
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p, allowMissingColumns=True)
        if MASK_COL in merged.columns:
            merged = merged.drop(MASK_COL)
        seg_rel, stats, rows, fstats = self._write_segment(merged)
        if any(s.partitions is None for s in small):
            ownership = None  # unpartitioned append-style segments
        else:
            ownership = [pv for s in small for pv in s.partitions]
        kept = [s for s in mf.segments if s not in small]
        # Coalesce surviving deletion-vector refs: a kept base segment
        # still needs its masks (its rows stay superseded), but carrying
        # one ref PER folded patch keeps the per-read anti-join fan-in at
        # O(patches) forever. Union each key set's refs into ONE merged
        # key dir and point the kept segments at that — post-compaction
        # reads then pay a single anti-join per kept segment.
        kept = self._coalesce_dv_refs(kept, mf.version + 1)
        self._commit(
            Manifest(
                version=mf.version + 1,
                partition_by=self.partition_by,
                segments=kept
                + [Segment(seg_rel, ownership, stats=stats, rows=rows, files=fstats)],
                operation="compact",
                timestamp=time.time(),
                metrics={"folded": len(small)},
            )
        )
        return [s.dir for s in small]

    def append(self, df: DataFrame, metrics: dict | None = None) -> None:
        mf = self.latest_manifest()
        seg_rel, stats, rows, fstats = self._write_segment(df)
        next_v = (mf.version + 1) if mf else 0
        segments = list(mf.segments) if mf else []
        segments.append(
            Segment(
                seg_rel,
                None if not self.partition_by else self._read_segment_partitions(seg_rel),
                stats=stats,
                rows=rows,
                files=fstats,
            )
        )
        self._commit(
            Manifest(
                version=next_v,
                partition_by=self.partition_by,
                segments=segments,
                operation="append",
                timestamp=time.time(),
                metrics=metrics or {},
            )
        )

    def append_arrow(self, arrow_table, label: str = "") -> None:
        """Driver-side control-plane append: one pyarrow file, no Spark job
        (for KB-sized system rows — watermarks, logs). Optimistic-concurrency
        retry: a commit conflict means another writer won that version —
        re-read the manifest and go again (same CAS protocol as Spark-side
        commits; swap os.link for a conditional put on an object store)."""
        import pyarrow.parquet as pq

        from datalakefoundation_spark.core.exceptions import ConcurrentCommitException

        import io

        for attempt in range(50):
            mf = self.latest_manifest()
            next_v = (mf.version + 1) if mf else 0
            # writer-unique dir: the CAS loser deletes its own segment below,
            # so two writers must never share a path even at the same
            # (version, label, attempt)
            nonce = uuid.uuid4().hex[:8]
            seg_rel = (
                f"data/v{next_v:05d}-{label}-{nonce}" if label else f"data/v{next_v:05d}-{nonce}"
            )
            buf = io.BytesIO()
            pq.write_table(arrow_table, buf)
            self.fs.put_bytes(f"{self.path}/{seg_rel}/part-00000.parquet", buf.getvalue())
            segments = (list(mf.segments) if mf else []) + [Segment(seg_rel, None)]
            try:
                self._commit(
                    Manifest(
                        version=next_v,
                        partition_by=[],
                        segments=segments,
                        operation="append",
                        timestamp=time.time(),
                    )
                )
                return
            except ConcurrentCommitException:
                # reclaim the orphaned segment before retrying at the next
                # version — lost races must not leak a dir per attempt
                self.fs.delete_tree(f"{self.path}/{seg_rel}")
                continue
        raise ConcurrentCommitException(f"arrow append to {self.path} lost 50 commit races")

    def replace_partitions(
        self,
        df: DataFrame,
        partition_values: list[dict[str, str]],
        metrics: dict | None = None,
        operation: str = "merge",
    ) -> None:
        """Copy-on-write commit: df becomes the new content of exactly
        ``partition_values``; every other partition keeps its current segment.
        This is the merge/SCD2 write path — touched partitions written once."""
        mf = self.latest_manifest()
        if mf is None:
            raise FileNotFoundError(f"LakeTable does not exist: {self.path}")
        seg_rel, stats, rows, fstats = self._write_segment(df)
        # Rows may land outside the requested partitions (a merge that updates
        # a partition column). Those extra partitions get co-owned by the new
        # segment so the rows stay visible (matches the reference's Delta
        # behavior where a partition-moving update inserts alongside the old
        # row); the old owners are NOT dropped for them.
        written = {_pv_key(pv): pv for pv in self._read_segment_partitions(seg_rel)}
        requested = {_pv_key(pv) for pv in partition_values}
        extra = [pv for k, pv in written.items() if k not in requested]
        partition_values = list(partition_values) + extra
        replaced = requested
        segments = []
        for seg in mf.segments:
            if seg.partitions is None:
                continue  # unpartitioned tables replace wholesale via overwrite()
            kept = [pv for pv in seg.partitions if _pv_key(pv) not in replaced]
            if kept:
                # same dv-preservation rule as dynamic overwrite above: a
                # CoW merge after MoR patches must not resurrect the rows
                # those patches (or delete_keys) masked in KEPT partitions
                segments.append(
                    Segment(
                        seg.dir, kept, stats=seg.stats, rows=seg.rows,
                        files=seg.files, dv=list(seg.dv or []),
                        owns_all=seg.owns_all and len(kept) == len(seg.partitions),
                    )
                )
        segments.append(
            Segment(seg_rel, partition_values, stats=stats, rows=rows, files=fstats)
        )
        self._commit(
            Manifest(
                version=mf.version + 1,
                partition_by=self.partition_by,
                segments=segments,
                operation=operation,
                timestamp=time.time(),
                metrics=metrics or {},
            )
        )

    def merge_patch(
        self,
        df: DataFrame,
        keys: Sequence[str],
        mask_col: str | None = None,
        metrics: dict | None = None,
        operation: str = "merge_patch",
        metrics_fn=None,
    ) -> int:
        """Merge-on-read commit: append ONLY the changed/inserted rows as a
        patch segment and mask the superseded versions in every existing
        segment via a deletion-vector reference to the patch's own key
        projection — write cost O(changed rows) instead of rewriting every
        touched partition/bucket (the Delta deletion-vector / Hudi MOR
        trade: cheap writes, reads pay one small anti-join per live patch
        until compaction folds them).

        ``keys`` identify a row VERSION (merge: the PK hash; SCD2: PK +
        ValidFrom). ``mask_col`` (persisted into the patch, stripped from
        reads) marks which patch rows mask an old version — inserts mask
        nothing, and excluding them keeps the DV exact. Returns the patch
        row count; an empty patch commits nothing (the state is unchanged).
        """
        mf = self.latest_manifest()
        if mf is None:
            raise FileNotFoundError(f"LakeTable does not exist: {self.path}")
        seg_rel, stats, rows, fstats = self._write_segment(df)
        if rows == 0:
            self.fs.delete_tree(f"{self.path}/{seg_rel}")
            if metrics_fn is not None:
                metrics_fn()  # evaluate observers so callers can read counts
            return 0
        if metrics_fn is not None:
            metrics = {**(metrics or {}), **metrics_fn()}
        entry = {"dir": seg_rel, "keys": list(keys), "flag": mask_col}
        segments = [
            Segment(
                s.dir, s.partitions, stats=s.stats, rows=s.rows, files=s.files,
                dv=list(s.dv or []) + [entry], owns_all=s.owns_all,
            )
            for s in mf.segments
        ]
        segments.append(
            Segment(
                seg_rel,
                None if not self.partition_by else self._read_segment_partitions(seg_rel),
                stats=stats,
                rows=rows,
                files=fstats,
            )
        )
        self._commit(
            Manifest(
                version=mf.version + 1,
                partition_by=self.partition_by,
                segments=segments,
                operation=operation,
                timestamp=time.time(),
                metrics=metrics or {},
            )
        )
        return rows

    def _coalesce_dv_refs(
        self, segments: list[Segment], next_version: int
    ) -> list[Segment]:
        """Rewrite multi-entry dv lists into one merged key dir per key
        set. Identical dv lists (the common case — every base segment
        carries the same patch refs) share one merged write. Merged dirs
        are committed in the same manifest, so vacuum/gc liveness holds;
        a crash before the commit leaves only an unreferenced orphan."""
        merged_cache: dict[tuple, list[dict]] = {}
        out: list[Segment] = []
        for s in segments:
            entries = list(s.dv or [])
            if len(entries) <= 1:
                out.append(s)
                continue
            sig = tuple(sorted(self._dv_key(e) for e in entries))
            if sig not in merged_cache:
                groups: dict[tuple, list[dict]] = {}
                for e in entries:
                    groups.setdefault(tuple(e["keys"]), []).append(e)
                new_entries: list[dict] = []
                for keys, es in groups.items():
                    if len(es) == 1:
                        new_entries.append(es[0])
                        continue
                    dv = None
                    for e in es:
                        f = self.spark.read.parquet(f"{self.path}/{e['dir']}")
                        if e.get("flag"):
                            f = f.where(F.col(e["flag"]))
                        # carry each key's ORIGINAL masking version: the
                        # merged dir must not widen any key's mask window
                        # (the global-mask read derives "masks segment v"
                        # from this column, see _global_dv_masks)
                        if DV_V_COL in f.columns:
                            f = f.select(*keys, DV_V_COL)
                        else:
                            ev = e.get("v")
                            if ev is None:
                                ev = _dir_version(e["dir"])
                            f = f.select(*keys).withColumn(
                                DV_V_COL, F.lit(int(ev)).cast("long")
                            )
                        dv = f if dv is None else dv.unionByName(f)
                    rel = f"data/v{next_version:05d}-dv-{uuid.uuid4().hex[:8]}"
                    dv.groupBy(*keys).agg(
                        F.max(DV_V_COL).alias(DV_V_COL)
                    ).write.mode("overwrite").parquet(f"{self.path}/{rel}")
                    new_entries.append(
                        {"dir": rel, "keys": list(keys), "flag": None}
                    )
                merged_cache[sig] = new_entries
            out.append(
                Segment(
                    s.dir, s.partitions, stats=s.stats, rows=s.rows,
                    files=s.files, dv=list(merged_cache[sig]),
                    owns_all=s.owns_all,
                )
            )
        return out

    def delete_keys(self, keys_df: DataFrame, keys: Sequence[str]) -> None:
        """Hard delete by key without rewriting any data (the GDPR-erasure
        shape): write the keys as a standalone deletion-vector dir — NOT a
        data segment — and attach it to every current segment. Matching
        rows vanish from every subsequent read; ``optimize()`` /
        compaction materialize the deletion physically (run one before
        vacuuming if the bytes themselves must go away)."""
        mf = self.latest_manifest()
        if mf is None:
            raise FileNotFoundError(f"LakeTable does not exist: {self.path}")
        dv_rel = f"data/v{mf.version + 1:05d}-dv-{uuid.uuid4().hex[:8]}"
        keys_df.select(*keys).write.mode("overwrite").parquet(f"{self.path}/{dv_rel}")
        entry = {"dir": dv_rel, "keys": list(keys), "flag": None}
        segments = [
            Segment(
                s.dir, s.partitions, stats=s.stats, rows=s.rows, files=s.files,
                dv=list(s.dv or []) + [entry], owns_all=s.owns_all,
            )
            for s in mf.segments
        ]
        self._commit(
            Manifest(
                version=mf.version + 1,
                partition_by=self.partition_by,
                segments=segments,
                operation="delete",
                timestamp=time.time(),
            )
        )

    def to_view_sql(self) -> str:
        """A self-contained SELECT over the current version's segments —
        usable to register a persistent catalog view (no temp-object refs).
        Partition-ownership filters are inlined as WHERE clauses."""
        mf = self.latest_manifest()
        if mf is None:
            raise FileNotFoundError(f"LakeTable does not exist: {self.path}")
        # dirs referenced as a flagged deletion vector are patch segments
        # carrying the internal mask column — exclude it from their SELECT
        flagged = {
            e["dir"] for s in mf.segments for e in (s.dv or []) if e.get("flag")
        }
        selects = []
        for seg in mf.segments:
            internal = [BUCKET_COL] if self.bucket_pk else []
            if seg.dir in flagged:
                internal.append(MASK_COL)
            star = f"* EXCEPT ({', '.join(internal)})" if internal else "*"
            sql = f"SELECT {star} FROM parquet.`{self.path}/{seg.dir}`"
            clauses = []
            if seg.partitions is not None and self.partition_by:
                ors = []
                for pv in seg.partitions:
                    ands = " AND ".join(
                        f"CAST({k} AS STRING) = '{v}'" for k, v in pv.items()
                    )
                    ors.append(f"({ands})")
                if ors:
                    clauses.append("(" + " OR ".join(ors) + ")")
            for entry in seg.dv or []:
                keys = ", ".join(entry["keys"])
                sub = f"SELECT {keys} FROM parquet.`{self.path}/{entry['dir']}`"
                if entry.get("flag"):
                    sub += f" WHERE {entry['flag']}"
                clauses.append(f"({keys}) NOT IN ({sub})")
            if clauses:
                sql += " WHERE " + " AND ".join(clauses)
            selects.append(sql)
        return " UNION ALL ".join(selects)

    # ------------------------------------------------------------ maintenance
    def _read_segment_partitions(self, seg_rel: str) -> list[dict[str, str]]:
        """Partition values of a written segment, from its hive directory
        names — pure filesystem listing, no data read."""
        base = f"{self.path}/{seg_rel}"
        out: list[dict[str, str]] = []

        def walk(d: str, acc: dict[str, str], depth: int) -> None:
            if depth == len(self.partition_by):
                out.append(dict(acc))
                return
            for name in self.fs.listdir(d):
                if "=" in name and self.fs.isdir(f"{d}/{name}"):
                    k, _, v = name.partition("=")
                    # hive encodes a NULL partition value as this sentinel
                    # dir name; map it back so keys line up with the None
                    # values collected from the slice
                    pv = None if v == "__HIVE_DEFAULT_PARTITION__" else v
                    walk(f"{d}/{name}", {**acc, k: pv}, depth + 1)

        walk(base, {}, 0)
        return out

    def gc_orphans(self, older_than_seconds: float = 3600.0) -> list[str]:
        """Reclaim crash leftovers: segment dirs referenced by NO manifest
        version (a writer dying between ``_write_segment`` and ``_commit``
        leaves the freshly-written dir with no manifest pointing at it).
        Unlike ``vacuum()``, history/time travel is untouched — every dir
        any committed version references survives.

        ``older_than_seconds`` guards against racing an in-flight writer:
        a concurrent commit-in-progress has already written its segment dir
        but not yet its manifest, which is indistinguishable from a crash
        leftover by listing alone. Only dirs older than the threshold are
        deleted (the same retention idea as Delta's VACUUM); pass 0 only
        when no concurrent writer can exist (tests, single-writer
        maintenance windows).

        Cost when there is nothing to do: one control-plane listdir — the
        full manifest-history read happens only when unreferenced
        candidates exist."""
        mf = self.latest_manifest()
        if mf is None:
            return []
        live_latest = self._referenced_dirs([mf])
        names = [f"data/{n}" for n in self.fs.listdir(f"{self.path}/data")]
        candidates = [d for d in names if d not in live_latest]
        if not candidates:
            return []
        referenced = self._referenced_dirs(self.history())
        now = time.time()
        removed: list[str] = []
        for rel in candidates:
            if rel in referenced:
                continue  # older version still time-travel readable
            try:
                age = now - self.fs.mtime(f"{self.path}/{rel}")
            except Exception:  # pragma: no cover - raced deletion etc.
                continue
            if age >= older_than_seconds:
                self.fs.delete_tree(f"{self.path}/{rel}")
                removed.append(rel)
        return removed

    def restore(
        self, version: int | None = None, as_of_timestamp: float | None = None
    ) -> int:
        """Roll the table back to an earlier committed state (the Delta
        ``RESTORE TABLE ... TO VERSION AS OF`` analog) by committing a NEW
        version that references the old version's segments verbatim — no
        data is copied or rewritten, and the rolled-back-over versions stay
        in history (time-travel-readable, vacuumable later). Requires the
        restored version's segment dirs to still exist (i.e. not vacuumed);
        raises FileNotFoundError otherwise rather than committing a
        manifest that cannot be read. Returns the new version number.
        """
        if version is None:
            if as_of_timestamp is None:
                raise ValueError("restore needs version or as_of_timestamp")
            version = self.version_at_timestamp(as_of_timestamp)
        try:
            src = self.manifest_at(version)
        except FileNotFoundError:
            # vacuum() deletes old manifests together with their segment
            # dirs — surface the operational cause, not a raw ENOENT
            raise FileNotFoundError(
                f"cannot restore {self.path} to v{version}: that version's "
                "manifest was vacuumed"
            )
        cur = self.latest_manifest()
        if cur is None:
            raise FileNotFoundError(f"LakeTable does not exist: {self.path}")
        missing = [
            d
            for d in sorted(self._referenced_dirs([src]))
            if not self.fs.isdir(f"{self.path}/{d}")
        ]
        if missing:
            raise FileNotFoundError(
                f"cannot restore {self.path} to v{version}: segment dirs "
                f"{missing} were vacuumed"
            )
        # Adopt the restored layout BEFORE committing: _commit injects the
        # instance's current bucket layout into any manifest whose
        # ``bucketing`` is None, so restoring an UNBUCKETED version from an
        # instance currently bucketed would stamp the live bucket config
        # onto plain-directory segments — every later writer would then
        # prune merges against bucket dirs that don't exist. A commit
        # failure (lost CAS race) rolls the instance layout back.
        old_layout = (self.bucket_pk, self.n_buckets, list(self.partition_by))
        self.partition_by = list(src.partition_by)
        if src.bucketing:
            self.bucket_pk = src.bucketing["pk"]
            self.n_buckets = int(src.bucketing["n"])
        elif self.partition_by != [BUCKET_COL]:
            self.bucket_pk = None
        try:
            self._commit(
                Manifest(
                    version=cur.version + 1,
                    partition_by=list(src.partition_by),
                    segments=[
                        Segment(
                            s.dir, s.partitions, stats=s.stats, rows=s.rows,
                            files=s.files, dv=list(s.dv or []),
                            owns_all=s.owns_all,
                        )
                        for s in src.segments
                    ],
                    operation="restore",
                    timestamp=time.time(),
                    metrics={"restored_version": version},
                    bucketing=src.bucketing,
                )
            )
        except Exception:
            self.bucket_pk, self.n_buckets, self.partition_by = (
                old_layout[0], old_layout[1], list(old_layout[2])
            )
            raise
        return cur.version + 1

    def vacuum(
        self, retain_last: int = 1, retain_seconds: float | None = None
    ) -> list[str]:
        """Delete segment dirs + manifests not referenced by the newest
        ``retain_last`` versions (the version-count analog of Delta's
        time-based VACUUM retention). Default 1 keeps only the current
        version — time travel resets; pass a larger value to keep a
        rollback/debugging horizon. Values < 1 are clamped to 1 (the
        current version is never droppable).

        ``retain_seconds`` additionally keeps every version committed
        within the last that many seconds (the Delta ``RETAIN N HOURS``
        semantics) — the two retention rules union, so passing both keeps
        whichever horizon is longer."""
        retain_last = max(1, int(retain_last))
        history = self.history()
        if not history:
            return []
        keep = sorted(history, key=lambda m: m.version, reverse=True)[:retain_last]
        if retain_seconds is not None:
            cutoff = time.time() - retain_seconds
            kept_v = {m.version for m in keep}
            keep += [
                m for m in history if m.timestamp >= cutoff and m.version not in kept_v
            ]
        live = self._referenced_dirs(keep)
        keep_manifests = {f"v{m.version:05d}.json" for m in keep}
        removed = []
        for name in self.fs.listdir(f"{self.path}/data"):
            rel = f"data/{name}"
            if rel not in live:
                self.fs.delete_tree(f"{self.path}/{rel}")
                removed.append(rel)
        for name in self.fs.listdir(self._manifest_dir):
            if name.endswith(".json") and name not in keep_manifests:
                self.fs.delete_file(f"{self._manifest_dir}/{name}")
        return removed

    @staticmethod
    def _referenced_dirs(manifests: Sequence[Manifest]) -> set[str]:
        """Every data-relative dir a set of manifests keeps alive: the
        segment dirs AND the deletion-vector dirs their segments reference
        (a standalone delete_keys dir is data a read depends on exactly
        like a segment — vacuuming it would resurrect deleted rows)."""
        out: set[str] = set()
        for m in manifests:
            for s in m.segments:
                out.add(s.dir)
                for entry in s.dv or []:
                    out.add(entry["dir"])
        return out

    def stats_summary(self, version: int | None = None) -> dict[str, dict]:
        """Table-level per-column bounds folded from the manifest's
        per-segment statistics — pure control-plane (no data scan, no
        Spark job): {col: {"min": v, "max": v, "t": kind}}.

        The bounds are CONSERVATIVE (a superset interval of the live
        values): deletion vectors and partition-ownership handoffs only
        remove rows from a segment, so the recorded write-time min/max
        still bound whatever survives. A column missing stats in any
        segment is omitted (unknown). This is the engine's answer to
        "what's the watermark ceiling / key range of this table" without
        touching data — the same query Delta answers from file stats."""
        mf = self.manifest_at(version) if version is not None else self.latest_manifest()
        if mf is None:
            raise FileNotFoundError(f"LakeTable does not exist: {self.path}")
        cols: set[str] = set()
        for s in mf.segments:
            cols.update((s.stats or {}).keys())
        out: dict[str, dict] = {}
        for c in cols:
            lo = hi = kind = None
            ok = True
            for s in mf.segments:
                e = (s.stats or {}).get(c)
                if e is None:
                    ok = False
                    break
                if e.get("min") is None and e.get("max") is None:
                    continue  # all-NULL segment contributes no bounds
                kind = kind or e.get("t")
                try:
                    if e.get("t") == "num":
                        mn, mx = float(e["min"]), float(e["max"])
                    else:
                        mn, mx = str(e["min"]), str(e["max"])
                    lo = mn if lo is None else min(lo, mn)
                    hi = mx if hi is None else max(hi, mx)
                except (TypeError, ValueError):
                    ok = False
                    break
            if ok and kind is not None:
                out[c] = {"min": lo, "max": hi, "t": kind}
        return out

    def history(self) -> list[Manifest]:
        d = self._manifest_dir
        return [
            Manifest.from_json(self.fs.read_text(f"{d}/{f}"))
            for f in self.fs.listdir(d)
            if f.endswith(".json")
        ]
