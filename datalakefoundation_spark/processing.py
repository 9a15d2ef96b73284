"""Processing — the main bronze->silver entry point (Processing.scala:34-351).

Composes: bronze slice read (S1/S2) -> pipeline P1-P11 -> cache ->
watermark capture/lookup -> strategy dispatch (Full / Merge / Historic) ->
watermark write -> summary log -> unpersist.

The single lazy transform chain is built once and cached; the (at most) four
actions — isEmpty, watermark max-agg, distinct partition values, and the
strategy's own writes/aggregations — reuse the cached slice
(Processing.scala:93-121 "Combine all transformations ... before any actions").
"""

from __future__ import annotations

import datetime as _dt
import logging
import time
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from datalakefoundation_spark import pipeline as P
from datalakefoundation_spark import strategies as S
from datalakefoundation_spark.core.exceptions import (
    ConstraintViolationException,
    DatalakeException,
    DuplicateBusinesskeyException,
)
from datalakefoundation_spark.core.normalize import schema_compare
from datalakefoundation_spark.log import DatalakeLogManager
from datalakefoundation_spark.logging_ import ProcessingSummary
from datalakefoundation_spark.metadata.models import Entity, Metadata
from datalakefoundation_spark.tables.lake_table import (
    BUCKET_COL,
    MASK_COL,
    LakeTable,
    bucket_expr,
    segment_may_match,
)
from datalakefoundation_spark.watermark import (
    WatermarkStore,
    build_watermark_values,
    build_window_condition,
    build_window_spec,
)

logger = logging.getLogger(__name__)


class Processing:
    def __init__(
        self,
        spark: SparkSession,
        metadata: Metadata,
        entity: Entity | int,
        slice_file: str,
        options: dict[str, Any] | None = None,
    ) -> None:
        self.spark = spark
        self.metadata = metadata
        self.entity = metadata.get_entity(entity) if isinstance(entity, int) else entity
        self.slice_file = slice_file
        self.options = options or {}
        env = metadata.environment

        self.prefix = env.systemfield_prefix
        self.pk_name = f"PK_{self.entity.destination}"
        self.output = self.entity.get_output()
        settings = self.entity.merged_settings()
        self.delete_missing = bool(
            self.options.get("delete_missing", settings.get("delete_missing", False))
        )
        # same option-over-setting precedence as every sibling toggle
        self.check_duplicates = bool(
            self.options.get("check_duplicates", settings.get("check_duplicates", True))
        )
        # Write mode for merge/historic runs: "cow" (default — rewrite the
        # touched partitions/buckets, the reference's Delta copy-on-write
        # MERGE shape) or "mor" (merge-on-read: append only the changed
        # rows as a patch segment and mask superseded versions with a
        # deletion-vector ref, lake_table.merge_patch). MoR writes
        # O(changed rows) per run regardless of table size — the right
        # trade for trickle/streaming ingestion into huge tables — at the
        # cost of one small anti-join per live patch on reads until
        # auto-compaction folds them.
        self.write_mode = str(
            self.options.get("write_mode", settings.get("write_mode", "cow"))
        ).lower()
        if self.write_mode not in ("cow", "mor"):
            raise DatalakeException(f"write_mode must be cow|mor: {self.write_mode}")
        # CHECK constraints (Delta analog, rebuild addition): list of
        # {"name", "expression" (SQL boolean over post-pipeline columns),
        # "action": "fail" (default) | "drop"}. SQL CHECK semantics: a row
        # violates only when the expression is FALSE — NULL passes.
        # Violations are counted inside the fused bookkeeping aggregate
        # (zero extra scan); 'fail' aborts the run before any write,
        # 'drop' excludes the rows from the slice (and from watermarks,
        # partition sets, and counts).
        self.constraints = list(
            self.options.get("constraints", settings.get("constraints", [])) or []
        )
        for c in self.constraints:
            if "expression" not in c:
                raise DatalakeException(f"constraint missing 'expression': {c}")
            c.setdefault("name", c["expression"])
            c.setdefault("action", "fail")
            if c["action"] not in ("fail", "drop"):
                raise DatalakeException(f"constraint action must be fail|drop: {c}")
        # Additive schema evolution (Delta mergeSchema analog): a column the
        # bronze slice carries but silver lacks is ADDED to the target on
        # merge/historic runs (existing rows/versions read typed NULLs)
        # instead of warn-and-drop. Off by default — reference parity is
        # drop + warn (core/normalize schema_compare).
        self.schema_evolution_additive = bool(
            self.options.get(
                "schema_evolution.additive",
                settings.get("schema_evolution.additive", False),
            )
        )
        # processing.time override: invalid ISO -> error log + now; "now" is
        # computed in environment.timezone (Processing.scala:58-73,
        # Environment.scala:42-43), not the driver host's local zone.
        override = self.options.get("processing.time")
        if override:
            try:
                _dt.datetime.fromisoformat(override)
                self.processing_time = override
            except ValueError:
                logger.error("invalid processing.time %r; using now()", override)
                self.processing_time = env.now().isoformat(sep=" ", timespec="seconds")
        else:
            self.processing_time = env.now().isoformat(sep=" ", timespec="seconds")

        # no root_folder -> no system tables; a store rooted at "" would
        # resolve to the filesystem root ("/system/watermark")
        self.watermark_store = (
            WatermarkStore(spark, env.root_folder) if env.root_folder else None
        )
        self.log_sink: DatalakeLogManager | None = None
        if env.root_folder:
            self.log_sink = DatalakeLogManager.for_environment(spark, env)

        # PK-hash bucketing for unpartitioned entities: incremental merges
        # then rewrite only the buckets present in the slice instead of the
        # whole table (segment-level copy-on-write). Size-aware: the actual
        # bucket count is sized from the data (one bucket per
        # ``bucketing.rows_per_bucket`` rows, capped at ``bucketing.buckets``)
        # when the table is created or fully overwritten, so a 10k-row table
        # stays a plain directory (no 32-dir small-file tax on every merge)
        # while a large one keeps touched-buckets-only copy-on-write.
        # ``bucketing.buckets = 0`` disables entirely.
        self.n_buckets = self._bucket_cap = int(
            self.options.get("bucketing.buckets", settings.get("bucketing.buckets", 32))
        )
        self.rows_per_bucket = int(
            self.options.get(
                "bucketing.rows_per_bucket", settings.get("bucketing.rows_per_bucket", 50_000)
            )
        )
        self._bucketed = bool(
            not self.entity.partition_columns and self.entity.businesskeys and self.n_buckets > 0
        )
        # Layout resolution: an existing table's recorded layout wins over the
        # configured one (the modulus is baked into the stored dirs); a table
        # that doesn't exist yet defers the choice until the slice row count
        # is known (the fused bookkeeping agg in get_source).
        self._layout_pending = False
        if not self.entity.partition_columns and self.entity.businesskeys:
            t = self.silver_table()
            if t.exists():
                self._bucketed = t.bucket_pk is not None
                self.n_buckets = t.n_buckets
            elif self._bucketed:
                self._layout_pending = True

        self._cached_source: DataFrame | None = None
        self._slice_count: int = 0
        self._new_watermarks: dict[str, tuple[str, str | None]] = {}
        self._stored_watermarks: dict[str, str | None] = {}
        self._partition_values: list[dict[str, str]] = []
        self._bucket_values: list[int] = []

    # ------------------------------------------------------------ source
    # The pipeline is compute-heavy (two sha256 passes over every column),
    # so a slice should spread at roughly one task per ~2 MB of compressed
    # parquet; below that the repartition round-trip costs more than it buys.
    _BYTES_PER_TASK = 2 << 20

    def _read_bronze(self) -> DataFrame:
        loc = self.output.bronzepath
        if loc.kind == "table":
            df = self.spark.read.table(loc.value)
            return df  # slice filter applied by pipeline P5 (filter_to_slice)
        slice_path = f"{loc.value}/{self.slice_file}"
        df = self.spark.read.parquet(slice_path)
        # Parquet can't split inside a row group, so a slice written as few
        # fat single-row-group files caps the whole pipeline's parallelism
        # no matter how many cores exist. When the byte size warrants more
        # tasks than there are files, fan out explicitly. At 100 TB slices
        # arrive as many files/row-groups and this is a no-op; the driver-side
        # FS probe costs ~ms either way.
        try:
            jvm = self.spark._jvm
            jpath = jvm.org.apache.hadoop.fs.Path(slice_path)
            fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
            n_bytes = fs.getContentSummary(jpath).getLength()
            cores = self.spark.sparkContext.defaultParallelism
            target = min(cores, int(n_bytes // self._BYTES_PER_TASK))
            if target > 1 and len(df.inputFiles()) < target:
                df = df.repartition(target)
        except Exception:  # pragma: no cover - FS probe is best-effort
            pass
        return df

    def get_source(self, historic: bool = False) -> DataFrame:
        """Build the transform chain once, cache, run the bookkeeping actions,
        memoize (Processing.scala:84-121)."""
        if self._cached_source is not None:
            return self._cached_source
        e = self.entity
        df = self._read_bronze()
        df = P.apply_pipeline(
            df,
            destination=e.destination,
            businesskeys=e.businesskeys,
            transformations=[t.expressions for t in e.transformations],
            calculated=e.calculated_columns,
            casts=e.casts,
            renames=e.renames,
            slice_name=self.slice_file,
            processing_time=self.processing_time,
            prefix=self.prefix,
            historic=historic,
            bronze_is_table=self.output.bronzepath.kind == "table",
            # the guard is deferred and run below on the CACHED slice — as
            # an inline plan-build action it would scan bronze + P1-P5 twice
            check_duplicates=False,
        )
        # CHECK-constraint flags ride the plan so the cache holds them once;
        # violating rows stay OUT of every bookkeeping result below
        viols: dict[str, Any] = {}
        kept = F.lit(True)
        if self.constraints:
            for c in self.constraints:
                v = ~F.coalesce(F.expr(c["expression"]), F.lit(True))
                viols[c["name"]] = v
                kept = kept & ~v
        df = df.cache()
        # ONE bookkeeping action over the cached slice (it also populates
        # the cache): row count (empty check + Full metrics), watermark max
        # per column, the distinct partition-value set, and constraint
        # violation counts — the reference runs the first three as separate
        # jobs (Processing.scala:109,123-135,144-156); at 100 TB fusing them
        # means a single scan.
        wm_cols = [w.column_name for w in e.watermarks if w.column_name in df.columns]
        aggs = [F.sum(kept.cast("long")).alias("__n")]
        aggs += [F.max(F.when(kept, F.col(c))).alias(f"__wm_{c}") for c in wm_cols]
        aggs += [F.sum(v.cast("long")).alias(f"__viol_{i}") for i, v in enumerate(viols.values())]
        # duplicate-key EXISTENCE rides the same action (r11): PK groups =
        # distinct non-NULL PKs + one NULL group; duplicates exist iff
        # groups < kept rows — exactly check_duplicate_keys' groupBy cnt>1
        # condition, without its second scan-and-shuffle job. The detailed
        # guard (sample keys for the error message) runs only on the
        # failure path. count_distinct is exact; same pk-set shuffle volume
        # the guard job paid, one fewer pass over the slice.
        dup_fused = bool(self.check_duplicates and e.businesskeys)
        if dup_fused:
            pk = F.col(self.pk_name)
            aggs.append(F.count_distinct(F.when(kept, pk)).alias("__pk_d"))
            aggs.append(
                F.max((kept & pk.isNull()).cast("int")).alias("__pk_null")
            )
        if e.partition_columns:
            aggs.append(
                F.collect_set(
                    # when() yields NULL for dropped rows; collect_set skips NULLs
                    F.when(
                        kept,
                        F.struct(*[F.col(c).cast("string").alias(c) for c in e.partition_columns]),
                    )
                ).alias("__pvs")
            )
        elif self._bucketed and not self._layout_pending:
            # bucket ids of an about-to-be-created table are useless (no
            # target dirs to prune yet) and the modulus isn't even decided —
            # only collect them against a committed layout
            aggs.append(
                F.collect_set(
                    F.when(kept, bucket_expr(self.pk_name, self.n_buckets))
                ).alias("__bkts")
            )
        collected_buckets = self._bucketed and not self._layout_pending
        row = df.agg(*aggs).head()
        if viols:
            counts = {
                name: int(row[f"__viol_{i}"] or 0)
                for i, name in enumerate(viols.keys())
            }
            failing = {
                c["name"]: counts[c["name"]]
                for c in self.constraints
                if c["action"] == "fail" and counts[c["name"]] > 0
            }
            if failing:
                raise ConstraintViolationException(
                    f"entity {e.destination}: slice {self.slice_file} violates "
                    f"CHECK constraints {failing}"
                )
            dropped = {k: v for k, v in counts.items() if v > 0}
            if dropped:
                logger.warning(
                    "entity %s: dropping constraint-violating rows %s",
                    e.destination, dropped,
                )
            # downstream consumers see only clean rows (filter over the
            # populated cache — no recompute)
            df = df.where(kept)
        self._slice_count = int(row["__n"] or 0)
        if dup_fused:
            groups = int(row["__pk_d"] or 0) + int(row["__pk_null"] or 0)
            if groups < self._slice_count:
                # failure path only: the detailed guard re-scans the cached
                # slice to sample offending keys for the exception message
                P.check_duplicate_keys(
                    df, e.destination, e.businesskeys, pk_col=self.pk_name
                )
                raise DuplicateBusinesskeyException(  # pragma: no cover
                    f"Duplicate businesskeys in slice for {e.destination}"
                )
        if self._layout_pending:
            self._resolve_layout(self._slice_count)
        if self._slice_count == 0:
            logger.warning("slice %s for entity %s is empty", self.slice_file, e.name)
        self._new_watermarks = {
            c: (type(row[f"__wm_{c}"]).__name__,
                None if row[f"__wm_{c}"] is None else str(row[f"__wm_{c}"]))
            for c in wm_cols
        }
        self._stored_watermarks = (
            self.watermark_store.latest(e.id) if self.watermark_store else {}
        )
        if e.partition_columns:
            self._partition_values = [pv.asDict() for pv in row["__pvs"]]
        elif collected_buckets:
            self._bucket_values = sorted(row["__bkts"])
        self._cached_source = df
        return df

    def _derive_bucket_n(self, rows: int) -> int:
        """Size-aware bucket count: one bucket per ``bucketing.rows_per_bucket``
        rows, capped at ``bucketing.buckets``; <=1 means plain directory."""
        if not self.rows_per_bucket:
            return self._bucket_cap
        return min(self._bucket_cap, rows // self.rows_per_bucket)

    def _apply_layout(self, rows: int) -> None:
        """Apply the size-derived layout to the silver table (shared by
        create-time resolution and full-overwrite re-derivation, so the two
        moments can never disagree for the same row count)."""
        n = self._derive_bucket_n(rows)
        if n <= 1:
            self._bucketed = False
            self.silver_table().set_layout(None, 0, force=True)
            logger.info(
                "entity %s: %d rows below bucketing threshold (rows_per_bucket=%d)"
                " — plain-directory layout", self.entity.destination, rows,
                self.rows_per_bucket,
            )
        else:
            t = self.silver_table()
            t.set_layout(self.pk_name, int(n), force=True)
            # honor what the backend actually adopted: a minimal backend
            # (tables/backend.py) may decline PK-hash bucketing, and the
            # engine must then run plain-layout merges, not prune against
            # bucket dirs that don't exist
            self._bucketed = t.bucket_pk is not None
            self.n_buckets = t.n_buckets if self._bucketed else 0

    def _resolve_layout(self, rows: int) -> None:
        """Pick the layout for a table about to be created from the actual
        slice size. Below ~2 buckets the layout degrades to a plain
        directory — on a small table the per-merge bucket-dir small-file tax
        costs more than touched-bucket copy-on-write saves. The choice is
        recorded in the table manifest and sticky thereafter; a later full
        overwrite of a grown table re-derives it (the overwrite rebuilds
        every directory anyway).

        An EMPTY first slice carries zero size information — honor the
        configured cap instead of pinning the table to a plain directory a
        merge-only entity could never escape (merges never re-derive)."""
        if rows > 0:
            self._apply_layout(rows)
        self._layout_pending = False

    # ------------------------------------------------------------ watermark
    def current_watermarks(self) -> dict[str, str | None]:
        """The slice's new max per watermark column (future bookmark)."""
        return {c: v for c, (_t, v) in self._new_watermarks.items()}

    def previous_watermarks(self) -> dict[str, str | None]:
        return build_watermark_values(self.entity.watermarks, self._stored_watermarks)

    def delete_window(self, qualifier: str = "t.", target: DataFrame | None = None):
        """Inclusive previous<=col<=current window + partition IN-list for
        whenNotMatchedBySource scoping (ProcessStrategy.scala:67-153).

        The predicate resolves against the TARGET side of the merge join, so
        a watermark column must exist there too — a column newly added to
        bronze but absent from the existing silver table is skipped (same
        missing-column rule the reference applies), not referenced into an
        AnalysisException. Pass ``target`` to enforce that."""
        src = self.get_source()
        fields = list(src.schema.fields)
        if target is not None:
            tcols = set(target.columns)
            fields = [f for f in fields if f.name in tcols]
        cond = build_window_condition(
            type(src.schema)(fields),
            self.entity.watermarks,
            self.previous_watermarks(),
            self.current_watermarks(),
            qualifier=qualifier,
        )
        if cond is None:
            # No buildable watermark window -> no delete inference at all;
            # a partition IN-list alone must not widen the scope (safe
            # default, ProcessStrategy.scala:100-112).
            return None
        pcond = None
        if self._partition_values:
            pcond = F.lit(False)
            for pv in self._partition_values:
                c = F.lit(True)
                for k, v in pv.items():
                    qcol = F.col(f"{qualifier}{k}")
                    # NULL partition value: equality to lit(None) never
                    # matches — test isNull explicitly
                    c = c & (qcol.isNull() if v is None else (qcol.cast("string") == F.lit(v)))
                pcond = pcond | c
        return cond if pcond is None else (cond & pcond)

    def delete_window_spec(self, target: DataFrame | None = None):
        """Interval form of ``delete_window`` for segment-stats data skipping
        (same schema/field filtering, see watermark.build_window_spec).
        Returns None exactly when ``delete_window``'s core condition would."""
        src = self.get_source()
        fields = list(src.schema.fields)
        if target is not None:
            tcols = set(target.columns)
            fields = [f for f in fields if f.name in tcols]
        return build_window_spec(
            type(src.schema)(fields),
            self.entity.watermarks,
            self.previous_watermarks(),
            self.current_watermarks(),
        )

    # ------------------------------------------------------------ silver table
    def silver_table(self):  # -> LakeTable | any tables.backend-conformant backend
        # memoized: each construction costs a control-plane manifest read
        # (layout adoption), and a run calls this from 5+ sites
        if getattr(self, "_silver_table", None) is not None:
            return self._silver_table
        loc = self.output.silverpath
        env = self.metadata.environment
        if loc.kind == "table":
            # catalog output maps to a managed location under the root folder
            path = f"{env.root_folder}/_catalog/{loc.value.replace('.', '/')}"
        else:
            path = loc.value
        # backend seam (tables/backend.py): a factory in options swaps the
        # storage engine under Full/Merge/Historic without touching them —
        # the contract test runs both LakeTable and MemoryBackend through
        # identical histories
        factory = self.options.get("backend_factory")
        if factory is not None:
            self._silver_table = factory(
                spark=self.spark,
                path=path,
                partition_by=self.entity.partition_columns,
                stats_columns=[w.column_name for w in self.entity.watermarks]
                + list(self.entity.businesskeys or []),
            )
            return self._silver_table
        self._silver_table = LakeTable(
            self.spark,
            path,
            self.entity.partition_columns,
            bucket_pk=self.pk_name if self._bucketed else None,
            n_buckets=self.n_buckets,
            # the engine sizes bucket layout adaptively, so a stored layout
            # differing from the configured cap is expected, not a misconfig
            warn_on_layout_mismatch=False,
            # per-segment min/max stats for the entity's watermark +
            # businesskey columns — recorded free (df.observe during the
            # write) and used to skip segments that can't intersect a
            # delete-inference window (Delta file-skipping parity)
            stats_columns=[w.column_name for w in self.entity.watermarks]
            + list(self.entity.businesskeys or []),
        )
        return self._silver_table

    def register_silver_in_catalog(self) -> None:
        """Catalog output (K2, Full.scala:51-66): CREATE DATABASE IF NOT
        EXISTS + expose the silver table under its catalog name as a
        PERSISTENT view whose SQL is self-contained (explicit parquet paths
        + partition-ownership filters, no temp objects). Any session sharing
        the catalog reads ``db.tbl``; with a Hive metastore configured the
        view also survives JVM restarts. Delta's saveAsTable is not
        available here (no Delta jars), so the view IS the catalog entry —
        data stays in the versioned LakeTable, and re-registration after
        each commit pins the view to the new manifest version."""
        loc = self.output.silverpath
        if loc.kind != "table":
            return
        parts = loc.value.split(".")
        db = parts[0] if len(parts) > 1 else "default"
        tbl = parts[-1]
        # backtick-quote: catalog names may carry non-identifier chars
        # (e.g. 'sales-mart.orders') and this runs post-commit — a parse
        # failure here must not be reachable via config
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
        self.spark.sql(
            f"CREATE OR REPLACE VIEW `{db}`.`{tbl}` AS {self.silver_table().to_view_sql()}"
        )

    def is_first_run(self) -> bool:
        """Only a cleanly-absent table counts as first run; a present-but-
        unreadable manifest re-raises (ProcessStrategy.scala:44-65 — data
        safety: never accidentally divert to a full overwrite)."""
        table = self.silver_table()
        try:
            return not table.exists()
        except Exception as exc:  # corrupt manifest etc.
            raise DatalakeException(
                f"cannot determine first-run state for {table.path}: {exc}"
            ) from exc

    # ------------------------------------------------------------ process
    def process(self, strategy: str | None = None) -> ProcessingSummary:
        strategy = (strategy or self.entity.process_strategy).lower()
        if strategy == "delta":
            strategy = "merge"
        started = time.time()
        if self.log_sink:
            self.log_sink.log(
                "Processing started",
                run_id=f"{self.entity.id}",
                data={"entity": self.entity.to_json(), "slice": self.slice_file},
            )
        try:
            if strategy == "full":
                summary = self._process_full()
            elif strategy == "merge":
                summary = self._process_merge()
            elif strategy == "historic":
                summary = self._process_historic()
            else:
                raise DatalakeException(f"unknown strategy: {strategy}")
            summary.duration_ms = (time.time() - started) * 1000
            self._write_watermarks()
            self._maybe_auto_optimize()
            self._gc_orphans()
            self.register_silver_in_catalog()
            if self.log_sink:
                self.log_sink.log_summary(summary)
            return summary
        finally:
            if self._cached_source is not None:
                self._cached_source.unpersist()
            if self.log_sink:
                self.log_sink.flush()

    # Default auto-compaction threshold for UNPARTITIONED entities: kicks in
    # once incremental runs have stacked this many live segments. 32 keeps
    # read-side file listing and version fan-out bounded while compacting
    # rarely enough (once per ~32 runs) that its full-rewrite cost amortizes
    # to ~3% of steady-state ingest work.
    AUTO_OPTIMIZE_DEFAULT = 32

    def _maybe_auto_optimize(self) -> None:
        """Table maintenance inside the ingestion loop: when repeated
        incremental runs have accumulated more than
        ``maintenance.auto_optimize`` segments (entity setting or run
        option), compact them (and vacuum) so read-side file listing and
        row-group sizes stay healthy without a separate maintenance job.

        ON BY DEFAULT for unpartitioned entities (threshold
        ``AUTO_OPTIMIZE_DEFAULT``; set the option/setting to 0 to disable)
        — a long-running incremental entity self-compacts without operator
        action. Partitioned entities stay opt-in: ``optimize()`` rewrites
        the WHOLE table, which for a large partitioned entity is exactly
        the cost partition-pruned merges exist to avoid. Note the
        compaction's ``vacuum()`` drops older versions — time travel for
        the entity resets at each auto-compaction."""
        settings = self.entity.merged_settings()
        threshold = self.options.get(
            "maintenance.auto_optimize", settings.get("maintenance.auto_optimize")
        )
        if threshold is None and not self.entity.partition_columns:
            threshold = self.AUTO_OPTIMIZE_DEFAULT
        if not threshold:
            return
        table = self.silver_table()
        mf = table.latest_manifest()
        if mf is None or len(mf.segments) <= int(threshold):
            return
        cluster = [c for c in (settings.get("maintenance.cluster_by") or [])]
        logger.info(
            "auto-optimize %s: %d segments > %s", self.entity.destination,
            len(mf.segments), threshold,
        )
        # A full rewrite is also the moment a merge-only entity's layout
        # catches up with its actual size (full overwrites re-derive in
        # _process_full; merges never do). One count() against the table is
        # trivial next to the rewrite, and optimize() recomputes bucket ids
        # from the new layout.
        did_layout = False
        if not self.entity.partition_columns and self.entity.businesskeys and self._bucket_cap > 0:
            total_rows = table.read().count()
            if total_rows > 0:
                n = self._derive_bucket_n(total_rows)
                new_layout = (self.pk_name, int(n)) if n > 1 else (None, 0)
                if new_layout != (table.bucket_pk, table.n_buckets if table.bucket_pk else 0):
                    logger.info(
                        "auto-optimize %s: re-deriving layout for %d rows -> %s",
                        self.entity.destination, total_rows, new_layout,
                    )
                    table.set_layout(*new_layout, force=True)
                    self._bucketed = new_layout[0] is not None
                    if self._bucketed:
                        self.n_buckets = new_layout[1]
                    did_layout = True
        retain = int(
            self.options.get(
                "maintenance.vacuum_retain", settings.get("maintenance.vacuum_retain", 1)
            )
        )
        # Layout changes and clustering need the full rewrite; otherwise
        # fold ONLY the small-segment tail (incremental compaction — at
        # scale a full optimize to fold micro-batch segments would rewrite
        # the whole table). No vacuum when nothing was folded.
        if did_layout or cluster:
            table.optimize(
                cluster_by=cluster,
                # 2+ cluster columns: maintenance.zorder (default true)
                # interleaves them so file stats prune on every dimension;
                # a single column keeps the strictly-better range sort
                zorder=len(cluster) >= 2
                and bool(
                    self.options.get(
                        "maintenance.zorder", settings.get("maintenance.zorder", True)
                    )
                ),
            )
            table.vacuum(retain_last=retain)
        else:
            folded = table.compact_small_segments(
                # "smaller than one bucket's worth" unless overridden
                small_rows=int(
                    self.options.get(
                        "maintenance.compact_small_rows",
                        settings.get(
                            "maintenance.compact_small_rows",
                            max(1, self.rows_per_bucket or 100_000),
                        ),
                    )
                )
            )
            if folded:
                logger.info(
                    "auto-optimize %s: folded %d small segments",
                    self.entity.destination, len(folded),
                )
                table.vacuum(retain_last=retain)

    def _gc_orphans(self) -> None:
        """Maintenance sweep for crash leftovers: a prior writer that died
        between segment write and manifest commit leaves an orphaned
        ``data/v*`` dir no manifest references. Swept after every
        successful run; the age guard (``maintenance.gc_orphans_age``
        seconds, default 1h, negative disables) keeps the sweep from
        racing a concurrent in-flight writer. No-op cost is one
        control-plane listdir (LakeTable.gc_orphans)."""
        settings = self.entity.merged_settings()
        age = float(
            self.options.get(
                "maintenance.gc_orphans_age", settings.get("maintenance.gc_orphans_age", 3600.0)
            )
        )
        if age < 0:
            return
        try:
            removed = self.silver_table().gc_orphans(older_than_seconds=age)
        except Exception as exc:  # pragma: no cover - best-effort maintenance
            logger.warning("orphan GC for %s failed: %s", self.entity.destination, exc)
            return
        if removed:
            logger.info(
                "orphan GC for %s reclaimed %d crash-leftover segment dirs: %s",
                self.entity.destination, len(removed), removed,
            )

    def _write_watermarks(self) -> None:
        # never clobber a stored bookmark with null (empty slice)
        values = {c: tv for c, tv in self._new_watermarks.items() if tv[1] is not None}
        if values and self.watermark_store:
            self.watermark_store.write(self.entity.id, values)
        elif values:
            logger.warning(
                "no root_folder configured; watermark values %s not persisted",
                sorted(values),
            )

    # ------------------------------------------------------------ strategies
    def _process_full(self, historic: bool = False) -> ProcessingSummary:
        source = self.get_source(historic=historic)
        n = self._slice_count  # from the fused bookkeeping agg — no extra job
        table = self.silver_table()
        # a full overwrite of an unpartitioned table rebuilds every directory,
        # so it's the one safe moment to re-derive the size-aware bucket
        # layout for a table that has grown (or shrunk) past the threshold
        if (
            not self.entity.partition_columns
            and self.entity.businesskeys
            and table.exists()
            and self._bucket_cap > 0
            and n > 0  # empty slice says nothing about the table's future size
        ):
            self._apply_layout(n)
        table.overwrite(
            source,
            dynamic=table.exists() and bool(self.entity.partition_columns),
            # total_rows feeds the merge-path layout catch-up (an
            # unpartitioned full load IS the whole table)
            metrics={"records_in_slice": n}
            | ({} if self.entity.partition_columns else {"total_rows": n}),
        )
        return ProcessingSummary(
            entity_id=self.entity.id,
            destination=self.entity.destination,
            strategy="full",
            records_in_slice=n,
            inserted=n,
            touched=n,
        )

    def _merge_like(self, historic: bool) -> ProcessingSummary:
        source = self.get_source(historic=historic)
        table = self.silver_table()
        mf = table.latest_manifest()
        # Layout catch-up for merge-only entities: a table created small
        # (plain directory) whose wholesale-rewrite merges have recorded a
        # grown total_rows upgrades to a bucketed layout NOW — this merge
        # rewrites every directory anyway, and merges would otherwise never
        # re-derive (full overwrites do it in _process_full).
        if (
            not self._bucketed
            and not self.entity.partition_columns
            and self.entity.businesskeys
            and self._bucket_cap > 0
            and mf is not None
            # mor runs append a patch, never the wholesale rewrite this
            # catch-up's premise requires — flipping the recorded layout
            # here would leave the base segment plain forever (layout
            # upgrades for mor tables happen in auto-optimize/optimize,
            # which DO rewrite)
            and self.write_mode != "mor"
        ):
            known_rows = int(mf.metrics.get("total_rows", 0) or 0)
            n = self._derive_bucket_n(known_rows)
            if n > 1:
                logger.info(
                    "entity %s: %d rows recorded — upgrading to %d-bucket "
                    "layout during this rewrite", self.entity.destination,
                    known_rows, n,
                )
                table.set_layout(self.pk_name, int(n), force=True)
                # honor the layout the backend actually adopted (a minimal
                # backend may decline bucketing — tables/backend.py)
                self._bucketed = table.bucket_pk is not None
                self.n_buckets = table.n_buckets if self._bucketed else 0
        # Bucket-level CoW only applies when every live segment declares its
        # buckets (a table created before bucketing was enabled has a
        # None-partitioned segment and must be rewritten wholesale once).
        bucketed = (
            self._bucketed
            and mf is not None
            and all(seg.partitions is not None for seg in mf.segments)
        )
        # Delete inference must see every target row (a slice-missing row can
        # live in any bucket), so an active delete window forces a full read
        # and rewrite — the same trade Delta makes: whenNotMatchedBySource
        # scans all files. Partitioned entities keep pruning because the
        # window itself is partition-scoped (ProcessStrategy.scala:67-153).
        # the window predicate resolves on the target side, so validate its
        # columns against the target schema (additive bronze drift must skip
        # the new column, not crash the merge)
        target_probe = table.read(keep_bucket=bucketed)
        window = (
            self.delete_window(target=target_probe) if self.delete_missing else None
        )
        bucket_values = list(self._bucket_values)
        if bucketed and window is not None:
            # Delete inference needs every target row that can fall inside
            # the watermark window (a slice-missing row can live in any
            # bucket). Per-segment min/max stats prove most segments can't
            # intersect the window, so the read/rewrite set is: slice
            # buckets + every bucket owned by a window-intersecting segment
            # (Delta file-skipping parity for whenNotMatchedBySource; the
            # old behavior was a full-table rewrite). Rows in those buckets
            # are read from ALL segments — replacement stays at bucket-value
            # granularity, so no segment's rows can be dropped. Segments
            # without recorded stats are conservatively window-intersecting.
            spec = self.delete_window_spec(target=target_probe)
            window_buckets: set[int] = set()
            prunable = spec is not None
            if prunable:
                for seg in mf.segments:
                    if not segment_may_match(seg.stats, spec):
                        continue
                    for pv in seg.partitions or []:
                        b = pv.get(BUCKET_COL)
                        if b is None:  # foreign layout — bail to full read
                            prunable = False
                            break
                        window_buckets.add(int(b))
                    if not prunable:
                        break
            if prunable:
                all_owned = {
                    int(pv[BUCKET_COL])
                    for seg in mf.segments
                    for pv in (seg.partitions or [])
                }
                bucket_values = sorted(set(bucket_values) | window_buckets)
                logger.info(
                    "delete-inference stats pruning for %s: reading %d/%d buckets",
                    self.entity.destination, len(bucket_values), len(all_owned),
                )
                target = target_probe
            else:
                bucketed = False
                target = table.read(keep_bucket=False)
        else:
            target = target_probe
        if bucketed and BUCKET_COL not in target.columns:
            bucketed = False
        if self._slice_count == 0 and window is None:
            # empty slice + no delete inference: the post-merge state is the
            # current state — skip the read-join-rewrite entirely (previously
            # only the bucketed path short-circuited; a partitioned or plain
            # table paid a full-table rewrite for a no-op slice)
            return ProcessingSummary(
                entity_id=self.entity.id,
                destination=self.entity.destination,
                strategy="historic" if historic else "merge",
            )
        drift = schema_compare(source, target.drop(BUCKET_COL) if bucketed else target)
        evolved: list[str] = []
        if drift["added"] and self.schema_evolution_additive:
            evolved = list(drift["added"])
            logger.info(
                "schema evolution for %s: adding columns %s to silver "
                "(existing rows read NULL)", self.entity.destination, evolved,
            )
        if (drift["added"] and not evolved) or drift["removed"]:
            logger.warning(
                "schema drift for %s: added=%s removed=%s",
                self.entity.destination,
                drift["added"],
                drift["removed"],
            )
        # pruning: only read/rewrite partitions (or PK-hash buckets) present
        # in the slice — at 100 TB this is what keeps an incremental merge
        # from rewriting the whole table
        pvs = self._partition_values
        if pvs:
            target_pruned = target.where(table._partition_filter(pvs))
        elif bucketed:
            target_pruned = target.where(
                F.col(BUCKET_COL).isin(bucket_values)
            ).drop(BUCKET_COL)
        else:
            target_pruned = target
        fn = S.scd2_state if historic else S.merge_state
        # target_rows hint for the adaptive join form: the manifest's
        # recorded total (an upper bound on any pruned read) — metadata,
        # not a count() action. Unknown (None, e.g. pre-metrics manifests)
        # falls back to the scale-safe decomposition.
        hint_rows = (
            int(mf.metrics.get("total_rows", 0) or 0) if mf is not None else 0
        )
        state = fn(
            target_pruned,
            source,
            self.pk_name,
            prefix=self.prefix,
            processing_time=self.processing_time,
            delete_window=window,
            delete_missing=self.delete_missing,
            with_action_column=True,
            extra_columns=evolved,
            target_rows=hint_rows or None,
            # slice size from the fused bookkeeping count (no extra job):
            # gates the full-outer form's SHUFFLE_HASH build side — an
            # oversized bootstrap slice must not become an unspillable
            # hash-map build (r12, ADVICE r11)
            source_rows=self._slice_count,
        )
        # Per-action counts are collected DURING the write via df.observe —
        # the merged state is computed exactly once and never cached. (The
        # reference reads Delta's merge operationMetrics, Merge.scala:124-127;
        # this is the same no-second-pass idea for a plain writer, and at
        # 100 TB it avoids materializing the post-merge state.)
        action_names = (
            ["new_version", "insert", "unchanged", "delete_close"]
            if historic
            else ["update", "touch", "soft_delete", "insert", "infer_delete", "skip_delete"]
        )
        obs = Observation()
        state = state.observe(
            obs,
            *[
                F.sum((F.col("__action") == a).cast("long")).alias(a)
                for a in action_names
            ],
            # rows actually landing in the table — recorded into wholesale
            # commits so the next merge can size the bucket layout without
            # an extra count job
            F.sum((F.col("__action") != "skip_delete").cast("long")).alias("__total_rows"),
        )
        # skip_delete rows (source deleted=true matching no target row) exist
        # only so the observe can count them like the reference does
        # (Merge.scala:35,92,132); they never land in the table.
        op = "historic" if historic else "merge"
        if self.write_mode == "mor":
            # Merge-on-read: write ONLY the changed/inserted rows; the
            # passthrough rows ("keep" / "unchanged" / "historical") stay in
            # their segments and the patch's key projection masks the
            # superseded versions (lake_table.merge_patch). A merge version
            # is keyed by PK; an SCD2 version by (PK, ValidFrom) — the
            # closed row keeps its ValidFrom, so the composite key masks
            # exactly the old open version. Inserts and new versions mask
            # nothing (flag false keeps the DV exact, and an SCD2 history
            # whose runs share one processing time cannot mask a sibling
            # version by accident).
            if historic:
                patch_actions = ["close", "delete_close", "new_version", "insert"]
                mask_actions = ["close", "delete_close"]
                keys = [self.pk_name, f"{self.prefix}ValidFrom"]
            else:
                patch_actions = ["update", "touch", "soft_delete", "insert", "infer_delete"]
                mask_actions = ["update", "touch", "soft_delete", "infer_delete"]
                keys = [self.pk_name]
            patch = (
                state.where(F.col("__action").isin(patch_actions))
                .withColumn(MASK_COL, F.col("__action").isin(mask_actions))
                .drop("__action")
            )
            table.merge_patch(
                patch,
                keys=keys,
                mask_col=MASK_COL,
                operation=op,
                metrics_fn=lambda: {
                    k: int(v or 0) for k, v in obs.get.items() if not k.startswith("__")
                },
            )
        else:
            final = state.where(F.col("__action") != "skip_delete").drop("__action")
            if pvs:
                table.replace_partitions(final, pvs, operation=op)
            elif bucketed:
                table.replace_partitions(
                    final,
                    [{BUCKET_COL: str(b)} for b in bucket_values],
                    operation=op,
                )
            else:
                table.overwrite(
                    final,
                    operation=op,
                    metrics_fn=lambda: {"total_rows": int(obs.get.get("__total_rows") or 0)},
                )
        counts = {k: (v or 0) for k, v in obs.get.items()}
        # records_in_slice is fully determined by the action counts —
        # no extra count() job over the source.
        if historic:
            n = (
                counts.get("new_version", 0)
                + counts.get("insert", 0)
                + counts.get("unchanged", 0)
            )
            return ProcessingSummary(
                entity_id=self.entity.id,
                destination=self.entity.destination,
                strategy="historic",
                records_in_slice=n,
                updated=counts.get("new_version", 0),
                unchanged=counts.get("unchanged", 0),
                inserted=n - counts.get("new_version", 0) - counts.get("unchanged", 0),
                deleted=counts.get("delete_close", 0),
                inferred_deletes=counts.get("delete_close", 0),
                touched=n,
            )
        # deleted = matched soft-deletes + unmatched-deleted source rows;
        # both count toward records_in_slice (Merge.scala:35,92,132)
        soft = counts.get("soft_delete", 0) + counts.get("skip_delete", 0)
        inserted = counts.get("insert", 0)
        n = counts.get("update", 0) + counts.get("touch", 0) + soft + inserted
        # identity: inserted + updated + deleted == records_in_slice
        # (PROCESSING_STRATEGIES.md:124-140); inferred deletes are outside
        # the slice so they are reported separately.
        return ProcessingSummary(
            entity_id=self.entity.id,
            destination=self.entity.destination,
            strategy="merge",
            records_in_slice=n,
            inserted=inserted,
            updated=n - inserted - soft,
            deleted=soft,
            inferred_deletes=counts.get("infer_delete", 0),
            touched=n,
        )

    def _process_merge(self) -> ProcessingSummary:
        if self.is_first_run():
            logger.info("first run for %s -> full load", self.entity.destination)
            return self._process_full()
        return self._merge_like(historic=False)

    def _process_historic(self) -> ProcessingSummary:
        if self.is_first_run():
            logger.info("first run for %s -> full load (historic)", self.entity.destination)
            return self._process_full(historic=True)
        return self._merge_like(historic=True)
