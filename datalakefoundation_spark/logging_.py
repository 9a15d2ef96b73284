"""Structured run logging: ProcessingSummary + buffered Spark-side sink.

Reference: log/DatalakeLogManager.scala:13-38 (summary fields),
ParquetAppender.scala:84-117 (buffered batch append to parquet),
TableAppender.scala (Delta VARIANT variant — here the ``data`` payload is a
JSON string column, the documented Spark-4-unavailable fallback).

The Log4j async-appender machinery is replaced by a plain buffered Python
writer with the same observable output (SURVEY.md §7.9).
"""

from __future__ import annotations

import datetime as _dt
import json
import logging
import threading
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import Row, SparkSession
from pyspark.sql import types as T

logger = logging.getLogger("datalakefoundation_spark")


@dataclass
class ProcessingSummary:
    entity_id: int
    destination: str
    strategy: str
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex)
    records_in_slice: int = 0
    inserted: int = 0
    updated: int = 0
    deleted: int = 0
    inferred_deletes: int = 0
    unchanged: int = 0
    touched: int = 0
    duration_ms: float = 0.0


LOG_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.TimestampNTZType()),
        T.StructField("level", T.StringType()),
        T.StructField("logger", T.StringType()),
        T.StructField("message", T.StringType()),
        T.StructField("run_id", T.StringType()),
        T.StructField("data", T.StringType()),  # JSON payload (VARIANT fallback)
    ]
)


class BufferedLogSink:
    """Buffered batch appender: rows accumulate in memory and flush as ONE
    parquet append per threshold/flush — never a write per log call.

    The flush itself is a driver-side pyarrow write (log rows are tiny
    control-plane metadata; a Spark job per flush would add a scheduler
    round-trip to every Processing run). The output directory stays an
    ordinary Spark-readable parquet dataset."""

    def __init__(self, spark: SparkSession, path: str, threshold: int = 100) -> None:
        self.spark = spark
        self.path = path
        self.threshold = threshold
        self._buffer: list[Row] = []
        self._lock = threading.Lock()

    def log(
        self,
        message: str,
        level: str = "INFO",
        logger_name: str = "datalake",
        run_id: str = "",
        data: dict | None = None,
    ) -> None:
        row = Row(
            timestamp=_dt.datetime.now(),
            level=level,
            logger=logger_name,
            message=message,
            run_id=run_id,
            data=json.dumps(data) if data is not None else None,
        )
        with self._lock:
            self._buffer.append(row)
            if len(self._buffer) >= self.threshold:
                self._flush_locked()

    def log_summary(self, summary: ProcessingSummary) -> None:
        self.log(
            "ProcessingSummary",
            level="INFO",
            run_id=summary.run_id,
            data=asdict(summary),
        )

    def flush(self) -> None:
        with self._lock:
            self._flush_locked()

    def _flush_locked(self) -> None:
        if not self._buffer:
            return
        import os
        import pyarrow as pa
        import pyarrow.parquet as pq

        rows = self._buffer
        arrow = pa.table(
            {
                "timestamp": pa.array([r["timestamp"] for r in rows], pa.timestamp("us")),
                "level": pa.array([r["level"] for r in rows], pa.string()),
                "logger": pa.array([r["logger"] for r in rows], pa.string()),
                "message": pa.array([r["message"] for r in rows], pa.string()),
                "run_id": pa.array([r["run_id"] for r in rows], pa.string()),
                "data": pa.array([r["data"] for r in rows], pa.string()),
            }
        )
        os.makedirs(self.path, exist_ok=True)
        pq.write_table(arrow, f"{self.path}/part-{uuid.uuid4().hex}.parquet")
        self._buffer = []
