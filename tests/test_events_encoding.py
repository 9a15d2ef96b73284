"""read_events must be agnostic to the physical timestamp encoding of
``events.parquet``.

The driver's testdata shipped ``ts`` as TIMESTAMP(NANOS) in round 1 (Spark
surfaces it as epoch-ns BIGINT under ``nanosAsLong``) and as plain
``timestamp[us]`` in round 2 (surfaces as TIMESTAMP_NTZ) — the silent flip
broke three queries and the whole driver bench that round. This pins every
encoding the parquet spec allows for the column to one identical ``ts_ns``
result.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datalakefoundation_spark.verification.core_queries import read_events

# Instants chosen to be exactly representable in ms (the coarsest encoding
# under test), spanning the epoch, a DST boundary, and a recent date.
EPOCH_US = [0, 1_000_000, 1_288_483_200_000_000, 1_767_225_600_123_000]


def _write_events(tmp_path, encoding: str) -> str:
    ids = pa.array(range(len(EPOCH_US)), type=pa.int64())
    write_kwargs: dict = {}
    if encoding == "us_ntz":
        ts = pa.array(EPOCH_US, type=pa.timestamp("us"))
    elif encoding == "us_utc":
        ts = pa.array(EPOCH_US, type=pa.timestamp("us", tz="UTC"))
    elif encoding == "nanos":
        ts = pa.array([us * 1000 for us in EPOCH_US], type=pa.timestamp("ns"))
    elif encoding == "ms":
        ts = pa.array([us // 1000 for us in EPOCH_US], type=pa.timestamp("ms"))
    elif encoding == "int96":
        # the deprecated legacy encoding older Hive/Impala writers emit
        ts = pa.array(EPOCH_US, type=pa.timestamp("us"))
        write_kwargs["use_deprecated_int96_timestamps"] = True
    else:  # pragma: no cover - guard against typo'd param ids
        raise ValueError(encoding)
    sf_dir = tmp_path / encoding
    sf_dir.mkdir()
    sf_dir = str(sf_dir)
    table = pa.table({"event_id": ids, "ts": ts})
    # version=2.6 keeps TIMESTAMP(NANOS) as-is instead of coercing to µs.
    pq.write_table(table, f"{sf_dir}/events.parquet", version="2.6", **write_kwargs)
    return sf_dir


@pytest.mark.parametrize("encoding", ["us_ntz", "us_utc", "nanos", "ms", "int96"])
def test_read_events_any_encoding(spark, tmp_path, encoding):
    sf_dir = _write_events(tmp_path, encoding)
    rows = read_events(spark, sf_dir).orderBy("event_id").collect()
    assert [r["ts_ns"] for r in rows] == [us * 1000 for us in EPOCH_US]
    assert dict(read_events(spark, sf_dir).dtypes)["ts_ns"] == "bigint"
