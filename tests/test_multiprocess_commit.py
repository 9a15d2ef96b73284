"""True multi-PROCESS commit-race test for the LakeTable CAS protocol.

The in-process concurrency tests (test_orchestrate) share one Python
interpreter and one page cache; the production failure mode the manifest
CAS exists for is two independent WRITER PROCESSES — two jobs on two
drivers — racing for the same version file (SystemDataObject.scala's
optimistic append has the same shape on Delta). Spawn real OS processes,
each appending batches through the Spark-free ``append_arrow``
control-plane path (the watermark/log write path), and assert afterwards
that no batch was lost, the version chain is contiguous (every CAS loser
retried at the next version rather than clobbering the winner), and no
orphaned segment dir leaked from lost races.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_WRITERS = 4
BATCHES = 5
ROWS_PER_BATCH = 10

_WORKER = """
import sys
sys.path.insert(0, sys.argv[3])
import pyarrow as pa
from datalakefoundation_spark.tables.lake_table import LakeTable

path, wid = sys.argv[1], int(sys.argv[2])
table = LakeTable(None, path)  # bare local path -> LocalFS, no Spark needed
for seq in range({batches}):
    rows = {rows_per_batch}
    batch = pa.table(
        {{
            "writer": pa.array([wid] * rows, pa.int32()),
            "seq": pa.array([seq] * rows, pa.int32()),
            "i": pa.array(list(range(rows)), pa.int32()),
        }}
    )
    table.append_arrow(batch, label=f"w{{wid}}")
""".format(batches=BATCHES, rows_per_batch=ROWS_PER_BATCH)


def test_multiprocess_commit_race(spark, tmp_path):
    path = str(tmp_path / "race_table")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, path, str(w), REPO],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
        )
        for w in range(N_WRITERS)
    ]
    for p in procs:
        _out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]

    from datalakefoundation_spark.tables.lake_table import LakeTable

    table = LakeTable(spark, path)
    mf = table.latest_manifest()
    total_commits = N_WRITERS * BATCHES
    # contiguous version chain: every lost race retried at the next version
    assert mf.version == total_commits - 1
    for v in range(total_commits):
        table.manifest_at(v)  # raises if any version file is missing

    # no batch lost, none duplicated
    df = table.read()
    assert df.count() == N_WRITERS * BATCHES * ROWS_PER_BATCH
    got = {
        (r["writer"], r["seq"])
        for r in df.select("writer", "seq").distinct().collect()
    }
    assert got == {(w, s) for w in range(N_WRITERS) for s in range(BATCHES)}

    # lost races must clean up after themselves: every data dir on disk is
    # referenced by the final manifest (append-only history references all)
    referenced = {s.dir for s in mf.segments}
    on_disk = {
        f"data/{d}"
        for d in os.listdir(os.path.join(path, "data"))
        if os.path.isdir(os.path.join(path, "data", d))
    }
    assert on_disk == referenced
