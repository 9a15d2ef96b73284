"""Z-ORDER / file-skipping effectiveness probe (VERDICT r5 directive #5).

Correctness of stats pruning and Morton clustering is already pinned by
tests/test_file_skipping.py; this records the EFFECT at size: a 5M-row
table with two uncorrelated dimensions (``ts`` ascending, ``key`` a
bijective scramble — the worst case for lexicographic clustering), written
scrambled, then measured in three layouts:

  * unclustered (as ingested, 128 scrambled files),
  * lexicographic ``cluster_by=(ts, key)`` (range sort: leading column
    clusters perfectly, second column stays ~full-width per file),
  * ``zorder=True`` on the same columns (Morton interleave: both columns
    get bounded per-file ranges).

For a 1% range predicate on each dimension it reports files-read /
files-total (manifest-level file skipping via ``read(prune_spec=...)``)
and rows-scanned / rows-total, plus the filtered-count wall time.

Asserted floors (recorded in BASELINE.md):
  * >= 90% of files skipped on the 1% ts-range after EITHER clustering;
  * >= 90% of files skipped on the 1% key-range after Z-ORDER — the
    dimension lexicographic clustering cannot skip (measured there too,
    as the contrast row).

Geometry note: a 2-dim Morton layout over F files is a ~sqrt(F) x sqrt(F)
grid, so per-dimension skip caps at 1 - 2/sqrt(F) for a sub-tile range
(the range can straddle two tile rows) — 90% per-dim needs F >= ~1024.
The floors are asserted only at F >= 512; smaller runs print the table
without gating (the small-geometry behavior is still the correct
trade, just coarser). At 100 TB a table has 10^5+ files, far past the
threshold — the probe's default (5M rows / 1024 files) measures the
regime that matters, not the toy one.

Usage: python tools/skip_probe.py [rows] [files]   (default 5_000_000 1024)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalakefoundation_spark.session import get_spark  # noqa: E402
from datalakefoundation_spark.tables.lake_table import LakeTable  # noqa: E402


def scrambled(spark, n: int, files: int):
    """ts ascending 0..n-1; key a bijective scramble of ts (uncorrelated);
    written in scrambled order so ingestion gives NO accidental clustering."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("pk"),
            F.col("id").alias("ts"),
            F.pmod(F.col("id") * 2654435761, F.lit(n)).alias("key"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .repartition(files, "payload")
    )


def measure(t: LakeTable, col: str, lo: int, hi: int) -> dict:
    seg_files = sum(len(s.files or {}) for s in t.latest_manifest().segments)
    assert seg_files > 0, (
        "no per-file stats in the manifest — check file_stats_max_files "
        "covers the probe's file count"
    )
    spec = [[("and", col, str(lo), str(hi))]]
    pruned = t.read(prune_spec=spec)
    files_read = pruned.select(F.input_file_name()).distinct().count()
    rows_scanned = pruned.count()
    t0 = time.time()
    n = pruned.where((F.col(col) >= lo) & (F.col(col) <= hi)).count()
    wall = round(time.time() - t0, 2)
    return {
        "files_read": files_read,
        "files_total": seg_files,
        "files_skipped_pct": round(100 * (1 - files_read / seg_files), 1),
        "rows_scanned": rows_scanned,
        "matching_rows": n,
        "filtered_count_s": wall,
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    spark = get_spark("skip-probe")
    spark.sparkContext.setLogLevel("ERROR")
    one_pct = n // 100
    ts_rng = (n // 2, n // 2 + one_pct - 1)
    key_rng = (n // 4, n // 4 + one_pct - 1)
    out: dict = {"rows": n, "files": files}
    with tempfile.TemporaryDirectory() as tmp:
        for layout in ("unclustered", "lex", "zorder"):
            t = LakeTable(spark, f"{tmp}/{layout}", stats_columns=("ts", "key"))
            # the default 256-file cap keeps manifests control-plane-sized
            # on real tables; the probe needs per-file stats on all of its
            # files to measure skipping, so raise the instance knob
            t.file_stats_max_files = files * 2
            t0 = time.time()
            t.overwrite(scrambled(spark, n, files))
            if layout != "unclustered":
                t.optimize(
                    cluster_by=["ts", "key"],
                    zorder=(layout == "zorder"),
                    target_partitions=files,
                )
            build_s = round(time.time() - t0, 1)
            rec = {"build_s": build_s}
            rec["ts_range_1pct"] = measure(t, "ts", *ts_rng)
            rec["key_range_1pct"] = measure(t, "key", *key_rng)
            out[layout] = rec
            print(json.dumps({layout: rec}), flush=True)

    # soundness: every layout must see the same matching rows
    for col in ("ts_range_1pct", "key_range_1pct"):
        vals = {out[lay][col]["matching_rows"] for lay in ("unclustered", "lex", "zorder")}
        assert len(vals) == 1, f"pruning changed results on {col}: {vals}"

    if files >= 512:
        assert out["lex"]["ts_range_1pct"]["files_skipped_pct"] >= 90
        assert out["zorder"]["ts_range_1pct"]["files_skipped_pct"] >= 90
        assert out["zorder"]["key_range_1pct"]["files_skipped_pct"] >= 90, (
            "z-order must skip on the non-leading dimension: "
            f"{out['zorder']['key_range_1pct']}"
        )
        print("SKIP PROBE OK")
    else:
        print(f"SKIP PROBE (floors not gated below 512 files; ran {files})")


if __name__ == "__main__":
    main()
