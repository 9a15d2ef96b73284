"""Column profiling / data-quality metrics (the Deequ / dbt-test analog).

A production ingestion path wants per-column health metrics — completeness,
cardinality, value ranges — computed alongside the load, both for monitoring
dashboards and as inputs to constraint checks (see core/constraints.py for
the enforcing CHECK side). This module computes them Spark-first:

* ONE pass over the data: every metric for every profiled column folds into
  a single aggregate (map-side partial aggregation, one tiny result row),
  then pivots driver-free into one output row per column via an
  explode-of-structs — no per-column scan, no collect.
* Distinct counts default to ``approx_count_distinct`` (HyperLogLog++,
  constant memory per column — the only survivable form at 100 TB).
  ``exact=True`` switches to exact ``count_distinct`` for small/dimension
  tables and for oracle verification; Catalyst plans multi-column exact
  distincts via a single Expand, still one scan.
* Min/max are rendered to strings AFTER aggregation (cast(min(c)) not
  min(cast(c)) — numeric order, not lexicographic).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """One row per profiled column:
      (col_name, n_rows, n_nulls, completeness, n_distinct, min_value,
       max_value)

    ``completeness`` = non-null fraction; ``min_value``/``max_value`` are
    string renderings of the typed min/max (NULL for all-NULL columns).
    ``columns`` defaults to every top-level atomic column (arrays/maps/
    structs are skipped — min/max and HLL sketches are not defined for
    them here).
    """
    atomic = [
        f.name
        for f in df.schema.fields
        if "<" not in f.dataType.simpleString() and f.dataType.simpleString() != "binary"
    ]
    cols = list(columns) if columns is not None else atomic
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_columns: unknown columns {missing}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn{i}"))
        if exact:
            aggs.append(F.count_distinct(F.col(c)).alias(f"__nd{i}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c), rsd).alias(f"__nd{i}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__mn{i}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__mx{i}"))
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn{i}")).alias("n_nulls"),
                F.when(F.col("__n") > 0, F.col(f"__nn{i}") / F.col("__n"))
                .otherwise(F.lit(None))
                .alias("completeness"),
                F.col(f"__nd{i}").alias("n_distinct"),
                F.col(f"__mn{i}").alias("min_value"),
                F.col(f"__mx{i}").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def check_expectations(df: DataFrame, expectations: dict) -> DataFrame:
    """Deequ-style verification suite: evaluate declarative per-column
    expectations in ONE aggregate pass and return one row per check:

      (col_name, check, expected, observed, passed)

    ``expectations`` maps column -> dict of checks:
      completeness: float   — non-null fraction >= value
      unique: True          — no non-null value occurs twice
      min: v                — observed minimum >= v
      max: v                — observed maximum <= v
      isin: [v, ...]        — every non-null value in the set
      matches: regex        — every non-null value rmatches (strings)

    The whole suite folds into a single df.agg(...) (map-side partial
    aggregation, tiny result row) — adding checks adds aggregate buffer
    slots, not passes; `expected`/`observed` are rendered to strings so
    the report schema is stable across value types. This is the
    analysis-side complement of the enforcing ingestion-time CHECK
    constraints (core/constraints.py): constraints reject rows, this
    reports dataset-level health for monitoring/alerting.

    An EMPTY input fails every check: "no data arrived" is an alert, and
    one uniform policy beats per-check vacuous truths (a 0-row table
    would otherwise pass completeness and unique while failing min/max —
    green or red depending on which check the user happened to write).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    specs: list[tuple[str, str, str, object]] = []  # (col, check, slot, expected)
    for i, (col, checks) in enumerate(sorted(expectations.items())):
        if col not in df.columns:
            raise ValueError(f"check_expectations: unknown column {col}")
        c = F.col(col)
        for check, expected in sorted(checks.items(), key=lambda kv: kv[0]):
            slot = f"__s{i}_{check}"
            if check == "completeness":
                aggs.append(F.count(c).alias(slot))
            elif check == "unique":
                # non-null rows minus distinct non-null values == dup count
                aggs.append((F.count(c) - F.count_distinct(c)).alias(slot))
            elif check == "min":
                aggs.append(F.min(c).alias(slot))
            elif check == "max":
                aggs.append(F.max(c).alias(slot))
            elif check == "isin":
                aggs.append(
                    F.sum(
                        (~c.isin(*expected) & c.isNotNull()).cast("long")
                    ).alias(slot)
                )
            elif check == "matches":
                aggs.append(
                    F.sum(
                        (~c.rlike(expected) & c.isNotNull()).cast("long")
                    ).alias(slot)
                )
            else:
                raise ValueError(f"unknown check '{check}' for column {col}")
            specs.append((col, check, slot, expected))
    one = df.agg(*aggs)
    rows = []
    for col, check, slot, expected in specs:
        s = F.col(slot)
        if check == "completeness":
            observed = F.when(F.col("__n") > 0, s / F.col("__n"))
            passed = observed >= F.lit(float(expected))
            observed = observed.cast("string")
        elif check == "unique":
            observed = F.concat(F.lit("duplicates="), s.cast("string"))
            passed = s == 0
        elif check == "min":
            passed = s >= F.lit(expected)
            observed = s.cast("string")
        elif check == "max":
            passed = s <= F.lit(expected)
            observed = s.cast("string")
        else:  # isin / matches: slot counts violations
            observed = F.concat(F.lit("violations="), s.cast("string"))
            passed = s == 0
        rows.append(
            F.struct(
                F.lit(col).alias("col_name"),
                F.lit(check).alias("check"),
                F.lit(str(expected)).alias("expected"),
                observed.alias("observed"),
                # empty input fails uniformly (see docstring); NULL verdicts
                # (e.g. min/max on all-NULL columns) also land on False
                F.coalesce(
                    F.when(F.col("__n") > 0, passed), F.lit(False)
                ).alias("passed"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
