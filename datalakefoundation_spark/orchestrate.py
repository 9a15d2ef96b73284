"""Multi-entity orchestration — the in-process analog of the reference's
Azure-Data-Factory ForEach feed (outputs/datafactory.scala:29-52 generates
work items; something must still run them).

``process_entities`` drives N Processing runs concurrently from one driver:
Spark's scheduler interleaves the jobs (each entity's stages run while
others wait on I/O or commit), so a fleet of small entities keeps a big
cluster busy without any external orchestrator. Safe by construction:

* DIFFERENT entities own their own silver tables (no write overlap),
* work items for the SAME entity are serialized in input order (two
  concurrent merges into one table is a read-compute-commit race: the CAS
  makes the loser fail cleanly rather than clobber — proven by
  tests/test_merge_race.py — but an orchestrator that KNOWS both items
  target one entity shouldn't manufacture the race and burn the work; it
  chains them, giving multi-slice backfills deterministic order), and
* the shared watermark system table commits via the LakeTable CAS
  (ConcurrentCommitException + retry in WatermarkStore.write).
"""

from __future__ import annotations

import logging
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import SparkSession

from datalakefoundation_spark.logging_ import ProcessingSummary
from datalakefoundation_spark.metadata.models import Metadata
from datalakefoundation_spark.processing import Processing

logger = logging.getLogger(__name__)


@dataclass
class EntityRun:
    entity_id: int
    slice_file: str
    summary: ProcessingSummary | None = None
    error: Exception | None = None

    @property
    def ok(self) -> bool:
        return self.error is None


def process_entities(
    spark: SparkSession,
    metadata: Metadata,
    work_items: list[tuple[int, str]],
    parallelism: int = 4,
    options: dict | None = None,
    fail_fast: bool = False,
) -> list[EntityRun]:
    """Run ``(entity_id, slice_file)`` work items concurrently across
    entities, SEQUENTIALLY within each entity (input order preserved per
    entity — a later slice of the same entity merges on top of the
    earlier one instead of racing it).

    Failures are captured per item (``EntityRun.error``) so one bad entity
    doesn't abort the fleet — unless ``fail_fast``. A failed run does NOT
    skip the entity's remaining slices (each is independent work against
    whatever state landed). Returns runs in input order.
    """
    def run_one(r: EntityRun) -> None:
        try:
            r.summary = Processing(
                spark, metadata, r.entity_id, r.slice_file, dict(options or {})
            ).process()
        except Exception as exc:  # noqa: BLE001 - captured per entity
            logger.exception(
                "entity %s slice %s failed", r.entity_id, r.slice_file
            )
            r.error = exc
            if fail_fast:
                raise

    runs = [EntityRun(eid, sf) for eid, sf in work_items]
    chains: dict[int, list[EntityRun]] = defaultdict(list)
    for r in runs:
        chains[r.entity_id].append(r)

    def run_chain(chain: list[EntityRun]) -> None:
        for r in chain:
            run_one(r)

    with ThreadPoolExecutor(max_workers=max(1, parallelism)) as ex:
        list(ex.map(run_chain, chains.values()))
    return runs
