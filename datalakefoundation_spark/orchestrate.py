"""Multi-entity orchestration — the in-process analog of the reference's
Azure-Data-Factory ForEach feed (outputs/datafactory.scala:29-52 generates
work items; something must still run them).

``process_entities`` drives N Processing runs concurrently from one driver:
Spark's scheduler interleaves the jobs (each entity's stages run while
others wait on I/O or commit), so a fleet of small entities keeps a big
cluster busy without any external orchestrator. Safe by construction:

* every entity owns its own silver table (no write overlap), and
* the shared watermark system table commits via the LakeTable CAS
  (ConcurrentCommitException + retry in WatermarkStore.write).
"""

from __future__ import annotations

import logging
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
    """Run ``(entity_id, slice_file)`` work items concurrently.

    Failures are captured per item (``EntityRun.error``) so one bad entity
    doesn't abort the fleet — unless ``fail_fast``. Returns runs in input
    order.
    """
    def run(item: tuple[int, str]) -> EntityRun:
        eid, slice_file = item
        r = EntityRun(eid, slice_file)
        try:
            r.summary = Processing(
                spark, metadata, eid, slice_file, dict(options or {})
            ).process()
        except Exception as exc:  # noqa: BLE001 - captured per entity
            logger.exception("entity %s slice %s failed", eid, slice_file)
            r.error = exc
            if fail_fast:
                raise
        return r

    with ThreadPoolExecutor(max_workers=max(1, parallelism)) as ex:
        return list(ex.map(run, work_items))
