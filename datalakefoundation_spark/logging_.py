"""ProcessingSummary — the per-run metric record
(log/DatalakeLogManager.scala:13-38). The log appenders/level-config live in
``log.py``; summaries are written there as AUDIT events.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field


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


