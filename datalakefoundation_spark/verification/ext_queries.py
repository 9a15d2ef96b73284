"""Extension-operator queries (dedup / similarity / text analysis) — SURVEY §7.11.

Filled in as the ext/ operators land.
"""

from __future__ import annotations

QUERIES: dict = {}
