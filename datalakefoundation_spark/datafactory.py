"""Azure-Data-Factory-style work-item generator (outputs/datafactory.scala:29-52).

Polymorphic dispatch on the argument -> enabled entities (entity AND its
connection enabled) -> serialized entity list (including resolved output
locations) for orchestration ForEach loops. Driver-only; no Spark involved.
"""

from __future__ import annotations

import json
from typing import Sequence, Union

from datalakefoundation_spark.metadata.models import Connection, Metadata

Arg = Union[str, int, Sequence[int], Connection]


def get_config_items(metadata: Metadata, arg: Arg, group: str | None = None) -> list[dict]:
    """arg: connection name | entity id | list of ids | Connection object.
    ``group`` filters by entity group (EntityGroup / EntityConnectionGroup)."""
    if isinstance(arg, Connection):
        entities = metadata.get_entities(connection=arg.name, group=group)
    elif isinstance(arg, str):
        entities = metadata.get_entities(connection=arg, group=group)
    elif isinstance(arg, int):
        entities = metadata.get_entities(ids=[arg], group=group)
    else:
        entities = metadata.get_entities(ids=list(arg), group=group)
    return [e.to_json() for e in entities if e.is_enabled()]


def get_config_items_json(metadata: Metadata, arg: Arg, group: str | None = None) -> str:
    return json.dumps(get_config_items(metadata, arg, group))
