"""Driver-side expression templating (SURVEY.md §2.9).

The reference embeds *Scala* snippets in metadata and evaluates them with a
runtime toolbox (core/Expressions.scala:66-94). That cannot run in Python;
this module replaces it with:

1. ``${var}`` template substitution (same variables: today / entity /
   destination / connection / settings_<key>, plus watermark's last_value)
   — Entity.scala:237-257, Watermark.scala:76-95.
2. A sandboxed Python expression evaluator exposing datetime helpers for
   the documented watermark expression *patterns*
   (docs/processing/WATERMARKS.md:40-115): date minus N days, epoch-day
   arithmetic, format conversion.

Failure semantics mirror the reference: template/eval errors are swallowed
— path templating returns the substituted string, watermark evaluation
returns None so the filter is skipped (Expressions.scala:82-89,
Watermark.scala:44-53).
"""

from __future__ import annotations

import datetime as _dt
import logging
import re
from typing import Any, Mapping

logger = logging.getLogger(__name__)

_VAR_RE = re.compile(r"\$\{([A-Za-z0-9_]+)\}")


def substitute(template: str, variables: Mapping[str, Any]) -> str:
    """Replace ``${var}`` occurrences; unknown vars are left intact (and logged)."""

    def _repl(m: re.Match) -> str:
        name = m.group(1)
        if name in variables:
            return str(variables[name])
        logger.warning("unknown template variable: %s", name)
        return m.group(0)

    return _VAR_RE.sub(_repl, template)


class _SafeDate:
    """Minimal LocalDate-style helper available inside sandboxed expressions."""

    @staticmethod
    def parse(s: str) -> _dt.date:
        return _dt.date.fromisoformat(str(s).strip().strip("'\""))

    @staticmethod
    def today() -> _dt.date:
        return _dt.date.today()

    @staticmethod
    def of_epoch_day(n: int) -> _dt.date:
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=int(n))


_SANDBOX: dict[str, Any] = {
    "__builtins__": {},
    "str": str,
    "int": int,
    "float": float,
    "abs": abs,
    "min": min,
    "max": max,
    "date": _SafeDate,
    "datetime": _dt.datetime,
    "timedelta": _dt.timedelta,
    "days": lambda n: _dt.timedelta(days=n),
    "epoch_day": lambda d: (d - _dt.date(1970, 1, 1)).days,
    "today": _dt.date.today,
    "now": _dt.datetime.now,
}


def safe_eval(expression: str, variables: Mapping[str, Any] | None = None) -> Any | None:
    """Evaluate a restricted Python expression; None on any failure.

    The sandbox has no builtins beyond the whitelisted datetime helpers, so
    metadata expressions cannot touch the filesystem / imports / attributes
    of interest. (Defense in depth, not a security boundary — metadata is
    trusted config, same stance as the reference's toolbox.)
    """
    try:
        env = dict(_SANDBOX)
        if variables:
            env.update(variables)
        return eval(expression, env, {})  # noqa: S307 - sandboxed, trusted config
    except Exception as exc:
        logger.warning("expression eval failed (%s): %s", expression, exc)
        return None


def evaluate_watermark_expression(
    expression: str, last_value: Any, extra: Mapping[str, Any] | None = None
) -> str | None:
    """Render a watermark expression into a SQL-comparable literal string.

    Supported patterns (docs/processing/WATERMARKS.md):
      * ``'${last_value}'``                      -> the stored value verbatim
      * ``${last_value}``                        -> same, unquoted numeric
      * python-ish date math over ``last_value`` -> evaluated via safe_eval
    Quote stripping mirrors ProcessStrategy.scala:126-127. Returns None when
    evaluation fails (the filter is then skipped, Watermark.scala:44-53).
    """
    variables = {"last_value": last_value}
    if extra:
        variables.update(extra)
    substituted = substitute(expression, variables)
    stripped = substituted.strip()
    if (stripped.startswith("'") and stripped.endswith("'")) or (
        stripped.startswith('"') and stripped.endswith('"')
    ):
        return stripped[1:-1]
    # plain literal (number / ISO date)?
    if re.fullmatch(r"[\w.\-: ]+", stripped):
        return stripped
    result = safe_eval(stripped, variables)
    return None if result is None else str(result)
