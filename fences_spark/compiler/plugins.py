"""Per-keyword compiler plugin registry — the validator dual of the
reference's extension points (``Config.key_handlers`` /
``type_handlers``, fences/json_schema/config.py:17-25, consumed at
parse.py:108-173; XSD ``type_generators``/``restriction_handlers``,
fences/xml_schema/config.py:25-60): where fences lets users hook
custom keywords into sample *generation*, this registry hooks them
into *evaluation*, on BOTH tiers at once so the dialect stays
consistent:

- a **Column factory** for the typed/JVM tier (must return a pure
  builtin-Column predicate — keeping the no-per-row-Python constraint
  a plugin author cannot accidentally break by dropping to a Python
  UDF here), and
- a **Python predicate** for the Arrow evaluator tier (and the
  fixture oracle), the ground-truth twin of the Column.

Custom keywords assert only — like every draft-2020-12 assertion
keyword they contribute no annotations and do not descend into child
instance locations, so unevaluated* semantics are unaffected.
Unregistered unknown keywords remain annotation-only (spec behavior).

Registration is process-global and explicit (``register_keyword`` /
``unregister_keyword``); plugin keywords must carry an ``x-`` prefix
so they can never shadow a spec keyword.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Any, Callable

if TYPE_CHECKING:  # keep this module import-light: the evaluator tier
    # ships it (via snapshots) into executor Python workers
    from pyspark.sql import Column
    from pyspark.sql import types as T


@dataclass(frozen=True)
class KeywordPlugin:
    """A custom assertion keyword.

    ``column_pred(value, col, dtype)`` → JVM predicate Column for the
    keyword's schema value applied to a typed column;
    ``py_pred(value, instance)`` → the same verdict in Python for the
    Arrow evaluator tier.  Both must implement identical semantics —
    pinned by tests that compile the same rule on each tier.

    The registry lives in the DRIVER process; evaluators snapshot it
    at construction (``snapshot()``) so the plugin set travels inside
    the pickled evaluator to executor workers — registration after a
    rule is compiled does not retroactively change that rule.
    ``py_pred`` must therefore be picklable (module-level function, or
    any callable cloudpickle handles).
    """

    keyword: str
    column_pred: "Callable[[Any, Column, T.DataType], Column]"
    py_pred: Callable[[Any, Any], bool]


_REGISTRY: dict[str, KeywordPlugin] = {}


def register_keyword(plugin: KeywordPlugin) -> None:
    if not plugin.keyword.startswith("x-"):
        raise ValueError(
            f"plugin keyword {plugin.keyword!r} must start with 'x-' "
            "(spec keywords cannot be overridden)"
        )
    _REGISTRY[plugin.keyword] = plugin


def unregister_keyword(keyword: str) -> None:
    _REGISTRY.pop(keyword, None)


def registered_in(schema: dict) -> list[KeywordPlugin]:
    """Plugins whose keyword appears in this schema object, in
    registration-independent (key-sorted) order for deterministic
    predicate trees."""
    return [_REGISTRY[k] for k in sorted(schema) if k in _REGISTRY]


def snapshot() -> dict[str, KeywordPlugin]:
    """Copy of the current registry — captured by evaluators at
    construction so the plugin set is frozen into the compiled rule
    and survives pickling to executor workers."""
    return dict(_REGISTRY)
