"""SQL parameter templating (F10).

Reference parity: ``ETLUtils.fill_sql_parameters`` (``airflow_etl.py:378-399``)
substitutes ``{name}`` placeholders from two kinds of parameter specs:

- ``{'name': ..., 'value': ...}`` — a constant,
- ``{'name': ..., 'variable': ...}`` — resolved from Airflow Variables
  (``report_date`` being the canonical one, README.md:152-171).

Here a parameter source is any mapping; "variables" come from an injectable
resolver instead of Airflow. Unknown placeholders raise instead of silently
passing through (the reference used bare ``str.format`` which throws
``KeyError`` with no context).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from string import Formatter


def resolve_parameters(
    parameters: Sequence[Mapping] | Mapping | None,
    variable_resolver: Callable[[str], str] | None = None,
) -> dict[str, object]:
    """Normalize reference-style parameter specs into a flat dict."""
    if parameters is None:
        return {}
    if isinstance(parameters, Mapping):
        return dict(parameters)
    out: dict[str, object] = {}
    for spec in parameters:
        name = spec["name"]
        if "value" in spec:
            out[name] = spec["value"]
        elif "variable" in spec:
            if variable_resolver is None:
                raise ValueError(
                    f"parameter {name!r} references variable {spec['variable']!r} "
                    "but no variable_resolver was provided"
                )
            out[name] = variable_resolver(spec["variable"])
        else:
            raise ValueError(f"parameter {name!r} needs 'value' or 'variable'")
    return out


def fill_sql_parameters(sql: str, parameters: Mapping[str, object]) -> str:
    """Substitute ``{name}`` placeholders (F10, ``airflow_etl.py:378-399``).

    str.format semantics (same as the reference): literal braces in SQL —
    JSON literals, ``map{...}`` syntax — must be escaped as ``{{`` / ``}}``.
    Unbound placeholders and unescaped braces raise with a hint instead of
    the bare str.format error.
    """
    try:
        needed = {
            field for _, field, _, _ in Formatter().parse(sql) if field is not None
        }
    except ValueError as e:
        raise ValueError(
            f"malformed placeholder braces in SQL ({e}); escape literal "
            "braces as '{{' and '}}'"
        ) from None
    missing = sorted(f for f in needed if f.split(".")[0].split("[")[0] not in parameters)
    if missing:
        raise KeyError(
            f"unbound SQL parameters: {missing} (literal braces in SQL must "
            "be escaped as '{{' / '}}')"
        )
    return sql.format(**parameters)
