"""Jinja2 templating of step/rule configuration.

All config strings may reference global or per-rule template variables;
undefined variables are preserved verbatim as ``{{name}}`` so multi-pass
templating (upfront globals, runtime locals) composes. Custom filters give
config-time date arithmetic.

Reference parity: dve core_engine/templating.py:14-114 (semantics only —
implementation is new).
"""

from __future__ import annotations

import calendar
import datetime as dt
from typing import Any, Mapping, TypeVar

import jinja2

T = TypeVar("T")


class _PreserveUndefined(jinja2.Undefined):
    """Render undefined variables back as their template text."""

    def __str__(self) -> str:  # pragma: no cover - trivial
        return "{{" + (self._undefined_name or "") + "}}"


def _as_date(value: dt.date | str) -> dt.date:
    if isinstance(value, str):
        return dt.datetime.fromisoformat(value).date()
    if isinstance(value, dt.datetime):
        return value.date()
    return value


def add_months(date: dt.date | str, n_months: int) -> dt.date:
    """Add calendar months, clamping the day to the target month's length."""
    date = _as_date(date)
    total = date.year * 12 + (date.month - 1) + n_months
    year, month0 = divmod(total, 12)
    month = month0 + 1
    day = min(date.day, calendar.monthrange(year, month)[1])
    return dt.date(year, month, day)


def add_years(date: dt.date | str, n_years: int) -> dt.date:
    """Add calendar years (Feb 29 clamps to Feb 28 on non-leap targets)."""
    return add_months(_as_date(date), 12 * n_years)


def days_until(
    start_date: dt.date | str, end_date: dt.date | str, include_end: bool = True
) -> int:
    """Days from start to end, optionally inclusive of the end date."""
    return (_as_date(end_date) - _as_date(start_date)).days + int(include_end)


def _raise_template_error(message: str) -> None:
    raise ValueError(f"rule template error: {message}")


_ENV = jinja2.Environment(undefined=_PreserveUndefined, keep_trailing_newline=True)
_ENV.filters["add_months"] = add_months
_ENV.filters["add_years"] = add_years
_ENV.filters["days_until"] = days_until
# expression-callable globals (parity: dve templating.py:39-41)
_ENV.globals["repr"] = repr
_ENV.globals["str"] = str
_ENV.globals["raise"] = _raise_template_error


def render_template(text: str, variables: Mapping[str, Any]) -> str:
    """Render one template string with the given variables."""
    return _ENV.from_string(text).render(**variables)


def template_object(obj: T, variables: Mapping[str, Any]) -> T:
    """Recursively template every string inside lists/dicts/scalars."""
    if isinstance(obj, str):
        return render_template(obj, variables)  # type: ignore[return-value]
    if isinstance(obj, list):
        return [template_object(v, variables) for v in obj]  # type: ignore[return-value]
    if isinstance(obj, tuple):
        return tuple(template_object(v, variables) for v in obj)  # type: ignore[return-value]
    if isinstance(obj, dict):
        return {
            template_object(k, variables): template_object(v, variables)
            for k, v in obj.items()
        }  # type: ignore[return-value]
    return obj
