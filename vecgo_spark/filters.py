"""vecgo metadata predicate semantics → Spark Column expressions.

Reference model (metadata/types.go:430-451): a ``Filter{Key, Operator,
Value}``; a ``FilterSet`` is a pure AND of filters (no OR/NOT tree).

Semantics pinned by the reference (SURVEY.md §2.2, §7.3):
  - A filter on a missing/NULL field matches NOTHING — even ``ne``
    (metadata/filter.go:9-13). SQL three-valued logic would also drop
    NULLs for eq/gt/..., but ``ne`` on NULL must be guarded explicitly,
    so every predicate is wrapped in ``isNotNull AND pred``.
  - eq/ne: typed equality with int/float cross-compare
    (metadata/filter.go:122-168) — Spark's numeric type coercion on
    ``==`` matches (Int 5 == Float 5.0).
  - gt/gte/lt/lte: numeric-only (metadata/filter.go:170-182).
  - in: value ∈ literal list (metadata/filter.go:184-194).
  - contains: substring match, string only (metadata/filter.go:196-201).

Because these compile to plain Column expressions, Catalyst pushes them
into the parquet scan (PushedFilters) and orders them by cost — the
reference's hand-written filter-cost model (internal/metadata/unified.go:
121-256) is subsumed by the optimizer.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

OPERATORS = ("eq", "ne", "gt", "gte", "lt", "lte", "in", "contains")


@dataclass(frozen=True)
class Filter:
    """One predicate; mirrors metadata/types.go:430-436."""

    key: str
    op: str
    value: Any

    def to_column(self) -> Column:
        c = F.col(self.key)
        guard = c.isNotNull()  # missing-field ⇒ no match (filter.go:9-13)
        if self.op == "eq":
            pred = c == F.lit(self.value)
        elif self.op == "ne":
            pred = c != F.lit(self.value)
        elif self.op == "gt":
            pred = c > F.lit(self.value)
        elif self.op == "gte":
            pred = c >= F.lit(self.value)
        elif self.op == "lt":
            pred = c < F.lit(self.value)
        elif self.op == "lte":
            pred = c <= F.lit(self.value)
        elif self.op == "in":
            pred = c.isin(list(self.value))
        elif self.op == "contains":
            pred = c.contains(F.lit(self.value))
        else:
            raise ValueError(f"unknown operator {self.op!r}; expected one of {OPERATORS}")
        return guard & pred


class FilterSet:
    """AND of filters (metadata/types.go:443-451). Fluent builder mirrors
    the reference's ``NewFilterSet().Eq(...).Gt(...)`` style."""

    def __init__(self, filters: list[Filter] | None = None):
        self.filters = list(filters or [])

    def _add(self, key: str, op: str, value: Any) -> "FilterSet":
        return FilterSet(self.filters + [Filter(key, op, value)])

    def eq(self, key: str, value: Any) -> "FilterSet":
        return self._add(key, "eq", value)

    def ne(self, key: str, value: Any) -> "FilterSet":
        return self._add(key, "ne", value)

    def gt(self, key: str, value: Any) -> "FilterSet":
        return self._add(key, "gt", value)

    def gte(self, key: str, value: Any) -> "FilterSet":
        return self._add(key, "gte", value)

    def lt(self, key: str, value: Any) -> "FilterSet":
        return self._add(key, "lt", value)

    def lte(self, key: str, value: Any) -> "FilterSet":
        return self._add(key, "lte", value)

    def isin(self, key: str, values: list[Any]) -> "FilterSet":
        return self._add(key, "in", values)

    def contains(self, key: str, value: str) -> "FilterSet":
        return self._add(key, "contains", value)

    def to_column(self) -> Column | None:
        if not self.filters:
            return None
        return reduce(lambda a, b: a & b, (f.to_column() for f in self.filters))


def to_condition(filter: FilterSet | Filter | Column | str | None) -> Column | None:
    """Accept a FilterSet, single Filter, raw Column, or SQL string."""
    if filter is None:
        return None
    if isinstance(filter, FilterSet):
        return filter.to_column()
    if isinstance(filter, Filter):
        return filter.to_column()
    if isinstance(filter, str):
        return F.expr(filter)
    return filter
