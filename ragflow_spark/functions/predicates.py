"""The Switch predicate language as Spark Column expressions.

Re-expresses reference agent/component/switch.py:90-129
(``process_operator``) — the reference's entire scalar predicate
surface — on JVM-side Column ops (no UDFs):

- contains / not contains / start with / end with: case-insensitive
  (switch.py:94-101 lowercases both sides)
- empty / not empty (switch.py:102-105): null or '' counts as empty
- =, ≠ (switch.py:106-109): string equality
- >, <, ≥, ≤ (switch.py:110-128): numeric compare when BOTH sides
  cast to double, else lexicographic string compare (the reference
  tries float() and falls back to str compare)
- condition groups AND/OR (switch.py:82-86)

``switch_route`` is the multi-way router (C3): first condition-group
whose predicate passes wins, else the default — as a single
``when/otherwise`` chain Catalyst folds into one projection.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def numeric_or_lexicographic_cmp(left: Column, op: str, value: str) -> Column:
    """Numeric compare with lexicographic fallback (switch.py:110-128)."""
    ln = left.try_cast("double")
    rn = F.lit(value).try_cast("double")
    ls, rs = left.cast("string"), F.lit(str(value))
    if op == ">":
        num, s = ln > rn, ls > rs
    elif op == "<":
        num, s = ln < rn, ls < rs
    elif op == ">=":
        num, s = ln >= rn, ls >= rs
    elif op == "<=":
        num, s = ln <= rn, ls <= rs
    else:
        raise ValueError(op)
    both_numeric = ln.isNotNull() & rn.isNotNull()
    return F.when(both_numeric, num).otherwise(s)


def switch_predicate(col: Column, operator: str, value: str = "") -> Column:
    """One condition item (switch.py:90-129). Returns boolean Column."""
    s = col.cast("string")
    low = F.lower(s)
    v = str(value)
    vlow = v.lower()
    if operator == "contains":
        return low.contains(vlow)
    if operator == "not contains":
        return ~low.contains(vlow)
    if operator == "start with":
        return low.startswith(vlow)
    if operator == "end with":
        return low.endswith(vlow)
    if operator == "empty":
        return s.isNull() | (s == "")
    if operator == "not empty":
        return s.isNotNull() & (s != "")
    if operator == "=":
        return s == v
    if operator == "≠":
        return s != v
    if operator in (">", "<", ">=", "<="):
        return numeric_or_lexicographic_cmp(col, operator, v)
    raise ValueError(f"unknown switch operator: {operator}")


def switch_route(
    conditions: list[tuple[Column, str]], default: str
) -> Column:
    """Multi-way router: [(predicate, target)] -> target column.

    First passing group wins (switch.py:78-88 evaluation order)."""
    expr = None
    for pred, target in conditions:
        expr = F.when(pred, target) if expr is None else expr.when(pred, target)
    if expr is None:
        return F.lit(default)
    return expr.otherwise(default)
