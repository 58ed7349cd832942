"""Search-predicate builders (SURVEY.md §2.2 P5-P7, §2.8 F12).

The reference's conjunctive searches (``analytics/kpis.py:102-119``) build
``Column.contains`` chains over pipe-flattened strings — which has a latent
substring false-positive (an actor whose name contains another's,
SURVEY.md F12). Here arrays stay arrays and membership is exact
(``array_contains``); substring search is still available, explicitly.
All predicates are Catalyst expressions → pushed down / codegen'd.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import ColumnOrName, _col


def all_of(*preds: Column) -> Column:
    """Conjunction (reference chains ``&`` at ``kpis.py:104-108``)."""
    return reduce(lambda a, b: a & b, preds)


def any_of(*preds: Column) -> Column:
    return reduce(lambda a, b: a | b, preds)


def array_has(c: ColumnOrName, value) -> Column:
    """Exact membership on an array column — the correct form of the
    reference's flattened-string ``contains`` (F12)."""
    return F.array_contains(_col(c), value)


def text_contains(c: ColumnOrName, needle: str) -> Column:
    """Substring search (reference P5/P6 form)."""
    return _col(c).contains(needle)


def threshold(c: ColumnOrName, op: str, value) -> Column:
    """Parameterized threshold predicate (P7, thresholds from
    ``config/config.yaml:63-65``)."""
    col = _col(c)
    ops = {">=": col >= value, ">": col > value, "<=": col <= value, "<": col < value, "==": col == value}
    return ops[op]


def search(df: DataFrame, predicate: Column, order_by: list[Column] | None = None) -> DataFrame:
    """Filtered (optionally sorted) search — reference ``run_search_queries``
    shape (``kpis.py:99-122``)."""
    out = df.filter(predicate)
    if order_by:
        out = out.orderBy(*order_by)
    return out
