"""Externalized configuration for the movie pipeline.

The reference drives IDs, paths, thresholds and KPI lists from YAML
(``config/config.yaml``; loader singleton with defaults at
``src/utils/config.py:23-125``). The engine's equivalent is a frozen
dataclass — typed, testable by injection, and loadable from a YAML/JSON file
when "change behavior without code" is needed. All defaults mirror the
reference's ``config.yaml`` values (thresholds at ``config.yaml:62-80``, KPI
list at ``config.yaml:83-93``, drop list at ``config.yaml:68-74``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, fields, replace
from typing import Any

#: clean_transform.py:76-77 / config.yaml:68-74
DEFAULT_DROP: tuple[str, ...] = ("adult", "imdb_id", "original_title", "video", "homepage", "status")

#: schemas.py:176-184 (with the vote_count int pin, SURVEY §1.3)
DEFAULT_NUMERIC_CASTS: dict[str, str] = {
    "budget": "double",
    "revenue": "double",
    "popularity": "double",
    "vote_average": "double",
    "vote_count": "int",
    "runtime": "int",
    "id": "int",
}

#: The 10 ranking KPIs (``kpis.py:80-91``; names from ``config.yaml:83-93``).
#: ``min_budget``/``min_votes`` entries become pre-rank filters.
DEFAULT_KPI_SPECS: dict[str, dict] = {
    "highest_revenue": {"metric": "revenue_musd", "order": "desc"},
    "highest_budget": {"metric": "budget_musd", "order": "desc"},
    "highest_profit": {"metric": "profit_musd", "order": "desc"},
    "lowest_profit": {"metric": "profit_musd", "order": "asc"},
    "highest_roi": {"metric": "roi", "order": "desc", "min_budget": 10.0},
    "lowest_roi": {"metric": "roi", "order": "asc", "min_budget": 10.0},
    "most_voted": {"metric": "vote_count", "order": "desc"},
    "highest_rated": {"metric": "vote_average", "order": "desc", "min_votes": 10},
    "lowest_rated": {"metric": "vote_average", "order": "asc", "min_votes": 10},
    "most_popular": {"metric": "popularity", "order": "desc"},
}


@dataclass(frozen=True)
class MoviePipelineConfig:
    """Every knob ``pipelines.movies`` consults, in one injectable object."""

    drop_columns: tuple[str, ...] = DEFAULT_DROP
    numeric_casts: dict[str, str] = field(default_factory=lambda: dict(DEFAULT_NUMERIC_CASTS))
    kpi_specs: dict[str, dict] = field(default_factory=lambda: {k: dict(v) for k, v in DEFAULT_KPI_SPECS.items()})
    #: config.yaml:63 — ROI only meaningful above this budget (musd)
    min_budget_for_roi: float = 10.0
    #: clean_transform.py:140-143 — vote_average needs at least this many votes
    min_votes_for_rating: int = 1
    default_top_n: int = 5
    #: clean_transform.py:157-158 — completeness floor
    min_non_null: int = 10
    #: clean_transform.py:146-150 — placeholder text treated as NULL
    sentinels: tuple[str, ...] = ("No Data",)
    #: enforce schemas.BRONZE_SCHEMA / SILVER_SCHEMA at the curate boundary
    validate_schemas: bool = True
    #: config.yaml:96-99 — the reference DECLARES this threshold but never
    #: enforces it; here ingest aborts (no done-marker) when the fetch
    #: rejection rate exceeds it
    max_rejection_rate: float = 0.2


DEFAULT_CONFIG = MoviePipelineConfig()


def config_from_dict(data: dict[str, Any], base: MoviePipelineConfig = DEFAULT_CONFIG) -> MoviePipelineConfig:
    """Overlay a plain dict (parsed YAML/JSON) onto a base config; unknown
    keys raise (a typo'd threshold silently keeping its default is the worst
    failure mode a config file can have)."""
    known = {f.name for f in fields(MoviePipelineConfig)}
    unknown = set(data) - known
    if unknown:
        raise KeyError(f"unknown config keys: {sorted(unknown)}; known: {sorted(known)}")
    coerced = dict(data)
    for tup_key in ("drop_columns", "sentinels"):
        if tup_key in coerced and not isinstance(coerced[tup_key], tuple):
            coerced[tup_key] = tuple(coerced[tup_key])
    return replace(base, **coerced)


def load_config(path: str, base: MoviePipelineConfig = DEFAULT_CONFIG) -> MoviePipelineConfig:
    """Load overrides from a YAML (if PyYAML is available) or JSON file."""
    with open(path) as fh:
        raw = fh.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml
        except ImportError as e:  # pragma: no cover - env-dependent
            raise ImportError("PyYAML is not installed; use a .json config instead") from e
        data = yaml.safe_load(raw) or {}
    else:
        data = json.loads(raw)
    return config_from_dict(data, base)
