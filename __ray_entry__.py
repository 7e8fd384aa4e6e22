"""Driver contract for the Ray-Data-native geojson-vt graft engine.

``entry()`` runs the flagship pipeline (rect polygon layer → full tile
pyramid + image tile assignment) on sf0.001. ``queries()`` exposes one
callable per implemented operator (SURVEY.md §2 + training-data ops);
``oracle_sql()`` carries the DuckDB-equivalent SQL for every
SQL-expressible query. Ray is initialised by the driver — nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: slice the rectangle polygon layer into the z0–z6 pyramid and
    return per-tile stats (driver checks rows >= 0 and stable schema)."""
    from geojson_vt_ray.ray_pipeline.entry_queries import q_rect_pyramid

    return q_rect_pyramid("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from geojson_vt_ray.ray_pipeline.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from geojson_vt_ray.ray_pipeline.entry_queries import ORACLES

    return dict(ORACLES)
