"""Run configuration for the tiling engine.

Semantics mirror the reference option set (geojson-vt `src/geojsonvt.ts:9-23`,
`src/definitions.ts:1-79`); the implementation here is an independent
Ray-Data-first engine, not a port.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Callable, Optional


@dataclass(frozen=True)
class ClusterOptions:
    """Supercluster-style clustering knobs (reference `src/cluster-tile-index.ts:17-28`)."""

    min_zoom: int = 0
    max_zoom: int = 16
    min_points: int = 2
    radius: float = 40.0
    extent: int = 512
    node_size: int = 64
    generate_id: bool = False
    # user-defined property aggregation hooks (map/reduce UDFs)
    map: Optional[Callable[[dict], dict]] = None
    reduce: Optional[Callable[[dict, dict], None]] = None


@dataclass(frozen=True)
class TilerOptions:
    """Tiling options (reference defaults `src/geojsonvt.ts:9-23`)."""

    max_zoom: int = 14
    index_max_zoom: int = 5
    index_max_points: int = 100_000
    tolerance: float = 3.0
    extent: int = 4096
    buffer: int = 64
    line_metrics: bool = False
    promote_id: Optional[str] = None
    generate_id: bool = False
    updateable: bool = False
    cluster: bool = False
    cluster_options: ClusterOptions = field(default_factory=ClusterOptions)
    # one-shot tile path extras (reference `src/definitions.ts:68-79`)
    wrap: bool = False
    clip: bool = False
    # 0 = off, 1 = per-zoom tile counters, 2 = + per-tile logging
    # (reference `src/geojsonvt.ts:22`, `src/tile-index.ts:9-31,162-169`)
    debug: int = 0

    def validate(self) -> "TilerOptions":
        if self.max_zoom < 0 or self.max_zoom > 24:
            raise ValueError("maxZoom should be in the 0-24 range")
        if self.promote_id and self.generate_id:
            raise ValueError("promoteId and generateId cannot be used together.")
        return self

    def with_(self, **kw: Any) -> "TilerOptions":
        return replace(self, **kw)

    @property
    def base_sq_tolerance(self) -> float:
        """Squared simplification tolerance in world units at max zoom
        (reference `src/convert.ts:49`)."""
        return (self.tolerance / ((1 << self.max_zoom) * self.extent)) ** 2


DEFAULT_OPTIONS = TilerOptions()
