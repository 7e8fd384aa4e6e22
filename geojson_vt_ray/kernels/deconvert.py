"""Internal features → GeoJSON (reference `src/deconvert.ts`)."""

from __future__ import annotations

from .project import unproject_x, unproject_y


def convert_to_geojson(source: list[dict]) -> dict:
    return {
        "type": "FeatureCollection",
        "features": [feature_to_geojson(f) for f in source],
    }


def feature_to_geojson(feature: dict) -> dict:
    out = {
        "type": "Feature",
        "geometry": _geometry_to_geojson(feature),
        "properties": feature["tags"],
    }
    if feature["id"] is not None:
        out["id"] = feature["id"]
    return out


def _geometry_to_geojson(feature: dict) -> dict:
    ftype = feature["type"]
    geometry = feature["geometry"]
    if ftype == "Point":
        return {"type": ftype, "coordinates": _unproject_pt(geometry[0], geometry[1])}
    if ftype == "MultiPoint":
        return {"type": ftype, "coordinates": _unproject_flat(geometry)}
    if ftype == "LineString":
        return {"type": ftype, "coordinates": _unproject_flat(geometry.points)}
    if ftype in ("MultiLineString", "Polygon"):
        return {"type": ftype, "coordinates": [_unproject_flat(r.points) for r in geometry]}
    # MultiPolygon
    return {
        "type": ftype,
        "coordinates": [[_unproject_flat(r.points) for r in poly] for poly in geometry],
    }


def _unproject_flat(points) -> list:
    return [_unproject_pt(points[i], points[i + 1]) for i in range(0, len(points), 3)]


def _unproject_pt(x: float, y: float) -> list:
    return [unproject_x(x), unproject_y(y)]
