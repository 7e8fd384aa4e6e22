"""Source diffs: keyed remove / add(replace) / per-feature update
(reference `src/difference.ts`).

Semantically these are anti-join (remove ids), union (converted adds), and a
keyed update join; updates must touch every wrap-duplicated instance of an
id (`src/difference.ts:111-121`). The Ray incremental path broadcasts the
hashed diff and applies the same kernels per batch.
"""

from __future__ import annotations

from typing import Any, Optional

from ..kernels.convert import convert_to_internal
from ..kernels.wrap import wrap
from ..options import TilerOptions


def diff_to_hashed(diff: Optional[dict], options: TilerOptions) -> dict:
    if not diff:
        return {"removeAll": None, "remove": set(), "add": {}, "update": {}}
    add = {}
    for feature in diff.get("add") or []:
        if options.promote_id:
            props = feature.get("properties") or {}
            key = props.get(options.promote_id)
        else:
            key = feature.get("id")
        add[key] = feature
    return {
        "removeAll": diff.get("removeAll"),
        "remove": set(diff.get("remove") or []),
        "add": add,
        "update": {u["id"]: u for u in diff.get("update") or []},
    }


def apply_source_diff(
    source: list[dict], data_diff: Optional[dict], options: TilerOptions
) -> tuple[list[dict], list[dict]]:
    """Returns (affected, new_source)."""
    diff = diff_to_hashed(data_diff, options)
    affected: list[dict] = []

    if diff["removeAll"]:
        affected = source
        source = []

    if diff["remove"] or diff["add"]:
        remove_features = [
            f for f in source if f["id"] in diff["remove"] or f["id"] in diff["add"]
        ]
        if remove_features:
            affected = affected + remove_features
            remove_ids = {f["id"] for f in remove_features}
            source = [f for f in source if f["id"] not in remove_ids]
        if diff["add"]:
            add_features = convert_to_internal(
                {"type": "FeatureCollection", "features": list(diff["add"].values())}, options
            )
            add_features = wrap(add_features, options)
            affected = affected + add_features
            source = source + add_features

    if diff["update"]:
        old_map: dict[Any, list[dict]] = {}
        keep: list[dict] = []
        for f in source:
            if f["id"] in diff["update"]:
                old_map.setdefault(f["id"], []).append(f)
            else:
                keep.append(f)
        for fid, update in diff["update"].items():
            old_features = old_map.get(fid)
            if not old_features:
                continue
            updated = _get_updated_features(old_features, update, options)
            affected = affected + old_features + updated
            keep = keep + updated
        source = keep

    return affected, source


def _get_updated_features(features: list[dict], update: dict, options: TilerOptions) -> list[dict]:
    change_geometry = bool(update.get("newGeometry"))
    change_props = bool(
        update.get("removeAllProperties")
        or update.get("removeProperties")
        or update.get("addOrUpdateProperties")
    )

    if change_geometry:
        first = features[0]
        geojson_feature = {
            "type": "Feature",
            "id": first["id"],
            "geometry": update["newGeometry"],
            "properties": _apply_property_updates(first["tags"], update)
            if change_props
            else first["tags"],
        }
        out = convert_to_internal(
            {"type": "FeatureCollection", "features": [geojson_feature]}, options
        )
        return wrap(out, options)

    if change_props:
        updated = []
        for f in features:
            nf = dict(f)
            nf["tags"] = _apply_property_updates(nf["tags"], update)
            updated.append(nf)
        return updated

    return features


def _apply_property_updates(tags: Optional[dict], update: dict) -> dict:
    if update.get("removeAllProperties"):
        return {}
    properties = dict(tags or {})
    for key in update.get("removeProperties") or []:
        properties.pop(key, None)
    for kv in update.get("addOrUpdateProperties") or []:
        properties[kv["key"]] = kv["value"]
    return properties
