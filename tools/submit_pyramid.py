"""Cluster job entrypoint for the resumable pyramid sink.

This is the script the north-star deployment submits to a fixed-size
multi-node cluster:

    ray job submit --working-dir /root/repo -- \
        python tools/submit_pyramid.py \
        --input /data/features.parquet --out /shared/pyramid \
        --max-zoom 14 --z-handoff 7

It is equally runnable standalone on a single node (the sandbox mode):
Ray auto-connects to the cluster the job runner provides (``RAY_ADDRESS``)
or starts a local instance. The sink is resumable: re-submitting the same
job after a failure skips every bin partition whose checkpoint manifest
(`out/_done/<bin>.done` — tile/feature/point metrics + input-seq lineage
span) is already present.

Input is either a parquet file/directory of ``{feature_json, input_seq}``
rows or a raw ``.json``/``.geojson`` FeatureCollection (converted to rows
distributedly).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="parquet rows or .geojson file")
    ap.add_argument("--out", required=True, help="pyramid output directory")
    ap.add_argument("--max-zoom", type=int, default=14)
    ap.add_argument("--z-handoff", type=int, default=7)
    ap.add_argument("--buffer", type=int, default=64)
    ap.add_argument("--extent", type=int, default=4096)
    ap.add_argument("--tolerance", type=float, default=3.0)
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)

    import ray.data

    from geojson_vt_ray.options import TilerOptions
    from geojson_vt_ray.ray_pipeline.cascade import write_pyramid_fast
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    if args.input.endswith((".json", ".geojson")):
        with open(args.input) as f:
            ds = dataset_from_geojson(json.load(f))
    else:
        ds = ray.data.read_parquet(args.input, columns=["feature_json", "input_seq"])

    options = TilerOptions(
        max_zoom=args.max_zoom,
        buffer=args.buffer,
        extent=args.extent,
        tolerance=args.tolerance,
    )
    t0 = time.perf_counter()
    stats = write_pyramid_fast(
        ds, options, args.out, z_handoff=min(args.z_handoff, args.max_zoom)
    )
    stats["wall_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
