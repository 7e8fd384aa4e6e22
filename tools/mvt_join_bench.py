"""A/B bench for the multi-layer MVT join (round-5 task 4): the
one-shuffle `mvt_join_layers` vs the shuffle-free
`mvt_join_layers_copartitioned` over the SAME stored
`write_pyramid_pkey` layouts.

Both variants read the same on-disk layers (us-states z0..z12 and a
synthetic rect pyramid z0..z8), produce one multi-layer MVT blob per
tile present in either layer, and are verified identical here by row
count + an order-independent checksum over (z, x, y, crc32(mvt)) —
the per-blob byte equality is pinned separately in
`tests/test_mvt_direct.py::test_copartitioned_join_matches_shuffle_join`.

Usage: RAY_GRAFT_CPUS=32 python tools/mvt_join_bench.py [n_partitions]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    + os.pathsep
    + os.environ.get("PYTHONPATH", "")
)

import numpy as np
import pyarrow as pa

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
US_STATES = os.path.join(REPO, "tests/fixtures/us-states.json")


def main() -> None:
    n_partitions = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from geojson_vt_ray.datagen.rects import rect_geojson
    from geojson_vt_ray.options import TilerOptions
    from geojson_vt_ray.ray_pipeline.cascade import build_pyramid_fast
    from geojson_vt_ray.ray_pipeline.mvt_sink import (
        mvt_join_layers,
        mvt_join_layers_copartitioned,
        write_pyramid_pkey,
    )
    from geojson_vt_ray.ray_pipeline.tiler import dataset_from_geojson

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 2)
        return out

    states = build_pyramid_fast(
        dataset_from_geojson(json.load(open(US_STATES))),
        TilerOptions(max_zoom=12),
        z_handoff=6,
    ).materialize()
    rects = build_pyramid_fast(
        dataset_from_geojson(rect_geojson(np.arange(500, dtype=np.uint64))),
        TilerOptions(max_zoom=8),
        z_handoff=4,
    ).materialize()
    n_states, n_rects = states.count(), rects.count()

    base = "/tmp/graft_mvt_join_bench"
    shutil.rmtree(base, ignore_errors=True)
    dirs = {"states": f"{base}/states", "rects": f"{base}/rects"}
    timed(
        "write_pkey_layers",
        lambda: [
            write_pyramid_pkey(states, dirs["states"], n_partitions),
            write_pyramid_pkey(rects, dirs["rects"], n_partitions),
        ],
    )

    def from_store(d: str) -> "ray.data.Dataset":
        """Rebuild the (z, x, y, features_json) shuffle-join input from the
        stored pkey layout, so BOTH variants start from the same bytes."""

        def unpack(batch: pa.Table) -> pa.Table:
            tkey = batch.column("tkey").to_numpy()
            return pa.table(
                {
                    "z": pa.array((tkey >> 58).astype(np.int32)),
                    "x": pa.array(((tkey >> 29) & ((1 << 29) - 1)).astype(np.int32)),
                    "y": pa.array((tkey & ((1 << 29) - 1)).astype(np.int32)),
                    "features_json": batch.column("features_json"),
                }
            )

        return ray.data.read_parquet(d, columns=["tkey", "features_json"]).map_batches(
            unpack, batch_format="pyarrow"
        )

    def checksum(ds: "ray.data.Dataset") -> tuple[int, int]:
        """Order-independent (count, uint64-wraparound sum of mixed
        (z, x, y, crc32(mvt))) over the joined tiles; tiny partials only."""

        def partial(batch: pa.Table) -> pa.Table:
            z = batch.column("z").to_numpy().astype(np.uint64)
            x = batch.column("x").to_numpy().astype(np.uint64)
            y = batch.column("y").to_numpy().astype(np.uint64)
            crcs = np.array(
                [zlib.crc32(b) for b in batch.column("mvt").to_pylist()],
                dtype=np.uint64,
            )
            mixed = (z << np.uint64(58)) ^ (x << np.uint64(29)) ^ y ^ (
                crcs * np.uint64(0x9E3779B97F4A7C15)
            )
            return pa.table(
                {
                    "n": pa.array([batch.num_rows], pa.int64()),
                    "h": pa.array([int(mixed.sum(dtype=np.uint64))], pa.uint64()),
                }
            )

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        n = sum(int(r["n"]) for r in rows)
        h = sum(int(r["h"]) for r in rows) % (1 << 64)
        return (n, h)

    shuffled = timed(
        "join_shuffle",
        lambda: mvt_join_layers(
            {n: from_store(d) for n, d in dirs.items()}, n_partitions=n_partitions
        ).materialize(),
    )
    copart = timed(
        "join_copartitioned",
        lambda: mvt_join_layers_copartitioned(dirs).materialize(),
    )
    cs_a = checksum(shuffled)
    cs_b = checksum(copart)
    assert cs_a == cs_b, (cs_a, cs_b)

    n_tiles = cs_a[0]
    shutil.rmtree(base, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "multi-layer MVT join A/B (shuffle vs co-partitioned)",
                "num_cpus": num_cpus,
                "n_partitions": n_partitions,
                "layer_tiles": {"states": n_states, "rects": n_rects},
                "joined_tiles": n_tiles,
                "identical_outputs": True,
                "timings": timings,
                "tiles_per_sec": {
                    "shuffle": round(n_tiles / timings["join_shuffle"], 1),
                    "copartitioned": round(n_tiles / timings["join_copartitioned"], 1),
                },
                "speedup": round(
                    timings["join_shuffle"] / timings["join_copartitioned"], 2
                ),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
