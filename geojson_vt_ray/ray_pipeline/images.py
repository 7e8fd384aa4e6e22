"""Image-table Ray stages: synthesis source, decode/feature-extract actor pool.

The image table (input_hint schema) is synthesized distributed —
``ray.data.range(n)`` → ``map_batches`` — so generation scales with the
cluster and never materializes on the driver. Decoding is an actor-pool
stage: codec state (dequant LUTs) is built once per actor in ``__init__``,
batches stream through ``__call__`` (SURVEY.md §7 step 4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..datagen.images import (
    decode_image,
    mercator_xy,
    psnr,
    synth_image_table,
)


def image_dataset(n: int, with_bytes: bool = True, override_num_blocks: int | None = None) -> "ray.data.Dataset":
    """Distributed deterministic synthesis of the n-row image table."""

    def synth(batch: pa.Table) -> pa.Table:
        return synth_image_table(batch.column("id").to_numpy(), with_bytes)

    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(synth, batch_format="pyarrow", batch_size=2048)


class ImageDecoder:
    """Actor-pool decode + per-image feature extraction.

    Emits per-row decoded-pixel statistics (mean channel values, PSNR vs the
    stored encoding's exactness contract is validated in tests). Binary
    payloads stay inside the batch; only small features leave the stage.
    """

    def __init__(self) -> None:
        # dequant lookup built once per actor (stands in for codec tables /
        # model weights of a real decoder)
        self.dequant = (((np.arange(256, dtype=np.uint16) << 2) | 2).clip(0, 255)).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        means = np.empty((len(blobs), 3), dtype=np.float64)
        npix = np.empty(len(blobs), dtype=np.int64)
        for j, blob in enumerate(blobs):
            px = decode_image(blob)
            means[j] = px.reshape(3, -1).mean(axis=1)
            npix[j] = px.shape[1] * px.shape[2]
        out = batch.drop_columns(["bytes"])
        out = out.append_column("mean_r", pa.array(means[:, 0]))
        out = out.append_column("mean_g", pa.array(means[:, 1]))
        out = out.append_column("mean_b", pa.array(means[:, 2]))
        out = out.append_column("n_pixels", pa.array(npix))
        return out


def decoded_features(images: "ray.data.Dataset", concurrency=(1, 32)) -> "ray.data.Dataset":
    return images.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=1024, concurrency=concurrency
    )


def with_mercator(images: "ray.data.Dataset") -> "ray.data.Dataset":
    """Append exact phash-derived mercator world coordinates."""

    def fn(batch: pa.Table) -> pa.Table:
        mx, my = mercator_xy(batch.column("phash").to_numpy())
        return batch.append_column("mx", pa.array(mx)).append_column("my", pa.array(my))

    return images.map_batches(fn, batch_format="pyarrow")
