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
    mercator_xy,
    psnr,
    synth_image_table,
)


IMAGE_SCHEMA = {
    "image_id": pa.string(),
    "bytes": pa.binary(),
    "w": pa.int32(),
    "h": pa.int32(),
    "fmt": pa.string(),
    "caption": pa.string(),
    "phash": pa.int64(),
}


def read_image_table(path: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Read a stored image+caption table (the input_hint schema) as a
    streaming Dataset: a ``.lance`` dataset when the `lance` package is
    available, otherwise Parquet written with the identical columns — the
    storage stand-in this sandbox tests with (SURVEY.md §6). Column
    pruning pushes down either way; the declared columns are validated
    against IMAGE_SCHEMA so a drifted table fails loudly at the read, not
    deep inside a join."""
    if path.rstrip("/").endswith(".lance"):
        try:
            import lance  # noqa: F401
        except ImportError as e:  # pragma: no cover - lance not in this env
            raise ImportError(
                "reading a .lance dataset requires the `lance` package; "
                "re-point at the Parquet twin or install pylance"
            ) from e
        ds = ray.data.read_lance(path, columns=columns)  # pragma: no cover
    else:
        ds = ray.data.read_parquet(path, columns=columns)
    schema = ds.schema()
    for name, typ in zip(schema.names, schema.types):
        want = IMAGE_SCHEMA.get(name)
        if want is not None and typ != want:
            raise TypeError(
                f"image table column {name!r} is {typ}, input_hint wants {want}"
            )
    return ds


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
        import zlib

        from ..datagen.images import MAGIC_QLOSSY, MAGIC_RAW

        col = batch.column("bytes")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        means = np.empty((n, 3), dtype=np.float64)
        npix = np.empty(n, dtype=np.int64)
        if n:
            # zero-copy views into the Arrow binary buffer: no to_pylist()
            # bytes copies; zlib inflates straight from memoryview slices
            off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
            offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
                col.offset : col.offset + n + 1
            ]
            data = memoryview(col.buffers()[2])
            nd = np.frombuffer(data, dtype=np.uint8)
            if (offs[1:] - offs[:-1] < 10).any():
                raise ValueError("bad image magic")  # truncated blob
            # vectorized header parse: magic check + (w, h, c) for all blobs
            hdr = nd[offs[:-1, None].astype(np.int64) + np.arange(10)]
            raw_m = np.frombuffer(MAGIC_RAW, dtype=np.uint8)
            q_m = np.frombuffer(MAGIC_QLOSSY, dtype=np.uint8)
            is_raw = (hdr[:, :4] == raw_m).all(axis=1)
            isq = (hdr[:, :4] == q_m).all(axis=1)
            if not (is_raw | isq).all():
                raise ValueError("bad image magic")  # same as decode_image
            whc = np.ascontiguousarray(hdr[:, 4:10]).view("<u2").astype(np.int64)
            # only the zlib inflate is per-blob (C, variable-size payloads);
            # per-channel sums run batched via reduceat, with raw and qlossy
            # blobs concatenated separately so the dequant LUT gather only
            # touches qlossy pixels (no full-size where/repeat temporaries)
            bufs_raw: list[bytes] = []
            bufs_q: list[bytes] = []
            for j in range(n):
                buf = zlib.decompress(data[offs[j] + 10 : offs[j + 1]])
                (bufs_q if isq[j] else bufs_raw).append(buf)
            npix = whc[:, 0] * whc[:, 1]
            sums = np.empty((n, 3), dtype=np.int64)
            for mask, bufs, dequant in (
                (is_raw, bufs_raw, None),
                (isq, bufs_q, self.dequant),
            ):
                if not bufs:
                    continue
                flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
                if dequant is not None:
                    flat = dequant[flat]
                # per-(blob, channel) contiguous segments in planar layout;
                # reduceat accumulates straight into int64 (exact, no 8x copy)
                seg = np.repeat(npix[mask], whc[mask, 2])
                starts = np.concatenate([[0], np.cumsum(seg)[:-1]])
                sums[mask] = np.add.reduceat(flat, starts, dtype=np.int64).reshape(-1, 3)
            means = sums / npix[:, None].astype(np.float64)
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


class ImageResizer:
    """Actor-pool decode → nearest-neighbor resize → re-encode stage.

    Deterministic floor-index sampling (``(arange(tw) * w) // tw``) keeps
    the output reproducible across workers; each image is re-encoded in its
    original format so downstream decoders see the same container. The
    resized payload replaces ``bytes`` in place — a typical thumbnailing
    stage for a multimodal training pipeline. Binary payloads never leave
    the stage except as the (smaller) output column.
    """

    def __init__(self, target_w: int = 16, target_h: int = 16) -> None:
        from ..datagen.images import decode_image, encode_image

        self.tw, self.th = target_w, target_h
        self.decode, self.encode = decode_image, encode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        fmts = batch.column("fmt").to_pylist()
        out = []
        for blob, fmt in zip(blobs, fmts):
            px = self.decode(blob)
            _, h, w = px.shape
            xi = (np.arange(self.tw) * w) // self.tw
            yi = (np.arange(self.th) * h) // self.th
            out.append(self.encode(px[:, yi[:, None], xi[None, :]], fmt))
        t = batch.drop_columns(["bytes", "w", "h"])
        t = t.append_column("w", pa.array(np.full(len(out), self.tw, dtype=np.int32)))
        t = t.append_column("h", pa.array(np.full(len(out), self.th, dtype=np.int32)))
        return t.append_column("bytes", pa.array(out, pa.binary()))


def resized_images(
    images: "ray.data.Dataset", target_w: int = 16, target_h: int = 16, concurrency=(1, 32)
) -> "ray.data.Dataset":
    return images.map_batches(
        ImageResizer,
        fn_constructor_args=(target_w, target_h),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=concurrency,
    )


class ImageEmbedder:
    """Actor-pool feature extraction: decode → grid mean-pool → unit-norm
    embedding (3 channels × g×g blocks). A deterministic stand-in for a
    vision encoder with the real Ray plumbing: per-actor state in
    ``__init__``, fixed-dim ``list<float>`` output column ready for the
    ANN / near-dup operators."""

    def __init__(self, grid: int = 4) -> None:
        from ..datagen.images import decode_image

        self.grid = grid
        self.decode = decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.grid
        blobs = batch.column("bytes").to_pylist()
        dim = 3 * g * g
        embs = np.empty((len(blobs), dim), dtype=np.float32)
        for j, blob in enumerate(blobs):
            px = self.decode(blob).astype(np.float64)
            _, h, w = px.shape
            ys = (np.arange(h) * g) // h
            xs = (np.arange(w) * g) // w
            pooled = np.zeros((3, g, g))
            counts = np.zeros((g, g))
            np.add.at(counts, (ys[:, None], xs[None, :]), 1.0)
            for c in range(3):
                np.add.at(pooled[c], (ys[:, None], xs[None, :]), px[c])
            v = (pooled / counts).reshape(-1)
            n = np.linalg.norm(v)
            embs[j] = (v / n if n > 0 else v).astype(np.float32)
        out = batch.drop_columns(["bytes"])
        return out.append_column(
            "embedding",
            pa.FixedSizeListArray.from_arrays(pa.array(embs.reshape(-1), pa.float32()), dim),
        )


def image_embeddings(
    images: "ray.data.Dataset", grid: int = 4, concurrency=(1, 32)
) -> "ray.data.Dataset":
    return images.map_batches(
        ImageEmbedder,
        fn_constructor_args=(grid,),
        batch_format="pyarrow",
        batch_size=512,
        concurrency=concurrency,
    )


def video_dataset(n: int, n_frames: int = 8) -> "ray.data.Dataset":
    """Distributed deterministic synthesis of an n-row video table."""
    from ..datagen.images import synth_video_table

    def synth(batch: pa.Table) -> pa.Table:
        return synth_video_table(batch.column("id").to_numpy(), n_frames)

    return ray.data.range(n).map_batches(synth, batch_format="pyarrow", batch_size=256)


class FrameSampler:
    """Actor-pool demux + frame sampling: every ``stride``-th frame of each
    video container becomes one output row (video_id, frame_idx, decoded
    channel means). A 1→N batch transform over opaque binary payloads —
    the video blob never leaves the stage."""

    def __init__(self, stride: int = 2) -> None:
        from ..datagen.images import decode_image, demux_video

        self.stride = stride
        self.demux, self.decode = demux_video, decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch.column("video_id").to_pylist()
        blobs = batch.column("bytes").to_pylist()
        out_v: list[str] = []
        out_f: list[int] = []
        means: list[np.ndarray] = []
        for vid, blob in zip(vids, blobs):
            frames = self.demux(blob)
            for f in range(0, len(frames), self.stride):
                px = self.decode(frames[f])
                out_v.append(vid)
                out_f.append(f)
                means.append(px.reshape(3, -1).mean(axis=1))
        m = np.asarray(means) if means else np.empty((0, 3))
        return pa.table(
            {
                "video_id": pa.array(out_v, pa.string()),
                "frame_idx": pa.array(out_f, pa.int64()),
                "mean_r": pa.array(m[:, 0], pa.float64()),
                "mean_g": pa.array(m[:, 1], pa.float64()),
                "mean_b": pa.array(m[:, 2], pa.float64()),
            }
        )


def sampled_frames(
    videos: "ray.data.Dataset", stride: int = 2, concurrency=(1, 32)
) -> "ray.data.Dataset":
    return videos.map_batches(
        FrameSampler,
        fn_constructor_args=(stride,),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def phash_near_dup_pairs(
    images: "ray.data.Dataset",
    max_hamming: int = 4,
    bucket_cap: int = 4096,
) -> "ray.data.Dataset":
    """Image near-duplicate pairs by perceptual-hash Hamming distance —
    the standard image dedup for a training-data pipeline, over the
    input_hint table's ``phash:int64`` column (no pixel decode needed).

    Exact (not approximate): the generic pigeonhole-banding core
    `text.hamming_near_dup_pairs` splits the 64-bit phash into
    ``max_hamming + 1`` bands, so every pair within the Hamming budget
    shares at least one exact band value and candidate generation is a
    bounded groupby — only (band, value, image_id, phash) rows shuffle,
    never ``bytes``. Over-cap buckets (a degenerate corpus of one
    near-identical image) are triangle-blocked; see the core's docstring.

    Returns one row per unordered pair: ``image_a < image_b``,
    ``hamming`` ≤ ``max_hamming``.

    For keep-one-per-cluster dedup, feed these pairs to
    `graph.connected_components` + `graph.labeled_clusters` exactly as
    `text.simhash_dedup_clusters` does — those primitives shuffle int64
    (node, label) pairs, so map string image ids to a unique int64 column
    first (the synthesized table's ids embed their integer index; don't
    hash-derive one, a 64-bit hash is not collision-free at 10^12 rows).
    """
    from .text import hamming_near_dup_pairs

    return hamming_near_dup_pairs(
        images.select_columns(["image_id", "phash"]),
        id_col="image_id",
        sig_col="phash",
        out_a="image_a",
        out_b="image_b",
        max_hamming=max_hamming,
        bucket_cap=bucket_cap,
    )
