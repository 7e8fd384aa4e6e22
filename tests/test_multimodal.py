"""Resize / feature-extract / frame-sample stages over the synthetic
binary image and video payloads (codec invariants + Ray plumbing)."""

import numpy as np
import pytest

from geojson_vt_ray.datagen.images import (
    decode_image,
    demux_video,
    image_size,
    psnr,
    synth_pixels,
    synth_video_row,
)


def test_video_container_roundtrip():
    row = synth_video_row(7, n_frames=5)
    frames = demux_video(row["bytes"])
    assert len(frames) == 5
    w, h = image_size(7)
    for f, blob in enumerate(frames):
        px = decode_image(blob)
        assert px.shape == (3, h, w)
        want = synth_pixels(7 + 1000003 * f, w, h)
        if f % 2 == 0:  # raw frames are lossless
            assert np.array_equal(px, want)
        else:  # qlossy frames: bounded quantization error
            assert psnr(px, want) >= 40.0


def test_resize_stage_exact_nearest_neighbor(ray_session):
    from geojson_vt_ray.ray_pipeline.images import image_dataset, resized_images

    out = resized_images(image_dataset(40), 16, 16).to_pandas().set_index("image_id")
    assert set(out.w) == {16} and set(out.h) == {16}
    for i in [2, 7, 30]:  # even = raw (lossless): resize must be bit-exact
        w, h = image_size(i)
        px = synth_pixels(i, w, h)
        xi = (np.arange(16) * w) // 16
        yi = (np.arange(16) * h) // 16
        want = px[:, yi[:, None], xi[None, :]]
        got = decode_image(out.loc[f"img-{i:012d}", "bytes"])
        if i % 2 == 0:
            assert np.array_equal(got, want)
        else:
            assert psnr(got, want) >= 40.0
        # thumbnails are smaller than the source payloads for larger images
    assert out.loc["img-000000000030", "bytes"] is not None


def test_embedding_stage_matches_direct_pooling(ray_session):
    from geojson_vt_ray.ray_pipeline.images import image_dataset, image_embeddings

    out = image_embeddings(image_dataset(20), grid=4).to_pandas().set_index("image_id")
    emb = np.asarray(list(out.loc["img-000000000004", "embedding"]))
    assert emb.shape == (48,)
    assert np.linalg.norm(emb) == pytest.approx(1.0, abs=1e-5)
    # direct computation for a raw (lossless) image
    i = 4
    w, h = image_size(i)
    px = synth_pixels(i, w, h).astype(np.float64)
    ys = (np.arange(h) * 4) // h
    xs = (np.arange(w) * 4) // w
    pooled = np.zeros((3, 4, 4))
    counts = np.zeros((4, 4))
    np.add.at(counts, (ys[:, None], xs[None, :]), 1.0)
    for c in range(3):
        np.add.at(pooled[c], (ys[:, None], xs[None, :]), px[c])
    v = (pooled / counts).reshape(-1)
    v = v / np.linalg.norm(v)
    assert np.allclose(emb, v, atol=1e-6)


def test_frame_sampler_stride_and_means(ray_session):
    from geojson_vt_ray.ray_pipeline.images import sampled_frames, video_dataset

    out = sampled_frames(video_dataset(6, n_frames=8), stride=3).to_pandas()
    # frames 0, 3, 6 per video
    assert len(out) == 6 * 3
    assert set(out.frame_idx) == {0, 3, 6}
    one = out[(out.video_id == "vid-000000000002") & (out.frame_idx == 0)].iloc[0]
    w, h = image_size(2)
    want = synth_pixels(2, w, h).reshape(3, -1).mean(axis=1)
    assert one.mean_r == pytest.approx(want[0])
    assert one.mean_g == pytest.approx(want[1])
    assert one.mean_b == pytest.approx(want[2])


def test_image_embeddings_feed_ann(ray_session):
    """The extracted embeddings plug straight into the ANN operator."""
    from geojson_vt_ray.ray_pipeline.ann import brute_force_topk
    from geojson_vt_ray.ray_pipeline.images import image_dataset, image_embeddings

    import pyarrow as pa

    embs = image_embeddings(image_dataset(60), grid=4)

    def to_vec_rows(batch: pa.Table) -> pa.Table:
        ids = [int(s[4:]) for s in batch.column("image_id").to_pylist()]
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()), "embedding": batch.column("embedding")}
        )

    vecs = embs.map_batches(to_vec_rows, batch_format="pyarrow")
    mat = np.asarray(
        [list(v) for v in vecs.to_pandas().sort_values("vec_id").embedding]
    ).astype(np.float64)
    out = brute_force_topk(vecs, mat[:3], np.arange(3), k=4).to_pandas()
    assert len(out) == 12
    assert (out.groupby("query_id").cos_sim.max() <= 1.0 + 1e-9).all()
