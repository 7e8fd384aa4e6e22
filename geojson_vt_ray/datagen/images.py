"""Lance-shaped image+caption table: synthesis, codec, georeferencing.

Schema is exactly BASELINE.json ``input_hint``::

    image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64

Everything is a deterministic pure function of the row index ``i`` (seeded
synthesis — no RNG state, safe to generate distributed and resumable):

* pixels: per-channel integer pattern of ``i`` (uint8, RGB planar).
* ``fmt``: alternates ``raw`` (lossless) / ``qlossy`` (from-scratch lossy,
  6-bit quantization → PSNR ≈ 42.7 dB ≥ 40 dB bound).
* ``phash``: perceptual-hash-like 63-bit key. Because the pixels themselves
  are a pure function of ``i``, the hash is defined directly as a mixed
  integer function of ``i`` — chosen SQL-expressible so the DuckDB oracle can
  reproduce the georeference exactly with integer arithmetic.

Georeference rule (the one rule used by the engine, the oracle, and the
synthesizer — FIXTURES.md §3):

    lng_bits = phash & 0xFFFFFFFF          (32 bits)
    lat_bits = (phash >> 32) & 0x7FFFFFFF  (31 bits)
    mercator_x = lng_bits / 2^32           ∈ [0, 1)
    mercator_y = lat_bits / 2^31           ∈ [0, 1)

Dyadic rationals: exact in float64 on every engine, so tile assignment at any
zoom is exact integer arithmetic (``x = lng_bits >> (32 - z)``).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

MAGIC_RAW = b"GVR1"
MAGIC_QLOSSY = b"GVQ1"

LNG_MULT = 2654435761  # Knuth multiplicative hash constants
LAT_MULT = 2246822519


def phash_of_index(i: int) -> int:
    lng_bits = (i * LNG_MULT) % (1 << 32)
    lat_bits = (i * LAT_MULT) % (1 << 31)
    return (lat_bits << 32) | lng_bits


def phash_of_index_vec(i: np.ndarray) -> np.ndarray:
    i = i.astype(np.uint64)
    lng_bits = (i * np.uint64(LNG_MULT)) % np.uint64(1 << 32)
    lat_bits = (i * np.uint64(LAT_MULT)) % np.uint64(1 << 31)
    return ((lat_bits << np.uint64(32)) | lng_bits).astype(np.int64)


def mercator_xy(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """phash → exact mercator [0,1)² world coordinates."""
    p = np.asarray(phash).astype(np.uint64)
    lng_bits = p & np.uint64(0xFFFFFFFF)
    lat_bits = (p >> np.uint64(32)) & np.uint64(0x7FFFFFFF)
    return lng_bits / np.float64(1 << 32), lat_bits / np.float64(1 << 31)


def tile_xy(phash: np.ndarray, z: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact integer tile assignment at zoom z (no float rounding at all)."""
    p = np.asarray(phash).astype(np.uint64)
    lng_bits = p & np.uint64(0xFFFFFFFF)
    lat_bits = (p >> np.uint64(32)) & np.uint64(0x7FFFFFFF)
    x = (lng_bits >> np.uint64(32 - z)).astype(np.int64)
    y = (lat_bits >> np.uint64(31 - z)).astype(np.int64)
    return x, y


def image_size(i: int) -> tuple[int, int]:
    return 16 + (i * 7) % 49, 16 + (i * 11) % 49


def synth_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic RGB pixel field for row i — gradients + index-mixed
    modulation, uint8 shape (3, h, w) planar."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 255 // max(1, w - 1)).astype(np.int64)
    vert = (yy * 255 // max(1, h - 1)).astype(np.int64)
    m = np.int64((i * 40503) % 256)
    r = (base + m) % 256
    g = (vert + (m * 3) % 256) % 256
    b = (base + vert + (m * 7) % 256) % 256
    return np.stack([r, g, b]).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    """From-scratch codec. ``raw``: zlib-compressed planar uint8 (lossless).
    ``qlossy``: drop 2 LSB per channel before compression (max error 3/255 →
    PSNR ≥ 40 dB deterministically)."""
    c, h, w = pixels.shape
    header = np.array([w, h, c], dtype="<u2").tobytes()
    if fmt == "raw":
        return MAGIC_RAW + header + zlib.compress(pixels.tobytes(), 1)
    if fmt == "qlossy":
        q = (pixels >> 2).astype(np.uint8)
        return MAGIC_QLOSSY + header + zlib.compress(q.tobytes(), 1)
    raise ValueError(f"unknown fmt: {fmt}")


def decode_image(data: bytes) -> np.ndarray:
    magic, header, payload = data[:4], data[4:10], data[10:]
    w, h, c = np.frombuffer(header, dtype="<u2")
    arr = np.frombuffer(zlib.decompress(payload), dtype=np.uint8).reshape(int(c), int(h), int(w))
    if magic == MAGIC_RAW:
        return arr
    if magic == MAGIC_QLOSSY:
        # dequantize to bucket midpoint-ish reconstruction (x<<2 | 2 caps error at 2)
        return ((arr.astype(np.uint16) << 2) | 2).clip(0, 255).astype(np.uint8)
    raise ValueError("bad image magic")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10 * np.log10(255.0 * 255.0 / mse)


def caption_of_index(i: int) -> str:
    return f"caption for img-{i:012d}"


def synth_image_row(i: int, with_bytes: bool = True) -> dict:
    w, h = image_size(i)
    fmt = "raw" if i % 2 == 0 else "qlossy"
    row = {
        "image_id": f"img-{i:012d}",
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption_of_index(i),
        "phash": phash_of_index(i),
    }
    if with_bytes:
        row["bytes"] = encode_image(synth_pixels(i, w, h), fmt)
    return row


IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def synth_image_table(indices: np.ndarray, with_bytes: bool = True) -> pa.Table:
    rows = [synth_image_row(int(i), with_bytes) for i in indices]
    if not with_bytes:
        for r in rows:
            r["bytes"] = b""
    return pa.Table.from_pylist(rows, schema=IMAGE_SCHEMA)


def synth_video_row(i: int, n_frames: int = 8) -> dict:
    """Deterministic 'video': n_frames encoded frames (the frame pixels vary
    by frame index) concatenated behind a u32 frame-count + u32-length index
    header — enough container structure to exercise real demux plumbing."""
    w, h = image_size(i)
    blobs = [
        encode_image(synth_pixels(i + 1000003 * f, w, h), "raw" if f % 2 == 0 else "qlossy")
        for f in range(n_frames)
    ]
    header = np.array([n_frames] + [len(b) for b in blobs], dtype="<u4").tobytes()
    return {
        "video_id": f"vid-{i:012d}",
        "n_frames": n_frames,
        "w": w,
        "h": h,
        "bytes": header + b"".join(blobs),
    }


def demux_video(data: bytes) -> list[bytes]:
    """Split a synthesized video container back into encoded frame blobs."""
    n = int(np.frombuffer(data[:4], dtype="<u4")[0])
    lens = np.frombuffer(data[4 : 4 + 4 * n], dtype="<u4").astype(np.int64)
    offs = 4 + 4 * n + np.concatenate(([0], np.cumsum(lens)))
    return [data[int(offs[f]) : int(offs[f + 1])] for f in range(n)]


def synth_video_table(indices: np.ndarray, n_frames: int = 8) -> pa.Table:
    rows = [synth_video_row(int(i), n_frames) for i in indices]
    return pa.table(
        {
            "video_id": pa.array([r["video_id"] for r in rows], pa.string()),
            "n_frames": pa.array([r["n_frames"] for r in rows], pa.int32()),
            "w": pa.array([r["w"] for r in rows], pa.int32()),
            "h": pa.array([r["h"] for r in rows], pa.int32()),
            "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
        }
    )
