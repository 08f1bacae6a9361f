"""Multimodal column plumbing: image/audio/video as opaque binary.

The Ray-side plumbing is real and tested — schemas, actor-pool stage
shapes, small batch sizes for wide binary rows, typed metadata columns —
while the codec work itself is stubbed: no image/audio libraries exist
in this container, so ``decode`` is a deterministic fake that parses a
tiny self-describing header (see ``fake_image``). Swapping in a real
codec means replacing ONE method body (`_decode_impl`) — every
Dataset-facing contract stays identical.

Schema convention:
    media(doc_id: int64, kind: string, payload: large_binary,
          meta: struct<width:int32, height:int32, channels:int32>)
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data

MAGIC = b"FIMG"  # deterministic fake image format: magic,w,h,c + pixels


def fake_image(width: int, height: int, channels: int = 3, seed: int = 0) -> bytes:
    """Deterministic fake 'encoded image': header + seeded pixel bytes."""
    rng = np.random.RandomState((seed * 2654435761) & 0x7FFFFFFF)
    pixels = rng.randint(0, 256, size=width * height * channels, dtype=np.uint8)
    return MAGIC + struct.pack("<III", width, height, channels) + pixels.tobytes()


class ImageDecoder:
    """Actor-pool stage: payload -> decoded features.

    Real-codec notes encoded in the shape: decode state (codec context,
    model weights) lives in ``__init__`` once per actor; batches must be
    SMALL (wide binary rows — a 4K image is ~30MB decoded) so
    ``batch_size`` is specified in images, not bytes; output is a
    fixed-size feature vector, never the decoded raster (keep rasters
    out of the object store unless the next stage needs them).
    """

    def __init__(self, feature_dim: int = 16):
        self.feature_dim = feature_dim

    def _decode_impl(self, payload: bytes) -> np.ndarray:
        """STUB: deterministic fake decode. A real build would call
        PIL/cv2/libvips here and raise on codec errors."""
        if payload[:4] != MAGIC:
            raise NotImplementedError(
                "real image codecs unavailable in this environment; "
                "only the FIMG fake format decodes"
            )
        w, h, c = struct.unpack("<III", payload[4:16])
        n = w * h * c
        return np.frombuffer(payload[16 : 16 + n], dtype=np.uint8).reshape(h, w, c)

    def _features(self, raster: np.ndarray) -> np.ndarray:
        """Cheap deterministic per-image features (histogram buckets)."""
        hist, _ = np.histogram(raster, bins=self.feature_dim, range=(0, 256))
        return (hist / max(raster.size, 1)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok = [], []
        for payload in batch.column("payload").to_pylist():
            try:
                feats.append(self._features(self._decode_impl(payload)))
                ok.append(True)
            except (NotImplementedError, ValueError, struct.error):
                feats.append(np.zeros(self.feature_dim, dtype=np.float32))
                ok.append(False)
        flat = np.concatenate(feats) if feats else np.zeros(0, dtype=np.float32)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, pa.float32()), self.feature_dim
                ),
                "decode_ok": pa.array(ok, pa.bool_()),
            }
        )


def decode_images(ds: ray.data.Dataset, concurrency=4, batch_size: int = 16) -> ray.data.Dataset:
    """media Dataset -> per-image feature Dataset (actor pool)."""
    return ds.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,  # wide binary rows: keep batches small
        concurrency=concurrency,
    )


def frame_sample_ranges(n_frames: int, every: int) -> list[int]:
    """Deterministic frame-sampling plan for video payloads (stub-side
    helper; the decode itself is gated like images)."""
    return list(range(0, n_frames, every))


def gen_media_table(n: int, seed: int = 7) -> pa.Table:
    """Deterministic media fixture (FIMG payloads + metadata)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        w = int(rng.randint(8, 64))
        h = int(rng.randint(8, 64))
        rows.append((i, "image", fake_image(w, h, 3, seed=i), w, h, 3))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "payload": pa.array([r[2] for r in rows], pa.large_binary()),
            "meta": pa.StructArray.from_arrays(
                [
                    pa.array([r[3] for r in rows], pa.int32()),
                    pa.array([r[4] for r in rows], pa.int32()),
                    pa.array([r[5] for r in rows], pa.int32()),
                ],
                names=["width", "height", "channels"],
            ),
        }
    )
