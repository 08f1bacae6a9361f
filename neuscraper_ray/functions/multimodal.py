"""Multimodal column plumbing: image/audio/video as opaque binary.

The Ray-side plumbing is real and tested — schemas, actor-pool stage
shapes, small batch sizes for wide binary rows, typed metadata columns.
The codec layer decodes REAL PNG bytes with a pure-stdlib decoder
(``decode_png``: zlib IDAT inflate + per-scanline unfilter — no image
libraries exist in this container) plus the deterministic FIMG fake for
fixtures; other formats (JPEG/audio/video) raise and are counted in
``decode_ok`` — swapping one in means extending ONE method body
(`_decode_impl`); every Dataset-facing contract stays identical.

Schema convention:
    media(doc_id: int64, kind: string, payload: large_binary,
          meta: struct<width:int32, height:int32, channels:int32>)
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

import ray.data

MAGIC = b"FIMG"  # deterministic fake image format: magic,w,h,c + pixels

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> channels


def decode_png(data: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode -> uint8 raster (h, w, channels).

    Supports the common web subset: bit depth 8, color types
    greyscale / RGB / grey+alpha / RGBA, non-interlaced. Palette,
    16-bit and Adam7 raise ``ValueError`` (counted as decode failures
    by the actor stage, never crashing the pipeline). Chunk walk +
    ``zlib.decompress`` of the concatenated IDAT stream, then the five
    standard scanline filters inverted row by row — Sub is a cumsum
    over the (pixels, bpp) view, Up is one vector add, Average/Paeth
    run a per-pixel loop vectorized across channels."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG signature")
    pos, width = 8, None
    idat = []
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[
            pos + 4 : pos + 8
        ]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace:
                raise ValueError("Adam7 interlacing unsupported")
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if width is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    ch = _PNG_CHANNELS[color]
    stride = width * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    raw = raw.reshape(height, stride + 1)
    filters = raw[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        line = raw[y, 1:].copy()
        if f == 0:
            rec = line
        elif f == 1:  # Sub: cumsum per channel column
            rec = np.cumsum(
                line.reshape(width, ch).astype(np.uint32), axis=0
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            rec = line + prev
        elif f == 3:  # Average
            rec = line
            pv = prev.reshape(width, ch).astype(np.uint16)
            rc = rec.reshape(width, ch)
            left = np.zeros(ch, dtype=np.uint16)
            for x in range(width):
                rc[x] = (rc[x] + ((left + pv[x]) >> 1)).astype(np.uint8)
                left = rc[x].astype(np.uint16)
        elif f == 4:  # Paeth
            rec = line
            pv = prev.reshape(width, ch).astype(np.int32)
            rc = rec.reshape(width, ch)
            left = np.zeros(ch, dtype=np.int32)
            ul = np.zeros(ch, dtype=np.int32)
            for x in range(width):
                p = left + pv[x] - ul
                pa_, pb, pc_ = np.abs(p - left), np.abs(p - pv[x]), np.abs(p - ul)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, pv[x], ul)
                )
                rc[x] = (rc[x].astype(np.int32) + pred).astype(np.uint8)
                left = rc[x].astype(np.int32)
                ul = pv[x]
        else:
            raise ValueError(f"unknown filter type {f}")
        out[y] = rec
        prev = out[y]
    return out.reshape(height, width, ch)


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
        """PNG decodes for real via the stdlib decoder; FIMG is the
        deterministic fixture format; anything else (JPEG/WebP/...)
        raises and is surfaced as ``decode_ok=False``."""
        if payload[:8] == PNG_SIG:
            return decode_png(payload)
        if payload[:4] == MAGIC:
            w, h, c = struct.unpack("<III", payload[4:16])
            n = w * h * c
            return np.frombuffer(payload[16 : 16 + n], dtype=np.uint8).reshape(
                h, w, c
            )
        raise NotImplementedError(
            "codec unavailable: only PNG (stdlib decoder) and the FIMG "
            "fixture format decode in this environment"
        )

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
            except (NotImplementedError, ValueError, struct.error, zlib.error):
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


def encode_png(raster: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal stdlib PNG encoder (bit depth 8, one filter type for
    every scanline — pass 1-4 to exercise each decoder filter path).
    Inverse of ``decode_png``; round-trips are pinned in tests."""
    h, w, c = raster.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = raster.reshape(h, w * c).astype(np.int32)
    lines = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(c, dtype=np.int32), cur[:-c]])
        ul = np.concatenate([np.zeros(c, dtype=np.int32), prev[:-c]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            p = left + prev - ul
            pa_, pb, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, prev, ul)
            )
            filt = cur - pred
        else:
            raise ValueError(f"unknown filter type {filter_type}")
        lines.append(bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur
    idat = zlib.compress(b"".join(lines))
    return (
        PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def frame_sample_ranges(n_frames: int, every: int) -> list[int]:
    """Deterministic frame-sampling plan for video payloads (stub-side
    helper; the decode itself is gated like images)."""
    return list(range(0, n_frames, every))


def gen_media_table(n: int, seed: int = 7) -> pa.Table:
    """Deterministic media fixture: every 3rd payload is a REAL PNG
    (stdlib-encoded, filter type cycling 0-4 so the decoder's every
    filter path runs in production queries too), the rest FIMG."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        w = int(rng.randint(8, 64))
        h = int(rng.randint(8, 64))
        if i % 3 == 0:
            raster = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload = encode_png(raster, filter_type=i % 5)
        else:
            payload = fake_image(w, h, 3, seed=i)
        rows.append((i, "image", payload, w, h, 3))
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
