"""Inference preprocessing: image decode/resize/normalize + metadata packing.

Reference parity: inference/preprocessing.py:19-150. Accepts image bytes,
PIL images, or numpy arrays; metadata dicts with lat/lon, datetime, and
elevation are projected into the packed aux vector using the component order
the model was trained with (temporal, spatial, elevation by IDX).
"""

from __future__ import annotations

import io
from datetime import datetime
from typing import Any

import numpy as np

from .config import InferenceConfig
from .projections import (
    datetime_to_temporal_sinusoids,
    elevation_to_sinusoids,
    latlon_to_unit_sphere,
)


def _to_array(image: Any) -> np.ndarray:
    from PIL import Image

    if isinstance(image, bytes):
        image = Image.open(io.BytesIO(image)).convert("RGB")
    if hasattr(image, "convert"):  # PIL
        image = np.asarray(image.convert("RGB"))
    image = np.asarray(image)
    if image.ndim == 2:
        image = np.stack([image] * 3, axis=-1)
    return image


def preprocess_image_u8(image: Any, cfg: InferenceConfig) -> np.ndarray:
    """-> uint8 (H, W, C) RGB, resized but NOT normalized.

    The serving fast path ships uint8 to the device and fuses the
    /255-mean/std normalization into the jitted forward (same design as
    the training loader, data/datasets.py): 4x less host->device traffic,
    which dominates on remote/tunneled chips. Float array inputs are
    quantized to uint8 (values <=1.5 are treated as [0,1]-scaled) — the
    precision any JPEG-fed pipeline already lives with."""
    from PIL import Image

    c, h, w = cfg.input_preprocessing.image_size
    arr = _to_array(image)
    if np.issubdtype(arr.dtype, np.floating):
        if arr.size and float(arr.max()) <= 1.5:
            arr = arr * 255.0
        arr = np.clip(arr, 0.0, 255.0)
    elif np.issubdtype(arr.dtype, np.integer) and arr.dtype != np.uint8:
        # Integer inputs wider than uint8 (16-bit TIFF/PNG decodes): a bare
        # astype(np.uint8) would wrap each pixel modulo 256 into garbage.
        # Rescale by the dtype range only when the VALUES actually exceed
        # uint8 — int32/int64 arrays holding ordinary 0-255 pixels (e.g.
        # np.asarray of a nested Python list) must pass through unchanged,
        # not be crushed to black by a 255/iinfo.max factor. The decision
        # uses the 99.9th percentile, not max: one hot pixel (a stitching
        # artifact at 300 in an otherwise 0-255 image) must clip, not drag
        # the whole image to near-black via a dtype-range rescale.
        info = np.iinfo(arr.dtype)
        if (
            info.max > 255
            and arr.size
            and float(np.percentile(arr, 99.9)) > 255.0
        ):
            arr = arr.astype(np.float64) * (255.0 / info.max)
        arr = np.clip(arr, 0, 255)
    # any other dtype (incl. bool, which is not an np.integer subtype and
    # would crash np.iinfo) falls through to the plain astype below

    arr = arr.astype(np.uint8)
    if arr.shape[0] != h or arr.shape[1] != w:
        interp = {
            "bilinear": Image.BILINEAR,
            "bicubic": Image.BICUBIC,
            "nearest_exact": Image.NEAREST,
            "nearest": Image.NEAREST,
        }.get(cfg.input_preprocessing.image_interpolation, Image.BILINEAR)
        arr = np.asarray(Image.fromarray(arr).resize((w, h), interp))
    return arr


def preprocess_image(image: Any, cfg: InferenceConfig) -> np.ndarray:
    """-> float32 (H, W, C), normalized (NHWC: TPU-native layout)."""
    arr = preprocess_image_u8(image, cfg).astype(np.float32) / 255.0
    mean = np.asarray(cfg.input_preprocessing.image_mean, np.float32)
    std = np.asarray(cfg.input_preprocessing.image_std, np.float32)
    return (arr - mean) / std


def preprocess_image_batch(
    images: list[Any], cfg: InferenceConfig, as_uint8: bool = False
) -> np.ndarray:
    """Batch decode+resize(+normalize).

    ``as_uint8=True`` skips normalization and returns uint8 rows — the
    serving fast path (the handler normalizes on device; see
    ``preprocess_image_u8``).

    Fast path: when every input is JPEG bytes and the target is square, the
    whole batch decodes in the native C++ data-plane (DCT-prescaled decode +
    area resize in worker threads, one call — linnaeus_tpu/native/): Python
    imaging is the serving host's dominant cost, and PIL holds the GIL for
    most of it. Area resize is the anti-aliased downscale PIL's resize also
    applies; parity is pinned by test within JPEG-decoder tolerance. Inputs
    that fail the native decode fall back to the PIL path individually, so
    error behavior matches the non-native path exactly.
    """
    c, h, w = cfg.input_preprocessing.image_size
    interp = cfg.input_preprocessing.image_interpolation
    if (
        h == w
        and interp == "bilinear"
        and images
        and all(
            isinstance(im, bytes) and im[:2] == b"\xff\xd8" for im in images
        )
    ):
        from linnaeus_tpu.native import get_dataplane

        dp = get_dataplane()
        if dp is not None:
            arr, status = dp.decode_jpeg_mem_batch(list(images), h)
            if as_uint8:
                for i in np.nonzero(status != 0)[0]:
                    # per-sample PIL fallback: raises exactly what the
                    # Python path would raise for these bytes
                    arr[i] = preprocess_image_u8(images[i], cfg)
                return arr
            out = arr.astype(np.float32) / 255.0
            mean = np.asarray(cfg.input_preprocessing.image_mean, np.float32)
            std = np.asarray(cfg.input_preprocessing.image_std, np.float32)
            out = (out - mean) / std
            for i in np.nonzero(status != 0)[0]:
                out[i] = preprocess_image(images[i], cfg)
            return out
    if as_uint8:
        return np.stack([preprocess_image_u8(im, cfg) for im in images])
    return np.stack([preprocess_image(im, cfg) for im in images])


def preprocess_metadata(
    meta: dict[str, Any] | None, cfg: InferenceConfig
) -> np.ndarray:
    """Project one sample's metadata dict into the packed aux vector.

    Recognized keys: ``lat``/``lon`` (or ``latitude``/``longitude``),
    ``datetime`` (datetime or ISO string), ``elevation_m`` (or ``elevation``).
    Missing components encode as zeros (the model's "masked" signal).
    """
    mc = cfg.metadata_preprocessing
    chunks: list[np.ndarray] = []
    meta = meta or {}

    if mc.use_temporal:
        dt = meta.get("datetime")
        if isinstance(dt, str):
            dt = datetime.fromisoformat(dt)
        dim = 4 if mc.temporal_use_hour else 2
        if dt is not None:
            chunks.append(
                datetime_to_temporal_sinusoids(
                    dt, use_jd=mc.temporal_use_julian_day,
                    use_hour=mc.temporal_use_hour,
                )
            )
        else:
            chunks.append(np.zeros(dim, np.float32))

    if mc.use_geolocation:
        lat = meta.get("lat", meta.get("latitude"))
        lon = meta.get("lon", meta.get("longitude"))
        if lat is not None and lon is not None:
            chunks.append(latlon_to_unit_sphere(float(lat), float(lon)))
        else:
            chunks.append(np.zeros(3, np.float32))

    if mc.use_elevation:
        elev = meta.get("elevation_m", meta.get("elevation"))
        dim = 2 * len(mc.elevation_scales)
        if elev is not None:
            chunks.append(elevation_to_sinusoids(float(elev), mc.elevation_scales))
        else:
            chunks.append(np.zeros(dim, np.float32))

    if not chunks:
        return np.zeros(0, np.float32)
    vec = np.concatenate(chunks)
    expected = cfg.model.expected_aux_vector_length
    if expected is not None and len(vec) != expected:
        fixed = np.zeros(expected, np.float32)
        fixed[: min(expected, len(vec))] = vec[:expected]
        vec = fixed
    return vec


def preprocess_metadata_batch(
    metas: list[dict[str, Any] | None] | None, batch_size: int, cfg: InferenceConfig
) -> np.ndarray:
    if metas is None:
        metas = [None] * batch_size
    return np.stack([preprocess_metadata(m, cfg) for m in metas])
