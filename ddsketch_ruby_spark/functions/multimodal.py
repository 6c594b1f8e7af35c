"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing — schemas, batch iteration, explode semantics,
partition behavior — is real and tested. The image codec is pluggable:
built-in, the default decoder handles the deterministic FIMG container
(header-tagged blobs produced by ``synth_*`` below) AND real baseline
PNG (functions/png.py — pure NumPy+zlib, no image library needed, luma
byte-identical to PIL's convert("L") for in-scope files);
``set_image_decoder`` swaps in a full decoder (e.g. PIL, auto-picked-up
when importable) without touching the distributed plumbing. Raw-PCM
audio features are computed for real (pure NumPy math on int16 samples).

Fake container formats (deterministic, self-describing):
  image: b"FIMG" + u32 width + u32 height + payload(width*height bytes)
  video: b"FVID" + u32 n_frames + u32 frame_w + u32 frame_h + frames
  audio: b"FPCM" + u32 sample_rate + int16-LE samples
"""

from __future__ import annotations

import struct
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "synth_image",
    "synth_video",
    "synth_audio",
    "set_image_decoder",
    "decode_images",
    "image_features",
    "resize_images",
    "sample_frames",
    "audio_features",
]


# -- synthetic media (deterministic in seed) ---------------------------------
def synth_image(width: int, height: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return b"FIMG" + struct.pack("<II", width, height) + payload.tobytes()


def synth_video(n_frames: int, w: int, h: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=n_frames * w * h, dtype=np.uint8)
    return b"FVID" + struct.pack("<III", n_frames, w, h) + frames.tobytes()


def synth_audio(n_samples: int, sample_rate: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    samples = (rng.standard_normal(n_samples) * 8000).astype("<i2")
    return b"FPCM" + struct.pack("<I", sample_rate) + samples.tobytes()


# -- pluggable image decoder ---------------------------------------------------
def _default_decode(blob: bytes) -> tuple[int, int, np.ndarray]:
    """Decode the FIMG container or a REAL PNG (functions/png.py — pure
    NumPy+zlib, 8-bit gray/RGB/RGBA, all five scanline filters, CRC
    checked, PIL-exact ITU-R 601-2 luma); raises on other formats (a full
    decoder such as PIL is plugged in via set_image_decoder where
    available, and auto-picked-up below when importable)."""
    if blob[:4] == b"FIMG":
        w, h = struct.unpack_from("<II", blob, 4)
        px = np.frombuffer(blob, dtype=np.uint8, count=w * h, offset=12)
        return w, h, px
    from .png import PNG_SIGNATURE, decode_png

    if blob[:8] == PNG_SIGNATURE:
        return decode_png(blob)
    raise NotImplementedError(
        "no image library in this environment; FIMG and baseline PNG are "
        "decodable built-in — plug a full decoder via set_image_decoder(fn)"
    )


_decoder: Callable[[bytes], tuple[int, int, np.ndarray]] = _default_decode

try:  # pragma: no cover - not present in this container
    from PIL import Image  # type: ignore
    import io

    def _pil_decode(blob: bytes) -> tuple[int, int, np.ndarray]:
        if blob[:4] == b"FIMG":
            return _default_decode(blob)
        img = Image.open(io.BytesIO(blob)).convert("L")
        return img.width, img.height, np.asarray(img, dtype=np.uint8).ravel()

    _decoder = _pil_decode
except ImportError:
    pass


def set_image_decoder(fn: Callable[[bytes], tuple[int, int, np.ndarray]]) -> None:
    global _decoder
    _decoder = fn


# -- operators -------------------------------------------------------------------
_IMAGE_SCHEMA_SUFFIX = [
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_intensity", T.DoubleType()),
    T.StructField("histogram", T.ArrayType(T.DoubleType(), False)),
]


def decode_images(
    df: DataFrame, binary_col: str, id_col: str, bins: int = 16
) -> DataFrame:
    """(id, width, height, mean_intensity, histogram[bins]) per image.
    Arrow-batched; undecodable blobs yield NULL feature columns instead of
    failing the task (poison-pill tolerance for web-crawl data)."""
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    schema = T.StructType([id_field] + _IMAGE_SCHEMA_SUFFIX)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {
                id_col: pdf[id_col].values,
                "width": [],
                "height": [],
                "mean_intensity": [],
                "histogram": [],
            }
            for blob in pdf[binary_col]:
                try:
                    w, h, px = _decoder(bytes(blob))
                    hist = np.bincount(
                        (px.astype(np.int64) * bins) // 256, minlength=bins
                    ).astype(np.float64)
                    hist /= max(1.0, hist.sum())
                    out["width"].append(w)
                    out["height"].append(h)
                    out["mean_intensity"].append(float(px.mean()))
                    out["histogram"].append(hist)
                except (NotImplementedError, ValueError, struct.error):
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mean_intensity"].append(None)
                    out["histogram"].append(None)
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col).mapInPandas(run, schema=schema)


# alias: feature extraction IS the decode in this stub environment
image_features = decode_images


def resize_images(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    target_w: int,
    target_h: int,
) -> DataFrame:
    """(id, width, height, pixels) per image, resampled to a fixed
    target size — the normalization step before batching images into a
    training pipeline. Decode goes through the pluggable decoder
    (set_image_decoder; FIMG container by default), the resample is real
    area-mean math (split each target cell into the source pixels it
    covers via integer bin edges — deterministic, no interpolation
    library), and the output carries the raw grayscale bytes in
    row-major order so downstream stages have a fixed-shape tensor.
    Undecodable blobs yield NULL pixels (poison-pill tolerance)."""
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    schema = T.StructType(
        [
            id_field,
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixels", T.BinaryType()),
        ]
    )

    def _resize(px: np.ndarray, w: int, h: int) -> np.ndarray:
        img = px.reshape(h, w).astype(np.float64)
        ye = np.linspace(0, h, target_h + 1).astype(np.int64)
        xe = np.linspace(0, w, target_w + 1).astype(np.int64)
        # area mean per target cell: two add.reduceat passes (rows, cols)
        rows = np.add.reduceat(img, ye[:-1], axis=0)
        cols = np.add.reduceat(rows, xe[:-1], axis=1)
        counts = np.outer(np.diff(ye), np.diff(xe))
        counts = np.maximum(counts, 1)
        return np.clip(cols / counts, 0, 255).astype(np.uint8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {
                id_col: pdf[id_col].values,
                "width": [],
                "height": [],
                "pixels": [],
            }
            for blob in pdf[binary_col]:
                try:
                    w, h, px = _decoder(bytes(blob))
                    out["width"].append(target_w)
                    out["height"].append(target_h)
                    out["pixels"].append(_resize(px, w, h).tobytes())
                except (NotImplementedError, ValueError, struct.error):
                    out["width"].append(None)
                    out["height"].append(None)
                    out["pixels"].append(None)
            yield pd.DataFrame(out)

    return df.select(id_col, binary_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame, binary_col: str, id_col: str, every_n: int = 2
) -> DataFrame:
    """Explode videos into every-n-th frame: one row per sampled frame
    (id, frame_idx, frame binary, width, height)."""
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    schema = T.StructType(
        [
            id_field,
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, blob in zip(pdf[id_col], pdf[binary_col]):
                blob = bytes(blob)
                if blob[:4] != b"FVID":
                    continue
                n, w, h = struct.unpack_from("<III", blob, 4)
                fsize = w * h
                for i in range(0, n, every_n):
                    start = 16 + i * fsize
                    frame = b"FIMG" + struct.pack("<II", w, h) + blob[
                        start : start + fsize
                    ]
                    rows.append(
                        {
                            id_col: vid,
                            "frame_idx": i,
                            "frame": frame,
                            "width": w,
                            "height": h,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows, columns=schema.names)

    return df.select(id_col, binary_col).mapInPandas(run, schema=schema)


def audio_features(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """Real (non-stubbed) raw-PCM features: duration, RMS, zero-crossing
    rate — pure NumPy over int16 samples."""
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    schema = T.StructType(
        [
            id_field,
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("duration_sec", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_crossing_rate", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, blob in zip(pdf[id_col], pdf[binary_col]):
                blob = bytes(blob)
                if blob[:4] != b"FPCM":
                    rows.append(
                        {id_col: aid, "sample_rate": None, "duration_sec": None,
                         "rms": None, "zero_crossing_rate": None}
                    )
                    continue
                (sr,) = struct.unpack_from("<I", blob, 4)
                samples = np.frombuffer(blob, dtype="<i2", offset=8).astype(
                    np.float64
                )
                zc = (
                    float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
                    if len(samples) > 1
                    else 0.0
                )
                rows.append(
                    {
                        id_col: aid,
                        "sample_rate": int(sr),
                        "duration_sec": len(samples) / sr,
                        "rms": float(np.sqrt(np.mean(samples**2))),
                        "zero_crossing_rate": zc,
                    }
                )
            if rows:
                yield pd.DataFrame(rows, columns=schema.names)

    return df.select(id_col, binary_col).mapInPandas(run, schema=schema)
