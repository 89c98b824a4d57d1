"""Multimodal binary-column plumbing: image / video / generic media payloads.

The engine's real modality is audio (`audio/codecs.py` + `audio_checks.py`:
numpy decode, SNR invariant — fully implemented). This module generalizes the
same Spark-side shape to the other modalities a training-data pipeline
carries: an opaque `binary` column plus typed metadata, processed in Arrow
`mapInPandas` batches.

What is REAL here (and tested): the schemas, the batch plumbing (Arrow
batches in/out, batch-size-independent results), the column pruning contract
(the payload column is scanned only by the UDF stage), and a deterministic
fake decoder so the pipeline is exercisable end-to-end in this sandbox.

What is STUBBED (clearly, by design): actual image/video codec work — the
sandbox has no Pillow/ffmpeg/opencv. `decoder='real'` raises
NotImplementedError naming the missing dependency; `decoder='fake'` decodes
the engine's own deterministic synthetic format. Swapping in a real decoder
is a one-function change with the identical Spark plan.

Synthetic media format (fake codec, pure numpy):
  header  b'RTADIMG1' | uint16 height | uint16 width | uint8 channels
  payload height*width*channels bytes, row-major uint8
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MAGIC = b"RTADIMG1"

# media fact table: opaque payload + typed metadata (mirrors CLIPS)
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|video|audio
        T.StructField("height", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),  # 1 for stills
        T.StructField("part_id", T.IntegerType(), False),
    ]
)

_FEATURE_SCHEMA = (
    "part_id int, media_id string, ok boolean, height int, width int, "
    "mean_intensity double, std_intensity double, error string"
)

_THUMB_SCHEMA = "part_id int, media_id string, thumb binary, thumb_h int, thumb_w int"


def encode_fake_image(arr: np.ndarray) -> bytes:
    """Deterministic synthetic image encoder (uint8 HxWxC)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    return _MAGIC + struct.pack("<HHB", h, w, c) + arr.astype(np.uint8).tobytes()


def decode_fake_image(payload: bytes) -> np.ndarray:
    if payload[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not an RTADIMG1 payload")
    h, w, c = struct.unpack("<HHB", payload[len(_MAGIC) : len(_MAGIC) + 5])
    body = np.frombuffer(payload, dtype=np.uint8, offset=len(_MAGIC) + 5)
    if body.size < h * w * c:
        raise ValueError(f"payload truncated: {body.size} < {h}*{w}*{c}")
    # trailing bytes allowed: a video payload is concatenated frames and this
    # decodes the first one (frame_sample slices per-frame chunks itself)
    return body[: h * w * c].reshape(h, w, c)


def _get_decoder(decoder: str):
    if decoder == "fake":
        return decode_fake_image
    if decoder == "real":
        raise NotImplementedError(
            "real image decode requires Pillow/opencv, not installed in this "
            "environment — the Spark plumbing (schema, batching, plan shape) "
            "is identical; plug the library decoder in here"
        )
    raise ValueError(f"unknown decoder {decoder!r}")


def image_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode + per-image feature extraction over Arrow batches: dimensions,
    mean/std intensity. Scan -> mapInPandas, payload never joined/shuffled
    (same invariant as the audio path); per-image failures record `error`
    instead of failing the task."""
    dec = _get_decoder(decoder)
    projected = media.select("part_id", "media_id", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "part_id": pdf["part_id"],
                "media_id": pdf["media_id"],
                "ok": np.zeros(n, dtype=bool),
                "height": np.zeros(n, dtype=np.int32),
                "width": np.zeros(n, dtype=np.int32),
                "mean_intensity": np.full(n, np.nan),
                "std_intensity": np.full(n, np.nan),
                "error": np.full(n, None, dtype=object),
            }
            payloads = pdf["payload"].to_numpy()
            for k in range(n):
                try:
                    img = dec(payloads[k])
                    out["ok"][k] = True
                    out["height"][k], out["width"][k] = img.shape[0], img.shape[1]
                    out["mean_intensity"][k] = float(img.mean())
                    out["std_intensity"][k] = float(img.std())
                except Exception as exc:  # noqa: BLE001
                    out["error"][k] = f"{type(exc).__name__}: {exc}"[:200]
            yield pd.DataFrame(out)

    return projected.mapInPandas(run, schema=_FEATURE_SCHEMA)


def thumbnails(media: DataFrame, size: int = 8, decoder: str = "fake") -> DataFrame:
    """Decode -> box-filter resize to (size, size) -> re-encode. The resize is
    pure numpy (strided block mean); undecodable rows are dropped (they are
    `image_features`' error rows)."""
    dec = _get_decoder(decoder)
    projected = media.select("part_id", "media_id", "payload")

    def _resize(img: np.ndarray, s: int) -> np.ndarray:
        h, w, c = img.shape
        ys = (np.arange(s + 1) * h // s).astype(int)
        xs = (np.arange(s + 1) * w // s).astype(int)
        out = np.empty((s, s, c), dtype=np.uint8)
        for i in range(s):
            for j in range(s):
                block = img[ys[i]: max(ys[i + 1], ys[i] + 1),
                            xs[j]: max(xs[j + 1], xs[j] + 1)]
                out[i, j] = block.mean(axis=(0, 1)).astype(np.uint8)
        return out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            payloads = pdf["payload"].to_numpy()
            for k in range(len(pdf)):
                try:
                    img = dec(payloads[k])
                except Exception:  # noqa: BLE001 — error rows surface elsewhere
                    continue
                th = _resize(img, size)
                rows.append(
                    {
                        "part_id": pdf["part_id"].iloc[k],
                        "media_id": pdf["media_id"].iloc[k],
                        "thumb": encode_fake_image(th),
                        "thumb_h": size,
                        "thumb_w": size,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["part_id", "media_id", "thumb", "thumb_h", "thumb_w"]
            )

    return projected.mapInPandas(run, schema=_THUMB_SCHEMA)


def frame_sample(media: DataFrame, every: int = 2, decoder: str = "fake") -> DataFrame:
    """Video frame sampling plumbing: a 'video' payload is n_frames stacked
    RTADIMG1 images; emit every `every`-th frame as its own row (one->many
    inside the Arrow batch — the UDTF shape). Still-image rows pass through
    as frame 0."""
    dec = _get_decoder(decoder)
    projected = media.select("part_id", "media_id", "payload", "n_frames")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for k in range(len(pdf)):
                payload = pdf["payload"].iloc[k]
                n_frames = int(pdf["n_frames"].iloc[k] or 1)
                frame_len = len(payload) // n_frames
                for f in range(0, n_frames, every):
                    chunk = payload[f * frame_len : (f + 1) * frame_len]
                    try:
                        img = dec(chunk)
                    except Exception:  # noqa: BLE001
                        continue
                    rows.append(
                        {
                            "part_id": pdf["part_id"].iloc[k],
                            "media_id": pdf["media_id"].iloc[k],
                            "frame_no": f,
                            "mean_intensity": float(img.mean()),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["part_id", "media_id", "frame_no", "mean_intensity"]
            )

    return projected.mapInPandas(
        run, schema="part_id int, media_id string, frame_no int, mean_intensity double"
    )


def synth_media_pdf(n: int, seed: int = 42, parts: int = 4) -> pd.DataFrame:
    """Deterministic media fixture: small synthetic images/videos."""
    rows = []
    for i in range(n):
        rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))
        is_video = i % 5 == 0
        n_frames = int(rng.integers(2, 5)) if is_video else 1
        h, w = int(rng.integers(8, 24)), int(rng.integers(8, 24))
        frames = [
            encode_fake_image(rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8))
            for _ in range(n_frames)
        ]
        rows.append(
            {
                "media_id": f"m_{i:08d}",
                "payload": b"".join(frames),
                "media_type": "video" if is_video else "image",
                "height": h,
                "width": w,
                "n_frames": n_frames,
                "part_id": i % parts,
            }
        )
    return pd.DataFrame(rows)
