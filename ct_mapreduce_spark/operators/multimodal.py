"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata (north-star surface).

The Spark-side mechanics are real and tested: schemas, Arrow-batched
mapInPandas with controlled batch sizes, partition sizing by byte weight.
The codec step itself is STUBBED — image/audio libraries are not in this
container — behind `_decode_stub`, which produces a deterministic fake
(so tests can assert plumbing end-to-end). Swap `_decode_stub` for a real
Pillow/torchaudio call in production; nothing else changes.

Design notes for 100 TB:
- binary payloads are never shuffled by value: transforms are mapInPandas
  (narrow); any grouping happens on metadata columns only.
- `repartition_by_bytes` sizes partitions by payload weight, not row
  count — a 4 MiB video row and a 4 KiB thumbnail row are not equal work.
- Arrow batch size is capped via maxRecordsPerBatch at the session level;
  the iterator form below additionally lets one input batch yield many
  output batches (frame sampling explodes row counts).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, feat_dim int, features array<float>, "
    "decode_ok boolean"
)

FRAME_SCHEMA = (
    "media_id long, frame_idx int, frame_payload binary, frame_bytes long"
)


def _decode_stub(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake 'decode + featurize'. Real impl would be
    Pillow/librosa/ffmpeg — not available in this container.
    Raises on empty payload like a real codec would."""
    if not payload:
        raise ValueError("empty payload")
    d = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in d[:16]]


def resolve_decoder():
    """Codec seam: returns the best available `(payload, kind) ->
    list[float]` decoder. Tries the real image stack (Pillow) first and
    falls back to the declared stub — so the same pipeline upgrades
    in-place when the production image libs are installed. Any injected
    decoder must be picklable (it ships to Python workers)."""
    try:  # pragma: no cover - container has no Pillow
        import io

        from PIL import Image  # noqa: F401

        def pillow_decoder(payload: bytes, kind: str) -> list[float]:
            if kind != "image":
                return _decode_stub(payload, kind)
            img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
            return [p / 255.0 for p in img.getdata()]

        return pillow_decoder
    except ImportError:
        return _decode_stub


def synthetic_media(spark, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic media fixture: binary payloads of varying size."""
    import numpy as np

    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(64, 4096)) * (8 if kind == "video" else 1)
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        if i % 37 == 0:
            payload = b""  # decode-failure row
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "payload": payload,
                "n_bytes": len(payload),
                "meta": {"source": f"s{i % 5}"},
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)


def repartition_by_bytes(df: DataFrame, target_bytes: int = 128 << 20) -> DataFrame:
    """Repartition so each partition carries ~target_bytes of payload.
    Uses the metadata n_bytes column — no payload scan needed."""
    total = df.agg(F.sum("n_bytes")).first()[0] or 0
    n = max(1, int(total // target_bytes) + 1)
    return df.repartition(n)


def extract_features(df: DataFrame, decoder=None) -> DataFrame:
    """Decode + featurize via Arrow-batched mapInPandas. Failed decodes
    yield decode_ok=false rows (never poison the batch). `decoder` is the
    codec seam (resolve_decoder() when None): tests inject fakes through
    it and production injects Pillow/librosa — the Spark plumbing is
    identical either way."""
    decoder = decoder or resolve_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                try:
                    feats = decoder(row["payload"], row["kind"])
                    ok = True
                except Exception:
                    feats, ok = None, False
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "feat_dim": len(feats) if feats else 0,
                        "features": feats,
                        "decode_ok": ok,
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """Frame sampling for video rows: 1 row in, up to max_frames out.
    Output batches are yielded per input batch — the iterator contract
    keeps peak memory at one batch regardless of fan-out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                n = min(max_frames, max(0, len(payload) // every_n_bytes))
                for i in range(n):
                    chunk = payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": i,
                            "frame_payload": chunk,
                            "frame_bytes": len(chunk),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_idx", "frame_payload", "frame_bytes"],
            )

    return df.where(F.col("kind") == "video").mapInPandas(run, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, resized_payload binary, orig_bytes long, "
    "resized_bytes long, resize_ok boolean"
)


def _resize_stub(payload: bytes, target_bytes: int) -> bytes:
    """Deterministic fake 'decode -> resize -> re-encode'. A real impl
    would be Pillow's Image.resize; the container has no image libs. The
    stub preserves the real op's contract: output size bounded by target,
    deterministic for identical inputs, raises on undecodable input."""
    if not payload:
        raise ValueError("empty payload")
    if len(payload) <= target_bytes:
        return payload
    # keep an evenly-strided sample of the bytes — shape-preserving, like
    # a nearest-neighbor downsample
    stride = len(payload) / target_bytes
    return bytes(payload[int(i * stride)] for i in range(target_bytes))


def resize_images(
    df: DataFrame, target_bytes: int = 512, resizer=None
) -> DataFrame:
    """Image resize over the binary column via mapInPandas (narrow; no
    payload shuffle). Failure rows flagged, not dropped. `resizer` is the
    codec seam: `(payload, target_bytes) -> bytes`, default the declared
    stub (swap in Pillow's decode->resize->encode in production)."""
    resizer = resizer or _resize_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                try:
                    rp = resizer(row["payload"], target_bytes)
                    ok = True
                except Exception:
                    rp, ok = None, False
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "resized_payload": rp,
                        "orig_bytes": row["n_bytes"],
                        "resized_bytes": len(rp) if rp is not None else 0,
                        "resize_ok": ok,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "kind",
                    "resized_payload",
                    "orig_bytes",
                    "resized_bytes",
                    "resize_ok",
                ],
            )

    return df.where(F.col("kind") == "image").mapInPandas(run, schema=RESIZED_SCHEMA)
