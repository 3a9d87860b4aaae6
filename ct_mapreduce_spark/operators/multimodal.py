"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata (north-star surface).

The Spark-side mechanics are real and tested: schemas, Arrow-batched
mapInPandas with controlled batch sizes, partition sizing by byte weight.
All three default codecs are REAL, dependency-free parsers over the
uncompressed container formats: 24-bit BMP (`decode_bmp` -> grayscale ->
4x4 downsample -> 16 features), RIFF/WAVE PCM-16 (`wav_decoder`: header
parse + 16-bucket RMS envelope), and RIFF/AVI with uncompressed DIB
frames (`avi_decoder`: frame index walk + per-frame luma). The synthetic
fixtures carry genuine payloads in each format, so extract_features
exercises actual byte-level decoding, failure tolerance on garbage, and
a golden oracle. What the defaults do NOT cover is COMPRESSED real-world
formats (JPEG/PNG, MP3/FLAC, H.264): the `resolve_decoder()` seam
upgrades to Pillow (images; auto-detected when installed) or an injected
librosa/ffmpeg-backed callable with no other change — the seam's routing
and contract are pinned by tests that inject a PIL-compatible fake, plus
a real-Pillow test that runs wherever Pillow is installed.

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
    """Deterministic fake 'decode + featurize' for the kinds whose real
    codecs (ffmpeg for video) are not in this container. Raises on empty
    payload like a real codec would."""
    if not payload:
        raise ValueError("empty payload")
    d = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in d[:16]]


# ---------------------------------------------------------------------------
# Audio: dependency-free RIFF/WAVE PCM-16 codec
# ---------------------------------------------------------------------------

# Bound per-row analysis work regardless of declared duration: a 10-hour
# WAV costs the same as a 2-second one (the BMP decoder's O(1) posture).
_WAV_ANALYSIS_FRAMES = 65536


def encode_wav(sample_rate: int, channels: int, pcm16: bytes) -> bytes:
    """Serialize interleaved little-endian PCM-16 frames as a canonical
    RIFF/WAVE file (fmt + data chunks). Pure stdlib; used to build genuine
    audio fixtures."""
    import struct

    if len(pcm16) % (2 * channels):
        raise ValueError("pcm16 length not a multiple of the frame size")
    block_align = 2 * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(pcm16), b"WAVE")
        + struct.pack("<4sI", b"fmt ", 16) + fmt
        + struct.pack("<4sI", b"data", len(pcm16)) + pcm16
    )


def _parse_wav_header(payload: bytes) -> tuple[int, int, int, int]:
    """Validate a PCM-16 RIFF/WAVE payload and return (sample_rate,
    channels, data_off, n_frames). Strict like _parse_bmp_header: magic,
    chunk walk (word-aligned per the RIFF rule), fmt sanity, data bounds;
    ValueError on anything else so extract_features isolates the row."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    sr = channels = block_align = None
    data_off = data_len = None
    off = 12
    while off + 8 <= len(payload):
        cid, csize = struct.unpack_from("<4sI", payload, off)
        off += 8
        if off + csize > len(payload):
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("short fmt chunk")
            fmt_code, channels, sr, _br, block_align, bits = struct.unpack_from(
                "<HHIIHH", payload, off
            )
            if fmt_code != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (PCM-16 only)")
            if not (1 <= channels <= 8) or sr <= 0:
                raise ValueError("bad fmt parameters")
            if block_align != 2 * channels:
                raise ValueError("inconsistent block align")
        elif cid == b"data":
            data_off, data_len = off, csize
        off += csize + (csize & 1)  # chunks are word-aligned
    if sr is None:
        raise ValueError("missing fmt chunk")
    if data_off is None:
        raise ValueError("missing data chunk")
    if data_len % block_align:
        raise ValueError("data size not a multiple of the frame size")
    n_frames = data_len // block_align
    if n_frames == 0:
        raise ValueError("no audio frames")
    return sr, channels, data_off, n_frames


def decode_wav(payload: bytes):
    """Parse a PCM-16 RIFF/WAVE payload -> (sample_rate, channels,
    int16 ndarray of shape (n_frames, channels))."""
    import numpy as np

    sr, channels, data_off, n_frames = _parse_wav_header(payload)
    arr = np.frombuffer(
        payload, dtype="<i2", count=n_frames * channels, offset=data_off
    ).reshape(n_frames, channels)
    return sr, channels, arr


def wav_features(samples, sample_rate: int) -> list[float]:
    """16 audio features from an (n_frames, channels) int16 array:
    [capped duration, rms, zero-crossing rate, mean |amplitude|] + 12
    spectral band-energy fractions (rfft power over the first
    _WAV_ANALYSIS_FRAMES mono frames, DC excluded, equal bands). Time-
    domain stats use exact int64 sums so they are engine-independent; the
    band energies share numpy's FFT/pairwise-sum order between the engine
    and the independent oracle (the same documented caveat as the LSH
    sign-bit matmul)."""
    import numpy as np

    n_total, channels = samples.shape
    mono = samples.astype(np.int64).sum(axis=1) // channels
    x = mono[:_WAV_ANALYSIS_FRAMES]
    m = len(x)
    feats = [
        min(1.0, (n_total / sample_rate) / 10.0),
        float(np.sqrt(int(np.sum(x * x)) / m) / 32768.0),
        float(np.count_nonzero((x[1:] >= 0) != (x[:-1] >= 0)) / (m - 1))
        if m > 1
        else 0.0,
        float(int(np.sum(np.abs(x))) / m / 32768.0),
    ]
    power = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
    tail = power[1:]
    total = float(tail.sum())
    if total > 0.0 and len(tail) >= 1:
        feats.extend(float(band.sum() / total) for band in np.array_split(tail, 12))
    else:
        feats.extend([0.0] * 12)
    return feats


def wav_decoder(payload: bytes) -> list[float]:
    sr, _channels, samples = decode_wav(payload)
    return wav_features(samples, sr)


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Serialize top-down row-major RGB triples as a standard bottom-up
    24-bit BI_RGB .bmp (BITMAPFILEHEADER + BITMAPINFOHEADER, rows padded
    to 4 bytes). Pure Python; used to build genuine image fixtures."""
    import struct

    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != width*height*3")
    pad = (-3 * width) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up storage order
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        # RGB -> BGR per pixel
        bgr = bytearray()
        for x in range(width):
            r, g, b = row[3 * x : 3 * x + 3]
            bgr += bytes((b, g, r))
        rows.append(bytes(bgr) + b"\x00" * pad)
    pixels = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    return header + info + pixels


def _parse_bmp_header(payload: bytes) -> tuple[int, int, int, int, bool]:
    """Validate an uncompressed 24-bit BMP header and return
    (pixel_off, width, height, stride, top_down). Strict: magic, header
    size, planes, bpp, compression, pixel-offset bounds (BOTH ends — a
    pixel_off pointing back into the headers is rejected, not silently
    decoded as pixels), and pixel-array bounds; ValueError on anything
    else (which extract_features isolates per row — the same
    garbage-tolerance contract as the x509 parse path)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("unsupported BMP variant")
    if pixel_off < 14 + hdr_size:
        raise ValueError("pixel array overlaps headers")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0 or width * height > 1 << 24:
        raise ValueError("bad dimensions")
    stride = 3 * width + ((-3 * width) % 4)
    if pixel_off + stride * height > len(payload):
        raise ValueError("truncated pixel array")
    return pixel_off, width, height, stride, top_down


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Parse an uncompressed 24-bit BMP -> (width, height, top-down
    row-major RGB bytes). Validation lives in _parse_bmp_header; the
    pixel conversion is numpy-vectorized so even a max-dimension payload
    (2^24 px) converts in milliseconds, not minutes."""
    import numpy as np

    pixel_off, width, height, stride, top_down = _parse_bmp_header(payload)
    arr = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=pixel_off
    ).reshape(height, stride)[:, : 3 * width].reshape(height, width, 3)
    if not top_down:
        arr = arr[::-1]
    return width, height, arr[:, :, ::-1].tobytes()  # BGR -> RGB


def bmp_decoder(payload: bytes, kind: str) -> list[float]:
    """Dependency-free default featurizer: images through the real BMP
    decode -> ITU-R 601-2 integer grayscale -> 4x4 center-sample
    downsample -> 16 floats in [0,1], computed in pure integer arithmetic
    until the final /255 so it is bit-stable. Samples the 16 pixels
    DIRECTLY from the payload (no full-image materialization): work per
    row is O(1) regardless of the declared dimensions, so an adversarial
    max-dimension header costs nothing. Audio routes through the real
    RIFF/WAVE PCM-16 codec (wav_decoder) and video through the real
    RIFF/AVI DIB codec (avi_decoder) — no stub remains in any of the
    three kinds' default paths."""
    if kind == "audio":
        return wav_decoder(payload)
    if kind == "video":
        return avi_decoder(payload)
    if kind != "image":
        return _decode_stub(payload, kind)
    pixel_off, width, height, stride, top_down = _parse_bmp_header(payload)
    feats = []
    for i in range(4):
        y = min(height - 1, (i * height + height // 2) // 4)
        src_y = y if top_down else height - 1 - y
        for j in range(4):
            x = min(width - 1, (j * width + width // 2) // 4)
            at = pixel_off + src_y * stride + 3 * x
            b, g, r = payload[at : at + 3]
            feats.append((299 * r + 587 * g + 114 * b) // 1000 / 255.0)
    return feats


# ---------------------------------------------------------------------------
# Video: dependency-free RIFF/AVI codec (uncompressed 24-bit DIB frames)
# ---------------------------------------------------------------------------


def encode_avi(
    width: int, height: int, frames_rgb: list[bytes], fps: int = 10
) -> bytes:
    """Serialize top-down row-major RGB frames as a minimal valid RIFF/AVI
    ('vids'/'DIB ' stream, uncompressed bottom-up 24-bit DIB '00db'
    chunks — the same pixel layout as the BMP codec). Pure stdlib; used
    to build genuine video fixtures."""
    import struct

    stride = 3 * width + ((-3 * width) % 4)
    dibs = []
    for rgb in frames_rgb:
        if len(rgb) != width * height * 3:
            raise ValueError("frame length != width*height*3")
        rows = []
        for y in range(height - 1, -1, -1):  # bottom-up, RGB->BGR
            row = rgb[y * width * 3 : (y + 1) * width * 3]
            bgr = bytearray()
            for x in range(width):
                r, g, b = row[3 * x : 3 * x + 3]
                bgr += bytes((b, g, r))
            rows.append(bytes(bgr) + b"\x00" * ((-3 * width) % 4))
        dibs.append(b"".join(rows))

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    # avih dwFlags=0: we write no idx1 chunk, so AVIF_HASINDEX must stay
    # clear for external decoders (an index-less file claiming an index is
    # off-spec even though our own parser ignores the flag).
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, stride * height * fps, 0, 0, len(dibs), 0, 1,
        stride * height, width, height, 0, 0, 0, 0,
    )
    # Full 56-byte AVISTREAMHEADER: ... dwQuality, dwSampleSize, then
    # rcFrame as 4 int16 (left, top, right, bottom) = (0, 0, width, height).
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(dibs),
        stride * height, 0xFFFFFFFF, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, stride * height,
        2835, 2835, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(
        b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)
    ))
    movi = lst(b"movi", b"".join(chunk(b"00db", d) for d in dibs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _parse_avi_header(payload: bytes) -> tuple[int, int, int, list[tuple[int, int]]]:
    """Validate an uncompressed 24-bit DIB AVI and return (width, height,
    stride, [(frame_off, frame_len), ...]). Strict: RIFF/AVI magic, strf
    sanity (planes/bpp/compression like the BMP path), per-frame chunk
    size == stride*height, at least one frame; ValueError otherwise.
    The LIST walk is iterative (explicit stack) so adversarially nested
    LIST headers cannot blow the Python recursion limit — any garbage is
    a ValueError, never a RecursionError escaping the row isolation."""
    import struct

    if len(payload) < 24 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    width = height = stride = None
    frames: list[tuple[int, int]] = []

    # (off, end) spans still to scan; a LIST pushes the continuation and
    # descends immediately, so traversal order (hence frame order, even
    # for frames inside 'rec ' LISTs) matches the recursive form exactly
    stack: list[tuple[int, int]] = [(12, len(payload))]
    while stack:
        off, end = stack.pop()
        while off + 8 <= end:
            cid, csize = struct.unpack_from("<4sI", payload, off)
            off += 8
            if off + csize > end:
                raise ValueError("truncated chunk")
            if cid == b"LIST":
                stack.append((off + csize + (csize & 1), end))
                off, end = off + 4, off + csize
                continue
            elif cid == b"strf":
                if csize < 40:
                    raise ValueError("short strf")
                hdr, w, h, planes, bpp = struct.unpack_from("<IiiHH", payload, off)
                comp = struct.unpack_from("<I", payload, off + 16)[0]
                if hdr < 40 or planes != 1 or bpp != 24 or comp != 0:
                    raise ValueError("unsupported AVI variant")
                if w <= 0 or h <= 0 or w * h > 1 << 24:
                    raise ValueError("bad dimensions")
                width, height = w, h
                stride = 3 * w + ((-3 * w) % 4)
            elif cid[2:] in (b"db", b"dc"):
                frames.append((off, csize))
            off += csize + (csize & 1)
    if width is None:
        raise ValueError("missing strf header")
    if not frames:
        raise ValueError("no frames")
    for _f_off, f_len in frames:
        if f_len != stride * height:
            raise ValueError("frame size mismatch")
    return width, height, stride, frames


def avi_decoder(payload: bytes) -> list[float]:
    """Real video featurize: sample 4 frames evenly across the stream and
    a 2x2 pixel grid per frame (integer grayscale, the BMP formula) -> 16
    floats in [0,1]. Pixels are read DIRECTLY at computed offsets, so
    per-row work is O(1) regardless of frame count or dimensions."""
    w, h, stride, frames = _parse_avi_header(payload)
    n = len(frames)
    feats = []
    for fi in range(4):
        f_off, _ = frames[min(n - 1, (fi * n + n // 2) // 4)]
        for gy in range(2):
            y = min(h - 1, (gy * h + h // 2) // 2)
            src_y = h - 1 - y  # DIB rows are bottom-up
            for gx in range(2):
                x = min(w - 1, (gx * w + w // 2) // 2)
                at = f_off + src_y * stride + 3 * x
                b, g, r = payload[at : at + 3]
                feats.append((299 * r + 587 * g + 114 * b) // 1000 / 255.0)
    return feats


def _make_pillow_decoder(image_module):
    """Build the production image decoder around a PIL.Image-compatible
    module. Split from resolve_decoder so the seam's ROUTING and CONTRACT
    are testable in containers without Pillow: tests inject a
    PIL-API-compatible fake here (test_llm_ops), and a real-Pillow test
    runs wherever the library is installed. The contract:

    - images: any Pillow-readable format -> L grayscale -> 4x4 NEAREST
      sample -> 16 features in [0, 1]. NEAREST keeps this sampling-based
      like bmp_decoder (bicubic would average pixels — a different
      feature family). Contract-compatible with bmp_decoder but NOT
      guaranteed bit-identical: Pillow's nearest picks floor((i+.5)*h/4)
      sample points vs bmp_decoder's (i*h+h//2)//4, which differ for some
      odd sizes — golden pins are valid for the BMP decoder only.
    - audio/video: routed to the dependency-free WAV/AVI parsers
      unchanged (Pillow adds nothing there).
    - garbage: raises (any exception) — extract_features converts that
      to decode_ok=false per row, never poisoning the batch."""
    import io

    def pillow_decoder(payload: bytes, kind: str) -> list[float]:
        if kind == "audio":
            return wav_decoder(payload)
        if kind == "video":
            return avi_decoder(payload)
        if kind != "image":
            return _decode_stub(payload, kind)
        img = (
            image_module.open(io.BytesIO(payload))
            .convert("L")
            .resize((4, 4), image_module.Resampling.NEAREST)
        )
        return [p / 255.0 for p in img.getdata()]

    return pillow_decoder


def resolve_decoder():
    """Codec seam: returns the best available `(payload, kind) ->
    list[float]` decoder. Tries the full image stack (Pillow — any
    format) first and falls back to the dependency-free BMP decoder
    (real decode for BMP images, WAV audio, AVI video) — so the same
    pipeline upgrades in-place when the production image libs are
    installed. Any injected decoder must be picklable (it ships to
    Python workers)."""
    try:
        from PIL import Image

        return _make_pillow_decoder(Image)
    except ImportError:
        return bmp_decoder


def synthetic_media(spark, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic media fixture. All three kinds carry GENUINE
    payloads: 24-bit BMP images (encode_bmp over seeded pixels),
    RIFF/WAVE PCM-16 audio (encode_wav over seeded samples), RIFF/AVI
    DIB video (encode_avi over seeded frames) — every real decoder path
    is exercised byte-for-byte. Failure rows: every 37th is empty; every
    51st (an image slot, 51 = 3*17 coprime to 37), every 55th audio slot
    and every 56th video slot carry garbage a real parser must reject."""
    import numpy as np

    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w = int(rng.integers(4, 33))
            h = int(rng.integers(4, 33))
            rgb = rng.integers(0, 256, size=3 * w * h, dtype=np.uint8).tobytes()
            payload = encode_bmp(w, h, rgb)
        elif kind == "audio":
            sr = [8000, 16000, 22050, 44100][int(rng.integers(0, 4))]
            channels = int(rng.integers(1, 3))
            frames = int(rng.integers(64, 2048))
            pcm = rng.integers(
                -32768, 32768, size=frames * channels, dtype=np.int16
            )
            payload = encode_wav(sr, channels, pcm.tobytes())
        else:
            w = int(rng.integers(4, 17))
            h = int(rng.integers(4, 17))
            n_frames = int(rng.integers(2, 11))
            frames_rgb = [
                rng.integers(0, 256, size=3 * w * h, dtype=np.uint8).tobytes()
                for _ in range(n_frames)
            ]
            payload = encode_avi(w, h, frames_rgb)
        if i % 37 == 0:
            payload = b""  # decode-failure row
        elif (
            i % 51 == 0
            or (kind == "audio" and i % 55 == 0)
            or (kind == "video" and i % 56 == 0)
        ):
            # corrupt, not absent: i%51 hits image slots (51 = 3*17);
            # i%55 lands on audio and i%56 on video slots — every real
            # parser gets a garbage row to reject
            payload = b"JUNK" + payload[4:]
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
    AVI payloads emit REAL frames (the uncompressed DIB chunk per frame,
    first max_frames of the stream); undecodable payloads fall back to
    fixed-size byte slices, so garbage still yields the kind-agnostic
    sampling contract instead of poisoning the batch. Output batches are
    yielded per input batch — the iterator contract keeps peak memory at
    one batch regardless of fan-out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"] or b"")
                try:
                    _w, _h, _stride, frames = _parse_avi_header(payload)
                    chunks = [
                        payload[off : off + ln]
                        for off, ln in frames[:max_frames]
                    ]
                except ValueError:
                    n = min(max_frames, max(0, len(payload) // every_n_bytes))
                    chunks = [
                        payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                        for i in range(n)
                    ]
                for i, chunk in enumerate(chunks):
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
