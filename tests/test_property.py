"""Property-based tests (hypothesis) for the pure codec helpers, plus a
batched randomized round-trip through the Spark codec expressions —
the property coverage the reference lacks (SURVEY §5 'not present')."""

from __future__ import annotations

import base64

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ct_mapreduce_spark.functions.codecs import base64url, serial_hex
from ct_mapreduce_spark.functions.x509 import serial_int_to_asn1_bytes


@given(st.integers(min_value=0, max_value=1 << 200))
@settings(max_examples=300, deadline=None)
def test_serial_asn1_roundtrip(n):
    b = serial_int_to_asn1_bytes(n)
    # DER value bytes decode back to the integer
    assert int.from_bytes(b, "big", signed=False) == n
    # canonical: no redundant leading zero (except the sign byte case)
    if len(b) > 1 and b[0] == 0:
        assert b[1] & 0x80, b.hex()


@given(st.binary(min_size=1, max_size=64))
@settings(max_examples=200, deadline=None)
def test_base64url_matches_python(data):
    # the column fn is tested in bulk below; here property-check the spec
    # we claim it implements
    assert base64.urlsafe_b64encode(data).decode() == (
        base64.b64encode(data).decode().replace("+", "-").replace("/", "_")
    )


def test_spark_codec_roundtrip_bulk(spark):
    """300 random byte strings (seeded) through serial_hex/base64url in one
    Spark job; compare against Python reference implementations."""
    rng = np.random.default_rng(7)
    payloads = [
        bytes(rng.integers(0, 256, size=int(rng.integers(1, 40)), dtype=np.uint8))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i int, b binary"
    )
    rows = df.select(
        "i", serial_hex("b").alias("h"), base64url("b").alias("u")
    ).collect()
    for r in rows:
        p = payloads[r["i"]]
        assert r["h"] == p.hex()
        assert r["u"] == base64.urlsafe_b64encode(p).decode()


@given(
    st.integers(min_value=1, max_value=24),   # width
    st.integers(min_value=1, max_value=24),   # height
    st.integers(min_value=1, max_value=5),    # frames
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_avi_roundtrip_property(w, h, nf, seed):
    """Any geometry: encode_avi -> parse -> per-frame DIB decodes back to
    the exact original RGB, in order."""
    from ct_mapreduce_spark.operators import multimodal

    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=3 * w * h, dtype=np.uint8).tobytes()
        for _ in range(nf)
    ]
    payload = multimodal.encode_avi(w, h, frames)
    pw, ph, stride, offs = multimodal._parse_avi_header(payload)
    assert (pw, ph, len(offs)) == (w, h, nf)
    for fi, (off, ln) in enumerate(offs):
        dib = payload[off : off + ln]
        rows = [dib[y * stride : y * stride + 3 * w] for y in range(h)][::-1]
        rgb = b"".join(
            bytes((px[2], px[1], px[0]))
            for row in rows
            for px in (row[3 * x : 3 * x + 3] for x in range(w))
        )
        assert rgb == frames[fi]


@given(
    st.sampled_from([8000, 16000, 44100]),
    st.integers(min_value=1, max_value=4),    # channels
    st.integers(min_value=1, max_value=600),  # frames
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(sr, ch, nf, seed):
    """Any PCM-16 stream: encode_wav -> decode_wav returns the exact
    samples, shape, and rate; features are finite and bounded."""
    import math

    from ct_mapreduce_spark.operators import multimodal

    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=nf * ch, dtype=np.int16)
    payload = multimodal.encode_wav(sr, ch, pcm.tobytes())
    sr2, ch2, samples = multimodal.decode_wav(payload)
    assert (sr2, ch2, samples.shape) == (sr, ch, (nf, ch))
    assert np.array_equal(samples.reshape(-1), pcm)
    feats = multimodal.wav_features(samples, sr)
    assert len(feats) == 16
    assert all(math.isfinite(f) and 0.0 <= f <= 1.0 for f in feats)


@given(st.binary(min_size=0, max_size=512))
@settings(max_examples=300, deadline=None)
def test_media_parsers_never_crash_on_fuzz(data):
    """Arbitrary bytes through every strict parser: the only permitted
    outcome besides success is ValueError — never IndexError/struct.error/
    OverflowError — so extract_features' per-row isolation contract holds
    for any input."""
    from ct_mapreduce_spark.operators import multimodal

    for parser in (
        lambda b: multimodal.bmp_decoder(b, "image"),
        multimodal.wav_decoder,
        multimodal.avi_decoder,
    ):
        try:
            parser(data)
        except ValueError:
            pass


@given(st.binary(min_size=44, max_size=256))
@settings(max_examples=200, deadline=None)
def test_riff_flip_fuzz(data):
    """Header-shaped fuzz: graft RIFF/WAVE and RIFF/AVI magics onto random
    tails so the chunk walkers (not just the magic check) get exercised."""
    from ct_mapreduce_spark.operators import multimodal

    wav = b"RIFF" + data[4:8] + b"WAVE" + data[12:]
    avi = b"RIFF" + data[4:8] + b"AVI " + data[12:]
    for parser, payload in ((multimodal.wav_decoder, wav), (multimodal.avi_decoder, avi)):
        try:
            parser(payload)
        except ValueError:
            pass


def test_avi_deeply_nested_lists_no_recursion_error():
    """Adversarial payload: thousands of nested LIST headers (12 bytes
    each) must yield ValueError from the iterative chunk walk, never a
    RecursionError that would escape sample_frames' ValueError catch and
    poison the whole Spark task. The 512-byte fuzz cap above can't reach
    this depth, so it gets an explicit case."""
    import struct

    from ct_mapreduce_spark.operators import multimodal

    inner = b""
    for _ in range(4000):  # ~4x the default recursion limit
        inner = b"LIST" + struct.pack("<I", len(inner) + 4) + b"nest" + inner
    payload = b"RIFF" + struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    with pytest.raises(ValueError):
        multimodal._parse_avi_header(payload)


def test_avi_frames_inside_rec_lists_preserve_order():
    """Frames wrapped in 'rec ' LISTs (the interleaved-AVI layout) must
    come back in stream order — the iterative walk descends into a LIST
    before scanning past it, exactly like the recursive form."""
    import struct

    from ct_mapreduce_spark.operators import multimodal

    frames = [bytes([i] * 12) for i in range(4)]
    payload = multimodal.encode_avi(2, 2, frames)
    w, h, stride, offs = multimodal._parse_avi_header(payload)
    # rebuild the movi body with each 00db chunk wrapped in its own rec
    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + b"\x00" * (len(body) & 1)

    dibs = [payload[off : off + ln] for off, ln in offs]
    movi = chunk(
        b"LIST",
        b"movi"
        + b"".join(chunk(b"LIST", b"rec " + chunk(b"00db", d)) for d in dibs),
    )
    movi_at = payload.index(b"movi") - 8
    rebuilt_body = payload[12:movi_at] + movi
    rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt_body) + 4) + b"AVI " + rebuilt_body
    w2, h2, stride2, offs2 = multimodal._parse_avi_header(rebuilt)
    assert (w2, h2, stride2) == (w, h, stride)
    assert [rebuilt[o : o + n] for o, n in offs2] == dibs
