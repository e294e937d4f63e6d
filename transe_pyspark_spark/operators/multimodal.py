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
