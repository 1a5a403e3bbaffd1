"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched pandas via
``mapInPandas``.

The decode step itself is STUBBED (no image/audio libraries in this
environment — see ``decode_image``): what is real, tested, and
scale-relevant is the Spark-side plumbing — schema contract, batch
iteration shape, Arrow transfer, and the byte-level feature extraction
path. Swapping the stub for PIL/torchaudio changes one function body and
nothing in the plan.

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of blob
sizes; decode parallelism is partition parallelism, so repartition by a
size-balanced key before heavy decode to avoid stragglers.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BINARY_DOC_SCHEMA = "doc_id bigint, content binary, media_type string, n_chars bigint"
META_SCHEMA = "doc_id bigint, n_bytes int, content_md5 string"
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, byte_sum bigint, byte_min int, byte_max int, "
    "n_frames int"
)


def synthesize_binary_docs(docs: DataFrame) -> DataFrame:
    """documents → opaque binary 'media' rows (utf-8 bytes of text stand
    in for image/audio payloads; the plumbing is payload-agnostic)."""
    media = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("content"),
        media.alias("media_type"),
        "n_chars",
    )


def decode_image(content: bytes):  # pragma: no cover - stub by design
    """Placeholder for the real decoder (PIL.Image.open etc.). The
    container has no imaging libraries; raising keeps the contract
    explicit rather than faking pixels."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; wire PIL/open here"
    )


def extract_meta(df: DataFrame) -> DataFrame:
    """Byte-level metadata via Arrow-batched pandas: size + md5.
    Deterministic, so it is oracle-checkable end-to-end — this validates
    the whole binary→Arrow→pandas→Arrow path, not just the arithmetic."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["content"].map(len).astype("int32"),
                    "content_md5": pdf["content"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select("doc_id", "content").mapInPandas(op, META_SCHEMA)


def extract_features(df: DataFrame, frame_bytes: int = 1024) -> DataFrame:
    """Deterministic byte-level stand-in for decode+featurize: byte sum /
    min / max plus a frame count (payload chunked into ``frame_bytes``
    units — the video frame-sampling shape)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["content"].map(bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "byte_sum": payloads.map(lambda b: sum(b)).astype("int64"),
                    "byte_min": payloads.map(lambda b: min(b) if b else 0).astype("int32"),
                    "byte_max": payloads.map(lambda b: max(b) if b else 0).astype("int32"),
                    "n_frames": payloads.map(
                        lambda b: (len(b) + frame_bytes - 1) // frame_bytes
                    ).astype("int32"),
                }
            )

    return df.select("doc_id", "content").mapInPandas(op, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary, frame_md5 string"
RESIZE_SCHEMA = "doc_id bigint, width int, height int, pixels binary"


def sample_frames(
    df: DataFrame, frame_bytes: int = 1024, every_k: int = 4
) -> DataFrame:
    """Frame sampling — the one-to-MANY mapInPandas shape (a video row
    explodes into its sampled frames): payloads chunk into
    ``frame_bytes`` frames, every ``every_k``-th frame is emitted with
    its index and md5. Output rows per input row vary, which is exactly
    what the Arrow batch iterator allows (a yielded frame can hold any
    number of rows); memory stays bounded by the input batch size times
    the sampling ratio. Deterministic, so tests recompute it exactly."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, digests = [], [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(content)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_k):
                    frame = b[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(frame)
                    digests.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                }
            )

    return df.select("doc_id", "content").mapInPandas(op, FRAME_SCHEMA)


def resize_media(df: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Resize plumbing with a DETERMINISTIC FAKE decoder (the container
    has no imaging libraries — see decode_image): the payload is treated
    as a square grayscale image (side = floor(sqrt(n_bytes))) and
    nearest-neighbor-sampled to ``width``×``height``. Swapping the fake
    for PIL's decode+resize changes only the per-row body; the schema
    contract, Arrow batch shape, and plan stay identical. Payloads too
    small for one pixel yield an all-zero tile (never a crash)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                b = bytes(content)
                side = int(len(b) ** 0.5)
                if side == 0:
                    out.append(bytes(width * height))
                    continue
                pixels = bytearray()
                for r in range(height):
                    for c in range(width):
                        src = (r * side // height) * side + (c * side // width)
                        pixels.append(b[src])
                out.append(bytes(pixels))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "pixels": pd.Series(out, dtype="object"),
                }
            )

    return df.select("doc_id", "content").mapInPandas(op, RESIZE_SCHEMA)
