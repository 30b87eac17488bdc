"""Multimodal column handling: images/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the actual decode is a
clearly-marked STUB (`decode_image_real` raises NotImplementedError); the
Spark-side plumbing -- binary column construction, Arrow batch transfer,
UDF signatures, output schema -- is real and tested.  `fake_decode`
derives deterministic metadata from the payload bytes so the pipeline is
end-to-end verifiable against a SQL oracle.

Scale notes (100 TB): media blobs dominate row size -> the pipeline reads
only (doc_id, media_blob) (column pruning), processes in bounded Arrow
batches (spark.sql.execution.arrow.maxRecordsPerBatch), and never holds a
whole partition of blobs in memory (mapInPandas streams batch iterators).
Media-heavy rows are routed to their own partitions by the extraction
pipeline's media/text split (extract/pipeline.py) so decode batches stay
balanced.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

IMG_FORMATS = ("png", "jpeg", "webp", "gif")

DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, format string, n_bytes int"
)
FEATURE_SCHEMA = "doc_id bigint, mean_byte double, n_bytes int"


def decode_image_real(blob: bytes):
    """Real image decode -- STUB.

    The sandbox has no PIL/libjpeg; on a production cluster this body is
    `PIL.Image.open(io.BytesIO(blob))`, shipped via --py-files + conda
    env.  The Spark plumbing around it (schemas, batching) is what this
    module actually tests.
    """
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "use fake_decode (deterministic) for tests"
    )


def fake_decode(blob: bytes) -> tuple[int, int, str]:
    """Deterministic fake decode: metadata derived from payload bytes.

    width  = bytes[0:2] (big-endian) % 1920 + 16
    height = bytes[2:4] (big-endian) % 1080 + 16
    format = IMG_FORMATS[bytes[4] % 4]
    """
    w = int.from_bytes(blob[0:2], "big") % 1920 + 16
    h = int.from_bytes(blob[2:4], "big") % 1080 + 16
    fmt = IMG_FORMATS[blob[4] % len(IMG_FORMATS)]
    return w, h, fmt


def decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, media_blob) -> DECODE_SCHEMA rows.

    Vectorized per Arrow batch; one output row per input row.
    """
    for pdf in batches:
        blobs = pdf["media_blob"]
        meta = [fake_decode(bytes(b)) for b in blobs]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "width": [m[0] for m in meta],
                "height": [m[1] for m in meta],
                "format": [m[2] for m in meta],
                "n_bytes": [len(bytes(b)) for b in blobs],
            }
        )


def feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per-blob feature extraction (mean byte value).

    Stands in for an embedding/feature model; numpy-vectorized within the
    batch.  mean = sum(bytes)/len -- exact in float64 for small payloads.
    """
    import numpy as np

    for pdf in batches:
        blobs = [bytes(b) for b in pdf["media_blob"]]
        means = [
            float(np.frombuffer(b, dtype=np.uint8).astype(np.float64).sum())
            / len(b)
            for b in blobs
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "mean_byte": means,
                "n_bytes": [len(b) for b in blobs],
            }
        )


RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, new_width int, new_height int,"
    " media_out binary, n_bytes int"
)


def resize_plan(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving fit-within-box target dims, pure integer math
    (floor), identical in Spark SQL / DuckDB / Python: no-op when the
    long side already fits, else long side -> max_side and the short
    side scales by the same integer-floored ratio."""
    long = max(w, h)
    if long <= max_side:
        return w, h
    return (w * max_side) // long, (h * max_side) // long


def resize_batches(max_side: int = 256):
    """mapInPandas kernel factory: (doc_id, media_blob) -> RESIZE_SCHEMA.

    The geometric plan (target dims) is real; the pixel resample is the
    same stubbed codec step as decode_image_real — on a production
    cluster the body is PIL `img.resize((nw, nh))`, here the payload
    passes through unchanged so the pipeline stays end-to-end
    deterministic and the blob column keeps its real width class.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b) for b in pdf["media_blob"]]
            meta = [fake_decode(b) for b in blobs]
            dims = [resize_plan(w, h, max_side) for w, h, _f in meta]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "new_width": [d[0] for d in dims],
                    "new_height": [d[1] for d in dims],
                    "media_out": blobs,
                    "n_bytes": [len(b) for b in blobs],
                }
            )

    return kernel
