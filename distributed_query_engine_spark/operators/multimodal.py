"""Multimodal column operators: opaque binary payloads + typed metadata,
processed by Arrow-batched Pandas UDFs over ``mapInPandas``.

The decode libraries (PIL/opencv/torchaudio/ffmpeg) are NOT present in
this container, so the actual byte→pixels/samples decode is stubbed
behind import gates below — but everything Spark-side is real and
tested: the BinaryType schema, the metadata struct, Arrow batch shapes,
partition-preserving ``mapInPandas`` signatures, and the stride
subsampling math (resize / frame-sample are both strided selections at
this level of abstraction).

100 TB notes: blobs stay in executors end-to-end (no driver collect);
payloads too large to inline use the pointer pattern — a StringType URI
column plus a deferred ``spark.read.format("binaryFile")`` join at the
consumer; per-batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - decode libs absent in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def with_blob_and_meta(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, blob binary, meta struct<lang,n_chars>):
    the canonical multimodal row shape (payload + typed metadata)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("blob"),
        F.struct(
            F.col("lang").alias("lang"), F.col("n_chars").alias("n_chars")
        ).alias("meta"),
    )


def decode_image(blob: bytes):  # pragma: no cover - gated
    """Real image decode — requires PIL, absent here by design."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL, which is not available in this "
            "container; use stride_resample for the tested fake pipeline"
        )
    import io

    return PIL.Image.open(io.BytesIO(blob))


def stride_resample(df: DataFrame, stride: int = 2, limit: int = 64) -> DataFrame:
    """Deterministic stand-in for resize / frame-sampling: decode the
    payload and select every ``stride``-th codepoint of the first
    ``limit`` (what a 1-D nearest-neighbor downscale or every-Nth-frame
    sampler does to an index space). Real pipeline shape: binary in →
    decoded/derived features out, via Arrow batches. Codepoints (not raw
    bytes) so the sampled fields match the char-indexed DuckDB oracle for
    any unicode text; ``n_bytes`` stays byte-based on both sides."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            win = blobs.map(lambda b: b.decode("utf-8")[:limit:stride])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "n_sampled": win.map(len).astype("int64"),
                    "sampled_checksum": win.map(
                        lambda s: sum(ord(c) for c in s)
                    ).astype("int64"),
                }
            )

    return df.mapInPandas(
        sample,
        "doc_id long, n_bytes long, n_sampled long, sampled_checksum long",
    )
