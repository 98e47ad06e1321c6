"""Document chunking: overlapping fixed-size token windows (window W,
stride S < W) — the standard context-packing prep for tokenization
pipelines. One explode, linear in output size, no shuffle: each chunk
row is a row-local function of its source document, so the operator
scales with the scan at any corpus size.

Chunk-count arithmetic is integer-only so any mirroring engine (the
DuckDB oracle in plans/llm.py) enumerates the identical grid:
``n_chunks = 1 + ceil(max(n - W, 0) / S)`` chunks at starts
``0, S, 2S, ...``; the final chunk is the only one allowed to be short.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    window: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(doc) → (doc_id, chunk_id, n_tokens, chunk_text) over whitespace
    tokens. ``stride < window`` gives overlapping chunks; the grid
    covers every token (the last start is < n by construction).

    ``passthrough`` columns are carried onto every chunk row — doing it
    here costs a projection, while recovering them downstream would
    cost a chunks⋈documents join (a full shuffle of the exploded
    relation at corpus scale)."""
    if not 0 < stride <= window:
        raise ValueError("require 0 < stride <= window")
    t = F.split(F.col(text_col), " ")
    n = F.size(t)
    # 1 + ceil(max(n - W, 0) / S), via exact double division of small
    # ints (floor(x/y) on ints < 2^53 is exact) — explode(sequence)
    # then enumerates chunk ids 0..n_chunks-1.
    last_chunk = F.floor(
        (F.greatest(n - window, F.lit(0)) + (stride - 1)) / stride
    ).cast("int")
    extra = [F.col(c) for c in passthrough]
    grid = docs.select(
        F.col(id_col).alias("doc_id"),
        *extra,
        t.alias("t"),
        n.alias("n"),
        F.explode(F.sequence(F.lit(0), last_chunk)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    return grid.select(
        "doc_id",
        *[F.col(c) for c in passthrough],
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.least(F.lit(window), F.col("n") - start).cast("int").alias("n_tokens"),
        F.array_join(F.slice(F.col("t"), start + 1, F.lit(window)), " ").alias(
            "chunk_text"
        ),
    )
