"""Multimodal plumbing: opaque binary columns + typed metadata, PPM/WAV/
video-frame decodes, stride resampling, frame dedup. Split from
plans/llm.py (r14)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_query_engine_spark.catalog import Tables
from distributed_query_engine_spark.functions import text as T
from distributed_query_engine_spark.functions.vectors import SCALE
from distributed_query_engine_spark.operators import dedup as D
from distributed_query_engine_spark.operators.chunking import chunk_documents
from distributed_query_engine_spark.operators import multimodal as M
from distributed_query_engine_spark.operators import similarity as S
from distributed_query_engine_spark.registry import query

from distributed_query_engine_spark.plans.llm._shared import (  # noqa: F401
    _WORD_LIST, _BIGRAM_LIST, _tokens_cte, _TOKENS_CTE, _SIG_EXPRS,
    _SIG_COLS, _band_selects, _BAND_SELECTS, _jaccard_cte, _IVEC_CTE,
    _LSH_BUCKET_CTES, _PROBE_MASKS_SQL, _sql_lang_hits, _sql_lang_predict,
    _QUERY_IDS, _RECALL_QUERY_IDS, _RECALL_IDS_SQL, _IVF_NEW_MOD,
    _IVF_NEW_LO, _COS,
)

@query(
    "llm_multimodal_columns",
    oracle="""
    WITH cs AS (
      SELECT doc_id,
             CAST(sum(ascii(substring(text, CAST(i AS INT), 1))) AS BIGINT)
               AS checksum16
      FROM documents, generate_series(1, 16) t(i)
      WHERE CAST(i AS BIGINT) <= length(text)
      GROUP BY doc_id
    )
    SELECT d.doc_id, d.lang,
           octet_length(encode(d.text)) AS byte_len,
           cs.checksum16
    FROM documents d JOIN cs USING (doc_id)
    """,
)
def llm_multimodal_columns(spark, sf_dir):
    """Multimodal column plumbing: an opaque binary payload + typed
    metadata, feature-extracted by an Arrow-batched ``mapInPandas``. The
    payload here is utf-8 text bytes standing in for image/audio blobs
    (decode libs are absent in this container — see
    operators/multimodal.py for the gated real-decode stubs); the
    Spark-side schema, batching, and UDF signature are the real thing.

    Parity notes: the oracle's integer sum is CAST to BIGINT (DuckDB
    would return HUGEINT, which hashes differently from Spark's int64
    even for equal values); the checksum "decode" step sums the first 16
    CODEPOINTS of the decoded payload — matching the oracle's ascii()
    for any text, not just ASCII — while byte_len stays byte-based on
    both sides."""
    import pandas as pd

    d = Tables(spark, sf_dir).documents
    with_blob = d.select(
        "doc_id",
        "lang",
        F.encode(F.col("text"), "utf-8").alias("blob"),
    )

    def extract(batches):
        for pdf in batches:
            blobs = pdf["blob"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "byte_len": blobs.map(len).astype("int64"),
                    "checksum16": blobs.map(
                        lambda b: sum(ord(c) for c in b.decode("utf-8")[:16])
                    ).astype("int64"),
                }
            )

    return with_blob.mapInPandas(
        extract, "doc_id long, lang string, byte_len long, checksum16 long"
    )


@query(
    "llm_multimodal_resample",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             CAST(sum(ascii(substring(text, CAST(i AS INT), 1))) AS BIGINT)
               AS sampled_checksum,
             count(*) AS n_sampled
      FROM documents, generate_series(1, 64) t(i)
      WHERE CAST(i AS BIGINT) <= length(text) AND (i - 1) % 2 = 0
      GROUP BY doc_id
    )
    SELECT d.doc_id, octet_length(encode(d.text)) AS n_bytes,
           s.n_sampled, s.sampled_checksum
    FROM documents d JOIN s USING (doc_id)
    """,
)
def llm_multimodal_resample(spark, sf_dir):
    """Resize / frame-sample plumbing (operators/multimodal.py): stride
    subsampling of the binary payload through mapInPandas — the tested
    fake for the PIL/ffmpeg decode that is stubbed in this container."""
    from distributed_query_engine_spark.operators.multimodal import (
        stride_resample,
        with_blob_and_meta,
    )

    d = Tables(spark, sf_dir).documents
    return stride_resample(with_blob_and_meta(d), stride=2, limit=64)

@query(
    "llm_multimodal_ppm_decode",
    # The oracle replays the deterministic pixel formula arithmetically
    # (generate_series over byte indices); the ENGINE path synthesizes
    # real PPM P6 blobs and byte-parses them back (header parse + numpy
    # reshape) — decode dimensions come from the bytes, not metadata.
    oracle=lambda: f"""
    WITH vals AS (
      SELECT d.doc_id, t.i,
             (d.doc_id * 31 + t.i * 7) % 256 AS v,
             (t.i // 3) % {M.PPM_W} AS x,
             (t.i // 3) // {M.PPM_W} AS y,
             t.i % 3 AS c
      FROM documents d,
           unnest(generate_series(0, {M.PPM_W} * {M.PPM_H} * 3 - 1)) AS t(i)
    )
    SELECT doc_id,
           CAST({M.PPM_W} AS INT) AS width,
           CAST({M.PPM_H} AS INT) AS height,
           CAST(SUM(v) FILTER (c = 0) AS BIGINT) AS sum_r,
           CAST(SUM(v) FILTER (c = 1) AS BIGINT) AS sum_g,
           CAST(SUM(v) FILTER (c = 2) AS BIGINT) AS sum_b,
           CAST(SUM(v) FILTER (x % 2 = 0 AND y % 2 = 0) AS BIGINT) AS sum_ds,
           CAST(SUM(v) AS DOUBLE)
             / ({M.PPM_W} * {M.PPM_H} * 3) AS mean_brightness
    FROM vals GROUP BY doc_id
    """,
)
def llm_multimodal_ppm_decode(spark, sf_dir):
    """REAL IMAGE DECODE, no image libraries: a PPM (P6) codec built
    from raw bytes — synthesize an actual binary image per document
    (header + RGB payload, Arrow-batched), then DECODE it back by
    parsing the header and reshaping the payload (numpy frombuffer),
    extracting per-channel integer sums, a strided 2× downsample sum
    (the resize kernel's integer core), and mean brightness. This
    upgrades the multimodal story from 'decode stubbed behind an
    import gate' to a genuine byte→pixels→features pipeline whose
    derived values are still EXACTLY oracle-checked (the synthetic
    pixel content is a deterministic formula the oracle replays
    arithmetically — the decode itself is not faked).

    Scale shape: both halves are mapInPandas over Arrow batches —
    embarrassingly parallel, blobs never leave executors, per-batch
    memory bounded by arrow.maxRecordsPerBatch. At 100 TB the
    synthesize half is replaced by a binaryFile scan or pointer-join
    (see scan_binaryfile / llm_multimodal_columns); the decode half is
    unchanged — that is the half this query proves."""
    d = Tables(spark, sf_dir).documents
    feats = M.decode_ppm_features(M.synthesize_ppm(d))
    n = F.col("width") * F.col("height") * 3
    return feats.select(
        "doc_id",
        "width",
        "height",
        "sum_r",
        "sum_g",
        "sum_b",
        "sum_ds",
        (
            (F.col("sum_r") + F.col("sum_g") + F.col("sum_b")).cast("double")
            / n.cast("double")
        ).alias("mean_brightness"),
    )


@query(
    "llm_multimodal_wav_decode",
    # Arithmetic replay of the waveform formula v(i) = ((doc_id*7 +
    # i*13) % 4096) - 2048; the engine path builds and chunk-walks real
    # RIFF/WAVE bytes.
    oracle=lambda: f"""
    WITH vals AS (
      SELECT d.doc_id, t.i,
             ((d.doc_id * 7 + t.i * 13) % 4096) - 2048 AS v
      FROM documents d,
           unnest(generate_series(0, {M.WAV_SAMPLES} - 1)) AS t(i)
    ),
    lagged AS (
      SELECT doc_id, i, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM vals
    )
    SELECT doc_id,
           CAST({M.WAV_RATE} AS INT) AS sample_rate,
           CAST({M.WAV_SAMPLES} AS INT) AS n_samples,
           CAST(SUM(v * v) AS BIGINT) AS energy,
           CAST(MAX(abs(v)) AS BIGINT) AS peak,
           CAST(SUM(CASE WHEN pv IS NOT NULL
                          AND (v >= 0) <> (pv >= 0) THEN 1 ELSE 0 END)
                AS BIGINT) AS zero_crossings,
           CAST(SUM(CASE WHEN i % 8 = 0 THEN v ELSE 0 END) AS BIGINT)
             AS frame_sum
    FROM lagged GROUP BY doc_id
    """,
)
def llm_multimodal_wav_decode(spark, sf_dir):
    """REAL AUDIO DECODE, no audio libraries: a WAV (RIFF/PCM16) codec
    from raw bytes — synthesize an actual mono PCM16 file per document,
    then parse it back with a proper RIFF CHUNK WALK (sample rate and
    bit depth come from the fmt chunk, samples from the data chunk —
    no fixed offsets assumed) and compute integer DSP features: energy
    (sum of squares), peak amplitude, zero-crossing count, and an
    every-8th-sample frame sum (the frame-sampling kernel). The audio
    analog of llm_multimodal_ppm_decode: the decode is genuine byte
    parsing, the derived values stay exactly oracle-checked because
    the synthetic waveform is an arithmetic formula. Same 100 TB shape:
    two mapInPandas stages, Arrow-batched, blobs never leave
    executors."""
    d = Tables(spark, sf_dir).documents
    return M.decode_wav_features(M.synthesize_wav(d))


@query(
    "llm_multimodal_video_frames",
    # Arithmetic replay: pixel (doc, frame f, plane index p) = (doc*31 +
    # f*17 + p*7) % 256; kept frames are f % stride = 0; motion is the
    # abs-diff of consecutive KEPT frame sums.
    oracle=lambda: f"""
    WITH fsums AS (
      SELECT d.doc_id, t.f,
             CAST(SUM((d.doc_id * 31 + t.f * 17 + s.p * 7) % 256) AS BIGINT)
               AS fsum
      FROM documents d,
           unnest(generate_series(0, {M.VID_FRAMES} - 1)) AS t(f),
           unnest(generate_series(0, {M.VID_W} * {M.VID_H} - 1)) AS s(p)
      WHERE t.f % {M.VID_STRIDE} = 0
      GROUP BY d.doc_id, t.f
    ),
    lagged AS (
      SELECT doc_id, fsum,
             lag(fsum) OVER (PARTITION BY doc_id ORDER BY f) AS pv
      FROM fsums
    )
    SELECT doc_id,
           CAST({M.VID_FRAMES} AS INT) AS n_frames,
           CAST(COUNT(*) AS INT) AS n_sampled,
           CAST(SUM(fsum) AS BIGINT) AS sampled_sum,
           CAST(SUM(CASE WHEN pv IS NULL THEN 0 ELSE abs(fsum - pv) END)
                AS BIGINT) AS motion_total
    FROM lagged GROUP BY doc_id
    """,
)
def llm_multimodal_video_frames(spark, sf_dir):
    """REAL VIDEO FRAME-SAMPLING, no video libraries: a raw grayscale
    frame container (y4m-style layout reduced to byte essentials) is
    synthesized per document and parsed back — geometry from the
    header, planes sliced per frame — keeping every 2nd frame (the
    frame-sampling kernel the brief names) and scoring motion as the
    integer Σ|Δ frame-sum| over consecutive kept frames (the
    scene-change metric's core). Completes the image/audio/video
    triple next to llm_multimodal_ppm_decode / _wav_decode; same
    Arrow-batched mapInPandas shape, same exact arithmetic oracle."""
    d = Tables(spark, sf_dir).documents
    return M.sample_video_frames(M.synthesize_video(d))


@query(
    "llm_multimodal_frame_dedup",
    # Arithmetic replay of the container bytes (pixel = (doc*31 + f*17 +
    # p*7) % 256) and the position-weighted fingerprint; grouping by the
    # fingerprint IS the cross-video exact frame dedup. The synthetic
    # pixel formula depends on doc/f only through (doc*31 + f*17) % 256,
    # so the fingerprint space is bounded at 256 rows — which is the
    # point: heavy frame-level duplication across videos, like real
    # copied segments.
    oracle=lambda: f"""
    WITH occ AS (
      SELECT d.doc_id, t.f,
             CAST(SUM(((d.doc_id * 31 + t.f * 17 + s.p * 7) % 256)
                        * (s.p + 1)) AS BIGINT) AS fhash
      FROM documents d,
           unnest(generate_series(0, {M.VID_FRAMES} - 1)) AS t(f),
           unnest(generate_series(0, {M.VID_W} * {M.VID_H} - 1)) AS s(p)
      WHERE t.f % {M.VID_STRIDE} = 0
      GROUP BY d.doc_id, t.f
    )
    SELECT fhash,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc,
           CAST(min(f) AS INT) AS min_frame,
           (count(*) > 1) AS is_dup
    FROM occ GROUP BY fhash
    """,
)
def llm_multimodal_frame_dedup(spark, sf_dir):
    """Cross-video frame-level exact dedup: REAL container decode →
    per-kept-frame content fingerprint (operators/multimodal.py::
    frame_fingerprints) → group-by-fingerprint dup report (keeper =
    lexicographically first occurrence). The multimodal analog of
    llm_dedup_exact, composing the decode tier with the dedup tier.
    Scale shape: blobs stay in executors; the shuffled relation is
    (docs × kept-frames) fingerprint rows — three orders of magnitude
    smaller than the video bytes; the dup report is fingerprint-grain."""
    d = Tables(spark, sf_dir).documents
    occ = M.frame_fingerprints(M.synthesize_video(d))
    return occ.groupBy("fhash").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.min("f").alias("min_frame"),
        (F.count(F.lit(1)) > 1).alias("is_dup"),
    )


