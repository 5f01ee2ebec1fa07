"""Multimodal-column queries (north-star extension): binary blob
synthesis -> header decode -> feature extraction -> frame sampling,
all over mapInPandas (operators/multimodal.py; codec decode stubbed —
no image libs in this environment, the Spark plumbing is real).

The blobs are deterministic functions of documents.text, so DuckDB
oracles verify the plumbing end-to-end on the text equivalents."""

from __future__ import annotations

from citybikedatawarehouse_spark.operators.multimodal import (
    audio_windows,
    decode_images,
    extract_features,
    sample_frames,
    synthesize_blobs,
)
from citybikedatawarehouse_spark.plans.catalog import register
from citybikedatawarehouse_spark.sources.readers import load_table as _t


@register(
    "q80_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(64 + doc_id % 512 AS INTEGER) AS width,
           CAST(64 + doc_id % 384 AS INTEGER) AS height,
           CAST(length(text) AS BIGINT) AS payload_bytes,
           true AS is_fake_format
    FROM documents
    """,
)
def q80_multimodal_decode(spark, sf_dir):
    """Binary image column -> typed metadata via Arrow-batched
    mapInPandas header parse (real codec stubbed)."""
    d = _t(spark, sf_dir, "documents")
    return decode_images(synthesize_blobs(d))


@register(
    "q81_multimodal_features",
    oracle="SELECT doc_id, md5(text) AS payload_md5 FROM documents",
)
def q81_multimodal_features(spark, sf_dir):
    """Payload digest from the feature extractor (the byte-histogram
    'embedding' is asserted in tests/test_multimodal.py — arrays are
    awkward for the SQL oracle, the digest pins the same bytes)."""
    d = _t(spark, sf_dir, "documents")
    return extract_features(synthesize_blobs(d)).select("doc_id", "payload_md5")


@register(
    "q82_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           CAST(least(256, length(text) - i * 256) AS BIGINT) AS frame_bytes,
           md5(substr(text, i * 256 + 1, 256)) AS frame_md5
    FROM documents,
         UNNEST(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT), 2)) t(i)
    """,
)
def q82_frame_sample(spark, sf_dir):
    """'Video' keyframe sampling: payload chunked into 256-byte
    frames, every 2nd kept — fan-out mapInPandas (rows out > in)."""
    d = _t(spark, sf_dir, "documents")
    return sample_frames(synthesize_blobs(d), every_nth=2)


@register(
    "q192_audio_windows",
    oracle="""
    WITH s AS (
      SELECT doc_id, CAST((i - 1) // 1024 AS INTEGER) AS window_idx,
             (ascii(substr(text, CAST(i AS INTEGER), 1)) - 128) AS v
      FROM documents, UNNEST(range(1, length(text) + 1)) t(i)
    )
    SELECT doc_id, window_idx,
           CAST(count(*) AS BIGINT) AS n_samples,
           round(sqrt(sum(v * v) * 1.0 / count(*)), 6) AS rms,
           round(sqrt(sum(v * v) * 1.0 / count(*)), 6) < 20.0 AS is_silence
    FROM s GROUP BY doc_id, window_idx
    """,
)
def q192_audio_windows(spark, sf_dir):
    """'Audio' windowed energy + silence flags over the synthetic
    PCM payload (1024-sample windows) — the third modality beside
    q80/q81's image path and q82's video frames; see
    operators/multimodal.audio_windows. The oracle replays the exact
    byte-value arithmetic character-wise (payload is the utf-8
    text, ascii == byte for this corpus, the q82 convention)."""
    d = _t(spark, sf_dir, "documents")
    return audio_windows(synthesize_blobs(d))
