"""Multimodal plumbing tests: blob layout, decode metadata, feature
histogram vs an independent computation, frame fan-out shape, and the
explicit codec stub."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from citybikedatawarehouse_spark.operators.multimodal import (
    FRAME_BYTES,
    HEADER_LEN,
    MAGIC,
    _decode_real_image,
    decode_images,
    extract_features,
    sample_frames,
    synthesize_blobs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "tiny"),
        (7, "x" * 300),           # 2 frames
        (600, "hello world " * 60),  # id wraps the width modulus
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_blob_layout(spark, docs):
    blobs = {r["doc_id"]: bytes(r["blob"]) for r in synthesize_blobs(docs).collect()}
    for doc_id, blob in blobs.items():
        assert blob[:8] == MAGIC
        assert int.from_bytes(blob[8:10], "big") == 64 + doc_id % 512
        assert int.from_bytes(blob[10:12], "big") == 64 + doc_id % 384
    assert blobs[0][HEADER_LEN:] == b"tiny"


def test_decode_metadata(docs):
    rows = {r["doc_id"]: r for r in decode_images(synthesize_blobs(docs)).collect()}
    assert rows[600]["width"] == 64 + 600 % 512
    assert rows[600]["height"] == 64 + 600 % 384
    assert rows[7]["payload_bytes"] == 300
    assert all(r["is_fake_format"] for r in rows.values())


def test_feature_histogram_matches_numpy(docs):
    got = {r["doc_id"]: r for r in extract_features(synthesize_blobs(docs)).collect()}
    payload = b"x" * 300
    want_hist = np.bincount(
        np.frombuffer(payload, dtype=np.uint8) // 16, minlength=16
    ).tolist()
    assert got[7]["byte_histogram"] == want_hist
    assert got[7]["payload_md5"] == hashlib.md5(payload).hexdigest()


def test_frame_fanout(docs):
    frames = sample_frames(synthesize_blobs(docs), every_nth=2).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 300 bytes -> frames 0,1 -> sampled {0}
    assert [r["frame_idx"] for r in by_doc[7]] == [0]
    assert by_doc[7][0]["frame_bytes"] == FRAME_BYTES
    # 720 bytes -> frames 0,1,2 -> sampled {0, 2}
    assert sorted(r["frame_idx"] for r in by_doc[600]) == [0, 2]
    # tiny doc -> single short frame
    assert by_doc[0][0]["frame_bytes"] == 4


def test_real_codec_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        _decode_real_image(b"\x89PNG....")


def test_audio_windows_planted(spark):
    """A constant-byte payload has an exactly computable RMS; a
    payload of 128-valued bytes is perfect silence (rms 0)."""
    from pyspark.sql import functions as F

    from citybikedatawarehouse_spark.operators.multimodal import (
        MAGIC,
        audio_windows,
    )

    loud = bytes(MAGIC) + b"\x00\x00\x00\x00" + bytes([228]) * 1500
    quiet = bytes(MAGIC) + b"\x00\x00\x00\x00" + bytes([128]) * 100
    df = spark.createDataFrame(
        [(1, bytearray(loud)), (2, bytearray(quiet))],
        "doc_id long, blob binary",
    )
    rows = {(r["doc_id"], r["window_idx"]): r for r in audio_windows(df).collect()}
    assert rows[(1, 0)]["n_samples"] == 1024 and rows[(1, 1)]["n_samples"] == 476
    assert rows[(1, 0)]["rms"] == 100.0  # |228-128| constant
    assert rows[(1, 1)]["rms"] == 100.0
    assert not rows[(1, 0)]["is_silence"]
    assert rows[(2, 0)]["rms"] == 0.0 and rows[(2, 0)]["is_silence"]
