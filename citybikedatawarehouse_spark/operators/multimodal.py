"""Multimodal column plumbing (north-star extension).

Images/audio/video ride through Spark as opaque ``binary`` columns
with typed metadata columns beside them; decode / feature-extract /
frame-sample run as Arrow-batched pandas functions over
``mapInPandas`` so bytes never round-trip through Python row-by-row.

This container ships no codec libraries (PIL/torchaudio/ffmpeg), so
the actual pixel/sample decode is STUBBED: ``decode_image`` parses
the deterministic FAKEIMG header and raises ``NotImplementedError``
from ``_decode_real_image`` if a real codec path is requested. The
Spark-side plumbing — schema, batch iteration, partition behavior,
UDF signatures — is real and tested; swapping the stub for PIL is a
one-function change.

Blob layout (synthesized deterministically from documents.text so
oracles can check the plumbing end-to-end):
  bytes 0-7   magic b"FAKEIMG1"
  bytes 8-9   width  (uint16 big-endian) = 64 + doc_id % 512
  bytes 10-11 height (uint16 big-endian) = 64 + doc_id % 384
  bytes 12-   payload (utf-8 text bytes; stands in for pixel data)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"FAKEIMG1"
HEADER_LEN = 12
FRAME_BYTES = 256


def synthesize_blobs(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, blob binary): deterministic fake image
    bytes. Pure column expressions: header assembled from the id,
    payload from the utf-8 text."""
    width = (F.lit(64) + F.col("doc_id") % 512).cast("int")
    height = (F.lit(64) + F.col("doc_id") % 384).cast("int")
    header = F.concat(
        F.lit(MAGIC),
        # uint16 big-endian via two bytes
        F.expr("unhex(lpad(hex(64 + doc_id % 512), 4, '0'))"),
        F.expr("unhex(lpad(hex(64 + doc_id % 384), 4, '0'))"),
    )
    return docs.select(
        "doc_id",
        F.concat(header, F.encode("text", "UTF-8")).alias("blob"),
        width.alias("meta_width"),
        height.alias("meta_height"),
    )


def _decode_real_image(blob: bytes):  # pragma: no cover - stub
    """Real codec path — requires PIL, absent in this environment."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode needs PIL; this environment ships none — "
            "the FAKEIMG header path below is the supported stub"
        ) from e
    raise NotImplementedError("real decode intentionally unimplemented")


DECODE_SCHEMA = (
    "doc_id long, width int, height int, payload_bytes long, is_fake_format boolean"
)


def decode_images(blobs: DataFrame) -> DataFrame:
    """Parse the header of each blob into typed metadata.
    mapInPandas: one pandas batch in, one out — no per-row Python."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf["blob"]
            is_fake = raw.map(lambda b: bytes(b[:8]) == MAGIC)
            width = raw.map(lambda b: int.from_bytes(bytes(b[8:10]), "big"))
            height = raw.map(lambda b: int.from_bytes(bytes(b[10:12]), "big"))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width.astype("int32"),
                    "height": height.astype("int32"),
                    "payload_bytes": raw.map(len).astype("int64") - HEADER_LEN,
                    "is_fake_format": is_fake,
                }
            )

    return blobs.mapInPandas(decode, schema=DECODE_SCHEMA)


FEATURE_SCHEMA = "doc_id long, payload_md5 string, byte_histogram array<bigint>"


def extract_features(blobs: DataFrame, n_bins: int = 16) -> DataFrame:
    """Deterministic 'feature extraction' over the payload bytes:
    md5 digest + a byte-value histogram (the stand-in for an image
    embedding; same mapInPandas shape a real model batch would use)."""
    import hashlib

    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["blob"].map(lambda b: bytes(b[HEADER_LEN:]))
            md5s = payloads.map(lambda p: hashlib.md5(p).hexdigest())
            hists = payloads.map(
                lambda p: np.bincount(
                    np.frombuffer(p, dtype=np.uint8) // (256 // n_bins),
                    minlength=n_bins,
                ).astype("int64").tolist()
            )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload_md5": md5s, "byte_histogram": hists}
            )

    return blobs.mapInPandas(feats, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes long, frame_md5 string"


def sample_frames(blobs: DataFrame, every_nth: int = 2) -> DataFrame:
    """'Video' frame sampling: split the payload into FRAME_BYTES
    chunks, keep every nth — a fan-out mapInPandas (rows out > rows
    in), the shape a real keyframe extractor would have.

    The fan-out index math (which doc each output frame belongs to,
    its chunk index, its byte length) is vectorized numpy over the
    whole Arrow batch; the only per-frame Python is the md5 call
    itself, as one flat comprehension over precomputed offsets."""
    import hashlib

    import numpy as np

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(b[HEADER_LEN:]) for b in pdf["blob"]]
            lens = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
            )
            n_chunks = -(-lens // FRAME_BYTES)  # ceil div
            kept = -(-n_chunks // every_nth)  # frames kept per doc
            doc_pos = np.repeat(np.arange(len(payloads)), kept)
            # chunk index within each doc: 0, n, 2n, ... — one global
            # arange re-based per doc, no per-doc loop
            starts = np.concatenate(([0], np.cumsum(kept)))
            frame_idx = (
                np.arange(starts[-1]) - np.repeat(starts[:-1], kept)
            ) * every_nth
            off = frame_idx * FRAME_BYTES
            frame_bytes = np.minimum(lens[doc_pos] - off, FRAME_BYTES)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[doc_pos],
                    "frame_idx": frame_idx.astype("int32"),
                    "frame_bytes": frame_bytes,
                    "frame_md5": [
                        hashlib.md5(payloads[d][o : o + FRAME_BYTES]).hexdigest()
                        for d, o in zip(doc_pos, off)
                    ],
                }
            )

    return blobs.mapInPandas(frames, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, window_idx int, n_samples long, rms double, "
    "is_silence boolean"
)

AUDIO_WINDOW = 1024
SILENCE_RMS = 20.0


def audio_windows(
    blobs: DataFrame,
    window: int = AUDIO_WINDOW,
    silence_rms: float = SILENCE_RMS,
) -> DataFrame:
    """'Audio' feature extraction: the payload bytes (header
    stripped) are treated as unsigned 8-bit PCM samples, split into
    fixed ``window``-sample frames, and each frame reports its RMS
    energy around the 128 midpoint plus a silence flag — the
    voice-activity-detection shape (windowed energy → keep/drop)
    that audio curation pipelines run before transcription. A real
    decoder (torchaudio/ffmpeg, absent here) would only replace the
    byte interpretation; the Spark-side plumbing — Arrow batches,
    fan-out schema, vectorized window math — is the production
    shape, mirroring sample_frames for video.

    Determinism: integer byte values, exact integer sums per window
    (≤ window·127² ≪ 2⁵³), one sqrt rounded at 1e-6 — replayable in
    the DuckDB oracle byte-for-byte.

    Scale shape: mapInPandas fan-out (rows out = ceil(bytes/window)
    per doc); per-window math is numpy over the whole batch; no
    shuffle at all — window features are scan-side."""
    import numpy as np
    import pandas as pd

    hdr = len(MAGIC) + 4

    def win(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, nsamp, rms = [], [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                payload = np.frombuffer(bytes(blob)[hdr:], dtype=np.uint8)
                n = len(payload)
                if n == 0:
                    continue
                x = payload.astype(np.int64) - 128
                n_win = -(-n // window)
                pad = n_win * window - n
                sq = np.pad(x * x, (0, pad)).reshape(n_win, window)
                lens = np.minimum(
                    n - np.arange(n_win, dtype=np.int64) * window, window
                )
                ids.extend([doc_id] * n_win)
                widx.extend(range(n_win))
                nsamp.extend(lens.tolist())
                rms.extend(
                    np.round(np.sqrt(sq.sum(axis=1) / lens), 6).tolist()
                )
            out = pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(widx, dtype="int32"),
                    "n_samples": pd.Series(nsamp, dtype="int64"),
                    "rms": pd.Series(rms, dtype="float64"),
                }
            )
            out["is_silence"] = out["rms"] < silence_rms
            yield out

    return blobs.select("doc_id", "blob").mapInPandas(win, AUDIO_SCHEMA)
