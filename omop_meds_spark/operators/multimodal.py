"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns next to typed metadata
(media_type, width/height/duration, codec). Everything Spark-side — schema,
partitioning, Arrow batch shape, UDF signatures — is real and tested; the
actual byte decoding is STUBBED because no image/audio libraries exist in
this container:

* ``decode_stub=True`` (default in tests) runs a deterministic fake decoder
  (metadata derived from the payload bytes themselves) so the distributed
  plumbing is exercised end-to-end with verifiable outputs.
* ``decode_stub=False`` raises ``NotImplementedError`` at the decode step
  with a note naming the real implementation point (PIL/libav inside the
  same ``mapInPandas`` body — per-batch, vectorized, identical schema).

Scale notes: media payloads dominate row size, so the iterator form of
``mapInPandas`` is used — batches stream through Python with bounded
memory (``spark.sql.execution.arrow.maxRecordsPerBatch`` controls batch
rows). Feature extraction keys nothing — it is embarrassingly parallel and
shuffle-free; frame sampling emits 0..n rows per input row (allowed by
mapInPandas), which a downstream ``repartition`` can rebalance.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_sha256", StringType()),
    ]
)

_STUB_NOTE = (
    "real decoder not available in this container — plug PIL/imageio/libav "
    "here, same mapInPandas body, same output schema"
)


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: dims derived from the payload digest."""
    d = hashlib.sha256(payload).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240


def decode_media(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """binary payload → typed metadata row, one per media item."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(_STUB_NOTE)
            payloads = pdf["payload"]
            dims = [_fake_dims(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.str.len().astype("int64"),
                    "sha256": [hashlib.sha256(bytes(p)).hexdigest() for p in payloads],
                    "width": pd.Series([w for w, _ in dims], dtype="int64"),
                    "height": pd.Series([h for _, h in dims], dtype="int64"),
                }
            )

    return df.mapInPandas(body, DECODED_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8,
                  decode_stub: bool = True) -> DataFrame:
    """Frame sampling: 0..max_frames output rows per input row (video →
    frame rows). The stub 'samples' a digest per payload byte-window."""

    def body(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(_STUB_NOTE)
            ids, idxs, shas = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n = min(max_frames, max(1, len(b) // every_n_bytes))
                for i in range(n):
                    window = b[i * every_n_bytes : (i + 1) * every_n_bytes]
                    ids.append(int(mid))
                    idxs.append(i)
                    shas.append(hashlib.sha256(window).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_sha256": pd.Series(shas, dtype="object"),
                }
            )

    return df.mapInPandas(body, FRAME_SCHEMA)


def media_from_documents(docs: DataFrame, ascii_safe: bool = False) -> DataFrame:
    """Adapter: treat document text bytes as opaque media payloads (the
    testdata has no true binary column; the plumbing is payload-agnostic).

    ``ascii_safe=True`` replaces every non-printable-ASCII character with
    ``?`` before encoding, so byte offsets == character offsets and byte-
    window operators (frame sampling) admit an exact SQL oracle
    (``substr`` windows). Caveat: Java regex negated classes match per
    UTF-16 code unit, so an astral character would become two ``?`` where
    a codepoint engine yields one — irrelevant for BMP text, documented
    for parity."""
    text = F.col("text")
    if ascii_safe:
        text = F.regexp_replace(text, r"[^\x20-\x7E]", "?")
    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
        F.encode(text, "UTF-8").alias("payload"),
    )
