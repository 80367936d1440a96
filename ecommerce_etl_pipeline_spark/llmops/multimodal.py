"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
struct of typed metadata, exactly like any other column — partitioning,
predicate pushdown on the metadata, and shuffles all work unchanged. The
compute-heavy steps (decode, feature-extract, resize, frame-sample) are
Arrow-batched pandas functions over ``mapInPandas`` so bytes move
column-wise, not row-wise.

The decode itself is STUBBED (no image/audio libs in this container): the
real entry points raise NotImplementedError behind ``require_codecs()``,
and a deterministic fake decoder stands in so the Spark-side plumbing —
schema, batch iteration, partition sizing — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Schema of a multimodal asset table: payload is opaque; metadata is typed
#: and filterable (predicate pushdown applies to these columns, never to
#: the payload bytes).
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image/audio/video
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("source", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("head_byte", IntegerType()),
        StructField("byte_checksum", LongType()),
    ]
)


def require_codecs() -> None:
    """Gate for real decoders — image/audio libraries are not available in
    this environment; the fake feature extractor below keeps the pipeline
    shape testable."""
    raise NotImplementedError(
        "media codecs (PIL/av/soundfile) are not installed in this container; "
        "use extract_features(fake=True) for plumbing tests"
    )


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Build an asset table from the documents fixture: utf-8 payload bytes
    stand in for encoded media. Demonstrates binary-column creation and
    typed-metadata derivation."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        "source",
    )


def extract_features(assets: DataFrame, *, fake: bool = True) -> DataFrame:
    """Per-asset feature extraction over mapInPandas (Arrow batches).

    With ``fake=True`` computes deterministic byte-level features (length,
    head byte, order-independent checksum); the real path would decode and
    embed here, with identical plumbing: batch in, batch out, no driver
    round-trip, parallelism = input partitions.
    """
    if not fake:
        require_codecs()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "head_byte": payloads.map(
                        lambda b: int(b[0]) if len(b) else -1
                    ).astype("int32"),
                    "byte_checksum": payloads.map(lambda b: int(sum(b))).astype("int64"),
                }
            )

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_offset", LongType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_frames(
    assets: DataFrame,
    *,
    frame_bytes: int = 64,
    every_nth: int = 4,
    fake: bool = True,
) -> DataFrame:
    """Frame sampling: one video asset row fans out to N frame rows — the
    1→N explode shape every video pipeline needs, through Arrow batches.

    The fake decoder treats the payload as fixed-size byte frames and keeps
    every ``every_nth`` one (a real one would demux + decode keyframes with
    identical plumbing). Output partitioning inherits the input's, so
    downstream per-frame work parallelizes without a shuffle.
    """
    if not fake:
        require_codecs()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [],
                "frame_index": [],
                "frame_offset": [],
                "frame_payload": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                n_frames = max(1, len(payload) // frame_bytes)
                for i in range(0, n_frames, every_nth):
                    off = i * frame_bytes
                    out["asset_id"].append(aid)
                    out["frame_index"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_payload"].append(bytes(payload[off : off + frame_bytes]))
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, FRAME_SCHEMA)


def resize(assets: DataFrame, *, target_bytes: int = 256, fake: bool = True) -> DataFrame:
    """Payload resize: binary -> binary transform preserving the asset
    schema (metadata updated to the new size). The fake path
    truncates/zero-pads to ``target_bytes``; a real one would re-encode at
    a target resolution with the same batch-in/batch-out shape.
    """
    if not fake:
        require_codecs()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(
                lambda b: bytes(b[:target_bytes]).ljust(target_bytes, b"\x00")
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload": resized,
                    "n_bytes": resized.map(len).astype("int64"),
                    "source": pdf["source"],
                }
            )

    return assets.mapInPandas(batches, ASSET_SCHEMA)
