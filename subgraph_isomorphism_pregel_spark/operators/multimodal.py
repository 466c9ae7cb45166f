"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns; decode/feature-extraction run
as Arrow-batched pandas UDFs over mapInPandas. The decode libraries are not
available in this environment, so the decode step is STUBBED: a clearly
marked deterministic fake (metadata derived from the bytes themselves) with
``real_decode=True`` raising NotImplementedError. The Spark-side plumbing —
schema, partitioning, UDF signature, batch shape — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, width int, height int, format string"
)


def attach_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test/demo helper: (media_id, payload binary) from a text table."""
    return docs.select(
        F.col(id_col).alias("media_id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def extract_media_meta(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """payload binary -> typed metadata via Arrow-batched mapInPandas.

    Fake decode: width/height are the first two bytes of sha256(payload)
    (deterministic); format from a magic-byte sniff. real_decode=True is the
    hook where PIL/ffmpeg would go — not available here."""

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/ffmpeg, not present in this env"
                )
            rows = []
            for mid, payload in zip(pdf["media_id"].values, pdf["payload"].values):
                b = bytes(payload)
                digest = hashlib.sha256(b).digest()
                fmt = "png" if b[:4] == b"\x89PNG" else ("jpg" if b[:2] == b"\xff\xd8" else "raw")
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(b),
                        "sha256": digest.hex(),
                        "width": 1 + digest[0],
                        "height": 1 + digest[1],
                        "format": fmt,
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(meta, MEDIA_META_SCHEMA)


def frame_sample(media: DataFrame, frame_bytes: int = 64, stride: int = 2) -> DataFrame:
    """Chunk each payload into fixed-size 'frames' and keep every `stride`-th
    one — the plumbing shape of video frame sampling (explode with typed
    binary output), done JVM-side with array expressions."""
    n_frames = F.ceil(F.length("payload") / frame_bytes).cast("int")
    frames = F.expr(
        f"transform(sequence(0, greatest(ceil(length(payload)/{frame_bytes})-1, 0)),"
        f" i -> struct(i as frame_no, substring(payload, i*{frame_bytes}+1, {frame_bytes}) as frame))"
    )
    return (
        media.select("media_id", F.explode(frames).alias("f"))
        .select("media_id", F.col("f.frame_no").cast("int").alias("frame_no"), F.col("f.frame"))
        .where(F.col("frame_no") % stride == 0)
    )
