"""binaryFile source: raw media ingestion for the multimodal pipeline.

The multimodal operators (§2.G) consume ``binary`` payload columns
from the embeddings/documents parquet; this source is where such
columns COME FROM in a real pipeline — a directory tree of image/
audio/video files read by Spark's built-in ``binaryFile`` format into
``(path, modificationTime, length, content: binary)`` rows, ready for
the Arrow-batched feature kernels (operators/multimodal.py).

Scale notes: binaryFile is a proper FileFormat — it splits listing
across the cluster, prunes by ``pathGlobFilter`` BEFORE reading bytes,
and (like any file source) parallelizes by files. Two knobs matter at
100 TB of media: (a) ``spark.sql.files.maxPartitionBytes`` does NOT
split individual binary files (one file = one row, whole), so
many-small-files layouts need compaction upstream or
``repartition`` after load to even out Python-stage batches;
(b) filters on path/length/modificationTime are pushed down — gate on
``length`` early to skip decoding oversized payloads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Read a directory of opaque files as (file_name, length, content).

    ``glob`` (e.g. ``*.jpg``) prunes at listing time — unmatched files
    are never opened. ``max_bytes`` drops oversized payloads by the
    pushed-down length column before bytes reach any kernel."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        "length",
        "content",
    )


def write_payload_fixtures(dirpath: str, payloads: dict[str, bytes]) -> None:
    """Test helper: materialize named binary payloads as files."""
    os.makedirs(dirpath, exist_ok=True)
    for name, blob in payloads.items():
        with open(os.path.join(dirpath, name), "wb") as f:
            f.write(blob)
