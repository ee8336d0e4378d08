"""Media asset ingestion via Spark's ``binaryFile`` source.

A real 100 TB multimodal corpus arrives as FILES in object storage
(s3://bucket/images/...), not as rows in a table. Spark's built-in
``binaryFile`` format reads them distributed — each file becomes a
row (path, modificationTime, length, content) with the bytes read
executor-side, never through the driver — and it participates in
file-source streaming, so a landing bucket can be tailed with the
same checkpoint/exactly-once machinery as the article JSON stream
(sources/json_ingest.py).

This module normalizes that into the repo's media frame: asset_id =
file name, media_type/mime inferred from the EXTENSION (a pure
Catalyst expression — magic-based sniffing happens downstream in
decode_media's dispatch, which trusts bytes, not names; a .png file
full of JPEG bytes still decodes correctly there). ``pathGlobFilter``
pushes the extension filter into file listing, so a mixed bucket
never ships non-media bytes to executors.

Scale shape: listing parallelizes via the driver's file index (the
same machinery parquet uses); payload bytes are read in the scan,
one task per file group. ``maxFilesPerTrigger`` paces the streaming
variant exactly like the article replay harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# extension -> (media_type, mime); lowercase keys
_EXT = {
    "bmp": ("image", "image/bmp"),
    "png": ("image", "image/png"),
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "gif": ("image", "image/gif"),
    "webp": ("image", "image/webp"),
    "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"),
    "flac": ("audio", "audio/flac"),
    "avi": ("video", "video/avi"),
    "mp4": ("video", "video/mp4"),
    "mkv": ("video", "video/x-matroska"),
    "webm": ("video", "video/webm"),
}


def _normalize(df: DataFrame) -> DataFrame:
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1))
    mt = F.lit(None).cast("string")
    mime = F.lit(None).cast("string")
    # build a chained CASE from the small static map (JVM-side; no UDF)
    for e, (m, mm) in _EXT.items():
        mt = F.when(ext == e, F.lit(m)).otherwise(mt)
        mime = F.when(ext == e, F.lit(mm)).otherwise(mime)
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("asset_id"),
        mt.alias("media_type"),
        mime.alias("mime"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("modified_at"),
        F.col("content").alias("payload"),
    )


def read_media(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """Batch-read a directory/bucket of media files into the media
    frame. ``glob`` (e.g. ``*.{jpg,png}``) is pushed into file
    listing via pathGlobFilter — unmatched files are never opened."""
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return _normalize(r.load(path))


def read_media_stream(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming variant: tail a landing directory of media files.
    File-source semantics give exactly-once per file under a
    checkpoint (same contract as the article JSON stream);
    ``max_files_per_trigger`` paces replay for tests and backfills."""
    # streaming file sources require an explicit schema; binaryFile's
    # is fixed by the format
    r = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, "
        "length long, content binary"
    )
    if glob:
        r = r.option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return _normalize(r.load(path))
