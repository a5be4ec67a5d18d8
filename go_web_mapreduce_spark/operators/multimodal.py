"""Multimodal columns: opaque binary payloads with typed metadata.

Pattern for a 100 TB training-data pipeline: media (image/audio/video) lives
as an opaque ``binary`` column plus a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched Pandas
iterators (``mapInPandas``) so bytes move in columnar batches and never
row-at-a-time.

The container has no image/audio codecs, so the *decode* step is stubbed:
``decode_media`` raises NotImplementedError by design, and
``extract_features`` uses a deterministic md5-derived fake "embedding" in its
place — the Spark-side plumbing (schema, batch iteration, partitioning,
output shape) is real and tested; swapping the fake for PIL/librosa is a
one-function change inside the batch loop.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_web_mapreduce_spark.functions.numeric import dsum
from go_web_mapreduce_spark.registry import query
from go_web_mapreduce_spark.sources.tables import load_table

FEATURE_DIM = 8

MEDIA_SCHEMA = (
    "doc_id bigint, payload binary, mime string, n_bytes bigint, source string"
)
FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, digest string, "
    f"features array<float>, source string"
)


def as_media_table(docs: DataFrame) -> DataFrame:
    """Wrap the documents table as a media table: payload = utf-8 bytes of
    the text (standing in for image/audio bytes), typed metadata columns."""
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.octet_length("text").alias("n_bytes"),
        "source",
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Decode the payload into pixels/samples. STUB: the runtime image/audio
    libraries are not available in this environment."""
    raise NotImplementedError(
        "media decode requires codec libraries (PIL/librosa/ffmpeg) not "
        "present in this container; extract_features uses a deterministic "
        "fake in its place"
    )


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Per-payload feature vector via Arrow-batched mapInPandas.

    The feature computation is a deterministic stand-in (md5-derived floats);
    the distributed shape — binary batches in, fixed-width float vectors
    out — is exactly what a real encoder plugs into.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats, digests, sizes = [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                digest = hashlib.md5(raw).hexdigest()
                digests.append(digest)
                sizes.append(len(raw))
                feats.append(
                    [
                        int(digest[4 * i : 4 * i + 4], 16) / 65535.0
                        for i in range(dim)
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": sizes,
                    "digest": digests,
                    "features": feats,
                    "source": pdf["source"],
                }
            )

    return media.select("doc_id", "payload", "source").mapInPandas(
        run, FEATURE_SCHEMA
    )


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT source, count(*) AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           count(DISTINCT md5(text)) AS n_unique_payloads
    FROM documents GROUP BY source
    """,
    description="binary-column metadata rollup: payload bytes + digest "
    "dedup per source (extension mandate: multimodal columns)",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = as_media_table(load_table(spark, sf_dir, "documents"))
    # md5 of the utf-8 payload == md5 of the text in both engines
    return media.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct(F.md5("payload")).alias("n_unique_payloads"),
    )


@query(
    "q_multimodal_features",
    # the stand-in features are md5-derived, so the pipeline is
    # SQL-expressible: f0 = int(md5[:4 hex], 16) / 65535.0. The checked
    # aggregate recomputes f0 in float64 from the digest — float32 array
    # cells don't round-trip to decimal identically across engines (their
    # float→decimal casts disagree in the 8th digit), so the array itself
    # is pinned feature-vs-digest-consistent in tests instead
    oracle="""
    SELECT source, count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique,
           CAST(sum(CAST(('0x' || substr(md5(text), 1, 4))::BIGINT / 65535.0
                         AS DECIMAL(18,8))) AS DOUBLE) AS sum_f0
    FROM documents GROUP BY source
    """,
    description="mapInPandas feature extraction over binary payloads "
    "(decode stubbed; Arrow batch plumbing real; the md5-derived stand-in "
    "features make even this pipeline hash-verifiable)",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = as_media_table(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    f0 = F.conv(F.substring("digest", 1, 4), 16, 10).cast("bigint") / F.lit(65535.0)
    return feats.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("digest").alias("n_unique"),
        dsum(f0, scale=8).alias("sum_f0"),
    )


RESIZED_SCHEMA = "doc_id bigint, thumb binary, width int, height int"
FRAME_SCHEMA = "doc_id bigint, frame_no int, frame binary, offset_bytes bigint"

FRAME_SIZE = 256  # bytes per fake "frame" slice of the payload


def resize_media(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Thumbnail/resample step: Arrow-batched 1→1 transform of binary
    payloads to fixed-size outputs.

    The pixel resample itself needs the stubbed decoder (decode_media), so
    the stand-in derives a deterministic width×height byte block from the
    payload digest; schema, batch iteration, and output sizing are the real
    plumbing a PIL/ffmpeg resize drops into.
    """
    if width <= 0 or height <= 0:
        raise ValueError("width and height must be positive")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        n_out = width * height
        for pdf in batches:
            thumbs = []
            for payload in pdf["payload"]:
                digest = hashlib.md5(bytes(payload)).digest()
                reps = -(-n_out // len(digest))  # ceil
                thumbs.append((digest * reps)[:n_out])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "width": width,
                    "height": height,
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling: the 1→N row-expanding shape (a video payload yields
    every ``every_n``-th frame as its own row) through mapInPandas — the
    pattern a real container demuxer plugs into. Frames here are contiguous
    FRAME_SIZE-byte slices of the payload (decode stubbed, see
    decode_media); offsets are real."""
    if every_n <= 0:
        raise ValueError("every_n must be positive")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_no": [], "frame": [], "offset_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                total = -(-len(raw) // FRAME_SIZE)  # ceil: number of frames
                for frame_no in range(0, total, every_n):
                    off = frame_no * FRAME_SIZE
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(frame_no)
                    out["frame"].append(raw[off : off + FRAME_SIZE])
                    out["offset_bytes"].append(off)
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


@query(
    "q_multimodal_frames",
    oracle=f"""
    SELECT count(*) AS n_frames,
           count(DISTINCT doc_id) AS n_docs,
           max(frame_no) AS max_frame_no
    FROM (
      SELECT doc_id,
             unnest(range(0, CAST(ceil(octet_length(encode(text)) / {FRAME_SIZE}.0) AS BIGINT), 4)) AS frame_no
      FROM documents
    )
    """,
    description="1→N frame sampling over binary payloads via mapInPandas "
    "(extension mandate: multimodal; demux stubbed, offsets/fan-out real)",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = as_media_table(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(media)
    return frames.agg(
        F.count("*").alias("n_frames"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.max("frame_no").alias("max_frame_no"),
    )


@query(
    "q_multimodal_resize",
    # the stand-in thumb is the payload digest tiled to width*height bytes,
    # so the rollup is exactly checkable: distinct thumbs == distinct
    # payload digests, and every thumb is exactly 32*32 bytes
    oracle="""
    SELECT count(*) AS n_thumbs,
           count(DISTINCT md5(text)) AS n_unique,
           CAST(count(*) * 1024 AS BIGINT) AS total_thumb_bytes
    FROM documents
    """,
    description="1→1 resize/thumbnail step over binary payloads via "
    "mapInPandas (decode stubbed; fixed-size output plumbing real) — "
    "extension mandate: multimodal resize",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = as_media_table(load_table(spark, sf_dir, "documents"))
    thumbs = resize_media(media, width=32, height=32)
    return thumbs.agg(
        F.count("*").alias("n_thumbs"),
        F.countDistinct("thumb").alias("n_unique"),
        F.sum(F.octet_length("thumb")).alias("total_thumb_bytes"),
    )
