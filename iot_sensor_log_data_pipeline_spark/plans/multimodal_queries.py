"""Multimodal-column catalog queries (north star): binary media
columns with typed metadata; metadata stays oracle-checked, the
Arrow-batched feature/frame paths are rows-only (pandas-UDF output,
validated structurally in tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_utils import load, parallelize_small
from ..operators import multimodal as MM
from .catalog import register


@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           'image' AS kind,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "north-star"),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque media blobs: the query shape that
    must NEVER read the blob column (parquet prunes it away; only the
    metadata struct is scanned at 100 TB)."""
    media = MM.attach_fake_media(parallelize_small(load(spark, sf_dir, "documents")))
    return media.select(
        "doc_id",
        F.col("meta.kind").alias("kind"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.checksum").alias("checksum"),
    ).orderBy("doc_id")


@register(
    "multimodal_byte_histogram",
    oracle="""
    WITH codes AS (
      SELECT doc_id,
             length(text) AS n_bytes,
             list_transform(string_split(text, ''), c -> ascii(c)) AS cs
      FROM documents
    )
    SELECT codes.doc_id,
           codes.n_bytes,
           CAST(t.b AS INT) AS bin,
           CAST(len(list_filter(cs, c -> c // 16 = t.b)) AS DOUBLE)
             / codes.n_bytes AS ratio
    FROM codes, range(16) t(b)
    ORDER BY doc_id, bin
    """,
    tags=("multimodal", "north-star", "pandas-udf"),
)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary media via Arrow-batched
    ``mapInPandas`` (the stubbed-decode pipeline: real batching, fake
    features), exploded to one (doc, bin) row per histogram cell:
    external verifiers hash/sort the result frame, and a top-level
    array cell is unhashable there (the array form remains available
    via ``operators.multimodal.extract_features``).  Oracle re-derives
    the histogram from character codes (valid because the corpus text
    is pure ASCII; binary media with multibyte provenance keeps the
    rows-only path)."""
    media = MM.attach_fake_media(parallelize_small(load(spark, sf_dir, "documents")))
    feats = MM.extract_features(media)
    return feats.select(
        "doc_id", "n_bytes", F.posexplode("byte_hist").alias("bin", "ratio")
    ).orderBy("doc_id", "bin")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH base AS (SELECT doc_id, length(text) AS n FROM documents)
    SELECT doc_id, u.fid AS frame_id, u.fb AS frame_bytes FROM (
      SELECT doc_id,
             unnest(list_transform(
               list_filter(range((n + 63) // 64), f -> f % 4 = 0),
               f -> {'fid': CAST(f AS INT),
                     'fb': CAST(least(64, n - 64 * f) AS BIGINT)})) AS u
      FROM base
    )
    ORDER BY doc_id, frame_id
    """,
    tags=("multimodal", "north-star", "pandas-udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over 'video' blobs (every 4th fixed-size frame),
    one output row per kept frame."""
    media = MM.attach_fake_media(parallelize_small(load(spark, sf_dir, "documents")), kind="video")
    frames = MM.sample_frames(media, every_k=4)
    return frames.select(
        "doc_id", "frame_id", F.octet_length("frame").cast("long").alias("frame_bytes")
    ).orderBy("doc_id", "frame_id")


@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS orig_bytes,
           CAST((length(text) + 3) // 4 AS BIGINT) AS resized_bytes,
           md5(list_aggregate(
             list_transform(
               list_filter(range(length(text)), i -> i % 4 = 0),
               i -> text[i+1]),
             'string_agg', '')) AS resized_md5
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "north-star", "pandas-udf"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media resize plumbing (every-4th-byte downsample, the decode-free
    stand-in for decode->resize->re-encode): the oracle re-derives the
    resized bytes from character codes (ASCII corpus) and compares an
    md5 of the content, so the Arrow round-trip of binary columns is
    content-checked, not just counted."""
    media = MM.attach_fake_media(parallelize_small(load(spark, sf_dir, "documents")))
    resized = MM.resize_media(media, factor=4)
    return resized.select(
        "doc_id",
        "orig_bytes",
        "resized_bytes",
        F.md5("resized").alias("resized_md5"),
    ).orderBy("doc_id")


@register(
    "multimodal_phash_dedup",
    oracle="""
    WITH media AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS L
      FROM documents
    ),
    cells AS (
      SELECT doc_id,
             g.g,
             substring(hx, CAST((g.g * (L - 1)) // 71 AS BIGINT) * 2 + 1, 2) AS h
      FROM media CROSS JOIN range(72) g(g)
    ),
    bits AS (
      SELECT a.doc_id,
             (a.g // 9) * 8 + (a.g % 9) AS bit_idx,
             CASE WHEN a.h < b.h THEN '1' ELSE '0' END AS bit
      FROM cells a
      JOIN cells b ON b.doc_id = a.doc_id AND b.g = a.g + 1
      WHERE a.g % 9 < 8
    ),
    hashes AS (
      SELECT doc_id, string_agg(bit, '' ORDER BY bit_idx) AS phash
      FROM bits GROUP BY doc_id
    ),
    grouped AS (
      SELECT doc_id, phash,
             count(*) OVER (PARTITION BY phash) AS n_same_hash
      FROM hashes
    )
    SELECT doc_id, phash, CAST(n_same_hash AS BIGINT) AS n_same_hash
    FROM grouped
    ORDER BY doc_id
    """,
    tags=("multimodal", "dedup", "phash"),
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-free perceptual-hash dedup for media columns
    (``operators/multimodal.py:dhash64``): per-blob 64-bit dHash over
    evenly-sampled bytes, then an equal-hash window count -- blobs
    sharing a hash are near-dup candidates.  One scan + one hash-keyed
    window; the blob column is touched exactly once."""
    media = MM.attach_fake_media(parallelize_small(load(spark, sf_dir, "documents")))
    from pyspark.sql.window import Window

    hashed = media.select("doc_id", MM.dhash64("media").alias("phash"))
    return (
        hashed.withColumn(
            "n_same_hash",
            F.count(F.lit(1)).over(Window.partitionBy("phash")).cast("long"),
        )
        .orderBy("doc_id")
    )


@register(
    "multimodal_chunk_dedup",
    oracle="""
    WITH blobs AS (SELECT doc_id, text AS t FROM documents),
    per_blob AS (
      SELECT DISTINCT doc_id,
             md5(substring(t, CAST(s AS INT), 64)) AS chunk
      FROM blobs,
           LATERAL unnest(range(1, greatest(length(t) - 64 + 1, 1) + 1, 32))
             AS u(s)
    ),
    freq AS (SELECT chunk, count(*) AS blobs_with FROM per_blob GROUP BY chunk)
    SELECT p.doc_id,
           count(*) AS n_chunks,
           CAST(sum(CASE WHEN f.blobs_with > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           round(sum(CASE WHEN f.blobs_with > 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS dup_chunk_ratio
    FROM per_blob p JOIN freq f ON f.chunk = p.chunk
    GROUP BY p.doc_id
    ORDER BY p.doc_id
    """,
    tags=("multimodal", "north-star", "dedup", "chunks"),
)
def multimodal_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level duplicated-chunk dedup over media blobs
    (``operators/multimodal.py:chunk_dedup_stats``): 64-byte windows
    every 32 bytes, md5'd codec-free -- flags blobs sharing byte runs
    with other blobs (re-uploads, shared headers, embedded fragments).
    The oracle replays the chunking on the text the fake blobs encode
    (pure ASCII, so byte and character offsets coincide)."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    media = MM.attach_fake_media(docs)
    out = MM.chunk_dedup_stats(media)
    return out.select(
        "doc_id",
        "n_chunks",
        "n_dup_chunks",
        F.round("dup_chunk_ratio", 6).alias("dup_chunk_ratio"),
    ).orderBy("doc_id")


@register(
    "multimodal_byte_entropy",
    oracle="""
    WITH codes AS (
      SELECT doc_id,
             length(text) AS n_bytes,
             list_transform(string_split(text, ''), c -> ascii(c)) AS cs
      FROM documents
    ),
    hist AS (
      SELECT doc_id, n_bytes,
             list_transform(range(16),
                 b -> CAST(len(list_filter(cs, c -> c // 16 = b)) AS DOUBLE)
                        / n_bytes) AS h
      FROM codes
    )
    SELECT doc_id, n_bytes,
           round(list_sum(list_transform(h,
               r -> CASE WHEN r > 0 THEN -r * log2(r) ELSE 0.0 END)), 6)
             AS byte_entropy,
           (round(list_sum(list_transform(h,
               r -> CASE WHEN r > 0 THEN -r * log2(r) ELSE 0.0 END)), 6)
            >= 3.5) AS high_entropy
    FROM hist
    ORDER BY doc_id
    """,
    tags=("multimodal", "north-star", "entropy", "quality"),
)
def multimodal_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-entropy junk detector over binary media: Shannon entropy
    of the 16-bin byte histogram (``operators/multimodal.py:
    extract_features``' Arrow path).  Near-uniform byte usage
    (entropy -> 4 bits at 16 bins) marks compressed/encrypted blobs
    that masquerade as media -- the standard binary-quality gate of a
    multimodal ingest pipeline; plain text and real codecs' headers
    sit far lower.  The entropy fold is sequential over the bins on
    both engines, so values replay exactly.  ``high_entropy``
    thresholds the 1e-6-rounded entropy at 3.5 bits."""
    media = MM.attach_fake_media(parallelize_small(load(spark, sf_dir, "documents")))
    feats = MM.extract_features(media)
    ent = F.aggregate(
        F.col("byte_hist"),
        F.lit(0.0),
        lambda acc, r: acc
        + F.when(r > 0, -r * F.log2(r)).otherwise(F.lit(0.0)),
    )
    rounded = F.round(ent, 6)
    return feats.select(
        "doc_id",
        "n_bytes",
        rounded.alias("byte_entropy"),
        (rounded >= 3.5).alias("high_entropy"),
    ).orderBy("doc_id")


@register(
    "multimodal_type_sniff",
    oracle="""
    WITH typed AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN '\\x89\\x50\\x4E\\x47'::BLOB
               WHEN 1 THEN '\\xFF\\xD8\\xFF\\xE0'::BLOB
               WHEN 2 THEN '\\x47\\x49\\x46\\x38'::BLOB
               ELSE '\\x52\\x49\\x46\\x46'::BLOB
             END || encode(text) AS media,
             CASE (CASE WHEN doc_id % 20 = 0 THEN (doc_id % 4 + 1) % 4
                        ELSE doc_id % 4 END)
               WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
               WHEN 2 THEN 'gif' ELSE 'riff'
             END AS declared_kind
      FROM documents
    ),
    sniffed AS (
      SELECT declared_kind,
             CASE left(hex(media), 8)
               WHEN '89504E47' THEN 'png'
               WHEN 'FFD8FFE0' THEN 'jpeg'
               WHEN '47494638' THEN 'gif'
               WHEN '52494646' THEN 'riff'
               ELSE 'unknown'
             END AS sniffed_kind
      FROM typed
    )
    SELECT declared_kind, sniffed_kind,
           count(*) AS n_blobs,
           declared_kind <> sniffed_kind AS is_mismatch
    FROM sniffed
    GROUP BY declared_kind, sniffed_kind
    ORDER BY declared_kind, sniffed_kind
    """,
    tags=("multimodal", "north-star", "sniff", "governance"),
)
def multimodal_type_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-actual container audit
    (``operators/multimodal.py:sniff_media_type``): every blob's type
    re-derived from its own magic bytes (4-byte prefix compare, pure
    codegen, no decode) and cross-tabbed against the declared
    ``meta.kind`` -- the confusion matrix whose off-diagonal is the
    mislabeled-asset population (planted here on every 20th doc).
    The oracle rebuilds the same typed blobs and replays the sniff on
    the BYTES (left(hex(..), 8)), not the labels."""
    docs = parallelize_small(load(spark, sf_dir, "documents"))
    typed = MM.attach_typed_media(docs, mislabel_every=20)
    return (
        typed.select(
            F.col("meta.kind").alias("declared_kind"),
            MM.sniff_media_type(F.col("media")).alias("sniffed_kind"),
        )
        .groupBy("declared_kind", "sniffed_kind")
        .agg(F.count(F.lit(1)).cast("long").alias("n_blobs"))
        .withColumn(
            "is_mismatch", F.col("declared_kind") != F.col("sniffed_kind")
        )
        .orderBy("declared_kind", "sniffed_kind")
    )
