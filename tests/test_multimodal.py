"""Multimodal plumbing tests: binary columns, metadata structs, and the
Arrow-batched mapInPandas feature/frame paths (stubbed codecs, real
Spark mechanics)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from iot_sensor_log_data_pipeline_spark.operators import multimodal as MM


@pytest.fixture
def docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "a" * 200), (3, "mixed 123 !?")],
        "doc_id long, text string",
    )


def test_attach_fake_media_metadata(spark, docs):
    media = MM.attach_fake_media(docs)
    rows = {r["doc_id"]: r for r in media.collect()}
    assert bytes(rows[1]["media"]) == b"hello world"
    assert rows[1]["meta"]["n_bytes"] == 11
    assert rows[1]["meta"]["kind"] == "image"
    assert rows[1]["meta"]["checksum"] == hashlib.md5(b"hello world").hexdigest()


def test_extract_features_histogram(spark, docs):
    feats = {r["doc_id"]: r for r in MM.extract_features(MM.attach_fake_media(docs)).collect()}
    assert feats[2]["n_bytes"] == 200
    hist = feats[2]["byte_hist"]
    assert len(hist) == MM.N_HIST_BINS
    # 'a' == 0x61 -> bin 6; all mass in one bin.
    assert hist[0x61 * MM.N_HIST_BINS // 256] == 1.0
    assert abs(sum(feats[1]["byte_hist"]) - 1.0) < 1e-6


def test_sample_frames_chunking(spark, docs):
    frames = MM.sample_frames(MM.attach_fake_media(docs, kind="video"), every_k=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 2: 200 bytes -> 4 frames of 64 -> keep frames 0, 2.
    assert sorted(f["frame_id"] for f in by_doc[2]) == [0, 2]
    f0 = next(f for f in by_doc[2] if f["frame_id"] == 0)
    assert len(bytes(f0["frame"])) == MM.FRAME_BYTES
    # doc 1: 11 bytes -> 1 frame, kept.
    assert [f["frame_id"] for f in by_doc[1]] == [0]


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG...")


def test_metadata_query_prunes_blob_column(spark, docs, tmp_path):
    # The scale property: metadata-only scans must not read the blob.
    import contextlib
    import io

    path = str(tmp_path / "media")
    MM.attach_fake_media(docs).write.mode("overwrite").parquet(path)
    scan = spark.read.parquet(path).select("doc_id", "meta.n_bytes")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        scan.explain(mode="formatted")
    read_schema = buf.getvalue().split("ReadSchema")[-1]
    assert "media" not in read_schema and "n_bytes" in read_schema


def test_sniff_media_type_reads_bytes_not_labels(spark):
    """The sniffer classifies from the blob's own magic prefix:
    planted mislabels surface as off-diagonal cells, a truncated/alien
    prefix sniffs unknown, and correct blobs sit on the diagonal."""
    from pyspark.sql import functions as F

    from iot_sensor_log_data_pipeline_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(i, f"payload {i}") for i in range(40)], "doc_id long, text string"
    )
    typed = MM.attach_typed_media(docs, mislabel_every=20)
    rows = typed.select(
        "doc_id",
        F.col("meta.kind").alias("declared"),
        MM.sniff_media_type(F.col("media")).alias("sniffed"),
    ).collect()
    kinds = [k for k, _ in MM.MAGIC_SIGNATURES]
    for r in rows:
        assert r["sniffed"] == kinds[r["doc_id"] % 4]  # bytes, not label
        if r["doc_id"] % 20 == 0:
            assert r["declared"] != r["sniffed"]
        else:
            assert r["declared"] == r["sniffed"]
    # alien bytes -> unknown
    alien = spark.createDataFrame([(b"NOPE not a container",)], "media binary")
    assert alien.select(
        MM.sniff_media_type(F.col("media")).alias("k")
    ).head()["k"] == "unknown"


def test_cdc_chunking_survives_insertion_where_fixed_windows_fail(spark):
    """A 5-byte prefix insertion shifts every fixed-stride window (the
    fixed-chunk dup ratio collapses) but content-defined boundaries
    re-synchronize (the CDC dup ratio stays high) -- the property CDC
    exists for.  Identical blobs still dedup fully under both."""
    import numpy as np

    from pyspark.sql import functions as F

    from iot_sensor_log_data_pipeline_spark.operators import multimodal as MM

    rng = np.random.default_rng(9)
    base = bytes(rng.integers(0, 256, 4096, dtype=np.uint8))
    rows = [
        (1, bytearray(base)),
        (2, bytearray(base)),                      # exact twin
        (3, bytearray(b"XYZAB" + base)),           # 5-byte insertion
        (4, bytearray(bytes(rng.integers(0, 256, 4096, dtype=np.uint8)))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")

    cdc = {
        r["doc_id"]: r["dup_chunk_ratio"]
        for r in MM.cdc_chunk_stats(df, avg_bits=6, min_chunk=16,
                                    max_chunk=256).collect()
    }
    fixed = {
        r["doc_id"]: r["dup_chunk_ratio"]
        for r in MM.chunk_dedup_stats(df, chunk=64, stride=64).collect()
    }
    # exact twins: fully duplicated under both schemes
    assert cdc[1] == 1.0 and fixed[1] == 1.0
    # shifted copy: CDC re-synchronizes, fixed windows all miss
    assert cdc[3] > 0.8, cdc
    assert fixed[3] < 0.1, fixed
    # unrelated blob: clean under both
    assert cdc[4] == 0.0 and fixed[4] == 0.0


def test_pixel_decode_gated_on_pillow(spark):
    """Skip-or-assert gate (the avro/delta pattern): without Pillow the
    real-decode entry points raise a clear NotImplementedError at plan
    construction; with it, a generated PNG round-trips through
    decode_image + extract_pixel_stats with exact dims and channel
    means."""
    df = spark.createDataFrame(
        [(1, bytearray(b"not-an-image"))], "doc_id long, media binary"
    )
    if not MM._HAS_PIL:
        with pytest.raises(NotImplementedError, match="Pillow"):
            MM.decode_image(b"\x89PNG")
        with pytest.raises(NotImplementedError, match="Pillow"):
            MM.extract_pixel_stats(df)
        return

    import io

    import numpy as np
    from PIL import Image

    arr = np.zeros((4, 6, 3), dtype=np.uint8)
    arr[:, :, 0] = 200  # solid-ish red with a gradient in green
    arr[:, :, 1] = np.arange(6, dtype=np.uint8)[None, :] * 10
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    png = buf.getvalue()

    decoded = MM.decode_image(png)
    assert decoded.shape == (4, 6, 3)
    assert (decoded == arr).all()

    media = spark.createDataFrame(
        [(7, bytearray(png))], "doc_id long, media binary"
    )
    row = MM.extract_pixel_stats(media).collect()[0]
    assert (row["width"], row["height"]) == (6, 4)
    assert row["mean_r"] == 200.0
    assert abs(row["mean_g"] - float(arr[:, :, 1].mean())) < 1e-9
    assert row["mean_b"] == 0.0
