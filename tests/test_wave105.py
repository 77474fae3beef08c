"""Wave-105 operators: magic-byte MIME sniffing."""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_vector_spark.operators import multimodal as MM


def test_sniff_classifies_planted_magic_bytes(spark):
    rows = [
        (1, bytes([0x89]) + b"PNG\r\n\x1a\n" + b"x" * 16, "image/png"),
        (2, bytes([0xFF, 0xD8, 0xFF, 0xE0]) + b"JFIF" + b"x" * 16, "image/jpeg"),
        (3, b"GIF89a" + b"x" * 16, "image/gif"),
        (4, b"%PDF-1.7 rest", "application/pdf"),
        (5, b"RIFF....WAVE", "riff/container"),
        (6, b"OggS junk", "audio/ogg"),
        (7, b"plain words here", "text/plain"),
        (8, bytes([0x00, 0x01, 0x02, 0x03]) + b"junk", "application/octet-stream"),
        (9, b"ab", "application/octet-stream"),  # shorter than 4 bytes
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p, _ in rows], "doc_id long, payload binary"
    )
    got = {
        r["doc_id"]: r["sniffed"]
        for r in df.select(
            "doc_id", MM.sniff_mime("payload").alias("sniffed")
        ).collect()
    }
    for i, _, want in rows:
        assert got[i] == want, (i, got[i], want)


def test_mime_sniff_audit_shares_sum_to_one(spark, sf_dir):
    from simple_vector_spark.sources.loaders import load_table

    out = MM.mime_sniff_audit(load_table(spark, sf_dir, "documents")).collect()
    assert abs(sum(r["share"] for r in out) - 1.0) < 1e-4
    # fixture payloads are UTF-8 text declared octet-stream: every cell
    # disagrees with the declared label by construction
    assert all(not r["agrees"] for r in out if r["sniffed_mime"] == "text/plain")
