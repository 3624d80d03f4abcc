"""Multimodal columns (SURVEY.md §2.14 + LLM-pipeline multimodal ops).

No real image/audio fixtures exist (and no decode libs in this
container), so the *payload* is opaque ``BinaryType`` built from text —
but the Spark-side plumbing is the real thing: binary columns carried
through joins/filters, typed metadata structs, frame-sampling fan-out,
and a mapInPandas decode stage with the library call stubbed behind a
deterministic fake (clearly marked).  At 100 TB, binary payloads ride
the same columnar scan as everything else; decode stages are
mapInPandas over Arrow batches with payload bytes never touching the
driver.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_analytics_library_spark.registry import query
from pyspark_analytics_library_spark.sources.io import load_tables

#: Set to a real decoder (e.g. PIL.Image.open) where available.  The
#: container has no image/audio libs, so decode is STUBBED — the Spark
#: plumbing (schema, batching, partitioning) is real and tested.
REAL_DECODE_AVAILABLE = False


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: pretend the first bytes encode
    (width, height).  Raises if someone expects a real decoder."""
    if REAL_DECODE_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("plug a real decoder here (PIL/torchaudio/...)")
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


@query(
    "mm_binary_passthrough",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS INT) AS byte_len,
           md5(text) AS payload_md5,
           lang
    FROM documents
    WHERE octet_length(CAST(text AS BLOB)) > 150
    """,
)
def q_mm_binary_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BinaryType payload attached, filtered on byte length, integrity
    verified via md5 over the *bytes* (hex-identical across engines)."""
    t = load_tables(spark, sf_dir)
    payload = F.encode(F.col("text"), "utf-8")
    return (
        t["documents"]
        .select("doc_id", payload.alias("payload"), "lang")
        .filter(F.octet_length(F.col("payload")) > 150)
        .select(
            "doc_id",
            F.octet_length(F.col("payload")).alias("byte_len"),
            F.md5(F.col("payload")).alias("payload_md5"),
            "lang",
        )
    )


@query(
    "mm_struct_bundle",
    oracle="""
    SELECT d.doc_id,
           (struct_pack(lang := d.lang, n_chars := d.n_chars,
                        dim := array_length(e.embedding))).lang AS lang,
           CAST((struct_pack(lang := d.lang, n_chars := d.n_chars,
                        dim := array_length(e.embedding))).dim AS INT) AS emb_dim,
           d.n_chars AS n_chars
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def q_mm_struct_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text + embedding + metadata bundled into one struct column and
    selected back out (flattened before compare — §2.14)."""
    t = load_tables(spark, sf_dir)
    joined = t["documents"].join(
        t["embeddings"], F.col("doc_id") == F.col("vec_id")
    )
    bundle = F.struct(
        F.col("lang").alias("lang"),
        F.col("n_chars").alias("n_chars"),
        F.size(F.col("embedding")).alias("dim"),
    )
    return joined.select(
        "doc_id",
        bundle.getField("lang").alias("lang"),
        bundle.getField("dim").alias("emb_dim"),
        bundle.getField("n_chars").alias("n_chars"),
    )


@query(
    "mm_decode_batch",
    oracle="""
    WITH h AS (
        SELECT doc_id,
               strpos('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS n1,
               strpos('0123456789abcdef', substring(md5(text), 2, 1)) - 1 AS n2,
               strpos('0123456789abcdef', substring(md5(text), 3, 1)) - 1 AS n3,
               strpos('0123456789abcdef', substring(md5(text), 4, 1)) - 1 AS n4
        FROM documents
    )
    SELECT doc_id,
           CAST(64 + (n1 * 16 + n2) % 192 AS INT) AS width,
           CAST(64 + (n3 * 16 + n4) % 192 AS INT) AS height
    FROM h
    """,
)
def q_mm_decode_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode/feature-extract stage: binary payloads → (width,
    height) metadata via mapInPandas.  Real Arrow batch plumbing; the
    decoder itself is the deterministic stub above.

    Full oracle (upgraded from rows-only in round 5): the stub derives
    (width, height) from the first two md5 digest bytes of the payload,
    and DuckDB's md5 over the same UTF-8 bytes is hex-identical
    (mm_binary_passthrough already leans on this), so the oracle
    recomputes the digest bytes from the hex string — verifying the
    whole mapInPandas decode path end-to-end, not just that it ran.
    Swapping in a REAL decoder returns this query to rows-only."""
    t = load_tables(spark, sf_dir)
    src = t["documents"].select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def decode(batches):
        for pdf in batches:
            dims = [decode_image_stub(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return src.mapInPandas(decode, "doc_id long, width int, height int")


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(0, 3)) AS INT) AS frame_idx,
           md5(text || ':' || CAST(unnest(range(0, 3)) AS INT)) AS frame_fingerprint
    FROM documents
    WHERE doc_id < 100
    """,
)
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: fan each 'video' row out to N frame
    rows (sequence + posexplode) with a deterministic per-frame
    fingerprint — the shape a real frame extractor plugs into."""
    t = load_tables(spark, sf_dir)
    frames = F.sequence(F.lit(0), F.lit(2))
    return (
        t["documents"]
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text", F.explode(frames).alias("frame_idx"))
        .select(
            "doc_id",
            "frame_idx",
            F.md5(F.concat(F.col("text"), F.lit(":"), F.col("frame_idx").cast("string"))).alias(
                "frame_fingerprint"
            ),
        )
    )


@query(
    "mm_payload_digest",
    oracle="""
    SELECT doc_id,
           md5(text) AS payload_md5,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def q_mm_payload_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integrity digests over a binary payload column — the manifest
    step of a multimodal ingest (dedupe/verify assets before the
    expensive decode).  The payload is the utf-8 encoding of the text
    (the fixture's stand-in for image bytes); md5 and byte length are
    computed ON THE BINARY, scan-side, no Python.  DuckDB's md5(VARCHAR)
    hashes the same utf-8 bytes, so this multimodal row is fully
    oracled — unlike the decode path, which is stubbed by necessity."""
    t = load_tables(spark, sf_dir)
    payload = F.encode(F.col("text"), "utf-8")
    return t["documents"].select(
        "doc_id",
        F.md5(payload).alias("payload_md5"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )
