"""Multimodal decode plumbing: opaque binary payloads (here the IMG1
toy format — magic + big-endian dims header + pixel grid) carried as a
BinaryType column and decoded in an Arrow-batched mapInPandas stage
with numpy.  The same shape plugs in PIL/torchaudio by replacing
`decode_image_grid`; payload bytes never touch the driver.  Decode is
the slow path (~16× slower than JVM-side digests at 5 M payloads,
SCALE.md round-13) — filter scan-side first, decode LAST.

Run:  python examples/13_multimodal_decode.py [sf_dir]
"""
import sys

import pandas as pd
from pyspark.sql import functions as F

from pyspark_analytics_library_spark import load_tables
from pyspark_analytics_library_spark.operators.multimodal import decode_image_grid


def main(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    # Encode scan-side (pure JVM expressions): dims from md5 hex chars,
    # pixels = the hex digest cycled to width*height ASCII bytes.
    hx = F.md5(F.encode(F.col("text"), "utf-8"))
    w = (F.lit(8) + F.conv(F.substring(hx, 2, 1), 16, 10).cast("int")).alias("w")
    h = (F.lit(8) + F.conv(F.substring(hx, 4, 1), 16, 10).cast("int")).alias("h")
    px = F.substring(F.repeat(F.col("hx"), 17), F.lit(1), F.col("w") * F.col("h"))
    payloads = (
        docs.select("doc_id", hx.alias("hx"), w, h)
        .select(
            "doc_id",
            F.concat(
                F.encode(F.lit("IMG1"), "utf-8"),
                F.unhex(F.lpad(F.hex(F.col("w")), 4, "0")),
                F.unhex(F.lpad(F.hex(F.col("h")), 4, "0")),
                F.encode(px, "utf-8"),
            ).alias("payload"),
        )
    )

    def decode(batches):
        for pdf in batches:
            rows = [decode_image_grid(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "px_sum": [r[4] for r in rows],
                }
            )

    decoded = payloads.mapInPandas(
        decode, "doc_id long, width int, height int, px_sum long"
    )
    return decoded.agg(
        F.count(F.lit(1)).alias("n_images"),
        F.min("width").alias("min_w"),
        F.max("height").alias("max_h"),
        F.sum("px_sum").alias("total_px_value"),
    )


if __name__ == "__main__":
    from pyspark_analytics_library_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(get_spark(cores=4), sf).show()
