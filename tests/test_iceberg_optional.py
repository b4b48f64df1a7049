"""S7/S8 Iceberg proper — exercised when an Iceberg runtime is present,
skipped (not silently dropped) when it is not.

The stage tables ship as parquet with a ``pbucket = crc32(url) % N``
column — the documented analog of Iceberg's ``bucket(N, url)`` partition
transform (plans/pipeline.py:5-9).  This test performs the actual
``writeTo(...).partitionedBy(bucket(N, url))`` swap; the sandbox has no
Iceberg jars, so it skips with an explicit reason rather than pretending
coverage."""

import pytest
from pyspark.sql import functions as F


def test_iceberg_bucket_partitioned_write_or_skip(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"https://x/{i}", f"t{i}") for i in range(20)],
        "url string, text string")
    try:
        (df.writeTo("ice.db.docs_stage")
         .using("iceberg")
         .partitionedBy(F.bucket(8, F.col("url")))
         .createOrReplace())
    except Exception as exc:  # no Iceberg catalog/jars in this sandbox
        msg = str(exc).lower()
        assert ("catalog" in msg or "iceberg" in msg
                or "not found" in msg), f"unexpected failure: {exc}"
        pytest.skip(f"Iceberg runtime unavailable: {type(exc).__name__}")

    got = spark.read.table("ice.db.docs_stage")
    assert got.count() == 20
