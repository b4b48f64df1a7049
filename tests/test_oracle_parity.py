"""Replicates the driver's correctness gate locally: every queries() entry
runs on Spark AND its oracle_sql() runs on DuckDB over the same parquet at
sf0.001; row sets must match after column-name sort (the driver's
order-insensitive value-hash)."""

import math
import os

import duckdb
import pandas as pd
import pytest

from apt_bron_re_spark.queries import ORACLES, SPARK_QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("nan")
                else:
                    row.append(f"{v:.6f}")
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return sorted(rows)


@pytest.mark.parametrize("name", sorted(SPARK_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = SPARK_QUERIES[name](spark, SF_DIR)
    got = normalize(sdf.toPandas())
    want = normalize(duck.sql(ORACLES[name]).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    if got != want:
        diffs = [(g, w) for g, w in zip(got, want) if g != w][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


GOLD_ORACLED = ["multimodal_meta", "multimodal_frames", "kg_triples"]


@pytest.mark.parametrize("name", GOLD_ORACLED)
def test_gold_oracled_rows_match(spark, name):
    """The three synthetic-input driver rows are oracled against
    checked-in gold parquet (round-4): replicate the driver compare —
    Spark query vs DuckDB read_parquet of the fixture — value-exact."""
    import importlib.util as iu
    spec = iu.spec_from_file_location(
        "entry_mod", os.path.join(os.path.dirname(__file__), "..",
                                  "__spark_entry__.py"))
    m = iu.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs, oracles = m.queries(), m.oracle_sql()
    got = normalize(qs[name](spark, SF_DIR).toPandas())
    want = normalize(duckdb.sql(oracles[name]).df())
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    if got != want:
        diffs = [(g, w) for g, w in zip(got, want) if g != w][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
