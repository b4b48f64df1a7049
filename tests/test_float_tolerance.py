"""Float-boundary tolerance policy for cross-engine oracles.

AVG/STDDEV/cosine sums run in engine-specific order, so Spark and DuckDB
can disagree in the last ulp.  A displayed value is only at risk when the
underlying double sits within ~1 ulp of a rounding-grid boundary; the
policy (queries.py: ann_lsh_topk / ann_ivf_topk cos_sim, bm25_stats
mean/stddev) is to round those aggregate columns at 3 dp instead of 4 —
a 10x coarser grid puts 10x fewer values at a boundary, and values that
straddle a 4 dp boundary (the observed-risk class) are far from any 3 dp
boundary, so an ulp flip there can no longer change the compared value.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

# a pair of doubles straddling the 0.1234|0.1235 boundary by ~1 ulp —
# the shape an order-of-summation difference produces
LO = 0.12344999999999999
HI = 0.12345000000000002


def test_planted_boundary_value_stable_at_3dp(spark):
    row = (spark.createDataFrame([(LO, HI)], "lo double, hi double")
           .select(F.round("lo", 4).alias("lo4"), F.round("hi", 4).alias("hi4"),
                   F.round("lo", 3).alias("lo3"), F.round("hi", 3).alias("hi3"))
           .collect()[0])
    (dlo4, dhi4, dlo3, dhi3) = (
        float(x) for x in duckdb.sql(
            f"SELECT ROUND({LO!r}, 4), ROUND({HI!r}, 4), "
            f"ROUND({LO!r}, 3), ROUND({HI!r}, 3)").fetchone())

    # at 4dp the ulp-straddling pair lands on DIFFERENT values — the
    # spurious-red mechanism this policy guards against
    assert row.lo4 != row.hi4 or dlo4 != dhi4
    # at 3dp both engines agree on both sides of the planted boundary
    assert row.lo3 == row.hi3 == dlo3 == dhi3 == pytest.approx(0.123)
