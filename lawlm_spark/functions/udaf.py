"""Python UDAF surface (SURVEY §2.6 gap ledger: the reference has no
UDAF; Spark's native shape is the GROUPED_AGG pandas UDF).

`geo_mean` — geometric mean of the positive values per group.  Arrow
ships the whole group to one python worker (no partial merge), so the
UDF must be order-insensitive to be deterministic under shuffle: the
values are SORTED before the log-sum, making the float summation order
fixed regardless of partitioning.

At 100 TB: a grouped-agg UDF materializes each group — fine for bounded
group counts (per-type stats); for unbounded groups prefer a
decomposable reformulation (exp(avg(ln)) in native expressions, which
Catalyst partial-aggregates map-side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


@F.pandas_udf("double")
def geo_mean(v: pd.Series) -> float:
    pos = np.sort(v[v > 0].to_numpy(dtype="float64"))
    if pos.size == 0:
        return float("nan")
    return float(np.exp(np.log(pos).mean()))


# Spark refuses to mix grouped-agg pandas UDFs with native aggregates in
# one agg() ([INVALID_PANDAS_UDF_PLACEMENT]) — companion count UDAF.
@F.pandas_udf("long")
def group_count(v: pd.Series) -> int:
    return int(len(v))
