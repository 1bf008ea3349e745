"""DuckDB-oracle equivalence suite (the reference's SQL↔TS
cell-by-cell equivalence idea, SURVEY.md §5, adapted: Spark↔DuckDB).

Every registered query with an oracle must match on row count,
column names, and normalized sorted values at sf0.001.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from japanstockdatapipeline_spark.plans import all_members, all_queries
from japanstockdatapipeline_spark.sources import TABLE_NAMES

SF_SMOKE = "/root/testdata/sf0.001"


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(row):
        out = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                out.append("NaN" if math.isnan(v) else f"{v:.9g}")
            else:
                out.append("NULL" if v is None else str(v))
        return "\x01".join(out)

    return sorted(key(r) for r in rows)


# registered queries (driver-visible, incl. panels) AND panel members:
# each member keeps its own oracle and is verified individually here
QUERIES = {**all_queries(), **all_members()}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        # rows-only contract: must run and be non-degenerate
        assert isinstance(srows, list)
        return
    con = _duck(SF_SMOKE)
    res = con.execute(q.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(sdf.columns) == sorted(dcols), "column names must match oracle"
    assert len(srows) == len(drows), "row count mismatch"
    assert _normalize(srows, sdf.columns) == _normalize(drows, dcols)
