"""r13 (r12 verdict #7): A/B the Arrow batch-size dial
(spark.sql.execution.arrow.maxRecordsPerBatch — a runtime SQL conf)
on the MapInPandas/MapInArrow query paths at sf0.1:
event_indicator_fused_jvm, user_technical_snapshot, and the two
Arrow-pass fused doc scans. Noop-sink walls (guide §1.4), interleaved
by batch size so rig drift hits every arm equally.

    python tools/arrow_batch_ab.py [runs] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from japanstockdatapipeline_spark.plans import all_members, all_queries  # noqa: E402
from japanstockdatapipeline_spark.session import get_spark  # noqa: E402

SIZES = (16384, 65536, 262144)
QUERIES = (
    "event_indicator_fused_jvm",
    "user_technical_snapshot",
    "doc_features_fused",
    "corpus_prep_fused",
)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("jsdp-arrow-batch-ab")
    registry = {**all_queries(), **all_members()}
    walls: dict = {q: {str(s): [] for s in SIZES} for q in QUERIES}
    # warm once per query at the default
    for q in QUERIES:
        registry[q].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for _ in range(runs):
        for size in SIZES:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(size))
            for q in QUERIES:
                spark.sparkContext.setJobDescription(f"ab {q} batch={size}")
                t0 = time.perf_counter()
                registry[q].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls[q][str(size)].append(round(time.perf_counter() - t0, 3))
    out = {
        "op": "arrow_batch_ab",
        "runs": runs,
        "sizes": SIZES,
        "sf_dir": sf_dir,
        "walls": walls,
        "mins": {
            q: {s: min(v) for s, v in arms.items()} for q, arms in walls.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
