"""Time the FULL execution of bench queries with the noop sink
(guide §1.4: df.write.format("noop") computes every column of every
row, unlike the count action whose plan prunes), printing one JSON
object {name: [walls...]} — the optimization round's measurement
harness (plans/<round>/noop_<tag>.json; round dir from $SPARK_GRAFT_ROUND_DIR, default r13).

Usage: python tools/noop_time.py [tag] [runs] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from japanstockdatapipeline_spark.plans import all_members, all_queries  # noqa: E402
from japanstockdatapipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    tag = args[0] if args else "probe"
    runs = int(args[1]) if len(args) > 1 else 3
    sf_dir = args[2] if len(args) > 2 else "/root/testdata/sf0.1"
    only = set(args[3:])

    spark = get_spark("jsdp-noop-time")
    queries = {**all_queries(), **all_members()}
    names = [
        n
        for n, q in queries.items()
        if (n in only if only else q.bench)
    ]
    out: dict[str, list[float]] = {}
    for name in names:
        q = queries[name]
        spark.sparkContext.setJobDescription(f"noop: {name}")
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = walls
        print(f"# {name}: {walls}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_ROUND_DIR", "r13")
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"noop_{tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
