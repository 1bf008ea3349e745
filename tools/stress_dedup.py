"""Dedup-family stress at 10x the largest local testdata.

Builds a 50k-document corpus in /tmp by replicating sf0.1 documents
K=10 times: replica 0 is verbatim (so exact dedup has real work),
replicas i>0 drop the first 2*i tokens (so the copies are *near*
dups with decreasing Jaccard — the realistic crawl-dup shape).
Then times the operators that SCALE.md claims survive scale-up:

  exact_dedup, ngram_jaccard_pairs (max_df capped AND exact),
  minhash_lsh_pairs, simhash, dup_clusters

and prints one JSON line per measurement. Run manually:

    python tools/stress_dedup.py [K] [sf_dir]

Results are recorded in SCALE.md ("Measured" section); this is a
tool, not a test — it takes minutes.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from japanstockdatapipeline_spark.operators.dedup import (  # noqa: E402
    dup_clusters,
    exact_dedup,
    lsh_verified_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from japanstockdatapipeline_spark.session import get_spark  # noqa: E402

OUT = "/tmp/stress_documents.parquet"


def build(spark, sf_dir: str, k: int) -> None:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps = []
    for i in range(k):
        r = d.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            (
                F.col("text")
                if i == 0
                else F.array_join(
                    F.slice(
                        F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != ""),
                        2 * i + 1,
                        1_000_000,
                    ),
                    " ",
                )
            ).alias("text"),
            "lang",
            "source",
        )
        reps.append(r)
    u = reps[0]
    for r in reps[1:]:
        u = u.unionByName(r)
    u = u.withColumn("n_chars", F.length("text"))
    u.write.mode("overwrite").parquet(OUT)


def timed(name: str, fn) -> None:
    t0 = time.time()
    try:
        n = fn()
        print(json.dumps({"op": name, "rows": n, "sec": round(time.time() - t0, 2)}))
    except Exception as e:  # keep going; a stress failure is a finding
        print(json.dumps({"op": name, "error": str(e)[:200], "sec": round(time.time() - t0, 2)}))


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("stress-dedup")
    t0 = time.time()
    build(spark, sf_dir, k)
    d = spark.read.parquet(OUT)
    n_docs = d.count()
    print(json.dumps({"op": "build", "rows": n_docs, "k": k, "sec": round(time.time() - t0, 2)}))

    timed("exact_dedup", lambda: exact_dedup(d).count())
    timed("simhash", lambda: simhash(d).count())
    timed(
        "minhash_lsh_pairs",
        lambda: minhash_lsh_pairs(d, n_hashes=16, bands=4).count(),
    )
    timed(
        "ngram_jaccard_maxdf",
        lambda: ngram_jaccard_pairs(d, threshold=0.5, k=3, max_df=256).count(),
    )
    timed(
        "dup_clusters_on_lsh",
        lambda: dup_clusters(
            minhash_lsh_pairs(d, n_hashes=16, bands=4)
            .where(F.col("est_jaccard") >= 0.5)
            .select("id_a", "id_b")
        ).count(),
    )
    timed(
        "ngram_jaccard_exact",
        lambda: ngram_jaccard_pairs(d, threshold=0.5, k=3, max_df=None).count(),
    )
    # the PRODUCTION two-stage composition (round-6): LSH candidates ->
    # exact verify; compare pairs/wall against the pure exact row above
    timed(
        "lsh_verified_pairs",
        lambda: lsh_verified_pairs(d, threshold=0.5, n_hashes=16, bands=4).count(),
    )


if __name__ == "__main__":
    main()
