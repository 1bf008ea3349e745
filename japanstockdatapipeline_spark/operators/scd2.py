"""SCD Type 2 master maintenance: apply a daily snapshot to history.

Reference parity: equity-master.ts:469-530 (syncEquityMasterSCD) and
supabase/migrations/00010_equity_master_scd_type2.sql:18-53 — the
listed-security master keeps one row per (code, valid_from) with
`valid_from` inclusive, `valid_to` exclusive (NULL = open), and
exactly one `is_current` row per code. Each sync:

  - new key in snapshot          -> insert open row
  - attrs changed                -> close old at effective, insert new
  - attrs identical              -> keep old row untouched
  - key missing from snapshot    -> delist: close old at effective
  - delisted key reappearing     -> plain insert (relisting)

The reference does this row-at-a-time against Postgres with a Map of
current rows; the Spark-first form is ONE full-outer join between the
current slice and the snapshot on the business key, emitting 0-2
output rows per joined row via an exploded struct array — a single
shuffle (or broadcast when the snapshot is small), no driver loop,
no per-row round trips. History rows (is_current = false) pass
through untouched, so at 100 TB the non-current bulk is a scan-only
union leg and the join only carries |current| + |snapshot| rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_apply"]


def scd2_apply(
    master: DataFrame,
    snapshot: DataFrame,
    keys: list[str],
    attrs: list[str],
    effective,
    *,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Return the new master after applying `snapshot` at `effective`.

    `master` columns:   keys + attrs + [valid_from, valid_to, is_current]
    `snapshot` columns: keys + attrs  (one row per key)
    `effective` is the snapshot's effective date (any orderable type
    consistent with valid_from/valid_to; closing sets valid_to =
    effective, exclusive, matching 00010's `valid_to > valid_from`
    check).
    """
    eff: Column = effective if isinstance(effective, Column) else F.lit(effective)
    hist = master.filter(~F.col(is_current))
    cur = master.filter(F.col(is_current))

    c = cur.select(
        *[F.col(k).alias(f"__ck_{k}") for k in keys],
        *[F.col(a).alias(f"__ca_{a}") for a in attrs],
        F.col(valid_from).alias("__c_from"),
    )
    s = snapshot.select(
        *[F.col(k).alias(f"__sk_{k}") for k in keys],
        *[F.col(a).alias(f"__sa_{a}") for a in attrs],
    )
    cond = reduce(
        lambda x, y: x & y, [c[f"__ck_{k}"] == s[f"__sk_{k}"] for k in keys]
    )
    j = c.join(s, cond, "full_outer")

    has_cur = F.col(f"__ck_{keys[0]}").isNotNull()
    has_snap = F.col(f"__sk_{keys[0]}").isNotNull()
    same = reduce(
        lambda x, y: x & y,
        [F.col(f"__ca_{a}").eqNullSafe(F.col(f"__sa_{a}")) for a in attrs],
    )

    def out_row(key_src: str, attr_src: str, vfrom: Column, vto: Column, curf: bool) -> Column:
        fields = [F.col(f"__{key_src}_{k}").alias(k) for k in keys]
        fields += [F.col(f"__{attr_src}_{a}").alias(a) for a in attrs]
        fields += [
            vfrom.alias(valid_from),
            vto.alias(valid_to),
            F.lit(curf).alias(is_current),
        ]
        return F.struct(*fields)

    null_like_eff = F.when(F.lit(False), eff)  # typed NULL matching effective
    keep = out_row("ck", "ca", F.col("__c_from"), null_like_eff, True)
    close = out_row("ck", "ca", F.col("__c_from"), eff, False)
    insert = out_row("sk", "sa", eff, null_like_eff, True)

    variants = (
        F.when(has_cur & has_snap & same, F.array(keep))
        .when(has_cur & has_snap, F.array(close, insert))
        .when(has_cur, F.array(close))  # delisted
        .otherwise(F.array(insert))  # new listing (or relisting)
    )
    applied = j.select(F.explode(variants).alias("__r")).select("__r.*")
    return hist.select(*keys, *attrs, valid_from, valid_to, is_current).unionByName(
        applied
    )
