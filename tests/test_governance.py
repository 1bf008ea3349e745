"""Governance-member invariants beyond the oracle parity checks
(tests/test_oracle.py covers value-level Spark==DuckDB for these)."""

from __future__ import annotations

from pyspark.sql import functions as F

from japanstockdatapipeline_spark.plans import all_members

SF = "/root/testdata/sf0.001"


def _m(name):
    return all_members()[name]


def test_split_never_straddles_clusters(spark):
    """The contamination-safety invariant: every near-dup cluster
    lands entirely in train or entirely in val."""
    df = _m("doc_leakage_safe_split").fn(spark, SF)
    straddling = (
        df.groupBy("split_cluster")
        .agg(F.countDistinct("split_label").alias("n_labels"))
        .filter(F.col("n_labels") > 1)
        .count()
    )
    assert straddling == 0
    # and the split is a real split (both sides populated, ~90/10)
    counts = dict(df.groupBy("split_label").count().collect())
    assert counts.get("train", 0) > counts.get("val", 0) > 0


def test_split_respects_dup_pairs(spark):
    """Directly: for every >=0.5-Jaccard pair, both docs share a
    split label (the pair graph is what clustering consumed)."""
    from japanstockdatapipeline_spark.operators.dedup import ngram_jaccard_pairs
    from japanstockdatapipeline_spark.sources import load_table

    split = _m("doc_leakage_safe_split").fn(spark, SF)
    pairs = ngram_jaccard_pairs(load_table(spark, SF, "documents"), threshold=0.5, k=3)
    leaked = (
        pairs.join(split.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("split_label", "label_a")
        .select("id_a", "id_b", "label_a")
        .join(split.withColumnRenamed("doc_id", "id_b"), "id_b")
        .filter(F.col("split_label") != F.col("label_a"))
        .count()
    )
    assert leaked == 0


def test_pii_redaction_is_complete(spark):
    """After redaction, re-running every detector on the redacted
    text finds zero matches — no partial masking."""
    from japanstockdatapipeline_spark.plans.governance import (
        PII_EMAIL,
        PII_IP,
        PII_PHONE,
        _pii_augmented,
    )
    from japanstockdatapipeline_spark.sources import load_table

    d = load_table(spark, SF, "documents")
    aug = _pii_augmented()
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, PII_EMAIL, "<EMAIL>"), PII_PHONE, "<PHONE>"
        ),
        PII_IP,
        "<IP>",
    )
    remaining = d.select(
        sum(
            F.size(F.regexp_extract_all(redacted, F.lit(p), F.lit(0)))
            for p in (PII_EMAIL, PII_PHONE, PII_IP)
        ).alias("n")
    ).agg(F.sum("n").alias("total"))
    assert remaining.collect()[0]["total"] == 0
    # and every class was actually present pre-redaction
    found = d.select(
        *(
            F.sum(F.size(F.regexp_extract_all(aug, F.lit(p), F.lit(0)))).alias(f"c{i}")
            for i, p in enumerate((PII_EMAIL, PII_PHONE, PII_IP))
        )
    ).collect()[0]
    assert all(found[f"c{i}"] > 0 for i in range(3))


def test_url_canonical_is_clean(spark):
    df = _m("doc_url_normalize").fn(spark, SF)
    bad = df.filter(
        F.col("url_canonical").rlike(r"^https?://|^www\.|[?#]|/$")
        | (F.col("url_domain") != "example.com")
        | F.col("url_host").contains("/")
    ).count()
    assert bad == 0


def test_width_normalize_roundtrip(spark):
    df = _m("doc_width_normalize").fn(spark, SF)
    n = df.count()
    assert df.filter(F.col("zen_roundtrip_ok")).count() == n
    # zen form actually differs (normalization is not a no-op) and
    # contains only full-width chars where ASCII alnum/space existed
    assert df.filter(F.col("zen_text") == F.col("zen_norm")).count() == 0


def test_license_filter_classes_and_policy(spark):
    """Each synthesized notice class (doc_id % 5) maps to the expected
    detection columns and keep verdict: permissive SPDX and unmarked
    docs pass, GPL / CC BY-NC / all-rights-reserved are dropped."""
    rows = {
        r["doc_id"]: r
        for r in _m("doc_license_filter").fn(spark, SF).limit(500).collect()
    }
    for did, r in rows.items():
        cls = did % 5
        if cls == 0:
            assert r["lic_spdx"] == "mit" and r["lic_class"] == "permissive"
            assert r["lic_allow"]
        elif cls == 1:
            assert r["lic_spdx"] == "gpl-3.0-only"
            assert r["lic_class"] == "copyleft_or_other" and not r["lic_allow"]
        elif cls == 2:
            assert r["lic_spdx"] is None and r["lic_has_copyright"]
            assert r["lic_rights_reserved"]
            assert r["lic_class"] == "all_rights_reserved" and not r["lic_allow"]
        elif cls == 3:
            assert r["lic_cc"] == "CC BY-NC 4.0"
            assert r["lic_class"] == "non_commercial" and not r["lic_allow"]
        else:
            assert r["lic_spdx"] is None and r["lic_cc"] is None
            assert r["lic_class"] == "none" and r["lic_allow"]


def test_license_filter_null_text_still_classified(spark, tmp_path):
    """Review fix: a NULL-text document must not nullify the synthesized
    notice — the notice classes still classify (and drop) correctly."""
    from japanstockdatapipeline_spark.plans.llm import load_table  # noqa: F401

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, None) for i in range(5)], "doc_id bigint, text string"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    rows = {r["doc_id"]: r for r in _m("doc_license_filter").fn(spark, sf_dir).collect()}
    assert rows[0]["lic_class"] == "permissive" and rows[0]["lic_allow"]
    assert rows[1]["lic_class"] == "copyleft_or_other" and not rows[1]["lic_allow"]
    assert rows[2]["lic_class"] == "all_rights_reserved" and not rows[2]["lic_allow"]
    assert rows[3]["lic_class"] == "non_commercial" and not rows[3]["lic_allow"]
    assert rows[4]["lic_class"] == "none" and rows[4]["lic_allow"]
