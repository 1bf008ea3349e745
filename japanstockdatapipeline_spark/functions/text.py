"""Text-analysis column expressions for the documents table.

Training-data-pipeline primitives (BASELINE.json north-star): token
counting, quality scoring, language-ID heuristic, fingerprinting.
All pure Catalyst expressions (JVM-side, codegen) — no Python UDFs —
so they run at scan speed on 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "n_tokens",
    "avg_token_len",
    "stopword_ratio",
    "punct_ratio",
    "quality_score",
    "TEXT_STAGE_NAMES",
    "text_stat_stage_cols",
    "quality_num_sql",
    "quality_den_sql",
    "quality_q6_sql",
    "quality_q6_col",
    "quality_ge_half_sql",
    "quality_bucket_sql",
    "lang_id",
    "fingerprint_md5",
    "shingles",
]

# tiny closed stopword list; shared verbatim with the DuckDB oracle SQL
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# language marker words for the n-gram/marker heuristic language ID.
# Deterministic rule set, applied identically in Spark and oracle SQL.
LANG_MARKERS = {
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "es", "y"),
    "zh": ("de5", "shi4", "bu4"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    sw = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    return F.when(F.size(toks) > 0, sw.cast("double") / F.size(toks))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    np = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    return F.when(n > 0, np.cast("double") / n)


def quality_score(text: Column) -> Column:
    """Deterministic heuristic quality score in [0, 1]:
    0.4 * length factor (saturates at 200 tokens)
    + 0.3 * (1 - stopword_ratio)
    + 0.3 * (1 - min(punct_ratio * 10, 1)).

    Float form — fine for internal heuristics, but any EMITTED /
    compared / bucketed use must go through the exact integer rails
    below (quality_q6_col & friends): the score is a rational with
    denominator 500*n_tokens*len_text, so it lands exactly on
    round(x, 6) half-way boundaries, 0.5-threshold cuts, and 0.1
    bucket edges, where float evaluation is engine-divergent (the
    round-7 sf0.1 oracle-flip class)."""
    nt = n_tokens(text)
    lf = F.least(nt.cast("double") / F.lit(200.0), F.lit(1.0))
    swr = F.coalesce(stopword_ratio(text), F.lit(0.0))
    pr = F.least(F.coalesce(punct_ratio(text), F.lit(0.0)) * 10.0, F.lit(1.0))
    return 0.4 * lf + 0.3 * (1.0 - swr) + 0.3 * (1.0 - pr)


# ---------------------------------------------------------------------------
# Exact integer rails for the text stats (SCALE.md rule 5 extension):
# every emitted text-stat value is a ratio of small integer counts, so
# the 6dp output / threshold cut / decile bucket is computed in integer
# arithmetic from (n_tokens, sum_token_len, n_stopwords, n_punct,
# len_text) and is bit-identical across engines by construction.
# ---------------------------------------------------------------------------

TEXT_STAGE_NAMES = ("__ts_nt", "__ts_sl", "__ts_sw", "__ts_np", "__ts_ln")


def text_stat_stage_cols(text: Column, toks: Column | None = None) -> list:
    """The five integer counts every exact text-stat output derives
    from, staged under the TEXT_STAGE_NAMES aliases (one tokenize
    per row; CollapseProject keeps the stage apart).

    `toks` (r12 optimization round, guide §2.3 "project early" applied
    to per-row CPU): a pre-staged token-array COLUMN to derive the
    counts from instead of re-tokenizing — the three token-consuming
    counts each inline their own `tokens(text)` otherwise, and
    Catalyst's common-subexpression pass does not merge trees that
    differ only in lambda-variable ids, so a caller that stages
    `tokens(text)` once (doc_features_fused's `__tk`) saves two full
    split-and-filter passes per row. Value-identical: the expressions
    are the same, applied to the same array."""
    toks = tokens(text) if toks is None else toks
    return [
        F.size(toks).cast("bigint").alias("__ts_nt"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
        ).alias("__ts_sl"),
        F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
        .cast("bigint")
        .alias("__ts_sw"),
        F.length(F.regexp_replace(text, r"[^.,;:!?]", "")).cast("bigint").alias("__ts_np"),
        F.length(text).cast("bigint").alias("__ts_ln"),
    ]


def quality_num_sql(nt: str, sw: str, np_: str, ln: str) -> str:
    """Numerator of the exact quality-score rational over integer
    fragments: score = num / (500*NT*C) with NT=max(nt,1), C=max(ln,1)
    — algebraically identical to the float form term by term
    (saturating length factor, coalesced ratios). Internal BIGINT
    bound: 500*nt*len_text < 9.2e18, i.e. docs up to ~40 MB of text
    at worst-case token density — far past any sane document; split
    larger payloads upstream."""
    NT = f"greatest({nt}, 1)"
    C = f"greatest({ln}, 1)"
    LFN = f"least({nt}, 200)"
    return (
        f"({LFN} * {NT} * {C} + 150 * {C} * ({NT} - ({sw}))"
        f" + 150 * {NT} * ({C} - least(10 * ({np_}), {C})))"
    )


def quality_den_sql(nt: str, ln: str) -> str:
    return f"(500 * greatest({nt}, 1) * greatest({ln}, 1))"


def quality_q6_sql(nt: str, sw: str, np_: str, ln: str, div: str = "//") -> str:
    """Exact 6dp-rounded quality score (SQL; div='div' for Spark)."""
    from .semantics import round6_ratio_sql

    return round6_ratio_sql(
        quality_num_sql(nt, sw, np_, ln), quality_den_sql(nt, ln), div=div, wide=True
    )


def quality_q6_col(
    nt: str = "__ts_nt", sw: str = "__ts_sw", np_: str = "__ts_np", ln: str = "__ts_ln"
) -> Column:
    return F.expr(quality_q6_sql(nt, sw, np_, ln, div="div"))


def quality_ge_half_sql(nt: str, sw: str, np_: str, ln: str) -> str:
    """score >= 0.5 decided exactly (2*num >= den) — a float compare
    is engine-divergent when the exact score IS 0.5."""
    num = quality_num_sql(nt, sw, np_, ln)
    den = quality_den_sql(nt, ln)
    return f"(2 * {num} >= {den})"


def quality_bucket_sql(nt: str, sw: str, np_: str, ln: str, div: str = "//") -> str:
    """least(floor(score*10), 9) decided exactly: (10*num) div den."""
    num = quality_num_sql(nt, sw, np_, ln)
    den = quality_den_sql(nt, ln)
    return f"least((10 * {num}) {div} {den}, 9)"


def lang_id(text: Column) -> Column:
    """Marker-word language ID: the language whose marker list hits the
    most tokens wins; ties and zero hits fall back to 'en'."""
    toks = F.transform(tokens(text), F.lower)

    def in_set(values):
        # closure factory: a default-arg lambda would be seen as a
        # two-param (element, index) HOF lambda by pyspark
        def f(t):
            return t.isin(*values)

        return f

    hit_structs = []
    # order matters for deterministic tie-break: check in fixed order,
    # strictly-greater comparison keeps the earlier language on ties
    for lang_code, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(toks, in_set(markers)))
        hit_structs.append((lang_code, hits))
    pred = F.lit("en")
    best = F.lit(0)
    for lang_code, hits in hit_structs:
        pred = F.when(hits > best, F.lit(lang_code)).otherwise(pred)
        best = F.greatest(best, hits)
    return pred


def lang_id_from_tokens_sql(toks_sql: str) -> Column:
    """Single-pass SQL form of `lang_id` over a (pre-staged) token
    array (r12 optimization round): ONE fold accumulates all four
    marker-hit counters (the Column form builds four separate
    `filter` passes, each inlining its own lowered-token transform),
    and the aggregate's `finish` lambda applies the identical
    fixed-order strictly-greater tie-break — the same CASE chain the
    member oracle states, which the Column form's fold was proven
    equivalent to by that oracle. Value-identical by construction and
    by the doc_lang_id / panel oracles."""
    sets = {
        lang: "(" + ", ".join(f"'{m}'" for m in markers) + ")"
        for lang, markers in LANG_MARKERS.items()
    }
    merge = ", ".join(
        f"acc.{lang} + if(x in {sets[lang]}, 1, 0) as {lang}" for lang in sets
    )
    init = ", ".join(f"0 as {lang}" for lang in sets)
    return F.expr(
        f"aggregate(transform({toks_sql}, t -> lower(t)), "
        f"struct({init}), "
        f"(acc, x) -> struct({merge}), "
        "acc -> case "
        "when acc.zh > acc.es and acc.zh > acc.fr and acc.zh > acc.de and acc.zh > 0 then 'zh' "
        "when acc.es > acc.fr and acc.es > acc.de and acc.es > 0 then 'es' "
        "when acc.fr > acc.de and acc.fr > 0 then 'fr' "
        "when acc.de > 0 then 'de' "
        "else 'en' end)"
    )


def fingerprint_md5(text: Column) -> Column:
    """Canonicalized exact-dup fingerprint: lower, collapse whitespace, md5."""
    canon = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(canon)


def shingles(text: Column, k: int = 3, toks: Column | None = None) -> Column:
    """k-token shingles (distinct), as array<string> — the unit set for
    n-gram Jaccard / MinHash dedup.

    Implementation note (measured at sf0.1): per-position slice() is
    ~60x slower and per-position element_at ~6x slower than zipping k
    literal-start slices — arrays_zip allocates k arrays per ROW, not
    per shingle, and the transform is then a flat struct walk.

    `toks` optionally supplies a pre-staged lower-token array column
    (r12 optimization round) so a fused caller skips the tokenize pass
    — value-identical.
    """
    toks = tokens(F.lower(text)) if toks is None else toks
    n = F.size(toks)
    m = n - (k - 1)
    z = F.arrays_zip(*[F.slice(toks, j + 1, m) for j in range(k)])
    sh = F.transform(z, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)]))
    return F.when(n >= k, F.array_distinct(sh)).otherwise(F.array())
