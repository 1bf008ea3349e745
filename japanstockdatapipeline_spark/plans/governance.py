"""Data-governance plans over the documents table: PII detection /
redaction, URL canonicalization, width normalization, and the
contamination-safe train/val split.

These are the governance half of a training-data pipeline (the
reference's pipeline scrubs scraped payloads before load —
scraper/parser.ts normalizes widths and strips markup; this module
generalizes that to the corpus-prep shape: ROOTS/BigScience-style
PII masking, web-corpus URL canonicalization, and the
leakage-safe split that keeps near-duplicate documents on the SAME
side of a train/val boundary).

The testdata documents are synthetic word-salad with no real PII or
URLs, so — exactly like the scraper round-trip members (plans/
scrape.py) — each member first SYNTHESIZES a deterministic payload
from the row's own columns (doc_id, n_chars, source), then runs the
real detection/normalization expressions over it. Both engines build
the identical payload, so the oracle checks the transformation
value-for-value. All expressions are pure Catalyst (regexp/translate
— no UDFs): at 100 TB these run at scan speed with zero shuffles;
only the split member shuffles (it rides the dedup pair graph).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.japanese import (
    HANKAKU_CHARS,
    ZENKAKU_CHARS,
    hankaku_to_zenkaku,
    zenkaku_to_hankaku,
)
from ..sources import load_table
from .registry import member, member_oracle

# Detection patterns — shared verbatim between Spark (Java regex) and
# DuckDB (RE2); restricted to the common syntax subset (\b, \d,
# classes, bounded reps) so both engines match identically.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b0\d{1,4}-\d{1,4}-\d{4}\b"  # JP-style 0X-XXXX-XXXX
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _pii_augmented():
    """text + deterministic synthetic PII (email, JP phone, IPv4)
    derived from the row's own columns — same formula as the oracle."""
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.col("text"),
        F.lit(" contact-"), did,
        F.lit("@ex"), (F.col("doc_id") % 10).cast("string"),
        F.lit(".com tel 0"), (F.col("doc_id") % 90 + 10).cast("string"),
        F.lit("-"), F.lpad((F.col("n_chars") % 10000).cast("string"), 4, "0"),
        F.lit("-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip="), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), (F.col("n_chars") % 256).cast("string"),
        F.lit("."), ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit("."), ((F.col("doc_id") * 13) % 256).cast("string"),
    )


_PII_AUG_SQL = (
    "text || ' contact-' || doc_id || '@ex' || (doc_id % 10) || "
    "'.com tel 0' || (doc_id % 90 + 10) || '-' || "
    "lpad(CAST(n_chars % 10000 AS VARCHAR), 4, '0') || '-' || "
    "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ip=' || "
    "(doc_id % 256) || '.' || (n_chars % 256) || '.' || "
    "((doc_id * 7) % 256) || '.' || ((doc_id * 13) % 256)"
)


def redact_text(col) -> "F.Column":
    """The one redaction chain every rail shares (the batch member,
    the fused forms, and streaming corpus_prep_stream): email ->
    phone -> IP, IN THAT ORDER — phone/IP digit runs can overlap an
    email's local part, so applying email first keeps the class
    counts and the redacted text consistent across paths."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, PII_EMAIL, "<EMAIL>"),
            PII_PHONE, "<PHONE>",
        ),
        PII_IP, "<IP>",
    )


def pii_redaction_cols(staged: bool = False) -> list:
    """The PII member's output expressions (reused by the fused doc
    features): per-class match counts + the redacted text's md5 +
    characters removed.

    `staged=True` (r12 optimization round): read the synthesized
    payload and the redacted text from the `governance_stage_cols`
    columns instead of inlining them — the 3-regex redaction chain
    used to be evaluated twice per row (md5 + chars_removed) and the
    payload concat five times. Value-identical: same expressions over
    the same strings."""
    aug = F.col("__pii_aug") if staged else _pii_augmented()
    redacted = F.col("__pii_red") if staged else redact_text(aug)
    count = lambda pat: F.size(  # noqa: E731
        F.regexp_extract_all(aug, F.lit(pat), F.lit(0))
    ).cast("int")
    return [
        count(PII_EMAIL).alias("pii_emails"),
        count(PII_PHONE).alias("pii_phones"),
        count(PII_IP).alias("pii_ips"),
        F.md5(redacted).alias("pii_redacted_md5"),
        (F.length(aug) - F.length(redacted)).cast("int").alias("pii_chars_removed"),
    ]


_PII_ORACLE = f"""
    WITH aug AS (
      SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents
    ), red AS (
      SELECT doc_id, t,
             regexp_replace(regexp_replace(regexp_replace(t,
                 '{PII_EMAIL}', '<EMAIL>', 'g'),
                 '{PII_PHONE}', '<PHONE>', 'g'),
                 '{PII_IP}', '<IP>', 'g') AS r
      FROM aug
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{PII_EMAIL}')) AS INT) AS pii_emails,
           CAST(len(regexp_extract_all(t, '{PII_PHONE}')) AS INT) AS pii_phones,
           CAST(len(regexp_extract_all(t, '{PII_IP}')) AS INT) AS pii_ips,
           md5(r) AS pii_redacted_md5,
           CAST(length(t) - length(r) AS INT) AS pii_chars_removed
    FROM red
"""


@member(
    "doc_pii_redaction",
    doc="PII detection + redaction (governance op, ROOTS/BigScience-"
    "style masking): synthesizes a deterministic email / JP phone / "
    "IPv4 per document, then detects (per-class counts) and redacts "
    "(<EMAIL>/<PHONE>/<IP>) with engine-portable regexes. Scale: pure "
    "scan-speed expressions, zero shuffles; the regex set is the "
    "restricted Java∩RE2 subset so the same patterns run on both "
    "engines.",
    oracle=_PII_ORACLE,
)
def doc_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", *pii_redaction_cols())


def _url_raw():
    return F.concat(
        F.lit("HTTPS://WWW."),
        F.upper("source"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example.COM/Path/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=x&ref="),
        F.col("doc_id").cast("string"),
        F.lit("#frag"),
    )


_URL_RAW_SQL = (
    "'HTTPS://WWW.' || upper(source) || (doc_id % 7) || "
    "'.Example.COM/Path/' || doc_id || "
    "CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END || "
    "'?utm_source=x&ref=' || doc_id || '#frag'"
)


def url_normalize_cols() -> list:
    """URL canonicalization expressions (reused by the fused doc
    features): lowercase, strip scheme + www + query/fragment +
    trailing slash; extract host, registered domain, path depth."""
    canon = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower(_url_raw()), r"^https?://", ""),
                r"^www\.", "",
            ),
            r"[?#].*$", "",
        ),
        r"/$", "",
    )
    host = F.regexp_extract(canon, r"^([^/]+)", 1)
    return [
        canon.alias("url_canonical"),
        host.alias("url_host"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("url_domain"),
        F.size(F.regexp_extract_all(canon, F.lit("/"), F.lit(0))).cast("int").alias(
            "url_path_depth"
        ),
    ]


_URL_ORACLE = f"""
    WITH u AS (
      SELECT doc_id, {_URL_RAW_SQL} AS raw FROM documents
    ), c AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                 lower(raw), '^https?://', ''), '^www\\.', ''),
                 '[?#].*$', '', 'g'), '/$', '') AS canon
      FROM u
    )
    SELECT doc_id,
           canon AS url_canonical,
           regexp_extract(canon, '^([^/]+)', 1) AS url_host,
           regexp_extract(regexp_extract(canon, '^([^/]+)', 1),
                          '([^.]+\\.[^.]+)$', 1) AS url_domain,
           CAST(len(regexp_extract_all(canon, '/')) AS INT) AS url_path_depth
    FROM c
"""


@member(
    "doc_url_normalize",
    doc="URL canonicalization (web-corpus governance op): synthesizes "
    "a messy display URL per document (mixed case, www, tracking "
    "query, fragment, trailing slash), then canonicalizes — "
    "lowercase, strip scheme/www/query/fragment/trailing slash — and "
    "extracts host, registered domain, and path depth. The canonical "
    "URL is the standard key for URL-level dedup and domain-level "
    "mixture planning. Scale: scan-speed expressions, zero shuffles.",
    oracle=_URL_ORACLE,
)
def doc_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", *url_normalize_cols())


def width_normalize_cols() -> list:
    """Full-width -> half-width normalization expressions (reused by
    the fused doc features): synthesize the display (zenkaku) form of
    `upper(source) || ' ' || n_chars`, normalize it back, and assert
    the round trip."""
    raw = F.concat(F.upper("source"), F.lit(" "), F.col("n_chars").cast("string"))
    zen = hankaku_to_zenkaku(raw)
    norm = zenkaku_to_hankaku(zen)
    return [
        zen.alias("zen_text"),
        norm.alias("zen_norm"),
        (norm == raw).alias("zen_roundtrip_ok"),
    ]


_WIDTH_ORACLE = f"""
    SELECT doc_id,
           translate(raw, '{HANKAKU_CHARS}', '{ZENKAKU_CHARS}') AS zen_text,
           translate(translate(raw, '{HANKAKU_CHARS}', '{ZENKAKU_CHARS}'),
                     '{ZENKAKU_CHARS}', '{HANKAKU_CHARS}') AS zen_norm,
           translate(translate(raw, '{HANKAKU_CHARS}', '{ZENKAKU_CHARS}'),
                     '{ZENKAKU_CHARS}', '{HANKAKU_CHARS}') = raw AS zen_roundtrip_ok
    FROM (
      SELECT doc_id, upper(source) || ' ' || CAST(n_chars AS VARCHAR) AS raw
      FROM documents
    )
"""


@member(
    "doc_width_normalize",
    doc="Full-width -> half-width normalization (S9 scraper semantics "
    "generalized: nikkei225jp/kabuyutai tables render numbers "
    "zenkaku; the parser normalizes before numeric parse — reference "
    "scraper/parser.ts). 1:1 codepoint map via `translate` (the "
    "U+FEE0 offset + ideographic space), so it is JVM-side in Spark "
    "and vectorized in DuckDB — no UDF, no ICU. Round-trip asserted "
    "per row. Scale: scan-speed, zero shuffles.",
    oracle=_WIDTH_ORACLE,
)
def doc_width_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", *width_normalize_cols())


GOV_STAGE_NAMES = (
    "__pii_aug",
    "__pii_red",
    "__html_raw",
    "__html_clean",
    "__gq_sl",
    "__gq_nstop",
    "__gq_sym",
)


def governance_stage_cols(tk, tkl, arrow_counts: bool = False) -> list:
    """Heavy shared intermediates of the governance families, staged
    ONCE per row for the fused one-pass form (r12 optimization round,
    guide §1 measured): the PII payload + its 3-regex redaction, the
    synthetic HTML doc + its 9-step strip chain, and the gopher
    token-length fold / stopword count / symbol numerator — each used
    to be inlined (and re-evaluated) 2-10x across the governance
    output expressions because Catalyst does not merge trees that
    differ only in lambda ids. `tk`/`tkl` are the fused form's staged
    token arrays. Value-identical: the consuming expressions are
    unchanged, they just read these columns.

    `arrow_counts=True` (r13 optimization round): the two token folds
    (`__gq_sl`, `__gq_nstop`) already ride in from the fused form's
    mapInArrow integer pass under the same names/types — stage only
    the string chains and the symbol numerator here (`tk`/`tkl` may
    be None)."""
    from ..functions import text as TX

    t = F.col("text")
    aug = _pii_augmented()
    raw = _html_raw()
    cols = [
        aug.alias("__pii_aug"),
        redact_text(aug).alias("__pii_red"),
        raw.alias("__html_raw"),
        _html_cleaned(raw).alias("__html_clean"),
    ]
    if not arrow_counts:
        cols += [
            F.aggregate(tk, F.lit(0), lambda acc, x: acc + F.length(x)).alias(
                "__gq_sl"
            ),
            F.size(F.filter(tkl, lambda x: x.isin(*TX.STOPWORDS))).alias(
                "__gq_nstop"
            ),
        ]
    cols.append(
        (
            F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
            + (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
        ).alias("__gq_sym")
    )
    return cols


def gopher_quality_cols(staged_tk=None, staged_nt=None) -> list:
    """Gopher-rule quality flags (Rae et al. 2021, document-level
    subset; reused by the fused doc features): word-count bounds,
    mean-word-length bounds, symbol-to-word ratio, minimum stopword
    count, and the AND of all four.

    `staged_tk` (r12 optimization round): the fused form passes its
    staged token-array column; the word count becomes a cheap size()
    of it, the token-length fold / stopword count / symbol numerator
    are read from the `governance_stage_cols` columns, and gq_pass no
    longer re-derives all four folds. `staged_nt` (r13): the fused
    form now stages the token COUNT itself (bigint, from the Arrow
    integer pass) instead of a token array — the same value size()
    produced. Value-identical either way."""
    from ..functions import text as TX

    t = F.col("text")
    if staged_tk is not None or staged_nt is not None:
        n_words = (
            staged_nt
            if staged_nt is not None
            else F.size(staged_tk).cast("bigint")
        )
        mean_len = F.when(
            n_words > 0,
            F.col("__gq_sl").cast("double") / n_words,
        )
        sym_ratio = F.col("__gq_sym") / F.nullif(n_words, F.lit(0)).cast("double")
        n_stop = F.col("__gq_nstop")
    else:
        toks = TX.tokens(F.lower(t))
        n_words = TX.n_tokens(t)
        mean_len = TX.avg_token_len(t)
        n_symbols = (
            F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
            + (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
        )
        sym_ratio = n_symbols / F.nullif(n_words, F.lit(0)).cast("double")
        n_stop = F.size(F.filter(toks, lambda x: x.isin(*TX.STOPWORDS)))
    f_words = (n_words >= 50) & (n_words <= 100_000)
    f_len = (mean_len >= 3.0) & (mean_len <= 10.0)
    f_sym = F.coalesce(sym_ratio <= 0.1, F.lit(False))
    f_stop = n_stop >= 2
    return [
        n_words.alias("gq_n_words"),
        F.round(mean_len, 6).alias("gq_mean_word_len"),
        F.round(sym_ratio, 6).alias("gq_symbol_ratio"),
        n_stop.alias("gq_n_stopwords"),
        f_words.alias("gq_f_words"),
        f_len.alias("gq_f_word_len"),
        f_sym.alias("gq_f_symbols"),
        f_stop.alias("gq_f_stopwords"),
        (f_words & f_len & f_sym & f_stop).alias("gq_pass"),
    ]


def _gopher_oracle() -> str:
    from ..functions import text as TX

    sw = "', '".join(TX.STOPWORDS)
    return f"""
    WITH tok AS (
      SELECT doc_id, text,
             list_transform(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            x -> x <> ''), x -> lower(x)) AS toks
      FROM documents
    ), m AS (
      SELECT doc_id, text, toks,
             len(toks) AS n_words,
             CASE WHEN len(toks) > 0
                  THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                       / len(toks) END AS mean_len,
             (length(text) - length(replace(text, '#', ''))
              + (length(text) - length(replace(text, '...', ''))) / 3.0)
               / nullif(len(toks), 0) AS sym_ratio,
             len(list_filter(toks, x -> x IN ('{sw}'))) AS n_stop
      FROM tok
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS gq_n_words,
           round(mean_len, 6) AS gq_mean_word_len,
           round(sym_ratio, 6) AS gq_symbol_ratio,
           CAST(n_stop AS INT) AS gq_n_stopwords,
           n_words BETWEEN 50 AND 100000 AS gq_f_words,
           mean_len BETWEEN 3.0 AND 10.0 AS gq_f_word_len,
           coalesce(sym_ratio <= 0.1, FALSE) AS gq_f_symbols,
           n_stop >= 2 AS gq_f_stopwords,
           (n_words BETWEEN 50 AND 100000) AND (mean_len BETWEEN 3.0 AND 10.0)
             AND coalesce(sym_ratio <= 0.1, FALSE) AND n_stop >= 2 AS gq_pass
    FROM m
    """


def _register_gopher_flags() -> None:
    member(
        "doc_gopher_quality_flags",
        oracle=_gopher_oracle(),
        doc="Gopher quality-rule flags (Rae et al. 2021, the "
        "document-level subset): word count in [50, 100k], mean word "
        "length in [3, 10], #/ellipsis symbol-to-word ratio <= 0.1, "
        ">= 2 stopwords; gq_pass = AND of the four. The named filter "
        "battery a MassiveText-style pipeline applies before dedup. "
        "Scale: scan-speed expressions, zero shuffles.",
    )(lambda spark, sf_dir: load_table(spark, sf_dir, "documents").select(
        "doc_id", *gopher_quality_cols()
    ))


_register_gopher_flags()


_HTML_RAW_SQL = (
    "'<html><head><title>Doc ' || doc_id || '</title>"
    "<style>p{margin:0}</style></head><body><h1>' || upper(source) || "
    "'</h1><p>' || text || ' &amp; &lt;raw&gt;&nbsp;end</p>"
    "<script>var x=' || doc_id || ';</script><!-- footer --></body></html>'"
)


def _html_raw():
    return F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>p{margin:0}</style></head><body><h1>"),
        F.upper("source"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit(" &amp; &lt;raw&gt;&nbsp;end</p><script>var x="),
        F.col("doc_id").cast("string"),
        F.lit(";</script><!-- footer --></body></html>"),
    )


def _html_cleaned(raw) -> "F.Column":
    """The 9-step strip chain over a raw-html column — the single
    definition shared by the member form and the staged fused form
    (r12 optimization round)."""
    return F.trim(
        F.regexp_replace(
            F.replace(
                F.replace(
                    F.replace(
                        F.replace(
                            F.regexp_replace(
                                F.regexp_replace(
                                    F.regexp_replace(
                                        F.regexp_replace(
                                            raw, r"<script[^>]*>.*?</script>", ""
                                        ),
                                        r"<style[^>]*>.*?</style>", "",
                                    ),
                                    r"<!--.*?-->", "",
                                ),
                                r"<[^>]+>", " ",
                            ),
                            F.lit("&lt;"), F.lit("<"),
                        ),
                        F.lit("&gt;"), F.lit(">"),
                    ),
                    F.lit("&nbsp;"), F.lit(" "),
                ),
                F.lit("&amp;"), F.lit("&"),
            ),
            r"\s+", " ",
        )
    )


def html_strip_cols(staged: bool = False) -> list:
    """HTML boilerplate-stripping expressions (reused by the fused doc
    features): drop script/style blocks and comments, strip tags,
    unescape the common entities (&amp; LAST, so no double-unescape),
    collapse whitespace. Outputs title, raw/clean lengths, and the
    clean text's md5.

    `staged=True` (r12 optimization round): read the synthesized doc
    and the stripped text from the `governance_stage_cols` columns —
    the 9-step strip chain used to run twice per row (len_clean +
    clean_md5). Value-identical."""
    if staged:
        raw = F.col("__html_raw")
        clean = F.col("__html_clean")
        return [
            F.regexp_extract(raw, r"<title>(.*?)</title>", 1).alias("html_title"),
            F.length(raw).cast("int").alias("html_len_raw"),
            F.length(clean).cast("int").alias("html_len_clean"),
            F.md5(clean).alias("html_clean_md5"),
        ]
    raw = _html_raw()
    clean = _html_cleaned(raw)
    return [
        F.regexp_extract(raw, r"<title>(.*?)</title>", 1).alias("html_title"),
        F.length(raw).cast("int").alias("html_len_raw"),
        F.length(clean).cast("int").alias("html_len_clean"),
        F.md5(clean).alias("html_clean_md5"),
    ]


_HTML_ORACLE = f"""
    WITH h AS (
      SELECT doc_id, {_HTML_RAW_SQL} AS raw FROM documents
    ), c AS (
      SELECT doc_id, raw,
        trim(regexp_replace(
          replace(replace(replace(replace(
            regexp_replace(
              regexp_replace(regexp_replace(regexp_replace(raw,
                '<script[^>]*>.*?</script>', '', 'g'),
                '<style[^>]*>.*?</style>', '', 'g'),
                '<!--.*?-->', '', 'g'),
              '<[^>]+>', ' ', 'g'),
            '&lt;', '<'), '&gt;', '>'), '&nbsp;', ' '), '&amp;', '&'),
          '\\s+', ' ', 'g')) AS clean
      FROM h
    )
    SELECT doc_id,
           regexp_extract(raw, '<title>(.*?)</title>', 1) AS html_title,
           CAST(length(raw) AS INT) AS html_len_raw,
           CAST(length(clean) AS INT) AS html_len_clean,
           md5(clean) AS html_clean_md5
    FROM c
"""


@member(
    "doc_html_strip",
    doc="HTML boilerplate stripping (web-corpus extraction op, the "
    "trafilatura-class step; the reference's scrapers do the same "
    "tag-strip + entity-unescape on nikkei/kabuyutai pages — "
    "scraper/parser.ts): synthesizes an HTML wrapper per document "
    "(title/style/script/comment/entities), then strips script & "
    "style blocks, comments, and tags, unescapes entities (&amp; "
    "last), and collapses whitespace. Scale: scan-speed regex "
    "expressions, zero shuffles, Java∩RE2-portable patterns.",
    oracle=_HTML_ORACLE,
)
def doc_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", *html_strip_cols())


def _register_leakage_safe_split() -> None:
    """Contamination-safe train/val split: assign splits by NEAR-DUP
    CLUSTER, not by document, so near-duplicates never straddle the
    train/val boundary (straddling dups leak evaluation data into
    training — the split-level counterpart of benchmark
    decontamination). Split = md5 of the cluster id (singleton docs
    are their own cluster) mod 100 < 90 -> train. Scale: rides the
    already-bucketed dedup pair graph + one broadcast-able left join
    of the cluster map back to docs; the hash split itself is
    expression-only."""
    dup = member_oracle("doc_dup_clusters")
    oracle = f"""
    SELECT d.doc_id,
           CAST(coalesce(cl.cluster, d.doc_id) AS BIGINT) AS split_cluster,
           CASE WHEN CAST(('0x' || substr(md5('split:' ||
                    CAST(coalesce(cl.cluster, d.doc_id) AS VARCHAR)), 1, 15))::BIGINT
                    % 100 AS INT) < 90
                THEN 'train' ELSE 'val' END AS split_label
    FROM documents d LEFT JOIN ({dup}) cl ON cl.doc_id = d.doc_id
    """

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..operators.dedup import dup_clusters, ngram_jaccard_pairs

        d = load_table(spark, sf_dir, "documents")
        pairs = ngram_jaccard_pairs(d, threshold=0.5, k=3, max_df=256)
        cl = dup_clusters(pairs).select(F.col("id").alias("doc_id"), "cluster")
        base = d.select("doc_id").join(cl, "doc_id", "left")
        cluster = F.coalesce(F.col("cluster"), F.col("doc_id")).cast("bigint")
        h = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("split:"), cluster.cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("bigint")
            % 100
        )
        return base.select(
            "doc_id",
            cluster.alias("split_cluster"),
            F.when(h < 90, F.lit("train")).otherwise(F.lit("val")).alias("split_label"),
        )

    fn.__name__ = "doc_leakage_safe_split"
    member(
        "doc_leakage_safe_split",
        oracle=oracle,
        doc=_register_leakage_safe_split.__doc__,
    )(fn)


_register_leakage_safe_split()


# License / copyright notice filtering (round 9): the governance gate
# code-and-web corpora run before training (The Stack, Kocetkov et al.
# 2022: keep permissively-licensed files; drop copyleft/NC/unknown).
# Like the other governance members, a deterministic notice is
# synthesized per document from its own columns, then the REAL
# detection + policy expressions run over it on both engines.
_LIC_PERMISSIVE = ("mit", "apache-2.0", "bsd-3-clause")


def _license_augmented():
    did = F.col("doc_id")
    notice = (
        F.when(did % 5 == 0, F.lit(" SPDX-License-Identifier: MIT"))
        .when(did % 5 == 1, F.lit(" SPDX-License-Identifier: GPL-3.0-only"))
        .when(
            did % 5 == 2,
            F.concat(
                F.lit(" Copyright (c) 20"),
                F.lpad((did % 30).cast("string"), 2, "0"),
                F.lit(" Acme Corp. All rights reserved."),
            ),
        )
        .when(did % 5 == 3, F.lit(" licensed under CC BY-NC 4.0"))
        .otherwise(F.lit(""))
    )
    # coalesce: a NULL text must not nullify the notice — otherwise a
    # NULL-text doc in a notice class falls through to lic_class 'none'
    # and the gate ADMITS a document it should drop (review finding)
    return F.concat(F.coalesce(F.col("text"), F.lit("")), notice)


_LIC_AUG_SQL = """coalesce(text, '') || CASE
      WHEN doc_id % 5 = 0 THEN ' SPDX-License-Identifier: MIT'
      WHEN doc_id % 5 = 1 THEN ' SPDX-License-Identifier: GPL-3.0-only'
      WHEN doc_id % 5 = 2 THEN ' Copyright (c) 20' ||
           lpad(CAST(doc_id % 30 AS VARCHAR), 2, '0') ||
           ' Acme Corp. All rights reserved.'
      WHEN doc_id % 5 = 3 THEN ' licensed under CC BY-NC 4.0'
      ELSE '' END"""

_LIC_SPDX_RE = r"SPDX-License-Identifier:\s*([A-Za-z0-9.+-]+)"
_LIC_CC_RE = r"\bCC BY(-[A-Z]{2})*( \d\.\d)?"
_LIC_COPYRIGHT_RE = r"Copyright \(c\) \d{4}"
_LIC_RIGHTS_RE = r"[Aa]ll rights reserved"


def license_filter_cols() -> list:
    """License-governance expressions: SPDX id extraction, CC-marker
    extraction, copyright-line / all-rights-reserved flags, a license
    class, and the keep verdict (permissive SPDX or no notice at all
    -> allowed; copyleft / NC / bare all-rights-reserved -> dropped).
    Empty extracts become NULL so 'no notice' is distinguishable."""
    aug = _license_augmented()
    spdx_raw = F.regexp_extract(aug, _LIC_SPDX_RE, 1)
    spdx = F.when(spdx_raw != "", F.lower(spdx_raw))
    cc_raw = F.regexp_extract(aug, _LIC_CC_RE, 0)
    cc = F.when(cc_raw != "", cc_raw)
    has_cr = F.regexp_count(aug, F.lit(_LIC_COPYRIGHT_RE)) > 0
    rights = F.regexp_count(aug, F.lit(_LIC_RIGHTS_RE)) > 0
    permissive = spdx.isin(*_LIC_PERMISSIVE)
    lic_class = (
        F.when(permissive, F.lit("permissive"))
        .when(spdx.isNotNull(), F.lit("copyleft_or_other"))
        .when(cc.contains("-NC"), F.lit("non_commercial"))
        .when(cc.isNotNull(), F.lit("cc_other"))
        .when(rights | has_cr, F.lit("all_rights_reserved"))
        .otherwise(F.lit("none"))
    )
    return [
        spdx.alias("lic_spdx"),
        cc.alias("lic_cc"),
        has_cr.alias("lic_has_copyright"),
        rights.alias("lic_rights_reserved"),
        lic_class.alias("lic_class"),
        lic_class.isin("permissive", "none").alias("lic_allow"),
    ]


_LIC_ORACLE = f"""
    WITH aug AS (
      SELECT doc_id, {_LIC_AUG_SQL} AS t FROM documents
    ), x AS (
      SELECT doc_id,
             nullif(lower(regexp_extract(t, '{_LIC_SPDX_RE}', 1)), '') AS lic_spdx,
             nullif(regexp_extract(t, '{_LIC_CC_RE}', 0), '') AS lic_cc,
             len(regexp_extract_all(t, '{_LIC_COPYRIGHT_RE}')) > 0 AS lic_has_copyright,
             len(regexp_extract_all(t, '{_LIC_RIGHTS_RE}')) > 0 AS lic_rights_reserved
      FROM aug
    ), c AS (
      SELECT *, CASE
          WHEN lic_spdx IN ('{"', '".join(_LIC_PERMISSIVE)}') THEN 'permissive'
          WHEN lic_spdx IS NOT NULL THEN 'copyleft_or_other'
          WHEN contains(lic_cc, '-NC') THEN 'non_commercial'
          WHEN lic_cc IS NOT NULL THEN 'cc_other'
          WHEN lic_rights_reserved OR lic_has_copyright THEN 'all_rights_reserved'
          ELSE 'none' END AS lic_class
      FROM x
    )
    SELECT doc_id, lic_spdx, lic_cc, lic_has_copyright, lic_rights_reserved,
           lic_class, lic_class IN ('permissive', 'none') AS lic_allow
    FROM c
"""


@member(
    "doc_license_filter",
    doc="License / copyright notice filtering (The Stack-style "
    "governance gate, Kocetkov et al. 2022): synthesizes a "
    "deterministic notice per document (SPDX MIT / SPDX GPL-3.0-only "
    "/ copyright + all-rights-reserved / CC BY-NC / none), then "
    "detects SPDX id, CC marker, copyright lines, classifies "
    "(permissive / copyleft_or_other / non_commercial / cc_other / "
    "all_rights_reserved / none), and emits the keep verdict "
    "(permissive or unmarked -> allowed). Scale: scan-speed "
    "Java-and-RE2-portable regex expressions, zero shuffles.",
    oracle=_LIC_ORACLE,
)
def doc_license_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", *license_filter_cols())
