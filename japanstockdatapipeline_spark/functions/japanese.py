"""Japanese-era date handling (S7: MOF JGB CSV scan, mof/client.ts:
29-104 — `令和6年1月5日` → ISO date) as pure Catalyst expressions.

Era bases: 令和 (Reiwa) year 1 = 2019, 平成 (Heisei) 1 = 1989,
昭和 (Showa) 1 = 1926. 元年 ("first year") = year 1.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "era_date_to_iso",
    "iso_to_era_date",
    "zenkaku_to_hankaku",
    "hankaku_to_zenkaku",
    "HANKAKU_CHARS",
    "ZENKAKU_CHARS",
]

_ERA_BASE = {"令和": 2018, "平成": 1988, "昭和": 1925}

# Full-width <-> half-width (NFKC-subset) mapping for the ASCII
# alphanumerics the reference's scraped payloads carry (nikkei225jp /
# kabuyutai tables render numbers full-width; scraper/parser.ts
# normalizes before numeric parse). U+FF10-FF19 / U+FF21-FF3A /
# U+FF41-FF5A are exactly ASCII + 0xFEE0; the ideographic space
# U+3000 maps to ' '. A 1:1 codepoint map, so `translate` handles it
# JVM-side in both engines — no UDF, no ICU dependency.
HANKAKU_CHARS = (
    "0123456789"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz"
    " "
)
ZENKAKU_CHARS = "".join(chr(ord(c) + 0xFEE0) for c in HANKAKU_CHARS[:-1]) + "　"


def zenkaku_to_hankaku(col: Column) -> Column:
    """Normalize full-width ASCII alphanumerics (and the ideographic
    space) to half-width — the pre-parse normalization step for
    scraped Japanese numeric tables."""
    return F.translate(col, ZENKAKU_CHARS, HANKAKU_CHARS)


def hankaku_to_zenkaku(col: Column) -> Column:
    """Inverse mapping (half-width ASCII -> full-width), used to
    synthesize display-form text and to round-trip-test the
    normalizer."""
    return F.translate(col, HANKAKU_CHARS, ZENKAKU_CHARS)


def era_date_to_iso(col: Column) -> Column:
    """Parse `<era><y>年<m>月<d>日` (with 元年 for year 1) to a DateType;
    NULL for unparseable input."""
    era = F.regexp_extract(col, r"^(令和|平成|昭和)", 1)
    ystr = F.regexp_extract(col, r"^(?:令和|平成|昭和)(元|\d+)年", 1)
    # regexp_extract yields '' on no match; try_cast maps that to NULL
    # instead of an ANSI cast error
    y = F.when(ystr == "元", F.lit(1)).otherwise(ystr.try_cast("int"))
    m = F.regexp_extract(col, r"(\d+)月", 1).try_cast("int")
    d = F.regexp_extract(col, r"(\d+)日", 1).try_cast("int")
    base = F.lit(None).cast("int")
    for name, b in _ERA_BASE.items():
        base = F.when(era == name, F.lit(b)).otherwise(base)
    ok = base.isNotNull() & y.isNotNull() & m.isNotNull() & d.isNotNull()
    # build the ISO string and try_cast to date: make_date raises
    # under ANSI mode (Spark 4 default) on out-of-range fields
    # (月=13, 2月30日), which would abort the whole scan on one
    # malformed row — try_cast keeps the NULL-for-unparseable promise
    # for every invalid combination
    iso = F.concat_ws(
        "-",
        (base + y).cast("string"),
        F.lpad(m.cast("string"), 2, "0"),
        F.lpad(d.cast("string"), 2, "0"),
    )
    return F.when(ok, iso.try_cast("date"))


def iso_to_era_date(col: Column) -> Column:
    """Format a DateType as the era string (era chosen by the FULL
    transition date, 元年 for year 1) — the inverse of era_date_to_iso.

    Era boundaries are mid-year: 令和 from 2019-05-01, 平成 from
    1989-01-08 (before that, 昭和 64 ran Jan 1-7) — a year-only rule
    mislabels Jan-Apr 2019 and the first week of 1989. Dates before
    1926-12-25 (Taisho and earlier) are out of the reference's
    domain and render as non-positive 昭和 years."""
    y, m, d = F.year(col), F.month(col), F.dayofmonth(col)
    reiwa = col >= F.lit("2019-05-01").cast("date")
    heisei = col >= F.lit("1989-01-08").cast("date")
    era = (
        F.when(reiwa, F.lit("令和"))
        .when(heisei, F.lit("平成"))
        .otherwise(F.lit("昭和"))
    )
    base = F.when(reiwa, F.lit(2018)).when(heisei, F.lit(1988)).otherwise(F.lit(1925))
    ey = y - base
    eys = F.when(ey == 1, F.lit("元")).otherwise(ey.cast("string"))
    return F.concat(
        era, eys, F.lit("年"), m.cast("string"), F.lit("月"), d.cast("string"), F.lit("日")
    )
