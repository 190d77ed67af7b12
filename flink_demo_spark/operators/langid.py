"""Content-based language identification from raw text.

The one standard LLM-pipeline stage the corpus operators were missing
(round-9 verdict #3): every consumer here (temperature mixing,
per-language quantiles) took a pre-labeled ``lang`` column, but a real
crawl pipeline derives it from the bytes. This is the classic
function-word / character-n-gram profile scorer (Cavnar & Trenkle
1994, "N-Gram-Based Text Categorization"; the same family as Google's
public CLD and langid.py): each language has a small profile of
highly-characteristic patterns — space-delimited function words for
the Latin-script languages, single high-frequency characters for
Chinese — and a document's score per language is the weighted count of
profile-pattern occurrences. The predicted language is the argmax,
``'und'`` (undetermined, the BCP-47 convention) when no pattern fires.

Determinism contract (this repo's oracle style): weights are INTEGER
log-odds-shaped values in basis points, occurrence counts are exact
integers via the length-difference identity

    occ(p, t) = (length(t) - length(replace(t, p, ''))) / length(p)

over ``' ' || lower(text) || ' '``, and the argmax tie-breaks by a
fixed language priority — so the whole operator is integer arithmetic
plus string primitives that Spark and DuckDB implement identically
(both ``length``s count Unicode code points), and the DuckDB oracle
mirrors the engine bit-for-bit. The two engines differ only in the
integer-division spelling (Spark ``DIV``, DuckDB ``//``), which is why
every generator below takes an ``intdiv`` argument.

Scale shape: pure per-row JVM string expressions — no shuffle, no UDF,
no Python; at 100 TB this is a map-only stage fused into the scan by
whole-stage codegen. The profile is a compile-time literal (a few
dozen patterns), so per-row cost is O(patterns x text length) inside
codegen, the same shape CLD ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# argmax tie-break priority (first match wins on equal scores) — part
# of the operator's public contract, mirrored verbatim in the oracle.
PRIORITY = ["en", "de", "es", "fr", "zh"]

# per-language profiles: (pattern, weight in basis points). Patterns
# are matched against ' ' || lower(text) || ' ', so ' the ' matches
# the word "the" with word boundaries. Function words are the most
# discriminative low-order features (Cavnar & Trenkle §4); weights are
# hand-rounded relative log-frequencies, integer so scores stay exact.
MODEL: dict[str, list[tuple[str, int]]] = {
    "en": [
        (" the ", 300), (" and ", 200), (" of ", 160), (" to ", 120),
        (" that ", 150), (" is ", 100), (" in ", 80), (" a ", 40),
    ],
    "de": [
        (" der ", 280), (" die ", 280), (" und ", 250), (" das ", 220),
        (" nicht ", 220), (" ist ", 200), (" ein ", 160), (" zu ", 100),
        ("sch", 50),
    ],
    "es": [
        (" el ", 260), (" los ", 260), (" y ", 220), (" para ", 220),
        (" es ", 180), (" una ", 160), (" la ", 140), (" que ", 110),
        (" en ", 90), ("ción", 260),
    ],
    "fr": [
        (" les ", 260), (" le ", 250), (" dans ", 220), (" et ", 200),
        (" est ", 200), (" une ", 180), (" la ", 140), (" du ", 130),
        (" que ", 110),
    ],
    "zh": [
        ("的", 300), ("是", 250), ("了", 240), ("在", 220), ("我", 200),
        ("中", 160), ("国", 150),
    ],
}

PADDED_TEXT_SQL = "concat(' ', lower({col}), ' ')"


def occurrences_sql(pattern: str, intdiv: str, t: str = "__t") -> str:
    """Exact occurrence count of a literal pattern in column ``t``."""
    esc = pattern.replace("'", "''")
    return (
        f"((length({t}) - length(replace({t}, '{esc}', '')))"
        f" {intdiv} {len(pattern)})"
    )


def score_sql(lang: str, intdiv: str, t: str = "__t") -> str:
    """Integer basis-point score of ``t`` for ``lang``."""
    terms = [
        f"{w} * {occurrences_sql(p, intdiv, t)}" for p, w in MODEL[lang]
    ]
    return "(" + " + ".join(terms) + ")"


def greatest_sql() -> str:
    return "greatest(" + ", ".join(f"s_{l}" for l in PRIORITY) + ")"


def pred_case_sql() -> str:
    """CASE over s_<lang> + mx columns: first PRIORITY lang at the max."""
    whens = " ".join(f"WHEN s_{l} = mx THEN '{l}'" for l in PRIORITY)
    return f"CASE WHEN mx <= 0 THEN 'und' {whens} END"


def with_lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``s_<lang>`` (long), ``mx`` (long) and ``pred_lang``.

    Pure column expressions (Spark SQL text via ``F.expr`` so the
    formulation is literally the oracle's with ``DIV`` for ``//``);
    the padded lowered text is a named column so codegen evaluates
    lower() once per row, not once per pattern.
    """
    padded = df.withColumn(
        "__t", F.expr(PADDED_TEXT_SQL.format(col=text_col))
    )
    scored = padded.select(
        "*",
        *[
            F.expr(score_sql(l, "DIV")).cast("long").alias(f"s_{l}")
            for l in PRIORITY
        ],
    ).withColumn(
        "mx", F.greatest(*[F.col(f"s_{l}") for l in PRIORITY]).cast("long")
    )
    return scored.withColumn("pred_lang", F.expr(pred_case_sql())).drop("__t")


def oracle_scored_cte(src: str = "documents", keep_cols: str = "doc_id") -> str:
    """DuckDB CTE chain ``__lid_pad -> __lid_scored`` ending with
    (keep_cols, s_<lang>..., mx, pred_lang) — prepend to an oracle that
    consumes derived labels."""
    score_cols = ",\n             ".join(
        f"CAST({score_sql(l, '//')} AS BIGINT) AS s_{l}" for l in PRIORITY
    )
    return f"""
    __lid_pad AS (
      SELECT {keep_cols}, {PADDED_TEXT_SQL.format(col='text')} AS __t
      FROM {src}
    ), __lid_s AS (
      SELECT {keep_cols},
             {score_cols}
      FROM __lid_pad
    ), __lid_scored AS (
      SELECT {keep_cols}, {", ".join(f"s_{l}" for l in PRIORITY)},
             {greatest_sql()} AS mx,
             {pred_case_sql()} AS pred_lang
      FROM __lid_s
    )"""
