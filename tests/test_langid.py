"""Golden-snippet + engine-parity tests for the language-ID operator.

The sf0.01 parity gate checks lang_id_ngram's determinism but not its
discrimination (the synthetic corpus shares one English-ish vocabulary
across its lang labels). These goldens pin the actual classification
behavior on real multilingual text — including the accented and CJK
characters the synthetic corpus lacks — and cross-check the Spark
expression against the DuckDB oracle formulation on the same snippets,
so a Unicode length/replace semantics drift between the engines would
surface here rather than silently at a future gate.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from flink_demo_spark.operators import langid

# (expected_lang, snippet) — hand-written sentences, one per model
# language plus mixed/empty edge cases
SNIPPETS = [
    ("en", "the cat sat on the mat and looked at the dog in the garden"),
    ("en", "this is the house that jack built and it is a fine house"),
    ("de", "der hund und die katze sind nicht in dem haus geblieben"),
    ("de", "das ist ein gutes buch und der autor ist nicht zu jung"),
    ("fr", "le chat est dans la maison et les enfants sont dans le jardin"),
    ("fr", "une question que le professeur pose est dans le livre du maitre"),
    ("es", "el perro y los gatos comen en la casa para una fiesta"),
    ("es", "la situación y la información son importantes para el país"),
    ("zh", "我是中国人，我在北京的大学学习了很多东西。"),
    ("zh", "他说的是真的，我在这里等了你很久。"),
    ("und", "xyzzy plugh qwertz uiop"),
    ("und", ""),
]


@pytest.fixture(scope="module")
def scored(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (_, s) in enumerate(SNIPPETS)], "doc_id long, text string"
    )
    rows = langid.with_lang_scores(df).orderBy("doc_id").collect()
    return rows


def test_golden_snippets_classify(scored):
    for row, (want, snippet) in zip(scored, SNIPPETS):
        assert row["pred_lang"] == want, (snippet, row.asDict())


def test_scores_positive_iff_classified(scored):
    for row in scored:
        if row["pred_lang"] == "und":
            assert row["mx"] <= 0
        else:
            assert row["mx"] > 0
            assert row[f"s_{row['pred_lang']}"] == row["mx"]


def test_duckdb_oracle_agrees_on_snippets(scored):
    """The oracle formulation (// division, DuckDB string primitives)
    must produce identical scores AND predictions on text with accents
    and CJK — the Unicode surface the parquet corpus never exercises."""
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": range(len(SNIPPETS)), "text": [s for _, s in SNIPPETS]}
        ),
    )
    sql = f"""
    WITH {langid.oracle_scored_cte(keep_cols="doc_id")}
    SELECT * FROM __lid_scored ORDER BY doc_id
    """
    oracle = con.execute(sql).fetchdf().to_dict("records")
    assert len(oracle) == len(scored)
    for srow, orow in zip(scored, oracle):
        assert srow["pred_lang"] == orow["pred_lang"], (srow, orow)
        for l in langid.PRIORITY:
            assert srow[f"s_{l}"] == orow[f"s_{l}"], (l, srow, orow)


def test_tie_break_priority_is_deterministic(spark):
    """Equal max scores resolve to the FIRST language in PRIORITY: a
    text scoring identically for en and de must come out en."""
    # ' to ' (en, 120) vs ' zu ' (de, 100) + ' ein '? craft exact tie:
    # en ' is ' = 100 bp; de ' zu ' = 100 bp -> one occurrence each
    df = spark.createDataFrame([(0, "is zu")], "doc_id long, text string")
    row = langid.with_lang_scores(df).collect()[0]
    assert row["s_en"] == row["s_de"] == 100
    assert row["pred_lang"] == "en"
