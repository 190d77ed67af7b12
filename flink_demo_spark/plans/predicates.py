"""Predicate & remaining scalar-function coverage (SURVEY.md §2.9
comparison/logic rows; SqlFuncTest.scala:52-135, 224-292) plus
multimodal plumbing entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import multimodal
from .registry import query


@query(
    "predicate_suite",
    oracle="""
    SELECT p_partkey,
           (p_size BETWEEN 10 AND 20)                    AS in_range,
           (p_type IS NOT DISTINCT FROM 'ECONOMY')       AS is_economy,
           (p_name LIKE '%bolt%')                        AS has_bolt,
           regexp_matches(p_name, '^(red|blue)')         AS color_start,
           (p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')) AS low_brand,
           (p_retailprice IS NULL)                       AS price_null,
           (p_size > 25 AND p_retailprice < 1500.0)      AS big_cheap,
           NOT (p_size > 25 OR p_retailprice < 500.0)    AS neither
    FROM part
    WHERE p_partkey < 300
    ORDER BY p_partkey
    """,
    doc=(
        "comparison/logic predicate parity (reference SqlFuncTest.scala:"
        "52-135: BETWEEN, IS [NOT] DISTINCT FROM, LIKE, SIMILAR TO->rlike, "
        "IN list, IS NULL, AND/OR/NOT three-valued logic)."
    ),
)
def predicate_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.col("p_size").between(10, 20).alias("in_range"),
        F.col("p_type").eqNullSafe("ECONOMY").alias("is_economy"),
        F.col("p_name").like("%bolt%").alias("has_bolt"),
        F.col("p_name").rlike("^(red|blue)").alias("color_start"),
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3").alias("low_brand"),
        F.col("p_retailprice").isNull().alias("price_null"),
        ((F.col("p_size") > 25) & (F.col("p_retailprice") < 1500.0)).alias(
            "big_cheap"
        ),
        (~((F.col("p_size") > 25) | (F.col("p_retailprice") < 500.0))).alias(
            "neither"
        ),
    )


@query(
    "scalar_string_funcs2",
    oracle="""
    SELECT doc_id,
           translate(source, '0123456789', 'abcdefghij')            AS translated,
           str_split(source, 'c')[1]                                AS before_c,
           regexp_extract(source, '([0-9]+)', 1)                    AS src_num,
           regexp_replace(lang, '[aeiou]', '*')                     AS starred,
           CAST(octet_length(encode(lang)) AS INT)                  AS lang_bytes,
           to_base64(encode(lang))                                  AS lang_b64,
           sha256(lang)                                             AS lang_sha,
           concat(lang, '-', source)                                AS lang_src,
           lpad(lang, 5, '_')                                       AS padded_l,
           rpad(lang, 5, '_')                                       AS padded_r,
           repeat(lang, 2)                                          AS doubled,
           reverse(lang)                                            AS rev,
           left(lang, 1)                                            AS l1,
           right(lang, 1)                                           AS r1,
           CAST(ascii(lang) AS INT)                                 AS first_code,
           chr(ascii(lang))                                         AS first_char,
           CAST(strpos(source, 'c') AS INT)                         AS c_pos,
           upper(substr(lang, 1, 1)) || substr(lang, 2)             AS capped,
           substr(source, 1, 1) || 'XX' || substr(source, 4)        AS overlaid
    FROM documents
    WHERE doc_id < 100
    ORDER BY doc_id
    """,
    doc=(
        "second string batch, one wide query (reference SqlFuncTest."
        "scala:224-292: translate, split_index, regexp_extract, "
        "regexp_replace, encode, to_base64, sha2, concat, lpad, rpad, "
        "repeat, reverse, left, right, ascii, chr, locate/position, "
        "initcap, overlay ... placing). DuckDB lacks initcap/overlay, "
        "so the oracle emulates both with substr concatenation — exact "
        "on this single-word column. (Formerly two registry entries; "
        "merged so the driver's fixed sample reaches more operators.)"
    ),
)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.translate("source", "0123456789", "abcdefghij").alias("translated"),
        F.element_at(F.split("source", "c"), 1).alias("before_c"),
        F.regexp_extract("source", r"([0-9]+)", 1).alias("src_num"),
        F.regexp_replace("lang", "[aeiou]", "*").alias("starred"),
        F.length(F.encode("lang", "UTF-8")).alias("lang_bytes"),
        F.base64(F.encode("lang", "UTF-8")).alias("lang_b64"),
        F.sha2(F.col("lang"), 256).alias("lang_sha"),
        F.concat_ws("-", "lang", "source").alias("lang_src"),
        F.lpad("lang", 5, "_").alias("padded_l"),
        F.rpad("lang", 5, "_").alias("padded_r"),
        F.repeat("lang", 2).alias("doubled"),
        F.reverse("lang").alias("rev"),
        F.expr("left(lang, 1)").alias("l1"),
        F.expr("right(lang, 1)").alias("r1"),
        F.ascii("lang").alias("first_code"),
        F.expr("char(ascii(lang))").alias("first_char"),
        F.instr("source", "c").alias("c_pos"),
        F.initcap("lang").alias("capped"),
        F.overlay("source", F.lit("XX"), F.lit(2), F.lit(2)).alias("overlaid"),
    )


@query(
    "multimodal_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text)                                  AS digest
    FROM documents
    ORDER BY doc_id
    """,
    doc=(
        "multimodal plumbing: documents as opaque binary payloads -> "
        "mapInPandas (Arrow batches) feature extraction. Deterministic "
        "features (size + digest) are oracle-checked; the decode step is "
        "a stub (no codecs in this container) but the schema/batch/"
        "pruning plumbing is the production pattern."
    ),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    feats = multimodal.extract_features(docs, "doc_id", "payload")
    return feats.select("doc_id", "n_bytes", "digest")


@query(
    "multimodal_frame_sample",
    # the corpus text is pure ASCII (verified: octet_length == length
    # for every row), so the stub's byte slices equal char slices and
    # the chunk digests are exact SQL
    oracle="""
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS len
      FROM documents WHERE octet_length(encode(text)) > 0
    ), f AS (
      SELECT doc_id, text, greatest(len // 4, 1) AS step,
             unnest(generate_series(0, least(4, len) - 1)) AS frame_no
      FROM d
    )
    SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
           md5(substr(text, frame_no * step + 1, step)) AS frame_digest
    FROM f
    ORDER BY doc_id, frame_no
    """,
    doc=(
        "video-style frame sampling: binary payload -> mapInPandas -> "
        "one row per sampled frame (explode-shaped UDF output); chunk "
        "digests fully oracle-backed (ASCII corpus: byte == char "
        "slices)."
    ),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return multimodal.frame_sample(docs, "doc_id", "payload", n_frames=4)


# (scalar_string_funcs3 merged into scalar_string_funcs2 above)
