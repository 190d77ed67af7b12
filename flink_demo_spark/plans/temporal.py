"""Event-time operators: windows, interval join, as-of join, sessions,
pattern detection (SURVEY.md §2.7 group windows, §2.5 interval/temporal
joins, §2.12 CEP batch form).

All run on the ``events`` table (event_id, ts, user_id, event_type,
value, props). events.ts is nanosecond parquet: the Spark loader
truncates to µs and every oracle casts ``ts`` to TIMESTAMP so both
engines compare at µs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.asof import asof_join
from ..operators.sessionize import sessionize
from .registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@query(
    "window_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*)             AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc=(
        "TUMBLE window agg (reference QueryTest.scala:375-385, "
        "SpendReportJob.scala:103-109): groupBy(window(ts,'1 hour'))."
    ),
    bench=True,
)
def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        
    )


@query(
    "window_sliding",
    oracle="""
    SELECT window_start, count(*) AS n_events, CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM (
      SELECT time_bucket(INTERVAL 30 MINUTES, CAST(e.ts AS TIMESTAMP))
               - (o.off * INTERVAL 30 MINUTES) AS window_start,
             e.value
      FROM events e CROSS JOIN (VALUES (0), (1)) AS o(off)
    )
    GROUP BY window_start
    ORDER BY window_start
    """,
    doc=(
        "HOP/sliding window, 1h size / 30m slide (reference "
        "Window.scala:94, TableDemo slide demos): each event in 2 windows."
    ),
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
        
    )


@query(
    "window_session",
    oracle="""
    WITH marked AS (
      -- (event_id tiebreak in BOTH window passes: tied timestamps must
      -- see one shared total order or the marking and numbering passes
      -- can disagree — the instability class the sf1 sweep exposed in
      -- the sensor-keyed session oracle)
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
             CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL THEN 1
                  WHEN CAST(ts AS TIMESTAMP) >= lag(CAST(ts AS TIMESTAMP)) OVER w
                       + INTERVAL 30 MINUTES THEN 1
                  ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           count(*) AS n_events, CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc=(
        "session window, 30m gap (reference EventTimeSessionWindows "
        "Window.scala:124; Table Session withGap): session_window()."
    ),
    bench=True,
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
        
    )


@query(
    "window_tumbling_offset",
    oracle="""
    SELECT time_bucket(INTERVAL 1 DAY, CAST(ts AS TIMESTAMP),
                       TIMESTAMP '1970-01-01 08:00:00') AS window_start,
           count(*) AS n_events
    FROM events
    GROUP BY 1 ORDER BY 1
    """,
    doc=(
        "tumbling window with offset (reference TumbleOffsetApp.scala:41): "
        "day windows shifted +8h, window(ts, '1 day', '1 day', '8 hours')."
    ),
)
def window_tumbling_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 day", "1 day", "8 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
        .orderBy("window_start")
    )


@query(
    "interval_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 10 MINUTES
     AND c.ts <= p.ts
    ORDER BY purchase_id, click_id
    """,
    doc=(
        "interval join (reference QueryTest.scala:1040-1091, "
        "TxMatch.scala:51-76): clicks within 10min before each purchase."
    ),
    bench=True,
)
def interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select("purchase_id", "click_id", "user_id")
        
    )


@query(
    "asof_join_latest_signup",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           s.event_id AS signup_id
    FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    ORDER BY purchase_id
    """,
    doc=(
        "as-of / temporal join (reference TemporalJoinTest.scala:19-70, "
        "FOR SYSTEM_TIME AS OF): latest signup at or before each purchase, "
        "via the union+last_value single-shuffle operator."
    ),
    bench=True,
)
def asof_join_latest_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        signups,
        on="user_id",
        probe_time="ts",
        build_time="ts",
        payload_cols=["signup_id"],
    )
    return joined.select("purchase_id", "user_id", "signup_id")


@query(
    "pattern_error_burst",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
             lag(event_type) OVER w AS prev_type,
             lag(event_id)   OVER w AS prev_id,
             lag(CAST(ts AS TIMESTAMP)) OVER w AS prev_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    )
    SELECT user_id, prev_id AS first_error_id, event_id AS second_error_id
    FROM seq
    WHERE event_type = 'error' AND prev_type = 'error'
      AND ts <= prev_ts + INTERVAL 30 MINUTES
    ORDER BY user_id, first_error_id
    """,
    doc=(
        "CEP 'fail NEXT fail WITHIN t' (reference LoginFail.scala:78-86, "
        "CEPDemo next/within): two strictly consecutive errors per user "
        "within 30min — batch form via lag."
    ),
)
def pattern_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("event_id").over(w).alias("prev_id"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    return (
        seq.where(
            (F.col("event_type") == "error")
            & (F.col("prev_type") == "error")
            & (F.col("ts") <= F.col("prev_ts") + F.expr("INTERVAL 30 MINUTES"))
        )
        .select(
            "user_id",
            F.col("prev_id").alias("first_error_id"),
            F.col("event_id").alias("second_error_id"),
        )
        
    )


@query(
    "sessionize_operator",
    oracle="""
    WITH marked AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL THEN 1
                  WHEN CAST(ts AS TIMESTAMP) >= lag(CAST(ts AS TIMESTAMP)) OVER w
                       + INTERVAL 1 HOUR THEN 1
                  ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
    )
    SELECT user_id,
           CAST(sum(is_new) AS BIGINT)  AS n_sessions,
           count(*)                     AS n_events
    FROM marked GROUP BY user_id
    ORDER BY user_id
    """,
    doc="sessionize() operator: per-user session counts at 1h gap.",
)
def sessionize_operator(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    s = sessionize(ev, "user_id", "ts", "1 HOUR")
    return (
        s.groupBy("user_id")
        .agg(
            F.max("session_id").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        
    )


@query(
    "window_session_dynamic",
    oracle="""
    WITH g AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id,
             CASE WHEN event_type = 'click' THEN INTERVAL 10 MINUTES
                  ELSE INTERVAL 45 MINUTES END AS gap
      FROM events
    ), marked AS (
      -- shared (ts, event_id) order in both passes: see window_session
      SELECT user_id, ts, value, event_id,
             CASE WHEN max(ts + gap) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL THEN 1
                  WHEN ts >= max(ts + gap) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) THEN 1 ELSE 0 END AS is_new
      FROM g
    ), sess AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
    doc=(
        "dynamic-gap session window (reference Window.scala:157 "
        "SessionWindowTimeGapExtractor): gap depends on the event "
        "(clicks 10min, others 45min) — session_window(ts, CASE ...); "
        "oracle = running-max-end chain rule."
    ),
)
def window_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    gap = F.when(F.col("event_type") == "click", F.lit("10 minutes")).otherwise(
        F.lit("45 minutes")
    )
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")), 2
                ).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
        
    )


# session-lifetime demo broker for the Kafka round-trip query: one
# in-process wire-protocol broker, one produced topic per sf_dir (so
# repeated calls in a session stay idempotent — no duplicate produce)
_KAFKA_DEMO: dict = {}
_KAFKA_DEMO_LOCK = __import__("threading").Lock()


def _kafka_demo_topic(spark, sf_dir: str) -> tuple:
    """(broker, topic) for sf_dir — broker started and topic produced
    exactly once per process, safe under concurrent query calls."""
    from ..sources.kafka import encode_events_as_kafka
    from ..sources.kafka_broker import KafkaTestBroker
    from ..sources.kafka_wire import kafka_wire_sink

    with _KAFKA_DEMO_LOCK:
        if "broker" not in _KAFKA_DEMO:
            _KAFKA_DEMO["broker"] = KafkaTestBroker(num_partitions=3)
        broker = _KAFKA_DEMO["broker"]
        key = ("topic", sf_dir)
        if key not in _KAFKA_DEMO:
            topic = f"events_{abs(hash(sf_dir)) % 10**8}"
            wire = encode_events_as_kafka(_events(spark, sf_dir), topic)
            kafka_wire_sink((broker.host, broker.port), topic)(wire, batch_id=0)
            _KAFKA_DEMO[key] = topic
        return broker, _KAFKA_DEMO[key]


@query(
    "kafka_roundtrip_window",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           count(*)             AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    bench=True,
    doc=(
        "full Kafka round-trip, END TO END THROUGH A LIVE BROKER: the "
        "events table is JSON-encoded and PRODUCED over the Kafka wire "
        "protocol from executors (keyed by user_id, default murmur2 "
        "partitioner) to an in-process single-node broker, read back "
        "with spark.read.format('kafka_wire') (one task per Kafka "
        "partition), decoded with the shared codec, and hourly "
        "window-aggregated (reference Source.scala:116-155 consumer -> "
        "QueryTest.scala:375-385 TUMBLE). The oracle aggregates the "
        "raw events table directly, so a green row proves the whole "
        "produce/fetch/decode path is lossless."
    ),
)
def kafka_roundtrip_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.kafka import decode_events_from_kafka
    from ..sources.kafka_wire import register_kafka_wire

    broker, topic = _kafka_demo_topic(spark, sf_dir)
    register_kafka_wire(spark)
    back = decode_events_from_kafka(
        spark.read.format("kafka_wire")
        .option("bootstrap", f"{broker.host}:{broker.port}")
        .option("topic", topic)
        .load()
    )
    out = (
        back.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")), 2
                ).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
            "sum_value",
        )
    )
    return out


@query(
    "temporal_join_system_time_sql",
    # DuckDB's native ASOF LEFT JOIN is the oracle for Flink's
    # FOR SYSTEM_TIME AS OF; rate versions are aggregated unique per
    # (currency, rowtime) so the latest-version pick is tie-free in
    # both engines
    oracle="""
    WITH o AS (
      SELECT event_id AS order_id,
             'C' || CAST(user_id % 7 AS VARCHAR) AS currency,
             event_id % 97 AS amount,
             CAST(ts AS TIMESTAMP) AS rowtime
      FROM events WHERE event_type = 'purchase'
    ), r AS (
      SELECT 'C' || CAST(user_id % 7 AS VARCHAR) AS currency,
             CAST(ts AS TIMESTAMP) AS rowtime,
             max(event_id) % 50 + 1 AS rate
      FROM events WHERE event_type = 'click'
      GROUP BY 1, 2
    )
    SELECT o.order_id, o.currency, o.amount, r.rate,
           o.amount * r.rate AS converted,
           r.rowtime AS r_time
    FROM o ASOF LEFT JOIN r
      ON o.currency = r.currency AND o.rowtime >= r.rowtime
    ORDER BY order_id
    """,
    doc=(
        "FOR SYSTEM_TIME AS OF SQL front-end (reference "
        "QueryTest.scala:777-846 temporalJoin, "
        "TemporalJoinTest.scala:74-124 — their query text runs "
        "verbatim, see test_temporal_join_sql_reference_text_verbatim):"
        " the LEFT temporal join lowered onto the union+last_value "
        "single-shuffle asof plan, carrying the matched version's own "
        "rowtime. Oracle = DuckDB native ASOF LEFT JOIN."
    ),
)
def temporal_join_system_time_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import temporal_join_sql

    ev = _events(spark, sf_dir)
    currency = F.concat(F.lit("C"), (F.col("user_id") % 7).cast("string"))
    ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("order_id"),
        currency.alias("currency"),
        (F.col("event_id") % 97).alias("amount"),
        F.col("ts").alias("rowtime"),
    ).createOrReplaceTempView("temporal_orders_v")
    ev.where(F.col("event_type") == "click").groupBy(
        currency.alias("currency"), F.col("ts").alias("rowtime")
    ).agg((F.max("event_id") % 50 + 1).alias("rate")).createOrReplaceTempView(
        "temporal_rates_v"
    )
    return temporal_join_sql(
        spark,
        """
        SELECT o.order_id, o.currency, o.amount, r.rate,
               o.amount * r.rate AS converted,
               r.rowtime AS r_time
        FROM temporal_orders_v o
        LEFT JOIN temporal_rates_v FOR SYSTEM_TIME AS OF o.rowtime AS r
        ON o.currency = r.currency
        """,
    )


# ---------------------------------------------------------------------------
# Group-window SQL front-end (TUMBLE / HOP / SESSION text runs verbatim)
# ---------------------------------------------------------------------------


@query(
    "group_window_sql_tumble",
    oracle="""
    SELECT user_id AS account_id,
           time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS log_ts,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS amount
    FROM events
    GROUP BY 1, 2
    """,
    doc=(
        "Flink TUMBLE group-window SQL run verbatim (reference "
        "SpendReportJob.scala:95-104): TUMBLE_START projection + "
        "GROUP BY TUMBLE lowered onto window(ts,'1 hour') by "
        "operators/group_window_sql.py. Amounts are integer cents so "
        "SUM is exact on both engines."
    ),
)
def group_window_sql_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.group_window_sql import group_window_sql

    _events(spark, sf_dir).select(
        F.col("user_id").alias("account_id"),
        F.col("ts").alias("transaction_time"),
        F.round(F.col("value") * 100).cast("long").alias("amount"),
    ).createOrReplaceTempView("transactions")
    # reference SpendReportJob.scala:98-104, verbatim
    return group_window_sql(
        spark,
        """SELECT
 account_id,
 TUMBLE_START(transaction_time,INTERVAL '1' HOUR) as log_ts,
 SUM(amount) AS amount
 FROM transactions
 GROUP BY account_id,TUMBLE(transaction_time,INTERVAL '1' HOUR)
""",
    )


@query(
    "group_window_sql_tumble_having",
    oracle="""
    SELECT time_bucket(INTERVAL 5 SECOND, CAST(ts AS TIMESTAMP)) AS "start",
           event_type AS class,
           CAST(user_id % 3 AS VARCHAR) AS stu,
           CAST(SUM(CAST(round(value) AS BIGINT)) AS BIGINT) AS sum_score
    FROM events
    GROUP BY 1, 2, 3
    HAVING SUM(CAST(round(value) AS BIGINT)) > 10
    """,
    doc=(
        "Flink TUMBLE group-window SQL with HAVING run verbatim "
        "(reference QueryTest.scala:375-385 groupby): backticked "
        "`start` alias, multi-key GROUP BY, HAVING over the windowed "
        "aggregate."
    ),
)
def group_window_sql_tumble_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.group_window_sql import group_window_sql

    _events(spark, sf_dir).select(
        F.col("ts").alias("rowtime"),
        F.col("event_type").alias("class"),
        (F.col("user_id") % 3).cast("string").alias("stu"),
        F.round(F.col("value")).cast("long").alias("score"),
    ).createOrReplaceTempView("records")
    # reference QueryTest.scala:375-385, verbatim
    return group_window_sql(
        spark,
        """select
 tumble_start(rowtime, interval '5' seconds) as `start`
 ,class
 ,stu
 ,sum(score) as sum_score
from records
group by tumble(rowtime, interval '5' seconds),class,stu
having sum(score) > 10
""",
    )


@query(
    "group_window_sql_hop",
    oracle="""
    WITH sensor AS (
      SELECT event_type AS id, CAST(ts AS TIMESTAMP) AS t,
             CAST(round(value * 100) AS BIGINT) AS vc
      FROM events
    ), exp AS (
      SELECT id, vc,
             time_bucket(INTERVAL 5 SECOND, t) - g.k * INTERVAL 5 SECOND AS ws
      FROM sensor CROSS JOIN (VALUES (0), (1)) AS g(k)
    )
    SELECT id,
           strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(ws + INTERVAL 10 SECOND, '%Y-%m-%d %H:%M:%S') AS window_end,
           CAST(SUM(vc) AS BIGINT) AS vc_sum
    FROM exp
    GROUP BY 1, 2, 3
    """,
    doc=(
        "Flink HOP group-window SQL run verbatim (reference "
        "TableDemo.scala:793-798): Flink's (ts, slide, size) argument "
        "order swapped onto Spark's window(ts, size, slide); "
        "HOP_START/HOP_END inside DATE_FORMAT become window.start/end."
    ),
)
def group_window_sql_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.group_window_sql import group_window_sql

    _events(spark, sf_dir).select(
        F.col("event_type").alias("id"),
        F.col("ts").alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    ).createOrReplaceTempView("sensor")
    # reference TableDemo.scala:793-798, verbatim
    return group_window_sql(
        spark,
        """select id,
DATE_FORMAT(HOP_START(t,INTERVAL '5' SECOND,INTERVAL '10' SECOND),'yyyy-MM-dd HH:mm:ss') as window_start,
DATE_FORMAT(HOP_END(t,INTERVAL '5' SECOND,INTERVAL '10' SECOND),'yyyy-MM-dd HH:mm:ss') as window_end,
SUM(vc) as vc_sum
from sensor
group by id,HOP(t,INTERVAL '5' SECOND,INTERVAL '10' SECOND)
""",
    )


@query(
    "group_window_sql_session",
    oracle="""
    WITH sensor AS (
      SELECT event_type AS id, CAST(ts AS TIMESTAMP) AS t,
             CAST(round(value * 100) AS BIGINT) AS vc,
             event_id AS eid
      FROM events
    ), marked AS (
      -- both window passes MUST share one deterministic total order:
      -- with tied timestamps (common at 10x density) an ORDER BY t
      -- alone lets LAG and the running SUM break ties differently and
      -- garble session labels (caught by the sf1 sweep); the tiebreak
      -- does not change session CONTENT (tied rows merge either way,
      -- delta 0 <= gap)
      SELECT id, t, vc,
             CASE WHEN t - LAG(t) OVER (PARTITION BY id ORDER BY t, eid)
                       <= INTERVAL 3 SECOND
                  THEN 0 ELSE 1 END AS new_s,
             eid
      FROM sensor
    ), gs AS (
      SELECT *, SUM(new_s) OVER (
        PARTITION BY id ORDER BY t, eid ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT id,
           strftime(MIN(t), '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(MAX(t) + INTERVAL 3 SECOND, '%Y-%m-%d %H:%M:%S') AS window_end,
           CAST(SUM(vc) AS BIGINT) AS vc_sum
    FROM gs
    GROUP BY id, sid
    """,
    doc=(
        "Flink SESSION group-window SQL run verbatim (reference "
        "TableDemo.scala:878-883): SESSION/SESSION_START/SESSION_END "
        "lowered onto session_window(ts, gap); oracle is the "
        "gaps-and-islands formulation (session end = last event + gap, "
        "Flink's and Spark's shared rule)."
    ),
)
def group_window_sql_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.group_window_sql import group_window_sql

    _events(spark, sf_dir).select(
        F.col("event_type").alias("id"),
        F.col("ts").alias("t"),
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    ).createOrReplaceTempView("sensor")
    # reference TableDemo.scala:878-883, verbatim
    return group_window_sql(
        spark,
        """select id,
DATE_FORMAT(SESSION_START(t,INTERVAL '3' SECOND),'yyyy-MM-dd HH:mm:ss') as window_start,
DATE_FORMAT(SESSION_END(t,INTERVAL '3' SECOND),'yyyy-MM-dd HH:mm:ss') as window_end,
SUM(vc) as vc_sum
from sensor
group by id,SESSION(t,INTERVAL '3' SECOND)
""",
    )


@query(
    "group_window_sql_clicks",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
           event_type AS name,
           CAST(count(props) AS BIGINT) AS cnt
    FROM events
    GROUP BY 1, 2
    """,
    doc=(
        "Flink TUMBLE group-window SQL run verbatim (reference "
        "TableSQLFunc.scala:951-963 hourly click counts): plural "
        "'HOURS' interval unit, COUNT over a nullable column, "
        "multi-line GROUP BY with leading-comma style."
    ),
)
def group_window_sql_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.group_window_sql import group_window_sql

    _events(spark, sf_dir).select(
        F.col("event_type").alias("name"),
        F.col("ts").alias("ctime"),
        F.col("props").alias("url"),
    ).createOrReplaceTempView("clicks")
    # reference TableSQLFunc.scala:951-963, verbatim
    return group_window_sql(
        spark,
        """
select
 TUMBLE_START(ctime, INTERVAL '1' HOURS) as window_start
 ,name
 ,count(url) as cnt
from clicks
group by TUMBLE(ctime, INTERVAL '1' HOURS)
,name

""",
    )


@query(
    "window_cumulate",
    oracle="""
    WITH e AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS es
      FROM events
    ), w AS (
      SELECT event_type,
             es // 14400 * 14400 AS ws,
             (es - es // 14400 * 14400) // 3600 + 1 AS j_min
      FROM e
    ), x AS (
      SELECT event_type, ws, ws + j * 3600 AS we
      FROM w, LATERAL unnest(generate_series(j_min, 4)) AS g(j)
    )
    SELECT CAST(ws AS BIGINT) AS window_start_s,
           CAST(we AS BIGINT) AS window_end_s,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM x GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    doc=(
        "CUMULATE window TVF (Flink SQL's fourth window kind, beyond "
        "the reference's TUMBLE/HOP/SESSION usage) - expanding "
        "early-fire windows: within each 4-hour max span, windows "
        "[start, start+1h), [start, start+2h) ... [start, 4h) all "
        "fire, each event landing in every cumulate window that ends "
        "AFTER it. Spark has no native cumulate, but the semantics "
        "are exactly an integer explode: align to the span, compute "
        "the first covering step, explode sequence(j_min, n_steps) - "
        "pure integer epoch math (no timezone, no float), one "
        "explode + one shuffle on the (span, end, type) key; the "
        "fan-out factor is n_steps (4), a constant - scales like any "
        "tumbling agg. Window bounds emitted as epoch seconds "
        "(integer-exact on both engines)."
    ),
)
def window_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    step, size, n_steps = 3600, 14400, 4
    es = F.col("ts").cast("long")
    base = ev.select(
        "event_type",
        (es - (es % size)).alias("ws"),
        ((es % size) / step).cast("long").alias("j0"),
    )
    x = base.select(
        "event_type",
        "ws",
        F.explode(F.sequence(F.col("j0") + 1, F.lit(n_steps))).alias("j"),
    ).select(
        F.col("ws").alias("window_start_s"),
        (F.col("ws") + F.col("j") * step).alias("window_end_s"),
        "event_type",
    )
    return x.groupBy("window_start_s", "window_end_s", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )


def _tvf_view(spark: SparkSession, sf_dir: str) -> None:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_tvf")


@query(
    "window_tvf_sql_tumble",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc=(
        "Flink 1.13+ windowing TVF SQL text (FLIP-145), TUMBLE form - "
        "the syntax that REPLACED group-window SQL, run verbatim: "
        "FROM TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '1' "
        "HOUR)) rewrites driver-side onto a subquery projecting "
        "window(ts).start/.end (+ window_time = end - 1ms, Flink's "
        "definition), so a Flink user's TVF query runs unchanged and "
        "Catalyst still sees the native window() plan - one partial-"
        "agg shuffle, no UDFs (operators/window_tvf_sql.py)."
    ),
)
def window_tvf_sql_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.window_tvf_sql import window_tvf_sql

    _tvf_view(spark, sf_dir)
    return window_tvf_sql(
        spark,
        """
        SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n_events
        FROM TABLE(TUMBLE(TABLE events_tvf, DESCRIPTOR(ts), INTERVAL '1' HOUR))
        GROUP BY window_start, event_type
        """,
    )


@query(
    "window_tvf_sql_hop",
    oracle="""
    WITH e AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS es
      FROM events
    ), x AS (
      SELECT event_type,
             es // 1800 * 1800 - g.i * 1800 AS ws
      FROM e, LATERAL unnest(generate_series(0, 1)) AS g(i)
    )
    SELECT make_timestamp(ws * 1000000) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM x GROUP BY 1, 2 ORDER BY 1, 2
    """,
    doc=(
        "windowing TVF SQL, HOP form (slide 30m, size 1h; Flink's "
        "(slide, size) argument order mapped to Spark's (size, "
        "slide)): the rewrite projects the sliding window() whose "
        "Expand generates each row's size/slide=2 windows - the same "
        "constant fan-out Flink's own hop assigner pays; oracle "
        "replays the window arithmetic in integer epoch seconds."
    ),
)
def window_tvf_sql_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.window_tvf_sql import window_tvf_sql

    _tvf_view(spark, sf_dir)
    return window_tvf_sql(
        spark,
        """
        SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n_events
        FROM TABLE(HOP(TABLE events_tvf, DESCRIPTOR(ts),
                       INTERVAL '30' MINUTE, INTERVAL '1' HOUR))
        GROUP BY window_start, event_type
        """,
    )


@query(
    "window_tvf_sql_cumulate",
    oracle="""
    WITH e AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS es
      FROM events
    ), w AS (
      SELECT event_type,
             es // 14400 * 14400 AS ws,
             (es - es // 14400 * 14400) // 3600 + 1 AS j_min
      FROM e
    ), x AS (
      SELECT event_type, ws, ws + j * 3600 AS we
      FROM w, LATERAL unnest(generate_series(j_min, 4)) AS g(j)
    )
    SELECT make_timestamp(ws * 1000000) AS window_start,
           make_timestamp(we * 1000000) AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM x GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    doc=(
        "windowing TVF SQL, CUMULATE form (step 1h, max 4h) - Flink's "
        "early-fire expanding windows in their native TVF syntax, on "
        "an engine with no native cumulate: the rewrite lowers the "
        "TVF to the integer-epoch explode window_cumulate uses "
        "(every window ending after the row, constant max/step "
        "fan-out), with timestamp window bounds and window_time "
        "exactly as Flink emits them."
    ),
)
def window_tvf_sql_cumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.window_tvf_sql import window_tvf_sql

    _tvf_view(spark, sf_dir)
    return window_tvf_sql(
        spark,
        """
        SELECT window_start, window_end, event_type,
               CAST(count(*) AS BIGINT) AS n_events
        FROM TABLE(CUMULATE(TABLE events_tvf, DESCRIPTOR(ts),
                            INTERVAL '1' HOUR, INTERVAL '4' HOUR))
        GROUP BY window_start, window_end, event_type
        """,
    )
