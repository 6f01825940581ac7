package graft.operators

import graft.{Exprs, OpModule, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** As-of (point-in-time) join — a beyond-the-reference extension operator
  * (the brief's canonical "operator Spark lacks"). Composed Spark-first
  * per the preference order: tag both sides, union, and take
  * `last_value(ignoreNulls)` over a per-key time-ordered window — one
  * shuffle on the join key, no custom SparkPlan needed. The window
  * partitions by user (high cardinality), never globally.
  *
  * Semantics: for every 'error' event, the value of that user's most
  * recent 'purchase' at or before the error's timestamp (ties admit the
  * same-instant purchase, matching ASOF's `<=`). The DuckDB oracle is
  * the NATIVE `ASOF LEFT JOIN` — the built-in composition must agree
  * with a first-class implementation.
  */
object AsofOps extends OpModule {

  def queries: Map[String, Q] = Map(
    "asof_join_last_purchase" -> Q(
      (s, d) => {
        val e = Tables.events(s, d)
        // Same-instant purchases collapse to max(value) BEFORE the join:
        // among equal-ts matches an ASOF picks an arbitrary row, which
        // neither engine resolves deterministically otherwise.
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("pv"))
          .select(col("user_id"), col("ts"), col("pv"),
            lit(1).as("is_p"), lit(null).cast("long").as("event_id"))
        val errors = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"),
            lit(null).cast("double").as("pv"), lit(0).as("is_p"),
            col("event_id"))
        // purchases sort before errors at equal ts → "at or before"
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("is_p").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        purchases.unionByName(errors)
          .withColumn("last_purchase_value", last(col("pv"), ignoreNulls = true).over(w))
          .filter(col("is_p") === 0)
          .select(col("event_id"), col("user_id"), col("last_purchase_value"))
      },
      // `ts::TIMESTAMP` truncates DuckDB's nanosecond timestamps to the
      // microsecond grain the Spark side loads at — without it a purchase
      // later than an error WITHIN the same microsecond would match in
      // Spark but not in the oracle.
      Some("""SELECT e.event_id, e.user_id, p.pv AS last_purchase_value
             |FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts
             |      FROM events WHERE event_type = 'error') e
             |ASOF LEFT JOIN (SELECT user_id, ts::TIMESTAMP AS ts, max(value) AS pv
             |                FROM events WHERE event_type = 'purchase'
             |                GROUP BY 1, 2) p
             |  ON e.user_id = p.user_id AND p.ts <= e.ts
             |ORDER BY e.event_id""".stripMargin),
      doc = "Extension: as-of join composed from union + last_value window ≡ DuckDB ASOF JOIN",
      sort = Seq("event_id")
    ),

    // ── FORWARD as-of: for every 'error', the user's EARLIEST 'purchase'
    // at or after the error — the direction ML pipelines use to check
    // label leakage (did an outcome land after the cutoff?). Same
    // union + running-value window machinery as the backward join,
    // scanning time DESCENDING; the DuckDB twin is the native ASOF with
    // the inequality flipped. ──
    "asof_join_next_purchase" -> Q(
      (s, d) => {
        val e = Tables.events(s, d)
        // same-instant purchases collapse BEFORE the join (ties would be
        // engine-arbitrary otherwise), mirroring the backward query
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("pv"))
          .select(col("user_id"), col("ts"), col("pv"),
            lit(1).as("is_p"), lit(null).cast("long").as("event_id"))
        val errors = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"),
            lit(null).cast("double").as("pv"), lit(0).as("is_p"),
            col("event_id"))
        // scanning ts DESC, the last purchase seen is the earliest one at
        // or after the error; purchases sort first at equal ts so "at or
        // after" admits the same instant
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("is_p").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        purchases.unionByName(errors)
          .withColumn("next_purchase_value", last(col("pv"), ignoreNulls = true).over(w))
          .filter(col("is_p") === 0)
          .select(col("event_id"), col("user_id"), col("next_purchase_value"))
      },
      Some("""SELECT e.event_id, e.user_id, p.pv AS next_purchase_value
             |FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts
             |      FROM events WHERE event_type = 'error') e
             |ASOF LEFT JOIN (SELECT user_id, ts::TIMESTAMP AS ts, max(value) AS pv
             |                FROM events WHERE event_type = 'purchase'
             |                GROUP BY 1, 2) p
             |  ON e.user_id = p.user_id AND p.ts >= e.ts
             |ORDER BY e.event_id""".stripMargin),
      doc = "Extension: forward as-of join (earliest at-or-after) ≡ DuckDB ASOF >=",
      sort = Seq("event_id")
    ),

    // ── Range (interval) join, banded: purchases within ±1 h of each
    // error, per user. Spark plans a raw `BETWEEN` join as a
    // nested-loop — the banded form buckets time into 1 h cells,
    // equi-joins on (user, bucket) with each error probing its 3
    // candidate cells, and post-filters the exact interval. Each
    // (error, purchase) pair matches exactly one candidate cell (the
    // purchase's own), so no dedup is needed; the quadratic blowup is
    // confined to same-cell collisions, the standard banding contract.
    // The DuckDB twin is the plain BETWEEN join (its IEJoin handles it
    // natively at fixture scale). ──
    "range_join_purchases_1h" -> Q(
      (s, d) => {
        val BandUs = 3600L * 1000 * 1000
        val e = Tables.events(s, d)
        val errors = e.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("eus"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"),
            unix_micros(col("ts")).as("pus"),
            // SQL `div`: integral division (a double round-trip could be
            // a ulp off at epoch-micros magnitudes)
            expr(s"unix_micros(ts) div ${BandUs}L").as("p_bucket"))
        val probed = errors.withColumn("nb",
          explode(array(
            expr(s"eus div ${BandUs}L") - 1,
            expr(s"eus div ${BandUs}L"),
            expr(s"eus div ${BandUs}L") + 1)))
        val counted = probed
          .join(purchases,
            col("user_id") === col("p_user") && col("nb") === col("p_bucket"))
          .filter(abs(col("pus") - col("eus")) <= BandUs)
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("c"))
        errors
          .join(counted, Seq("event_id"), "left")
          .select(col("event_id"), col("user_id"),
            coalesce(col("c"), lit(0L)).as("purchases_within_1h"))
      },
      Some("""SELECT e.event_id, e.user_id,
             |  CAST(COUNT(p.pus) AS BIGINT) AS purchases_within_1h
             |FROM (SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS eus
             |      FROM events WHERE event_type = 'error') e
             |LEFT JOIN (SELECT user_id, epoch_us(ts::TIMESTAMP) AS pus
             |           FROM events WHERE event_type = 'purchase') p
             |  ON p.user_id = e.user_id
             |  AND p.pus BETWEEN e.eus - 3600000000 AND e.eus + 3600000000
             |GROUP BY 1, 2 ORDER BY 1""".stripMargin),
      doc = "Extension: banded range join (±1 h interval, bucket equi-join + post-filter)",
      sort = Seq("event_id")
    ),

    // ── Tumbling time windows in BATCH: the same `window()` construct
    // the streaming paths use, oracle-checked against date_trunc
    // bucketing — event count + value sum per 1-day window per type.
    // One shuffle keyed by (window, type); map-side combined. ──
    "w8_tumbling_window" -> Q(
      (s, d) =>
        Tables.events(s, d)
          .groupBy(
            window(col("ts"), "1 day").as("w"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            Exprs.dsum(col("value")).as("sum_value"))
          .select(
            col("w.start").cast("date").as("dia"),
            col("event_type"), col("n_events"), col("sum_value")),
      Some(s"""SELECT CAST(date_trunc('day', ts::TIMESTAMP) AS DATE) AS dia,
              |  event_type, COUNT(*) AS n_events,
              |  ${Exprs.dsumSql("value")} AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "Extension: tumbling 1-day windows in batch (same window() as streaming)",
      sort = Seq("dia", "event_type")
    ),

    // ── Sessionization: gap-based session assignment over the event
    // stream — lag → new-session flag → running sum, all inside one
    // per-user window (high-cardinality partition key; the standard
    // scalable shape). Timestamps compare at microsecond grain on both
    // engines (Spark's nanos→micros load truncation ≡ DuckDB's
    // TIMESTAMP_NS::TIMESTAMP cast for positive epochs). ──
    "sessionize_events" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val gapMicros = 3600L * 1000 * 1000 // 1 hour
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"))
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_session",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > gapMicros, 1L)
              .otherwise(0L))
          .withColumn("session_seq",
            sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("event_id"), col("user_id"), col("session_seq"))
      },
      // CAST(... AS BIGINT): DuckDB's windowed SUM widens to HUGEINT →
      // decimal128, which the driver's cross-engine hash can't canonicalize.
      Some("""SELECT event_id, user_id,
             |  CAST(SUM(new_session) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
             |FROM (
             |  SELECT event_id, user_id, ts,
             |    CASE WHEN prev_us IS NULL
             |           OR epoch_us(ts::TIMESTAMP) - prev_us > 3600000000
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM (
             |    SELECT event_id, user_id, ts,
             |      LAG(epoch_us(ts::TIMESTAMP)) OVER (PARTITION BY user_id
             |        ORDER BY ts, event_id) AS prev_us
             |    FROM events))
             |ORDER BY event_id""".stripMargin),
      doc = "Extension: gap-based sessionization (lag → flag → running sum)",
      sort = Seq("event_id")
    ),

    // ── Funnel analysis: view → click → purchase, strictly ordered per
    // user. Each stage is an aggregate (earliest qualifying timestamp)
    // joined to the previous stage with a strict `>` — the sequential
    // constraint that a windowed min can't express. Scale shape: one
    // shuffle on user_id for the first groupBy, then every later join
    // and groupBy reuses that key — co-partitioned, no second wide
    // shuffle; stage relations only shrink. ──
    // ── As-of join with TOLERANCE: the backward as-of, but a match only
    // counts within 1 hour — pandas' merge_asof(tolerance=...) /
    // kdb wj-style semantics. Same single-shuffle union + running-window
    // machinery as asof_join_last_purchase, carrying the matched
    // purchase's timestamp alongside its value so the tolerance is a
    // map-side post-filter (no second join). DuckDB has no native
    // tolerance, so the twin is ASOF LEFT JOIN + the same CASE guard. ──
    "asof_join_tolerance_1h" -> Q(
      (s, d) => {
        val e = Tables.events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("pv"))
          .select(col("user_id"), col("ts"), col("pv"),
            lit(1).as("is_p"), lit(null).cast("long").as("event_id"))
        val errors = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"),
            lit(null).cast("double").as("pv"), lit(0).as("is_p"),
            col("event_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("is_p").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        purchases.unionByName(errors)
          .withColumn("last_pv", last(col("pv"), ignoreNulls = true).over(w))
          .withColumn("last_pts",
            last(when(col("is_p") === 1, col("ts")), ignoreNulls = true).over(w))
          .filter(col("is_p") === 0)
          .select(col("event_id"), col("user_id"),
            when(
              unix_micros(col("ts")) - unix_micros(col("last_pts")) <=
                3600L * 1000 * 1000,
              col("last_pv")).as("tol_purchase_value"))
      },
      Some("""SELECT event_id, user_id,
             |  CASE WHEN pts IS NOT NULL AND e_ts - pts <= INTERVAL 1 HOUR
             |       THEN pv END AS tol_purchase_value
             |FROM (
             |  SELECT e.event_id, e.user_id, e.ts AS e_ts, p.ts AS pts, p.pv
             |  FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts
             |        FROM events WHERE event_type = 'error') e
             |  ASOF LEFT JOIN (SELECT user_id, ts::TIMESTAMP AS ts,
             |                    max(value) AS pv
             |                  FROM events WHERE event_type = 'purchase'
             |                  GROUP BY 1, 2) p
             |    ON e.user_id = p.user_id AND p.ts <= e.ts)
             |ORDER BY event_id""".stripMargin),
      doc = "Extension: as-of join with 1 h tolerance (pandas merge_asof semantics)",
      sort = Seq("event_id")
    ),

    "funnel_view_click_purchase" -> Q(
      (s, d) => {
        val e = Tables.events(s, d)
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id")
          .filter(col("ts") > col("t_view"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id")
          .filter(col("ts") > col("t_click"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
        v.join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
            (lit(1L) +
              when(col("t_click").isNotNull, 1L).otherwise(0L) +
              when(col("t_purchase").isNotNull, 1L).otherwise(0L)).as("stage"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, ts::TIMESTAMP AS ts FROM events),
             |v AS (SELECT user_id, min(ts) AS t_view
             |      FROM ev WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(e.ts) AS t_click
             |      FROM ev e JOIN v ON v.user_id = e.user_id
             |      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
             |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
             |      FROM ev e JOIN c ON c.user_id = e.user_id
             |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
             |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
             |  1 + CAST(c.user_id IS NOT NULL AS BIGINT)
             |    + CAST(p.user_id IS NOT NULL AS BIGINT) AS stage
             |FROM v LEFT JOIN c ON c.user_id = v.user_id
             |       LEFT JOIN p ON p.user_id = v.user_id
             |ORDER BY v.user_id""".stripMargin),
      doc = "Extension: ordered conversion funnel (stage mins chained by strict >)",
      sort = Seq("user_id")
    ),

    // ── Time-RANGE window frame: per-user trailing 1-hour average —
    // `RANGE BETWEEN INTERVAL PRECEDING` semantics, the frame type the
    // tumbling window (w8) and row-frame queries don't cover. Spark's
    // range frame needs a numeric ordering column, so the frame runs
    // over unix_micros(ts); DuckDB orders by the timestamp itself with
    // an INTERVAL bound — identical inclusive [t−1h, t] window at the
    // shared microsecond grain. The windowed sum is decimal-exact
    // (dsum contract) so the emitted average is engine-identical. ──
    "w9_trailing_1h_avg" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600L * 1000 * 1000, 0)
        Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("avg_1h",
            sum(col("value").cast(DecimalType(38, 6))).over(w)
              .cast(DoubleType) / col("n_1h"))
          .select(col("event_id"), col("user_id"), col("n_1h"), col("avg_1h"))
      },
      Some("""SELECT event_id, user_id,
             |  COUNT(*) OVER w AS n_1h,
             |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS VARCHAR) AS DOUBLE)
             |    / COUNT(*) OVER w AS avg_1h
             |FROM (SELECT event_id, user_id, ts::TIMESTAMP AS ts, value
             |      FROM events WHERE event_type = 'purchase')
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts
             |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin),
      doc = "Extension: time-RANGE window frame (trailing 1 h inclusive, decimal-exact avg)",
      sort = Seq("event_id")
    ),

    // ── Sliding DISTINCT count: event-type variety in the trailing
    // hour per user — the "session breadth" feature (and the window
    // shape plain aggregates can't fake: distinct is not subtractable,
    // so each frame recounts). Spark has no DISTINCT window aggregate;
    // `size(collect_set(...))` over the RANGE frame is the idiomatic
    // spelling, and DuckDB's native `count(DISTINCT) OVER` replays it.
    // RANGE over epoch micros: frame peers (equal ts) resolve
    // identically on both engines. ──
    "w12_sliding_distinct" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600L * 1000 * 1000, 0)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
          .withColumn("n_types_1h",
            size(collect_set(col("event_type")).over(w)).cast(LongType))
          .select(col("event_id"), col("user_id"), col("n_types_1h"))
      },
      Some("""SELECT event_id, user_id,
             |  count(DISTINCT event_type) OVER (
             |    PARTITION BY user_id ORDER BY ts::TIMESTAMP
             |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             |    ::BIGINT AS n_types_1h
             |FROM events ORDER BY event_id""".stripMargin),
      doc = "Extension: sliding distinct count (trailing-1h event-type variety; collect_set RANGE frame vs native DISTINCT window)",
      sort = Seq("event_id")
    ),

    // ── Time-weighted average (TWAP): each observation weighted by how
    // long it stood — the financial/telemetry aggregate where a plain
    // mean overweights bursts. Per user: duration to the next event
    // (lead over the (ts, event_id) total order), then
    // Σ(value·dur)/Σ(dur), both sums EXACT via dsum so the single final
    // division is engine-identical (one op — nothing for an FMA to
    // contract). Durations derive from integer epoch micros; the /1e6
    // to seconds is one correctly-rounded double op on both sides. ──
    "ts3_twap" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("next_us", lead(unix_micros(col("ts")), 1).over(w))
          .where(col("next_us").isNotNull)
          .withColumn("dur_s",
            (col("next_us") - unix_micros(col("ts"))).cast(DoubleType) / 1e6)
          .groupBy(col("user_id"))
          // final 1e-6 quantize through a LONG (the ann pattern): the
          // weighted sums are dsum-exact, but v·dur products near a
          // quantization boundary can round differently per engine at
          // 1e8 magnitudes — the final quantize absorbs that last-ulp
          // class entirely at twap's ~1e2 scale
          .agg(
            (round((Exprs.dsum(col("value") * col("dur_s")) /
              Exprs.dsum(col("dur_s"))) * 1e6)
              .cast(LongType).cast(DoubleType) / 1e6).as("twap"),
            count(lit(1)).as("n_intervals"))
      },
      Some(s"""SELECT user_id,
              |  CAST(round(${Exprs.dsumSql("value * dur_s")}
              |    / ${Exprs.dsumSql("dur_s")} * 1e6) AS BIGINT) / 1e6
              |    AS twap,
              |  count(*)::BIGINT AS n_intervals
              |FROM (
              |  SELECT user_id, value,
              |    (next_us - epoch_us(ts::TIMESTAMP))::DOUBLE / 1e6 AS dur_s
              |  FROM (
              |    SELECT user_id, event_id, ts, value,
              |      LEAD(epoch_us(ts::TIMESTAMP)) OVER (PARTITION BY user_id
              |        ORDER BY ts, event_id) AS next_us
              |    FROM events)
              |  WHERE next_us IS NOT NULL)
              |GROUP BY 1 ORDER BY user_id""".stripMargin),
      doc = "Extension: time-weighted average per user (exact dsum numerator/denominator, one final division)",
      sort = Seq("user_id")
    ),

    // ── OHLC bars: per (user, hour) open/high/low/close — the
    // time-series downsample every telemetry/market store serves.
    // Engine-exact without arg_min/arg_max (whose tie semantics the
    // engines don't share): open/close are row_number = 1 under the
    // (ts, event_id) TOTAL order ascending/descending, values pass
    // through untouched (no arithmetic → no rounding to disagree on),
    // and the hour bucket is integer epoch-micros division. Shape at
    // scale: two rank windows over the same (user, hour) partition —
    // one exchange — then a hash agg; WindowGroupLimit does NOT apply
    // (we keep max/min over all rows), but the windows carry no
    // arrays and the partition count is the bucket count. ──
    "ts4_ohlc" -> Q(
      (s, d) => {
        val hourUs = 3600L * 1000000L
        val base = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("h", expr(s"unix_micros(ts) div $hourUs"))
        val wA = Window.partitionBy(col("user_id"), col("h"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val wD = Window.partitionBy(col("user_id"), col("h"))
          .orderBy(col("ts").desc, col("event_id").desc)
        base
          .withColumn("ra", row_number().over(wA))
          .withColumn("rd", row_number().over(wD))
          .groupBy(col("user_id"), col("h"))
          .agg(
            max(when(col("ra") === 1, col("value"))).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max(when(col("rd") === 1, col("value"))).as("close"),
            count(lit(1)).as("n_events"))
      },
      Some("""SELECT user_id, h,
             |  max(CASE WHEN ra = 1 THEN value END) AS open,
             |  max(value) AS high,
             |  min(value) AS low,
             |  max(CASE WHEN rd = 1 THEN value END) AS close,
             |  count(*)::BIGINT AS n_events
             |FROM (
             |  SELECT user_id, value,
             |    epoch_us(ts::TIMESTAMP) // 3600000000 AS h,
             |    ROW_NUMBER() OVER (PARTITION BY user_id,
             |      epoch_us(ts::TIMESTAMP) // 3600000000
             |      ORDER BY ts, event_id) AS ra,
             |    ROW_NUMBER() OVER (PARTITION BY user_id,
             |      epoch_us(ts::TIMESTAMP) // 3600000000
             |      ORDER BY ts DESC, event_id DESC) AS rd
             |  FROM events)
             |GROUP BY 1, 2 ORDER BY user_id, h""".stripMargin),
      doc = "Extension: hourly OHLC bars per user (rank-window open/close under a total order — no arg_min/arg_max tie ambiguity)",
      sort = Seq("user_id", "h")
    ),

    // ── Interval OVERLAP join: which users' sessions overlap in time —
    // the interval×interval join Spark has no native operator for
    // (range_join covers point-in-interval). The banded recipe: each
    // session interval explodes into the 1 h time cells it touches,
    // candidates are cell equi-join collisions (an interval pair can
    // only overlap if some cell contains both), the EXACT overlap
    // predicate (a.start ≤ b.end ∧ b.start ≤ a.end) filters in the
    // join, and a distinct collapses multi-cell double-hits. Never a
    // nested loop; per-cell work is the cell's session count squared —
    // the honest cost of the operator, bounded by the cohort
    // restriction (user_id ≡ 0 mod 10, the deterministic analysis
    // cohort — the same bound dedup_incremental uses for its batch).
    // The oracle is the direct quadratic overlap join, so the banded
    // decomposition is verified lossless. Session boundaries reuse
    // sessionize_events' exact gap rules. ──
    "ts5_interval_overlap" -> Q(
      (s, d) => {
        val gapMicros = 3600L * 1000 * 1000
        val cellUs = 3600L * 1000000L
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val sess = Tables.events(s, d)
          .filter(pmod(col("user_id"), lit(10)) === 0)
          .select(col("event_id"), col("user_id"), col("ts"))
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .withColumn("new_session",
            when(col("prev_us").isNull ||
              col("us") - col("prev_us") > gapMicros, 1L).otherwise(0L))
          .withColumn("sidx", sum(col("new_session"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("sidx"))
          .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
        val cells = sess.select(col("user_id"), col("sidx"),
          col("s_us"), col("e_us"),
          explode(expr(s"sequence(s_us div ${cellUs}L, e_us div ${cellUs}L)"))
            .as("cell"))
        cells.as("a").hint("shuffle_hash")
          .join(cells.as("b").hint("shuffle_hash"),
            col("a.cell") === col("b.cell") &&
              col("a.user_id") < col("b.user_id") &&
              col("a.s_us") <= col("b.e_us") &&
              col("b.s_us") <= col("a.e_us"))
          .select(col("a.user_id").as("user_a"), col("a.sidx").as("sidx_a"),
            col("b.user_id").as("user_b"), col("b.sidx").as("sidx_b"))
          .distinct()
          .groupBy(col("user_a"), col("user_b"))
          .agg(count(lit(1)).as("n_overlaps"))
          .orderBy(col("n_overlaps").desc, col("user_a").asc,
            col("user_b").asc)
          .limit(50)
      },
      Some("""WITH sess AS (
             |  SELECT user_id, sidx,
             |         min(us) AS s_us, max(us) AS e_us
             |  FROM (
             |    SELECT user_id, us,
             |      CAST(SUM(CASE WHEN prev_us IS NULL
             |                      OR us - prev_us > 3600000000
             |                    THEN 1 ELSE 0 END) OVER (
             |        PARTITION BY user_id ORDER BY ts, event_id
             |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sidx
             |    FROM (
             |      SELECT user_id, event_id, ts,
             |        epoch_us(ts::TIMESTAMP) AS us,
             |        LAG(epoch_us(ts::TIMESTAMP)) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS prev_us
             |      FROM events WHERE user_id % 10 = 0))
             |  GROUP BY 1, 2)
             |SELECT a.user_id AS user_a, b.user_id AS user_b,
             |       count(*)::BIGINT AS n_overlaps
             |FROM sess a JOIN sess b
             |  ON a.user_id < b.user_id
             | AND a.s_us <= b.e_us AND b.s_us <= a.e_us
             |GROUP BY 1, 2
             |ORDER BY n_overlaps DESC, user_a, user_b LIMIT 50""".stripMargin),
      doc = "Extension: interval-overlap join via 1 h cell banding (lossless vs the quadratic oracle, never a nested loop)",
      sort = Nil
    )
  )
}
