package graft.operators

import graft.{Exprs, OpModule, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2.9 incremental/batch semantics (T1–T6) + F10 higher-order
  * array extraction + the ledger imports, re-expressed as data-driven
  * batch plans. The as-of date is DERIVED FROM THE DATA (max date − delay)
  * rather than hardcoded — the reference's `today - 3` watermark
  * (tarefa_popular_fila_trafego.php:7-9) with the fixture's max date
  * standing in for "today". The 1-row max-date aggregate rides a broadcast
  * cross join, never a driver collect.
  */
object IncrementalOps extends OpModule {
  import Exprs.{dsum, dsumSql}

  /** orders + day-grain date, with broadcast 1-row max-date attached. */
  private def withMaxDate(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .withColumn("data_pedido", to_date(col("o_orderdate")))
    o.crossJoin(broadcast(o.agg(max(col("data_pedido")).as("max_d"))))
  }

  private val oSql =
    "SELECT *, CAST(o_orderdate AS DATE) AS data_pedido FROM orders"

  def queries: Map[String, Q] = Map(
    // ── T1/T2: late-data watermark — process only the day D-3, D derived
    // from the data. The reference waits 3 days for ads metrics to mature
    // (tarefa_consolidar_dados.php:29). ──
    "t2_asof_watermark" -> Q(
      (s, d) =>
        withMaxDate(s, d)
          .filter(col("data_pedido") === date_sub(col("max_d"), 3))
          .select(col("o_orderkey"), col("o_custkey"), col("data_pedido"),
            col("o_totalprice")),
      Some(s"""SELECT o_orderkey, o_custkey, data_pedido, o_totalprice
              |FROM ($oSql)
              |WHERE data_pedido = (SELECT max(CAST(o_orderdate AS DATE)) - 3 FROM orders)
              |ORDER BY o_orderkey""".stripMargin),
      doc = "SURVEY T1/T2 — D-3 watermark, as-of derived from data (php:29)",
      sort = Seq("o_orderkey")
    ),

    // ── T3: rolling 7-day restate — stale daily mart (missing urgent
    // orders, as late data) overlaid by a recomputed last-7-days window;
    // keyed keep-latest dedup resolves the overlap (K1 semantics). ──
    "t3_rolling_restate" -> Q(
      (s, d) => {
        val o = withMaxDate(s, d)
        def daily(df: DataFrame, versao: Int) = df
          .groupBy(col("data_pedido"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("receita"))
          .withColumn("versao", lit(versao))
        val stale = daily(o.filter(col("o_orderpriority") =!= "1-URGENT"), 1)
        val restated = daily(o.filter(col("data_pedido") >= date_sub(col("max_d"), 6)), 2)
        val w = Window.partitionBy(col("data_pedido")).orderBy(col("versao").desc)
        stale.union(restated)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .drop("rn")
      },
      Some(s"""WITH o AS ($oSql),
              |stale AS (
              |  SELECT data_pedido, COUNT(*) AS n_orders,
              |    ${dsumSql("o_totalprice")} AS receita, 1 AS versao
              |  FROM o WHERE o_orderpriority <> '1-URGENT' GROUP BY 1),
              |restated AS (
              |  SELECT data_pedido, COUNT(*) AS n_orders,
              |    ${dsumSql("o_totalprice")} AS receita, 2 AS versao
              |  FROM o WHERE data_pedido >= (SELECT max(data_pedido) - 6 FROM o)
              |  GROUP BY 1)
              |SELECT data_pedido, n_orders, receita, versao FROM (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY data_pedido
              |    ORDER BY versao DESC) AS rn
              |  FROM (SELECT * FROM stale UNION ALL SELECT * FROM restated))
              |WHERE rn = 1 ORDER BY data_pedido""".stripMargin),
      doc = "SURVEY T3 — rolling 7-day reimport + keyed restate (tarefa_importar_log_despesas_semanal.php:10-12)",
      sort = Seq("data_pedido")
    ),

    // ── T5: backfill loop as a driving date-set join — one row per day in
    // the replay range even when the day has no data (the commented month
    // replay, tarefa_consolidar_dados.php:33-49). ──
    "t5_backfill_days" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d)
          .withColumn("data_pedido", to_date(col("o_orderdate")))
        val days = o.agg(max(col("data_pedido")).as("max_d"))
          .select(explode(sequence(date_sub(col("max_d"), 9), col("max_d"))).as("dia"))
        val agg = o.groupBy(col("data_pedido").as("dia"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("receita"))
        // Broadcast the day-grain aggregate (small: one row per day in
        // the data): the preserved LEFT side of a left join can never be
        // the broadcast build side, so broadcasting `days` was a no-op.
        days
          .join(broadcast(agg), Seq("dia"), "left")
          .select(col("dia"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("receita"), lit(0.0)).as("receita"))
      },
      Some(s"""WITH o AS ($oSql),
              |days AS (
              |  SELECT CAST(unnest(generate_series(max_d - 9, max_d, INTERVAL 1 DAY))
              |              AS DATE) AS dia
              |  FROM (SELECT max(data_pedido) AS max_d FROM o)),
              |agg AS (
              |  SELECT data_pedido AS dia, COUNT(*) AS n_orders,
              |    ${dsumSql("o_totalprice")} AS receita
              |  FROM o GROUP BY 1)
              |SELECT d.dia, COALESCE(a.n_orders, 0) AS n_orders,
              |       COALESCE(a.receita, 0.0) AS receita
              |FROM days d LEFT JOIN agg a ON d.dia = a.dia
              |ORDER BY d.dia""".stripMargin),
      doc = "SURVEY T5 — backfill date-set join (php:33-49)",
      sort = Seq("dia")
    ),

    // ── T6: error side-channel — per-row validation verdicts as derived
    // status/message columns (worker ack/erro transitions, K6). ──
    "t6_error_channel" -> Q(
      (s, d) => {
        val msg = concat_ws(";",
          when(col("o_totalprice") > 400000.0, lit("valor_suspeito")),
          when(col("o_orderstatus") === "P", lit("status_pendente")))
        Tables.orders(s, d)
          .select(col("o_orderkey"),
            when(msg === "", lit("concluido")).otherwise(lit("erro")).as("status"),
            when(msg === "", lit(null).cast(StringType)).otherwise(msg)
              .as("mensagem_erro"))
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN msg = '' THEN 'concluido' ELSE 'erro' END AS status,
             |  NULLIF(msg, '') AS mensagem_erro
             |FROM (
             |  SELECT o_orderkey,
             |    concat_ws(';',
             |      CASE WHEN o_totalprice > 400000.0 THEN 'valor_suspeito' END,
             |      CASE WHEN o_orderstatus = 'P' THEN 'status_pendente' END) AS msg
             |  FROM orders)
             |ORDER BY o_orderkey""".stripMargin),
      doc = "SURVEY T6/K6 — error side-channel columns (worker_sincronizar_catalogo.php:83-87)",
      sort = Seq("o_orderkey")
    ),

    // ── F10: SELLER_SKU extraction from an attribute array via
    // higher-order filter + try_element_at, with the reference's fallback
    // chain attr → custom field (tarefa_sincronizar_anuncios_meli.php:96-108). ──
    "f10_hof_attr_extract" -> Q(
      (s, d) =>
        Tables.part(s, d)
          .withColumn("attributes",
            expr("""CASE WHEN p_size > 15 THEN array(
                   |  named_struct('id', 'BRAND', 'val', p_brand),
                   |  named_struct('id', 'SELLER_SKU',
                   |               'val', concat('SKU-', CAST(p_partkey AS STRING))),
                   |  named_struct('id', 'TYPE', 'val', p_type))
                   |ELSE array(
                   |  named_struct('id', 'BRAND', 'val', p_brand),
                   |  named_struct('id', 'TYPE', 'val', p_type)) END""".stripMargin))
          .select(col("p_partkey"),
            coalesce(
              expr("try_element_at(filter(attributes, a -> a.id = 'SELLER_SKU'), 1).val"),
              col("p_name")).as("seller_sku")),
      Some("""SELECT p_partkey,
             |  COALESCE(list_filter(attributes, a -> a.id = 'SELLER_SKU')[1].val,
             |           p_name) AS seller_sku
             |FROM (
             |  SELECT p_partkey, p_name,
             |    CASE WHEN p_size > 15 THEN
             |      [{'id': 'BRAND', 'val': p_brand},
             |       {'id': 'SELLER_SKU', 'val': 'SKU-' || CAST(p_partkey AS VARCHAR)},
             |       {'id': 'TYPE', 'val': p_type}]
             |    ELSE [{'id': 'BRAND', 'val': p_brand},
             |          {'id': 'TYPE', 'val': p_type}] END AS attributes
             |  FROM part)
             |ORDER BY p_partkey""".stripMargin),
      doc = "SURVEY F10 — HOF attr filter + first-match + fallback chain",
      sort = Seq("p_partkey")
    ),

    // ── Ledger import: dd/MM/yyyy date parse + decimal-comma money + the
    // overlapping weekly reimport (two runs, keyed keep-latest)
    // (tarefa_importar_log_despesas_semanal.php:89, :10-12). ──
    "ledger_weekly_restate" -> Q(
      (s, d) => {
        val base = withMaxDate(s, d).select(
          col("o_orderkey").as("id_lancamento"),
          date_format(col("data_pedido"), "dd/MM/yyyy").as("vencimento_str"),
          translate(col("o_totalprice").cast(DecimalType(14, 2)).cast(StringType),
            ".", ",").as("valor_brl"),
          col("data_pedido"), col("max_d"))
        def run(lo: Int, hi: Int, versao: Int) = base
          .filter(col("data_pedido").between(
            date_sub(col("max_d"), lo), date_sub(col("max_d"), hi)))
          .withColumn("versao", lit(versao))
        val w = Window.partitionBy(col("id_lancamento")).orderBy(col("versao").desc)
        run(9, 3, 1).union(run(6, 0, 2))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("id_lancamento"),
            to_date(col("vencimento_str"), "dd/MM/yyyy").as("data_vencimento"),
            translate(col("valor_brl"), ",", ".").cast(DoubleType).as("valor"),
            col("versao"))
      },
      Some(s"""WITH base AS (
              |  SELECT o_orderkey AS id_lancamento,
              |    strftime(data_pedido, '%d/%m/%Y') AS vencimento_str,
              |    REPLACE(CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS VARCHAR),
              |            '.', ',') AS valor_brl,
              |    data_pedido,
              |    (SELECT max(CAST(o_orderdate AS DATE)) FROM orders) AS max_d
              |  FROM ($oSql)),
              |runs AS (
              |  SELECT *, 1 AS versao FROM base
              |  WHERE data_pedido BETWEEN max_d - 9 AND max_d - 3
              |  UNION ALL
              |  SELECT *, 2 AS versao FROM base
              |  WHERE data_pedido BETWEEN max_d - 6 AND max_d)
              |SELECT id_lancamento,
              |  CAST(strptime(vencimento_str, '%d/%m/%Y') AS DATE) AS data_vencimento,
              |  CAST(REPLACE(valor_brl, ',', '.') AS DOUBLE) AS valor,
              |  versao
              |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY id_lancamento
              |        ORDER BY versao DESC) AS rn FROM runs)
              |WHERE rn = 1 ORDER BY id_lancamento""".stripMargin),
      doc = "SURVEY T3/C5/C6 — ledger dd/MM/yyyy + decimal-comma + weekly restate",
      sort = Seq("id_lancamento")
    ),

    // ── T7: SCD2 (slowly-changing-dimension type 2) history build — the
    // warehouse-side twin of K1's keep-latest upsert: instead of
    // overwriting, every per-customer run of consecutive equal statuses
    // becomes a versioned row with [valid_from, valid_to) and an
    // is_current flag. Gaps-and-islands via the rn − rn_by_status trick:
    // two row_numbers and one aggregate, all partitioned by customer
    // (high-cardinality key — scales), never a global sort. first_key
    // (the run's smallest orderkey) is the deterministic island anchor:
    // two runs of one customer can share valid_from when orders tie on
    // date, and lead() needs a total order. ──
    "t7_scd2_history" -> Q(
      (s, d) => scd2History(s, d),
      Some(s"""WITH $scd2CteSql
              |SELECT o_custkey, status, valid_from, valid_to,
              |       first_key, n_orders, is_current
              |FROM hist
              |ORDER BY o_custkey, valid_from, first_key""".stripMargin),
      doc = "Extension: SCD2 versioned history (gaps-and-islands runs + lead validity)",
      sort = Seq("o_custkey", "valid_from", "first_key")
    ),

    // ── Running account balance: the financeiro mart's serving query —
    // per customer, the cumulative net position after every order, in
    // ledger order. The prefix sum runs through the exact dsum window
    // (ExactMoneySum as a window aggregate over a pinned total order),
    // so every intermediate balance is the decimal-exact value both
    // engines agree on — a raw-double running sum would drift ulp by
    // ulp down the ledger. Per-customer windows: high-cardinality key,
    // bounded group size. ──
    "fin1_running_balance" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, 0)
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_totalprice"))
          .withColumn("balance", Exprs.dsumOver(col("o_totalprice"), w))
          .select(col("o_custkey"), col("o_orderkey"), col("balance"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS DOUBLE) AS balance
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin),
      doc = "Extension: exact running balance per customer (dsum prefix sums over the ledger order)",
      sort = Seq("o_custkey", "o_orderkey")
    ),

    // ── Receivables aging: per customer, order value bucketed by age
    // against a fixed as-of date — the finance mart's collections
    // report. Ages are integer day differences (both engines count
    // calendar days identically); each bucket is a conditional dsum,
    // so the report is decimal-exact and the whole thing is ONE
    // map-side-combined hash aggregate — no window, no second pass,
    // the shape that holds at any ledger size. ──
    "fin2_aging_buckets" -> Q(
      (s, d) => {
        val asOf = to_date(lit("1998-08-01"))
        def bucket(cond: org.apache.spark.sql.Column) =
          Exprs.dsum(when(cond, col("o_totalprice")).otherwise(lit(0.0)))
        Tables.orders(s, d)
          .select(col("o_custkey"), col("o_totalprice"),
            datediff(asOf, to_date(col("o_orderdate"))).as("age"))
          .groupBy(col("o_custkey"))
          .agg(
            bucket(col("age") <= 30).as("b_current"),
            bucket(col("age") > 30 && col("age") <= 60).as("b_31_60"),
            bucket(col("age") > 60 && col("age") <= 90).as("b_61_90"),
            bucket(col("age") > 90).as("b_over_90"),
            count(lit(1)).as("n_orders"))
      },
      Some(s"""SELECT o_custkey,
              |  ${Exprs.dsumSql("CASE WHEN age <= 30 THEN o_totalprice ELSE 0.0 END")} AS b_current,
              |  ${Exprs.dsumSql("CASE WHEN age > 30 AND age <= 60 THEN o_totalprice ELSE 0.0 END")} AS b_31_60,
              |  ${Exprs.dsumSql("CASE WHEN age > 60 AND age <= 90 THEN o_totalprice ELSE 0.0 END")} AS b_61_90,
              |  ${Exprs.dsumSql("CASE WHEN age > 90 THEN o_totalprice ELSE 0.0 END")} AS b_over_90,
              |  count(*)::BIGINT AS n_orders
              |FROM (
              |  SELECT o_custkey, o_totalprice,
              |    date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-08-01')
              |      AS age
              |  FROM orders)
              |GROUP BY 1 ORDER BY o_custkey""".stripMargin),
      doc = "Extension: receivables aging buckets per customer (conditional dsum, one hash agg)",
      sort = Seq("o_custkey")
    ),

    // ── Point-in-time join: enrich each fact row with the dim VERSION
    // that was valid at the fact's date — the temporal-correctness join
    // every warehouse needs once a dim is SCD2 (joining current state
    // leaks the future into history). The [valid_from, valid_to)
    // half-open intervals partition each customer's timeline, so every
    // fact matches exactly ONE version; the join is an equi-join on the
    // customer key with the interval containment as a post-filter —
    // per-key version chains are short, so the filter scans a handful
    // of rows per fact, never a range scan. Date-grain tie semantics
    // (two runs switching on one date) follow the half-open contract:
    // the newer run wins, deterministically in both engines. ──
    "t8_pit_join" -> Q(
      (s, d) => {
        val hist = scd2History(s, d)
          .select(col("o_custkey").as("h_custkey"), col("status"),
            col("valid_from"), col("valid_to"),
            col("first_key").as("run_first_key"),
            col("n_orders").as("run_n_orders"))
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            to_date(col("o_orderdate")).as("dt"))
          .join(hist,
            col("o_custkey") === col("h_custkey") &&
              col("dt") >= col("valid_from") &&
              (col("valid_to").isNull || col("dt") < col("valid_to")))
          .select(col("o_orderkey"), col("o_custkey"), col("dt"),
            col("status"), col("run_first_key"), col("run_n_orders"))
      },
      Some(s"""WITH $scd2CteSql
              |SELECT f.o_orderkey, f.o_custkey, f.dt,
              |       h.status, h.first_key AS run_first_key,
              |       h.n_orders AS run_n_orders
              |FROM (SELECT o_orderkey, o_custkey,
              |        CAST(o_orderdate AS DATE) AS dt FROM orders) f
              |JOIN hist h
              |  ON h.o_custkey = f.o_custkey
              | AND f.dt >= h.valid_from
              | AND (h.valid_to IS NULL OR f.dt < h.valid_to)
              |ORDER BY f.o_orderkey""".stripMargin),
      doc = "Extension: point-in-time join against SCD2 history (temporal dim enrichment, exactly one version per fact)",
      sort = Seq("o_orderkey")
    ),

    // ── CDC snapshot diff: derive an insert/update/delete change stream
    // from two table snapshots — what an incremental pipeline emits when
    // the upstream has no changelog (the reference re-reads whole MySQL
    // tables each cron tick; a 100 TB pipeline diffs snapshots instead
    // and ships only the delta). The two snapshots here are carved
    // deterministically from `orders` so both engines see identical
    // inputs: keys ≡ 3 (mod 23) are absent from the old snapshot
    // (→ inserts), keys ≡ 7 (mod 19) absent from the new (→ deletes),
    // and keys ≡ 5 (mod 17) get a perturbed price in old (→ updates).
    // Plan shape: ONE full-outer sort-merge join on the PK — both sides
    // hash-partition on the same key, unchanged rows are discarded at
    // the join, and the emitted delta is the (small) changed set. No
    // window, no global sort, no driver state: this is the shape that
    // holds when each snapshot is 100 TB and the delta is 0.1%. ──
    "cdc_snapshot_diff" -> Q(
      (s, d) => {
        val base = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val prev = base
          .filter(pmod(col("o_orderkey"), lit(23)) =!= 3)
          .select(col("o_orderkey").as("pk"),
            col("o_orderstatus").as("old_status"),
            when(pmod(col("o_orderkey"), lit(17)) === 5, col("o_totalprice") + 10.0)
              .otherwise(col("o_totalprice")).as("old_price"))
        val next = base
          .filter(pmod(col("o_orderkey"), lit(19)) =!= 7)
          .select(col("o_orderkey").as("nk"),
            col("o_orderstatus").as("new_status"),
            col("o_totalprice").as("new_price"))
        prev.join(next, col("pk") === col("nk"), "full_outer")
          .withColumn("op",
            when(col("pk").isNull, "I")
              .when(col("nk").isNull, "D")
              .when(!(col("old_price") <=> col("new_price")) ||
                !(col("old_status") <=> col("new_status")), "U"))
          .filter(col("op").isNotNull)
          .select(coalesce(col("pk"), col("nk")).as("o_orderkey"), col("op"),
            col("old_status"), col("new_status"),
            col("old_price"), col("new_price"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
             |prev AS (
             |  SELECT o_orderkey AS pk, o_orderstatus AS old_status,
             |    CASE WHEN o_orderkey % 17 = 5 THEN o_totalprice + 10.0
             |         ELSE o_totalprice END AS old_price
             |  FROM base WHERE o_orderkey % 23 <> 3),
             |nxt AS (
             |  SELECT o_orderkey AS nk, o_orderstatus AS new_status,
             |    o_totalprice AS new_price
             |  FROM base WHERE o_orderkey % 19 <> 7)
             |SELECT COALESCE(pk, nk) AS o_orderkey,
             |  CASE WHEN pk IS NULL THEN 'I'
             |       WHEN nk IS NULL THEN 'D'
             |       ELSE 'U' END AS op,
             |  old_status, new_status, old_price, new_price
             |FROM prev FULL JOIN nxt ON pk = nk
             |WHERE pk IS NULL OR nk IS NULL
             |   OR old_price IS DISTINCT FROM new_price
             |   OR old_status IS DISTINCT FROM new_status
             |ORDER BY o_orderkey""".stripMargin),
      doc = "Extension: CDC snapshot diff (I/U/D delta via one co-partitioned full-outer join)",
      sort = Seq("o_orderkey")
    ),

    // ── Time-series gap filling: build each series' calendar spine with
    // `sequence` (data-derived bounds — no driver loop, no collected
    // dates), left-join the observed daily aggregate, then emit both
    // fill policies a mart uses: zero-fill (a missing sales day IS zero
    // revenue) and carry-forward (`last_value IGNORE NULLS` — the fill
    // for level/state metrics). Spine generation and the fill window
    // both partition by the series key; the fixture key is the 3-value
    // returnflag, but the shape is per-series (sensor, SKU) where the
    // key is high-cardinality and each window stays small. ──
    "ts_gapfill_daily" -> Q(
      (s, d) => {
        val daily = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag").as("flag"),
            to_date(col("l_shipdate")).as("d"))
          .agg(dsum(col("l_extendedprice")).as("rev"))
        val spine = daily.groupBy(col("flag"))
          .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
          .select(col("flag"),
            explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
              .as("d"))
        val w = Window.partitionBy(col("flag")).orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, 0)
        spine.join(daily, Seq("flag", "d"), "left")
          .select(col("flag"), col("d"),
            coalesce(col("rev"), lit(0.0)).as("rev_zero_filled"),
            last(col("rev"), ignoreNulls = true).over(w).as("rev_carry_forward"),
            col("rev").isNull.as("is_gap"))
      },
      Some(s"""WITH daily AS (
              |  SELECT l_returnflag AS flag, CAST(l_shipdate AS DATE) AS d,
              |    ${dsumSql("l_extendedprice")} AS rev
              |  FROM lineitem GROUP BY 1, 2),
              |spine AS (
              |  SELECT flag,
              |    unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
              |      INTERVAL 1 DAY))::DATE AS d
              |  FROM (SELECT flag, min(d) AS d0, max(d) AS d1
              |        FROM daily GROUP BY 1))
              |SELECT s.flag, s.d,
              |  COALESCE(rev, 0.0) AS rev_zero_filled,
              |  last_value(rev IGNORE NULLS) OVER (PARTITION BY s.flag
              |    ORDER BY s.d ROWS UNBOUNDED PRECEDING) AS rev_carry_forward,
              |  rev IS NULL AS is_gap
              |FROM spine s LEFT JOIN daily USING (flag, d)
              |ORDER BY s.flag, s.d""".stripMargin),
      doc = "Extension: calendar-spine gap filling (zero-fill + carry-forward, per-series windows)",
      sort = Seq("flag", "d")
    ),

    // ── Cohort retention: customers cohorted by first-order month,
    // activity counted per (cohort, months-since). Integer-only (month
    // index = year*12+month, distinct customer counts), so engine-exact
    // by construction. Shape at scale: the cohort map is a groupBy on
    // the customer key; activity joins it back co-partitioned on the
    // same key; the final (cohort, months_since) aggregate is tiny.
    // The distinct-per-(cohort,month,customer) pre-aggregation runs on
    // the customer-keyed shuffle — no countDistinct expand. ──
    "coh1_retention" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_custkey"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .as("mi"),
            trunc(to_date(col("o_orderdate")), "month").as("m"))
        val cohort = o.groupBy(col("o_custkey"))
          .agg(min(col("mi")).as("c_mi"), min(col("m")).as("cohort"))
        o.join(cohort, Seq("o_custkey"))
          .select(col("o_custkey"), col("cohort"),
            (col("mi") - col("c_mi")).as("months_since"))
          .distinct()
          .groupBy(col("cohort"), col("months_since"))
          .agg(count(lit(1)).as("n_active"))
      },
      Some("""WITH o AS (
             |  SELECT o_custkey,
             |    year(o_orderdate)*12 + month(o_orderdate) AS mi,
             |    date_trunc('month', o_orderdate)::DATE AS m
             |  FROM orders),
             |co AS (
             |  SELECT o_custkey, min(mi) AS c_mi, min(m) AS cohort
             |  FROM o GROUP BY 1),
             |act AS (
             |  SELECT DISTINCT o.o_custkey, co.cohort,
             |    o.mi - co.c_mi AS months_since
             |  FROM o JOIN co USING (o_custkey))
             |SELECT cohort, months_since, count(*)::BIGINT AS n_active
             |FROM act GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "Extension: cohort retention triangle (first-order cohort x months-since activity)",
      sort = Seq("cohort", "months_since")
    ),

    // ── Exponentially-decayed engagement score per user: each event
    // contributes value · 0.5^(days before the corpus max date) — a
    // 1-day-half-life recency weighting. Engine-exact despite the
    // floating point: 0.5^k is a bare exponent shift (bit-identical in
    // any IEEE engine), the product rounds once deterministically, and
    // each term is then quantized to LONG micro-units BEFORE the sum, so
    // the aggregate is an order-free integer sum — a raw double sum
    // would depend on partition order. Map-only until one user-keyed
    // hash agg; the max date rides a broadcast, as everywhere else. ──
    "ts_decay_score" -> Q(
      (s, d) => {
        val e = Tables.events(s, d)
        val mx = e.agg(max(to_date(col("ts"))).as("max_d"))
        e.crossJoin(broadcast(mx))
          .select(col("user_id"),
            round(col("value") *
              pow(lit(0.5), datediff(col("max_d"), to_date(col("ts")))) * 1e6)
              .cast(LongType).as("m"))
          .groupBy(col("user_id"))
          .agg(sum(col("m")).as("score_micro"), count(lit(1)).as("n_events"))
      },
      Some("""WITH mx AS (SELECT max(ts::DATE) AS max_d FROM events),
             |d AS (
             |  SELECT user_id,
             |    CAST(round(value
             |      * power(0.5, date_diff('day', ts::DATE, (SELECT max_d FROM mx)))
             |      * 1000000) AS BIGINT) AS m
             |  FROM events)
             |SELECT user_id, sum(m)::BIGINT AS score_micro,
             |  count(*)::BIGINT AS n_events
             |FROM d GROUP BY 1 ORDER BY user_id""".stripMargin),
      doc = "Extension: exponential-decay engagement score (half-life weighting, order-free fixed-point sum)",
      sort = Seq("user_id")
    ),

    // ── Incremental view maintenance: the per-part revenue view is
    // maintained as HISTORY PARTIALS ⊕ DELTA PARTIALS instead of
    // recomputed — the shape that turns a daily 100 TB re-aggregation
    // into a delta-sized one (history partials would be the stored
    // view; here both sides derive from the fixture so the oracle can
    // replay). The merge is a union of two pre-aggregated relations
    // re-aggregated on the same key: associative measures only
    // (exact-decimal SUM, COUNT), which is precisely the IVM contract.
    // The DuckDB twin computes the view DIRECTLY over all rows — the
    // compare proves partial-merge ≡ full recompute, which only holds
    // because dsum is exact (a raw double sum would drift by
    // partition order). ──
    "ivm_delta_merge" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .withColumn("sd", to_date(col("l_shipdate")))
        val withMax = li.crossJoin(
          broadcast(li.agg(max(col("sd")).as("max_d"))))
        // history and delta partials fall out of ONE grouped pass
        // (grouping on the partition flag), then merge on the view key —
        // two aggregates, one fact scan. In the deployed pipeline the
        // history partials are the STORED view and only the delta side
        // scans; here both derive from the fixture so the oracle can
        // replay the whole thing.
        val partials = withMax
          .groupBy(col("l_partkey"),
            (col("sd") === col("max_d")).as("is_delta"))
          .agg(dsum(col("l_extendedprice")).as("rev"),
            count(lit(1)).as("n"))
        partials
          .groupBy(col("l_partkey"))
          .agg(dsum(col("rev")).as("rev"), sum(col("n")).as("n"))
      },
      Some(s"""SELECT l_partkey, ${dsumSql("l_extendedprice")} AS rev,
              |  count(*)::BIGINT AS n
              |FROM lineitem GROUP BY 1 ORDER BY l_partkey""".stripMargin),
      doc = "Extension: incremental view maintenance (history partials + delta merge == full recompute)",
      sort = Seq("l_partkey")
    )
  )

  /** SCD2 run history per customer (shared by `t7_scd2_history` and the
    * point-in-time join `t8_pit_join`): gaps-and-islands runs of
    * o_orderstatus with [valid_from, valid_to) half-open validity. */
  private def scd2History(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderstatus").as("status"),
        to_date(col("o_orderdate")).as("dt"), col("o_orderkey"))
    val wAll = Window.partitionBy(col("o_custkey"))
      .orderBy(col("dt"), col("o_orderkey"))
    val wByStatus = Window.partitionBy(col("o_custkey"), col("status"))
      .orderBy(col("dt"), col("o_orderkey"))
    val runs = o
      .withColumn("grp", row_number().over(wAll) - row_number().over(wByStatus))
      .groupBy(col("o_custkey"), col("status"), col("grp"))
      .agg(min(col("dt")).as("valid_from"),
        min(col("o_orderkey")).as("first_key"),
        count(lit(1)).as("n_orders"))
    val wSeq = Window.partitionBy(col("o_custkey"))
      .orderBy(col("valid_from"), col("first_key"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wSeq))
      .select(col("o_custkey"), col("status"), col("valid_from"),
        col("valid_to"), col("first_key"), col("n_orders"),
        col("valid_to").isNull.as("is_current"))
  }

  /** DuckDB CTE twin of [[scd2History]], ending in a `hist` relation. */
  private val scd2CteSql =
    """o AS (
      |  SELECT o_custkey, o_orderstatus AS status,
      |         CAST(o_orderdate AS DATE) AS dt, o_orderkey
      |  FROM orders),
      |isl AS (
      |  SELECT *,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                       ORDER BY dt, o_orderkey)
      |  - ROW_NUMBER() OVER (PARTITION BY o_custkey, status
      |                       ORDER BY dt, o_orderkey) AS grp
      |  FROM o),
      |runs AS (
      |  SELECT o_custkey, status,
      |         min(dt) AS valid_from, min(o_orderkey) AS first_key,
      |         COUNT(*) AS n_orders
      |  FROM isl GROUP BY o_custkey, status, grp),
      |hist AS (
      |  SELECT o_custkey, status, valid_from,
      |    LEAD(valid_from) OVER w AS valid_to,
      |    first_key, n_orders,
      |    (LEAD(valid_from) OVER w IS NULL) AS is_current
      |  FROM runs
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from, first_key))""".stripMargin
}
