package graft.operators

import graft.{Exprs, Fixtures, OpModule, Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EP2 (sales ingest) + scalar-function coverage: nested array-of-struct
  * flattening (the reference's order_items explode), timezone normalization,
  * JSON field extraction, and the decimal-comma money parse
  * (SURVEY.md §2.3 F10-F13, §2.8 C5-C7, §3 EP2).
  */
object IngestOps extends OpModule {

  def queries: Map[String, Q] = Map(
    // ── EP2: nested order_items → explode. The ARRAY<STRUCT> payload shape
    // the MELI API delivers (tarefa_coletar_financas.php:126) is a derived
    // fixture built once per SF ([[graft.Fixtures.nestedOrders]]); the
    // measured query is exactly the operator under test: posexplode the
    // array and derive flat item rows. ──
    "ep2_explode_items" -> Q(
      (s, d) => {
        Fixtures
          .nestedOrders(s, d)
          .select(col("l_orderkey"), posexplode(col("order_items")).as(Seq("pos", "item")))
          .select(
            col("l_orderkey"),
            (col("pos") + 1).cast(IntegerType).as("item_seq"),
            col("item.l_partkey").as("l_partkey"),
            col("item.l_quantity").as("l_quantity"),
            col("item.l_extendedprice").as("l_extendedprice"))
      },
      // l_linenumber is not unique per order in the synthetic fixture, so the
      // twin must tie-break exactly like sort_array's full-struct ordering.
      Some("""SELECT l_orderkey,
             |  CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
             |    ORDER BY l_linenumber, l_partkey, l_quantity, l_extendedprice)
             |       AS INTEGER) AS item_seq,
             |  l_partkey, l_quantity, l_extendedprice
             |FROM lineitem
             |ORDER BY l_orderkey, item_seq""".stripMargin),
      doc = "SURVEY EP2/F13 — explode(order_items) tarefa_coletar_financas.php:126",
      sort = Seq("l_orderkey", "item_seq")
    ),

    // ── C5: ISO-UTC → America/Sao_Paulo normalization (fixed -03:00 since
    // Brazil abolished DST in 2019; event ts are 2024, so the DuckDB twin
    // can use a constant offset). tarefa_coletar_financas.php:86-98. ──
    "c5_tz_normalize" -> Q(
      (s, d) =>
        Tables
          .events(s, d)
          .withColumn("ts_local", from_utc_timestamp(col("ts"), "America/Sao_Paulo"))
          .groupBy(to_date(col("ts_local")).as("data_local"))
          .agg(count(lit(1)).as("n_eventos"), Exprs.dsum(col("value")).as("valor_total")),
      Some(s"""SELECT CAST(ts - INTERVAL 3 HOUR AS DATE) AS data_local,
              |  COUNT(*) AS n_eventos,
              |  ${Exprs.dsumSql("value")} AS valor_total
              |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "SURVEY C5 — UTC → America/Sao_Paulo day-grain keys",
      sort = Seq("data_local")
    ),

    // ── C7/S8: JSON decode of API payload columns. Oracle uses DuckDB's
    // native JSON path (not a digit regexp) so it stays faithful for
    // negative values / extra keys. ──
    "c7_json_extract" -> Q(
      (s, d) =>
        Tables
          .events(s, d)
          .select(
            col("event_id"),
            from_json(col("props"), StructType(Seq(StructField("k", LongType))))
              .getField("k")
              .as("k")),
      Some("""SELECT event_id,
             |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin),
      doc = "SURVEY S8/C7 — json_decode + nested path read config.php:82",
      sort = Seq("event_id")
    ),

    // ── C6: decimal-comma BRL money parse (Tiny ERP sends '12,34').
    // Round-trips price → '1234,56' string → double, exactly the
    // str_replace(',', '.') of tarefa_sincronizar_catalogo_tiny.php:81. ──
    "c6_decimal_comma" -> Q(
      (s, d) =>
        Tables
          .part(s, d)
          .withColumn(
            "custo_brl",
            translate(col("p_retailprice").cast(DecimalType(12, 2)).cast(StringType),
              ".", ","))
          .select(
            col("p_partkey"),
            col("custo_brl"),
            translate(col("custo_brl"), ",", ".").cast(DoubleType).as("custo_produto")),
      Some("""SELECT p_partkey, custo_brl,
             |  CAST(REPLACE(custo_brl, ',', '.') AS DOUBLE) AS custo_produto
             |FROM (SELECT p_partkey,
             |        REPLACE(CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR),
             |                '.', ',') AS custo_brl
             |      FROM part)
             |ORDER BY p_partkey""".stripMargin),
      doc = "SURVEY C6 — decimal-comma parse tarefa_sincronizar_catalogo_tiny.php:81",
      sort = Seq("p_partkey")
    )
  )
}
