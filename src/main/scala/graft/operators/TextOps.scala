package graft.operators

import graft.{Exprs, OpModule, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators a training-data pipeline runs over every
  * document: language ID (stopword-lexicon heuristic), quality scoring,
  * token counting (whitespace + regex sub-word), and content
  * fingerprinting (bag-of-words hash + rolling hash).
  *
  * All are single-pass narrow transforms — no shuffle at all except the
  * final nothing (each query is scan → project), which is exactly the
  * shape you want when the input is 100 TB of text: these run at parquet
  * scan speed, fused into one WholeStageCodegen span.
  */
object TextOps extends OpModule {
  import Exprs.{phash, phashSql}

  private val toksCol = split(trim(lower(col("text"))), "\\s+")
  private val toksSql = "string_split_regex(trim(lower(text)), '\\s+')"

  /** Tiny per-language stopword lexicons for the lang-ID heuristic (the
    * reference classifies nothing; this is the brief's n-gram-heuristic
    * lang-ID scaled down to lexicon hits — same plumbing, same shape). */
  private val lex = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von"),
    "es" -> Seq("el", "los", "de", "que", "y", "en"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une"),
    "pt" -> Seq("o", "os", "de", "que", "e", "do"))

  private def hitsExpr(words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString(", ")
    s"size(filter(toks, t -> t IN ($list)))"
  }

  private def hitsSql(words: Seq[String]): String = {
    val list = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(toks, t -> t IN ($list)))"
  }

  def queries: Map[String, Q] = Map(
    // ── Language ID: lexicon-hit argmax with fixed tie priority. ──
    "ta_langid" -> Q(
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), toksCol.as("toks"))
        val scored = lex.foldLeft(base) { case (df, (l, words)) =>
          df.withColumn(s"hits_$l", expr(hitsExpr(words)).cast(LongType))
        }
        val best = greatest(lex.map { case (l, _) => col(s"hits_$l") }: _*)
        val guess = lex.foldRight(lit("und"): org.apache.spark.sql.Column) {
          case ((l, _), acc) => when(col(s"hits_$l") === best && best > 0, lit(l)).otherwise(acc)
        }
        scored.select(
          (col("doc_id") +: lex.map { case (l, _) => col(s"hits_$l") }) :+
            guess.as("lang_guess"): _*)
      },
      Some {
        val hits = lex.map { case (l, w) => s"${hitsSql(w)} AS hits_$l" }.mkString(",\n  ")
        val best = "greatest(" + lex.map { case (l, _) => s"hits_$l" }.mkString(", ") + ")"
        val cases = lex.map { case (l, _) =>
          s"WHEN hits_$l = $best AND $best > 0 THEN '$l'"
        }.mkString(" ")
        s"""SELECT doc_id, ${lex.map { case (l, _) => s"hits_$l" }.mkString(", ")},
           |  CASE $cases ELSE 'und' END AS lang_guess
           |FROM (
           |  SELECT doc_id,
           |  $hits
           |  FROM (SELECT doc_id, $toksSql AS toks FROM documents))
           |ORDER BY doc_id""".stripMargin
      },
      doc = "LLM-pipeline: stopword-lexicon language ID heuristic",
      sort = Seq("doc_id")
    ),

    // ── Quality scoring: length/stopword/digit signals → [0,1] score. ──
    "ta_quality" -> Q(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), col("text"), toksCol.as("toks"))
          .select(
            col("doc_id"),
            length(col("text")).cast(LongType).as("n_chars_m"),
            size(col("toks")).cast(LongType).as("n_toks"),
            expr("aggregate(toks, 0L, (a, t) -> a + length(t))").as("tok_chars"),
            expr(hitsExpr(lex.head._2)).cast(LongType).as("stop_hits"),
            length(regexp_replace(col("text"), "[^0-9]", "")).cast(LongType).as("n_digits"))
          .select(
            col("doc_id"), col("n_chars_m"), col("n_toks"),
            (col("tok_chars").cast(DoubleType) / col("n_toks")).as("avg_tok_len"),
            (col("stop_hits").cast(DoubleType) / col("n_toks")).as("stop_ratio"),
            (col("n_digits").cast(DoubleType) / col("n_chars_m")).as("digit_ratio"),
            (least(lit(1.0), col("n_toks") / lit(100.0)) *
              (lit(0.5) + lit(0.5) * least(lit(1.0), col("stop_hits") / lit(5.0))) *
              (lit(1.0) - col("n_digits").cast(DoubleType) / col("n_chars_m")))
              .as("quality_score")),
      Some(s"""SELECT doc_id, n_chars_m, n_toks,
              |  tok_chars::DOUBLE / n_toks AS avg_tok_len,
              |  stop_hits::DOUBLE / n_toks AS stop_ratio,
              |  n_digits::DOUBLE / n_chars_m AS digit_ratio,
              |  least(1.0, n_toks / 100.0)
              |    * (0.5 + 0.5 * least(1.0, stop_hits / 5.0))
              |    * (1.0 - n_digits::DOUBLE / n_chars_m) AS quality_score
              |FROM (
              |  SELECT doc_id,
              |    length(text)::BIGINT AS n_chars_m,
              |    len(toks)::BIGINT AS n_toks,
              |    list_sum([length(t) FOR t IN toks])::BIGINT AS tok_chars,
              |    ${hitsSql(lex.head._2)}::BIGINT AS stop_hits,
              |    length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS n_digits
              |  FROM (SELECT doc_id, text, $toksSql AS toks FROM documents))
              |ORDER BY doc_id""".stripMargin),
      doc = "LLM-pipeline: document quality scoring (length/stopword/digit ratios)",
      sort = Seq("doc_id")
    ),

    // ── Token counting: whitespace tokens + a BPE-ish regex pass. ──
    "ta_token_stats" -> Q(
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            size(toksCol).cast(LongType).as("ws_tokens"),
            size(expr(
              raw"""regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]', 0)"""))
              .cast(LongType).as("re_tokens"),
            length(col("text")).cast(LongType).as("n_chars_m")),
      Some(raw"""SELECT doc_id,
                |  len($toksSql)::BIGINT AS ws_tokens,
                |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))::BIGINT
                |    AS re_tokens,
                |  length(text)::BIGINT AS n_chars_m
                |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "LLM-pipeline: whitespace + regex (BPE-ish) token counting",
      sort = Seq("doc_id")
    ),

    // ── Fingerprinting: order-free bag-of-words md5 + order-sensitive
    // 40-bit polynomial rolling hash (both engine-replayable). ──
    "ta_fingerprint" -> Q(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), toksCol.as("toks"))
          .select(
            col("doc_id"),
            md5(array_join(array_sort(array_distinct(col("toks"))), " ")).as("bow_fp"),
            expr(s"""aggregate(toks, 0L,
                    |  (a, t) -> (a * 31 + pmod(${phashSqlSpark("t")}, 1099511627776L))
                    |            % 1099511627776L)""".stripMargin).as("rolling_fp")),
      Some(s"""SELECT doc_id,
              |  md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS bow_fp,
              |  list_reduce(
              |    list_prepend(CAST(0 AS BIGINT),
              |      [${phashSql("t")} % 1099511627776 FOR t IN toks]),
              |    (a, x) -> (a * 31 + x) % 1099511627776) AS rolling_fp
              |FROM (SELECT doc_id, $toksSql AS toks FROM documents)
              |ORDER BY doc_id""".stripMargin),
      doc = "LLM-pipeline: bag-of-words + rolling-hash document fingerprints",
      sort = Seq("doc_id")
    )
  ) ++ extraQueries

  /** SQL-expression text of [[graft.Exprs.phash]] for use inside `expr`
    * lambdas (lambda variables aren't reachable from the Column API). */
  private def phashSqlSpark(x: String): String =
    s"CAST(conv(substring(md5($x), 1, 15), 16, 10) AS BIGINT)"

  /** Per-language sampling rates (per mille) for the mixing demo. */
  private val mixRates = Seq(
    "en" -> 800, "de" -> 500, "es" -> 500, "fr" -> 500, "pt" -> 500)

  private val extraQueries: Map[String, Q] = Map(
    // ── Deterministic stratified sampling — the data-mixing primitive:
    // keep a per-stratum fraction chosen by content-stable hash, so the
    // same doc is kept or dropped on every run and on every engine. Pure
    // map-side filter: scales at scan speed, no shuffle. ──
    "ta_sample_stratified" -> Q(
      (s, d) => {
        val bucket = pmod(phash(col("doc_id").cast(StringType)), lit(1000))
        val rate = mixRates.foldRight(lit(0): org.apache.spark.sql.Column) {
          case ((l, r), acc) => when(col("lang") === l, lit(r)).otherwise(acc)
        }
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), bucket.as("bucket"), rate.as("rate"))
          .filter(col("bucket") < col("rate"))
          .select(col("doc_id"), col("lang"))
      },
      Some {
        val cases = mixRates.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
          .mkString(" ")
        s"""SELECT doc_id, lang FROM (
           |  SELECT doc_id, lang,
           |    ${phashSql("CAST(doc_id AS VARCHAR)")} % 1000 AS bucket,
           |    CASE $cases ELSE 0 END AS rate
           |  FROM documents)
           |WHERE bucket < rate ORDER BY doc_id""".stripMargin
      },
      doc = "LLM-pipeline: deterministic hash-stratified sampling (data mixing)",
      sort = Seq("doc_id")
    ),

    // ── Weighted Bernoulli sampling with a PER-DOCUMENT continuous
    // rate: accept iff hash(doc) mod 10^6 < weight_ppm, where the
    // weight derives from a quality proxy (here: length, capped —
    // longer docs kept proportionally more often, ≥2000 chars always).
    // The stratified variant above samples at per-STRATUM rates; this
    // is the per-ROW generalization every curation pipeline ends up
    // needing ("sample by quality score"). Deterministic and
    // engine-exact: the accept test is pure integer arithmetic on the
    // replayable hash family — re-runs keep the same docs (content-
    // stable sampling, the property that makes dataset builds
    // reproducible). Map-only at scan speed. ──
    "ta_sample_weighted" -> Q(
      (s, d) => {
        val ppm = (least(col("n_chars"), lit(2000)) * 500).cast(LongType)
        Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"), ppm.as("rate_ppm"),
            pmod(phash(col("doc_id").cast(StringType)), lit(1000000L))
              .as("draw"))
          .filter(col("draw") < col("rate_ppm"))
          .select(col("doc_id"), col("n_chars"), col("rate_ppm"))
      },
      Some(s"""SELECT doc_id, n_chars, rate_ppm FROM (
              |  SELECT doc_id, n_chars,
              |    (least(n_chars, 2000) * 500)::BIGINT AS rate_ppm,
              |    ${phashSql("CAST(doc_id AS VARCHAR)")} % 1000000 AS draw
              |  FROM documents)
              |WHERE draw < rate_ppm ORDER BY doc_id""".stripMargin),
      doc = "LLM-pipeline: per-row weighted deterministic sampling (quality-weighted, content-stable)",
      sort = Seq("doc_id")
    ),

    // ── Priority sampling (Duffield et al.): weighted sampling WITHOUT
    // replacement to a FIXED BUDGET — the third sampling regime next to
    // per-stratum rates (`ta_sample_stratified`) and per-row rates
    // (`ta_sample_weighted`): "give me exactly k docs, long ones
    // preferentially". Each doc draws priority w/u from its weight and
    // a content-stable uniform u ∈ (0,1]; the sample is the top-k by
    // priority — deterministic, mergeable (local top-k then global
    // re-rank, the two-phase shape), and replayable in both engines
    // because u comes from the portable hash family and the one
    // division is a single IEEE op. ──
    "ta_sample_priority" -> Q(
      (s, d) => {
        val u = (pmod(phash(col("doc_id").cast(StringType)), lit(1000000L)) + 1L)
          .cast(DoubleType) / 1e6
        Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"),
            (col("n_chars").cast(DoubleType) / u).as("priority"))
          .orderBy(col("priority").desc, col("doc_id").asc)
          .limit(200)
      },
      Some(s"""SELECT doc_id, n_chars,
              |  n_chars::DOUBLE
              |    / ((${phashSql("CAST(doc_id AS VARCHAR)")} % 1000000 + 1)
              |       ::DOUBLE / 1e6) AS priority
              |FROM documents
              |ORDER BY priority DESC, doc_id LIMIT 200""".stripMargin),
      doc = "LLM-pipeline: priority sampling (weighted, without replacement, fixed budget — two-phase top-k)",
      sort = Nil
    ),

    // ── Benchmark decontamination: flag training documents that share
    // any 13-gram with a held-out evaluation set — the standard
    // pre-training hygiene pass (13 is the n GPT-3/PaLM-style decontam
    // used; long enough that natural reuse is rare, short enough to
    // catch embedded test items). DISTINCT from dedup: the relation is
    // asymmetric (train × benchmark only), the trigger is ANY overlap,
    // not a similarity threshold, and the benchmark side is tiny and
    // static. The "benchmark" here is a deterministic doc_id slice so
    // both engines carve identical sides. Plan: 13-grams are
    // near-unique, so the shingle equi-join touches only true overlaps
    // — candidate volume IS the contamination volume; the benchmark
    // side's exploded shingles are the stored index at scale (same
    // posture as `dedup_incremental`). Array-free via the Generator. ──
    "ta_decontaminate" -> Q(
      (s, d) => {
        // persisted once: both join sides slice the same shingle rows,
        // and 13-gram shingling is the query's CPU bulk
        val sh = Tables.documents(s, d)
          .select(col("doc_id"), expr("shingle_explode(text, 13)").as("sh"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        sh.count()
        val bench = sh.where(pmod(col("doc_id"), lit(7)) === 0)
          .select(col("doc_id").as("bench_id"), col("sh"))
        val corpus = sh.where(pmod(col("doc_id"), lit(7)) =!= 0)
        corpus
          .join(bench.hint("shuffle_hash"), "sh")
          .groupBy(col("doc_id"), col("bench_id"))
          .agg(count(lit(1)).as("shared_13grams"))
      },
      Some(s"""WITH toks AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(toks) >= 13
              |  THEN [${(0 until 13).map(i => s"toks[i+$i]").mkString(" || ' ' || ")}
              |        FOR i IN range(1, len(toks)-11)]
              |  ELSE [] END) AS shingles FROM toks),
              |bench AS (SELECT doc_id AS bench_id, unnest(shingles) AS sh
              |          FROM sh WHERE doc_id % 7 = 0),
              |corp AS (SELECT doc_id, unnest(shingles) AS sh
              |         FROM sh WHERE doc_id % 7 <> 0)
              |SELECT doc_id, bench_id, count(*)::BIGINT AS shared_13grams
              |FROM corp JOIN bench USING (sh)
              |GROUP BY 1, 2 ORDER BY doc_id, bench_id""".stripMargin),
      doc = "LLM-pipeline: benchmark decontamination (any shared 13-gram vs a held-out slice — asymmetric, index-backed)",
      sort = Seq("doc_id", "bench_id")
    ),

    // ── Shard manifest: the dataset-card table a corpus release ships —
    // per source shard, document/token/char totals plus a content
    // checksum. The checksum is an XOR-fold of the per-document
    // portable hashes: order-free and mergeable (partial manifests from
    // two ingest runs combine by XOR), so it map-combines like any
    // aggregate and never materializes a per-shard document list —
    // the property a concat-then-hash checksum lacks at scale. ──
    "ta_shard_manifest" -> Q(
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(size(toksCol).cast(LongType)).as("total_tokens"),
            sum(col("n_chars")).as("total_chars"),
            // XOR-fold SALTED with the doc_id discriminator: a plain
            // bit_xor(phash(text)) is blind to even multiplicities —
            // adding or removing any PAIR of identical documents leaves
            // it unchanged, which defeats the ingest-reconciliation
            // purpose. Hashing (doc_id, text) together keeps the fold
            // order-free and mergeable while every row, duplicate
            // content included, perturbs the checksum.
            expr("bit_xor(" +
              phashSqlSpark("concat(cast(doc_id as string), ':', text)") +
              ")").as("content_checksum")),
      Some(s"""SELECT source, count(*)::BIGINT AS n_docs,
              |  sum(len($toksSql))::BIGINT AS total_tokens,
              |  sum(n_chars)::BIGINT AS total_chars,
              |  bit_xor(${phashSql("CAST(doc_id AS VARCHAR) || ':' || text")})
              |    AS content_checksum
              |FROM documents GROUP BY 1 ORDER BY source""".stripMargin),
      doc = "LLM-pipeline: shard manifest (dataset-card totals + order-free mergeable XOR checksum, doc-salted)",
      sort = Seq("source")
    ),

    // ── Curation filter funnel: survivor counts after each successive
    // quality gate — the stage-attrition table every corpus-curation
    // run reports (what fraction did language ID remove? length? digit
    // noise?). ONE pass: each stage is a conjunction flag, the funnel
    // is four conditional sums in a single map-combined aggregate —
    // no per-stage scans, no shuffle beyond one row per partition. ──
    "ta_filter_funnel" -> Q(
      (s, d) => {
        val f1 = col("lang") === "en"
        val f2 = f1 && col("n_chars").between(200, 20000)
        val f3 = f2 &&
          (length(regexp_replace(col("text"), "[^0-9]", "")).cast(DoubleType) /
            length(col("text")) < 0.3)
        val agg = Tables.documents(s, d).agg(
          count(lit(1)).as("s0_all"),
          sum(when(f1, 1L).otherwise(0L)).as("s1_lang"),
          sum(when(f2, 1L).otherwise(0L)).as("s2_len"),
          sum(when(f3, 1L).otherwise(0L)).as("s3_digit"))
        agg.select(explode(array(
          struct(lit("0_all").as("stage"), col("s0_all").as("survivors")),
          struct(lit("1_lang_en").as("stage"), col("s1_lang").as("survivors")),
          struct(lit("2_len_200_20k").as("stage"), col("s2_len").as("survivors")),
          struct(lit("3_digit_lt_30pct").as("stage"), col("s3_digit").as("survivors"))))
          .as("r"))
          .select(col("r.stage").as("stage"), col("r.survivors").as("survivors"))
      },
      Some("""WITH agg AS (
             |  SELECT
             |    count(*)::BIGINT AS s0,
             |    sum(CASE WHEN f1 THEN 1 ELSE 0 END)::BIGINT AS s1,
             |    sum(CASE WHEN f2 THEN 1 ELSE 0 END)::BIGINT AS s2,
             |    sum(CASE WHEN f3 THEN 1 ELSE 0 END)::BIGINT AS s3
             |  FROM (
             |    SELECT lang = 'en' AS f1,
             |      lang = 'en' AND n_chars BETWEEN 200 AND 20000 AS f2,
             |      lang = 'en' AND n_chars BETWEEN 200 AND 20000
             |        AND length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
             |            / length(text) < 0.3 AS f3
             |    FROM documents))
             |SELECT '0_all' AS stage, s0 AS survivors FROM agg
             |UNION ALL SELECT '1_lang_en', s1 FROM agg
             |UNION ALL SELECT '2_len_200_20k', s2 FROM agg
             |UNION ALL SELECT '3_digit_lt_30pct', s3 FROM agg
             |ORDER BY stage""".stripMargin),
      doc = "LLM-pipeline: curation filter funnel (stage attrition in one map-combined pass)",
      sort = Seq("stage")
    ),

    // ── Conjunctive boolean search: documents containing ALL query
    // terms, resolved the inverted-index way — one (doc, term) posting
    // row per hit, grouped and gated on the full term count (an
    // AND-of-postings intersection; OR is the same plan minus the
    // HAVING). The query terms ride a tiny IN-list; the posting
    // relation is the stored index at scale, so a search touches only
    // the requested terms' postings — never the corpus. ──
    "ta_boolean_search" -> Q(
      (s, d) => {
        val terms = Seq("query", "window", "merge")
        Tables.documents(s, d)
          .select(col("doc_id"), expr("shingle_explode(text, 1)").as("term"))
          .where(col("term").isin(terms: _*))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_terms"))
          .where(col("n_terms") === terms.size)
          .select(col("doc_id"), col("n_terms"))
      },
      Some(s"""SELECT doc_id, count(*)::BIGINT AS n_terms
              |FROM (
              |  SELECT doc_id, unnest(list_distinct($toksSql)) AS term
              |  FROM documents)
              |WHERE term IN ('query', 'window', 'merge')
              |GROUP BY 1 HAVING count(*) = 3
              |ORDER BY doc_id""".stripMargin),
      doc = "LLM-pipeline: conjunctive boolean search (AND-of-postings intersection over the inverted-index shape)",
      sort = Seq("doc_id")
    ),

    // ── Collocation mining: bigrams whose document frequency far
    // exceeds what their words' independent frequencies predict —
    // lift = N·df(xy) / (df(x)·df(y)), the log-free core of PMI (log
    // is monotone, so the RANKING is PMI's; staying rational keeps
    // every value an exact-integer ratio, where a log would hand each
    // engine's libm the last ulp). All counts are distinct-doc counts
    // from the same Generator rows; the one cross join carries a
    // single broadcast count row. ──
    "ta_collocations" -> Q(
      (s, d) => {
        val docs = Tables.documents(s, d)
        val uni = docs
          .select(col("doc_id"), expr("shingle_explode(text, 1)").as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("dfw"))
        val big = docs
          .select(col("doc_id"), expr("shingle_explode(text, 2)").as("bg"))
          .groupBy(col("bg")).agg(count(lit(1)).as("dfb"))
          .where(col("dfb") >= 5)
        big
          .withColumn("w1", split(col("bg"), " ").getItem(0))
          .withColumn("w2", split(col("bg"), " ").getItem(1))
          .join(uni.toDF("w1", "df1"), "w1")
          .join(uni.toDF("w2", "df2"), "w2")
          .crossJoin(broadcast(docs.agg(count(lit(1)).as("nd"))))
          .select(col("bg").as("bigram"), col("dfb"),
            ((col("nd") * col("dfb")).cast(DoubleType) /
              (col("df1") * col("df2")).cast(DoubleType)).as("lift"))
          .orderBy(col("lift").desc, col("bigram").asc)
          .limit(20)
      },
      Some(s"""WITH toks AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |uni AS (SELECT w, count(*)::BIGINT AS dfw FROM (
              |  SELECT doc_id, unnest(list_distinct(toks)) AS w FROM toks)
              |  GROUP BY 1),
              |big AS (SELECT bg, count(*)::BIGINT AS dfb FROM (
              |  SELECT doc_id, unnest(list_distinct(
              |    CASE WHEN len(toks) >= 2
              |      THEN [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]
              |      ELSE [] END)) AS bg FROM toks)
              |  GROUP BY 1 HAVING count(*) >= 5),
              |n AS (SELECT count(*)::BIGINT AS nd FROM documents)
              |SELECT bg AS bigram, dfb,
              |  (nd * dfb)::DOUBLE / (u1.dfw * u2.dfw)::DOUBLE AS lift
              |FROM big, n
              |JOIN uni u1 ON u1.w = string_split(bg, ' ')[1]
              |JOIN uni u2 ON u2.w = string_split(bg, ' ')[2]
              |ORDER BY lift DESC, bigram LIMIT 20""".stripMargin),
      doc = "LLM-pipeline: collocation mining (log-free PMI lift over distinct-doc counts, exact ratios)",
      sort = Nil
    ),

    // ── First-order Markov transition statistics over per-user event
    // sequences — the "what follows what" table sequence models and
    // funnel analyses start from. Per user, events order by (ts,
    // event_id) — a total order, so lag() is engine-deterministic —
    // and each (prev → next) bigram feeds one map-combined count;
    // probabilities are exact int/int divisions against the per-source
    // total. One shuffle on the user key, one on the (tiny)
    // transition-pair aggregate. ──
    "seq1_markov_transitions" -> Q(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val bigrams = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .where(col("next_type").isNotNull)
          .groupBy(col("event_type").as("from_type"),
            col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val wTot = org.apache.spark.sql.expressions.Window
          .partitionBy(col("from_type"))
        bigrams.select(col("from_type"), col("to_type"), col("n"),
          (col("n").cast(DoubleType) /
            sum(col("n")).over(wTot).cast(DoubleType)).as("p"))
      },
      Some("""WITH seq AS (
             |  SELECT event_type AS from_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |                           ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |big AS (
             |  SELECT from_type, to_type, count(*)::BIGINT AS n
             |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
             |SELECT from_type, to_type, n,
             |  n::DOUBLE / sum(n) OVER (PARTITION BY from_type)::DOUBLE AS p
             |FROM big ORDER BY from_type, to_type""".stripMargin),
      doc = "Extension: Markov transition stats over event sequences (per-user lag bigrams, exact probabilities)",
      sort = Seq("from_type", "to_type")
    ),

    // ── Context-window sequence packing: assign docs to 4096-token bins
    // by cumulative token count within each source shard. The window
    // partitions by `source` (a shard key), never globally — the
    // deterministic, scalable variant of greedy packing (true greedy is
    // inherently sequential; per-shard offset packing is what large
    // pipelines run). ──
    "ta_pack_sequences" -> Q(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            size(toksCol).cast(LongType).as("n_toks"))
          .withColumn("cum_toks", sum(col("n_toks")).over(w))
          .select(col("doc_id"), col("source"), col("n_toks"),
            expr("(cum_toks - n_toks) div 4096").as("bin"),
            ((col("cum_toks") - lit(1)) % 4096).as("end_offset"))
      },
      // CAST(... AS BIGINT) on the windowed SUM: DuckDB widens it to
      // HUGEINT → decimal128, and `//` / `%` would stay decimal — which
      // the driver's cross-engine hash can't canonicalize.
      Some(s"""SELECT doc_id, source, n_toks,
              |  (cum_toks - n_toks) // 4096 AS bin,
              |  (cum_toks - 1) % 4096 AS end_offset
              |FROM (
              |  SELECT doc_id, source, n_toks,
              |    CAST(SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
              |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks
              |  FROM (SELECT doc_id, source,
              |          len($toksSql)::BIGINT AS n_toks FROM documents))
              |ORDER BY doc_id""".stripMargin),
      doc = "LLM-pipeline: per-shard context-window sequence packing (4096 tokens)",
      sort = Seq("doc_id")
    ),

    // ── PII scrubbing: mask emails and long digit runs (the standard
    // pre-training redaction pass). Map-only — runs at scan speed; both
    // engines share the RE2-compatible regex subset, so the oracle
    // replays the exact rewrite. ──
    "ta_scrub_pii" -> Q(
      (s, d) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val digits = "[0-9]{6,}"
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            size(expr(s"regexp_extract_all(text, '$email', 0)"))
              .cast(LongType).as("n_emails"),
            size(expr(s"regexp_extract_all(text, '$digits', 0)"))
              .cast(LongType).as("n_long_digit_runs"),
            regexp_replace(
              regexp_replace(col("text"), email, "<EMAIL>"),
              digits, "<NUM>").as("clean_text"))
      },
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(text,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
             |    AS n_emails,
             |  len(regexp_extract_all(text, '[0-9]{6,}'))::BIGINT
             |    AS n_long_digit_runs,
             |  regexp_replace(
             |    regexp_replace(text,
             |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             |      '<EMAIL>', 'g'),
             |    '[0-9]{6,}', '<NUM>', 'g') AS clean_text
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "LLM-pipeline: PII scrubbing (email + long-digit-run masking)",
      sort = Seq("doc_id")
    ),

    // ── Repetition filters (the Gopher/C4-style quality signals):
    // duplicate-token and duplicate-bigram fractions. High repetition is
    // the canonical low-quality-document marker. Map-only. ──
    "ta_repetition" -> Q(
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), toksCol.as("toks"))
          .withColumn("bg",
            when(size(col("toks")) >= 2,
              expr("transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))"))
              .otherwise(array().cast(ArrayType(StringType))))
          .select(
            col("doc_id"),
            size(col("toks")).cast(LongType).as("n_toks"),
            (lit(1.0) - size(array_distinct(col("toks"))).cast(DoubleType)
              / size(col("toks"))).as("dup_tok_ratio"),
            when(size(col("bg")) > 0,
              lit(1.0) - size(array_distinct(col("bg"))).cast(DoubleType)
                / size(col("bg")))
              .otherwise(lit(0.0)).as("dup_bigram_ratio")),
      Some(s"""SELECT doc_id,
              |  len(toks)::BIGINT AS n_toks,
              |  1.0 - len(list_distinct(toks))::DOUBLE / len(toks) AS dup_tok_ratio,
              |  CASE WHEN len(bg) > 0
              |       THEN 1.0 - len(list_distinct(bg))::DOUBLE / len(bg)
              |       ELSE 0.0 END AS dup_bigram_ratio
              |FROM (
              |  SELECT doc_id, toks,
              |    CASE WHEN len(toks) >= 2
              |         THEN [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]
              |         ELSE [] END AS bg
              |  FROM (SELECT doc_id, $toksSql AS toks FROM documents))
              |ORDER BY doc_id""".stripMargin),
      doc = "LLM-pipeline: Gopher-style repetition quality filters (dup token/bigram ratios)",
      sort = Seq("doc_id")
    ),

    // ── LM-prior quality score (CCNet-style): score each doc by the
    // mean log10 corpus frequency of its tokens. Two-pass: corpus
    // unigram table (one fact shuffle) SHUFFLE-joined to the exploded
    // tokens, then a per-doc aggregate. The unigram table is NOT
    // broadcast: a web-scale corpus's vocabulary is unbounded (billions
    // of distinct tokens), so the probe must be a shuffle join — the
    // token relation is already shuffling into the per-doc aggregate
    // anyway. Only the 1-row corpus total rides a broadcast. log10
    // addends go through the dsum decimal path so the fold is order- and
    // engine-independent. ──
    "ta_lm_score" -> Q(
      (s, d) => {
        // persisted: the tokenize+explode subtree feeds both the unigram
        // build and the join probe (same rationale as the dedup family)
        val tok = toks(s, d).select(col("doc_id"), explode(col("toks")).as("tok"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val counts = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val total = counts.agg(sum(col("c")).cast(DoubleType).as("n"))
        val freqs = counts.crossJoin(broadcast(total))
          .select(col("tok"), (col("c") / col("n")).as("p"))
        tok.hint("shuffle_hash").join(freqs.hint("shuffle_hash"), "tok")
          .groupBy(col("doc_id"))
          .agg(
            (Exprs.dsum(log10(col("p"))) / count(lit(1))).as("lm_score"),
            count(lit(1)).as("n_toks"))
      },
      Some(s"""WITH tok AS (
              |  SELECT doc_id, unnest(toks) AS tok
              |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
              |freqs AS (
              |  SELECT tok, COUNT(*) / (SELECT COUNT(*)::DOUBLE FROM tok) AS p
              |  FROM tok GROUP BY 1)
              |SELECT doc_id,
              |  ${Exprs.dsumSql("log10(p)")} / COUNT(*) AS lm_score,
              |  COUNT(*) AS n_toks
              |FROM tok JOIN freqs USING (tok)
              |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "LLM-pipeline: corpus-LM-prior quality score (mean log token frequency)",
      sort = Seq("doc_id")
    ),

    // ── Data-mixing budget: compute per-language sampling rates FROM the
    // corpus to hit a token budget (30% of corpus tokens, split evenly
    // across languages — the "rebalance a skewed crawl" step that
    // precedes `ta_sample_stratified`'s fixed-rate apply). Three stages,
    // each cheap at 100 TB: (1) per-doc token counts map-side, one tiny
    // shuffle to per-language totals; (2) the per-language rate table is
    // a handful of rows — joined back BROADCAST (languages are bounded,
    // unlike `ta_lm_score`'s unbounded vocab); (3) the selection itself
    // is the same content-stable hash-threshold filter as
    // ta_sample_stratified, map-only. Rate arithmetic is pure double
    // with one expression shape on both engines, so the emitted rates
    // compare exactly. `docs` is a def: each use builds a fresh plan,
    // sidestepping self-join exprId ambiguity. ──
    "ta_mixture_budget" -> Q(
      (s, d) => {
        def docs: DataFrame = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            size(toksCol).cast(LongType).as("n_toks"),
            pmod(phash(col("doc_id").cast(StringType)), lit(1000000)).as("bucket"))
        val byLang = docs.groupBy(col("lang"))
          .agg(sum(col("n_toks")).as("tot_toks"), count(lit(1)).as("n_docs"))
        val totals = byLang.agg(
          sum(col("tot_toks")).cast(DoubleType).as("corpus_toks"),
          count(lit(1)).cast(DoubleType).as("n_langs"))
        val rates = byLang.crossJoin(broadcast(totals))
          .withColumn("rate",
            least(lit(1.0),
              col("corpus_toks") * 0.3 / col("n_langs") / col("tot_toks")))
        val sel = docs
          .join(broadcast(rates.select(col("lang").as("l2"), col("rate"))),
            col("lang") === col("l2"))
          .filter(col("bucket").cast(DoubleType) < col("rate") * 1000000.0)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("sel_docs"), sum(col("n_toks")).as("sel_toks"))
        rates.select(col("lang"), col("tot_toks"), col("n_docs"), col("rate"))
          .join(sel, Seq("lang"), "left")
          .select(col("lang"), col("tot_toks"), col("n_docs"), col("rate"),
            coalesce(col("sel_docs"), lit(0L)).as("sel_docs"),
            coalesce(col("sel_toks"), lit(0L)).as("sel_toks"))
      },
      Some(s"""WITH docs AS (
              |  SELECT doc_id, lang, len($toksSql)::BIGINT AS n_toks,
              |    ${phashSql("CAST(doc_id AS VARCHAR)")} % 1000000 AS bucket
              |  FROM documents),
              |by_lang AS (
              |  SELECT lang, CAST(SUM(n_toks) AS BIGINT) AS tot_toks,
              |    COUNT(*) AS n_docs
              |  FROM docs GROUP BY 1),
              |tot AS (
              |  SELECT CAST(SUM(tot_toks) AS BIGINT)::DOUBLE AS corpus_toks,
              |    COUNT(*)::DOUBLE AS n_langs
              |  FROM by_lang),
              |rates AS (
              |  SELECT lang, tot_toks, n_docs,
              |    least(1.0, corpus_toks * 0.3 / n_langs / tot_toks) AS rate
              |  FROM by_lang, tot),
              |sel AS (
              |  SELECT d.lang, COUNT(*) AS sel_docs,
              |    CAST(SUM(d.n_toks) AS BIGINT) AS sel_toks
              |  FROM docs d JOIN rates r ON r.lang = d.lang
              |  WHERE d.bucket::DOUBLE < r.rate * 1000000.0
              |  GROUP BY 1)
              |SELECT r.lang, r.tot_toks, r.n_docs, r.rate,
              |  COALESCE(s.sel_docs, 0) AS sel_docs,
              |  COALESCE(s.sel_toks, 0) AS sel_toks
              |FROM rates r LEFT JOIN sel s ON s.lang = r.lang
              |ORDER BY r.lang""".stripMargin),
      doc = "LLM-pipeline: data-mixing budget (per-language rates from corpus token totals)",
      sort = Seq("lang")
    ),

    // ── End-to-end corpus preparation — the integration query that chains
    // the pipeline's stages the way a real pre-training run does:
    // (1) exact dedup on the bag-of-words fingerprint (one window over
    // hash-partitioned fingerprint groups, keep-first by doc_id);
    // (2) quality scoring + threshold (map-only, ta_quality's formula);
    // (3) per-source-shard sequence packing over the survivors (the
    // ta_pack_sequences window, now on the filtered set). Stage order
    // matters at scale: dedup before scoring avoids scoring dropped
    // copies, and packing must run last because bins depend on which
    // docs survive. Two shuffles total (fingerprint groups, source
    // shards) — both on keys that scale with the corpus. ──
    "ta_corpus_prep" -> Q(
      (s, d) => {
        val wFp = org.apache.spark.sql.expressions.Window
          .partitionBy(col("bow_fp")).orderBy(col("doc_id"))
        val wPack = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"), col("text"),
            toksCol.as("toks"))
          .withColumn("bow_fp",
            md5(array_join(array_sort(array_distinct(col("toks"))), " ")))
          .withColumn("rn", row_number().over(wFp))
          .filter(col("rn") === 1)
          .select(
            col("doc_id"), col("lang"), col("source"),
            size(col("toks")).cast(LongType).as("n_toks"),
            expr(hitsExpr(lex.head._2)).cast(LongType).as("stop_hits"),
            length(regexp_replace(col("text"), "[^0-9]", "")).cast(LongType)
              .as("n_digits"),
            length(col("text")).cast(LongType).as("n_chars_m"))
          .withColumn("quality_score",
            least(lit(1.0), col("n_toks") / lit(100.0)) *
              (lit(0.5) + lit(0.5) * least(lit(1.0), col("stop_hits") / lit(5.0))) *
              (lit(1.0) - col("n_digits").cast(DoubleType) / col("n_chars_m")))
          .filter(col("quality_score") >= 0.2)
          .withColumn("cum_toks", sum(col("n_toks")).over(wPack))
          .select(col("doc_id"), col("source"), col("lang"), col("n_toks"),
            col("quality_score"),
            expr("(cum_toks - n_toks) div 4096").as("bin"))
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id, lang, source, text, $toksSql AS toks
              |  FROM documents),
              |ded AS (
              |  SELECT * FROM (
              |    SELECT *, ROW_NUMBER() OVER (
              |      PARTITION BY md5(array_to_string(
              |        list_sort(list_distinct(toks)), ' '))
              |      ORDER BY doc_id) AS rn
              |    FROM base)
              |  WHERE rn = 1),
              |scored AS (
              |  SELECT doc_id, lang, source, n_toks,
              |    least(1.0, n_toks / 100.0)
              |      * (0.5 + 0.5 * least(1.0, stop_hits / 5.0))
              |      * (1.0 - n_digits::DOUBLE / n_chars_m) AS quality_score
              |  FROM (
              |    SELECT doc_id, lang, source,
              |      len(toks)::BIGINT AS n_toks,
              |      ${hitsSql(lex.head._2)}::BIGINT AS stop_hits,
              |      length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT
              |        AS n_digits,
              |      length(text)::BIGINT AS n_chars_m
              |    FROM ded)),
              |keep AS (SELECT * FROM scored WHERE quality_score >= 0.2)
              |SELECT doc_id, source, lang, n_toks, quality_score,
              |  (cum_toks - n_toks) // 4096 AS bin
              |FROM (
              |  SELECT *, CAST(SUM(n_toks) OVER (PARTITION BY source
              |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
              |    AS cum_toks
              |  FROM keep)
              |ORDER BY doc_id""".stripMargin),
      doc = "LLM-pipeline: end-to-end corpus prep (dedup -> quality gate -> shard packing)",
      sort = Seq("doc_id")
    ),

    // ── TF-IDF top-3 terms per document. The idf is the RATIONAL variant
    // (N+1)/(df+1) — no logarithm, deliberately: ln() is a libm call with
    // no cross-engine bit guarantee, while int-valued doubles and one
    // division are IEEE-exact in both engines, so the scores (and the
    // ranking they drive) are engine-identical with no quantization step.
    // Monotonic in tf and 1/df like the log form, which is all a top-k
    // ranking consumes. Shape at scale: tf is a (doc, term) hash agg, df
    // a (term) hash agg, both map-side combined; the corpus count rides a
    // broadcast; the rank window partitions by doc_id (high-cardinality,
    // per-doc groups bounded by document length). ──
    "ta_tfidf" -> Q(
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), explode(toksCol).as("term"))
          .filter(col("term") =!= "")
        val tf = toks.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = toks.select(col("doc_id"), col("term")).distinct()
          .groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = Tables.documents(s, d).agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term").asc)
        tf.join(df, Seq("term")).crossJoin(broadcast(n))
          .withColumn("score",
            (col("tf") * (col("n") + lit(1.0))) / (col("df") + lit(1.0)))
          .withColumn("rnk", row_number().over(w).cast(LongType))
          .filter(col("rnk") <= 3)
          .select(col("doc_id"), col("rnk"), col("term"), col("tf"),
            col("df"), col("score"))
      },
      Some(s"""WITH toks AS (
              |  SELECT doc_id, unnest($toksSql) AS term FROM documents),
              |tf AS (
              |  SELECT doc_id, term, count(*)::BIGINT AS tf
              |  FROM toks WHERE term <> '' GROUP BY 1, 2),
              |df AS (
              |  SELECT term, count(DISTINCT doc_id)::BIGINT AS df
              |  FROM toks WHERE term <> '' GROUP BY 1),
              |n AS (SELECT count(*)::BIGINT AS n FROM documents),
              |ranked AS (
              |  SELECT doc_id, term, tf, df,
              |    (tf * (n.n + 1.0)) / (df + 1.0) AS score
              |  FROM tf JOIN df USING (term) CROSS JOIN n)
              |SELECT doc_id,
              |  row_number() OVER (PARTITION BY doc_id
              |    ORDER BY score DESC, term)::BIGINT AS rnk,
              |  term, tf, df, score
              |FROM ranked
              |QUALIFY rnk <= 3 ORDER BY doc_id, rnk""".stripMargin),
      doc = "LLM-pipeline: TF-IDF top-3 terms per document (log-free rational idf, engine-exact)",
      sort = Seq("doc_id", "rnk")
    ),

    // ── BM25 ranking (Robertson et al.'s Okapi BM25 weighting, the
    // standard probabilistic retrieval model): the SCORING counterpart
    // of ta_boolean_search — top-15 documents for a fixed query under
    // the BM25 tf-saturation model. Engine-exact by the family's
    // conventions: the idf is the
    // RATIONAL (N+1)/(df+0.5) (log-free — same reasoning as ta_tfidf:
    // ln() hands each engine's libm the last ulp; the rational form is
    // monotone in 1/df, which is all the ranking consumes), the
    // saturation term tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) is pure
    // IEEE arithmetic written in the same shape on both sides (k1=1.2,
    // b=0.75 — the DuckDB literals carry explicit ::DOUBLE casts, or
    // DuckDB would run them as exact DECIMALs and diverge by an ulp
    // before the final quantization), avgdl is an exact integer sum
    // over one division (never
    // an incremental double avg — accumulation order differs between
    // engines), and the per-term scores sum through DECIMAL(38,9) so
    // the 3-addend addition is order-free. Shape at scale: the IN-list
    // prunes the exploded token stream to query-term rows before any
    // exchange; df reuses the tf aggregate (3 rows, broadcast); dl is
    // a narrow per-doc projection joined on doc_id; the top-15 is
    // TakeOrderedAndProject, never a global sort. ──
    "ta_bm25" -> Q(
      (s, d) => {
        val terms = Seq("query", "window", "merge")
        val base = Tables.documents(s, d)
          .select(col("doc_id"),
            filter(toksCol, t => t =!= lit("")).as("toks"))
        val dls = base.select(col("doc_id"),
          size(col("toks")).cast(LongType).as("dl"))
        val stats = dls.agg(
          (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl"),
          count(lit(1)).as("n"))
        val tf = base.select(col("doc_id"), explode(col("toks")).as("term"))
          .where(col("term").isin(terms: _*))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        tf.join(broadcast(df), Seq("term"))
          .join(dls, Seq("doc_id"))
          .crossJoin(broadcast(stats))
          .withColumn("term_score",
            ((col("n") + lit(1.0)) / (col("df") + lit(0.5))) *
              ((col("tf") * lit(2.2)) /
                (col("tf") + lit(1.2) *
                  (lit(0.25) + lit(0.75) * (col("dl") / col("avgdl"))))))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_terms"),
            sum(col("term_score").cast(DecimalType(38, 9)))
              .cast(DoubleType).as("score"))
          .orderBy(col("score").desc, col("doc_id").asc)
          .limit(15)
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id, list_filter($toksSql, t -> t <> '') AS toks
              |  FROM documents),
              |dls AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM base),
              |stats AS (
              |  SELECT sum(dl)::DOUBLE / count(*) AS avgdl,
              |         count(*)::BIGINT AS n
              |  FROM dls),
              |tf AS (
              |  SELECT doc_id, term, count(*)::BIGINT AS tf
              |  FROM (SELECT doc_id, unnest(toks) AS term FROM base)
              |  WHERE term IN ('query', 'window', 'merge')
              |  GROUP BY 1, 2),
              |df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
              |scored AS (
              |  SELECT doc_id,
              |    ((n + 1.0::DOUBLE) / (df + 0.5::DOUBLE)) *
              |      ((tf * 2.2::DOUBLE) /
              |        (tf + 1.2::DOUBLE *
              |          (0.25::DOUBLE + 0.75::DOUBLE * (dl / avgdl))))
              |      AS term_score
              |  FROM tf JOIN df USING (term) JOIN dls USING (doc_id)
              |  CROSS JOIN stats)
              |SELECT doc_id, count(*)::BIGINT AS n_terms,
              |  CAST(CAST(SUM(CAST(term_score AS DECIMAL(38,9))) AS VARCHAR) AS DOUBLE) AS score
              |FROM scored GROUP BY 1
              |ORDER BY score DESC, doc_id LIMIT 15""".stripMargin),
      doc = "LLM-pipeline: BM25 top-15 ranking (rational log-free idf, order-free decimal term sum)",
      sort = Nil
    ),

    // ── Inverted index: per term, document frequency + a CAPPED posting
    // list (first 10 doc_ids). The posting cap is enforced BEFORE any
    // array materializes — a per-term row_number ≤ 10 (WindowGroupLimit
    // prunes each map partition to 10 rows per term before the exchange),
    // so a stopword's million-document posting never exists as an array;
    // collect_list only ever sees ≤ 10 rows per term. The df count
    // aggregates separately over all (doc, term) pairs. Emitted as a
    // joined string so the driver compares scalars, not nested lists. ──
    "ta_inverted_index" -> Q(
      (s, d) => {
        val pairs = Tables.documents(s, d)
          .select(col("doc_id"), explode(toksCol).as("term"))
          .filter(col("term") =!= "")
          .distinct()
        val df = pairs.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
        val posting = pairs
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 10)
          .groupBy(col("term"))
          .agg(array_join(sort_array(collect_list(col("doc_id"))), ",")
            .as("posting"))
        df.join(posting, Seq("term"))
          .orderBy(col("df").desc, col("term").asc)
          .limit(50)
          .select(col("term"), col("df"), col("posting"))
      },
      Some(s"""WITH pairs AS (
              |  SELECT DISTINCT doc_id, term FROM (
              |    SELECT doc_id, unnest($toksSql) AS term FROM documents)
              |  WHERE term <> '')
              |SELECT term, count(*)::BIGINT AS df,
              |  array_to_string(list(doc_id ORDER BY doc_id)[1:10], ',')
              |    AS posting
              |FROM pairs GROUP BY 1
              |ORDER BY df DESC, term LIMIT 50""".stripMargin),
      doc = "LLM-pipeline: inverted index build (df + capped posting lists, cap applied pre-array)",
      sort = Nil
    ),

    // ── Sketch: Space-Saving frequent items (heavy hitters) over the
    // corpus token stream, via the custom `freq_items_sketch`
    // TypedImperativeAggregate ([[graft.functions.FreqItemsSketch]]).
    // The 100 TB path for "top terms": one capacity-bounded binary
    // buffer per partition crosses the exchange instead of a row per
    // distinct term (the exact twin `ta_inverted_index` ships the whole
    // term dictionary). Estimates depend on the partition layout by
    // design → rows-only check; `SketchSpec` pins the Space-Saving
    // guarantees (est−err ≤ true ≤ est; every > n/capacity item
    // present) against exact counts under forced multi-partition
    // merges. ──
    "sk5_freq_items" -> Q(
      (s, d) => {
        val tokens = Tables.documents(s, d)
          .select(explode(toksCol).as("tok"))
          .filter(col("tok") =!= "")
        tokens
          .agg(
            call_function("freq_items_sketch", col("tok"), lit(64)).as("sk"),
            count(lit(1)).as("n_tokens"))
          .select(explode(col("sk")).as("e"), col("n_tokens"))
          .select(
            col("e.item").as("item"),
            col("e.est").as("est"),
            (col("e.est") - col("e.err")).as("guaranteed_min"),
            col("n_tokens"))
          .orderBy(col("est").desc, col("item"))
          .limit(15)
      },
      None,
      doc = "Extension: Space-Saving heavy hitters via custom TypedImperativeAggregate (rows-only; guarantees pinned in SketchSpec)",
      sort = Nil
    ),

    // ── Sketch: hash-sampled heavy hitters — the ENGINE-EXACT companion
    // to sk5 (Space-Saving estimates are partition-order dependent by
    // design; this row is the oracle-gated twin of the capability, the
    // `HllExact` playbook applied to frequency estimation). A 1-in-4
    // DOCUMENT sample from the portable hash family is deterministic and
    // content-stable — re-runs AND both engines pick identical docs — and
    // est = 4·sampled_count is the Horvitz–Thompson estimate of the true
    // token total. Top-15 by (est desc, item) is a total order, so the
    // LIMIT is deterministic (TakeOrderedAndProject, never a global
    // sort). At 100 TB the sampled explode+groupBy touches 1/4 of the
    // stream and merges trivially (counts sum); accuracy vs the exact
    // counts is pinned in `SketchSpec`. ──
    "sk8_sampled_freq" -> Q(
      (s, d) =>
        Tables.documents(s, d)
          .filter(pmod(phash(col("doc_id").cast(StringType)), lit(4)) === 0)
          .select(explode(toksCol).as("item"))
          .filter(col("item") =!= "")
          .groupBy(col("item"))
          .agg((count(lit(1)) * 4).as("est_count"))
          .orderBy(col("est_count").desc, col("item"))
          .limit(15),
      Some(s"""SELECT item, CAST(count(*) * 4 AS BIGINT) AS est_count
              |FROM (
              |  SELECT unnest($toksSql) AS item
              |  FROM documents
              |  WHERE ${phashSql("CAST(doc_id AS VARCHAR)")} % 4 = 0)
              |WHERE item <> ''
              |GROUP BY 1
              |ORDER BY est_count DESC, item LIMIT 15""".stripMargin),
      doc = "Extension: engine-exact sampled heavy hitters (oracle-gated twin of sk5; content-stable doc sample, Horvitz-Thompson estimate)",
      sort = Nil
    )
  )

  private def toks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(col("doc_id"), toksCol.as("toks"))
}
