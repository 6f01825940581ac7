package graft.operators

import graft.{OpModule, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over the `embeddings` fixture
  * (64-dim FLOAT[]): brute-force cosine top-k as the correctness baseline,
  * and an IVF-style variant that probes only the query's coarse cell
  * (the fixture's `label` column plays the cluster assignment).
  *
  * Scale posture: the query set is tiny and BROADCAST, so the candidate
  * side streams through map tasks with no shuffle of the big relation;
  * top-k is TWO-PHASE via WindowGroupLimit (the Partial phase prunes to k
  * rows per query map-side before the exchange) — never a full window over one
  * query's entire candidate list. The IVF variant additionally prunes
  * candidates to the query's cell before scoring, the standard
  * inverted-file trade (recall bounded by cell assignment, cost by cell
  * size).
  *
  * Dot products run in DOUBLE with a left-to-right fold ([[dot]]) and the
  * DuckDB twin replays the identical fold, so scores match bit-for-bit;
  * emitted similarity is a 1e-6-quantized DOUBLE (rounded through a LONG
  * intermediate identically in both engines — never DECIMAL, which the
  * driver's cross-engine hash canonicalizes per-engine).
  */
object AnnOps extends OpModule {

  /** Dot product over two DOUBLE arrays — the codegen'd
    * [[graft.functions.DotProduct]] expression (registered by
    * `Sessions.tune`). Same left-to-right fold as the HOF form
    * `aggregate(zip_with(a,b,(x,y)->x*y), 0d, (acc,v)->acc+v)` it
    * replaced (equivalence pinned in `AnnEquivalenceSpec`), so the
    * DuckDB `list_sum` oracle twin still matches bit-for-bit. */
  def dot(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  def dotSql(a: String, b: String): String =
    s"list_sum([$a[i] * $b[i] FOR i IN range(1, len($a) + 1)])"

  def normSql(v: String): String = s"sqrt(${dotSql(v, v)})"

  /** embeddings with DOUBLE vector `v` and its L2 norm. */
  def withNorm(e: DataFrame): DataFrame = {
    val v = transform(col("embedding"), x => x.cast(DoubleType))
    e.select(col("vec_id"), col("label"), v.as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
  }

  /** Twin of [[withNorm]]. `v` must be bound in an inner subquery: DuckDB
    * can't parse a subscript directly after an array cast
    * (`embedding::DOUBLE[][i]`). */
  val withNormSql: String =
    s"""SELECT vec_id, label, v, ${normSql("v")} AS norm
       |FROM (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)""".stripMargin

  /** Random-hyperplane LSH: 6-bit signatures. Hyperplane component
    * r(i,d) = phash("i:d")/2^59 − 1 — md5-derived like every hash here,
    * so the oracle recomputes the identical matrix in SQL (long→double
    * rounds the same way in both engines; /2^59 and −1 are exact). */
  private[operators] val LshBits = 6

  private def hyper(i: Int, d: Int): Double =
    graft.Exprs.phashLong(s"$i:$d").toDouble / 576460752303423488L.toDouble - 1.0

  /** Map-only `bits`-wide signature: the tiny matrix is baked into the
    * plan as literals (at scale: a broadcast), never a per-dimension
    * shuffle of the corpus. Shared by the 6-bit multiprobe search and
    * the occupancy-scaled dedup cells ([[DedupOps]]), which mask this
    * down to however many low bits the corpus size calls for. */
  private[operators] def hyperplaneSig(v: Column, bits: Int): Column =
    (0 until bits).map { i =>
      val row = array((1 to 64).map(d => lit(hyper(i, d))): _*)
      when(dot(v, row) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB twin of [[hyperplaneSig]]: two CTEs (`hp` hyperplane rows,
    * `sigs` per-vector signatures over relation `e` = withNormSql) that
    * replay the identical md5-derived matrix and sign fold. Callers
    * compose them with `WITH e AS (...), $fragment, ...`. */
  private[operators] def hyperplaneSigSqlCtes(bits: Int): String =
    s"""hp AS (
       |  SELECT i, list(r ORDER BY d) AS rv FROM (
       |    SELECT i, d,
       |      CAST(${graft.Exprs.phashSeededSql("i", "CAST(d AS VARCHAR)")} AS DOUBLE)
       |        / 576460752303423488 - 1 AS r
       |    FROM range(0, $bits) t(i), range(1, 65) u(d))
       |  GROUP BY i),
       |sigs AS (
       |  SELECT vec_id, label, v, norm,
       |    CAST(SUM(CASE WHEN ${dotSql("v", "hp.rv")} > 0
       |             THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS sig
       |  FROM e, hp GROUP BY vec_id, label, v, norm)""".stripMargin

  private def lshSigExpr(v: Column): Column = hyperplaneSig(v, LshBits)

  /** Own bucket + the 6 Hamming-1 neighbors. */
  private def probeSigs(sig: Column): Column =
    array(sig +: (0 until LshBits).map(j => sig.bitwiseXOR(lit(1L << j))): _*)

  /** Top-k rank over scored (query_id, neighbor_id, cos) rows. One rank
    * window: Spark 4 plans the row_number ≤ k filter as a two-phase
    * WindowGroupLimit whose Partial phase prunes to k rows per query per
    * input partition BEFORE the exchange — the engine's native two-phase
    * top-k, so a hand-rolled salt pre-rank would only add a full
    * candidate-set shuffle (removed round 5). */
  private def rankTopk(scored: DataFrame, k: Int): DataFrame = {
    val ord = Seq(col("cos").desc, col("neighbor_id").asc)
    val wGlobal = Window.partitionBy(col("query_id")).orderBy(ord: _*)
    scored
      .withColumn("rank", row_number().over(wGlobal))
      .filter(col("rank") <= k)
      // Quantize to 1e-6 through an integer intermediate (the pattern the
      // passing ann_ivf_centroids uses): both engines round the identical
      // double and emit DOUBLE — no decimal128 in the output, which the
      // driver's cross-engine hash canonicalizes inconsistently.
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("neighbor_id"),
        (round(col("cos") * 1e6).cast(LongType).cast(DoubleType) / 1e6)
          .as("cos_sim"))
  }

  /** Two-phase cosine top-k of `cand` per query row (queries must be tiny
    * — they get broadcast). `sameCell` adds the IVF label restriction. */
  private def topk(queries: DataFrame, cand: DataFrame, k: Int,
      sameCell: Boolean): DataFrame = {
    val q = broadcast(
      queries.select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("v").as("qv"), col("norm").as("qn")))
    val joined = cand
      .join(q,
        if (sameCell) col("label") === col("q_label") && col("vec_id") =!= col("query_id")
        else col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("norm"))).as("cos"))
    rankTopk(joined, k)
  }

  private def topkSql(k: Int, sameCell: Boolean): String = {
    val cellPred = if (sameCell) "AND c.label = q.label" else ""
    s"""WITH e AS ($withNormSql),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("q.v", "c.v")} / (q.norm * c.norm) AS cos
       |  FROM e q JOIN e c
       |    ON q.vec_id < 8 AND c.vec_id <> q.vec_id $cellPred)
       |SELECT query_id, rank, neighbor_id,
       |       CAST(round(cos * 1e6) AS BIGINT) / 1e6 AS cos_sim
       |FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  def queries: Map[String, Q] = Map(
    // ── Brute-force cosine top-10 for 8 query vectors over all 500/2000
    // candidates — the exact baseline every ANN variant is judged against. ──
    "ann_topk_bruteforce" -> Q(
      (s, d) => {
        val e = withNorm(Tables.embeddings(s, d))
        topk(e.filter(col("vec_id") < 8), e, 10, sameCell = false)
      },
      Some(topkSql(10, sameCell = false)),
      doc = "LLM-pipeline: brute-force cosine top-k (broadcast queries, two-phase rank)",
      sort = Seq("query_id", "rank")
    ),

    // ── IVF-style top-5: probe only the query's coarse cell (label). ──
    "ann_topk_ivf" -> Q(
      (s, d) => {
        val e = withNorm(Tables.embeddings(s, d))
        topk(e.filter(col("vec_id") < 8), e, 5, sameCell = true)
      },
      Some(topkSql(5, sameCell = true)),
      doc = "LLM-pipeline: IVF cell-probed cosine top-k (label = coarse quantizer)",
      sort = Seq("query_id", "rank")
    ),

    // ── Multiprobe IVF top-5: the REAL inverted-file search shape. The
    // coarse quantizer (per-label centroid, engine-exact via the 1e-7
    // fixed-point mean) ranks cells by query↔centroid cosine; each query
    // probes its 2 NEAREST cells — not its own label, which for a point
    // near a cell boundary is exactly the wrong restriction — and only
    // those cells' members are scored. Probe ranking runs on the tiny
    // (queries × cells) relation; candidate scoring joins through a
    // broadcast probe list, so the big relation never shuffles. ──
    "ann_topk_ivf_multiprobe" -> Q(
      (s, d) => {
        val e = withNorm(Tables.embeddings(s, d))
        // centroid vectors: (label, cv DOUBLE[], cn norm), engine-exact
        val cent = Tables.embeddings(s, d)
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("label"), (col("pos") + 1).as("dim"))
          .agg((sum(round(col("v").cast(DoubleType) * 1e7).cast(LongType))
            .cast(DoubleType) / 1e7 / count(lit(1))).as("c"))
          .groupBy(col("label"))
          .agg(expr("transform(array_sort(collect_list(struct(dim, c))), x -> x.c)")
            .as("cv"))
          .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
        val q = e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("norm").as("qn"))
        val wProbe = Window.partitionBy(col("query_id"))
          .orderBy(col("csim").desc, col("label").asc)
        val probes = q.crossJoin(broadcast(cent))
          .withColumn("csim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
          .withColumn("crank", row_number().over(wProbe))
          .filter(col("crank") <= 2)
          .select(col("query_id"), col("label").as("p_label"),
            col("qv"), col("qn"))
        val scored = e
          .join(broadcast(probes),
            col("label") === col("p_label") && col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            (dot(col("qv"), col("v")) / (col("qn") * col("norm"))).as("cos"))
        rankTopk(scored, 5)
      },
      Some(s"""WITH e AS ($withNormSql),
              |cent AS (
              |  SELECT label, i AS dim,
              |    CAST(SUM(CAST(round(embedding[i]::DOUBLE * 1e7) AS BIGINT)) AS DOUBLE)
              |      / 1e7 / COUNT(*) AS c
              |  FROM embeddings, range(1, 65) t(i) GROUP BY 1, 2),
              |centv AS (
              |  SELECT label, list(c ORDER BY dim) AS cv FROM cent GROUP BY 1),
              |centn AS (
              |  SELECT label, cv, sqrt(${dotSql("cv", "cv")}) AS cn FROM centv),
              |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qn
              |      FROM e WHERE vec_id < 8),
              |probes AS (
              |  SELECT query_id, label, qv, qn FROM (
              |    SELECT q.query_id, c.label, q.qv, q.qn,
              |      ROW_NUMBER() OVER (PARTITION BY q.query_id
              |        ORDER BY ${dotSql("q.qv", "c.cv")} / (q.qn * c.cn) DESC,
              |                 c.label) AS crank
              |    FROM q, centn c)
              |  WHERE crank <= 2),
              |scored AS (
              |  SELECT p.query_id, c.vec_id AS neighbor_id,
              |    ${dotSql("p.qv", "c.v")} / (p.qn * c.norm) AS cos
              |  FROM probes p JOIN e c
              |    ON c.label = p.label AND c.vec_id <> p.query_id)
              |SELECT query_id, rank, neighbor_id,
              |       CAST(round(cos * 1e6) AS BIGINT) / 1e6 AS cos_sim
              |FROM (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY cos DESC, neighbor_id) AS rank
              |  FROM scored)
              |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
      doc = "LLM-pipeline: multiprobe IVF top-k (2 nearest cells by centroid cosine)",
      sort = Seq("query_id", "rank")
    ),

    // ── Random-hyperplane LSH top-5 with Hamming-1 multiprobe: the
    // data-INDEPENDENT scale path (no training pass, unlike IVF). Each
    // vector gets a 6-bit signature — bit i = sign of v·r_i against 6
    // pseudo-random hyperplanes derived from the portable md5 family, so
    // the DuckDB twin REPLAYS the exact matrix (phash/2^59 − 1 is an
    // exact exponent shift: bit-identical doubles in both engines). The
    // Spark side bakes the matrix in as literals → signatures compute
    // MAP-ONLY (at 100 TB you broadcast the tiny matrix, never shuffle
    // the corpus per-dimension); queries probe their own bucket plus the
    // 6 Hamming-1 neighbors, the standard multiprobe recall trade. ──
    "ann_topk_lsh" -> Q(
      (s, d) => {
        val signed = withNorm(Tables.embeddings(s, d))
          .withColumn("sig", lshSigExpr(col("v")))
        val probes = signed.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("norm").as("qn"), explode(probeSigs(col("sig"))).as("psig"))
        val scored = signed
          .join(broadcast(probes),
            col("sig") === col("psig") && col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            (dot(col("qv"), col("v")) / (col("qn") * col("norm"))).as("cos"))
        rankTopk(scored, 5)
      },
      Some(s"""WITH e AS ($withNormSql),
              |${hyperplaneSigSqlCtes(LshBits)},
              |probes AS (
              |  SELECT vec_id AS query_id, v AS qv, norm AS qn,
              |    unnest([sig] ||
              |      [xor(sig, CAST(1 AS BIGINT) << j) FOR j IN range(0, $LshBits)]) AS psig
              |  FROM sigs WHERE vec_id < 8),
              |scored AS (
              |  SELECT p.query_id, c.vec_id AS neighbor_id,
              |    ${dotSql("p.qv", "c.v")} / (p.qn * c.norm) AS cos
              |  FROM probes p JOIN sigs c
              |    ON c.sig = p.psig AND c.vec_id <> p.query_id)
              |SELECT query_id, rank, neighbor_id,
              |       CAST(round(cos * 1e6) AS BIGINT) / 1e6 AS cos_sim
              |FROM (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY cos DESC, neighbor_id) AS rank
              |  FROM scored)
              |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
      doc = "LLM-pipeline: random-hyperplane LSH top-k with Hamming-1 multiprobe",
      sort = Seq("query_id", "rank")
    ),

    // ── SQ8 scalar-quantized top-5: the MEMORY-side ANN trade. Each
    // vector is compressed to int8 (per-vector scale 127/max|v_i|, the
    // symmetric scalar quantizer) — 4× smaller than FP32, which at 100 TB
    // is the difference between an in-memory candidate set and a spilled
    // one; scoring runs in the quantized space and only the (tiny) top-k
    // survivors would be re-ranked against full-precision vectors. The
    // quantization is engine-exact: scale division, component product and
    // round() agree bit-for-bit in Spark and DuckDB, and the quantized
    // dot products are small-integer sums (≤ 64·127² ≈ 10⁶) — exact in
    // DOUBLE, no decimal anywhere. ──
    "ann_topk_sq8" -> Q(
      (s, d) => {
        val fv = transform(col("embedding"), x => x.cast(DoubleType))
        val ma = greatest(array_max(transform(fv, x => abs(x))), lit(1e-30))
        val qv = transform(fv, x => round(x * (lit(127.0) / ma))
          .cast(LongType).cast(DoubleType))
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), qv.as("v"))
          .withColumn("norm", sqrt(dot(col("v"), col("v"))))
        val q = broadcast(e.filter(col("vec_id") < 8)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("norm").as("qn")))
        val scored = e
          .join(q, col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            (dot(col("qv"), col("v")) / (col("qn") * col("norm"))).as("cos"))
        rankTopk(scored, 5)
      },
      Some(s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS fv FROM embeddings),
              |q8 AS (
              |  SELECT vec_id,
              |    [CAST(round(fv[i] * (127.0 / ma)) AS BIGINT)::DOUBLE
              |       FOR i IN range(1, len(fv) + 1)] AS v
              |  FROM (SELECT vec_id, fv,
              |          greatest(list_max([abs(x) FOR x IN fv]), 1e-30) AS ma
              |        FROM base)),
              |e AS (SELECT vec_id, v, ${normSql("v")} AS norm FROM q8),
              |scored AS (
              |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |    ${dotSql("q.v", "c.v")} / (q.norm * c.norm) AS cos
              |  FROM e q JOIN e c ON q.vec_id < 8 AND c.vec_id <> q.vec_id)
              |SELECT query_id, rank, neighbor_id,
              |       CAST(round(cos * 1e6) AS BIGINT) / 1e6 AS cos_sim
              |FROM (
              |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              |    ORDER BY cos DESC, neighbor_id) AS rank
              |  FROM scored)
              |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
      doc = "LLM-pipeline: int8 scalar-quantized cosine top-k (4× memory compression)",
      sort = Seq("query_id", "rank")
    ),

    // ── IVF training step: per-cell centroids, element-wise mean via
    // posexplode → (label, dim) partial-sum aggregation — the shape that
    // scales (shuffle is cells × dims rows, map-side combined).
    // Components are quantized to 1e-7 fixed point BEFORE summing: both
    // engines compute the identical double product v*1e7 and round it
    // identically, so the integer sum is order-independent AND
    // engine-exact. (A DECIMAL-cast sum is not: DuckDB's double→decimal
    // conversion goes through binary multiply and was measured 1 ulp off
    // Spark's exact BigDecimal path on 1/33920 values.) FP32 embeddings
    // carry ~7 significant decimals, so nothing real is lost. ──
    "ann_ivf_centroids" -> Q(
      (s, d) =>
        Tables.embeddings(s, d)
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("label"), (col("pos") + 1).as("dim"))
          .agg(
            (sum(round(col("v").cast(DoubleType) * 1e7).cast(LongType))
              .cast(DoubleType) / 1e7 / count(lit(1))).as("centroid"),
            count(lit(1)).as("n_vectors")),
      Some("""SELECT label, i AS dim,
             |  CAST(SUM(CAST(round(embedding[i]::DOUBLE * 1e7) AS BIGINT)) AS DOUBLE)
             |    / 1e7 / COUNT(*) AS centroid,
             |  COUNT(*) AS n_vectors
             |FROM embeddings, range(1, 65) t(i)
             |GROUP BY 1, 2 ORDER BY label, dim""".stripMargin),
      doc = "LLM-pipeline: IVF coarse-quantizer centroid build (element-wise mean)",
      sort = Seq("label", "dim")
    ),

    // ── Distributed Gramian (Xᵀ X upper triangle) — the front half of
    // PCA / whitening over an embedding corpus. One narrow pass: each row
    // expands to its d(d+1)/2 = 2080 component products via a nested HOF
    // (codegen'd, no join, no per-row shuffle), then a hash aggregate on
    // (i, j). Map-side partial aggregation collapses every partition to
    // ≤ 2080 rows before the exchange, so the shuffle carries
    // O(d² × partitions) — independent of corpus size. That is exactly
    // how you'd build the covariance of 100 TB of vectors; the d×d
    // eigensolve then happens driver-side on 2080 numbers
    // (`PcaSpec` exercises that step). Products are quantized to 1e-6
    // fixed point BEFORE summing — same engine-exactness argument as
    // `ann_ivf_centroids` (both engines round the identical double
    // product; the LONG sum is order-free and exact). ──
    "emb_gramian" -> Q(
      (s, d) =>
        Tables.embeddings(s, d)
          .select(transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
          .select(expr(
            """explode(flatten(transform(sequence(0, size(v) - 1),
              |  i -> transform(sequence(i, size(v) - 1),
              |    j -> named_struct('i', i, 'j', j, 'p', v[i] * v[j])))))"""
              .stripMargin).as("t"))
          .select((col("t.i") + 1).cast(LongType).as("i"),
            (col("t.j") + 1).cast(LongType).as("j"), col("t.p").as("p"))
          .groupBy(col("i"), col("j"))
          .agg(
            (sum(round(col("p") * 1e6).cast(LongType)).cast(DoubleType) / 1e6)
              .as("gram"),
            count(lit(1)).as("n_vectors")),
      Some("""SELECT i, j,
             |  CAST(SUM(CAST(round(v[i] * v[j] * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
             |    AS gram,
             |  COUNT(*) AS n_vectors
             |FROM (SELECT embedding::DOUBLE[] AS v FROM embeddings),
             |     range(1, 65) s(i), range(1, 65) t(j)
             |WHERE j >= i
             |GROUP BY 1, 2 ORDER BY i, j""".stripMargin),
      doc = "LLM-pipeline: distributed Gramian XᵀX (PCA/whitening front half, d² shuffle)",
      sort = Seq("i", "j")
    ),

    // ── Recall@5 evaluation: how much of the EXACT cosine top-5 does the
    // single-cell IVF probe recover per query? The measurement every ANN
    // index ships with — recall is the accuracy axis of the
    // recall/cost trade the cell restriction buys. Both sides reuse the
    // broadcast-queries + two-phase-rank pipeline; the join of the two
    // tiny top-k sets and the per-query aggregate are driver-negligible
    // at any corpus size (8×5 rows each). hits/5.0 is one exact int→
    // double conversion and one division — engine-exact. ──
    "ann_recall_ivf" -> Q(
      (s, d) => {
        val e = withNorm(Tables.embeddings(s, d))
        val q = e.filter(col("vec_id") < 8)
        val bf = topk(q, e, 5, sameCell = false)
          .select(col("query_id"), col("neighbor_id"))
        val iv = topk(q, e, 5, sameCell = true)
          .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
        bf.join(iv, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(col("hit")).as("hits"))
          .select(col("query_id"), col("hits"),
            (col("hits").cast(DoubleType) / lit(5.0)).as("recall_at_5"))
      },
      Some(s"""WITH e AS ($withNormSql),
              |bf AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |        ORDER BY ${dotSql("q.v", "c.v")} / (q.norm * c.norm) DESC,
              |                 c.vec_id) AS rnk
              |    FROM e q JOIN e c ON q.vec_id < 8 AND c.vec_id <> q.vec_id)
              |  WHERE rnk <= 5),
              |iv AS (
              |  SELECT query_id, neighbor_id FROM (
              |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              |      ROW_NUMBER() OVER (PARTITION BY q.vec_id
              |        ORDER BY ${dotSql("q.v", "c.v")} / (q.norm * c.norm) DESC,
              |                 c.vec_id) AS rnk
              |    FROM e q JOIN e c
              |      ON q.vec_id < 8 AND c.vec_id <> q.vec_id
              |         AND c.label = q.label)
              |  WHERE rnk <= 5)
              |SELECT b.query_id, count(i.query_id)::BIGINT AS hits,
              |  count(i.query_id) / 5.0 AS recall_at_5
              |FROM bf b LEFT JOIN iv i
              |  ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
              |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "LLM-pipeline: recall@5 of the IVF cell probe vs the exact top-5 (per-query eval)",
      sort = Seq("query_id")
    )
  )
}
