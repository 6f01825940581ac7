package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, GreaterThanOrEqual, Literal, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.apache.spark.storage.StorageLevel

/** The SURVEY §2.10 level-c showcase: banded-LSH similarity join as a
  * WHOLE-OPERATOR Catalyst extension — logical node, optimizer rule,
  * planner strategy, physical operator — for the case where the operator
  * boundary itself carries semantics the composed form can't expose to
  * the optimizer (here: the similarity threshold, which
  * [[SimilarityThresholdPushdown]] tightens through the node).
  *
  * Semantics are EXACTLY the composed `dedup_minhash` pipeline
  * ([[graft.operators.DedupOps]]): word n-gram shingles → Kirsch-
  * Mitzenmacher double-hashed minhash signatures → banded bucket
  * equi-grouping → exact-Jaccard verify on candidates, emitting
  * `(doc_a, doc_b, jaccard)` with `doc_a < doc_b`, `jaccard ≥ threshold`.
  * Equivalence is pinned in `SimilarityJoinSpec` (same rows at the same
  * fixture as the composed plan — both replay the identical md5 hash
  * family, so even LSH misses coincide).
  *
  * Scale posture mirrors the composed form: candidates only from
  * same-bucket collisions (bucket size bounded by the LSH contract),
  * verify by skinny-row co-counting (no shingle arrays in shuffle
  * flight), one shared scan of the shingled corpus.
  */
object SimilarityJoin {

  /** Declare the operator over `df`: `idCol` LONG, `textCol` STRING. */
  def apply(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 32,
      bandRows: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bandRows == 0, "numHashes must divide into bands")
    // explicit column pruning at the API boundary: the node only ever
    // needs (id, text), so the scan underneath prunes to two columns
    val pruned = df.select(df.col(idCol), df.col(textCol))
    val child = pruned.queryExecution.analyzed
    val Seq(idAttr, textAttr) = child.output
    require(idAttr.dataType == LongType, s"$idCol must be LONG")
    require(textAttr.dataType == StringType, s"$textCol must be STRING")
    org.apache.spark.sql.GraftPlanBridge.ofRows(
      df.sparkSession,
      SimilarityJoinPlan(child, idAttr, textAttr,
        shingleN, numHashes, bandRows, threshold))
  }

  /** Install the strategy + rule into an already-built session (the
    * local-session twin of the [[graft.GraftExtensions]] injection).
    * Idempotent. */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(SimilarityJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ SimilarityJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(SimilarityThresholdPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SimilarityThresholdPushdown
    if (!spark.experimental.extraOptimizations.contains(graft.functions.IntersectSizeRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.functions.IntersectSizeRewrite
  }

  // ── the hash family: MUST stay bit-identical to graft.Exprs.phash /
  // phash2 (md5 hex chars 1-15 → h1; 16-29 mod 2^55 → h2) so the custom
  // operator, the composed plan, and the DuckDB oracle all replay the
  // same signatures. ──

  private[plans] def md5Hex(s: String): String = graft.Exprs.md5Hex(s)

  /** Delegates to the [[graft.functions.WordShingles]] core so the
    * physical operator tokenizes EXACTLY like the declarative form
    * (UTF8String lower/0x20-trim, limit −1 split — Java's
    * String.trim/split would silently diverge on control chars and
    * trailing separators). */
  private[plans] def shingles(text: org.apache.spark.unsafe.types.UTF8String,
      n: Int): Array[String] =
    graft.functions.WordShingles.shingleStrings(text, n)

  /** (h1, h2) of the phash family, straight from the digest bytes —
    * bit-identical to parsing the hex string (h1 = first 15 hex chars =
    * top 60 bits; h2 = hex chars 15..28 mod 2^55 = digest bits 60..115
    * masked to 55) but without allocating or formatting the hex. The
    * hex path cost ~2/3 of this operator's runtime. Shared with the
    * declarative pipelines via [[graft.functions.PHashPair]]. */
  private[graft] def phashPair(s: String): (Long, Long) =
    graft.functions.PHashPair.computeLongs(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private[plans] def minhashes(sh: Array[String], numHashes: Int): Array[Long] = {
    val mh = Array.fill(numHashes)(Long.MaxValue)
    var k = 0
    while (k < sh.length) {
      val (h1, h2) = phashPair(sh(k))
      var i = 0
      while (i < numHashes) {
        val v = h1 + i.toLong * h2
        if (v < mh(i)) mh(i) = v
        i += 1
      }
      k += 1
    }
    mh
  }
}

/** Logical similarity join. `resolved` comes free: the id/text attrs are
  * the (already analyzed) child's own output.
  *
  * `output` is a CONSTRUCTOR FIELD, not a computed val: optimizer
  * rewrites copy the node, and regenerating exprIds on copy would dangle
  * every parent reference (the Filter above would go `!`-invalid and the
  * pushdown rule's exprId guard could never match). */
case class SimilarityJoinPlan(
    child: LogicalPlan,
    idAttr: Attribute,
    textAttr: Attribute,
    shingleN: Int,
    numHashes: Int,
    bandRows: Int,
    threshold: Double,
    override val output: Seq[Attribute] = SimilarityJoinPlan.freshOutput())
  extends UnaryNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    outputSet

  override protected def withNewChildInternal(newChild: LogicalPlan): SimilarityJoinPlan =
    copy(child = newChild)
}

object SimilarityJoinPlan {
  private def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("doc_a", LongType, nullable = false)(),
    AttributeReference("doc_b", LongType, nullable = false)(),
    AttributeReference("jaccard", DoubleType, nullable = false)())
}

/** `WHERE jaccard >= x` directly above the operator, with x at or above
  * the operator's threshold, folds INTO the operator — candidate pairs
  * below x are never verified-and-emitted just to be discarded. The
  * operator boundary is what makes this optimization expressible; the
  * composed form hides the threshold inside a generic Filter. */
object SimilarityThresholdPushdown extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(
        GreaterThanOrEqual(a: AttributeReference, Literal(v: Double, DoubleType)),
        sj: SimilarityJoinPlan)
        if a.exprId == sj.output(2).exprId && v >= sj.threshold =>
      sj.copy(threshold = v)
  }
}

object SimilarityJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case sj: SimilarityJoinPlan =>
      SimilarityJoinExec(sj.output, sj.idAttr, sj.textAttr, sj.shingleN,
        sj.numHashes, sj.bandRows, sj.threshold, planLater(sj.child)) :: Nil
    case _ => Nil
  }
}

/** Physical banded-LSH similarity join over the child's rows.
  *
  * Stage structure (RDD-level, inside this one operator):
  *   shingle (narrow) → band signatures (narrow) → bucket grouping
  *   (1 shuffle on (band, sig)) → candidate pairs (narrow, bounded by
  *   bucket size) → co-count intersection (2 shuffles on skinny
  *   (doc, shingle) rows) → size join (2 shuffles on (doc, size)) →
  *   threshold filter (narrow).
  *
  * The shingled corpus is persisted (MEMORY_AND_DISK) because three
  * stages consume it — the same shared-intermediate decision the
  * composed `dedup_minhash` plan makes, for the same measured reason.
  */
case class SimilarityJoinExec(
    output: Seq[Attribute],
    idAttr: Attribute,
    textAttr: Attribute,
    shingleN: Int,
    numHashes: Int,
    bandRows: Int,
    threshold: Double,
    child: SparkPlan) extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  // first-class operator means first-class observability: candidate
  // volume is THE health metric of a banded-LSH join (a saturated band
  // explodes it quadratically), so surface it in the Spark UI next to
  // the row count.
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numCandidatePairs" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "LSH candidate pairs verified"))

  override protected def doExecute(): RDD[InternalRow] = {
    val idOrd = child.output.indexWhere(_.exprId == idAttr.exprId)
    val textOrd = child.output.indexWhere(_.exprId == textAttr.exprId)
    require(idOrd >= 0 && textOrd >= 0, "id/text columns missing from child")
    // locals only — the closures must not capture the SparkPlan
    val (n, nh, br, th) = (shingleN, numHashes, bandRows, threshold)
    val numBands = nh / br
    val types = output.map(_.dataType).toArray
    val candMetric = longMetric("numCandidatePairs")
    val rowsMetric = longMetric("numOutputRows")

    val docs: RDD[(Long, Array[String])] = child.execute().mapPartitions { it =>
      it.map(row =>
        (row.getLong(idOrd),
          SimilarityJoin.shingles(row.getUTF8String(textOrd), n)))
    }.persist(StorageLevel.MEMORY_AND_DISK)

    val pairs: RDD[(Long, Long)] = docs
      .flatMap { case (id, sh) =>
        if (sh.isEmpty) Iterator.empty
        else {
          val mh = SimilarityJoin.minhashes(sh, nh)
          (0 until numBands).iterator.map { b =>
            ((b, (b * br until (b + 1) * br).map(mh).mkString(",")), id)
          }
        }
      }
      // bucket size is bounded by the banded-LSH contract (≥2-row bands
      // keep buckets at near-dup-cluster size), so the per-key list and
      // the quadratic expansion below are small by construction
      .aggregateByKey(List.empty[Long])((l, id) => id :: l, _ ::: _)
      .flatMap { case (_, ids) =>
        val s = ids.sorted.toArray
        for {
          i <- s.indices.iterator
          j <- (i + 1 until s.length).iterator
        } yield (s(i), s(j))
      }
      .distinct()

    // exact-Jaccard verify by co-counting skinny (doc, shingle) rows —
    // |A∩B| as a count of matches, |A∪B| = |A|+|B|−|A∩B|
    val ex: RDD[(Long, String)] =
      docs.flatMap { case (id, sh) => sh.iterator.map(s => (id, s)) }
    val sizes: RDD[(Long, Int)] = docs.mapValues(_.length)

    val inter: RDD[((Long, Long), Long)] = pairs
      .map { p => candMetric += 1; p }
      .join(ex) // doc_a → (doc_b, shingle of a)
      .map { case (a, (b, s)) => ((b, s), a) }
      .join(ex.map { case (id, s) => ((id, s), ()) })
      .map { case ((b, _), (a, _)) => ((a, b), 1L) }
      .reduceByKey(_ + _)

    inter
      .map { case ((a, b), i) => (a, (b, i)) }.join(sizes)
      .map { case (a, ((b, i), szA)) => (b, (a, i, szA)) }.join(sizes)
      .flatMap { case (b, ((a, i, szA), szB)) =>
        val j = i.toDouble / (szA + szB - i).toDouble
        if (j >= th) Iterator((a, b, j)) else Iterator.empty
      }
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(types)
        it.map { case (a, b, j) =>
          rowsMetric += 1
          proj(InternalRow(a, b, j))
        }
      }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SimilarityJoinExec =
    copy(child = newChild)
}
