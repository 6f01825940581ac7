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
  * verify ships candidate docs' distinct-shingle arrays through two
  * keyed joins and intersects locally (array volume ∝ candidate
  * pairs × shingles per doc — the same asymptotics as skinny-row
  * co-counting, at two shuffles instead of five; see the verify
  * comment in [[SimilarityJoinExec]]), one shared scan of the
  * shingled corpus.
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
  private[graft] def shingles(text: org.apache.spark.unsafe.types.UTF8String,
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

  private[graft] def minhashes(sh: Array[String], numHashes: Int): Array[Long] = {
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

  // ── packed shingle transport: the operator's RDD stages cache and
  // shuffle each doc's distinct shingles as ONE newline-joined UTF-8
  // byte array instead of an Array[String]. Java serialization (the
  // RDD shuffle codec) pays ~40 bytes of object header per String —
  // more than the ~25-byte shingles themselves — so packing roughly
  // halves cache + wire bytes; lossless because shingles are
  // space-joined words split on whitespace, so no shingle can contain
  // a newline. ──

  private[graft] def pack(sh: Array[String]): Array[Byte] =
    sh.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private[graft] def unpack(b: Array[Byte]): Array[String] =
    if (b.length == 0) Array.empty[String]
    else new String(b, java.nio.charset.StandardCharsets.UTF_8).split('\n')
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
  *   bucket size) → pair dedup (1 shuffle) → array-lookup verify
  *   (2 shuffles: pairs ⋈ shingle arrays by each side, local hash-set
  *   intersect) → threshold filter (narrow).
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

    // hash-partitioned BEFORE the persist: both verify joins then adopt
    // this partitioner and shuffle only their (skinny) pair side — the
    // packed shingle bytes cross the wire once, here, not once per join
    val packed: RDD[(Long, Array[Byte])] = child.execute().mapPartitions { it =>
      it.map(row =>
        (row.getLong(idOrd),
          SimilarityJoin.pack(
            SimilarityJoin.shingles(row.getUTF8String(textOrd), n))))
    }
    // Serializer pinned EXPLICITLY: for a (Long, Array[Byte]) shuffle
    // Spark auto-picks Kryo (both types are in the Kryo-safe set — the
    // operator's only such shuffle; every tuple-keyed one below resolves
    // to Java), and Kryo INSTANCE creation registers
    // java.nio.HeapByteBuffer with a reflective FieldSerializer, which
    // on JDK 17+ throws InaccessibleObjectException unless the launcher
    // passed --add-opens java.base/java.nio — a JVM-flag dependency a
    // library operator must not have (spark-submit adds the opens, a
    // plain `java -cp` harness does not). Java serialization of a raw
    // byte array is length + bytes, so nothing measurable is lost.
    val docs: RDD[(Long, Array[Byte])] = {
      val s = new org.apache.spark.rdd.ShuffledRDD[Long, Array[Byte], Array[Byte]](
        packed, new org.apache.spark.HashPartitioner(
          sparkContext.defaultParallelism))
      s.setSerializer(new org.apache.spark.serializer.JavaSerializer(
        sparkContext.getConf))
      s.persist(StorageLevel.MEMORY_AND_DISK)
    }

    val pairs: RDD[(Long, Long)] = docs
      .flatMap { case (id, packed) =>
        val sh = SimilarityJoin.unpack(packed)
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

    // exact-Jaccard verify: ship each candidate doc's (distinct)
    // shingle ARRAY to its pairs with two keyed joins, intersect
    // locally with a hash set — |A∪B| = |A|+|B|−|A∩B| comes free from
    // the array lengths. Two shuffles end to end. The first cut
    // co-counted skinny (doc, shingle) rows (the composed plan's
    // Tungsten shape) — correct, but in RDD-land it cost FIVE shuffles
    // of boxed String-keyed tuples (pair⋈shingles, re-key, ⋈shingles,
    // reduceByKey, two size joins) and ran 2.4× the composed plan at
    // sf1; arrays-in-flight here are the same asymptotic volume
    // (pairs × avg shingles per doc, pairs bounded by the banded-LSH
    // contract) with the join machinery paid twice instead of five
    // times — measured 8.3 s → ~5 s at sf1.
    pairs
      .map { p => candMetric += 1; p }
      .join(docs) // doc_a → (doc_b, packed shingles of a)
      .map { case (a, (b, pkA)) => (b, (a, pkA)) }
      .join(docs) // doc_b → ((doc_a, packed a), packed b)
      .flatMap { case (b, ((a, pkA), pkB)) =>
        val shA = SimilarityJoin.unpack(pkA)
        val shB = SimilarityJoin.unpack(pkB)
        val (small, large) =
          if (shA.length <= shB.length) (shA, shB) else (shB, shA)
        val set = new java.util.HashSet[String](small.length * 2)
        var i = 0
        while (i < small.length) { set.add(small(i)); i += 1 }
        var inter = 0
        i = 0
        while (i < large.length) {
          if (set.contains(large(i))) inter += 1
          i += 1
        }
        val j = inter.toDouble / (shA.length + shB.length - inter).toDouble
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
