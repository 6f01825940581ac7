package graft.streaming

import graft.operators.DedupOps
import graft.sinks.UpsertWriter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Continuous NEAR-dup ingest — the streaming form of
  * `dedup_incremental` (new batch × existing corpus at banded-LSH
  * candidates only), with [[DedupIngest]]'s state discipline: all
  * dedup state lives in TABLES, never in operator memory, so restarts
  * restate instead of duplicating and state compacts like any table.
  *
  * Per micro-batch:
  *
  *  1. WITHIN-BATCH clustering: band signatures (32 hashes, 8×4 bands
  *     — the family's standard J≥0.8 operating point) self-join into
  *     candidate pairs, exact 3-gram Jaccard verifies them, and
  *     min-label propagation ([[DedupOps.survivorsToFixpoint]]) picks
  *     one representative per near-dup cluster (lowest doc_id — a
  *     total order, so a replayed batch picks the same winners).
  *  2. VS-CORPUS check: the winners' band signatures equi-join the
  *     stored signature INDEX table — per-ingest work scales with the
  *     batch, never the corpus — and collisions verify by exact
  *     Jaccard against only the colliding survivors' texts (semi-join
  *     pruned). A winner matching an admitted survivor at ≥ threshold
  *     is dropped; cluster members it represented fall with it (the
  *     representative carries the cluster, the standard
  *     streaming-dedup contract).
  *  3. ADMIT: fresh winners upsert into the survivors table (keyed by
  *     doc_id) and their signatures append to the index (keyed by
  *     (band, sig, doc_id)) — both idempotent under replay. A crashed
  *     attempt's rows are keyed identically, so the retry restates
  *     them; self-collisions in the index check are filtered on
  *     doc_id, so a replayed winner never drops against its own
  *     crashed-attempt signature row.
  *
  * The admission log is keyed by batch_id and written LAST, with the
  * admitted count taken from the replay-deterministic batch-local
  * fresh set (no per-batch corpus scan — post-upsert the table's
  * `batch_id = batchId` rows are exactly that set).
  *
  * Scale posture: the index table IS `dedup_incremental`'s "stored
  * band signatures you append to" — (band, sig, doc_id) skinny rows,
  * bucketed by (band, sig) upstream of the join at 100 TB; candidate
  * work is bucket collisions only; Jaccard verify ships skinny
  * (pair, shingle) rows, never whole arrays.
  */
object NearDupIngest {

  /** Stage timer for drain profiling (`GRAFT_STAGE_TIMING=1`): lazy
    * stages bill to the ACTION that triggers them, which is exactly the
    * attribution a trim decision needs. Off (the default) it is a plain
    * call-through. */
  private val stageTiming = sys.env.contains("GRAFT_STAGE_TIMING")
  private def timed[A](batchId: Long, tag: String)(f: => A): A =
    if (!stageTiming) f
    else {
      val t0 = System.nanoTime()
      val r = f
      Console.err.println(
        f"[neardup-stage] b$batchId $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }

  /** One micro-batch of the drain, exactly as [[start]]'s foreachBatch
    * runs it — exposed (package-private) for the crash-replay contract
    * (a crash between this returning and the checkpoint commit
    * re-invokes it with the same batchId) and for the oracle gates,
    * which drive the two-batch split directly ([[graft.operators
    * .StreamingIngestOps]]'s harness note). */
  private[graft] def processBatch(
      batch: DataFrame,
      batchId: Long,
      warehouseDir: String,
      numHashes: Int = 32,
      bandRows: Int = 4,
      thresh: Double = 0.8,
      stateBuckets: Option[Int] = None): Unit = {
    val s = batch.sparkSession
    val survivorsDir = s"$warehouseDir/neardup_survivors"
    val indexDir = s"$warehouseDir/neardup_index"
    val logDir = s"$warehouseDir/neardup_log"
    // state-table merge: hash-bucketed touched-bucket-only rewrite when
    // stateBuckets is set (the 100 TB form), whole-table otherwise —
    // the family's shared contract ([[MultiSignalIngest]] object doc).
    // MERGE-only (no [[graft.sinks.UpsertWriter.appendBucketed]] branch
    // like Embed/MultiSignal take): this worker has no immutable
    // first-admission column, so telling a fresh INSERT from a
    // re-delivered survivor's content UPDATE would cost a corpus-key
    // lookup per batch — the merge is already correct for both, and
    // adding the discriminator is the price of adopting the
    // first_admitted_batch contract here, not of the write path
    def mergeState(dir: String, df: DataFrame, keys: Seq[String]): Unit =
      stateBuckets match {
        case Some(b) => UpsertWriter.upsertBucketed(
          s, dir, df, keys, versionCol = "batch_id", numBuckets = b)
        case None => UpsertWriter.upsert(
          s, dir, df, keys, versionCol = "batch_id")
      }
        // NULL text → '' (same reasoning as DedupIngest: NULL must be
        // one content class, not an ever-fresh row); word_shingles('')
        // is empty, so null/short docs are singletons that always admit
        val arrivals = batch
          .withColumn("text", coalesce(col("text"), lit("")))
          .withColumn("__seq", monotonically_increasing_id())
          .persist()
        try {
          val nIn = timed(batchId, "in-count")(arrivals.count())
          // keep-latest per doc_id BEFORE any counting: two rows sharing
          // a doc_id in one micro-batch (a same-batch re-delivery) would
          // otherwise both survive clustering — the self-pair is excluded
          // by doc_a < doc_b — and both count as winners while the keyed
          // upsert collapses them to one admitted row, misattributing
          // the collapse as a corpus dupe in the log. The keep rule
          // matches [[UpsertWriter]]'s within-batch tie-break: highest
          // arrival order (__seq) wins, so the admitted TEXT is the one
          // the upsert would have kept anyway. The collapse itself is
          // counted where it belongs, in n_batch_dupes.
          val wDoc = org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc_id")).orderBy(col("__seq").desc)
          val docs = arrivals
            .withColumn("__rn", row_number().over(wDoc))
            .filter(col("__rn") === 1)
            .drop("__seq", "__rn")
            .persist()
          try {
          val sets = docs
            .select(col("doc_id"),
              call_function("word_shingles", col("text"), lit(3)).as("shingles"))
            .persist()
          val sigs = DedupOps.bandSigs(sets, numHashes, bandRows).persist()
          try {
            // 1. within-batch clusters → one winner per cluster
            val candIn = sigs.as("x").hint("shuffle_hash")
              .join(sigs.as("y").hint("shuffle_hash"),
                col("x.band") === col("y.band") &&
                  col("x.sig") === col("y.sig") &&
                  col("x.doc_id") < col("y.doc_id"))
              .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
              .distinct()
            // persist the DIRECTED pairs, not the symmetric union: the
            // union's two branches would each re-run the candidate
            // self-join + Jaccard verify (measured ~0.5 s/batch of pure
            // recompute at the gate), while a persisted pairs relation
            // makes the union two cache scans. The fixpoint joins the
            // union once per round — still two cache scans + concat,
            // batch-edge-sized. It runs EAGERLY (per-round
            // localCheckpoints), so the persist releases as soon as it
            // returns — the survivor labels are already checkpointed.
            val pairsP = DedupOps.jaccardPairs(candIn, sets, thresh)
              .select(col("doc_a").as("src"), col("doc_b").as("dst"))
              .persist()
            if (stageTiming) timed(batchId, "pairs-mat")(pairsP.count())
            val edges = pairsP.unionByName(
              pairsP.select(col("dst").as("src"), col("src").as("dst")))
            val labels = timed(batchId, "cluster-fixpt")(try
              DedupOps.survivorsToFixpoint(docs.select(col("doc_id")), edges)
            finally pairsP.unpersist())
            val winners = docs.join(
              labels.filter(col("is_survivor")).select(col("doc_id")),
              Seq("doc_id"), "left_semi")
              .persist()
            try {
              val nWinners = timed(batchId, "winners")(winners.count())

              // 2. winners vs the stored corpus, candidates from the
              // index table only; self-matches (a crashed attempt's own
              // rows) are filtered on doc_id
              val dupVsCorpus =
                if (!Files.exists(Paths.get(indexDir, "_SUCCESS")))
                  winners.limit(0).select(col("doc_id"))
                else {
                  val idx = s.read.parquet(indexDir)
                    .select(col("band"), col("sig"), col("doc_id").as("doc_b"))
                  val candX = sigs
                    .join(winners.select(col("doc_id")), Seq("doc_id"), "left_semi")
                    .join(idx, Seq("band", "sig"))
                    .filter(col("doc_id") =!= col("doc_b"))
                    .select(col("doc_id").as("doc_a"), col("doc_b"))
                    .distinct()
                  // anti-join against the batch ids: a re-arrival REUSING
                  // a survivor's doc_id would otherwise put two shingle
                  // rows for one id into the verify relation (batch text
                  // + stored text), double-joining the intersection
                  // count; the batch version wins the verify
                  val oldSets = s.read.parquet(survivorsDir)
                    .join(candX.select(col("doc_b").as("doc_id")).distinct(),
                      Seq("doc_id"), "left_semi")
                    .join(sets.select(col("doc_id")), Seq("doc_id"), "left_anti")
                    .select(col("doc_id"),
                      call_function("word_shingles", col("text"), lit(3))
                        .as("shingles"))
                  DedupOps.jaccardPairs(
                      candX, sets.unionByName(oldSets), thresh)
                    .select(col("doc_a").as("doc_id")).distinct()
                }

              // 3. admit fresh winners: survivors row + index signatures
              val fresh = winners
                .join(dupVsCorpus, Seq("doc_id"), "left_anti")
                .withColumn("batch_id", lit(batchId))
                .persist()
              try {
                val nFresh = timed(batchId, "corpus-check")(fresh.count())
                if (nFresh > 0) timed(batchId, "admit-upserts") {
                  mergeState(survivorsDir, fresh, Seq("doc_id"))
                  mergeState(indexDir,
                    sigs.join(fresh.select(col("doc_id")), Seq("doc_id"), "left_semi")
                      .withColumn("batch_id", lit(batchId)),
                    Seq("band", "sig", "doc_id"))
                }

                // log LAST; admissions = the fresh set itself. The table
                // re-scan this replaces counted `batch_id === batchId`
                // rows, which post-upsert are exactly `fresh`'s (every
                // fresh row lands with this batch_id; no other row can
                // carry it — later batches run only after this one
                // commits). Attempt-invariant: a replay recomputes the
                // identical fresh set (the corpus check excludes a
                // winner's own crashed-attempt rows by doc_id, and
                // near-dup winners of the same attempt were already
                // collapsed in-batch, so no crashed row can veto one).
                val nAdmitted = nFresh
                import s.implicits._
                UpsertWriter.upsert(s, logDir,
                  Seq((batchId, nIn, nIn - nWinners, nWinners - nAdmitted,
                    nAdmitted))
                    .toDF("batch_id", "n_in", "n_batch_dupes",
                      "n_corpus_dupes", "n_admitted"),
                  keys = Seq("batch_id"), versionCol = "batch_id")
              } finally fresh.unpersist()
            } finally winners.unpersist()
          } finally { sigs.unpersist(); sets.unpersist() }
          } finally docs.unpersist()
        } finally arrivals.unpersist()
    ()
  }

  /** Start the near-dup worker draining parquet document files from
    * `inputDir` (schema must carry `doc_id` and `text`; extra columns
    * ride into the survivors table). AvailableNow drain-and-stop +
    * checkpoint, like every worker in this package. */
  def start(
      spark: SparkSession,
      inputDir: String,
      warehouseDir: String,
      checkpointDir: String,
      filesPerTrigger: Int = 1,
      numHashes: Int = 32,
      bandRows: Int = 4,
      thresh: Double = 0.8,
      stateBuckets: Option[Int] = None): StreamingQuery = {

    val schema = spark.read.parquet(inputDir).schema

    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(inputDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, warehouseDir, numHashes, bandRows,
          thresh, stateBuckets)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  private def tableOrEmpty(
      spark: SparkSession, dir: String, schema: StructType): DataFrame =
    if (!Files.exists(Paths.get(dir, "_SUCCESS")))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.parquet(dir)

  /** Serving view: every admitted (near-dup-unique) document. Empty —
    * not an error — before the first admitting batch. */
  def survivors(spark: SparkSession, warehouseDir: String): DataFrame =
    tableOrEmpty(spark, s"$warehouseDir/neardup_survivors", StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("batch_id", LongType))))
      .drop(UpsertWriter.BucketCol) // derived layout, not data (no-op unbucketed)

  /** Serving view: the stored band-signature index. */
  def index(spark: SparkSession, warehouseDir: String): DataFrame =
    tableOrEmpty(spark, s"$warehouseDir/neardup_index", StructType(Seq(
      StructField("doc_id", LongType), StructField("band", IntegerType),
      StructField("sig", StringType), StructField("batch_id", LongType))))
      .drop(UpsertWriter.BucketCol)

  /** Serving view: the per-batch admission log. */
  def ingestLog(spark: SparkSession, warehouseDir: String): DataFrame =
    tableOrEmpty(spark, s"$warehouseDir/neardup_log", StructType(Seq(
      StructField("batch_id", LongType), StructField("n_in", LongType),
      StructField("n_batch_dupes", LongType),
      StructField("n_corpus_dupes", LongType),
      StructField("n_admitted", LongType))))
}
