package graft.sinks

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets.UTF_8

/** Checked mutual exclusion between a DRAIN window (streaming batches
  * that may replay) and a MAINTENANCE window (compact / truncate /
  * retainFrom / refit) over a parquet state table — the runtime teeth
  * for the contract every writer in this package documented but nothing
  * enforced: a maintenance pass racing a replayable batch folds that
  * batch's delta files mid-contract, and the replayed batch then
  * re-appends rows the compaction already merged.
  *
  * The lease is a sibling marker file (`<table>.__drain-lease` /
  * `<table>.__maint-lease`) holding `<holder>\n<epochMillis>`, written
  * atomically (temp + same-directory rename, like every marker in this
  * package). Exclusion is BETWEEN classes, not within one — single
  * drain per table and single maintenance pass at a time are the
  * package's existing conventions; what was unchecked is the cross:
  *
  *  - a maintenance op refuses to start while a FRESH drain lease is
  *    held ([[withMaintenance]] checks, then takes its own lease);
  *  - a writer merge/append refuses while a FOREIGN fresh maintenance
  *    lease is held ([[requireNoForeignMaintenance]] — "foreign" means
  *    not this thread's own maintenance pass, so compact's internal
  *    rewrite and refit's reassignment merges pass their own gate).
  *
  * STALE-SAFE: a lease older than its TTL is a crashed holder — it is
  * deleted (stolen) instead of wedging the table forever. The TTL is
  * the recovery bound, not a correctness proof: a drain that crashed
  * mid-batch may still REPLAY that batch after its lease expires, which
  * a lease cannot see (nothing is running). That residual window is
  * closed separately for the append path by [[UpsertWriter.compact]]'s
  * folded-tag sidecar, which makes a replayed append idempotent across
  * a compaction instead of relying on timing.
  */
object TableLease {

  sealed trait Kind { private[sinks] def suffix: String }
  /** Held for the duration of a streaming drain over the table. */
  case object Drain extends Kind {
    private[sinks] val suffix = ".__drain-lease"
  }
  /** Held for the duration of a maintenance pass over the table. */
  case object Maintenance extends Kind {
    private[sinks] val suffix = ".__maint-lease"
  }

  /** Default staleness bound: a holder silent this long is crashed. A
    * production drain's micro-batches and a maintenance rewrite both
    * finish far inside it; a wedged table recovers without manual
    * intervention after it. */
  val DefaultTtlMs: Long = 15L * 60 * 1000

  private def leaseFile(path: String, kind: Kind): Path =
    Paths.get(path + kind.suffix)

  /** (holder, ageMs) of the lease at `path`, if one exists. An
    * unreadable/garbled lease reports age 0 with a diagnostic holder —
    * treated as FRESH (refuse rather than steal what can't be read;
    * the TTL still unwedges it once the file's mtime is old enough). */
  private def read(path: String, kind: Kind): Option[(String, Long)] = {
    val f = leaseFile(path, kind)
    if (!Files.exists(f)) None
    else {
      val now = System.currentTimeMillis()
      try {
        val lines = new String(Files.readAllBytes(f), UTF_8).split("\n")
        Some((lines(0), now - lines(1).trim.toLong))
      } catch {
        case _: Exception =>
          val mtime =
            try Files.getLastModifiedTime(f).toMillis
            catch { case _: Exception => now }
          Some(("<unreadable lease>", now - mtime))
      }
    }
  }

  /** Take the `kind` lease on `path` for `holder`, refusing loudly if
    * the OPPOSITE kind is held fresh, or the SAME kind is held fresh by
    * a different holder. A stale lease (older than `ttlMs`) is a
    * crashed holder and is stolen; re-acquiring one's own lease
    * refreshes its timestamp. */
  def acquire(
      path: String, kind: Kind, holder: String,
      ttlMs: Long = DefaultTtlMs): Unit = {
    val opposite = if (kind == Drain) Maintenance else Drain
    read(path, opposite).foreach { case (h, age) =>
      if (age <= ttlMs)
        throw new IllegalStateException(
          s"cannot open a $kind window on $path: a $opposite lease is " +
            s"held by '$h' (${age / 1000}s old, ttl ${ttlMs / 1000}s) — " +
            "wait for the window to close, or delete the lease file if " +
            "the holder is known dead")
      Files.deleteIfExists(leaseFile(path, opposite)) // stale: crashed holder
    }
    read(path, kind).foreach { case (h, age) =>
      if (age <= ttlMs && h != holder)
        throw new IllegalStateException(
          s"cannot open a $kind window on $path: another $kind lease is " +
            s"held by '$h' (${age / 1000}s old) — two concurrent " +
            s"$kind holders violate the single-writer contract")
    }
    val f = leaseFile(path, kind)
    if (f.getParent != null) Files.createDirectories(f.getParent)
    val tmp = f.resolveSibling(f.getFileName.toString + ".tmp")
    Files.write(tmp,
      s"$holder\n${System.currentTimeMillis()}".getBytes(UTF_8))
    Files.move(tmp, f, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Release `holder`'s lease. Releasing a lease someone else stole
    * (after this holder went stale) is a no-op — the thief owns it. */
  def release(path: String, kind: Kind, holder: String): Unit =
    read(path, kind).foreach { case (h, _) =>
      if (h == holder) Files.deleteIfExists(leaseFile(path, kind))
    }

  // ── enforcement hooks the writers call ──────────────────────────────

  /** Paths whose maintenance lease THIS thread holds — so a maintenance
    * pass's own internal writes (compact's rewrite, refit's
    * reassignment merge) pass [[requireNoForeignMaintenance]] while
    * every other writer is refused. Thread-local because the package's
    * maintenance ops are synchronous driver-side calls; a streaming
    * worker's foreachBatch runs on a different thread and is correctly
    * treated as foreign. */
  private val ownMaintenance = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  /** Acquire `kind` on every path, ROLLING BACK the ones already taken
    * if a later acquire is refused — without this, a two-table window
    * refused on its second table would leak the first table's lease
    * until the TTL steals it, wedging that table's opposite class for
    * the whole window. */
  private def acquireAll(
      paths: Seq[String], kind: Kind, holder: String, ttlMs: Long): Unit = {
    val taken = scala.collection.mutable.ListBuffer.empty[String]
    try paths.foreach { p => acquire(p, kind, holder, ttlMs); taken += p }
    catch {
      case e: Throwable =>
        taken.foreach(release(_, kind, holder))
        throw e
    }
  }

  /** Run `body` inside a maintenance window over `paths`: refuse if any
    * has a fresh drain lease, take maintenance leases on all (all-or-
    * nothing), mark them owned for this thread, and always release. */
  def withMaintenance[A](
      paths: Seq[String], holder: String,
      ttlMs: Long = DefaultTtlMs)(body: => A): A = {
    acquireAll(paths, Maintenance, holder, ttlMs)
    val prev = ownMaintenance.get()
    ownMaintenance.set(prev ++ paths)
    try body
    finally {
      ownMaintenance.set(prev)
      paths.foreach(release(_, Maintenance, holder))
    }
  }

  /** Run `body` inside a drain window over `paths` — the bracket an
    * orchestrator puts around a drain-and-stop streaming cycle so a
    * concurrently scheduled maintenance pass is refused instead of
    * racing the drain's replayable batches. Acquisition is
    * all-or-nothing, like [[withMaintenance]]. */
  def withDrain[A](
      paths: Seq[String], holder: String,
      ttlMs: Long = DefaultTtlMs)(body: => A): A = {
    acquireAll(paths, Drain, holder, ttlMs)
    try body
    finally paths.foreach(release(_, Drain, holder))
  }

  /** Writer-side gate: refuse the write while a fresh maintenance lease
    * is held by anyone other than this thread's own maintenance pass. */
  private[graft] def requireNoForeignMaintenance(
      path: String, ttlMs: Long = DefaultTtlMs): Unit =
    if (!ownMaintenance.get().contains(path))
      read(path, Maintenance).foreach { case (h, age) =>
        if (age <= ttlMs)
          throw new IllegalStateException(
            s"write to $path refused: a maintenance window is open " +
              s"(lease held by '$h', ${age / 1000}s old) — a merge or " +
              "append racing compact/truncate/refit would be folded or " +
              "double-applied; retry after the window closes")
        Files.deleteIfExists(leaseFile(path, Maintenance)) // stale holder
      }
}
