package graft.sinks

import java.nio.file.{Files, Path, Paths}
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

  /** (holder, ageMs) of the marker file at `f`, if one exists. An
    * unreadable/garbled file reports age 0 with a diagnostic holder —
    * treated as FRESH (refuse rather than steal what can't be read;
    * the TTL still unwedges it once the file's mtime is old enough). */
  private def readFile(f: Path): Option[(String, Long)] = {
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

  private def read(path: String, kind: Kind): Option[(String, Long)] =
    readFile(leaseFile(path, kind))

  /** Directory holding lease `f`'s renewal sentinels: a SCOPED
    * namespace (`<lease>.renewing/`), not a sibling-name prefix, so the
    * gate's sentinel scan is one `isDirectory` stat on a table that has
    * never renewed (the common case — [[requireNoForeignMaintenance]]
    * runs on EVERY append/upsert) and a listing of at most the lease's
    * own concurrent renewals otherwise — never a listing of the whole
    * warehouse directory, whose cost grows with sibling tables and
    * markers (and is a server-side prefix LIST, not a full scan, on an
    * object store). The directory is left in place once created: a
    * concurrent create-vs-delete race on the directory itself would
    * force retries inside the renewal bracket, and an empty directory
    * costs the gate one cheap empty listing. */
  private def sentinelDir(f: Path): Path = {
    val abs = f.toAbsolutePath
    abs.resolveSibling(abs.getFileName.toString + ".renewing")
  }

  /** The freshest RENEWAL SENTINEL for lease file `f`, if any is
    * within `ttlMs`. A renewal brackets its tomb-and-re-create exchange
    * with a uniquely named file under [[sentinelDir]]
    * (`<pid>-<tid>-<nano>`, created before the tomb, deleted after the
    * re-create), so the microseconds where the lease file is
    * legitimately ABSENT are still visible as a held window to every
    * read-only gate ([[readEffective]]). Unique names keep concurrent
    * renewals (two threads of one process heartbeating the same path)
    * from deleting each other's bracket. A sentinel older than the TTL
    * is a renewal that crashed inside the exchange — its window is over
    * (the lease file is gone too), so it is dropped, not honored. */
  private def freshRenewalSentinel(
      f: Path, ttlMs: Long): Option[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    val dir = sentinelDir(f)
    if (!Files.isDirectory(dir)) return None
    val list =
      try Files.list(dir)
      catch { case _: java.io.IOException => return None }
    val sentinels =
      try list.iterator().asScala.toList
      finally list.close()
    val entries = sentinels.flatMap(p => readFile(p).map(p -> _))
    entries.filter(_._2._2 > ttlMs)
      .foreach(e => Files.deleteIfExists(e._1))
    entries.map(_._2).filter(_._2 <= ttlMs).sortBy(_._2).headOption
  }

  private def renewalSentinelFile(f: Path): Path =
    sentinelDir(f).resolve(
      s"${ProcessHandle.current().pid()}-" +
      s"${Thread.currentThread().getId}-${System.nanoTime()}")

  /** Create an exchange sentinel bracketing a lease-file exchange on
    * `f` for `holder`; returns the sentinel path (the caller deletes
    * it in a finally). Used only by the RARE exchanges that absent the
    * lease file while a window may be live — a near-boundary renewal
    * and a release's verify/restore ([[readEffective]]'s contract;
    * healthy heartbeats replace in place and need no bracket).
    * Advisory — an IO failure never wedges the exchange; the gate's
    * visibility degrades to the bare lease read for that one
    * exchange. */
  private def openSentinel(f: Path, holder: String): Path = {
    val sentinel = renewalSentinelFile(f)
    try {
      Files.createDirectories(sentinel.getParent)
      Files.write(sentinel, leasePayload(holder),
        java.nio.file.StandardOpenOption.CREATE_NEW)
    } catch { case _: java.io.IOException => () }
    sentinel
  }

  /** The `kind` window as a read-only GATE must see it: the lease file
    * itself, or — when that is absent — a fresh exchange sentinel (the
    * lease is mid-exchange; the window is LIVE).
    *
    * THE MODULE CONTRACT (r15): a HEALTHY renewal never removes the
    * lease file at all — [[acquire]]'s heartbeat branch refreshes the
    * payload IN PLACE with an atomic same-directory REPLACE rename —
    * so for the whole life of a held window under a live heartbeat
    * this gate is DETERMINISTIC: one lease-file read, no alignment
    * windows, no probability argument. (The previous design tombed and
    * re-created the file on every renewal and defended the absence gap
    * with a three-pass sentinel scan; its own cross-process spec then
    * measured 10/3000 gate admissions against a zero-work renewal
    * loop — the passes are CORRELATED under a periodic adversary, so
    * multiplying per-pass probabilities was wrong, and the machinery
    * was replaced, not re-argued. The fork spec now asserts ZERO
    * admissions, deterministically.)
    *
    * The only lease-file absences that can occur while a window is
    * semantically live are sentinel-bracketed and rare: a NEAR-BOUNDARY
    * renewal (lease age past ttl−margin — the holder all but went
    * stale) and a release's foreign-restore exchange (theft already
    * happened). For those the gate falls through to one sentinel-dir
    * check — a single stat on a table with no exchange in flight
    * ([[sentinelDir]]). The two-instant lease-then-sentinel read is a
    * residual ONLY inside those exchanges: events whose frequency is
    * theft/near-stale incidents, not heartbeats. Absences during a
    * stale-lease STEAL ([[claimStale]]) are deliberately visible — a
    * stale window is contractually unheld, so reading it absent is
    * correct, not a gap. */
  private def readEffective(
      path: String, kind: Kind, ttlMs: Long): Option[(String, Long)] =
    read(path, kind).orElse(
      freshRenewalSentinel(leaseFile(path, kind), ttlMs))

  /** Atomically CLAIM a stale lease file: rename it to a unique tomb,
    * VERIFY the tombed content is actually stale, then drop the tomb.
    * The rename is the claim's linearization point — of N concurrent
    * claimants exactly one rename succeeds; a loser's throws
    * NoSuchFileException (the file is already gone — claimed; report
    * success, the creation race downstream decides the winner). The
    * verify step closes the ABA window between the caller's read and
    * the rename: if the crashed holder's lease was meanwhile replaced
    * by someone ELSE's fresh lease, the rename tombed a LIVE window —
    * restore it and report failure so the caller refuses instead of
    * proceeding. (The previous form — deleteIfExists + REPLACE_EXISTING
    * write — let a slow loser delete the winner's fresh lease and
    * overwrite it: two "exclusive" windows open at once, the exact race
    * the lease exists to close.) */
  private def claimStale(f: Path, ttlMs: Long): Boolean = {
    val tomb = f.resolveSibling(f.getFileName.toString +
      s".tomb-${ProcessHandle.current().pid()}-" +
      s"${Thread.currentThread().getId}-${System.nanoTime()}")
    try Files.move(f, tomb)
    catch { case _: java.nio.file.NoSuchFileException => return true }
    val now = System.currentTimeMillis()
    val ageMs =
      try {
        val lines = new String(Files.readAllBytes(tomb), UTF_8).split("\n")
        now - lines(1).trim.toLong
      } catch {
        // unreadable content: age by mtime (preserved by the rename),
        // exactly like [[read]] does for a garbled lease
        case _: Exception =>
          try now - Files.getLastModifiedTime(tomb).toMillis
          catch { case _: Exception => 0L }
      }
    if (ageMs <= ttlMs) {
      // tombed a LIVE lease (refreshed/re-created between the caller's
      // read and the rename): put it back and fail the claim. If a new
      // lease already appeared where it was, the restore loses — drop
      // the tomb (that new lease now owns the window) and still fail.
      try Files.move(tomb, f)
      catch { case _: Exception => Files.deleteIfExists(tomb) }
      false
    } else {
      Files.deleteIfExists(tomb)
      true
    }
  }

  private def leasePayload(holder: String): Array[Byte] =
    s"$holder\n${System.currentTimeMillis()}".getBytes(UTF_8)

  /** Atomic first acquisition: CREATE_NEW open — exactly one creator
    * wins; losers see FileAlreadyExistsException. (A rename without
    * REPLACE_EXISTING is NOT atomic on POSIX — the existence check is
    * separate from the rename — so creation, not rename, is the
    * primitive here. A reader racing the content write sees a partial
    * file, which [[read]] already treats as fresh-unreadable: it
    * refuses rather than steals.) */
  private def tryCreate(f: Path, holder: String): Boolean = {
    if (f.getParent != null) Files.createDirectories(f.getParent)
    try {
      Files.write(f, leasePayload(holder),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }
  }

  /** Atomically take OUR OWN lease file out of play: tomb-rename it
    * and verify the tombed content really is this holder's. Used by
    * [[release]] and by [[acquire]]'s NEAR-BOUNDARY renewal branch
    * only — a healthy heartbeat replaces the payload in place and
    * never calls this (an UNCONDITIONAL blind REPLACE here would
    * re-open the two-holders race exactly at the TTL boundary: a thief
    * that had just stolen the boundary-stale lease and created its own
    * would have it silently overwritten, with both sides believing
    * they held the window — which is why the in-place path is gated on
    * age ≤ ttl − ttl/4, where no concurrent steal can be legal). With
    * the tomb, a caller that finds someone else's content restores it
    * and reports failure, and a renewal's subsequent CREATE_NEW race
    * decides every concurrent interleaving with exactly one winner. An
    * absent file reports success — the race downstream decides.
    *
    * ABSENCE WINDOW: between the tomb and the restore/re-create the
    * lease file is briefly ABSENT. POSIX rename cannot express the
    * atomic two-file exchange that would avoid it. Both call sites
    * bracket the exchange with a sentinel ([[openSentinel]]) so
    * read-only gates ([[readEffective]]) see lease-absent-but-
    * sentinel-fresh as a held window; because only near-stale renewals
    * and releases ever enter this exchange, the gate's two-instant
    * residual has the frequency of theft/near-stale incidents, not of
    * heartbeats. */
  private def claimOwn(f: Path, holder: String): Boolean = {
    val tomb = f.resolveSibling(f.getFileName.toString +
      s".tomb-${ProcessHandle.current().pid()}-" +
      s"${Thread.currentThread().getId}-${System.nanoTime()}")
    try Files.move(f, tomb)
    catch { case _: java.nio.file.NoSuchFileException => return true }
    val owner =
      try new String(Files.readAllBytes(tomb), UTF_8).split("\n")(0)
      catch { case _: Exception => "<unreadable lease>" }
    if (owner == holder) { Files.deleteIfExists(tomb); true }
    else {
      try Files.move(tomb, f)
      catch { case _: Exception => Files.deleteIfExists(tomb) }
      false
    }
  }

  /** Take the `kind` lease on `path` for `holder`, refusing loudly if
    * the OPPOSITE kind is held fresh, or the SAME kind is held fresh by
    * a different holder. A stale lease (older than `ttlMs`) is a
    * crashed holder and is stolen — atomically: concurrent stealers
    * race a tomb-rename + CREATE_NEW create, and exactly one wins (the
    * losers are refused, never silently co-admitted). Re-acquiring
    * one's own FRESH lease refreshes its timestamp — the heartbeat a
    * long drain rides ([[renewIfDraining]]). */
  def acquire(
      path: String, kind: Kind, holder: String,
      ttlMs: Long = DefaultTtlMs): Unit = {
    val opposite = if (kind == Drain) Maintenance else Drain
    def refuseOpposite(h: String, age: Long): Nothing =
      throw new IllegalStateException(
        s"cannot open a $kind window on $path: a $opposite lease is " +
          s"held by '$h' (${age / 1000}s old, ttl ${ttlMs / 1000}s) — " +
          "wait for the window to close, or delete the lease file if " +
          "the holder is known dead")
    // sentinel-aware read: an opposite-kind renewal's mid-exchange gap
    // must read as a held window, not an empty field
    readEffective(path, opposite, ttlMs).foreach { case (h, age) =>
      if (age <= ttlMs) refuseOpposite(h, age)
      // stale: crashed holder — claim atomically; a failed claim means
      // the window was re-opened fresh under us, so refuse
      if (!claimStale(leaseFile(path, opposite), ttlMs)) {
        val (h2, age2) = read(path, opposite).getOrElse((h, 0L))
        refuseOpposite(h2, age2)
      }
    }
    val f = leaseFile(path, kind)
    // SAME-kind read is sentinel-aware too: a foreign holder's renewal
    // gap must read as that holder's held window, or a concurrent
    // acquirer walks into the "empty" field, CREATE_NEW-wins it, and
    // the fresh window's legitimate holder loses its own renewal — a
    // fresh-window steal the protocol promises cannot happen (caught
    // by the forked-JVM race spec's renew rounds, not the same-JVM
    // hammers: only a second process's acquire ever lands there).
    readEffective(path, kind, ttlMs) match {
      case Some((h, age)) if age <= ttlMs && h != holder =>
        throw new IllegalStateException(
          s"cannot open a $kind window on $path: another $kind lease is " +
            s"held by '$h' (${age / 1000}s old) — two concurrent " +
            s"$kind holders violate the single-writer contract")
      case Some((_, age)) if age <= ttlMs - ttlMs / 4 =>
        // HEALTHY heartbeat (the overwhelming case — per-write renewals
        // keep the age at seconds against a minutes TTL): refresh one's
        // OWN fresh lease IN PLACE — new payload to a unique temp
        // sibling, atomic same-directory REPLACE rename onto the lease
        // file. The file is NEVER absent, so every read-only gate sees
        // the held window deterministically ([[readEffective]]'s
        // contract). Soundness of the replace: a thief may legally
        // tomb-claim only a STALE lease (age > ttl), but this branch
        // ran only because OUR read said age ≤ ttl − ttl/4 — the
        // thief's qualifying read must come ≥ ttl/4 AFTER ours (same
        // file, same stored timestamp, same clock), while our
        // read-to-rename spans two adjacent file ops. Clobbering a
        // thief would therefore take a ttl/4 stall between two
        // syscalls — minutes at the default TTL, a holder the TTL
        // model already declares crashed. Concurrent renewals by
        // threads of the SAME holder commute (identical content
        // modulo timestamp).
        val tmp = f.resolveSibling(f.getFileName.toString +
          s".renew-${ProcessHandle.current().pid()}-" +
          s"${Thread.currentThread().getId}-${System.nanoTime()}")
        Files.write(tmp, leasePayload(holder))
        // ATOMIC_MOVE, not REPLACE_EXISTING: REPLACE without ATOMIC is
        // implemented as unlink-target-then-rename — an absence window
        // that re-opens the exact gap this branch exists to close (the
        // fork gate-hammer spec measured 344/3000 admissions through
        // it). ATOMIC_MOVE maps to plain rename(2), which replaces an
        // existing target atomically on POSIX.
        Files.move(tmp, f,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      case Some((_, age)) if age <= ttlMs =>
        // NEAR-BOUNDARY renewal (age inside the last ttl/4 — the
        // heartbeat all but went stale, so a concurrent thief's
        // stale-read may already be legal and an in-place replace
        // could clobber its fresh lease): take the conservative
        // tomb-verify + CREATE_NEW exchange — [[claimOwn]] verifies
        // the content is really ours (a thief that won the boundary
        // race is restored and we refuse), then the CREATE_NEW race
        // decides concurrent renewers/stealers with exactly one
        // winner. The exchange briefly absents the lease file, so it
        // is bracketed by a sentinel ([[openSentinel]]) that gates
        // read as a held window; the bracket is removed in a finally —
        // on refusal the window's true state is back in the lease file
        // (restored by claimOwn or owned by the thief).
        val sentinel = openSentinel(f, holder)
        try {
          if (!claimOwn(f, holder))
            throw new IllegalStateException(
              s"cannot renew the $kind lease on $path: the lease was " +
                s"taken by '${read(path, kind).map(_._1).getOrElse("<gone>")}'" +
                " — the window was stolen at the TTL boundary")
          if (!tryCreate(f, holder)) {
            val winner = read(path, kind).map(_._1).getOrElse("<unknown>")
            if (winner != holder)
              throw new IllegalStateException(
                s"cannot renew the $kind lease on $path: lost the " +
                  s"re-creation race to '$winner'")
          }
        } finally Files.deleteIfExists(sentinel)
      case stale =>
        // stale same-kind: claim the crashed holder's file (a failed
        // claim = someone re-created it fresh; fall through — tryCreate
        // loses and the winner check below surfaces them), then race to
        // CREATE — exactly one concurrent acquirer wins
        stale.foreach(_ => claimStale(f, ttlMs))
        if (!tryCreate(f, holder)) {
          // lost the creation race; surface the winner (same holder =
          // another thread of this process re-entered — already held)
          val winner = read(path, kind).map(_._1).getOrElse("<unknown>")
          if (winner != holder)
            throw new IllegalStateException(
              s"cannot open a $kind window on $path: lost the " +
                s"acquisition race to '$winner'")
        }
    }
    // POST-win cross-kind double-check: the opposite gate above and our
    // create are two files apart, so two OPPOSITE-kind acquirers can
    // each pass the other's gate before either creates (the classic
    // two-file TOCTOU). Both sides re-checking AFTER their create
    // closes it: for both to proceed, each create would have to precede
    // the other's check, and each check follows its own create — so at
    // least one side sees the other's fresh lease here and backs out
    // (releases its own, refuses loudly). Simultaneous starts can
    // BOTH back out — safe, the caller retries into an empty field.
    readEffective(path, opposite, ttlMs).foreach { case (h, age) =>
      if (age <= ttlMs) {
        release(path, kind, holder)
        refuseOpposite(h, age)
      }
    }
  }

  /** Release `holder`'s lease. Releasing a lease someone else stole
    * (after this holder went stale) is a no-op — the thief owns it.
    *
    * READ-AND-COMPARE first: a foreign fresh lease (the common
    * post-steal state) is never moved at all — the earlier form rode
    * [[claimOwn]] unconditionally, which tombs the file BEFORE
    * verifying ownership, so a thief's live window was briefly absent
    * with no sentinel bracketing it (the same gap class the renewal
    * sentinel closes, reintroduced). Only when the content reads as
    * OURS (or unreadable — claimOwn's verify decides) does the
    * tomb-verify exchange run, and it is BRACKETED by the same renewal
    * sentinel as a renewal: if a thief replaced the file between the
    * read and the move, the restore's brief absence still reads as a
    * held window to every gate. (The bracket also covers the owner's
    * own legitimate removal — a gate read landing just after the
    * delete but before the sentinel drop sees "held" for a few extra
    * microseconds, which is conservative, never unsafe.) */
  def release(path: String, kind: Kind, holder: String): Unit = {
    val f = leaseFile(path, kind)
    readFile(f) match {
      case None => ()
      case Some((h, _)) if h != holder && h != "<unreadable lease>" => ()
      case _ =>
        val sentinel = openSentinel(f, holder)
        try { claimOwn(f, holder); () }
        finally Files.deleteIfExists(sentinel)
    }
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
    * nothing), mark them owned for this thread, and always release.
    *
    * RE-ENTRANT per thread: a path this thread's OUTER maintenance
    * window already owns is not re-acquired (a nested acquire under a
    * different holder name would refuse its own caller) and not
    * released on the inner exit — the outer window's lifetime governs.
    * This is what lets a multi-table op (e.g. a worker takedown over
    * survivors + index) take ONE window over all its tables and call
    * the per-table maintenance primitives ([[graft.sinks.UpsertWriter
    * .deleteWhere]]) inside it: the pair of deletes is then
    * all-or-nothing against concurrent windows — a foreign lease on
    * EITHER table refuses the whole op before the first delete runs,
    * never between them. */
  def withMaintenance[A](
      paths: Seq[String], holder: String,
      ttlMs: Long = DefaultTtlMs)(body: => A): A = {
    val prev = ownMaintenance.get()
    val fresh = paths.filterNot(prev.contains)
    acquireAll(fresh, Maintenance, holder, ttlMs)
    ownMaintenance.set(prev ++ fresh)
    fresh.foreach(p => activeMaintenance.put(p, (holder, ttlMs)))
    try body
    finally {
      fresh.foreach(activeMaintenance.remove)
      ownMaintenance.set(prev)
      fresh.foreach(release(_, Maintenance, holder))
    }
  }

  /** Paths currently inside a [[withDrain]] window of THIS process,
    * with their holder + ttl — so the write path can renew the drain
    * lease on every state write ([[renewIfDraining]]). Process-global
    * (not thread-local): the drain bracket runs on the orchestrator
    * thread while foreachBatch writes run on stream-execution threads,
    * and it is exactly those writes that must carry the heartbeat. */
  private val activeDrains =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  /** HEARTBEAT: renew the drain lease on `path` if this process is
    * inside a [[withDrain]] window over it. Without renewal, a drain
    * whose batches legitimately outlive the TTL goes stale mid-run and
    * a scheduled maintenance pass STEALS the lease and races the still-
    * running drain — the exact hazard the lease exists to prevent.
    * Re-acquiring one's own lease refreshes the timestamp, so calling
    * this per state write bounds staleness by the gap between writes
    * (≪ a batch) instead of the whole drain. Loud failure is the
    * point: if the lease WAS stolen and a foreign maintenance window
    * is open now, the renewal throws and the write never races it.
    *
    * Two exemptions keep the heartbeat from misfiring:
    *  - a path whose MAINTENANCE lease this thread holds skips renewal
    *    entirely — a maintenance pass that legitimately stole a
    *    same-process wedged drain's stale lease would otherwise abort
    *    on its own internal writes (its fresh Maintenance lease reads
    *    as the "opposite window" to the drain renewal);
    *  - a renewal racing the [[withDrain]] exit re-checks the registry
    *    after acquiring and self-releases if the bracket already left —
    *    otherwise the freshly re-created lease would be orphaned (the
    *    bracket's release already ran) and wedge maintenance for a full
    *    TTL against a holder that no longer exists. */
  private[graft] def renewIfDraining(path: String): Unit = {
    if (ownMaintenance.get().contains(path)) return
    val e = activeDrains.get(path)
    if (e != null) {
      requireStillHeld(path, Drain, e._1, e._2)
      acquire(path, Drain, e._1, e._2)
      if (activeDrains.get(path) == null) release(path, Drain, e._1)
    }
  }

  /** A heartbeat must RENEW a window, never silently re-open one that
    * was lost: an ABSENT lease file at renewal time means a thief stole
    * the stale lease and has since finished and released — without this
    * check, acquire()'s stale/None path would simply re-create the
    * lease and the long-running pass would resume over a table someone
    * else legally mutated in between (for a maintenance pass, its
    * pre-theft staged image would then fold away the thief's committed
    * writes — permanent loss). A foreign holder, or a thief still
    * INSIDE its stolen window, is left to acquire()'s own checks (their
    * refusals carry the more useful who-holds-it message); absence with
    * no fresh opposite window is the case only this check can see. */
  private def requireStillHeld(
      path: String, kind: Kind, holder: String, ttlMs: Long): Unit =
    if (read(path, kind).isEmpty) {
      val opposite = if (kind == Drain) Maintenance else Drain
      val oppositeFresh = read(path, opposite).exists(_._2 <= ttlMs)
      if (!oppositeFresh)
        throw new IllegalStateException(
          s"cannot renew the $kind lease on $path for '$holder': the " +
            "lease file is gone — the window went stale, was stolen, and " +
            "the thief has since released; the pass must abort (its view " +
            "of the table predates the thief's writes), not resume")
    }

  /** Paths inside a [[withMaintenance]] window of THIS process — the
    * maintenance twin of [[activeDrains]], so the long write phases of
    * compact/rebucket/deleteWhere can carry a heartbeat too. */
  private val activeMaintenance =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  /** Maintenance-side HEARTBEAT — the symmetric half of
    * [[renewIfDraining]]: a maintenance rewrite whose staged write
    * outlives the TTL (a 100 TB compact or rebucket legitimately can)
    * would otherwise go stale mid-pass, be stolen by a drain's acquire,
    * and keep mutating beside the live drain — its internal writes are
    * exempted from [[requireNoForeignMaintenance]] by design, so
    * nothing else would catch it. Called by the writers at the start of
    * every mutation phase (staging committed, renames about to begin):
    * a stolen window throws BEFORE any rename, leaving the committed
    * staging for the next recover() to resolve under whoever owns the
    * table then. No-op outside a [[withMaintenance]] window. */
  private[graft] def renewIfMaintaining(path: String): Unit = {
    val e = activeMaintenance.get(path)
    if (e != null && ownMaintenance.get().contains(path)) {
      requireStillHeld(path, Maintenance, e._1, e._2)
      acquire(path, Maintenance, e._1, e._2)
      if (activeMaintenance.get(path) == null)
        release(path, Maintenance, e._1)
    }
  }

  /** Run `body` inside a drain window over `paths` — the bracket an
    * orchestrator puts around a drain-and-stop streaming cycle so a
    * concurrently scheduled maintenance pass is refused instead of
    * racing the drain's replayable batches. Acquisition is
    * all-or-nothing, like [[withMaintenance]]; while the window is
    * open, every [[UpsertWriter]] write to one of `paths` renews the
    * lease ([[renewIfDraining]]), so a drain longer than the TTL never
    * goes stale between batches. Windows over one path don't nest. */
  def withDrain[A](
      paths: Seq[String], holder: String,
      ttlMs: Long = DefaultTtlMs)(body: => A): A = {
    acquireAll(paths, Drain, holder, ttlMs)
    paths.foreach(p => activeDrains.put(p, (holder, ttlMs)))
    try body
    finally {
      paths.foreach(activeDrains.remove)
      paths.foreach(release(_, Drain, holder))
    }
  }

  /** Writer-side gate: refuse the write while a fresh maintenance lease
    * is held by anyone other than this thread's own maintenance pass.
    * Sentinel-aware ([[readEffective]]): a gate read landing in a
    * maintenance renewal's tomb-to-re-create gap sees the renewal
    * sentinel and refuses — the tomb-window residual this gate used to
    * carry (a read-only check with no post-create recheck) is closed. */
  private[graft] def requireNoForeignMaintenance(
      path: String, ttlMs: Long = DefaultTtlMs): Unit =
    if (!ownMaintenance.get().contains(path))
      readEffective(path, Maintenance, ttlMs).foreach { case (h, age) =>
        def refuse(h2: String, age2: Long): Nothing =
          throw new IllegalStateException(
            s"write to $path refused: a maintenance window is open " +
              s"(lease held by '$h2', ${age2 / 1000}s old) — a merge or " +
              "append racing compact/truncate/refit would be folded or " +
              "double-applied; retry after the window closes")
        if (age <= ttlMs) refuse(h, age)
        // stale holder: claim atomically — a plain delete here could
        // remove a FRESH lease re-created between the read and the
        // delete, unprotecting a live maintenance window
        if (!claimStale(leaseFile(path, Maintenance), ttlMs)) {
          val (h2, age2) = read(path, Maintenance).getOrElse((h, 0L))
          refuse(h2, age2)
        }
      }
}
