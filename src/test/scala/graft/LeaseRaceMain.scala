package graft

import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets.UTF_8

/** Shared protocol for the CROSS-PROCESS lease race
  * ([[LeaseForkRaceSpec]] ↔ [[LeaseRaceMain]]): the tomb/CREATE_NEW
  * lease protocol's whole point is exclusion between PROCESSES (pids
  * in tomb names, file-based state), and until round 14 every race
  * case exercised it with threads of one JVM. Here a real second JVM
  * is forked and the two sides race through file-based starting guns —
  * never a sleep standing in for the other side's progress: every wait
  * is a poll-for-file with a hard deadline that fails loudly.
  *
  * Per round the PARENT preps the field, then drops `go-<i>`; both
  * sides attempt the round's action as soon as they see it and publish
  * their outcome atomically (`out-<side>-<i>`, temp + rename). Rounds
  * cycle through the three contested shapes:
  *
  *  - EMPTY: first acquisition on an empty field — the CREATE_NEW race;
  *  - STALE: a crashed holder's stale lease present — the
  *    tomb-claim + CREATE_NEW steal race;
  *  - RENEW: the parent holds a FRESH lease and heartbeats it while
  *    the child tries to take the window — the child must lose every
  *    time (renewal never surrenders a held fresh window);
  *  - CROSS: parent races a Maintenance acquire against the child's
  *    Drain acquire — at most one side may win (both backing out is
  *    the documented safe outcome of simultaneous cross-kind starts).
  */
private[graft] object LeaseRaceProtocol {
  sealed trait Scenario
  case object Empty extends Scenario
  case object Stale extends Scenario
  case object Renew extends Scenario
  case object Cross extends Scenario

  val Rounds = 16
  def scenarioOf(i: Int): Scenario = (i % 4) match {
    case 0 => Empty
    case 1 => Stale
    case 2 => Renew
    case _ => Cross
  }

  /** Round index reserved for the GATE-HAMMER case (outside the 0 until
    * Rounds contested cycle) and the number of gate calls the child
    * makes — the module-contract pin for [[graft.sinks.TableLease]]'s
    * in-place renewal design: thousands of cross-process gate reads
    * against a ZERO-WORK renewal loop, zero admissions allowed. */
  val GateRound = 1000
  val GateAttempts = 3000

  /** Round index for the NEAR-BOUNDARY hammer (r15 verdict #3): the
    * parent forces every heartbeat through the boundary renewal
    * branch (lease age injected past ttl−ttl/4) while the child
    * hammers the writer gate — pinning that the lock-serialized
    * in-place exchange never absents a live window's lease file
    * (the sentinel-bracketed tomb form it replaced measured 11/3000
    * admissions under exactly this hammer). */
  val GateRoundNB = 1001

  def table(dir: String): String = s"$dir/t"
  def go(dir: String, i: Int): Path = Paths.get(dir, s"go-$i")
  def out(dir: String, side: String, i: Int): Path =
    Paths.get(dir, s"out-$side-$i")
  def done(dir: String, i: Int): Path = Paths.get(dir, s"done-$i")

  /** Poll until `f` exists — event-based synchronization with a hard
    * deadline, never a duration assumed to cover the other side. */
  def await(f: Path, timeoutMs: Long = 60000): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!Files.exists(f)) {
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(s"timed out waiting for $f")
      java.util.concurrent.locks.LockSupport.parkNanos(100000)
    }
  }

  /** Publish an outcome atomically so the reader never sees a torn
    * file: unique temp sibling + same-directory rename. */
  def publish(f: Path, content: String): Unit = {
    val tmp = f.resolveSibling(
      f.getFileName.toString + s".tmp-${ProcessHandle.current().pid()}")
    Files.write(tmp, content.getBytes(UTF_8))
    Files.move(tmp, f)
  }

  def readOutcome(f: Path): String =
    new String(Files.readAllBytes(f), UTF_8)
}

/** The CHILD side of the cross-process race — a plain JVM main (the
  * lease needs no Spark), forked by [[LeaseForkRaceSpec]] with this
  * test JVM's own classpath. Attempts each round's action the instant
  * the starting gun appears and publishes win/lose. */
object LeaseRaceMain {
  import LeaseRaceProtocol._
  import graft.sinks.TableLease

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    if (args.length > 1 && args(1) == "gate") { gateMain(dir); return }
    if (args.length > 1 && args(1) == "gateNB") {
      gateMain(dir, GateRoundNB); return
    }
    val t = table(dir)
    for (i <- 0 until Rounds) {
      await(go(dir, i))
      val outcome =
        try {
          scenarioOf(i) match {
            case Cross => TableLease.acquire(t, TableLease.Drain, "child")
            case _ => TableLease.acquire(t, TableLease.Maintenance, "child")
          }
          "win"
        } catch {
          case e: IllegalStateException => s"lose:${e.getMessage}"
        }
      publish(out(dir, "child", i), outcome)
      await(done(dir, i)) // parent finished judging + cleanup
    }
  }

  /** GATE-HAMMER child: while the parent runs a renewal loop on its
    * own fresh Maintenance lease (healthy in-place heartbeats in the
    * `gate` mode; injected NEAR-BOUNDARY lock-serialized exchanges in
    * `gateNB`), hammer the writer-side gate from THIS separate
    * process. Every call must refuse; a single pass is a
    * cross-process admission into a held window. Publishes
    * `passes=<n>;attempts=<k>`. */
  private def gateMain(dir: String, round: Int = GateRound): Unit = {
    val t = table(dir)
    await(go(dir, round))
    var passes = 0L
    (1 to GateAttempts).foreach { _ =>
      try { TableLease.requireNoForeignMaintenance(t); passes += 1 }
      catch { case _: IllegalStateException => () }
    }
    publish(out(dir, "child", round),
      s"passes=$passes;attempts=$GateAttempts")
  }
}
