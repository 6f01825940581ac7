package graft

import org.apache.spark.sql.DataFrame
import java.nio.file.{Files, Path}

/** Shared helper for the streaming kill/resume suites: land ONE parquet
  * part file in a flat directory ATOMICALLY (write to a tmp dir, move
  * the part in), so the file source sees whole files in
  * modification-time order — the ordering every drain-order assertion
  * in these suites depends on. The move is the atomicity boundary; a
  * direct `write.parquet(flat)` would expose _temporary dirs and
  * in-flight parts to the running stream. */
object StreamFiles {
  def landOne(base: Path, flat: String, name: String, df: DataFrame): Unit = {
    val tmp = base.resolve(name + ".tmp").toString
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, new java.io.File(s"$flat/$name.parquet").toPath)
  }
}
