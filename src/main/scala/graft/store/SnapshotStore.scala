package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot table store: parquet data + atomically-swapped JSON manifests.
  *
  * Stands in for Iceberg (no Iceberg jars ship in this environment): each
  * commit writes an immutable `r<round>` parquet directory and then renames
  * a manifest over `_manifest.json` (ATOMIC_MOVE) — the same
  * temp-dir-plus-rename install discipline as the reference's CrawlDb
  * (reference/src/java/org/apache/nutch/crawl/CrawlDb.java:190-219,
  * util/FSUtils.java), upgraded with retained history: every round's
  * snapshot stays readable (time travel), and resume-from-checkpoint is
  * "read the manifest, continue from its round".
  */
class SnapshotStore(val root: String) extends Serializable {

  private def tableDir(table: String): Path = Paths.get(root, table)
  private def manifestPath(table: String): Path = tableDir(table).resolve("_manifest.json")

  case class Snapshot(table: String, round: Int, path: String, committedAtMs: Long)

  /** Atomic commit: write parquet then swap the manifest. */
  def commit(table: String, df: DataFrame, round: Int): Snapshot = {
    val dataPath = tableDir(table).resolve(s"r$round").toString
    df.write.mode("overwrite").parquet(dataPath)
    val snap = Snapshot(table, round, dataPath, System.currentTimeMillis())
    Files.createDirectories(tableDir(table))
    val tmp = tableDir(table).resolve(s"_manifest.json.tmp")
    Files.writeString(tmp, manifestJson(snap), StandardCharsets.UTF_8)
    Files.move(tmp, manifestPath(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  private def manifestJson(s: Snapshot): String =
    s"""{"table":"${s.table}","round":${s.round},"path":"${s.path}","committed_at_ms":${s.committedAtMs}}"""

  /** Current snapshot of a table, if any. */
  def current(table: String): Option[Snapshot] = {
    val p = manifestPath(table)
    if (!Files.exists(p)) return None
    val txt = Files.readString(p)
    def field(k: String): String = {
      val m = ("\"" + k + "\"\\s*:\\s*(\"[^\"]*\"|[0-9]+)").r.findFirstMatchIn(txt)
      m.map(_.group(1).stripPrefix("\"").stripSuffix("\"")).getOrElse(
        throw new IllegalStateException(s"manifest missing $k: $txt"))
    }
    Some(Snapshot(field("table"), field("round").toInt, field("path"), field("committed_at_ms").toLong))
  }

  def load(spark: SparkSession, table: String): Option[DataFrame] =
    current(table).map(s => spark.read.parquet(s.path))

  /** Read a specific historical round (time travel). */
  def loadRound(spark: SparkSession, table: String, round: Int): Option[DataFrame] = {
    val p = tableDir(table).resolve(s"r$round")
    if (Files.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Last committed round of the frontier = the resume checkpoint. */
  def lastCompletedRound: Option[Int] = current("frontier").map(_.round)

  /** Point the manifest back at an existing historical round (time travel as
    * state reset — the snapshot data is immutable, only the pointer moves). */
  def resetTo(table: String, round: Int): Unit = {
    val dataPath = tableDir(table).resolve(s"r$round")
    require(Files.exists(dataPath), s"no snapshot $table/r$round")
    val snap = Snapshot(table, round, dataPath.toString, System.currentTimeMillis())
    val tmp = tableDir(table).resolve("_manifest.json.tmp")
    Files.writeString(tmp, manifestJson(snap), StandardCharsets.UTF_8)
    Files.move(tmp, manifestPath(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Append-only metrics table (one parquet dir per round+stage). */
  def appendMetrics(df: DataFrame, round: Int, stage: String): Unit =
    df.write.mode("overwrite").parquet(tableDir("round_metrics").resolve(s"r$round-$stage").toString)

  def metrics(spark: SparkSession): Option[DataFrame] = {
    val dir = tableDir("round_metrics")
    if (Files.exists(dir)) Some(spark.read.parquet(dir.toString + "/r*")) else None
  }
}
