package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot table store: parquet data + atomically-swapped JSON manifests
  * (the default [[TableStore]]).
  *
  * Each commit writes an immutable `r<round>` parquet directory and then
  * renames a manifest over `_manifest.json` (ATOMIC_MOVE) — the same
  * temp-dir-plus-rename install discipline as the reference's CrawlDb
  * (reference/src/java/org/apache/nutch/crawl/CrawlDb.java:190-219,
  * util/FSUtils.java), upgraded with retained history: every round's
  * snapshot stays readable (time travel), and resume-from-checkpoint is
  * "read the manifest, continue from its round".
  */
class SnapshotStore(val root: String) extends TableStore {

  private def tableDir(table: String): Path = Paths.get(root, table)
  private def manifestPath(table: String): Path = tableDir(table).resolve("_manifest.json")

  override def commit(table: String, df: DataFrame, round: Int, tag: String = "",
                      allowRewind: Boolean = false): Snapshot = {
    current(table).foreach { c =>
      require(round >= c.round || allowRewind,
        s"commit($table, round=$round) would rewind the manifest (current round ${c.round}); " +
        "use resetTo + allowRewind for deliberate history replay")
    }
    val dirName = if (tag.isEmpty) s"r$round" else s"r$round-$tag"
    val dataPath = tableDir(table).resolve(dirName).toString
    df.write.mode("overwrite").parquet(dataPath)
    val snap = Snapshot(table, round, dataPath, System.currentTimeMillis())
    Files.createDirectories(tableDir(table))
    val tmp = tableDir(table).resolve(s"_manifest.json.tmp")
    Files.writeString(tmp, manifestJson(snap), StandardCharsets.UTF_8)
    Files.move(tmp, manifestPath(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  override def freshTag(table: String, round: Int, prefix: String): String = {
    var i = 1
    while (Files.exists(tableDir(table).resolve(s"r$round-$prefix$i"))) i += 1
    s"$prefix$i"
  }

  private def manifestJson(s: Snapshot): String =
    s"""{"table":"${s.table}","round":${s.round},"path":"${s.path}","committed_at_ms":${s.committedAtMs}}"""

  override def current(table: String): Option[Snapshot] = {
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

  override def loadRound(spark: SparkSession, table: String, round: Int): Option[DataFrame] = {
    val p = tableDir(table).resolve(s"r$round")
    if (Files.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  override def resetTo(table: String, round: Int): Unit = {
    val dataPath = tableDir(table).resolve(s"r$round")
    require(Files.exists(dataPath), s"no snapshot $table/r$round")
    val snap = Snapshot(table, round, dataPath.toString, System.currentTimeMillis())
    val tmp = tableDir(table).resolve("_manifest.json.tmp")
    Files.writeString(tmp, manifestJson(snap), StandardCharsets.UTF_8)
    Files.move(tmp, manifestPath(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  override def commitBlob(table: String, bytes: Array[Byte], round: Int,
                          allowRewind: Boolean = false): Snapshot = {
    current(table).foreach(c => require(round >= c.round || allowRewind,
      s"commitBlob($table, round=$round) would rewind (current ${c.round})"))
    Files.createDirectories(tableDir(table))
    val dataPath = tableDir(table).resolve(s"r$round.bin")
    val tmpData = tableDir(table).resolve(s"r$round.bin.tmp")
    Files.write(tmpData, bytes)
    Files.move(tmpData, dataPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    val snap = Snapshot(table, round, dataPath.toString, System.currentTimeMillis())
    val tmp = tableDir(table).resolve("_manifest.json.tmp")
    Files.writeString(tmp, manifestJson(snap), StandardCharsets.UTF_8)
    Files.move(tmp, manifestPath(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    snap
  }

  override def appendMetrics(df: DataFrame, round: Int, stage: String): Unit =
    df.write.mode("overwrite").parquet(tableDir("round_metrics").resolve(s"r$round-$stage").toString)

  override def metrics(spark: SparkSession): Option[DataFrame] = {
    val dir = tableDir("round_metrics")
    if (Files.exists(dir)) Some(spark.read.parquet(dir.toString + "/r*")) else None
  }
}
