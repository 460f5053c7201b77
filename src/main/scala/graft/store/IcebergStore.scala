package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-table-format [[TableStore]] (SURVEY.md §7's named store): each
  * table keeps the Iceberg metadata shape —
  *
  * {{{
  * <root>/<table>/
  *   metadata/
  *     v1.metadata.json      # full snapshot log + current-snapshot-id
  *     v2.metadata.json      # one new metadata file per commit (immutable)
  *     version-hint.text     # latest metadata version (catalog discovery)
  *   data/
  *     r<round>[-tag]/       # immutable parquet snapshot data
  *     r<round>.bin          # blob snapshots (url-seen bloom)
  * }}}
  *
  * Commit protocol = Iceberg's optimistic metadata swap on a Hadoop
  * catalog: write the data files, write v(N+1).metadata.json carrying the
  * FULL snapshot log (every prior snapshot stays addressable), then
  * atomically move version-hint.text — a reader always sees a complete
  * metadata version, and time travel is "read any snapshot-id from the
  * log". resetTo is Iceberg's rollback: a NEW metadata version whose
  * current-snapshot-id points at the old snapshot (history is never
  * erased, unlike the manifest store which just swaps its one pointer).
  *
  * The environment ships no Iceberg runtime jars (offline resolver, no
  * extra libraryDependencies), so this is the table format's layout and
  * commit protocol hand-rolled over the same parquet files — honest
  * metadata compatibility in shape, not a catalog client. The engine
  * gains: a durable snapshot LOG (the manifest store keeps only the
  * current pointer + data dirs), rollback-as-commit, and
  * version-hint-style discovery.
  */
class IcebergStore(val root: String) extends TableStore {

  private final case class Entry(snapshotId: Long, round: Int, tag: String,
                                 timestampMs: Long, path: String, kind: String)

  private def tableDir(table: String): Path = Paths.get(root, table)
  private def metaDir(table: String): Path = tableDir(table).resolve("metadata")
  private def dataDir(table: String): Path = tableDir(table).resolve("data")
  private def hintPath(table: String): Path = metaDir(table).resolve("version-hint.text")

  // ---- metadata read ----

  private def currentVersion(table: String): Int = {
    val p = hintPath(table)
    if (!Files.exists(p)) 0 else Files.readString(p).trim.toInt
  }

  private val EntryRe =
    ("""\{"snapshot-id":(\d+),"round":(\d+),"tag":"([^"]*)","timestamp-ms":(\d+),""" +
     """"manifest-list":"([^"]*)","kind":"(data|blob)"\}""").r

  private def readLog(table: String): (Seq[Entry], Long) = {
    val v = currentVersion(table)
    if (v == 0) return (Seq.empty, -1L)
    val txt = Files.readString(metaDir(table).resolve(s"v$v.metadata.json"))
    val entries = EntryRe.findAllMatchIn(txt).map(m =>
      Entry(m.group(1).toLong, m.group(2).toInt, m.group(3), m.group(4).toLong,
        m.group(5), m.group(6))).toSeq
    val cur = """"current-snapshot-id":(-?\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toLong).getOrElse(-1L)
    (entries, cur)
  }

  private def entryJson(e: Entry): String =
    s"""{"snapshot-id":${e.snapshotId},"round":${e.round},"tag":"${e.tag}",""" +
    s""""timestamp-ms":${e.timestampMs},"manifest-list":"${e.path}","kind":"${e.kind}"}"""

  // ---- metadata write (Iceberg commit: new immutable version + hint swap) ----

  private def writeVersion(table: String, entries: Seq[Entry], currentId: Long): Unit = {
    Files.createDirectories(metaDir(table))
    val v = currentVersion(table) + 1
    val json =
      s"""{"format-version":2,"table":"$table","location":"${tableDir(table)}",
         |"current-snapshot-id":$currentId,
         |"snapshots":[${entries.map(entryJson).mkString(",\n")}]}""".stripMargin
    val target = metaDir(table).resolve(s"v$v.metadata.json")
    val tmp = metaDir(table).resolve(s"v$v.metadata.json.tmp")
    Files.writeString(tmp, json, StandardCharsets.UTF_8)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    val hintTmp = metaDir(table).resolve("version-hint.text.tmp")
    Files.writeString(hintTmp, v.toString, StandardCharsets.UTF_8)
    Files.move(hintTmp, hintPath(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def appendSnapshot(table: String, round: Int, tag: String, path: String,
                             kind: String, allowRewind: Boolean): Snapshot = {
    val (entries, curId) = readLog(table)
    entries.find(_.snapshotId == curId).foreach { c =>
      require(round >= c.round || allowRewind,
        s"commit($table, round=$round) would rewind the snapshot log (current round ${c.round}); " +
        "use resetTo + allowRewind for deliberate history replay")
    }
    val id = entries.map(_.snapshotId).maxOption.getOrElse(0L) + 1
    val e = Entry(id, round, tag, System.currentTimeMillis(), path, kind)
    writeVersion(table, entries :+ e, id)
    Snapshot(table, round, path, e.timestampMs)
  }

  // ---- TableStore surface ----

  override def commit(table: String, df: DataFrame, round: Int, tag: String = "",
                      allowRewind: Boolean = false): Snapshot = {
    // guard BEFORE the data write: a rejected commit must not clobber the
    // immutable snapshot dir it would have reused
    current(table).foreach(c => require(round >= c.round || allowRewind,
      s"commit($table, round=$round) would rewind the snapshot log (current round ${c.round}); " +
      "use resetTo + allowRewind for deliberate history replay"))
    val dirName = if (tag.isEmpty) s"r$round" else s"r$round-$tag"
    val dataPath = dataDir(table).resolve(dirName).toString
    df.write.mode("overwrite").parquet(dataPath)
    appendSnapshot(table, round, tag, dataPath, "data", allowRewind)
  }

  override def freshTag(table: String, round: Int, prefix: String): String = {
    var i = 1
    while (Files.exists(dataDir(table).resolve(s"r$round-$prefix$i"))) i += 1
    s"$prefix$i"
  }

  override def current(table: String): Option[Snapshot] = {
    val (entries, curId) = readLog(table)
    entries.find(_.snapshotId == curId)
      .map(e => Snapshot(table, e.round, e.path, e.timestampMs))
  }

  override def loadRound(spark: SparkSession, table: String, round: Int): Option[DataFrame] = {
    val p = dataDir(table).resolve(s"r$round")
    if (Files.exists(p)) Some(spark.read.parquet(p.toString)) else None
  }

  /** Iceberg rollback: a NEW metadata version whose current-snapshot-id is
    * the latest untagged snapshot of `round` — the log keeps everything. */
  override def resetTo(table: String, round: Int): Unit = {
    val (entries, _) = readLog(table)
    val target = entries.filter(e => e.round == round && e.tag.isEmpty && e.kind == "data")
      .maxByOption(_.snapshotId)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot $table/r$round in the log"))
    writeVersion(table, entries, target.snapshotId)
  }

  override def commitBlob(table: String, bytes: Array[Byte], round: Int,
                          allowRewind: Boolean = false): Snapshot = {
    current(table).foreach(c => require(round >= c.round || allowRewind,
      s"commitBlob($table, round=$round) would rewind (current ${c.round})"))
    Files.createDirectories(dataDir(table))
    val dataPath = dataDir(table).resolve(s"r$round.bin")
    val tmpData = dataDir(table).resolve(s"r$round.bin.tmp")
    Files.write(tmpData, bytes)
    Files.move(tmpData, dataPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    appendSnapshot(table, round, "", dataPath.toString, "blob", allowRewind)
  }

  override def appendMetrics(df: DataFrame, round: Int, stage: String): Unit =
    df.write.mode("overwrite")
      .parquet(dataDir("round_metrics").resolve(s"r$round-$stage").toString)

  override def metrics(spark: SparkSession): Option[DataFrame] = {
    val dir = dataDir("round_metrics")
    if (Files.exists(dir)) Some(spark.read.parquet(dir.toString + "/r*")) else None
  }

  /** The full snapshot log of a table (Iceberg's `snapshots` metadata
    * table): snapshot_id, round, tag, committed_at_ms, path, kind. */
  def snapshotLog(table: String): Seq[(Long, Int, String, Long, String, String)] =
    readLog(table)._1.map(e => (e.snapshotId, e.round, e.tag, e.timestampMs, e.path, e.kind))
}
