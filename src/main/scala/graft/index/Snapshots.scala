package graft.index

/** Iceberg-style snapshot log for an index directory.
  *
  * Every committed state of the index (base build, each streamed
  * micro-batch, merge/purge rewrites) appends one immutable
  * `snapshots/v%08d.json` naming the exact set of `batchNs` data partitions
  * the snapshot contains — the manifest-list analog of an Iceberg snapshot
  * (SURVEY.md §1.4; the reference's `SegmentInfos` generation files,
  * `lucene/core/src/java/org/apache/lucene/index/SegmentInfos.java:60`).
  *
  * This is what makes appends ATOMIC for readers: `appendBatch` first lands
  * its rows under a fresh `batchNs=<ns>` partition (invisible — no snapshot
  * names it), stats are refreshed, and only then does the commit file appear.
  * A reader opened against snapshot v sees exactly v's namespaces forever
  * (snapshot isolation), and `InvertedIndex.open(spark, dir, asOf = Some(v))`
  * time-travels to any retained version.
  *
  * Commit files are written via temp file + atomic rename; versions are
  * monotonically increasing. The format is a single flat JSON object —
  * parsed with string ops, not a JSON library (zero added dependencies).
  */
object Snapshots {

  final case class Snapshot(version: Int, operation: String, namespaces: Seq[Long])

  private def snapDir(dir: String) = java.nio.file.Paths.get(dir, "snapshots")

  private def versionOf(fileName: String): Int =
    fileName.stripPrefix("v").stripSuffix(".json").toInt

  /** All committed snapshots, ascending by version. */
  def list(dir: String): Seq[Snapshot] = {
    val d = snapDir(dir)
    if (!java.nio.file.Files.isDirectory(d)) return Nil
    val s = java.nio.file.Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => read(dir, versionOf(n)))
        .toSeq.sortBy(_.version)
    } finally s.close()
  }

  def latest(dir: String): Option[Snapshot] = list(dir).lastOption

  def read(dir: String, version: Int): Snapshot = {
    val text = java.nio.file.Files.readString(snapDir(dir).resolve(f"v$version%08d.json"))
    def field(name: String): String = {
      val m = ("\"" + name + "\"\\s*:\\s*(\"[^\"]*\"|\\[[^\\]]*\\]|[0-9]+)").r
      m.findFirstMatchIn(text)
        .getOrElse(throw new IllegalStateException(s"snapshot v$version: missing $name"))
        .group(1)
    }
    val op = field("operation").stripPrefix("\"").stripSuffix("\"")
    val ns = field("namespaces").stripPrefix("[").stripSuffix("]").trim match {
      case "" => Nil
      case s => s.split(",").map(_.trim.toLong).toSeq
    }
    Snapshot(field("version").toInt, op, ns)
  }

  /** Append a snapshot naming the full namespace set of the new state.
    * Returns the committed snapshot. */
  def commit(dir: String, operation: String, namespaces: Seq[Long]): Snapshot = {
    val d = snapDir(dir)
    java.nio.file.Files.createDirectories(d)
    val version = latest(dir).map(_.version + 1).getOrElse(1)
    val snap = Snapshot(version, operation, namespaces.distinct.sorted)
    val json =
      s"""{"version":${snap.version},"operation":"${snap.operation}",""" +
        s""""namespaces":[${snap.namespaces.mkString(",")}]}"""
    val tmp = java.nio.file.Files.createTempFile(d, ".tmp-snap", ".json")
    java.nio.file.Files.writeString(tmp, json)
    java.nio.file.Files.move(tmp, d.resolve(f"v$version%08d.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    snap
  }

  /** Drop any snapshot log at `dir` (fresh overwrite builds). */
  private[index] def clear(dir: String): Unit = {
    val d = snapDir(dir)
    if (java.nio.file.Files.isDirectory(d)) {
      val s = java.nio.file.Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.foreach(p => java.nio.file.Files.deleteIfExists(p))
      } finally s.close()
      java.nio.file.Files.deleteIfExists(d)
    }
  }
}
