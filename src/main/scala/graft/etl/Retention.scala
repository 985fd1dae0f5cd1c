package graft.etl

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Retention marker + deleter (ref `locate/deletion.go:40-169`): two-phase
  * delete — write `deletion-marker.json` into expired day partitions, then
  * after a consistency delay physically drop the partition directories (the
  * Spark analog of `ALTER TABLE … DROP PARTITION`). Driver-side file ops;
  * at scale this is an object-store prefix delete, identical control flow. */
object Retention {

  private def partitionDirs(outDir: String, date: String): Seq[Path] =
    Seq(Paths.get(s"$outDir/samples/date=$date"), Paths.get(s"$outDir/series/date=$date"))

  def markExpired(outDir: String, dates: Seq[String], nowMs: Long): Unit =
    dates.foreach { d =>
      partitionDirs(outDir, d).filter(Files.isDirectory(_)).foreach { p =>
        Files.writeString(p.resolve("deletion-marker.json"), s"""{"marked_at_ms":$nowMs}""")
      }
    }

  /** Delete partitions whose marker is older than `consistencyDelayMs`
    * (ref default 12h, `locate/deletion.go:32`). Returns deleted dates. */
  def deleteMarked(outDir: String, nowMs: Long,
                   consistencyDelayMs: Long = 12L * 3600 * 1000): Seq[String] = {
    val samplesRoot = Paths.get(s"$outDir/samples")
    if (!Files.isDirectory(samplesRoot)) return Seq.empty
    val stream = Files.list(samplesRoot)
    val dates = try {
      val it = stream.iterator()
      var acc = List.empty[String]
      while (it.hasNext) {
        val dir = it.next()
        val name = dir.getFileName.toString
        if (name.startsWith("date=")) {
          val marker = dir.resolve("deletion-marker.json")
          if (Files.exists(marker)) {
            val txt = Files.readString(marker)
            val marked = "\"marked_at_ms\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
            if (marked.exists(m => nowMs - m >= consistencyDelayMs))
              acc ::= name.stripPrefix("date=")
          }
        }
      }
      acc.sorted
    } finally stream.close()
    dates.foreach { d =>
      (partitionDirs(outDir, d) :+ Paths.get(s"$outDir/meta/$d.json")).foreach { p =>
        if (Files.exists(p)) {
          if (Files.isDirectory(p)) {
            val walk = Files.walk(p)
            try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
            finally walk.close()
          } else Files.delete(p)
        }
      }
    }
    dates
  }
}
