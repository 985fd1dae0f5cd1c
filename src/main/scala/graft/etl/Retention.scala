package graft.etl

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Retention marker + deleter (ref `locate/deletion.go:40-169`): two-phase
  * delete — write `deletion-marker.json` into expired day partitions, then
  * after a consistency delay physically drop the partition directories (the
  * Spark analog of `ALTER TABLE … DROP PARTITION`). Driver-side file ops;
  * at scale this is an object-store prefix delete, identical control flow.
  *
  * Handles both layouts: flat (`samples/date=D`) and stream-partitioned
  * (`samples/stream=S/date=D`, external-label converts) — the reference
  * likewise walks every stream's days (`locate/deletion.go:132-147`). */
object Retention {

  /** All partition directories holding `date` across both sinks, in flat
    * and per-stream layouts. */
  private def partitionDirs(outDir: String, date: String): Seq[Path] =
    Seq("samples", "series").flatMap { sink =>
      val root = Paths.get(s"$outDir/$sink")
      Paths.get(s"$outDir/$sink/date=$date") +:
        subdirs(root).filter(_.getFileName.toString.startsWith("stream="))
          .map(_.resolve(s"date=$date"))
    }

  /** Per-day meta sidecars across flat and per-stream catalogs. */
  private def metaFiles(outDir: String, date: String): Seq[Path] = {
    val metaRoot = Paths.get(s"$outDir/meta")
    Paths.get(s"$outDir/meta/$date.json") +:
      subdirs(metaRoot).map(_.resolve(s"$date.json"))
  }

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
    val dayDirs = subdirs(samplesRoot).flatMap { d =>
      if (d.getFileName.toString.startsWith("stream=")) subdirs(d) else Seq(d)
    }
    val dates = dayDirs.flatMap { dir =>
      val name = dir.getFileName.toString
      if (!name.startsWith("date=")) None
      else {
        val marker = dir.resolve("deletion-marker.json")
        if (!Files.exists(marker)) None
        else {
          val txt = Files.readString(marker)
          val marked = "\"marked_at_ms\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
          if (marked.exists(m => nowMs - m >= consistencyDelayMs))
            Some(name.stripPrefix("date="))
          else None
        }
      }
    }.distinct.sorted
    dates.foreach { d =>
      (partitionDirs(outDir, d) ++ metaFiles(outDir, d)).foreach { p =>
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

  private def subdirs(root: Path): Seq[Path] = {
    if (!Files.isDirectory(root)) return Seq.empty
    val s = Files.list(root)
    try {
      val it = s.iterator()
      var acc = List.empty[Path]
      while (it.hasNext) {
        val p = it.next()
        if (Files.isDirectory(p)) acc ::= p
      }
      acc.reverse
    } finally s.close()
  }
}
