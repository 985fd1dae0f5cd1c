package graft.etl

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Retention marker + deleter (ref `locate/deletion.go:40-169`): two-phase
  * delete — write `deletion-marker.json` into expired day partitions, then
  * after a consistency delay physically drop the partition directories (the
  * Spark analog of `ALTER TABLE … DROP PARTITION`). Driver-side file ops;
  * at scale this is an object-store prefix delete, identical control flow.
  *
  * Handles both layouts: flat (`<sink>/date=D`) and stream-partitioned
  * (`<sink>/stream=S/date=D`, external-label converts) — the reference
  * likewise walks every stream's days (`locate/deletion.go:132-147`).
  *
  * Sinks are parameterized so each resolution can carry its OWN retention
  * (Thanos `--retention.resolution-raw/5m/1h`): raw sinks
  * (`samples`/`series`/`chunks`) typically expire first while a coarse
  * `downsample-<res>` layer outlives them for long-range queries —
  * [[resolutionSinks]] names a layer's sink directory. */
object Retention {

  /** The raw-resolution sinks (flat layout, series catalog, chunk files). */
  val rawSinks: Seq[String] = Seq("samples", "series", "chunks")

  /** Sink directory of a downsampled layer, as written by
    * [[Downsample.refreshDates]] / the streaming ingest. */
  def resolutionSinks(resMs: Long): Seq[String] = Seq(s"downsample-$resMs")

  /** All partition directories holding `date` across the given sinks, in
    * flat and per-stream layouts. */
  private def partitionDirs(outDir: String, date: String,
                            sinks: Seq[String]): Seq[Path] =
    sinks.flatMap { sink =>
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

  def markExpired(outDir: String, dates: Seq[String], nowMs: Long,
                  sinks: Seq[String] = rawSinks): Unit =
    dates.foreach { d =>
      partitionDirs(outDir, d, sinks).filter(Files.isDirectory(_)).foreach { p =>
        Files.writeString(p.resolve("deletion-marker.json"), s"""{"marked_at_ms":$nowMs}""")
      }
    }

  /** Delete partitions whose marker is older than `consistencyDelayMs`
    * (ref default 12h, `locate/deletion.go:32`). Returns deleted dates.
    * Meta sidecars are dropped only with the raw sinks — a surviving
    * downsampled layer still needs the day's catalog entry. */
  def deleteMarked(outDir: String, nowMs: Long,
                   consistencyDelayMs: Long = 12L * 3600 * 1000,
                   sinks: Seq[String] = rawSinks): Seq[String] = {
    val dayDirs = sinks.map(s => Paths.get(s"$outDir/$s")).filter(Files.isDirectory(_))
      .flatMap(subdirs).flatMap { d =>
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
    val withMeta = sinks == rawSinks
    dates.foreach { d =>
      (partitionDirs(outDir, d, sinks) ++
        (if (withMeta) metaFiles(outDir, d) else Nil)).foreach { p =>
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
