package graft.etl

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Retention marker + deleter (ref `locate/deletion.go:40-169`): two-phase
  * delete — write `_deletion-marker.json` into expired day partitions, then
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
        // underscore prefix: Spark's file index skips `_`-prefixed files
        // (like _SUCCESS), so a marked-but-not-yet-deleted partition stays
        // readable through the whole consistency window — the reference's
        // readers likewise skip marked blocks (locate/discover.go:552)
        Files.writeString(p.resolve("_deletion-marker.json"), s"""{"marked_at_ms":$nowMs}""")
      }
    }

  /** Delete partition directories whose OWN marker is older than
    * `consistencyDelayMs` (ref default 12h, `locate/deletion.go:32`).
    * Returns deleted dates.
    *
    * The aged-marker check is per-directory, never per-date: a partition
    * created after the mark pass (e.g. the streaming ingest writing fresh
    * chunks for a day whose flat layout was already marked) carries no
    * marker and survives until its own mark→delay→delete cycle — the same
    * guarantee the reference's per-shard markers give.
    *
    * The day's `meta/<date>.json` sidecar describes the RAW layout (sample
    * counts, shard list), so it is dropped only when a `samples` sink is
    * being retired and no raw partition for the date remains; downsample
    * layers are self-contained date-partitioned parquet discovered by
    * listing and carry no sidecar. */
  def deleteMarked(outDir: String, nowMs: Long,
                   consistencyDelayMs: Long = 12L * 3600 * 1000,
                   sinks: Seq[String] = rawSinks): Seq[String] = {
    val dayDirs = sinks.map(s => Paths.get(s"$outDir/$s")).filter(Files.isDirectory(_))
      .flatMap(subdirs).flatMap { d =>
        if (d.getFileName.toString.startsWith("stream=")) subdirs(d) else Seq(d)
      }
    val aged = dayDirs.flatMap { dir =>
      val name = dir.getFileName.toString
      if (!name.startsWith("date=")) None
      else {
        // accept the pre-rename spelling too: partitions marked by an older
        // build must still age out instead of leaking forever
        val marker = Seq("_deletion-marker.json", "deletion-marker.json")
          .map(dir.resolve).find(Files.exists(_))
          .getOrElse(dir.resolve("_deletion-marker.json"))
        if (!Files.exists(marker)) None
        else {
          val txt = Files.readString(marker)
          val marked = "\"marked_at_ms\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
          if (marked.exists(m => nowMs - m >= consistencyDelayMs))
            Some(dir -> name.stripPrefix("date="))
          else None
        }
      }
    }
    aged.foreach { case (dir, _) => deleteRecursively(dir) }
    val dates = aged.map(_._2).distinct.sorted
    if (sinks.contains("samples")) dates.foreach { d =>
      val anyRawLeft = partitionDirs(outDir, d, rawSinks).exists(Files.isDirectory(_))
      if (!anyRawLeft) metaFiles(outDir, d).filter(Files.exists(_)).foreach(deleteRecursively)
    }
    dates
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.isDirectory(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally walk.close()
    } else Files.delete(p)

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
