package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.TsdbBlock
import graft.functions.PromXorChunk

/** Corruption fuzz over the hand-rolled binary parsers.
  *
  * The reference inherits malformed-input robustness from prometheus-tsdb
  * (`cmd/convert.go:472` goes through `tsdb.OpenBlock`); our index/chunk/
  * tombstone parsers and frame decoders are hand-rolled, so random bit
  * flips and truncations must always fail CLEANLY:
  *   - CRC-protected layers (index sections, segment chunks, tombstones):
  *     a controlled corruption error (`IllegalArgumentException` from a
  *     CRC/truncation/bound check) — or a byte-identical result when the
  *     mutation lands in bytes the read never touches (padding, other
  *     sections). A successful parse with DIFFERENT content is a silent
  *     mis-decode and fails the lane.
  *   - the raw frame decoders (below the CRC layer — parquet page checksums
  *     own integrity there): termination with bounded allocations. Flipped
  *     value bits legitimately decode to different doubles, but a corrupt
  *     length field must never become a multi-GB allocation
  *     (NegativeArraySize/OOM), an infinite loop, or a crash class.
  *
  * Fixed seed → deterministic: every mutation this lane ever passes on is
  * pinned forever.
  */
class CorruptionFuzzSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(0x20260816)

  private def fpts(pts: Seq[(Long, Double)]) =
    new GenericArrayData(pts.map { case (t, v) => InternalRow(t, v, null) }.toArray[Any])
  private def hpt(ts: Long, cnt: Double, sum: Double, sch: Int,
                  pos: Seq[(Int, Double)]): InternalRow =
    InternalRow(ts, cnt, InternalRow(cnt, sum, sch, 0.001953125, 1.0,
      new GenericArrayData(pos.map { case (i, c) => InternalRow(i, c) }.toArray[Any]),
      new GenericArrayData(Array.empty[Any]), null))

  private val jan1 = 1704067200000L

  private lazy val fixture: (Array[Byte], Array[Byte], Seq[TsdbBlock.SeriesEntry]) = {
    val root = Files.createTempDirectory("graft-corruptfuzz").toString
    val ulid = "01HVFUZZBLOCK0000000000000"
    val floats = (0 until 12).map { i =>
      Map("__name__" -> s"m$i", "job" -> s"job${i % 3}", "idx" -> i.toString) ->
        fpts((0 until 50).map(k => (jan1 + k * 15000L, math.sin(i + k.toDouble) * 100)))
    }
    val hists = Seq(
      Map("__name__" -> "lat", "job" -> "h0") -> new GenericArrayData(
        (0 until 20).map(k => hpt(jan1 + k * 15000L, 10.0 + k, 5.0 * k, 0,
          Seq(0 -> (3.0 + k), 2 -> 7.0)): Any).toArray),
      Map("__name__" -> "lat", "job" -> "h3") -> new GenericArrayData(
        (0 until 20).map(k => hpt(jan1 + k * 15000L, 4.0 + 2 * k, 2.5 * k, 3,
          Seq(1 -> (1.0 + k), 5 -> (3.0 + k))): Any).toArray))
    TsdbBlock.writeBlock(root, ulid, floats ++ hists, Map("cluster" -> "fuzz"))
    val idx = Files.readAllBytes(Paths.get(s"$root/$ulid/index"))
    val seg = Files.readAllBytes(Paths.get(s"$root/$ulid/chunks/000001"))
    val golden = TsdbBlock.readSeries(idx).toSeq
    assert(golden.size == 14 && golden.forall(_.chunks.nonEmpty))
    (idx, seg, golden)
  }

  // ---------------------------------------------------------- mutations
  private def flipBit(b: Array[Byte]): Array[Byte] = {
    val out = b.clone(); val i = rng.nextInt(out.length)
    out(i) = (out(i) ^ (1 << rng.nextInt(8))).toByte; out
  }
  private def truncate(b: Array[Byte]): Array[Byte] =
    java.util.Arrays.copyOfRange(b, 0, rng.nextInt(b.length))
  private def garble(b: Array[Byte]): Array[Byte] = {
    val out = b.clone(); val i = rng.nextInt(out.length)
    val n = math.min(out.length - i, 1 + rng.nextInt(16))
    val junk = new Array[Byte](n); rng.nextBytes(junk)
    System.arraycopy(junk, 0, out, i, n); out
  }
  /** 60% single-bit flips, 20% truncations, 20% short random splices. */
  private def mutate(b: Array[Byte]): Array[Byte] = rng.nextInt(10) match {
    case x if x < 6 => flipBit(b)
    case x if x < 8 => truncate(b)
    case _          => garble(b)
  }

  private def pathological(t: Throwable): Boolean = t match {
    case _: OutOfMemoryError | _: NegativeArraySizeException |
         _: StackOverflowError => true
    case _ => false
  }

  // ---------------------------------------------------------------- lanes
  test("index parse: 1500 mutations fail cleanly or return the exact golden result") {
    val (idx, _, golden) = fixture
    val goldenJobs = TsdbBlock.readLabelValues(idx, "job")
    val q = Map("job" -> Seq("job1"), "__name__" -> Seq("m1", "m4"))
    val goldenIds = TsdbBlock.readPostings(idx, q)
    var errs = 0; var identical = 0
    val kinds = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (i <- 1 to 1500) {
      val m = mutate(idx)
      try {
        val got = TsdbBlock.readSeries(m).toSeq // force the lazy walk
        val jobs = TsdbBlock.readLabelValues(m, "job")
        val ids = TsdbBlock.readPostings(m, q)
        assert(got == golden && jobs == goldenJobs && ids == goldenIds,
          s"mutation #$i: SILENT MIS-DECODE (parse succeeded, content differs)")
        identical += 1
      } catch {
        case t: Throwable =>
          assert(!pathological(t), s"mutation #$i: crash class ${t.getClass}")
          assert(t.isInstanceOf[IllegalArgumentException],
            s"mutation #$i: uncontrolled error ${t.getClass}: ${t.getMessage} @ " +
              t.getStackTrace.take(4).mkString(" <- "))
          kinds(Option(t.getMessage).getOrElse("?").take(30)) += 1
          errs += 1
      }
    }
    // some mutations land in bytes these reads never touch (other posting
    // lists, alignment padding) and MUST parse byte-identically; most bite
    assert(errs > 700, s"mutations barely bit ($errs/1500) — lane is too weak")
    info(s"index lane: $errs clean errors, $identical byte-identical passes; " +
      s"top: ${kinds.toSeq.sortBy(-_._2).take(5)}")
  }

  test("segment chunk reads: 600 mutations fail cleanly or return the exact frame") {
    val (_, seg, golden) = fixture
    def frames(bytes: Array[Byte]): Seq[Seq[Byte]] =
      golden.flatMap(_.chunks).map { r =>
        TsdbBlock.readChunkFrame(
          (p, dst, n) => System.arraycopy(bytes, p.toInt, dst, 0, n),
          bytes.length.toLong, r.offset, r.mint, r.maxt).toSeq
      }
    val goldenFrames = frames(seg)
    var errs = 0
    for (i <- 1 to 600) {
      val m = mutate(seg)
      try {
        assert(frames(m) == goldenFrames,
          s"mutation #$i: SILENT CHUNK MIS-READ")
      } catch {
        case t: Throwable =>
          assert(!pathological(t), s"mutation #$i: crash class ${t.getClass}")
          assert(t.isInstanceOf[IllegalArgumentException],
            s"mutation #$i: uncontrolled error ${t.getClass}: ${t.getMessage}")
          errs += 1
      }
    }
    assert(errs > 300, s"mutations barely bit ($errs/600)")
    info(s"chunk lane: $errs clean errors, ${600 - errs} identical")
  }

  test("tombstones parse: 400 mutations fail cleanly or return the exact map") {
    val root = Files.createTempDirectory("graft-tombfuzz").toString
    val ulid = "01HVFUZZTOMB00000000000000"
    TsdbBlock.writeTombstones(root, ulid,
      (0 until 30).map(i => (i.toLong * 16, jan1 + i * 1000L, jan1 + i * 2000L)))
    val bytes = Files.readAllBytes(Paths.get(s"$root/$ulid/tombstones"))
    val golden = TsdbBlock.readTombstones(bytes)
    var errs = 0
    for (i <- 1 to 400) {
      val m = mutate(bytes)
      // a truncation to ZERO bytes is the documented "absent/empty file
      // means no deletions" case, not corruption
      val expect = if (m.isEmpty) Map.empty else golden
      try assert(TsdbBlock.readTombstones(m) == expect,
        s"mutation #$i: SILENT TOMBSTONE MIS-READ")
      catch {
        case t: Throwable =>
          assert(!pathological(t), s"mutation #$i: crash class ${t.getClass}")
          assert(t.isInstanceOf[IllegalArgumentException],
            s"mutation #$i: uncontrolled error ${t.getClass}: ${t.getMessage}")
          errs += 1
      }
    }
    assert(errs > 200, s"mutations barely bit ($errs/400)")
  }

  test("stream.pb parse: 400 mutations fail cleanly or return the exact map") {
    val lbls = Map("cluster" -> "fuzz", "replica" -> "r-0", "env" -> "prod")
    val bytes = graft.etl.ReferenceFormat.streamProto(lbls)
    assert(graft.etl.ReferenceFormat.parseStreamProto(bytes) == lbls)
    var errs = 0; var benign = 0
    for (i <- 1 to 400) {
      val m = mutate(bytes)
      try {
        val got = graft.etl.ReferenceFormat.parseStreamProto(m)
        // a flipped bit INSIDE a value's utf8 payload parses to a different
        // string — unprotected by design (the layout has no checksum; the
        // object store's integrity layer owns it). What must never happen:
        // a crash class or an out-of-bounds access dressed as success.
        benign += 1
        assert(got.size <= lbls.size + 1, s"mutation #$i: phantom entries $got")
      } catch {
        case t: Throwable =>
          assert(!pathological(t), s"mutation #$i: crash class ${t.getClass}")
          assert(t.isInstanceOf[IllegalArgumentException],
            s"mutation #$i: uncontrolled error ${t.getClass}: ${t.getMessage}")
          errs += 1
      }
    }
    info(s"stream.pb lane: $errs clean errors, $benign tolerated parses")
  }

  test("raw frame decoders: 1500 mutations terminate with bounded allocations") {
    val (_, seg, golden) = fixture
    // a multi-frame cell exactly as the reference-layout parquet stores it:
    // xor + integer-histogram + float-histogram frames concatenated
    val cell = golden.flatMap(_.chunks).take(8).flatMap { r =>
      TsdbBlock.readChunkFrame(
        (p, dst, n) => System.arraycopy(seg, p.toInt, dst, 0, n),
        seg.length.toLong, r.offset, r.mint, r.maxt)
    }.toArray
    val goldenN = PromXorChunk.decodeFrames(cell).numElements()
    assert(goldenN > 0)
    var errs = 0; var decoded = 0
    for (i <- 1 to 1500) {
      val m = mutate(cell)
      try {
        // below the CRC layer flipped VALUE bits legitimately decode to
        // different samples — the contract here is termination + bounded
        // allocation, not equality
        PromXorChunk.decodeFrames(m)
        decoded += 1
      } catch {
        case t: Throwable =>
          assert(!pathological(t),
            s"mutation #$i: allocation bomb / crash class ${t.getClass}: ${t.getMessage}")
          errs += 1
      }
    }
    info(s"decoder lane: $decoded tolerated decodes, $errs clean errors")
  }
}
