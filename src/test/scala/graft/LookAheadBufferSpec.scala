package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LookAheadBuffer

/** The adaptive look-ahead buffer behind the segment-chunk scan
  * ([[graft.sources.TsdbBlockReader]]): window growth on dense scans,
  * reset on seeks, byte-exactness under arbitrary read patterns. */
class LookAheadBufferSpec extends AnyFunSuite {

  private def fixture(len: Int): (Array[Byte], (Long, Array[Byte], Int) => Unit) = {
    val data = Array.tabulate[Byte](len)(i => (i * 31 + 7).toByte)
    (data, (pos, arr, n) => System.arraycopy(data, pos.toInt, arr, 0, n))
  }

  private def expect(data: Array[Byte], pos: Int, n: Int, dst: Array[Byte]): Unit =
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(dst, 0, n),
      java.util.Arrays.copyOfRange(data, pos, pos + n)),
      s"bytes at $pos+$n differ from the backing file")

  test("dense forward scan: straddling reads count as sequential, window doubles to cap") {
    // A dense scan's refill trigger almost always STRADDLES the window end
    // (starts inside, extends past) — it must grow the window, not reset it
    // to 64 KB forever. 4 MB file, 1 MB cap: geometric growth means ~8
    // underlying ranged reads; a dead growth path would issue ~64.
    val L = 4 << 20
    val (data, raw) = fixture(L)
    val look = new LookAheadBuffer(1 << 20)
    val dst = new Array[Byte](300)
    var pos = 0
    while (pos + 300 <= L) {
      look.readAt(raw, L, pos, dst, 300)
      if (pos % 65536 < 300) expect(data, pos, 300, dst)
      pos += 300 // contiguous chunks: every refill trigger is a straddle
    }
    assert(look.window == 1 << 20, "window must grow to the cap on a dense scan")
    assert(look.rangedReads <= 10,
      s"dense 4 MB scan should refill ~8 times (geometric growth), " +
        s"got ${look.rangedReads}")
  }

  test("far-forward and backward seeks reset the window to the 64 KB floor") {
    val L = 8 << 20
    val (data, raw) = fixture(L)
    val look = new LookAheadBuffer(1 << 20)
    val dst = new Array[Byte](100)
    // scattered selective load: 1 MB jumps — every read is a fresh window
    for (i <- 0 until 8) {
      look.readAt(raw, L, i.toLong << 20, dst, 100)
      expect(data, i << 20, 100, dst)
    }
    assert(look.window == LookAheadBuffer.MinRefill,
      "scattered seeks must keep the window at the floor")
    assert(look.rangedReads == 8, "one ranged read per scattered chunk")
    // grow it, then a BACKWARD seek resets
    val dst3 = new Array[Byte](300)
    var pos = 0
    while (pos + 300 <= (1 << 20)) { look.readAt(raw, L, pos, dst3, 300); pos += 300 }
    assert(look.window > LookAheadBuffer.MinRefill)
    look.readAt(raw, L, 0, dst, 100)
    assert(look.window == LookAheadBuffer.MinRefill,
      "a backward seek must reset the window")
  }

  test("oversized reads bypass the buffer; EOF overruns fail loudly; reset forgets") {
    val L = 256 << 10
    val (data, raw) = fixture(L)
    val look = new LookAheadBuffer(64 << 10)
    val big = new Array[Byte](100 << 10) // > 64 KB buffer
    look.readAt(raw, L, 8, big, big.length)
    expect(data, 8, big.length, big)
    val ex = intercept[IllegalArgumentException] {
      look.readAt(raw, L, L - 10, new Array[Byte](11), 11)
    }
    assert(ex.getMessage.contains("read past EOF"))
    look.reset()
    assert(look.window == LookAheadBuffer.MinRefill)
  }

  test("oversized bypass reads advance the sequentiality baseline") {
    val L = 8 << 20
    val (data, raw) = fixture(L)
    val look = new LookAheadBuffer(1 << 20)
    // dense forward scan alternating small chunks with chunks LARGER than
    // the buffer: pre-r19 a bypass left the stale pre-bypass window as the
    // baseline, so every following small read was judged non-sequential
    // and the refill window never grew past the 64 KB floor (perf-only:
    // bytes stayed exact, ranged-GET count exploded)
    var pos = 0L
    val small = new Array[Byte](300)
    val big = new Array[Byte]((1 << 20) + 4096) // > bufBytes → bypass
    while (pos + 300 + big.length <= L) {
      look.readAt(raw, L, pos, small, 300)
      expect(data, pos.toInt, 300, small)
      pos += 300
      look.readAt(raw, L, pos, big, big.length)
      expect(data, pos.toInt, big.length, big)
      pos += big.length
    }
    assert(look.window == 1 << 20,
      s"a bypass-interleaved dense scan must keep the grown window, " +
        s"got ${look.window}")
  }

  test("fuzz: arbitrary read patterns are byte-exact against the backing file") {
    val L = 1 << 20
    val (data, raw) = fixture(L)
    val look = new LookAheadBuffer(128 << 10)
    val rnd = new scala.util.Random(18)
    for (_ <- 1 to 2000) {
      val n = 1 + rnd.nextInt(2000)
      val pos = rnd.nextInt(L - n)
      val dst = new Array[Byte](n)
      look.readAt(raw, L, pos, dst, n)
      expect(data, pos, n, dst)
    }
  }
}
