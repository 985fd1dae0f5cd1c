package graft.sources

/** Adaptive look-ahead read buffer for forward scans over segment files —
  * the I/O shape a chunk fetch wants on an object store, where bandwidth is
  * the cost and a ranged GET's latency is flat across these sizes.
  *
  * ADAPTIVE refill: dense scans (full migration — every chunk in offset
  * order) double the window from 64 KB up to `bufBytes`, so each segment
  * byte is fetched in large sequential ranges; a SEEK far past the window
  * (selective load — matched chunks scattered through the segment) resets
  * it to 64 KB, so a 1-series read fetches ~chunk-sized ranges instead of
  * `bufBytes` per matched chunk.
  *
  * Sequentiality: on a dense scan the read that exhausts the window almost
  * always STRADDLES its end (starts inside, extends past) rather than
  * beginning exactly at it, so a straddling read — or one starting within
  * 64 KB past the end — counts as sequential and grows the window. Only a
  * backward seek or a far-forward jump resets. A straddling refill restarts
  * at `pos`, re-reading at most the straddled tail of the previous window
  * (bounded by one chunk, ≪ 1% of a grown window) — the price of serving
  * every read from one contiguous buffer.
  *
  * Not thread-safe; one instance per sequential scanner (a Spark task). */
private[graft] final class LookAheadBuffer(bufBytes: Int) {
  import LookAheadBuffer.MinRefill
  private val buf = new Array[Byte](bufBytes)
  private var bufStart = 0L
  private var bufLen = 0
  private var refill = MinRefill
  // Sequentiality baseline: [winStart, winEnd) of the LAST fetched range,
  // whether buffered or an oversized bypass — a bypass must advance the
  // baseline too, or a dense scan interleaving chunks larger than the
  // buffer keeps being judged against the stale pre-bypass window and
  // resets to 64 KB refills between every big chunk. winEnd < 0 = no
  // history yet.
  private var winStart = 0L
  private var winEnd = -1L

  /** Ranged reads issued against the underlying stream (test-observable:
    * a dense scan of an L-byte file must approach L/bufBytes, not
    * L/MinRefill — the window-growth property). */
  private[graft] var rangedReads = 0L
  /** Current refill window in bytes (test-observable). */
  private[graft] def window: Int = refill

  /** Forget the buffered window (switching to a new file/stream). */
  def reset(): Unit = {
    bufStart = 0L; bufLen = 0; refill = MinRefill
    winStart = 0L; winEnd = -1L
  }

  /** Copy `n` bytes at `pos` into `dst(0 until n)`, refilling through `raw`
    * (which must read exactly its `n` bytes at `pos` into `arr(0 until n)`)
    * as needed. `fileLen` bounds reads: truncation (or a corrupt chunk
    * length varint) must fail as a truncation error, not as stale buffer
    * bytes masquerading as a chunk and surfacing downstream as a
    * misleading CRC mismatch. */
  def readAt(raw: (Long, Array[Byte], Int) => Unit, fileLen: Long,
             pos: Long, dst: Array[Byte], n: Int): Unit = {
    require(pos + n <= fileLen,
      s"read past EOF of segment ($pos+$n > $fileLen)")
    if (pos < bufStart || pos + n > bufStart + bufLen) {
      val sequential = winEnd >= 0 && pos >= winStart &&
        pos - winEnd < MinRefill
      if (n > buf.length) { // oversized read bypasses the buffer...
        raw(pos, dst, n)
        rangedReads += 1
        // ...but still advances the sequentiality baseline (and keeps a
        // dense scan's grown window): the bytes just read ARE the last
        // fetched range, the buffer simply never held them. The buffered
        // window stays valid for backward re-reads (file is immutable).
        if (sequential) refill = math.min(refill * 2, buf.length)
        winStart = pos
        winEnd = pos + n
        return
      }
      refill =
        if (sequential) math.min(refill * 2, buf.length)
        else MinRefill
      bufStart = pos
      bufLen = math.min(math.max(refill, n).toLong, fileLen - pos).toInt
      raw(pos, buf, bufLen)
      rangedReads += 1
      winStart = bufStart
      winEnd = bufStart + bufLen
    }
    System.arraycopy(buf, (pos - bufStart).toInt, dst, 0, n)
  }
}

private[graft] object LookAheadBuffer {
  /** Floor window: small enough that a scattered 1-series load fetches
    * ~chunk-sized ranges, large enough that doubling reaches multi-MB
    * windows within a handful of refills. */
  val MinRefill: Int = 64 << 10
}
