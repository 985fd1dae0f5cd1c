package graft.api

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{DoubleAdder, LongAdder}

/** Self-instrumentation of the HTTP API, exposed at `/metrics` in Prometheus
  * text exposition format — the analog of the reference's
  * `requests_total` / `requests_seconds` handler instrumentation
  * (ref `api/http/metrics.go:14-23`, `withInstrumentation`
  * `api/http/query.go:175-179`), with the same label set
  * `{code, method, path}` and the same 20 exponential latency buckets
  * spanning 0.1s → 30s (`prometheus.ExponentialBucketsRange(0.1, 30, 20)`).
  */
final class ApiMetrics {

  /** min · (max/min)^(i/(n−1)) — ExponentialBucketsRange(0.1, 30, 20). */
  private[api] val buckets: Array[Double] =
    (0 until 20).map(i => 0.1 * math.pow(300.0, i / 19.0)).toArray

  private final class Series {
    val count = new LongAdder
    val sum = new DoubleAdder
    val bucketCounts: Array[LongAdder] = Array.fill(buckets.length)(new LongAdder)
  }

  private val series = new ConcurrentHashMap[(Int, String, String), Series]()

  def record(code: Int, method: String, path: String, seconds: Double): Unit = {
    val s = series.computeIfAbsent((code, method, path), _ => new Series)
    s.count.increment()
    s.sum.add(seconds)
    var i = 0
    while (i < buckets.length) {
      if (seconds <= buckets(i)) s.bucketCounts(i).increment()
      i += 1
    }
  }

  /** Prometheus text exposition (0.0.4). */
  def render(): String = {
    val sb = new StringBuilder
    def lbl(code: Int, method: String, path: String, extra: String = "") =
      s"""{code="$code",method="$method",path="$path"$extra}"""
    def fmtLe(b: Double): String = // trim trailing zeros, keep plain decimal
      java.math.BigDecimal.valueOf(b).round(new java.math.MathContext(6))
        .stripTrailingZeros.toPlainString
    val keys = series.keySet().toArray(Array.empty[(Int, String, String)])
      .sortBy { case (c, m, p) => (p, m, c) }
    sb.append("# HELP requests_total The total amount of http requests we answered\n")
    sb.append("# TYPE requests_total counter\n")
    for ((code, method, path) <- keys)
      sb.append(s"requests_total${lbl(code, method, path)} ${series.get((code, method, path)).count.sum()}\n")
    sb.append("# HELP requests_seconds The histogram of time spent answering http requests\n")
    sb.append("# TYPE requests_seconds histogram\n")
    for (k @ (code, method, path) <- keys) {
      val s = series.get(k)
      for (i <- buckets.indices)
        sb.append(s"requests_seconds_bucket${lbl(code, method, path, s""",le="${fmtLe(buckets(i))}"""")} ${s.bucketCounts(i).sum()}\n")
      sb.append(s"requests_seconds_bucket${lbl(code, method, path, """,le="+Inf"""")} ${s.count.sum()}\n")
      sb.append(s"requests_seconds_sum${lbl(code, method, path)} ${s.sum.sum()}\n")
      sb.append(s"requests_seconds_count${lbl(code, method, path)} ${s.count.sum()}\n")
    }
    sb.toString
  }
}
