package graft

import graft.limits.{QueryGate, QuotaExceededException, Quotas}
import graft.sources.Tables

class QuotasSpec extends SparkSpec {

  test("row quota trips on oversized selects, passes small ones") {
    val ev = Tables(spark, sf()).events
    assertThrows[QuotaExceededException](Quotas(maxRows = Some(10)).guard(ev))
    assert(Quotas(maxRows = Some(10000)).guard(ev).count() == ev.count())
    assert(Quotas().guard(ev).count() == ev.count()) // unlimited default
  }

  test("byte quota trips on the planned scan size, passes generous ceilings") {
    val ev = Tables(spark, sf()).events
    assertThrows[QuotaExceededException](Quotas(maxBytes = Some(16L)).guard(ev))
    assert(Quotas(maxBytes = Some(1L << 40)).guard(ev).count() == ev.count())
    // column pruning shrinks the charged estimate: a one-column projection
    // must charge fewer bytes than the full-width scan
    val full = ev.queryExecution.optimizedPlan.stats.sizeInBytes
    val slim = ev.select(ev("event_id")).queryExecution.optimizedPlan.stats.sizeInBytes
    assert(slim < full)
  }

  test("mid-scan byte quota charges actual bytes read during the run") {
    val ev = Tables(spark, sf()).events
    // pre-flight passes (generous planned-size ceiling), but the bytes the
    // tasks actually read trip the mid-scan charge — the reference's
    // charge-during-materialization semantics (internal/limits/limit.go:66-94)
    val q = Quotas(maxBytes = Some(1L << 40), maxBytesMidScan = Some(16L))
    q.guard(ev) // pre-flight alone is happy
    val ex = intercept[QuotaExceededException](q.collect(ev))
    assert(ex.getMessage.contains("mid-scan quota"))
    // generous mid-scan ceiling materializes normally
    val ok = Quotas(maxBytesMidScan = Some(1L << 40)).collect(ev)
    assert(ok.length == ev.count())
    // and the charge resets per call: a second guarded collect also passes
    assert(Quotas(maxBytesMidScan = Some(1L << 40)).collect(ev).length == ok.length)
  }

  test("query gate bounds concurrency and times out when saturated") {
    val gate = new QueryGate(maxConcurrent = 1)
    val r = gate.run()(42)
    assert(r == 42 && gate.available == 1)
    gate.run() {
      assertThrows[QuotaExceededException](gate.run(timeoutMs = 50)(0))
    }
    assert(gate.available == 1) // released after body
  }
}
