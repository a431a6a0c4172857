package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's stall-immunity retry rule and the
  * prior-run parsing it depends on (r21 verdict #2: a host stall
  * landing on a sub-2 s query produced a phantom 3× regression that
  * the absolute 2 s bar could not catch). Pure-policy spec — no Spark. */
class BenchPolicySpec extends AnyFunSuite {

  test("planted stall: 3x the prior time triggers a retry below the 2 s bar") {
    // q_cdc_diff r21 shape: quiet time 0.656 s, stall read 2.111 s —
    // caught by the absolute bar. The same stall scaled onto a faster
    // query (prior 0.30 s, stall 0.95 s) slipped under 2 s before.
    assert(Bench.shouldRetry(0.95, Some(0.30)))
    // and a 3x-prior stall above the bar still retries
    assert(Bench.shouldRetry(2.11, Some(0.656)))
  }

  test("ordinary band does not retry") {
    assert(!Bench.shouldRetry(0.50, Some(0.30))) // < 3x prior, < 2 s
    assert(!Bench.shouldRetry(0.89, Some(0.30))) // just under 3x
    assert(!Bench.shouldRetry(1.50, None))       // no prior, under bar
    assert(!Bench.shouldRetry(0.10, Some(0.0)))  // degenerate prior ignored
  }

  test("absolute outlier bar is unchanged (r8 semantics)") {
    assert(Bench.shouldRetry(2.01, None))
    assert(!Bench.shouldRetry(1.99, None))
  }

  test("prior-run parsing reads only the queries map") {
    val json = """{"metric":"total","unit":"sec","harness_version":2,
      |"errors":["q_bad"],"retried":{"q_x":[2.5,0.7]},"retry_failed":[],
      |"anchor_ratio":1.700,"control_ratio":0.990,"control_n":198,
      |"queries":{"q_a":0.123,"q_b":2.5},"value":2.623}""".stripMargin
    val m = Bench.priorTimes(json.replace("\n", ""))
    assert(m == Map("q_a" -> 0.123, "q_b" -> 2.5))
  }

  test("missing or malformed prior yields empty, not a crash") {
    assert(Bench.priorTimes("").isEmpty)
    assert(Bench.priorTimes("{\"value\":1.0}").isEmpty)
  }
}
