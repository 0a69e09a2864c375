package graft

/** The bench regression gate's re-time adjudication (Bench.gateRegressions):
  * a first-pass flag is only CONFIRMED if the end-of-suite warm re-time also
  * exceeds the gate; cold-position noise (fast re-time) is recorded but
  * cleared. Pure-function spec with fabricated timings. */
class BenchGateSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val pins = Map("q_fast" -> 0.5, "q_slow" -> 0.5, "q_big" -> 3.0)

  test("cold-position noise clears on a fast re-time; real regressions confirm") {
    val results = Seq(
      "q_fast" -> 1.4, // 2.8x pin, >1s -> flagged; re-time fast -> cleared
      "q_slow" -> 1.6, // 3.2x pin, >1s -> flagged; re-time slow -> confirmed
      "q_big" -> 4.0)  // 1.3x pin -> never flagged
    val retimes = Map("q_fast" -> 0.4, "q_slow" -> 1.5)
    var retimed = List.empty[String]
    val (confirmed, report) = Bench.gateRegressions(results,
      pins.get, name => { retimed ::= name; retimes(name) })
    assert(confirmed == Seq("q_slow"))
    assert(retimed.toSet == Set("q_fast", "q_slow")) // only flagged queries re-run
    assert(report.size == 2)
    assert(report.exists(r => r.startsWith("q_fast:") && r.contains("retimed: 0.40s") && r.contains("cleared")))
    assert(report.exists(r => r.startsWith("q_slow:") && r.contains("retimed: 1.50s") && r.contains("confirmed")))
  }

  test("sub-second and unpinned queries never flag, never re-time") {
    val results = Seq(
      "q_fast" -> 0.9,   // 1.8x... under 2x AND under 1s -> no flag
      "q_unpinned" -> 99.0) // no pin -> no flag
    var retimed = 0
    val (confirmed, report) = Bench.gateRegressions(results,
      pins.get, _ => { retimed += 1; 0.0 })
    assert(confirmed.isEmpty && report.isEmpty && retimed == 0)
  }

  test("a re-time above 2x pin but under the 1s floor still clears") {
    val localPins = Map("q_tiny" -> 0.4)
    val (confirmed, report) = Bench.gateRegressions(
      Seq("q_tiny" -> 1.2), localPins.get, _ => 0.9)
    assert(confirmed.isEmpty)
    assert(report.head.contains("cleared"))
  }
}
