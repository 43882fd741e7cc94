package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench sweep's second-chance eligibility predicate. Round 10's
  * `med > 2.0` guard silently excluded a majority-capped query — whose
  * median is the NEGATIVE TimedOut sentinel — from the re-measure pass
  * built to rescue exactly that case, committing d25 at the 60 s cap
  * against a ~3 s clean median. A TimedOut median is the strongest outlier
  * signal there is and must always be a suspect.
  */
class BenchSuspectSpec extends AnyFunSuite {

  test("a majority-capped (TimedOut-median) query enters the re-measure set") {
    assert(Bench.suspect(Bench.TimedOut))
  }

  test("slow medians are suspects; fast and failed ones are not") {
    assert(Bench.suspect(2.01))
    assert(Bench.suspect(60.0))
    assert(!Bench.suspect(2.0))
    assert(!Bench.suspect(0.4))
    // a failed run (-1) is reported as-is, not re-measured: re-running a
    // query that THREW would mask a correctness bug as a perf retry
    assert(!Bench.suspect(-1.0))
  }
}
