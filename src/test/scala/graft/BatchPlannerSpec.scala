package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BatchPlanner.planBatches

/** Semantics of the statistics-driven fetch planner (reference
  * `whalefinder/obis.py:166-203`): greedy packing, oversized-year
  * isolation, full coverage, no overlap. Property cases are generated
  * from a fixed seed (no scalatestplus bridge in the offline cache).
  */
class BatchPlannerSpec extends AnyFunSuite {

  private def forAll(f: Seq[(Int, Long)] => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(41)
      val years = rnd.shuffle((1900 to 2025).toList).take(n).sorted
      val stats = years.map(y => y -> rnd.nextLong(30001L))
      f(stats)
    }
  }

  test("reference example: greedy packing under the size cap") {
    val counts = Seq(1990 -> 4000L, 1991 -> 5000L, 1992 -> 2000L,
      1993 -> 9000L, 1994 -> 500L)
    // 4000+5000 ≤ 10000; +2000 overflows → flush; 2000+9000 overflows →
    // flush; 9000+500 ≤ 10000 → final window.
    assert(planBatches(counts, 10000) ==
      Seq((1990, 1991), (1992, 1992), (1993, 1994)))
  }

  test("oversized year gets a dedicated window") {
    val counts = Seq(2000 -> 100L, 2001 -> 50000L, 2002 -> 100L)
    assert(planBatches(counts, 10000) ==
      Seq((2000, 2000), (2001, 2001), (2002, 2002)))
  }

  test("empty input → no windows") {
    assert(planBatches(Nil, 10000).isEmpty)
  }

  test("windows cover every input year exactly once, in order") {
    forAll { stats =>
      val plan = planBatches(stats, 10000L)
      val covered = plan.flatMap { case (s, e) =>
        stats.map(_._1).filter(y => y >= s && y <= e)
      }
      assert(covered == stats.map(_._1).sorted)
      // windows are ordered and non-overlapping
      plan.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 < s2)
        case _ =>
      }
    }
  }

  test("every multi-year window's total respects the cap") {
    forAll { stats =>
      val byYear = stats.toMap
      planBatches(stats, 10000L).foreach { case (s, e) =>
        val total = stats.collect { case (y, c) if y >= s && y <= e => c }.sum
        if (s != e) assert(total <= 10000L, s"window ($s,$e)")
        else assert(total <= 10000L || byYear(s) > 10000L)
      }
    }
  }
}
