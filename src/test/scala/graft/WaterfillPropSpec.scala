package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Waterfill

/** Property pin for the closed-form water-filling allocator against a
  * DRIVER-SIDE sequential reference (iteratively saturate any source
  * whose proportional share exceeds its capacity, re-level, repeat to
  * fixpoint — the textbook algorithm the sorted-prefix construction
  * replaces). Random instances cover: all-saturated-but-one, none
  * saturated, duplicate ratios, weight skew, tiny capacities, budget
  * near zero and near ΣC.
  */
class WaterfillPropSpec extends AnyFunSuite with SparkSpec {

  /** Textbook fixpoint reference: (saturatedSet, λ). */
  private def reference(rows: Seq[(String, Long, Long)], budget: Long)
    : (Set[String], Double) = {
    var sat = Set.empty[String]
    var lam = 0.0
    var changed = true
    while (changed) {
      val unsat = rows.filterNot(r => sat(r._1))
      val wSum = unsat.map(_._3).sum
      val remaining = budget - rows.filter(r => sat(r._1)).map(_._2).sum
      lam = if (wSum == 0) 0.0 else remaining.toDouble / wSum.toDouble
      val newly = unsat.filter(r => r._2.toDouble / r._3.toDouble <= lam)
        .map(_._1).toSet
      changed = newly.nonEmpty
      sat ++= newly
    }
    (sat, lam)
  }

  test("allocator matches the sequential fixpoint on random instances") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 0 until 30) {
      val n = 2 + rnd.nextInt(12)
      val rows = (0 until n).map { i =>
        (f"s$i%02d", 1L + rnd.nextInt(2000).toLong, 1L + rnd.nextInt(5).toLong)
      }
      val totalC = rows.map(_._2).sum
      // sweep the budget through the interesting range, ΣC excluded
      // (full-budget water-filling is trivially "everyone saturates")
      val budget = math.max(1L, (totalC * (rnd.nextInt(99) + 1)) / 100)
      val (refSat, refLam) = reference(rows, budget)

      val t = rows.toDF("source", "c", "w")
      val b = Seq((budget, rows.map(_._3).sum)).toDF("budget", "wtot")
      val got = Waterfill.allocate(t, b).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getBoolean(3), r.getLong(4)))

      val gotSat = got.filter(_._4).map(_._1).toSet
      assert(gotSat == refSat,
        s"trial $trial: saturated $gotSat != reference $refSat (B=$budget, rows=$rows)")
      val allocs = got.map(g => g._1 -> g._5).toMap
      val byName = rows.map(r => r._1 -> r).toMap
      got.foreach { case (s0, c, _, satFlag, alloc) =>
        assert(alloc <= c, s"trial $trial: alloc $alloc > capacity $c for $s0")
        if (satFlag) assert(alloc == c, s"trial $trial: saturated $s0 not full")
        else {
          val w = byName(s0)._3
          assert(alloc == math.floor(refLam * w).toLong,
            s"trial $trial: $s0 alloc $alloc != floor(lambda*w) with lambda=$refLam")
        }
      }
      assert(allocs.values.sum <= budget,
        s"trial $trial: over-allocated ${allocs.values.sum} > $budget")
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
