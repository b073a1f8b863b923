package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity

/** [[Similarity.semDedupFlags]] — the SemDeDup cluster-then-prune rule:
  *
  *  - handcrafted cells pin the rule itself: an identical lower-id
  *    cellmate marks a duplicate, orthogonal members survive, a
  *    singleton cell survives, and the GREEDY subtlety — a vector whose
  *    only near neighbor is itself a duplicate is still pruned (the rule
  *    quantifies over lower-id members, not over keepers);
  *  - a property pin: on random vectors in random cells the distributed
  *    semi/anti-join plan must equal the quantifier evaluated naively in
  *    JVM doubles ([[graft.functions.Exact.foldDotJvm]] — the same
  *    sequential fold the Catalyst expression runs, so the threshold
  *    comparison cannot fork on FP association);
  *  - cross-cell isolation: identical vectors in DIFFERENT cells are
  *    both kept (the SemDeDup trade: recall is bounded by clustering).
  */
class SemDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Seq[Float], Long)], tau: Double) =
    Similarity.semDedupFlags(
      rows.toDF("vec_id", "embedding", "cell"), tau)
      .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toMap

  test("greedy keep-first within a cell; singletons and orthogonals survive") {
    val flags = run(Seq(
      (1L, Seq(1f, 0f, 0f), 10L), // keeper (lowest id of cell 10)
      (2L, Seq(1f, 0f, 0f), 10L), // identical to 1 → dup
      (3L, Seq(0f, 1f, 0f), 10L), // orthogonal to both → kept
      (4L, Seq(0f, 0f, 1f), 20L)  // singleton cell → kept
    ), tau = 0.9)
    assert(flags === Map(1L -> false, 2L -> true, 3L -> false, 4L -> false))
  }

  test("a vector near only a DUPLICATE is still pruned (greedy, not keeper-relative)") {
    // 2 duplicates 1; 3 is near 2 but NOT near 1 — the greedy rule
    // (any lower-id member above tau) prunes 3 anyway. This is
    // SemDeDup's documented behavior, and what the q139 oracle encodes.
    val a = Seq(1f, 0f)
    val b = Seq(0.98f, 0.199f)  // cos(a,b) ≈ 0.98
    val c = Seq(0.902f, 0.432f) // cos(b,c) ≈ 0.97, cos(a,c) ≈ 0.90
    val flags = run(Seq((1L, a, 7L), (2L, b, 7L), (3L, c, 7L)), tau = 0.95)
    assert(flags === Map(1L -> false, 2L -> true, 3L -> true))
  }

  test("identical vectors in different cells are both kept") {
    val v = Seq(0.5f, 0.5f)
    val flags = run(Seq((1L, v, 1L), (2L, v, 2L)), tau = 0.5)
    assert(flags === Map(1L -> false, 2L -> false))
  }

  private def runSeq(rows: Seq[(Long, Seq[Float], Long)], tau: Double) =
    Similarity.semDedupFlagsSequential(
      rows.toDF("vec_id", "embedding", "cell"), tau)
      .select("vec_id", "is_dup").as[(Long, Boolean)].collect().toMap

  test("sequential-greedy mode diverges from parallel exactly on chains") {
    // chain A < B < C: cos(A,B) ≈ cos(B,C) ≈ 0.94 ≥ tau, cos(A,C) ≈
    // 0.77 < tau. Parallel ∃-lower-id prunes B AND C (each has SOME
    // near lower member); the paper's sequential chain prunes only B —
    // C's lone near-lower neighbor B was itself pruned, and pruned
    // documents suppress no one. Both labelings pinned; the parallel
    // keeper set is the chain's subset, never the reverse.
    val a = Seq(1f, 0f)
    val b = Seq(math.cos(0.35).toFloat, math.sin(0.35).toFloat) // 20°
    val c = Seq(math.cos(0.70).toFloat, math.sin(0.70).toFloat) // 40°
    val rows = Seq((1L, a, 5L), (2L, b, 5L), (3L, c, 5L))
    val par = run(rows, tau = 0.9)
    val seq = runSeq(rows, tau = 0.9)
    assert(par === Map(1L -> false, 2L -> true, 3L -> true),
      s"parallel labeling moved: $par")
    assert(seq === Map(1L -> false, 2L -> true, 3L -> false),
      s"sequential chain labeling moved: $seq")
  }

  test("sequential mode equals a per-cell greedy JVM walk on random cells") {
    import graft.functions.Exact.{foldDotJvm, foldNormJvm}
    val rnd = new scala.util.Random(43)
    val rows = (0 until 120).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2f - 1f), (i % 7).toLong)
    }
    val tau = 0.2
    // the literal paper algorithm: walk ids ascending, prune iff near an
    // already-KEPT lower member
    val expect = scala.collection.mutable.Map.empty[Long, Boolean]
    val keptByCell = scala.collection.mutable.Map.empty[Long, List[(Long, Seq[Float])]]
    rows.sortBy(_._1).foreach { case (id, v, cell) =>
      val dup = keptByCell.getOrElse(cell, Nil).exists { case (_, kv) =>
        foldDotJvm(v, kv) / (foldNormJvm(v) * foldNormJvm(kv)) >= tau
      }
      expect(id) = dup
      if (!dup) keptByCell(cell) = (id, v) :: keptByCell.getOrElse(cell, Nil)
    }
    assert(runSeq(rows, tau) === expect.toMap)
    // and the structural relation: every parallel keeper is a chain keeper
    val par = run(rows, tau)
    val parKeep = rows.collect { case (id, _, _) if !par(id) => id }.toSet
    val seqKeep = rows.collect { case (id, _, _) if !expect(id) => id }.toSet
    assert(parKeep.subsetOf(seqKeep),
      s"parallel kept a doc the chain pruned: ${parKeep -- seqKeep}")
  }

  test("property: distributed flags equal the naive quantifier on random cells") {
    import graft.functions.Exact.{foldDotJvm, foldNormJvm}
    val rnd = new scala.util.Random(41)
    val rows = (0 until 120).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2f - 1f), (i % 7).toLong)
    }
    val tau = 0.2
    val expect = rows.map { case (id, v, cell) =>
      id -> rows.exists { case (id2, v2, cell2) =>
        cell2 == cell && id2 < id &&
          foldDotJvm(v, v2) / (foldNormJvm(v) * foldNormJvm(v2)) >= tau
      }
    }.toMap
    assert(run(rows, tau) === expect)
  }
}
