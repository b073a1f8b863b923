package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.ConnectedComponents

/** Pins [[ConnectedComponents.run]] to a local union-find ground truth on
  * random and adversarial graphs (chains maximize round count; stars and
  * duplicate/reversed edges exercise the orientation plumbing).
  */
class ConnectedComponentsSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // canonical label = component min; path-compress to the root, which
    // IS the min because unions always point larger roots at smaller
    nodes.map(x => x -> find(x)).toMap
  }

  private def assertMatches(edges: Seq[(Long, Long)]): Unit = {
    val rows = ConnectedComponents.run(edges.toDF("u", "v")).collect()
    val got = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one row per node — a non-star edge set would emit duplicate nodes,
    // which toMap would silently collapse
    assert(rows.length == got.size)
    assert(got == unionFind(0, edges))
  }

  test("random graphs match union-find across densities") {
    val rnd = new scala.util.Random(42)
    for (density <- Seq(0.3, 1.0, 2.5)) {
      val n = 40
      val m = (n * density).toInt
      val edges = (0 until m).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) assertMatches(edges)
    }
  }

  test("chain graph (worst-case diameter) converges to one component") {
    val edges = (0L until 30L).map(i => (i, i + 1))
    val got = ConnectedComponents.run(edges.toDF("u", "v")).collect()
    assert(got.length == 31)
    assert(got.forall(_.getLong(1) == 0L))
  }

  test("duplicate, reversed, and self-loop edges are tolerated") {
    val edges = Seq((5L, 3L), (3L, 5L), (5L, 3L), (7L, 7L), (1L, 9L))
    val got = ConnectedComponents.run(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the self-loop-only node 7 never appears as an endpoint of a real edge
    assert(got == Map(5L -> 3L, 3L -> 3L, 1L -> 1L, 9L -> 1L))
  }

  test("already-star-forest input exits before any contraction round") {
    // two stars rooted at their component minima — the pre-loop stats
    // check (every u unique, u/v sides disjoint) must declare convergence
    // without running a largeStar/smallStar round, and labels must still
    // be correct (roots label themselves via the left-join coalesce)
    val edges = Seq((5L, 3L), (9L, 1L), (7L, 1L))
    val got = ConnectedComponents.run(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 3L, 3L -> 3L, 9L -> 1L, 7L -> 1L, 1L -> 1L))
  }

  test("a chain is NOT mistaken for a star forest (u unique but sides overlap)") {
    // (3,2),(2,1): every u unique, but 2 sits on both sides — the
    // disjointness half of the convergence test must force a round
    val got = ConnectedComponents.run(Seq((3L, 2L), (2L, 1L)).toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 2L -> 1L, 1L -> 1L))
  }

  test("empty edge set yields an empty assignment") {
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(ConnectedComponents.run(empty).collect().isEmpty)
  }

  test("two disjoint cliques keep distinct min labels") {
    val c1 = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val c2 = for (a <- 20L to 24L; b <- 20L to 24L if a < b) yield (a, b)
    val got = ConnectedComponents.run((c1 ++ c2).toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((10L to 13L).forall(got(_) == 10L))
    assert((20L to 24L).forall(got(_) == 20L))
  }
}
