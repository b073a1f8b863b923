package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Exact, VectorFold}

/** Pins the native codegen [[graft.functions.FoldDot]] to the
  * `zip_with`+`aggregate` fold it replaced: bit-identical doubles on the
  * same inputs (the HOF form is what the DuckDB oracles mirror, so this
  * transitively pins the native path to the oracle), matching null
  * semantics, and an actually-codegen'd plan.
  */
class VectorFoldSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def floats(seed: Int, n: Int = 64): Array[Float] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)((r.nextDouble() * 2 - 1).toFloat)
  }

  test("native fold_dot is bit-identical to the HOF oracle mirror") {
    VectorFold.register(spark)
    val df = (1 to 50).map(i => (i, floats(i), floats(i + 1000)))
      .toDF("id", "a", "b")
    val got = df.select(
      Exact.foldDot(col("a"), col("b")).as("native"),
      Exact.foldDotHof(col("a"), col("b")).as("hof"),
      Exact.foldNorm(col("a")).as("norm_native"),
      sqrt(Exact.foldDotHof(col("a"), col("a"))).as("norm_hof"))
      .collect()
    got.foreach { r =>
      // == on raw bits, not approximate equality
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("mixed float/double inputs (embedding vs typedlit plane) agree") {
    VectorFold.register(spark)
    val plane = Similarity.planeForTest
    val df = (1 to 20).map(i => Tuple1(floats(i))).toDF("v")
      .withColumn("w", typedlit(plane))
    val got = df.select(
      Exact.foldDot(col("v"), col("w")).as("native"),
      Exact.foldDotHof(col("v"), col("w")).as("hof")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("fold_dot_long matches the HOF integer fold exactly") {
    VectorFold.register(spark)
    val df = (1 to 30).map { i =>
      val r = new scala.util.Random(i)
      (Array.fill(64)(r.nextInt(255).toLong - 127),
        Array.fill(64)(r.nextInt(255).toLong - 127))
    }.toDF("a", "b")
    val got = df.select(
      VectorFold.dotLong(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).as("hof")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // null semantics mirror FoldDot
    val nulls = Seq((Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (Some(Seq(1L)), Some(Seq(1L, 2L)))).toDF("a", "b")
    val gn = nulls.select(VectorFold.dotLong(col("a"), col("b"))).collect()
    assert(gn(0).isNullAt(0) && gn(1).isNullAt(0))
  }

  test("null semantics: null array, null element, length mismatch -> null") {
    VectorFold.register(spark)
    val rows = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))), // 11.0
      (None, Some(Seq(1.0f))),                        // null array
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f))))       // length mismatch
      .toDF("a", "b")
    val got = rows.select(Exact.foldDot(col("a"), col("b"))).collect()
    assert(got(0).getDouble(0) === 11.0)
    assert(got(1).isNullAt(0))
    assert(got(2).isNullAt(0), "HOF parity: zip_with pads -> null sum")
    // null ELEMENT: build via array() of a null-when column
    val el = Seq((1.0f, 2.0f)).toDF("x", "y")
      .select(array(col("x"), when(col("y") > 99, col("y"))).as("a"),
        array(col("x"), col("y")).as("b"))
    assert(el.select(Exact.foldDot(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("pq_argmin matches a JVM recompute, ties to the lowest index, nulls null") {
    VectorFold.register(spark)
    def dbls(seed: Int, n: Int = 8): Seq[Double] = {
      val r = new scala.util.Random(seed)
      Seq.fill(n)(r.nextDouble() * 2 - 1)
    }
    val cands = (0 until 21).map(c => dbls(c + 500))
    val df = (1 to 60).map(i => (i, dbls(i)))
      .toDF("id", "va").withColumn("cvs", typedlit(cands))
    val got = df.select(col("id"), VectorFold.pqArgmin(col("va"), col("cvs")))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    def l2(a: Seq[Double], b: Seq[Double]): Double = {
      var aa = 0.0; var ab = 0.0; var bb = 0.0
      for (k <- a.indices) { aa += a(k) * a(k); ab += a(k) * b(k); bb += b(k) * b(k) }
      aa - 2.0 * ab + bb
    }
    for (i <- 1 to 60) {
      val va = dbls(i)
      val want = cands.zipWithIndex.map { case (cv, c) => (l2(va, cv), c) }.min._2
      assert(got(i) == want, s"row $i: got ${got(i)}, want $want")
    }
    // exact tie (duplicate codeword): strict `<` keeps the FIRST index —
    // with cvs sorted by cent_id that IS the lowest-cent_id tie-break
    val tied = Seq(Tuple1(dbls(7)))
      .toDF("va").withColumn("cvs", typedlit(Seq(dbls(7), dbls(7))))
    assert(tied.select(VectorFold.pqArgmin(col("va"), col("cvs")))
      .collect()(0).getInt(0) == 0)
    // null contract: empty candidate list, null array, length mismatch
    val edge = Seq(
      (Some(dbls(1)), Some(Seq.empty[Seq[Double]])),
      (None: Option[Seq[Double]], Some(Seq(dbls(2)))),
      (Some(dbls(1)), Some(Seq(dbls(2).take(4)))))
      .toDF("va", "cvs")
    val gn = edge.select(VectorFold.pqArgmin(col("va"), col("cvs"))).collect()
    assert(gn.forall(_.isNullAt(0)))
    // all-NaN distances (dirty vector): strict `<` never fires, so no
    // winner exists — must be null, NOT a leaked -1 index (which a
    // downstream element_at(cvs, bi + 1) would turn into a job-killing
    // INVALID_INDEX_OF_ZERO). ±Inf hits the same path: Inf−Inf = NaN in
    // the aa − 2ab + bb decomposition.
    val dirty = Seq(
      (Seq(Double.NaN, 1.0), Seq(dbls(3, 2), dbls(4, 2))),
      (Seq(Double.PositiveInfinity, 1.0), Seq(dbls(5, 2), dbls(6, 2))))
      .toDF("va", "cvs")
    assert(dirty.select(VectorFold.pqArgmin(col("va"), col("cvs")))
      .collect().forall(_.isNullAt(0)))
    // NaN confined to ONE codeword only eliminates that codeword (its
    // distance is NaN, never winning the strict `<`) — the clean
    // candidate wins regardless of position, matching the oracle's
    // NaN-sorts-last ORDER BY dist
    val oneBad = Seq(
      (dbls(8, 2), Seq(Seq(Double.NaN, 0.5), dbls(9, 2))),
      (dbls(8, 2), Seq(dbls(9, 2), Seq(Double.NaN, 0.5))))
      .toDF("va", "cvs")
    val ob = oneBad.select(VectorFold.pqArgmin(col("va"), col("cvs"))).collect()
    assert(ob(0).getInt(0) == 1 && ob(1).getInt(0) == 0)
  }

  test("pq_argmin stays inside whole-stage codegen") {
    VectorFold.register(spark)
    val cands = (0 until 4).map(c => (0 until 8).map(i => (c * 8 + i) / 10.0))
    val df = spark.range(100)
      .select(transform(sequence(lit(0), lit(7)),
        i => (i + col("id")).cast("double")).as("va"))
      // reference va twice: CollapseProject would otherwise inline the
      // (CodegenFallback) transform into this project and take pq_argmin
      // out of codegen with it — the fold_dot test relies on dot(v, v)'s
      // double reference for the same reason
      .select(VectorFold.pqArgmin(col("va"), typedlit(cands)).as("b"),
        size(col("va")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("pq_argmin")).getOrElse("")
    assert(line.trim.startsWith("*("), plan)
  }

  test("the dot stays inside whole-stage codegen (no CodegenFallback)") {
    VectorFold.register(spark)
    // build from range, not toDF: a projection over a LocalRelation is
    // constant-folded at plan time and would show no codegen span at all
    val df = spark.range(100)
      .select(transform(sequence(lit(0), lit(63)),
        i => (i + col("id")).cast("float")).as("v"))
      .select(Exact.foldDot(col("v"), col("v")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the node evaluating fold_dot must itself be codegen'd (leading
    // `*(n)` marker); the array-building `transform` project in the same
    // plan shows the contrast — as a higher-order function it gets NO
    // star, which is exactly the fallback fold_dot exists to avoid
    val dotLine = plan.linesIterator.find(_.contains("fold_dot")).getOrElse("")
    assert(dotLine.trim.startsWith("*("), plan)
    val hofLine = plan.linesIterator.find(_.contains("transform(")).getOrElse("")
    assert(!hofLine.trim.stripPrefix("+- ").startsWith("*("), plan)
  }
}

/** Test fixture sharing the production plane generator's shape. */
private object Similarity {
  val planeForTest: Seq[Double] =
    graft.sim.Similarity.rpPlanes(1, 64).head
}
