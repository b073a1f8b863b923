package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SetKernels, SortedIntersectCount}

/** Pins [[graft.functions.SortedIntersectCount]] — the two-pointer
  * verify kernel of the similarity joins — to its declared contract:
  * on sorted arrays of distinct non-null strings it equals
  * `size(array_intersect(a, b))` exactly, on both the interpreted and
  * the codegen path (which must also stay INSIDE a whole-stage span —
  * being codegen-friendly is the reason the expression exists).
  */
class SetKernelSpec extends AnyFunSuite with SparkSpec {

  // random sorted-distinct string arrays over a small shared vocabulary
  // (small so intersections are actually non-trivial)
  private val genSet: Gen[Seq[String]] = for {
    k <- Gen.choose(0, 12)
    xs <- Gen.listOfN(k, Gen.choose(0, 25).map(i => f"tok$i%02d"))
  } yield xs.distinct.sorted

  private def evalInterpreted(a: Seq[String], b: Seq[String]): Option[Int] = {
    val e = SortedIntersectCount(
      Literal.create(a, ArrayType(StringType)),
      Literal.create(b, ArrayType(StringType)))
    Option(e.eval(InternalRow.empty)).map(_.asInstanceOf[Int])
  }

  test("interpreted eval equals set intersection size (ScalaCheck)") {
    val prop = Prop.forAll(genSet, genSet) { (a, b) =>
      evalInterpreted(a, b).contains(a.toSet.intersect(b.toSet).size)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(400), prop)
    assert(res.passed, res.status.toString)
  }

  test("null array -> null; empty arrays -> 0") {
    val e = SortedIntersectCount(
      Literal.create(null, ArrayType(StringType)),
      Literal.create(Seq("a"), ArrayType(StringType)))
    assert(e.eval(InternalRow.empty) == null)
    assert(evalInterpreted(Nil, Nil).contains(0))
    assert(evalInterpreted(Nil, Seq("a", "b")).contains(0))
  }

  test("codegen path agrees with array_intersect and stays in a codegen span") {
    SetKernels.register(spark)
    import spark.implicits._
    val cases: Seq[(Seq[String], Seq[String])] =
      Gen.listOfN(200, Gen.zip(genSet, genSet))
        .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(7L))
    val df = cases.zipWithIndex.map { case ((a, b), i) => (i, a, b) }
      .toDF("id", "a", "b")
      // exchange blocks ConvertToLocalRelation from plan-time eval
      .repartition(3)
      .select(col("id"),
        SetKernels.intersectCount(col("a"), col("b")).as("c"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
    val got = df.collect().map(r => r.getInt(0) -> (r.getInt(1), r.getInt(2))).toMap
    val line = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("sorted_intersect_count")).getOrElse("")
    assert(line.trim.replaceFirst("^[-+: ]+", "").startsWith("*("),
      s"sorted_intersect_count not in a codegen span: $line")
    cases.zipWithIndex.foreach { case ((a, b), i) =>
      val want = a.toSet.intersect(b.toSet).size
      assert(got(i) == ((want, want)), s"case $i: got ${got(i)}, want $want")
    }
  }
}
