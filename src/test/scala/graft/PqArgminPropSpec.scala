package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PqArgmin, VectorFold}

/** Property-tests [[graft.functions.PqArgmin]]'s declared contract on
  * randomized inputs with NaN/±Inf/null injections — the edges a fixed
  * fixture table can't enumerate. Two pins:
  *
  *  1. the INTERPRETED eval (hundreds of ScalaCheck cases, no Spark job)
  *     against a JVM twin of the contract: any structural violation
  *     (null array, null candidate, null element, length mismatch, empty
  *     candidate list) → null; otherwise strict-`<` first minimum over
  *     the `aa − 2ab + bb` fold distances, NaN distances skipped, null
  *     when no candidate wins;
  *  2. the CODEGEN path on a seeded batch of the same generator's cases,
  *     behind an exchange so ConvertToLocalRelation can't constant-fold
  *     the project back onto the interpreted path — interpreted ≡
  *     codegen ≡ twin, so the two eval implementations can never fork.
  */
class PqArgminPropSpec extends AnyFunSuite with SparkSpec {

  // --- JVM twin of the declared contract ------------------------------

  private def twin(va: Option[Seq[Option[Double]]],
      cvs: Option[Seq[Option[Seq[Option[Double]]]]]): Option[Int] = {
    if (va.isEmpty || cvs.isEmpty) return None
    val v = va.get
    val cs = cvs.get
    if (cs.isEmpty) return None
    // the eval loop visits every candidate unless it already nulled, so
    // a violation ANYWHERE nulls the result — position never matters
    if (v.exists(_.isEmpty)) return None
    if (cs.exists(c => c.isEmpty || c.get.size != v.size ||
        c.get.exists(_.isEmpty))) return None
    val x = v.map(_.get)
    var best = -1
    var bd = Double.PositiveInfinity
    for ((c, idx) <- cs.zipWithIndex) {
      val y = c.get.map(_.get)
      var aa = 0.0d; var ab = 0.0d; var bb = 0.0d
      for (i <- x.indices) {
        aa += x(i) * x(i); ab += x(i) * y(i); bb += y(i) * y(i)
      }
      val d = aa - 2.0d * ab + bb
      if (d < bd) { bd = d; best = idx }
    }
    if (best < 0) None else Some(best)
  }

  // --- generators (dirty values and structural nulls injected) --------

  private val genElem: Gen[Option[Double]] = Gen.frequency(
    30 -> Gen.choose(-8.0, 8.0).map(Some(_)),
    1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity).map(Some(_)),
    1 -> Gen.const(None))

  private def genVec(n: Int): Gen[Seq[Option[Double]]] =
    Gen.listOfN(n, genElem)

  private type Case =
    (Option[Seq[Option[Double]]], Option[Seq[Option[Seq[Option[Double]]]]])

  private val genCase: Gen[Case] = for {
    n <- Gen.choose(1, 6)
    k <- Gen.choose(0, 5)
    va <- Gen.frequency(15 -> genVec(n).map(Some(_)), 1 -> Gen.const(None))
    cvs <- Gen.listOfN(k, Gen.frequency(
      12 -> genVec(n).map(Some(_)),
      // length mismatch (may coincide with n — then it's just clean)
      1 -> Gen.choose(1, 7).flatMap(genVec).map(Some(_)),
      1 -> Gen.const(None)))
    cvsOpt <- Gen.frequency(15 -> Gen.const(Some(cvs)), 1 -> Gen.const(None))
  } yield (va, cvsOpt)

  // --- interpreted eval through Literal-fed PqArgmin ------------------

  private def rawVa(v: Option[Seq[Option[Double]]]): Any =
    v.map(_.map(_.map(Double.box).orNull)).orNull

  private def rawCvs(v: Option[Seq[Option[Seq[Option[Double]]]]]): Any =
    v.map(_.map(_.map(_.map(_.map(Double.box).orNull)).orNull)).orNull

  private def evalInterpreted(c: Case): Option[Int] = {
    val e = PqArgmin(
      Literal.create(rawVa(c._1), ArrayType(DoubleType)),
      Literal.create(rawCvs(c._2), ArrayType(ArrayType(DoubleType))))
    Option(e.eval(InternalRow.empty)).map(_.asInstanceOf[Int])
  }

  test("interpreted eval matches the contract twin (ScalaCheck)") {
    val prop = Prop.forAll(genCase) { c =>
      evalInterpreted(c) == twin(c._1, c._2)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(400), prop)
    assert(res.passed, res.status.toString)
  }

  test("codegen path agrees with interpreted and the twin on a seeded batch") {
    VectorFold.register(spark)
    import spark.implicits._
    val cases: Seq[Case] =
      Gen.listOfN(250, genCase)
        .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L))
    val df = cases.zipWithIndex
      .map { case ((va, cvs), i) => (i, va, cvs) }
      .toDF("id", "va", "cvs")
      // the exchange keeps ConvertToLocalRelation from evaluating the
      // projection at plan time (which would silently re-test eval)
      .repartition(3)
      .select(col("id"), VectorFold.pqArgmin(col("va"), col("cvs")).as("am"))
    val got = df.collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    // inspect the plan AFTER the action: under AQE the pre-execution
    // string carries no codegen markers yet
    val line = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("pq_argmin")).getOrElse("")
    assert(line.trim.replaceFirst("^[-+: ]+", "").startsWith("*("),
      s"pq_argmin not in a codegen span: $line")
    cases.zipWithIndex.foreach { case ((va, cvs), i) =>
      val want = twin(va, cvs)
      assert(got(i) == want, s"case $i: codegen ${got(i)}, twin $want")
      assert(evalInterpreted((va, cvs)) == want,
        s"case $i: interpreted differs from twin")
    }
  }
}
