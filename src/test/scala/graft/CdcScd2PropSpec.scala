package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.dims.{Cdc, Scd2}

/** Property pins for the CDC → SCD-2 composition on RANDOM feeds — the
  * op/sequence interleavings a fixed fixture can't enumerate. For any
  * keyed feed split into any batches (out-of-order seqs, repeated ops
  * per key, delete/resurrect chains):
  *
  *  1. MIRROR LAW: the history's current rows after a sequential
  *     [[Scd2.applyCdc]] fold equal [[Cdc.applyChanges]] folded over
  *     the same batches;
  *  2. REPLAY: re-merging the last batch at its own effTs changes
  *     nothing;
  *  3. SHAPE INVARIANTS: per key, ≤1 current version (valid_to NULL ⇔
  *     is_current), valid_from strictly increasing, every closed
  *     version's valid_to equals some batch effTs ≥ its valid_from.
  *
  * Spark jobs are the cost driver, so cases stay few and small (the
  * per-case work is ~7 tiny local-relation folds); the single-batch
  * corner cases live in CdcScd2Spec.
  */
class CdcScd2PropSpec extends AnyFunSuite with SparkSpec {

  private val Key = Seq("k")
  private val Attrs = Seq("v")

  private def feedDf(rows: List[(Long, String, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v", "op", "seq")
  }

  private val genRow: Gen[(Long, String, String, Long)] = for {
    k <- Gen.choose(0L, 4L) // few keys → dense per-key op collisions
    v <- Gen.oneOf("a", "b", "c")
    op <- Gen.frequency(3 -> "I", 3 -> "U", 2 -> "D")
    seq <- Gen.choose(0L, 9L) // duplicate seqs exercise the tie-break
  } yield (k, v, op, seq)

  private val genBatches: Gen[List[List[(Long, String, String, Long)]]] =
    Gen.choose(1, 3).flatMap(nb =>
      Gen.listOfN(nb, Gen.choose(0, 6).flatMap(Gen.listOfN(_, genRow))))

  test("random feeds: mirror law, replay no-op, history shape invariants") {
    val prop = Prop.forAll(genBatches) { batches =>
      val effOf = (i: Int) => (i + 1) * 10L
      var dim = Scd2.emptyDim(feedDf(Nil), Key, Attrs)
      batches.zipWithIndex.foreach { case (b, i) =>
        dim = Scd2.applyCdc(dim, feedDf(b), Key, Attrs, "op", "seq", effOf(i))
      }
      val hist = dim.select("k", "v", "valid_from", "valid_to", "is_current")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))

      // (1) mirror law
      var snap = feedDf(Nil).select("k", "v")
      batches.foreach { b =>
        snap = Cdc.applyChanges(snap, feedDf(b), Key, Attrs, "op", "seq")
      }
      val mirror = snap.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val current = hist.filter(_._5).map(h => (h._1, h._2)).toSet
      val mirrorOk = current == mirror

      // (2) replay of the last batch is a no-op
      val replayOk = batches.lastOption.forall { last =>
        val again = Scd2.applyCdc(dim, feedDf(last), Key, Attrs, "op", "seq",
          effOf(batches.length - 1))
          .select("k", "v", "valid_from", "valid_to", "is_current")
          .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
        again.sortBy(h => (h._1, h._3, h._2)).toSeq ==
          hist.sortBy(h => (h._1, h._3, h._2)).toSeq
      }

      // (3) shape invariants
      val effs = (0 until batches.length).map(effOf).toSet
      val shapeOk = hist.groupBy(_._1).forall { case (_, vs) =>
        val sorted = vs.sortBy(_._3)
        vs.count(_._5) <= 1 &&
          vs.forall(h => h._5 == h._4.isEmpty) &&
          sorted.map(_._3).distinct.length == sorted.length &&
          vs.forall(h => h._4.forall(vt => effs.contains(vt) && vt >= h._3))
      }
      mirrorOk && replayOk && shapeOk
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(25).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
