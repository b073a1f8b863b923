package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: the (skewed) left side gets a deterministic
  * salt in [0, salts); the right side is replicated `salts` times; the
  * join key becomes (key, salt), splitting each hot key across `salts`
  * reducers. AQE's skew-join handles moderate skew automatically — this
  * operator is for the pathological keys AQE can't split (a single
  * monster key) and for pinning the technique under test: the salted
  * result must equal the plain join exactly.
  */
object SaltedJoin {

  /** @param saltExpr deterministic salt source on the left (e.g. a
    *                 secondary column hashed mod `salts`)
    */
  def inner(left: DataFrame, right: DataFrame, key: String,
      saltExpr: org.apache.spark.sql.Column, salts: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(saltExpr, lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
