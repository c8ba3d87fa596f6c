package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split isn't available (AQE handles moderate skew; a single
  * pathological key that is most of the table still lands in one reducer
  * family and wants explicit salting).
  *
  * Mechanics: the skewed (large) side gets a deterministic salt in
  * [0, nSalts) derived from a unique column, spreading each hot key over
  * nSalts reducers; the small side is replicated nSalts times via a
  * literal-array explode (row count × nSalts — keep the small side small).
  * The join key becomes (key, salt), so hot-key rows distribute while
  * correctness is untouched: every (left row, right row) pair with equal
  * keys still meets exactly once, because the right replica carries every
  * salt value.
  */
object SkewJoin {

  /** @param skewed     large side with hot keys
    * @param small      side to replicate (dimension-sized)
    * @param joinCond   equi-condition between the two sides
    * @param saltSource column on `skewed` that spreads rows (any
    *                   high-cardinality column; uniqueness not required)
    * @param nSalts     reducer fan-out per hot key */
  def saltedJoin(skewed: DataFrame, small: DataFrame, joinCond: Column,
                 saltSource: Column, nSalts: Int): DataFrame = {
    val l = skewed.withColumn("_salt", pmod(hash(saltSource), lit(nSalts)))
    val r = small.withColumn("_salt",
      explode(array((0 until nSalts).map(lit(_)): _*)))
    l.join(r, joinCond && l("_salt") === r("_salt"))
      .drop("_salt")
  }
}
