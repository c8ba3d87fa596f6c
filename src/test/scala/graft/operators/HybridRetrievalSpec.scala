package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SharedSpark

/** q117 hybrid RRF: fusion arithmetic, rank-dominance, determinism. */
class HybridRetrievalSpec extends AnyFunSuite with SharedSpark {
  private val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    spark.catalog.clearCache()
    super.afterAll()
  }

  test("q117: 5 fused hits per query, RRF consistent with the rank terms") {
    val df = HybridRetrieval.q117HybridRrf(spark, sf).cache()
    val rows = df.collect()
    assert(rows.groupBy(_.getAs[Long]("query_id")).forall(_._2.length == 5))
    rows.foreach { r =>
      def term(c: String): Double =
        if (r.isNullAt(r.fieldIndex(c))) 0.0
        else BigDecimal(1.0 / (60 + r.getAs[Int](c)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expect = BigDecimal(term("rk_lex") + term("rk_vec"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-9,
        s"rrf mismatch on $r")
      assert(!(r.isNullAt(r.fieldIndex("rk_lex")) &&
        r.isNullAt(r.fieldIndex("rk_vec"))),
        "a fused candidate must come from at least one ranker")
    }
    // fused order strictly follows rrf desc within each query
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { g =>
      val sorted = g.sortBy(_.getAs[Int]("rk"))
      val scores = sorted.map(_.getAs[Double]("rrf"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    val again = HybridRetrieval.q117HybridRrf(spark, sf)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
  }

  test("q117: a candidate on both ranker lists outscores a same-rank single-list one") {
    // structural property of RRF — two 1/(60+r) terms beat one of either;
    // verified on the data: any dual-list candidate's rrf exceeds the best
    // possible single-list score at its worse rank
    val rows = HybridRetrieval.q117HybridRrf(spark, sf).collect()
    val dual = rows.filter(r => !r.isNullAt(r.fieldIndex("rk_lex")) &&
      !r.isNullAt(r.fieldIndex("rk_vec")))
    dual.foreach { r =>
      val worse = math.max(r.getAs[Int]("rk_lex"), r.getAs[Int]("rk_vec"))
      assert(r.getAs[Double]("rrf") > 1.0 / (60 + worse))
    }
  }
}
