package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import graft.ops.DirectAgg

/** Property check: the single-phase (skip-partial) aggregate must equal
  * the stock two-phase plan on ANY input — null keys, empty frames,
  * skewed and near-unique cardinalities, every supported agg function.
  * Values are bounded so double-typed averages are exact (integer sums
  * below 2^53 are order-independent in IEEE double), keeping the
  * comparison bit-exact rather than tolerance-based.
  */
class DirectAggPropSpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = for {
    card <- Gen.oneOf(1, 3, 50, 5000) // skewed → near-unique regimes
    n <- Gen.choose(0, 600)
    rows <- Gen.listOfN(n, for {
      k1 <- Gen.frequency(
        (9, Gen.choose(0, card).map(i => s"k$i")),
        (1, Gen.const(null: String)))
      k2 <- Gen.choose(0, 3)
      v <- Gen.choose(0L, 1000L)
    } yield (k1, k2, v))
  } yield rows

  test("aggByKeys ≡ stock groupBy for any data and supported aggregates") {
    val prop = Prop.forAll(rowGen) { rows =>
      val df = rows.toDF("k1", "k2", "v")
      val aggs = Seq(count(lit(1)).as("n"), sum(col("v")).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        avg(col("v")).as("av"))
      val got = DirectAgg.aggByKeys(df, Seq("k1", "k2"), aggs: _*)
        .collect().map(_.toSeq).toSet
      val want = df.groupBy("k1", "k2").agg(aggs.head, aggs.tail: _*)
        .collect().map(_.toSeq).toSet
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("distinctByKeys ≡ distinct for any data") {
    val prop = Prop.forAll(rowGen) { rows =>
      val df = rows.toDF("k1", "k2", "v")
      val got = DirectAgg.distinctByKeys(df).collect().map(_.toSeq).toSet
      val want = df.distinct().collect().map(_.toSeq).toSet
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
