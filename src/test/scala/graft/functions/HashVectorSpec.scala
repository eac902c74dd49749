package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class HashVectorSpec extends SparkSpec {
  import spark.implicits._

  test("tokenHash is a uint32 (md5-prefix), reproducible across engines") {
    val r = Seq("hello").toDF("t")
      .select(HashF.tokenHash(col("t"))).as[Long].head()
    // first 8 hex chars of md5('hello') = 5d41402a
    assert(r === java.lang.Long.parseLong("5d41402a", 16))
    assert(r >= 0 && r < (1L << 32))
  }

  test("minhash universal-hash family stays in [0, p) with no overflow") {
    val maxH = (1L << 32) - 1
    HashF.MinhashSeeds.foreach { case (a, b) =>
      assert(a * maxH + b > 0, "64-bit overflow")   // a < 2^20 keeps < 2^52
      assert(a * maxH % HashF.MinhashPrime >= 0)
    }
  }

  test("simhash weights: contrib is ±1 and fingerprint inverts the bits") {
    val h = 0xa5a5a5a5L
    val contribs = (0 until 32).map { j =>
      Seq(h).toDF("h").select(HashF.simhashBitContrib(col("h"), j))
        .as[Int].head()
    }
    assert(contribs.forall(c => c == 1 || c == -1))
    // single token: fingerprint reconstructs exactly the token's bits
    val fp = Seq(h).toDF("h")
      .select(HashF.simhashFromWeights(
        (0 until 32).map(j => HashF.simhashBitContrib(col("h"), j))))
      .as[Long].head()
    assert(fp === h)
  }

  test("hammingDist(x, x) = 0 and counts flipped bits") {
    val r = Seq((5L, 3L)).toDF("a", "b")
      .select(HashF.hammingDist(col("a"), col("b"))).as[Long].head()
    assert(r === 2) // 101 vs 011
  }

  test("cosine: self=1, orthogonal=0, zero-norm→NULL") {
    val r = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0)),
      (Seq(1.0, 0.0), Seq(0.0, 5.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0)))
      .toDF("a", "b")
      .select(VectorF.cosine(col("a"), col("b")))
      .as[Option[Double]].collect().toSeq
    assert(math.abs(r(0).get - 1.0) < 1e-15)
    assert(r(1).get === 0.0)
    assert(r(2) === None)
  }

  test("lshBucket is deterministic and bounded by 2^planes") {
    val v = Seq(Seq.tabulate(8)(i => math.sin(i + 1))).toDF("v")
    val b1 = v.select(VectorF.lshBucket(col("v"), 4, 8)).as[Long].head()
    val b2 = v.select(VectorF.lshBucket(col("v"), 4, 8)).as[Long].head()
    assert(b1 === b2)
    assert(b1 >= 0 && b1 < 16)
  }

  test("hyperplane components are deterministic, in [-1,1), data-independent") {
    val prop = Prop.forAll(Gen.choose(0, 15), Gen.choose(0, 1023)) {
      (p: Int, d: Int) =>
        val x = VectorF.hyperplaneComponent(p, d)
        x >= -1.0 && x < 1.0 && x == VectorF.hyperplaneComponent(p, d)
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }
}
