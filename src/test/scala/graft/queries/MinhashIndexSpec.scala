package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted-index contract for the MinHash dedup family (round 17 —
  * parity with SemDedupSpec's quantizer round-trip): the band
  * signatures ARE `x_dedup_incremental`'s production index, so a
  * parquet round-trip of the signature table must reproduce the
  * identical candidate set and the identical incremental verdicts. */
class MinhashIndexSpec extends SparkSpec {

  test("signature table round-trips through parquet and candidate " +
      "generation is bit-identical") {
    val (sigs, candPlan) = ExtQueries.lshCandParts(spark, sf)
    val path =
      s"${sys.props("user.dir")}/target/qtmp-test/minhash_sigs"
    sigs.write.mode("overwrite").parquet(path)
    val reloaded = spark.read.parquet(path)
      // column order is not part of the contract
      .select(sigs.columns.map(col): _*)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_a", "doc_b").collect().toSeq
    val fromDisk = canon(ExtQueries.lshCandFromSigs(reloaded))
    assert(fromDisk === canon(candPlan))
    assert(fromDisk.nonEmpty,
      "no LSH candidates on the driver fixture - the round-trip " +
        "compare would be 0 = 0")
    // every candidate is an ordered pair (the dedup probe's contract)
    assert(fromDisk.forall(r => r.getLong(0) < r.getLong(1)))
  }
}
