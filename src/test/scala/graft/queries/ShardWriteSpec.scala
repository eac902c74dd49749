package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Layout + determinism pins for `x_shard_write` — the properties the
  * DuckDB manifest oracle cannot see because they live in the FILES:
  * exactly one parquet file per shard directory, file-count == shard
  * count, the union of shards is the corpus, rows inside each file sit
  * in skey (md5 permutation) order, and a rerun reproduces the manifest
  * bit-for-bit. Runs on sf0.01 (500 docs) so every one of the 8 shards
  * is populated (at 50 docs an empty shard is ~1% likely and the
  * file-count assertion would be fixture luck, not a law). */
class ShardWriteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("x_shard_write: one file per shard, union == corpus, in-file " +
      "skey order, deterministic rerun") {
    val run1 = graft.SparkEntry.queries("x_shard_write")(spark, dir)
      .collect().toSeq
    assert(run1.length === TrainPrepQueries.NShards)
    // union == corpus (n_seqs sums to the document count)
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(run1.map(_.getLong(1)).sum === nDocs)
    // layout: NShards shard= dirs, each holding exactly one parquet file
    val base = new java.io.File(TrainPrepQueries.shardBase(spark, dir))
    val shardDirs = base.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length === TrainPrepQueries.NShards)
    for (d <- shardDirs) {
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"${d.getName}: ${files.length} files")
      // in-file order IS skey order (parquet preserves row order; the
      // writer sorted within the shard's single partition)
      val skeys = spark.read.parquet(files.head.getPath)
        .select("skey").collect().map(_.getString(0)).toSeq
      assert(skeys === skeys.sorted, s"${d.getName} not in skey order")
      assert(skeys.nonEmpty)
    }
    // rerun: same session, same fixture -> bit-identical manifest
    val run2 = graft.SparkEntry.queries("x_shard_write")(spark, dir)
      .collect().toSeq
    assert(run2 === run1)
    // the order witness is real: first_doc != last_doc on a populated
    // shard, and both belong to the shard's doc set
    val shard0 = spark.read.parquet(
      shardDirs.minBy(_.getName).getPath)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val m0 = run1.minBy(_.getLong(0))
    assert(shard0.contains(m0.getLong(3)) && shard0.contains(m0.getLong(4)))
    assert(m0.getLong(3) !== m0.getLong(4))
  }

  test("x_shard_pack: manifest consistent with x_shard_write and the " +
      "pack window rides the shard partitioning (one exchange)") {
    val pack = graft.SparkEntry.queries("x_shard_pack")(spark, dir)
    val rows = pack.collect()
    // per-shard rollup of the pack manifest == the write manifest
    val write = graft.SparkEntry.queries("x_shard_write")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val byShard = rows.groupBy(_.getLong(0)).map { case (sid, rs) =>
      sid -> (rs.map(_.getLong(2)).sum, rs.map(_.getLong(3)).sum)
    }
    assert(byShard === write)
    // blocks law: n_blocks == ceil(n_tokens / PackCap) on token-bearing
    // groups (every (shard, lang) group carries tokens at sf0.01)
    val cap = TrainPrepQueries.PackCap
    assert(rows.forall(r =>
      r.getLong(4) === (r.getLong(3) + cap - 1) / cap))
    // the aggregate reuses the window's (shard, lang) hash
    // partitioning: exactly ONE hash shuffle in the whole plan (the
    // only other exchange is the 40-row manifest's presentational
    // range sort). AQE's toString prints Final AND Initial plan
    // sections — count the final one only.
    val planStr = pack.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    val exchanges = planStr
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected 1 hash exchange, got $exchanges")
  }

  test("c_train_delivery: the whole delivery is two metadata-sized " +
      "shuffles (dedup + shard) and ships no more docs than the " +
      "raw-corpus writer") {
    val del = graft.SparkEntry.queries("c_train_delivery")(spark, dir)
    val rows = del.collect()
    assert(rows.nonEmpty)
    // dedup can only shrink each shard's doc count vs the raw writer
    val write = graft.SparkEntry.queries("x_shard_write")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.forall(r => r.getLong(1) <= write(r.getLong(0))))
    // blocks law holds exactly on the shipped token counts
    val cap = TrainPrepQueries.PackCap
    assert(rows.forall(r => r.getLong(3) === (r.getLong(2) + cap - 1) / cap))
    // plan: dedup exchange + shard exchange, nothing else (the window's
    // partitioning is reused by the manifest aggregate); final AQE
    // section only
    val planStr = del.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    val exchanges = planStr
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 2, s"expected 2 hash exchanges, got $exchanges")
  }

  test("x_shard_append: exactly two files per shard post-append, " +
      "union == corpus, and a deterministic rerun") {
    val run1 = graft.SparkEntry.queries("x_shard_append")(spark, dir)
      .collect().toSeq
    assert(run1.length === TrainPrepQueries.NShards)
    // every shard received index AND batch docs, and the counts add up
    assert(run1.forall(r => r.getLong(1) > 0 && r.getLong(2) > 0))
    assert(run1.forall(r => r.getLong(1) + r.getLong(2) === r.getLong(3)))
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(run1.map(_.getLong(3)).sum === nDocs)
    // layout: the append added ONE new file per shard next to the
    // index write's one — a daily delivery is O(batch) files, never a
    // rewrite of the corpus
    val base = new java.io.File(
      TrainPrepQueries.shardBase(spark, dir) + "_incr")
    val shardDirs = base.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length === TrainPrepQueries.NShards)
    for (d <- shardDirs) {
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 2, s"${d.getName}: ${files.length} files")
    }
    // rerun reproduces the manifest bit-for-bit
    val run2 = graft.SparkEntry.queries("x_shard_append")(spark, dir)
      .collect().toSeq
    assert(run2 === run1)
  }

  test("canonFp collapses boundary-whitespace twins the way the oracle " +
      "does (the trim is load-bearing)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // cleanText's collapseTrim strips only boundary SPACES, so a raw
    // trailing "\n" survives as one boundary space in `clean`; the
    // oracle's fingerprint spelling trims it. canonFp must agree —
    // these two docs MUST land in one dedup group on both engines.
    val lc = lower(graft.functions.TextF.cleanText(col("text")))
    val fps = Seq("Hello world", "Hello world\n").toDF("text")
      .select(TrainPrepQueries.canonFp(lc).as("fp"),
        md5(lc.cast("binary")).as("untrimmed"))
      .collect()
    assert(fps(0).getString(0) === fps(1).getString(0),
      "boundary-whitespace twin got a different canonical fingerprint")
    assert(fps(0).getString(1) !== fps(1).getString(1),
      "expected the UNtrimmed fingerprints to differ (else this pin " +
        "tests nothing)")
  }

  test("x_token_budget_mix: greedy-prefix law on kept tokens and the " +
      "audit aggregate rides the lang window partitioning (one exchange)") {
    val mix = graft.SparkEntry.queries("x_token_budget_mix")(spark, dir)
    val rows = mix.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (budget, nDocs, nKept, tokKept, tokTotal) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))
      assert(nKept > 0 && nKept <= nDocs)
      // budget binds at sf0.01 (every lang has >budget tokens), so the
      // kept prefix reaches the budget and overflows by less than the
      // straddling doc
      assert(tokTotal > budget)
      assert(nKept < nDocs, s"lang ${r.getString(0)}: budget not binding")
      assert(tokKept >= budget)
    }
    // one hash exchange: the lang window; the groupBy(lang) aggregate
    // reuses its partitioning (final AQE section only)
    val planStr = mix.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    val exchanges = planStr
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"expected 1 hash exchange, got $exchanges")
  }
}
