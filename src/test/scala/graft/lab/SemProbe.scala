package graft.lab

import org.apache.spark.sql.functions._

/** Dev probe: x_semdedup output volume / sim distribution per fixture,
  * plus planted-twin recall on a ScaleGen fixture. Not registered. */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.core.GraftSession.local(cores = 16, appName = "sem-probe")
    s.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val out = graft.SparkEntry.queries("x_semdedup")(s, dir)
        .localCheckpoint()
      val n = out.count()
      println(s"== $dir rows=$n")
      out.agg(min("sim"), max("sim"), countDistinct("cluster")).show()
    }
    // planted recall: generate a copies=2 fixture from args(0)
    val plantDir = "target/qtmp-lab/sem_planted"
    graft.ScaleGen.run(s, args(0), plantDir, 2)
    val baseMax = s.read.parquet(s"${args(0)}/embeddings.parquet")
      .agg(max(col("vec_id").cast("long"))).head().getLong(0)
    val offset = (baseMax + 1) * 2
    val twins = s.read.parquet(s"$plantDir/embeddings.parquet")
      .filter(col("vec_id") < offset &&
        pmod(col("vec_id"), lit(graft.ScaleGen.PlantEvery)) === 0)
      .select((col("vec_id") + offset).as("twin_id"))
      .collect().map(_.getLong(0)).toSet
    val pruned = graft.SparkEntry.queries("x_semdedup")(s, plantDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val hit = twins.count(pruned.contains)
    println(s"== planted twins=${twins.size} pruned=${pruned.size} " +
      s"twinRecall=${hit.toDouble / twins.size}")
    s.stop()
  }
}
