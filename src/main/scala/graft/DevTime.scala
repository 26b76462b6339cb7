package graft

import org.apache.spark.sql.SparkSession

/** Dev-only micro harness: time named queries in isolation/sequence.
  * Usage: runMain graft.DevTime <sfDir> <name>[,<name>...] [reps]
  * [noaqe] [finalplan]
  * Width comes from SPARK_GRAFT_CPUS (default 4) so iteration runs
  * can match the bench's local[32] convention; `finalplan` prints the
  * AQE-executed physical plan after the last rep (the runtime join
  * strategies `explain` before execution cannot show). */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names =
      if (args(1) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(1).split(",").toSeq
    val reps = args.drop(2).headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.limit.initialNumPartitions", cpus) // match Bench
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("noaqe")) spark.conf.set("spark.sql.adaptive.enabled", "false")
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val cnt = df.count()
      println(f"[devtime] rep=$r $n%-24s rows=$cnt%-8d ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (r == reps && args.contains("finalplan")) {
        println(s"========== $n (final executed plan) ==========")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
