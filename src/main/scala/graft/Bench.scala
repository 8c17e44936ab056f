package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query over SPARK_GRAFT_SF_DIR
  * at local[32]; one JSON line with per-query seconds. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: JIT/class-loading via the flagship, plus the shared
    // normalized-feed cache for the bench SF so per-query numbers
    // measure steady-state plans, not one-time materialization.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try SparkEntry.queries("q_cdc_normalize")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // Failed queries report -1 (never a time): a crash must look like
    // a crash in the bench output, not a fast run.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
