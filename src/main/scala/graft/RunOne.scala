package graft
import org.apache.spark.sql.SparkSession

/** Run a comma-separated list of SparkEntry queries once each and time
  * them — the single-query A/B tool (Bench remains the harness: its
  * min-of-3 is the number that counts; a first run in a fresh JVM pays
  * ~0.3 s codegen/JIT). Usage:
  * `runMain graft.RunOne q_a,q_b [sfDir] [reps]`. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args(0).split(",").foreach { name =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[runone] $name%-28s rep$i ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      }
    }
    spark.stop()
  }
}
