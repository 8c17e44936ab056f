package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Stage-by-stage timing for the LSH near-dup funnel (tuning tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables(spark, sfDir, "documents")
    val withSig = docs
      .select(col("doc_id"),
        Dedup.shingles(col("text")).as("sh"),
        Dedup.minhashSignature(col("text")).as("sig"))
      .persist()
    t("materialize withSig")(withSig.count())
    val bands = withSig.select(col("doc_id"), explode(Dedup.bandKeys(col("sig"))).as("band_key"))
    t("bands")(bands.count())
    val cand = bands.as("x").join(bands.as("y"), Seq("band_key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    t("cand pairs")(println("n_cand=" + cand.count()))
    val sh = withSig.select(col("doc_id"), col("sh"))
    val full = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= 0.5)
    t("verify join")(println("n_pairs=" + full.count()))
    spark.stop()
  }
}
