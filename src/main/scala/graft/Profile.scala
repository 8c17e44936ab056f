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

    // Blocked prefix-filter join stages (q_dedup_ngram_jaccard path).
    if (args.contains("blocked")) {
      import org.apache.spark.sql.expressions.Window
      val block = Seq(col("lang"), col("source"))
      val d = docs.select(col("lang"), col("source"), col("doc_id"),
        Dedup.shingles(col("text"), 2).as("sh"))
        .withColumn("n", size(col("sh"))).filter(col("n") >= 1).persist()
      t("blocked: shingle pass")(d.count())
      val toks = d.select(col("lang"), col("source"), col("doc_id"), col("n"),
        explode(col("sh")).as("tok"))
      t("blocked: toks")(println("n_toks=" + toks.count()))
      val freq = toks.groupBy(col("lang"), col("source"), col("tok"))
        .agg(count(lit(1)).as("df"))
      t("blocked: freq")(println("n_freq=" + freq.count()))
      val byDoc = Window.partitionBy(block :+ col("doc_id"): _*)
        .orderBy(col("df"), col("tok"))
      val prefLen = (col("n") + lit(1) -
        ceil(lit(0.3) * col("n") - lit(1e-9))).cast("int")
      val prefix = toks.join(freq, Seq("lang", "source", "tok"))
        .withColumn("r", org.apache.spark.sql.functions.row_number().over(byDoc))
        .filter(col("r") <= prefLen)
        .select(col("lang"), col("source"), col("doc_id"), col("n"), col("tok")).persist()
      t("blocked: prefix")(println("n_prefix=" + prefix.count()))
      // Keep in lockstep with Dedup.blockedJaccardPairs (incl. the
      // PPJoin length filter) or the profiled stages diverge from the
      // shipped operator.
      val cand2 = prefix.as("x").join(prefix.as("y"), Seq("lang", "source", "tok"))
        .filter(col("x.doc_id") < col("y.doc_id") &&
          col("y.n") >= lit(0.3) * col("x.n") - lit(1e-9) &&
          col("x.n") >= lit(0.3) * col("y.n") - lit(1e-9))
        .select(col("lang"), col("source"),
          col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
      t("blocked: cand")(println("n_cand=" + cand2.count()))
      val sh2 = d.select(col("lang"), col("source"), col("doc_id"), col("sh"))
      val out = cand2
        .join(sh2.toDF("lang", "source", "doc_a", "sh_a"), Seq("lang", "source", "doc_a"))
        .join(sh2.toDF("lang", "source", "doc_b", "sh_b"), Seq("lang", "source", "doc_b"))
        .withColumn("jaccard", Dedup.jaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= 0.3)
      t("blocked: verify")(println("n_out=" + out.count()))
    }
    spark.stop()
  }
}
