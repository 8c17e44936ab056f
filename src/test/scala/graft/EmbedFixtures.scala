package graft

import org.apache.spark.sql.SparkSession

import graft.ann.EmbedIndex

/** Shared embed-index test fixtures. */
object EmbedFixtures {

  /** Devolve the layout-2 table at `path` to a GENUINE layout-1
    * table: thin (bkey, doc_id) bucket rows — vectors gone — and a
    * params sidecar without the layout key, exactly what a pre-r17
    * build left on disk. Reads the standing params first so the
    * devolved sidecar keeps the table's real LSH family. */
  def devolveToLayout1(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val p = EmbedIndex.readParams(spark, path)
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val thin = spark.read.parquet(s"$path/buckets")
      .select("bkey", "doc_id", "__batch")
    val tmp = s"$path.thin"
    thin.write.partitionBy("__batch").parquet(tmp)
    fs.delete(new Path(s"$path/buckets"), true)
    require(fs.rename(new Path(tmp), new Path(s"$path/buckets")),
      s"devolve rename failed for $path/buckets")
    val out = fs.create(new Path(s"$path/_params.json"), true)
    try out.write(
      (s"""{"bands":${p.bands},"planes_per_band":${p.planesPerBand},""" +
        s""""dims":${p.dims}}""").getBytes("UTF-8"))
    finally out.close()
    graft.Tables.invalidate(path)
  }
}
