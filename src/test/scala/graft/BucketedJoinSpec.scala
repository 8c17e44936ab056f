package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.sources.Bucketed

/** The storage-layout half of the scale design: a join between two
  * tables bucketed by the join key with the same bucket count must
  * plan with ZERO exchanges — and return the same rows as the plain
  * shuffled join. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private def initialPlan(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p => p
    }

  test("bucketed CDC apply plans no exchange and matches the broadcast apply") {
    import graft.model.Cdc
    import graft.operators.CdcOps
    val dir = Files.createTempDirectory("graft-bapply").toFile.getAbsolutePath
    // snapshot: 500 keys; change-set: upserts on 0..49, deletes on 50..59
    val snapshot = (0L until 500L).map(i => (i, s"v$i", i * 1.0))
      .toDF("pk", "payload", "amount")
    val changes = ((0L until 50L).map(i => (i, s"new$i", i * 2.0, Cdc.Op.Upsert)) ++
      (50L until 60L).map(i => (i, null: String, 0.0, Cdc.Op.Delete)))
      .toDF("pk", "payload", "amount", Cdc.Cols.Op)
    Bucketed.writeBucketed(snapshot, "bspec_snap", s"$dir/snap", "pk", 8)
    Bucketed.writeBucketed(changes, "bspec_changes", s"$dir/changes", "pk", 8)
    try {
      val applied = CdcOps.applyChangesBucketed(
        spark, "bspec_snap", "bspec_changes", "pk")
      val ex = initialPlan(applied).collectWithSubqueries {
        case e: ShuffleExchangeLike => e
      }
      assert(ex.isEmpty,
        s"bucketed apply must not shuffle, found ${ex.length} exchanges")
      val expected = CdcOps.applyChanges(snapshot, changes, Seq("pk"))
        .orderBy("pk").collect().toSeq
      val got = applied.orderBy("pk").collect().toSeq
      assert(got == expected)
      // the fold semantics themselves: deletes gone, upserts replaced
      assert(got.length == 490 && got.head.getString(1) == "new0")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_snap")
      spark.sql("DROP TABLE IF EXISTS bspec_changes")
    }
  }

  test("compactSnapshot closes the loop: cycle-2 apply is still exchange-free") {
    import graft.model.Cdc
    import graft.operators.CdcOps
    val dir = Files.createTempDirectory("graft-compact").toFile.getAbsolutePath
    val snapshot = (0L until 500L).map(i => (i, s"v$i")).toDF("pk", "payload")
    def changeSet(tag: String, del0: Long): org.apache.spark.sql.DataFrame =
      ((0L until 50L).map(i => (i, s"$tag$i", Cdc.Op.Upsert)) ++
        (del0 until del0 + 10L).map(i => (i, null: String, Cdc.Op.Delete)))
        .toDF("pk", "payload", Cdc.Cols.Op)
    Bucketed.writeBucketed(snapshot, "cspec_snap", s"$dir/snap0", "pk", 8)
    Bucketed.writeBucketed(changeSet("c1_", 450L), "cspec_ch1",
      s"$dir/ch1", "pk", 8)
    Bucketed.writeBucketed(changeSet("c2_", 460L), "cspec_ch2",
      s"$dir/ch2", "pk", 8)
    try {
      // cycle 1: apply + bucketed write-back + swap, one call
      CdcOps.compactSnapshot(spark, "cspec_snap", "cspec_ch1", "pk",
        8, s"$dir/snap1")
      // cycle 2 over the COMPACTED snapshot: the plan must again be
      // exchange-free — the whole point of writing the output bucketed
      val applied2 = CdcOps.applyChangesBucketed(
        spark, "cspec_snap", "cspec_ch2", "pk")
      val ex = initialPlan(applied2).collectWithSubqueries {
        case e: ShuffleExchangeLike => e
      }
      assert(ex.isEmpty,
        s"cycle-2 apply must not shuffle, found ${ex.length} exchanges")
      // and the data equals applying both change-sets in sequence
      val expected = CdcOps.applyChanges(
        CdcOps.applyChanges(snapshot, changeSet("c1_", 450L), Seq("pk")),
        changeSet("c2_", 460L), Seq("pk"))
        .orderBy("pk").collect().toSeq
      CdcOps.compactSnapshot(spark, "cspec_snap", "cspec_ch2", "pk",
        8, s"$dir/snap2")
      val got = spark.table("cspec_snap").orderBy("pk").collect().toSeq
      assert(got == expected && got.length == 480)
    } finally {
      Seq("cspec_snap", "cspec_snap__next", "cspec_ch1", "cspec_ch2")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("compactSnapshotRetained: three cycles prune old versions, handle stable") {
    import graft.model.Cdc
    import graft.operators.CdcOps
    val dir = Files.createTempDirectory("graft-retain").toFile.getAbsolutePath
    val root = s"$dir/versions"
    val snapshot = (0L until 500L).map(i => (i, s"v$i")).toDF("pk", "payload")
    def changeSet(tag: String, del0: Long): org.apache.spark.sql.DataFrame =
      ((0L until 50L).map(i => (i, s"$tag$i", Cdc.Op.Upsert)) ++
        (del0 until del0 + 10L).map(i => (i, null: String, Cdc.Op.Delete)))
        .toDF("pk", "payload", Cdc.Cols.Op)
    val sets = Seq(changeSet("c1_", 450L), changeSet("c2_", 460L),
      changeSet("c3_", 470L))
    // bootstrap snapshot lives OUTSIDE root — retention must not touch it
    Bucketed.writeBucketed(snapshot, "rspec_snap", s"$dir/snap0", "pk", 8)
    sets.zipWithIndex.foreach { case (cs, i) =>
      Bucketed.writeBucketed(cs, s"rspec_ch$i", s"$dir/ch$i", "pk", 8)
    }
    def versionDirs(): Seq[String] = {
      val f = new java.io.File(root)
      Option(f.listFiles()).toSeq.flatten.filter(_.isDirectory)
        .map(_.getName).filter(_.matches("v\\d+")).sorted
    }
    try {
      // keep=1: the previous version is reclaimed the moment each swap
      // lands, so three cycles leave exactly the live version behind
      val live = sets.indices.map { i =>
        CdcOps.compactSnapshotRetained(spark, "rspec_snap", s"rspec_ch$i",
          "pk", 8, root, keep = 1)
      }
      assert(live.last == s"$root/v2")
      assert(versionDirs() == Seq("v2"),
        s"old versions must be pruned, found ${versionDirs()}")
      // the bootstrap path outside root is untouched
      assert(new java.io.File(s"$dir/snap0").exists())
      // the stable handle reads the result of all three applies in order
      val expected = sets.foldLeft(snapshot)(
          (acc, cs) => CdcOps.applyChanges(acc, cs, Seq("pk")))
        .orderBy("pk").collect().toSeq
      val got = spark.table("rspec_snap").orderBy("pk").collect().toSeq
      assert(got == expected && got.length == 470)
      // and the NEXT apply over the compacted handle is exchange-free —
      // retention kept the loop's co-location contract intact
      val applied = CdcOps.applyChangesBucketed(
        spark, "rspec_snap", "rspec_ch0", "pk")
      val ex = initialPlan(applied).collectWithSubqueries {
        case e: ShuffleExchangeLike => e
      }
      assert(ex.isEmpty, s"post-retention apply planned ${ex.length} exchanges")
    } finally {
      (Seq("rspec_snap", "rspec_snap__next") ++
        sets.indices.map(i => s"rspec_ch$i"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("snapshot diff over bucketed snapshots plans no exchange") {
    import graft.operators.SnapshotDiff
    val dir = Files.createTempDirectory("graft-bdiff").toFile.getAbsolutePath
    val oldSnap = (0L until 400L).map(i => (i, s"s$i", i * 1.0))
      .toDF("k", "status", "price")
    val newSnap = ((0L until 350L).map(i =>
      (i, if (i % 10 == 0) s"chg$i" else s"s$i", i * 1.0)) ++
      (400L until 420L).map(i => (i, s"new$i", i * 2.0)))
      .toDF("k", "status", "price")
    Bucketed.writeBucketed(oldSnap, "bdiff_old", s"$dir/old", "k", 8)
    Bucketed.writeBucketed(newSnap, "bdiff_new", s"$dir/new", "k", 8)
    try {
      val d = SnapshotDiff.diff(spark.table("bdiff_old"),
        spark.table("bdiff_new"), Seq("k"), Seq("status", "price"))
      val ex = initialPlan(d).collectWithSubqueries {
        case e: ShuffleExchangeLike => e
      }
      assert(ex.isEmpty,
        s"bucketed snapshot diff must not shuffle, found ${ex.length}:\n${initialPlan(d)}")
      // and the diff itself is right: 35 updates, 50 deletes, 20 inserts
      val byOp = d.groupBy("op").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byOp == Map("U" -> 35L, "D" -> 50L, "I" -> 20L), s"$byOp")
    } finally {
      Seq("bdiff_old", "bdiff_new")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("co-located bucketed join plans no exchange and matches the shuffled join") {
    val dir = Files.createTempDirectory("graft-bucketed").toFile.getAbsolutePath
    val facts = (0L until 1000L).map(i => (i % 97, i, i * 2.5)).toDF("k", "id", "v")
    val dims = (0L until 97L).map(i => (i, s"dim_$i")).toDF("k", "name")
    Bucketed.writeBucketed(facts, "bspec_facts", s"$dir/facts", "k", 8)
    Bucketed.writeBucketed(dims, "bspec_dims", s"$dir/dims", "k", 8)
    try {
      val joined = Bucketed.colocatedJoin(spark, "bspec_facts", "bspec_dims", "k")
      val ex = initialPlan(joined).collectWithSubqueries {
        case e: ShuffleExchangeLike => e
      }
      assert(ex.isEmpty,
        s"bucketed join must not shuffle, found ${ex.length} exchanges")
      val expected = facts.join(dims, "k")
        .orderBy("id").collect().toSeq
      assert(joined.orderBy("id").collect().toSeq == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_facts")
      spark.sql("DROP TABLE IF EXISTS bspec_dims")
    }
  }
}
