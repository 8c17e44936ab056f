package graft

import org.apache.spark.sql.functions._

import graft.model.Cdc
import graft.operators.CdcOps

/** Seeded randomized pin of the flagship CDC semantics: collapsing a
  * multi-table batch with [[CdcOps.lastWriteWins]] and folding it into
  * per-table snapshots with [[CdcOps.applyChanges]] must reach exactly
  * the state a ONE-EVENT-AT-A-TIME sequential apply reaches (the
  * reference's per-record consumer loop, IidrCdcSinkTask.java:106-160
  * under /root/reference — the engine batches for scale, but the
  * terminal state is contract-equal). The canonical 5-event fixture
  * pins one curated stream; this sweep pins the composition over
  * random streams: delete-then-reinsert, deletes of keys absent from
  * the snapshot, keys colliding across tables, upsert runs ended by a
  * delete, tables receiving no events at all. */
class CdcFoldPropertySpec extends SparkSpec {
  import spark.implicits._

  test("LWW + applyChanges terminal state ≡ a sequential per-event fold, over random streams") {
    val rnd = new scala.util.Random(20260816L)
    val tables = Seq("t1", "t2", "t3")
    (1 to 5).foreach { trial =>
      val nKeys = 25
      val nEvents = 100 + rnd.nextInt(400)
      // globally unique offsets (the LWW tie caveat); ~1/4 deletes so
      // delete-terminal and delete-then-reinsert chains both occur
      val events = (0 until nEvents).map { off =>
        val t = tables(rnd.nextInt(tables.length))
        val k = rnd.nextInt(nKeys).toLong
        val op = if (rnd.nextInt(4) == 0) Cdc.Op.Delete else Cdc.Op.Upsert
        (t, k, off.toLong, op, s"v${trial}_$off")
      }
      val snapshots = tables.map { t =>
        t -> (0 until nKeys).filter(_ => rnd.nextBoolean())
          .map(k => (k.toLong, s"init_${t}_$k"))
      }.toMap

      // truth: the reference's loop — apply each event in offset order
      val truth = tables.map { t =>
        var m = snapshots(t).toMap
        events.sortBy(_._3).foreach { e =>
          if (e._1 == t) {
            if (e._4 == Cdc.Op.Delete) m -= e._2 else m += (e._2 -> e._5)
          }
        }
        t -> m
      }.toMap

      // engine: ONE LWW shuffle over the whole multi-table batch, then
      // the per-table snapshot fold — the flagship composition
      val df = events.toDF("target_table", "k", "offset", "op", "v")
      val lww = CdcOps.lastWriteWins(df, "target_table", Seq("k"), "offset")
      tables.foreach { t =>
        val snap = snapshots(t).toDF("k", "v")
        val changes = lww.filter(col("target_table") === t)
          .select("k", "v", "op")
        val got = CdcOps.applyChanges(snap, changes, Seq("k"))
          .collect().map(r => (r.getLong(0), r.getString(1))).toMap
        assert(got == truth(t),
          s"trial $trial table $t: engine ${got.size} rows vs " +
            s"sequential ${truth(t).size}; " +
            s"diff=${(got.toSet diff truth(t).toSet).take(3)} / " +
            s"${(truth(t).toSet diff got.toSet).take(3)}")
      }
    }
  }
}
