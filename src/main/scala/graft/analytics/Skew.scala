package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Manual skew mitigation for hash joins — the technique behind AQE's
 * skew-join split, usable where AQE can't see the skew (first
 * execution, streaming micro-batches, or a key whose heavy hitters
 * are known a priori).
 *
 * A hash join shuffles both sides on the key: one hot key ⇒ one
 * straggler partition doing most of the work. Salting splits each hot
 * key's rows across `salts` partitions: the BIG side gets a uniform
 * pseudo-random salt per row, the SMALL side is replicated once per
 * salt value, and the join runs on (key, salt). Results are identical
 * to the plain join (every big-side row still meets every small-side
 * match, exactly once — its salt replica); the cost is small-side
 * amplification ×salts, which is why this composes with `broadcast()`
 * being unavailable (a broadcastable small side never needs salting).
 *
 * The salt is `pmod(hash(<row-identity cols>), salts)` — deterministic
 * per row, so replays/retries land identically (no rand(): a task
 * retry re-salting differently would double- or zero-count rows).
 */
object Skew {

  /** INNER join only: the (key, salt) equi-join replicates small-side
    * rows per salt, which is exactly-once only under inner semantics —
    * an outer variant would emit one null-extended row PER SALT for an
    * unmatched big-side key. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, saltBy: Seq[String]): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(saltBy.nonEmpty, "need row-identity columns to derive the salt")
    // A pre-existing __salt would be silently overwritten on the big
    // side and collide in the join on the small side — wrong results
    // with no error. Fail loudly instead.
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin reserves the __salt column; rename it on the inputs")
    val salted = big.withColumn("__salt",
      pmod(hash(saltBy.map(col): _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
