package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §7.2 scale posture).
  *
  * AQE's skew-join split (on by default) handles most cases at runtime;
  * these are the explicit fallbacks for the pathologies AQE can't fix —
  * e.g. one device/user producing half the log volume (the reference's
  * world: a single chatty MikroTik flooding 0.0.0.0:514).
  *
  * - saltedJoin: big-side rows scatter across `salts` sub-keys, the
  *   modest-but-not-broadcastable dim side replicates `salts`× — the hot
  *   key's rows land on `salts` reducers instead of one.
  * - saltedCount: two-phase aggregation — partial counts per (key, salt),
  *   then final sum per key — for hot-key groupBys where even map-side
  *   combine leaves one reducer with the hot key's entire partial stream.
  */
object Skew {

  def saltedJoin(big: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    // salt assignment only needs to scatter, not to be stable across runs —
    // join correctness is per-row
    val b = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val d = dim.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    b.join(d, Seq(key, "__salt")).drop("__salt")
  }

  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as("n"))
}
