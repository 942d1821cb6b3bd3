package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join strategy levers for skew that AQE alone can't always fix. */
object Joins {

  /** Salted equi-join against a broadcastable-but-not-broadcast dimension:
    * the big side's hot keys are spread across `salts` sub-keys (salt =
    * deterministic hash of the whole row, NOT a RNG — replays and retries
    * stay stable), the small side is replicated `salts` times, and the
    * join runs on (key, salt). A key holding 10^9 rows then lands on
    * `salts` tasks instead of one.
    *
    * Use when AQE's skew-split can't help (e.g. the skewed side feeds an
    * aggregation that must stay co-partitioned). Costs: small side
    * replicated x salts.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val bigSalted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)),
        lit(salts)).cast("int"))
    val smallSalted = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigSalted.join(smallSalted, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
