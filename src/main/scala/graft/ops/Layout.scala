package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * min/max file skipping.
  *
  * Sorting by (a, b) clusters only on `a`: a predicate on `b` alone reads
  * every file. Interleaving the bits of both columns' bucket numbers into
  * one sort key gives every file a tight bounding BOX over all clustered
  * dimensions, so parquet row-group/file min-max statistics prune scans
  * for predicates on ANY subset of them — the standard layout lever for
  * multi-tenant scan-heavy tables (time × tenant, lat × lon, user × day).
  *
  * The key is a pure codegen'd expression (shifts and ORs over
  * `width_bucket` ordinals); the write is one range-repartition + in-file
  * sort. Uniform min/max bucketing keeps the expression shuffle-free —
  * heavily skewed columns should be pre-transformed (log, rank) the same
  * way you'd pick any bucketing function.
  */
object Layout {

  /** Morton-interleaved sort key over `dims` columns. Each dimension is
    * bucketed uniformly on [lo, hi] into 2^bits ordinals; ordinal bits are
    * interleaved round-robin (dimension i gets bit positions i, i+k,
    * i+2k, …). bits × dims must fit a long (≤ 63).
    *
    * @param dims (column, lo, hi) — bounds from table stats; values are
    *   clamped into range
    */
  def zorderKey(dims: Seq[(Column, Double, Double)], bits: Int = 16): Column = {
    val k = dims.size
    require(k >= 1, "at least one dimension")
    require(bits * k <= 63, s"bits*dims must be <= 63, got ${bits * k}")
    val n = 1L << bits
    val ords = dims.map { case (c, lo, hi) =>
      // width_bucket returns 1..n+1 inclusive of the upper overflow bucket;
      // clamp to 0..n-1 ordinals
      least(greatest(width_bucket(c.cast("double"), lit(lo), lit(hi),
        lit(n)) - 1, lit(0L)), lit(n - 1))
    }
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      ords.zipWithIndex.foldLeft(acc) { case (a, (o, i)) =>
        a.bitwiseOR(shiftleft(shiftrightunsigned(o, b).bitwiseAND(lit(1L)),
          b * k + i))
      }
    }
  }

  /** Write `df` Z-order-clustered on `dims` into `numFiles` parquet files:
    * range-repartition on the Morton key (contiguous key ranges per file →
    * disjoint bounding boxes), sort within each file (row-group-level
    * min/max stay tight), drop the key before writing.
    */
  def writeZordered(df: DataFrame, path: String,
                    dims: Seq[(String, Double, Double)], numFiles: Int,
                    bits: Int = 16): Unit = {
    df.withColumn("_z",
      zorderKey(dims.map { case (c, lo, hi) => (col(c), lo, hi) }, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` as `numShards` GLOBALLY sorted parquet shards on
    * `sortCols`: shard i holds a contiguous key range strictly below
    * shard i+1's, rows sorted inside each shard — the training-data
    * export shape (curriculum order, reproducible epoch slicing,
    * merge-readable by shard id).
    *
    * `repartitionByRange` computes its range boundaries from a driver-side
    * SAMPLE of the sort key (one lightweight pass), so no global sort or
    * single-task stage exists anywhere: the heavy work is one shuffle +
    * per-shard in-memory/spill sort, all `numShards`-wide parallel. Skewed
    * keys get uneven shards (sampling-bounded) — acceptable for export;
    * pre-salt or bucket the key if shard-size variance matters more than
    * global order.
    */
  def writeRangeSharded(df: DataFrame, path: String,
                        sortCols: Seq[String], numShards: Int,
                        format: String = "parquet"): Unit = {
    require(sortCols.nonEmpty && numShards > 0)
    df.repartitionByRange(numShards, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").format(format).save(path)
  }
}
