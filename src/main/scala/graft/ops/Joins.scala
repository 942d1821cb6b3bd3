package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.Bridge

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

  /** Bloom-pruned equi-join: the selective-but-not-broadcastable dimension's
    * join keys are folded into a Bloom filter (one distributed aggregation),
    * and the fact side is pre-filtered with `might_contain` BEFORE its
    * shuffle — the same runtime-row-level-filtering idea Spark's
    * InjectRuntimeFilter applies, exposed as an explicit operator for the
    * cases the rule's heuristics skip (filtered dims above the broadcast
    * threshold, pre-shuffled facts, multi-stage reuse of one filter).
    *
    * At 100 TB this is the difference between shuffling the whole fact
    * table and shuffling the ~selectivity fraction that can actually match:
    * the bloom rides to executors as a scalar-subquery literal (built once,
    * a few MB), the probe is a codegen'd hash test per row, and false
    * positives only cost wasted shuffle rows — the real join afterwards
    * keeps the result EXACTLY equal to the plain join, which is why the
    * oracle for this operator is the undecorated join itself.
    *
    * Only inner/left_semi are legal: pruning fact rows under any outer
    * variant would change results.
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, key: String,
                      expectedItems: Long = 1000000L,
                      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi", "leftsemi", "semi")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"bloom pruning preserves semantics only for inner/left_semi joins, got $joinType")
    val bloom = dim.agg(Bridge.column(
      new BloomFilterAggregate(
        Bridge.expression(xxhash64(col(key))), expectedItems)
        .toAggregateExpression()).as("_bloom"))
    val pruned = fact.where(Bridge.column(BloomFilterMightContain(
      ScalarSubquery(bloom.queryExecution.analyzed),
      Bridge.expression(xxhash64(col(key))))))
    pruned.join(dim, Seq(key), joinType)
  }

  /** Blocked fuzzy string join — the GENERIC form of the reference's
    * author entity resolution (EntityResolution.py's
    * initial-and-surname candidate lookup followed by difflib
    * verification): candidates come from an EQUI-join on blocking keys,
    * then the difflib-bit-exact `name_similarity` codegen kernel scores
    * each candidate pair and only pairs at or above `threshold`
    * survive. Blocking is what makes fuzzy matching distributed-legal:
    * the similarity predicate alone is a theta-join (corpus x corpus —
    * never planned here; the equi-join shuffles candidates, not the
    * cross product). Classic blocking keys: first initial + surname,
    * (lang, length band), canonical-URL host, any [[graft.ops.Dedup]]
    * signature column.
    *
    * Blocking keys pair positionally: `blockCols(i)._1` on the left
    * equi-joins `blockCols(i)._2` on the right, null-safe (a null block
    * value is a value — two unknown-host rows do block together).
    * Column names must be disjoint across sides (the intervalOverlap
    * discipline) so the output carries every input column unambiguously.
    *
    * @return left columns ++ right columns ++ `similarity` (rounded
    *         6 dp), candidates only where similarity >= threshold
    */
  def blockedFuzzyJoin(left: DataFrame, right: DataFrame,
                       blockCols: Seq[(String, String)],
                       leftStrCol: String, rightStrCol: String,
                       threshold: Double = 0.8): DataFrame = {
    require(blockCols.nonEmpty,
      "need at least one blocking key pair — an unblocked fuzzy join " +
        "is a corpus x corpus theta join")
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1] (got $threshold)")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty && !left.columns.contains("similarity") &&
      !right.columns.contains("similarity"),
      s"blockedFuzzyJoin needs disjoint column names and reserves " +
        s"'similarity'; rename: ${(overlap + "similarity").mkString(", ")}")
    val cond = blockCols.map { case (lc, rc) => col(lc) <=> col(rc) }
      .reduce(_ && _)
    // difflib's own cheap gate: quick_ratio is a PROVEN upper bound on the
    // exact score (TextKernels.nameSimilarityUpper), O(n) vs the matcher's
    // quadratic-with-autojunk — candidates it rejects can never reach the
    // threshold, so results are unchanged while the expensive kernel runs
    // only on survivors (measured 3000/3000 random same-vocabulary
    // candidates pruned at 0.85). The gate lives INSIDE the `when`, not as
    // a separate filter: pushdown is free to reorder conjoined filter
    // predicates (observed: a pushed u =!= v re-associated the conjuncts
    // and put the exact kernel FIRST, a silent 20× regression), but a
    // CaseWhen branch cannot be evaluated before its condition. Pruned
    // rows surface as similarity 0.0 and fall to the threshold filter
    // (threshold > 0 by the require above). The 1e-6 slack covers the
    // 6-dp rounding of the exact score.
    val upperOk = graft.functions.TextFunctions.name_similarity_upper(
      col(leftStrCol), col(rightStrCol)) >= threshold - 1e-6
    left.join(right, cond)
      .withColumn("similarity",
        when(upperOk, round(graft.functions.TextFunctions.name_similarity(
          col(leftStrCol), col(rightStrCol)), 6)).otherwise(lit(0.0)))
      .filter(col("similarity") >= threshold)
  }
}
