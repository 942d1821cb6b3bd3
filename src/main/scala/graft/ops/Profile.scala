package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the schema-health report a pipeline runs before and
  * after every transformation batch: one row per profiled column with row,
  * null, and distinct counts plus string-rendered min/max.
  *
  * Shape: ONE aggregation pass computes every column's stats together
  * (count/min/max are plain partial aggs; the exact distinct counts rewrite
  * into a single Expand — k-way fan-out, one shuffle, no per-column jobs),
  * producing a single row that a static inline explode unpivots into the
  * per-column report. No collect, no loop over columns on the driver.
  *
  * At 100 TB the Expand fan-out (k× the scan) is the honest price of EXACT
  * distinct counts; when approximate counts are acceptable swap
  * `countDistinct` for `approx_count_distinct` via `exact = false` and the
  * pass collapses to one non-expanded aggregation (HLL partials).
  */
object Profile {

  /** Profile the named columns (default: all top-level columns).
    *
    * @return (column, n_rows, n_nulls, n_distinct, min_val, max_val) —
    *   min/max rendered as strings so mixed-type reports union into one
    *   frame; null-only columns render empty strings
    */
  def profileColumns(df: DataFrame, cols: Seq[String] = Nil,
                     exact: Boolean = true): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    require(names.nonEmpty, "nothing to profile")
    // min/max run in a SEPARATE global aggregate from the counts: a
    // string column's min/max needs a var-length aggregation buffer,
    // which HashAggregate cannot hold — one such column used to demote
    // the whole multi-countDistinct Expand chain to SortAggregate,
    // paying two full sorts of the k-times-expanded stream. Split, the
    // Expand chain hash-aggregates (its buffers are all counts) and the
    // min/max pass is a global sort-free fold; the two 1-row results
    // recombine with a literal-style crossJoin.
    val aggs = names.flatMap { c =>
      Seq(count(col(c)).as(s"_cnt_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"_nd_$c"))
    }
    val mmAggs = names.flatMap { c =>
      Seq(min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val one = df.agg(count(lit(1)).as("_rows"), aggs: _*)
      .crossJoin(df.agg(mmAggs.head, mmAggs.tail: _*))
    val stacked = explode(array(names.map(c => struct(
      lit(c).as("column"),
      col("_rows").as("n_rows"),
      (col("_rows") - col(s"_cnt_$c")).as("n_nulls"),
      col(s"_nd_$c").cast("long").as("n_distinct"),
      coalesce(col(s"_min_$c"), lit("")).as("min_val"),
      coalesce(col(s"_max_$c"), lit("")).as("max_val"))): _*))
    one.select(stacked.as("_p")).select("_p.*")
  }

  /** k-ANONYMITY audit over quasi-identifier columns (Sweeney 2002) —
    * the governance gate before publishing a corpus with metadata: a row
    * is k-anonymous iff at least `k` rows share its full quasi-identifier
    * combination, so any equivalence class smaller than `k` re-identifies
    * its members. Returns the VIOLATING classes (one row per class, with
    * its size) — empty result = the table is k-anonymous.
    *
    * One map-side-combinable aggregate on the quasi columns; null is a
    * value (`groupBy` groups nulls together), matching the attacker model
    * — "field missing" is itself an identifying signature.
    *
    * @return (quasiCols..., class_size) where class_size < k
    */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
                           k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2,
      s"need quasi-identifier columns and k >= 2 (got k=$k)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  /** l-DIVERSITY audit (Machanavajjhala et al. 2007) — k-anonymity's
    * stronger sibling: an equivalence class whose SENSITIVE column shows
    * fewer than `l` distinct values leaks that attribute even when the
    * class is large (everyone in the class shares the secret). Returns
    * the violating classes with their size and distinct-sensitive count;
    * empty result = the table is l-diverse. Same one-aggregate shape as
    * [[kAnonymityViolations]].
    *
    * @return (quasiCols..., class_size, n_sensitive) where
    *         n_sensitive < l
    */
  def lDiversityViolations(df: DataFrame, quasiCols: Seq[String],
                           sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && l >= 2,
      s"need quasi-identifier columns and l >= 2 (got l=$l)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .filter(col("n_sensitive") < l)
  }

  /** t-CLOSENESS audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the governance ladder after [[kAnonymityViolations]] and
    * [[lDiversityViolations]]: an equivalence class whose SENSITIVE-value
    * distribution sits far from the table-global distribution leaks the
    * attribute probabilistically even when the class is large and
    * diverse (a class that is 95% one diagnosis in a 5%-base-rate table
    * fails l-diversity's letter-counting). Distance is total variation
    * (the categorical form of the paper's EMD), kept EXACT as an integer
    * fraction: with class counts c_i (size n), global counts g_i
    * (total N),
    *
    *   TVD = (1/2) Σ_i |c_i/n − g_i/N| = Σ_i |c_i·N − g_i·n| / (2·n·N)
    *
    * so `tvd_num`/`tvd_den` are published as integers (the repo's
    * float-lattice rule) and the threshold is the rational `tNum/tDen`.
    * Sensitive values absent from a class contribute g_i·n each, folded
    * in closed form as (N − Σ_{present} g_i)·n — the class×value join
    * only ever touches values the class actually contains, so the fan-out
    * is the class-value table, never classes × global vocabulary.
    *
    * Scale shape: three map-side-combinable aggregates (global counts are
    * sensitive-vocabulary-sized and broadcast; class sizes are narrow),
    * one equi-join chain, no window over data rows. Products run in
    * DECIMAL(38,0) — n·N wraps a silent bigint past ~3e9·3e9 rows — and
    * downcast behind a raise_error guard, mirroring [[graft.ops.CorpusOps.ksDrift]].
    *
    * @return violating classes only: (quasiCols..., class_size, tvd_num,
    *         tvd_den) where tvd_num/tvd_den > tNum/tDen; empty result =
    *         the table is t-close
    */
  def tClosenessViolations(df: DataFrame, quasiCols: Seq[String],
                           sensitiveCol: String,
                           tNum: Long, tDen: Long): DataFrame = {
    require(quasiCols.nonEmpty && tNum >= 0 && tDen > 0,
      s"need quasi-identifier columns and a threshold fraction >= 0 " +
        s"(got $tNum/$tDen)")
    require(!quasiCols.contains(sensitiveCol),
      "the sensitive column cannot also be a quasi-identifier")
    val reserved = Seq("_sv", "_gsv", "_g", "_c", "_N", "_pnum", "_gpres",
      "_num", "_den", "class_size", "tvd_num", "tvd_den")
    val hit = (quasiCols :+ sensitiveCol).toSet.intersect(reserved.toSet)
    require(hit.isEmpty,
      s"tClosenessViolations reserves ${reserved.mkString(", ")}; " +
        s"rename: ${hit.mkString(", ")}")
    val dec = "decimal(38,0)"
    val tot = df.agg(count(lit(1)).cast(dec).as("_N"))
    val glob = df.groupBy(col(sensitiveCol).as("_gsv"))
      .agg(count(lit(1)).cast(dec).as("_g"))
    val cls = df.groupBy(quasiCols.map(col) :+ col(sensitiveCol).as("_sv"): _*)
      .agg(count(lit(1)).cast(dec).as("_c"))
    val sizes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("class_size"))
    val qJoin = quasiCols.map(c => col(s"_a.$c") <=> col(s"_b.$c"))
      .reduce(_ && _)
    val joined = cls.as("_a")
      .join(glob, col("_a._sv") <=> col("_gsv")) // null sensitive is a value
      .join(sizes.as("_b"), qJoin)
      .crossJoin(tot) // 1-row total: literal-style broadcast
    def guarded(c: Column, what: String): Column =
      when(c > lit(Long.MaxValue).cast(dec),
        raise_error(concat(lit(s"tCloseness: $what overflows BIGINT: "),
          c.cast("string"))).cast("long"))
        .otherwise(c.cast("long"))
    joined
      .groupBy(quasiCols.map(c => col(s"_a.$c").as(c)) :+
        col("class_size") :+ col("_N"): _*)
      .agg(sum(abs(col("_c") * col("_N") - col("_g") * col("class_size")))
          .as("_pnum"),
        sum(col("_g")).as("_gpres"))
      .withColumn("_num",
        col("_pnum") + (col("_N") - col("_gpres")) * col("class_size"))
      .withColumn("_den", lit(2).cast(dec) * col("class_size") * col("_N"))
      .filter(
        col("_num") * lit(tDen).cast(dec) > lit(tNum).cast(dec) * col("_den"))
      .select(quasiCols.map(col) ++ Seq(
        guarded(col("class_size"), "class size").as("class_size"),
        guarded(col("_num"), "tvd numerator").as("tvd_num"),
        guarded(col("_den"), "tvd denominator").as("tvd_den")): _*)
  }

  /** Declarative data-quality expectations (the Deequ/Great-Expectations
    * shape, built from the published constraint-suite idea in Schelter et
    * al. 2018): a suite of checks evaluated over one DataFrame, one
    * result row per check with EXACT integer (n_rows, n_violations) —
    * the admission gate a 100 TB pipeline runs on every batch before
    * promoting it ("0.3% of yesterday's crawl lost its license tag —
    * stop").
    */
  sealed trait Expectation
  object Expectation {
    /** column must be non-null */
    final case class NotNull(column: String) extends Expectation
    /** non-null numeric values must fall in [lo, hi]; NaN violates */
    final case class InRange(column: String, lo: Double, hi: Double)
      extends Expectation
    /** non-null values must match the (Java) regex somewhere */
    final case class MatchesRegex(column: String, pattern: String)
      extends Expectation
    /** non-null values must be one of `values` */
    final case class InSet(column: String, values: Seq[String])
      extends Expectation
    /** the column combination must be row-unique; every row of a
      * duplicated combination counts as a violation */
    final case class Unique(columns: Seq[String]) extends Expectation
    /** non-null values must exist in `dim`'s `dimColumn` (referential
      * integrity against a reference table — license registry, source
      * catalog; dimension-sized, so Catalyst broadcasts the anti join) */
    final case class RefersTo(column: String, dim: DataFrame,
                              dimColumn: String) extends Expectation
  }

  /** Evaluate an expectation suite. Row-local checks (not-null, range,
    * regex, set membership) all fold into ONE map-side-combinable
    * aggregate pass over the data — k checks cost one scan, not k
    * (conditional sums, the [[profileColumns]] discipline); each
    * `Unique` adds one aggregate on its key; each `RefersTo` one
    * left-anti equi-join plus a count. Nothing collects, nothing
    * windows; the result is checks-many rows.
    *
    * Check names are derived (`not_null(col)`, `unique(a,b)`, …) and
    * collide if the same check type repeats on a column — vary the
    * column set or split suites if you need both `InRange(x,0,1)` and
    * `InRange(x,0,100)` in one report.
    *
    * @return (check, n_rows, n_violations) — one row per expectation;
    *         n_violations = 0 for every row means the batch passes
    */
  def checkExpectations(df: DataFrame,
                        checks: Seq[Expectation]): DataFrame = {
    import Expectation._
    require(checks.nonEmpty, "empty expectation suite")
    val rowLocal: Seq[(String, Column)] = checks.collect {
      case NotNull(c) => s"not_null($c)" -> col(c).isNull
      case InRange(c, lo, hi) =>
        val x = col(c).cast("double")
        s"in_range($c)" ->
          (x.isNotNull && (isnan(x) || x < lo || x > hi))
      case MatchesRegex(c, p) =>
        s"matches_regex($c)" -> (col(c).isNotNull && !col(c).rlike(p))
      case InSet(c, vs) =>
        s"in_set($c)" -> (col(c).isNotNull && !col(c).isInCollection(vs))
    }
    val names = rowLocal.map(_._1) ++ checks.collect {
      case Unique(cs) => s"unique(${cs.mkString(",")})"
      case RefersTo(c, _, _) => s"refers_to($c)"
    }
    require(names.distinct.size == names.size,
      s"duplicate check names: ${names.diff(names.distinct).mkString(", ")}")
    val local: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.zipWithIndex.map { case ((_, bad), i) =>
          sum(when(bad, 1L).otherwise(0L)).as(s"_v$i")
        }
        val one = df.agg(count(lit(1)).as("_rows"), aggs: _*)
        val stacked = explode(array(rowLocal.zipWithIndex.map {
          case ((name, _), i) => struct(lit(name).as("check"),
            col("_rows").as("n_rows"),
            coalesce(col(s"_v$i"), lit(0L)).as("n_violations"))
        }: _*))
        Some(one.select(stacked.as("_c")).select("_c.*"))
      }
    val rest: Seq[DataFrame] = checks.collect {
      case Unique(cs) =>
        require(cs.nonEmpty, "Unique needs columns")
        df.groupBy(cs.map(col): _*).agg(count(lit(1)).as("_n"))
          .agg(coalesce(sum(col("_n")), lit(0L)).as("n_rows"),
            coalesce(sum(when(col("_n") > 1, col("_n")).otherwise(0L)),
              lit(0L)).as("n_violations"))
          .select(lit(s"unique(${cs.mkString(",")})").as("check"),
            col("n_rows"), col("n_violations"))
      case RefersTo(c, dim, dc) =>
        val miss = df.select(col(c).as("_v")).filter(col("_v").isNotNull)
          .join(dim.select(col(dc).as("_v")).distinct(), Seq("_v"),
            "left_anti")
          .agg(count(lit(1)).as("n_violations"))
        df.agg(count(lit(1)).as("n_rows")).crossJoin(miss) // 1-row frames
          .select(lit(s"refers_to($c)").as("check"), col("n_rows"),
            col("n_violations"))
    }
    (local.toSeq ++ rest).reduce(_ unionByName _)
  }

  /** ε-differentially-private group counts (Dwork, McSherry, Nissim &
    * Smith 2006 — the Laplace mechanism for sensitivity-1 counting
    * queries): each group's true count is perturbed by Laplace(1/ε)
    * noise before publication, the governance release path when even
    * exact [[kAnonymityViolations]]-clean aggregates leak (differencing
    * attacks across corpus versions).
    *
    * Noise is drawn by inverting the Laplace CDF on the md5 lattice of
    * (group values, seed) — x = −(1/ε)·sgn(u−½)·ln(1−2|u−½|) with u
    * uniform from the hash — so releases are REPLAY-DETERMINISTIC (the
    * repo rule: retries and backfills re-publish identical numbers,
    * which also prevents the classic averaging attack where re-running
    * the release n times shrinks the noise √n-fold). The honest caveat,
    * stated plainly: the DP guarantee is against an adversary who does
    * NOT know the seed — treat the seed as a secret of the release
    * process, and change it only when the underlying data genuinely
    * changes (each (data, seed) release spends ε of budget).
    *
    * One map-side-combinable aggregate; noise is a codegen'd expression
    * over the group key, no RNG, no driver involvement. Only the noisy
    * count is published — carrying the true count out would defeat the
    * mechanism.
    *
    * @return (groupCols..., noisy_n) — noisy_n on the 6-dp rounded
    *         lattice, can be negative (clamping would bias sums;
    *         consumers round/clamp per their own policy)
    */
  def dpGroupCounts(df: DataFrame, groupCols: Seq[String],
                    epsilon: Double, seed: String = "dp"): DataFrame = {
    require(groupCols.nonEmpty && epsilon > 0 && epsilon.isFinite,
      s"need group columns and epsilon > 0 (got $epsilon)")
    // null group values hash as a sentinel: concat_ws SKIPS nulls, so
    // ("x", null) and ("x") would otherwise share a noise draw
    val hashIn = concat_ws("|",
      groupCols.map(c => coalesce(col(c).cast("string"),
        lit("\u0000"))) :+ lit(seed): _*)
    val u = (conv(substring(md5(hashIn), 1, 8), 16, 10).cast("double")
      + lit(0.5)) / lit(4294967296.0) // (0,1): 1-2|u-1/2| never hits 0
    val noise = (lit(-1.0) / epsilon) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_n"))
      .select(groupCols.map(col) :+
        round(col("_n") + noise, 6).as("noisy_n"): _*)
  }

  /** Row-level companion to [[kAnonymityViolations]]: input rows
    * annotated with their equivalence-class size and `is_k_anonymous` —
    * the [[graft.ops.Dedup.exact]] agg+join shape (skew-safe; never a
    * window over full rows). Suppress (`filter(is_k_anonymous)`) or
    * generalize the flagged rows before publishing.
    */
  def annotateKAnonymity(df: DataFrame, quasiCols: Seq[String],
                         k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2)
    val reserved = Seq("class_size", "is_k_anonymous")
    val hit = df.columns.toSet.intersect(reserved.toSet)
    require(hit.isEmpty,
      s"annotateKAnonymity reserves ${reserved.mkString(", ")}; " +
        s"rename the input columns: ${hit.mkString(", ")}")
    val sizes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
    val l = df.as("_l")
    val cond = quasiCols.map(c => col(s"_l.$c") <=> col(s"_r.$c"))
      .reduce(_ && _)
    l.join(sizes.as("_r"), cond)
      .select(df.columns.map(c => col(s"_l.$c")) ++
        Seq(col("class_size"), (col("class_size") >= k).as("is_k_anonymous")): _*)
  }
}
