package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-data operators for RLHF/DPO-style pipelines: turning
  * scored completions and pairwise battles into training pairs and
  * model rankings. All deterministic (tie-breaks are total orders, the
  * fitting loop is fixed-iteration), so backfills and retries are
  * idempotent — the same discipline as [[CorpusOps]].
  */
object Preference {

  /** DPO preference-pair construction: per prompt, (chosen, rejected) =
    * the strictly best- and worst-scored completions. Prompts where the
    * best and worst scores tie are DROPPED — a zero-margin pair teaches
    * the objective nothing and flips sign under resampling; DPO wants
    * chosen != rejected by construction.
    *
    * Deterministic tie-breaks inside a score class: chosen takes the
    * GREATEST completion id at the max score, rejected the LEAST at the
    * min (the two struct-extrema orders); the classes are disjoint
    * because the margin is strict, so chosen != rejected always.
    *
    * ONE narrow aggregate — `max(struct(score, completion))` /
    * `min(struct(...))` per prompt (no window over rows, no join-back);
    * group sizes are completions-per-prompt, sampler-bounded (a
    * generation run emits k completions per prompt, not a corpus).
    *
    * @param scored (prompt, completion, score) rows; nulls in any of
    *               the three drop (an unscored completion can't rank)
    * @return (prompt, chosen_id, chosen_score, rejected_id,
    *         rejected_score, margin, n_completions), margin > 0
    */
  def preferencePairs(scored: DataFrame, promptCol: String,
                      completionCol: String, scoreCol: String): DataFrame = {
    scored
      .filter(col(promptCol).isNotNull && col(completionCol).isNotNull &&
        col(scoreCol).isNotNull)
      .groupBy(col(promptCol).as("prompt"))
      .agg(
        max(struct(col(scoreCol).as("s"), col(completionCol).as("c")))
          .as("_mx"),
        min(struct(col(scoreCol).as("s"), col(completionCol).as("c")))
          .as("_mn"),
        count(lit(1)).as("n_completions"))
      .select(col("prompt"),
        col("_mx.c").as("chosen_id"), col("_mx.s").as("chosen_score"),
        col("_mn.c").as("rejected_id"), col("_mn.s").as("rejected_score"),
        (col("_mx.s") - col("_mn.s")).as("margin"),
        col("n_completions"))
      .filter(col("margin") > 0)
  }

  /** Pairwise win matrix from arena-style battles: one row per
    * UNORDERED model pair with integer win/tie counts — the exact
    * sufficient statistic every downstream ranking (win rate,
    * Bradley–Terry, Elo) consumes, so the expensive battle log is
    * scanned once and the model-pair lattice (|models|^2-bounded)
    * is what iterates.
    *
    * The pair is normalized (model_1 < model_2 lexically) so A-vs-B
    * and B-vs-A battles land in one row. `winner` must be 'a', 'b'
    * or 'tie' (relative to the ORIGINAL column order) — anything else
    * fails fast rather than silently skewing counts. Self-battles
    * (a == b) and null rows drop.
    *
    * @return (model_1, model_2, wins_1, wins_2, ties, n)
    */
  def winMatrix(battles: DataFrame, aCol: String, bCol: String,
                winnerCol: String): DataFrame = {
    val w = col(winnerCol)
    val checked = battles
      .filter(col(aCol).isNotNull && col(bCol).isNotNull && w.isNotNull &&
        col(aCol) =!= col(bCol))
      .withColumn("_w",
        when(w.isin("a", "b", "tie"), w)
          .otherwise(raise_error(concat(
            lit("winMatrix: winner must be 'a'|'b'|'tie', got "), w))))
    val aIsFirst = col(aCol) <= col(bCol)
    def cnt(c: Column): Column = coalesce(sum(when(c, 1L).otherwise(0L)),
      lit(0L))
    checked
      .select(
        least(col(aCol), col(bCol)).as("model_1"),
        greatest(col(aCol), col(bCol)).as("model_2"),
        // winner mapped onto the normalized order
        when(col("_w") === "tie", lit("tie"))
          .when((col("_w") === "a") === aIsFirst, lit("1"))
          .otherwise(lit("2")).as("_who"))
      .groupBy("model_1", "model_2")
      .agg(cnt(col("_who") === "1").as("wins_1"),
        cnt(col("_who") === "2").as("wins_2"),
        cnt(col("_who") === "tie").as("ties"),
        count(lit(1)).as("n"))
  }

  /** Bradley–Terry model strengths from pairwise battles, fit with the
    * classic MM update (Hunter 2004):
    *
    *   p_i <- W_i / sum_j n_ij / (p_i + p_j)
    *
    * where W_i counts i's wins (ties as half a win each — the standard
    * Davidson-lite treatment) and n_ij the games between i and j. A
    * fixed iteration count keeps the run deterministic; strengths are
    * normalized to MEAN 1 each round for identifiability (BT is
    * scale-free — only ratios are meaningful; the 2-player fixed point
    * is p_i/p_j = w_ij/w_ji). A model with zero wins converges to
    * strength 0 (its true MLE boundary); the guard keeps a 0+0
    * denominator from poisoning opponents with NaN.
    *
    * Scale shape: the battle log collapses to [[winMatrix]]'s pair
    * lattice FIRST; the loop then iterates on the models-sized table
    * only (the pageRank discipline — localCheckpoint per round,
    * release the previous iterate; the corpus is never re-scanned).
    * The iterate appears TWICE per round (both endpoints of every pair
    * need a strength), so GraphOps.powerIterate's "exactly one
    * reference" rule can't be met structurally — instead each round's
    * iterate is rebuilt from its checkpointed RDD with fresh default
    * stats, because a localCheckpoint'd plan INHERITS the
    * pre-checkpoint sizeInBytes and two references would square it
    * every round until Catalyst multiplies million-digit BigInts
    * during planning (observed: 8-minute planning stalls by round 25).
    *
    * @return (model, strength, wins, games) — strength double, wins
    *         includes half-ties, games = battles played
    */
  def bradleyTerry(battles: DataFrame, aCol: String, bCol: String,
                   winnerCol: String, iters: Int = 30): DataFrame = {
    require(iters >= 1, s"bradleyTerry: iters >= 1, got $iters")
    val wm = winMatrix(battles, aCol, bCol, winnerCol)
    // directed edge list over the tiny pair lattice: i's view of (i,j)
    val edges = wm.select(col("model_1").as("_i"), col("model_2").as("_j"),
        (col("wins_1") + col("ties") * lit(0.5)).as("_w"),
        col("n").as("_n"))
      .unionByName(wm.select(col("model_2").as("_i"),
        col("model_1").as("_j"),
        (col("wins_2") + col("ties") * lit(0.5)).as("_w"),
        col("n").as("_n")))
      .localCheckpoint(true) // iterated against every round
    val totals = edges.groupBy("_i")
      .agg(sum(col("_w")).as("_wins"), sum(col("_n")).as("_games"))
      .localCheckpoint(true)
    val nModels = totals.count()
    // stats-reset view over the checkpointed blocks: createDataFrame
    // attaches no origin plan, so each round's size estimate is a
    // constant, not last round's estimate squared
    def fresh(ck: DataFrame): DataFrame =
      ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
    var pCk = totals.select(col("_i"), lit(1.0).as("_p"))
      .localCheckpoint(true)
    var p = fresh(pCk)
    for (_ <- 1 to iters) {
      val pi = p.select(col("_i"), col("_p").as("_pi"))
      val pj = p.select(col("_i").as("_j"), col("_p").as("_pj"))
      val denom = edges.join(pi, Seq("_i")).join(pj, Seq("_j"))
        .groupBy("_i")
        .agg(sum(when(col("_pi") + col("_pj") > 0,
          col("_n") / (col("_pi") + col("_pj"))).otherwise(lit(0.0)))
          .as("_d"))
      val raw = totals.join(denom, Seq("_i"))
        .select(col("_i"),
          when(col("_d") > 0, col("_wins") / col("_d"))
            .otherwise(lit(0.0)).as("_p"))
      // mean-1 normalization folded into the plan (1-row crossJoin) —
      // no driver-side scalar per round
      val total = raw.agg(coalesce(sum(col("_p")), lit(0.0)).as("_t"))
      val nextCk = raw.crossJoin(total)
        .select(col("_i"),
          when(col("_t") > 0,
            col("_p") * lit(nModels.toDouble) / col("_t"))
            .otherwise(col("_p")).as("_p"))
        .localCheckpoint(true)
      pCk.unpersist()
      pCk = nextCk
      p = fresh(nextCk)
    }
    val out = totals.join(p, Seq("_i"))
      .select(col("_i").as("model"), col("_p").as("strength"),
        col("_wins").as("wins"), col("_games").as("games"))
      .localCheckpoint(true)
    pCk.unpersist(); edges.unpersist(); totals.unpersist()
    out
  }
}
