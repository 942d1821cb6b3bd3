package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conversation (chat / instruction) training-data operators.
  *
  * Dialogs arrive as `array<struct<role: string, content: string>>` — the
  * interchange shape of every chat-tuning corpus. Validation and
  * rendering are pure higher-order-function pipelines (codegen'd, no
  * UDFs), so both are exact-oracle-checkable and run as one narrow pass
  * at any corpus size.
  */
object DialogOps {

  private def roles(turns: Column): Column =
    transform(turns, t => t.getField("role"))

  /** Structural validation flags per dialog — the gate a chat corpus
    * runs before rendering (malformed role sequences silently teach the
    * model the wrong turn structure):
    *
    *  - `n_turns`
    *  - `starts_with_user`  (first role = "user")
    *  - `ends_with_assistant` (last role = "assistant")
    *  - `alternates`        (no two consecutive turns share a role)
    *  - `all_nonempty`      (every content non-blank after trim)
    *  - `valid`             (all of the above AND n_turns >= 2)
    *
    * One narrow codegen pass; null dialogs get n_turns = 0 and
    * valid = false.
    */
  def validateDialogs(dialogs: DataFrame, idCol: String = "dialog_id",
                      turnsCol: String = "turns"): DataFrame = {
    val t = coalesce(col(turnsCol), array())
    val r = roles(t)
    val n = size(t)
    // every flag is NULL-PROOF (coalesce to false inside each lambda /
    // comparison): a null role or null content is a DEFECT, and three-
    // valued logic would otherwise make the flags NULL — a dialog that
    // passes neither filter(valid) nor filter(!valid), vanishing from
    // both the accept set and the reject audit
    val alternates = when(n < 2, lit(true)).otherwise(
      forall(zip_with(slice(r, lit(1), n - 1), slice(r, lit(2), n - 1),
        (a, b) => coalesce(a =!= b, lit(false))), x => x))
    dialogs
      .withColumn("n_turns", n.cast("long"))
      .withColumn("starts_with_user",
        coalesce(n > 0 && element_at(r, 1) === "user", lit(false)))
      .withColumn("ends_with_assistant",
        coalesce(n > 0 && element_at(r, -1) === "assistant", lit(false)))
      .withColumn("alternates", alternates)
      .withColumn("all_nonempty",
        forall(t, x =>
          coalesce(length(trim(x.getField("content"))) > 0, lit(false))))
      .withColumn("valid",
        col("n_turns") >= 2 && col("starts_with_user") &&
          col("ends_with_assistant") && col("alternates") &&
          col("all_nonempty"))
  }

  /** Render each dialog to ONE training text:
    * `<rolePrefix>role<roleSuffix>content` per turn, joined by `sep` —
    * the flattening step before tokenization/packing. Pure string
    * expression; exact cross-engine. Null roles/contents render as ""
    * INSIDE their turn (the tag structure survives) — a plain `concat`
    * would null the whole element and `array_join` would then silently
    * drop the turn, corrupting the sample's turn structure; gate with
    * [[validateDialogs]] first if such dialogs should not render at all.
    *
    * @return input columns + `rendered_text` + `n_render_chars`
    */
  def renderDialogs(dialogs: DataFrame, idCol: String = "dialog_id",
                    turnsCol: String = "turns",
                    rolePrefix: String = "<|", roleSuffix: String = "|>",
                    sep: String = "\n"): DataFrame = {
    val rendered = array_join(
      transform(coalesce(col(turnsCol), array()),
        t => concat(lit(rolePrefix), coalesce(t.getField("role"), lit("")),
          lit(roleSuffix), coalesce(t.getField("content"), lit("")))), sep)
    dialogs
      .withColumn("rendered_text", rendered)
      .withColumn("n_render_chars", length(rendered).cast("long"))
  }

  /** Dialog-level DECONTAMINATION — the eval-leak gate chat corpora need
    * exactly as document corpora do: a benchmark prompt pasted into ANY
    * turn leaks the eval set into training. Composes [[renderDialogs]]
    * (one text per dialog) with [[Dedup.decontaminate]]'s word-n-gram
    * shingle gate: every n-gram INSIDE a turn's content survives
    * rendering verbatim, so a leaked eval passage of
    * ≥ n + minSharedShingles − 1 words is caught whichever turn carries
    * it (a role tag fuses only with the single content word it abuts,
    * perturbing just the ≤ n−1 shingles that span a turn boundary — an
    * in-content leak never rides those).
    *
    * Scale shape = decontaminate's: the eval side is benchmark-sized and
    * broadcasts as an exploded shingle index; the dialog side renders
    * and explodes once, no self-join. Returns one row per contaminated
    * dialog — anti-join on `train_id` to clean.
    *
    * @return (train_id = dialog id, eval_id, n_shared)
    */
  def decontaminateDialogs(dialogs: DataFrame, eval: DataFrame, n: Int = 3,
                           minSharedShingles: Int = 2,
                           idCol: String = "dialog_id",
                           turnsCol: String = "turns",
                           evalIdCol: String = "doc_id",
                           evalTextCol: String = "text",
                           md5Seam: Boolean = false): DataFrame =
    Dedup.decontaminate(
      renderDialogs(dialogs, idCol, turnsCol)
        .select(col(idCol), col("rendered_text")),
      eval.select(col(evalIdCol).as(idCol),
        col(evalTextCol).as("rendered_text")),
      n, minSharedShingles, idCol, "rendered_text", md5Seam)

  /** Context-budget truncation: keep the leading system turn (if any)
    * plus the LONGEST SUFFIX of the remaining turns whose total content
    * cost fits `budget` — the standard chat-corpus fitting rule (recent
    * turns carry the signal; the system prompt is never dropped, even
    * when it alone exceeds the budget, because silently removing it
    * changes the sample's meaning rather than its length).
    *
    * Cost is content CHARACTER count (swap in a token-count column
    * upstream by pre-rendering if needed). Suffix feasibility is
    * monotone — if the suffix starting at turn s fits, every shorter
    * suffix fits — so the cut point is `count of fitting suffixes`,
    * computed with pure higher-order functions: O(n²) adds per dialog
    * where n is the dialog's own turn count (bounded by format, never
    * by corpus size), all inside one narrow codegen pass. No explode,
    * no shuffle, no state.
    *
    * @return input + `turns_kept` (array), `n_kept`, `kept_chars`
    *         (content chars of kept turns, system included)
    */
  def truncateDialogs(dialogs: DataFrame, budget: Int,
                      turnsCol: String = "turns"): DataFrame = {
    require(budget >= 0, s"need budget >= 0 (got $budget)")
    val reserved = Seq("turns_kept", "n_kept", "kept_chars")
    val hit = dialogs.columns.toSet.intersect(reserved.toSet)
    require(hit.isEmpty,
      s"truncateDialogs reserves ${reserved.mkString(", ")}; rename: " +
        hit.mkString(", "))
    // costs summed as LONG: many large turns could wrap an int sum and
    // a wrapped-negative total would "fit" any budget
    def contentLen(turn: Column): Column =
      coalesce(length(turn.getField("content")).cast("long"), lit(0L))
    val t = coalesce(col(turnsCol), array())
    val hasSys = coalesce(
      size(t) > 0 && element_at(t, 1).getField("role") === "system",
      lit(false))
    val sys = slice(t, lit(1), when(hasSys, 1).otherwise(0))
    val rest = when(hasSys, slice(t, lit(2), size(t) - 1)).otherwise(t)
    val sysCost = when(hasSys, contentLen(element_at(t, 1))).otherwise(0L)
    val costs = transform(rest, contentLen(_))
    val nRest = size(rest)
    // suffix starting at 1-based s fits iff sysCost + sum(costs[s..]) <=
    // budget; s = nRest + 1 is the empty suffix (fits iff sysCost does)
    val fits = size(filter(sequence(lit(1), nRest + 1), s =>
      sysCost + aggregate(slice(costs, s, nRest - s + 1), lit(0L),
        (acc, c) => acc + c) <= budget))
    // fits = 0 only when even the bare system turn is over budget:
    // keep it anyway (see scaladoc), i.e. keep the empty suffix
    val keepFrom = nRest + lit(2) - greatest(fits, lit(1))
    val kept = concat(sys, slice(rest, keepFrom, nRest - keepFrom + 1))
    dialogs
      .withColumn("turns_kept", kept)
      .withColumn("n_kept", size(col("turns_kept")).cast("long"))
      .withColumn("kept_chars",
        aggregate(col("turns_kept"), lit(0L),
          (acc, turn) => acc + contentLen(turn).cast("long")))
  }

  /** Mask every blocklisted phrase inside every turn's content — the
    * chat-corpus form of the corpus-level AC mask (PII strings, refusal
    * templates, instruction-injection markers), applied INSIDE the turn
    * structure so roles and turn boundaries survive untouched.
    *
    * One narrow pass: the [[graft.functions.AcMaskPhrases]] kernel runs
    * once per turn content (O(content + hits) regardless of phrase
    * count), leftmost-longest overlap resolution on the original text.
    * Null contents and null turn arrays pass through unchanged —
    * masking is a rewrite, not a validity gate ([[validateDialogs]] is).
    *
    * @return input with `turnsCol` rewritten (same schema)
    */
  def maskDialogContents(dialogs: DataFrame, phrases: Seq[String],
                         mask: String = "[MASKED]",
                         turnsCol: String = "turns"): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
      "maskDialogContents needs non-empty phrases")
    import graft.functions.CorpusFunctions.ac_mask_phrases
    dialogs.withColumn(turnsCol,
      transform(col(turnsCol), t => struct(
        t.getField("role").as("role"),
        ac_mask_phrases(t.getField("content"), phrases, mask)
          .as("content"))))
  }
}
