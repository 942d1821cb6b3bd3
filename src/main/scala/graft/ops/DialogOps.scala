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
}
