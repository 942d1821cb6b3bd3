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
    // adjacent-pair alternation via zip of the role list with itself
    // shifted by one; vacuously true below 2 turns
    val alternates = when(n < 2, lit(true)).otherwise(
      forall(zip_with(slice(r, lit(1), n - 1), slice(r, lit(2), n - 1),
        (a, b) => a =!= b), x => x))
    dialogs
      .withColumn("n_turns", n.cast("long"))
      .withColumn("starts_with_user",
        n > 0 && element_at(r, 1) === "user")
      .withColumn("ends_with_assistant",
        n > 0 && element_at(r, -1) === "assistant")
      .withColumn("alternates", alternates)
      .withColumn("all_nonempty",
        forall(t, x => length(trim(x.getField("content"))) > 0))
      .withColumn("valid",
        col("n_turns") >= 2 && col("starts_with_user") &&
          col("ends_with_assistant") && col("alternates") &&
          col("all_nonempty"))
  }

  /** Render each dialog to ONE training text:
    * `<rolePrefix>role<roleSuffix>content` per turn, joined by `sep` —
    * the flattening step before tokenization/packing. Pure string
    * expression; exact cross-engine.
    *
    * @return input columns + `rendered_text` + `n_render_chars`
    */
  def renderDialogs(dialogs: DataFrame, idCol: String = "dialog_id",
                    turnsCol: String = "turns",
                    rolePrefix: String = "<|", roleSuffix: String = "|>",
                    sep: String = "\n"): DataFrame = {
    val rendered = array_join(
      transform(coalesce(col(turnsCol), array()),
        t => concat(lit(rolePrefix), t.getField("role"), lit(roleSuffix),
          t.getField("content"))), sep)
    dialogs
      .withColumn("rendered_text", rendered)
      .withColumn("n_render_chars", length(rendered).cast("long"))
  }
}
