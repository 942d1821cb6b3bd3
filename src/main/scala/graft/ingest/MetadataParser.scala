package graft.ingest

import graft.functions.TextFunctions._
import graft.model.Schemas
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OpenAire payload → article rows, set-at-a-time.
  *
  * Re-expresses the reference's row-loop parser
  * (`src/research_index_backend/parser.py:96-192`) as one declarative column
  * pipeline: `explode(results)` fans out articles (G2), `posexplode`-style
  * array transforms repair author names in place (F5), and all string
  * repair runs inside whole-stage codegen (clean_html / python_title are
  * native Expressions, graft.functions).
  *
  * Everything here is a narrow transformation — no shuffle. At 100 TB the
  * parse stage is embarrassingly parallel over input splits.
  */
object MetadataParser {

  /** Author-name repair, reference `parser.py:11-69`. Applied to one element
    * of the exploded authors array.
    *
    * Steps (order matters, golden-tested in reference tests/test_parser.py):
    *  1. orcid: explicit field, else pid.id.value when scheme ∈
    *     {orcid, orcid_pending}
    *  2. title-case name/surname (Python str.title semantics)
    *  3. mutual containment strip (surname containing first name loses it,
    *     and vice versa)
    *  4. both empty → split `$` ("fullName") only when exactly 2 tokens
    *  5. surname-only → clean_html then split on narrow-nbsp, else space:
    *     2 tokens → (first, last); >2 → (first, rest); else null
    *  6. null-out authors with missing first or last name (parser returns
    *     None → dropped)
    */
  def repairedAuthors(authors: Column): Column = {
    val repaired = transform(authors, a => {
      val pidOrcid = when(
        a.getField("pid").getField("id").getField("scheme")
          .isin("orcid", "orcid_pending"),
        a.getField("pid").getField("id").getField("value"))
      val orcid = pidOrcid // fixture payloads carry no bare `orcid` field
      val tFirst = python_title(coalesce(a.getField("name"), lit("")))
      val tLast = python_title(coalesce(a.getField("surname"), lit("")))
      // mutual containment strip (python `in` = substring)
      val lastStripped = when(tLast.contains(tFirst) && tFirst =!= "",
        trim(replace(tLast, tFirst, lit("")))).otherwise(tLast)
      val firstStripped = when(tFirst.contains(lastStripped) && lastStripped =!= "",
        trim(replace(tFirst, lastStripped, lit("")))).otherwise(tFirst)

      // fallback: split the legacy `$` field if exactly two whitespace
      // tokens. NOT fullName — the reference ignores fullName here, and its
      // golden test pins {"fullName": "not a name"} -> dropped.
      val dollar = a.getField("$")
      val dTok = split(trim(dollar), "\\s+")
      val useDollar = firstStripped === "" && lastStripped === "" &&
        dollar.isNotNull && size(dTok) === 2
      val f1 = when(useDollar, element_at(dTok, 1)).otherwise(firstStripped)
      val l1 = when(useDollar, element_at(dTok, 2)).otherwise(lastStripped)

      // surname-only repair: clean_html, split on U+202F else space
      val lClean = clean_html(l1)
      val nbTok = split(lClean, "\u202f")
      val spTok = split(lClean, " ")
      val tok = when(size(nbTok) > 1, nbTok).otherwise(spTok)
      val needSplit = l1 =!= "" && f1 === ""
      val f2 = when(needSplit && size(tok) >= 2, element_at(tok, 1)).otherwise(f1)
      val l2 = when(needSplit && size(tok) === 2, element_at(tok, 2))
        .when(needSplit && size(tok) > 2, array_join(slice(tok, lit(2), size(tok) - 1), " "))
        .when(needSplit, lit(null))
        .otherwise(l1)

      val valid = f2.isNotNull && f2 =!= "" && l2.isNotNull && l2 =!= ""
      when(valid, struct(
        f2.as("first_name"),
        l2.as("last_name"),
        when(orcid.isNotNull, concat(lit("https://orcid.org/"), orcid))
          .as("orcid"),
        coalesce(a.getField("rank"), lit(1)).as("rank")))
    })
    filter(repaired, _.isNotNull)
  }

  /** Full envelope parse (G2 fan-out + per-article fields), reference
    * `parser.py:96-192`. Input: one row per payload with columns
    * (doi, json_payload string) or already-parsed (doi, envelope struct).
    *
    * @param citedByCountYear injected clock (reference stamps
    *   `datetime.now().year`, parser.py:187 — injectable for determinism,
    *   SURVEY.md §7.5.1)
    */
  def parseEnvelope(raw: DataFrame, jsonCol: String = "payload",
                    doiCol: String = "doi",
                    openAlex: Option[DataFrame] = None,
                    citedByCountYear: Option[Int] = None): DataFrame = {
    val env = raw.withColumn("_env",
      from_json(col(jsonCol), Schemas.openAireEnvelope))
    val art = env
      .select(col(doiCol).as("doi"), explode(col("_env.results")).as("r"))
    val d = to_date(col("r.publicationDate"))
    val rt = col("r.resourcetype")
    val parsed = art.select(
      col("doi"),
      // cleaned TWICE, matching the reference (parser.py:110 cleans at parse,
      // parser.py:174 cleans again building AnonymousArticle). Not idempotent:
      // '&lt;b&gt;x&lt;/b&gt;' -> pass 1 unescapes to '<b>x</b>', pass 2
      // strips the now-literal tags.
      clean_html(clean_html(col("r.mainTitle"))).as("title"),
      // reference parse_metadata does NOT clean the abstract (parser.py:127)
      element_at(col("r.descriptions"), 1).as("abstract"),
      repairedAuthors(col("r.authors")).as("authors"),
      coalesce(clean_html(col("r.journal.$")), lit("")).as("journal"),
      lit(null).cast("int").as("issue"),
      lit(null).cast("int").as("volume"),
      year(d).as("publication_year"),
      month(d).as("publication_month"),
      dayofmonth(d).as("publication_day"),
      col("r.publisher").as("publisher"),
      col("r.type").as("result_type"),
      when(rt.getField("@schemeid").isin(
        "dnet:result_typologies", "dnet:publication_resource"),
        rt.getField("@classname")).as("resource_type"))

    val withAlex = openAlex match {
      case Some(oa) =>
        parsed.join(
          broadcast(oa.select(col("doi"),
            col("id").as("openalex"), col("cited_by_count"))),
          Seq("doi"), "left_outer")
      case None =>
        parsed.withColumn("openalex", lit(null).cast("string"))
          .withColumn("cited_by_count", lit(null).cast("long"))
    }
    val yearCol = citedByCountYear
      .map(y => lit(y)).getOrElse(year(current_date()))
    withAlex.withColumn("cited_by_count_date", yearCol)
  }

  /** Adapt one legacy `@`-attribute creator (`tests/fixtures/authors.json`,
    * `zenodo.json` `creator[]`) to the modern author shape consumed by
    * [[repairedAuthors]]: `@name`/`@surname` → name/surname, string `@rank`
    * → int, `@orcid` (else `@orcid_pending`) → pid.id.{scheme, value}, `$`
    * passes through as the fallback "Surname, First" text.
    */
  def legacyCreators(creators: Column): Column =
    transform(creators, c => struct(
      c.getField("@name").as("name"),
      c.getField("@surname").as("surname"),
      lit(null).cast("string").as("fullName"),
      c.getField("$").as("$"),
      c.getField("@rank").cast("int").as("rank"),
      struct(struct(
        when(c.getField("@orcid").isNotNull, "orcid")
          .when(c.getField("@orcid_pending").isNotNull, "orcid_pending")
          .as("scheme"),
        coalesce(c.getField("@orcid"), c.getField("@orcid_pending"))
          .as("value")).as("id")).as("pid")))

  /** Legacy search-envelope parse (`tests/fixtures/zenodo.json`,
    * FIXTURES.md §3): `response.results.result[]` fan-out with `$`-wrapped
    * scalars, emitting the SAME article columns as [[parseEnvelope]] so the
    * two payload generations land in one table. The DOI comes from the
    * result's own pid list (first `@classid = "doi"` entry), not from a
    * request-side column.
    */
  def parseLegacyEnvelope(raw: DataFrame, jsonCol: String = "payload",
                          citedByCountYear: Option[Int] = None): DataFrame = {
    val art = raw
      .withColumn("_env", from_json(col(jsonCol), Schemas.legacyEnvelope))
      .select(explode(col("_env.response.results.result")).as("r"))
      .select(col("r.metadata.`oaf:entity`.`oaf:result`").as("o"))
    val d = to_date(col("o.dateofacceptance.$"))
    val rt = col("o.resulttype")
    val res = col("o.resourcetype")
    art.select(
      element_at(filter(col("o.pid"),
        p => p.getField("@classid") === "doi"), 1).getField("$").as("doi"),
      clean_html(clean_html(col("o.title.$"))).as("title"),
      col("o.description.$").as("abstract"),
      repairedAuthors(legacyCreators(col("o.creator"))).as("authors"),
      coalesce(clean_html(col("o.journal.$")), lit("")).as("journal"),
      lit(null).cast("int").as("issue"),
      lit(null).cast("int").as("volume"),
      year(d).as("publication_year"),
      month(d).as("publication_month"),
      dayofmonth(d).as("publication_day"),
      col("o.publisher.$").as("publisher"),
      // legacy resulttype rides dnet:result_typologies with the type in
      // @classid (the modern envelope's plain `type` string)
      when(rt.getField("@schemeid") === "dnet:result_typologies",
        rt.getField("@classid")).as("result_type"),
      when(res.getField("@schemeid").isin(
        "dnet:result_typologies", "dnet:publication_resource"),
        res.getField("@classname")).as("resource_type"))
      .withColumn("openalex", lit(null).cast("string"))
      .withColumn("cited_by_count", lit(null).cast("long"))
      .withColumn("cited_by_count_date", citedByCountYear
        .map(y => lit(y)).getOrElse(year(current_date())))
  }
}
