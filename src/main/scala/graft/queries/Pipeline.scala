package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Portable

/** Composed training-data-prep pipeline (SURVEY.md §2.G): the
  * operators are not just standalone queries — this chains exact
  * dedup → quality scoring → token accounting into the single plan a
  * real corpus-prep job runs. One scan feeds the dedup digests; only
  * survivors pay the feature computation (filter first, then score).
  */
object Pipeline extends QueryPack {

  /** The pipeline's quality features over a `text` column — shared by
    * the batch query (p1) and the streaming curation path
    * (graft.streaming.DataPrep), so both filter on the same score. */
  def withQuality(df: DataFrame): DataFrame =
    df.withColumn("w", Portable.words(col("text")))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("stop_ratio",
        when(col("n_words") === 0, 0.0).otherwise(
          size(filter(col("w"), w =>
            array_contains(array(Seq("the", "a", "of", "and", "to").map(lit): _*), w)))
            .cast("double") / col("n_words")))
      .withColumn("punct_ratio",
        (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .cast("double") / length(col("text")))
      .withColumn("quality",
        col("stop_ratio") * 0.4 +
          least(col("n_words").cast("double") / 100.0, lit(1.0)) * 0.4 +
          (lit(1.0) - col("punct_ratio")) * 0.2)
      .drop("w")

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // documents ∪ synthetic exact copies → survivors (min doc_id per
    // normalized digest) → quality features → keep quality ≥ 0.5 →
    // token counts. The dedup shuffle carries 16-byte digests; the
    // feature stage is map-side on survivors only.
    "p1_dataprep" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val corpus = docs.unionAll(
        docs.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 100000L))
      val surv = corpus
        .select(col("doc_id"), Portable.md5hex(Portable.normText(col("text"))).as("h"))
        .groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
        .select(col("keep_id"))
      withQuality(corpus.join(surv, corpus("doc_id") === surv("keep_id"), "left_semi"))
        .filter(col("quality") >= 0.5)
        .select(col("doc_id"), col("n_words"), col("quality"),
          Portable.hash60(Portable.normText(col("text"))).as("fp60"))
        .orderBy(col("doc_id"))
    }
  )

  def oracle: Map[String, String] = Map(
    "p1_dataprep" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |surv AS (
        |  SELECT min(doc_id) AS keep_id
        |  FROM corpus
        |  GROUP BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))),
        |kept AS (
        |  SELECT c.doc_id, c.text,
        |    CASE WHEN trim(c.text) = '' THEN []::VARCHAR[]
        |      ELSE regexp_split_to_array(trim(c.text), '\s+') END AS w
        |  FROM corpus c JOIN surv ON c.doc_id = surv.keep_id),
        |feat AS (
        |  SELECT doc_id, text, len(w) AS n_words,
        |    CASE WHEN len(w) = 0 THEN 0.0
        |      ELSE len(list_filter(w, x -> list_contains(['the','a','of','and','to'], x)))::DOUBLE / len(w) END AS stop_ratio,
        |    (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
        |      / length(text) AS punct_ratio
        |  FROM kept)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  stop_ratio * 0.4 + least(n_words::DOUBLE / 100.0, 1.0) * 0.4 +
        |    (1.0 - punct_ratio) * 0.2 AS quality,
        |  ('0x' || substring(md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))), 1, 15))::BIGINT AS fp60
        |FROM feat
        |WHERE stop_ratio * 0.4 + least(n_words::DOUBLE / 100.0, 1.0) * 0.4 +
        |    (1.0 - punct_ratio) * 0.2 >= 0.5
        |ORDER BY doc_id""".stripMargin
  )
}
