package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed core entities (SURVEY §1.2): `Dataset[T]` case classes where
  * compile-time safety pays — the catalog tables and testdata rows. Schemas
  * use honest types (real arrays, booleans, timestamps), replacing the
  * reference's stringified-list storage (`paper_processing.py:158-160`).
  * `DataFrame` remains the interchange type everywhere schemas are dynamic.
  */
case class Paper(
    paper_id: String,
    title: Option[String],
    paper_path: String,
    doi: String,
    date: String,
    authors: Seq[String],
    affiliations: Seq[String],
    abstractText: Option[String])

case class Paragraph(paragraph_id: String, body_text: String, paper_id: String)

case class Annotation(
    text: String,
    biluo: Seq[String],
    has_entity: Boolean)

case class Document(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

case class EmbeddingRow(vec_id: Long, embedding: Seq[Float], label: Int)

object Model {

  /** Typed view of the documents table. */
  def documents(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents").as[Document]
  }

  /** Typed view of the embeddings table. */
  def embeddings(spark: SparkSession, dir: String): Dataset[EmbeddingRow] = {
    import spark.implicits._
    graft.Tables(spark, dir, "embeddings").as[EmbeddingRow]
  }

  /** Typed papers/paragraphs from the XML ingestion (E1). */
  def papers(df: DataFrame): Dataset[Paper] = {
    import df.sparkSession.implicits._
    df.withColumnRenamed("abstract", "abstractText").as[Paper]
  }

  def paragraphs(df: DataFrame): Dataset[Paragraph] = {
    import df.sparkSession.implicits._
    df.as[Paragraph]
  }
}
