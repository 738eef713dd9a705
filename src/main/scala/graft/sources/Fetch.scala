package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** S2–S4 — the side-effecting fetch stage (SURVEY §3 E4: JSONL scan →
  * anti-join manifest → pooled HTTP fetch → validated sink) as Spark
  * dataflow: `mapPartitions` with ONE client per partition (the reference's
  * `Pool(8)` of pycurl handles, `papers_download.py:72-171`), per-row
  * try/fail status, and a **manifest table** replacing the reference's
  * `.pdf.gz`/`.fail` filesystem markers — the scalable idempotency pattern
  * (anti-join the manifest to resume; SURVEY §4.1).
  *
  * The client is pluggable and the default is a deterministic STUB (no
  * network in this environment; a real client drops in without touching the
  * plan). Payload validation (the PyPDF2 check, `papers_download.py:141-146`)
  * is a predicate on the fetched bytes.
  */
object Fetch {

  /** Pluggable transport. Implementations must be Serializable (constructed
    * per partition, used for every row in it). */
  trait Client extends Serializable {
    def get(url: String): Either[String, Array[Byte]]
  }

  /** Deterministic stub: "fetches" the url's bytes; fails urls containing
    * "bad" (error path), returns invalid payloads for urls containing
    * "corrupt" (validation path). */
  final class StubClient extends Client {
    override def get(url: String): Either[String, Array[Byte]] =
      if (url.contains("bad")) Left("connection refused")
      else if (url.contains("corrupt")) Right(Array[Byte](0, 1, 2))
      else Right(s"%PDF-$url".getBytes("UTF-8"))
  }

  case class FetchResult(id: String, status: String, n_bytes: Int, error: String)

  /** Fetch every (id, url) row; returns the manifest. `validate` is the
    * payload check (reference: "is it a parseable PDF"). Statuses:
    * `ok`, `invalid`, `fail`. */
  def fetchAll(input: DataFrame, client: () => Client,
      validate: Array[Byte] => Boolean = _.startsWith("%PDF".getBytes("UTF-8"))): Dataset[FetchResult] = {
    import input.sparkSession.implicits._
    val idIdx = input.schema.fieldIndex("id")
    val urlIdx = input.schema.fieldIndex("url")
    input.mapPartitions { rows =>
      val c = client() // one client per partition, like the reference's pool worker
      rows.map { r =>
        val id = r.getString(idIdx)
        c.get(r.getString(urlIdx)) match {
          case Left(err) => FetchResult(id, "fail", 0, err)
          case Right(bytes) if !validate(bytes) => FetchResult(id, "invalid", bytes.length, "validation failed")
          case Right(bytes) => FetchResult(id, "ok", bytes.length, null)
        }
      }
    }
  }

  /** One resumable pass: skip ids already `ok` in the manifest, fetch the
    * rest, return the union'd new manifest (the E4 loop body). */
  def resumePass(input: DataFrame, manifest: DataFrame, client: () => Client): DataFrame = {
    val done = manifest.filter(col("status") === "ok").select("id")
    val todo = input.join(done, Seq("id"), "left_anti")
    manifest.unionByName(fetchAll(todo, client).toDF())
  }

  /** S3 — link extraction from fetched HTML (the SERP-result scrape step,
    * `papers_download.py:103-127`: pull candidate PDF links out of result
    * pages): one codegen projection per page. `href`/`src` attribute values
    * are matched with a quote-aware regex (no DOM — the reference's own
    * extraction is regex-grade, and a full parser would be a per-row UDF for
    * no plan benefit).
    *
    * Resolution follows urljoin semantics for the common cases: absolute
    * http(s) kept; protocol-relative `//host/p` gets the base's scheme;
    * root-relative `/p` resolves against the base's ORIGIN; anything else
    * appends to the base treated as a directory. A null base leaves
    * non-absolute links untouched. Output: array<string>, distinct after
    * absolutizing (two raw spellings of one URL collapse), first-appearance
    * order. */
  def extractLinks(htmlCol: org.apache.spark.sql.Column,
      baseUrlCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val attrPattern = "(?i)(?:href|src)\\s*=\\s*[\"']([^\"'<>]+)[\"']"
    val raw = regexp_extract_all(htmlCol, lit(attrPattern), lit(1))
    val scheme = regexp_extract(baseUrlCol, "^(https?):", 1)
    val origin = regexp_extract(baseUrlCol, "^(https?://[^/]+)", 1)
    val baseDir = regexp_replace(baseUrlCol, "/+$", "")
    val resolved = transform(raw, u =>
      when(u.rlike("^https?://") || baseUrlCol.isNull, u)
        .when(u.startsWith("//"), concat(scheme, lit(":"), u))
        .when(u.startsWith("/"), concat(origin, u))
        .otherwise(concat(baseDir, lit("/"), u)))
    array_distinct(resolved)
  }
}
