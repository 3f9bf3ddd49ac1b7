package graft.arxiv

import org.apache.spark.sql.types._

/** Google-Scholar lookup client (SURVEY §2.1 S4). The reference calls
  * SerpAPI row-at-a-time inside its task loops
  * (process_publications_dag.py:141-157,181-199); here the client is a
  * pluggable trait invoked from `mapPartitions` — side effects batched per
  * partition, retry/backoff inside the client, never a per-row UDF in a
  * select. Config is injected (no hardcoded keys — the reference's leaked
  * literal key is an explicitly-not-replicated defect, SURVEY §0).
  */
trait ScholarClient extends Serializable {
  /** Raw JSON response for a query, or None on unrecoverable failure. */
  def search(query: String): Option[String]
}

object Scholar {
  /** Schema of the SerpAPI-shaped response fields the pipeline reads
    * (py:216-221,237-239,447-453): parse with from_json, then explode.
    */
  private val authorStruct = StructType(Seq(StructField("name", StringType)))
  private val publicationInfo = StructType(Seq(
    StructField("summary", StringType),
    StructField("authors", ArrayType(authorStruct))))
  private val organicResult = StructType(Seq(
    StructField("title", StringType),
    StructField("link", StringType),
    StructField("result_id", StringType),
    StructField("snippet", StringType),
    StructField("publication_info", publicationInfo)))
  // the commented-out transform tasks read a 'results'-keyed shape with
  // bib_entry/authors (py:272-273,332-333)
  private val bibResult = StructType(Seq(
    StructField("bib_entry", StringType),
    StructField("authors", ArrayType(StringType))))

  val responseSchema: StructType = StructType(Seq(
    StructField("organic_results", ArrayType(organicResult)),
    StructField("results", ArrayType(bibResult))))

  /** Retry with exponential backoff on a retryable failure — the
    * reference's 5-attempt `2**attempt`-seconds policy (py:143-151).
    */
  def withRetry[T](maxAttempts: Int = 5,
      sleepMs: Int => Long = (a: Int) => (1L << a) * 1000)(
      f: => Option[T]): Option[T] = {
    var attempt = 0
    var out: Option[T] = None
    while (out.isEmpty && attempt < maxAttempts) {
      out = f
      if (out.isEmpty) {
        attempt += 1
        if (attempt < maxAttempts) Thread.sleep(sleepMs(attempt))
      }
    }
    out
  }
}

/** Real SerpAPI-shaped HTTP client (the production implementation of the
  * lookup stage, process_publications_dag.py:141-157,181-199). All config
  * is injected — the API key comes from the caller (e.g. `SparkConf` /
  * env), never a literal. Retries the reference's policy: `maxAttempts`
  * with `2^attempt`-seconds backoff on HTTP 429/5xx.
  *
  * One instance per executor partition (instantiate inside mapPartitions
  * via [[graft.arxiv.Enrich.fetchResponses]]); java.net.http is used so
  * the library adds no dependencies. Untestable in this offline container
  * — [[Scholar.withRetry]] and the response parsing are covered with
  * [[MockScholarClient]].
  */
final class HttpScholarClient(
    baseUrl: String,
    apiKey: String,
    resultsPerQuery: Int = 2,
    maxAttempts: Int = 5,
    timeoutMs: Long = 30000) extends ScholarClient {

  @transient private lazy val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()

  override def search(query: String): Option[String] =
    Scholar.withRetry(maxAttempts) {
      val url = baseUrl + "?engine=google_scholar&start=0&hl=en" +
        s"&num=$resultsPerQuery" +
        "&q=" + java.net.URLEncoder.encode(query, "UTF-8") +
        "&api_key=" + java.net.URLEncoder.encode(apiKey, "UTF-8")
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
      try {
        val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        resp.statusCode() match {
          case 200 => Some(resp.body())
          case 429 => None // retryable (rate limit) — backoff then retry
          case c if c >= 500 => None // retryable server error
          case _ => Some(null) // non-retryable: give up without retry
        }
      } catch {
        case _: java.io.IOException => None // retryable network failure
      }
    }.flatMap(Option(_))
}

/** Deterministic offline stand-in for SerpAPI: fabricates a plausible
  * 2-result response derived only from the query string (stable across
  * runs/executors). Used by tests and the default pipeline config — the
  * container has no egress; a real HTTP client would implement
  * [[ScholarClient]] with `Scholar.withRetry` around the GET.
  */
final class MockScholarClient(resultsPerQuery: Int = 2) extends ScholarClient {
  private def h(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .take(6).map("%02x".format(_)).mkString

  /** Full JSON string escaping — arXiv titles carry backslashes (TeX) and
    * quotes; anything less produces invalid JSON that from_json nulls out,
    * silently dropping those rows from enrichment.
    */
  private def jstr(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  override def search(query: String): Option[String] = {
    val results = (0 until resultsPerQuery).map { i =>
      val tag = h(s"$query#$i")
      // result 0 echoes the queried title (exercises the ON CONFLICT
      // (title) DO UPDATE path); the rest are novel fabricated titles
      val title = if (i == 0) query else s"Study of $query ($tag)"
      val doi = if (tag(0) % 2 == 0) s""""result_id": "SR$tag",""" else """"result_id": "","""
      s"""{
         |  "title": "${jstr(title)}",
         |  "link": "https://scholar.example/$tag",
         |  $doi
         |  "snippet": "snippet $tag",
         |  "publication_info": {
         |    "summary": "A ${tag.take(3)} - Journal of $tag, 201${i % 10}",
         |    "authors": [{"name": "A ${tag.take(3)}"}, {"name": "B ${tag.slice(3, 6)}"}]
         |  }
         |}""".stripMargin
    }
    val bib = s"""{"bib_entry": "@article{${h(query)}}", "authors": ["A ${h(query).take(3)}"]}"""
    Some(s"""{"organic_results": [${results.mkString(",")}], "results": [$bib]}""")
  }
}
