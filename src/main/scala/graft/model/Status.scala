package graft.model

/** Crawl-state enum.
  *
  * Mirrors the reference's `core/.../persistence/Status.java:19-24`
  * (`DISCOVERED | FETCHED | FETCH_ERROR | REDIRECTION | ERROR`) and the
  * HTTP-code mapping `Status.fromHTTPCode` (`Status.java:26-34`).
  *
  * Represented as a plain `String` column in DataFrames so that predicates
  * on it push down to parquet; this object is the single source of truth
  * for the legal values.
  */
object Status {
  val Discovered  = "DISCOVERED"
  val Fetched     = "FETCHED"
  val FetchError  = "FETCH_ERROR"
  val Redirection = "REDIRECTION"
  val Error       = "ERROR"

  val all: Seq[String] = Seq(Discovered, Fetched, FetchError, Redirection, Error)

  /** 200/304 -> FETCHED, 3xx -> REDIRECTION, else FETCH_ERROR
    * (reference `Status.java:26-34`). */
  def fromHttpCode(code: Int): String =
    if (code == 200 || code == 304) Fetched
    else if (code >= 300 && code < 400) Redirection
    else FetchError
}
