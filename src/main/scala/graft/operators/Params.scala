package graft.operators

/** Query-parameter binding with defaults (O11 in SURVEY.md §2;
  * `internal/writer/get_locations.go:16-26,40-53`): the reference parses
  * `limit`/`offset` with defaults 10/0 and turns a non-integer into an
  * HTTP 400. Engine-side this is typed parameter binding: absent → the
  * default, malformed → a typed error the API layer maps to 400.
  */
object Params {

  final case class BadParam(name: String, raw: String)
      extends IllegalArgumentException(
        s"query parameter '$name' is not an integer: '$raw'")

  /** Parse one integer parameter with the reference's semantics. */
  def intParam(params: Map[String, String], name: String, default: Int): Int =
    params.get(name) match {
      case None => default
      case Some(raw) => raw.toIntOption.getOrElse(throw BadParam(name, raw))
    }

  /** The reference's page-request shape: limit default 10, offset 0,
    * both non-negative.
    */
  def pageParams(params: Map[String, String]): (Int, Int) = {
    val limit = intParam(params, "limit", 10)
    val offset = intParam(params, "offset", 0)
    require(limit >= 0 && offset >= 0, s"negative page bounds: $limit/$offset")
    (limit, offset)
  }
}
