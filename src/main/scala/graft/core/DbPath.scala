package graft.core

/**
 * 4-part dotted table address `SERVER.DATABASE.SCHEMA.TABLE`, parsed
 * positionally with empty segments allowed (`SERVER...TABLE`)
 * (reference: diepy/core.py:28-51, README.md:27-38).
 *
 * Reference-exact quirks reproduced:
 *  - 3 parts mean SERVER.DATABASE.SCHEMA (schema, not table);
 *  - only DATABASE (3/4 parts) and SCHEMA (4 parts) normalize empty
 *    segments to None; SERVER and TABLE keep empty strings verbatim;
 *  - more than 4 parts parses to all-None (no branch matches).
 */
final case class DbPath(
    server: Option[String],
    database: Option[String],
    schema: Option[String],
    table: Option[String]) {
  /** schema-qualified table name used by the JDBC leg. */
  def qualified(tableName: String): String =
    schema.map(sch => s"$sch.$tableName").getOrElse(tableName)
}

object DbPath {
  def parse(path: String): DbPath = {
    val p = path.split("\\.", -1)
    def opt(s: String): Option[String] = Option(s).filter(_.nonEmpty)
    p.length match {
      case 1 => DbPath(Some(p(0)), None, None, None)
      case 2 => DbPath(Some(p(0)), Some(p(1)), None, None)
      case 3 => DbPath(Some(p(0)), opt(p(1)), Some(p(2)), None)
      case 4 => DbPath(Some(p(0)), opt(p(1)), opt(p(2)), Some(p(3)))
      case _ => DbPath(None, None, None, None)
    }
  }
}
