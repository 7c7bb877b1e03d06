package graft.core

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/**
 * Server-registry INI config: section `[servers]`, alias → JDBC
 * connection string. Resolution order: explicit path → `./diepy.ini`
 * → `~/diepy.ini` → error (reference: diepy/core.py:92-106,
 * README.md:7-22). The optional DATABASE address segment is appended
 * to the connection string (core.py:108-109).
 */
final case class ServerRegistry(servers: Map[String, String]) {
  def connectionString(server: String, database: Option[String]): String = {
    // the reference's SafeConfigParser lowercases option keys on both
    // store and get (optionxform) — lookups are case-insensitive
    val base = servers.getOrElse(server.toLowerCase,
      throw new IllegalArgumentException(s"No server '$server' in [servers]"))
    database match {
      case Some(db) => base.reverse.dropWhile(_ == '/').reverse + "/" + db
      case None     => base
    }
  }
}

object ServerRegistry {

  def resolve(explicit: Option[String] = None): ServerRegistry = {
    val candidates: Seq[Path] =
      explicit.map(Paths.get(_)).toSeq ++
        (if (explicit.isEmpty)
           Seq(Paths.get("diepy.ini"),
               Paths.get(sys.props.getOrElse("user.home", "~"), "diepy.ini"))
         else Nil)
    val found = candidates.find(Files.exists(_))
      .getOrElse(throw new IllegalStateException("No configuration file found!"))
    load(found)
  }

  /** Minimal INI parser: sections, `key = value`, `#`/`;` comments. */
  def load(path: Path): ServerRegistry =
    fromLines(Files.readAllLines(path).asScala.toSeq)

  def fromLines(lines: Seq[String]): ServerRegistry = {
    var section = ""
    val acc = scala.collection.mutable.LinkedHashMap[String, String]()
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[") && line.endsWith("]"))
          section = line.substring(1, line.length - 1).trim.toLowerCase
        else if (section == "servers") {
          val idx = line.indexOf('=')
          if (idx > 0)
            acc += line.substring(0, idx).trim.toLowerCase -> line.substring(idx + 1).trim
        }
      }
    }
    ServerRegistry(acc.toMap)
  }
}
