package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Address parsing per reference diepy/core.py:28-51; config
  * resolution per core.py:92-109. */
class DbPathConfigSpec extends AnyFunSuite {

  test("1-4 part addresses parse positionally") {
    assert(DbPath.parse("srv") == DbPath(Some("srv"), None, None, None))
    assert(DbPath.parse("srv.db") == DbPath(Some("srv"), Some("db"), None, None))
    assert(DbPath.parse("srv.db.sch") == DbPath(Some("srv"), Some("db"), Some("sch"), None))
    assert(DbPath.parse("srv.db.sch.tbl") ==
      DbPath(Some("srv"), Some("db"), Some("sch"), Some("tbl")))
  }

  test("empty segments allowed: SERVER...TABLE (README.md:27-38)") {
    assert(DbPath.parse("srv...tbl") == DbPath(Some("srv"), None, None, Some("tbl")))
    assert(DbPath.parse("srv..sch.tbl") == DbPath(Some("srv"), None, Some("sch"), Some("tbl")))
  }

  test(">4 parts parses to all-None (reference quirk: no branch matches)") {
    assert(DbPath.parse("a.b.c.d.e") == DbPath(None, None, None, None))
  }

  test("server registry resolves alias and appends database segment") {
    val reg = ServerRegistry.fromLines(Seq(
      "# comment", "[servers]", "test = jdbc:derby:data;create=true",
      "other=jdbc:postgresql://h/", "[misc]", "x = y"))
    assert(reg.connectionString("test", None) == "jdbc:derby:data;create=true")
    assert(reg.connectionString("other", Some("mydb")) == "jdbc:postgresql://h/mydb")
    intercept[IllegalArgumentException](reg.connectionString("nope", None))
  }

  test("alias lookup is case-insensitive (SafeConfigParser optionxform parity)") {
    val reg = ServerRegistry.fromLines(Seq("[servers]", "Prod = jdbc:derby:memory:p"))
    assert(reg.connectionString("prod", None) == "jdbc:derby:memory:p")
    assert(reg.connectionString("PROD", None) == "jdbc:derby:memory:p")
  }

  test("explicit config file loads; missing file errors") {
    val f = Files.createTempFile("graft", ".ini")
    Files.writeString(f, "[servers]\nt = jdbc:derby:memory:x\n")
    assert(ServerRegistry.resolve(Some(f.toString)).servers == Map("t" -> "jdbc:derby:memory:x"))
    intercept[IllegalStateException](ServerRegistry.resolve(Some("/nonexistent/diepy.ini")))
  }
}
