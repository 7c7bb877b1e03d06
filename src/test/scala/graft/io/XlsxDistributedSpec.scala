package graft.io

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Many-file distributed xlsx import (binaryFile scale path). */
class XlsxDistributedSpec extends AnyFunSuite with SparkSuite {
  import XlsxIO._

  test("glob of workbooks parses on executors into one typed DataFrame") {
    val dir = Files.createTempDirectory("graftxlsxmany").toString
    val header: Seq[Cell] = Seq(XStr("id"), XStr("name"), XStr("when"))
    for (f <- 1 to 3) {
      val rows = header +: (1 to 4).map(i =>
        Seq[Cell](XNum(f * 100 + i), XStr(s"row$i"),
          XDateTime(java.time.LocalDateTime.of(2024, 1, f, i, 0, 0))))
      writeWorkbook(s"$dir/part$f.xlsx", Seq("data" -> rows))
    }
    val (df, cols) = importManyDistributed(spark, s"$dir/*.xlsx", Some("data"))
    assert(df.count() == 12)
    assert(cols.map(_.settledType) == Seq("int", "text", "datetime"))
    assert(df.schema("id").dataType == ShortType)
    assert(df.schema("when").dataType == TimestampType)
    import org.apache.spark.sql.functions._
    assert(df.agg(sum(col("id"))).head.getLong(0) ==
      (1 to 3).flatMap(f => (1 to 4).map(i => f * 100 + i)).sum)
  }
}
