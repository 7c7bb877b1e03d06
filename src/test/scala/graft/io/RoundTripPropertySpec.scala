package graft.io

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized (seeded) CSV export→import round-trip: quoting, escape,
  * embedded separators/newlines, unicode, nulls, numeric and temporal
  * values must all survive the reference-semantics writer + the
  * inference-based reader. */
class RoundTripPropertySpec extends AnyFunSuite with SparkSuite {

  test("200 random mixed rows survive export → infer → import") {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(4242)
    val weird = Seq("plain", "has,comma", "has \"quote\"", "line\nbreak",
      "tab\tinside", "ünïcödé ☃", " leading", "trailing ", "")
    def rs(): String = weird(rnd.nextInt(weird.size)) + rnd.nextInt(1000)
    val rows = (0 until 200).map { i =>
      Row(
        i.toLong,
        if (rnd.nextInt(10) == 0) null else rs(),
        if (rnd.nextInt(10) == 0) null else rnd.nextInt(20000),
        if (rnd.nextInt(10) == 0) null else math.round(rnd.nextDouble() * 1e6) / 1e3,
        if (rnd.nextInt(10) == 0) null
        else new java.sql.Timestamp(1500000000000L + rnd.nextInt(Int.MaxValue).toLong))
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType),
      StructField("n", IntegerType),
      StructField("d", DoubleType),
      StructField("ts", TimestampType)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val out = Files.createTempDirectory("graftrt").toString + "/rt.csv"
    CsvIO.exportCsv(df, out, unixLineSep = true)
    val (back, cols) = CsvIO.importCsv(spark, out)
    assert(back.count() == 200)
    val byName = cols.map(c => c.name -> c.settledType).toMap
    assert(byName("n") == "int" && byName("d") == "float")

    val orig = df.collect().map(r => r.getLong(0) -> r).toMap
    back.collect().foreach { r =>
      // id re-infers as SMALLINT (max 199) — read as Number
      val o = orig(r.getAs[Number]("id").longValue())
      // strings: empty exports as NULL (reference cast_data semantics)
      val sIdx = r.fieldIndex("s")
      val expS = Option(o.getAs[String]("s")).filter(_.nonEmpty).orNull
      assert(Option(r.getAs[String]("s")).orNull == expS, s"s @ ${o.getLong(0)}")
      val nIdx = r.fieldIndex("n")
      if (o.isNullAt(2)) assert(r.isNullAt(nIdx))
      else assert(r.getAs[Number](nIdx).intValue() == o.getInt(2))
      if (o.isNullAt(3)) assert(r.isNullAt(r.fieldIndex("d")))
      else assert(r.getAs[Double]("d") == o.getDouble(3))
      if (o.isNullAt(4)) assert(r.isNullAt(r.fieldIndex("ts")))
      else assert(r.getAs[java.sql.Timestamp]("ts") == o.getTimestamp(4))
    }
  }
}
