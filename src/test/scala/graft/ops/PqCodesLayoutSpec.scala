package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import org.scalatest.funsuite.AnyFunSuite

class PqCodesLayoutSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("pqKnnFromCodes over a persisted codes layout equals q89 exactly") {
    val dir = Files.createTempDirectory("pqcodes").toString
    Similarity.pqWriteCodes(spark, d, dir)
    // the layout is 4 bytes of code per vector — one packed int holds
    // all m=8 4-bit subspace codes; no embedding column in the files
    val schema = spark.read.parquet(dir).schema
      .map(f => (f.name, f.dataType.simpleString)).toSet
    assert(schema == Set(("vec_id", "bigint"), ("code", "int")))

    val fromCodes = Similarity.pqKnnFromCodes(spark, d, dir).collect().toSeq
    val inline = Similarity.q89KnnPq(spark, d).collect().toSeq
    assert(fromCodes.nonEmpty, "empty kNN result from the codes layout")
    assert(fromCodes == inline,
      "persisted-codes path diverged from the in-memory PQ path")
  }
}
