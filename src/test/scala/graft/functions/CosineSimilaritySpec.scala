package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("matches the zip_with/aggregate formulation on float arrays") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(2.0f, 3.0f, 4.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(2.5f, -1.0f, 0.5f), Array(2.5f, -1.0f, 0.5f))).toDF("a", "b")
    def ref(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      def d(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(transform(x, _.cast("double")), transform(y, _.cast("double")),
          (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
      d(a, b) / (sqrt(d(a, a)) * sqrt(d(b, b)))
    }
    val rows = df.select(
      GraftFunctions.cosine_sim($"a", $"b").as("fast"),
      ref($"a", $"b").as("slow")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    assert(math.abs(rows(2).getDouble(0) - 1.0) < 1e-12) // self-similarity
    assert(math.abs(rows(1).getDouble(0)) < 1e-12)       // orthogonal
  }

  test("SQL surface + null propagation + double arrays") {
    GraftFunctions.register(spark)
    Seq((Array(1.0, 2.0), Array(2.0, 4.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT graft_cosine_sim(a, b) AS s, graft_cosine_sim(a, CAST(NULL AS ARRAY<DOUBLE>)) AS n FROM vecs")
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.isNullAt(1))
    // a NULL *element* also yields NULL (matches zip_with semantics)
    val r2 = spark.sql(
      "SELECT graft_cosine_sim(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS s")
      .head()
    assert(r2.isNullAt(0))
  }

  test("interpreted eval agrees with codegen") {
    val e = CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2.0, 3.0), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    val expected = (1.0 * 2 + 2 * 3) / (math.sqrt(5.0) * math.sqrt(13.0))
    assert(math.abs(interpreted - expected) < 1e-12)
  }
}
