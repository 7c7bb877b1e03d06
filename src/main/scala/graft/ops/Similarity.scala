package graft.ops

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over `embeddings.embedding` (Array[Float], d=64).
 *
 * q26 is the exact brute-force baseline: broadcast the (small) query
 * set against all candidates — one scan of the corpus, no shuffle of
 * the big side; cosine is computed in double precision with
 * codegen'd higher-order functions (zip_with/aggregate), no UDF.
 *
 * q27 is the approximate scale path: random-hyperplane LSH
 * (spark.ml BucketedRandomProjectionLSH, fixed seed) prunes the
 * candidate set before exact re-ranking — at 100 TB the bucketed
 * join replaces the full cross product.
 */
object Similarity {
  import Tables._

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Exact top-5 cosine neighbors for query vectors vec_id < 10. */
  def q26KnnBrute(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("norm").as("qnorm"))
    val ranked = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("sim", round(dot(col("v"), col("qv")) / (col("norm") * col("qnorm")), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))).cast("long"))
      .filter(col("rnk") <= 5)
    ranked.select(col("qid"), col("rnk"), col("vec_id").as("nid"), col("sim"))
      .orderBy(col("qid"), col("rnk"))
  }

  val q26Sql: String =
    """SELECT qid, rnk, nid, sim FROM (
      | SELECT qid, nid, sim,
      |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
      | FROM (
      |  SELECT q.vec_id AS qid, c.vec_id AS nid,
      |   round(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
      |     / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
      |        * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 6) AS sim
      |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id != q.vec_id) p) t
      |WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin

  /** Approximate NN via random-projection LSH + exact re-rank of the
   *  surviving candidates. Deterministic (seed), not SQL-expressible
   *  → rows-only check. */
  def q27KnnLsh(s: SparkSession, d: String): DataFrame = {
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val e = embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
      .withColumn("features", toVec(col("embedding")))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(2.0).setNumHashTables(6).setSeed(42L)
    val model = lsh.fit(e)
    val q = e.filter(col("vec_id") < 10)
    val cand = model.approxSimilarityJoin(q, e, 8.0, "euclid")
      .select(col("datasetA.vec_id").as("qid"), col("datasetA.embedding").as("qe"),
        col("datasetB.vec_id").as("nid"), col("datasetB.embedding").as("ne"))
      .filter(col("qid") =!= col("nid"))
    val rescored = cand
      .withColumn("qv", asDouble(col("qe"))).withColumn("nv", asDouble(col("ne")))
      .withColumn("sim", round(
        dot(col("qv"), col("nv")) /
          (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("nv"), col("nv")))), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))).cast("long"))
      .filter(col("rnk") <= 5)
    rescored.select(col("qid"), col("rnk"), col("nid"), col("sim"))
      .orderBy(col("qid"), col("rnk"))
  }
}
