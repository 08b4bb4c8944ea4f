package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float] column) —
  * the ANN surface of the training-data pipeline (BASELINE.json north
  * star).
  *
  * All dot products / norms are explicit left-to-right folds
  * (`aggregate(zip_with(...))`) so the DuckDB oracle (an identical
  * explicit fold) produces bit-identical doubles — making top-k ranking
  * and threshold comparisons deterministic across engines.
  *
  * Scale notes (100 TB design):
  *   - q36 broadcasts the (small) query set against a single scan of the
  *     corpus — the canonical brute-force ANN baseline: no shuffle of the
  *     big side, map-side top-k via window over query partitions;
  *   - q39 is the scale path: IVF-style partition pruning — vectors are
  *     bucketed by nearest centroid once (one shuffle), queries probe only
  *     nProbe buckets, so per-query work drops from O(N) to
  *     O(N·nProbe/K). Recall vs exact is measured in VectorsSpec.
  */
object Vectors {

  /** cosine(a, b) with explicit fold order; inputs are float arrays cast
    * to double first. */
  private def cosine(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"""aggregate(zip_with($x, $y, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)),
         |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin.replace("\n", " ")
    s"(${dot(a, b)}) / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  /** q36: brute-force cosine top-k (k=5) for every 50th vector as query. */
  def q36CosineTopk(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val queries = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", expr(cosine("qv", "embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** q37: embedding near-duplicate pairs — cosine ≥ 0.4, exact. */
  def q37CosineNearDup(s: SparkSession, d: String): DataFrame = {
    val a = embeddings(s, d).select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = embeddings(s, d).select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", expr(cosine("va", "vb")))
      .filter(col("sim") >= 0.4)
      .select(col("id_a"), col("id_b"), col("sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** q39: IVF-bucketed approximate top-k — the scale path. Centroids are
    * the first 16 vectors (deterministic); every vector is assigned to its
    * nearest centroid; a query scans only the 4 nearest buckets. Output is
    * rows-only checked (approximate by construction); recall vs q36 is
    * asserted in VectorsSpec. */
  def q39AnnIvf(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val centroids = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    // assign: argmax cosine over 16 centroids (tiny broadcast)
    val assigned = e.crossJoin(broadcast(centroids))
      .withColumn("csim", expr(cosine("cv", "embedding")))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("c_id"))))
      .filter(col("r") === 1)
      .select(col("vec_id"), col("embedding"), col("c_id").as("bucket"))
    val queries = assigned.filter(col("vec_id") % 50 === 0)
      .crossJoin(broadcast(centroids))
      .withColumn("csim", expr(cosine("cv", "embedding")))
      .withColumn("pr", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("c_id"))))
      .filter(col("pr") <= 4) // nProbe = 4
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("c_id").as("probe_bucket"))
    val scored = queries.join(assigned,
        col("probe_bucket") === col("bucket") && col("query_id") =!= col("vec_id"))
      .withColumn("sim", expr(cosine("qv", "embedding")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id")))
        .cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"), col("sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_cosine_topk"    -> (q36CosineTopk _),
    "q37_cosine_neardup" -> (q37CosineNearDup _),
    "q39_ann_ivf"        -> (q39AnnIvf _),
  )

  /** DuckDB mirror of [[cosine]]: identical left-to-right fold. */
  private def duckCosine(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  [CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE) for i in range(1, len($x) + 1)]),
         |  (acc, v) -> acc + v)""".stripMargin.replace("\n", " ")
    s"(${dot(a, b)}) / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
  }

  val oracle: Map[String, String] = Map(
    "q36_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
         |           WHERE vec_id % 50 = 0),
         |scored AS (SELECT q.query_id, e.vec_id,
         |    ${duckCosine("q.qv", "e.embedding")} AS sim
         |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
         |ranked AS (SELECT query_id, vec_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id, sim
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q37_cosine_neardup" ->
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${duckCosine("a.embedding", "b.embedding")} AS sim
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,
  )
}
