package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Centroids, Sketches}
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY.md §2.5).
  *
  * Scale shape: the QUERY set is the small side and is broadcast; the
  * corpus only ever streams through a codegen'd cosine kernel. Top-k is
  * a per-query window over the (tiny) candidate set — map-side partial
  * ranking, no global sort of the corpus. The LSH variant prunes the
  * corpus to hyperplane-bucket collisions first (multi-probe via L
  * tables), which is the formulation that stays an equality join at
  * 100 TB: candidates ∝ corpus/2^bits per table, not ∝ corpus.
  */
object Similarity {

  private val K = 10
  private val NumQueries = 10

  /** The benchmark query set: the first `NumQueries` vectors. */
  private def queries(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  /** Exact top-k by cosine for each query: broadcast queries × corpus
    * scan, rank within query. The window's partition count equals the
    * query count — fine for interactive query sets; batch-score jobs
    * with huge query sets would bucket queries first. */
  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame = {
    val corpus = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val scored = corpus
      .join(broadcast(queries(spark, dir)), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Sketches.cosineSim(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH-pruned top-k: candidates are corpus vectors sharing a
    * hyperplane bucket with the query in ANY of L=8 tables; exact
    * cosine re-ranks the candidates. Bits per table trade recall
    * against candidate volume — 6 bits suits a clusterless corpus
    * (neighbor cosines ~0.3–0.5); real embedding corpora cluster much
    * tighter and take 12–16 bits at billion scale. */
  def lshTopK(spark: SparkSession, dir: String): DataFrame = {
    val L = 8
    val bits = 6
    val dim = 64

    def banded(df: DataFrame, idCol: String, embCol: String): DataFrame =
      df.select(
        col(idCol), col(embCol),
        posexplode(array((0 until L).map(t =>
          Sketches.hyperplaneBits(col(embCol), seed = 100 + t, nbits = bits, dim = dim)): _*)))
        .select(col(idCol), col(embCol),
          col("pos").as("table_id"), col("col").as("bucket"))

    val corpusB = banded(
      Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
      "vec_id", "embedding")
    val queriesB = banded(queries(spark, dir), "query_id", "q_emb")

    val cand = corpusB
      .join(broadcast(queriesB), Seq("table_id", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q_emb"), col("vec_id"), col("embedding"))
      .dropDuplicates("query_id", "vec_id")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand
      .select(col("query_id"), col("vec_id"),
        Sketches.cosineSim(col("q_emb"), col("embedding")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF top-k: a coarse quantizer (spherical k-means fit on a
    * deterministic sample) partitions the corpus into inverted lists;
    * queries probe their nProbe nearest lists and exact cosine re-ranks.
    * The 100 TB shape: fit on a sample (tiny, driver-side — standard
    * IVF practice), assign the corpus with a codegen'd expression (one
    * narrow pass, the assignment can be persisted/partitioned-by), and
    * every query touches ~nProbe/nLists of the corpus. */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val nLists = 16
    val nProbe = 4

    val corpus = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val sample = corpus.filter(pmod(col("vec_id"), lit(3)) === 0)
      .limit(1024).collect().map(_.getSeq[Float](1).toArray)
    val cents = Centroids.fit(sample, nLists, iters = 5, seed = 42L)

    val corpusAssigned = corpus.withColumn("centroid",
      element_at(Centroids.nearestCentroids(col("embedding"), cents, 1), 1))
    val queriesProbed = queries(spark, dir).select(
      col("query_id"), col("q_emb"),
      explode(Centroids.nearestCentroids(col("q_emb"), cents, nProbe)).as("centroid"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    corpusAssigned
      .join(broadcast(queriesProbed), Seq("centroid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Sketches.cosineSim(col("q_emb"), col("embedding")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }
}
