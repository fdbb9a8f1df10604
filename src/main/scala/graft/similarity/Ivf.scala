package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Canon.round // canonical floor-based rounding (oracle-safe)
import org.apache.spark.sql.types._

import graft.expressions.VectorExpressions

/** IVF (inverted-file) approximate nearest neighbor: the k-means-cell
  * counterpart to `Ann.lshTopK` — the other standard scale path.
  *
  * Index build: k-means over the corpus (one-time, seeded); every vector is
  * assigned to its nearest coarse centroid ("cell"). Search: each query
  * probes its `nProbe` nearest cells only, so the candidate join is an
  * equality on the cell id — O(n/nCells · nProbe) per query at any corpus
  * size, with exact cosine re-ranking on the candidates.
  *
  * The centroid table is tiny (nCells × dim) and rides as a broadcast
  * literal; cell assignment and all distances go through the codegen'd
  * native vector expressions.
  */
object Ivf {

  final case class IvfIndex(centroids: Array[Array[Float]], assigned: DataFrame)

  /** Build the coarse index: seeded k-means, then cell assignment for every
    * corpus vector. `assigned` = (vec_id, embedding, cell).
    */
  def build(corpus: DataFrame, nCells: Int = 16): IvfIndex = {
    val featured = corpus.withColumn("features", array_to_vector(col("embedding")))
    // A coarse quantizer needs rough Voronoi cells, not convergence: random
    // init (k-means|| costs ~5 extra distributed passes) and few iterations.
    // Cell quality only moves recall, which AnnSpec asserts independently.
    val model = new KMeans()
      .setK(nCells).setSeed(42L).setMaxIter(8)
      .setInitMode("random").setTol(1e-3)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(featured)
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    IvfIndex(centroids,
      model.transform(featured).select(col("vec_id"), col("embedding"), col("cell")))
  }

  /** Squared L2 distance to a literal centroid, via native expressions:
    * |x|² - 2·x·c + |c|² (monotone-equivalent to true distance for ranking).
    */
  private def distSqTo(e: Column, c: Array[Float]): Column = {
    val cLit = typedLit(c.toSeq)
    val cNormSq = c.map(v => v.toDouble * v.toDouble).sum
    VectorExpressions.normF(e) * VectorExpressions.normF(e) -
      lit(2.0) * VectorExpressions.dotF(e, cLit) + lit(cNormSq)
  }

  /** nProbe nearest cells of a vector, as an array column of cell ids. */
  def probeCells(e: Column, centroids: Array[Array[Float]], nProbe: Int): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(distSqTo(e, c).as("d"), lit(i).as("cell"))
    }: _*)
    slice(transform(array_sort(scored), s => s.getField("cell")), 1, nProbe)
  }

  /** Approximate top-k: probe nProbe cells per query, exact cosine rank on
    * the candidates.
    */
  def ivfTopK(index: IvfIndex, queries: DataFrame, k: Int, nProbe: Int = 2): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
      explode(probeCells(col("embedding"), index.centroids, nProbe)).as("cell"))
    val cos = VectorExpressions.cosineF(col("qe"), col("ve"))
    val w = Window.partitionBy(col("qid")).orderBy(cos.desc, col("vid").asc)
    index.assigned
      .select(col("vec_id").as("vid"), col("embedding").as("ve"), col("cell"))
      .join(broadcast(q), Seq("cell"))
      .where(col("vid") =!= col("qid"))
      .select(col("qid"), col("vid"), round(cos, 4).as("cosine"),
        row_number().over(w).cast(LongType).as("rn"))
      .where(col("rn") <= k)
      .orderBy("qid", "rn")
  }
}
