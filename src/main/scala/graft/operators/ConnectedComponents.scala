package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the operator that
  * turns near-duplicate *pairs* into dedup *clusters* (every vertex labeled
  * with the min vertex id of its component, so `min(id)` per cluster is the
  * canonical survivor).
  *
  * Algorithm: iterative min-label propagation, DataFrame-native. Each round
  * every vertex takes the min of its own label and its neighbors' labels
  * (one equality join edges⋈labels + one groupBy-min — two key shuffles);
  * convergence when no label changes. Rounds needed = component diameter,
  * which for dedup graphs is tiny (near-dup clusters are dense blobs, not
  * chains). For adversarially long chains at 100 TB, swap the round body for
  * the large-star/small-star rewrite (Kiveris et al., "Connected Components
  * in MapReduce and Beyond") — same join shape, O(log n) rounds; the
  * propagation loop and convergence scaffold here stay unchanged.
  *
  * Lineage control: every iteration's label table is localCheckpoint'd —
  * without it the plan doubles per round and Catalyst analysis time, not the
  * data, becomes the bottleneck.
  */
object ConnectedComponents {

  // Free each round's dead checkpoint storage eagerly (peak would otherwise
  // grow O(rounds × |V|)); shared helper, see graft.util.Checkpoints.
  private def unpersistCheckpoint(df: DataFrame): Unit =
    graft.util.Checkpoints.unpersist(df)

  /** @return (id, component) for every vertex that appears in an edge;
    *         isolated vertices don't appear (union them in with
    *         component = id at the call site if needed).
    */
  def components(edges0: DataFrame, srcCol: String, dstCol: String,
                 maxIter: Int = 25): DataFrame = {
    val fwd = edges0.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
    val edges = fwd.union(fwd.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint(true)

    var labelsCk = edges.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var labels = labelsCk

    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("v_id"), col("label").as("v_label")),
          col("v") === col("v_id"))
        .groupBy(col("u").as("n_id"))
        .agg(min(col("v_label")).as("nbr_min"))
      // checkpoint before the self-join below, or the edges⋈labels+groupBy
      // subtree executes twice per round (once per join side)
      val tentative = labels
        .join(nbrMin, col("id") === col("n_id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("mid"))
        .localCheckpoint(true)
      // Pointer jump: label ← label(label). Labels are vertex ids, so the
      // self-join always resolves; chains collapse exponentially instead of
      // one hop per round (diameter D needs ~log₂D rounds, not D).
      val stepped = tentative
        .join(tentative.select(col("id").as("p_id"), col("mid").as("p_label")),
          col("mid") === col("p_id"), "left")
        .select(col("id"), col("label"),
          least(col("mid"), coalesce(col("p_label"), col("mid"))).as("next"))
        .localCheckpoint(true)
      changed = stepped.where(col("next") =!= col("label")).count()
      // stepped is materialized; the round's intermediate and the previous
      // labels' storage are dead — free their blocks now, not at driver GC
      unpersistCheckpoint(tentative)
      unpersistCheckpoint(labelsCk)
      labelsCk = stepped
      labels = stepped.select(col("id"), col("next").as("label"))
      iter += 1
    }
    // the result reads only the final labels' blocks; the edge table is done
    unpersistCheckpoint(edges)
    // Partially-converged labels are silently WRONG for every consumer
    // (over-split dedup clusters that quietly under-dedup) — fail loudly
    // rather than return them. changed==0 guarantees a true fixpoint.
    if (changed > 0)
      throw new IllegalStateException(
        s"ConnectedComponents.components did not converge in $maxIter " +
          s"iterations ($changed labels still changing); raise maxIter")
    labels.select(col("id"), col("label").as("component"))
  }

  /** Size-dispatched front door: min-label propagation for modest edge
    * sets, the large-star/small-star rewrite above `starEdgeThreshold`
    * edges. Both produce identical labels (property-tested against a
    * union-find reference in ConnectedComponentsSpec); the threshold only
    * picks the cheaper iteration shape. Propagation does two key shuffles
    * per round and its pointer-jumping needs ~log(diameter) rounds — the
    * right cost profile while the edge table is comfortably shuffle-sized.
    * The star rewrite's rounds are O(log n) regardless of diameter and its
    * joins re-balance degree skew every round (hubs are broken up by
    * large-star), which is what survives adversarial graphs at corpus
    * scale. The edge list is checkpointed once here so the sizing count
    * and the chosen algorithm's first round share one materialization.
    */
  def componentsAuto(edges0: DataFrame, srcCol: String, dstCol: String,
                     starEdgeThreshold: Long = 10000000L): DataFrame = {
    // normalize ids to long BEFORE dispatch: componentsStar casts
    // internally but components preserves the input type — without this,
    // the result schema would flip from (int,int) to (bigint,bigint) the
    // day the edge count crosses the threshold
    val edges = edges0
      .select(col(srcCol).cast("long").as(srcCol),
        col(dstCol).cast("long").as(dstCol))
      .localCheckpoint(true)
    // both variants re-checkpoint internally (eagerly, inside the call), so
    // the input blocks are dead by return time
    try {
      if (edges.count() > starEdgeThreshold) componentsStar(edges, srcCol, dstCol)
      else components(edges, srcCol, dstCol)
    } finally unpersistCheckpoint(edges)
  }

  /** The 100 TB variant: alternating large-star/small-star (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — O(log n) rounds
    * independent of component diameter, and each round is a plain
    * groupBy-min + join (no state that grows with degree on one machine,
    * unlike collecting a neighborhood).
    *
    *  - large-star: every vertex points its LARGER neighbors at the min of
    *    its neighborhood (+ itself) — breaks up high-degree hubs;
    *  - small-star: with edges directed high→low, every vertex points its
    *    smaller neighbors AND itself at the neighborhood min — contracts
    *    chains.
    *
    * Fixpoint: the edge set becomes stars rooted at component minima; the
    * root of each star is the component label. Same contract as
    * `components` (vertices that appear in an edge; label = min id).
    */
  def componentsStar(edges0: DataFrame, srcCol: String, dstCol: String,
                     maxIter: Int = 30): DataFrame = {
    val init = edges0
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .select(greatest(col("a"), col("b")).as("hi"),
        least(col("a"), col("b")).as("lo"))
      .distinct()
      .localCheckpoint(true)
    val vertices = init.select(col("hi").as("id"))
      .union(init.select(col("lo").as("id"))).distinct().localCheckpoint(true)

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val m = sym.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("m"))
      sym.join(m, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .where(col("hi") =!= col("lo"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // edges already directed hi -> lo
      val m = e.groupBy("hi").agg(least(min(col("lo")), first(col("hi"))).as("m"))
      val pointed = e.join(m, "hi")
        .select(col("lo").as("x"), col("m"))
      val self = m.select(col("hi").as("x"), col("m"))
      pointed.union(self)
        .where(col("x") =!= col("m"))
        .select(greatest(col("x"), col("m")).as("hi"),
          least(col("x"), col("m")).as("lo"))
        .distinct()
    }

    var e = init
    var stable = false
    var iter = 0
    while (!stable && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      // fixpoint when the canonical edge sets are equal (sizes equal and no
      // edge leaves the set)
      val nextCount = next.count()
      stable = nextCount == e.count() &&
        next.except(e).isEmpty
      if (e ne init) unpersistCheckpoint(e) // init also feeds `vertices`
      e = next
      iter += 1
    }
    // Same contract as components(): a non-fixpoint edge set means the
    // star decomposition is incomplete and labels would be over-split.
    if (!stable)
      throw new IllegalStateException(
        s"ConnectedComponents.componentsStar did not converge in $maxIter " +
          "iterations; raise maxIter")
    // stars: every non-root points at its root; roots label themselves
    vertices
      .join(e.select(col("hi").as("id"), col("lo").as("root")), Seq("id"), "left")
      .groupBy("id").agg(min(coalesce(col("root"), col("id"))).as("component"))
  }
}
