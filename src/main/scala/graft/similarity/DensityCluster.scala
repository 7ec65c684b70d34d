package graft.similarity

import graft.dedup.ConnectedComponents
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Density-based clustering (DBSCAN, Ester et al. 1996) over a 2-D
  * projection of an embedding column, with grid-cell blocking as the
  * neighbor-pair generator — the density cut the centroid family
  * (k-medians q40, silhouette q243) can't give: clusters of arbitrary
  * shape plus an explicit NOISE verdict per point, the standard
  * "which embedding regions are dense boilerplate vs isolated
  * one-offs" reading for a training-data map.
  *
  * Blocking discipline (the engine's banded-LSH trade, in 2-D): points
  * quantize to micro ints and bucket into eps-sized grid cells; each
  * point probes only its 3×3 cell stencil via an EQUI-join on cell
  * key (every true eps-neighbor lives there by construction — cell
  * side = eps bounds any within-eps displacement to one cell step per
  * axis), so pair work is Σ_cell |cell|·|stencil| — density-bounded,
  * never corpus². Worst-case degeneracy (everything in one cell) is
  * the same one LSH banding accepts and the caller controls via eps.
  *
  * Exactness: coordinates floor-quantize to micro units once;
  * cell ids are exact floor divisions ((q − pmod(q, eps)) / eps —
  * sign-correct for negatives, unlike `div`'s truncation); the
  * eps-ball test `dx² + dy² ≤ eps²` is exact BIGINT arithmetic. No
  * floats anywhere, so engine and oracle agree bit-for-bit.
  *
  * DBSCAN semantics: |N_eps(p)| counts p itself (minPts is "points in
  * the closed ball including the center"); core ⇔ |N_eps| ≥ minPts;
  * clusters are connected components of the core–core eps-graph
  * (labeled by MIN member id — deterministic); a border point (non-core
  * with ≥1 core neighbor) joins its MINIMUM core neighbor's cluster
  * (the deterministic tie-break for the order-dependence genuine
  * DBSCAN leaves unspecified); everything else is noise, cluster −1.
  *
  * Scale shape: one scan to quantize, a 9× cell-key explode on the
  * probe side joined hash-to-hash against the point side, two grouped
  * counts, and components via [[ConnectedComponents.componentsAuto]]
  * (driver union-find under the edge gate, distributed min-label
  * flood above it). The core–core edge list — not the corpus — is
  * what iterates.
  */
object DensityCluster {

  /** DBSCAN over dims (dimX, dimY) (0-based) of `vecCol`.
    *
    * `epsMicro > 0` fixes the radius; `epsMicro = 0` derives it as
    * `adaptiveC div isqrt(n)` — the fixed-extent heuristic that holds
    * the EXPECTED eps-neighborhood count constant as the corpus grows
    * (density ∝ n over a fixed box ⇒ π·eps²·density constant when
    * eps ∝ 1/√n), so one (C, minPts) choice stays at the same
    * percolation working point across scale factors. Production runs
    * on unbounded corpora should pass an explicit eps chosen from a
    * k-distance profile instead.
    *
    * Returns (id, n_neighbors, is_core, cluster) for every point with
    * both dims present; cluster is the min member id of the DBSCAN
    * cluster, or −1 for noise. Ids must be non-negative integrals
    * (−1 is the noise sentinel; components ride a long union-find).
    */
  def gridDbscan(
      df: DataFrame, idCol: String, vecCol: String,
      dimX: Int = 0, dimY: Int = 1,
      epsMicro: Long = 0L, minPts: Int = 5,
      adaptiveC: Long = 352000L): DataFrame = {
    require(dimX != dimY, "gridDbscan: dimX and dimY must differ")
    require(epsMicro >= 0L, "gridDbscan: epsMicro must be >= 0")
    val q = (d: Int) => floor(
      element_at(col(vecCol), d + 1).cast("double") * 1e6).cast("long")
    val base = df
      .where(col(vecCol).isNotNull &&
        size(col(vecCol)) > math.max(dimX, dimY))
      .select(col(idCol).as("id"), q(dimX).as("qx"), q(dimY).as("qy"))
    val eps: Column =
      if (epsMicro > 0L) lit(epsMicro)
      else col("__eps")
    val pts0 =
      if (epsMicro > 0L) base
      else base.crossJoin(broadcast(base
        .agg(count(lit(1)).as("__n"))
        .select(expr(s"$adaptiveC div CAST(floor(sqrt(CAST(__n AS " +
          "DOUBLE))) AS BIGINT)").as("__eps"))))
    val fdiv = (c: Column) => ((c - pmod(c, eps)) / eps).cast("long")
    val pts = pts0
      .withColumn("cx", fdiv(col("qx")))
      .withColumn("cy", fdiv(col("qy")))
      .transform(graft.core.CacheScope.disk)
    // probe side: each point listed under all 9 cells it could see
    val probe = pts.select(col("id").as("ia"), col("qx").as("xa"),
        col("qy").as("ya"), eps.as("__e"),
        explode(array((for (dx <- -1 to 1; dy <- -1 to 1) yield
          struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))
        ): _*)).as("__c"))
      .select(col("ia"), col("xa"), col("ya"), col("__e"),
        col("__c.cx").as("cx"), col("__c.cy").as("cy"))
    val neighbors = probe
      .join(pts.select(col("id").as("ib"), col("qx").as("xb"),
        col("qy").as("yb"), col("cx"), col("cy")), Seq("cx", "cy"))
      .where((col("xa") - col("xb")) * (col("xa") - col("xb")) +
        (col("ya") - col("yb")) * (col("ya") - col("yb")) <=
        col("__e") * col("__e"))
      .select(col("ia"), col("ib"))
      .transform(graft.core.CacheScope.disk)
    val deg = neighbors.groupBy(col("ia").as("id"))
      .agg(count(lit(1)).as("n_neighbors"))
    val cores = deg.where(col("n_neighbors") >= minPts.toLong)
      .select(col("id"))
    val coreEdges = neighbors
      .join(cores.withColumnRenamed("id", "ia"), Seq("ia"))
      .join(cores.withColumnRenamed("id", "ib"), Seq("ib"))
      .where(col("ia") < col("ib"))
      .select(col("ia"), col("ib"))
      .localCheckpoint(true)
    val (comp, _) = ConnectedComponents.componentsAuto(
      coreEdges, "ia", "ib")
    // a core with no core neighbor is its own singleton cluster
    val coreLabel = cores
      .join(comp, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("cluster"))
    // border: non-core, labeled by its minimum core neighbor's cluster
    val borderLabel = neighbors
      .join(coreLabel.withColumnRenamed("id", "ib")
        .withColumnRenamed("cluster", "__bc"), Seq("ib"))
      .groupBy(col("ia").as("id"))
      .agg(min(col("__bc")).as("__minc"))
      .join(cores.withColumn("__is", lit(1)), Seq("id"), "left")
      .where(col("__is").isNull)
      .select(col("id"), col("__minc").as("cluster"))
    deg
      .join(cores.withColumn("__core", lit(1)), Seq("id"), "left")
      .join(coreLabel.unionByName(borderLabel), Seq("id"), "left")
      .select(col("id"), col("n_neighbors"),
        coalesce(col("__core"), lit(0)).as("is_core"),
        coalesce(col("cluster"), lit(-1L)).as("cluster"))
  }
}
