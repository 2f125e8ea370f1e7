package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geospatial assignment and proximity operators over integer micro-degree
  * coordinates.
  *
  * The reference parses GPS fixes out of survey submissions and works with
  * landing-site locations (`/root/reference/R/preprocessing-surveys.R:90,
  * 100-110` — `location_coordinates` → numeric lat/lon); the spatial
  * queries a pipeline builds on that are (a) snap each record to its
  * nearest site and (b) find records within a radius of each other. Both
  * are implemented here on exact integer micro-degrees (1e-6 °) with
  * squared planar distance — exact long arithmetic that both engines
  * reproduce bit-for-bit, and an adequate metric at coastal-district
  * extent (a few degrees) where the equirectangular distortion is a
  * monotone ~cos(lat) factor that cannot change a nearest-site winner at
  * these scales' tie margins.
  *
  * Scale posture: nearest-site is a broadcast of the (small) site
  * dimension + one arg-min pass — no shuffle of the point set at all.
  * Radius search never forms the quadratic pair set: points are bucketed
  * into r-sized grid cells and candidates come from an equi-join of each
  * point's 3×3 neighbor cells against home cells (the standard spatial
  * blocking that bounds candidates to true locality), then the exact
  * distance filter runs on candidates only. Both shuffles key on cell
  * ids — fine-grained, data-distributed keys.
  */
object Spatial {

  /** Deterministic synthetic micro-degree coordinates for a non-negative
    * integer key — a Knuth-multiplicative scatter over a 2°×2° coastal
    * box (lat −18..−16, lon 34..36). Engine-portable: one 64-bit
    * multiply + modulo, no overflow for keys < 3.4e9 (the multiplier is
    * 2654435761 = floor(2^32/φ)).
    */
  /** SQL text of the scatter — the SINGLE definition both the Spark
    * expressions below and the conformance oracles splice, so the two
    * sides cannot drift.
    */
  def latSql(keyCol: String): String =
    s"-18000000 + ($keyCol * 2654435761) % 2000001"

  def lonSql(keyCol: String): String =
    s"34000000 + (($keyCol * 2654435761 + 777767777) % 2000001)"

  def synthLatMicro(keyCol: String): org.apache.spark.sql.Column =
    expr(latSql(keyCol))

  def synthLonMicro(keyCol: String): org.apache.spark.sql.Column =
    expr(lonSql(keyCol))

  /** Assign each point to its nearest site by squared micro-degree
    * distance; deterministic ties to the lower site id.
    *
    * `points`: (id, lat, lon); `sites`: (site_id, lat, lon), both in
    * micro-degrees. The site dimension is broadcast (landing sites are
    * O(100) rows — the lookup-dimension assumption of the reference's
    * site metadata joins); the per-point arg-min is `min(struct(dist2,
    * site_id))` — struct ordering IS the (distance, tie-to-lower-id)
    * comparator, and as an AGGREGATE it partial-combines map-side, so
    * the |points|·|sites| candidate stream collapses back to |points|
    * rows before any exchange (a row_number window here would shuffle
    * and sort the full candidate stream: measured 6× slower at sf0.1).
    */
  def nearestSite(points: DataFrame, sites: DataFrame): DataFrame = {
    // cast to long BEFORE squaring: int-typed micro-degrees overflow
    // 32-bit arithmetic at a delta of only ~46k micro-degrees
    points.select(col("id"), col("lat").cast("long").as("plat"),
        col("lon").cast("long").as("plon"))
      .crossJoin(broadcast(
        sites.select(col("site_id"), col("lat").cast("long").as("slat"),
          col("lon").cast("long").as("slon"))))
      .withColumn("dist2",
        (col("plat") - col("slat")) * (col("plat") - col("slat")) +
        (col("plon") - col("slon")) * (col("plon") - col("slon")))
      .groupBy(col("id"))
      .agg(min(struct(col("dist2"), col("site_id"))).as("m"))
      .select(col("id"), col("m.site_id").as("site_id"), col("m.dist2").as("dist2"))
  }

  /** Per-point neighbor count within radius `rMicro` (micro-degrees,
    * squared-distance semantics, self excluded). Grid-blocked: cell size
    * = r guarantees any in-radius pair sits within one cell step in each
    * axis, so the 3×3 neighbor-cell equi-join is a complete candidate
    * set; the exact `dist² ≤ r²` filter then runs on candidates only.
    * Points with no neighbors are kept with count 0.
    *
    * Coordinates are shifted non-negative before cell division — Spark
    * `div` truncates toward zero while the floor semantics the grid
    * needs (and DuckDB's `//` has) only coincide on non-negative
    * operands.
    */
  def radiusNeighbors(points: DataFrame, rMicro: Long): DataFrame = {
    val hits = neighborPairs(points, rMicro)
      .groupBy(col("id_a").as("id")).agg(count(lit(1)).as("n_neighbors"))
    points.select(col("id")).join(hits, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"))
  }

  /** All in-radius directed pairs `(id_a, id_b)`, `a ≠ b`, via the same
    * grid blocking as [[radiusNeighbors]] (each unordered pair emitted
    * in both directions).
    */
  private[graft] def neighborPairs(points: DataFrame, rMicro: Long): DataFrame = {
    require(rMicro > 0, "radius must be positive")
    val pts = points
      .select(col("id"), col("lat").cast("long").as("lat"),
        col("lon").cast("long").as("lon"))
      .select(col("id"), col("lat"), col("lon"),
        expr(s"(lat + 90000000) div $rMicro").as("cx"),
        expr(s"(lon + 180000000) div $rMicro").as("cy"))
    val probes = pts.select(col("id").as("id_a"),
        col("lat").as("lat_a"), col("lon").as("lon_a"),
        explode(expr("array(-1L, 0L, 1L)")).as("dx"), col("cx"), col("cy"))
      .select(col("id_a"), col("lat_a"), col("lon_a"),
        (col("cx") + col("dx")).as("jx"),
        explode(expr("array(-1L, 0L, 1L)")).as("dy"), col("cy"))
      .select(col("id_a"), col("lat_a"), col("lon_a"), col("jx"),
        (col("cy") + col("dy")).as("jy"))
    probes.join(pts.select(col("id").as("id_b"),
        col("lat").as("lat_b"), col("lon").as("lon_b"),
        col("cx").as("jx"), col("cy").as("jy")), Seq("jx", "jy"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(
        (col("lat_a") - col("lat_b")) * (col("lat_a") - col("lat_b")) +
        (col("lon_a") - col("lon_b")) * (col("lon_a") - col("lon_b"))
          <= lit(rMicro * rMicro))
      .select(col("id_a"), col("id_b"))
  }

  /** Grid-blocked DBSCAN: core points have ≥ `minPts` points (self
    * included) within `rMicro`; clusters are connected components of
    * the core-core radius graph (labels = min member id via the
    * [[graft.ext.Dedup.duplicateComponents]] iterative min-label);
    * border points adopt the smallest cluster label among their core
    * neighbors; the rest is noise.
    *
    * Scale shape: candidate pairs come from the 3×3 cell equi-join
    * (never a cross join), the component iteration touches only core
    * points, and every role decision is one keyed aggregation. The
    * density parameters bound the per-cell fan-out exactly as in
    * [[radiusNeighbors]].
    *
    * @return (id, n_neighbors, role ∈ core|border|noise, cluster —
    *         null for noise)
    */
  def dbscanGrid(points: DataFrame, rMicro: Long, minPts: Int): DataFrame = {
    require(minPts >= 1, "minPts must be positive")
    val pairs = neighborPairs(points, rMicro).persist()
    val counts = pairs.groupBy(col("id_a").as("id"))
      .agg(count(lit(1)).as("n_neighbors"))
    val core = counts.filter(col("n_neighbors") + 1L >= minPts)
      .select(col("id"))
    val coreEdges = pairs
      .join(core.select(col("id").as("id_a")), "id_a")
      .join(core.select(col("id").as("id_b")), "id_b")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val comp = graft.ext.Dedup.duplicateComponents(coreEdges, core, "id")
      .select(col("id"), col("label"))
    val borderLbl = pairs
      .join(comp.select(col("id").as("id_b"), col("label")), "id_b")
      .join(core.select(col("id").as("id_a")), Seq("id_a"), "left_anti")
      .groupBy(col("id_a").as("id")).agg(min(col("label")).as("b_label"))
    points.select(col("id"))
      .join(counts, Seq("id"), "left").na.fill(0L, Seq("n_neighbors"))
      .join(comp.select(col("id"), col("label").as("c_label")), Seq("id"), "left")
      .join(borderLbl, Seq("id"), "left")
      .select(col("id"), col("n_neighbors"),
        when(col("c_label").isNotNull, lit("core"))
          .when(col("b_label").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("c_label"), col("b_label")).as("cluster"))
  }

  /** Ray-casting point-in-polygon over INTEGER micro-degree
    * coordinates — the geofence predicate (which landings fall inside
    * the management area). Division-free: the crossing test per edge
    * is a sign check on the exact integer cross product
    * `(x2−x1)(py−y1) − (y2−y1)(px−x1)` gated by the half-open
    * y-interval (`y1 ≤ py < y2` upward / `y2 ≤ py < y1` downward), so
    * the parity is bit-identical in any engine. Boundary points follow
    * the HALF-OPEN TILING convention (a point on a west/south edge is
    * inside, on an east/north edge outside) — adjacent fences tile the
    * plane with every point in exactly one, the property a
    * partition-by-region job needs; spec-pinned on the unit square.
    *
    * Scale shape: the polygon is a compile-time constant, so the
    * whole test folds into ONE per-row codegen expression — no join,
    * no shuffle, nothing but the scan. A multi-polygon variant would
    * broadcast an edge table instead; for a fixed fence this is the
    * plan you want at any scale.
    *
    * @param polygon closed ring as (x, y) micro-degree vertices
    *                (last→first edge implied), ≥ 3 vertices
    * @return input plus `n_crossings` and `inside` (parity) columns
    */
  def pointInPolygon(points: org.apache.spark.sql.DataFrame,
      xCol: String, yCol: String,
      polygon: Seq[(Long, Long)]): org.apache.spark.sql.DataFrame = {
    require(polygon.size >= 3, "polygon needs >= 3 vertices")
    val px = col(xCol)
    val py = col(yCol)
    val crossings = polygon.indices.map { i =>
      val (x1, y1) = polygon(i)
      val (x2, y2) = polygon((i + 1) % polygon.size)
      val cross = (lit(x2) - lit(x1)) * (py - lit(y1)) -
        (lit(y2) - lit(y1)) * (px - lit(x1))
      val upward = lit(y1) <= py && py < lit(y2) && cross > 0
      val downward = lit(y2) <= py && py < lit(y1) && cross < 0
      when(upward || downward, 1L).otherwise(0L)
    }.reduce(_ + _)
    points
      .withColumn("n_crossings", crossings)
      .withColumn("inside", (col("n_crossings") % 2 === 1).cast("boolean"))
  }
}
