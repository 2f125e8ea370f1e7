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
    val hits = probes.join(pts.select(col("id").as("id_b"),
        col("lat").as("lat_b"), col("lon").as("lon_b"),
        col("cx").as("jx"), col("cy").as("jy")), Seq("jx", "jy"))
      .filter(col("id_a") =!= col("id_b"))
      .filter(
        (col("lat_a") - col("lat_b")) * (col("lat_a") - col("lat_b")) +
        (col("lon_a") - col("lon_b")) * (col("lon_a") - col("lon_b"))
          <= lit(rMicro * rMicro))
      .groupBy(col("id_a").as("id")).agg(count(lit(1)).as("n_neighbors"))
    points.select(col("id")).join(hits, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"))
  }
}
