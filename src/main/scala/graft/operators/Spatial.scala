package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial radius join — "all pairs of points within distance r", the
  * proximity primitive under store-siting, sensor clustering, and geo
  * entity resolution. The naive form is an O(n²) cross join; the scale
  * form is GRID BUCKETING: partition the plane into r×r cells, replicate
  * each left-side point into its cell's 3×3 neighborhood, and equi-join on
  * the cell key — every true pair shares one (replica-cell = home-cell)
  * combination, and the exact distance predicate runs only inside
  * neighborhoods. The same decomposition the z-order/geohash layouts
  * ([[graft.etl.Layout]]) serve at the FILE level, applied at the JOIN
  * level.
  *
  * Coordinates are INTEGERS (centi-degrees, millimeters — caller's unit)
  * so the distance test is exact BIGINT cross-multiplication: no floating
  * threshold to diverge cross-engine, no haversine (whose transcendentals
  * are engine-divergent; project first if you need geodesic distance).
  */
object Spatial {

  /** All unordered pairs (id_a < id_b) within `radius` in the planar L2
    * metric, with the exact squared distance. Coordinates may be any
    * BIGINT (cell ids use TRUE floor division — a truncate-toward-zero
    * `div` would make the cell at the origin 2r wide and silently miss
    * cross-origin neighbor pairs; the double-based floor is exact for
    * |coord| < 2⁵², far beyond any projected-coordinate unit).
    *
    * Dedup is structural, not a DISTINCT: the pair {A, B} joins once as
    * (A-replica, B-home) and once as (B-replica, A-home); `id_a < id_b`
    * keeps exactly the first. Scale shape: the join key is the cell id —
    * 9× replication on one side, one hash shuffle each side, exact
    * arithmetic inside neighborhoods only. Dense cells skew the shuffle
    * exactly like hot LSH buckets; the salt-split treatment
    * ([[Similarity]]'s HotBucketCap pattern) applies unchanged if a cell
    * outgrows a task. */
  def radiusSelfJoin(points: DataFrame, radius: Long, idCol: String = "id",
      xCol: String = "x", yCol: String = "y"): DataFrame = {
    require(radius >= 1, s"radius must be positive, got $radius")
    val cells = points.select(col(idCol).as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"),
      floor(col(xCol).cast("long") / radius).cast("long").as("cx"),
      floor(col(yCol).cast("long") / radius).cast("long").as("cy"))
    val offsets = array((for { dx <- -1 to 1; dy <- -1 to 1 } yield
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
    val rep = cells.select(col("id").as("id_a"), col("x").as("xa"),
        col("y").as("ya"), explode(offsets).as("o"),
        col("cx"), col("cy"))
      .select(col("id_a"), col("xa"), col("ya"),
        (col("cx") + col("o.dx")).as("kx"), (col("cy") + col("o.dy")).as("ky"))
    val home = cells.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), col("cx").as("kx"), col("cy").as("ky"))
    val d2 = (col("xa") - col("xb")) * (col("xa") - col("xb")) +
      (col("ya") - col("yb")) * (col("ya") - col("yb"))
    rep.join(home, Seq("kx", "ky"))
      .filter(col("id_a") < col("id_b") && d2 <= radius * radius)
      .select(col("id_a"), col("id_b"), d2.as("dist2"))
  }
}
