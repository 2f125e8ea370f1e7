package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Principal-direction extraction over an embedding column by exact
  * integer fixed-point power iteration — the whitening / anisotropy
  * diagnostic for embedding spaces (a dominant direction usually means
  * uncentered or collapsed embeddings; downstream consumers project it
  * out).
  *
  * Pipeline: micro-int components → exact per-dimension mean →
  * centered covariance as exact integer sums (micro² scale) →
  * `g = round(cov/1e6)` → power iteration from the all-ones vector
  * with max-abs renormalization, every division a shared
  * round-of-double shape. All state after the one covariance pass is
  * dim×dim — driver-trivial, and the covariance pass itself is one
  * self-join of the (rows × dim) narrow table on the row id: linear in
  * the corpus with a dim² fan-out, shuffled once on the id.
  */
object Pca {

  /** (id, pos, v): centered micro-int components, one narrow pass. */
  private def centeredDims(df: DataFrame, embCol: String): DataFrame = {
    val dims = Exec.widen(df.select(col("vec_id").as("id"), col(embCol).as("emb")))
      .select(col("id"), posexplode(col("emb")).as(Seq("pos", "x")))
      .select(col("id"), col("pos").cast("long").as("pos"),
        round(col("x").cast("double") * 1000000, 0).cast("long").as("xm"))
    val mu = dims.groupBy(col("pos"))
      .agg(round(sum(col("xm")).cast("double") / count(lit(1)), 0)
        .cast("long").as("mu"))
    dims.join(broadcast(mu), "pos")
      .select(col("id"), col("pos"), (col("xm") - col("mu")).as("v"))
  }

  /** Scaled integer covariance (pi, pj, g) from the centered table. */
  private def covMicro(cen: DataFrame): DataFrame =
    cen.as("a")
      .join(cen.as("b"), col("a.id") === col("b.id"))
      .groupBy(col("a.pos").as("pi"), col("b.pos").as("pj"))
      .agg(sum(col("a.v") * col("b.v")).as("cov"))
      .withColumn("g", round(col("cov").cast("double") / 1000000.0, 0).cast("long"))
      .select(col("pi"), col("pj"), col("g"))

  /** `iters` fixed-point matvec rounds from the all-ones vector; the
    * dim²-sized cov table is materialized locally so every step
    * broadcasts the same in-memory rows.
    */
  private def powerIterate(df: DataFrame, cov: DataFrame,
                           iters: Int): DataFrame = {
    val gLocal = IvfIndex.materializeLocal(df.sparkSession, cov)
    var v = IvfIndex.materializeLocal(df.sparkSession,
      gLocal.select(col("pi").as("pos")).distinct()
        .select(col("pos"), lit(1000000L).as("v")))
    for (_ <- 1 to iters) {
      val w = gLocal.join(broadcast(v), col("pj") === col("pos"))
        .groupBy(col("pi"))
        .agg(sum(col("g") * col("v")).as("w"))
      val m = w.agg(max(abs(col("w"))).as("m"))
      v = IvfIndex.materializeLocal(df.sparkSession,
        w.crossJoin(broadcast(m))
          .select(col("pi").as("pos"),
            when(col("m") > 0,
              round(col("w").cast("double") * 1000000.0 / col("m").cast("double"), 0)
                .cast("long")).otherwise(0L).as("v")))
    }
    v
  }

  /** Top principal direction after `iters` fixed-point power steps.
    * @return (pos, v_micro) — dim rows, max-abs component = ±1e6
    */
  def powerTopDirection(df: DataFrame, embCol: String,
                        iters: Int = 2): DataFrame = {
    val cen = centeredDims(df, embCol)
    powerIterate(df, covMicro(cen), iters)
      .select(col("pos"), col("v").as("v_micro"))
  }

  /** Anisotropy report: the share of total (centered) variance carried
    * by the top principal direction from [[powerTopDirection]] — the
    * "is this embedding space collapsed" health number (isotropic
    * spaces score ≈ 1/dim; a dominant direction pushes toward 1).
    *
    * Per-row projections `p = Σ v·(x−μ)` are exact integers scaled once
    * (`q = round(p/1e6)`); the three sums of squares (projection,
    * direction, total) are exact 64-bit sums, and the single ratio is
    * one shared double expression. The centered table is built ONCE and
    * persisted across the covariance and projection passes.
    *
    * @return one row (n_rows, total_ss, p2, v2, ratio_milli)
    */
  def anisotropy(df: DataFrame, embCol: String, iters: Int = 2): DataFrame = {
    val cen = centeredDims(df, embCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val v = powerIterate(df, covMicro(cen), iters)
      // alias the direction component: `cen` also carries a `v` column
      val vv = v.select(col("pos"), col("v").as("vm"))
      val proj2 = cen.join(broadcast(vv), "pos")
        .groupBy(col("id"))
        .agg(sum(col("v") * col("vm")).as("p"))
        .withColumn("q", round(col("p").cast("double") / 1000000.0, 0).cast("long"))
      val t = cen.agg(count(lit(1)).as("n_cells"),
        sum(col("v") * col("v")).as("total_ss"))
      val p2 = proj2.agg(count(lit(1)).as("n_rows"),
        sum(col("q") * col("q")).as("p2"))
      val v2 = vv.agg(sum(col("vm") * col("vm")).as("v2"))
      p2.crossJoin(t).crossJoin(v2)
        .select(col("n_rows"), col("total_ss"), col("p2"), col("v2"),
          round(col("p2").cast("double") * 1000000000000.0
            / (col("v2").cast("double") * col("total_ss").cast("double"))
            * 1000.0, 0).cast("long").as("ratio_milli"))
        .localCheckpoint(true)
    } finally { cen.unpersist(false); () }
  }

  /** Linear CKA (centered-kernel alignment) between two dimension
    * blocks of one embedding table — "do the first and last halves of
    * the vector encode the same geometry": CKA = ‖Cxy‖²_F /
    * (‖Cxx‖_F·‖Cyy‖_F) over centered cross-covariance blocks. The
    * moments Σx_a·x_b, Σx_a, Σx_b are exact integers; the centered
    * entry `n·Σx_a·x_b − Σx_a·Σx_b` is combined in ONE SHARED DOUBLE
    * SHAPE (it grows as n²·1e10 micro-units and would wrap signed-64
    * near n≈20k rows — both engines multiply the identical IEEE
    * doubles instead), then giga-floored before the Frobenius squares;
    * the closing ratio is the other shared double.
    *
    * One posexplode + one id-keyed self-join builds the full gram
    * (rows × dims² — dims bounded); everything after is dims²-sized.
    *
    * @return one row: (n, split_dim, cka_milli)
    */
  def linearCka(emb: DataFrame, idCol: String, vecCol: String,
                splitDim: Int = 32): DataFrame = {
    require(splitDim >= 1, "split dimension must be positive")
    val m = emb.select(col(idCol).as("id"),
      posexplode(transform(col(vecCol),
        x => round(x.cast("double") * 1000000.0, 0).cast("long")))
        .as(Seq("d", "xm")))
      .persist()
    val sums = m.groupBy(col("d")).agg(sum(col("xm")).as("sd"))
    val nRow = emb.agg(count(lit(1)).as("n"))
    val gram = m.as("a").join(m.as("b"), col("a.id") === col("b.id"))
      .groupBy(col("a.d").as("da"), col("b.d").as("db"))
      .agg(sum(col("a.xm") * col("b.xm")).as("sxy"))
    val blocks = gram
      .join(broadcast(sums.select(col("d").as("da"), col("sd").as("sa"))), "da")
      .join(broadcast(sums.select(col("d").as("db"), col("sd").as("sb"))), "db")
      .crossJoin(broadcast(nRow))
      // centered entry in one shared double shape (n·sxy grows as n²·1e10
      // and would wrap signed-64 near n≈20k; both engines multiply the
      // SAME IEEE doubles instead), then the giga floor both share
      .withColumn("mg",
        round((col("n").cast("double") * col("sxy").cast("double")
          - col("sa").cast("double") * col("sb").cast("double"))
          / 1.0e9, 0).cast("long"))
      .withColumn("blk",
        when(col("da") < splitDim && col("db") < splitDim, "xx")
          .when(col("da") >= splitDim && col("db") >= splitDim, "yy")
          .when(col("da") < splitDim && col("db") >= splitDim, "xy")
          .otherwise("yx"))
    val fro = blocks.filter(col("blk") =!= "yx")
      .groupBy(col("blk")).agg(sum(col("mg") * col("mg")).as("f2"))
    val wide = fro.groupBy(lit(1).as("one"))
      .pivot(col("blk"), Seq("xx", "yy", "xy")).agg(first(col("f2")))
    wide.crossJoin(broadcast(nRow))
      .select(col("n"), lit(splitDim.toLong).as("split_dim"),
        round(col("xy").cast("double")
          / (sqrt(col("xx").cast("double")) * sqrt(col("yy").cast("double")))
          * 1000.0, 0).cast("long").as("cka_milli"))
  }
}
