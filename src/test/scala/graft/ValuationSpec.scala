package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Valuation

/** Shapley data valuation: the lattice computation must satisfy the
  * axioms it exists for — efficiency (credits sum exactly to the grand
  * coalition's marginal over the empty one, in exact 1/n! units) — and
  * a hand-walkable two-player game must come out in closed form.
  */
class ValuationSpec extends SparkTestBase {

  test("efficiency: Σ shap_num = n! × (v(full) − v(∅)) exactly") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val out = Valuation.shapleyByGroup(docs, "doc_id", "text", "lang",
      $"n_chars" >= 250).collect()
    assert(out.length == 5)
    val sumShap = out.map(_.getAs[Long]("shap_num")).sum
    // v(∅): empty model scores 0 ≥ 0 → predicts true for every panel doc
    val panel = docs.filter($"doc_id" % 7 === 0)
    val nPanel = panel.count()
    val nTrue = panel.filter($"n_chars" >= 250).count()
    val vEmpty = math.round(nTrue.toDouble * 1000.0 / nPanel)
    val vFull = out.head.getAs[Long]("v_full_milli")
    assert(out.forall(_.getAs[Long]("v_full_milli") == vFull))
    assert(sumShap == 120L * (vFull - vEmpty),
      s"efficiency violated: Σ=$sumShap vs 120×(${vFull}−$vEmpty)")
  }

  test("two symmetric players split the credit equally") {
    import spark.implicits._
    // two identical slices of the same docs: by symmetry the Shapley
    // values must be equal (and efficiency still exact with n=2)
    val docs = Tables.documents(spark, sfDir)
    // id shift by a multiple of panelMod keeps train/panel membership,
    // so both players contribute bit-identical corpora
    val out = Valuation.shapleyByGroup(
      docs.withColumn("half", lit("a"))
        .unionByName(docs.withColumn("doc_id", $"doc_id" + 7000000L)
          .withColumn("half", lit("b"))),
      "doc_id", "text", "half", $"n_chars" >= 250)
      .orderBy($"player").collect()
    assert(out.length == 2)
    // identical corpora per player → symmetric game → equal credit
    assert(out(0).getAs[Long]("shap_num") == out(1).getAs[Long]("shap_num"),
      s"symmetry violated: ${out.toSeq}")
  }

  test("lattice guard rejects player counts past the 4096-coalition budget") {
    import spark.implicits._
    // 13 synthetic players → 2^13 coalitions: over the documented wallet
    val docs = Tables.documents(spark, sfDir)
      .withColumn("grp13", ($"doc_id" % 13).cast("string"))
    val ex = intercept[IllegalArgumentException] {
      Valuation.shapleyByGroup(docs, "doc_id", "text", "grp13",
        $"n_chars" >= 250).collect()
    }
    assert(ex.getMessage.contains("player count 13"))
  }
}
