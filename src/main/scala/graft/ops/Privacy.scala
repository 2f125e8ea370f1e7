package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audits over quasi-identifier combinations — the release
  * gate a training-data pipeline runs before person-derived records (or
  * text with structured attributes) ship: k-anonymity equivalence-class
  * census across a generalization ladder, and attribute l-diversity
  * within those classes. (/root/reference keeps raw enumerator/vessel
  * attributes; these are the standard audits such a dataset would pass
  * through before publication.)
  *
  * Scale shape: each audit level is ONE hash aggregation on its
  * quasi-identifier tuple (map-side partial combine, no window, no
  * pair joins), then a per-level rollup of the class-size table —
  * classes, not records, so the second stage is small. Levels evaluate
  * independently and union; nothing collects to the driver.
  */
object Privacy {

  /** k-anonymity census across a generalization ladder: for each named
    * level (a progressively coarser quasi-identifier projection), the
    * number of equivalence classes, how many fall below `k`, the count
    * of records exposed in those classes, and the worst (smallest)
    * class size. The standard publish decision is "generalize until
    * records_at_risk = 0".
    *
    * @param levels (level_name, quasi-identifier columns), finest first
    * @return (level, n_classes, n_violating, records_at_risk, min_class)
    *         one row per level in ladder order via the ordinal column
    */
  def kAnonymityLadder(df: DataFrame, levels: Seq[(String, Seq[Column])],
                       k: Long): DataFrame = {
    require(levels.nonEmpty, "need at least one generalization level")
    require(k >= 2, "k below 2 is vacuous")
    val reports = levels.zipWithIndex.map { case ((name, qi), i) =>
      df.groupBy(qi: _*)
        .agg(count(lit(1)).as("sz"))
        .agg(
          count(lit(1)).as("n_classes"),
          sum(when(col("sz") < k, 1L).otherwise(0L)).as("n_violating"),
          sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("records_at_risk"),
          min(col("sz")).as("min_class"))
        .select(lit(i.toLong).as("level_ord"), lit(name).as("level"),
          col("n_classes"), col("n_violating"), col("records_at_risk"),
          col("min_class"))
    }
    reports.reduce(_ unionByName _)
  }

  /** Distinct-l-diversity of a sensitive attribute within the
    * equivalence classes of a quasi-identifier tuple: a k-anonymous
    * class is still disclosive when every member shares one sensitive
    * value (the homogeneity attack), so the release gate also demands
    * ≥ `l` distinct sensitive values per class. Per class:
    * (size, n_sensitive, diverse flag); plus use the companion rollup
    * below for the one-row publish decision.
    *
    * @return (qi..., class_size, n_sensitive, diverse)
    */
  def lDiversityClasses(df: DataFrame, qi: Seq[Column], sensitive: Column,
                        l: Long): DataFrame = {
    require(l >= 2, "l below 2 is vacuous")
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** Distinct AND entropy l-diversity per equivalence class: distinct-l
    * (as [[lDiversityClasses]]) plus the entropy criterion
    * H(sensitive | class) ≥ ln(l), which additionally rejects classes
    * where one value dominates a nominally-diverse mix. Entropy terms
    * are micro-rounded per (class, value) then integer-summed — the
    * cross-engine fixed-point discipline.
    *
    * Two stacked hash aggregations — (qi, sensitive) counts, then per
    * class — both map-side combinable; no window, no join back to
    * records.
    *
    * @return (qi..., class_size, n_sensitive, entropy_micro,
    *         distinct_ok, entropy_ok)
    */
  def lDiversityReport(df: DataFrame, qi: Seq[Column], qiNames: Seq[String],
                       sensitive: Column, l: Long): DataFrame = {
    require(l >= 2, "l below 2 is vacuous")
    require(qi.size == qiNames.size, "one name per quasi-identifier column")
    val named = qi.zip(qiNames).map { case (c, n) => c.as(n) }
    val vc = df.select((named :+ sensitive.as("sv")): _*)
      .groupBy((qiNames.map(col) :+ col("sv")): _*)
      .agg(count(lit(1)).as("n_cv"))
    val perClass = vc
      .withColumn("n_c",
        sum(col("n_cv")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(qiNames.map(col): _*)))
      .withColumn("term_micro",
        round(-(col("n_cv").cast("double") / col("n_c").cast("double"))
          * log(col("n_cv").cast("double") / col("n_c").cast("double"))
          * 1000000.0, 0).cast("long"))
      .groupBy(qiNames.map(col): _*)
      .agg(max(col("n_c")).as("class_size"),
        count(lit(1)).as("n_sensitive"),
        sum(col("term_micro")).as("entropy_micro"))
    val lnL = math.round(math.log(l.toDouble) * 1000000.0)
    perClass
      .withColumn("distinct_ok", col("n_sensitive") >= l)
      .withColumn("entropy_ok", col("entropy_micro") >= lnL)
  }
}
