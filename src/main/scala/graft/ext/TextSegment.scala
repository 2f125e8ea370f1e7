package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TextTiling-style topical segmentation: slide a gap pointer through
  * each document, score the lexical cohesion of the `w`-token windows
  * on either side (distinct-token Jaccard, micro-rounded), and call a
  * boundary wherever cohesion dips below `thresholdMicro` at a local
  * minimum — the chunking pre-pass that splits long documents on topic
  * shifts instead of fixed offsets (complements the fixed-stride
  * chunker, q84, and the CDC byte chunker, q277).
  *
  * Per-document bounded work: one Generate over the gap grid, array
  * ops on the two w-sized slices of the MATERIALIZED token attribute
  * (no derived-expression re-evaluation inside lambdas), and a
  * per-doc window for the local-minimum test. No shuffle beyond the
  * doc-keyed window sort.
  */
object TextSegment {

  /** @return (doc_id, pos, sim_micro, boundary) for every gap position
    *         `w, w+stride, …, len−w` of documents with ≥ 2w tokens
    */
  def tilingGaps(docs: DataFrame, idCol: String, textCol: String,
                 w: Int = 8, stride: Int = 4,
                 thresholdMicro: Long = 200000L): DataFrame = {
    require(w >= 1 && stride >= 1, "window and stride must be positive")
    val base = docs
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("l"))
      .filter(size(col("l")) >= 2 * w)
    val gaps = base.select(col("doc_id"), col("l"),
      explode(sequence(lit(w), size(col("l")) - w, lit(stride))).as("p"))
    val sims = gaps
      .select(col("doc_id"), col("p"),
        array_distinct(slice(col("l"), col("p") - w + 1, lit(w))).as("da"),
        array_distinct(slice(col("l"), col("p") + 1, lit(w))).as("db"))
      .select(col("doc_id"), col("p").cast("long").as("pos"),
        size(array_intersect(col("da"), col("db"))).cast("long").as("inter"),
        size(col("da")).cast("long").as("sa"), size(col("db")).cast("long").as("sb"))
      .select(col("doc_id"), col("pos"),
        round(col("inter").cast("double") * 1000000.0
          / (col("sa") + col("sb") - col("inter")).cast("double"), 0)
          .cast("long").as("sim_micro"))
    val perDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    sims
      .withColumn("prv", lag(col("sim_micro"), 1).over(perDoc))
      .withColumn("nxt", lead(col("sim_micro"), 1).over(perDoc))
      .select(col("doc_id"), col("pos"), col("sim_micro"),
        (col("sim_micro") < thresholdMicro &&
          col("sim_micro") <= coalesce(col("prv"), lit(Long.MaxValue)) &&
          col("sim_micro") < coalesce(col("nxt"), lit(Long.MaxValue)))
          .as("boundary"))
  }
}
