package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Taxonomic enrichment of a species list (reference R/model-taxa.R
  * `process_species_list`, :363-380):
  *
  *  - source database routing by ISSCAAP group (:365-368): groups
  *    57/45/43/42/56 → sealifebase, everything else → fishbase;
  *  - rank inference from the scientific name's FORM (:369-378):
  *    `" spp$"` → Genus, `"idae$"` → Family, `"formes$"` → Order, a
  *    binomial (contains a space, not spp/nei) → Species, else null;
  *  - `" spp$"` suffix strip (:379).
  *
  * Pure per-row regex expressions — codegen'd, no shuffle, linear at
  * any scale.
  */
object Taxa {

  private val SealifeGroups = Seq(57, 45, 43, 42, 56)

  def database(taxonGroup: Column): Column =
    when(taxonGroup.isInCollection(SealifeGroups), "sealifebase")
      .otherwise("fishbase")

  def rank(scientificName: Column): Column =
    when(scientificName.rlike(" spp$"), "Genus")
      .when(scientificName.rlike("idae$"), "Family")
      .when(scientificName.rlike("formes$"), "Order")
      .when(scientificName.rlike(" ") && !scientificName.rlike(" spp$|nei$"), "Species")
      .otherwise(lit(null).cast("string"))

  def stripSpp(scientificName: Column): Column =
    regexp_replace(scientificName, " spp$", "")

  /** Add `database`, `rank`, and the spp-stripped name to a species
    * list.
    */
  def processSpeciesList(df: DataFrame, nameCol: String, groupCol: String): DataFrame =
    df.withColumn("database", database(col(groupCol)))
      .withColumn("rank", rank(col(nameCol)))
      .withColumn(nameCol, stripSpp(col(nameCol)))
}
