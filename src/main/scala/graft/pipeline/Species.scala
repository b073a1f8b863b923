package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The static species dimension (reference `whales.py:1-11` — the
  * 9-entry vernacular→scientific map — and the `species` table of
  * `db/scripts/db.sql:12-17`).
  *
  * Two access paths, both shuffle-free:
  *  - [[scientificNameFor]]: a `typedlit(Map)` + `element_at` literal
  *    lookup (constant-folded into the plan — the SURVEY §2.8 map-op);
  *  - [[dimension]]: the same data as a broadcastable DataFrame for
  *    joins and the JDBC dimension sink (S10).
  */
object Species {

  /** vernacular (snake_case CLI name) → scientific name. */
  val WhaleNames: Map[String, String] = Map(
    "beluga_whale" -> "Delphinapterus leucas",
    "blue_whale" -> "Balaenoptera musculus",
    "bowhead_whale" -> "Balaena mysticetus",
    "fin_whale" -> "Balaenoptera physalus",
    "gray_whale" -> "Eschrichtius robustus",
    "humpback_whale" -> "Megaptera novaeangliae",
    "killer_whale" -> "Orcinus orca",
    "narwhal" -> "Monodon monoceros",
    "sperm_whale" -> "Physeter macrocephalus")

  /** Literal map lookup (null when unknown — the *tolerant* form of the
    * reference's KeyError-prone `storage.py:92-93` reverse lookup,
    * deviation documented per SURVEY §7.5).
    */
  def scientificNameFor(whale: Column): Column =
    element_at(typedlit(WhaleNames), whale)

  /** Title-cased display name from the snake_case key (`cleaner.py:71-73`). */
  def vernacularFor(whale: Column): Column =
    initcap(regexp_replace(whale, "_", " "))

  /** The species dimension as a (broadcastable) DataFrame:
    * (whale, scientificName, vernacularName).
    */
  def dimension(spark: SparkSession): DataFrame = {
    import spark.implicits._
    WhaleNames.toSeq.sortBy(_._1).toDF("whale", "scientificName")
      .withColumn("vernacularName", vernacularFor(col("whale")))
  }
}
