package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion of the reference's nested JSON corpus shape
  * (`data/pubs_<split>.json`: dict block-name -> list of publication records,
  * FIXTURES.md §2; loaded by data_transfer.R:15-45 / baseline.py:8) into the
  * long-form relational tables the reference derives per block
  * (item/author/keywords/abstract, data_transfer.R:26-50) — Spark-natively:
  * whole-document read, `from_json` with an explicit nested schema
  * (MapType over array-of-struct), map explode, nested-field flattening with
  * `posexplode` for author sequence numbers (auseq = R rownames,
  * data_transfer.R:43 -> W2 window analogue).
  */
object JsonCorpus {

  val pubSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("venue", StringType),
    StructField("year", IntegerType),
    StructField("authors", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("org", StringType)
    )))),
    StructField("keywords", ArrayType(StringType)),
    StructField("abstract", StringType)
  ))

  val corpusType: MapType = MapType(StringType, ArrayType(pubSchema))

  /** whole-file JSON dict -> (block, pub struct) rows */
  def pubs(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("wholetext", true)
      .text(path)
      .select(explode(from_json(col("value"), corpusType)).as(Seq("block", "pubs")))
      .select(col("block"), explode(col("pubs")).as("pub"))

  /** item(block, id, title, venue, year) — data_transfer.R:26-41 */
  def items(pubs: DataFrame): DataFrame =
    pubs.select(
      col("block"),
      col("pub.id").as("id"),
      col("pub.title").as("title"),
      col("pub.venue").as("venue"),
      col("pub.year").as("year")
    )

  /** author(block, id, auseq, name, org) — auseq is the 1-based position in
    * the authors array (data_transfer.R:43)
    */
  def authors(pubs: DataFrame): DataFrame =
    pubs
      .select(col("block"), col("pub.id").as("id"), posexplode(col("pub.authors")).as(Seq("pos", "au")))
      .select(col("block"), col("id"), (col("pos") + 1).as("auseq"),
        col("au.name").as("name"), col("au.org").as("org"))

  /** keywords(block, id, keyword) one row per keyword — wordlist-table shape */
  def keywords(pubs: DataFrame): DataFrame =
    pubs
      .select(col("block"), col("pub.id").as("id"), explode_outer(col("pub.keywords")).as("keyword"))

  /** abstract(block, id, abstract) with the optional field left nullable —
    * combine-at.R:15-19 left-outer semantics
    */
  def abstracts(pubs: DataFrame): DataFrame =
    pubs.select(col("block"), col("pub.id").as("id"), col("pub.abstract").as("abstract"))
}
