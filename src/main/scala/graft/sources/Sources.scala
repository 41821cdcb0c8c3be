package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source adapters mapped from the reference's scans (SURVEY §2.1).
  * Everything returns a DataFrame; dimension-sized inputs are expected to
  * be broadcast by the caller.
  */
object Sources {

  /** S9: delimited dimension scan (the reference's locus→AGI / organism
    * CSVs, PantherLocalWrapper.java:106-149). Header ON by default (the
    * reference dims carry one); type inference off for determinism —
    * pass an explicit schema when known.
    */
  def csvDim(spark: SparkSession, path: String, delimiter: String = ",",
             header: Boolean = true): DataFrame =
    spark.read.option("header", header).option("delimiter", delimiter).csv(path)

  /** S10: JSON dimension scan (symbols.json, PantherLocalWrapper.java:548-567). */
  def jsonDim(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** S8: OBO-style stateful multi-line record parse
    * (GOAnnotationGafUtils.java:28-73 — the `id:`/`name:`/`namespace:`
    * triple inside `[Term]` stanzas). Dimension files are small, so each
    * FILE is one record-complete unit: read wholetext per file (records
    * never straddle a split), split stanzas, extract k/v — all executors,
    * no driver parsing. Output: (id, name, namespace).
    */
  def oboTerms(spark: SparkSession, path: String): DataFrame = {
    spark.read.option("wholetext", true).text(path)
      .select(explode(split(col("value"), "\\[Term\\]")).as("stanza"))
      .select(
        regexp_extract(col("stanza"), "(?m)^id: *(\\S+)", 1).as("id"),
        regexp_extract(col("stanza"), "(?m)^name: *(.+)", 1).as("name"),
        regexp_extract(col("stanza"), "(?m)^namespace: *(\\S+)", 1).as("namespace"))
      .filter(col("id") =!= "")
  }

  /** S6-analog for delimited WAL-ish text: line scan with a validator
    * filter (GAF line feed, GO_IBA_Pipeline.java:118-168): drop comment
    * lines, split on tab, enforce arity.
    */
  def gafLines(spark: SparkSession, path: String, minCols: Int): DataFrame =
    spark.read.text(path)
      .filter(!col("value").startsWith("!") && length(trim(col("value"))) > 0)
      .select(split(col("value"), "\t").as("cols"))
      .filter(size(col("cols")) >= minCols)

  /** S12: directory-listing scan via binaryFile (staged-id enumeration,
    * PantherLocalWrapper.java:498-517): path + length + content bytes.
    */
  def binaryFiles(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(col("path"), col("length"), col("content"))

  /** S4/S5: XML record scan via Spark 4's built-in XML source (the
    * reference's SAX streaming XML parse, pantherToPhyloXmlPipeline.java
    * :265-292 / Util.java:157-176): one row per `rowTag` element; schema
    * inferred unless provided. The source is a real FileFormat — splits,
    * pushdown and streaming (`readStream`) come for free, unlike the
    * reference's single-threaded SAX walk.
    */
  def xmlRecords(spark: SparkSession, path: String, rowTag: String): DataFrame =
    spark.read.format("xml").option("rowTag", rowTag).load(path)

  /** S14 analog: compressed text ingestion. The reference shells out to
    * wget + gunzip (PantherETLPipeline.java); Hadoop's codec layer makes
    * `.gz` transparent to any text/CSV/JSON scan. NOTE: gzip is
    * NON-SPLITTABLE — one task per file — so a 100-TB feed must arrive
    * sharded (many .gz files) or recompressed to a splittable codec (zstd
    * parquet) at the edge; this helper is the landing scan.
    */
  def gzText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
}

/** Sink adapters (SURVEY §2.1 K5-K9). */
object Sinks {

  /** K7: CSV report sink. */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", true).csv(path)

  /** K6: JSON doc sink. */
  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** K9: FASTA text sink — `>`+header line, sequence wrapped at 60 chars
    * (PhylogenesServerWrapper.java:1408-1453's string assembly as one
    * codegen'd expression).
    */
  def fasta(df: DataFrame, idCol: String, seqCol: String, path: String): Unit =
    df.select(concat(
        lit(">"), col(idCol), lit("\n"),
        // (?!$): no wrap after the FINAL 60-char group — a sequence whose
        // length is an exact multiple of 60 must not emit a blank line
        // (strict FASTA parsers read that as a record separator)
        regexp_replace(col(seqCol), "(.{60})(?!$)", "$1\n")).as("value"))
      .write.mode("overwrite").text(path)

  /** K8: XML sink (reference phyloXML writes, Util.java:157-176) — one
    * `rowTag` element per row under a single `rootTag`, via Spark 4's
    * built-in XML format.
    */
  def xml(df: DataFrame, path: String, rowTag: String = "record",
          rootTag: String = "records"): Unit =
    df.write.mode("overwrite").format("xml")
      .option("rowTag", rowTag).option("rootTag", rootTag).save(path)
}
