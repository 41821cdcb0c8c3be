package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tree-flatten over nested JSON payloads — the reference's signature
  * transform (recursive `flattenTree` / `addToListFromAnnotation`,
  * /root/reference/src/main/java/org/tair/process/PantherBookXmlToJson.java:44-61,65-132),
  * re-expressed Spark-first: a depth-bounded recursive schema drives ONE
  * `from_json`, then each level is peeled with `explode` — all codegen'd
  * Catalyst, no per-row recursion, no UDFs. Output is node rows
  * (depth, name, parent) that downstream distinct-collects (A1) consume.
  *
  * Spark schemas are finite, so the recursion is depth-bounded by
  * `maxDepth` — matching the reference, whose recursion is bounded by the
  * document's actual nesting. Levels deeper than `maxDepth` are simply not
  * parsed (from_json drops unknown fields).
  */
object TreeOps {

  /** Recursive node schema to `depth` levels:
    * struct<name:string, children:array<struct<name, children:...>>>,
    * terminating in a leaf struct with only `name`.
    */
  def treeSchema(depth: Int): StructType = {
    require(depth >= 1, "tree depth must be >= 1")
    val leaf = StructType(Seq(StructField("name", StringType)))
    (1 until depth).foldLeft(leaf)((child, _) =>
      StructType(Seq(
        StructField("name", StringType),
        StructField("children", ArrayType(child)))))
  }

  /** Flatten a nested-JSON tree column into node rows
    * (depth: long, name: string, parent: string — null at the root).
    * Unparseable / null JSON rows are dropped.
    */
  def flattenTree(df: DataFrame, jsonCol: String, maxDepth: Int): DataFrame = {
    // PERMISSIVE from_json yields an all-null struct (not a null struct)
    // for malformed input — a nameless root identifies those rows
    val parsed = df
      .select(from_json(col(jsonCol), treeSchema(maxDepth)).as("node"))
      .filter(col("node").isNotNull && col("node.name").isNotNull)
    var cur = parsed.select(
      lit(0L).as("depth"), lit(null).cast("string").as("parent"), col("node"))
    val levels = Seq.newBuilder[DataFrame]
    levels += cur.select(col("depth"), col("node.name").as("name"), col("parent"))
    for (d <- 1 until maxDepth) {
      cur = cur.select(lit(d.toLong).as("depth"), col("node.name").as("parent"),
        explode(col("node.children")).as("node"))
      levels += cur.select(col("depth"), col("node.name").as("name"), col("parent"))
    }
    levels.result().reduce(_ union _)
  }
}
