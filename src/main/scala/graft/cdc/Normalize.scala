package graft.cdc

import graft.model.SchemaRegistry
import graft.model.SchemaRegistry.{Epoch, FieldDef}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-epoch decoder: raw change-log rows (payload JSON + schema_id) →
  * rows in the LATEST reader schema, in a single codegen'd pass.
  *
  * Instead of one `from_json` per epoch + a union (N passes), we build a
  * SUPERSET struct containing every historical field name (one entry per
  * distinct (name, widest-type) across epochs — derived from the registry's
  * permanent field ids) and resolve each latest field as
  * `coalesce(newest-name, ..., oldest-name) CAST latest-type`. That is the
  * Iceberg field-id mapping expressed as one `from_json` + one `select` —
  * no shuffle, stays inside WholeStageCodegen.
  *
  * Reference analog: `@JsonIgnoreProperties(ignoreUnknown=true)` +
  * dual-epoch resolution (SearchResult.java:18-22; PaintServerWrapper.java:38-42).
  *
  * Precondition (checked): no field name is ever reused for a different
  * field id across epochs — otherwise name-coalesce would conflate ids.
  */
object Normalize {

  private def widest(ts: Seq[DataType]): DataType =
    ts.reduce { (a, b) =>
      if (a == b) a
      else (a, b) match {
        case (IntegerType, LongType) | (LongType, IntegerType) => LongType
        case (IntegerType | LongType, DoubleType) | (DoubleType, IntegerType | LongType) => DoubleType
        case _ => StringType
      }
    }

  /** Superset parse struct + per-latest-field coalesce chain. */
  private lazy val (parseStruct: StructType, resolvers: Seq[(String, Column)]) = {
    val epochs = SchemaRegistry.epochs
    // sanity: a name must always map to the same field id
    val nameToIds = epochs.flatMap(_.fields).groupBy(_.name).view.mapValues(_.map(_.id).distinct)
    require(nameToIds.forall(_._2.size == 1),
      s"field name reused across ids: ${nameToIds.filter(_._2.size > 1).keys.mkString(",")}")

    val byName: Map[String, Seq[FieldDef]] =
      epochs.flatMap(_.fields).groupBy(_.name)
    val struct = StructType(byName.toSeq.sortBy(_._1).map { case (n, fs) =>
      StructField(n, widest(fs.map(_.dataType)), nullable = true)
    })
    val res = SchemaRegistry.latest.fields.map { lf =>
      // names that carried this field id, newest epoch first
      val names = epochs.reverse.flatMap(_.fields.filter(_.id == lf.id).map(_.name)).distinct
      val c = if (names.size == 1) col(s"p.${names.head}")
              else coalesce(names.map(n => col(s"p.$n")): _*)
      lf.name -> c.cast(lf.dataType).as(lf.name)
    }
    (struct, res)
  }

  /** Raw change-log DataFrame (changeLogSchema) → normalized rows:
    * (seq, op, repo, path, ts, commit, language, content, size_bytes).
    * Delete events keep null payload columns.
    */
  def apply(raw: DataFrame): DataFrame = {
    raw
      .withColumn("p", from_json(col("payload"), parseStruct))
      .select(
        Seq(col("seq"), col("op"), col("repo"), col("path"), col("ts")) ++
          resolvers.map(_._2): _*)
  }
}
