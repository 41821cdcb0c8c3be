package graft

import org.apache.spark.sql.functions._

/** The engine's SQL surface: the same tables and semantics through
  * `spark.sql`, including the lake table registered as a view and the
  * custom lww aggregate reachable from SQL.
  */
class SqlSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def view(name: String): Unit =
    spark.read.parquet(s"$sf/$name.parquet").createOrReplaceTempView(name)

  test("spark.sql over registered views matches the DataFrame catalog") {
    Seq("lineitem", "orders", "customer").foreach(view)
    val sql = spark.sql(
      """SELECT c_mktsegment, count(*) AS n_orders,
        |CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
      .orderBy("c_mktsegment").collect().map(_.toSeq)
    val df = Queries.sparkQueries("j1_enrichment")(spark, sf)
      .orderBy("c_mktsegment").collect().map(_.toSeq)
    assert(sql.toSeq === df.toSeq)
  }

  test("lake table readable through SQL (view over read())") {
    val base = tmpDir("sqltable")
    val table = lake.LakeTable(s"$base/t", 4)
    table.merge(spark,
      Seq(("r", "p", "I", 1L, "c", "scala", "hello", Option.empty[Long]))
        .toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"), 0L)
    table.read(spark).createOrReplaceTempView("repos")
    val got = spark.sql(
      "SELECT repo, path, sha2(content, 256) AS sha FROM repos WHERE language = 'scala'")
      .count()
    assert(got === 1L)
  }

  test("lww aggregate callable from SQL via registered function") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lww", exprs => graft.cdc.LwwAgg(exprs(0), exprs(1)).toAggregateExpression(),
      "built-in")
    Seq(("k1", 1L, "old"), ("k1", 2L, "new"), ("k2", 5L, "only"))
      .toDF("k", "seq", "v").createOrReplaceTempView("ev")
    val got = spark.sql(
      "SELECT k, lww(struct(v), seq).v AS v FROM ev GROUP BY k")
      .as[(String, String)].collect().toMap
    assert(got === Map("k1" -> "new", "k2" -> "only"))
  }
}
