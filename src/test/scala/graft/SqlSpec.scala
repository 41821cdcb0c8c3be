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

  test("SQL MERGE INTO graft_lake ≡ Dataset merge (seq guard, delete, stale, insert)") {
    val base = tmpDir("sqlmerge")
    val initial = Seq(
      ("r1", "p1", "I", 10L, Option("c1"), Option("scala"), Option("v1"), Option(1L)),
      ("r2", "p2", "I", 20L, Option("c2"), Option("java"), Option("v2"), Option(2L)),
      ("r3", "p3", "I", 30L, Option("c3"), Option("py"), Option("v3"), Option(3L))
    ).toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes")
    val changes = Seq(
      ("r1", "p1", "U", 100L, Option("c9"), Option("scala"), Option("v1-new"), Option(9L)), // applies
      ("r2", "p2", "U", 5L, Option("cX"), Option("java"), Option("stale"), Option(0L)),     // stale: ignored
      ("r3", "p3", "D", 100L, Option.empty[String], Option.empty[String], Option.empty[String], Option.empty[Long]), // delete
      ("r4", "p4", "I", 40L, Option("c4"), Option("rs"), Option("v4"), Option(4L))          // insert
    ).toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes")

    val t1 = lake.LakeTable(s"$base/t1", 4)
    val t2 = lake.LakeTable(s"$base/t2", 4)
    t1.merge(spark, initial, 0L)
    t2.merge(spark, initial, 0L)
    t1.merge(spark, changes, 1L) // Dataset-API reference semantics

    changes.createOrReplaceTempView("changes")
    val mergeStmt =
      s"""MERGE INTO graft_lake.`$base/t2` AS t
         |USING changes AS s
         |ON t.repo = s.repo AND t.path = s.path
         |WHEN MATCHED AND s.seq > t.seq AND s.op = 'D' THEN DELETE
         |WHEN MATCHED AND s.seq > t.seq AND s.op <> 'D' THEN UPDATE SET *
         |WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT *""".stripMargin
    val stats = spark.sql(mergeStmt).collect()
    assert(stats.length === 1 && stats.head.getAs[Long]("src_rows") === 4L)

    def state(t: lake.LakeTable) = t.read(spark)
      .orderBy("repo", "path").collect().map(_.toSeq).toSeq
    val viaDataset = state(t1)
    val viaSql = state(t2)
    assert(viaSql === viaDataset)
    assert(viaSql.map(_.head) === Seq("r1", "r2", "r4")) // r3 deleted
    // seq-guard idempotence: replaying the same statement is a no-op
    spark.sql(mergeStmt)
    assert(state(t2) === viaDataset)
  }

  test("SQL MERGE INTO rejects non-key ON clauses and unaliased targets") {
    val base = tmpDir("sqlmerge-bad")
    lake.LakeTable(s"$base/t", 4)
    Seq(("r", "p", 1L)).toDF("repo", "path", "seq").createOrReplaceTempView("src1")
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO graft_lake.`$base/t` AS t USING src1 AS s
                   |ON t.repo = s.repo
                   |WHEN MATCHED THEN DELETE""".stripMargin)
    }
    assert(e.getMessage.contains("graft MERGE INTO"), e.getMessage)
  }

  test("SQL SELECT over graft_lake: full read, time travel, bucket-pruned point read") {
    val base = tmpDir("sqlread")
    val table = lake.LakeTable(s"$base/t", 8)
    val rows = (1 to 40).map(i =>
      (s"r${i % 5}", s"p$i", "I", i.toLong, Option(s"c$i"), Option("scala"),
        Option(s"content-$i"), Option(i.toLong)))
    table.merge(spark, rows.toDF(
      "repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"), 0L)
    // v2: update one key, delete another
    table.merge(spark, Seq(
      ("r1", "p1", "U", 100L, Option("c9"), Option("scala"), Option("v2"), Option(9L)),
      ("r2", "p2", "D", 100L, Option.empty[String], Option.empty[String],
        Option.empty[String], Option.empty[Long]))
      .toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"), 1L)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("repo", "path").collect().map(_.toSeq).toSeq

    // full SELECT ≡ Dataset read (aliased and bare)
    assert(canon(spark.sql(s"SELECT * FROM graft_lake.`$base/t`")) === canon(table.read(spark)))
    assert(spark.sql(s"SELECT count(*) AS n FROM graft_lake.`$base/t` AS t WHERE t.language='scala'")
      .head().getLong(0) === 39L) // 40 - 1 deleted
    // time travel ≡ readAt
    assert(canon(spark.sql(s"SELECT * FROM graft_lake.`$base/t` VERSION AS OF 1"))
      === canon(table.readAt(spark, 1)))
    // point read: correct row AND a pruned file set (scans 1 bucket, not 8)
    val point = spark.sql(
      s"SELECT content FROM graft_lake.`$base/t` WHERE repo = 'r1' AND path = 'p1'")
    assert(point.as[String].collect().toSeq === Seq("v2"))
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      val plans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s.relation.location.inputFiles.length.toLong
      }
      plans.sum
    }
    val full = spark.sql(s"SELECT content FROM graft_lake.`$base/t`")
    assert(scannedFiles(point) < scannedFiles(full),
      s"point read must enumerate fewer files (${scannedFiles(point)} vs ${scannedFiles(full)})")
    // a shapeless INSERT (bare VALUES that neither names columns nor spans
    // the schema) fails with the table's column list as guidance
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO graft_lake.`$base/t` VALUES ('r','p')")
    }
    assert(e.getMessage.contains("table columns: repo, path"), e.getMessage)
    // correlated conjuncts naming an OUTER alias must NOT trigger pruning:
    // o.repo/o.path constrain events, so for every event row the EXISTS
    // subquery is over the FULL lake table (non-empty) — all rows survive
    spark.range(1).selectExpr("'rX' AS repo", "'pX' AS path", "id")
      .createOrReplaceTempView("outer_events")
    val corr = spark.sql(
      s"""SELECT count(*) AS n FROM outer_events o WHERE EXISTS (
         |  SELECT 1 FROM graft_lake.`$base/t` WHERE o.repo = 'rX' AND o.path = 'pX')""".stripMargin)
      .head().getLong(0)
    assert(corr === 1L,
      "outer-qualified key conjuncts pruned the inner relation (must stay a full read)")
  }

  test("SQL SELECT with repo-only predicate: bounds-pruned after sorted compaction") {
    val base = tmpDir("sqlrepo")
    val table = lake.LakeTable(s"$base/t", 8)
    val rows = (1 to 80).map(i =>
      (s"r${i % 8}", s"p$i", "I", i.toLong, Option(s"c$i"), Option("scala"),
        Option(s"content-$i"), Option(i.toLong)))
    table.merge(spark, rows.toDF(
      "repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"), 0L)
    // sorted + size-split compaction gives files with narrow repo ranges
    table.compact(spark, gcTombstones = true, targetFileRows = Some(4L))

    val repoQ = spark.sql(
      s"SELECT * FROM graft_lake.`$base/t` WHERE repo = 'r3'")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("repo", "path").collect().map(_.toSeq).toSeq
    assert(canon(repoQ) ===
      canon(table.read(spark).filter($"repo" === "r3")))
    assert(repoQ.count() === 10L)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.inputFiles.length.toLong
      }.sum
    val full = spark.sql(s"SELECT * FROM graft_lake.`$base/t`")
    assert(scannedFiles(repoQ) < scannedFiles(full),
      s"repo-scoped read must enumerate fewer files (${scannedFiles(repoQ)} vs ${scannedFiles(full)})")

    // directory listing: repo + path LIKE 'prefix%' — prefix-pruned
    val dirQ = spark.sql(
      s"SELECT * FROM graft_lake.`$base/t` WHERE repo = 'r3' AND path LIKE 'p1%'")
    assert(canon(dirQ) === canon(
      table.read(spark).filter($"repo" === "r3" && $"path".startsWith("p1"))))
    assert(dirQ.count() === 2L) // p11, p19 belong to r3 (i % 8 == 3)
    assert(scannedFiles(dirQ) <= scannedFiles(repoQ),
      "path-prefix read must not scan more than the repo-scoped read")
    // non-prefix LIKE patterns must NOT trigger prefix pruning (still correct)
    val midQ = spark.sql(
      s"SELECT count(*) AS n FROM graft_lake.`$base/t` WHERE repo = 'r3' AND path LIKE '%9'")
    assert(midQ.head().getLong(0) ===
      table.read(spark).filter($"repo" === "r3" && $"path".endsWith("9")).count())
  }

  test("MERGE INTO composes with a graft_lake SELECT source") {
    val base = tmpDir("sqlcompose")
    val src = lake.LakeTable(s"$base/src", 4)
    val dst = lake.LakeTable(s"$base/dst", 4)
    val rows = Seq(
      ("r1", "p1", "I", 1L, Option("c1"), Option("scala"), Option("a"), Option(1L)),
      ("r2", "p2", "I", 2L, Option("c2"), Option("java"), Option("b"), Option(2L)))
      .toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes")
    src.merge(spark, rows, 0L)
    spark.sql(
      s"""MERGE INTO graft_lake.`$base/dst` AS t
         |USING (SELECT repo, path, 'I' AS op, seq, commit, language, content, size_bytes
         |       FROM graft_lake.`$base/src`) AS s
         |ON t.repo = s.repo AND t.path = s.path
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(dst.read(spark).count() === 2L)
  }

  test("TIMESTAMP AS OF resolves to the newest snapshot at-or-before the ts") {
    val base = tmpDir("sqltt")
    val table = lake.LakeTable(s"$base/t", 4)
    def put(seq: Long, v: String): Unit = table.merge(spark,
      Seq(("r", "p", "U", seq, s"c$seq", "scala", v, Option(seq)))
        .toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"),
      seq)
    put(1, "v1")
    Thread.sleep(20) // distinct commit wall-clocks
    put(2, "v2")
    val tsAfterV2 = table.head().committedAtMs
    Thread.sleep(20)
    put(3, "v3")

    // ≡ readAt of the resolved version (v2 was head at tsAfterV2)
    val resolved = table.versionAt(tsAfterV2)
    // render the literal in UTC explicitly (the session tz) — Timestamp
    // .toString would use the JVM default tz and skew the comparison
    val tsLit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(tsAfterV2))
    val viaTs = spark.sql(
      s"""SELECT content FROM graft_lake.`$base/t`
         |TIMESTAMP AS OF '$tsLit'""".stripMargin)
      .as[String].collect().toSeq
    val viaVersion = table.readAt(spark, resolved)
      .select("content").as[String].collect().toSeq
    assert(viaTs === viaVersion)
    assert(viaTs === Seq("v2"))
    // head unchanged; current read still v3
    assert(spark.sql(s"SELECT content FROM graft_lake.`$base/t`")
      .as[String].head() === "v3")
    // before any commit → curated error
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_lake.`$base/t` TIMESTAMP AS OF '1999-01-01 00:00:00'").collect())
    assert(e.getMessage.contains("no snapshot"), e.getMessage)
  }

  test("WHEN NOT MATCHED BY SOURCE: full-sync delete + flag ≡ Dataset-computed state") {
    val base = tmpDir("sqlnmbs")
    val table = lake.LakeTable(s"$base/t", 4)
    val initial = Seq(
      ("r1", "p1", "I", 1L, Option("c1"), Option("scala"), Option("a"), Option(1L)),
      ("r2", "p2", "I", 2L, Option("c2"), Option("java"), Option("b"), Option(2L)),
      ("r3", "p3", "I", 3L, Option("c3"), Option("py"), Option("c"), Option(3L)),
      ("r4", "p4", "I", 4L, Option("c4"), Option("go"), Option("d"), Option(4L)))
      .toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes")
    table.merge(spark, initial, 0L)

    // the "full sync" shape: source is the complete desired key set;
    // target-only rows are deleted, matched rows refreshed, new inserted
    Seq(("r2", "p2", 20L, "b2"), ("r3", "p3", 30L, "c2"), ("r9", "p9", 90L, "new"))
      .toDF("repo", "path", "seq", "content").createOrReplaceTempView("sync_src")
    spark.sql(
      s"""MERGE INTO graft_lake.`$base/t` AS t
         |USING sync_src AS s
         |ON t.repo = s.repo AND t.path = s.path
         |WHEN MATCHED THEN UPDATE SET content = s.content, seq = s.seq
         |WHEN NOT MATCHED THEN INSERT (repo, path, seq, content) VALUES (s.repo, s.path, s.seq, s.content)
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    val got = table.read(spark).select("repo", "seq", "content")
      .as[(String, Long, String)].collect().toSet
    // Dataset-computed expectation: exactly the source's keyset
    assert(got === Set(("r2", 20L, "b2"), ("r3", 30L, "c2"), ("r9", 90L, "new")))

    // conditional UPDATE arm: mark unmatched rows instead of deleting
    val t2 = lake.LakeTable(s"$base/t2", 4)
    t2.merge(spark, initial, 0L)
    spark.sql(
      s"""MERGE INTO graft_lake.`$base/t2` AS t
         |USING sync_src AS s
         |ON t.repo = s.repo AND t.path = s.path
         |WHEN NOT MATCHED BY SOURCE AND t.seq < 4 THEN UPDATE SET language = 'orphan'""".stripMargin)
    val langs = t2.read(spark).select("repo", "language")
      .as[(String, String)].collect().toMap
    assert(langs === Map("r1" -> "orphan", "r2" -> "java", "r3" -> "py", "r4" -> "go"),
      s"only unmatched rows passing the condition update: $langs")

    // guard rails: source references and key reassignment are rejected
    val e1 = intercept[Exception](spark.sql(
      s"""MERGE INTO graft_lake.`$base/t2` AS t USING sync_src AS s
         |ON t.repo = s.repo AND t.path = s.path
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET content = s.content""".stripMargin))
    assert(e1.getMessage.contains("may only reference the target"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"""MERGE INTO graft_lake.`$base/t2` AS t USING sync_src AS s
         |ON t.repo = s.repo AND t.path = s.path
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET repo = 'moved'""".stripMargin))
    assert(e2.getMessage.contains("key column"), e2.getMessage)
  }

  test("INSERT INTO graft_lake: strict append, key collision echoes the MERGE to run") {
    val base = tmpDir("sqlins")
    val table = lake.LakeTable(s"$base/t", 4)
    // column-list form (missing columns null, seq defaults 0)
    spark.sql(s"INSERT INTO graft_lake.`$base/t` (repo, path, content, seq) " +
      "VALUES ('r1', 'p1', 'a', 1)")
    // bare-VALUES form: positional against the full schema
    spark.sql(s"INSERT INTO graft_lake.`$base/t` " +
      "VALUES ('r2', 'p2', 'c2', 'scala', 'b', 5, 2)")
    // INSERT … SELECT
    Seq(("r3", "p3", "c", 3L)).toDF("repo", "path", "content", "seq")
      .createOrReplaceTempView("ins_src")
    spark.sql(s"INSERT INTO graft_lake.`$base/t` (repo, path, content, seq) " +
      "SELECT repo, path, content, seq FROM ins_src")
    val got = table.read(spark).select("repo", "path", "seq", "content", "language")
      .as[(String, String, Long, String, Option[String])].collect().toSet
    assert(got === Set(
      ("r1", "p1", 1L, "a", None),
      ("r2", "p2", 2L, "b", Some("scala")),
      ("r3", "p3", 3L, "c", None)))

    // duplicate key → the whole statement fails with runnable MERGE guidance
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO graft_lake.`$base/t` (repo, path, content) VALUES ('r1', 'p1', 'dup')"))
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + msgs(t.getCause)
    assert(msgs(e).contains("already exists") && msgs(e).contains("MERGE INTO"), msgs(e))
    assert(table.read(spark).count() === 3L, "failed INSERT must not commit anything")

    // a deleted key is NOT live: re-INSERT succeeds and supersedes the tombstone
    table.merge(spark, Seq(("r1", "p1", "D", 100L, Option.empty[String],
      Option.empty[String], Option.empty[String], Option.empty[Long]))
      .toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"), 0L)
    spark.sql(s"INSERT INTO graft_lake.`$base/t` (repo, path, content, seq) " +
      "VALUES ('r1', 'p1', 'reborn', 200)")
    assert(table.read(spark).filter($"repo" === "r1").select("content")
      .as[String].head() === "reborn")

    // CDC merges still interoperate: a higher-seq event outranks the insert
    table.merge(spark, Seq(("r1", "p1", "U", 300L, Option("c300"),
      Option("scala"), Option("evolved"), Option(7L)))
      .toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"), 1L)
    assert(table.read(spark).filter($"repo" === "r1").select("content")
      .as[String].head() === "evolved")

    // INSERT OVERWRITE: curated rejection
    val e2 = intercept[Exception](spark.sql(
      s"INSERT OVERWRITE graft_lake.`$base/t` VALUES ('x', 'y', 'c', 'l', 'v', 1, 1)"))
    assert(msgs(e2).contains("full sync"), msgs(e2))
  }

  test("INSERT INTO composes with the graft_changes TVF (CDF → fresh table in one statement)") {
    val base = tmpDir("sqlinstvf")
    val src = lake.LakeTable(s"$base/src", 4)
    src.merge(spark, Seq(
      ("r1", "p1", "I", 1L, Option("c1"), Option("scala"), Option("a"), Option(1L)),
      ("r2", "p2", "I", 2L, Option("c2"), Option("go"), Option("b"), Option(2L)))
      .toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"), 0L)
    lake.LakeTable(s"$base/dst", 4) // create empty target
    // materialize a CDF window's after-images into a fresh table via SQL only
    spark.sql(
      s"""INSERT INTO graft_lake.`$base/dst` (repo, path, commit, language, content, size_bytes, seq)
         |SELECT repo, path, commit, language, content, size_bytes, seq
         |FROM graft_changes('$base/src', 0, ${src.headVersion()})
         |WHERE op <> 'D'""".stripMargin)
    val got = spark.sql(s"SELECT repo, content FROM graft_lake.`$base/dst`")
      .as[(String, String)].collect().toSet
    assert(got === Set(("r1", "a"), ("r2", "b")))
  }

  test("bare INSERT INTO is POSITIONAL (standard semantics), names not consulted") {
    val base = tmpDir("sqlinspos")
    val table = lake.LakeTable(s"$base/t", 4)
    // full-width query whose column NAMES all match the table but with
    // content/language swapped: Spark/Delta/Iceberg map positionally, so
    // the 4th query column (named "content") must land in table column 4
    // ("language") — by-name mapping here would silently diverge
    Seq(("r9", "p9", "c9", "scala", "body", 5L, 9L))
      .toDF("repo", "path", "commit", "language", "content", "size_bytes", "seq")
      .select($"repo", $"path", $"commit", $"content", $"language", $"size_bytes", $"seq")
      .createOrReplaceTempView("pos_src")
    spark.sql(s"INSERT INTO graft_lake.`$base/t` SELECT * FROM pos_src")
    val row = table.read(spark).select("language", "content")
      .as[(String, String)].head()
    assert(row === ("body", "scala"),
      "bare INSERT must map positionally: query col 4 → table col 4")
    // bare subset (wrong arity) → curated error pointing at the column list
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO graft_lake.`$base/t` SELECT repo, path FROM pos_src"))
    assert(e.getMessage.contains("POSITIONALLY") &&
      e.getMessage.contains("column list"), e.getMessage)
  }

  test("INSERT INTO … BY NAME maps by the query's column names (and rejects duplicates)") {
    val base = tmpDir("sqlinsbyname")
    val table = lake.LakeTable(s"$base/t", 4)
    // same swapped-order query the positional test uses: BY NAME must map
    // by NAME (content stays content), unlike the bare positional INSERT
    Seq(("r9", "p9", "c9", "scala", "body", 5L, 9L))
      .toDF("repo", "path", "commit", "language", "content", "size_bytes", "seq")
      .select($"repo", $"path", $"commit", $"content", $"language", $"size_bytes", $"seq")
      .createOrReplaceTempView("byname_src")
    spark.sql(s"INSERT INTO graft_lake.`$base/t` BY NAME SELECT * FROM byname_src")
    val row = table.read(spark).select("language", "content")
      .as[(String, String)].head()
    assert(row === ("scala", "body"),
      "BY NAME must map the query's names onto table columns, not positions")
    // subset BY NAME works (missing payload nulls, seq floors to 0)
    spark.sql(s"INSERT INTO graft_lake.`$base/t` BY NAME " +
      "SELECT 'r10' AS repo, 'p10' AS path, 'body10' AS content")
    val sub = table.read(spark).filter($"repo" === "r10")
      .select("content", "seq", "language").as[(String, Long, Option[String])].head()
    assert(sub === (("body10", 0L, None)))
    // duplicate names in the query are ambiguous → curated error
    val e = intercept[Exception](spark.sql(
      s"INSERT INTO graft_lake.`$base/t` BY NAME " +
        "SELECT 'x' AS repo, 'y' AS path, 'a' AS content, 'b' AS content"))
    assert(e.getMessage.contains("more than once"), e.getMessage)
  }

  test("MERGE INSERT arm without seq floors it to 0 (non-nullable contract), never NULL") {
    val base = tmpDir("sqlmergeseq0")
    val table = lake.LakeTable(s"$base/t", 4)
    Seq(("r1", "p1", "hello", 7L)).toDF("repo", "path", "content", "seq")
      .createOrReplaceTempView("seq0_src")
    spark.sql(
      s"""MERGE INTO graft_lake.`$base/t` AS t USING seq0_src AS s
         |ON t.repo = s.repo AND t.path = s.path
         |WHEN NOT MATCHED THEN INSERT (repo, path, content)
         |VALUES (s.repo, s.path, s.content)""".stripMargin)
    val row = table.read(spark).select("content", "seq")
      .as[(String, Long)].head()
    assert(row === (("hello", 0L)),
      "unassigned seq on a MERGE INSERT must default to 0, matching insertStrict")
    // and a real CDC event for the key (seq >= 1) outranks the floor
    table.merge(spark, Seq(("r1", "p1", "U", 1L, "c1", "scala", "newer", Option(5L)))
      .toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"), 0L)
    assert(table.read(spark).select("content").as[String].head() === "newer")
  }

  test("BY SOURCE condition naming a source-only column fails loudly, never silently nulls") {
    val base = tmpDir("sqlbsrccol")
    lake.LakeTable(s"$base/t", 4).merge(spark,
      Seq(("r1", "p1", "U", 1L, "c1", "scala", "v1", Option(1L))).toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"), 0L)
    Seq(("r1", "p1", "X")).toDF("repo", "path", "op")
      .createOrReplaceTempView("bsrc_src")
    // unqualified `op` exists ONLY in the source: on not-by-source rows the
    // source side is all-NULL, so letting it through would make the DELETE
    // silently never fire — it must be rejected at parse time instead
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO graft_lake.`$base/t` AS t USING bsrc_src AS s
         |ON t.repo = s.repo AND t.path = s.path
         |WHEN NOT MATCHED BY SOURCE AND op = 'X' THEN DELETE""".stripMargin))
    assert(e.getMessage.contains("not a column of the target table"), e.getMessage)
    // a target column referenced unqualified is still fine
    spark.sql(
      s"""MERGE INTO graft_lake.`$base/t` AS t USING bsrc_src AS s
         |ON t.repo = s.repo AND t.path = s.path
         |WHEN NOT MATCHED BY SOURCE AND seq < 0 THEN DELETE""".stripMargin)
  }

  test("graft_changes rejects out-of-int-range version literals instead of wrapping") {
    val base = tmpDir("sqltvfrange")
    lake.LakeTable(s"$base/t", 4).merge(spark,
      Seq(("r1", "p1", "U", 1L, "c1", "scala", "v1", Option(1L))).toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"), 0L)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_changes('$base/t', 0, 5000000000)").collect())
    assert(e.getMessage.contains("integer literals"), e.getMessage)
  }

  test("graft_chunks / graft_pack TVFs ≡ ChunkOps, and compose with INSERT INTO") {
    val docs = s"$sf/documents.parquet"
    // TVF ≡ Scala API, cell-exact on the t7/t8 fixture
    val viaTvf = spark.sql(
      s"SELECT * FROM graft_chunks('$docs', 'doc_id', 'text', 32, 8)")
    val viaOps = ops.ChunkOps.chunkByTokens(
      spark.read.parquet(docs), "doc_id", "text", maxTokens = 32, overlap = 8)
    assert(viaTvf.columns.toSeq === viaOps.columns.toSeq)
    assert(viaTvf.exceptAll(viaOps).isEmpty && viaOps.exceptAll(viaTvf).isEmpty,
      "graft_chunks must equal ChunkOps.chunkByTokens row-for-row")
    val packTvf = spark.sql(
      s"SELECT * FROM graft_pack('$docs', 'doc_id', 'text', 'lang', 256)")
    val packOps = ops.ChunkOps.packByTokens(
      spark.read.parquet(docs), "doc_id", "text", "lang", targetTokens = 256L)
    assert(packTvf.exceptAll(packOps).isEmpty && packOps.exceptAll(packTvf).isEmpty,
      "graft_pack must equal ChunkOps.packByTokens row-for-row")

    // same option validation as the Scala API (the TVF delegates to it)
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_chunks('$docs', 'doc_id', 'text', 8, 9)").collect())
    assert(e.getMessage.contains("overlap"), e.getMessage)

    // composes with INSERT INTO: chunk a corpus into a lake table, SQL only
    val base = tmpDir("sqlchunktvf")
    lake.LakeTable(s"$base/t", 4)
    spark.sql(
      s"""INSERT INTO graft_lake.`$base/t` (repo, path, content, seq)
         |SELECT CAST(doc_id AS STRING) AS repo,
         |       CAST(chunk_id AS STRING) AS path, chunk, n_tokens
         |FROM graft_chunks('$docs', 'doc_id', 'text', 64)
         |WHERE doc_id < 20""".stripMargin)
    val inserted = spark.sql(s"SELECT count(*) AS n FROM graft_lake.`$base/t`")
      .head().getLong(0)
    val expected = ops.ChunkOps.chunkByTokens(
      spark.read.parquet(docs).filter($"doc_id" < 20), "doc_id", "text",
      maxTokens = 64).count()
    assert(inserted === expected, s"INSERT materialized $inserted of $expected chunks")
    // and a graft lake ROOT is a valid TVF source too (sourceOf dispatch)
    val overLake = spark.sql(
      s"SELECT count(*) AS n FROM graft_chunks('$base/t', 'path', 'content', 16)")
      .head().getLong(0)
    assert(overLake >= inserted, s"chunking the lake table ($overLake) must cover every doc ($inserted)")
  }

  test("graft_hh / graft_bm25 / graft_asof / graft_range TVFs ≡ Scala API") {
    val events = s"$sf/events.parquet"
    val docs = s"$sf/documents.parquet"
    val ev = spark.read.parquet(events)

    val hhTvf = spark.sql(s"SELECT * FROM graft_hh('$events', 'user_id', 0.0008)")
    val hhOps = ops.FreqOps.heavyHitters(ev, "user_id", phi = 0.0008)
    assert(hhTvf.columns.toSeq === hhOps.columns.toSeq)
    assert(hhTvf.exceptAll(hhOps).isEmpty && hhOps.exceptAll(hhTvf).isEmpty,
      "graft_hh must equal FreqOps.heavyHitters row-for-row")

    val bmTvf = spark.sql(
      s"SELECT * FROM graft_bm25('$docs', 'doc_id', 'text', 'hash join')")
    val bmOps = ops.RankOps.bm25(spark.read.parquet(docs), "doc_id", "text",
      "hash join")
    assert(bmTvf.exceptAll(bmOps).isEmpty && bmOps.exceptAll(bmTvf).isEmpty,
      "graft_bm25 must equal RankOps.bm25 row-for-row")

    // asof / range over two temp parquet sides (comma-list column args)
    val base = tmpDir("sqlanalyzetvf")
    ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts")
      .write.parquet(s"$base/clicks")
    ev.filter($"event_type" === "view")
      .groupBy("user_id", "ts").agg(max($"event_id").as("view_id"))
      .write.parquet(s"$base/views")
    val asofTvf = spark.sql(
      s"SELECT * FROM graft_asof('$base/clicks', '$base/views', 'user_id', 'ts', 'view_id')")
    val asofOps = ops.JoinOps.asofJoin(
      spark.read.parquet(s"$base/clicks"), spark.read.parquet(s"$base/views"),
      Seq("user_id"), "ts", Seq("view_id"))
    assert(asofTvf.exceptAll(asofOps).isEmpty && asofOps.exceptAll(asofTvf).isEmpty,
      "graft_asof must equal JoinOps.asofJoin row-for-row")

    ev.select($"user_id", unix_micros($"ts".cast("timestamp")).as("v"),
        $"event_id".as("pid")).write.parquet(s"$base/pts")
    ev.filter($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts".cast("timestamp")).as("lo"),
        $"event_id".as("iid"))
      .withColumn("hi", $"lo" + 1800000000L).write.parquet(s"$base/ivs")
    val rngTvf = spark.sql(
      s"""SELECT * FROM graft_range('$base/pts', '$base/ivs', 'user_id',
         |'v', 'lo', 'hi', 1800000000)""".stripMargin)
    val rngOps = ops.JoinOps.rangeJoin(
      spark.read.parquet(s"$base/pts"), spark.read.parquet(s"$base/ivs"),
      Seq("user_id"), "v", "lo", "hi", binWidth = 1800000000L)
    assert(rngTvf.exceptAll(rngOps).isEmpty && rngOps.exceptAll(rngTvf).isEmpty,
      "graft_range must equal JoinOps.rangeJoin row-for-row")

    // same validation as the Scala APIs (the TVFs delegate to them)
    val e1 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_hh('$events', 'user_id', 1.5)").collect())
    assert(e1.getMessage.contains("phi"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"SELECT * FROM graft_asof('$base/clicks', '$base/views', '', 'ts', 'view_id')").collect())
    assert(e2.getMessage.contains("key column"), e2.getMessage)
  }

  test("BY SOURCE condition with a string literal containing 's.' is accepted") {
    val base = tmpDir("sqlnmbs-lit")
    val table = lake.LakeTable(s"$base/t", 4)
    table.merge(spark, Seq(
      ("r1", "s.cfg", "I", 1L, Option("c1"), Option("ini"), Option("a"), Option(1L)),
      ("r2", "zz", "I", 2L, Option("c2"), Option("go"), Option("b"), Option(2L)))
      .toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"), 0L)
    Seq(("r9", "p9", 9L, "new")).toDF("repo", "path", "seq", "content")
      .createOrReplaceTempView("lit_src")
    // the literal 's.%' must NOT be mistaken for a reference to source
    // alias s (the old textual check rejected exactly this statement)
    spark.sql(
      s"""MERGE INTO graft_lake.`$base/t` AS t
         |USING lit_src AS s
         |ON t.repo = s.repo AND t.path = s.path
         |WHEN NOT MATCHED THEN INSERT (repo, path, seq, content) VALUES (s.repo, s.path, s.seq, s.content)
         |WHEN NOT MATCHED BY SOURCE AND t.path LIKE 's.%' THEN DELETE""".stripMargin)
    val keys = table.read(spark).select("repo", "path").as[(String, String)].collect().toSet
    assert(keys === Set(("r2", "zz"), ("r9", "p9")),
      s"only the path matching the LIKE literal is deleted: $keys")
    // a REAL source reference must still be rejected
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO graft_lake.`$base/t` AS t USING lit_src AS s
         |ON t.repo = s.repo AND t.path = s.path
         |WHEN NOT MATCHED BY SOURCE AND s.seq > 1 THEN DELETE""".stripMargin))
    assert(e.getMessage.contains("may only reference the target"), e.getMessage)
  }

  test("versionAt: binary search (O(log n) snapshot reads) + monotone commit stamps") {
    val base = tmpDir("sqlvat")
    val t = lake.LakeTable(s"$base/t", 4)
    (1 to 100).foreach(_ => t.truncate()) // 101 cheap snapshots v0..v100
    // commit wall-clocks are STRICTLY increasing even for same-millisecond
    // commits (clamped max(now, parent+1)) — what makes the search sound
    val tss = t.versions().map(v => t.snapshotAt(v).committedAtMs)
    assert(tss === tss.sorted && tss.distinct.size === tss.size,
      s"commit timestamps must strictly increase: $tss")
    val target = t.snapshotAt(50).committedAtMs
    val fresh = lake.LakeTable.open(s"$base/t") // cold cache
    val before = fresh.snapshotReads.get()
    assert(fresh.versionAt(target) === 50)
    val reads = fresh.snapshotReads.get() - before
    // first call pays the one-time monotonicity verification walk (O(n)
    // snapshot reads, each populating the stamp cache)…
    assert(reads <= 102, s"first versionAt = verification walk over 101 snapshots, read $reads")
    // …after which every lookup is pure cache: binary search, ZERO reads
    val b1 = fresh.snapshotReads.get()
    assert(fresh.versionAt(fresh.snapshotAt(75).committedAtMs) === 75)
    assert(fresh.versionAt(fresh.snapshotAt(12).committedAtMs) === 12)
    assert(fresh.snapshotReads.get() - b1 <= 2,
      "verified suffix + cached stamps: repeat lookups must not re-read snapshots")
    // headVersion: a follower poll tick reads ONLY the pointer file
    val b2 = fresh.snapshotReads.get()
    assert(fresh.headVersion() === 100)
    assert(fresh.snapshotReads.get() === b2, "headVersion must not read any snapshot JSON")
    // snapshot BODIES are cached too: a CDF admission walk / batch plan
    // re-reading the same committed versions costs zero snapshot-JSON IO
    fresh.snapshotAt(60)
    val b3 = fresh.snapshotReads.get()
    (1 to 10).foreach { _ =>
      assert(fresh.snapshotAt(60).version === 60)
      assert(fresh.head().version === 100)
    }
    assert(fresh.snapshotReads.get() === b3,
      "snapshotAt/head must serve committed versions from the body cache")
  }

  test("versionAt: pre-clamp non-monotone stamps take the exact scan, not the search") {
    val base = tmpDir("sqlvatskew")
    val t = lake.LakeTable(s"$base/t", 4)
    (1 to 80).foreach(_ => t.truncate()) // 81 snapshots v0..v80 (> 64)
    // Simulate a table written by a PRE-CLAMP writer with a regressed
    // clock (the shape earlier rounds of this engine could produce):
    // strip the tsClamped markers and stamp v41..v80 BEHIND v0..v40.
    val meta = java.nio.file.Paths.get(s"$base/t/meta")
    t.versions().foreach { v =>
      val p = meta.resolve(s"v$v.json")
      val stamp = if (v <= 40) 1000L + v else 500L + v // non-monotone at v41
      val s = java.nio.file.Files.readString(p)
        .replace("\"tsClamped\"", "\"tsRaw\"")
        .replaceAll("\"committedAtMs\"\\s*:\\s*\"\\d+\"",
          s""""committedAtMs" : "$stamp"""")
      java.nio.file.Files.writeString(p, s)
    }
    val fresh = lake.LakeTable.open(s"$base/t")
    // stamps are monotonized (effective = running max in version order,
    // the Delta rule): v41..v80's regressed 541..580 all clamp to 1040, so
    // ts=1040 resolves to the newest version — NOT to v40 (max raw stamp),
    // which would make time travel to "now" silently drop the whole
    // regressed suffix
    assert(fresh.versionAt(1040L) === 80)
    assert(fresh.versionAt(System.currentTimeMillis) === 80,
      "versionAt(now) must be head under ANY stamp history")
    // inside the clean prefix the scan stays version-exact
    assert(fresh.versionAt(1039L) === 39)
    // before the first effective stamp: nothing existed
    intercept[IllegalArgumentException](fresh.versionAt(590L))
  }

  test("versionAt: ONE regressed mid-history stamp (mixed-version writers) still takes the exact scan") {
    // the adversarial shape a marker-on-the-oldest-snapshot gate misses: a
    // mixed-version writer fleet where an OLD (pre-clamp) binary commits
    // one regressed, unmarked stamp BETWEEN clamped commits — the oldest
    // retained snapshot still carries tsClamped, but the sequence is
    // non-monotone and a trusting binary search can resolve wrongly
    val base = tmpDir("sqlvatmixed")
    val t = lake.LakeTable(s"$base/t", 4)
    (1 to 80).foreach(_ => t.truncate()) // 81 snapshots v0..v80 (> 64)
    val meta = java.nio.file.Paths.get(s"$base/t/meta")
    t.versions().foreach { v =>
      val p = meta.resolve(s"v$v.json")
      var s = java.nio.file.Files.readString(p)
        .replaceAll("\"committedAtMs\"\\s*:\\s*\"\\d+\"",
          s""""committedAtMs" : "${if (v == 60) 900L else 1000L + v}"""")
      if (v == 60) s = s.replace("\"tsClamped\"", "\"tsRaw\"") // the old-binary commit
      java.nio.file.Files.writeString(p, s)
    }
    val fresh = lake.LakeTable.open(s"$base/t")
    // stamps: 1000,1001,…,1059, 900, 1061,…,1080 — monotonization gives
    // v60 the effective stamp 1059 (its predecessor's), so ts=1059
    // resolves to v60 (newest version at that effective time); a search
    // trusting raw order could land short or miss the band entirely
    assert(fresh.versionAt(1059L) === 60)
    // strictly inside the clean prefix the scan stays version-exact
    assert(fresh.versionAt(1058L) === 58)
    // the regressed RAW stamp is not an addressable instant (nothing
    // committed effectively at 999 — v0 already claims 1000)
    intercept[IllegalArgumentException](fresh.versionAt(999L))
    // and queries above the band resolve to the true newest-eligible
    assert(fresh.versionAt(1080L) === 80)
  }

  test("graft_changes TVF ≡ changesBetween (the CDF as a SQL table function)") {
    val base = tmpDir("sqltvf")
    val table = lake.LakeTable(s"$base/t", 4)
    def put(seq: Long, p: String, op: String = "U"): Unit = table.merge(spark,
      Seq(("r", p, op, seq, s"c$seq", "scala", if (op == "D") null else s"v$seq", Option(seq)))
        .toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"),
      seq)
    put(1, "p1"); put(2, "p2"); put(3, "p1", "D")

    val viaSql = spark.sql(
      s"SELECT op, path, seq FROM graft_changes('$base/t', 1, 3) ORDER BY path")
      .as[(String, String, Long)].collect().toSeq
    val viaDs = table.changesBetween(spark, 1, 3)
      .select("op", "path", "seq").orderBy("path")
      .as[(String, String, Long)].collect().toSeq
    assert(viaSql === viaDs)
    assert(viaSql === Seq(("D", "p1", 1L), ("I", "p2", 2L)))
    // composes with ordinary SQL (aggregate over the feed)
    val n = spark.sql(
      s"SELECT count(*) FROM graft_changes('$base/t', 0, 3) WHERE op = 'I'")
      .as[Long].head()
    assert(n === 1L) // p1 was inserted then deleted within the window; only p2 survives as I
    // loud errors on bad args
    val e = intercept[Exception](spark.sql(s"SELECT * FROM graft_changes('$base/t', 3, 1)"))
    assert(e.getMessage.contains("fromVersion") || e.getMessage.contains("must be <"),
      e.getMessage)

    // 4th arg: update preimages from SQL ≡ the Dataset flag — an update
    // appears as the U-/U+ retraction pair, directly aggregatable
    put(4, "p2")
    val preSql = spark.sql(
      s"""SELECT op, path, seq FROM graft_changes('$base/t', 3, 4, true)
         |ORDER BY op""".stripMargin)
      .as[(String, String, Long)].collect().toSeq
    val preDs = table.changesBetween(spark, 3, 4, updatePreimages = true)
      .select("op", "path", "seq").orderBy("op")
      .as[(String, String, Long)].collect().toSeq
    assert(preSql === preDs)
    assert(preSql === Seq(("U+", "p2", 4L), ("U-", "p2", 2L)))
    // retraction algebra straight from SQL: net live-row delta of the window
    val net = spark.sql(
      s"""SELECT sum(CASE WHEN op IN ('I','U+') THEN 1 ELSE -1 END)
         |FROM graft_changes('$base/t', 3, 4, true)""".stripMargin)
      .as[Long].head()
    assert(net === 0L) // an update changes no live-row count
    val e2 = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_changes('$base/t', 3, 4, 'yes')"))
    assert(e2.getMessage.contains("boolean"), e2.getMessage)
  }

  test("graft_mv TVF reads the maintained aggregate view (and composes with SQL)") {
    val base = tmpDir("sqlmv")
    val table = lake.LakeTable(s"$base/t", 4)
    table.merge(spark, Seq(
        ("r1", "a", "U", 1L, "c1", "scala", "v1", Option(10L)),
        ("r1", "b", "U", 2L, "c2", "java", "v2", Option(20L)))
      .toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"), 0L)
    stream.Mv.maintainInto(spark, s"$base/t", s"$base/view", s"$base/ckpt")
    val got = spark.sql(
      s"SELECT language, cnt, bytes FROM graft_mv('$base/view') ORDER BY language")
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("java", 1L, 20L), ("scala", 1L, 10L)))
    // composes like any relation
    val total = spark.sql(
      s"SELECT sum(cnt) FROM graft_mv('$base/view')").as[Long].head()
    assert(total === 2L)
    // loud error before any batch has been applied
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_mv('$base/empty')").collect())
    assert(e.getMessage.contains("maintainInto"), e.getMessage)
  }

  test("graft_mv_refresh TVF: SQL-only MV maintenance (cursor-driven)") {
    val base = tmpDir("sqlmvref")
    val table = lake.LakeTable(s"$base/t", 4)
    val cols = Seq("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes")
    table.merge(spark, Seq(
        ("r1", "a", "U", 1L, "c1", "scala", "v1", Option(10L)),
        ("r1", "b", "U", 2L, "c2", "java", "v2", Option(20L))).toDF(cols: _*), 0L)

    // bootstrap window applies
    val first = spark.sql(s"SELECT * FROM graft_mv_refresh('$base/t', " +
      s"'$base/cursor', '$base/view')").as[(Boolean, Long)].head()
    assert(first === ((true, 1L)), s"bootstrap: $first")
    assert(spark.sql(s"SELECT language, cnt, bytes FROM graft_mv('$base/view') " +
      "ORDER BY language").as[(String, Long, Long)].collect().toSeq ===
      Seq(("java", 1L, 20L), ("scala", 1L, 10L)))

    // caught up → applied=false, pointer unchanged
    val again = spark.sql(s"SELECT * FROM graft_mv_refresh('$base/t', " +
      s"'$base/cursor', '$base/view')").as[(Boolean, Long)].head()
    assert(again === ((false, 1L)), s"caught up: $again")

    // a group-moving SQL MERGE, then refresh from SQL: the view follows
    spark.sql(
      s"""MERGE INTO graft_lake.`$base/t` AS t
         |USING (SELECT 'r1' AS repo, 'a' AS path, 5L AS seq, 'java' AS language) AS s
         |ON t.repo = s.repo AND t.path = s.path
         |WHEN MATCHED THEN UPDATE SET t.language = s.language, t.seq = s.seq""".stripMargin)
    val moved = spark.sql(s"SELECT * FROM graft_mv_refresh('$base/t', " +
      s"'$base/cursor', '$base/view')").as[(Boolean, Long)].head()
    assert(moved._1, "group move window applies")
    assert(spark.sql(s"SELECT language, cnt FROM graft_mv('$base/view') " +
      "ORDER BY language").as[(String, Long)].collect().toSeq ===
      Seq(("java", 2L)), "scala group emptied, java counts both")

    // usage errors are curated
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_mv_refresh('x')").collect())
    assert(e.getMessage.contains("usage"), e.getMessage)
  }

  test("graft_history / graft_files metadata TVFs mirror the table state") {
    val base = tmpDir("sqlmeta")
    val table = lake.LakeTable(s"$base/t", 4)
    def put(seq: Long): Unit = table.merge(spark,
      Seq(("r", s"p$seq", "I", seq, s"c$seq", "scala", s"v$seq", Option(seq)))
        .toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"),
      seq)
    put(1); put(2)
    table.compact(spark, targetFileRows = Some(1L))

    val hist = spark.sql(
      s"SELECT version, operation, last_batch_id, total_rows FROM graft_history('$base/t') ORDER BY version")
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(hist.map(_._2) === Seq("create", "merge", "merge", "compact"), hist.toString)
    assert(hist.last === ((3, "compact", 2L, 2L)), hist.toString)
    // committed_at is monotone over versions
    val ts = spark.sql(s"SELECT committed_at FROM graft_history('$base/t') ORDER BY version")
      .as[java.sql.Timestamp].collect().toSeq
    assert(ts === ts.sorted, "commit timestamps must be monotone")

    val files = spark.sql(
      s"SELECT bucket, row_count, sorted, min_repo FROM graft_files('$base/t')")
      .as[(Int, Long, Boolean, String)].collect().toSeq
    assert(files.map(_._2).sum === 2L, files.toString)
    assert(files.forall(_._3), "compacted files are flagged sorted")
    assert(files.forall(_._4 == "r"), "key bounds harvested")
    // metadata only — composes with SQL (join history to files count)
    val n = spark.sql(
      s"""SELECT h.total_files, count(f.file) FROM graft_history('$base/t') h
         |JOIN graft_files('$base/t') f ON true
         |WHERE h.version = 3 GROUP BY h.total_files""".stripMargin).collect()
    assert(n.head.getLong(0) === n.head.getLong(1), n.mkString)
  }

  test("graft_lineage TVF is the canonical deduped lineage read") {
    // the lineage dir is appended at-least-once: a re-delivered batch
    // (crash between merge commit and cursor/lineage write) re-splits the
    // same input, so raw parquet double-counts; the TVF must surface
    // exactly Tailer.readLineage's one-attempt-per-batch view
    val dir = s"${tmpDir("sqllineage")}/lineage"
    def rows(pids: Range, rowsEach: Long, attempt: Long) =
      pids.map(p => (0L, p, 0L, 799L, rowsEach, rowsEach * 10, attempt))
        .toDF("batchId", "partitionId", "firstOffset", "lastOffset",
          "rowsApplied", "bytesIn", "attempt")
    rows(0 until 8, 100L, attempt = 1000L)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
    rows(0 until 4, 200L, attempt = 2000L) // re-delivery, re-partitioned
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
    val got = spark.sql(
      s"SELECT sum(rowsApplied) AS r, count(*) AS n FROM graft_lineage('$dir')")
      .as[(Long, Long)].head()
    assert(got === ((800L, 4L)),
      "TVF must keep only the newest attempt's 4 partitions x 200 rows")
    assert(spark.read.parquet(dir).count() === 12L, "raw dir carries both attempts")
    // row-for-row equal to the Scala reader
    val tvf = spark.sql(s"SELECT * FROM graft_lineage('$dir')").collect().toSet
    val scala0 = graft.stream.Tailer.readLineage(spark, dir)
      .select("batchId", "partitionId", "firstOffset", "lastOffset",
        "rowsApplied", "bytesIn").collect().toSet
    assert(tvf === scala0)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_lineage()").collect())
    assert(e.getMessage.contains("usage"), e.getMessage)
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

  test("maintenance TVFs: graft_compact / graft_expire_snapshots / graft_vacuum") {
    val base = tmpDir("sqlmaint")
    val table = lake.LakeTable(s"$base/t", 2, lake.LakeTable.Mor)
    def put(seq: Long, op: String): Unit = table.merge(spark,
      Seq(("r", "p1", op, seq, s"c$seq", "scala", s"v$seq", Option(seq)),
        ("r", "p2", op, seq, s"c$seq", "scala", s"w$seq", Option(seq)))
        .toDF("repo", "path", "op", "seq", "commit", "language", "content", "size_bytes"),
      seq)
    put(1, "I"); (2L to 4L).foreach(put(_, "U")) // MOR: 4 append files/bucket
    val expected = table.read(spark).collect().toSet

    // incremental (read-amplification bound 1): the appended buckets rewrite
    val inc = spark.sql(s"SELECT * FROM graft_compact('$base/t', 1)")
      .as[(Int, Int, Long, Long)].head()
    assert(inc._2 > 0, s"incremental compact must pick appended buckets: $inc")
    assert(inc._3 === 2L, s"2 live rows after LWW fold: $inc")
    // full rewrite commits a fresh snapshot on top
    val full = spark.sql(s"SELECT * FROM graft_compact('$base/t')")
      .as[(Int, Int, Long, Long)].head()
    assert(full._1 === inc._1 + 1, s"full compact commits the next version: $full")
    assert(table.read(spark).collect().toSet === expected, "compaction is read-invariant")

    // expire to the newest 2 snapshots; returned rows are the expired ids
    val retained0 = spark.sql(s"SELECT count(*) FROM graft_history('$base/t')")
      .as[Long].head()
    val expired = spark.sql(
      s"SELECT expired_version FROM graft_expire_snapshots('$base/t', 2)")
      .as[Int].collect().toSeq
    assert(expired.length === (retained0 - 2).toInt, s"$expired of $retained0")
    assert(spark.sql(s"SELECT count(*) FROM graft_history('$base/t')")
      .as[Long].head() === 2L)

    // vacuum (grace 0: no concurrent writers here) reclaims the files only
    // expired snapshots referenced — the pre-compaction MOR appends
    val deleted = spark.sql(s"SELECT deleted_files FROM graft_vacuum('$base/t', 0)")
      .as[Int].head()
    assert(deleted > 0, "pre-compaction append files must be reclaimed")
    assert(table.read(spark).collect().toSet === expected,
      "full maintenance cycle is read-invariant")

    // re-running the cycle is a no-op, not corruption (TVFs are idempotent)
    assert(spark.sql(s"SELECT deleted_files FROM graft_vacuum('$base/t', 0)")
      .as[Int].head() === 0)

    // curated usage errors, same style as the other TVFs
    Seq(
      "SELECT * FROM graft_compact()",
      s"SELECT * FROM graft_expire_snapshots('$base/t')",
      "SELECT * FROM graft_vacuum()"
    ).foreach { q =>
      val e = intercept[Exception](spark.sql(q).collect())
      assert(e.getMessage.contains("usage"), s"$q → ${e.getMessage}")
    }
  }
}
