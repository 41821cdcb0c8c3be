package graft

import graft.sources.{Sinks, Sources}
import org.apache.spark.sql.functions._

/** Source/sink adapters (SURVEY §2.1): CSV/JSON dims, OBO stateful parse,
  * GAF line scan, binaryFile listing, FASTA sink — all hermetic fixtures.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv dimension scan round-trips (S9/K7)") {
    val dir = tmpDir("csvdim")
    val dim = Seq(("AT1G01010", "locus1"), ("AT1G01020", "locus2"))
      .toDF("agi", "locus")
    Sinks.csv(dim, s"$dir/out")
    val back = Sources.csvDim(spark, s"$dir/out")
    assert(back.orderBy("agi").collect().map(_.toSeq).toSeq ===
      dim.orderBy("agi").collect().map(_.toSeq).toSeq)
  }

  test("json dimension scan round-trips (S10/K6)") {
    val dir = tmpDir("jsondim")
    val dim = Seq((1L, "sym1"), (2L, "sym2")).toDF("id", "symbol")
    Sinks.json(dim, s"$dir/out")
    val back = Sources.jsonDim(spark, s"$dir/out").select("id", "symbol")
    assert(back.orderBy("id").as[(Long, String)].collect().toSeq ===
      Seq((1L, "sym1"), (2L, "sym2")))
  }

  test("OBO stateful multi-line parse extracts (id, name, namespace) (S8)") {
    val dir = tmpDir("obo")
    val obo =
      """format-version: 1.2
        |
        |[Term]
        |id: GO:0000001
        |name: mitochondrion inheritance
        |namespace: biological_process
        |
        |[Term]
        |id: GO:0000002
        |name: mitochondrial genome maintenance
        |namespace: biological_process
        |
        |[Typedef]
        |id: part_of
        |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "go.obo"), obo)
    val terms = Sources.oboTerms(spark, s"$dir/go.obo")
      .filter(col("id").startsWith("GO:"))
      .as[(String, String, String)].collect().sortBy(_._1)
    assert(terms.toSeq === Seq(
      ("GO:0000001", "mitochondrion inheritance", "biological_process"),
      ("GO:0000002", "mitochondrial genome maintenance", "biological_process")))
  }

  test("GAF line scan drops comments and enforces arity (S6/F1)") {
    val dir = tmpDir("gaf")
    val gaf =
      """!gaf-version: 2.1
        |UniProtKB	A0A009	go1	GO:0003674	ref	IBA
        |UniProtKB	A0A010	go2	GO:0008150	ref	IBA
        |short	line
        |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "x.gaf"), gaf)
    val rows = Sources.gafLines(spark, s"$dir/x.gaf", minCols = 6)
    assert(rows.count() === 2)
    assert(rows.select(element_at(col("cols"), 2)).as[String].collect().toSet ===
      Set("A0A009", "A0A010"))
  }

  test("binaryFile listing scan returns path + length + bytes (S12)") {
    val dir = tmpDir("bins")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.json"), "12345".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.json"), "6789".getBytes)
    val df = Sources.binaryFiles(spark, dir, "*.json")
    val got = df.select(col("length")).as[Long].collect().sorted
    assert(got.toSeq === Seq(4L, 5L))
  }

  test("FASTA sink wraps sequences at 60 chars (K9)") {
    val dir = tmpDir("fasta")
    val seq130 = "A" * 130
    Sinks.fasta(Seq(("P1", seq130)).toDF("id", "seq"), "id", "seq", s"$dir/out")
    val lines = spark.read.text(s"$dir/out").as[String].collect()
      .flatMap(_.split("\n"))
    assert(lines.head === ">P1")
    assert(lines(1) === "A" * 60)
    assert(lines(2) === "A" * 60)
    assert(lines(3) === "A" * 10)
    // exact multiple of the wrap width: no trailing blank line inside the
    // record (strict parsers read one as a record separator)
    val dir2 = tmpDir("fasta120")
    Sinks.fasta(Seq(("P2", "C" * 120)).toDF("id", "seq"), "id", "seq", s"$dir2/out")
    val l2 = spark.read.text(s"$dir2/out").as[String].collect().flatMap(_.split("\n"))
    assert(l2.toSeq === Seq(">P2", "C" * 60, "C" * 60),
      s"120-char sequence must wrap to exactly two full lines, got ${l2.toSeq}")
  }

  test("XML sink + record scan round-trip (S4/S5/K8)") {
    val dir = tmpDir("xmlrt")
    val df = Seq((1L, "fam1", "nodeA"), (2L, "fam2", "nodeB"))
      .toDF("id", "family", "node")
    Sinks.xml(df, s"$dir/out", rowTag = "rec", rootTag = "recs")
    val back = Sources.xmlRecords(spark, s"$dir/out", rowTag = "rec")
      .select("id", "family", "node")
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ===
      df.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("gzipped text landing scan is codec-transparent (S14 analog)") {
    val dir = java.nio.file.Files.createTempDirectory("gz")
    val f = dir.resolve("feed.txt.gz")
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(f))
    out.write("line1\nline2\nline3\n".getBytes("UTF-8")); out.close()
    val got = Sources.gzText(spark, f.toString).as[String].collect().sorted
    assert(got === Array("line1", "line2", "line3"))
  }
}
