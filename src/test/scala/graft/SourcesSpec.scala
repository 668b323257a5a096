package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources
import graft.sources.Sources.{Transform, FixedWidthSpec}

/** Import polymorphism: data-string, transforms with error→default,
  * JSON path descent, fixed-width spec, zip shim. */
class SourcesSpec extends SparkSpec {

  test("csvImportString + transform default on cast failure (littletable.py:2777-2808)") {
    val t = Sources.csvImportString(spark, "x,y\n1,foo\n2,bar\nbad,baz",
      transforms = Map("x" -> Transform("int", default = Some(-1))))
    val got = t.df.orderBy("x").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((-1, "baz"), (1, "foo"), (2, "bar")))
  }

  test("import filters apply at scan (littletable.py:2810-2840)") {
    val t = Sources.csvImportString(spark, "a,b\n1,10\n2,20\n3,30",
      transforms = Map("*" -> Transform("int")),
      filters = Seq(col("a") > 1), limit = Some(1))
    assert(t.df.count() == 1)
  }

  test("jsonImport with path descent (littletable.py:3270-3281)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val f = new java.io.PrintWriter(s"$dir/nested.json")
    f.write("""{"meta": {"v": 1}, "data": {"items": [{"id": 1, "w": "x"}, {"id": 2, "w": "y"}]}}""")
    f.close()
    val t = Sources.jsonImport(spark, s"$dir/nested.json", descent = "data.items",
      multiLine = true)
    val got = t.df.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "x"), (2L, "y")))
  }

  test("fixed-width spec slices + transforms (littletable.py:937-995)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw").toString
    val f = new java.io.PrintWriter(s"$dir/fw.txt")
    f.write("AAA  1\nBBB 22\n")
    f.close()
    val t = Sources.fixedWidthImport(spark, s"$dir/fw.txt", Seq(
      FixedWidthSpec("name", 0, 4),
      FixedWidthSpec("num", 4, 6, Some(Transform("int")))))
    val got = t.df.orderBy("num").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == Seq(("AAA", 1), ("BBB", 22)))
  }

  test("zip shim extracts an entry spark.read can scan (littletable.py:872-903)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zip").toString
    val zipPath = s"$dir/data.zip"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("inner.csv"))
    zos.write("a,b\n1,2\n".getBytes)
    zos.closeEntry(); zos.close()
    val t = Sources.csvImport(spark, Sources.unzipToTemp(zipPath, "inner.csv"),
      transforms = Map("*" -> Transform("int")))
    assert(t.df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((1, 2)))
  }
}
