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

  test("tar.gz shim extracts an entry (littletable.py:844-860)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tgz").toString
    // build a tiny ustar tar.gz: 512-byte header + padded payload
    val payload = "a,b\n7,8\n".getBytes("US-ASCII")
    val header = new Array[Byte](512)
    val nameB = "inner.csv".getBytes("US-ASCII")
    System.arraycopy(nameB, 0, header, 0, nameB.length)
    val sizeB = ("%011o".format(payload.length) + "\u0000").getBytes("US-ASCII")
    System.arraycopy(sizeB, 0, header, 124, sizeB.length)
    val out = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/data.tar.gz"))
    out.write(header); out.write(payload)
    out.write(new Array[Byte](512 - payload.length % 512)) // pad block
    out.write(new Array[Byte](1024))                       // end-of-archive
    out.close()
    val t = Sources.csvImport(spark,
      Sources.untarGzToTemp(s"$dir/data.tar.gz", "inner.csv"),
      transforms = Map("*" -> Transform("int")))
    assert(t.df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((7, 8)))
  }

  test("URL shim fetches file:// URLs (littletable.py:797-841)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_url").toString
    val f = new java.io.PrintWriter(s"$dir/u.csv"); f.write("a,b\n3,4\n"); f.close()
    val t = Sources.csvImport(spark, Sources.fetchUrlToTemp(s"file://$dir/u.csv"),
      transforms = Map("*" -> Transform("int")))
    assert(t.df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((3, 4)))
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
  test("xz shim decompresses a file spark.read can scan (littletable.py:867-871)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xz_spec").toFile
    val xzPath = s"$dir/data.csv.xz"
    val out = new org.tukaani.xz.XZOutputStream(
      new java.io.FileOutputStream(xzPath), new org.tukaani.xz.LZMA2Options())
    out.write("k,v\n1,a\n2,b\n".getBytes("UTF-8")); out.close()
    val t = Sources.csvImport(spark, Sources.unxzToTemp(xzPath),
      transforms = Map("k" -> Sources.Transform("int")))
    assert(t.df.orderBy("k").collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "a"), (2, "b")))
  }

  test("parseTimedelta: duration strings → DayTimeIntervalType (littletable.py:1262-1284)") {
    val df = Sources.csvImportString(spark, "s\n01:30:00\n00:00:45\nbogus\n").df
    val parsed = df.withColumn("d", Sources.parseTimedelta("HH:mm:ss")(col("s")))
    assert(parsed.schema("d").dataType
      .isInstanceOf[org.apache.spark.sql.types.DayTimeIntervalType])
    val got = parsed.orderBy("s").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("01:30:00").contains(java.time.Duration.ofMinutes(90)))
    assert(got("00:00:45").contains(java.time.Duration.ofSeconds(45)))
    assert(got("bogus").isEmpty, "unparseable → NULL interval")
    // on_error default (reference on_error arg)
    val withDefault = df.withColumn("d", Sources.parseTimedelta("HH:mm:ss",
      onError = Some(expr("INTERVAL 0 SECOND")))(col("s")))
    assert(withDefault.filter(col("s") === "bogus").head().get(1) ==
      java.time.Duration.ZERO)
  }

  test("JSON export with custom encoders (littletable.py:3346-3354)") {
    import graft.core.GTable
    import spark.implicits._
    val t = GTable(Seq((1L, Array[Byte](1, 2, 3)), (2L, Array[Byte](4)))
      .toDF("id", "payload"), "bin")
    // binary is not JSON-portable — encode as base64 string, the way a
    // reference JSONEncoder subclass would handle a custom type
    val json = Sources.jsonArrayString(t,
      encoders = Seq("payload" -> (c => base64(c))))
    assert(json.contains("\"payload\":\"AQID\"") && json.contains("\"payload\":\"BA==\""))
    // chained encoders apply in order (reference multiple-inheritance chain)
    val chained = Sources.jsonArrayString(t, encoders = Seq(
      "payload" -> (c => base64(c)),
      "payload" -> (c => concat(lit("b64:"), c))))
    assert(chained.contains("\"payload\":\"b64:AQID\""))
    // jsonlExport round-trip with the encoder applied
    val dir = java.nio.file.Files.createTempDirectory("graft_jenc").toString
    Sources.jsonlExport(t, s"$dir/out", encoders = Seq("payload" -> (c => base64(c))))
    val back = spark.read.json(s"$dir/out")
    assert(back.orderBy("id").collect().map(_.getAs[String]("payload")).toSeq ==
      Seq("AQID", "BA=="))
  }

  test("URL import with Basic auth against a local auth server (littletable.py:797-841)") {
    // like the reference's test/csv_import_http_server.py: 401 without the
    // right Authorization header, CSV body with it
    val csv = "a,b\n1,x\n2,y\n"
    val wantAuth = "Basic " + java.util.Base64.getEncoder
      .encodeToString("alice:sesame".getBytes("UTF-8"))
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/data.csv", (ex: com.sun.net.httpserver.HttpExchange) => {
      val got = ex.getRequestHeaders.getFirst("Authorization")
      if (got == wantAuth) {
        val body = csv.getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
      } else ex.sendResponseHeaders(401, -1)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/data.csv"
      // no credentials → 401 → IOException
      intercept[java.io.IOException](Sources.fetchUrlToTemp(url))
      val path = Sources.fetchUrlToTemp(url,
        Sources.UrlArgs(username = Some("alice"), password = "sesame"))
      val t = Sources.csvImport(spark, path,
        transforms = Map("a" -> Transform("int")))
      assert(t.df.orderBy("a").collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
        Seq((1, "x"), (2, "y")))
    } finally server.stop(0)
  }

  test("URL import over https with a cafile SSL context (littletable.py:819-832)") {
    // self-signed server cert via keytool; client trusts it ONLY through
    // the exported PEM passed as cafile (reference load_verify_locations)
    val dir = java.nio.file.Files.createTempDirectory("graft_tls").toString
    val ksPath = s"$dir/server.p12"; val pemPath = s"$dir/server.pem"
    import scala.sys.process._
    val gen = Seq("keytool", "-genkeypair", "-alias", "srv", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "2", "-dname", "CN=127.0.0.1",
      "-ext", "san=ip:127.0.0.1,dns:localhost",
      "-keystore", ksPath, "-storetype", "PKCS12",
      "-storepass", "changeit", "-keypass", "changeit").!
    assert(gen == 0, "keytool genkeypair failed")
    assert(Seq("keytool", "-exportcert", "-alias", "srv", "-keystore", ksPath,
      "-storepass", "changeit", "-rfc", "-file", pemPath).! == 0)
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val ksIn = new java.io.FileInputStream(ksPath)
    try ks.load(ksIn, "changeit".toCharArray) finally ksIn.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "changeit".toCharArray)
    val serverCtx = javax.net.ssl.SSLContext.getInstance("TLS")
    serverCtx.init(kmf.getKeyManagers, null, null)
    val server = com.sun.net.httpserver.HttpsServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.setHttpsConfigurator(new com.sun.net.httpserver.HttpsConfigurator(serverCtx))
    server.createContext("/tls.csv", (ex: com.sun.net.httpserver.HttpExchange) => {
      val body = "k,v\n5,z\n".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val url = s"https://127.0.0.1:${server.getAddress.getPort}/tls.csv"
      // default trust store does NOT know the self-signed cert
      intercept[javax.net.ssl.SSLHandshakeException](
        Sources.fetchUrlToTemp(url))
      val path = Sources.fetchUrlToTemp(url, Sources.UrlArgs(cafile = Some(pemPath)))
      val t = Sources.csvImport(spark, path,
        transforms = Map("k" -> Transform("int")))
      assert(t.df.collect().map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((5, "z")))
    } finally server.stop(0)
  }
}
