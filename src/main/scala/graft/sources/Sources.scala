package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.GTable

/** Import/export surface (reference §2.1: csv/tsv/json/fixed-width import
  * with per-column transforms, scan-time filters and limit; csv/tsv/json
  * export — littletable.py:2744-3459).
  *
  * Design: every import compiles to `spark.read` + casts + filters +
  * limit, all lazy — Catalyst pushes filters/limits into the scan
  * (PushDownPredicates / LimitPushDown), which is the distributed
  * equivalent of the reference's generator pipeline (littletable.py:
  * 2777-2843). Archive/URL source polymorphism (littletable.py:761-927):
  * `.gz` is native to Spark; `.zip` and data-strings get small driver
  * shims.
  */
object Sources {

  /** Per-column transform with on-error default (reference `transforms`,
    * littletable.py:2763-2808): `try_`-style cast, errors→default instead
    * of failed tasks. */
  final case class Transform(to: String, default: Option[Any] = None) {
    def apply(c: Column): Column = {
      val cast = c.try_cast(to)
      default.map(d => coalesce(cast, lit(d))).getOrElse(cast)
    }
  }

  private def applyCommon(
      df0: DataFrame,
      transforms: Map[String, Transform],
      filters: Seq[Column],
      limit: Option[Int]): DataFrame = {
    var df = df0
    transforms.foreach { case (name, tr) =>
      if (name == "*") {
        // wildcard: apply to all not otherwise transformed (littletable.py:2786-2808)
        df0.columns.filterNot(transforms.keySet.filter(_ != "*")).foreach { c =>
          df = df.withColumn(c, tr(col(c)))
        }
      } else df = df.withColumn(name, tr(col(name)))
    }
    filters.foreach(f => df = df.filter(f))
    limit.foreach(n => df = df.limit(n))
    df
  }

  /** CSV import (reference csv_import, littletable.py:2872-2940).
    * `fieldnames` for headerless files; any reader option via `options`. */
  def csvImport(
      spark: SparkSession,
      path: String,
      sep: String = ",",
      fieldnames: Seq[String] = Nil,
      transforms: Map[String, Transform] = Map.empty,
      filters: Seq[Column] = Nil,
      limit: Option[Int] = None,
      options: Map[String, String] = Map.empty): GTable = {
    var reader = spark.read
      .option("sep", sep)
      .option("header", fieldnames.isEmpty)
      .options(options)
    val df0 = reader.csv(path)
    val named =
      if (fieldnames.isEmpty) df0
      else df0.toDF(fieldnames: _*)
    GTable(applyCommon(named, transforms, filters, limit), path)
      .withMeta("path", path)
  }

  /** TSV import (littletable.py:2976-3017). */
  def tsvImport(spark: SparkSession, path: String,
      fieldnames: Seq[String] = Nil,
      transforms: Map[String, Transform] = Map.empty,
      filters: Seq[Column] = Nil,
      limit: Option[Int] = None): GTable =
    csvImport(spark, path, sep = "\t", fieldnames, transforms, filters, limit)

  /** Import from an in-memory data string (the reference's multi-line
    * data-string source, littletable.py:774-796) — parse with from_csv
    * over a tiny parallelized dataset. */
  def csvImportString(
      spark: SparkSession,
      data: String,
      sep: String = ",",
      transforms: Map[String, Transform] = Map.empty,
      filters: Seq[Column] = Nil,
      limit: Option[Int] = None): GTable = {
    // Spool to a temp file and go through the real CSV reader (with
    // multiLine) so quoted fields — including embedded newlines and
    // significant whitespace — parse correctly, and a header-only string
    // yields an empty table rather than a column-count error. The
    // reference treats data strings as a small-sample convenience
    // (littletable.py:774-915); the driver-side spool matches that scale.
    val tmp = java.io.File.createTempFile("graft_csv_str_", ".csv")
    tmp.deleteOnExit()
    java.nio.file.Files.writeString(tmp.toPath, data.stripLeading())
    val parsed = spark.read
      .option("header", true).option("sep", sep).option("multiLine", true)
      .csv(tmp.getAbsolutePath)
    GTable(applyCommon(parsed, transforms, filters, limit), "<data-string>")
      .withMeta("data-string", "<data-string>")
  }

  /** JSON / JSONL import with `path="a.b.c"` descent into a nested
    * container (littletable.py:3204-3312). JSONL is Spark-native; array
    * files read with multiLine. */
  def jsonImport(
      spark: SparkSession,
      path: String,
      descent: String = "",
      multiLine: Boolean = false,
      transforms: Map[String, Transform] = Map.empty,
      filters: Seq[Column] = Nil,
      limit: Option[Int] = None): GTable = {
    var df = spark.read.option("multiLine", multiLine).json(path)
    if (descent.nonEmpty) {
      // descend a.b.c then explode the array of records found there
      df = df.select(explode(col(descent)).as("rec")).select(col("rec.*"))
    }
    GTable(applyCommon(df, transforms, filters, limit), path)
      .withMeta("path", path)
  }

  /** Fixed-width spec: (label, start, end) 0-based half-open slices —
    * reference FixedWidthReader (littletable.py:937-995). */
  final case class FixedWidthSpec(label: String, start: Int, end: Int,
      transform: Option[Transform] = None)

  def fixedWidthImport(
      spark: SparkSession,
      path: String,
      spec: Seq[FixedWidthSpec],
      filters: Seq[Column] = Nil,
      limit: Option[Int] = None): GTable = {
    val raw = spark.read.text(path)
    val cols = spec.map { fw =>
      val sliced = trim(substring(col("value"), fw.start + 1, fw.end - fw.start))
      fw.transform.map(_(sliced)).getOrElse(sliced).as(fw.label)
    }
    GTable(applyCommon(raw.select(cols: _*), Map.empty, filters, limit), path)
      .withMeta("fixed-width", path)
  }

  /** URL-source options mirroring the reference's `url_args`
    * (littletable.py:797-841): Basic-auth credentials, extra request
    * headers, POST body, read/connect timeout, and an SSL trust source —
    * either a CA bundle file (PEM, like the reference's `cafile`) or a
    * prebuilt [[javax.net.ssl.SSLContext]] (like `context`). */
  final case class UrlArgs(
      username: Option[String] = None,
      password: String = "",
      headers: Map[String, String] = Map.empty,
      data: Option[Array[Byte]] = None,
      timeoutMs: Int = 30000,
      cafile: Option[String] = None,
      sslContext: Option[javax.net.ssl.SSLContext] = None)

  /** Build an SSLContext trusting exactly the X.509 certs in a PEM file
    * (reference `cafile`/`load_verify_locations`,
    * littletable.py:819-832). */
  def sslContextFromCaFile(path: String): javax.net.ssl.SSLContext = {
    val cf = java.security.cert.CertificateFactory.getInstance("X.509")
    val in = new java.io.FileInputStream(path)
    val certs = try cf.generateCertificates(in) finally in.close()
    val ks = java.security.KeyStore.getInstance(java.security.KeyStore.getDefaultType)
    ks.load(null, null)
    val it = certs.iterator()
    var i = 0
    while (it.hasNext) { ks.setCertificateEntry(s"ca$i", it.next()); i += 1 }
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** Driver shim: fetch a URL to a temp file so spark.read can scan it
    * (reference http(s) source, littletable.py:797-841). Supports any
    * java.net URL scheme incl. file:// for tests. */
  def fetchUrlToTemp(url: String, timeoutMs: Int = 30000): String =
    fetchUrlToTemp(url, UrlArgs(timeoutMs = timeoutMs))

  /** Full url_args flavor: Basic auth (with the reference's warning when
    * credentials ride plain http), custom headers, POST data, timeout,
    * and a custom trust context for https. */
  def fetchUrlToTemp(url: String, args: UrlArgs): String = {
    val u = java.net.URI.create(url).toURL
    val conn = u.openConnection()
    conn.setConnectTimeout(args.timeoutMs)
    conn.setReadTimeout(args.timeoutMs)
    args.headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    args.username.foreach { user =>
      if (u.getProtocol == "http")
        // reference AuthenticationWarning (littletable.py:805-806)
        System.err.println(
          "WARNING: Basic-auth credentials sent over unencrypted http")
      val token = java.util.Base64.getEncoder
        .encodeToString(s"$user:${args.password}".getBytes("UTF-8"))
      conn.setRequestProperty("Authorization", s"Basic $token")
    }
    val ctx = args.sslContext.orElse(args.cafile.map(sslContextFromCaFile))
    (conn, ctx) match {
      case (https: javax.net.ssl.HttpsURLConnection, Some(c)) =>
        https.setSSLSocketFactory(c.getSocketFactory)
      case _ =>
    }
    args.data.foreach { body =>
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(body) finally os.close()
    }
    val suffix = u.getPath.replaceAll(".*/", "")
    val tmp = java.io.File.createTempFile("graft_url_", s"_$suffix")
    tmp.deleteOnExit()
    val in = conn.getInputStream
    try java.nio.file.Files.copy(in, tmp.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    tmp.getAbsolutePath
  }

  /** Driver shim: extract a .tar.gz entry (reference tar.gz source,
    * littletable.py:844-860). Minimal ustar reader — 512-byte headers,
    * name at 0..100, size as octal at 124..136. */
  def untarGzToTemp(tarGzPath: String, entry: String = ""): String = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(tarGzPath)))
    try {
      val header = new Array[Byte](512)
      def readFully(buf: Array[Byte], n: Int): Int = {
        var off = 0
        while (off < n) {
          val r = in.read(buf, off, n - off)
          if (r < 0) return off
          off += r
        }
        off
      }
      while (readFully(header, 512) == 512) {
        val name = new String(header, 0, 100, "US-ASCII").takeWhile(_ != '\u0000')
        if (name.nonEmpty) {
          val sizeStr = new String(header, 124, 12, "US-ASCII")
            .takeWhile(c => c != '\u0000' && c != ' ').trim
          val size = if (sizeStr.isEmpty) 0L else java.lang.Long.parseLong(sizeStr, 8)
          // typeflag (offset 156): only regular files ('0' or NUL) are
          // data — pax extended headers ('x'/'g'), directories ('5'),
          // links etc. must be skipped, not returned as content
          val typeflag = header(156).toChar
          val isRegular = typeflag == '0' || typeflag == '\u0000'
          val isTarget = isRegular &&
            (entry.isEmpty || name == entry || name.endsWith(s"/$entry"))
          // a legitimately EMPTY target entry returns an empty temp file
          // (size > 0 here would skip it and falsely report 'not found')
          if (isTarget) {
            val suffix = name.replaceAll(".*/", "")
            val tmp = java.io.File.createTempFile("graft_tar_", s"_$suffix")
            tmp.deleteOnExit()
            val out = new java.io.FileOutputStream(tmp)
            val buf = new Array[Byte](8192)
            var remaining = size
            while (remaining > 0) {
              val r = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
              require(r >= 0, s"truncated tar entry $name")
              out.write(buf, 0, r); remaining -= r
            }
            out.close()
            return tmp.getAbsolutePath
          } else {
            var skip = (size + 511) / 512 * 512
            while (skip > 0) {
              val r = in.skip(skip)
              if (r <= 0) {
                // skip() returns 0 at EOF on inflater streams — probe
                // with read() to distinguish EOF from a zero-skip
                require(in.read() >= 0, s"truncated tar archive at entry $name")
                skip -= 1
              } else skip -= r
            }
          }
        }
      }
      throw new IllegalArgumentException(s"entry '$entry' not found in $tarGzPath")
    } finally in.close()
  }

  /** Driver shim: decompress a .xz/.lzma file (reference xz support,
    * littletable.py:867-871) via the org.tukaani.xz codec that ships with
    * Spark. Same temp-file contract as the zip/tar shims. */
  def unxzToTemp(xzPath: String): String = {
    val base = new java.io.File(xzPath).getName.replaceAll("\\.(xz|lzma)$", "")
    val tmp = java.io.File.createTempFile("graft_xz_", s"_$base")
    tmp.deleteOnExit()
    val in = new org.tukaani.xz.XZInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(xzPath)))
    try java.nio.file.Files.copy(in, tmp.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    tmp.getAbsolutePath
  }

  /** Driver shim: unzip a .zip entry to a temp file so spark.read can scan
    * it (reference zip support, littletable.py:872-903). For cluster use
    * the archive should live on shared storage; the shim is for the
    * reference's single-file convenience path. */
  def unzipToTemp(zipPath: String, entry: String = ""): String = {
    val zf = new java.util.zip.ZipFile(zipPath)
    try {
      val entries = zf.entries()
      var target: java.util.zip.ZipEntry = null
      while (entries.hasMoreElements && target == null) {
        val e = entries.nextElement()
        // directory entries (zip -r lists them first) are never data
        if (!e.isDirectory && (entry.isEmpty || e.getName == entry)) target = e
      }
      require(target != null, s"entry '$entry' not found in $zipPath")
      val suffix = target.getName.replaceAll(".*/", "")
      val tmp = java.io.File.createTempFile("graft_unzip_", s"_$suffix")
      tmp.deleteOnExit()
      val in = zf.getInputStream(target)
      java.nio.file.Files.copy(in, tmp.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      in.close()
      tmp.getAbsolutePath
    } finally zf.close()
  }

  // ------------------------------------------------------------------
  // Exports (littletable.py:3117-3413)
  // ------------------------------------------------------------------

  /** Reference `parse_timedelta` (littletable.py:1262-1284) as a column
    * transform: parse a duration string with a timestamp pattern (Java
    * DateTimeFormatter syntax, the strptime analog) and subtract a
    * reference time parsed the same way, yielding a
    * `DayTimeIntervalType` column. Unparseable input (incl. the
    * reference's `''` empty case) → `onError` default, or NULL interval.
    *
    * Usage: `df.withColumn("dt", Sources.parseTimedelta("HH:mm:ss")(col("s")))`.
    */
  def parseTimedelta(
      format: String,
      referenceTime: String = "00:00:00",
      referenceFormat: String = "HH:mm:ss",
      onError: Option[Column] = None): Column => Column = { c =>
    // try_to_timestamp: bad input → NULL, not failed task (reference
    // _converter's try/except → on_error)
    val ts = try_to_timestamp(c, lit(format))
    val ref = to_timestamp(lit(referenceTime), referenceFormat)
    val delta = ts - ref // timestamp − timestamp = DayTimeIntervalType
    onError.map(d => coalesce(delta, d)).getOrElse(delta)
  }

  /** CSV export; `fields` selects/projects (littletable.py:3161-3164). */
  def csvExport(t: GTable, path: String, fields: Seq[String] = Nil,
      sep: String = ","): Unit = {
    val df = if (fields.isEmpty) t.df else t.df.select(fields.map(col): _*)
    df.write.mode("overwrite").option("header", true).option("sep", sep).csv(path)
  }

  def tsvExport(t: GTable, path: String, fields: Seq[String] = Nil): Unit =
    csvExport(t, path, fields, sep = "\t")

  /** Custom JSON encoders (reference `json_encoder` chain,
    * littletable.py:3346-3354): ordered per-column pre-serialization
    * transforms applied before the JSON writer — the Spark analog of a
    * JSONEncoder subclass handling a non-serializable type. Multiple
    * entries chain in order like the reference's multiple-inheritance
    * composition. */
  private def applyEncoders(t: GTable,
      encoders: Seq[(String, Column => Column)]): GTable =
    encoders.foldLeft(t) { case (acc, (name, enc)) =>
      acc.copy(df = acc.df.withColumn(name, enc(col(name))))
    }

  /** JSONL export (reference streaming json_export, littletable.py:3370-3384). */
  def jsonlExport(t: GTable, path: String,
      encoders: Seq[(String, Column => Column)] = Nil): Unit =
    applyEncoders(t, encoders).df.write.mode("overwrite").json(path)

  /** JSON-array export — collect-at-edge, for the reference's small-file
    * array form (littletable.py:3314-3369). */
  def jsonArrayString(t: GTable, n: Int = 100000,
      encoders: Seq[(String, Column => Column)] = Nil): String =
    applyEncoders(t, encoders).df.limit(n).toJSON.collect().mkString("[", ",\n", "]")

  /** Bucketed + sorted parquet table write: co-locates join/aggregation
    * keys at write time so repeated equi-joins and groupBys on `keys`
    * read shuffle-free (bucket pruning + SortMergeJoin with no Exchange).
    * The 100 TB pattern for fact-to-fact joins the reference's in-memory
    * hash indexes (littletable.py:1515-1576) can't express. */
  def writeBucketed(t: GTable, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    replaceTable(t.df.sparkSession, table)
    t.df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** True overwrite prep for a warehouse table: drop the catalog entry
    * AND clear a leftover location from a previous session (the
    * in-memory catalog forgets the table across sessions, the directory
    * stays). Call immediately before `saveAsTable`. */
  private[graft] def replaceTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** PROMOTE a fully-built staged table over the live one — the
    * generation-swap primitive behind every artifact compaction: the
    * next generation is built in full under a staged name while the
    * LIVE table keeps serving, then this swap (drop + catalog RENAME,
    * which moves the managed table's directory in one metadata
    * operation, + a partition re-discovery listing for partitioned
    * layouts) retires the old generation. The serve outage of a
    * generation rewrite collapses from the whole retrain+rewrite to
    * these metadata operations, and a build that fails never touched
    * the live table at all.
    *
    * Storage-layer honesty: the rename is metadata-only on HDFS and
    * local filesystems. On an object store (s3a://), a directory
    * "rename" is a copy — there, keep the staged data in place and
    * swap `ALTER TABLE ... SET LOCATION` to the staged path instead
    * (same catalog-level flip, zero data movement); this helper
    * targets the filesystem regime the engine is benched on. */
  private[graft] def promoteTable(spark: SparkSession, staged: String,
      live: String): Unit = {
    val partitioned = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(staged))
      .partitionColumnNames.nonEmpty
    replaceTable(spark, live)
    spark.sql(s"ALTER TABLE `$staged` RENAME TO `$live`")
    // the in-memory catalog's rename moves the directory but keeps the
    // per-partition locations it recorded at write time — re-list them
    // from the moved directory (metadata-only, no data scan)
    if (partitioned) spark.sql(s"ALTER TABLE `$live` RECOVER PARTITIONS")
  }
}
