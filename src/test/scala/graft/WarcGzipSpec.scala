package graft

import graft.sources.{Warc, WarcGzip}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X134b/X134c: the member-gzip WARC reader — splittable scanning,
  * Content-Length framing, binary fidelity, LWS unfolding.
  */
class WarcGzipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-warcgz-").toString

  /** One gzip member of `payload` bytes. */
  private def gzMember(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(payload); gz.close()
    bos.toByteArray
  }

  private def writeFile(dir: String, name: String, bytes: Array[Byte]): String = {
    val p = java.nio.file.Paths.get(dir, name)
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

  test("gzip roundtrip: CR/LF fuzz + planted WARC/1.0 marker bodies survive byte-identically") {
    val rnd = new scala.util.Random(134)
    // the alphabet the lite reader CANNOT handle: the record marker itself
    // inside bodies, CR/LF runs, blank lines — Content-Length framing must
    // carry them all
    val alphabet = Seq("a", "b c", "\r\n", "\n", "\r", "<p>", "&amp;",
      "WARC/1.0\r\n", "\r\n\r\n", "HTTP/1.1 200 OK")
    val bodies = (1 to 200).map { i =>
      (i, Seq.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.size))).mkString)
    }
    val out = tmp()
    WarcGzip.writeGzip(
      bodies.toDF("i", "body")
        .select(Warc.formatResponse(concat(lit("https://x/"), col("i")),
          lit("2024-01-01T00:00:00Z"), lit("text/plain"), col("body")).as("rec"))
        .repartition(4),
      s"$out/crawl")
    val back = WarcGzip.read(spark, s"$out/crawl")
    val got = back
      .select(regexp_extract(col("target_uri"), "/(\\d+)$", 1).cast("int").as("i"),
        col("body"), col("warc_type"), col("http_status"), col("content_type"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got.size === 200)
    for ((i, b) <- bodies) {
      val r = got(i)
      assert(r.getString(1) === b,
        s"case $i body=${b.replace("\r", "\\r").replace("\n", "\\n")}")
      assert(r.getString(2) === "response")
      assert(r.getInt(3) === 200)
      assert(r.getString(4) === "text/plain")
    }
  }

  test("splittability: tiny splits recover every record exactly once") {
    val bodies = (1 to 300).map(i => (i, s"body $i " + ("x" * (i % 97))))
    val out = tmp()
    WarcGzip.writeGzip(
      bodies.toDF("i", "body")
        .select(Warc.formatResponse(concat(lit("https://x/"), col("i")),
          lit("2024-01-01T00:00:00Z"), lit("text/plain"), col("body")).as("rec"))
        .coalesce(1), // ONE file, so the split scanner does all the work
      s"$out/one")
    // a split boundary lands mid-member many times at 512 bytes; ownership
    // is by member START, so each record must come back exactly once
    val ids = WarcGzip.read(spark, s"$out/one", splitBytes = 512)
      .select(regexp_extract(col("target_uri"), "/(\\d+)$", 1).cast("int"))
      .as[Int].collect().sorted
    assert(ids.toSeq === (1 to 300))
    // degenerate split sizes agree too
    val n1 = WarcGzip.read(spark, s"$out/one", splitBytes = 1).count()
    assert(n1 === 300L)
  }

  test("Content-Length framing: binary bodies, trailing bytes, no false marker split") {
    // a payload of EVERY byte value, framed by Content-Length — body_bytes
    // must be the exact octet slice (UTF-8 string decode is lossy here,
    // body_bytes is not)
    val binBody = Array.tabulate[Byte](256)(_.toByte)
    val http = "HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n\r\n"
      .getBytes("US-ASCII")
    val payload = http ++ binBody
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://bin/1\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII") ++
      payload ++ "\r\n\r\n".getBytes("US-ASCII")
    val dir = tmp()
    writeFile(dir, "bin.warc.gz", gzMember(rec))
    val r = WarcGzip.read(spark, s"$dir/bin.warc.gz").head()
    assert(r.getAs[String]("warc_type") === "response")
    assert(r.getAs[Int]("http_status") === 200)
    assert(r.getAs[Array[Byte]]("body_bytes").toSeq === binBody.toSeq)
    // a body ending in \r\n\r\n: the framing keeps it (no separator guess)
    val tail = "ends with separator lookalike\r\n\r\n"
    val http2 = s"HTTP/1.1 200 OK\r\n\r\n$tail"
    val rec2 = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${http2.getBytes("UTF-8").length}\r\n\r\n" +
      http2 + "\r\n\r\n").getBytes("UTF-8")
    writeFile(dir, "tail.warc.gz", gzMember(rec2))
    val r2 = WarcGzip.read(spark, s"$dir/tail.warc.gz").head()
    assert(r2.getAs[String]("body") === tail)
  }

  test("100-case random-binary payload fuzz: body_bytes survive bit-exactly") {
    // arbitrary octet payloads (invalid UTF-8, NULs, gzip magic, marker
    // bytes) framed by Content-Length — the archival-fidelity contract:
    // body_bytes is the exact slice no matter what the bytes are
    val rnd = new scala.util.Random(17)
    val dir = tmp()
    val cases = (1 to 100).map { i =>
      val n = rnd.nextInt(500)
      val payload = new Array[Byte](n)
      rnd.nextBytes(payload)
      i -> payload
    }
    val members = cases.flatMap { case (i, payload) =>
      gzMember(
        (s"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: https://b/$i\r\n" +
          s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII") ++
          payload ++ "\r\n\r\n".getBytes("US-ASCII")).toSeq
    }.toArray
    writeFile(dir, "bin.warc.gz", members)
    val got = WarcGzip.read(spark, s"$dir/bin.warc.gz")
      .select(regexp_extract(col("target_uri"), "/(\\d+)$", 1).cast("int"),
        col("body_bytes"))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.size === 100)
    for ((i, payload) <- cases)
      assert(java.util.Arrays.equals(got(i), payload), s"case $i")
    // and under a tiny split size (boundaries land mid-member)
    val n512 = WarcGzip.read(spark, s"$dir/bin.warc.gz", splitBytes = 512).count()
    assert(n512 === 100L)
  }

  test("LWS unfolding, missing Content-Length fallback, truncated records degrade") {
    val dir = tmp()
    // folded header: continuation line joins the value
    val folded = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://very.long/\r\n example/path\r\n" +
      "Content-Length: 4\r\n\r\nbody\r\n\r\n").getBytes("UTF-8")
    writeFile(dir, "folded.warc.gz", gzMember(folded))
    val r = WarcGzip.read(spark, s"$dir/folded.warc.gz").head()
    assert(r.getAs[String]("target_uri") === "https://very.long/ example/path")
    assert(r.getAs[String]("body") === "body")
    // no Content-Length: fall back to stripping ONE trailing separator
    val noCl = ("WARC/1.0\r\nWARC-Type: resource\r\n\r\npayload text\r\n\r\n")
      .getBytes("UTF-8")
    writeFile(dir, "nocl.warc.gz", gzMember(noCl))
    val r2 = WarcGzip.read(spark, s"$dir/nocl.warc.gz").head()
    assert(r2.getAs[String]("warc_type") === "resource")
    assert(r2.getAs[String]("body") === "payload text")
    assert(r2.isNullAt(r2.fieldIndex("http_status")))
    // truncated record (headers only, no blank line): all-header parse,
    // NULL body — degrade, never throw
    val trunc = "WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://t/1"
      .getBytes("UTF-8")
    writeFile(dir, "trunc.warc.gz", gzMember(trunc))
    val r3 = WarcGzip.read(spark, s"$dir/trunc.warc.gz").head()
    assert(r3.getAs[String]("target_uri") === "https://t/1")
    assert(r3.isNullAt(r3.fieldIndex("body")))
  }

  test("false-positive gzip magic and non-WARC members are skipped, not errors") {
    val dir = tmp()
    val good = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 2\r\n\r\nok\r\n\r\n")
      .getBytes("UTF-8")
    // junk that LOOKS like a member start (magic bytes) + a VALID gzip
    // member that is not a WARC record + a real record
    val junk = Array[Byte](0x1f, 0x8b.toByte, 0x08, 0x00, 0x00, 0x00)
    val notWarc = gzMember("HTTP/1.1 200 OK\r\nnot a warc record".getBytes("UTF-8"))
    writeFile(dir, "mixed.warc.gz", junk ++ notWarc ++ gzMember(good))
    val rows = WarcGzip.read(spark, s"$dir/mixed.warc.gz").collect()
    assert(rows.length === 1)
    assert(rows(0).getAs[String]("body") === "ok")
  }

  test("WET conversion records roundtrip through both readers; streaming reader ingests a drop-dir") {
    val dir = tmp()
    val recs = Seq(("1", "first extracted text\nsecond line"),
      ("2", "another doc's text")).toDF("i", "txt")
      .select(Warc.formatConversion(concat(lit("https://x/"), col("i")),
        lit("2024-01-01T00:00:00Z"), col("txt")).as("rec"))
    recs.coalesce(1).write.mode("overwrite").text(s"$dir/plain")
    WarcGzip.writeGzip(recs.coalesce(1), s"$dir/gz")
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select("target_uri", "warc_type", "content_type", "body")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).sortBy(_._1).toSeq
    val expected = Seq(
      ("https://x/1", "conversion", "text/plain", "first extracted text\nsecond line"),
      ("https://x/2", "conversion", "text/plain", "another doc's text"))
    // no HTTP block: body is the payload itself, Content-Type surfaces
    // from the WARC header level — in BOTH readers
    assert(shape(Warc.read(spark, s"$dir/plain")) === expected)
    assert(shape(WarcGzip.read(spark, s"$dir/gz")) === expected)
    assert(Warc.read(spark, s"$dir/plain")
      .filter(col("http_status").isNotNull).count() === 0)
    // streaming form: the same drop-dir read as an unbounded stream
    val got = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val q = Warc.readStream(spark, s"$dir/plain")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= batch.select("target_uri", "body").collect()
          .map(r => (r.getString(0), r.getString(1)))
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(got.sortBy(_._1).toSeq === expected.map(e => (e._1, e._4)))
    } finally q.stop()
  }

  test("DSv2: required-column pruning reaches the member parser") {
    val out = tmp()
    WarcGzip.writeGzip(
      (1 to 50).map(i => (i, s"payload $i")).toDF("i", "body")
        .select(Warc.formatResponse(concat(lit("https://x/"), col("i")),
          lit("2024-01-01T00:00:00Z"), lit("text/plain"), col("body")).as("rec"))
        .coalesce(1),
      s"$out/gz")
    val df = WarcGzip.read(spark, s"$out/gz")
    // the scan is a v2 BatchScan, and a narrow projection prunes the scan
    // output to the requested columns — body/record never reach the row
    def scanLine(d: org.apache.spark.sql.DataFrame): String =
      d.queryExecution.executedPlan.toString.linesIterator
        .find(_.contains("BatchScan")).getOrElse(
          fail("no BatchScan in plan:\n" +
            d.queryExecution.executedPlan.toString))
    val statusOnly = df.select("http_status")
    val line = scanLine(statusOnly)
    assert(line.contains("http_status") && !line.contains("body") &&
      !line.contains("record"), line)
    assert(statusOnly.collect().forall(_.getInt(0) == 200))
    // every pruning combination yields correct values
    assert(df.count() === 50L)
    assert(df.select("body").as[String].collect().sorted.head === "payload 1")
    assert(df.select("body_bytes").collect()
      .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).sorted.head === "payload 1")
    assert(df.select("record").as[String].collect()
      .forall(_.startsWith("WARC/1.0\r\n")))
    val mixed = df.select("target_uri", "body").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(mixed("https://x/7") === "payload 7")
  }

  test("CrawlPipeline: status/type gates, noindex, lang gate, deterministic id minting") {
    import graft.ext.CrawlPipeline
    import graft.ext.CrawlPipeline.CrawlConfig
    val dir = tmp()
    def member(warcType: String, status: Int, url: String, html: String): Array[Byte] = {
      val http = s"HTTP/1.1 $status OK\r\nContent-Type: text/html\r\n\r\n$html"
      gzMember((s"WARC/1.0\r\nWARC-Type: $warcType\r\n" +
        s"WARC-Target-URI: $url\r\nWARC-Record-ID: <urn:uuid:$url>\r\n" +
        s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n" +
        http + "\r\n\r\n").getBytes("UTF-8"))
    }
    val en1 = "<body><p>the cat sat on the mat with the hat and the bat</p></body>"
    val en2 = "<body><p>the dog ran to the park and the pond with the ball</p></body>"
    val de = "<body><p>der hund und der mann und der baum und der berg</p></body>"
    val noidx = "<head><meta name=\"robots\" content=\"noindex\"></head>" + en1
    writeFile(dir, "c.warc.gz",
      member("response", 200, "https://a/1", en1) ++
        member("response", 200, "https://a/2", en2) ++
        member("response", 200, "https://a/3", de) ++       // lang-gated
        member("response", 404, "https://a/4", en1) ++      // status-gated
        member("request", 200, "https://a/5", en1) ++       // type-gated
        member("response", 200, "https://a/6", noidx))      // robots-gated
    val cfg = CrawlConfig(keepLang = Some("en"),
      lineDedup = false, nearDedup = false)
    val curated = CrawlPipeline.curateCrawl(spark, s"$dir/c.warc.gz", cfg)
    try {
      val rows = curated.select("url", "content").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(rows.keySet === Set("https://a/1", "https://a/2"))
      assert(rows("https://a/1") === "the cat sat on the mat with the hat and the bat")
      // id minting is deterministic: a second run mints the same ids
      val ids1 = curated.select("id").as[String].collect().sorted.toSeq
      val again = CrawlPipeline.curateCrawl(spark, s"$dir/c.warc.gz", cfg)
      val ids2 = try again.select("id").as[String].collect().sorted.toSeq
        finally again.unpersist()
      assert(ids1 === ids2 && ids1.distinct.size === 2)
      // shard layout: every surviving doc gets one row with coherent
      // pack/shard fields
      val sh = CrawlPipeline.toShards(curated, budget = 8, packShards = 2,
        numShards = 2, seed = 1L)
      assert(sh.count() === 2L)
      assert(sh.columns.toSeq === Seq("id", "url", "shard", "pos",
        "pack_shard", "n_tokens", "offset", "bin", "content"))
      assert(sh.select("n_tokens").as[Long].collect().forall(_ > 0))
    } finally curated.unpersist()
  }

  /** One full record: version line + headers + Content-Length framing +
    * the inter-record separator. */
  private def rawRecord(version: String, headers: Seq[(String, String)],
                        payload: Array[Byte]): Array[Byte] =
    (s"$version\r\n" +
      headers.map { case (k, v) => s"$k: $v\r\n" }.mkString +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII") ++
      payload ++ "\r\n\r\n".getBytes("US-ASCII")

  /** RFC 9112 chunked transfer coding of `body`, split at `sizes`. */
  private def chunk(body: Array[Byte], sizes: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    for (s <- sizes if off < body.length) {
      val n = math.min(s, body.length - off)
      if (n > 0) {
        out.write(f"$n%x\r\n".getBytes("US-ASCII"))
        out.write(body, off, n)
        out.write("\r\n".getBytes("US-ASCII"))
        off += n
      }
    }
    if (off < body.length) {
      out.write(f"${body.length - off}%x\r\n".getBytes("US-ASCII"))
      out.write(body, off, body.length - off)
      out.write("\r\n".getBytes("US-ASCII"))
    }
    out.write("0\r\n\r\n".getBytes("US-ASCII"))
    out.toByteArray
  }

  private def zlibDeflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  test("WARC/1.x version family: a 1.1 archive reads; warc_version surfaces for both") {
    val dir = tmp()
    val v11 = rawRecord("WARC/1.1",
      Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://v/11"),
      "HTTP/1.1 200 OK\r\n\r\neleven".getBytes("US-ASCII"))
    val v10 = rawRecord("WARC/1.0",
      Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://v/10"),
      "HTTP/1.1 200 OK\r\n\r\nten".getBytes("US-ASCII"))
    writeFile(dir, "v.warc.gz", gzMember(v11) ++ gzMember(v10))
    val got = WarcGzip.read(spark, s"$dir/v.warc.gz")
      .select("target_uri", "warc_version", "body").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(got === Seq(("https://v/10", "WARC/1.0", "ten"),
      ("https://v/11", "WARC/1.1", "eleven")))
    // a version OUTSIDE the 1.x family is not claimed as a record
    val v29 = rawRecord("WARC/2.9",
      Seq("WARC-Type" -> "response"), "HTTP/1.1 200 OK\r\n\r\nno".getBytes("US-ASCII"))
    writeFile(dir, "v29.warc.gz", gzMember(v29))
    val ex = intercept[Exception] {
      WarcGzip.read(spark, s"$dir/v29.warc.gz").collect()
    }
    assert(ex.toString.contains("not member-gzip WARC") ||
      Option(ex.getCause).exists(_.toString.contains("not member-gzip WARC")))
  }

  test("a non-WARC gzip file FAILS LOUDLY instead of reading as zero records") {
    val dir = tmp()
    // a perfectly valid .gz that simply is not WARC — the silent-empty
    // trap: must raise, not return an empty frame
    writeFile(dir, "notwarc.gz",
      gzMember("just some compressed text, no WARC here".getBytes("UTF-8")) ++
        gzMember("second member, still not WARC".getBytes("UTF-8")))
    val ex = intercept[Exception] {
      WarcGzip.read(spark, s"$dir/notwarc.gz").count()
    }
    val msg = ex.toString + Option(ex.getCause).map(_.toString).getOrElse("")
    assert(msg.contains("not member-gzip WARC"), msg)
    // an EMPTY directory still reads as empty (no members => no evidence)
    val empty = tmp()
    writeFile(empty, "empty.warc.gz", Array.emptyByteArray)
    assert(WarcGzip.read(spark, s"$empty/empty.warc.gz").count() === 0L)
  }

  test("WARC-Truncated surfaces as a column; absent => NULL") {
    val dir = tmp()
    val truncated = rawRecord("WARC/1.0",
      Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://t/1",
        "WARC-Truncated" -> "length"),
      "HTTP/1.1 200 OK\r\n\r\ncut short".getBytes("US-ASCII"))
    val whole = rawRecord("WARC/1.0",
      Seq("WARC-Type" -> "response", "WARC-Target-URI" -> "https://t/2"),
      "HTTP/1.1 200 OK\r\n\r\nwhole".getBytes("US-ASCII"))
    writeFile(dir, "t.warc.gz", gzMember(truncated) ++ gzMember(whole))
    val got = WarcGzip.read(spark, s"$dir/t.warc.gz")
      .select("target_uri", "warc_truncated").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got === Map("https://t/1" -> Some("length"), "https://t/2" -> None))
  }

  test("chunked / gzip / deflate HTTP bodies decode to document octets; decodeBody=false keeps raw") {
    val dir = tmp()
    val doc = "<html><body>the actual document text</body></html>"
    val docB = doc.getBytes("UTF-8")
    def rec(url: String, extraHttp: String, body: Array[Byte]): Array[Byte] = {
      val head = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n$extraHttp\r\n"
        .getBytes("US-ASCII")
      gzMember(rawRecord("WARC/1.0",
        Seq("WARC-Type" -> "response", "WARC-Target-URI" -> url),
        head ++ body))
    }
    val members =
      rec("https://d/chunked", "Transfer-Encoding: chunked\r\n",
        chunk(docB, Seq(7, 1, 19))) ++
      rec("https://d/gzip", "Content-Encoding: gzip\r\n", gzMember(docB)) ++
      rec("https://d/deflate", "Content-Encoding: deflate\r\n", zlibDeflate(docB)) ++
      rec("https://d/both", "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n",
        chunk(gzMember(docB), Seq(5, 11, 3, 100))) ++
      rec("https://d/plain", "", docB) ++
      // a LYING header (claims gzip, body is plain): degrade to raw bytes
      rec("https://d/lying", "Content-Encoding: gzip\r\n",
        "not actually gzip".getBytes("UTF-8")) ++
      // a coding this reader has NO decoder for (brotli): bytes pass
      // through still compressed, and body_decoded says so
      rec("https://d/brotli", "Content-Encoding: br\r\n",
        Array[Byte](0x1b, 0x2e, 0x00, 0x44, 0x22))
    writeFile(dir, "enc.warc.gz", members)
    val got = WarcGzip.read(spark, s"$dir/enc.warc.gz")
      .select("target_uri", "body").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    for (u <- Seq("chunked", "gzip", "deflate", "both", "plain"))
      assert(got(s"https://d/$u") === doc, s"url $u")
    assert(got("https://d/lying") === "not actually gzip") // raw degrade, not a crash
    // content_encoding surfaces the DECLARED coding; body_decoded says
    // whether body bytes are document octets (false for the lying gzip
    // and the undecodable brotli — the filterable trap closure)
    val meta = WarcGzip.read(spark, s"$dir/enc.warc.gz")
      .select("target_uri", "content_encoding", "body_decoded").collect()
      .map(r => r.getString(0) -> ((Option(r.getString(1)), r.getBoolean(2)))).toMap
    assert(meta("https://d/plain") === ((None, true)))
    assert(meta("https://d/chunked") === ((None, true)))
    assert(meta("https://d/gzip") === ((Some("gzip"), true)))
    assert(meta("https://d/deflate") === ((Some("deflate"), true)))
    assert(meta("https://d/both") === ((Some("gzip"), true)))
    assert(meta("https://d/lying") === ((Some("gzip"), false)))
    assert(meta("https://d/brotli") === ((Some("br"), false)))
    // body_decoded is computable even when body/body_bytes are pruned
    // away (the scan forces the byte path for it)
    assert(WarcGzip.read(spark, s"$dir/enc.warc.gz")
      .filter(col("body_decoded")).count() === 5L)
    // escape hatch: raw capture bytes exactly as archived — body_decoded
    // is false for every record that declared a coding
    val raw = WarcGzip.read(spark, s"$dir/enc.warc.gz", decodeBody = false)
      .select("target_uri", "body_bytes", "body_decoded").collect()
      .map(r => r.getString(0) -> ((r.getAs[Array[Byte]](1), r.getBoolean(2)))).toMap
    assert(java.util.Arrays.equals(raw("https://d/gzip")._1, gzMember(docB)))
    assert(java.util.Arrays.equals(raw("https://d/chunked")._1, chunk(docB, Seq(7, 1, 19))))
    assert(raw("https://d/plain")._2 === true)
    assert(raw("https://d/gzip")._2 === false)
    assert(raw("https://d/chunked")._2 === false)
    // and tiny splits keep the decode correct (per-range inflater reuse)
    val n = WarcGzip.read(spark, s"$dir/enc.warc.gz", splitBytes = 64)
      .filter(col("body") === doc).count()
    assert(n === 5L)
  }

  test("encoded-body roundtrip fuzz: 80 random bodies through every coding, byte-identical") {
    val rnd = new scala.util.Random(1138)
    val dir = tmp()
    val cases = (1 to 80).map { i =>
      val n = rnd.nextInt(800)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      (i, b, i % 4) // 0 plain, 1 chunked, 2 gzip, 3 chunked+deflate
    }
    val members = cases.flatMap { case (i, b, mode) =>
      val (extra, enc) = mode match {
        case 0 => ("", b)
        case 1 => ("Transfer-Encoding: chunked\r\n",
          chunk(b, Seq.fill(8)(1 + rnd.nextInt(97))))
        case 2 => ("Content-Encoding: gzip\r\n", gzMember(b))
        case _ => ("Transfer-Encoding: chunked\r\nContent-Encoding: deflate\r\n",
          chunk(zlibDeflate(b), Seq.fill(8)(1 + rnd.nextInt(53))))
      }
      val head = s"HTTP/1.1 200 OK\r\n$extra\r\n".getBytes("US-ASCII")
      gzMember(rawRecord("WARC/1.1",
        Seq("WARC-Type" -> "response", "WARC-Target-URI" -> s"https://f/$i"),
        head ++ enc)).toSeq
    }.toArray
    writeFile(dir, "fuzz.warc.gz", members)
    val got = WarcGzip.read(spark, s"$dir/fuzz.warc.gz", splitBytes = 777)
      .select(regexp_extract(col("target_uri"), "/(\\d+)$", 1).cast("int"),
        col("body_bytes"))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.size === 80)
    for ((i, b, mode) <- cases)
      assert(java.util.Arrays.equals(got(i), b), s"case $i mode $mode")
  }

  test("writeGzip commits atomically: only final part files remain") {
    val out = tmp()
    WarcGzip.writeGzip(
      (1 to 40).map(i => (i, s"rec $i")).toDF("i", "b")
        .select(Warc.formatResponse(concat(lit("https://x/"), col("i")),
          lit("2024-01-01T00:00:00Z"), lit("text/plain"), col("b")).as("rec"))
        .repartition(5),
      s"$out/gz")
    // only final parts (plus the local FS's hidden .crc sidecars) — no
    // attempt-scoped .tmp survivors
    val names = new java.io.File(s"$out/gz").listFiles().map(_.getName).sorted
    assert(names.forall(n => !n.contains(".tmp")), names.mkString(","))
    val visible = names.filterNot(_.startsWith("."))
    assert(visible.nonEmpty && visible.forall(n =>
      n.startsWith("part-") && n.endsWith(".warc.gz")), names.mkString(","))
    assert(WarcGzip.read(spark, s"$out/gz").count() === 40L)
  }

  test("CrawlPipeline: dropTruncated gate; stagePath boundaries ≡ persist boundaries") {
    import graft.ext.CrawlPipeline
    import graft.ext.CrawlPipeline.CrawlConfig
    val dir = tmp()
    def member(url: String, text: String, truncated: Boolean): Array[Byte] = {
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<body><p>$text</p></body>"
      val tr = if (truncated) "WARC-Truncated: length\r\n" else ""
      gzMember((s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
        tr + s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n" +
        http + "\r\n\r\n").getBytes("UTF-8"))
    }
    writeFile(dir, "c.warc.gz",
      member("https://a/1", "alpha beta gamma delta epsilon zeta", truncated = false) ++
        member("https://a/2", "one two three four five six seven", truncated = false) ++
        member("https://a/3", "cut short capture", truncated = true))
    // the truncated capture is dropped by default, kept when disabled
    val cur = CrawlPipeline.curateCrawl(spark, s"$dir/c.warc.gz",
      CrawlConfig(lineDedup = false, nearDedup = false))
    try assert(cur.select("url").as[String].collect().toSet ===
      Set("https://a/1", "https://a/2"))
    finally cur.unpersist()
    val curAll = CrawlPipeline.curateCrawl(spark, s"$dir/c.warc.gz",
      CrawlConfig(dropTruncated = false, lineDedup = false, nearDedup = false))
    try assert(curAll.count() === 3L)
    finally curAll.unpersist()
    // durable boundaries: identical results to persist mode, stage files on disk
    val stageRoot = tmp()
    def rows(cfg: CrawlConfig) = {
      val c = CrawlPipeline.curateCrawl(spark, s"$dir/c.warc.gz", cfg)
      try c.select("id", "url", "content").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      finally c.unpersist()
    }
    val full = CrawlConfig() // line + near dedup on: all three boundaries run
    assert(rows(full.copy(stagePath = Some(stageRoot))) === rows(full))
    assert(new java.io.File(s"$stageRoot/stage-0").exists())
    assert(new java.io.File(s"$stageRoot/stage-2").exists())
    // robots.txt config arm: a host-scoped Disallow drops its doc
    val robots = Seq(("https://a/robots.txt", "User-agent: *\nDisallow: /1"))
      .toDF("url", "content")
    val gated = CrawlPipeline.curateCrawl(spark, s"$dir/c.warc.gz",
      CrawlConfig(lineDedup = false, nearDedup = false,
        robotsTxt = Some(robots)))
    try assert(gated.select("url").as[String].collect().toSet ===
      Set("https://a/2"))
    finally gated.unpersist()
    // robotsFromCrawl: the rules come from the crawl's OWN robots.txt
    // capture, and that capture must not itself become a corpus doc
    def robotsMember(host: String, rules: String): Array[Byte] = {
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n$rules"
      gzMember((s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: https://$host/robots.txt\r\n" +
        s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n" +
        http + "\r\n\r\n").getBytes("UTF-8"))
    }
    writeFile(dir, "r.warc.gz",
      member("https://a/1", "alpha beta gamma delta epsilon zeta", truncated = false) ++
        member("https://a/2", "one two three four five six seven", truncated = false) ++
        robotsMember("a", "User-agent: *\nDisallow: /2"))
    val self = CrawlPipeline.curateCrawl(spark, s"$dir/r.warc.gz",
      CrawlConfig(lineDedup = false, nearDedup = false,
        robotsFromCrawl = true))
    try assert(self.select("url").as[String].collect().toSet ===
      Set("https://a/1"))
    finally self.unpersist()
  }

  test("streaming .warc.gz ingest: two drops ≡ batch read; offsets roundtrip; no re-reads") {
    val drop = tmp()
    def writeBatch(tag: String, ids: Range): Unit =
      WarcGzip.writeGzip(
        ids.map(i => (i, s"body $i")).toDF("i", "b")
          .select(Warc.formatResponse(concat(lit("https://s/"), col("i")),
            lit("2024-01-01T00:00:00Z"), lit("text/plain"), col("b")).as("rec"))
          .coalesce(1),
        s"$drop/$tag")
    // the stream watches a glob over per-drop subdirs
    writeBatch("d1", 1 to 30)
    val got = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val batches = scala.collection.mutable.ArrayBuffer[Long]()
    val q = WarcGzip.readStream(spark, s"$drop/*/part-*.warc.gz")
      .select("target_uri", "body")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r => (r.getString(0), r.getString(1)))
        got ++= rows; batches += rows.length.toLong
        ()
      }.start()
    try {
      q.processAllAvailable()
      writeBatch("d2", 31 to 50)
      q.processAllAvailable()
    } finally q.stop()
    // batch-equivalence, exactly-once: drop 2 must not re-read drop 1
    val batch = WarcGzip.read(spark, s"$drop/*/part-*.warc.gz")
      .select("target_uri", "body").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.sorted.toSeq === batch.sorted.toSeq)
    assert(got.size === 50) // no duplicates => sets AND sizes agree
    assert(batches.filter(_ > 0).toSeq === Seq(30L, 20L))
    // offset serialization roundtrips (incl. a path needing escapes)
    val off = graft.sources.WarcGzOffset(Map(
      "file:/plain/a.warc.gz" -> ((123L, 111L)), "file:/we\"ird\\p\n.gz" -> ((7L, 222L))))
    assert(graft.sources.WarcGzOffset.parse(off.json()) === off)
  }

  test("offset compaction (maxFileAgeMs): horizon files never read, restart across the boundary") {
    import graft.sources.WarcGzOffset
    // watermarked offsets roundtrip; legacy 2-field entries still parse
    val off = WarcGzOffset(Map(
      "file:/a.gz" -> ((5L, 1000L)), "file:/b:c.gz" -> ((9L, 2000L))), 1500L)
    assert(WarcGzOffset.parse(off.json()) === off)
    assert(off.json().startsWith("[\"w:1500\""))
    val legacy = WarcGzOffset.parse("[\"123:file:/plain/a.warc.gz\"]")
    assert(legacy === WarcGzOffset(Map("file:/plain/a.warc.gz" -> ((123L, 0L)))))
    assert(legacy.watermark === Long.MinValue)
    // stream-level: a file already older than the horizon at first listing
    // is never read (the documented Spark file-source maxFileAge caveat);
    // fresh drops are; restart from the checkpoint does not re-read across
    // the compaction boundary
    val drop = tmp()
    val ckpt = tmp()
    def writeBatch(tag: String, ids: Range): Unit =
      WarcGzip.writeGzip(
        ids.map(i => (i, s"body $i")).toDF("i", "b")
          .select(Warc.formatResponse(concat(lit("https://s/"), col("i")),
            lit("2024-01-01T00:00:00Z"), lit("text/plain"), col("b")).as("rec"))
          .coalesce(1),
        s"$drop/$tag")
    writeBatch("old", 1 to 5)
    new java.io.File(s"$drop/old").listFiles().foreach(
      _.setLastModified(System.currentTimeMillis() - 10L * 60 * 1000))
    writeBatch("fresh", 6 to 9)
    val got = scala.collection.mutable.ArrayBuffer[String]()
    def run(): Unit = {
      val q = WarcGzip.readStream(spark, s"$drop/*/part-*.warc.gz",
          maxFileAgeMs = Some(60L * 1000))
        .select("target_uri")
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$ckpt/c")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          got ++= b.collect().map(_.getString(0)); ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(got.sorted.toSeq === (6 to 9).map(i => s"https://s/$i").sorted,
      "the past-horizon drop must never be read; the fresh one exactly once")
    // restart with a NEW drop: only it is read — nothing re-reads across
    // the checkpointed (compacted) offset
    writeBatch("fresh2", 10 to 12)
    run()
    assert(got.sorted.toSeq === (6 to 12).map(i => s"https://s/$i").sorted)
  }

  test("index + fetch: CDX-style random access returns byte-identical records; bad pointers raise") {
    val out = tmp()
    WarcGzip.writeGzip(
      (1 to 200).map(i => (i, s"payload $i " + ("y" * (i % 53)))).toDF("i", "b")
        .select(Warc.formatResponse(concat(lit("https://x/"), col("i")),
          lit("2024-01-01T00:00:00Z"), lit("text/plain"), col("b")).as("rec"))
        .repartition(3),
      s"$out/gz")
    val idx = WarcGzip.index(spark, s"$out/gz")
    assert(idx.columns.toSeq === Seq("target_uri", "record_id", "warc_type",
      "warc_date", "file", "offset", "length"))
    assert(idx.count() === 200L)
    // fetch EVERY indexed record: identical rows to the scanning read
    // (same parse incl. coordinates — proves offsets/lengths are exact)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select("target_uri", "body", "file", "offset", "length").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    assert(shape(WarcGzip.fetch(spark, idx)) ===
      shape(WarcGzip.read(spark, s"$out/gz")))
    // offset-range sub-splitting (parallelism above #files) returns the
    // exact same rows — per-bucket tasks still seek forward per file
    assert(shape(WarcGzip.fetch(spark, idx, subSplitBytes = 1L)) ===
      shape(WarcGzip.read(spark, s"$out/gz")))
    // selective fetch: a filtered pointer frame returns exactly its rows
    val some = WarcGzip.fetch(spark,
      idx.filter(col("target_uri").rlike("/1?7$"))) // 7, 17
      .select("target_uri", "body").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(some.keySet === Set("https://x/7", "https://x/17"))
    assert(some("https://x/7").startsWith("payload 7 "))
    // a pointer into the middle of a member is a LOUD failure
    val bad = idx.limit(1).select(col("file"), (col("offset") + 3).as("offset"))
    val ex = intercept[Exception] { WarcGzip.fetch(spark, bad).collect() }
    val msg = ex.toString + Option(ex.getCause).map(_.toString).getOrElse("")
    assert(msg.contains("does not address a valid"), msg)
    // a NULL-coordinate pointer (Cdx.read's malformed-line degrade) is the
    // same loud contract — with actionable coordinates, not an opaque
    // encoder null-field error
    val nullPtr = idx.limit(1).select(col("file"),
      lit(null).cast("long").as("offset"))
    val ex2 = intercept[Exception] { WarcGzip.fetch(spark, nullPtr).collect() }
    val msg2 = ex2.toString + Option(ex2.getCause).map(_.toString).getOrElse("")
    assert(msg2.contains("NULL coordinates") && msg2.contains("offset=NULL"), msg2)
  }

  test("whole-file gzip (the classic misformat) reads EVERY record, not silently just the first") {
    val dir = tmp()
    // `gzip file.warc`: ONE member holding the whole archive
    val archive = (1 to 25).map { i =>
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nbody $i"
      s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://w/$i\r\n" +
        s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n$http\r\n\r\n"
    }.mkString
    writeFile(dir, "whole.warc.gz", gzMember(archive.getBytes("UTF-8")))
    val got = WarcGzip.read(spark, s"$dir/whole.warc.gz")
      .select(regexp_extract(col("target_uri"), "/(\\d+)$", 1).cast("int"), col("body"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got.keySet === (1 to 25).toSet)
    assert(got(13) === "body 13")
    // all records share the member's coordinates, and fetch on the member
    // pointer returns all of them
    val idx = WarcGzip.index(spark, s"$dir/whole.warc.gz")
    assert(idx.select("offset").distinct().count() === 1L)
    assert(WarcGzip.fetch(spark, idx.limit(1)).count() === 25L)
    // duplicate pointers collapse: all 25 index rows share ONE coordinate
    // pair — re-inflating per duplicate would be quadratic output
    assert(WarcGzip.fetch(spark, idx).count() === 25L)
    // ... and still collapse under offset-range sub-splitting (same
    // offset => same bucket => adjacent after the sort)
    assert(WarcGzip.fetch(spark, idx, subSplitBytes = 1L).count() === 25L)
  }

  test("multi-member gzip Content-Encoding bodies decode whole; trailing junk tolerated") {
    val dir = tmp()
    val partA = "first half of the document, "
    val partB = "second half after a member boundary"
    def rec(url: String, body: Array[Byte]): Array[Byte] = {
      val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Content-Encoding: gzip\r\n\r\n").getBytes("US-ASCII")
      gzMember((s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
        s"Content-Length: ${head.length + body.length}\r\n\r\n").getBytes("US-ASCII") ++
        head ++ body ++ "\r\n\r\n".getBytes("US-ASCII"))
    }
    val multi = gzMember(partA.getBytes("UTF-8")) ++ gzMember(partB.getBytes("UTF-8"))
    val junk = gzMember(partA.getBytes("UTF-8")) ++ "not gzip tail".getBytes("UTF-8")
    writeFile(dir, "mm.warc.gz",
      rec("https://m/multi", multi) ++ rec("https://m/junk", junk))
    val got = WarcGzip.read(spark, s"$dir/mm.warc.gz")
      .select("target_uri", "body").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("https://m/multi") === partA + partB)
    assert(got("https://m/junk") === partA) // decoded prefix, junk ignored
  }

  test("robotsFromCrawl ignores error and truncated robots captures") {
    import graft.ext.CrawlPipeline
    import graft.ext.CrawlPipeline.CrawlConfig
    val dir = tmp()
    def page(url: String, text: String): Array[Byte] = {
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<body><p>$text</p></body>"
      gzMember((s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\n" +
        s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n" +
        http + "\r\n\r\n").getBytes("UTF-8"))
    }
    def robots(host: String, status: Int, rules: String, truncated: Boolean): Array[Byte] = {
      val http = s"HTTP/1.1 $status X\r\nContent-Type: text/plain\r\n\r\n$rules"
      val tr = if (truncated) "WARC-Truncated: length\r\n" else ""
      gzMember((s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: https://$host/robots.txt\r\n" + tr +
        s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n" +
        http + "\r\n\r\n").getBytes("UTF-8"))
    }
    writeFile(dir, "e.warc.gz",
      page("https://a/1", "alpha beta gamma") ++
        page("https://b/1", "delta epsilon zeta") ++
        page("https://c/1", "eta theta iota") ++
        // a 403 challenge body that would wipe host a if trusted
        robots("a", 403, "User-agent: *\nDisallow: /", truncated = false) ++
        // a truncated capture that lost its Allow carve-out for host b
        robots("b", 200, "User-agent: *\nDisallow: /", truncated = true) ++
        // a clean capture for host c that really does disallow
        robots("c", 200, "User-agent: *\nDisallow: /1", truncated = false))
    val cur = CrawlPipeline.curateCrawl(spark, s"$dir/e.warc.gz",
      CrawlConfig(lineDedup = false, nearDedup = false, robotsFromCrawl = true))
    try assert(cur.select("url").as[String].collect().toSet ===
      Set("https://a/1", "https://b/1"))
    finally cur.unpersist()
  }

  test("multi-record member fuzz: random record counts and CR/LF-soup bodies all recover") {
    val rnd = new scala.util.Random(777)
    val alphabet = Seq("a", "b c", "\r\n", "\n", "\r\n\r\n", "WARC/1.0\r\n",
      "Content-Length: 9\r\n", "0\r\n\r\n", "x")
    val dir = tmp()
    var expected = Map.empty[String, String]
    // 40 members, each holding 1..5 records (whole-file-gzip shape mixed
    // with archival one-record members in one file)
    val members = (1 to 40).flatMap { m =>
      val nRecs = 1 + rnd.nextInt(5)
      val recs = (1 to nRecs).map { r =>
        val body = Seq.fill(rnd.nextInt(10))(
          alphabet(rnd.nextInt(alphabet.size))).mkString
        val uri = s"https://f/$m-$r"
        expected += uri -> body
        val http = s"HTTP/1.1 200 OK\r\n\r\n$body"
        s"WARC/1.${rnd.nextInt(2)}\r\nWARC-Type: response\r\n" +
          s"WARC-Target-URI: $uri\r\n" +
          s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n" +
          http + "\r\n\r\n"
      }.mkString
      gzMember(recs.getBytes("UTF-8")).toSeq
    }.toArray
    writeFile(dir, "mr.warc.gz", members)
    for (split <- Seq(1L << 20, 256L)) {
      val got = WarcGzip.read(spark, s"$dir/mr.warc.gz", splitBytes = split)
        .select("target_uri", "body").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got === expected, s"splitBytes=$split")
    }
  }

  test("parse hints agree with the hintless parse (memberRecords vs direct parseMemberRecord)") {
    val rnd = new scala.util.Random(4242)
    val bodies = Seq("", "plain", "a\r\n\r\nb", "x" * 300,
      "no content length tail\r\n\r\n") ++
      (1 to 30).map(_ => (1 to rnd.nextInt(40)).map(_ =>
        (rnd.nextInt(94) + 32).toChar).mkString)
    for ((b, i) <- bodies.zipWithIndex) {
      val withCl = (s"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: https://h/$i\r\n" +
        s"Content-Length: ${b.getBytes("UTF-8").length}\r\n\r\n" + b + "\r\n\r\n")
        .getBytes("UTF-8")
      val noCl = (s"WARC/1.1\r\nWARC-Type: resource\r\nWARC-Target-URI: https://h/$i\r\n\r\n" +
        b + "\r\n\r\n").getBytes("UTF-8")
      for (rec <- Seq(withCl, noCl)) {
        val direct = WarcGzip.parseMemberRecord(rec)
        val hinted = WarcGzip.memberRecords(rec, needRecord = true,
          needBody = true, needBodyBytes = true, decoder = null,
          file = "", offset = 0L, memberLen = 0L)
        assert(hinted.length === 1, s"case $i")
        assert(hinted.head === direct.copy(
          body_bytes = hinted.head.body_bytes), s"case $i") // arrays: compare below
        assert(hinted.head.body_bytes.map(_.toSeq) ===
          direct.body_bytes.map(_.toSeq), s"case $i")
      }
    }
  }

  test("CDX-J sidecar: format → read roundtrip, surtKey, fetch through the published index") {
    import graft.sources.Cdx
    val out = tmp()
    WarcGzip.writeGzip(
      (1 to 60).map(i => (i, s"cdx body $i")).toDF("i", "b")
        .select(Warc.formatResponse(
          concat(lit("https://www.Site"), col("i") % 3, lit(".example/Doc/"), col("i")),
          lit("2024-01-02T03:04:05Z"), lit("text/plain"), col("b")).as("rec"))
        .repartition(2),
      s"$out/gz")
    val idx = WarcGzip.index(spark, s"$out/gz")
    Cdx.format(idx).coalesce(1).write.mode("overwrite").text(s"$out/cdx")
    val back = Cdx.read(spark, s"$out/cdx", warcRoot = Some(s"$out/gz"))
    assert(back.count() === 60L)
    val row = back.filter(col("url").endsWith("/Doc/7")).head()
    // SURT-lite key: reversed host labels, www stripped, lowercased tail
    assert(row.getAs[String]("urlkey") === "example,site1)/doc/7")
    assert(row.getAs[String]("timestamp") === "20240102030405")
    assert(row.getAs[Long]("offset") >= 0L && row.getAs[Long]("length") > 0L)
    // the published index IS a fetchable pointer frame: the doc/7 path
    // belongs to exactly one capture (i=7)
    val fetched = WarcGzip.fetch(spark, back.filter(col("urlkey").endsWith(")/doc/7")))
      .select("target_uri", "body").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(fetched.toSeq === Seq(("https://www.Site1.example/Doc/7", "cdx body 7")))
    // malformed lines degrade to NULL fields, never an error
    writeFile(out, "bad.cdx", "not a cdx line at all\nx y {broken json\n".getBytes("UTF-8"))
    val bad = Cdx.read(spark, s"$out/bad.cdx").collect()
    assert(bad.length === 2 && bad.forall(_.isNullAt(bad.head.fieldIndex("offset"))))
    // surtKey edge cases — incl. real-SURT port semantics: non-default
    // ports stay in the key (different ports must not collide), scheme
    // defaults strip
    val keys = Seq(
      ("https://www.Example.com/A/b?X=1", "com,example)/a/b?x=1"),
      ("http://sub.host.co.uk/", "uk,co,host,sub)/"),
      ("https://host.org", "org,host)/"),
      ("https://host.org:8080/X", "org,host:8080)/x"),
      ("http://host.org:80/x", "org,host)/x"),
      ("https://host.org:443/x", "org,host)/x"),
      ("https://user:p@host.org/x", "org,host)/x"), // userinfo stripped
      // a sloppy URI with raw whitespace in the path/query must still
      // yield ONE space-free token (the line format is space-delimited)
      ("https://host.org/a b?q=c d", "org,host)/a%20b?q=c%20d"),
      (null.asInstanceOf[String], null),
      ("no scheme here", null)
    ).toDF("u", "want")
      .select(Cdx.surtKey(col("u")).as("got"), col("want")).collect()
    keys.foreach(r => assert(Option(r.getString(0)) === Option(r.getString(1)),
      s"surt ${r}"))
    // format never silently drops a capture: an unparseable target_uri
    // falls back to a whitespace-free lowercased-url key; quotes in mime
    // values JSON-escape; warcinfo (no uri) is excluded BY CONTRACT
    val weird = Seq(
      ("Not A Url", "f.warc.gz", 0L, 10L, "2024-01-01T00:00:00Z", "text/html; charset=\"utf-8\""),
      (null.asInstanceOf[String], "f.warc.gz", 99L, 10L, "2024-01-01T00:00:00Z", "x"))
      .toDF("target_uri", "file", "offset", "length", "warc_date", "mime")
    val lines = Cdx.format(weird).as[String].collect()
    assert(lines.length === 1) // the NULL-uri row excluded, the weird one kept
    assert(lines.head.startsWith("not%20a%20url 20240101000000 "))
    val parsed = Cdx.read(spark, {
      val d = tmp(); writeFile(d, "w.cdx", (lines.head + "\n").getBytes("UTF-8")); s"$d/w.cdx"
    }).head()
    assert(parsed.getAs[String]("url") === "Not A Url")
    assert(parsed.getAs[String]("mime") === "text/html; charset=\"utf-8\"")
    assert(parsed.getAs[Long]("offset") === 0L)
  }

  test("zipnum CDX: sorted gzip blocks + cluster.idx secondary; lookup prunes to covering blocks") {
    import graft.sources.Cdx
    val out = tmp()
    val idx = (1 to 400).map { i =>
      val host = Seq("alpha", "beta", "gamma", "delta")(i % 4)
      (s"https://$host.example/p/$i", s"f${i % 3}.warc.gz",
        i.toLong * 10, 10L, "2024-01-01T00:00:00Z")
    }.toDF("target_uri", "file", "offset", "length", "warc_date")
    Cdx.writeZipnum(Cdx.format(idx), s"$out/zip", blockLines = 5)
    val files = new java.io.File(s"$out/zip").listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted
    assert(files.contains("cluster.idx"))
    assert(files.exists(_.matches("cdx-\\d{5}\\.gz")))
    assert(files.forall(n => !n.contains(".tmp")), files.mkString(","))
    // the secondary: one line per block, keys globally sorted, TAB format
    val idxLines = scala.io.Source.fromFile(s"$out/zip/cluster.idx")
      .getLines().toSeq
    assert(idxLines.size >= 400 / 5)
    val keys = idxLines.map(_.split("\t")(0))
    assert(keys === keys.sorted, "cluster.idx keys must be sorted")
    assert(idxLines.forall(_.split("\t").length === 5))
    // Hadoop's gzip codec reads concatenated members, so the whole zipnum
    // index doubles as an ordinary Cdx.read source — the equivalence base
    val full = Cdx.read(spark, s"$out/zip/cdx-*.gz")
    assert(full.count() === 400L)
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select("urlkey", "timestamp", "url", "offset", "length").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).sortBy(_._3).toSeq
    // lookup(prefix) ≡ full scan + filter, for a host and a deeper prefix
    for (pfx <- Seq("example,beta)/", "example,gamma)/p/1", "example,alpha)/p/17")) {
      assert(shape(Cdx.lookup(spark, s"$out/zip", pfx)) ===
        shape(full.filter(col("urlkey").startsWith(pfx))), s"prefix $pfx")
    }
    assert(Cdx.lookup(spark, s"$out/zip", "example,beta)/").count() === 100L)
    // a miss (before, between, after every key) matches nothing
    for (pfx <- Seq("aaa,nope)/", "example,bete)/", "zzz,nope)/"))
      assert(Cdx.lookup(spark, s"$out/zip", pfx).count() === 0L, s"miss $pfx")
    // explicit key-range lookup (the pywb from/to form): half-open
    // [from, until) across host boundaries ≡ the full-scan filter
    val (fromK, untilK) = ("example,beta)/p/5", "example,delta)/p/2")
    assert(shape(Cdx.lookupRange(spark, s"$out/zip", fromK, untilK)) ===
      shape(full.filter(col("urlkey") >= fromK && col("urlkey") < untilK)))
    assert(Cdx.lookupRange(spark, s"$out/zip",
      "example,beta)/p/13", "example,beta)/p/13 ").count() === 1L)
    // a malformed secondary line raises LOUDLY with its content (the
    // fetch-pointer claim contract), not an opaque encoder error
    val bad = tmp()
    writeFile(bad, "cluster.idx",
      "example,x)/ 20240101000000\tcdx-00000.gz\tnotanumber\t10\t1\n".getBytes("UTF-8"))
    val ex = intercept[Exception] {
      Cdx.lookup(spark, bad, "example,x)/").count()
    }
    val msg = ex.toString + Option(ex.getCause).map(_.toString).getOrElse("")
    assert(msg.contains("malformed cluster.idx line"), msg)
  }

  test("DSv2 WARC-Type filter pushdown: skips non-matching records in the scan, plan shows it") {
    val dir = tmp()
    def rec(t: String, url: String, body: String): Array[Byte] = {
      val payload = t match {
        case "request" => "GET / HTTP/1.1\r\nHost: x\r\n\r\n"
        case "metadata" => "{\"m\": 1}" // no HTTP block => NULL status
        case _ => s"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n$body"
      }
      gzMember(rawRecord("WARC/1.0",
        Seq("WARC-Type" -> t, "WARC-Target-URI" -> url),
        payload.getBytes("UTF-8")))
    }
    // the real CC shape: request + response + metadata per capture
    val members = (1 to 30).toArray.flatMap { i =>
      rec("request", s"https://m/$i", "") ++
        rec("response", s"https://m/$i", s"body $i") ++
        rec("metadata", s"https://m/$i", "{}")
    }
    writeFile(dir, "mixed.warc.gz", members)
    val filtered = WarcGzip.read(spark, s"$dir/mixed.warc.gz")
      .filter(col("warc_type") === "response")
    assert(filtered.count() === 30L)
    assert(filtered.select("target_uri", "body").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet ===
      (1 to 30).map(i => (s"https://m/$i", s"body $i")).toSet)
    // the scan's description carries the pushed type gate
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("keepTypes=response"), plan)
    // IN-filters push too (set semantics)
    val in2 = WarcGzip.read(spark, s"$dir/mixed.warc.gz")
      .filter(col("warc_type").isin("response", "metadata"))
    assert(in2.count() === 60L)
    assert(in2.queryExecution.executedPlan.toString
      .contains("keepTypes=metadata|response"))
    // a filter matching NOTHING on a legitimate archive is an empty
    // result — never the non-WARC fail-loud raise (members counted, not
    // emitted rows)
    assert(WarcGzip.read(spark, s"$dir/mixed.warc.gz")
      .filter(col("warc_type") === "zzz").count() === 0L)
    // http_status pushes the same way: NULL-status records (request,
    // metadata — no HTTP block) are gated out scan-side, matching the
    // post-scan SQL semantics exactly
    val st = WarcGzip.read(spark, s"$dir/mixed.warc.gz")
      .filter(col("http_status").isin(200, 301))
    assert(st.count() === 30L)
    assert(st.queryExecution.executedPlan.toString
      .contains("keepStatuses=200|301"))
    assert(WarcGzip.read(spark, s"$dir/mixed.warc.gz")
      .filter(col("http_status") === 404).count() === 0L)
    // both gates compose (the curateCrawl read shape)
    val both = WarcGzip.read(spark, s"$dir/mixed.warc.gz")
      .filter(col("warc_type") === "response" && col("http_status") === 200)
    assert(both.count() === 30L)
    val bothPlan = both.queryExecution.executedPlan.toString
    assert(bothPlan.contains("keepTypes=response") &&
      bothPlan.contains("keepStatuses=200"), bothPlan)
    // target_uri prefix filters push too (the read-one-domain pattern):
    // ids 1, 10..19 start with "…/m/1"
    val pfx = WarcGzip.read(spark, s"$dir/mixed.warc.gz")
      .filter(col("warc_type") === "response" &&
        col("target_uri").startsWith("https://m/1"))
    assert(pfx.count() === 11L)
    assert(pfx.queryExecution.executedPlan.toString
      .contains("uriPrefixes=https://m/1"))
    // the gate also walks whole-file-gzip members correctly: filtered-out
    // records still advance the in-member walk by Content-Length
    val whole = (1 to 10).map { i =>
      val t = if (i % 2 == 0) "response" else "request"
      val http =
        if (t == "request") "GET / HTTP/1.1\r\n\r\n"
        else s"HTTP/1.1 200 OK\r\n\r\nbody $i"
      s"WARC/1.0\r\nWARC-Type: $t\r\nWARC-Target-URI: https://w/$i\r\n" +
        s"Content-Length: ${http.getBytes("UTF-8").length}\r\n\r\n$http\r\n\r\n"
    }.mkString
    val wdir = tmp()
    writeFile(wdir, "whole.warc.gz", gzMember(whole.getBytes("UTF-8")))
    val got = WarcGzip.read(spark, s"$wdir/whole.warc.gz")
      .filter(col("warc_type") === "response")
      .select(regexp_extract(col("target_uri"), "/(\\d+)$", 1).cast("int"))
      .as[Int].collect().toSet
    assert(got === (1 to 10).filter(_ % 2 == 0).toSet)
  }

  test("revisit resolution: refers-to/digest arms, earliest-original ties, dangling pointers") {
    import graft.ext.CrawlPipeline
    val records = Seq(
      // two originals sharing a digest: the EARLIEST (date, id) is canonical
      ("response", "https://o/1", "2024-01-02T00:00:00Z", "<urn:1>", null, "sha1:AAA"),
      ("response", "https://o/2", "2024-01-01T00:00:00Z", "<urn:2>", null, "sha1:AAA"),
      ("response", "https://o/3", "2024-01-03T00:00:00Z", "<urn:3>", null, "sha1:BBB"),
      ("revisit", "https://r/a", "2024-02-01T00:00:00Z", "<urn:r1>", "<urn:3>", null),
      ("revisit", "https://r/b", "2024-02-02T00:00:00Z", "<urn:r2>", null, "sha1:AAA"),
      ("revisit", "https://r/c", "2024-02-03T00:00:00Z", "<urn:r3>", null, "sha1:ZZZ"),
      // both pointers present: the explicit record id wins over the digest
      ("revisit", "https://r/d", "2024-02-04T00:00:00Z", "<urn:r4>", "<urn:1>", "sha1:BBB")
    ).toDF("warc_type", "target_uri", "warc_date", "record_id",
      "refers_to", "payload_digest")
    val got = CrawlPipeline.resolveRevisits(records).collect()
      .map(r => r.getAs[String]("url") -> ((
        Option(r.getAs[String]("original_id")),
        Option(r.getAs[String]("original_uri")),
        Option(r.getAs[String]("matched_by"))))).toMap
    assert(got.size === 4)
    assert(got("https://r/a") === ((Some("<urn:3>"), Some("https://o/3"), Some("refers_to"))))
    assert(got("https://r/b") === ((Some("<urn:2>"), Some("https://o/2"), Some("digest"))))
    assert(got("https://r/c") === ((None, None, None))) // dangling: data, not an error
    assert(got("https://r/d") === ((Some("<urn:1>"), Some("https://o/1"), Some("refers_to"))))
    // and the reader surfaces the revisit headers from a real archive
    val out = tmp()
    WarcGzip.writeGzip(Seq(1).toDF("i").select(Warc.formatRevisit(
      lit("https://m/x"), lit("2024-02-01T00:00:00Z"),
      lit("<urn:orig>"), lit("https://o/x"), lit("sha1:QQQ")).as("rec")),
      s"$out/gz")
    val row = WarcGzip.read(spark, s"$out/gz")
      .select("warc_type", "refers_to", "payload_digest").head()
    assert((row.getString(0), row.getString(1), row.getString(2)) ===
      (("revisit", "<urn:orig>", "sha1:QQQ")))
    // the LITE reader surfaces them too — resolveRevisits composes with
    // either reader's frame
    Seq(1).toDF("i").select(Warc.formatRevisit(
      lit("https://m/x"), lit("2024-02-01T00:00:00Z"),
      lit("<urn:orig>"), lit("https://o/x"), lit("sha1:QQQ")).as("value"))
      .write.mode("overwrite").text(s"$out/lite")
    val lite = Warc.read(spark, s"$out/lite")
      .select("warc_type", "refers_to", "payload_digest").head()
    assert((lite.getString(0), lite.getString(1), lite.getString(2)) ===
      (("revisit", "<urn:orig>", "sha1:QQQ")))
  }

  test("zipnum randomized ranges: lookup/lookupRange ≡ full-scan filter on adversarial keys") {
    import graft.sources.Cdx
    val rnd = new scala.util.Random(4242)
    val out = tmp()
    // adversarial key population: shared prefixes, keys that are prefixes
    // of other keys, duplicate keys with distinct timestamps
    val alphabet = "abz,)/.0"
    def key(): String = "k" + (1 to (1 + rnd.nextInt(6)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val keys = Vector.fill(2500)(key())
    val lines = keys.zipWithIndex.map { case (k, i) =>
      val ts = f"2024010100${i % 60}%02d00"
      s"""$k $ts {"url": "https://x/$i", "filename": "f.warc.gz", "offset": "$i", "length": "10"}"""
    }
    Cdx.writeZipnum(lines.toDF("value"), s"$out/zip", blockLines = 7)
    val full = Cdx.read(spark, s"$out/zip/cdx-*.gz").select("urlkey", "url")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(full.size === 2500)
    def rangeRows(from: String, until: String) =
      Cdx.lookupRange(spark, s"$out/zip", from, until).select("urlkey", "url")
        .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    // bounds drawn from the population itself plus boundary mutations —
    // exact keys, key+" " (tightest possible upper), truncations
    def bound(): String = {
      val k = keys(rnd.nextInt(keys.length))
      rnd.nextInt(4) match {
        case 0 => k
        case 1 => k + " "
        case 2 => k.take(1 + rnd.nextInt(k.length))
        case _ => key()
      }
    }
    for (_ <- 1 to 18) {
      val (a, b) = (bound(), bound())
      if (a != b) {
        val (from, until) = if (a < b) (a, b) else (b, a)
        assert(rangeRows(from, until) ===
          full.filter { case (k, _) => k >= from && k < until },
          s"range [$from, $until)")
      }
    }
    for (_ <- 1 to 8) {
      val pfx = bound()
      assert(Cdx.lookup(spark, s"$out/zip", pfx).select("urlkey", "url")
        .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq ===
        full.filter(_._1.startsWith(pfx)), s"prefix $pfx")
    }
  }

  test("gzip read agrees with the uncompressed lite reader on marker-safe corpora") {
    // same synthesized records through BOTH paths: the lite text-split
    // reader over plain files and the member scanner over gzip — identical
    // (id, type, status, ctype, body) rows
    val docs = (1 to 120).map(i => (i, s"doc body $i\nsecond line")).toDF("i", "body")
    val recs = docs.select(Warc.formatResponse(
      concat(lit("https://x/"), col("i")), lit("2024-01-01T00:00:00Z"),
      lit("text/html"), col("body")).as("rec"))
    val out = tmp()
    recs.coalesce(2).write.mode("overwrite").text(s"$out/plain")
    WarcGzip.writeGzip(recs.repartition(3), s"$out/gz")
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(regexp_extract(col("target_uri"), "/(\\d+)$", 1).cast("int").as("i"),
        col("warc_type"), col("http_status"), col("content_type"), col("body"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2),
        r.getString(3), r.getString(4))).sortBy(_._1).toSeq
    assert(shape(WarcGzip.read(spark, s"$out/gz"))
      === shape(Warc.read(spark, s"$out/plain")))
  }
}
