package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.io.CorpusJsonl

class CorpusJsonlSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("jsonl read: typed accept, defaulted labels, reasoned quarantine") {
    val dir = Files.createTempDirectory("jsonl").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "corpus.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("""{"doc_id":1,"source":"web","lang":"en","text":"hello world"}""")
    w.println("""{"doc_id":2,"text":"unlabeled but usable"}""")
    w.println("""{"doc_id":3,"source":"web","lang":"en"}""")
    w.println("""{this is not json at all""")
    w.println("""{"doc_id":"xyz","text":"id of the wrong type"}""")
    w.close()
    val (good, bad) = CorpusJsonl.readQuarantine(spark, f.getAbsolutePath)
    val g = good.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2), r.getString(3))).sortBy(_._1)
    assert(g.length == 2, s"accepted: ${g.mkString(",")}")
    assert(g(0) == (1L, "web", "en", "hello world"))
    // absent labels default; absent id/text never do
    assert(g(1) == (2L, "unknown", "und", "unlabeled but usable"))
    val b = bad.collect().map(r => (r.getString(0), r.getString(1)))
    assert(b.length == 3, s"quarantined: ${b.mkString(",")}")
    assert(b.count(_._2 == "missing_field") == 1,
      s"doc 3 should quarantine as missing_field: ${b.mkString(",")}")
    assert(b.count(_._2 == "unparseable") == 2,
      s"raw junk + type mismatch should be unparseable: ${b.mkString(",")}")
    // the dead letter always preserves evidence
    assert(b.forall { case (raw, _) => raw != null && raw.nonEmpty })
    assert(b.exists(_._1.contains("not json")),
      "the malformed raw line must survive verbatim")
    // accepted + quarantined = input lines: nothing silently dropped
    assert(g.length + b.length == 5)
  }

  test("jsonl stream: arriving dumps split through the same fork") {
    val sp = spark
    val dir = Files.createTempDirectory("jsonl_stream").toFile
    dir.deleteOnExit()
    def dump(name: String, lines: String*): Unit = {
      val tmp = new java.io.File(dir, name + ".tmp")
      val w = new java.io.PrintWriter(tmp, "UTF-8")
      lines.foreach(w.println)
      w.close()
      // atomic rename: the file source must never see a half-written dump
      tmp.renameTo(new java.io.File(dir, name))
    }
    dump("d1.jsonl",
      """{"doc_id":10,"source":"web","lang":"en","text":"first dump"}""",
      """{broken""")
    val (good, bad) = graft.io.CorpusJsonl.readStreamQuarantine(
      sp, dir.getAbsolutePath)
    val qg = good.writeStream.format("memory").queryName("jsonl_good")
      .outputMode("append").start()
    val qb = bad.writeStream.format("memory").queryName("jsonl_bad")
      .outputMode("append").start()
    qg.processAllAvailable(); qb.processAllAvailable()
    assert(sp.table("jsonl_good").count() == 1)
    assert(sp.table("jsonl_bad").count() == 1)
    // a later dump lands in a later micro-batch
    dump("d2.jsonl",
      """{"doc_id":11,"text":"second dump"}""",
      """{"doc_id":12,"source":"web"}""")
    qg.processAllAvailable(); qb.processAllAvailable()
    qg.stop(); qb.stop()
    val g = sp.sql("SELECT doc_id, source, lang FROM jsonl_good ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(g.toSeq == Seq((10L, "web", "en"), (11L, "unknown", "und")),
      s"accepted: ${g.mkString(",")}")
    val reasons = sp.sql("SELECT reason FROM jsonl_bad").collect()
      .map(_.getString(0)).sorted
    assert(reasons.toSeq == Seq("missing_field", "unparseable"),
      s"quarantined: ${reasons.mkString(",")}")
  }

  test("jsonl export: round-trips the corpus and is layout-deterministic") {
    val sp = TestSpark.spark
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_jsonl_out")
    val d1 = root.resolve("a").toString
    val d2 = root.resolve("b").toString
    val docs = graft.io.Tables.documents(sp, TestSpark.sf)
      .select("doc_id", "source", "lang", "text")
    graft.io.CorpusJsonl.writeShards(docs, d1)
    // round-trip through the reader: every document survives with its
    // exact text, nothing quarantined (the writer escapes correctly)
    val (good, bad) = graft.io.CorpusJsonl.readQuarantine(sp, d1)
    assert(bad.isEmpty, s"export must re-read clean: ${bad.count()} bad")
    val back = good.select("doc_id", "source", "lang", "text")
      .collect().map(_.toSeq).toSet
    assert(back == docs.collect().map(_.toSeq).toSet)
    // determinism: a second export from a differently-partitioned input
    // produces byte-identical shard contents (same rows per shard in
    // the same order)
    graft.io.CorpusJsonl.writeShards(docs.repartition(13), d2)
    def shardLines(dir: String): Seq[Seq[String]] =
      new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".json")).sortBy(_.getName)
        .map(f => java.nio.file.Files.readAllLines(f.toPath)
          .toArray.toSeq.map(_.toString)).toSeq
    assert(shardLines(d1) == shardLines(d2),
      "re-export must be layout-deterministic")
  }
}
