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
}
