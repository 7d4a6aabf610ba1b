package graft

import org.apache.spark.sql.functions._
import graft.functions.F

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("parseHubTs: ISO-millis, ISO-seconds, epoch-millis, garbage") {
    val df = Seq(
      ("2024-03-04T05:06:07.890Z", "iso_ms"),
      ("2024-03-04T05:06:07Z", "iso_s"),
      ("1709528767890", "epoch"),
      ("not-a-date", "garbage")
    ).toDF("raw", "kind")
      .withColumn("parsed", F.parseHubTs($"raw"))
    val out = df.collect().map(r => r.getString(1) -> Option(r.getTimestamp(2))).toMap
    assert(out("iso_ms").get.toString === "2024-03-04 05:06:07.89")
    assert(out("iso_s").get.toString === "2024-03-04 05:06:07.0")
    assert(out("epoch").get.getTime === 1709528767890L)
    assert(out("garbage").isEmpty)
  }

  test("dedupList preserves first-occurrence order (D3)") {
    val out = Seq("b,a,b,c,a").toDF("s")
      .select(F.dedupList($"s")).as[String].head()
    assert(out === "b,a,c") // reference: sorted(set(x), key=x.index)
  }

  test("listContains is null-safe false (F16)") {
    val out = Seq(("a,b,c", "b"), (null, "b"), ("a,c", "b"))
      .toDF("lst", "item")
      .select(F.listContains($"lst", $"item")).as[Boolean].collect()
    assert(out.toSeq === Seq(true, false, false))
  }

  test("listAppend yields bare item on null list (F17)") {
    val out = Seq(("x", "a,b"), ("x", null))
      .toDF("item", "lst")
      .select(F.listAppend($"item", $"lst")).as[String].collect()
    assert(out.toSeq === Seq("x,a,b", "x"))
  }

  test("boolRecode maps '1'/'0'/other to true/false/null (F13)") {
    val out = Seq("1", "0", "x").toDF("s")
      .select(F.boolRecode($"s")).collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    assert(out.toSeq === Seq(Some(true), Some(false), None))
  }

  test("nullSentinel normalizes the sentinel to NULL (P11)") {
    val out = Seq("null", "x").toDF("s")
      .select(F.nullSentinel($"s")).collect().map(r => Option(r.getString(0)))
    assert(out.toSeq === Seq(None, Some("x")))
  }

  test("surrogateKey is md5 of pipe-joined parts (F8)") {
    val out = Seq(("1", "contains", "2")).toDF("f", "t", "p")
      .select(F.surrogateKey($"f", $"t", $"p")).as[String].head()
    assert(out === org.apache.commons.codec.digest.DigestUtils.md5Hex("1|contains|2"))
  }

  test("redactPii replaces emails and long digit runs; matchCount agrees (q62)") {
    // the documents fixture contains no PII-shaped strings, so the
    // redaction semantics are pinned here on synthetic text — including
    // the non-email '@' case and the 5-digit (too short) run
    val rows = Seq(
      ("mail a@b.com and c@d.org please", 2L, 0L, "mail <EMAIL> and <EMAIL> please"),
      ("x@y_zz is not an email", 0L, 0L, "x@y_zz is not an email"),
      ("card 1234567890 pin 12345", 0L, 1L, "card <NUM> pin 12345"),
      ("a@b.co 999999", 1L, 1L, "<EMAIL> <NUM>"),
      ("clean text", 0L, 0L, "clean text"))
    val out = rows.map(_._1).toDF("text")
      .select(
        F.matchCount($"text", F.emailRe).as("e"),
        F.matchCount($"text", F.longNumRe).as("n"),
        F.redactPii($"text").as("clean"))
      .collect()
    rows.zip(out).foreach { case ((txt, e, n, clean), r) =>
      assert(r.getLong(0) === e, s"email count for '$txt'")
      assert(r.getLong(1) === n, s"num count for '$txt'")
      assert(r.getString(2) === clean, s"redaction for '$txt'")
    }
  }
}
