package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

/** [[Text.piiScrub]] + the q72 audit query.
  *
  * The per-type patterns are claimed DISJOINT on the same text (scaladoc) —
  * that claim is what makes the audit counts order-independent, so it is
  * asserted here, alongside redaction correctness on known strings,
  * idempotence, and the q72 end-to-end invariant that NOTHING matchable
  * survives in the cleaned column.
  */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(s: String): String =
    Seq(s).toDF("t").select(Text.piiScrub(col("t"))).head().getString(0)

  private def countOne(s: String, pattern: String): Long =
    Seq(s).toDF("t").select(Text.matchCount(col("t"), pattern)).head().getLong(0)

  test("redacts each PII type with its own token") {
    assert(scrubOne("Mail a.b+x@corp.example from 10.1.2.3 ssn 123-45-6789 tel 800-555-1234") ==
      "mail <email> from <ip> ssn <ssn> tel <phone>")
  }

  test("patterns are pairwise disjoint on each other's shapes") {
    // phone-shaped run is NOT an ssn and vice versa; neither matches an IP
    assert(countOne("800-555-1234", Text.SsnPattern) == 0)
    assert(countOne("123-45-6789", Text.PhonePattern) == 0)
    assert(countOne("10.1.2.3", Text.SsnPattern) == 0)
    assert(countOne("10.1.2.3", Text.PhonePattern) == 0)
    assert(countOne("123-45-6789 800-555-1234", Text.Ipv4Pattern) == 0)
  }

  test("scrub is idempotent: replacement tokens are never re-matched") {
    val once = scrubOne("a@b.co 1.2.3.4 111-22-3333 222-333-4444 and a@b.co again")
    assert(scrubOne(once) == once)
  }

  test("q72: cleaned text carries no residual matches; counts follow the injection rule") {
    val out = SparkEntry.queries("q72_pii_scrub")(spark, "/root/testdata/sf0.001")
    val residual = out.select(
      Text.matchCount(col("clean"), Text.EmailPattern).as("e"),
      Text.matchCount(col("clean"), Text.Ipv4Pattern).as("i"),
      Text.matchCount(col("clean"), Text.SsnPattern).as("s"),
      Text.matchCount(col("clean"), Text.PhonePattern).as("p"))
      .agg(sum(col("e") + col("i") + col("s") + col("p"))).head().getLong(0)
    assert(residual == 0, s"$residual PII matches survived the scrub")
    out.collect().foreach { r =>
      val key = r.getLong(0)
      assert(r.getAs[Long]("n_email") == (if (key % 3 == 0) 2L else 1L))
      assert(r.getAs[Long]("n_ip") == 1L)
      assert(r.getAs[Long]("n_ssn") == 1L)
      assert(r.getAs[Long]("n_phone") == (if (key % 2 == 0) 1L else 0L))
    }
  }
}
