package graft.gen

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.zip.GZIPOutputStream

import scala.util.Random

/** Seeded fixture generator producing OCSF-style "Incident Finding" NDJSON
  * with the same structural properties as the reference generator
  * (`/root/reference/generate/findings/main.py:19-218`), written fresh:
  *
  *   - epoch-ms `time` monotonically increasing by 1000/record (ref `:21-22`);
  *   - ISO-8601 `*_dt` strings `yyyy-MM-dd'T'HH:mm:ss.SSS'Z'` (ref `:23`);
  *   - the 5 coercible `_dt` paths of FIXTURES.md §A: `time_dt`,
  *     `metadata.product.my_dt`, `finding_info_list[].created_time_dt`,
  *     `finding_info_list[].first_seen_time_dt`,
  *     `finding_info_list[].related_events[].modified_time_dt`;
  *   - deliberately heterogeneous keys across records and list elements
  *     (ref `:98,:140,:151-154`) so schema inference must union fields;
  *   - nesting to 5 levels (list<struct<... list<struct<...>>>>);
  *   - sorted + shuffled ndjson.gz variants (ref `:220-249`).
  */
object Findings {

  // --- minimal JSON writer -------------------------------------------------

  sealed trait J { def render: String }
  final case class JS(s: String) extends J {
    def render: String =
      "\"" + s.flatMap {
        case '"'          => "\\\""
        case '\\'         => "\\\\"
        case '\n'         => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c            => c.toString
      } + "\""
  }
  final case class JL(n: Long) extends J { def render: String = n.toString }
  final case class JA(xs: Seq[J]) extends J {
    def render: String = xs.map(_.render).mkString("[", ", ", "]")
  }
  final case class JO(fields: Seq[(String, J)]) extends J {
    def render: String =
      fields.map { case (k, v) => JS(k).render + ": " + v.render }.mkString("{", ", ", "}")
  }

  // --- record generation ---------------------------------------------------

  private val isoFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").withZone(ZoneOffset.UTC)

  def iso(epochMs: Long): String = isoFmt.format(Instant.ofEpochMilli(epochMs))

  /** Fixed epoch base (2025-01-01T00:00:00Z) — reference stamps at import
    * time (`generate/findings/main.py:9`); we pin it for determinism.
    */
  val BaseMs: Long = 1735689600000L

  private def uuid(rng: Random): String = {
    val b = Array.fill(16)(rng.nextInt(16))
    f"${b(0)}%x${b(1)}%x${b(2)}%x${b(3)}%x${b(4)}%x${b(5)}%x${b(6)}%x${b(7)}%x-" +
      f"${b(8)}%x${b(9)}%x${b(10)}%x${b(11)}%x-4${b(12)}%x${b(13)}%x${b(14)}%x"
  }

  private val severities = Vector("Informational", "Low", "Medium", "High", "Critical")
  private val statuses = Vector("New", "In Progress", "Suppressed", "Resolved")

  private def technique(rng: Random): J =
    // Two shapes, union of keys {name,uid} vs {one,two} (ref :117-120 vs :151-154).
    if (rng.nextBoolean())
      JO(Seq("name" -> JS(s"Technique ${rng.nextInt(100)}"), "uid" -> JS(f"T1${rng.nextInt(999)}%03d")))
    else
      JO(Seq("one" -> JS(uuid(rng)), "two" -> JS(uuid(rng))))

  private def attack(rng: Random): J = {
    val tactics = JA(Seq.fill(1 + rng.nextInt(2))(
      JO(Seq("name" -> JS(s"Tactic ${rng.nextInt(14)}"), "uid" -> JS(f"TA${rng.nextInt(99)}%02d")))))
    // Three shapes: version:string | version:string | semantic:long (ref :110,:123,:140).
    rng.nextInt(3) match {
      case 2 => JO(Seq("semantic" -> JL(10 + rng.nextInt(5)), "tactics" -> tactics,
        "technique" -> technique(rng)))
      case _ => JO(Seq("version" -> JS(s"1${rng.nextInt(3)}.${rng.nextInt(9)}"),
        "tactics" -> tactics, "technique" -> technique(rng)))
    }
  }

  private def relatedEvent(rng: Random, t: Long): J = {
    val base = Seq(
      "uid" -> JS(uuid(rng)),
      "severity" -> JS(severities(rng.nextInt(severities.size))),
      "type_uid" -> JL(200100 + rng.nextInt(9)),
      "type_name" -> JS(s"Event type ${rng.nextInt(9)}"),
      "severity_id" -> JL(rng.nextInt(5).toLong),
      "created_time" -> JL(t - rng.nextInt(100000)),
      "modified_time_dt" -> JS(iso(t - rng.nextInt(50000))),
      "kill_chain" -> JA(Seq.fill(1 + rng.nextInt(2))(
        JO(Seq("phase" -> JS(s"Phase ${rng.nextInt(7)}"), "phase_id" -> JL(rng.nextInt(7).toLong))))),
      "observables" -> JA(Seq.fill(1 + rng.nextInt(3))(
        JO(Seq("name" -> JS(s"obs_${rng.nextInt(50)}"), "type" -> JS("IP Address"),
          "type_id" -> JL(2))))),
      "attacks" -> JA(Seq.fill(1 + rng.nextInt(3))(attack(rng))))
    // "type" key present only sometimes (ref :98).
    if (rng.nextBoolean()) JO(base :+ ("type" -> JS(s"Type ${rng.nextInt(4)}"))) else JO(base)
  }

  private def analytic(rng: Random, depth: Int): J = {
    val base = Seq(
      "name" -> JS(s"Analytic ${rng.nextInt(30)}"),
      "type" -> JS("Rule"),
      "version" -> JS(s"${1 + rng.nextInt(3)}.${rng.nextInt(9)}"),
      "uid" -> JS(uuid(rng)),
      "type_id" -> JL(1))
    if (depth > 0 && rng.nextBoolean())
      JO(base :+ ("related_analytics" -> JA(Seq.fill(1 + rng.nextInt(2))(analytic(rng, depth - 1)))))
    else JO(base)
  }

  private def findingInfo(rng: Random, t: Long): J = {
    val common = Seq(
      "title" -> JS(s"Finding ${rng.nextInt(1000)}"),
      "uid" -> JS(uuid(rng)),
      "product_uid" -> JS(uuid(rng)),
      "related_events_count" -> JL(1 + rng.nextInt(4)),
      "created_time_dt" -> JS(iso(t - rng.nextInt(200000))),
      "analytic" -> analytic(rng, 1),
      "related_events" -> JA(Seq.fill(1 + rng.nextInt(3))(relatedEvent(rng, t))))
    // Second shape adds first_seen/last_seen keys (union of 2 shapes, ref :78-203).
    if (rng.nextBoolean())
      JO(common ++ Seq(
        "first_seen_time_dt" -> JS(iso(t - rng.nextInt(400000))),
        "last_seen_time" -> JL(t - rng.nextInt(10000))))
    else JO(common)
  }

  /** One finding record; `time = BaseMs + index*1000`. */
  def record(index: Int, seed: Long = 42L): J = {
    val rng = new Random(seed ^ (index.toLong * 0x9e3779b97f4a7c15L))
    val t = BaseMs + index.toLong * 1000L
    JO(Seq(
      "message" -> JS(s"Incident finding ${rng.nextInt(10000)}"),
      "priority" -> JS(severities(rng.nextInt(severities.size))),
      "priority_id" -> JL(rng.nextInt(5).toLong),
      "status" -> JS(statuses(rng.nextInt(statuses.size))),
      "status_id" -> JL(rng.nextInt(4).toLong),
      "status_code" -> JS(f"ST${rng.nextInt(99)}%02d"),
      "status_detail" -> JS(s"detail ${rng.nextInt(100)}"),
      "time" -> JL(t),
      "time_dt" -> JS(iso(t)),
      "desc" -> JS(s"Synthetic incident record ${index}"),
      "severity" -> JS(severities(rng.nextInt(severities.size))),
      "severity_id" -> JL(rng.nextInt(5).toLong),
      "duration" -> JL(rng.nextInt(3600000).toLong),
      "type_uid" -> JL(200401),
      "type_name" -> JS("Incident Finding: Update"),
      "impact" -> JS(severities(rng.nextInt(severities.size))),
      "impact_id" -> JL(rng.nextInt(5).toLong),
      "impact_score" -> JL(rng.nextInt(100).toLong),
      "verdict" -> JS(if (rng.nextBoolean()) "True Positive" else "Benign"),
      "verdict_id" -> JL(rng.nextInt(3).toLong),
      "activity_id" -> JL(2),
      "activity_name" -> JS("Update"),
      "category_name" -> JS("Findings"),
      "category_uid" -> JL(2),
      "class_name" -> JS("Incident Finding"),
      "class_uid" -> JL(2005),
      "confidence" -> JS("High"),
      "confidence_id" -> JL(3),
      "timezone_offset" -> JL(0),
      "src_url" -> JS(s"https://console.example.com/findings/${uuid(rng)}"),
      "metadata" -> JO(Seq(
        "version" -> JS("1.1.0"),
        "product" -> JO(Seq(
          "name" -> JS("Synthetic Security Product"),
          "version" -> JS(s"${1 + rng.nextInt(4)}.${rng.nextInt(9)}"),
          "uid" -> JS(uuid(rng)),
          "vendor_name" -> JS("Example Corp"),
          "my_dt" -> JS(iso(t - rng.nextInt(1000000))))),
        "profiles" -> JA(Seq(JS("datetime"))),
        "log_name" -> JS("findings"),
        "log_provider" -> JS("synthetic"),
        "original_time" -> JS(iso(t)),
        "tenant_uid" -> JS(uuid(rng)),
        "logged_time" -> JL(t + rng.nextInt(5000)))),
      "finding_info_list" -> JA(Seq.fill(1 + rng.nextInt(3))(findingInfo(rng, t)))))
  }

  private def writeGz(path: String, lines: Iterator[String]): Unit = {
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(path)), StandardCharsets.UTF_8), 1 << 20)
    try lines.foreach { l => w.write(l); w.write('\n') }
    finally w.close()
  }

  /** Write `<dir>/finding-sorted.ndjson.gz` and `<dir>/finding-unsorted.ndjson.gz`. */
  def writeFixtures(dir: String, n: Int = 1000, seed: Long = 42L): (String, String) = {
    new java.io.File(dir).mkdirs()
    val sortedPath = s"$dir/finding-sorted.ndjson.gz"
    val unsortedPath = s"$dir/finding-unsorted.ndjson.gz"
    writeGz(sortedPath, Iterator.range(0, n).map(i => record(i, seed).render))
    val shuffled = new Random(seed).shuffle(Vector.range(0, n))
    writeGz(unsortedPath, shuffled.iterator.map(i => record(i, seed).render))
    (sortedPath, unsortedPath)
  }
}
