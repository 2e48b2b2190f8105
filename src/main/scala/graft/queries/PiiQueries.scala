package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pii.Masking

/** PII governance surface (SURVEY.md §2.11 G10-G14) as declared queries.
  * The card-shaped PII stand-in is the 9-digit suffix of c_name
  * (testdata has no phone/card column); mask semantics follow
  * A4:980-1026 exactly.
  */
object PiiQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def digits = substring(col("c_name"), 10, 9)

  /** G10 PII classification registry (A4:950-970). */
  def p01PiiRegistry(s: SparkSession, dir: String): DataFrame =
    Masking.piiRegistry(s).orderBy("table_name", "column_name")

  /** G11 auditor masked view (A4:988): sha2 prefix + clear last-4. */
  def p02MaskAuditor(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"), Masking.maskPanAuditor(digits).as("masked"))
      .orderBy("c_custkey").limit(100)

  /** G11 analyst masked view (A4:983): regex mask, last-4 only. */
  def p03MaskAnalyst(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"), Masking.maskPanAnalyst(digits).as("masked"))
      .orderBy("c_custkey").limit(100)

  /** G12 role-dependent policy, all four roles side by side
    * (A4:1019-1026). */
  def p04MaskRoles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"),
        Masking.maskPan(digits, "admin").as("as_admin"),
        Masking.maskPan(digits, "auditor").as("as_auditor"),
        Masking.maskPan(digits, "analyst").as("as_analyst"),
        Masking.maskPan(digits, "intern").as("as_other"))
      .orderBy("c_custkey").limit(100)

  /** G13 retention window (A4:1028-1035): rows kept by the 90-day policy
    * at an explicit as-of instant. */
  def p05Retention(s: SparkSession, dir: String): DataFrame =
    Masking.retentionKeep(t(s, dir, "events"), "ts",
        lit("2024-06-01 00:00:00").cast("timestamp"), days = 90)
      .agg(count(lit(1)).as("kept"))

  /** G14 anonymization snapshot (A4:1038-1067): surrogate key + bucketed
    * quasi-identifier, PII column dropped. */
  def p06Anonymize(s: SparkSession, dir: String): DataFrame =
    Masking.anonymize(
        t(s, dir, "customer").select("c_custkey", "c_nationkey", "c_mktsegment"),
        keyCols = Seq("c_custkey"),
        bucketCols = Map("c_nationkey" -> 10))
      .orderBy("c_custkey_sk").limit(100)

  private val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  private def ticket = concat(
    lit("Reach me at "),
    lower(regexp_replace(col("c_name"), "#", "")), lit("@example.com"),
    when(col("c_custkey") % 3 === 0,
      concat(lit(" or 555-"), substring(col("c_name"), 12, 3), lit("-"),
        substring(col("c_name"), 15, 4))).otherwise(lit("")),
    lit(" about my order"))

  /** Free-text PII scrub — the unstructured-text redaction pass of a
    * training-corpus/log pipeline: regex-replace emails and phone-shaped
    * spans with typed placeholders, and count the hits per row. The
    * driver corpus embeds no PII, so the ticket text is synthesized
    * deterministically from customer rows (the m04 constructed-fixture
    * pattern); both engines build and scrub the identical string with
    * the same regexes. Pure codegen'd projection — at 100 TB this runs
    * at scan speed with zero shuffle. */
  def p07TextScrub(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"), ticket.as("txt"))
      .select(col("c_custkey"),
        regexp_replace(regexp_replace(col("txt"), emailRe, "[EMAIL]"),
          phoneRe, "[PHONE]").as("scrubbed"),
        (regexp_count(col("txt"), lit(emailRe)) +
          regexp_count(col("txt"), lit(phoneRe))).cast("long").as("n_pii"))
      .orderBy("c_custkey").limit(100)

  /** Laplace-mechanism noisy release ([[Masking.dpNoisyCounts]]):
    * per-segment customer counts with seeded Laplace(1/ε) noise at
    * ε = 1 — the privacy-preserving aggregate-release mechanism,
    * deterministically replayable (see the operator doc for why a real
    * release swaps the seed source). */
  def p08DpCounts(s: SparkSession, dir: String): DataFrame =
    Masking.dpNoisyCounts(t(s, dir, "customer"), "c_mktsegment",
        epsilon = 1.0, seedTag = "p08")
      .orderBy("c_mktsegment")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p08_dp_counts" -> p08DpCounts,
    "p01_pii_registry" -> p01PiiRegistry,
    "p02_mask_auditor" -> p02MaskAuditor,
    "p03_mask_analyst" -> p03MaskAnalyst,
    "p04_mask_roles" -> p04MaskRoles,
    "p05_retention" -> p05Retention,
    "p06_anonymize" -> p06Anonymize,
    "p07_text_scrub" -> p07TextScrub,
  )

  private val regSql = Masking.piiClassification
    .map { case (t, c, cat, s) => s"('$t','$c','$cat','$s')" }
    .mkString(", ")

  private val dpDigits = (1 to 6).map(i =>
    s"(strpos('0123456789abcdef', substr(md5('p08|' || c_mktsegment), $i, 1)) - 1) * ${math.pow(16, 6 - i).toLong}")
    .mkString("(", " + ", ")")

  val oracles: Map[String, String] = Map(
    "p08_dp_counts" ->
      (s"""WITH g AS (SELECT c_mktsegment, count(*) AS n FROM customer GROUP BY 1),
         |u AS (SELECT c_mktsegment, n,
         |  ($dpDigits + 0.5) / 16777216.0 AS u FROM g)
         |SELECT c_mktsegment,
         |  ROUND(n + CASE WHEN u < 0.5 THEN ln(u * 2.0)
         |                 ELSE -ln((1.0 - u) * 2.0) END, 4) AS noisy_n
         |FROM u ORDER BY c_mktsegment""".stripMargin),
    "p01_pii_registry" ->
      (s"SELECT * FROM (VALUES $regSql) AS t(table_name, column_name, category, sensitivity) " +
        "ORDER BY table_name, column_name"),
    "p02_mask_auditor" ->
      ("SELECT c_custkey, substring(sha256(substring(c_name,10,9)),1,12) || '...' || right(substring(c_name,10,9),4) AS masked " +
        "FROM customer ORDER BY c_custkey LIMIT 100"),
    "p03_mask_analyst" ->
      ("SELECT c_custkey, regexp_replace(substring(c_name,10,9), '^([0-9]{0,15})([0-9]{4})$', '***************\\2') AS masked " +
        "FROM customer ORDER BY c_custkey LIMIT 100"),
    "p04_mask_roles" ->
      ("SELECT c_custkey, substring(c_name,10,9) AS as_admin, " +
        "substring(sha256(substring(c_name,10,9)),1,12) || '...' || right(substring(c_name,10,9),4) AS as_auditor, " +
        "regexp_replace(substring(c_name,10,9), '^([0-9]{0,15})([0-9]{4})$', '***************\\2') AS as_analyst, " +
        "'MASKED' AS as_other FROM customer ORDER BY c_custkey LIMIT 100"),
    "p05_retention" ->
      "SELECT COUNT(*) AS kept FROM events WHERE ts >= TIMESTAMP '2024-06-01 00:00:00' - INTERVAL 90 DAY",
    "p06_anonymize" ->
      ("SELECT substring(sha256(CAST(c_custkey AS VARCHAR)),1,12) AS c_custkey_sk, " +
        "abs(c_nationkey) % 10 AS c_nationkey_bucket, c_mktsegment " +
        "FROM customer ORDER BY c_custkey_sk LIMIT 100"),
    "p07_text_scrub" ->
      ("""WITH tk AS (
        |  SELECT c_custkey,
        |    'Reach me at ' || lower(replace(c_name, '#', '')) || '@example.com' ||
        |    CASE WHEN c_custkey % 3 = 0
        |         THEN ' or 555-' || substring(c_name, 12, 3) || '-' || substring(c_name, 15, 4)
        |         ELSE '' END ||
        |    ' about my order' AS txt
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_replace(regexp_replace(txt,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '[EMAIL]', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(txt, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) +
        |       len(regexp_extract_all(txt, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_pii
        |FROM tk ORDER BY c_custkey LIMIT 100""".stripMargin),
  )
}
