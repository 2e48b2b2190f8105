package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spark 4 `VariantType` staging — the engine's analog of the
  * reference's semi-structured landing table (`payload VARIANT`,
  * 04_snowflake_complet.md:95-97; SURVEY.md §1.3).
  *
  * Pattern: parse the raw JSON ONCE at the staging boundary
  * (`parse_json` builds the binary variant encoding), keep the variant
  * column in the staged table, and bind typed paths lazily with
  * `variant_get` in downstream views. Versus string + get_json_object,
  * the variant encoding parses each payload once instead of once per
  * path, and `variant_get` path binding is codegen'd over the binary
  * form — the difference between O(paths) and O(1) JSON parses per row
  * at 100 TB.
  */
object Variants {

  /** Stage a raw-JSON string column as a VariantType `payload`. */
  def stage(df: DataFrame, jsonCol: String, as: String = "payload"): DataFrame =
    df.withColumn(as, parse_json(col(jsonCol)))

  /** Typed (shredded) view over a variant column: each (path, sqlType,
    * name) triple becomes one typed column via `variant_get`; the
    * variant column itself is dropped from the view. */
  def typedView(df: DataFrame, variantCol: String,
      fields: Seq[(String, String, String)]): DataFrame = {
    val kept = df.columns.filterNot(_ == variantCol).map(col).toSeq
    val shredded = fields.map { case (path, sqlType, name) =>
      variant_get(col(variantCol), path, sqlType).as(name)
    }
    df.select(kept ++ shredded: _*)
  }
}
