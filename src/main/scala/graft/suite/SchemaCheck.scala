package graft.suite

import graft.tableio.TableIO
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema validation against a committed baseline schema — the "schema"
  * half of the schema + constraint engine (reference: DESIGN.md:317-326
  * "Schema Registry … schema evolution management, data compatibility
  * validation" and "Schema validation" as the first data-quality
  * technique; "Schema violations" is a monitored metric, DESIGN.md:600).
  *
  * Purely metadata: the diff reads two `StructType`s — at 10^12 rows the
  * check costs exactly what it costs at 10^2, because the input schema
  * comes from the table's footers/catalog, never a scan. That also makes
  * it the natural PRE-FLIGHT gate: a batch whose schema drifted gets its
  * verdict row before any content pass is paid.
  *
  * Issue kinds (column-order-insensitive — reordering is not drift):
  *  - `missing_column`      baseline column absent from the batch
  *  - `new_column`          batch column the baseline never had
  *  - `type_changed`        same name, different type (nested types
  *                          compared structurally and nullability-blind,
  *                          i.e. nullability *inside* nested types is not a
  *                          type change — it is reported by the dedicated
  *                          kind below for top-level fields)
  *  - `nullability_relaxed` baseline says non-null, batch says nullable —
  *                          readers relying on the contract would break.
  *                          The opposite direction (tightening) is silent:
  *                          every nullable-schema reader accepts it.
  *
  * Baseline lifecycle mirrors the suite's artifact snapshot (T7/S14/S15):
  * the FIRST run pins the observed input schema to the audit dir (commit
  * manifest, atomic rename, version-stamped); later runs diff against the
  * reload. A version-gate rejection re-pins the current schema rather than
  * mis-parsing an old wire format. Re-pointing the baseline = delete the
  * manifest (the T8 `--baseline` analog).
  */
object SchemaCheck {

  /** One schema drift finding. `baseline`/`current` are catalogStrings
    * ("-" when the side has no such column).
    */
  final case class SchemaIssue(column: String, issue: String,
                               baseline: String, current: String)

  /** Order-insensitive diff of `current` against `baseline`; deterministic
    * output order (column asc, issue asc). Duplicate column NAMES in either
    * schema (legal in Spark, always a mistake in a contract) are reported
    * as a `duplicate_column` issue on the offending side instead of being
    * silently last-wins merged.
    */
  def diff(baseline: StructType, current: StructType): Seq[SchemaIssue] = {
    def dups(s: StructType, side: String) = s.fields.groupBy(_.name.toLowerCase)
      .collect { case (_, fs) if fs.length > 1 =>
        SchemaIssue(fs.head.name, "duplicate_column",
          if (side == "baseline") s"${fs.length} fields" else "-",
          if (side == "current") s"${fs.length} fields" else "-")
      }.toSeq
    val b = baseline.fields.map(f => f.name -> f).toMap
    val c = current.fields.map(f => f.name -> f).toMap
    val missing = (b.keySet -- c.keySet).toSeq.map(n =>
      SchemaIssue(n, "missing_column", b(n).dataType.catalogString, "-"))
    val fresh = (c.keySet -- b.keySet).toSeq.map(n =>
      SchemaIssue(n, "new_column", "-", c(n).dataType.catalogString))
    val common = (b.keySet intersect c.keySet).toSeq
    // catalogString is nullability-blind at every nesting level — exactly
    // the "same type" relation the doc above promises (DataType.sameType
    // is private[sql])
    def sameType(x: DataType, y: DataType) = x.catalogString == y.catalogString
    val retyped = common.filterNot(n => sameType(b(n).dataType, c(n).dataType))
      .map(n => SchemaIssue(n, "type_changed",
        b(n).dataType.catalogString, c(n).dataType.catalogString))
    val relaxed = common
      .filter(n => sameType(b(n).dataType, c(n).dataType))
      .filter(n => !b(n).nullable && c(n).nullable)
      .map(n => SchemaIssue(n, "nullability_relaxed", "NOT NULL", "NULL"))
    (dups(baseline, "baseline") ++ dups(current, "current") ++
      missing ++ fresh ++ retyped ++ relaxed)
      .sortBy(i => (i.column, i.issue))
  }

  // -------------------------------------------------- committed baseline

  private val Table = "schema_baseline"
  private val Part = 0L

  /** First-scan pin: record `schema` as the committed baseline (atomic
    * manifest, version-stamped). The StructType JSON is Spark's public
    * stable wire format (`StructType.fromJson` round-trips it).
    */
  def pin(io: TableIO, schema: StructType): Unit =
    io.commit(Table, Part,
      s"""{"suite":"${SuiteConfig.SuiteVersion}","schema":${schema.json}}""")

  /** The committed baseline schema, if one exists AND was written by this
    * suite version (an old wire format is ignored, not mis-parsed — the
    * caller re-pins, the S15 recovery).
    */
  def committed(io: TableIO): Option[StructType] =
    io.commitMeta(Table, Part)
      .filter(_.contains(s""""suite":"${SuiteConfig.SuiteVersion}""""))
      .flatMap { meta =>
        val k = meta.indexOf(""""schema":""")
        if (k < 0) None
        else scala.util.Try(DataType.fromJson(
          meta.substring(k + 9, meta.length - 1)).asInstanceOf[StructType]).toOption
      }

  /** Pre-flight check for a run: diff the input schema against the
    * committed baseline, pinning it first-scan when absent (or when the
    * version gate rejected the stored one). Returns the issues (empty on
    * the pinning run by construction).
    */
  def preflight(io: TableIO, current: StructType): Seq[SchemaIssue] =
    committed(io) match {
      case Some(base) => diff(base, current)
      case None => pin(io, current); Seq.empty
    }
}
