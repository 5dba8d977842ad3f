package graft.tableio

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Bucket-co-located committed store — the layout answer to the one shuffle
  * the seen-set anti-join family still paid per batch.
  *
  * [[graft.dedup.Dedup.newOnlyBloom]] shrinks the JOIN INPUT (filter misses
  * skip the join entirely), but the rows that do enter the exact anti-join
  * still hash-shuffle the CORPUS side on every batch: at a 10^12-row seen
  * set, re-partitioning the corpus is the whole job, repeated daily for a
  * batch that is 10^-4 of its size. Bucketing moves that shuffle to WRITE
  * time, once: the store is a bucketed + per-bucket-sorted datasource table
  * (Spark's bucket id = `pmod(murmur3(keys), n)` — the same function
  * `repartition(n, keys)` uses), so every later join/distinct/groupBy on
  * the bucket keys reads the corpus already hash-partitioned. The executed
  * plan carries exactly ONE Exchange — the incoming batch, shuffled to the
  * corpus's bucket count — and the corpus-side `distinct()` collapses into
  * the scan's partitioning with no Exchange at all (both law-tested in
  * BucketedSpec against the 2-Exchange plain-parquet control).
  *
  * Catalog lifecycle: bucket metadata lives in the session catalog, not the
  * files, so a fresh session re-registers the table over the committed
  * location from the version-stamped `_bucket_meta.json` manifest
  * ([[open]] issues `CREATE TABLE ... CLUSTERED BY ... LOCATION ...`; the
  * table is external — dropping the catalog entry never touches data).
  * The manifest is written LAST via atomic rename (the [[TableIO]] commit
  * pattern), and version-gated on reload like every persisted artifact
  * (SURVEY.md S14/S15): a wire-format change bumps [[Version]] and an old
  * store refuses to open rather than mis-parse.
  *
  * Appends ([[append]]) ride Spark's bucketed writer, which validates the
  * spec against the existing table — each append adds one file per bucket,
  * so reads stay co-located; periodic compaction (re-[[commit]]) restores
  * the one-file-per-bucket layout. The per-bucket `sortBy` buys parquet
  * row-group locality on the key, NOT sort-merge-join sort elimination:
  * since SPARK-28595 the scan does not report output ordering (verified
  * here — the SMJ keeps both Sort nodes), so the win this store claims,
  * and the one BucketedSpec pins, is Exchange elimination only.
  *
  * An Iceberg binding at deploy replaces this with a bucket-transform
  * partition spec + storage-partitioned joins; the engine-facing contract
  * (commit / open / append, keys + bucket count) is unchanged.
  */
object Bucketed {
  /** Wire-format version of the store layout + manifest. */
  val Version = "graft-bucketed-1"

  final case class Meta(version: String, keys: Seq[String], buckets: Int)

  private def metaPath(dir: String) = Paths.get(dir, "_bucket_meta.json")

  private def renderMeta(m: Meta): String =
    s"""{"version":"${m.version}","keys":[${m.keys.map(k => s""""$k"""").mkString(",")}],"buckets":${m.buckets}}"""

  private val MetaRe =
    """\{"version":"([^"]+)","keys":\[([^\]]*)\],"buckets":(\d+)\}""".r

  /** The committed manifest, if present (no version check — see [[open]]). */
  def readMeta(dir: String): Option[Meta] = {
    val p = metaPath(dir)
    if (!Files.isRegularFile(p)) None
    else Files.readString(p).trim match {
      case MetaRe(v, ks, b) =>
        Some(Meta(v, ks.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq, b.toInt))
      case _ => None
    }
  }

  /** Write `df` as a committed bucketed store at `dir`, registered in this
    * session's catalog as `name`. One `repartition(buckets, keys)` aligns
    * the write-side partitioning with the bucket function, so each task
    * holds exactly one bucket → one sorted file per bucket. The manifest
    * marker is published last (atomic rename): a killed write leaves no
    * openable store.
    */
  def commit(df: DataFrame, name: String, dir: String,
             keys: Seq[String], buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS ${quoted(name)}")
    Files.deleteIfExists(metaPath(dir))
    df.repartition(buckets, keys.map(col): _*)
      .write.format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", dir)
      .mode(SaveMode.Overwrite)
      .saveAsTable(name)
    Files.createDirectories(Paths.get(dir))
    val tmp = Paths.get(dir, "._bucket_meta.json.tmp")
    Files.writeString(tmp, renderMeta(Meta(Version, keys, buckets)))
    Files.move(tmp, metaPath(dir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Open a committed store, re-registering the catalog entry when this
    * session has none (the fresh-session path). Fails loudly on a missing
    * or version-mismatched manifest — rebuild via [[commit]] is the
    * recovery, mirroring the suite's artifact version gate.
    */
  def open(spark: SparkSession, name: String, dir: String): DataFrame = {
    val meta = readMeta(dir).getOrElse(
      throw new IllegalStateException(
        s"no committed bucketed store at $dir (missing/unparsable _bucket_meta.json)"))
    require(meta.version == Version,
      s"bucketed store at $dir has version ${meta.version}, reader expects $Version — rebuild with Bucketed.commit")
    if (!spark.catalog.tableExists(name)) {
      val schema = spark.read.parquet(dir).schema
      val ks = meta.keys.map(quoted).mkString(", ")
      spark.sql(
        s"""CREATE TABLE ${quoted(name)} (${schema.toDDL})
           |USING PARQUET
           |CLUSTERED BY ($ks) SORTED BY ($ks) INTO ${meta.buckets} BUCKETS
           |LOCATION '$dir'""".stripMargin)
    }
    spark.table(name)
  }

  /** Append a batch to the committed store (bucketing preserved — Spark's
    * writer validates the spec against the registered table). The caller
    * feeds only NEW rows (the [[graft.dedup.Dedup.newOnly]] output), so the
    * store stays key-unique without a rewrite.
    */
  def append(df: DataFrame, name: String, dir: String): Unit = {
    val spark = df.sparkSession
    val meta = readMeta(dir).getOrElse(
      throw new IllegalStateException(s"append to uncommitted bucketed store at $dir"))
    open(spark, name, dir) // ensure the catalog entry exists
    df.repartition(meta.buckets, meta.keys.map(col): _*)
      .write.format("parquet")
      .bucketBy(meta.buckets, meta.keys.head, meta.keys.tail: _*)
      .sortBy(meta.keys.head, meta.keys.tail: _*)
      .mode(SaveMode.Append)
      .saveAsTable(name)
  }

  private def quoted(ident: String): String =
    ident.split('.').map(p => s"`$p`").mkString(".")
}
