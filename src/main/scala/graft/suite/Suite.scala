package graft.suite

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.drift.DriftMath
import graft.tableio.TableIO

/** One verdict row per (batch, check) — the engine's analog of the
  * reference's per-report entries (validation report DESIGN.md:383-387,
  * drift report DESIGN.md:575-580), flattened for the audit table.
  */
case class Verdict(
    batch_id: Long,
    check: String,
    column: String,
    metric: Double,      // the measured statistic / rate / score
    p_value: Double,     // NaN when the check has no p-value
    threshold: Double,
    passed: Boolean,
    violation_count: Long)

/** Per-batch lineage + metrics row (north rule: "per-partition checkpointed
  * lineage + metrics rows").
  */
case class Lineage(
    batch_id: Long,
    row_count: Long,
    input_fingerprint: String, // order-independent fingerprint of the batch
    suite_version: String,
    baseline_batch: Long,
    wall_ms: Long)

object SuiteConfig {
  val SuiteVersion = "graft-0.4" // 0.4: artifacts/sketches carry freq_repo bytes
  val KsThreshold = 0.05      // DESIGN.md:534
  val PsiThreshold = 0.2
  val ChiSqThreshold = 0.05
  /** Effect-size gate for chi-square: at 10^6+ rows per batch the test has
    * power to reject on hash-level noise (observed: p=0.018 on an undrifted
    * 25k-row batch). Drift fires only when p < threshold AND Cramér's
    * V = sqrt(χ² / (n·(k−1))) ≥ this floor — i.e. the shift is material,
    * not just statistically detectable.
    */
  val CramersVFloor = 0.05
  val UnusualRatioThreshold = 0.10 // sensor.py:175
  val Bins = 10
  val ViolationCap = 100
  val SaltBuckets = 16
  /** Exact-KS routing cap: per-batch distinct content-length cardinality
    * (approx, from the job-1 HLL) above which the driver-side length-count
    * collect is SKIPPED and the KS/PSI(length) verdicts are computed from
    * the mergeable t-digest bytes instead. Below the cap the collect is
    * ≤ ~1.6 MB per batch (cap × 16 bytes); above it, real code corpora can
    * reach 10^6+ distinct lengths × langs × batches — a driver OOM.
    */
  val LenCardCap = 100000L
  /** Per-buffer entry bound of the mergeable frequent-items (heavy-hitters)
    * sketch of `repo` aggregated in the artifacts scan: epsilon =
    * batchRows / (2 · 1024), so any repo holding ≥ ~0.05% of a batch is
    * guaranteed reported (NO_FALSE_NEGATIVES) — the mega-repo detector
    * whose audit bytes also merge ACROSS batches (AuditQueries.hotRepos),
    * which the exact per-batch repo_metrics top-k cannot do without a
    * re-scan.
    */
  val FreqMapSize = 1024
}

/** Batch-parallel validation suite over the code table
  * (repo, path, commit, lang, content, expected_sha256, batch_id).
  *
  * Scale design: ALL pending batches are validated in a CONSTANT number of
  * full-table jobs (≈6 scans/shuffles total), not O(#batches) loops:
  *   1. one-pass scalar aggregates per batch (counts, length moments,
  *      missing counts, sha-mismatch counts + capped sha samples, HLL and
  *      t-digest sketch bytes) — single ObjectHashAggregate, map-side
  *      partial. `content` is read from storage exactly once here: the slim
  *      projection it reduces to is cached and reused by job 2, and the
  *      sha256 check rides the same projection (SURVEY.md §7.5 risk 4);
  *   2. groupBy(batch, lang, length) counts over the cached projection —
  *      lang marginals → chi-square / PSI(lang); length marginals → exact
  *      KS + PSI(length), collected ONLY while the distinct-length
  *      cardinality stays under [[SuiteConfig.LenCardCap]]; above the cap
  *      the KS/PSI(length) verdicts come from the job-1 t-digest bytes
  *      (mergeable, scale-free) and no per-length rows reach the driver;
  *   3. duplicate-key detection (one shuffle on a 64-bit key hash);
  *   4. referential anti-join against the broadcast dimension.
  * Verdict assembly is driver-side arithmetic over the tiny collected
  * aggregates. Violations are written capped + deterministic (O5).
  *
  * Skew: groupBy keys are (batch, lang/bin/length) or near-unique triples —
  * none is repo-keyed, so the 30% mega-repo cannot hot-spot a reducer. The
  * only repo-keyed metric (files per repo) goes through the ADAPTIVELY
  * salted two-level aggregate ([[Salting.adaptiveSaltCol]]): the job-1
  * freq_repo sketch names the hot repos, only those are splintered across
  * salt buckets, and the long tail pays no partial-row multiplier.
  */
object SuiteRunner {
  import SuiteConfig._

  case class BatchArtifacts(
      batchId: Long,
      rows: Long,
      lenMin: Double, lenMax: Double, lenMean: Double, lenStd: Double,
      missingPath: Long, missingLang: Long, missingContent: Long,
      shaMismatch: Long,
      langCounts: Map[String, Long],
      lenCounts: Seq[(Long, Long)], // (length, count) sorted; EMPTY when the
                                    // distinct-length cardinality exceeded
                                    // LenCardCap (sketched drift path)
      fingerprint: String,
      hllKey: Array[Byte] = Array.empty,     // mergeable HLL of (repo,path,commit)
      hllRepo: Array[Byte] = Array.empty,    // mergeable HLL of repo
      tdigestLen: Array[Byte] = Array.empty, // mergeable t-digest of content length
      freqRepo: Array[Byte] = Array.empty,   // mergeable heavy-hitters sketch of repo
      shaSamples: Seq[String] = Seq.empty,   // capped JSON {repo,path,commit} triples
      lenCardApprox: Long = 0L)              // approx distinct lengths (routing)

  /** Parquet-serializable form of [[BatchArtifacts]] — persisted to the
    * `artifacts` audit table per batch so a resumed run can reload the
    * baseline's reference distributions WITHOUT re-scanning the baseline
    * partition (reference T7/T8 semantics: the first scan pins the
    * reference; later runs reuse the committed snapshot).
    */
  case class ArtifactRow(
      batch_id: Long, rows: Long,
      len_min: Double, len_max: Double, len_mean: Double, len_std: Double,
      missing_path: Long, missing_lang: Long, missing_content: Long,
      sha_mismatch: Long,
      lang_counts: Map[String, Long],
      len_vals: Seq[Long], len_cnts: Seq[Long],
      fingerprint: String,
      hll_key: Array[Byte], hll_repo: Array[Byte], tdigest_len: Array[Byte],
      freq_repo: Array[Byte],
      sha_samples: Seq[String], len_card: Long)

  def toRow(a: BatchArtifacts): ArtifactRow = ArtifactRow(
    a.batchId, a.rows, a.lenMin, a.lenMax, a.lenMean, a.lenStd,
    a.missingPath, a.missingLang, a.missingContent, a.shaMismatch,
    a.langCounts, a.lenCounts.map(_._1), a.lenCounts.map(_._2),
    a.fingerprint, a.hllKey, a.hllRepo, a.tdigestLen, a.freqRepo,
    a.shaSamples, a.lenCardApprox)

  def fromRow(r: ArtifactRow): BatchArtifacts = BatchArtifacts(
    r.batch_id, r.rows, r.len_min, r.len_max, r.len_mean, r.len_std,
    r.missing_path, r.missing_lang, r.missing_content, r.sha_mismatch,
    r.lang_counts, r.len_vals.zip(r.len_cnts),
    r.fingerprint, r.hll_key, r.hll_repo, r.tdigest_len, r.freq_repo,
    r.sha_samples, r.len_card)

  /** Exact two-sample KS from distinct-value count maps (driver-side; the
    * maps are groupBy(value).count results, already tiny).
    */
  def ksFromCounts(ref: Seq[(Long, Long)], cur: Seq[(Long, Long)]): (Double, Double) = {
    val n1 = ref.map(_._2).sum
    val n2 = cur.map(_._2).sum
    if (n1 == 0 || n2 == 0) return (0.0, 1.0)
    val values = (ref.map(_._1) ++ cur.map(_._1)).distinct.sorted
    val refM = ref.toMap; val curM = cur.toMap
    var c1 = 0L; var c2 = 0L; var d = 0.0
    values.foreach { v =>
      c1 += refM.getOrElse(v, 0L)
      c2 += curM.getOrElse(v, 0L)
      val gap = math.abs(c1.toDouble / n1 - c2.toDouble / n2)
      if (gap > d) d = gap
    }
    (d, DriftMath.ksPValue(d, n1, n2))
  }

  private def psiFromCounts(ref: Map[String, Long], cur: Map[String, Long]): Double = {
    val keys = (ref.keySet ++ cur.keySet).toSeq.sorted
    val n1 = ref.values.sum.toDouble
    val n2 = cur.values.sum.toDouble
    if (n1 == 0 || n2 == 0) return 0.0
    DriftMath.psi(keys.map(ref.getOrElse(_, 0L) / n1), keys.map(cur.getOrElse(_, 0L) / n2))
  }

  /** Returns (statistic, p-value, Cramér's V). Delegates the
    * goodness-of-fit math to [[graft.drift.Drift.chiSqGof]] (one formula,
    * one set-collapse regression test) and derives V = sqrt(χ² / (n·dof))
    * from its statistic over the same baseline-covered total.
    */
  private[graft] def chiSqFromCounts(ref: Map[String, Long], cur: Map[String, Long]): (Double, Double, Double) = {
    val (stat, p, dof) = graft.drift.Drift.chiSqGof(ref, cur)
    if (dof < 1) return (stat, p, 0.0)
    val n2cov = graft.drift.Drift.coveredCurTotal(ref, cur)
    val v = if (n2cov == 0) 0.0 else math.sqrt(stat / (n2cov * dof))
    (stat, p, v)
  }

  /** Collect all per-batch artifacts for `batches` in the constant number of
    * jobs described above. `code` must already be filtered to those batches
    * (partition pruning keeps unread batches off disk).
    *
    * `content` is read from storage exactly ONCE: the slim projection
    * (length, missing flags, sha-mismatch flag, key/row hashes) is cached,
    * so job 1 (scalars + sketches + capped sha samples) and job 2
    * (lang × length counts) share one materialization of the expensive
    * column. The sha256 invariant check and its capped deterministic sample
    * ride job 1 via [[graft.stats.MinK.minKStrings]] (bounded O(cap) state,
    * mergeable) — no second content scan ever happens.
    */
  def collectArtifacts(code: DataFrame, batches: Seq[Long],
                       lenCardCap: Long = LenCardCap): Map[Long, BatchArtifacts] = {
    val slim = slimProjection(code, batches).persist()
    try collectArtifactsFromSlim(slim, batches, lenCardCap)
    finally slim.unpersist()
  }

  /** The one-content-scan projection both artifact jobs (and, inside
    * [[run]], the violation/repo-metric jobs) share — `content` reduced
    * ONCE to its cheap derivatives; content itself never shuffles. The
    * caller owns persist/unpersist.
    */
  private[suite] def slimProjection(code: DataFrame, batches: Seq[Long]): DataFrame =
    code
      .where(col("batch_id").isin(batches: _*))
      .select(col("batch_id"),
        length(col("content")).cast("long").as("len"),
        (col("path").isNull || col("path") === "").as("path_missing"),
        (col("lang").isNull || col("lang") === "").as("lang_missing"),
        (col("content").isNull || col("content") === "").as("content_missing"),
        (sha2(col("content"), 256) =!= col("expected_sha256")).as("sha_mismatch"),
        col("lang"), col("repo"),
        // violation-sample key as JSON, not a delimiter join: JSON escaping
        // makes the round-trip safe for ANY character in repo/path/commit
        // (a NUL or control char in a path must not mis-split the triple).
        // Computed ONLY for mismatching rows: the ~100-byte string would
        // otherwise dominate the cached slim projection (~60% of its bytes
        // — measured ~34 GB of disk-cache spill per run at 288M rows) while
        // the MinK sample aggregate ignores every clean row anyway
        when(sha2(col("content"), 256) =!= col("expected_sha256"),
          to_json(struct(coalesce(col("repo"), lit("")).as("repo"),
            coalesce(col("path"), lit("")).as("path"),
            coalesce(col("commit"), lit("")).as("commit")))).as("key3"),
        xxhash64(col("repo"), col("path"), col("commit")).as("keyhash"),
        xxhash64(col("repo"), col("path"), col("commit"), col("content")).as("rowhash"))

  /** [[collectArtifacts]] over an already-persisted slim projection. */
  private[suite] def collectArtifactsFromSlim(slim: DataFrame, batches: Seq[Long],
                                              lenCardCap: Long): Map[Long, BatchArtifacts] = {
    // job 1: scalar aggregates per batch
    val scalars = slim.groupBy("batch_id").agg(
      count(lit(1)).as("rows"),
      min("len").as("len_min"), max("len").as("len_max"),
      avg("len").as("len_mean"), stddev_samp(col("len")).as("len_std"),
      sum(when(col("path_missing"), 1L).otherwise(0L)).as("miss_path"),
      sum(when(col("lang_missing"), 1L).otherwise(0L)).as("miss_lang"),
      sum(when(col("content_missing"), 1L).otherwise(0L)).as("miss_content"),
      sum(when(col("sha_mismatch"), 1L).otherwise(0L)).as("sha_mismatch"),
      // capped deterministic sha-violation sample, one pass, bounded state
      graft.stats.MinK.minKStrings(
        when(col("sha_mismatch"), col("key3")), ViolationCap).as("sha_samples"),
      // routing cardinality for the exact-vs-sketched KS decision
      approx_count_distinct(col("len")).as("len_card"),
      // order-independent batch fingerprint: decimal sum of row hashes
      // (decimal(38,0) cannot overflow under ANSI mode at any row count)
      sum(col("rowhash").cast("decimal(38,0)")).as("fp"),
      // mergeable sketches ride the SAME scan (no extra content pass):
      // HLL distinct + t-digest quantiles persisted per batch (north star)
      hll_sketch_agg(col("keyhash")).as("hll_key"),
      hll_sketch_agg(col("repo")).as("hll_repo"),
      graft.stats.Sketches.tdigestAgg(col("len").cast("double")).as("tdigest_len"),
      // heavy-hitters sketch of repo rides the same scan: the mega-repo
      // detector, mergeable across batches from the committed bytes
      graft.stats.FreqSketch.freqItemsAgg(col("repo"), SuiteConfig.FreqMapSize)
        .as("freq_repo")).collect()
      .map(r => r.getAs[Long]("batch_id") -> r).toMap

    // job 2: (lang, distinct-length) counts per batch in ONE pass over the
    // CACHED slim projection. Lang marginals (always tiny — |langs| bounded)
    // feed chi-square/PSI(lang). Length marginals feed exact KS and
    // PSI(length) — but ONLY below the cardinality cap: the full
    // (batch × lang × length) cross collect is unbounded on arbitrary
    // inputs (10^6+ distinct lengths on real code), so above the cap the
    // driver never sees per-length counts and the drift verdicts fall back
    // to the t-digest bytes already aggregated in job 1.
    val cross = slim.groupBy("batch_id", "lang", "len").count()
    val maxLenCard = scalars.valuesIterator
      .map(_.getAs[Long]("len_card")).maxOption.getOrElse(0L)
    // both marginals come back in ONE union query / ONE driver action
    // (every extra action pays its own planning + scheduling latency —
    // a measured fixed cost that caps small-input scaling)
    val langMarginal = cross.groupBy("batch_id", "lang").agg(sum("count").as("n"))
      .select(lit("lang").as("kind"), col("batch_id"),
        coalesce(col("lang"), lit("")).as("k"), lit(-1L).as("len"), col("n"))
    val lenMarginal = cross.groupBy("batch_id", "len").agg(sum("count").as("n"))
      .select(lit("len").as("kind"), col("batch_id"),
        lit("").as("k"), col("len"), col("n"))
    val marginals =
      (if (maxLenCard > lenCardCap) langMarginal
       else langMarginal.unionByName(lenMarginal)).collect()
    val langCounts = marginals.filter(_.getString(0) == "lang")
      .groupBy(_.getAs[Long]("batch_id"))
      .map { case (b, rows) =>
        b -> rows.map(r => r.getString(2) -> r.getAs[Long]("n")).toMap
      }
    val lenCounts: Map[Long, Seq[(Long, Long)]] = marginals
      .filter(_.getString(0) == "len")
      .groupBy(_.getAs[Long]("batch_id"))
      .map { case (b, rows) =>
        b -> rows.map(r => r.getAs[Long]("len") -> r.getAs[Long]("n"))
          .toSeq.sortBy(_._1)
      }

    batches.flatMap { b =>
      scalars.get(b).map { r =>
        b -> BatchArtifacts(b, r.getAs[Long]("rows"),
          Option(r.getAs[Any]("len_min")).map(_.asInstanceOf[Number].doubleValue).getOrElse(Double.NaN),
          Option(r.getAs[Any]("len_max")).map(_.asInstanceOf[Number].doubleValue).getOrElse(Double.NaN),
          Option(r.getAs[Any]("len_mean")).map(_.asInstanceOf[Number].doubleValue).getOrElse(Double.NaN),
          Option(r.getAs[Any]("len_std")).map(_.asInstanceOf[Number].doubleValue).getOrElse(Double.NaN),
          r.getAs[Long]("miss_path"), r.getAs[Long]("miss_lang"), r.getAs[Long]("miss_content"),
          r.getAs[Long]("sha_mismatch"),
          langCounts.getOrElse(b, Map.empty),
          lenCounts.getOrElse(b, Seq.empty),
          Option(r.getAs[java.math.BigDecimal]("fp"))
            .map(_.toBigInteger.toString(16)).getOrElse("0"),
          r.getAs[Array[Byte]]("hll_key"), r.getAs[Array[Byte]]("hll_repo"),
          r.getAs[Array[Byte]]("tdigest_len"), r.getAs[Array[Byte]]("freq_repo"),
          r.getAs[scala.collection.Seq[String]]("sha_samples").toSeq,
          r.getAs[Long]("len_card"))
      }
    }.toMap
  }

  /** Length histogram proportions from a t-digest sketch over the same
    * baseline-pinned equi-width bins as [[histProportions]]: bin mass =
    * rank(right edge) − rank(left edge), with the edge bins absorbing the
    * out-of-range tails (matching the exact path's clamping).
    */
  private def histProportionsFromDigest(bytes: Array[Byte], lo: Double, hi: Double): Seq[Double] = {
    val dig = graft.stats.Sketches.heapify(bytes)
    if (dig.isEmpty || hi <= lo) return Seq.fill(Bins)(0.0)
    val edges = (0 to Bins).map(i => lo + (hi - lo) * i / Bins)
    val ranks = edges.map(dig.getRank)
    (0 until Bins).map { i =>
      val left = if (i == 0) 0.0 else ranks(i)
      val right = if (i == Bins - 1) 1.0 else ranks(i + 1)
      math.max(0.0, right - left)
    }
  }

  /** Length histogram proportions over `bins` equi-width bins pinned to the
    * BASELINE's [min,max] (numpy right-edge convention; out-of-range current
    * values clamp into the edge bins).
    */
  private def histProportions(lenCounts: Seq[(Long, Long)], lo: Double, hi: Double): Seq[Double] = {
    val n = lenCounts.map(_._2).sum.toDouble
    if (n == 0) return Seq.fill(Bins)(0.0)
    val acc = Array.fill(Bins)(0L)
    lenCounts.foreach { case (v, c) =>
      val b = if (hi <= lo) 0
        else math.max(0, math.min(Bins - 1, ((v - lo) * Bins / (hi - lo)).toInt))
      acc(b) += c
    }
    acc.map(_ / n).toSeq
  }

  /** Full run: resume-aware validation of every batch not yet committed.
    * Returns the verdicts written this run.
    */
  def run(spark: SparkSession, codeRaw: DataFrame, repoLangDim: DataFrame,
          io: TableIO, baselineBatch: Long = 0L,
          lenCardCap: Long = LenCardCap): Seq[Verdict] = {
    import spark.implicits._
    val t0 = System.nanoTime() // lineage wall_ms covers the WHOLE run
    // normalize batch_id: a disk layout partitioned by batch_id reads the
    // partition column back as int — the engine contract is bigint
    val code = codeRaw.withColumn("batch_id", col("batch_id").cast("bigint"))
    val allBatches = code.select("batch_id").distinct().as[Long].collect().sorted.toSeq
    val committed = io.listCommitted("verdicts").toSet
    val pending = allBatches.filterNot(committed)
    if (pending.isEmpty) return Seq.empty

    // PRE-FLIGHT schema gate (reference DESIGN.md:317-326 schema registry /
    // compatibility validation; "Schema violations" metric, DESIGN.md:600):
    // metadata-only — the diff costs the same at 10^12 rows as at 10^2
    // because it never scans data. First run pins the normalized input
    // schema to the audit dir (atomic manifest, version-gated like every
    // persisted artifact); later runs diff against the reload. The issues
    // become a per-batch `schema` verdict row (and a critical alert rule),
    // NOT a quality_score input: quality is the reference's CONTENT metric,
    // schema drift is a compatibility gate with its own verdict.
    val schemaIssues = SchemaCheck.preflight(io, code.schema)
    if (schemaIssues.nonEmpty)
      System.err.println(s"[graft] schema drift vs committed baseline (" +
        s"${schemaIssues.size} issue(s)): " +
        schemaIssues.map(i => s"${i.column}:${i.issue}").mkString(", "))

    // baseline artifacts: computed once — the FIRST scan establishes the
    // reference distributions (T7, DESIGN.md:536-537) and commits them to
    // the `artifacts` audit table; every later/resumed run reloads that
    // snapshot instead of re-scanning the baseline partition, so an
    // incremental run touches ONLY pending batches (and keeps working even
    // when the input no longer carries the baseline partition)
    // version gate: artifact rows are a WIRE FORMAT (shaSamples changed
    // NUL-joined → JSON in graft-0.3); a snapshot committed by a different
    // suite version is ignored and the baseline recomputed from the input
    // rather than silently mis-parsed
    val baselineFromAudit: Option[BatchArtifacts] =
      if (!io.commitMeta("artifacts", baselineBatch)
            .exists(_.contains(s""""suite":"$SuiteVersion""""))) None
      else io.readCommitted(spark, "artifacts").flatMap { df =>
        df.where(col("batch_id") === baselineBatch).as[ArtifactRow]
          .collect().headOption.map(fromRow)
      }
    val needed =
      if (baselineFromAudit.isDefined) pending
      else (pending :+ baselineBatch).distinct
    // the slim projection stays persisted through the violation /
    // repo-metric phase below: the uniqueness candidate hashes, the
    // referential anti-join and the salted repo counts all read their
    // columns from this cache instead of re-scanning the input (3 fewer
    // full-table scans per run); unpersisted in the write-phase finally
    val slim = slimProjection(code, needed).persist()
    val (arts, base) =
      try {
        val a = collectArtifactsFromSlim(slim, needed, lenCardCap) ++
          baselineFromAudit.map(b => b.batchId -> b)
        val bl = a.getOrElse(baselineBatch, throw new IllegalArgumentException(
          s"baseline batch $baselineBatch has no rows in the input (batches present: " +
            s"${allBatches.mkString(", ")}) and no committed artifacts exist for it; " +
            "include the baseline partition in the input or validate it first"))
        (a, bl)
      } catch { case e: Throwable => slim.unpersist(blocking = false); throw e }
    val basePropLen = histProportions(base.lenCounts, base.lenMin, base.lenMax)

    // shared violation jobs, batch-attributed, capped deterministically.
    // The deterministic top-cap sample is SALTED two-phase (the Drift
    // melted-top-K shape): phase 1 keeps the per-(batch, salt) top cap in
    // 32 parallel partitions, phase 2 re-ranks the ≤ 32·cap survivors — an
    // adversarially duplicate-heavy batch never sorts all its violation
    // groups in one task. Exact: a batch-global top-cap row is a fortiori
    // top-cap within its salt bucket. (Phase 2's per-batch ranking is ≤
    // 32·cap rows; under streaming the foldable batch_id makes Spark log a
    // partition-less-window warning for it — bounded rows, harmless.)
    val pendingCode = code.where(col("batch_id").isin(pending: _*))
    val slimPending = slim.where(col("batch_id").isin(pending: _*))
    val keyOrder = Seq(col("repo"), col("path"), col("commit"))
    val keySalt = pmod(xxhash64(col("repo"), col("path"), col("commit")), lit(32))
    val keyW1 = Window.partitionBy(col("batch_id"), keySalt).orderBy(keyOrder: _*)
    val keyW = Window.partitionBy(col("batch_id")).orderBy(keyOrder: _*)

    // Uniqueness, two-phase hash-first: phase 1 shuffles only a 64-bit key
    // hash (not the ~100-byte string triple — 6× less shuffle I/O at 8M
    // rows) and reads it straight from the CACHED slim projection (the
    // keyhash was computed in the artifacts scan — no input re-scan);
    // phase 2 re-verifies candidate groups on the REAL key strings
    // over the (tiny) semi-joined candidate rows, so a hash collision can
    // never produce a false duplicate. Result is persisted once and feeds
    // both the verdict counts and the capped sample.
    val keyHash = xxhash64(col("repo"), col("path"), col("commit"))
    val candHashes = slimPending
      .groupBy(col("batch_id"), col("keyhash").as("kh")).agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select("batch_id", "kh")
    // no broadcast HINT here: the candidate set's size is data-dependent
    // (normally tiny → AQE broadcasts it at runtime; adversarially
    // duplicate-heavy input → AQE falls back to a shuffle join instead of
    // blowing the broadcast limit)
    val dupViol = pendingCode
      .join(candHashes,
        pendingCode("batch_id") === candHashes("batch_id") && keyHash === col("kh"), "left_semi")
      .groupBy("batch_id", "repo", "path", "commit")
      .agg(count(lit(1)).as("dup_count")).where(col("dup_count") > 1)
      .persist()
    val dupSample = dupViol.withColumn("rn", row_number().over(keyW1))
      .where(col("rn") <= ViolationCap).drop("rn")
      .withColumn("rn", row_number().over(keyW))
      .where(col("rn") <= ViolationCap).drop("rn")

    // referential: the violating (repo, lang) groups are tiny — aggregate
    // once over the CACHED slim columns (no input re-scan), persist,
    // derive counts + sample without a second scan
    val refViol = slimPending.select("batch_id", "repo", "lang")
      .join(broadcast(repoLangDim.select("repo", "lang").distinct()), Seq("repo", "lang"), "left_anti")
      .groupBy("batch_id", "repo", "lang")
      .agg(count(lit(1)).as("violation_count")).persist()

    val refSample = refViol
      .withColumn("rn", row_number().over(Window.partitionBy(col("batch_id"))
        .orderBy(col("repo"), col("lang"))))
      .where(col("rn") <= ViolationCap).drop("rn")

    // sha256 counts AND the capped deterministic sample both came out of the
    // job-1 artifacts scan (MinK aggregate) — no second content pass; the
    // sample table is assembled driver-side from ≤ ViolationCap keys/batch
    val shaViol = pending.flatMap { b =>
      arts(b).shaSamples.map(s => (b, s))
    }.toDF("batch_id", "key_json")
      .select(col("batch_id"),
        from_json(col("key_json"), "repo STRING, path STRING, commit STRING",
          Map.empty[String, String]).as("k"))
      .select(col("batch_id"), col("k.repo").as("repo"),
        col("k.path").as("path"), col("k.commit").as("commit"))

    val emptyPathViol = pendingCode
      .where(col("path").isNull || col("path") === "")
      .select("batch_id", "repo", "commit", "lang")
      .withColumn("rn", row_number().over(Window.partitionBy(col("batch_id"))
        .orderBy(col("repo"), col("commit")))).where(col("rn") <= ViolationCap).drop("rn")

    val allViolations = Seq(
      "uniqueness" -> dupSample, "referential" -> refSample,
      "sha256_invariant" -> shaViol, "completeness_path" -> emptyPathViol)

    // All audit writes are gathered and submitted CONCURRENTLY at the end
    // of the run (see below): one partitioned write per table covering ALL
    // pending batches — a per-batch write loop re-plans the whole pipeline
    // #tables × #batches times (measured 26 s serial overhead at 8M rows),
    // and running the independent writes serially costs a further ~10 s
    // fixed block at 32 cores.

    // per-batch verdict assembly (driver-side arithmetic on tiny
    // aggregates) — invoked AFTER the independent audit writes are in
    // flight, with the dup/ref counts collected concurrently with them
    def assembleVerdicts(dupCounts: Map[Long, Long],
                         refCounts: Map[Long, Long]): Seq[Verdict] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Verdict]
      pending.foreach { b =>
      val a = arts(b)
      // exact per-length counts below the cardinality cap; t-digest sketch
      // path above it (no per-length rows ever reached the driver)
      val exactLen = base.lenCounts.nonEmpty && a.lenCounts.nonEmpty
      val (ksD, ksP) =
        if (exactLen) ksFromCounts(base.lenCounts, a.lenCounts)
        else {
          val r = graft.drift.KsTest.ksStatisticSketched(
            graft.stats.Sketches.heapify(base.tdigestLen),
            graft.stats.Sketches.heapify(a.tdigestLen))
          (r.statistic, r.pValue)
        }
      val psiLen =
        if (exactLen)
          DriftMath.psi(basePropLen, histProportions(a.lenCounts, base.lenMin, base.lenMax))
        else DriftMath.psi(
          histProportionsFromDigest(base.tdigestLen, base.lenMin, base.lenMax),
          histProportionsFromDigest(a.tdigestLen, base.lenMin, base.lenMax))
      val psiLang = psiFromCounts(base.langCounts, a.langCounts)
      val (chiStat, chiP, cramersV) = chiSqFromCounts(base.langCounts, a.langCounts)
      val meanShift = if (base.lenStd.isNaN || base.lenStd == 0) 0.0
        else math.abs(base.lenMean - a.lenMean) / base.lenStd
      val isBase = b == baselineBatch
      val missRate = if (a.rows == 0) 0.0 else a.missingPath.toDouble / a.rows
      val verdicts = Seq(
        Verdict(b, "schema", "*", schemaIssues.size.toDouble, Double.NaN, 0,
          schemaIssues.isEmpty, schemaIssues.size),
        Verdict(b, "uniqueness", "repo,path,commit", dupCounts.getOrElse(b, 0L).toDouble,
          Double.NaN, 0, dupCounts.getOrElse(b, 0L) == 0, dupCounts.getOrElse(b, 0L)),
        Verdict(b, "referential", "repo,lang", refCounts.getOrElse(b, 0L).toDouble,
          Double.NaN, 0, refCounts.getOrElse(b, 0L) == 0, refCounts.getOrElse(b, 0L)),
        Verdict(b, "completeness", "path", missRate, Double.NaN, 0.0,
          a.missingPath == 0, a.missingPath),
        Verdict(b, "sha256_invariant", "content", a.shaMismatch.toDouble, Double.NaN, 0,
          a.shaMismatch == 0, a.shaMismatch),
        Verdict(b, "drift_ks", "content_length", ksD, ksP, KsThreshold,
          isBase || ksP >= KsThreshold, 0),
        Verdict(b, "drift_psi", "content_length", psiLen, Double.NaN, PsiThreshold,
          isBase || psiLen < PsiThreshold, 0),
        Verdict(b, "drift_psi", "lang", psiLang, Double.NaN, PsiThreshold,
          isBase || psiLang < PsiThreshold, 0),
        Verdict(b, "drift_chisq", "lang", chiStat, chiP, ChiSqThreshold,
          isBase || chiP >= ChiSqThreshold || cramersV < CramersVFloor, 0),
        Verdict(b, "mean_shift", "content_length", meanShift, Double.NaN, Double.NaN, true, 0))
      // quality score: FIXTURES.md §4 concretization — 1 − max(error rates),
      // gated to 0 if any constraint expectation fails
      val errRates = Seq(missRate,
        if (a.rows == 0) 0.0 else a.shaMismatch.toDouble / a.rows)
      val constraintsPass = verdicts.filter(v => Set("uniqueness", "referential",
        "completeness", "sha256_invariant").contains(v.check)).forall(_.passed)
      val score = if (!constraintsPass) 0.0 else 1.0 - errRates.max
      val withScore = verdicts :+ Verdict(b, "quality_score", "*", score, Double.NaN, 0.0, true, 0)
      out ++= withScore
      }
      out.toSeq
    }

    // per-(batch, repo) file counts through the EXPLICIT salted two-level
    // aggregation (north rule: "repartition-by-repo-hash plus salting for
    // skewed mega-repos" — the generated corpus has one repo holding ~30%
    // of rows; a plain groupBy(repo) would hot-spot one reducer). Counts
    // are mergeable, so the two-level result is exact. Top repos per batch
    // land in the audit as capacity/skew telemetry.
    //
    // ADAPTIVE salting: the job-1 freq_repo sketch NAMES the hot repos
    // before this stage runs — only those get splintered across
    // SaltBuckets; the long tail keeps salt 0, so level-1 partial volume
    // is one row per cold (batch, repo) per map task instead of up to
    // SaltBuckets of them (the multiplier that dominates at 10^8+ distinct
    // repos). Threshold = an average reducer's row share: any repo that
    // could fill a whole reducer is guaranteed named (NO_FALSE_NEGATIVES;
    // per-batch hot ⇒ global count ≥ threshold ⇒ named), and spuriously
    // named borderline keys only cost ≤ SaltBuckets extra partials each —
    // exactness never depends on the hot set (SaltingSpec law).
    val shuffleParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val pendingRows = pending.map(b => arts(b).rows).sum
    val hotThreshold = math.max(1L, pendingRows / math.max(1, shuffleParts))
    val mergedFreq = pending.map(b => arts(b).freqRepo)
      .filter(_.nonEmpty).reduceOption(graft.stats.FreqSketch.mergeBytes)
    // NO_FALSE_NEGATIVES holds only while threshold > the sketch's ACTUAL
    // maximum error: getFrequentItems clamps the threshold UP to
    // getMaximumError, so with FreqMapSize=1024 and shuffle partitions in
    // the hundreds (the target-scale config) a truly reducer-filling repo
    // with count in [threshold, maxError) would be silently unnamed and
    // unsalted. When the guarantee degrades, fall back to STATIC salting
    // (salt every key — exactness is salt-invariant, only the level-1
    // partial volume grows) and say so loudly.
    val freqMaxError = mergedFreq
      .map(b => graft.stats.FreqSketch.heapify(b).getMaximumError).getOrElse(0L)
    val staticSaltFallback = freqMaxError >= hotThreshold
    if (staticSaltFallback)
      System.err.println(s"[graft] adaptive salting DEGRADED to static: the " +
        s"freq sketch's max error ($freqMaxError) reaches the hot-repo " +
        s"threshold ($hotThreshold) so NO_FALSE_NEGATIVES cannot hold; " +
        s"salting every repo key (exactness unaffected; raise FreqMapSize " +
        s"to ~2x shuffle partitions to restore the adaptive path)")
    val hotRepos: Seq[String] =
      if (staticSaltFallback) Seq.empty
      else mergedFreq.map(graft.stats.FreqSketch.hotKeys(_, hotThreshold))
        .getOrElse(Seq.empty)
    if (hotRepos.nonEmpty)
      System.err.println(s"[graft] adaptive salting: ${hotRepos.size} hot repo(s) " +
        s"named by the freq sketch at threshold $hotThreshold: " +
        hotRepos.take(5).mkString(", ") + (if (hotRepos.size > 5) ", …" else ""))
    // salt source = the keyhash already cached in the slim projection (any
    // salt assignment is exactness-neutral — the two-level aggregate is a
    // homomorphism; SaltingSpec law), so this whole stage reads the cache,
    // never the input table
    val repoMetrics = slimPending
      .groupBy(col("batch_id"), col("repo"),
        (if (staticSaltFallback) pmod(col("keyhash"), lit(SaltBuckets))
         else if (hotRepos.isEmpty) lit(0)
         else when(col("repo").isin(hotRepos: _*),
           pmod(col("keyhash"), lit(SaltBuckets))).otherwise(lit(0))).as("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("batch_id"), col("repo"))
      .agg(sum("_partial").as("file_count"))
      // top-ViolationCap per batch via the bounded TopKStringsAgg instead
      // of a row_number window: the window form funnels EVERY repo of a
      // batch through one reducer's sort (10^9 rows per window partition
      // at target scale); the aggregate shuffles ≤ mapTasks × cap entries
      // and its (count desc, repo asc UTF-8) cut is window-identical
      // (TopKSpec pins the equality on skewed data)
      .groupBy(col("batch_id"))
      .agg(graft.stats.TopK.topKStrings(
        col("file_count"), col("repo"), ViolationCap).as("_top"))
      .select(col("batch_id"), posexplode(col("_top")).as(Seq("_pos", "_t")))
      .select(col("batch_id"), col("_t.item").as("repo"),
        col("_t.count").as("file_count"), (col("_pos") + 1).cast("int").as("rank"))

    // per-batch MERGEABLE sketches (north star: HLL distinct + t-digest
    // quantiles persisted to the audit table so later/resumed runs answer
    // whole-table questions by merging committed bytes, never re-scanning).
    // The bytes were aggregated in the artifacts scan — zero extra jobs here
    // beyond the tiny write.
    val sketchRows = pending.map { b =>
      val a = arts(b)
      (b, a.rows, a.hllKey, a.hllRepo, a.tdigestLen, a.freqRepo)
    }

    // Every audit table write is independent of the others → submit them
    // all CONCURRENTLY (Spark's scheduler is thread-safe and interleaves
    // jobs from multiple submitter threads). Serially, each small write
    // pays its own task-launch + file-commit latency — measured as a ~10 s
    // fixed block at 32 cores on 64M rows; overlapped, the block shrinks to
    // roughly the slowest single write. Durability is unchanged: manifest
    // COMMITS below happen strictly after ALL writes have finished, in
    // order, verdicts last (the atomic commit point per batch). Lineage is
    // NOT in this block: its wall_ms must include the write time, so it is
    // written (tiny, serial) after the block completes.
    val independentWrites: Seq[(String, DataFrame)] =
      allViolations.map { case (name, df) => s"violations_$name" -> df } ++ Seq(
        "repo_metrics" -> repoMetrics,
        "sketches" -> sketchRows.toDF("batch_id", "rows", "hll_key", "hll_repo",
          "tdigest_len", "freq_repo"),
        // artifacts snapshot: what a resumed run loads instead of
        // re-scanning the baseline partition
        "artifacts" -> pending.map(b => toRow(arts(b))).toDF())
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(8, independentWrites.size + 1))
    val out: Seq[Verdict] = try {
      val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val fs = independentWrites.map { case (table, df) =>
        scala.concurrent.Future(io.writeAllPartitions(df, table))(ec)
      }
      // OVERLAPPED with the writes above: the one remaining driver action
      // (dup/ref violation-count maps) runs on the main thread while the
      // writer pool drains — it only feeds the verdicts, which are the
      // LAST table written (and committed last, unchanged ordering)
      val violCountRows = dupViol.groupBy("batch_id")
        .agg(sum(col("dup_count") - 1).as("n")).withColumn("kind", lit("dup"))
        .unionByName(refViol.groupBy("batch_id")
          .agg(sum("violation_count").as("n")).withColumn("kind", lit("ref")))
        .collect()
      val dupCounts = violCountRows.filter(_.getString(2) == "dup")
        .map(r => r.getAs[Long]("batch_id") -> r.getAs[Long]("n")).toMap
      val refCounts = violCountRows.filter(_.getString(2) == "ref")
        .map(r => r.getAs[Long]("batch_id") -> r.getAs[Long]("n")).toMap
      val verdicts = assembleVerdicts(dupCounts, refCounts)
      val fVerdicts = scala.concurrent.Future(
        io.writeAllPartitions(verdicts.toDF(), "verdicts"))(ec)
      import scala.concurrent.duration.Duration
      (fs :+ fVerdicts).foreach(f => scala.concurrent.Await.result(f, Duration.Inf))
      verdicts
    } finally {
      // shutdownNow interrupts still-running writes when any write failed
      // (a failed run must not keep writer threads alive); the unpersists
      // sit in the finally so a write failure cannot leak cached blocks
      pool.shutdownNow()
      dupViol.unpersist()
      refViol.unpersist()
      slim.unpersist()
    }

    // lineage wall_ms: whole run INCLUDING the audit writes above (even
    // split across this run's batches — per-batch telemetry, not a timer)
    val wallMs = (System.nanoTime() - t0) / 1000000 / math.max(1, pending.size)
    val lineageRows = pending.map { b =>
      val a = arts(b)
      Lineage(b, a.rows, a.fingerprint, SuiteVersion, baselineBatch, wallMs)
    }
    io.writeAllPartitions(lineageRows.toDF(), "lineage")
    pending.foreach { b =>
      val a = arts(b)
      allViolations.foreach { case (name, _) => io.commit(s"violations_$name", b, s"""{"batch_id":$b}""") }
      io.commit("sketches", b, s"""{"batch_id":$b}""")
      // artifacts carry the writer's suite version: reload is version-gated
      io.commit("artifacts", b, s"""{"batch_id":$b,"suite":"$SuiteVersion"}""")
      io.commit("repo_metrics", b, s"""{"batch_id":$b}""")
      io.commit("lineage", b, s"""{"batch_id":$b}""")
      io.commit("verdicts", b,
        s"""{"batch_id":$b,"rows":${a.rows},"fingerprint":"${a.fingerprint}","suite":"$SuiteVersion"}""")
    }
    // re-stamp path: when the baseline's committed artifacts were rejected
    // by the version gate (or never existed) and the baseline was NOT a
    // pending batch (whose normal write/commit above already stamped it),
    // the snapshot just recomputed from the input is committed under the
    // CURRENT version — otherwise an upgraded audit dir re-scans the
    // baseline partition forever and a later run whose input no longer
    // carries that partition dies instead of reloading
    if (baselineFromAudit.isEmpty && !pending.contains(baselineBatch)) {
      // drop batch_id: writePartition targets the batch_id=<p> directory
      // directly, and readCommitted re-derives the column from the path
      // (the same layout writeAllPartitions' partitionBy produces)
      io.writePartition(Seq(toRow(base)).toDF().drop("batch_id"),
        "artifacts", baselineBatch)
      io.commit("artifacts", baselineBatch,
        s"""{"batch_id":$baselineBatch,"suite":"$SuiteVersion"}""")
    }
    out
  }
}
