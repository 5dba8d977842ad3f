package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.suite.{SuiteRunner, Verdict}
import graft.tableio.TableIO

/** Continuous validation: the FULL constraint + drift suite applied to every
  * arriving micro-batch — the streaming face of the same engine that runs in
  * batch mode, composed via `foreachBatch` (the reference's continuous
  * pipelines poll-then-validate the same way; DESIGN.md §3.3's validation job
  * over each new partition).
  *
  * ALL cross-batch state lives in the audit table, none in the stream:
  * committed verdicts gate re-validation, and the baseline artifact snapshot
  * (first scan, T7) is reloaded from the `artifacts` table for every later
  * micro-batch — so a killed stream restarted over the same source and audit
  * dir resumes exactly where it stopped (already-committed micro-batches
  * no-op), and batch-mode and streaming-mode validation of the same
  * partitions produce identical verdict rows (StreamingValidateSpec asserts
  * this parity). Micro-batch id is the batch_id, mirroring the arrival-unit
  * model (SURVEY §2.9 T1).
  */
object StreamingValidate {

  /** Starts the validating stream. `onVerdicts` fires after each micro-batch
    * commit with that batch's verdict rows (alert/exit-code wiring point —
    * the streaming analog of the CLI's drift-triggered action, T6).
    */
  def validateStream(stream: DataFrame, repoLangDim: DataFrame, io: TableIO,
                     trigger: Trigger = Trigger.AvailableNow(),
                     onVerdicts: Seq[Verdict] => Unit = _ => ()): StreamingQuery = {
    val perBatch: (Dataset[Row], Long) => Unit = (df, id) => {
      val code = df.withColumn("batch_id", lit(id))
      onVerdicts(SuiteRunner.run(df.sparkSession, code, repoLangDim, io))
    }
    stream.writeStream.trigger(trigger).foreachBatch(perBatch).start()
  }
}
