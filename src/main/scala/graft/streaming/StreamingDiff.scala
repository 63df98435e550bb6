package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static change detection — the firehose twin of
  * [[graft.operators.TableDiff]]: rows arriving on a stream are scored
  * against a STATIC reference snapshot's fingerprints (a stream-static
  * left join, which Structured Streaming executes with the static side
  * as an ordinary broadcast/lookup — no streaming state at all), and
  * each row is emitted as `added` (key unseen in the reference) or
  * `changed` (fingerprint differs); unchanged rows are dropped in the
  * same projection. `removed` is undetectable from an insert stream by
  * construction — that classification needs the batch diff over the
  * full snapshot, which is exactly the batch/stream split the other
  * twins draw.
  *
  * 100 TB shape: the reference ships as (key, 32-char fingerprint) —
  * payload-free — and the stream never shuffles (append-mode map-side
  * join + filter); at reference sizes beyond broadcast range the same
  * plan degrades gracefully to a shuffled stream-static join on the
  * key.
  */
object StreamingDiff {

  // per-column md5 before the concat: fixed-width hex per column, so a
  // value containing the separator can never shift across column
  // boundaries (must stay bit-identical to [[graft.operators.TableDiff]]
  // so persisted reference fingerprints remain valid across both paths)
  private def fp(cmp: Seq[String]) = md5(concat_ws("|",
    cmp.map(c => md5(concat(isnull(col(c)).cast("int"),
      coalesce(col(c).cast("string"), lit(""))))): _*))

  /** Fingerprints of the reference snapshot — build once, reuse across
    * streams (persistable like the sketch artifacts).
    */
  def referenceFingerprints(ref: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame =
    ref.select(keyCols.map(col) :+ fp(compareCols).as("__ref_fp"): _*)

  /** The changed/added rows of `stream` vs the fingerprint table. */
  def changes(stream: DataFrame, refFp: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame =
    stream
      .withColumn("__fp", fp(compareCols))
      .join(refFp, keyCols, "left")
      .withColumn("status",
        when(col("__ref_fp").isNull, "added")
          .when(col("__fp") =!= col("__ref_fp"), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(keyCols.map(col) :+ col("status"): _*)
}
