package graft.streaming

import graft.operators.InvertedIndex
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuous ingest into a persisted inverted index — the streaming
  * sibling of [[graft.operators.InvertedIndex.append]]: each micro-batch
  * of (id, text) docs becomes a postings/doclens/termdf/meta DELTA
  * written under its own `batch=<id>` partitions, and [[load]]
  * re-aggregates across batches EXACTLY (term dfs and the (n, sdl) meta
  * are sums; doc ids are disjoint across batches — the append
  * contract), so a probe after any batch is bit-identical to a
  * from-scratch build over everything ingested so far.
  *
  * Exactly-once by IDEMPOTENCE, not a ledger: the batch-id partition is
  * the write's identity, and the write uses dynamic partition OVERWRITE
  * — a replayed micro-batch (foreachBatch is at-least-once across
  * failures) replaces its own partitions instead of double-counting
  * postings. This is the parquet answer to the transactional-sink
  * problem; a plain `mode("append")` here would silently corrupt df/n
  * on every recovery replay.
  *
  * 100 TB shape: per-batch work is the bounded delta build (one grouped
  * pass over the batch); the artifact grows by delta partitions with no
  * read-modify-write of history, and the serving probe still prunes on
  * the bucket partition level under `batch=`. Segment-merge keeps the
  * partition count bounded: [[maybeMerge]] (wired into [[sink]] via
  * `mergeEvery`) folds committed segments into one manifest-committed
  * merged segment in-place, and [[compactTo]] folds everything into the
  * compact [[graft.operators.InvertedIndex]] layout offline.
  */
object StreamingLexIndex {

  /** Apply ONE micro-batch delta. Public (not an anonymous closure) so
    * the idempotence contract is directly testable: calling this twice
    * with the same `batchId` leaves the artifact byte-identical.
    */
  def applyBatch(batch: DataFrame, batchId: Long, dir: String,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    import spark.implicits._
    val delta = InvertedIndex.build(batch, idCol, textCol)
    def write(df: DataFrame, sub: String, parts: Seq[String]): Unit =
      df.withColumn("batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch" +: parts: _*)
        .parquet(s"$dir/$sub")
    write(delta.postings, "postings", Seq("bucket"))
    write(delta.docLens, "doclens", Nil)
    write(delta.termDf, "termdf", Nil)
    // the batch vocabulary's spell-suggestion deletion keys land as a
    // delta too (r13): per-batch partial dfs, re-summed at probe time —
    // the same merge contract as termdf — so a STREAMED artifact serves
    // suggestTerms from persisted keys instead of paying the per-call
    // vocabulary explode forever (the one build-once/probe-many asymmetry
    // the streaming index still had vs the batch artifact). The delta
    // repartitions ON the bucket column first (r14): the fine 1024-bucket
    // suggest grid × the build's task count would otherwise scatter each
    // micro-batch into ~task_count files per bucket dir — 16× the posting
    // grid's dir count, times the write parallelism, every batch, on the
    // long-running path where small-file pressure compounds until a merge
    // folds it. One shuffle of a batch-vocabulary-bounded relation buys
    // exactly one file per touched bucket.
    write(InvertedIndex.suggestRelation(delta.termDf)
      .repartition(col("bucket")), "suggest", Seq("bucket"))
    write(Seq((delta.n, delta.sdl)).toDF("n", "sdl"), "meta", Nil)
    // once a merge manifest governs the directory, every new segment must
    // register in it or the manifest-filtered load would never see it;
    // set semantics keep a replayed batch a no-op here too
    val (fs, root) = fsFor(spark, dir)
    if (fs.exists(new Path(root, "_segments"))) {
      val live = liveSegments(spark, dir)
      if (!live.contains(batchId)) writeManifest(fs, root, live :+ batchId)
    }
  }

  /** The streaming writer: attach a checkpoint and `.start()` (or
    * `.trigger(AvailableNow)` for catch-up runs). foreachBatch because
    * the delta build is batch-relational work (grouped rollups + a
    * partitioned write), not row-at-a-time state.
    *
    * `mergeEvery` > 0 turns on auto segment-merge: after each batch,
    * once the live segment count reaches the threshold, every COMMITTED
    * segment (id < the current batch — the current batch may still be
    * replayed and must stay its own overwrite-identity) folds into one
    * merged segment via [[maybeMerge]]. Probes are bit-identical across
    * the merge; only file geometry changes.
    */
  def sink(docs: DataFrame, dir: String, checkpoint: String,
      idCol: String = "doc_id", textCol: String = "text",
      mergeEvery: Int = 0)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    // reject a bad dial HERE, where it is passed — not on the first
    // micro-batch inside foreachBatch, after data already landed
    require(mergeEvery == 0 || mergeEvery >= 2,
      s"mergeEvery must be 0 (off) or >= 2, got $mergeEvery")
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b, id, dir, idCol, textCol)
        if (mergeEvery > 0) { maybeMerge(b.sparkSession, dir, mergeEvery, id); () }
      }
  }

  private val Relations = Seq("postings", "doclens", "termdf", "meta")
  // suggest joins the merge/sweep lifecycle but is OPTIONAL on read:
  // legacy segments (pre-r13) never wrote it, and load() only serves the
  // persisted dictionary when every live segment with a vocabulary has
  // its suggest partition
  private val MergeRelations = Relations :+ "suggest"

  // shared with the batch artifact: one definition of "resolve the
  // filesystem FROM the artifact path" (InvertedIndex.fsFor carries the
  // load-bearing rationale)
  private def fsFor(spark: SparkSession, dir: String): (FileSystem, Path) =
    InvertedIndex.fsFor(spark, dir)

  /** Live segment ids: the `_segments` manifest when present (the
    * merge-commit mechanism), else every `batch=` partition on disk —
    * the legacy layout, where all partitions are live by construction.
    */
  private[graft] def liveSegments(spark: SparkSession, dir: String): Seq[Long] = {
    val (fs, root) = fsFor(spark, dir)
    val manifest = new Path(root, "_segments")
    if (fs.exists(manifest)) {
      val in = fs.open(manifest)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.split("\n").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
    } else listSegments(fs, root, "meta")
  }

  // META is the listing source: every applied batch writes a meta row,
  // while a non-empty batch of all-separator texts writes NO postings
  // partition — listing postings would silently drop that batch's (n,
  // sdl) contribution at first-merge manifest bootstrap
  private def listSegments(fs: FileSystem, root: Path,
      sub: String): Seq[Long] = {
    val p = new Path(root, sub)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)
  }

  /** Atomic manifest cut-over: temp file + FileContext rename with
    * OVERWRITE — a single atomic replace on HDFS/local (an object store
    * needs its conditional put instead). A plain delete-then-rename
    * would open a no-manifest window in which the all-partitions-live
    * fallback double-counts a half-merged directory.
    */
  private def writeManifest(fs: FileSystem, root: Path, ids: Seq[Long]): Unit = {
    val tmp = new Path(root, s"_segments.tmp")
    val out = fs.create(tmp, true)
    try out.write(ids.sorted.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val live = new Path(root, "_segments")
    org.apache.hadoop.fs.FileContext.getFileContext(root.toUri, fs.getConf)
      .rename(tmp, live, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Auto segment-merge (the LSM rhythm, manifest-committed): when the
    * live segment count reaches `threshold`, fold every committed
    * segment — id < `currentBatch`; the current batch is excluded
    * because foreachBatch is at-least-once and a replay must keep its
    * own partition-overwrite identity — into ONE merged segment with the
    * reserved NEGATIVE id −(maxFoldedRealId+1), unique and monotone
    * across merges. Commit order makes every crash point safe:
    * (1) stage the consolidated relations and rename them in as the
    * merged segment's partitions — invisible until (2), because the
    * manifest still lists only the sources; (2) atomically swap the
    * manifest to {merged id, unfolded ids} — the commit point;
    * (3) best-effort delete of the folded partitions (a crash here
    * leaves orphans the manifest-filtered [[load]] never reads; the
    * orphan sweep at the top of EVERY maybeMerge call removes them on
    * the next batch). A replayed batch after a completed merge re-runs
    * this and finds the fold set below threshold — a no-op, so merge
    * composes with exactly-once.
    *
    * Single-writer by contract (a Structured Streaming sink is), so the
    * manifest read-modify-write needs no lock. Returns true if a merge
    * committed.
    */
  def maybeMerge(spark: SparkSession, dir: String, threshold: Int,
      currentBatch: Long): Boolean = {
    require(threshold >= 2, s"merge threshold must be >= 2, got $threshold")
    val (fs, root) = fsFor(spark, dir)
    val live = liveSegments(spark, dir)
    // orphan sweep: partitions a crashed post-commit cleanup left behind
    // are invisible to manifest-filtered loads but would leak disk
    // forever on the long-running path this sink exists for
    if (fs.exists(new Path(root, "_segments"))) {
      val liveSet = live.toSet
      MergeRelations.foreach { sub =>
        listSegments(fs, root, sub).filterNot(liveSet.contains).foreach {
          id => fs.delete(new Path(root, s"$sub/batch=$id"), true)
        }
      }
    }
    if (live.size < threshold) return false
    val fold = live.filter(_ < currentBatch)
    val keep = live.filterNot(fold.contains)
    val maxReal = fold.filter(_ >= 0)
    if (maxReal.isEmpty || fold.size < 2) return false
    val mid = -(maxReal.max + 1)
    // bootstrap the manifest BEFORE staging on a legacy dir: without one,
    // "all partitions live" would make the half-renamed merged segment
    // visible (double-count) if a crash lands between stage and commit
    if (!fs.exists(new Path(root, "_segments")))
      writeManifest(fs, root, live)
    // consolidated relations over ONLY the fold set
    val folded = loadSegments(spark, dir, fold)
    import spark.implicits._
    val staging = new Path(root, s"_merge-staging")
    fs.delete(staging, true)
    def stage(df: DataFrame, sub: String, parts: Seq[String]): Unit = {
      val w = df.write.mode("overwrite")
      (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
        .parquet(new Path(staging, sub).toString)
    }
    stage(folded.postings, "postings", Seq("bucket"))
    stage(folded.docLens, "doclens", Nil)
    stage(folded.termDf, "termdf", Nil)
    // the merged dictionary derives from the FOLDED termDf (merged dfs),
    // not a union of the per-batch deltas — exact by the same argument as
    // compact()'s re-derivation, and it upgrades legacy fold sets that
    // never wrote suggest deltas
    stage(InvertedIndex.suggestRelation(folded.termDf)
      .repartition(col("bucket")), "suggest", Seq("bucket"))
    stage(Seq((folded.n, folded.sdl)).toDF("n", "sdl"), "meta", Nil)
    // rename the staged relations in as the merged segment's partitions
    MergeRelations.foreach { sub =>
      fs.mkdirs(new Path(root, sub)) // legacy dir may lack suggest/
      val target = new Path(root, s"$sub/batch=$mid")
      fs.delete(target, true) // stale target from a crashed earlier attempt
      if (!fs.rename(new Path(staging, sub), target))
        throw new java.io.IOException(s"merge rename failed: $sub -> $target")
    }
    fs.delete(staging, true)
    writeManifest(fs, root, mid +: keep) // the commit point
    fold.foreach { id =>
      MergeRelations.foreach { sub =>
        fs.delete(new Path(root, s"$sub/batch=$id"), true)
      }
    }
    true
  }

  private def loadSegments(spark: SparkSession, dir: String,
      ids: Seq[Long]): InvertedIndex.LexIndex = {
    def rel(sub: String): DataFrame = {
      // mergeSchema only where the schema ever evolved (termdf gained
      // max_tf); the posting/doclens footers are uniform and many
      val reader =
        if (sub == "termdf") spark.read.option("mergeSchema", "true")
        else spark.read
      val df = reader.parquet(s"$dir/$sub")
      (if (ids == null) df else df.filter(col("batch").isin(ids: _*)))
        .drop("batch")
    }
    val meta = rel("meta").agg(
      coalesce(sum(col("n")), lit(0L)),
      coalesce(sum(col("sdl")), lit(0L))).collect()(0)
    // max_tf merges by MAX across batch deltas — the same exact merge
    // as InvertedIndex.load, with the same legacy fallback: pre-max_tf
    // batch deltas read null under mergeSchema and the Long.MaxValue
    // bound stays valid (loose) until a compactTo re-derivation
    val rawTermDf = rel("termdf")
    val termDf =
      (if (rawTermDf.columns.contains("max_tf"))
        rawTermDf.withColumn("max_tf",
          coalesce(col("max_tf"), lit(Long.MaxValue)))
      else rawTermDf.withColumn("max_tf", lit(Long.MaxValue)))
        .groupBy(col("term")).agg(sum(col("df")).as("df"),
          max(col("max_tf")).as("max_tf"))
    // the persisted spell dictionary serves ONLY when it covers the whole
    // live vocabulary: every live segment must have its suggest partition
    // or no postings at all (no postings ⇒ nothing to suggest). A legacy
    // segment (pre-r13, postings but no suggest delta) fails the check
    // and the probe falls back to per-call derivation — correct, just
    // unamortized — until a merge fold re-derives the dictionary over it.
    // The check is pure directory metadata, bounded by the segment count.
    val (fs, root) = fsFor(spark, dir)
    val liveIds = if (ids != null) ids else listSegments(fs, root, "meta")
    val covered = fs.exists(new Path(root, "suggest")) &&
      liveIds.forall(id =>
        fs.exists(new Path(root, s"suggest/batch=$id")) ||
        !fs.exists(new Path(root, s"postings/batch=$id")))
    val suggest =
      if (covered) {
        val sk = spark.read.parquet(s"$dir/suggest")
          .filter(col("batch").isin(liveIds: _*)).drop("batch")
        // pre-merge per-batch partial dfs exactly like InvertedIndex.load
        // merges append deltas; a single live segment (post-merge steady
        // state) serves a bare unique-keyed scan
        if (liveIds.size <= 1) Some(sk)
        else Some(sk.groupBy(col("term"), col("__qk"), col("bucket"))
          .agg(sum(col("df")).as("df")))
      } else None
    InvertedIndex.LexIndex(
      rel("postings"),
      rel("doclens"),
      termDf,
      meta.getLong(0), meta.getLong(1), suggest)
  }

  /** Assemble the live index. The `batch` partition column is dropped
    * from the relations (it is the write's identity, not index data);
    * termdf and meta re-aggregate exactly as
    * [[graft.operators.InvertedIndex.load]] does for appended deltas.
    * When a `_segments` manifest exists (auto-merge has run), only the
    * manifested live segments are read — dead partitions a crashed
    * cleanup left behind stay invisible; without a manifest every
    * partition is live (the legacy layout).
    */
  def load(spark: SparkSession, dir: String): InvertedIndex.LexIndex = {
    val (fs, root) = fsFor(spark, dir)
    val ids =
      if (fs.exists(new Path(root, "_segments"))) liveSegments(spark, dir)
      else null
    val base = loadSegments(spark, dir, ids)
    // the takedown story holds on the LIVE streamed layout too (r14 —
    // the batch artifact and StreamingVecIndex already had it):
    // InvertedIndex.delete(ids, dir) tombstones apply exactly at load,
    // relation-for-relation equal to a rebuild over the surviving
    // corpus, without waiting for a compactTo fold. maybeMerge leaves
    // the tombstone relation untouched (it is not a segment), so
    // deletions survive segment folds; compactTo writes a CLEAN compact
    // artifact (load already applied the tombstones) — re-delete against
    // the new directory is not needed because the dead docs are gone
    // from the folded relations themselves.
    if (fs.exists(new Path(root, "tombstones")))
      InvertedIndex.applyTombstones(spark, base, dir)
    else base
  }

  /** The segment-merge rhythm's offline half: fold every ingested batch
    * partition into the compact [[graft.operators.InvertedIndex]]
    * layout at `outDir` (one bucket-partitioned posting relation, merged
    * termdf, one meta row). Probes against the folded artifact are
    * bit-identical to probes against the live streaming layout — the
    * relations are the same; only the file geometry changes. Run it
    * when accumulated `batch=` partition counts start to tax listing
    * and planning; the stream keeps appending to `dir` meanwhile, and
    * the cut-over is the versioned-artifact-directory swap.
    */
  def compactTo(spark: SparkSession, dir: String, outDir: String): Unit = {
    val idx = load(spark, dir)
    val (fs, root) = fsFor(spark, dir)
    // under live tombstones, load() carries each term's STORED max_tf
    // through (a valid but loose bound — the max over survivors can only
    // be ≤ it). The fold already pays a full posting rewrite, so tighten
    // the WAND bound back to the exact statistic here, exactly as
    // InvertedIndex.compact re-derives it — a folded artifact must not
    // carry a permanently looser pruning bound than a rebuilt one.
    val folded =
      if (fs.exists(new Path(root, "tombstones")))
        idx.copy(termDf = idx.postings.groupBy(col("term"))
          .agg(count(lit(1)).as("df"), max(col("tf")).as("max_tf")))
      else idx
    InvertedIndex.save(folded, outDir)
  }
}
