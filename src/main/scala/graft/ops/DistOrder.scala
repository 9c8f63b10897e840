package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Distributed total-order primitives — the scale-safe replacements for
  * `Window.orderBy(...)` with no `partitionBy`, which moves every row to a
  * single partition (Spark's own WindowExec warns about it; at 100 TB it
  * simply does not finish).
  *
  * Both primitives follow the reference's per-rank independence invariant
  * (/root/reference/src/file_io.cu:39-56: ranks own aligned slices and
  * never coordinate) lifted to range partitions: do the O(rows) work
  * partition-parallel over a range-partitioned sort, then reconcile at
  * partition boundaries with O(#partitions) driver state — exactly how
  * the encode kernel stitches per-chunk metadata into a manifest.
  */
object DistOrder {

  /** One RLE run local to a range partition: `idx` is the run's ordinal
    * within its partition, `len` its row count. */
  final case class LocalRun(part: Int, idx: Long, v: String, len: Long)

  /** Per-partition boundary summary: `m` local runs, first/last run value.
    * Rides back on an accumulator from the run-detect pass itself, so the
    * stitch needs NO separate aggregation job over the runs table. */
  final case class PartSummary(part: Int, m: Long, firstV: String, lastV: String)

  /** Global RLE runs of `valueCol` over the total order given by
    * `sortCols`, without a global sort:
    *
    *  1. range-repartition + sort within partitions on the sort key;
    *  2. per-partition run detection (one streaming pass, mapPartitions);
    *  3. stitch: per partition only (firstV, lastV, #runs) goes to the
    *     driver — K rows for K partitions — which chains boundary runs
    *     whose values match across adjacent partitions and assigns each
    *     partition a global run-id base;
    *  4. boundary runs sharing a global id are summed by a final groupBy.
    *
    * Returns (run_id starting at 1 in key order, val, run_len) — the same
    * result as the single-partition `lag`+running-`sum` window oracle, at
    * per-partition parallelism. The RLE semantics mirror the reference's
    * run-boundary mask + scan design (IMPLEMENTATION-PLAN.md:93-123).
    *
    * NULL semantics: consecutive NULLs form ONE run (null is a value, as
    * in a codec's null bitmap). The matching SQL oracle must use a
    * null-SAFE break test — `lag(v) OVER w IS DISTINCT FROM v` — NOT the
    * three-valued `lag(v) IS NULL OR lag(v) <> v`, whose NULL<>v = NULL
    * quirk would merge a NULL row into the preceding non-null run and
    * split consecutive NULLs. (Both current callers pass non-null
    * columns, where the two forms agree.)
    */
  def runs(df: DataFrame, sortCols: Seq[String], valueCol: String, numParts: Int): DataFrame = {
    val spark = df.sparkSession
    // internal alias must not shadow a caller's sort column (two columns
    // named alike -> ambiguous-reference AnalysisException downstream)
    require(!sortCols.contains("__graft_v"),
      "runs: sort column name __graft_v collides with the internal value alias")
    val keyCols = sortCols.map(col)
    val parted = df
      .select(col(valueCol).cast("string").as("__graft_v") +: keyCols: _*)
      .repartitionByRange(numParts, keyCols: _*)
      .sortWithinPartitions(keyCols: _*)
      .select(col("__graft_v"))

    // Boundary summaries ride back on an accumulator from the SAME pass
    // the eager localCheckpoint below runs, so the stitch costs ZERO extra
    // jobs (the old shape ran a groupBy+collect over the whole runs table
    // just to recover K boundary rows). Accumulator updates happen in a
    // transformation — at-least-once under task retry — so summaries are
    // deduped by partition with a loud agreement check: duplicate-key sort
    // ties could in principle let twin attempts detect different runs, and
    // an arbitrary pick would silently mis-stitch global ids (both current
    // callers sort by UNIQUE keys, where twins always agree).
    val sumAcc = spark.sparkContext
      .collectionAccumulator[PartSummary]("graft.distorder.runs.summaries")
    val localRuns = parted.mapPartitions { rows =>
      val part = TaskContext.getPartitionId()
      new Iterator[LocalRun] {
        private var idx = -1L
        private var cur: String = null
        private var len = 0L
        private var firstV: String = null
        private var pending: LocalRun = null
        private var exhausted = false
        private def emit(): LocalRun = {
          idx += 1
          if (idx == 0L) firstV = cur
          LocalRun(part, idx, cur, len)
        }
        def hasNext: Boolean = {
          while (pending == null && !exhausted) {
            if (rows.hasNext) {
              val v = rows.next().getString(0)
              if (len == 0L) { cur = v; len = 1L }
              else if (v == cur) len += 1L
              else { pending = emit(); cur = v; len = 1L }
            } else {
              exhausted = true
              if (len > 0L) pending = emit()
              // one summary per non-empty partition, flushed exactly when
              // the task has produced all its rows (empty partitions emit
              // nothing — the stitch skips absent parts, as before)
              if (idx >= 0L) sumAcc.add(PartSummary(part, idx + 1L, firstV, cur))
            }
          }
          pending != null
        }
        def next(): LocalRun = { val r = pending; pending = null; r }
      }
    }(Encoders.product[LocalRun])
      // The boundary summaries and the final rows must see the IDENTICAL
      // local runs. persist() is not enough: it is best-effort, and a lost
      // block would be RECOMPUTED — with duplicate sort keys the tie order
      // (and so the run structure) of the recompute can differ from what
      // the summaries were built from, silently mis-stitching global run
      // ids. localCheckpoint truncates lineage entirely: blocks cannot be
      // recomputed, only lost loudly. (Blocks are released by the
      // ContextCleaner once this Dataset goes out of scope — the method
      // returns only the merged result below.)
      .localCheckpoint(true)

    // O(#partitions) boundary state on the driver; never payload rows
    val summaries: Array[PartSummary] = {
      import scala.jdk.CollectionConverters._
      sumAcc.value.asScala
        .groupBy(_.part).map { case (part, twins) =>
          require(twins.forall(_ == twins.head),
            s"runs: partition $part task attempts detected DIFFERENT local runs " +
              s"(${twins.toSet}) — non-unique sort keys under a task retry? " +
              "Provide a total-order sort key.")
          twins.head
        }
        .toArray.sortBy(_.part)
    }

    var prevId = 0L // run ids start at 1, matching sum-of-breaks oracles
    var prevV: String = null
    var havePrev = false
    val baseB = Map.newBuilder[Int, Long]
    val countB = Map.newBuilder[Int, Long]
    summaries.foreach { s =>
      val merges = havePrev && s.firstV == prevV
      val b = if (merges) prevId else prevId + 1
      baseB += s.part -> b
      countB += s.part -> s.m
      prevId = b + s.m - 1
      prevV = s.lastV
      havePrev = true
    }
    // deliberately NOT destroy()ed here: the returned DataFrame is LAZY
    // and its plan references these broadcasts (and the checkpointed
    // localRuns blocks) — an eager destroy would crash the caller's
    // first action. The ContextCleaner releases them once the returned
    // Dataset goes out of scope, which is the correct owner for
    // resources that must outlive this method.
    val baseBc = spark.sparkContext.broadcast(baseB.result())
    val countBc = spark.sparkContext.broadcast(countB.result())

    import spark.implicits._
    // Only a partition's FIRST or LAST run can share its global id with
    // another partition's run (a chain covering a whole partition means
    // m == 1 and that single run IS an edge run), so only edge runs go
    // through the merge shuffle — O(2 * numParts) rows. Interior runs are
    // final as assigned and flow through NARROW: the old groupBy over the
    // whole run set re-shuffled O(#runs) rows (for a low-run-length
    // column, ~#rows at the design scale) to merge at most 2*(numParts-1)
    // of them, and map-side combine bought nothing since run ids are
    // almost all unique.
    val assigned = localRuns.map { r =>
      val edge = r.idx == 0L || r.idx == countBc.value(r.part) - 1L
      (baseBc.value(r.part) + r.idx, r.v, r.len, edge)
    }.toDF("run_id", "val", "run_len", "edge")
    val interior = assigned.filter(!col("edge"))
      .select(col("run_id"), col("val"), col("run_len"))
    val mergedEdges = assigned.filter(col("edge"))
      .groupBy(col("run_id"))
      .agg(min(col("val")).as("val"), sum(col("run_len")).as("run_len"))
    // returned LAZY over the checkpointed runs (narrow reads of the
    // blocks): the old eager localCheckpoint here re-materialized the
    // whole merged result as one extra job per call just to release the
    // intermediate's blocks a little earlier — both block sets are
    // O(#runs) and the ContextCleaner frees them when the returned
    // Dataset goes out of scope, so the extra materialization bought
    // nothing a single-action consumer (the normal case) ever saw.
    interior.union(mergedEdges)
  }

  /** Per-partition contribution to one ntile bucket. */
  final case class BucketPart(bucket: Long, cnt: Long, lo: Long, hi: Long)

  /** Exact `ntile(tiles)` bucket stats over the total order of a numeric
    * key, without a global sort: per-partition row counts (K longs) give
    * each range partition its global rank offset; each partition then
    * assigns buckets locally with ntile's exact fill rule (first
    * `total % tiles` buckets take one extra row) and emits per-bucket
    * partials, merged by a final groupBy. Returns (bucket, cnt, lo, hi).
    */
  def ntileRanges(df: DataFrame, keyCol: String, tiles: Int, numParts: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(tiles >= 1, s"ntileRanges: tiles must be >= 1, got $tiles")
    // the key is ranked AS A LONG; silently truncating a fractional type
    // would bucket different values together and diverge from a window
    // ntile over the raw column — refuse instead
    require(df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }, s"ntileRanges: key column '$keyCol' must be an integral type, got " +
      s"${df.schema(keyCol).dataType.catalogString} (a fractional key would be " +
      "silently truncated and diverge from window ntile over the raw values)")
    // Per-partition row counts ride back on an accumulator from the SAME
    // pass the eager localCheckpoint runs (the old persist + count pass
    // shape paid a dedicated job for them). A row COUNT is attempt-
    // invariant — no tie-order hazard — so at-least-once accumulator
    // delivery dedupes by partition with no agreement check needed.
    // Long counter: Iterator.size returns Int and would wrap negative
    // past 2^31 rows/partition (silent rank corruption at design scale).
    val cntAcc = spark.sparkContext
      .collectionAccumulator[(Int, Long)]("graft.distorder.ntile.counts")
    val parted = df
      .select(col(keyCol).cast("bigint").as("k"))
      .repartitionByRange(numParts, col("k"))
      .sortWithinPartitions(col("k"))
      .mapPartitions { it =>
        val part = TaskContext.getPartitionId()
        new Iterator[Row] {
          private var n = 0L
          private var flushed = false
          def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && !flushed) { flushed = true; cntAcc.add((part, n)) }
            h
          }
          def next(): Row = { n += 1L; it.next() }
        }
      }(Encoders.row(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType)))))
      // both passes must see identical partition boundaries; lineage-
      // truncated blocks, not best-effort persist (see `runs` above)
      .localCheckpoint(true)

    val counts: Map[Int, Long] = {
      import scala.jdk.CollectionConverters._
      cntAcc.value.asScala.groupBy(_._1).map { case (p, vs) => p -> vs.head._2 }
    }
    val ordered = counts.keys.toSeq.sorted
    val offsets = ordered.zip(ordered.scanLeft(0L)((acc, p) => acc + counts(p))).toMap
    val total = counts.values.sum
    val size = total / tiles
    val rem = total % tiles
    val offsetsBc = spark.sparkContext.broadcast(offsets)

    def bucketOf(rank: Long): Long =
      if (rank < rem * (size + 1)) rank / (size + 1) + 1
      else rem + (rank - rem * (size + 1)) / math.max(1L, size) + 1

    val partials = parted.mapPartitions { rows =>
      var rank = offsetsBc.value(TaskContext.getPartitionId())
      new Iterator[BucketPart] {
        private var pending: BucketPart = null
        private var curBucket = -1L
        private var cnt = 0L
        private var lo = 0L
        private var hi = 0L
        private var exhausted = false
        def hasNext: Boolean = {
          while (pending == null && !exhausted) {
            if (rows.hasNext) {
              val row = rows.next()
              // fail with intent, not an opaque NPE: window ntile sorts
              // nulls first, which this key-typed primitive does not model
              require(!row.isNullAt(0),
                "ntileRanges: null key values are not supported — filter or coalesce the key first")
              val k = row.getLong(0)
              val b = bucketOf(rank)
              rank += 1
              if (b == curBucket) { cnt += 1; hi = k }
              else {
                if (cnt > 0) pending = BucketPart(curBucket, cnt, lo, hi)
                curBucket = b; cnt = 1; lo = k; hi = k
              }
            } else {
              exhausted = true
              if (cnt > 0) pending = BucketPart(curBucket, cnt, lo, hi)
            }
          }
          pending != null
        }
        def next(): BucketPart = { val r = pending; pending = null; r }
      }
    }(Encoders.product[BucketPart])

    // <= `tiles` rows, returned LAZY over the checkpointed keyed rows:
    // the old eager localCheckpoint here paid one extra job per call just
    // to unpersist the keyed rows early — the ContextCleaner releases the
    // checkpoint blocks when the returned Dataset goes out of scope.
    partials.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("cnt"), min(col("lo")).as("lo"), max(col("hi")).as("hi"))
  }
}
