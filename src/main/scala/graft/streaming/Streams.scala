package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming twins of the batch operators: the same engagement
  * pipeline fed incrementally. Event-time windows with watermarks bound
  * state; gap sessionization keeps per-user state in
  * flatMapGroupsWithState (the streaming twin of operators.Sessionize).
  *
  * At scale: state is hash-partitioned by the group key across executors;
  * the watermark bounds state size; sinks are idempotent per micro-batch.
  */
object Streams {

  /** Schema of the events stream as the tests feed it (ts already µs). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming tumbling-window aggregation: twin of the batch
    * `tumbling_window_agg` query (same window + aggs, plus a watermark to
    * bound state).
    */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("val_sum"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("val_sum"))

  /** Streaming sliding-window counts: twin of the batch `sliding_window_agg`
    * query (overlapping windows; each event lands in windowLen/slide
    * windows, watermark bounds state).
    */
  def slidingCounts(events: DataFrame, windowLen: String = "2 hours", slide: String = "1 hour",
                    watermark: String = "3 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Streaming trending values: per tumbling window, the Misra-Gries
    * top-k of a string column — the always-on twin of the batch
    * `topk_values_sketch` row (trending tokens/urls/agents in an ingest
    * feed). Per-window state is capacity-bounded regardless of the value
    * domain, which is what makes an unbounded-domain top-k safe as
    * streaming state; the watermark bounds how many windows are live.
    */
  def heavyHittersStream(rows: DataFrame, value: Column, tsCol: String,
                         windowLen: String = "1 hour", watermark: String = "2 hours",
                         capacity: Int = 1024, k: Int = 5): DataFrame =
    rows.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(graft.functions.HeavyHittersAgg.heavyHitters(value, capacity, k).as("__hh"))
      .select(col("window.start").as("win_start"), posexplode(col("__hh")).as(Seq("__pos", "__e")))
      .select(col("win_start"), (col("__pos") + 1).cast("int").as("rank"),
        col("__e.value").as("value"), col("__e.cnt").as("cnt"))

  /** Native session windows on a stream — the built-in-operator twin of
    * the flatMapGroupsWithState sessionizer: Spark's gap-merge
    * (MergingSessionsExec) maintains per-(user, open-session) state,
    * merges touching windows across micro-batches, and EMITS a session
    * only once the watermark passes its end (append mode) — at-most-one
    * final row per session, the contract a downstream sink wants.
    * State is one row per OPEN session per user (closed sessions leave the
    * store at watermark passage), so idle users cost nothing.
    * Same inclusive gap boundary as the batch `session_window_agg` row.
    *
    * The watermark delay is the lateness budget: any row arriving more
    * than `watermark` behind the max seen event time is DROPPED by the
    * operator — size it to the feed's real disorder (the spec drives an
    * out-of-order replay with a span-sized watermark to prove batch
    * equality without loss).
    */
  def sessionWindowStream(rows: DataFrame, tsCol: String,
                          gap: String = "30 minutes",
                          watermark: String = "0 seconds"): DataFrame =
    rows.filter(col(tsCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(col("user_id"), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("win_start"),
        col("sw.end").as("win_end"), col("n_events"))

  /** Streaming audit sampling: per tumbling window, a deterministic
    * exactly-k sample of ids from the bounded bottom-k-by-digest aggregate
    * — the always-on twin of the batch `sample_stratified` row (pull k
    * rows per hour for human review without ever buffering the window).
    * Per-window state is k (digest, id) pairs regardless of traffic; the
    * same salted-digest order means a batch replay picks the identical
    * rows. */
  def sampleStream(rows: DataFrame, id: Column, tsCol: String,
                   windowLen: String = "1 hour", watermark: String = "2 hours",
                   k: Int = 10, salt: String = "sample"): DataFrame =
    rows.withWatermark(tsCol, watermark)
      .withColumn("__id", id)
      .withColumn("__dig", md5(concat(lit(salt + ":"), col("__id").cast("string"))))
      .groupBy(window(col(tsCol), windowLen))
      .agg(graft.functions.BottomKAgg.bottomKByKey(col("__dig"), col("__id"), k).as("__picks"))
      .select(col("window.start").as("win_start"), posexplode(col("__picks")).as(Seq("__pos", "__pick")))
      .select(col("win_start"), (col("__pos") + 1).cast("int").as("rank"),
        col("__pick.id").as("id"))

  /** Streaming distribution monitoring: per tumbling window, quantiles of
    * a numeric column from the bounded-state streaming-histogram sketch —
    * the always-on twin of the batch `value_quantiles_sketch` row (latency
    * / message-length / quality-score percentiles over an ingest feed).
    * Per-window state is capacity centroids regardless of how many rows
    * or distinct values the window sees; the watermark bounds how many
    * windows are live. The sketch buffer round-trips the state store
    * between micro-batches exactly like the heavy-hitters twin.
    */
  def quantilesStream(rows: DataFrame, value: Column, tsCol: String,
                      windowLen: String = "1 hour", watermark: String = "2 hours",
                      capacity: Int = 1024,
                      qsPerMille: Seq[Int] = Seq(500, 950)): DataFrame =
    rows.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(graft.functions.QuantileSketchAgg.quantiles(value, capacity, qsPerMille).as("__q"))
      .select(col("window.start").as("win_start"), posexplode(col("__q")).as(Seq("__pos", "q_value")))
      .select(col("win_start"),
        element_at(typedLit(qsPerMille.map(_ / 1000.0)), col("__pos") + 1).as("q"),
        col("q_value"))

  /** Streaming audience sketches: per tumbling window, the theta sketch of
    * a key column — the always-on producer for the overlap/retention/churn
    * dashboards (`Engagement.overlapMatrix` reads the persisted bytes; a
    * foreachBatch sink appends each window's sketch row). Per-window state
    * is <= ~8·nominalEntries bytes regardless of key cardinality; in the
    * exact regime the emitted bytes are identical to the batch sketch of
    * the same rows.
    */
  def thetaSketchStream(rows: DataFrame, key: Column, tsCol: String,
                        windowLen: String = "1 hour", watermark: String = "2 hours",
                        nominalEntries: Int = 4096): DataFrame =
    rows.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(graft.functions.ThetaSketchAgg.thetaSketch(key, nominalEntries).as("sketch"))
      .select(col("window.start").as("win_start"), col("sketch"))

  /** Streaming ingest dedup: the streaming twin of snapshot dedup — drop
    * repeated keys, with the watermark bounding how long a key is
    * remembered (the reference dedups on origin_id at ingest;
    * rapid_pro_to_engagement_db.py:175).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String], tsCol: String, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCols)

  /** Streaming near-dup screening against a PERSISTED archive index — the
    * streaming twin of `Dedup.incrementalCandidates`: each incoming
    * document's minhash band keys (row-local fused expression, stateless)
    * join the static band-key index of the already-ingested corpus
    * (stream-static join; the static side's FILE LISTING is snapshotted
    * when the DataFrame is created, so a republished index needs a query
    * restart to be seen — same contract as engagementStream's deny
    * lists). Emits (new_doc, index_doc) candidate
    * rows; a doc pair sharing several bands emits once per band — dedup
    * per micro-batch at the sink (`foreachBatch` + distinct), where it is
    * a plain batch operation, instead of holding pair state on the stream.
    */
  def nearDupCandidatesStream(docs: DataFrame, id: org.apache.spark.sql.Column,
                              text: org.apache.spark.sql.Column, bandIndex: DataFrame,
                              n: Int, numPerms: Int, bandSize: Int): DataFrame = {
    import graft.dedup.Dedup
    Dedup.bandKeys(Dedup.minhashSignatures(docs, id, text, n, numPerms), numPerms, bandSize)
      .withColumnRenamed("doc_id", "new_doc")
      .join(bandIndex.withColumnRenamed("doc_id", "index_doc"), Seq("band", "bk"))
      .select(col("new_doc"), col("index_doc"))
  }

  /** Streaming curation: quality-filter decision + PII masking applied to a
    * document stream. Every signal is row-local (fused expressions), so the
    * streaming plan is STATELESS — no watermark, no state store, unbounded
    * uptime — and produces exactly the batch operators' output on the same
    * rows. This is the shape an always-on ingest-and-curate pipeline runs:
    * dedupStream bounds the keyed state, curateStream costs none.
    */
  def curateStream(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("decision", graft.text.TextFeatures.filterDecision(col(textCol)))
      .withColumn("redacted", graft.text.Redact.redactPii(col(textCol)))
      .filter(col("decision") === "kept")

  /** Streaming anomaly scoring — the always-on twin of the batch
    * `zscore_outliers` sweep: moments are TRAINED on the batch archive
    * (`Stats.groupMoments`, group-cardinality, attached to the plan as a
    * broadcast stream-static join), each arriving row scores STATELESSLY
    * (no watermark, no state store) and only the ≥ zMin outliers emit.
    * Quantization and IEEE shapes are shared with the batch path
    * (`Stats.scoreAgainstMoments`), so stream-scored rows are
    * bit-identical to batch-scored rows; retraining the moments means
    * restarting the query (the pqEncodeStream snapshot-at-start
    * contract).
    */
  def anomalyScoreStream(rows: DataFrame, group: org.apache.spark.sql.Column,
                         id: org.apache.spark.sql.Column, value: org.apache.spark.sql.Column,
                         moments: DataFrame, zMin: Double): DataFrame =
    graft.analysis.Stats.scoreAgainstMoments(rows, group, id, value, moments, zMin)

  /** Streaming categorical encoder — encode-on-ingest against a
    * batch-trained table (`Stats.targetEncodeTable`): each arriving row
    * joins its category's mean target stream-static (broadcast,
    * STATELESS — no watermark, no state store); unseen categories fall
    * back to the supplied global mean instead of dropping or nulling.
    * Serving uses the plain category mean by design: an arriving row was
    * never in the training data, so the batch side's leave-one-out
    * correction does not apply — spec pins both the known-category
    * equality and the fallback.
    */
  def targetEncodeStream(rows: DataFrame, category: org.apache.spark.sql.Column,
                         teTable: DataFrame, globalMean: Double): DataFrame =
    rows.withColumn("__cat", category)
      .join(broadcast(teTable.select(col("category").as("__cat"),
        col("te_mean").as("__te"))), Seq("__cat"), "left")
      .withColumn("te", coalesce(col("__te"),
        lit(graft.util.Portable.round6d(globalMean))))
      .drop("__cat", "__te")

  /** Streaming PSI drift monitor — the always-on twin of the batch
    * `psi_drift` audit: the baseline (decile edges + bucket proportions,
    * `Stats.psiBaseline`) is TRAINED on the batch archive and held
    * driver-side (pqEncodeStream's snapshot-at-start contract —
    * retraining means restarting the query), and each event-time
    * tumbling window folds to ONE row of fixed per-bucket conditional
    * counts — a single stateful aggregation, no second agg level — from
    * which the PSI is a row-local expression: the same 1e-6-clipped
    * ratios, q6'd (p−q)·ln(p/q) terms and exact DECIMAL sum as the batch
    * plan, so a stream-scored window equals `psiDrift` run over the same
    * rows (StreamingSourcesSpec pins the equality). Emits
    * (win_start, n, psi, shifted) per closed window.
    */
  def psiDriftStream(rows: DataFrame, tsCol: String,
                     value: org.apache.spark.sql.Column,
                     edges: Array[Double], baseP: Array[Double],
                     windowLen: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    require(edges.length + 1 == baseP.length,
      s"edges/baseP arity mismatch: ${edges.length} + 1 != ${baseP.length}")
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val r6 = graft.util.Portable.round6 _
    val bucket = edges.map(e => when(value > lit(e), 1).otherwise(0))
      .reduce(_ + _)
    val counts = baseP.indices.map(i =>
      sum(when(col("__b") === i, 1L).otherwise(0L)).as(s"__c$i"))
    val agged = rows
      .filter(value.isNotNull && col(tsCol).isNotNull)
      .withColumn("__b", bucket)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(counts.head, counts.tail: _*)
      .withColumn("__n", baseP.indices.map(i => col(s"__c$i")).reduce(_ + _))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val terms = baseP.indices.map { i =>
      val p = greatest(lit(baseP(i)), lit(0.000001))
      val q = greatest(d(col(s"__c$i")) / d(col("__n")), lit(0.000001))
      q6((p - q) * log(p / q)).cast("decimal(28,6)")
    }
    agged.select(col("window.start").as("win_start"), col("__n").as("n"),
        r6(terms.reduce(_ + _).cast("double")).as("psi"))
      .withColumn("shifted", col("psi") > 0.2)
  }

  /** Streaming twin of Pq.encode — encode-on-ingest for an always-on
    * embedding feed. The fused row-local kernel makes this a STATELESS
    * streaming plan (pure projection: no watermark, no state store), so
    * each arriving vector becomes its m-int PQ code immediately and the
    * index hot tail is built at ingest time — the archive never needs an
    * encode backfill pass. The codebook is driver-held and attached to
    * the plan; retraining means restarting the query with the new
    * codebook (the same snapshot-at-start contract as engagementStream's
    * deny-lists).
    */
  def pqEncodeStream(vecs: DataFrame, codebook: Array[Array[Array[Double]]]): DataFrame =
    vecs.select(col("id"),
      graft.functions.VectorExpressions.pqEncodeCodes(col("vec"), codebook).as("codes"))

  /** Streaming twin of the composed engagement flow: the SAME
    * `EngagementPipeline.messagesExport` plan applied to an unbounded
    * frame — stream-static broadcast anti-joins against the deny-lists
    * plus row-local flags, so the plan is STATELESS (nothing in the state
    * store, no watermark needed) and the batch and streaming flows cannot
    * drift. Deny-lists are static tables snapshotted at query start; a
    * consent withdrawal takes effect on restart, and retroactive cleanup
    * remains the batch full run (same contract as the incremental state).
    */
  def engagementStream(messages: DataFrame, user: String, dataset: org.apache.spark.sql.Column,
                       ts: org.apache.spark.sql.Column, from: String, until: String,
                       testDeny: DataFrame, withdrawn: DataFrame,
                       wsMoveOfCode: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                       wsPrefix: String, codeValue: org.apache.spark.sql.Column,
                       idCol: org.apache.spark.sql.Column, valueCol: org.apache.spark.sql.Column,
                       missingCode: String): DataFrame =
    graft.analysis.EngagementPipeline.messagesExport(messages, user, dataset, ts,
      from, until, testDeny, withdrawn, wsMoveOfCode, wsPrefix, codeValue,
      idCol, valueCol, missingCode)

  /** The per-stage accounting for a streaming ingest: call from
    * `foreachBatch` to append each micro-batch's mergeable funnel state
    * (counts + HLL participant sketch per stage x dataset) to a state
    * table; dashboards read `EngagementPipeline.mergeFunnelStates` over
    * the table. Each batch pays only for its own rows — the archive is
    * never rescanned. RE-ORDERING is safe (sketch union and sums are both
    * commutative) but REPLAY is not: only the sketch is replay-idempotent,
    * while n_rows/n_imputed are sums that double-count a re-delivered
    * batch, silently inflating rows-per-participant. This helper's parquet
    * write is NOT transactional with the stream checkpoint, so replay
    * safety comes from the write layout itself: each epoch lands under its
    * own `batch_id=<epoch>` subdirectory with mode OVERWRITE, so a
    * redelivered foreachBatch epoch REPLACES its own files rather than
    * appending a second copy. Readers (`mergeFunnelStates` over
    * `spark.read.parquet(statePath)`) see `batch_id` as a discovered
    * partition column and ignore it in the merge keys.
    */
  def appendFunnelState(batch: DataFrame, batchId: Long, statePath: String, user: String,
                        dataset: org.apache.spark.sql.Column,
                        ts: org.apache.spark.sql.Column, from: String, until: String,
                        testDeny: DataFrame, withdrawn: DataFrame,
                        wsMoveOfCode: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                        wsPrefix: String, codeValue: org.apache.spark.sql.Column,
                        lgK: Int = 12): Unit =
    graft.analysis.EngagementPipeline.funnelState(batch, user, dataset, ts,
      from, until, testDeny, withdrawn, wsMoveOfCode, wsPrefix, codeValue, lgK)
      .write.mode("overwrite").parquet(s"$statePath/batch_id=$batchId")

  /** Streaming interval join — the streaming twin of
    * `operators.RangeJoin.pointInInterval`: a point stream joined into an
    * interval stream on `ts ∈ [start, end)`, both sides unbounded.
    *
    * Stream-stream joins REQUIRE an equality predicate, and the same grid
    * rewrite as the batch operator provides it: points key to their time
    * cell, intervals explode to covered cells, the join keys on the cell
    * with the range as residual — so state is also hash-partitioned by
    * cell rather than held in one global relation.
    *
    * Eviction needs the join condition to bound the two event times in
    * both directions, so the maximum interval length is declared: the
    * condition carries `ts < start + maxSpan` (with `ts >= start` this
    * pins `start ∈ (ts − maxSpan, ts]`). For the data that conjunct is
    * redundant (every interval satisfies end − start ≤ maxSpan); for the
    * ENGINE it is what lets an interval row be dropped once the point
    * watermark passes — state on both sides stays O(watermark + maxSpan
    * of traffic), independent of stream length.
    */
  def intervalJoinStream(points: DataFrame, tsCol: String,
                         intervals: DataFrame, startCol: String, endCol: String,
                         bucketSeconds: Long, maxSpan: String, watermark: String,
                         maxCellsPerInterval: Int = 100000): DataFrame = {
    import graft.operators.RangeJoin
    graft.util.TempCols.assertFree(points, "__pcell")
    graft.util.TempCols.assertFree(intervals, "__icell")
    val spanBound = col(startCol) + expr(s"INTERVAL $maxSpan")
    val p = points.withWatermark(tsCol, watermark)
      .withColumn("__pcell", RangeJoin.cellOf(col(tsCol), bucketSeconds))
    // an interval longer than maxSpan would SILENTLY lose its tail matches
    // to the eviction conjunct below — raise on the offending row instead
    // of quietly diverging from the batch twin. NULL bounds stay SQL-null
    // (no match, no crash), mirroring coveredCells.
    val spanOk = col(endCol) <= spanBound
    val iv = intervals.withWatermark(startCol, watermark)
      .withColumn(endCol, when(spanOk.isNull, lit(null).cast("timestamp"))
        .when(spanOk, col(endCol))
        .otherwise(raise_error(concat(
          lit(s"intervalJoinStream: interval longer than maxSpan=$maxSpan: "),
          col(startCol).cast("string"), lit(" .. "), col(endCol).cast("string")))
          .cast("timestamp")))
      .withColumn("__icell",
        RangeJoin.coveredCells(col(startCol), col(endCol), bucketSeconds, maxCellsPerInterval))
    // bind every join-condition column to its source frame: with bare
    // col() a column name present on BOTH sides (e.g. intervals derived
    // from the same feed and still carrying the points' ts column) would
    // fail analysis with AMBIGUOUS_REFERENCE — the batch twin
    // (RangeJoin.pointInInterval) avoids this the same way
    p.join(iv,
        p("__pcell") === iv("__icell") &&
          p(tsCol) >= iv(startCol) &&
          p(tsCol) < iv(endCol) &&
          p(tsCol) < iv(startCol) + expr(s"INTERVAL $maxSpan"))
      .drop("__pcell", "__icell")
  }

  case class PointEv(pid: Long, ts: java.sql.Timestamp)
  case class IntervalEv(iid: String, start_hour: java.sql.Timestamp,
                        end_hour: java.sql.Timestamp)

  case class EnrichEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                         is_left: Boolean, value: Double)
  case class EnrichOut(event_id: Long, user_id: Long, ts: java.sql.Timestamp, value: Double,
                       asof_ts: Option[java.sql.Timestamp], asof_value: Option[Double])
  case class CarryState(ts: java.sql.Timestamp, eventId: Long, value: Double)

  private def micros(t: java.sql.Timestamp): Long =
    // floorDiv, not '/': getTime/1000 truncates toward zero while getNanos
    // is always positive, so a pre-epoch fractional second would land one
    // whole second HIGH (silently diverging from batch unix_micros)
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Streaming as-of enrichment — the streaming twin of the as-of join:
    * per key, every left row is enriched with the latest right row at or
    * before its event time. State is ONE carried right row per key —
    * constant PER KEY, so TOTAL state grows with ever-seen key
    * cardinality (NoTimeout: a key's carry must survive idle periods to
    * stay correct). On an unbounded key space, bound the keys upstream or
    * accept the sessionizeEvicting trade by adding a timeout — the same
    * caveat documented on the evicting sessionizer. Within a micro-batch
    * rows are processed in event-time order with right-before-left ties and
    * the right tiebreak on event_id, matching the batch operator exactly.
    *
    * Assumes per-key event-time ordering ACROSS micro-batches (same
    * contract as `sessionize`); a left row arriving after a later right row
    * has been carried emits a null match rather than a wrong
    * from-the-future one.
    */
  def asOfEnrich(events: Dataset[EnrichEvent]): Dataset[EnrichOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[CarryState, EnrichOut](
        // Append: every emitted row is final (never revised), so the query
        // can feed append-mode sinks (parquet/files); Update would forbid them
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[EnrichEvent], state: GroupState[CarryState]) =>
          // right rows (is_left=false) sort before left at equal ts, so a
          // same-timestamp click is visible to the purchase, as in SQL ASOF
          // precompute the sort key once per row: sortBy evaluates its key
          // function per COMPARISON, and the carried state's micros is hot
          val keyed = rows.map(e => (micros(e.ts), e)).toSeq
            .sortBy { case (m, e) => (m, e.is_left, e.event_id) }
          var st = state.getOption.orNull
          var stMicros = if (st == null) 0L else micros(st.ts)
          val out = scala.collection.mutable.ArrayBuffer[EnrichOut]()
          keyed.foreach { case (m, e) =>
            if (!e.is_left) {
              // carry the latest right row; ties on ts keep the highest id
              if (st == null || m > stMicros ||
                  (m == stMicros && e.event_id > st.eventId)) {
                st = CarryState(e.ts, e.event_id, e.value)
                stMicros = m
              }
            } else {
              if (st != null && stMicros <= m)
                out += EnrichOut(e.event_id, user, e.ts, e.value, Some(st.ts), Some(st.value))
              else
                out += EnrichOut(e.event_id, user, e.ts, e.value, None, None)
            }
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  case class DriftEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                        value: Double)
  case class DriftOut(user_id: Long, event_id: Long, value: Double,
                      cusum: Double, alarm: Boolean)
  case class DriftState(s: Double)

  case class HoltOut(user_id: Long, event_id: Long, value: Double,
                     level: Double, trend: Double, forecast: Double)
  case class HoltState(l: Double, tr: Double, seeded: Boolean)

  private def requireHoltParams(alpha: Double, beta: Double): Unit =
    require(alpha > 0.0 && alpha <= 1.0 && beta >= 0.0 && beta <= 1.0 &&
      alpha * 4 == math.rint(alpha * 4) && beta * 4 == math.rint(beta * 4),
      s"holtStream needs binary-exact quarter alpha/beta in range, got $alpha/$beta")

  /** The one per-batch Holt fold both holtStream variants share (the
    * foldSessions discipline — the evicting variant can never drift from
    * its namesake): event-time sort with the event_id tie-break, the
    * fixed IEEE recursion, r6 at emission. Returns the advanced state,
    * the outputs, and the batch's max event-time micros (the evicting
    * variant's timeout anchor). */
  private def foldHolt(user: Long, rows: Iterator[DriftEvent], st0: HoltState,
                       alpha: Double, beta: Double): (HoltState, Seq[HoltOut], Long) = {
    val ca = 1.0 - alpha
    val cb = 1.0 - beta
    val sorted = rows.map(e => (micros(e.ts), e)).toSeq
      .sortBy { case (m, e) => (m, e.event_id) }
    var st = st0
    var maxTs = Long.MinValue
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val out = sorted.map { case (m, e) =>
      if (m > maxTs) maxTs = m
      st =
        if (!st.seeded) HoltState(e.value, 0.0, seeded = true)
        else {
          val lPrev = st.l
          val l = alpha * e.value + ca * (st.l + st.tr)
          HoltState(l, beta * (l - lPrev) + cb * st.tr, seeded = true)
        }
      HoltOut(user, e.event_id, e.value, r6(st.l), r6(st.tr), r6(st.l + st.tr))
    }
    (st, out, maxTs)
  }

  /** Streaming Holt's linear smoother — the always-on twin of the batch
    * `holt_linear` fold: TWO doubles of per-entity state (level + trend)
    * carried across micro-batches via flatMapGroupsWithState, the same
    * binary-exact α/β contract and fixed IEEE operation tree, so a
    * stream-fed entity walks the identical recursion as the batch fold
    * (spec proves a two-batch split equals the batch output exactly).
    * In-batch rows fold in event-time order with the event_id tie-break.
    * NoTimeout: a forecast survives arbitrary idle periods, at one state
    * row per EVER-seen entity — on an unbounded/churning key space use
    * `holtStreamEvicting`.
    */
  def holtStream(events: Dataset[DriftEvent], alpha: Double,
                 beta: Double): Dataset[HoltOut] = {
    requireHoltParams(alpha, beta)
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[HoltState, HoltOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[DriftEvent], state: GroupState[HoltState]) =>
          val st0 = state.getOption.getOrElse(HoltState(0.0, 0.0, seeded = false))
          val (st, out, _) = foldHolt(user, rows, st0, alpha, beta)
          state.update(st)
          out.iterator
      }
  }

  /** Evicting variant of `holtStream`: per-entity (level, trend) state
    * carries an EVENT-TIME timeout at lastTs + idle horizon — once the
    * watermark passes it, the entity's state is dropped. This is what
    * bounds state under entity churn at 100 TB (the plain smoother keeps
    * two doubles per EVER-seen entity, forever). The trade is an explicit
    * RE-WARM-UP contract: an entity returning after eviction re-seeds —
    * its first post-return value becomes the level, trend restarts at 0 —
    * so forecasts for the first few post-return points track the re-seed
    * recursion, not the pre-idle history. For a smoother that is usually
    * the right semantics anyway: a series silent past the idle horizon
    * has a stale trend that should NOT be extrapolated.
    *
    * Second divergence (the sessionizeEvicting caveat verbatim): with
    * EventTimeTimeout, Spark drops watermark-late rows BEFORE the group
    * function runs, so the watermark delay is the late-data-loss bound,
    * not just a state-size knob. Requires `idleSeconds` > 0 and a
    * watermark spec for the `ts` column.
    */
  def holtStreamEvicting(events: Dataset[DriftEvent], alpha: Double, beta: Double,
                         idleSeconds: Long, watermark: String): Dataset[HoltOut] = {
    requireHoltParams(alpha, beta)
    require(idleSeconds > 0, s"holtStreamEvicting needs idleSeconds > 0, got $idleSeconds")
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(HoltState, Long), HoltOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[DriftEvent], state: GroupState[(HoltState, Long)]) =>
          if (state.hasTimedOut) {
            // idle past the horizon: drop the row; a returning entity
            // re-seeds from its first post-return value
            state.remove()
            Iterator.empty
          } else {
            val (st0, lastTs0) =
              state.getOption.getOrElse((HoltState(0.0, 0.0, seeded = false), Long.MinValue))
            val (st, out, maxTs) = foldHolt(user, rows, st0, alpha, beta)
            val lastTs = math.max(lastTs0, maxTs) // never rewind on late data
            state.update((st, lastTs))
            state.setTimeoutTimestamp(lastTs / 1000L + idleSeconds * 1000L)
            out.iterator
          }
      }
  }

  private def requireCusumParams(k: Double, h: Double): Unit = {
    require(h > 0.0, s"cusumStream needs h > 0, got $h")
    require(k * 4 == math.rint(k * 4) && h * 4 == math.rint(h * 4),
      s"cusumStream needs binary-exact quarter k/h, got $k/$h")
  }

  /** The one per-batch CUSUM fold both cusumStream variants share: sorted
    * event-time fold of sᵢ = max(0, sᵢ₋₁ + xᵢ − k), alarm at the RAW
    * statistic ≥ h, r6 on the emitted value. Also returns the batch max
    * event-time micros for the evicting variant's timeout anchor. */
  private def foldCusum(user: Long, rows: Iterator[DriftEvent], s0: Double,
                        k: Double, h: Double): (Double, Seq[DriftOut], Long) = {
    val sorted = rows.map(e => (micros(e.ts), e)).toSeq
      .sortBy { case (m, e) => (m, e.event_id) }
    var s = s0
    var maxTs = Long.MinValue
    val out = sorted.map { case (m, e) =>
      if (m > maxTs) maxTs = m
      s = math.max(0.0, s + e.value - k)
      DriftOut(user, e.event_id, e.value,
        math.floor(s * 1e6 + 0.5) / 1e6, s >= h)
    }
    (s, out, maxTs)
  }

  /** Streaming CUSUM drift detection — the stateful twin of the batch
    * `cusum_drift` fold: per entity, sᵢ = max(0, sᵢ₋₁ + xᵢ − k) carried
    * across micro-batches as ONE double of state, alarm when the RAW
    * statistic reaches h. Within a micro-batch rows fold in event-time
    * order (event_id tie-break); across micro-batches the same
    * per-key-ordered-arrival contract as `sessionize`/`asOfEnrich`
    * applies. Same binary-exact k/h discipline as the batch operator, so
    * in-order stream == batch on identical rows (spec-proven across a
    * two-batch split). NoTimeout: drift state survives arbitrary idle
    * periods, at one state row per EVER-seen entity — on an unbounded/
    * churning key space use `cusumStreamEvicting`.
    */
  def cusumStream(events: Dataset[DriftEvent], k: Double, h: Double): Dataset[DriftOut] = {
    requireCusumParams(k, h)
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[DriftState, DriftOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[DriftEvent], state: GroupState[DriftState]) =>
          val (s, out, _) = foldCusum(user, rows, state.getOption.map(_.s).getOrElse(0.0), k, h)
          state.update(DriftState(s))
          out.iterator
      }
  }

  /** Evicting variant of `cusumStream` — the holtStreamEvicting contract
    * applied to the drift statistic: per-entity state times out at
    * lastTs + idle horizon (event time), bounding state under entity
    * churn. Re-warm-up on return: the statistic restarts at s = 0, so a
    * drift that straddles an idle gap longer than the horizon must
    * re-accumulate from zero before it alarms — the explicit trade for
    * bounded state. Watermark-late rows are dropped before the fold
    * (EventTimeTimeout semantics); the watermark delay is the
    * late-data-loss bound.
    */
  def cusumStreamEvicting(events: Dataset[DriftEvent], k: Double, h: Double,
                          idleSeconds: Long, watermark: String): Dataset[DriftOut] = {
    requireCusumParams(k, h)
    require(idleSeconds > 0, s"cusumStreamEvicting needs idleSeconds > 0, got $idleSeconds")
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(DriftState, Long), DriftOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[DriftEvent], state: GroupState[(DriftState, Long)]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val (st0, lastTs0) =
              state.getOption.getOrElse((DriftState(0.0), Long.MinValue))
            val (s, out, maxTs) = foldCusum(user, rows, st0.s, k, h)
            val lastTs = math.max(lastTs0, maxTs) // never rewind on late data
            state.update((DriftState(s), lastTs))
            state.setTimeoutTimestamp(lastTs / 1000L + idleSeconds * 1000L)
            out.iterator
          }
      }
  }

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  case class SessionState(sessionCount: Long, lastTsMicros: Long)
  case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  /** The one per-batch session fold both sessionizers share (so the
    * evicting variant can never drift from its namesake): event-time sort
    * with the event_id tie-break, gap-based session counting, and
    * never-rewinding lastTs on late data. getTime is whole ms; sub-ms
    * precision is recovered from getNanos so gap comparisons match the
    * batch operator's unix_micros exactly.
    */
  private def foldSessions(rows: Iterator[SessionEvent], st: SessionState,
                           nEvents0: Long, gapMicros: Long): (SessionState, Long) = {
    val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    var sessions = st.sessionCount
    var lastTs = st.lastTsMicros
    var nEvents = nEvents0
    sorted.foreach { e =>
      val tsMicros = micros(e.ts)
      if (lastTs == Long.MinValue || tsMicros - lastTs > gapMicros) sessions += 1
      if (tsMicros > lastTs) lastTs = tsMicros // never rewind on late data
      nEvents += 1
    }
    (SessionState(sessions, lastTs), nEvents)
  }

  /** Evicting variant of `sessionize`: per-user state carries an
    * EVENT-TIME timeout at lastTs + gap — once the watermark passes it,
    * the key's state is dropped. This is what bounds state at unbounded
    * user cardinality (the plain sessionizer keeps one row per EVER-seen
    * user; this one keeps one row per RECENTLY-ACTIVE user). The trade is
    * explicit: a user returning after eviction starts a fresh session
    * count — correct session semantics (the gap had passed anyway), reset
    * lifetime totals. Requires a watermark on `ts` upstream.
    *
    * Second divergence from plain `sessionize`: with EventTimeTimeout,
    * Spark filters watermark-late rows BEFORE the group function runs, so
    * an event older than the watermark is silently uncounted here, while
    * the plain variant's never-rewind fold would still count it. Pick the
    * watermark delay with that in mind — it is the late-data-loss bound,
    * not just a state-size knob.
    */
  def sessionizeEvicting(events: Dataset[SessionEvent], gapSeconds: Long,
                         watermark: String): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val gapMicros = gapSeconds * 1000000L
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(SessionState, Long), SessionUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[(SessionState, Long)]) =>
          if (state.hasTimedOut) {
            // idle past the gap: drop the row; the next event re-creates it
            state.remove()
            Iterator.empty
          } else {
            val (st0, n0) = state.getOption.getOrElse((SessionState(0L, Long.MinValue), 0L))
            val (st, nEvents) = foldSessions(rows, st0, n0, gapMicros)
            state.update((st, nEvents))
            // evict when the watermark passes the session gap after the
            // user's latest event
            state.setTimeoutTimestamp(st.lastTsMicros / 1000L + gapSeconds * 1000L)
            Iterator.single(SessionUpdate(user, st.sessionCount, nEvents))
          }
      }
  }

  /** Stateful gap sessionization: per-user session counting with
    * processing-time-independent event-time gaps. Emits one update per user
    * per micro-batch (Update mode).
    *
    * State is one (count, lastTs) pair per user — constant-size, safe at any
    * user cardinality that fits the state store. Assumes per-key event-time
    * order across micro-batches (upstream watermark/sort); an event arriving
    * with ts earlier than the state's lastTs is counted toward n_events and
    * folded into the current session without rewinding lastTs, so one late
    * record cannot corrupt subsequent gap decisions.
    */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val gapMicros = gapSeconds * 1000000L

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(SessionState, Long), SessionUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[(SessionState, Long)]) =>
          val (st0, n0) = state.getOption.getOrElse((SessionState(0L, Long.MinValue), 0L))
          val (st, nEvents) = foldSessions(rows, st0, n0, gapMicros)
          state.update((st, nEvents))
          Iterator.single(SessionUpdate(user, st.sessionCount, nEvents))
      }
  }
}
