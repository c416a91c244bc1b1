package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Document arriving on the ingest stream. */
case class DocEvent(doc_id: Long, ts: java.sql.Timestamp, text: String)

/** Near-dup candidate emitted at ingest: the new doc `b` collided with
  * the earlier doc `a` in LSH band `band`; `est_sim` is the MinHash
  * Jaccard estimate (matching minhashes / k).
  */
case class LshCandidate(a: Long, b: Long, band: Int, est_sim: Double)

private[graft] case class BandArrival(
    band: Int, key: Long, doc_id: Long, ts: java.sql.Timestamp, sig: Seq[Long])

private case class BucketState(
    entries: List[(Long, Seq[Long], Long)],
    // (doc_id, arrival ms) of every id accepted within the horizon — ids
    // only, no signatures, so it costs ~16 bytes/doc where entries cost
    // k*8. Survives MaxPerBucket eviction of `entries`, so a re-delivered
    // id stays suppressed even after its signature was capped out.
    seen: List[(Long, Long)])

/** Streaming MinHash-LSH near-dup detection at ingest: the incremental
  * twin of dedup.Dedup.minhashLsh, flagging each arriving document
  * against earlier stream documents it shares an LSH band bucket with.
  *
  * The signature pipeline is the SAME function composition as the batch
  * operator (xxhash64 shingle → per-seed xxhash64 min → per-band
  * xxhash64 of BandRows minhashes), but computed per ROW with array
  * expressions instead of explode+groupBy — a streaming-safe, shuffle-
  * free scan; the only shuffle is groupByKey on (band, bucket).
  * Batch/stream signature identity is spec-pinned.
  *
  * At ingest the exact-Jaccard verify of the batch path is replaced by
  * the MinHash ESTIMATE (matching minhashes / k): the shingle sets a
  * verify needs would mean unbounded per-bucket state. Production
  * treats the stream output as a pre-filter; the nightly batch pass
  * (minhashLsh + Clusters) remains the exact authority — same
  * pre-filter/authority split as the LSH/exact pairing in batch.
  *
  * State is bounded on BOTH axes: entries older than the watermark
  * horizon are evicted (rate × horizon, like StreamDedup), and each
  * bucket retains at most MaxPerBucket newest entries — a viral bucket
  * (near-identical spam flood) degrades to comparing against the cap,
  * not to an executor OOM. Re-deliveries are suppressed by a separate
  * ids-only `seen` set (~16 bytes/doc vs k·8 for a signature entry)
  * that is NOT subject to MaxPerBucket, so idempotence survives cap
  * eviction of the signature. The precise idempotence bound: a
  * re-delivered doc_id emits nothing as long as its first arrival is
  * within the watermark horizon AND the bucket has seen fewer than
  * SeenCap distinct ids since — beyond either bound (very late replay
  * or a flood past SeenCap) a re-delivery is indistinguishable from a
  * new doc and re-emits candidates. Downstream consumers dedupe on
  * (a, b, band) if exact-once matters past that horizon.
  */
object StreamLshDedup {

  val MaxPerBucket = 64

  /** Upper bound on the ids-only re-delivery suppression set, per bucket.
    * 16× the signature cap: suppression outlives signature eviction by a
    * wide margin while still bounding state under an adversarial flood.
    */
  val SeenCap = 1024

  /** Per-row band keys + signature, identical arithmetic to the batch
    * minhashLsh: shingles hash via xxhash64(string), minhash i is
    * min(xxhash64(shingle_hash, i)), band j keys on
    * xxhash64(m_{j*r}..m_{j*r+r-1}, j).
    */
  private[graft] def withBands(docs: Dataset[DocEvent]): Dataset[BandArrival] = {
    implicit val enc = Encoders.product[BandArrival]
    docs
      .toDF()
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      // shingle/band construction is single-sourced in Dedup — the
      // batch/stream parity the specs pin depends on it
      .withColumn("sh", expr(Dedup.ShingleArraySql))
      // one-pass codegen minhash (bit-exact with the k-HOF composition;
      // identity spec-pinned in MinHashExprSpec and the batch-parity test)
      .withColumn("sig", expr(s"graft_minhash(sh, ${Dedup.MinHashK})"))
      .select(col("doc_id"), col("ts"), col("sig"), explode(array(Dedup.bandKeyCols: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("doc_id"), col("ts"), col("sig"))
      .as[BandArrival]
  }

  /** Ingest-time quality gate: the full Gopher rule set — every rule is
    * a scan-local column expression since the modal-word rule went
    * per-row (QualityFilters.gopherFrame), so the gate is watermark-safe
    * by construction (stateless, no event-time reasoning) and junk
    * never reaches the LSH state store at all: the cheapest possible
    * place to drop it. Batch remains the exact authority on the gated-IN
    * corpus; gating changes which docs exist, not how they dedup
    * (parity spec runs the batch pass over the same gated frame).
    */
  private[graft] def qualityGated(docs: Dataset[DocEvent]): Dataset[DocEvent] = {
    implicit val enc = Encoders.product[DocEvent]
    graft.functions.QualityFilters
      .gopherFrame(docs.toDF())
      .filter(col("keep"))
      .select(col("doc_id"), col("ts"), col("text"))
      .as[DocEvent]
  }

  def candidates(
      docs: Dataset[DocEvent],
      horizon: String = "1 hour",
      qualityGate: Boolean = false): Dataset[LshCandidate] = {
    implicit val outEnc = Encoders.product[LshCandidate]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    implicit val stateEnc = Encoders.product[BucketState]
    withBands(if (qualityGate) qualityGated(docs) else docs)
      .withWatermark("ts", horizon)
      .groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        processBucket(horizon))
  }

  private def estSim(x: Seq[Long], y: Seq[Long]): Double =
    x.iterator.zip(y.iterator).count { case (a, b) => a == b }.toDouble / Dedup.MinHashK

  private def processBucket(horizon: String)(
      key: (Int, Long),
      rows: Iterator[BandArrival],
      state: GroupState[BucketState]
  ): Iterator[LshCandidate] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val out = scala.collection.mutable.ArrayBuffer.empty[LshCandidate]
    var entries = state.getOption.map(_.entries).getOrElse(Nil)
    var seen = state.getOption.map(_.seen).getOrElse(Nil)
    val wm = state.getCurrentWatermarkMs()
    entries = entries.filter(_._3 >= wm)
    seen = seen.filter(_._2 >= wm)
    val seenIds = scala.collection.mutable.HashSet.empty[Long]
    seenIds ++= seen.iterator.map(_._1)
    // Micro-batches are unordered; process the per-trigger slice in
    // event-time order so "earlier doc" is deterministic.
    for (r <- rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))) {
      if (!seenIds.contains(r.doc_id)) {
        for ((id, sig, _) <- entries) {
          val (a, b) = if (id < r.doc_id) (id, r.doc_id) else (r.doc_id, id)
          out += LshCandidate(a, b, key._1, estSim(sig, r.sig))
        }
        entries = ((r.doc_id, r.sig, r.ts.getTime) :: entries).take(MaxPerBucket)
        seen = ((r.doc_id, r.ts.getTime) :: seen).take(SeenCap)
        seenIds += r.doc_id
      }
    }
    state.update(BucketState(entries, seen))
    // Flush the bucket once the watermark passes its newest entry plus
    // the horizon (nothing inside the horizon can collide with it).
    if (seen.nonEmpty) state.setTimeoutTimestamp(seen.map(_._2).max, horizon)
    out.iterator
  }
}
