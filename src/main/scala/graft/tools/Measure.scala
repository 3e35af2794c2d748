package graft.tools

/** Shared measurement plumbing for [[graft.Bench]] and [[ScaleBench]]
  * (r19 VERDICT tasks #2/#6): per-sample stage-metric byte totals (the
  * steal-immune plan signal) and hypervisor-steal sampling from
  * `/proc/stat` (the quietness evidence that was previously manual
  * vmstat discipline in BASELINE.md prose).
  */

/** Per-sample stage-metric accumulator: total shuffle bytes (r+w),
  * disk spill, summed per-task peak execution memory, and sink-output
  * bytes. Register ONCE per session; `reset()` before a sample, drain
  * the listener bus, then `snap`. Bytes are host- and steal-INVARIANT
  * for a fixed plan, so round-over-round plan regressions stay
  * detectable even when wall time is noise (SCALE.md doctrine;
  * promoted from ScaleBench's private listener in r20 so Bench records
  * them per query in bench/BENCH.json).
  */
final class StageMetrics extends org.apache.spark.scheduler.SparkListener {
  private var shuffleRead = 0L
  private var shuffleWrite = 0L
  private var spill = 0L
  private var peakMem = 0L
  private var outBytes = 0L
  override def onStageCompleted(
      sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
      : Unit = synchronized {
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      shuffleRead += m.shuffleReadMetrics.totalBytesRead
      shuffleWrite += m.shuffleWriteMetrics.bytesWritten
      spill += m.diskBytesSpilled
      peakMem = math.max(peakMem, m.peakExecutionMemory)
      // sink-output bytes (parquet/commit writes): the COMMIT-COST
      // signal the index families measure — a write ∝ index instead
      // of ∝ batch is invisible to shuffle bytes (r17)
      outBytes += m.outputMetrics.bytesWritten
    }
  }
  def reset(): Unit = synchronized {
    shuffleRead = 0; shuffleWrite = 0; spill = 0; peakMem = 0
    outBytes = 0
  }
  /** (shuffle bytes r+w, spill bytes, peak exec memory, output bytes). */
  def snap: (Long, Long, Long, Long) =
    synchronized((shuffleRead + shuffleWrite, spill, peakMem, outBytes))
}

/** Hypervisor-steal sampling from `/proc/stat`. Two same-day r19
  * ScaleBench ladders read tail exponents 1.93/1.55 at IDENTICAL
  * shuffle bytes purely from 9–28% steal bursts, and the committed
  * r19 bench floor carries 60–81 s of documented steal excess — wall
  * numbers taken without quietness evidence are not floors. Bench and
  * ScaleBench now sample steal around every measured rep and persist
  * it in their JSON artifacts; Bench additionally REFUSES to overwrite
  * the committed `bench/BENCH.json` floor when the min-achieving
  * samples were not quiet (writing `BENCH_REJECTED.json` instead).
  */
object Steal {

  /** Parse one aggregate-cpu `/proc/stat` line → (stealTicks,
    * totalTicks). Fields after "cpu": user nice system idle iowait
    * irq softirq steal [guest guest_nice] — guest columns are already
    * included in user/nice, so total sums only the first 8. */
  def parseStatLine(line: String): Option[(Long, Long)] = {
    val f = line.trim.split("\\s+")
    if (f.length < 5 || f(0) != "cpu") None
    else {
      val ticks = f.drop(1).take(8).map(s => try s.toLong catch {
        case _: NumberFormatException => return None
      })
      val steal = if (ticks.length > 7) ticks(7) else 0L
      Some((steal, ticks.sum))
    }
  }

  /** (stealTicks, totalTicks) now, or None off-Linux / unreadable. */
  def sample(): Option[(Long, Long)] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu "))
        .flatMap(parseStatLine)
      finally src.close()
    } catch { case _: Throwable => None }

  /** Steal percentage over the window [before, after]; None when
    * either sample is missing or the window is empty. */
  def pct(before: Option[(Long, Long)],
          after: Option[(Long, Long)]): Option[Double] =
    for {
      (s0, t0) <- before
      (s1, t1) <- after
      if t1 > t0
    } yield 100.0 * (s1 - s0).toDouble / (t1 - t0).toDouble

  /** Default floor-commit threshold: quiet sessions on this host read
    * 0–1% st; discard-worthy bursts read 3–28% (r17/r19). */
  val DefaultMaxPct = 2.0

  /** Floor-commit verdict over the steal pcts of the MIN-achieving
    * samples (one per query; a noisy discarded sample is irrelevant if
    * the reported min was taken quietly). Missing samples (None) count
    * as quiet — off-Linux hosts have no steal. Returns
    * (quiet, worst observed pct). Exercised by BenchInfraSpec. */
  def verdict(minSamplePcts: Seq[Option[Double]],
              thresholdPct: Double = DefaultMaxPct): (Boolean, Double) = {
    val observed = minSamplePcts.flatten
    val worst = if (observed.isEmpty) 0.0 else observed.max
    (worst <= thresholdPct, worst)
  }
}
