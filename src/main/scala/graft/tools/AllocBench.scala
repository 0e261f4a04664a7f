package graft.tools

import java.util.concurrent.atomic.AtomicLong

/** Host allocation-ceiling microbench (no Spark): measures how small-object/
  * string allocation throughput scales with thread count on THIS box. Used
  * to attribute the storage-read annotate job's sub-ideal scaling to the
  * host's shared DRAM/allocator path (BENCH/BASELINE.md): the job does
  * near-zero arithmetic per doc — its parallel ceiling is whatever this
  * measures. Round 3 had the 8→32 ceiling only; this tool reports every
  * N→4N pair from one interleaved run (VERDICT r3 Next #6).
  *
  * Fixed TOTAL work split across T threads; efficiency(N→4N) =
  * t_N / (4·t_4N) — the same formula as the job ladder. Workload per op
  * mirrors the row/string churn of a scan-transform: StringBuilder →
  * String → substring → short-lived survivor ring → boxed Long, results
  * folded into a sink so nothing dead-code-eliminates.
  */
object AllocBench {

  private val sink = new AtomicLong(0)

  def work(opsPerThread: Long, seed: Int): Long = {
    var h = seed.toLong * 0x9e3779b9L + 1
    var i = 0L
    var acc = 0L
    val ring = new Array[String](1024)
    while (i < opsPerThread) {
      val sb = new java.lang.StringBuilder(48)
      sb.append("tok").append(i % 9973).append(' ')
        .append("mention").append(h & 0xffff)
      val s = sb.toString
      val sub = s.substring(1, s.length - 1)
      ring((i & 1023).toInt) = sub
      acc += sub.hashCode + java.lang.Long.valueOf(h).hashCode()
      h = h * 6364136223846793005L + 1442695040888963407L
      i += 1
    }
    acc + ring(0).length
  }

  def run(threads: Int, totalOps: Long): Double = {
    val per = totalOps / threads
    val ts = (0 until threads).map { k =>
      new Thread(() => { sink.addAndGet(work(per, k)) })
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start())
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val totalOps = args.headOption.map(_.toLong).getOrElse(400000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val levels = Seq(4, 8, 16, 32)
    run(32, totalOps / 4) // JIT + heap warmup, untimed
    // interleaved reps, min per level (same protocol as the job ladder:
    // co-tenant interference is bimodal; min is the steady state)
    val samples = (1 to reps).flatMap { r =>
      levels.map { k =>
        val t = run(k, totalOps)
        println(f"[alloc-sample] rep$r threads=$k%2d: $t%6.2f s")
        k -> t
      }
    }
    val best = levels.map(k => k -> samples.filter(_._1 == k).map(_._2).min).toMap
    levels.foreach { k =>
      println(f"[alloc] threads=$k%2d  min=${best(k)}%6.2f s  (${totalOps / best(k) / 1e6}%7.1f Mops/s)")
    }
    def eff(lo: Int, hi: Int) = best(lo) / (4.0 * best(hi))
    println(f"[alloc] efficiency 4->16 = ${eff(4, 16)}%.3f   8->32 = ${eff(8, 32)}%.3f")
  }
}
