package graft.tools

import java.util.concurrent.atomic.AtomicLong

/** Pure-ALU host ceiling ladder: register-only integer mixing, zero
  * allocation, zero memory traffic beyond the loop code itself. Fixed TOTAL
  * work split across T threads; efficiency(N→4N) = t_N / (4·t_4N), the same
  * formula as the job ladders.
  *
  * Purpose: decompose a measured sub-0.8 host ceiling. ShuffleAllocBench /
  * AllocBench saturate memory bandwidth and the allocator; this tool cannot
  * — any efficiency loss here is the hypervisor's vCPU budget (steal /
  * multiplexed physical cores), a floor under EVERY ladder run the same
  * session, job and microbench alike.
  */
object CpuBench {

  private val sink = new AtomicLong(0)

  def work(opsPerThread: Long, seed: Int): Long = {
    var h = seed.toLong * 0x9e3779b97f4a7c15L + 1
    var acc = 0L
    var i = 0L
    while (i < opsPerThread) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      acc += h
      i += 1
    }
    acc
  }

  def run(threads: Int, totalOps: Long): Double = {
    val per = totalOps / threads
    val ts = (0 until threads).map { k =>
      new Thread(() => { sink.addAndGet(work(per, k + 1)) })
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start())
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val totalOps = args.headOption.map(_.toLong).getOrElse(60000000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val levels = Seq(4, 8, 16, 32)
    run(32, totalOps / 8) // JIT warmup, untimed
    val samples = (1 to reps).flatMap { r =>
      levels.map { k =>
        val t = run(k, totalOps)
        println(f"[cpu-sample] rep$r threads=$k%2d: $t%6.2f s")
        k -> t
      }
    }
    val best = levels.map(k => k -> samples.filter(_._1 == k).map(_._2).min).toMap
    levels.foreach { k =>
      println(f"[cpu] threads=$k%2d  min=${best(k)}%6.2f s  (${totalOps / best(k) / 1e9}%6.2f Gops/s)")
    }
    def eff(lo: Int, hi: Int) = best(lo) / (4.0 * best(hi))
    println(f"[cpu] efficiency 4->16 = ${eff(4, 16)}%.3f   8->32 = ${eff(8, 32)}%.3f")
  }
}
