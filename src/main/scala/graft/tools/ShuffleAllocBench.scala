package graft.tools

import java.util.concurrent.atomic.AtomicLong

/** Host ceiling microbench for SHUFFLE-shaped work (no Spark): AllocBench
  * measures the scan-transform (string/row churn) ceiling that the annotate
  * job sits on; the full linkage PIPELINE is instead dominated by
  * shuffle-style phases — serialize rows into partition buffers, then read
  * them back through a hash-aggregation table. This tool measures how THAT
  * memory pattern scales with thread count on this box, so the pipeline
  * ladder has a directly comparable host ceiling (VERDICT r4 Next #5).
  *
  * Per op (map side): encode a (long key, short payload) record into a
  * per-partition chunked byte buffer — amortized chunk allocation plus the
  * memcpy bandwidth a shuffle write pays. Read side: scan every chunk,
  * decode, and fold keys into an open-addressing long hash table — the
  * random-probe pattern of a shuffle-read hash aggregate. Fixed TOTAL work
  * split across T threads (each thread owns its partitions: local-mode
  * shuffles exchange through shared memory/page cache, so the bandwidth
  * and allocator pressure is the host resource being measured, not thread
  * handoff). Efficiency(N→4N) = t_N / (4·t_4N), the job-ladder formula.
  */
object ShuffleAllocBench {

  private val sink = new AtomicLong(0)
  private final val ChunkSize = 1 << 16
  private final val RecBytes = 16 // 8B key + 8B payload

  def work(opsPerThread: Long, seed: Int, partitions: Int): Long = {
    // map side: hash-partitioned chunked write buffers
    val chunks = Array.fill(partitions)(new java.util.ArrayList[Array[Byte]]())
    val cur = new Array[Array[Byte]](partitions)
    val pos = new Array[Int](partitions)
    var h = seed.toLong * 0x9e3779b97f4a7c15L + 1
    var i = 0L
    while (i < opsPerThread) {
      val key = h ^ (h >>> 31)
      val p = ((key % partitions).toInt + partitions) % partitions
      var buf = cur(p)
      if (buf == null || pos(p) + RecBytes > ChunkSize) {
        buf = new Array[Byte](ChunkSize)
        chunks(p).add(buf)
        cur(p) = buf
        pos(p) = 0
      }
      var o = pos(p)
      var k = key
      var b = 0
      while (b < 8) { buf(o + b) = (k & 0xff).toByte; k >>>= 8; b += 1 }
      var v = h
      b = 0
      while (b < 8) { buf(o + 8 + b) = (v & 0xff).toByte; v >>>= 8; b += 1 }
      pos(p) = o + RecBytes
      h = h * 6364136223846793005L + 1442695040888963407L
      i += 1
    }
    // read side: decode + open-addressing hash aggregate (power-of-2 table)
    var acc = 0L
    val cap = Integer.highestOneBit(math.max(1024, (opsPerThread / 64).toInt)) << 1
    val keys = new Array[Long](cap)
    val vals = new Array[Long](cap)
    val mask = cap - 1
    var p = 0
    while (p < partitions) {
      val list = chunks(p)
      var ci = 0
      while (ci < list.size()) {
        val buf = list.get(ci)
        val limit = if (ci == list.size() - 1 && cur(p) == buf) pos(p) else ChunkSize / RecBytes * RecBytes
        var o = 0
        while (o + RecBytes <= limit) {
          var k = 0L
          var b = 7
          while (b >= 0) { k = (k << 8) | (buf(o + b) & 0xffL); b -= 1 }
          var v = 0L
          b = 7
          while (b >= 0) { v = (v << 8) | (buf(o + 8 + b) & 0xffL); b -= 1 }
          var slot = (k ^ (k >>> 33)).toInt & mask
          var probed = 0
          while (keys(slot) != 0 && keys(slot) != k && probed < 32) {
            slot = (slot + 1) & mask; probed += 1
          }
          keys(slot) = k
          vals(slot) += v
          acc += vals(slot)
          o += RecBytes
        }
        ci += 1
      }
      p += 1
    }
    acc
  }

  def run(threads: Int, totalOps: Long): Double = {
    val per = totalOps / threads
    // partitions per thread fixed (4): total buffers scale with threads the
    // way shuffle-partition counts scale with cores in the job ladder
    val ts = (0 until threads).map { k =>
      new Thread(() => { sink.addAndGet(work(per, k + 1, 4)) })
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start())
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val totalOps = args.headOption.map(_.toLong).getOrElse(800000000L)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val levels = Seq(4, 8, 16, 32)
    run(32, totalOps / 4) // JIT + heap warmup, untimed
    val samples = (1 to reps).flatMap { r =>
      levels.map { k =>
        val t = run(k, totalOps)
        println(f"[shuffle-sample] rep$r threads=$k%2d: $t%6.2f s")
        k -> t
      }
    }
    val best = levels.map(k => k -> samples.filter(_._1 == k).map(_._2).min).toMap
    levels.foreach { k =>
      println(f"[shuffle] threads=$k%2d  min=${best(k)}%6.2f s  (${totalOps / best(k) / 1e6}%7.1f Mops/s)")
    }
    def eff(lo: Int, hi: Int) = best(lo) / (4.0 * best(hi))
    println(f"[shuffle] efficiency 4->16 = ${eff(4, 16)}%.3f   8->32 = ${eff(8, 32)}%.3f")
  }
}
