package graft.core

/** Host-contention probes stamped into benchmark artifacts so a
  * load-contaminated run is machine-detectable from the artifact alone
  * (tools/benchdiff.py warns when two runs' stamps differ >2×), instead
  * of costing a round of prose adjudication.
  *
  * Two probes because the host has two contention channels the loadavg
  * number alone cannot separate:
  *  - [[spinProbe]] — fixed-work single-threaded CPU spin (~0.1 s idle):
  *    inflates under scheduler contention and cgroup throttling;
  *  - [[ioProbe]] — fixed-size write+fsync to the artifact filesystem
  *    (~0.1–0.4 s idle): inflates under D-state background IO load, the
  *    documented failure mode the spin probe is blind to (a loadavg of 8
  *    made of uninterruptible-sleep writers leaves the CPU idle — the
  *    r13 refresh measured loadavg 8.36 with the spin probe normal at
  *    0.096 s while the fixpoint queries swelled 1.3–1.5×).
  */
object HostProbe {

  /** 1/5/15-minute load averages; (-1,-1,-1) when unreadable. */
  def loadavg(): Seq[Double] =
    try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      .split("\\s+").take(3).toSeq.map(_.toDouble)
    catch { case _: Throwable => Seq(-1.0, -1.0, -1.0) }

  /** Fixed-work single-thread CPU probe (~0.1 s idle): a contended or
    * throttled host inflates it proportionally — a scheduler-level
    * signal loadavg alone can miss (cgroup caps, noisy SMT siblings). */
  def spinProbe(): Double = {
    var x = 0x9E3779B97F4A7C15L; var i = 0
    val t0 = System.nanoTime()
    while (i < 40000000) { // deterministic mix, not optimizable away
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL; x ^= x >>> 29; i += 1
    }
    val dt = (System.nanoTime() - t0) / 1e9
    if (x == 42L) println("") // defeat dead-code elimination
    dt
  }

  /** Fixed-size IO probe: write `bytes` (default 128 MiB) in 1 MiB
    * chunks to a temp file in `dir` — the CURRENT directory by default,
    * so the probe exercises the filesystem the artifacts (and the
    * parquet under test) live on, not a tmpfs — then `force(true)`
    * (fsync) so the submission actually reaches the device. A host
    * whose loadavg is D-state IO waiters inflates the fsync
    * proportionally; the page cache cannot absorb it. The file is
    * deleted before returning; -1.0 when the probe cannot run
    * (read-only dir, ENOSPC). */
  def ioProbe(bytes: Long = 128L << 20, dir: String = "."): Double =
    try {
      val tmp = java.nio.file.Files.createTempFile(
        java.nio.file.Paths.get(dir), ".graft_io_probe", ".bin")
      try {
        val buf = new Array[Byte](1 << 20)
        var i = 0
        while (i < buf.length) { buf(i) = (i * 31).toByte; i += 1 }
        def pass(n: Long): Double = {
          val t0 = System.nanoTime()
          val ch = java.nio.channels.FileChannel.open(tmp,
            java.nio.file.StandardOpenOption.WRITE,
            java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
          try {
            var written = 0L
            while (written < n) {
              ch.write(java.nio.ByteBuffer.wrap(buf))
              written += buf.length
            }
            ch.force(true)
          } finally ch.close()
          (System.nanoTime() - t0) / 1e9
        }
        // untimed 8 MiB warmup: the first write+fsync in a JVM pays
        // one-off allocation/journal costs (measured ~3x the steady
        // state) that would read as phantom IO load
        pass(8L << 20)
        pass(bytes)
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } catch { case _: Throwable => -1.0 }

  /** The full stamp as a JSON object string: loadavg start/end plus both
    * probes at start and end (a divergence between a probe's start and
    * end values catches load ARRIVING mid-run, which single stamps
    * miss). Callers capture `start()` before the run and render with
    * the end-of-run values. */
  def stampJson(loadStart: Seq[Double], spinStart: Double,
                ioStart: Double, loadEnd: Seq[Double], spinEnd: Double,
                ioEnd: Double): String = {
    def f(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    "{\"start\":" + loadStart.map(f).mkString("[", ",", "]") +
      ",\"end\":" + loadEnd.map(f).mkString("[", ",", "]") +
      ",\"spin_probe_sec\":" + f(spinStart) +
      ",\"spin_probe_end_sec\":" + f(spinEnd) +
      ",\"io_probe_sec\":" + f(ioStart) +
      ",\"io_probe_end_sec\":" + f(ioEnd) + "}"
  }
}
