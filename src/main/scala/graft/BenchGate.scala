package graft

/** Contention gate for [[Bench]] against a COMMITTED canonical
  * recording (`tools/bench_canonical.json`, per-query seconds from a
  * quiet window at the driver's bench SF).
  *
  * Why it exists: canary swing and cross-pass spikes only see
  * contention that is UNEVEN in time — a window where every pass is
  * uniformly ~2× slow reads as "steady" to both detectors (observed:
  * a closing artifact at 1.73× the quiet recording sailed through with
  * swing 1.47). The canonical comparison catches exactly that case:
  * the best pass is judged against what this surface costs on a quiet
  * host, so a uniformly-slow window keeps retrying (and, if retries
  * run out, is marked `retries_exhausted` instead of passing as quiet).
  *
  * The check runs on the OVERLAP of measured and canonical query names,
  * so a grown query surface is never gated against a stale constant:
  * new queries simply don't participate until the canonical is
  * re-recorded, and `SPARK_GRAFT_ONLY` profiling subsets gate against
  * their own overlap. The canonical is SF-stamped; a bench at a
  * different SF (local sf0.01 iteration) arms no gate at all.
  */
object BenchGate {

  /** measured/canonical wall-clock ratio over the name overlap; None
    * when nothing overlaps (different SF, empty canonical, all-new
    * surface) — no gate rather than a wrong gate. Zero-time entries
    * (failed queries time-to-error) are excluded on both sides. */
  def ratioVsCanonical(measured: Iterable[(String, Double)],
      canonical: Map[String, Double]): Option[Double] = {
    val overlap = measured.filter { case (n, v) =>
      v > 0 && canonical.get(n).exists(_ > 0) }
    val c = overlap.map { case (n, _) => canonical(n) }.sum
    if (c <= 0) None else Some(overlap.map(_._2).sum / c)
  }

  /** The retry trigger: best-pass overlap total > `factor` × canonical
    * overlap total. 1.3 leaves real headroom above quiet-window noise
    * (repeat quiet recordings land within ~1.15×) while still tripping
    * well before the 2× artifact gate. */
  def overCanonical(measured: Iterable[(String, Double)],
      canonical: Map[String, Double], factor: Double = 1.3): Boolean =
    ratioVsCanonical(measured, canonical).exists(_ > factor)

  /** Load the committed canonical if it exists AND was recorded at the
    * same SF (matched on the sfDir basename, e.g. "sf0.1"); empty map
    * otherwise. Parsed with the Jackson shipped inside Spark — no
    * extra dependency. Malformed files disarm the gate loudly (stderr)
    * rather than failing the bench. */
  def loadCanonical(path: String, sfDir: String): Map[String, Double] = {
    // the default path is repo-relative; a driver launched from another
    // CWD must not silently disarm the gate (the exact failure mode it
    // was built against) — fall back to the repo-absolute spelling and
    // warn loudly when neither exists
    val rel = new java.io.File(path)
    val f =
      if (rel.isFile || rel.isAbsolute) rel
      else new java.io.File("/root/repo", path)
    if (!f.isFile) {
      System.err.println(s"[bench] canonical file $path not found " +
        s"(cwd=${new java.io.File(".").getAbsolutePath}); contention " +
        "gate runs on canary swing + spikes only")
      return Map.empty
    }
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(f)
      val recSf = Option(root.get("sf")).map(_.asText()).getOrElse("")
      if (recSf != new java.io.File(sfDir).getName) Map.empty
      else {
        val qs = root.get("queries")
        if (qs == null || !qs.isObject) Map.empty
        else {
          val it = qs.properties().iterator()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) {
            val e = it.next()
            b += e.getKey -> e.getValue.asDouble()
          }
          b.result()
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] canonical file $path unreadable " +
          s"($e); canonical gate disarmed")
        Map.empty
    }
  }
}
