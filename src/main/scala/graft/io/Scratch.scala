package graft.io

/** Collision-safe scratch-directory keys for /tmp working sets (ANN
  * indexes, BM25 indexes, compaction roots, fleet state): md5 of the
  * corpus dir, so two concurrent gates over DIFFERENT corpora never
  * share — and never delete — each other's scratch roots. A truncated
  * `hashCode` could collide across distinct dirs, and
  * `math.abs(Int.MinValue)` is itself negative; a full digest has
  * neither failure mode. */
object Scratch {
  def key(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}
