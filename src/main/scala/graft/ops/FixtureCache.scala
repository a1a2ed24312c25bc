package graft.ops

/** Disk-cached fixture layouts under target/ (partitioned/bucketed
  * tables, generated asset dirs) are written once per SF and reused
  * across JVMs behind a success marker. The cache path embeds a
  * FINGERPRINT of the generator parameters: changing any constant
  * (LSH planes, bucket count, sample modulus, payload shape) must
  * invalidate the layout and trigger a rebuild — a silently reused
  * stale layout would surface as a confusing oracle mismatch pointing
  * nowhere near the changed constant.
  */
private[ops] object FixtureCache {

  /** `target/<kind>/<sfTag>_<fingerprint>` as an absolute file. */
  def dir(kind: String, sfDir: String, params: (String, Any)*): java.io.File = {
    val tag = new java.io.File(sfDir).getName.replace('.', '_')
    new java.io.File(s"target/$kind/${tag}_${fingerprint(params: _*)}")
      .getAbsoluteFile
  }

  /** Stable 8-hex-digit digest of the generator parameters. */
  def fingerprint(params: (String, Any)*): String = {
    val fp = params.map { case (k, v) => s"$k=$v" }.mkString(";")
    f"${scala.util.hashing.MurmurHash3.stringHash(fp)}%08x"
  }
}
