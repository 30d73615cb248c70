package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Theta/KMV distinct-count sketches with SET OPERATIONS — the
  * uniqTheta surface (upstream theta-sketch family: union, intersect,
  * difference over sketched sets), built from scratch on the repo's
  * md5-based 60-bit hash so no sketch library is needed.
  *
  * KMV ("k minimum values"): a set's sketch is the k smallest
  * distinct hash values of its members. Below capacity the sketch IS
  * the exact hashed set (θ = 1) — all set algebra is exact, which is
  * what lets `agg_theta_sketch` hash-match a COUNT(DISTINCT …)
  * oracle. At or above capacity, θ = v_k / 2^60 (the k-th smallest
  * normalized hash) and |S| ≈ (k−1)/θ; set operations restrict both
  * operands below min(θ_a, θ_b) and scale — the standard theta
  * estimator, property-tested to ~1/√k relative error in
  * ThetaSketchSpec.
  *
  * Scale: sketches merge associatively/commutatively (union of k-min
  * sets, re-trimmed), so Spark's partial/final aggregation applies;
  * a sketch is ≤ k longs regardless of input size — shippable,
  * storable, and combinable like any -State column.
  */
object Sketches {

  /** Hash space size: mh60 values lie in [0, 16^15) = [0, 2^60). */
  val HashSpace: Double = math.pow(2.0, 60)

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** JVM twin of Text.mh60(seed, x): first 15 md5 hex chars as a
    * long — same values the SQL/DuckDB sides would compute. Hot path:
    * the first 15 hex chars are the top 60 bits of the first 8 digest
    * bytes, so a big-endian read + logical shift replaces the hex
    * round-trip (equality with the hex form pinned in
    * ThetaSketchSpec); the digest instance is thread-local.
    */
  def hash60(seed: String, x: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s"$seed|$x".getBytes(StandardCharsets.UTF_8))
    val be = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }

  /** A theta sketch: `values` = ascending distinct hashes, all below
    * the (implicit) θ; `|values| < k` ⇔ exact mode (θ = 1).
    */
  final case class Theta(k: Int, values: Array[Long]) {
    require(values.length <= k, s"theta sketch overfull: ${values.length} > $k")

    /** θ in hash units: the inclusion threshold. */
    def thetaHash: Double =
      if (values.length < k) HashSpace else values.last.toDouble

    def isExact: Boolean = values.length < k

    /** Distinct-count estimate: exact below capacity, (k−1)/θ at it. */
    def estimate: Double =
      if (isExact) values.length.toDouble
      else (k - 1) * HashSpace / values.last.toDouble
  }

  /** Build a sketch from raw hash values (dedups, sorts, trims). */
  def fromHashes(k: Int, hashes: Iterable[Long]): Theta =
    Theta(k, hashes.toArray.distinct.sorted.take(k))

  def fromItems(k: Int, items: Iterable[String], seed: String = "th"): Theta =
    fromHashes(k, items.map(hash60(seed, _)))

  /** Union: merge the k-min sets, re-trim — the result is exactly the
    * sketch of the united stream (KMV unions are lossless in this
    * sense), so unions compose associatively.
    */
  def union(a: Theta, b: Theta): Theta = {
    val k = math.min(a.k, b.k)
    fromHashes(k, a.values ++ b.values)
  }

  def unionEstimate(a: Theta, b: Theta): Double = union(a, b).estimate

  /** Intersection estimate: count common hashes below the joint
    * θ = min(θ_a, θ_b); each survives with probability θ/2^60, so the
    * count scales by the inverse. Exact when both operands are exact.
    */
  def intersectEstimate(a: Theta, b: Theta): Double = {
    val cut = math.min(a.thetaHash, b.thetaHash)
    val av = a.values.iterator.takeWhile(_ < cut).toSet
    val common = b.values.iterator.takeWhile(_ < cut).count(av)
    common * HashSpace / cut
  }

  /** Difference |A ∖ B| estimate, same joint-θ restriction. */
  def differenceEstimate(a: Theta, b: Theta): Double = {
    val cut = math.min(a.thetaHash, b.thetaHash)
    val bv = b.values.iterator.takeWhile(_ < cut).toSet
    val only = a.values.iterator.takeWhile(_ < cut).count(h => !bv(h))
    only * HashSpace / cut
  }
}
