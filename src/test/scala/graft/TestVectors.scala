package graft

/** Shared deterministic embedding fixtures for the store specs: 8-dim
  * vectors whose near-dups are ±≤4% per-dim perturbations (cosine
  * ≈ 0.999, the sign-bit-LSH design point) while distinct seeds stay
  * far below any near-dup threshold. One copy, so a threshold or
  * perturbation tweak can't silently leave a sibling spec testing a
  * different design point.
  */
object TestVectors {
  def vec(seed: Long): Array[Float] =
    Array.tabulate(8)(i => (((seed * 31 + i * 17) % 19) - 9).toFloat max 1.0f)
  def nearDup(seed: Long): Array[Float] =
    vec(seed).zipWithIndex.map { case (x, i) =>
      (x * (1.0 + ((i * 7 + seed * 13) % 11 - 5) / 128.0)).toFloat }
}
