package graft.util

/** SQL-expressible 61-bit hashing for the sketch operators (MinHash, SimHash,
  * LSH hyperplanes, rolling fingerprints).
  *
  * Why not xxhash64/murmur3: those mix with 64-bit *wrapping* multiplies,
  * which a DuckDB oracle cannot reproduce (BIGINT multiplication traps on
  * overflow, and there is no wrapping variant) — so every operator built on
  * them was stuck at rows-only verification. This hash family keeps every
  * intermediate inside provable ranges:
  *
  *   - per-character polynomial folds mod two 31-bit primes (all values
  *     < 2^62 — plain BIGINT arithmetic on both engines),
  *   - one multiplicative mix `(h1·2^31 + h2) · C mod (2^61-1)` whose 122-bit
  *     product DuckDB computes in HUGEINT and Scala via
  *     `Math.multiplyHigh` + a Mersenne fold (both exact, no wrap).
  *
  * Collision resistance stays ~2^62 on the combined pre-mix value (a
  * collision must hit BOTH independent 31-bit polynomials), so the 100-TB
  * story is unchanged vs a single 64-bit hash; the mix step spreads the
  * combined value across all 61 bits for the sign/bit/min consumers. Every
  * function here has a line-for-line SQL twin in the DuckDB oracles
  * (`QueriesCrawlOps.oracles` m1/m2/m4/n2/n3/t4).
  */
object SqlHash {

  /** 2^31-1 and a second 31-bit prime — the two polynomial moduli. */
  val P1: Long = 2147483647L
  val P2: Long = 2147483629L

  /** 2^61-1 (Mersenne prime) — the mix modulus. */
  val M61: Long = (1L << 61) - 1

  /** Odd mix multipliers, all < 2^61 (arbitrary, fixed by the oracle
    * contract; C is the xorshift1024* multiplier truncated into range).
    */
  val C: Long = 1181783497276652981L
  val C2: Long = 1476695655912598219L
  val C3: Long = 1131312115126579579L

  /** (a·b) mod (2^61-1) for a < 2^62, b < 2^61: exact ≤123-bit product via
    * `multiplyHigh` (signed == unsigned — both operands < 2^63), then the
    * Mersenne fold 2^64 ≡ 8, 2^61 ≡ 1. The operand bounds keep
    * `hi·8 + fold(lo)` under 2^63 (hi < 2^59).
    */
  def mulModM61(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // < 2^59 for a < 2^62, b < 2^61
    val lo = a * b // low 64 bits, interpret unsigned
    modM61(hi * 8 + (lo & M61) + (lo >>> 61)) // < 2^63: no overflow
  }

  /** x mod (2^61-1) for x in [0, 2^63). */
  @inline def modM61(x: Long): Long = {
    val f = (x & M61) + (x >>> 61) // <= M61 + 3
    if (f >= M61) f - M61 else f
  }

  /** Pre-mix 62-bit token value: dual char-polynomials (base 31 mod P1,
    * base 37 mod P2) over UTF-16 units, combined as `h1·2^31 + h2`. Every
    * intermediate fits plain BIGINT, so this level is expressible even in
    * Spark SQL built-ins (the fingerprint HOF cross-check uses it).
    * ASCII-safe cross-engine: DuckDB's `unicode(c)` and Spark's `ascii(c)`
    * equal `charAt(i).toInt` for BMP text (the corpus contract; PagesGen
    * text is pure ASCII).
    */
  def combined(t: String): Long = {
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i).toLong
      h1 = (h1 * 31 + c) % P1
      h2 = (h2 * 37 + c) % P2
      i += 1
    }
    h1 * 2147483648L + h2
  }

  /** 61-bit token hash: [[combined]] spread across all 61 bits by one
    * multiplicative mix mod 2^61-1 (for the bit/sign/min consumers —
    * SimHash, MinHash, band keys).
    */
  def hashToken(t: String): Long = mulModM61(combined(t), C)

  /** Seed-j MinHash value for a base token/shingle hash: the textbook
    * universal family `(A_j·h + B_j) mod p` with deterministic per-seed
    * coefficients (A_j nonzero: an odd number times C2 mod a prime).
    */
  def minhashAt(base: Long, j: Int): Long = {
    val aj = mulModM61(2L * j + 1, C2)
    val bj = mulModM61(j + 1L, C3)
    modM61(mulModM61(aj, base) + bj)
  }

  /** Deterministic pseudo-random hyperplane/centroid component in [-1, 1)
    * for (table, plane, dim). The three fields occupy disjoint bit ranges
    * (dim, plane < 2^20), so the packed key is arithmetic — `t·2^40 +
    * p·2^20 + d` — and the whole map is one mul-mod away from SQL.
    */
  def hpComponent(table: Int, plane: Int, dim: Int): Double = {
    val key = (table.toLong << 40) + (plane.toLong << 20) + dim.toLong
    // two mul-mod rounds: one round's consecutive-key outputs are an
    // arithmetic (Weyl) sequence mod 2^61-1 — visibly correlated across
    // dims; the second round breaks the lattice (SimilaritySpec gates,
    // one→two rounds: IVF recall@3 0.850→0.917, LSH near-dup pair-recall
    // 0.848→0.868, ANN recall@3 0.850 both)
    (mulModM61(mulModM61(key, C), C2) % 100000L).toDouble / 50000.0 - 1.0
  }
}
