package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * `Aggregator` — the mergeable-sketch surface from SURVEY §7.4:
  * unlike `approx_count_distinct`'s opaque HLL buffer, a KMV buffer
  * is a plain sorted array of the k smallest hash values, so sketches
  * can be persisted as ordinary columns, merged across days/tables,
  * and intersected (Jaccard over minhashes) — the shapes a 100 TB
  * incremental pipeline needs.
  *
  * Estimator: with the k-th smallest of n distinct uniform hashes at
  * normalized position p = kth/2^64, E[distinct] ≈ (k-1)/p. Error
  * ~ 1/sqrt(k) (k=256 → ~6%).
  *
  * The buffer is bounded (k longs), merge is a sorted-array merge —
  * both map-side combinable, so the shuffle carries k longs per
  * group, independent of input size.
  */
object KmvSketch {
  val K = 256

  /** Buffer: ascending array of the k smallest (unsigned-compared)
    * xxhash64 values seen. */
  final case class Buf(mins: Array[Long])

  private def unsignedLt(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  private def insert(buf: Buf, h: Long): Buf = {
    val m = buf.mins
    if (m.length >= K && !unsignedLt(h, m(m.length - 1))) buf
    else {
      // binary search by unsigned order; skip duplicates
      var lo = 0
      var hi = m.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (unsignedLt(m(mid), h)) lo = mid + 1 else hi = mid
      }
      if (lo < m.length && m(lo) == h) buf
      else {
        val out = new Array[Long](math.min(m.length + 1, K))
        System.arraycopy(m, 0, out, 0, lo)
        if (lo < out.length) {
          out(lo) = h
          System.arraycopy(m, lo, out, lo + 1,
            math.min(m.length - lo, out.length - lo - 1))
        }
        Buf(out)
      }
    }
  }

  private def mergeSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, K))
    var i = 0
    var j = 0
    var n = 0
    var last = 0L
    var hasLast = false
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length ||
        (i < a.length && unsignedLt(a(i), b(j)))
      val v = if (takeA) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (!hasLast || v != last) {
        out(n) = v; n += 1; last = v; hasLast = true
      }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** The typed aggregator: IN = already-hashed long (hash before
    * aggregating so the sketch is column-type-agnostic). `bits` is
    * the hash width the estimator normalizes by: 64 for xxhash64
    * (unsigned wraparound handled), 60 for the engine-portable md5
    * hash (graft.core.PortableHash) — with the portable hash the
    * ESTIMATE itself is reproducible in the SQL oracle. */
  def aggregatorBits(bits: Int): Aggregator[Long, Buf, Long] =
    new Aggregator[Long, Buf, Long] {
      private val norm = math.pow(2.0, bits)
      override def zero: Buf = Buf(Array.empty)
      override def reduce(b: Buf, h: Long): Buf = insert(b, h)
      override def merge(a: Buf, b: Buf): Buf =
        Buf(mergeSorted(a.mins, b.mins))
      override def finish(b: Buf): Long = {
        val m = b.mins
        if (m.length < K) m.length.toLong
        else {
          // p = kth value as a fraction of the hash space
          val kth = m(m.length - 1)
          val frac = kth.toDouble / norm
          val p = if (kth < 0) frac + 1.0 else frac
          math.round((K - 1) / p)
        }
      }
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  val aggregator: Aggregator[Long, Buf, Long] = aggregatorBits(64)

  /** Column API: approx distinct of a pre-hashed long column. */
  def approxDistinct(hashed: Column, bits: Int = 64): Column =
    udaf(aggregatorBits(bits), Encoders.scalaLong).apply(hashed)

  // ---- sketch-VALUED surface: the mergeable set-algebra API -------

  /** Aggregator whose result is the sketch ITSELF (the ascending
    * k-minimum array) rather than the collapsed estimate — what gets
    * persisted, merged across partitions/days, and fed to the set
    * estimators below. */
  val sketchAggregator: Aggregator[Long, Buf, Array[Long]] =
    new Aggregator[Long, Buf, Array[Long]] {
      override def zero: Buf = Buf(Array.empty)
      override def reduce(b: Buf, h: Long): Buf = insert(b, h)
      override def merge(a: Buf, b: Buf): Buf =
        Buf(mergeSorted(a.mins, b.mins))
      override def finish(b: Buf): Array[Long] = b.mins
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }

  /** Column API: the k-minimum array of a pre-hashed long column. */
  def sketchOf(hashed: Column): Column =
    udaf(sketchAggregator, Encoders.scalaLong).apply(hashed)

  /** Merge two sketch arrays (union sketch). */
  def unionOf(a: Array[Long], b: Array[Long]): Array[Long] =
    mergeSorted(a, b)

  /** Aggregator over SKETCH-valued rows: merges pre-built k-min
    * arrays (hourly/daily partials) into the union sketch — the
    * rollup consumer of [[sketchOf]]. This is what makes KMV the
    * 100 TB windowed-distinct shape: the exchange carries ≤K longs
    * per partial, independent of the member cardinality the partial
    * summarizes. */
  val mergeSketchAggregator: Aggregator[Array[Long], Buf, Array[Long]] =
    new Aggregator[Array[Long], Buf, Array[Long]] {
      override def zero: Buf = Buf(Array.empty)
      override def reduce(b: Buf, sk: Array[Long]): Buf =
        Buf(mergeSorted(b.mins, sk))
      override def merge(a: Buf, b: Buf): Buf =
        Buf(mergeSorted(a.mins, b.mins))
      override def finish(b: Buf): Array[Long] = b.mins
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }

  /** Column API: union-merge a sketch-array column. */
  def mergeOf(sketches: Column): Column =
    udaf(mergeSketchAggregator,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]())
      .apply(sketches)

  /** Estimate from a sketch array — identical branch structure to
    * [[aggregatorBits]]'s finish (exact below K, (K-1)/p above). */
  def estimateOf(mins: Array[Long], bits: Int): Long =
    if (mins.length < K) mins.length.toLong
    else {
      val norm = math.pow(2.0, bits)
      val kth = mins(mins.length - 1)
      val frac = kth.toDouble / norm
      val p = if (kth < 0) frac + 1.0 else frac
      math.round((K - 1) / p)
    }

  /** Beyer et al. (SIGMOD'07) KMV intersection: over the union's
    * k-minimum values, the fraction present in BOTH side sketches
    * scales the union estimate. Exact when the union sketch is not
    * yet full (it then holds every distinct hash of both sets). */
  def intersectEstimate(a: Array[Long], b: Array[Long],
      bits: Int): Long = {
    val u = unionOf(a, b)
    val (sa, sb) = (a.toSet, b.toSet) // k-bounded; order-agnostic
    val inBoth = u.count(h => sa(h) && sb(h))
    if (u.length < K) inBoth.toLong
    else math.round((inBoth * estimateOf(u, bits)) / K.toDouble)
  }
}
