package graft.functions.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable sketch aggregates for corpus-scale statistics — the bounded-
  * memory answer to "how many distinct tokens / how often does this token
  * appear" over a corpus too large to shuffle token-grained rows for.
  *
  * Both are Catalyst `TypedImperativeAggregate`s, so Spark gives them the
  * full distributed-aggregation treatment for free: partial sketches build
  * map-side (one per partition, O(k) / O(d·w) memory), serialized partials
  * shuffle (bytes per partition, NOT per row), and merge is associative +
  * commutative, so the final value is independent of partition order —
  * which is what makes the results exactly replayable by a sequential
  * DuckDB oracle despite the parallel execution:
  *
  *  - KMV keeps the k SMALLEST distinct hashes: a set minimum is reached
  *    regardless of insertion order or grouping.
  *  - CMS bucket counts are sums of per-row increments: addition commutes.
  *
  * Hashes are md5-derived (first 15 hex chars → 60-bit non-negative long),
  * the engine-independent hash this repo's oracles replay in DuckDB as
  * `CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)`.
  */
object SketchAggregates {

  // MessageDigest is stateful and not thread-safe; one per task thread saves
  // a getInstance allocation per hashed token (CMS pays depth per row)
  private val localMd5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** 60-bit non-negative hash from md5, engine-replayable (see above). */
  def md5Hash60(s: String): Long = {
    val md = localMd5.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    // first 15 hex chars = 7.5 bytes: 7 full bytes + high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** KMV (k-minimum-values) distinct-count sketch: the k smallest DISTINCT
    * hash values seen. Evaluates to the ascending array (length
    * min(k, distinct)); the estimator `(k-1) * 2^60 / h_(k)` — or the exact
    * size when fewer than k survive — is plain Column arithmetic on top.
    * Buffer: a TreeSet capped at k, O(k) memory however large the input. */
  case class KmvSketchAgg(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {
    require(k > 0, "k must be positive")

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    private def add(b: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
      if (b.size < k) { b.add(v); () }
      else if (v < b.last()) { b.add(v); if (b.size > k) { b.pollLast(); () } }
    }

    override def update(b: java.util.TreeSet[java.lang.Long],
                        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) add(b, v.asInstanceOf[Long])
      b
    }

    override def merge(b: java.util.TreeSet[java.lang.Long],
                       o: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = o.iterator()
      while (it.hasNext) add(b, it.next())
      b
    }

    override def eval(b: java.util.TreeSet[java.lang.Long]): Any = {
      val out = new Array[Long](b.size)
      val it = b.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(b: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val buf = ByteBuffer.allocate(4 + 8 * b.size)
      buf.putInt(b.size)
      val it = b.iterator()
      while (it.hasNext) buf.putLong(it.next())
      buf.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val buf = ByteBuffer.wrap(bytes)
      val n = buf.getInt
      val b = createAggregationBuffer()
      var i = 0
      while (i < n) { b.add(buf.getLong); i += 1 }
      b
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
      copy(child = newChild)
    override def prettyName: String = "kmv_sketch"
  }

  /** Count-min sketch: a depth × width matrix of counters; row i increments
    * bucket md5(i + "|" + token) % width. Evaluates to the flattened
    * row-major ARRAY<LONG> (length depth·width); a point estimate for token
    * t is `min_i sketch[i·width + h_i(t)]` — plain Column arithmetic with
    * the same md5 bucket the probe side computes from built-ins. Counts are
    * EXACT sums (overestimation comes only from bucket collisions), so the
    * whole matrix replays in SQL as a (row, bucket) GROUP BY COUNT. */
  case class CmsSketchAgg(
      child: Expression, depth: Int, width: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {
    require(depth > 0 && width > 0, "depth and width must be positive")

    override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

    override def update(b: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val tok = v.asInstanceOf[UTF8String].toString
        var i = 0
        while (i < depth) {
          val bucket = (md5Hash60(s"$i|$tok") % width).toInt
          b(i * width + bucket) += 1
          i += 1
        }
      }
      b
    }

    override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b.length) { b(i) += o(i); i += 1 }
      b
    }

    override def eval(b: Array[Long]): Any = new GenericArrayData(b.clone())

    override def serialize(b: Array[Long]): Array[Byte] = {
      val buf = ByteBuffer.allocate(8 * b.length)
      var i = 0
      while (i < b.length) { buf.putLong(b(i)); i += 1 }
      buf.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val buf = ByteBuffer.wrap(bytes)
      val b = createAggregationBuffer()
      var i = 0
      while (i < b.length) { b(i) = buf.getLong; i += 1 }
      b
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
      copy(child = newChild)
    override def prettyName: String = "cms_sketch"
  }

  /** Second 60-bit value from the SAME md5 digest (hex chars 16-30 — low
    * nibble of byte 7, then bytes 8-14), engine-replayable as
    * `CAST(('0x' || substr(md5(x), 16, 15)) AS BIGINT)`. Paired with
    * [[md5Hash60]] it gives two independent hash streams from one digest
    * (the classic double-hashing basis h1 + i·h2 for Bloom positions). */
  def md5Hash60b(s: String): Long = {
    val md = localMd5.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    var h = d(7) & 0x0fL
    var i = 8
    while (i < 15) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Bloom-position walk shared by the build (agg) and probe (expression)
    * sides: bit i = (h1 + i·h2) mod m with h1/h2 the two md5-derived 60-bit
    * streams reduced mod m up front (keeps every intermediate far under
    * 2^63 — ANSI mode throws on overflow). h2 is forced ODD: a raw
    * h2 % m of 0 would collapse all k probes onto ONE bit (its per-gram FPR
    * then ~k·n/m instead of (k·n/m)^k — at 10¹³ corpus probe grams the
    * 2⁻²⁰-probability degenerate slice alone would emit thousands of false
    * flags), and with the REQUIRED power-of-two m any odd step is a unit
    * mod m, so the k positions are always distinct. */
  private[graft] def bloomSetBits(words: Array[Long], mBits: Int,
                                        kHashes: Int, g: String): Unit = {
    val h2 = ((md5Hash60b(g) % mBits) | 1L).toInt
    var p = (md5Hash60(g) % mBits).toInt
    var i = 0
    while (i < kHashes) {
      words(p >>> 6) |= 1L << (p & 63)
      p += h2; if (p >= mBits) p -= mBits
      i += 1
    }
  }

  private[graft] def bloomTest(words: Array[Long], mBits: Int,
                                     kHashes: Int, g: String): Boolean = {
    val h2 = ((md5Hash60b(g) % mBits) | 1L).toInt
    var p = (md5Hash60(g) % mBits).toInt
    var i = 0
    while (i < kHashes) {
      if ((words(p >>> 6) & (1L << (p & 63))) == 0L) return false
      p += h2; if (p >= mBits) p -= mBits
      i += 1
    }
    true
  }

  /** Bloom-filter aggregate over a STRING column: an m-bit array with
    * kHashes md5-derived double-hashed bits set per distinct input value.
    * Evaluates to the bitset as BINARY (m/8 bytes, big-endian longs).
    *
    * The decontamination-at-scale primitive: partial bitsets build map-side
    * and merge by OR (idempotent — duplicate inserts are free), so the
    * shuffle is m/8 bytes per partition however many grams the eval set
    * holds, and the result broadcasts to a probe SCAN instead of a join.
    * NO FALSE NEGATIVES ever; false-positive rate ≈ (1 − e^(−k·n/m))^k —
    * defaults sized so eval-set cardinalities keep it ~1e-9.
    *
    * The BINARY bitset is a RUN-INTERNAL artifact, not a stable
    * serialization format: build and probe must come from the same library
    * version (the position walk is an implementation detail — e.g. round 8
    * changed the double-hash step to be forced odd). Persist the eval-set
    * GRAMS if cross-version reuse is needed, and rebuild the filter. */
  case class BloomSketchAgg(
      child: Expression, mBits: Int, kHashes: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      "mBits must be a power of two >= 64 (odd double-hash steps are units mod 2^k)")
    require(kHashes > 0 && kHashes <= 16, "kHashes must be in [1, 16]")

    override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

    override def update(b: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) bloomSetBits(b, mBits, kHashes, v.asInstanceOf[UTF8String].toString)
      b
    }

    override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b.length) { b(i) |= o(i); i += 1 }
      b
    }

    override def eval(b: Array[Long]): Any = serialize(b)

    override def serialize(b: Array[Long]): Array[Byte] = {
      val buf = ByteBuffer.allocate(8 * b.length)
      var i = 0
      while (i < b.length) { buf.putLong(b(i)); i += 1 }
      buf.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val buf = ByteBuffer.wrap(bytes)
      val b = createAggregationBuffer()
      var i = 0
      while (i < b.length) { b(i) = buf.getLong; i += 1 }
      b
    }

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BloomSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): BloomSketchAgg =
      copy(child = newChild)
    override def prettyName: String = "bloom_sketch"
  }

  /** Bounded-heap bottom-k aggregate over an orderable struct: keeps the k
    * SMALLEST inputs under the struct's natural (field-lexicographic)
    * ordering — O(k) memory per partial, merged map-side, so "top tokens per
    * group" costs one aggregation instead of a full window sort of every
    * (group, token) row. Descending semantics come from negating the sort
    * field in the struct (e.g. `struct(-count, token)` = highest counts,
    * token-ascending tie-break — which also makes the kept SET unique and
    * therefore merge-order independent). Evaluates to the ascending array. */
  case class BottomKStructAgg(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[InternalRow]]
    with UnaryLike[Expression] {
    require(k > 0, "k must be positive")
    private def structType: StructType = child.dataType.asInstanceOf[StructType]

    @transient private lazy val ordering =
      org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(child.dataType)
    @transient private lazy val proj =
      org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(structType.fields.map(_.dataType))

    override def createAggregationBuffer(): java.util.TreeSet[InternalRow] =
      new java.util.TreeSet[InternalRow](new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ordering.compare(a, b)
      })

    private def add(b: java.util.TreeSet[InternalRow], v: InternalRow): Unit = {
      if (b.size < k) { b.add(v); () }
      else if (ordering.compare(v, b.last()) < 0) {
        b.add(v); if (b.size > k) { b.pollLast(); () }
      }
    }

    override def update(b: java.util.TreeSet[InternalRow],
                        input: InternalRow): java.util.TreeSet[InternalRow] = {
      val v = child.eval(input)
      // deep-copy through the UnsafeProjection: eval may return a
      // GenericInternalRow whose UTF8String fields still POINT INTO the
      // scan's reused row buffer — InternalRow.copy() clones only the
      // reference array, so buffered entries would silently mutate as the
      // scan advances (string-keyed structs collapsed to near-singletons).
      // proj(...).copy() materializes the bytes into a self-contained
      // UnsafeRow.
      if (v != null) add(b, proj(v.asInstanceOf[InternalRow]).copy())
      b
    }

    override def merge(b: java.util.TreeSet[InternalRow],
                       o: java.util.TreeSet[InternalRow]): java.util.TreeSet[InternalRow] = {
      val it = o.iterator()
      while (it.hasNext) add(b, it.next())
      b
    }

    override def eval(b: java.util.TreeSet[InternalRow]): Any = {
      val out = new Array[Any](b.size)
      val it = b.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(b: java.util.TreeSet[InternalRow]): Array[Byte] = {
      val rows = new scala.collection.mutable.ArrayBuffer[Array[Byte]](b.size)
      val it = b.iterator()
      // every buffer entry IS a self-contained UnsafeRow (update projects+
      // copies, deserialize materializes), so getBytes reads each row's own
      // backing array. Re-projecting here through the SHARED `proj` target
      // buffer made getBytes alias it — every fixed-width row serialized as
      // the last one and the set collapsed to one entry per partition on
      // deserialize (variable-width rows escaped by forcing a copy).
      while (it.hasNext) rows += it.next().asInstanceOf[
        org.apache.spark.sql.catalyst.expressions.UnsafeRow].getBytes
      val total = 4 + rows.map(4 + _.length).sum
      val buf = ByteBuffer.allocate(total)
      buf.putInt(rows.size)
      rows.foreach { r => buf.putInt(r.length); buf.put(r) }
      buf.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[InternalRow] = {
      val buf = ByteBuffer.wrap(bytes)
      val n = buf.getInt
      val b = createAggregationBuffer()
      var i = 0
      while (i < n) {
        val len = buf.getInt
        val arr = new Array[Byte](len)
        buf.get(arr)
        val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(
          structType.fields.length)
        row.pointTo(arr, len)
        b.add(row)
        i += 1
      }
      b
    }

    override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(newOffset: Int): BottomKStructAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BottomKStructAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): BottomKStructAgg =
      copy(child = newChild)
    override def prettyName: String = "bottom_k_struct"
  }

  /** HyperLogLog distinct-count sketch (Flajolet et al. 2007): m = 2^p
    * byte registers, register j = max over inputs hashing to bucket j of
    * (leading-zero count of the remaining 60−p hash bits, + 1). max is
    * commutative/associative, so partials merge in ANY order to the same
    * registers — which is what makes a parallel HLL exactly replayable by a
    * sequential DuckDB oracle: bucket `h // 2^(60−p)`, rho
    * `(60−p) − length(bin(h % 2^(60−p))) + 1` (bin() drops leading zeros in
    * both engines, so bit-length needs no floating log2).
    *
    * This is the fixed-size complement of [[KmvSketchAgg]]: KMV keeps k
    * exact hashes (better constants at small k·distinct), HLL keeps m bytes
    * total — 256 bytes for ~6.5% standard error at ANY cardinality, the
    * sketch every warehouse ships as approx_count_distinct. Shuffle cost is
    * m bytes per (group, partition) partial regardless of corpus size.
    *
    * Evaluates to the full register array (ARRAY<INT>, length m; 0 = empty
    * register). The estimator is [[hll_estimate]] — kept as plain Column
    * arithmetic on top so the oracle replays it symbol-for-symbol. */
  case class HllSketchAgg(
      child: Expression, p: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {
    require(p >= 4 && p <= 16, s"p must be in [4,16]: $p")
    private val m = 1 << p
    private val wBits = 60 - p // low bits fed to the leading-zero count

    override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

    override def update(b: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v != null) {
        val h = md5Hash60(v.asInstanceOf[UTF8String].toString)
        val bucket = (h >>> wBits).toInt
        val w = h & ((1L << wBits) - 1L)
        // nlz within the wBits window + 1; w == 0 → all wBits zeros → wBits+1
        val rho =
          if (w == 0L) wBits + 1
          else java.lang.Long.numberOfLeadingZeros(w) - (64 - wBits) + 1
        if (rho > b(bucket)) b(bucket) = rho.toByte
      }
      b
    }

    override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (o(i) > b(i)) b(i) = o(i); i += 1 }
      b
    }

    override def eval(b: Array[Byte]): Any = {
      val out = new Array[Int](m)
      var i = 0
      while (i < m) { out(i) = b(i).toInt; i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(b: Array[Byte]): Array[Byte] = b.clone()
    override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
      copy(child = newChild)
    override def prettyName: String = "hll_sketch"
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Aggregate: k smallest distinct values of a LONG hash column, ascending. */
  def kmv_sketch(hash: Column, k: Int): Column =
    column(KmvSketchAgg(expression(hash), k).toAggregateExpression())

  /** Aggregate: flattened depth×width count-min matrix over a STRING column. */
  def cms_sketch(token: Column, depth: Int, width: Int): Column =
    column(CmsSketchAgg(expression(token), depth, width).toAggregateExpression())

  /** Aggregate: k smallest struct values (natural field order), ascending. */
  def bottom_k_struct(v: Column, k: Int): Column =
    column(BottomKStructAgg(expression(v), k).toAggregateExpression())

  /** Aggregate: m-bit Bloom filter (BINARY) over a STRING column. */
  def bloom_sketch(v: Column, mBits: Int, kHashes: Int): Column =
    column(BloomSketchAgg(expression(v), mBits, kHashes).toAggregateExpression())

  /** Aggregate: 2^p HLL registers (ARRAY<INT>) over a STRING column. */
  def hll_sketch(v: Column, p: Int): Column =
    column(HllSketchAgg(expression(v), p).toAggregateExpression())

  /** The HLL cardinality estimate over a register array from [[hll_sketch]]
    * — plain Column arithmetic so a SQL oracle can replay it exactly.
    *
    * The harmonic sum Σ 2^(−M_j) is computed as the EXACT integer
    * S = Σ 2^(q − M_j) (q = max rho = 60−p+1; each term is a power of two
    * ≤ 2^q and the sum stays far under 2^63 for p ≤ 16), so the raw
    * estimate α·m²·2^q / S is ONE double division of two deterministic
    * operands — bit-identical however the registers were built. The
    * small-range correction m·ln(m/V) (V = empty registers, applied when
    * raw ≤ 2.5m) is the standard Flajolet linear counting branch. */
  def hll_estimate(regs: Column, p: Int): Column = {
    import org.apache.spark.sql.functions._
    val m = 1 << p
    val q = 60 - p + 1
    val alpha =
      if (m == 16) 0.673 else if (m == 32) 0.697
      else if (m == 64) 0.709 else 0.7213 / (1.0 + 1.079 / m)
    // pow(2, n) is exact for integral n — each term a representable power
    val s = aggregate(regs, lit(0L),
      (acc, r) => acc + pow(lit(2.0), lit(q) - r).cast("long"))
    val zeros = size(filter(regs, _ === 0)).cast("double")
    val raw = lit(alpha * m * m) * pow(lit(2.0), lit(q)) / s.cast("double")
    when(zeros > 0.0 && raw <= lit(2.5 * m),
      lit(m.toDouble) * log(lit(m.toDouble) / zeros)).otherwise(raw)
  }

  // ---------------- KMV set operations (theta-sketch style) ----------------
  //
  // Two KMV sketches over the same hash function support set-operation
  // ESTIMATES without revisiting the data: the bottom-k of the merged hash
  // sets is itself a valid KMV sketch of the union, and within that union
  // sample the fraction of hashes present in BOTH inputs is an unbiased
  // Jaccard estimator (the classic theta-sketch/KMV composition). Everything
  // here is plain Column array arithmetic over two k-length arrays — row
  // local, codegen'd, and exactly replayable by a SQL oracle.

  /** Union sketch: bottom-k of the two sketches' distinct hashes. */
  def kmv_union(a: Column, b: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    slice(array_sort(array_distinct(concat(a, b))), 1, k)
  }

  /** Distinct-count estimate from a KMV sketch: exact size when the sketch
    * never filled, else (k−1)·2^60 / h_(k) — q117's estimator as a reusable
    * Column. */
  def kmv_estimate(sk: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble * math.pow(2, 60)) /
        element_at(sk, k).cast("double"))
  }

  /** Jaccard estimate: fraction of the union sample present in both inputs.
    * O(k²) membership probes per row — k is a constant (e.g. 32), so this is
    * ~1k branch-free comparisons per GROUP, not per element. */
  def kmv_jaccard(a: Column, b: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val u = kmv_union(a, b, k)
    size(filter(u, h => array_contains(a, h) && array_contains(b, h)))
      .cast("double") / size(u).cast("double")
  }

  /** Intersection-cardinality estimate: jaccard × union estimate. */
  def kmv_intersect_estimate(a: Column, b: Column, k: Int): Column =
    kmv_jaccard(a, b, k) * kmv_estimate(kmv_union(a, b, k), k)

  /** Misra-Gries heavy-hitters sketch: AT MOST `k` (key, counter) pairs
    * whatever the stream, the "WHICH keys are hot" complement to
    * [[CmsSketchAgg]]'s "how hot is this key". Update is the classic MG
    * step (hit → increment; room → insert at 1; full → decrement ALL and
    * drop zeros, amortized O(1)); merge is the Agarwal et al. mergeable
    * form — sum counters, then subtract the (k+1)-st largest counter and
    * drop non-positives — which keeps the deterministic guarantee
    * c(t) − n/(k+1) ≤ est(t) ≤ c(t) under ANY merge tree (est is a LOWER
    * bound; a key with c(t) > n/(k+1) can never be evicted).
    *
    * EXACT REGIME: distinct keys ≤ k → no decrement ever fires, the sketch
    * IS the full count table (order- and partition-invariant), and a SQL
    * oracle replays it as GROUP BY count (q163). Above k the bound above is
    * what the specs pin.
    *
    * Evaluates to ARRAY<STRUCT<t: STRING, c: BIGINT>> sorted (c desc,
    * t asc) so top-N is an array slice, no further aggregation. */
  case class MgSketchAgg(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
    with UnaryLike[Expression] with ExpectsInputTypes {
    require(k > 0, "k must be positive")

    // analysis-time type check: a wrong-typed SQL call (mg_sketch(int_col, 8)
    // via the injected function) fails with a clear message instead of an
    // executor-time ClassCastException
    override def inputTypes: Seq[DataType] = Seq(StringType)

    override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
      new java.util.HashMap[String, java.lang.Long]()

    override def update(b: java.util.HashMap[String, java.lang.Long],
                        input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) MgCounter.add(b, k, v.asInstanceOf[UTF8String].toString)
      b
    }

    override def merge(b: java.util.HashMap[String, java.lang.Long],
                       o: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] =
      MgCounter.merge(b, k, o)

    override def eval(b: java.util.HashMap[String, java.lang.Long]): Any = {
      val entries = new Array[(String, Long)](b.size)
      var i = 0
      b.forEach { (s, c) => entries(i) = (s, c); i += 1 }
      // count ties break by UTF-8 BINARY order (= code-point order), the
      // ordering Spark and the DuckDB oracle both sort strings by — Scala
      // String '<' is UTF-16 code-unit order, which diverges for
      // supplementary-plane grams
      scala.util.Sorting.stableSort(entries,
        (a: (String, Long), x: (String, Long)) =>
          a._2 > x._2 || (a._2 == x._2 &&
            UTF8String.fromString(a._1).binaryCompare(UTF8String.fromString(x._1)) < 0))
      new GenericArrayData(entries.map { case (s, c) =>
        InternalRow(UTF8String.fromString(s), c)
      })
    }

    override def serialize(b: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
      val items = new scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)](b.size)
      b.forEach { (s, c) => items += ((s.getBytes(StandardCharsets.UTF_8), c)) }
      val buf = ByteBuffer.allocate(4 + items.iterator.map(e => 12 + e._1.length).sum)
      buf.putInt(items.size)
      items.foreach { case (sb, c) =>
        buf.putInt(sb.length); buf.put(sb); buf.putLong(c)
      }
      buf.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
      val buf = ByteBuffer.wrap(bytes)
      val n = buf.getInt
      val b = createAggregationBuffer()
      var i = 0
      while (i < n) {
        val len = buf.getInt
        val arr = new Array[Byte](len)
        buf.get(arr)
        b.put(new String(arr, StandardCharsets.UTF_8), buf.getLong)
        i += 1
      }
      b
    }

    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("t", StringType, nullable = false),
        StructField("c", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(newOffset: Int): MgSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MgSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): MgSketchAgg =
      copy(child = newChild)
    override def prettyName: String = "mg_sketch"
  }

  /** The Misra-Gries algorithm on a plain counter map — factored out of the
    * aggregate so the guarantee (lower-bound counts within n/(k+1), ≤ k
    * counters, under any merge tree) is property-testable driver-side. */
  object MgCounter {
    def add(b: java.util.HashMap[String, java.lang.Long], k: Int, s: String): Unit = {
      val cur = b.get(s)
      if (cur != null) { b.put(s, cur + 1L); () }
      else if (b.size < k) { b.put(s, 1L); () }
      else {
        val it = b.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }

    def merge(b: java.util.HashMap[String, java.lang.Long], k: Int,
              o: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
      o.forEach { (s, c) =>
        val cur = b.get(s)
        b.put(s, if (cur == null) c else cur + c)
      }
      if (b.size > k) {
        // subtract the (k+1)-st largest counter, drop non-positives
        val counts = new Array[Long](b.size)
        var i = 0
        val vit = b.values().iterator()
        while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
        java.util.Arrays.sort(counts)
        val d = counts(counts.length - k - 1)
        val it = b.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
        }
      }
      b
    }
  }

  /** KLL/MRL-style mergeable QUANTILE sketch: a ladder of compactor levels,
    * level i holding values of weight 2^i, each capped at `k` values. When a
    * level fills, its sorted buffer is halved by keeping every second value
    * (alternating start parity per level, tracked in the buffer, so the
    * ± rank bias cancels across compactions) and promoting the survivors one
    * level up — memory O(k·log(n/k)) however large the input, and the
    * partials merge associatively level-by-level, which is what lets Spark
    * run it map-side + shuffle bytes-per-partition like every other sketch
    * here.
    *
    * DETERMINISM CONTRACT (what the specs/oracle rely on): compaction is
    * fully deterministic (sorted buffer, parity counter — no RNG), so a
    * given merge tree always yields the same sketch; and while the sketch
    * CONTENT above the exact regime legitimately depends on the merge tree
    * (true of every sublinear quantile sketch), the ANSWER carries a
    * deterministic rank-error bound ε·n (KllSketchSpec pins it), and in the
    * EXACT REGIME — fewer than k values per group, so no compaction ever
    * fires — the sketch is the sorted value list with unit weights,
    * bit-identical under ANY partitioning, and quantiles are exact order
    * statistics a SQL oracle replays (q160).
    *
    * Evaluates to ARRAY<STRUCT<v: DOUBLE, w: BIGINT>> sorted by (v, w); the
    * estimator [[kll_quantile]] is plain Column arithmetic on top. Nulls are
    * skipped; NaNs are the caller's to filter (they sort last, poisoning the
    * upper quantiles — same caveat as any order statistic). */
  case class KllSketchAgg(
      child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer]
    with UnaryLike[Expression] {
    require(k >= 8 && k % 2 == 0, s"k must be even and >= 8: $k")

    // NUMERIC-only analysis check. Deliberately NOT ImplicitCastInputTypes
    // with DoubleType: Spark's implicit cast would accept STRING columns
    // too, silently turning non-numeric values into skipped nulls — a
    // garbage sketch with no error anywhere. Numeric widths convert at
    // update time instead, so kll_sketch(int_col, k) still just works.
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case _: NumericType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kll_sketch requires a numeric column, got ${t.simpleString}")
      }

    override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

    override def update(b: KllBuffer, input: InternalRow): KllBuffer = {
      val v = child.eval(input)
      if (v != null) v match {
        case d: java.lang.Number => b.add(d.doubleValue)
        case d: Decimal => b.add(d.toDouble)
        case other => throw new IllegalStateException(
          s"kll_sketch: unexpected value type ${other.getClass.getName}")
      }
      b
    }

    override def merge(b: KllBuffer, o: KllBuffer): KllBuffer = { b.mergeIn(o); b }

    override def eval(b: KllBuffer): Any = {
      val pairs = b.flattenSorted()
      new GenericArrayData(pairs.map { case (v, w) =>
        InternalRow(v, w)
      })
    }

    override def serialize(b: KllBuffer): Array[Byte] = b.toBytes
    override def deserialize(bytes: Array[Byte]): KllBuffer = KllBuffer.fromBytes(k, bytes)

    override def dataType: DataType = ArrayType(
      StructType(Seq(StructField("v", DoubleType, nullable = false),
        StructField("w", LongType, nullable = false))), containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
      copy(child = newChild)
    override def prettyName: String = "kll_sketch"
  }

  /** Aggregate: KLL quantile sketch over a DOUBLE column — (v, w) pairs. */
  def kll_sketch(v: Column, k: Int): Column =
    column(KllSketchAgg(expression(v), k).toAggregateExpression())

  /** Aggregate: Misra-Gries heavy hitters over a STRING column — ≤ k
    * (t, c) pairs sorted (c desc, t asc). */
  def mg_sketch(v: Column, k: Int): Column =
    column(MgSketchAgg(expression(v), k).toAggregateExpression())

  /** Weighted lower quantile over a [[kll_sketch]] array: the smallest v
    * whose cumulative weight reaches target = min(⌊q·W⌋+1, W) — for unit
    * weights this is the target-th order statistic exactly, which is the
    * form the SQL oracle replays (row_number = target over sorted values).
    * Implemented as ONE codegen kernel pass ([[Kernels.kllQuantile]]); the
    * HOF formulation below stays as the cross-check ([[kll_quantile_hof]],
    * equality spec-asserted) — interpreted HOF folds cost ~0.4 s per
    * quantile column on 2k-pair sketches (the q95/q107 lesson). Null for
    * an empty sketch, matching the HOF's fold-never-fires null. */
  def kll_quantile(sk: Column, q: Double): Column = {
    import org.apache.spark.sql.functions.{lit, size, when}
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1]: $q")
    val raw = column(HashExpressions.KllQuantileExpr(expression(sk), q))
    when(size(sk) === 0, lit(null).cast("double")).otherwise(raw)
  }

  /** The pure-Column HOF formulation of [[kll_quantile]] — kept as the
    * executable specification the kernel is asserted against. */
  def kll_quantile_hof(sk: Column, q: Double): Column = {
    import org.apache.spark.sql.functions._
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1]: $q")
    val w = aggregate(sk, lit(0L), (acc, e) => acc + e.getField("w"))
    val target = least(floor(lit(q) * w.cast("double")).cast("long") + lit(1L), w)
    aggregate(sk,
      struct(lit(0L).as("cum"), lit(null).cast("double").as("ans")),
      (acc, e) => struct(
        (acc.getField("cum") + e.getField("w")).as("cum"),
        when(acc.getField("ans").isNull &&
            acc.getField("cum") + e.getField("w") >= target, e.getField("v"))
          .otherwise(acc.getField("ans")).as("ans")),
      acc => acc.getField("ans"))
  }

  /** Equi-join SIZE estimate from two count-min sketches over the join key
    * (the AGMS/CMS inner-product estimator): |A ⋈ B| = Σ_v cntA(v)·cntB(v),
    * and each CMS row's dot product overestimates that sum by only the
    * collision mass — min over rows is the classic upper-bound estimate.
    * Query planning from sketches: the broadcast-vs-shuffle / skew-risk
    * decision WITHOUT running the join, from two bounded aggregates that
    * also merge across partitions/days. Exact integer arithmetic
    * (counters are longs), so a SQL oracle replays it bit-for-bit. */
  def cms_join_estimate(a: Column, b: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions._
    val rowDots = (0 until depth).map { r =>
      aggregate(
        zip_with(slice(a, r * width + 1, width), slice(b, r * width + 1, width),
          (x, y) => x * y),
        lit(0L), (acc, v) => acc + v)
    }
    rowDots.reduce(least(_, _))
  }
}

/** Mutable compactor ladder backing [[SketchAggregates.KllSketchAgg]]:
  * `levels(i)` holds (unsorted) values of weight 2^i, capped at `k`;
  * `parity(i)` counts compactions of level i so the kept-index start
  * alternates (0,1,0,…) — deterministic, and the ± half-weight rank bias of
  * "keep every second value" cancels over successive compactions instead of
  * accumulating one-sided. */
final class KllBuffer(val k: Int) extends Serializable {
  import scala.collection.mutable.ArrayBuffer
  private[expressions] val levels = ArrayBuffer(ArrayBuffer.empty[Double])
  private[expressions] val parity = ArrayBuffer(0)

  def add(v: Double): Unit = {
    levels(0) += v
    if (levels(0).size >= k) compact(0)
  }

  private def ensureLevel(i: Int): Unit =
    while (levels.size <= i) { levels += ArrayBuffer.empty[Double]; parity += 0 }

  private def compact(i: Int): Unit = {
    val arr = levels(i).toArray
    java.util.Arrays.sort(arr)
    val start = parity(i) & 1
    parity(i) += 1
    levels(i).clear()
    ensureLevel(i + 1)
    val up = levels(i + 1)
    var j = start
    while (j < arr.length) { up += arr(j); j += 2 }
    if (up.size >= k) compact(i + 1)
  }

  def mergeIn(o: KllBuffer): Unit = {
    var i = 0
    while (i < o.levels.size) {
      ensureLevel(i)
      levels(i) ++= o.levels(i)
      parity(i) += o.parity(i)
      i += 1
    }
    i = 0
    while (i < levels.size) {
      if (levels(i).size >= k) compact(i) // cascades; higher levels re-checked below
      i += 1
    }
  }

  /** (value, weight) pairs sorted by (v, w) — weight 2^level. */
  def flattenSorted(): Array[(Double, Long)] = {
    val out = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.size) {
      val w = 1L << i
      levels(i).foreach(v => out += ((v, w)))
      i += 1
    }
    out.sortInPlace()(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    out.toArray
  }

  def toBytes: Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(
      4 + levels.iterator.map(l => 8 + 8 * l.size).sum)
    buf.putInt(levels.size)
    var i = 0
    while (i < levels.size) {
      buf.putInt(parity(i))
      buf.putInt(levels(i).size)
      levels(i).foreach(buf.putDouble)
      i += 1
    }
    buf.array()
  }
}

object KllBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): KllBuffer = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val b = new KllBuffer(k)
    val n = buf.getInt
    var i = 0
    while (i < n) {
      if (i > 0) { b.levels += scala.collection.mutable.ArrayBuffer.empty[Double]; b.parity += 0 }
      b.parity(i) = buf.getInt
      val c = buf.getInt
      var j = 0
      while (j < c) { b.levels(i) += buf.getDouble; j += 1 }
      i += 1
    }
    b
  }
}
