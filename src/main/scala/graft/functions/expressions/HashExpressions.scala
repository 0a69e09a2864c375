package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the similarity hot paths.
  *
  * The pure-HOF formulations (64 `aggregate` lambdas per row for SimHash, one
  * `transform`+`array_min` per MinHash permutation, dim×planes `element_at`
  * terms per hyperplane bucket) build enormous expression trees: correct, but
  * 5-15 s/query at sf0.1. Each expression here is one JVM loop over the input
  * array — same results, one array scan.
  *
  * All use Spark's own XXH64 (seed 42) so values are identical to
  * `xxhash64()` built-in output where the HOF versions used it.
  */
object HashExpressions {

  private val SEED = 42L
  private def xx(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, SEED)

  /** Deterministic (a,b) parameter pairs in [1, 2^31) — MUST stay in sync with
    * SimilarityFunctions.minhashParams. */
  def minhashParams(numHashes: Int, seed: Long = SEED): Array[(Long, Long)] = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; math.abs(x % 2147483629L) + 1 }
    Array.fill(numHashes)((next(), next()))
  }

  val P31 = 2147483647L // 2^31-1

  /** MinHash signature in ONE scan:
    * sig_j = min over shingles of (a_j*(xxhash64(s) mod p)+b_j) mod p.
    * Accepts array<string> (shingles, hashed here) or array<long> (shingles
    * already xxhash64'd upstream — identical signatures, since the first step
    * is the same xxhash64). */
  case class MinHashSignatureExpr(child: Expression, numHashes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    @transient private lazy val params = minhashParams(numHashes)
    private def elementsAreLong: Boolean = child.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val longs = elementsAreLong
      val sig = Array.fill(numHashes)(P31)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val h = if (longs) arr.getLong(i) else xx(arr.getUTF8String(i))
        val h0 = ((h % P31) + P31) % P31
        var j = 0
        while (j < numHashes) {
          val (a, b) = params(j)
          val v = (a * h0 + b) % P31
          if (v < sig(j)) sig(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "minhash_signature"
  }

  /** 64-bit SimHash over a token array in ONE scan: per-token xxhash64, each
    * bit votes +1/-1, sign → fingerprint bit. */
  case class SimHash64Expr(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val h = xx(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      java.lang.Long.valueOf(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "simhash64"
  }

  /** Distinct xxhash64'd word n-gram shingles of a text column in ONE pass:
    * lowercase, whitespace-split, hash each n-token window (tokens joined by
    * single spaces — same shingle strings as
    * SimilarityFunctions.wordShingles). Replaces a slice+array_join HOF chain
    * that allocated O(tokens²) intermediate strings. */
  case class HashedShinglesExpr(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString.toLowerCase.trim
      if (text.isEmpty) return new GenericArrayData(Array.empty[Long])
      val tokens = text.split("\\s+")
      if (tokens.length < n) return new GenericArrayData(Array.empty[Long])
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= tokens.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(tokens(i + j)); j += 1 }
        seen.add(xx(UTF8String.fromString(sb.toString)))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "hashed_shingles"
  }

  /** Random-hyperplane sign bucket of a float-array vector: bit p set iff
    * dot(v, plane_p) > 0. Plane components MUST stay in sync with
    * Ann.planeComponent. */
  case class HyperplaneBucketExpr(child: Expression, dim: Int, planes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true

    @transient private lazy val matrix: Array[Array[Double]] =
      Array.tabulate(planes, dim)((p, d) => planeComponent(p, d))

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = math.min(dim, arr.numElements())
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val row = matrix(p)
        var acc = 0.0
        var d = 0
        while (d < n) { acc += arr.getFloat(d) * row(d); d += 1 }
        if (acc > 0) bucket |= (1L << p)
        p += 1
      }
      java.lang.Long.valueOf(bucket)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "hyperplane_bucket"
  }

  /** Same LCG as Ann.planeComponent (kept identical so buckets computed by
    * either path agree). */
  def planeComponent(p: Int, d: Int): Double = {
    var x = p.toLong * 1000003L + d.toLong * 7919L + 12345L
    x = x * 6364136223846793005L + 1442695040888963407L
    x = x * 6364136223846793005L + 1442695040888963407L
    (x >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  /** Sequential-order double dot product of two float/double arrays —
    * bit-identical to aggregate(zip_with(a,b,(x,y)=>x*y),0.0,+) but one fused
    * loop. */
  case class DotProductExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    private def isFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val (af, bf) = (isFloat(left), isFloat(right))
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
    override def prettyName: String = "dot_product"
  }

  // ----------------------------------------------------------- Column facade
  // Spark 4's public Column is ColumnNode-backed; the classic bridge converts
  // Expression ↔ Column.
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def minhash_signature(shingles: Column, numHashes: Int): Column =
    column(MinHashSignatureExpr(expression(shingles), numHashes))
  def hashed_shingles(text: Column, n: Int): Column =
    column(HashedShinglesExpr(expression(text), n))
  def simhash64(tokens: Column): Column = column(SimHash64Expr(expression(tokens)))
  def hyperplane_bucket(vec: Column, dim: Int, planes: Int): Column =
    column(HyperplaneBucketExpr(expression(vec), dim, planes))
  def dot_product(a: Column, b: Column): Column =
    column(DotProductExpr(expression(a), expression(b)))
}
