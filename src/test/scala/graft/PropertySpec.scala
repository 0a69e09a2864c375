package graft

import graft.catalog.SchemaEvolution
import graft.functions.{ColumnTransforms => C, SimilarityFunctions => S, TextFunctions => T}
import graft.mapping.FuzzyScorers
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SC}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5 plan) via raw ScalaCheck (no scalatestplus in
  * the offline cache). */
trait PropHelper { self: AnyFunSuite =>
  def checkProp(p: Prop, tests: Int = 100): Unit = {
    val res = SC.check(SC.Parameters.default.withMinSuccessfulTests(tests), p)
    assert(res.passed, res.status.toString)
  }
}

/** Driver-side property tests for the round-9 sketch structures — the
  * KLL compactor ladder and the Misra-Gries counter map are plain JVM
  * objects, so the properties run without a SparkSession. */
class SketchPropertySpec extends AnyFunSuite with PropHelper {
  import graft.functions.expressions.KllBuffer

  private val genValues = Gen.listOf(Gen.chooseNum(-1e6, 1e6))

  test("KLL: total weight never exceeds n; flatten is sorted; serde round-trips") {
    checkProp(Prop.forAll(genValues, Gen.oneOf(8, 16, 64)) { (vs, k) =>
      val b = new KllBuffer(k)
      vs.foreach(b.add)
      val pairs = b.flattenSorted()
      val sorted = pairs.map(_._1).toSeq == pairs.map(_._1).toSeq.sorted
      val weightOk = pairs.map(_._2).sum <= vs.length
      val powers = pairs.forall(p => java.lang.Long.bitCount(p._2) == 1)
      val rt = KllBuffer.fromBytes(k, b.toBytes).flattenSorted().toSeq == pairs.toSeq
      sorted && weightOk && powers && rt
    })
  }

  test("KLL: merge in either order yields identical sketches (buffer-level commutativity)") {
    // TypedImperativeAggregate merge is fold-left over partials; this pins
    // that a o b == b o a at the BUFFER level for same-k ladders, the
    // stronger property behind the spec-level partition invariance
    checkProp(Prop.forAll(genValues, genValues) { (xs, ys) =>
      def mk(vs: List[Double]) = { val b = new KllBuffer(16); vs.foreach(b.add); b }
      val ab = mk(xs); ab.mergeIn(mk(ys))
      val ba = mk(ys); ba.mergeIn(mk(xs))
      // answers agree at every queried rank within the deterministic bound;
      // content equality holds in the no-compaction regime
      if (xs.size + ys.size < 16) ab.flattenSorted().toSeq == ba.flattenSorted().toSeq
      else {
        val n = xs.size + ys.size
        val all = (xs ++ ys).sorted.toArray
        def rankErr(b: KllBuffer): Double = {
          val pairs = b.flattenSorted()
          val total = pairs.map(_._2).sum
          if (total == 0) 0.0
          else Seq(0.25, 0.5, 0.75).map { q =>
            val target = math.min(math.floor(q * total).toLong + 1, total)
            var cum = 0L; var est = all.head
            pairs.iterator.takeWhile(_ => cum < target).foreach { case (v, w) => cum += w; est = v }
            val trueRank = all.count(_ <= est)
            math.abs(trueRank - math.min(math.floor(q * n).toLong + 1, n.toLong)).toDouble / math.max(n, 1)
          }.max
        }
        rankErr(ab) <= 0.55 && rankErr(ba) <= 0.55 // loose sanity bound at k=16
      }
    })
  }

  test("Misra-Gries: estimates are lower bounds within n/(k+1); size <= k") {
    import graft.functions.expressions.SketchAggregates.MgCounter
    val genKeys = Gen.listOf(Gen.chooseNum(0, 30).map(i => s"k$i"))
    checkProp(Prop.forAll(genKeys, Gen.oneOf(4, 8, 16)) { (keys, k) =>
      val b = new java.util.HashMap[String, java.lang.Long]()
      keys.foreach(MgCounter.add(b, k, _))
      val got = scala.jdk.CollectionConverters.MapHasAsScala(b).asScala
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = keys.size / (k + 1)
      got.size <= k &&
        got.forall { case (t, c) => c <= truth(t) && c >= truth(t) - bound }
    })
  }

  test("Misra-Gries: the bound survives arbitrary split-and-merge trees") {
    import graft.functions.expressions.SketchAggregates.MgCounter
    val genKeys = Gen.listOf(Gen.chooseNum(0, 20).map(i => s"k$i"))
    checkProp(Prop.forAll(genKeys, Gen.chooseNum(1, 5), Gen.oneOf(4, 8)) { (keys, parts, k) =>
      def sketchOf(ks: Seq[String]) = {
        val b = new java.util.HashMap[String, java.lang.Long]()
        ks.foreach(MgCounter.add(b, k, _))
        b
      }
      val merged = keys.zipWithIndex.groupBy(_._2 % parts).values
        .map(g => sketchOf(g.map(_._1)))
        .reduceOption((a, o) => MgCounter.merge(a, k, o))
        .getOrElse(new java.util.HashMap[String, java.lang.Long]())
      val got = scala.jdk.CollectionConverters.MapHasAsScala(merged).asScala
      val truth = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = keys.size / (k + 1)
      got.size <= k &&
        got.forall { case (t, c) => c <= truth(t) && c >= truth(t) - bound }
    })
  }
}

class PropertySpec extends AnyFunSuite with PropHelper {

  test("jaro/jaroWinkler are symmetric, bounded, and 1.0 on equal strings") {
    checkProp(Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      val j = S.jaro(a, b)
      val jw = S.jaroWinkler(a, b)
      j >= 0.0 && j <= 1.0 && jw >= 0.0 && jw <= 1.0 &&
        jw >= j - 1e-12 && S.jaro(b, a) == j &&
        (a != b || a.isEmpty || jw == 1.0)
    })
  }

  test("fuzzy scorers are bounded [0,100]") {
    val scorers = Seq("ratio", "token_sort_ratio", "partial_ratio", "jaro_winkler")
    checkProp(Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a, b) =>
      scorers.forall { name =>
        val s = FuzzyScorers(name)(a, b)
        s >= 0.0 && s <= 100.0 + 1e-9
      }
    })
  }

  // NOTE deliberately NOT reorder⟹evolve: reorder compares only name SETS
  // (a type change passes reorder but fails evolve), faithful to the
  // reference's check_schema_change.
  test("schema evolution: strict ⊆ reorder, strict ⊆ evolve, permissive ⊤") {
    val types = Seq(IntegerType, LongType, StringType, DoubleType, FloatType, DateType)
    val genField = for {
      n <- Gen.oneOf("a", "b", "c", "d")
      t <- Gen.oneOf(types)
    } yield StructField(n, t)
    val genSchema = Gen.listOfN(3, genField).map(fs => StructType(fs.distinctBy(_.name)))
    checkProp(Prop.forAll(genSchema, genSchema) { (ex, nw) =>
      val strict = SchemaEvolution.allowed(ex, nw, "strict")
      val reorder = SchemaEvolution.allowed(ex, nw, "reorder")
      val evolve = SchemaEvolution.allowed(ex, nw, "evolve")
      val permissive = SchemaEvolution.allowed(ex, nw, "permissive")
      (!strict || reorder) && (!strict || evolve) && permissive
    })
  }

  test("cleanName is idempotent and produces only safe characters") {
    checkProp(Prop.forAll { (s: String) =>
      val cleaned = graft.mapping.CustomMapping.cleanName(s)
      graft.mapping.CustomMapping.cleanName(cleaned) == cleaned &&
        !cleaned.exists(c => ",;{}()\n\r\t= .:".contains(c)) &&
        cleaned.length <= 255
    })
  }

  test("DQDL parser round-trips generated comparison rules") {
    val genCol = Gen.identifier.suchThat(_.nonEmpty).map(_.take(12))
    val genOp = Gen.oneOf(">", ">=", "<", "<=", "=", "!=")
    val genNum = Gen.chooseNum(-1e6, 1e6)
    checkProp(Prop.forAll(genCol, genOp, genNum) { (c, op, n) =>
      graft.dq.Dqdl.parse(s"ColumnValues '$c' $op $n") match {
        case graft.dq.Dqdl.Leaf(graft.dq.Dqdl.ColumnValues(col, graft.dq.Dqdl.Cmp(o, Left(v)))) =>
          col == c && o == op && math.abs(v - n) < 1e-6
        case _ => false
      }
    })
  }
}

/** Spark-dependent properties (shared session; fewer cases — each case is a
  * Spark job). */
class SparkPropertySpec extends SparkSpec with PropHelper {
  import spark.implicits._

  test("impliedDecimal round-trips cents for arbitrary amounts") {
    checkProp(Prop.forAll(Gen.chooseNum(-999999999L, 999999999L)) { cents =>
      math.abs(cents) < 10 || {
        val df = Seq(cents.toString).toDF("v")
        val got = df.select(C.impliedDecimal($"v", 2).cast("double")).as[Double].head()
        math.abs(got - cents / 100.0) < 1e-9
      }
    }, tests = 15)
  }

  test("fingerprint invariant under whitespace runs and case") {
    val gen = Gen.listOfN(5, Gen.alphaNumStr.suchThat(_.nonEmpty)).map(_.mkString(" "))
    checkProp(Prop.forAll(gen) { text =>
      val messy = "  " + text.toUpperCase.replace(" ", "\t  ") + " \n"
      val df = Seq((text, messy)).toDF("a", "b")
      val r = df.select(T.fingerprint($"a").as("fa"), T.fingerprint($"b").as("fb")).head()
      r.getString(0) == r.getString(1)
    }, tests = 15)
  }

  test("dropRepeatedLines: idempotent, preserves line set and first-occurrence order") {
    val genDoc = Gen.listOfN(8, Gen.oneOf("a", "bb", "c line", "", "dd")).map(_.mkString("\n"))
    checkProp(Prop.forAll(genDoc) { text =>
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val once = graft.operators.Repetition.dropRepeatedLines(df, "doc_id", "text")
        .select($"doc_id", $"cleaned".as("text"))
      val cleaned1 = once.select("text").as[String].head()
      val cleaned2 = graft.operators.Repetition.dropRepeatedLines(once, "doc_id", "text")
        .select("cleaned").as[String].head()
      val expected = {
        val seen = scala.collection.mutable.LinkedHashSet.empty[String]
        text.split("\n", -1).foreach(seen += _)
        seen.mkString("\n")
      }
      cleaned1 == expected && cleaned2 == cleaned1
    }, tests = 10)
  }

  test("gramHashPairs: positional count, h1 stream matches hashedShingles' distinct set") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.expressions.Kernels
    val genToks = Gen.chooseNum(0, 12).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("aa", "bb", "cc", "dd", "ee")))
    checkProp(Prop.forAll(genToks, Gen.chooseNum(1, 4)) { (toks, n) =>
      val text = UTF8String.fromString(toks.mkString(" "))
      val pairs = Kernels.gramHashPairs(text, n)
      val expectedCount = math.max(0, toks.length - n + 1)
      val h1s = (0 until pairs.numElements())
        .map(i => pairs.getStruct(i, 2).getLong(0)).toSet
      val shingleSet = {
        val a = Kernels.hashedShingles(text, n)
        (0 until a.numElements()).map(a.getLong).toSet
      }
      pairs.numElements() == expectedCount && h1s == shingleSet
    }, tests = 60)
  }

  test("scrubSpans: counts consistent, empty starts = identity, superset of starts removes more") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.expressions.Kernels
    val genToks = Gen.chooseNum(1, 12).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf("x", "yy", "zzz")))
    val genN = Gen.chooseNum(1, 4)
    checkProp(Prop.forAll(genToks, genN, Gen.chooseNum(0, 11)) { (toks, n, s0) =>
      val text = UTF8String.fromString(toks.mkString(" "))
      def run(starts: Seq[Int]) = {
        val r = Kernels.scrubSpans(text, new GenericArrayData(starts.toArray), n)
        (r.getLong(0), r.getLong(1), r.getString(2))
      }
      val (nt0, nr0, sc0) = run(Seq.empty)
      val idOk = nt0 == toks.length && nr0 == 0 && sc0 == toks.mkString(" ")
      val s = math.min(s0, toks.length - 1)
      val (nt1, nr1, sc1) = run(Seq(s))
      val oneOk = nt1 == toks.length &&
        nr1 == math.min(n, toks.length - s) && // span clipped at doc end
        nr1 == nt1 - (if (sc1.isEmpty) 0 else sc1.split(" ").length)
      val (_, nr2, _) = run((Seq(s) ++ Seq(math.max(0, s - 2))).distinct.sorted)
      idOk && oneOk && nr2 >= nr1
    }, tests = 80)
  }

  test("bloom: no false negatives for any inserted value, any geometry") {
    import graft.functions.expressions.SketchAggregates
    val genVals = Gen.chooseNum(1, 40).flatMap(k =>
      Gen.listOfN(k, Gen.alphaNumStr.suchThat(_.nonEmpty)))
    val genWords = Gen.chooseNum(1, 64) // m = words*64 bits
    checkProp(Prop.forAll(genVals, genWords, Gen.chooseNum(1, 8)) { (vals, w, k) =>
      val words = new Array[Long](w)
      val m = w * 64
      vals.foreach(v => SketchAggregates.bloomSetBits(words, m, k, v))
      vals.forall(v => SketchAggregates.bloomTest(words, m, k, v))
    }, tests = 60)
  }

  test("maskCardNumbers: agrees with an independent reference on arbitrary digit/sep soup") {
    import graft.functions.expressions.Kernels
    import org.apache.spark.unsafe.types.UTF8String
    // independent reference: regex candidates + straightforward Luhn
    def luhnRef(ds: String): Boolean = {
      var sum = 0
      ds.reverse.zipWithIndex.foreach { case (c, i) =>
        var v = c - '0'
        if (i % 2 == 1) { v *= 2; if (v > 9) v -= 9 }
        sum += v
      }
      sum % 10 == 0
    }
    def maskRef(s: String): String = {
      val m = java.util.regex.Pattern.compile("[0-9]([ -]?[0-9])*").matcher(s)
      val sb = new StringBuilder
      var last = 0
      while (m.find()) {
        sb.append(s.substring(last, m.start()))
        val cand = m.group()
        val ds = cand.filter(_.isDigit)
        if (ds.length >= 13 && ds.length <= 19 && luhnRef(ds))
          sb.append("[CARD-").append(ds.takeRight(4)).append(']')
        else sb.append(cand)
        last = m.end()
      }
      sb.append(s.substring(last)).toString
    }
    val genSoup = Gen.listOf(Gen.frequency(
      6 -> Gen.numChar.map(_.toString), 2 -> Gen.const(" "), 1 -> Gen.const("-"),
      2 -> Gen.alphaChar.map(_.toString))).map(_.mkString)
    checkProp(Prop.forAllNoShrink(genSoup) { s =>
      val got = Kernels.maskCardNumbers(UTF8String.fromString(s)).toString
      val want = maskRef(s)
      if (got != want) info(s"mask mismatch: in=<$s> got=<$got> want=<$want>")
      got == want
    }, tests = 300)
  }

  test("matVec: agrees with a naive product on arbitrary matrices/vectors") {
    import graft.functions.expressions.Kernels
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val genDim = Gen.chooseNum(1, 16)
    checkProp(Prop.forAll(genDim, genDim, Gen.long) { (k, d, seed) =>
      val rnd = new scala.util.Random(seed)
      val m = Array.fill(k, d)(rnd.nextDouble() - 0.5)
      val v = Array.fill(d)(rnd.nextDouble() - 0.5)
      val got = Kernels.matVec(
        new GenericArrayData(v.map(x => x: Any)), m, isFloat = false)
      (0 until k).forall { i =>
        val want = (0 until d).foldLeft(0.0)((a, j) => a + m(i)(j) * v(j))
        got.getDouble(i) == want
      }
    }, tests = 100)
  }

  test("sdcSum: agrees with a naive table lookup sum for arbitrary codes") {
    import graft.functions.expressions.Kernels
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    checkProp(Prop.forAll(Gen.chooseNum(1, 8), Gen.chooseNum(2, 6), Gen.long) {
      (mm, kk, seed) =>
        val rnd = new scala.util.Random(seed)
        val flat = Array.fill(mm * kk * kk)(rnd.nextDouble())
        val a = Array.fill(mm)(rnd.nextInt(kk))
        val b = Array.fill(mm)(rnd.nextInt(kk))
        val want = (0 until mm).foldLeft(0.0)((s, j) =>
          s + flat(j * kk * kk + a(j) * kk + b(j)))
        Kernels.sdcSum(new GenericArrayData(a.map(x => x: Any)),
          new GenericArrayData(b.map(x => x: Any)), flat, kk) == want
    }, tests = 100)
  }
}
