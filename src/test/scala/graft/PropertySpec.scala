package graft

import graft.functions._
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based pinning of the pure-JVM kernels: the folding/tokenizing
  * string functions, the query parser's totality, and the native
  * expressions' parity with naive Scala reference implementations over
  * arbitrary inputs (the example-based specs cover the hand-checked cases;
  * these cover the input space).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  private val anyString: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\n', '\t', '*', '\''),
      Gen.oneOf('é', 'ü', 'ß', 'ç', 'Å', 'م', 'ก', '中', '日', '́', '่')
    )).map(_.mkString),
    Gen.listOf(Gen.choose(Char.MinValue, '퟿')).map(_.mkString))

  private val tokenArray: Gen[Seq[String]] =
    Gen.listOfN(30, Gen.oneOf(Gen.alphaNumStr.map(_.take(6)), Gen.const("dup")))
      .flatMap(l => Gen.choose(0, l.size).map(l.take))

  private def arr(xs: Seq[String]): GenericArrayData =
    new GenericArrayData(xs.map(s => if (s == null) null else UTF8String.fromString(s)).toArray[Any])

  test("Bpe: encoding reconstructs, training is deterministic, merges only compress") {
    import graft.ext.Bpe
    val word: Gen[String] = Gen.choose(0, 12)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
    val corpus: Gen[Seq[(String, Long)]] = Gen.choose(1, 8)
      .flatMap(n => Gen.listOfN(n, Gen.zip(word.suchThat(_.nonEmpty),
        Gen.choose(1L, 20L))))
    check("concat(encodeWord) == word under any trained model",
      Prop.forAll(corpus, word) { (c, w) =>
        Bpe.trainFromCounts(c, numMerges = 10).encodeWord(w).mkString == w
      })
    check("training is deterministic", Prop.forAll(corpus) { c =>
      Bpe.trainFromCounts(c, 10).merges == Bpe.trainFromCounts(c, 10).merges
    })
    // a model extending another's merge list never produces MORE units:
    // rank-greedy application behaves identically until the shorter
    // model's pairs are exhausted, then extra merges can only combine
    check("more merges never increase the unit count",
      Prop.forAll(corpus, word) { (c, w) =>
        val a = Bpe.trainFromCounts(c, 5).encodeWord(w).length
        val b = Bpe.trainFromCounts(c, 10).encodeWord(w).length
        b <= a
      })
    check("unit count bounded by [1, chars] for non-empty words",
      Prop.forAll(corpus, word.suchThat(_.nonEmpty)) { (c, w) =>
        val n = Bpe.trainFromCounts(c, 10).encodeWord(w).length
        n >= 1 && n <= w.length
      })
  }

  test("StringFold.fold is idempotent and identity on ASCII") {
    check("idempotent", Prop.forAll(anyString) { s =>
      val once = StringFold.fold(s)
      StringFold.fold(once) == once
    })
    check("ascii identity", Prop.forAll(Gen.asciiPrintableStr) { s =>
      StringFold.fold(s) == s
    })
  }

  test("QueryParser.parse is total and never yields empty terms") {
    import graft.model.BoolQuery, BoolQuery._
    def terms(q: BoolQuery): Seq[String] = q match {
      case Term(t) => Seq(t)
      case Prefix(p) => Seq(p)
      case Wildcard(w) => Seq(w)
      case Phrase(ts) => ts
      case Near(ts, _) => ts
      case And(l, r) => terms(l) ++ terms(r)
      case Or(l, r) => terms(l) ++ terms(r)
      case Diff(l, r) => terms(l) ++ terms(r)
    }
    check("total", Prop.forAll(anyString) { s =>
      val ast = graft.parse.QueryParser.parse(s) // must not throw
      ast.forall(q => terms(q).forall(_.nonEmpty))
    })
    // the extended grammar is total over the same arbitrary inputs —
    // unmatched quotes/parens/NULs/operator runs all degrade, never throw —
    // and its leaves never carry empty terms either
    check("extended total", Prop.forAll(anyString) { s =>
      val ast = graft.parse.QueryParser.parseExtended(s)
      ast.forall(q => terms(q).forall(_.nonEmpty))
    })
    // queries of plain words and and/or/wildcards (no quotes, parens,
    // near(), or not — the extended-only syntax) parse IDENTICALLY through
    // both grammars: the parity-fallback precondition in extendedQueryFrame
    val plainWord = Gen.oneOf(
      // "not" (any case) IS extended-only syntax — alphaNumStr can emit it,
      // so exclude it explicitly or the property flakes on "a not b"
      Gen.alphaNumStr.map(_.take(5))
        .suchThat(w => w.nonEmpty && !w.equalsIgnoreCase("not")),
      Gen.const("and"), Gen.const("or"), Gen.const("AND"),
      Gen.const("te*m"), Gen.const("pre*"))
    val plainQuery = Gen.listOf(plainWord).map(_.mkString(" "))
    check("plain parity", Prop.forAll(plainQuery) { s =>
      graft.parse.QueryParser.parseExtended(s) == graft.parse.QueryParser.parse(s)
    })
  }

  test("MaxMultiplicity matches the naive max group size") {
    val expr = MaxMultiplicity(BoundReference(0, ArrayType(StringType), nullable = true))
    check("maxMultiplicity", Prop.forAll(tokenArray) { xs =>
      val got = expr.nullSafeEval(arr(xs)).asInstanceOf[Long]
      val want = if (xs.isEmpty) 0L
        else xs.groupBy(identity).values.map(_.size).max.toLong
      got == want
    })
  }

  test("TermCounts matches naive counts; dl = element count; keys distinct") {
    val expr = TermCounts(BoundReference(0, ArrayType(StringType), nullable = true))
    check("termCounts", Prop.forAll(tokenArray) { xs =>
      val row = expr.nullSafeEval(arr(xs))
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val m = row.getMap(0)
      val dl = row.getLong(1)
      val keys = (0 until m.numElements()).map(i =>
        m.keyArray().getUTF8String(i).toString)
      val vals = (0 until m.numElements()).map(i => m.valueArray().getLong(i))
      val naive = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      keys.distinct.size == keys.size &&
        dl == xs.size.toLong &&
        keys.zip(vals).toMap == naive &&
        vals.sum == dl
    })
  }

  test("ShingleArray(distinct=false) emits exactly max(0, m-n+1) in-order windows") {
    check("shingles", Prop.forAll(tokenArray.suchThat(_.forall(_.nonEmpty)),
        Gen.choose(1, 5)) { (xs, n) =>
      val expr = ShingleArray(BoundReference(0, ArrayType(StringType), nullable = true),
        n, distinct = false)
      val got = expr.nullSafeEval(arr(xs)).asInstanceOf[GenericArrayData]
        .array.map(_.asInstanceOf[UTF8String].toString).toSeq
      val want = if (xs.size < n) Seq.empty else xs.sliding(n).map(_.mkString(" ")).toSeq
      got == want
    })
  }

  test("SortedLongJaccard matches naive set Jaccard on sorted distinct arrays") {
    val expr = SortedLongJaccard(
      BoundReference(0, ArrayType(LongType), nullable = true),
      BoundReference(1, ArrayType(LongType), nullable = true))
    val longSet: Gen[Seq[Long]] =
      Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted)
    check("jaccard", Prop.forAll(longSet, longSet) { (a, b) =>
      val got = expr.nullSafeEval(
        new GenericArrayData(a.toArray[Any]), new GenericArrayData(b.toArray[Any]))
        .asInstanceOf[Double]
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      val want = if (union == 0) 0.0 else inter.toDouble / union
      math.abs(got - want) < 1e-12
    })
  }

  test("HashPrefix emits min(m, floor((1-t)m+eps)+1) elements, all from the input") {
    check("hashPrefix", Prop.forAll(
        tokenArray.map(_.distinct), Gen.choose(0.5, 0.95)) { (xs, t) =>
      val expr = HashPrefix(BoundReference(0, ArrayType(StringType), nullable = true), t)
      val got = expr.nullSafeEval(arr(xs)).asInstanceOf[GenericArrayData]
        .array.map(_.asInstanceOf[UTF8String].toString).toSeq
      val m = xs.size
      val wantLen = if (m == 0) 0 else math.min(m, (math.floor((1.0 - t) * m + 1e-9) + 1).toInt)
      got.size == wantLen && got.forall(xs.contains)
    })
  }

  test("TokenEntropy: bounds, permutation invariance, uniform/degenerate closed forms") {
    val ent = TokenEntropy(BoundReference(0, ArrayType(StringType), nullable = true))
    def h(xs: Seq[String]): Double = ent.nullSafeEval(arr(xs)).asInstanceOf[Double]
    check("0 <= H <= ln(types); permutation-invariant",
      Prop.forAll(tokenArray) { xs =>
        val v = h(xs)
        val types = xs.distinct.size
        val upper = if (types <= 1) 1e-12 else math.log(types) + 1e-12
        v >= -1e-12 && v <= upper && math.abs(h(scala.util.Random.shuffle(xs)) - v) < 1e-12
      })
    check("uniform = ln n, degenerate = 0",
      Prop.forAll(Gen.choose(1, 20)) { n =>
        val uniform = (1 to n).map(i => s"t$i")
        val degenerate = Seq.fill(n)("x")
        math.abs(h(uniform) - math.log(n)) < 1e-12 && math.abs(h(degenerate)) < 1e-12
      })
  }

  test("BloomMightContainLong: NO false negatives over arbitrary key sets") {
    import org.apache.spark.util.sketch.BloomFilter
    check("no false negatives", Prop.forAll(
        Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)), Gen.choose(1L, 64L)) { (keys, cap) =>
      val bf = BloomFilter.create(math.max(cap, 1L), 0.03)
      keys.foreach(bf.putLong)
      val expr = BloomMightContainLong(
        BoundReference(0, LongType, nullable = true), bf)
      keys.forall(k => expr.nullSafeEval(k).asInstanceOf[Boolean])
    })
  }

  test("fold + tokenize agree between column spec and driver-side fold on query terms") {
    // the index side folds THEN splits; the query side folds each term —
    // for single tokens (no separators) the two must agree
    check("fold parity", Prop.forAll(Gen.listOfN(8,
        Gen.oneOf('a', 'é', 'ü', 'ß', 'n', '́')).map(_.mkString)) { w =>
      val folded = StringFold.fold(w)
      StringFold.fold(folded) == folded // and stays stable
    })
  }
}
