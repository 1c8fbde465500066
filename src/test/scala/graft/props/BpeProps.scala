package graft.props

import graft.SparkSpec
import graft.text.Bpe
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Randomized differential properties for the distributed BPE trainer:
  * over arbitrary small corpora, the engine's merge sequence must equal
  * a textbook single-machine implementation's, and encoding must be
  * lossless. Few cases (each spins Spark jobs), broad input space: the
  * 3-letter alphabet forces heavy pair collisions and tie-breaks.
  */
object BpeProps extends Properties("graft.bpe") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private val wordGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')))
      .map(_.mkString)

  private val corpusGen: Gen[List[String]] =
    Gen.choose(1, 5).flatMap(nd => Gen.listOfN(nd,
      Gen.choose(1, 8).flatMap(nw => Gen.listOfN(nw, wordGen))
        .map(_.mkString(" "))))

  /** Textbook reference (independent of the engine and of BpeSpec's —
    * a third shape: sorted-pair scan per iteration).
    */
  private def refTrain(freq: Map[String, Long], n: Int): List[(String, String, Long)] = {
    var words = freq.toList.map { case (w, c) =>
      (w.map(_.toString).toList :+ Bpe.Eow, c)
    }
    var out = List.empty[(String, String, Long)]
    var k = 0
    while (k < n) {
      val pairs = words.flatMap { case (s, c) =>
        s.zip(s.tail).map(p => (p, c))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toList
      if (pairs.isEmpty) return out.reverse
      val ((l, r), c) = pairs.sortBy { case ((l, r), c) => (-c, l, r) }.head
      out = (l, r, c) :: out
      words = words.map { case (s, cc) =>
        val b = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { b += l + r; i += 2 }
          else { b += s(i); i += 1 }
        }
        (b.toList, cc)
      }
      k += 1
    }
    out.reverse
  }

  property("train ≡ single-machine reference on random corpora") =
    Prop.forAll(corpusGen) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val freq = docs.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      val got = Bpe.train(Bpe.wordCounts(df, org.apache.spark.sql.functions.col("text")), 6)
        .map(m => (m.left, m.right, m.cnt)).toList
      got == refTrain(freq, 6)
    }

  property("encode is lossless for any word under any learned merges") =
    Prop.forAll(corpusGen, wordGen) { (docs, w) =>
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val merges = Bpe.train(
        Bpe.wordCounts(df, org.apache.spark.sql.functions.col("text")), 5)
      val enc = Bpe.encode(Seq((0L, w)).toDF("doc_id", "text"), "text", merges)
        .collect()(0)
      enc.getSeq[String](2).mkString == w + Bpe.Eow
    }
}
