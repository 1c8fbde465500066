package graft.props

import graft.SparkSpec
import graft.functions.TextExpressions
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Differential properties for the native codegen expressions against
  * the relational/HOF algebra they replaced — randomized inputs, exact
  * equality expected (the expressions must be drop-in).
  */
object NativeExprProps extends Properties("graft.nativeExprs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val word = Gen.oneOf("table", "query", "scan", "a", "the",
    "spark", "merge", "row", "value", "batch", "κλειδί", "日本語")
  private val docGen = Gen.choose(1, 40)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  property("MinHashExpr ≡ exploded relational signature") =
    Prop.forAll(Gen.listOfN(5, docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val native = graft.dedup.Dedup.minhashSignatureNative(
          docs, $"doc_id", split($"text", " "), k = 4)
        .orderBy("__id").collect().map(_.toSeq).toSeq
      val tok = docs.select($"doc_id",
        explode(array_distinct(split($"text", " "))).as("w"))
      val rel = graft.dedup.Dedup.minhashSignature(tok, $"doc_id", $"w", k = 4)
        .orderBy("__id").collect().map(_.toSeq).toSeq
      native == rel
    }

  property("SimHash16Expr ≡ exploded relational signature") =
    Prop.forAll(Gen.listOfN(4, docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val native = docs.select($"doc_id",
          TextExpressions.simhash16Col(split($"text", " ")).as("simhash"))
        .orderBy("doc_id").as[(Long, String)].collect().toSeq
      val tok = docs.select($"doc_id", explode(split($"text", " ")).as("w"))
      val rel = graft.dedup.Dedup.simhash16(tok, $"doc_id", $"w")
        .select($"__id".as("doc_id"), $"simhash")
        .orderBy("doc_id").as[(Long, String)].collect().toSeq
      native == rel
    }

  property("RepStatsExpr ≡ HOF shingle algebra") =
    Prop.forAll(Gen.listOfN(4, docGen)) { texts =>
      val docs = texts.map(Tuple1(_)).toDF("text")
      val sh3 = graft.text.TextFunctions.wordShingles($"text", 3)
      val toks = graft.text.TextFunctions.tokens($"text")
      docs.select(
          TextExpressions.repStatsCol($"text").as("r"),
          size(toks).cast("long").as("et"),
          size(array_distinct(toks)).cast("long").as("edt"),
          size(sh3).cast("long").as("eg"),
          size(array_distinct(sh3)).cast("long").as("edg"))
        .select($"r.n_tokens", $"r.n_distinct_tokens", $"r.n_grams",
          $"r.n_distinct_grams", $"et", $"edt", $"eg", $"edg")
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect()
        .forall { case (t, dt, g, dg, et, edt, eg, edg) =>
          (t, dt, g, dg) == ((et, edt, eg, edg))
        }
    }
}
