package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, and document
  * fingerprinting. All pure Column expressions (whole-stage codegen;
  * no UDFs), designed so an independent engine can reproduce them
  * bit-for-bit (the DuckDB oracle does).
  */
object TextFunctions {

  /** Whitespace tokenizer. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Mean token length for single-space-separated text:
    * (chars − separators) / tokens. Exact integer inputs → identical
    * double division in any engine.
    */
  def avgWordLen(text: Column): Column = {
    val n = tokenCount(text)
    (length(text) - (n - 1)).cast("double") / n.cast("double")
  }

  /** Count of tokens found in `stops`. */
  def stopwordCount(text: Column, stops: Seq[String]): Column =
    size(filter(tokens(text), w => w.isInCollection(stops)))

  def stopwordRatio(text: Column, stops: Seq[String]): Column =
    stopwordCount(text, stops).cast("double") / tokenCount(text).cast("double")

  /** Type-token ratio — vocabulary diversity quality signal. */
  def typeTokenRatio(text: Column): Column =
    distinctTokenCount(text).cast("double") / tokenCount(text).cast("double")

  /** Content fingerprint over the *bag of distinct words*: normalizes
    * word order and multiplicity, so reordered near-duplicates collapse
    * to one key (the exact-dedup group key).
    */
  def wordSetFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Raw-content fingerprint (byte-identical duplicates). */
  def contentFingerprint(text: Column): Column = md5(text)

  /** Word n-gram shingles as strings ("w1 w2 w3"), the MinHash/Jaccard
    * input unit. Produces size-n windows only (docs shorter than n
    * yield an empty array).
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val starts = sequence(lit(0), size(toks) - n)
    when(size(toks) >= n,
      transform(starts, i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }
}
