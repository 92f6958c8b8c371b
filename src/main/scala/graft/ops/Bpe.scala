package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer training — the classic
  * "count adjacent symbol pairs over the corpus, merge the most frequent,
  * repeat" loop (Sennrich et al. 2016, the GPT-2 vocabulary recipe), as
  * bounded Spark aggregates.
  *
  * The state is never the corpus: BPE trains on the WORD-FREQUENCY table
  * (distinct word, count), which is vocabulary-sized — orders of
  * magnitude below the token stream a 100 TB corpus carries. One corpus
  * pass builds that table; every merge round after it touches only the
  * vocabulary:
  *
  *   - pair counting is one explode + hash aggregate over the vocab
  *     (map-side combinable; at most sum(|word|) pair rows per round),
  *   - the winning pair is a 1-row argmax pulled to the driver (ties
  *     break lexicographically — deterministic on any partitioning),
  *   - the merge itself is a per-row left-to-right fold over each word's
  *     symbol array (codegen'd HOF `aggregate`, no shuffle), with the
  *     lineage cut per round so `nMerges` rounds never stack plans.
  *
  * Symbols are Unicode codepoint strings initially (`substring` is
  * codepoint-addressed in both Spark and DuckDB, so the oracle agrees on
  * non-ASCII); merged symbols are concatenations. */
object Bpe {

  /** Per-codepoint symbol array of a (non-empty) word — shared by the
    * train side ([[vocabulary]]) and the apply side ([[applyMerges]]):
    * one definition, so the tokenizer can never silently learn merges
    * over a different word segmentation than it applies them to. */
  private def symbolsOf(word: Column): Column =
    transform(sequence(lit(1), char_length(word)), i => word.substr(i, lit(1)))

  /** Non-empty words of a text column, via the SAME tokenization
    * everything else in the engine uses ([[TextAnalysis.tokens]]). */
  private def wordsOf(textCol: String): Column =
    filter(TextAnalysis.tokens(col(textCol)), w => char_length(w) > 0)

  /** (term, n, symbols) vocabulary table from a corpus: distinct words
    * with occurrence counts and their initial per-codepoint symbol
    * arrays. The ONLY corpus-sized pass in BPE training. */
  def vocabulary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(wordsOf(textCol)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .withColumn("symbols", symbolsOf(col("term")))

  /** Weighted adjacent-pair counts over a (n, symbols) vocabulary:
    * (lhs, rhs, cnt) where cnt sums word frequencies. Bounded by the
    * vocabulary's total symbol length, not the corpus. */
  def pairCounts(vocab: DataFrame): DataFrame =
    // slice-then-index, not sequence(1, n-1): Spark's sequence DESCENDS
    // when start > stop, so a 1-symbol word would index past the array
    // (an ANSI error); slicing to the first n-1 symbols makes the empty
    // case an empty array by construction
    vocab.select(col("n"), explode(expr(
        """transform(slice(symbols, 1, greatest(size(symbols) - 1, 0)),
          |          (x, i) -> struct(x AS lhs, symbols[i + 1] AS rhs))""".stripMargin))
        .as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("n")).as("cnt"))

  /** One greedy left-to-right merge pass of (lhs, rhs) over a symbol
    * array — the fold makes overlap handling exact: in "aaa" under
    * (a, a), the first two merge into "aa" and the third CANNOT chain
    * onto the merged symbol (the accumulator's tail is now "aa", not
    * "a"), which is precisely reference BPE's non-overlapping scan. */
  def mergeOnce(symbols: Column, lhs: String, rhs: String): Column = {
    val l = lit(lhs)
    val r = lit(rhs)
    aggregate(symbols, lit(Array.empty[String]),
      (acc, s) => when(size(acc) > 0 && element_at(acc, -1) === l && s === r,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(l, r))))
        .otherwise(concat(acc, array(s))))
  }

  /** Train `nMerges` BPE merges over a corpus. Returns the ordered merge
    * list — the tokenizer artifact. Stops early when no pair reaches
    * `minCount`. Each round runs one vocabulary-bounded aggregate plus a
    * single-row argmax collect (the same driver-scalar pattern as
    * k-means' centroid step); the vocabulary is re-checkpointed per round
    * so the merge folds never accumulate as nested plans. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    var vocab = vocabulary(df, textCol).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (!done && merges.size < nMerges) {
      val top = pairCounts(vocab)
        .filter(col("cnt") >= minCount)
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      top.headOption match {
        case Some(row) =>
          val (l, r) = (row.getString(0), row.getString(1))
          merges += ((l, r))
          vocab = vocab.withColumn("symbols", mergeOnce(col("symbols"), l, r))
            .localCheckpoint(true)
        case None => done = true
      }
    }
    merges.toSeq
  }

  /** Tokenize a text column with a trained merge list: per word, apply
    * the merges in training order. The fold chain is cut every 8 merges
    * (localCheckpoint) so a production-sized merge list (10k+) never
    * builds a 10k-deep expression tree — the expression-depth failure
    * mode RobustnessSpec pinned on other operators. Returns `df` plus
    * `tokensCol` (array of BPE symbols, words flattened in order). */
  def applyMerges(df: DataFrame, textCol: String, tokensCol: String,
      merges: Seq[(String, String)], checkpointEvery: Int = 8): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    var out = df.withColumn(tokensCol, transform(wordsOf(textCol), symbolsOf(_)))
    merges.grouped(checkpointEvery).foreach { batch =>
      batch.foreach { case (l, r) =>
        out = out.withColumn(tokensCol,
          transform(col(tokensCol), w => mergeOnce(w, l, r)))
      }
      out = out.localCheckpoint(true)
    }
    out.withColumn(tokensCol, flatten(col(tokensCol)))
  }
}
