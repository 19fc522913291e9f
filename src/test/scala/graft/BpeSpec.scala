package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE merge training: differential against an independent sequential
  * reference implementation, merge-step reference semantics, and the
  * determinism the rows-only x_bpe_train entry leans on.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential reference BPE (straight port of the textbook
    * algorithm): count adjacent positions (overlapping included),
    * fuse the most frequent pair with lexicographic tie-break.
    */
  private def refBpe(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var vocab: Seq[(IndexedSeq[String], Long)] =
      words.toSeq.map { case (w, f) => (w.map(_.toString).toIndexedSeq, f) }
    val out = Seq.newBuilder[(String, String, Long)]
    var continue = true
    var round = 0
    while (round < n && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        vocab = vocab.map { case (s, f) => (Bpe.applyMerge(s, l, r), f) }
        round += 1
      }
    }
    out.result()
  }

  test("applyMerge fuses left-to-right without overlap") {
    assert(Bpe.applyMerge(IndexedSeq("a", "a", "a"), "a", "a") ==
      IndexedSeq("aa", "a"), "aaa under (a,a) is [aa, a]")
    assert(Bpe.applyMerge(IndexedSeq("a", "b", "a", "b"), "a", "b") ==
      IndexedSeq("ab", "ab"))
    assert(Bpe.applyMerge(IndexedSeq("x"), "a", "b") == IndexedSeq("x"))
    assert(Bpe.applyMerge(IndexedSeq(), "a", "b") == IndexedSeq())
  }

  test("distributed training matches the sequential reference, ties and all") {
    // 'low'/'lower'/'newest'/'widest' — the Sennrich walk-through shape,
    // plus equal-frequency words to exercise the lexicographic tie-break
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "abab" -> 4L, "baba" -> 4L)
    val df = words.toSeq.toDF("word", "freq")
    val got = Bpe.train(df, 8)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
      .map { case (_, l, r, c) => (l, r, c) }
    val want = refBpe(words, 8)
    assert(got == want, s"got $got\nwant $want")
  }

  test("training stops early when no pair remains; single chars untouched") {
    val df = Seq(("a", 3L), ("b", 2L)).toDF("word", "freq")
    assert(Bpe.train(df, 5).count() == 0, "single-symbol words have no pairs")
    val df2 = Seq(("ab", 1L)).toDF("word", "freq")
    val m = Bpe.train(df2, 5).as[(Long, String, String, Long)].collect().toSeq
    assert(m == Seq((0L, "a", "b", 1L)), s"one merge then exhaustion: $m")
  }

  test("tokenize replays the merge table exactly (differential vs sequential)") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L, "abab" -> 4L, "baba" -> 4L, "x" -> 1L)
    val df = words.toSeq.toDF("word", "freq")
    val merges = refBpe(words, 6).map { case (l, r, _) => (l, r) }
    val got = Bpe.tokenize(df, merges)
      .as[(String, Seq[String], Long)].collect()
      .map { case (w, t, n) => w -> ((t, n)) }.toMap
    val want = words.map { case (w, f) =>
      var syms: IndexedSeq[String] = w.map(_.toString)
      merges.foreach { case (l, r) => syms = Bpe.applyMerge(syms, l, r) }
      w -> ((syms: Seq[String], f))
    }
    assert(got == want, s"got $got\nwant $want")
    // single-symbol word passes through untouched
    assert(got("x")._1 == Seq("x"))
  }

  test("x_bpe_apply token mass conserves the corpus: sum over tokens of " +
    "n_occurrences x token length = total corpus characters") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.PipelineQueries.xBpeApply(spark, dir)
      .select(sum(length(col("token")) * col("n_occurrences"))).as[Long].head()
    val chars = Tables.documents(spark, dir)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .select(sum(length(col("w")))).as[Long].head()
    assert(out == chars, s"token chars $out != corpus word chars $chars")
  }

  test("applyMerge property: equals the scan reference on random " +
    "sequences, preserves content, is idempotent (seeded cases)") {
    // naive reference: independent re-derivation of non-overlapping
    // left-to-right fusion
    def ref(syms: List[String], l: String, r: String): List[String] =
      syms match {
        case a :: b :: rest if a == l && b == r => (l + r) :: ref(rest, l, r)
        case a :: rest => a :: ref(rest, l, r)
        case Nil => Nil
      }
    val rnd = new scala.util.Random(13)
    val alpha = Vector("a", "b", "ab", "ba", "aa")
    (1 to 500).foreach { i =>
      val syms = IndexedSeq.fill(rnd.nextInt(10))(alpha(rnd.nextInt(alpha.size)))
      val l = alpha(rnd.nextInt(alpha.size)); val r = alpha(rnd.nextInt(alpha.size))
      val got = Bpe.applyMerge(syms, l, r)
      assert(got == ref(syms.toList, l, r), s"case $i: $syms under ($l,$r)")
      // content is preserved: concatenation is invariant under merging
      assert(got.mkString == syms.mkString, s"case $i lost content")
      // a second pass can still fuse pairs REVEALED by the first (the
      // skipped-overlap remainder: aaa -> [aa, a]; [aa, a, a] under
      // (a, a) fuses the tail) — but never endlessly: l+r is longer
      // than l, so length strictly drops until a fixpoint
      val twice = Bpe.applyMerge(got, l, r)
      assert(twice.length <= got.length)
      assert(twice.mkString == syms.mkString)
    }
  }

  test("distributed training matches the reference on a random run-heavy " +
    "corpus (runs and ties are the adversarial shapes)") {
    val rnd = new scala.util.Random(31)
    // run-heavy words (aaaa..., ababab...) force the non-overlap rule
    // every round; duplicated freqs force the lexicographic tie-break
    val words = (1 to 30).map { _ =>
      val w = rnd.nextInt(3) match {
        case 0 => ("a" * (1 + rnd.nextInt(7)))
        case 1 => ("ab" * (1 + rnd.nextInt(4)))
        case _ => List.fill(1 + rnd.nextInt(6))(
          "abc".charAt(rnd.nextInt(3)).toString).mkString
      }
      w -> (1L + rnd.nextInt(3))
    }.groupBy(_._1).map { case (w, vs) => w -> vs.map(_._2).sum }
    val got = Bpe.train(words.toSeq.toDF("word", "freq"), 12)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
      .map { case (_, l, r, c) => (l, r, c) }
    assert(got == refBpe(words, 12), s"random corpus diverged: $got")
  }

  test("x_bpe_train is deterministic across runs on the fixture") {
    val a = graft.queries.PipelineQueries.xBpeTrain(spark, "/root/testdata/sf0.001")
      .collect().toSeq
    val b = graft.queries.PipelineQueries.xBpeTrain(spark, "/root/testdata/sf0.001")
      .collect().toSeq
    assert(a == b && a.size == 10, s"10 deterministic merges, got ${a.size}")
  }
}
