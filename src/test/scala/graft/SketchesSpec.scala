package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Sketch-family semantics, pinned against independent SCALAR replays
  * of the same md5 math (MessageDigest + BigInt, no Spark expressions)
  * — the cross-engine determinism claim is that three implementations
  * (Spark plan, DuckDB oracle, this replay) agree bit-for-bit.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // ---- scalar replay helpers (independent of the Column code paths) ----

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hex32(m: String, pos0: Int): Long =
    java.lang.Long.parseLong(m.substring(pos0, pos0 + 8), 16)

  private def cmsBucketScalar(d: Int, item: String): Long =
    hex32(md5Hex(s"$d:$item"), 0) % Sketches.CMS_W

  /** Deterministic pseudo-corpus: word-ish items with a skewed
    * repetition profile (item i appears 1 + (i % 7) times).
    */
  private def corpus(n: Int, tag: String): Seq[String] =
    (0 until n).flatMap(i => Seq.fill(1 + i % 7)(s"$tag-item-${i % (n / 2 max 1)}"))

  private def countsDf(items: Seq[String]) =
    items.toDF("item").groupBy("item").agg(count(lit(1)).as("cnt"))

  // ---------------------------- CMS ----------------------------

  test("cms sketch equals the scalar-replay counter table") {
    val items = corpus(200, "a")
    val sk = Sketches.cmsSketch(countsDf(items), col("item"), col("cnt"))
      .as[(Int, Long, Long)].collect().map { case (r, b, c) => ((r.toLong, b), c) }.toMap
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val replay = exact.toSeq
      .flatMap { case (it, c) => (0 until Sketches.CMS_D).map(d => ((d.toLong, cmsBucketScalar(d, it)), c)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(sk == replay)
  }

  test("cms estimates never undercount, and equal exact counts absent collisions") {
    val items = corpus(300, "b")
    val cdf = countsDf(items)
    val sk = Sketches.cmsSketch(cdf, col("item"), col("cnt"))
    val est = Sketches.cmsEstimate(cdf.select("item"), col("item"), sk)
      .as[(String, Long)].collect().toMap
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (it, c) => assert(est(it) >= c, s"undercount at $it") }
    // collision-free items (all D buckets unshared) must estimate exactly
    val buckets = exact.keys.toSeq
      .flatMap(it => (0 until Sketches.CMS_D).map(d => ((d, cmsBucketScalar(d, it)), it)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val lonely = exact.keys.filter(it =>
      (0 until Sketches.CMS_D).exists(d => buckets((d, cmsBucketScalar(d, it))) == 1))
    assert(lonely.nonEmpty, "fixture too collided to test exactness")
    lonely.foreach(it => assert(est(it) == exact(it), s"lonely item $it must be exact"))
  }

  test("cms sketches merge by (row, bucket) counter sum") {
    val a = corpus(120, "m1")
    val b = corpus(120, "m2")
    def skMap(items: Seq[String]) =
      Sketches.cmsSketch(countsDf(items), col("item"), col("cnt"))
        .as[(Int, Long, Long)].collect().map { case (r, bk, c) => ((r, bk), c) }.toMap
    val merged = (skMap(a).toSeq ++ skMap(b).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(skMap(a ++ b) == merged)
  }

  test("cms join estimate equals the scalar inner product and never undercounts") {
    val a = corpus(150, "ja")
    val b = corpus(150, "ja").map(s => if (s.hashCode % 3 == 0) s else s + "-b")
    val skA = Sketches.cmsSketch(countsDf(a), col("item"), col("cnt"))
    val skB = Sketches.cmsSketch(countsDf(b), col("item"), col("cnt"))
    val est = Sketches.cmsJoinEstimate(skA, skB)
      .select(col("est_join").cast("long")).as[Long].head()
    def cm(items: Seq[String]) = {
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
      (0 until Sketches.CMS_D).map(d => exact.toSeq
        .groupBy { case (it, _) => cmsBucketScalar(d, it) }
        .view.mapValues(_.map(_._2).sum).toMap)
    }
    val (ta, tb) = (cm(a), cm(b))
    val replay = (0 until Sketches.CMS_D).map(d =>
      ta(d).map { case (bk, c) => c * tb(d).getOrElse(bk, 0L) }.sum).min
    assert(est == replay)
    val exactJoin = {
      val ea = a.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val eb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
      ea.map { case (it, c) => c * eb.getOrElse(it, 0L) }.sum
    }
    assert(exactJoin > 0, "fixture halves must overlap")
    assert(est >= exactJoin, "inner-product estimate must not undercount")
  }

  // ---------------------------- KMV ----------------------------

  private def kmvScalar(items: Seq[String]): Seq[Long] =
    items.distinct
      .map { it =>
        val m = md5Hex(it)
        ((hex32(m, 0) & ((1L << 31) - 1)) << 32) | hex32(m, 8)
      }.sorted.take(Sketches.KMV_K)

  test("kmv state merges as k-min of the union of states") {
    val a = (0 until 2000).map(i => s"kmv-a-$i")
    val b = (0 until 2000).map(i => s"kmv-${if (i % 2 == 0) "a" else "b"}-$i")
    val merged = (kmvScalar(a) ++ kmvScalar(b)).distinct.sorted.take(Sketches.KMV_K)
    assert(kmvScalar(a ++ b) == merged,
      "k smallest of a union = k smallest of the two k-min states")
  }

  test("kmv estimate lands near the exact distinct count") {
    val n = 20000
    val hs = kmvScalar((0 until n).map(i => s"kmv-est-$i"))
    assert(hs.length == Sketches.KMV_K)
    val theta = hs.last.toDouble / math.pow(2.0, 63)
    val est = (Sketches.KMV_K - 1) / theta
    assert(math.abs(est - n) / n < 0.15,
      s"KMV estimate $est vs exact $n outside 15% (≈2.4σ at k=${Sketches.KMV_K})")
  }

  test("kmv union-sketch intersection vote estimates a planted 50% overlap") {
    val n = 20000
    val a = (0 until n).map(i => s"ov-a-$i")
    val b = (0 until n).map(i => if (i % 2 == 0) s"ov-a-$i" else s"ov-b-$i")
    val (ka, kb) = (kmvScalar(a), kmvScalar(b))
    val ku = (ka ++ kb).distinct.sorted.take(Sketches.KMV_K)
    val (saK, sbK) = (ka.toSet, kb.toSet)
    val nBoth = ku.count(h => saK(h) && sbK(h))
    val thetaU = ku.last.toDouble / math.pow(2.0, 63)
    val estUnion = (Sketches.KMV_K - 1) / thetaU
    val estInter = nBoth.toDouble / Sketches.KMV_K * estUnion
    val exactInter = n / 2
    assert(math.abs(estInter - exactInter) / exactInter < 0.25,
      s"KMV intersection estimate $estInter vs exact $exactInter outside 25%")
  }

  // ---------------------------- AMS ----------------------------

  test("ams sign rows match the scalar replay and square-sum to the F2 neighborhood") {
    val items = corpus(400, "ams")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val z = countsDf(items)
      .select(explode(array((0 until Sketches.AMS_D).map(d =>
        struct(lit(d).as("d"),
          (Sketches.amsSign(d, col("item")) * col("cnt")).as("t"))): _*)).as("e"))
      .groupBy(col("e.d").as("d")).agg(sum(col("e.t")).as("z"))
      .as[(Int, Long)].collect().toMap
    def signScalar(d: Int, it: String) =
      if ((Integer.parseInt(md5Hex(s"$d~$it").substring(7, 8), 16) & 1) == 1) 1L else -1L
    (0 until Sketches.AMS_D).foreach { d =>
      val want = exact.map { case (it, c) => signScalar(d, it) * c }.sum
      assert(z(d) == want, s"row $d")
    }
    val f2 = exact.values.map(c => c * c).sum
    val med = z.values.map(v => v * v).toSeq.sorted
      .slice(Sketches.AMS_D / 2 - 1, Sketches.AMS_D / 2 + 1).sum / 2
    assert(med > 0 && med < 10 * f2, s"median-of-8 estimate $med vs F2 $f2 degenerate")
  }

  // ---------------------------- Bloom ----------------------------

  test("bloom filter admits every inserted item and bounds false positives") {
    val m = Sketches.bloomMFor(500)
    val ins = (0 until 500).map(i => s"bl-in-$i").toDF("item")
    val bits = Sketches.bloomBits(ins, col("item"), m)
    val inHits = Sketches.bloomMaybe(ins, col("item"), bits, m)
      .as[(String, Long)].collect()
    assert(inHits.forall(_._2 == 1L), "a Bloom filter must have NO false negatives")
    val out = (0 until 2000).map(i => s"bl-out-$i").toDF("item")
    val fp = Sketches.bloomMaybe(out, col("item"), bits, m)
      .as[(String, Long)].collect().count(_._2 == 1L)
    assert(fp < 200, s"fp=$fp of 2000 absent probes — far above the ~2% design point")
  }

  test("bloom membership is duplicate-safe: repeated probe items still admit") {
    // an at-least-once stream probes the same item twice; the all-bits
    // test is a MIN over hit flags (idempotent) — a sum-vs-k test
    // would see 2k hits and report a false negative
    val m = Sketches.bloomMFor(10)
    val ins = (0 until 10).map(i => s"bd-$i").toDF("item")
    val bits = Sketches.bloomBits(ins, col("item"), m)
    val dupProbes = ((0 until 10) ++ (0 until 10)).map(i => s"bd-$i").toDF("item")
    val hits = Sketches.bloomMaybe(dupProbes, col("item"), bits, m)
      .as[(String, Long)].collect()
    assert(hits.length == 10, "probe output is per distinct item")
    assert(hits.forall(_._2 == 1L), s"duplicated inserts must still admit: ${hits.toSeq}")
  }

  test("bloomMCaseSql replays bloomMFor: the oracle CASE agrees on every boundary") {
    // the SQL CASE is engine-neutral — evaluate it IN SPARK for the
    // boundary insert counts and compare with the Scala rule, proving
    // the cross-engine tier replay is the same function
    val k = Sketches.BLOOM_K
    val ns = Seq(1L, 2L) ++ Sketches.BLOOM_TIERS.init.flatMap { m =>
      Seq(m.toLong / (2 * k) - 1, m.toLong / (2 * k), m.toLong / (2 * k) + 1)
    } ++ Seq(Sketches.BLOOM_TIERS.last.toLong, Long.MaxValue / 32)
    ns.foreach { n =>
      val viaSql = spark.sql(
        s"SELECT ${Sketches.bloomMCaseSql(n.toString)} AS m").as[Int].head()
      assert(viaSql == Sketches.bloomMFor(n), s"n=$n: CASE $viaSql vs Scala")
    }
  }

  test("bloomMaybe reports 0 for items with zero set bits (empty state)") {
    // the left-join-plus-indicator contract: an item whose bits are ALL
    // absent must still reach the aggregate and answer maybe = 0 (a
    // semi join would silently drop it from the output)
    val m = Sketches.bloomMFor(8)
    val empty = Seq.empty[Long].toDF("bit")
    val out = Sketches.bloomMaybe(
        (0 until 5).map(i => s"z-$i").toDF("item"), col("item"), empty, m)
      .as[(String, Long)].collect()
    assert(out.length == 5, "every probe answers, even against empty state")
    assert(out.forall(_._2 == 0L), s"empty filter admits nothing: ${out.toSeq}")
  }

  test("bloom width tiers scale with the insert count on exact boundaries") {
    val k = Sketches.BLOOM_K
    assert(Sketches.bloomMFor(1) == Sketches.BLOOM_TIERS.head)
    Sketches.BLOOM_TIERS.init.foreach { m =>
      assert(Sketches.bloomMFor(m / (2 * k)) == m, s"n at the edge stays in tier $m")
      assert(Sketches.bloomMFor(m / (2 * k) + 1) == m * 2, s"n past the edge promotes")
    }
    assert(Sketches.bloomMFor(Long.MaxValue / 16) == Sketches.BLOOM_TIERS.last)
  }

  // ---------------------------- HLL ----------------------------

  private def hllScalar(items: Seq[String]): Map[Long, Long] =
    items.map { it =>
      val m = md5Hex(it)
      val v1 = hex32(m, 0)
      val v2 = hex32(m, 8)
      val bucket = v1 >> (32 - Sketches.HLL_B)
      val w = ((v1 & ((1L << (32 - Sketches.HLL_B)) - 1)) << 32) | v2
      val rank =
        if (w == 0) Sketches.HLL_WBITS + 1
        else Sketches.HLL_WBITS - (63 - java.lang.Long.numberOfLeadingZeros(w))
      (bucket, rank.toLong)
    }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap

  test("hll registers equal the scalar replay and ignore duplication") {
    val items = (0 until 3000).map(i => s"hll-item-$i")
    val once = Sketches.hllRegisters(items.toDF("item"), col("item"))
      .as[(Long, Long, Long)].collect()
    val twice = Sketches.hllRegisters((items ++ items).toDF("item"), col("item"))
      .as[(Long, Long, Long)].collect()
    assert(once.sortBy(_._1).toSeq == twice.sortBy(_._1).toSeq,
      "max is duplicate-idempotent — HLL state must not see duplication")
    val replay = hllScalar(items)
    assert(once.map(r => (r._1, r._2)).toMap == replay)
    // numer is exactly 2^(59 - register)
    once.foreach { case (_, reg, numer) =>
      assert(numer == (1L << (Sketches.HLL_WBITS + 1 - reg)))
    }
  }

  test("hll estimate from the register table lands near the exact distinct count") {
    val n = 5000
    val items = (0 until n).flatMap(i => Seq(s"est-$i", s"est-$i")) // dups free
    val regs = Sketches.hllRegisters(items.toDF("item"), col("item"))
      .as[(Long, Long, Long)].collect()
    val m = Sketches.HLL_M
    val missing = m - regs.length
    val harmonic = missing * 1.0 +
      regs.map(_._3.toDouble / math.pow(2.0, Sketches.HLL_WBITS + 1)).sum
    val alpha = 0.709 // α_64 (Flajolet et al. 2007)
    val est = alpha * m * m / harmonic
    assert(math.abs(est - n) / n < 0.35,
      s"HLL estimate $est vs exact $n outside 35% (≈2.7σ at m=$m)")
  }

  // ---------------------------- SRP ----------------------------

  test("srp signs are ±1, deterministic, and the projection matches a scalar replay") {
    val dim = 8
    val signs = Sketches.srpSigns(dim)
    assert(signs.length == Sketches.SRP_K && signs.forall(_.length == dim))
    assert(signs.flatten.forall(s => s == 1 || s == -1))
    assert(signs == Sketches.srpSigns(dim), "constant table must be deterministic")
    // replay: md5("k:i") first-nibble low bit
    for (k <- 0 until Sketches.SRP_K; i <- 0 until dim) {
      val nib = Integer.parseInt(md5Hex(s"$k:$i").substring(0, 1), 16)
      assert(signs(k)(i) == (if ((nib & 1) == 1) 1 else -1))
    }
    val vecs = Seq((0L, (1 to dim).map(_.toFloat / 3f)), (1L, (1 to dim).map(i => -i.toFloat)))
    val got = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), Sketches.srpProject(col("embedding"), dim).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    vecs.foreach { case (id, v) =>
      val want = (0 until Sketches.SRP_K).map { k =>
        (0 until dim).foldLeft(0.0)((acc, i) => acc + signs(k)(i) * v(i).toDouble)
      }
      assert(got(id) == want, s"projection replay mismatch for vec $id")
    }
  }

  test("srp projected distances approximate true distances on a planted cluster") {
    // two tight clusters far apart: projected L2 must separate them
    val dim = 64
    val mk = (base: Double, j: Int) => (0 until dim).map(i => (base + (i + j) % 3 * 0.01).toFloat)
    val a = (0 until 5).map(j => (j.toLong, mk(0.0, j)))
    val b = (0 until 5).map(j => (j + 10L, mk(5.0, j)))
    val df = (a ++ b).toDF("vec_id", "embedding")
      .select(col("vec_id"), Sketches.srpProject(col("embedding"), dim).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    def d2(x: Seq[Double], y: Seq[Double]) =
      x.zip(y).map { case (u, v) => (u - v) * (u - v) }.sum
    val within = for (x <- a; y <- a if x._1 < y._1) yield d2(df(x._1), df(y._1))
    val across = for (x <- a; y <- b) yield d2(df(x._1), df(y._1))
    assert(within.max < across.min,
      "projected distances must separate far-apart clusters")
  }
}
