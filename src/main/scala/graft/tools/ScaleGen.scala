package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture multiplier for the 10× scale probe
  * (SCALE_PROBE.md): reads the driver's sf0.1 parquet fixture and writes
  * an N×-scaled twin, so the heavy-tail queries can be timed at ~sf1
  * without a driver-side generator.
  *
  * `sbt "runMain graft.tools.ScaleGen <baseDir> <outDir> [mult]"`
  *
  * Construction (all seeds fixed — two runs produce identical fixtures):
  *  - every fact table becomes `mult` copies with key columns offset by
  *    copy·span (span = max(key)+1 from the base), so referential
  *    integrity and per-key group SIZES are preserved while key
  *    CARDINALITY scales with the data — the realistic axis (more users,
  *    more docs, more orders), and the one that stresses shuffles.
  *  - `documents.text` in copies ≥ 1 gets a per-copy deterministic word
  *    permutation (sort words by xxhash64(word, position, copy)). This
  *    preserves unigram statistics — token counts, stopword ratios,
  *    char-trigram language signals, word frequencies — so quality and
  *    language gates keep their selectivity, while word n-grams (the
  *    shingle/fingerprint space) diverge across copies, so near-dup
  *    structure REPLICATES (~10× pairs at 10× docs) instead of
  *    cross-matching (which would square pair volume and measure the
  *    fixture, not the engine).
  *  - `embeddings.embedding` in copies ≥ 1 gets a per-copy dimension
  *    permutation: norms and the intra-copy similarity structure are
  *    exactly preserved (cos(Pa, Pb) = cos(a, b)), cross-copy cosines
  *    decorrelate to the base distribution's background level.
  *  - `events` copies shift `ts` by copy·(range+1h) — 10× data = 10× the
  *    time RANGE (more days of logs), so bucket/session state grows in
  *    bucket COUNT, not per-bucket depth — and offset `user_id`/`event_id`.
  *  - dimension tables (`nation`, `region`) copy through unchanged.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleGen <baseDir> <outDir> [mult]")
    val (base, out) = (args(0), args(1))
    val mult = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    // union of `mult` per-copy transforms; each copy is the base with
    // copy-dependent columns rewritten by `f`
    def copies(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until mult).map(i => f(df, i)).reduce(_ unionAll _)

    def offset(c: String, s: Long, i: Int): Column =
      (col(c) + lit(s * i)).as(c)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    // ---- documents -------------------------------------------------
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val docSpan = span(docs, "doc_id")
    write("documents", copies(docs, (d, i) =>
      if (i == 0) d
      else d.select(
        offset("doc_id", docSpan, i),
        // per-copy word permutation; single-space join matches the
        // fixture's own tokenization (verify SKILL.md: no punctuation)
        expr(s"""array_join(transform(array_sort(transform(split(text, ' '),
                 (w, j) -> struct(xxhash64(w, j, $i) AS h, w AS w))),
                 s -> s.w), ' ')""").as("text"),
        col("lang"), col("source"),
        length(expr(s"""array_join(transform(array_sort(transform(split(text, ' '),
                 (w, j) -> struct(xxhash64(w, j, $i) AS h, w AS w))),
                 s -> s.w), ' ')""")).cast("bigint").as("n_chars"))))

    // ---- embeddings ------------------------------------------------
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val vecSpan = span(emb, "vec_id")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    write("embeddings", copies(emb, (d, i) =>
      if (i == 0) d
      else {
        val perm = new scala.util.Random(0xC0FFEE + i).shuffle((0 until dim).toList)
        d.select(
          offset("vec_id", vecSpan, i),
          array(perm.map(p => col("embedding").getItem(p)): _*).as("embedding"),
          col("label"))
      }))

    // ---- events ----------------------------------------------------
    val ev = graft.Tables.events(spark, base)
    val evSpan = span(ev, "event_id")
    val userSpan = span(ev, "user_id")
    val Array(tsLo, tsHi) = ev
      .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    val tsStride = tsHi - tsLo + 3600L * 1000000L
    write("events", copies(ev, (d, i) =>
      if (i == 0) d
      else d.select(
        offset("event_id", evSpan, i),
        timestamp_micros(unix_micros(col("ts")) + lit(tsStride * i)).as("ts"),
        offset("user_id", userSpan, i),
        col("event_type"), col("value"), col("props"))))

    // ---- relational ------------------------------------------------
    val li = spark.read.parquet(s"$base/lineitem.parquet")
    val ord = spark.read.parquet(s"$base/orders.parquet")
    val cust = spark.read.parquet(s"$base/customer.parquet")
    val supp = spark.read.parquet(s"$base/supplier.parquet")
    val prt = spark.read.parquet(s"$base/part.parquet")
    val (ordSpan, custSpan, suppSpan, partSpan) =
      (span(ord, "o_orderkey"), span(cust, "c_custkey"),
       span(supp, "s_suppkey"), span(prt, "p_partkey"))
    write("lineitem", copies(li, (d, i) =>
      if (i == 0) d
      else d.select(
        offset("l_orderkey", ordSpan, i), offset("l_partkey", partSpan, i),
        offset("l_suppkey", suppSpan, i), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))))
    write("orders", copies(ord, (d, i) =>
      if (i == 0) d
      else d.select(
        offset("o_orderkey", ordSpan, i), offset("o_custkey", custSpan, i),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))))
    write("customer", copies(cust, (d, i) =>
      if (i == 0) d
      else d.select(
        offset("c_custkey", custSpan, i), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))))
    write("supplier", copies(supp, (d, i) =>
      if (i == 0) d
      else d.select(
        offset("s_suppkey", suppSpan, i), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))))
    write("part", copies(prt, (d, i) =>
      if (i == 0) d
      else d.select(
        offset("p_partkey", partSpan, i), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice"))))

    // ---- dimensions (unscaled) -------------------------------------
    Seq("nation", "region").foreach { t =>
      write(t, spark.read.parquet(s"$base/$t.parquet"))
    }
    spark.stop()
  }
}
