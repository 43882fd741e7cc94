package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}

class TextVectorSpec extends SparkSpecBase {
  import spark.implicits._

  test("wordShingles: n-grams in order, distinct, empty for short docs") {
    val df = Seq(Tuple1("a b c d"), Tuple1("a b"), Tuple1("a b a b a b")).toDF("text")
    val out = df.select(TF.wordShingles(col("text"), 3).as("s"))
      .collect().map(_.getSeq[String](0).toSet)
    assert(out(0) == Set("a b c", "b c d"))
    assert(out(1) == Set.empty, "doc shorter than n ⇒ no shingles")
    assert(out(2) == Set("a b a", "b a b"), "repeated shingles deduplicated")
  }

  test("jaccard: exact set arithmetic") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(TF.jaccard(col("x"), col("y"))).head().getDouble(0)
    assert(j == 0.5, "2 common / 4 union")
  }

  test("langId: argmax over stopword profiles, en wins ties, und when empty") {
    val df = Seq(
      ("the cat and the dog is here", "en"),
      ("der hund und die katze ist da", "de"),
      ("el gato y la casa de los perros", "es"),
      ("xyzzy qwerty asdf", "und")
    ).toDF("text", "expected")
    val got = df.select(TF.langId(col("text")), col("expected")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"predicted ${r.getString(0)}, expected ${r.getString(1)}"))
  }

  test("fingerprint normalizes case and whitespace") {
    val df = Seq(Tuple1("Hello  World "), Tuple1("hello world")).toDF("text")
    val fps = df.select(TF.fingerprint(col("text"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("cosineQ: 1 for identical, 0 for orthogonal, exact on quantized ints") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))
    ).toDF("a", "b")
    val out = df.select(
      VF.cosineQ(VF.quantize(col("a")), VF.quantize(col("b")))).collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).getDouble(0) == 0.0)
  }

  test("hyperplane weights are deterministic and bounded") {
    val w1 = VF.hyperplane(0, 64)
    val w2 = VF.hyperplane(0, 64)
    assert(w1.toSeq == w2.toSeq)
    assert(w1.forall(v => v >= -1000 && v <= 1000))
    assert(VF.hyperplane(1, 64).toSeq != w1.toSeq)
  }

  test("LshBandSig matches the per-plane sign definition on real embeddings") {
    // the fused codegen expression must agree bit-for-bit with the
    // definitional form: band t bit h set iff hyperplane(t*p+h) . v >= 0
    val bands = 4; val p = 8; val dims = 64
    val rows = Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), VF.quantize(col("embedding")).as("v"))
      .withColumn("sig", VF.lshBandVals(col("v"), bands, p, dims))
      .select(col("v"), col("sig"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val v = r.getSeq[Long](0)
      val sig = r.getSeq[Long](1)
      assert(sig.length == bands)
      for (t <- 0 until bands) {
        val expected = (0 until p).map { h =>
          val w = VF.hyperplane(t * p + h, dims)
          val dot = v.indices.map(i => v(i) * w(i)).sum
          if (dot >= 0) 1L << h else 0L
        }.sum
        assert(sig(t) == expected, s"band $t mismatch")
      }
    }
    // null vector -> null signature (UnaryExpression null propagation)
    val nulls = Seq(Tuple1(null.asInstanceOf[Seq[Long]])).toDF("v")
      .select(VF.lshBandVals(col("v"), bands, p, dims).as("sig")).head()
    assert(nulls.isNullAt(0))
  }

  test("s10 k-means: cells partition the corpus, inertia non-negative, reps are members") {
    val out = SparkEntry.queries("s10_kmeans")(spark, sf("sf0.001")).collect()
    val n = Tables.embeddings(spark, sf("sf0.001")).count()
    assert(out.nonEmpty && out.length <= 8, "at most KmK non-empty cells")
    assert(out.map(_.getAs[Long]("n_members")).sum == n,
      "every vector lands in exactly one cell")
    assert(out.forall(_.getAs[Long]("inertia") >= 0L))
    val ids = Tables.embeddings(spark, sf("sf0.001"))
      .select("vec_id").as[Long].collect().toSet
    assert(out.forall(r => ids.contains(r.getAs[Long]("rep_vec_id"))),
      "cluster representative must be a corpus member")
  }

  test("NearestCell == KMeans.nearest fold: c_id AND d2, ties included") {
    // seeded random quantized vectors + a codebook CONTAINING exact
    // duplicates of some vectors (d2 = 0) and two identical centroids under
    // different ids (a forced tie — the smaller c_id must win in both paths)
    val rnd = new scala.util.Random(7)
    val dims = 16
    def vec() = Seq.fill(dims)((rnd.nextInt(2001) - 1000).toLong)
    val vs = Seq.tabulate(60)(i => (i.toLong, if (i < 5) Seq.fill(dims)(0L) else vec()))
    val cents = Seq.tabulate(8)(j => (j.toLong, if (j == 7) vs(10)._2 else vec())) :+
      ((8L, Seq.fill(dims)(0L))) :+ ((9L, Seq.fill(dims)(0L))) // tie pair
    val vecs = vs.toDF("vec_id", "v")
    val cb = graft.operators.KMeans.codebook(cents.toDF("c_id", "cv"))
    val foldSide = vecs.crossJoin(broadcast(cb))
      .withColumn("xx", VF.dotLong(col("v"), col("v")))
      .withColumn("best", graft.operators.KMeans.nearest(col("v"), col("xx")))
      .select(col("vec_id"), col("best.c_id").as("c_id"), col("best.d2").as("d2"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exprSide = graft.operators.KMeans.assign(vecs, cb)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("c_id"), r.getAs[Long]("d2"))).toMap
    assert(exprSide == foldSide,
      "codegen assignment must match the Catalyst fold exactly")
    // the zero vectors must land on the tie pair's SMALLER id with d2 = 0
    assert((0L to 4L).forall(i => exprSide(i) == (8L, 0L)))
  }

  test("BpeApply: rank-ordered merges, earlier merges shadow later entries") {
    import graft.functions.BpeApply
    def enc(s: String): (Long, Long) = {
      val r = Seq(Tuple1(s)).toDF("text")
        .select(BpeApply(col("text")).as("e")).head().getSeq[Long](0)
      (r(0), r(1))
    }
    // "the theatre": rank0 'the'×2 → "◊ ◊atre"; 're' → "◊ ◊at◊"; 'at' →
    // "◊ ◊◊◊" = 5 units, 4 merges. 'th'/'er'/'re' inside "the" are shadowed.
    assert(enc("the theatre") == (5L, 4L))
    // no vocab hit: every char is its own unit
    assert(enc("xyz") == (3L, 0L))
    assert(enc("") == (0L, 0L))
    // 'ing' wins over 'in' by rank; overlapping occurrences don't double-merge
    assert(enc("inging") == (2L, 2L))
    // merges are non-overlapping left-to-right: "ththth" → th,th,th
    assert(enc("ththth") == (3L, 3L))
    // astral-plane code points count as ONE unit (codePointCount, matching
    // SQL length()) even though they are two UTF-16 units in the JVM
    assert(enc("𝄞𝄞") == (2L, 0L))
    assert(enc("the𝄞the") == (3L, 2L))
  }

  test("RakeTopK: one-pass kernel — runs, integer scores, tie order") {
    import graft.functions.RakeTopK
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def rake(text: String, k: Int = 3): Seq[(Long, String, Long, Long)] =
      Seq(Tuple1(text)).toDF("text")
        .select(explode(ColumnBridge.column(RakeTopK(
          ColumnBridge.expression(split(col("text"), " ")),
          Seq("the", "a", "of", "and", "is"), k))).as("r"))
        .select(col("r.rk"), col("r.phrase"), col("r.n_words"),
          col("r.score_scaled"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
    // two identical runs: freq(red)=2, deg(red)=2+2 → sc 2e6; phrase 4e6;
    // duplicate phrase instances stay distinct rows (the (doc,grp) key)
    assert(rake("red fox of red fox") ==
      Seq((1L, "red fox", 2L, 4000000L), (2L, "red fox", 2L, 4000000L)))
    // all stopwords → no candidate phrases at all
    assert(rake("the a of and is").isEmpty)
    // one run spanning the doc: each word sc 3e6, phrase 9e6
    assert(rake("big blue sky") == Seq((1L, "big blue sky", 3L, 9000000L)))
    // score tie across different phrases breaks by phrase ASC
    assert(rake("zz of aa") ==
      Seq((1L, "aa", 1L, 1000000L), (2L, "zz", 1L, 1000000L)))
    // floor division: "x y of x" → freq(x)=2 deg(x)=2+1=3 → 1500000;
    // y: 2000000; phrase "x y" = 3500000, phrase "x" = 1500000
    assert(rake("x y of x") ==
      Seq((1L, "x y", 2L, 3500000L), (2L, "x", 1L, 1500000L)))
  }
}
