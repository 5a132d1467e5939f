package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Sampling, TextOps}

/** Duplicate-cluster resolution (connected components), deterministic
  * splitting/sampling, and PII redaction. */
class ClusterSamplingSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chain, clique, pair, self-loop") {
    // chain 1-2-3-4 (diameter > 1 forces multiple rounds), clique 10-12,
    // isolated pair 20-21, self-loop 30-30 (ignored entirely)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L), (30L, 30L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs).as[(Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: 60-node chain converges (pointer jumping)") {
    // plain min-propagation needs 59 rounds here; pointer jumping needs
    // ~log2(60) ≈ 6 — well inside the default maxIter
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs).as[(Long, Long)].collect()
    assert(got.length == 60 && got.forall(_._2 == 1L))
  }

  test("connectedComponents: empty input, and direction-independence") {
    assert(Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).isEmpty)
    // reversed pairs give the same components
    val fwd = Seq((5L, 1L), (1L, 9L)).toDF("id_a", "id_b")
    val rev = Seq((1L, 5L), (9L, 1L)).toDF("id_a", "id_b")
    val a = Dedup.connectedComponents(fwd).as[(Long, Long)].collect().toSet
    val b = Dedup.connectedComponents(rev).as[(Long, Long)].collect().toSet
    assert(a == b && a == Set(1L -> 1L, 5L -> 1L, 9L -> 1L))
  }

  test("dupClusters: survivor, size, member list") {
    val comp = Seq((1L, 1L), (2L, 1L), (7L, 1L), (20L, 20L), (21L, 20L))
      .toDF("node", "comp")
    val got = Dedup.dupClusters(comp)
      .as[(Long, Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 1L, 3L, Seq(1L, 2L, 7L)),
      (20L, 20L, 2L, Seq(20L, 21L))))
  }

  test("dupClusters: member list capped in-aggregate, counts stay exact") {
    // a "giant cluster" in miniature, across many partitions so the cap is
    // exercised on the map side and through merge, not just at eval
    val comp = spark.range(1, 101).select($"id".as("node"), lit(1L).as("comp"))
      .repartition(8)
    val got = Dedup.dupClusters(comp, maxMembers = 5)
      .as[(Long, Long, Long, Seq[Long])].collect().toSeq
    assert(got == Seq((1L, 1L, 100L, Seq(1L, 2L, 3L, 4L, 5L))),
      "n_members must be exact while members holds the maxMembers smallest ids")
  }

  test("hashSplit: total partition, deterministic, ~80/10/10") {
    val docs = (1 to 5000).map(i => (i.toLong, s"document number $i payload"))
      .toDF("doc_id", "text")
    val s1 = Sampling.hashSplit(docs, col("text"), salt = "s")
    val counts = s1.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 5000L)
    assert(math.abs(counts("train") - 4000L) < 200, counts.toString)
    assert(math.abs(counts("valid") - 500L) < 120, counts.toString)
    assert(math.abs(counts("test") - 500L) < 120, counts.toString)
    // rerun → identical assignment
    val s2 = Sampling.hashSplit(docs, col("text"), salt = "s")
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    // identical content → identical split even under a different id
    val dup = Seq((999999L, "document number 17 payload")).toDF("doc_id", "text")
    val d = Sampling.hashSplit(dup, col("text"), salt = "s")
      .select("split").as[String].head()
    val orig = s1.filter($"doc_id" === 17).select("split").as[String].head()
    assert(d == orig)
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, col("text"), thresholds = Seq("a" -> 100))
    }
    // mis-ordered cumulative counts would silently empty a split
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, col("text"),
        thresholds = Seq("train" -> 230, "valid" -> 204, "test" -> 256))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, col("text"),
        thresholds = Seq("a" -> 0, "b" -> 256))
    }
  }

  test("clusterAwareSplit: cluster members co-assigned, singletons = " +
      "own representative, decision = hashSplit of the min-id rep") {
    // clusters: {1,2,3} labeled 1; {10,11} labeled 10; 20/21 singletons
    // (NULL cluster); 30 labeled by itself
    val rows = Seq((1L, Some(1L)), (2L, Some(1L)), (3L, Some(1L)),
      (10L, Some(10L)), (11L, Some(10L)), (20L, None), (21L, None),
      (30L, Some(30L))).toDF("doc_id", "cluster_id")
    val got = Sampling.clusterAwareSplit(rows, col("doc_id"),
      col("cluster_id"), salt = "cs").as[(Long, Option[Long], String)]
      .collect().map(r => r._1 -> r._3).toMap
    assert(got.size == 8)
    // co-assignment within clusters
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(10L) == got(11L))
    // the decision is EXACTLY hashSplit of the representative id — the
    // oracle-parity contract (d32 reproduces it in SQL)
    val repOf = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 21L, 30L -> 30L)
    val expect = Sampling.hashSplit(
        repOf.values.toSeq.distinct.toDF("rep"), col("rep"), salt = "cs")
      .as[(Long, String)].collect().toMap
    got.foreach { case (id, sp) => assert(sp == expect(repOf(id)),
      s"doc $id: got $sp want ${expect(repOf(id))}") }
    // determinism across partitionings
    val again = Sampling.clusterAwareSplit(rows.repartition(7),
      col("doc_id"), col("cluster_id"), salt = "cs")
      .as[(Long, Option[Long], String)].collect().map(r => r._1 -> r._3).toMap
    assert(again == got)
    // reserved-column collision is loud
    val boom = intercept[IllegalArgumentException] {
      Sampling.clusterAwareSplit(rows.withColumn("__cs_c", lit(1)),
        col("doc_id"), col("cluster_id"))
    }
    assert(boom.getMessage.contains("__cs_c"))
    // a pre-existing split column is loud (join-back cannot replace it)
    val boom2 = intercept[IllegalArgumentException] {
      Sampling.clusterAwareSplit(rows.withColumn("split", lit("x")),
        col("doc_id"), col("cluster_id"))
    }
    assert(boom2.getMessage.contains("split"))
    // cluster labels from a FOREIGN domain never merge with a singleton
    // whose doc id equals the label: cluster "20" (dense k-means style)
    // groups docs 40/41 by THEIR min id, independent of singleton doc 20
    val foreign = Seq((20L, None), (40L, Some(20L)), (41L, Some(20L)))
      .toDF("doc_id", "cluster_id")
    val fgot = Sampling.clusterAwareSplit(foreign, col("doc_id"),
      col("cluster_id"), salt = "cs").as[(Long, Option[Long], String)]
      .collect().map(r => r._1 -> r._3).toMap
    val fexpect = Sampling.hashSplit(Seq(20L, 40L).toDF("rep"),
      col("rep"), salt = "cs").as[(Long, String)].collect().toMap
    assert(fgot(40L) == fgot(41L) && fgot(40L) == fexpect(40L)
      && fgot(20L) == fexpect(20L),
      s"foreign-domain labels must group by their own min id: $fgot")
  }

  test("clusterAwareSplit guards: non-integral cluster/id are refused " +
      "LOUDLY (silent cast-to-NULL would break co-assignment); NULL id " +
      "fails at execution instead of silently dropping the row") {
    val rows = Seq((1L, Some(1L)), (2L, Some(1L)))
      .toDF("doc_id", "cluster_id")
    // a STRING cluster label would cast("long") to NULL while isNull stays
    // false — every clustered doc its own singleton, the exact leak the
    // operator prevents (ADVICE r17) — refuse at plan time
    val strCluster = rows.withColumn("lbl", concat(lit("band-"),
      col("cluster_id")))
    val b1 = intercept[IllegalArgumentException] {
      Sampling.clusterAwareSplit(strCluster, col("doc_id"), col("lbl"))
    }
    assert(b1.getMessage.contains("integral"), b1.getMessage)
    val b2 = intercept[IllegalArgumentException] {
      Sampling.clusterAwareSplit(
        rows.withColumn("sid", col("doc_id").cast("string")),
        col("sid"), col("cluster_id"))
    }
    assert(b2.getMessage.contains("integral"), b2.getMessage)
    // an all-singleton frame with a NullType cluster column stays legal
    val nullCluster = Seq(5L, 6L).toDF("doc_id")
      .withColumn("cluster_id", lit(null))
    assert(Sampling.clusterAwareSplit(nullCluster, col("doc_id"),
      col("cluster_id"), salt = "cs").count() == 2)
    // NULL id: the row would vanish in the USING join — raise instead
    val nullId = Seq((Some(1L), Some(1L)), (None, None))
      .toDF("doc_id", "cluster_id")
    val b3 = intercept[Exception] { // SparkRuntimeException (USER_RAISED)
      Sampling.clusterAwareSplit(nullId, col("doc_id"),
        col("cluster_id"), salt = "cs").count()
    }
    assert(Iterator.iterate[Throwable](b3)(_.getCause).takeWhile(_ != null)
      .take(8).exists(t => Option(t.getMessage).exists(_.contains("NULL id"))),
      b3.getMessage)
  }

  test("deterministicSample: rate, determinism, boundary nums") {
    val docs = (1 to 5000).map(i => (i.toLong, s"doc $i body")).toDF("doc_id", "text")
    val n = Sampling.deterministicSample(docs, col("text"), 6554, "z").count()
    assert(math.abs(n - 500L) < 120, n.toString)
    val n2 = Sampling.deterministicSample(docs, col("text"), 6554, "z").count()
    assert(n == n2)
    assert(Sampling.deterministicSample(docs, col("text"), 0).count() == 0)
    assert(Sampling.deterministicSample(docs, col("text"), 65536).count() == 5000)
  }

  test("capSample: big strata shrink to ~cap, small strata kept whole") {
    val docs = ((1 to 4000).map(i => (i.toLong, "big", s"doc $i body")) ++
      (5001 to 5050).map(i => (i.toLong, "small", s"doc $i body")))
      .toDF("doc_id", "domain", "text")
    val out = Sampling.capSample(docs, col("text"), col("domain"),
      cap = 400, salt = "c")
    assert(out.columns.toSeq == Seq("doc_id", "domain", "text"),
      "temp columns must not leak")
    val counts = out.groupBy("domain").count().as[(String, Long)]
      .collect().toMap
    // big: binomial around 400·(floor(65536·400/4000)/65536) ≈ 399.96
    assert(math.abs(counts("big") - 400L) < 80, counts.toString)
    assert(counts("small") == 50L, "under-cap stratum must be kept whole")
    // deterministic: rerun keeps exactly the same rows
    val out2 = Sampling.capSample(docs, col("text"), col("domain"),
      cap = 400, salt = "c")
    assert(out.exceptAll(out2).isEmpty && out2.exceptAll(out).isEmpty)
    // cap = 0 empties every over-cap stratum (num = 0 → prefix < "0000"
    // never holds); a stratum of size 0 cannot exist by construction
    assert(Sampling.capSample(docs, col("text"), col("domain"), cap = 0)
      .count() == 0)
    intercept[IllegalArgumentException] {
      Sampling.capSample(docs, col("text"), col("domain"), cap = -1)
    }
    // a NULL stratum is capped like any other, not silently dropped
    val withNull = docs.withColumn("domain",
      when($"doc_id" <= 30, lit(null: String)).otherwise($"domain"))
    val nOut = Sampling.capSample(withNull, col("text"), col("domain"),
      cap = 400, salt = "c")
    assert(nOut.filter($"domain".isNull).count() == 30L,
      "null-stratum rows (under cap) must survive whole")
    assert(nOut.count() > 0 && nOut.filter($"domain".isNull).count() +
      nOut.filter($"domain".isNotNull).count() == nOut.count())
  }

  test("redactPii replaces typed placeholders; counts match") {
    val df = Seq(
      (1L, "mail a.b%c@x-y.co.uk now"),
      (2L, "srv 192.168.0.1 and 10.0.0.255, call 555-123-4567"),
      (3L, "no pii here 1234-5678"),
      (4L, "two mails a@b.io c@d.org")).toDF("doc_id", "text")
    val out = df.select($"doc_id",
      TextOps.redactPii($"text").as("red"),
      TextOps.piiCount($"text", TextOps.EmailRe).as("ne"),
      TextOps.piiCount($"text", TextOps.Ipv4Re).as("ni"),
      TextOps.piiCount($"text", TextOps.PhoneRe).as("np"))
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, "mail <EMAIL> now", 1L, 0L, 0L)))
    assert(out(1) == ((2L, "srv <IP> and <IP>, call <PHONE>", 0L, 2L, 1L)))
    assert(out(2) == ((3L, "no pii here 1234-5678", 0L, 0L, 0L)))
    assert(out(3) == ((4L, "two mails <EMAIL> <EMAIL>", 2L, 0L, 0L)))
  }

  test("clusterBalancedSample matches the per-cluster window form exactly") {
    // deterministic pseudo-random clusters/scores, including score TIES
    // (scores rounded to one decimal) so the (score desc, id asc)
    // tie-break is actually exercised
    val rnd = new scala.util.Random(7)
    val rows = (1L to 400L).map(i =>
      (i, rnd.nextInt(5).toLong, math.floor(rnd.nextDouble() * 10) / 10))
    val df = rows.toDF("doc_id", "centroid_id", "score")
    val got = Sampling.clusterBalancedSample(df, perCluster = 7,
        clusterCol = "centroid_id", scoreCol = "score", idCol = "doc_id")
      .select($"centroid_id", $"cluster_size", $"doc_id", $"rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"centroid_id").orderBy($"score".desc, $"doc_id".asc)
    val twin = df
      .withColumn("rank", row_number().over(w))
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"centroid_id")))
      .filter($"rank" <= 7)
      .select($"centroid_id", $"cluster_size", $"doc_id", $"rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(got == twin, "TopKAgg form diverged from the window form")
  }

  test("clusterBalancedSample: short clusters keep all rows, ranks dense") {
    val df = Seq((1L, 0L, 0.9), (2L, 0L, 0.5), (3L, 1L, 0.1))
      .toDF("doc_id", "centroid_id", "score")
    val got = Sampling.clusterBalancedSample(df, perCluster = 5,
        clusterCol = "centroid_id", scoreCol = "score", idCol = "doc_id")
      .select($"centroid_id", $"cluster_size", $"doc_id", $"rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(got == Seq((0L, 2L, 1L, 1), (0L, 2L, 2L, 2), (1L, 1L, 3L, 1)))
    intercept[IllegalArgumentException] {
      Sampling.clusterBalancedSample(df, perCluster = 0)
    }
    ()
  }

  test("exactCapSample matches the bottom-k-by-hash window form exactly") {
    // duplicate keys across strata (identical hash engages the id
    // tie-break), short strata keep everything
    val rows = (1L to 300L).map(i => (i, s"s${i % 4}", s"key${i % 90}")) ++
      Seq((900L, "tiny", "only"), (901L, "tiny", "only"))
    val df = rows.toDF("doc_id", "stratum", "k")
    val got = Sampling.exactCapSample(df, $"k", $"stratum", $"doc_id",
        k = 10, salt = "t")
      .select($"stratum", $"stratum_size", $"id", $"rank")
      .as[(String, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val h = substring(md5(concat(lit("t"), $"k")), 1, 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"stratum").orderBy(h.asc, $"doc_id".asc)
    val twin = df
      .withColumn("rank", row_number().over(w))
      .withColumn("stratum_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"stratum")))
      .filter($"rank" <= 10)
      .select($"stratum", $"stratum_size", $"doc_id".as("id"), $"rank")
      .as[(String, Long, Long, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    assert(got == twin, "heap form diverged from the hash-window form")
    // exact cap: every stratum at min(k, n)
    val sizes = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(sizes == Map("s0" -> 10, "s1" -> 10, "s2" -> 10, "s3" -> 10,
      "tiny" -> 2))
  }

  test("exactCapSample: determinism across partitionings; null keys excluded") {
    val df = (1L to 100L).map(i => (i, "s", s"k$i")).toDF("doc_id", "st", "k")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.exactCapSample(d, $"k", $"st", $"doc_id", k = 7, salt = "x")
        .select($"id", $"rank").as[(Long, Int)].collect().sortBy(_._2).toSeq
    assert(run(df) == run(df.repartition(13)), "selection moved with layout")
    val withNull = df.unionByName(
      Seq((999L, "s", null: String)).toDF("doc_id", "st", "k"))
    val got = run(withNull)
    assert(got.size == 7 && !got.exists(_._1 == 999L),
      "a NULL-key row must not occupy a quota slot")
  }

  test("shardManifest: layout-independent, order-audited, hash-balanced") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    def manifest(df: org.apache.spark.sql.DataFrame) =
      Sampling.shardManifest(df, $"text", $"doc_id", nShards = 8,
          salt = "sm1")
        .orderBy($"shard").collect().map(_.toSeq).toSeq
    val base = manifest(docs)
    // layout independence: the SAME corpus must produce an IDENTICAL
    // manifest (shards, counts, order fingerprints, hash ranges) under
    // any physical partitioning — the property that makes the manifest
    // reproducible across engines, re-runs, and cluster sizes
    assert(manifest(docs.repartition(13)) == base,
      "manifest changed under repartition(13)")
    assert(manifest(docs.repartition(1)) == base,
      "manifest changed under a single partition")
    assert(manifest(docs.orderBy($"doc_id".desc)) == base,
      "manifest changed under a different input order")
    // every shard present, counts total the corpus, hash-balanced within
    // a generous band (500 docs over 8 shards: ±60% of the mean)
    val counts = base.map(_(1).asInstanceOf[Long])
    assert(base.map(_(0)) == (0L until 8L).toSeq)
    assert(counts.sum == 500L)
    val mean = counts.sum / 8.0
    assert(counts.forall(c => c > mean * 0.4 && c < mean * 1.6),
      s"shard balance outside band: ${counts.toSeq}")
    // the order fingerprint actually audits ORDER: permuting two ids
    // within one shard must change it (swap-sensitivity via a synthetic
    // two-row shard)
    val two = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val swapped = Seq((2L, "alpha"), (1L, "beta")).toDF("doc_id", "text")
    def fps(df: org.apache.spark.sql.DataFrame) =
      Sampling.shardManifest(df, $"text", $"doc_id", nShards = 1,
          salt = "sm2")
        .select($"order_fp").as[Long].collect().toSeq
    assert(fps(two) != fps(swapped),
      "order_fp must distinguish the same membership in a different order")
  }

  test("auditShardExport: clean delivery passes; duplication, loss, and a missing shard fail loudly") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val man = Sampling.shardManifest(docs, $"text", $"doc_id", nShards = 4,
      salt = "au1")
    def audit(df: org.apache.spark.sql.DataFrame) =
      Sampling.auditShardExport(df, man, $"text", $"doc_id", nShards = 4,
          salt = "au1")
        .orderBy($"shard").collect()
        .map(r => r.getLong(0) -> (r.getBoolean(2), r.getBoolean(3),
          r.getBoolean(4), r.getBoolean(5))).toMap
    // clean: every flag true on every shard, even under a different layout
    assert(audit(docs.repartition(7)).values.forall(_ == ((true, true, true, true))))
    // duplicated row: its shard fails rows+ids+order; others stay clean
    val dup = docs.unionByName(docs.filter($"doc_id" === 2L))
    val dupFlags = audit(dup)
    assert(dupFlags.count(_._2 == ((true, true, true, true))) == 3)
    assert(dupFlags.exists { case (_, (r, i, o, _)) => !r && !i && !o })
    // a whole shard missing must surface as a failing row, not vanish
    val shardOf = pmod(conv(substring(md5(concat(lit("au1"), $"text")),
      1, 4), 16, 10).cast("long"), lit(4L))
    val gone = Sampling.auditShardExport(docs.filter(shardOf =!= 0L), man,
        $"text", $"doc_id", nShards = 4, salt = "au1")
      .orderBy($"shard").collect()
    assert(gone.length == 4, "the missing shard must still report")
    val s0 = gone.find(_.getLong(0) == 0L).get
    assert(s0.getLong(1) == 0L && !s0.getBoolean(2) && !s0.getBoolean(3)
      && !s0.getBoolean(4) && !s0.getBoolean(5),
      s"missing shard must fail every flag: $s0")
  }

  test("mixtureByTokens: cascading water-fill quotas, hash-prefix kept " +
    "set, budget respected, layout-independent") {
    // strata: a tiny (forces the FIRST clamp), b small (clamps in round
    // 2 after a's tokens redistribute), c deep (absorbs the rest) — a
    // three-round fill the two-round oracle shape never reaches.
    // avail: a=10, b=5, c=1000; weights 8:1:1, budget 500 →
    //   r1: a share 400 → clamp 10; r2 (rem 490): b 245 → clamp 5;
    //   r3 (rem 485): c 485. Σ = 500 = budget exactly.
    val docs = (
      (1 to 10).map(i => (i.toLong, "a", 1L)) ++
      (11 to 15).map(i => (i.toLong, "b", 1L)) ++
      (16 to 1015).map(i => (i.toLong, "c", 1L)) ++
      (2000 to 2005).map(i => (i.toLong, "zz", 7L)) // not in weights
    ).toDF("id", "src", "t")
    val weights = Map("a" -> 8L, "b" -> 1L, "c" -> 1L)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.mixtureByTokens(df, $"src", $"t", $"id", weights,
        budget = 500L, salt = "mx1")
    val kept = run(docs).select($"id", $"src", $"mix_quota")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // quotas are the cascading fill; unweighted strata are excluded
    val bySrc = kept.groupBy(_._2)
    assert(!bySrc.contains("zz"), "strata outside the weight map are excluded")
    assert(bySrc("a").size == 10 && bySrc("a").forall(_._3 == 10L),
      "clamped stratum keeps everything at quota = availability")
    assert(bySrc("b").size == 5 && bySrc("b").forall(_._3 == 5L))
    assert(bySrc("c").size == 485 && bySrc("c").forall(_._3 == 485L),
      s"round-3 quota must be the remaining budget (got ${bySrc("c").size})")
    assert(kept.size == 500, "unit tokens: kept rows == spent budget")
    // the kept set is the exact salted-md5-order prefix of stratum c
    val cOrder = (16 to 1015).map(_.toLong).sortBy(i =>
      (java.security.MessageDigest.getInstance("MD5")
        .digest(s"mx1$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8), i.toString))
    assert(bySrc("c").map(_._1).toSet == cOrder.take(485).toSet,
      "kept set must be the hash-order prefix, not an arbitrary subset")
    // layout-independence: the kept set is a pure function of the data
    val re = run(docs.repartition(7)).select($"id", $"src", $"mix_quota")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(re == kept)
    // uneven token sizes: the prefix stops AT the boundary document
    val fat = Seq((1L, "x", 40L), (2L, "x", 40L), (3L, "x", 40L),
      (4L, "x", 40L)).toDF("id", "src", "t")
    val keptFat = Sampling.mixtureByTokens(fat, $"src", $"t", $"id",
        Map("x" -> 1L), budget = 100L, salt = "mx2")
      .select($"id").as[Long].collect().toSeq
    assert(keptFat.size == 2, s"100-token budget holds two 40-token docs " +
      s"(got ${keptFat.size}) — greedy stops at the boundary")
  }
}
