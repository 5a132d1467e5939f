package graft.examples

import org.apache.spark.sql.functions._
import graft.Verify
import graft.llm.Dedup

/** Adversarial convergence probe for [[Dedup.connectedComponents]]: proves
  * the round count grows as log(chain length), NOT corpus size — the
  * property that makes the label-propagation + pointer-jumping design safe
  * at 100 TB (a bigger corpus costs bigger rounds, never MORE rounds; only
  * a pathologically longer duplicate CHAIN adds rounds, and only
  * logarithmically).
  *
  * Two sweeps, both far past the bench corpus (sf0.1's d05 graph is ~4 k
  * edges; the largest sweep here is 2 M edges ≈ 500×):
  *
  *  1. CHAIN LENGTH at fixed corpus: one path graph 0–1–2–…–L for
  *     L = 10^2..10^6, padded with disconnected 3-node stars so total edge
  *     count stays ~2 M in every run. Worst case by construction: the min
  *     label must travel the full chain. Expect rounds ≈ 2 + log2(L)/c,
  *     flat in corpus size.
  *
  *  2. CORPUS SIZE at fixed shape: N 3-node star components for
  *     N = 10^4..10^6 (edges 2·10^4..2·10^6). The common crawl-dup shape
  *     (boilerplate clusters). Expect a CONSTANT 2–3 rounds — scaling the
  *     corpus 100× must not add a single round.
  *
  * Prints one table row per run: edges, nodes, rounds, fixpoint wall-clock,
  * and the margin against the default maxIter = 40. README records the
  * table.
  */
object CcRoundsProbe {
  def main(args: Array[String]): Unit = {
    val spark = Verify.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    spark.range(10000000L).selectExpr("sum(id)").collect()

    // star pad: k components {base, base+1, base+2} with edges
    // (base, base+1), (base, base+2) — ids offset to stay disjoint
    def stars(k: Long, idBase: Long) = {
      val roots = spark.range(k).select((lit(idBase) + col("id") * 3).as("root"))
      roots.select(col("root").as("id_a"), (col("root") + 1).as("id_b"))
        .unionByName(
          roots.select(col("root").as("id_a"), (col("root") + 2).as("id_b")))
    }
    def chain(len: Long) =
      spark.range(len).select(col("id").as("id_a"), (col("id") + 1).as("id_b"))

    def run(tag: String, edges: org.apache.spark.sql.DataFrame): Unit = {
      val e = edges.localCheckpoint()
      val nEdges = e.count()
      val t0 = System.nanoTime()
      val (labels, rounds) = Dedup.connectedComponentsWithRounds(e)
      val nNodes = labels.count() // forces the fixpoint
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ccrounds] $tag%-22s edges=$nEdges%9d nodes=$nNodes%9d " +
        f"rounds=$rounds%2d  ${dt}%6.1f s  (maxIter margin ${40 - rounds})")
    }

    println("[ccrounds] sweep 1: chain length at ~constant 2M edges")
    for (l <- Seq(100L, 1000L, 10000L, 100000L, 1000000L)) {
      val pad = (2000000L - l) / 2
      run(s"chain L=$l", chain(l).unionByName(stars(pad, 10000000L)))
    }

    println("[ccrounds] sweep 2: corpus size at fixed star shape")
    for (n <- Seq(10000L, 100000L, 1000000L))
      run(s"stars N=$n", stars(n, 0L))

    spark.stop()
  }
}
