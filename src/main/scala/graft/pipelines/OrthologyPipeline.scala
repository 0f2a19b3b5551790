package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ColFns, Tables}
import graft.ops.Kernels

/** Gene-orthology integration (edge_data/orthology.py analog).
  *
  * Reference semantics covered: OMA pairs arrive keyed by ENTRY NAME and
  * resolve through the entry-name→id mapping (orthology.py:196-197 J4);
  * scores round to 3 dp (orthology.py:198 F10); undirected-pair dedup keeps
  * the best-scored orientation (orthology.py:206 D2); rel_type derives from
  * a cardinality flag (F12).
  *
  * Testdata casting: orthologous "entries" = suppliers named by s_name;
  * a pair = two suppliers co-supplying an order in the 1999+ slice; score =
  * mean discount rounded to 3 dp.
  */
object OrthologyPipeline {

  def pairs(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1999-01-01 00:00:00").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_discount"), col("l_quantity"))
    // entry-name keyed sides, resolved back through the broadcast name map
    val names = Tables.supplier(s, d)
      .select(col("s_suppkey"), upper(col("s_name")).as("entry_name"))
    val a = li.toDF("l_orderkey", "sk_a", "ln_a", "disc_a", "qty_a")
      .join(broadcast(names.toDF("sk_a", "name_a")), Seq("sk_a"))
    val b = li.toDF("l_orderkey", "sk_b", "ln_b", "disc_b", "qty_b")
      .join(broadcast(names.toDF("sk_b", "name_b")), Seq("sk_b"))
    val raw = a.join(b, Seq("l_orderkey"))
      .filter(col("sk_a") =!= col("sk_b")) // both orientations, like OMA
      .withColumn("a", ColFns.curie("supp", col("sk_a")))
      .withColumn("b", ColFns.curie("supp", col("sk_b")))
      .withColumn("score", round((col("disc_a") + col("disc_b")) / 2, 3))
      .withColumn("rel_type",
        when(col("qty_a") === col("qty_b"), "1:1").otherwise("n:1"))
    // D2: (a,b) ≡ (b,a); winner keeps its original orientation; tie chain
    // ends with the emitted columns
    Kernels.undirectedDedup(raw, "a", "b",
      Seq(col("score").desc, col("l_orderkey").asc, col("ln_a").asc,
        col("ln_b").asc, col("a").asc, col("rel_type").asc))
      .select(col("a"), col("b"), col("score"), col("rel_type"))
  }
}
