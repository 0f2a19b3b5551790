package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import graft.core.ColFns

/** Algebraic property tests (SURVEY §5 strategy c): dedup idempotence,
  * set-union merge commutativity/associativity, canonical-pair symmetry.
  * Drives ScalaCheck generators directly (fixed seed → reproducible) since
  * only scalatest + scalacheck are on the test classpath. */
class KernelPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int = 12): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val word = Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString)
  private val pipes = Gen.listOfN(4, word).map(_.mkString("|"))
  private val maybePipes = Gen.option(pipes)

  private def mergeTwo(x: Option[String], y: Option[String]): Option[String] =
    Seq((x, y)).toDF("x", "y")
      .select(ColFns.mergePipes(col("x"), col("y"))).as[Option[String]]
      .collect().head

  test("mergePipes is commutative and idempotent (A4/A5 set semantics)") {
    samples(Gen.zip(maybePipes, maybePipes)).foreach { case (x, y) =>
      assert(mergeTwo(x, y) === mergeTwo(y, x), s"not commutative on $x, $y")
    }
    samples(maybePipes).foreach { x =>
      val once = mergeTwo(x, None)
      assert(mergeTwo(once, once) === once, s"not idempotent on $x")
    }
  }

  test("canonical pair is symmetric and stable (D2)") {
    samples(Gen.zip(Gen.choose(0L, 1000L), Gen.choose(0L, 1000L))).foreach {
      case (a, b) =>
        val r = Seq((a, b), (b, a)).toDF("a", "b")
          .select(ColFns.canonicalU(col("a"), col("b")),
            ColFns.canonicalV(col("a"), col("b")))
          .as[(Long, Long)].collect()
        assert(r(0) === r(1))
        assert(r(0)._1 <= r(0)._2)
    }
  }

  test("keepBestPerKey is idempotent") {
    val rows = Gen.listOfN(30,
      Gen.zip(Gen.oneOf("k1", "k2", "k3"), Gen.choose(0, 100), Gen.choose(0L, 5000L)))
    samples(rows, n = 6).filter(_.nonEmpty).foreach { rs =>
      val df = rs.toDF("k", "score", "id")
      val order = Seq(col("score").desc, col("id").asc)
      val once = Kernels.keepBestPerKey(df, Seq("k"), order)
      val twice = Kernels.keepBestPerKey(once, Seq("k"), order)
      assert(once.collect().toSet === twice.collect().toSet)
    }
  }

  test("undirectedDedup output has no unordered-pair duplicates") {
    val rows = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 5L), Gen.choose(0, 100),
        Gen.choose(0L, 9999L)))
    samples(rows, n = 6).filter(_.nonEmpty).foreach { rs =>
      val df = rs.toDF("a", "b", "score", "id")
      val out = Kernels.undirectedDedup(df, "a", "b",
        Seq(col("score").desc, col("id").asc, col("a").asc, col("b").asc))
        .select("a", "b").as[(Long, Long)].collect()
      val canon = out.map { case (x, y) => (math.min(x, y), math.max(x, y)) }
      assert(canon.distinct.length === canon.length)
    }
  }

  test("admitUnlessBoth rejects only groups holding both markers (P9)") {
    val df = Seq(
      (1L, Seq("increases")), (2L, Seq("increases", "decreases")),
      (3L, Seq("decreases", "other")), (4L, Seq.empty[String]))
      .toDF("id", "effects")
    val kept = df.filter(
      Kernels.admitUnlessBoth(col("effects"), "increases", "decreases"))
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L))
  }

  test("idBase strips version and bracket suffixes (F2)") {
    val got = Seq("ENST0001.5", "ENST0002 [note]", "ENST0003")
      .toDF("x").select(ColFns.idBase(col("x"))).as[String].collect().toSeq
    assert(got === Seq("ENST0001", "ENST0002", "ENST0003"))
  }

  test("effectMergePair: symmetric, idempotent, and agrees with the aggregate fold") {
    val domain = Gen.option(Gen.oneOf("Activation", "Repression", "Unknown"))
    val pairs = samples(Gen.zip(domain, domain), 24)
    def pairwise(x: Option[String], y: Option[String]): Option[String] =
      Seq((x, y)).toDF("x", "y")
        .select(Kernels.effectMergePair(col("x"), col("y")))
        .as[Option[String]].head()
    def aggregate(x: Option[String], y: Option[String]): Option[String] =
      Seq(("k", x), ("k", y)).toDF("k", "v").groupBy($"k")
        .agg(Kernels.effectFold($"v").as("e"))
        .select($"e").as[Option[String]].head()
    pairs.foreach { case (x, y) =>
      val m = pairwise(x, y)
      assert(m === pairwise(y, x), s"not symmetric on ($x, $y)")
      assert(pairwise(x, x) === x, s"not idempotent on $x")
      assert(m === aggregate(x, y),
        s"pairwise($x, $y)=$m disagrees with the aggregate fold")
    }
  }
}
