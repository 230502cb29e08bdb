package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.bronze.Bronze
import graft.dml.Mutations

/** Property-based invariants (SURVEY §5: the reference has none; ScalaCheck
  * generators pin the contracts that matter — hash order-independence,
  * upsert idempotence, key-union preservation). Generators are driven with
  * fixed seeds (no scalatestplus bridge in the offline cache), so runs are
  * reproducible.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val rowGen: Gen[List[(String, Long, String)]] =
    Gen.listOfN(
      4,
      for {
        a <- Gen.alphaNumStr.map(_.take(12))
        b <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
        c <- Gen.option(Gen.alphaNumStr.map(_.take(8))).map(_.orNull)
      } yield (a, b, c))

  private val pairsGen: Gen[List[(Long, String)]] =
    Gen.listOfN(6, Gen.zip(Gen.chooseNum(1L, 8L), Gen.alphaNumStr.map(_.take(6))))

  test("row hash is invariant under column permutation (property, 10 cases)") {
    samples(rowGen, 10).foreach { rows =>
      val df = rows.toDF("c1", "c2", "c3")
      val h1 = df.select(Bronze.rowHash(Seq("c1", "c2", "c3")).as("h"))
        .as[String].collect().toSeq
      val h2 = df.select(col("c3"), col("c1"), col("c2"))
        .select(Bronze.rowHash(Seq("c3", "c1", "c2")).as("h"))
        .as[String].collect().toSeq
      assert(h1 == h2, s"hash changed under permutation for $rows")
    }
  }

  test("upsert is idempotent for any key overlap (property, 10 cases)") {
    samples(Gen.zip(pairsGen, pairsGen), 10).foreach { case (t, s) =>
      val target = t.distinctBy(_._1).toDF("id", "v")
      val source = s.distinctBy(_._1).toDF("id", "v")
      val once = Mutations.upsert(target, source, Seq("id")).collect().toSet
      val twice = Mutations
        .upsert(Mutations.upsert(target, source, Seq("id")), source, Seq("id"))
        .collect().toSet
      assert(once == twice, s"not idempotent for target=$t source=$s")
    }
  }

  test("upsert output keys = target keys ∪ source keys (property, 10 cases)") {
    samples(Gen.zip(pairsGen, pairsGen), 10).foreach { case (t, s) =>
      val target = t.distinctBy(_._1).toDF("id", "v")
      val source = s.distinctBy(_._1).toDF("id", "v")
      val out = Mutations.upsert(target, source, Seq("id"))
        .select("id").as[Long].collect().toSet
      assert(out == (t.map(_._1).toSet ++ s.map(_._1).toSet))
    }
  }
}
