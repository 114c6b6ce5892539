package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.catalyst.FiscalMath
import graft.functions.{Coercions, Keys}

/** Property tests for the pure kernels (SURVEY.md §5 point 3): coercion
  * B2, business keys B6, 13-4 calendar G5 — the rules whose exactness
  * the MERGE identity and TY/LY alignment depend on. ScalaCheck
  * generators drive the cases (sampled manually — the scalatest bridge
  * artifact isn't in the offline cache); seeds are fixed so failures
  * reproduce.
  */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.session

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("fiscal period/week stay in range and are consistent") {
    for (epochDay <- samples(Gen.choose(-20000, 40000), 500)) {
      val p = FiscalMath.fiscalPeriod(epochDay)
      val w = FiscalMath.fiscalWeek(epochDay)
      assert(p >= 1 && p <= 13, s"day $epochDay period $p")
      assert(w >= 1 && w <= 53, s"day $epochDay week $w")
      // a period holds exactly weeks 4p-3..4p (weeks past 52 fold into P13)
      assert(p == math.min(13, (w - 1) / 4 + 1), s"day $epochDay p=$p w=$w")
    }
  }

  test("asInt == comma-stripped int(float(x)) for arbitrary numerics") {
    import spark.implicits._
    val ds = samples(Gen.choose(-1e12, 1e12), 40)
    val raws = ds.map(d => f"$d%,.3f") // thousands separators + decimals
    val got = raws.toDF("x").select(Coercions.asInt(col("x"))).as[Long].collect()
    ds.zip(got).foreach { case (d, g) =>
      assert(g == d.toLong, s"$d -> $g")
    }
  }

  test("business keys are deterministic and never contain spaces or hyphens") {
    import spark.implicits._
    val comp = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(12)),
      Gen.const("a b-c"), Gen.const(""), Gen.const(" x "))
    val pairs = samples(Gen.zip(comp, comp), 40)
    val out = (pairs ++ pairs).toDF("a", "b")
      .select(Keys.businessKey(col("a"), col("b")).as("k"))
      .as[String].collect()
    val (first, second) = out.splitAt(pairs.size)
    assert(first.toSeq == second.toSeq) // deterministic
    first.foreach { k =>
      assert(!k.contains(" ") && !k.contains("-"), k)
    }
  }

  test("asDate normalizes every supported format to the same day") {
    import spark.implicits._
    for (d <- samples(Gen.choose(0, 25000), 40)) { // 1970..2038
      val ld = java.time.LocalDate.ofEpochDay(d.toLong)
      val variants = Seq(
        ld.toString, // ISO
        s"${ld.getMonthValue}/${ld.getDayOfMonth}/${ld.getYear}",
        f"${ld.getMonthValue}%02d/${ld.getDayOfMonth}%02d/${ld.getYear}",
        ld.toString + " 13:14:15")
      val parsed = variants.toDF("x")
        .select(Coercions.asDate(col("x")).cast("string")).as[String].collect()
      assert(parsed.forall(_ == ld.toString), s"$variants -> ${parsed.toSeq}")
    }
  }
}
