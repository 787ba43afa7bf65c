package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.Routing

/** Property coverage for the hand-rolled kvconfig reader: any route
  * table we can render in the reference's file shape must parse back
  * to exactly the structure we rendered — names in order, matcher
  * maps intact, output blocks intact. Example-based specs pin the
  * edge cases; this pins the space between them. (Raw scalacheck
  * generators sampled under fixed seeds — scalatestplus isn't on the
  * classpath, and deterministic seeds beat flaky CI anyway.)
  */
class RoutingPropertySpec extends AnyFunSuite {

  private val ident: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ '-' :+ '_')).map(_.mkString))
      .suchThat(s => s.nonEmpty && !s.startsWith("-"))

  // matcher values: printable, no quotes (the renderer quotes them);
  // '#' IS allowed — the parser must not treat a quoted '#' as comment
  private val value: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') :+ '#' :+ '.' :+ ':'))
      .map(_.mkString))

  private val matchers: Gen[Map[String, Seq[String]]] =
    Gen.mapOfN(2, for {
      f <- ident; vs <- Gen.nonEmptyListOf(value).map(_.take(3))
    } yield f -> vs.toSeq).map(_.take(2))

  private val output: Gen[Option[Routing.Output]] =
    Gen.option(for {
      ty <- ident; series <- ident; vf <- ident
      dims <- Gen.listOf(ident).map(_.take(2))
    } yield Routing.Output(sinkType = ty, series = series,
      dimensions = dims, statType = "gauge", valueField = vf))

  private val routeTable: Gen[Seq[Routing.Route]] =
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, for {
      name <- ident; m <- matchers; o <- output
    } yield Routing.Route(name, m, o)))
      // route names must be unique — the file format keys on them
      .map(_.groupBy(_.name).map(_._2.head).toSeq)

  private def render(routes: Seq[Routing.Route]): String = {
    val sb = new StringBuilder("routes:\n")
    routes.foreach { r =>
      sb.append(s"  ${r.name}:\n")
      if (r.matchers.nonEmpty) {
        sb.append("    matchers:\n")
        r.matchers.foreach { case (f, vs) =>
          sb.append(s"      $f: [${vs.map(v => "\"" + v + "\"").mkString(", ")}]\n")
        }
      }
      r.output.foreach { o =>
        sb.append("    output:\n")
        sb.append(s"""      type: "${o.sinkType}"\n""")
        sb.append(s"""      series: "${o.series}"\n""")
        sb.append(s"      dimensions: [${o.dimensions.map(d => "\"" + d + "\"").mkString(", ")}]\n")
        sb.append(s"""      stat_type: "${o.statType}"\n""")
        sb.append(s"""      value_field: "${o.valueField}"\n""")
      }
    }
    sb.toString
  }

  test("compiled route Column agrees with a direct interpreter (20 seeded tables)") {
    import SparkTest._
    import org.apache.spark.sql.functions.col
    val params = Gen.Parameters.default
    val rnd = new scala.util.Random(7L)
    (0 until 20).foreach { i =>
      val routes = routeTable.pureApply(params, Seed(1000L + i), retries = 1000)
      val fields = routes.flatMap(_.matchers.keys).distinct
      if (fields.nonEmpty) {
        // records drawn from matcher values ∪ noise so some hit, some miss
        val records = (0 until 30).map { _ =>
          fields.map { f =>
            val pool = routes.flatMap(_.matchers.get(f)).flatten :+ "zz-miss"
            f -> pool(rnd.nextInt(pool.size))
          }.toMap
        }
        def interpret(rec: Map[String, String]): String =
          routes.find(_.matchers.forall { case (f, vs) => vs.contains(rec(f)) })
            .map(_.name).getOrElse("fallback")
        import spark.implicits._
        val df = records.map(r => fields.map(r)).toDF("v")
          .select(fields.zipWithIndex.map { case (f, j) =>
            col("v").getItem(j).as(f) }: _*)
        val got = df.withColumn("route",
            Routing.column(routes, default = "fallback"))
          .select("route").collect().map(_.getString(0)).toSeq
        val want = records.map(interpret)
        assert(got == want, s"table seed ${1000 + i}: demux disagreement")
      }
    }
  }

  test("parseKvConfig round-trips any renderable route table (200 seeded samples)") {
    val params = Gen.Parameters.default
    (0 until 200).foreach { i =>
      val routes = routeTable.pureApply(params, Seed(i.toLong), retries = 1000)
      val parsed = Routing.parseKvConfig(render(routes))
      assert(parsed.map(_.name) == routes.map(_.name), s"seed $i: route order")
      parsed.zip(routes).foreach { case (p, r) =>
        assert(p.matchers == r.matchers, s"seed $i: matchers for ${r.name}")
        assert(p.output == r.output, s"seed $i: output for ${r.name}")
      }
    }
  }
}
