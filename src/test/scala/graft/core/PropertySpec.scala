package graft.core

import java.time.LocalDateTime

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.streaming.FileNamePattern

/** Property tests for the variable expander and the filename-pattern
  * compiler (SURVEY §5 test plan: "no cycles, idempotent resolution" and
  * the streaming_load pattern compiler). Native ScalaCheck Properties —
  * sbt runs this framework alongside ScalaTest.
  */
object CoreProperties extends Properties("graft.core") {

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val literal: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '/', '.', '-', '_')))
      .map(_.mkString)

  // layered acyclic maps: each value may reference only earlier names
  private val acyclic: Gen[List[(String, String)]] =
    Gen.listOfN(6, ident).map(_.distinct).flatMap { names =>
      Gen.sequence[List[(String, String)], (String, String)](
        names.zipWithIndex.map { case (n, i) =>
          for {
            lit <- literal
            refs <- Gen.someOf(names.take(i))
          } yield n -> (lit + refs.map("$" + _).mkString(" "))
        })
    }

  property("resolve leaves no refs and is idempotent (acyclic)") =
    forAll(acyclic) { pairs =>
      val resolved = Variables(pairs: _*).resolve()
      val noRefs = resolved.underlying.values
        .forall(v => Variables.listVariables(v).isEmpty)
      noRefs && resolved.resolve().underlying == resolved.underlying
    }

  property("direct self-cycle raises ParameterError") =
    forAll(ident) { n =>
      Prop.throws(classOf[ParameterError])(Variables(n -> ("x$" + n)).resolve())
    }

  property("union precedence: right side wins") = {
    val pairsGen = Gen.listOfN(5, Gen.zip(ident, literal))
    forAll(pairsGen, pairsGen) { (a, b) =>
      val u = Variables(a: _*).union(Variables(b: _*)).underlying
      b.toMap.forall { case (k, v) => u(k) == v } &&
        a.toMap.forall { case (k, v) => b.toMap.contains(k) || u(k) == v }
    }
  }

  property("listVariables finds exactly the planted references") =
    forAll(Gen.listOfN(4, ident), literal) { (names, sep) =>
      val s = names.map("${" + _ + "}").mkString(" " + sep + " ")
      Variables.listVariables(s) == names
    }

  private val dateTimeGen: Gen[LocalDateTime] = for {
    y <- Gen.choose(2000, 2099)
    m <- Gen.choose(1, 12)
    d <- Gen.choose(1, 28)
    h <- Gen.choose(0, 23)
    mi <- Gen.choose(0, 59)
    s <- Gen.choose(0, 59)
  } yield LocalDateTime.of(y, m, d, h, mi, s)

  property("filename pattern matches its own rendering, rejects suffixed") = {
    val patGen = for {
      prefix <- ident
      seq <- Gen.choose(0L, 999999L)
    } yield (prefix, seq)
    forAll(patGen, dateTimeGen) { case ((prefix, seq), dt) =>
      val pat = s"$prefix-%Y%m%d-%H%M%S-%Q.json"
      val rendered = f"$prefix-${dt.getYear}%04d${dt.getMonthValue}%02d${dt.getDayOfMonth}%02d-${dt.getHour}%02d${dt.getMinute}%02d${dt.getSecond}%02d-$seq%d.json"
      val c = FileNamePattern.compile(pat)
      c.matches(rendered) && !c.matches(rendered + ".gz")
    }
  }

  property("expandPathTemplate substitutes every date directive") =
    forAll(dateTimeGen) { dt =>
      FileNamePattern.expandPathTemplate("done/%Y/%m/%d", dt) ==
        f"done/${dt.getYear}%04d/${dt.getMonthValue}%02d/${dt.getDayOfMonth}%02d"
    }
}
