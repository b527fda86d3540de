package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.StringType
import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.CdcBoundaries

/** Property-based invariants of the content-defined chunking boundary
  * expression: boundaries tile the document, and — the property that makes
  * CDC useful — every interior boundary survives an arbitrary prefix edit,
  * shifted by the edit length (the window never spans the edit).
  */
object CdcProperties extends Properties("CdcBoundaries") {

  private val W = 16
  private val DIV = 64

  private def boundaries(s: String): Seq[Int] =
    CdcBoundaries(Literal.create(s, StringType), W, DIV)
      .eval(null).asInstanceOf[ArrayData].toIntArray().toSeq

  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 600).flatMap(n =>
      Gen.listOfN(n, Gen.choose(32.toChar, 126.toChar)).map(_.mkString))

  property("boundaries strictly increase and end exactly at the text length") =
    Prop.forAll(asciiText) { s =>
      val bs = boundaries(s)
      if (s.isEmpty) bs.isEmpty
      else bs.nonEmpty && bs.last == s.length &&
        bs.zip(bs.tail).forall { case (a, b) => a < b } && bs.head >= 1
    }

  property("chunks tile the document with no gaps or overlaps") =
    Prop.forAll(asciiText) { s =>
      val bs = boundaries(s)
      val lens = (0 +: bs).zip(bs).map { case (a, b) => b - a }
      lens.sum == s.length && lens.forall(_ > 0)
    }

  property("interior boundaries survive a prefix edit, shifted by its length") =
    Prop.forAll(asciiText.suchThat(_.length > W), Gen.alphaStr.map(_.take(10))) {
      (s, prefix) =>
        val shifted = boundaries(prefix + s).toSet
        // every interior boundary of s whose window lies fully inside s
        // must reappear in prefix+s at position + prefix.length
        boundaries(s).dropRight(1).filter(_ >= W)
          .forall(i => shifted.contains(i + prefix.length))
    }
}
