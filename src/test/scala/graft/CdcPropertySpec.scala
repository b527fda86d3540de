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

  // Code-point alphabet spanning every UTF-8 width: ASCII, 2-byte Latin,
  // 3-byte CJK, 4-byte supplementary (emoji). Positions are code points, so
  // properties measure in codePointCount, never String.length.
  private val cpAlphabet: Seq[Int] =
    (32 to 126).map(_.toInt) ++ Seq(0xE4, 0xF6, 0xFC, 0xDF, 0x6F22, 0x5B57, 0x1F389)

  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  private val unicodeText: Gen[String] =
    Gen.chooseNum(0, 600).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(cpAlphabet)).map { cps =>
        val sb = new java.lang.StringBuilder
        cps.foreach(sb.appendCodePoint)
        sb.toString
      })

  property("boundaries strictly increase and end exactly at the code-point length") =
    Prop.forAll(unicodeText) { s =>
      val bs = boundaries(s)
      if (s.isEmpty) bs.isEmpty
      else bs.nonEmpty && bs.last == cpLen(s) &&
        bs.zip(bs.tail).forall { case (a, b) => a < b } && bs.head >= 1
    }

  property("chunks tile the document with no gaps or overlaps") =
    Prop.forAll(unicodeText) { s =>
      val bs = boundaries(s)
      val lens = (0 +: bs).zip(bs).map { case (a, b) => b - a }
      lens.sum == cpLen(s) && lens.forall(_ > 0)
    }

  property("interior boundaries survive a prefix edit, shifted by its length") =
    Prop.forAll(unicodeText.suchThat(cpLen(_) > W), Gen.alphaStr.map(_.take(10))) {
      (s, prefix) =>
        val shifted = boundaries(prefix + s).toSet
        // every interior boundary of s whose window lies fully inside s
        // must reappear in prefix+s at position + prefix.length (ASCII
        // prefix: code-point length == prefix.length)
        boundaries(s).dropRight(1).filter(_ >= W)
          .forall(i => shifted.contains(i + prefix.length))
    }
}
