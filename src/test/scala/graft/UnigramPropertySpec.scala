package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.UnigramSegment

/** Property-based invariants of the unigram Viterbi segmentation kernel:
  * the pieces tile the word exactly, every emitted piece is either in the
  * vocabulary or an out-of-vocabulary single char, and — the optimality
  * property the DP exists for — the chosen path's probability product
  * equals the brute-force maximum over ALL segmentations (products
  * multiplied left-to-right along the path, the kernel's own order, so
  * doubles compare exactly).
  */
object UnigramProperties extends Properties("UnigramSegment") {

  private val maxLen = 4

  private def seg(word: String, pieces: Seq[String], probs: Seq[Double]): Seq[String] = {
    val e = UnigramSegment(
      Literal.create(word, StringType),
      Literal.create(new GenericArrayData(pieces.map(UTF8String.fromString).toArray),
        ArrayType(StringType, containsNull = false)),
      Literal.create(new GenericArrayData(probs.toArray),
        ArrayType(DoubleType, containsNull = false)),
      maxLen)
    val arr = e.eval(null).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  /** all segmentations of `word` into vocab pieces (OOV chars as
    * themselves), as left-to-right probability products
    */
  private def bruteBest(word: String, pm: Map[String, Double]): Option[Double] = {
    def rec(i: Int, acc: Double): Seq[Double] =
      if (i == word.length) Seq(acc)
      else (1 to maxLen).flatMap { l =>
        if (i + l > word.length) Nil
        else {
          val piece = word.substring(i, i + l)
          pm.get(piece) match {
            case Some(p) => rec(i + l, acc * p)
            case None if l == 1 => rec(i + 1, acc * 0.0) // OOV char fallback
            case None => Nil
          }
        }
      }
    val all = rec(0, 1.0)
    if (all.isEmpty) None else Some(all.max)
  }

  private val wordGen: Gen[String] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  private val vocabGen: Gen[(Seq[String], Seq[Double])] = for {
    nMulti <- Gen.choose(0, 6)
    multis <- Gen.listOfN(nMulti,
      Gen.choose(2, 4).flatMap(l => Gen.listOfN(l, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    // chars 'a','b' always present; 'c' sometimes OOV
    withC <- Gen.oneOf(true, false)
    chars = if (withC) Seq("a", "b", "c") else Seq("a", "b")
    all = (chars ++ multis.distinct.filterNot(chars.contains)).distinct
    weights <- Gen.listOfN(all.size, Gen.choose(1, 16))
  } yield {
    val total = weights.sum.toDouble
    (all, weights.map(_ / total))
  }

  property("pieces tile the word exactly") = forAll(wordGen, vocabGen) {
    case (w, (ps, qs)) => seg(w, ps, qs).mkString == w
  }

  property("every piece is in-vocab or an OOV single char") =
    forAll(wordGen, vocabGen) { case (w, (ps, qs)) =>
      val vocab = ps.toSet
      seg(w, ps, qs).forall(p => vocab.contains(p) || p.length == 1)
    }

  property("path probability equals the brute-force maximum") =
    forAll(wordGen, vocabGen) { case (w, (ps, qs)) =>
      val pm = ps.zip(qs).toMap
      val pieces = seg(w, ps, qs)
      val kernelProd = pieces.foldLeft(1.0)((acc, p) => acc * pm.getOrElse(p, 0.0))
      bruteBest(w, pm) match {
        case None => pieces.isEmpty == w.isEmpty // unreachable with char fallback
        case Some(best) => kernelProd == best
      }
    }
}
