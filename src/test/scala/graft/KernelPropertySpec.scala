package graft

import graft.functions.CorpusKernels
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-based invariants for the similarity kernels — the algebra the
  * banded/bucketed joins rely on for distributed correctness. Seeded
  * generators (no scalacheck bridge in the offline cache) — 200 cases per
  * property, reproducible.
  */
class KernelPropertySpec extends AnyFunSuite {

  private val words = Array("key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "part", "hash", "join", "data")

  private def cases[T](seed: Int, n: Int = 200)(gen: Random => T): Seq[T] = {
    val r = new Random(seed)
    Seq.fill(n)(gen(r))
  }

  private def text(r: Random): String =
    Seq.fill(6 + r.nextInt(55))(words(r.nextInt(words.length))).mkString(" ")

  private def vec(r: Random, dim: Int): Array[Float] =
    Array.fill(dim)((r.nextInt(201) - 100) / 10.0f)

  test("jaccard on shingle sets: bounded, symmetric, 1.0 on self") {
    cases(1) { r => (text(r), text(r)) }.foreach { case (a, b) =>
      val j = CorpusKernels.jaccardShingles(a, b, 5)
      assert(j >= 0.0 && j <= 1.0)
      assert(j == CorpusKernels.jaccardShingles(b, a, 5))
      assert(CorpusKernels.jaccardShingles(a, a, 5) == 1.0)
    }
  }

  test("jaccardSortedArrays agrees with a set-based reference") {
    cases(2) { r => (text(r), text(r)) }.foreach { case (a, b) =>
      val sa = CorpusKernels.sortedShingles(a, 5)
      val sb = CorpusKernels.sortedShingles(b, 5)
      val inter = sa.toSet.intersect(sb.toSet).size
      val union = sa.toSet.union(sb.toSet).size
      val want = if (union == 0) 0.0 else inter.toDouble / union
      assert(CorpusKernels.jaccardSortedArrays(sa, sb) == want)
    }
  }

  test("minhash signature agreement estimates jaccard within 4 sigma") {
    cases(3) { r => (text(r), text(r)) }.foreach { case (a, b) =>
      val n = 128
      val est = CorpusKernels.sigAgreement(
        CorpusKernels.minHashSignature(a, 5, n),
        CorpusKernels.minHashSignature(b, 5, n))
      val j = CorpusKernels.jaccardShingles(a, b, 5)
      val sigma = math.sqrt(math.max(j * (1 - j), 0.25 / n) / n)
      assert(math.abs(est - j) <= 4 * sigma + 1e-9,
        s"est=$est j=$j sigma=$sigma a='$a' b='$b'")
    }
  }

  test("simhash near-duplicates stay within small hamming distance") {
    cases(4) { r => text(r) }.foreach { a =>
      // deterministic
      assert(CorpusKernels.simHash(a) == CorpusKernels.simHash(a))
      // appending one word to a long text moves few bits
      val b = a + " " + words(a.length % words.length)
      val ham = java.lang.Long.bitCount(
        CorpusKernels.simHash(a) ^ CorpusKernels.simHash(b))
      assert(ham <= 24, s"hamming $ham too large for near-identical text")
    }
  }

  test("cosine: bounded, symmetric, self-similarity 1 for nonzero vectors") {
    cases(5) { r => (vec(r, 16), vec(r, 16)) }.foreach { case (a, b) =>
      val c = CorpusKernels.cosine(a, b)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(c == CorpusKernels.cosine(b, a))
      if (a.exists(_ != 0.0f))
        assert(math.abs(CorpusKernels.cosine(a, a) - 1.0) < 1e-6)
    }
  }

  test("hyperplane signature is deterministic and scale-invariant") {
    cases(6) { r => vec(r, 16) }.foreach { v =>
      val s = CorpusKernels.hyperplaneSig(v, 16)
      assert(s == CorpusKernels.hyperplaneSig(v, 16))
      // cosine-LSH property: positive scaling never changes the signature
      val scaled = v.map(_ * 3.0f)
      assert(CorpusKernels.hyperplaneSig(scaled, 16) == s)
    }
  }

  test("winnowPositions: valid 1-based starts, increasing, window-dense") {
    cases(7) { r => (text(r), 4 + r.nextInt(8), 2 + r.nextInt(6)) }
      .foreach { case (t, k, w) =>
        val ps = CorpusKernels.winnowPositions(t, k, w)
        if (t.length < k) assert(ps.isEmpty)
        else {
          assert(ps.nonEmpty)
          assert(ps.head >= 1 && ps.last <= t.length - k + 1)
          ps.sliding(2).foreach {
            case Array(a, b) =>
              assert(b > a, "positions must be strictly increasing")
              // the density guarantee the island merge in
              // Dedup.duplicateSpanRanges relies on: every window of w
              // consecutive gram starts contains a selected position
              assert(b - a <= w, s"gap ${b - a} > window $w (k=$k)")
            case _ => ()
          }
          // selected positions agree with the fingerprint form
          assert(ps.map(p => scala.util.hashing.MurmurHash3.stringHash(
            t.substring(p.toInt - 1, p.toInt - 1 + k), 0x9747b28c)).toSeq
            == CorpusKernels.winnow(t, k, w).toSeq)
        }
      }
  }

  test("winnowing self-synchronizes: shared spans >= k+w-1 share a selected gram") {
    // the guarantee Dedup.duplicateSpans(window=Some(w)) is built on: any
    // substring duplicated at length >= k+w-1 selects at least one common
    // gram CONTENT in every copy, wherever it is embedded
    val k = 8; val w = 4
    cases(8, n = 100) { r =>
      val shared = Seq.fill(3 + r.nextInt(4))(words(r.nextInt(words.length)))
        .mkString(" ").padTo(k + w - 1, 'x').mkString
      (text(r) + " " + shared + " " + text(r),
        text(r) + " " + shared + " " + text(r), shared)
    }.foreach { case (a, b, shared) =>
      def selectedGrams(t: String) =
        CorpusKernels.winnowPositions(t, k, w)
          .map(p => t.substring(p.toInt - 1, p.toInt - 1 + k)).toSet
      // the duplicated region both docs share includes the delimiting
      // spaces, so the guaranteed common gram may straddle them
      val dupRegion = " " + shared + " "
      val common = selectedGrams(a).intersect(selectedGrams(b))
        .filter(dupRegion.contains(_))
      assert(common.nonEmpty,
        s"no common selected gram inside shared span '$shared'")
    }
  }
}
