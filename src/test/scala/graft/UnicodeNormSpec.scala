package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.UnicodeNorm.nfkcClean

/** Unicode NFKC normalization: composition, compatibility folding, the
  * invisible-character strip set, idempotence. */
class UnicodeNormSpec extends AnyFunSuite {

  test("canonical composition: NFD accents compose") {
    assert(nfkcClean("café") == "café")
    assert(nfkcClean("résumé") == "résumé")
  }

  test("compatibility folding: ligature, fullwidth, superscript, NBSP") {
    assert(nfkcClean("ﬁne") == "fine")
    assert(nfkcClean("Ｘray") == "Xray")
    assert(nfkcClean("x²") == "x2")
    assert(nfkcClean("a b") == "a b")
  }

  test("invisible formatting characters strip") {
    assert(nfkcClean("zero​width") == "zerowidth")
    assert(nfkcClean("a‌‍b") == "ab")
    assert(nfkcClean("﻿bom") == "bom")
    assert(nfkcClean("soft­hyphen") == "softhyphen")
  }

  test("idempotence: normalizing twice is a no-op (NFKC is a projection)") {
    val samples = Seq("plain", "café ﬁne Ｘ x²",
      "mixed​­ tail", "ééé",
      "digits 012 punct .,;")
    samples.foreach { s =>
      val once = nfkcClean(s)
      assert(nfkcClean(once) == once, s"not idempotent on '$s'")
    }
  }

  test("astral codepoints survive (surrogate pairs are not mangled)") {
    val emoji = new String(Character.toChars(0x1F600))
    assert(nfkcClean(s"a${emoji}b") == s"a${emoji}b")
  }
}
