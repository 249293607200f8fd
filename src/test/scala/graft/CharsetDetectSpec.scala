package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CharsetDetect

/** Charset detection: the strict UTF-8 validator (structure, overlong,
  * surrogate, ceiling), BOM handling incl. the lying-BOM fallback, the
  * published CP1252 high table, and roundtrip sanity. */
class CharsetDetectSpec extends AnyFunSuite {

  private def utf8(s: String) = s.getBytes("UTF-8")

  test("validator accepts every legal width and real multilingual text") {
    assert(CharsetDetect.validUtf8(utf8("plain ascii")))
    assert(CharsetDetect.validUtf8(utf8("café € 😀 中文 русский")))
    assert(CharsetDetect.validUtf8(Array.empty[Byte]))
  }

  test("validator rejects the attack shapes: overlong, surrogate, ceiling, structure") {
    // overlong NUL (C0 80) and overlong '/' (C0 AF) — classic smuggles
    assert(!CharsetDetect.validUtf8(Array(0xC0, 0x80).map(_.toByte)))
    assert(!CharsetDetect.validUtf8(Array(0xC0, 0xAF).map(_.toByte)))
    // overlong 3-byte (E0 80 80) and 4-byte (F0 80 80 80)
    assert(!CharsetDetect.validUtf8(Array(0xE0, 0x80, 0x80).map(_.toByte)))
    assert(!CharsetDetect.validUtf8(Array(0xF0, 0x80, 0x80, 0x80).map(_.toByte)))
    // CESU-style surrogate (ED A0 80 = U+D800)
    assert(!CharsetDetect.validUtf8(Array(0xED, 0xA0, 0x80).map(_.toByte)))
    // above U+10FFFF (F4 90 80 80) and the F5 lead
    assert(!CharsetDetect.validUtf8(Array(0xF4, 0x90, 0x80, 0x80).map(_.toByte)))
    assert(!CharsetDetect.validUtf8(Array(0xF5, 0x80, 0x80, 0x80).map(_.toByte)))
    // bare continuation, truncated sequence
    assert(!CharsetDetect.validUtf8(Array(0x93).map(_.toByte)))
    assert(!CharsetDetect.validUtf8(utf8("café").dropRight(1)))
  }

  test("decode: utf-8, BOM stripped, lying BOM falls back whole") {
    assert(CharsetDetect.decode(utf8("café")) == (("café", "utf-8")))
    val bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte)
    assert(CharsetDetect.decode(bom ++ utf8("bom text")) == (("bom text", "utf-8-bom")))
    // a BOM followed by invalid bytes was never a BOM: cp1252 the WHOLE
    val lying = bom ++ Array(0x93.toByte)
    val (t, cs) = CharsetDetect.decode(lying)
    assert(cs == "windows-1252" && t == "ï»¿“")
  }

  test("cp1252 fallback: published high table, C1 gaps, latin-1 identity") {
    val (t, cs) = CharsetDetect.decode(
      "he said ".getBytes("US-ASCII") ++
        Array(0x93.toByte) ++ "ok".getBytes("US-ASCII") ++ Array(0x94.toByte) ++
        Array(0x85.toByte, 0x80.toByte, 0xE9.toByte))
    assert(cs == "windows-1252")
    assert(t == "he said “ok”…€é")
    // the five unmapped bytes decode to their C1 controls (whatwg)
    val (g, _) = CharsetDetect.decode(Array(0x81, 0x8D, 0x8F, 0x90, 0x9D).map(_.toByte))
    assert(g == "")
    // full high-table width sanity
    assert(CharsetDetect.Cp1252High.length == 32)
    assert(CharsetDetect.Cp1252High(0x99 - 0x80) == 0x2122) // ™
  }
}
