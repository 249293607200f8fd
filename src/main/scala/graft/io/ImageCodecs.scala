package graft.io

/** The image-format FRONT DOOR: real corpora arrive MIXED — web scrapes
  * carry PNG and JPEG side by side, archival drops add TIFF — and a
  * curation pipeline keyed on file extensions mis-routes the moment one
  * is wrong (they often are). Routing sniffs the MAGIC BYTES instead:
  * every format in the family self-identifies in its first bytes (PNG's
  * 8-byte signature, JPEG's SOI marker, TIFF's II / MM order mark), so
  * dispatch is O(1) per blob and needs no metadata column.
  *
  * [[decodeAny]] keeps the family's two-surface precision contract:
  * 8-bit streams return Left(Image), deep streams (16-bit PNG/TIFF,
  * 12-bit JPEG) return Right(Image16) — the caller decides what to do
  * with depth, the dispatcher never silently quantizes. */
object ImageCodecs {

  import PngCodec.{Image, Image16}

  /** "png" | "jpeg" | "tiff" | "unknown" — magic bytes only, O(1). */
  def sniff(bytes: Array[Byte]): String =
    if (bytes.length >= 8 &&
        (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
        bytes(3) == 'G') "png"
    else if (bytes.length >= 2 &&
        (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes.length >= 4 &&
        ((bytes(0) == 'I' && bytes(1) == 'I') ||
         (bytes(0) == 'M' && bytes(1) == 'M'))) "tiff"
    else "unknown"

  /** Route by magic; preserve precision. Left = 8-bit, Right = deep
    * (16-bit PNG/TIFF, 12-bit JPEG). Unknown magics refuse loudly. */
  def decodeAny(bytes: Array[Byte],
                maxPixels: Long = 1L << 24): Either[Image, Image16] =
    sniff(bytes) match {
      case "png" =>
        // cheap depth probe from IHDR (byte 24) picks the surface; the
        // full validation happens inside the routed decode
        if (bytes.length > 24 && (bytes(24) & 0xff) == 16)
          Right(PngCodec.decode16(bytes, maxPixels))
        else Left(PngCodec.decode(bytes, maxPixels))
      case "jpeg" =>
        // precision lives in the SOF segment — the marker-walk probe
        // reads it from segment lengths alone, so a 12-bit stream
        // entropy-decodes exactly once (no try-8-bit-first double work)
        if (JpegCodec.precisionProbe(bytes) == 12)
          Right(JpegCodec.decode12(bytes, maxPixels))
        else Left(JpegCodec.decode(bytes, maxPixels))
      case "tiff" =>
        // precision is the BitsPerSample tag — an IFD walk, no strip read
        if (TiffCodec.bitsProbe(bytes) == 16)
          Right(TiffCodec.decode16(bytes, maxPixels))
        else Left(TiffCodec.decode(bytes, maxPixels))
      case other => throw new IllegalArgumentException(
        s"not a decodable image (magic sniffed: $other)")
    }
}
