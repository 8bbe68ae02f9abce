package graft.functions

/** FNV-1a 64-bit over raw bytes — the one shared implementation for every
  * fingerprint/checksum kernel (SimHash64 token hashing, multimodal payload
  * checksums, frame checksums). Bytes are masked to unsigned: XORing a
  * sign-extended byte would flip the high 56 bits and silently diverge from
  * the published algorithm. */
object Fnv {
  final val OffsetBasis = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  def hash64(bytes: Array[Byte]): Long = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }
}
