package graft.functions

/** Shared MurmurHash3 x64_128 building blocks. Two variants build on
  * these: [[CassandraMurmur3]] (Cassandra's sign-extended tail +
  * MIN_VALUE pin) and [[Sketches.murmur128]] (standard zero-extended
  * tail) — the deliberate difference between them lives entirely in
  * their tail handling, not in this shared mixing core.
  */
private[functions] object Murmur3Core {
  final val C1 = 0x87c37b91114253d5L
  final val C2 = 0x4cf5ad432745937fL

  @inline def rotl64(v: Long, n: Int): Long = (v << n) | (v >>> (64 - n))

  @inline def fmix(kIn: Long): Long = {
    var k = kIn
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** Little-endian 64-bit block at byte offset `bo`. */
  @inline def getblock(key: Array[Byte], bo: Int): Long =
    ((key(bo + 0) & 0xffL)) |
      ((key(bo + 1) & 0xffL) << 8) |
      ((key(bo + 2) & 0xffL) << 16) |
      ((key(bo + 3) & 0xffL) << 24) |
      ((key(bo + 4) & 0xffL) << 32) |
      ((key(bo + 5) & 0xffL) << 40) |
      ((key(bo + 6) & 0xffL) << 48) |
      ((key(bo + 7) & 0xffL) << 56)
}
