package graft.codec

import javax.crypto.Cipher
import javax.crypto.spec.SecretKeySpec
import org.scalatest.funsuite.AnyFunSuite

class Aes128Spec extends AnyFunSuite {

  private def jceEncrypt(key: Array[Byte], block: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/ECB/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"))
    c.doFinal(block)
  }

  private def jceDecrypt(key: Array[Byte], block: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/ECB/NoPadding")
    c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"))
    c.doFinal(block)
  }

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("FIPS-197 appendix C.1 vector") {
    val key = hex("000102030405060708090a0b0c0d0e0f")
    val pt = hex("00112233445566778899aabbccddeeff")
    val ct = hex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert(Aes128.encrypt(key, pt).sameElements(ct))
    assert(Aes128.decrypt(key, ct).sameElements(pt))
  }

  test("matches javax.crypto on random keys and blocks") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val key = Array.fill[Byte](16)(rnd.nextInt().toByte)
      val blk = Array.fill[Byte](16)(rnd.nextInt().toByte)
      assert(Aes128.encrypt(key, blk).sameElements(jceEncrypt(key, blk)))
      assert(Aes128.decrypt(key, blk).sameElements(jceDecrypt(key, blk)))
    }
  }

  test("decrypt inverts encrypt") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val key = Array.fill[Byte](16)(rnd.nextInt().toByte)
      val blk = Array.fill[Byte](16)(rnd.nextInt().toByte)
      assert(Aes128.decrypt(key, Aes128.encrypt(key, blk)).sameElements(blk))
    }
  }

  test("in-place encryptBlock with offsets, aliasing allowed") {
    val rnd = new scala.util.Random(13)
    val key = Array.fill[Byte](16)(rnd.nextInt().toByte)
    val w = Aes128.expandKey(key)
    val buf = Array.fill[Byte](48)(rnd.nextInt().toByte)
    val expect = jceEncrypt(key, java.util.Arrays.copyOfRange(buf, 16, 32))
    Aes128.encryptBlock(w, buf, 16, buf, 16)
    assert(java.util.Arrays.copyOfRange(buf, 16, 32).sameElements(expect))
  }
}
