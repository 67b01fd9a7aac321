package graft.core

/** Dense HyperLogLog sketch (Flajolet, Fusy, Gandouet, Meunier 2007),
  * 64-bit-hash variant — no large-range correction needed.
  *
  * North-rule sibling sketch (SURVEY.md §7.4): same mergeable shape as the
  * SBBF — `add` is register max-update, `merge` is register-wise max
  * (commutative/associative/idempotent, so Spark partial aggregation is
  * exact), and the codec is a small versioned wire format.
  *
  * precision p in [4, 18]; m = 2^p registers; standard error = 1.04/sqrt(m)
  * (0.81% at the default p = 14). Small-range bias corrected with linear
  * counting below the standard 5m/2 threshold.
  */
final class Hll private[core] (val p: Int, val registers: Array[Byte])
    extends Serializable {

  def m: Int = 1 << p

  /** Update with a 64-bit key hash: register = top p bits, rank = number
    * of leading zeros of the remaining (64-p) bits + 1.
    */
  def addHash(hash: Long): Unit = {
    val idx = (hash >>> (64 - p)).toInt
    val rest = hash << p
    val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > registers(idx)) registers(idx) = rank.toByte
  }

  def merge(other: Hll): Hll = {
    require(p == other.p, s"Cannot merge HLL sketches with different precision ($p vs ${other.p})")
    var i = 0
    while (i < registers.length) {
      if (other.registers(i) > registers(i)) registers(i) = other.registers(i)
      i += 1
    }
    this
  }

  /** Cardinality estimate with small-range linear-counting correction. */
  def estimate: Long = {
    val mD = m.toDouble
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < registers.length) {
      sum += java.lang.Double.longBitsToDouble((1023L - registers(i)) << 52) // 2^-r
      if (registers(i) == 0) zeros += 1
      i += 1
    }
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / mD)
    }
    val raw = alpha * mD * mD / sum
    val corrected =
      if (raw <= 2.5 * mD && zeros > 0) mD * math.log(mD / zeros) // linear counting
      else raw
    math.round(corrected)
  }

  /** Standard error of the estimator: 1.04 / sqrt(m). */
  def relativeError: Double = 1.04 / math.sqrt(m.toDouble)

  def copy(): Hll = new Hll(p, registers.clone())

  override def equals(o: Any): Boolean = o match {
    case that: Hll => p == that.p && java.util.Arrays.equals(registers, that.registers)
    case _ => false
  }
  override def hashCode: Int = 31 * java.util.Arrays.hashCode(registers) + p

  /** Wire format: "GHLL" + version(1) + p(1) + m register bytes. */
  def toBytes: Array[Byte] = {
    val out = new Array[Byte](6 + registers.length)
    out(0) = 'G'; out(1) = 'H'; out(2) = 'L'; out(3) = 'L'
    out(4) = 1
    out(5) = p.toByte
    System.arraycopy(registers, 0, out, 6, registers.length)
    out
  }
}

object Hll {
  val DefaultP = 14

  def empty(p: Int = DefaultP): Hll = {
    require(p >= 4 && p <= 18, s"HLL precision must be in [4, 18], got $p")
    new Hll(p, new Array[Byte](1 << p))
  }

  def fromBytes(data: Array[Byte]): Hll = {
    def fail(msg: String) = throw new SbbfFormatException(msg)
    if (data.length < 6) fail("Invalid HLL data: too short for header")
    if (data(0) != 'G' || data(1) != 'H' || data(2) != 'L' || data(3) != 'L')
      fail("Invalid HLL data: wrong magic bytes")
    if (data(4) != 1) fail(s"Unsupported HLL version: ${data(4)}")
    val p = data(5).toInt
    if (p < 4 || p > 18) fail(s"Invalid HLL data: precision $p out of range")
    if (data.length != 6 + (1 << p))
      fail(s"Invalid HLL data: expected ${6 + (1 << p)} bytes, got ${data.length}")
    val regs = new Array[Byte](1 << p)
    System.arraycopy(data, 6, regs, 0, regs.length)
    new Hll(p, regs)
  }
}
