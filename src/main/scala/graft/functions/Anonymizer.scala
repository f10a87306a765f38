package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

/** One deterministic string→string scrubbing function.
  *
  * Behavioral contract (mirrored from the reference engine,
  * simple-anonymizer/src/scala/simpleanonymizer/Anonymizer.scala:10-207):
  * equal inputs always map to equal outputs, outputs look like plausible
  * data (drawn from frozen word lists), and the mapping is one-way because
  * selection is keyed on an MD5 digest of the input. Every function passes
  * null and "" through untouched.
  */
trait Anonymizer extends (String => String) with Serializable

object Anonymizer {

  // ---------------------------------------------------------------------
  // Hash core. This is THE determinism contract: the DuckDB oracle SQL
  // replays the identical derivation (see graft.OracleGen.stableHashSql),
  // and all fourteen scrubbers below key off it. MD5 specifically —
  // swapping in murmur/xxhash would silently break oracle parity.
  // ---------------------------------------------------------------------

  /** Thread-pinned digest instance. The dedup kernels call [[stableHash]]
    * once per shingle — millions of times per partition — and
    * `MessageDigest.getInstance` builds provider plumbing on every call,
    * so each executor thread keeps one instance (`digest()` resets it,
    * making reuse sound).
    */
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Stable non-negative int for a string: the digest's leading 4 bytes
    * read big-endian, sign bit cleared. null and "" map to 0. Reference
    * derivation: Anonymizer.scala:27-36.
    */
  def stableHash(input: String): Int =
    if (input == null || input.isEmpty) 0
    else {
      val digest = md5.get().digest(input.getBytes("UTF-8"))
      ByteBuffer.wrap(digest, 0, 4).getInt & Int.MaxValue
    }

  /** Hash-keyed pick from a frozen list (reference Anonymizer.scala:39-43). */
  def selectByHash(input: String, list: IndexedSeq[String]): String =
    list(stableHash(input) % list.size)

  /** Derived-key convention for multi-part outputs: part salts ("_last",
    * "_domain", "_street", ...) are appended to the input before hashing so
    * each part varies independently yet stays deterministic.
    */
  @inline private def salted(input: String, salt: String): Int = stableHash(input + salt)

  /** Wrap a transform with the null/"" passthrough every scrubber shares. */
  private def scrubber(transform: String => String): Anonymizer =
    new Anonymizer {
      override def apply(input: String): String =
        if (input == null || input.isEmpty) input else transform(input)
    }

  // ---------------------------------------------------------------------
  // Redaction family — shape-preserving, no word lists.
  // ---------------------------------------------------------------------

  /** Same-length star string (reference Anonymizer.scala:148-151). */
  val Redact: Anonymizer = scrubber(in => "*" * in.length)

  /** Stars the middle, keeps `showFirst`/`showLast` edge chars; inputs no
    * longer than the kept edges redact fully (reference
    * Anonymizer.scala:154-165).
    */
  case class PartialRedact(showFirst: Int = 2, showLast: Int = 2) extends Anonymizer {
    override def apply(input: String): String = {
      if (input == null || input.isEmpty) return input
      val n = input.length
      if (n <= showFirst + showLast) "*" * n
      else input.substring(0, showFirst) + ("*" * (n - showFirst - showLast)) + input.substring(n - showLast)
    }
  }

  /** Length-preserving lorem filler: words cycle from a hash-chosen offset,
    * space-joined, and the result is cut to the input's exact length
    * (reference Anonymizer.scala:168-207). The SQL oracle uses the closed
    * form — join `len` words `lorem[(hash+j) % 19]` then take `len` chars —
    * which produces the same prefix as this stop-when-long-enough loop.
    */
  val LoremText: Anonymizer = scrubber { in =>
    val want = in.length
    val out  = new StringBuilder(want + 16)
    var idx  = stableHash(in)
    while (out.length < want) {
      if (out.nonEmpty) out.append(' ')
      out.append(DataLists.loremWords(idx % DataLists.loremWords.size))
      idx += 1
    }
    out.substring(0, want)
  }

  // ---------------------------------------------------------------------
  // List-backed family — one hash, one lookup.
  // ---------------------------------------------------------------------

  private def fromList(list: IndexedSeq[String]): Anonymizer =
    scrubber(selectByHash(_, list))

  val FirstName: Anonymizer       = fromList(DataLists.firstNames)
  val MaleFirstName: Anonymizer   = fromList(DataLists.maleFirstNames)
  val FemaleFirstName: Anonymizer = fromList(DataLists.femaleFirstNames)
  val LastName: Anonymizer        = fromList(DataLists.lastNames)
  val State: Anonymizer           = fromList(DataLists.states)
  val StateAbbr: Anonymizer       = fromList(DataLists.stateAbbrs)
  val Country: Anonymizer         = fromList(DataLists.countries)

  // ---------------------------------------------------------------------
  // Composite family — several salted selections assembled into one value.
  // ---------------------------------------------------------------------

  /** "First Last", the surname keyed on the "_last" salt (reference
    * Anonymizer.scala:84-91).
    */
  val FullName: Anonymizer = scrubber { in =>
    selectByHash(in, DataLists.firstNames) + " " + selectByHash(in + "_last", DataLists.lastNames)
  }

  /** Safe output domains, order frozen (reference Anonymizer.scala:95). */
  val emailDomains: IndexedSeq[String] =
    Vector("example.com", "test.com", "fake.org", "sample.net")

  /** lowercase "first.last@domain"; name parts and domain each carry their
    * own salt (reference Anonymizer.scala:94-104).
    */
  val Email: Anonymizer = scrubber { in =>
    val user = selectByHash(in, DataLists.firstNames).toLowerCase +
      "." + selectByHash(in + "_last", DataLists.lastNames).toLowerCase
    user + "@" + emailDomains(salted(in, "_domain") % emailDomains.size)
  }

  /** "(AAA) BBB-CCCC" where digit i is `((hash >> (i % 30)) & 0xf) % 10` —
    * ten digits milled from one hash's nibble rotations, bit-for-bit the
    * reference derivation (Anonymizer.scala:107-114).
    */
  val PhoneNumber: Anonymizer = scrubber { in =>
    val hash = stableHash(in)
    val out  = new StringBuilder(14)
    var i    = 0
    while (i < 10) {
      out.append((((hash >> (i % 30)) & 0xf) % 10).toString.charAt(0))
      i += 1
      if (i == 3) out.insert(0, '(').append(") ")
      else if (i == 6) out.append('-')
    }
    out.toString
  }

  /** "N Surname Suffix" with N in [1, 9999] (reference
    * Anonymizer.scala:117-126).
    */
  val StreetAddress: Anonymizer = scrubber { in =>
    val number = (stableHash(in) % 9999) + 1
    number.toString + " " + selectByHash(in + "_street", DataLists.lastNames) +
      " " + selectByHash(in + "_suffix", DataLists.streetSuffixes)
  }

  /** Surname glued directly to a city suffix (reference
    * Anonymizer.scala:129-136).
    */
  val City: Anonymizer = scrubber { in =>
    selectByHash(in, DataLists.lastNames) + selectByHash(in + "_suffix", DataLists.citySuffixes)
  }

  /** Five digits in [10000, 99999] (reference Anonymizer.scala:139-145). */
  val ZipCode: Anonymizer = scrubber { in =>
    f"${(stableHash(in) % 90000) + 10000}%05d"
  }
}
