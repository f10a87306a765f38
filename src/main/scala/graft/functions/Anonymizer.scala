package graft.functions

import java.security.MessageDigest

/** A deterministic string anonymization function.
  *
  * Semantics contract mirrored from the reference engine
  * (simple-anonymizer/src/scala/simpleanonymizer/Anonymizer.scala:10-207):
  * deterministic (same input → same output), realistic-looking (list-based),
  * one-way (MD5-derived selection). All functions preserve null and empty
  * inputs unchanged.
  */
trait Anonymizer extends (String => String) with Serializable

object Anonymizer {

  /** Per-thread MessageDigest: stableHash runs once per SHINGLE in the
    * dedup kernels (millions of calls per partition), and
    * `MessageDigest.getInstance` allocates provider machinery every call.
    * `digest()` leaves the instance reset, so reuse is safe.
    */
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Stable non-negative hash of a string: first 4 bytes of the MD5 digest,
    * big-endian, masked positive. null/"" → 0.
    *
    * This EXACT derivation (MD5, not murmur/xxhash) is the determinism
    * contract — reference Anonymizer.scala:27-36. It is also reproduced in
    * the DuckDB oracle SQL (see [[graft.OracleGen.stableHashSql]]); the two
    * must never diverge.
    */
  def stableHash(input: String): Int = {
    if (input == null || input.isEmpty) return 0
    val bytes = md5.get().digest(input.getBytes("UTF-8"))
    val hash = ((bytes(0) & 0xff) << 24) |
      ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) |
      (bytes(3) & 0xff)
    hash & Int.MaxValue
  }

  /** Deterministic list element selection — reference Anonymizer.scala:39-43. */
  def selectByHash(input: String, list: IndexedSeq[String]): String =
    list(stableHash(input) % list.size)

  /** null/empty inputs flow through untransformed — reference Anonymizer.scala:66-67. */
  @inline private def preserveNullOrEmpty(input: String)(transform: String => String): String =
    if (input == null || input.isEmpty) input else transform(input)

  /** Selects from a fixed list using the stable hash of the input. */
  abstract class ListAnonymizer(list: IndexedSeq[String]) extends Anonymizer {
    override def apply(input: String): String =
      preserveNullOrEmpty(input)(selectByHash(_, list))
  }

  case object FirstName       extends ListAnonymizer(DataLists.firstNames)
  case object MaleFirstName   extends ListAnonymizer(DataLists.maleFirstNames)
  case object FemaleFirstName extends ListAnonymizer(DataLists.femaleFirstNames)
  case object LastName        extends ListAnonymizer(DataLists.lastNames)
  case object State           extends ListAnonymizer(DataLists.states)
  case object StateAbbr       extends ListAnonymizer(DataLists.stateAbbrs)
  case object Country         extends ListAnonymizer(DataLists.countries)

  /** first + " " + last, with the last name salted via `input + "_last"` —
    * reference Anonymizer.scala:84-91.
    */
  case object FullName extends Anonymizer {
    override def apply(input: String): String =
      preserveNullOrEmpty(input) { in =>
        val first = selectByHash(in, DataLists.firstNames)
        val last  = selectByHash(in + "_last", DataLists.lastNames)
        s"$first $last"
      }
  }

  /** Fixed safe-domain pool — reference Anonymizer.scala:95. Frozen order. */
  val emailDomains: IndexedSeq[String] =
    Vector("example.com", "test.com", "fake.org", "sample.net")

  /** lowercase first.last@domain with per-part salts — reference Anonymizer.scala:94-104. */
  case object Email extends Anonymizer {
    override def apply(input: String): String =
      preserveNullOrEmpty(input) { in =>
        val first  = selectByHash(in, DataLists.firstNames).toLowerCase
        val last   = selectByHash(in + "_last", DataLists.lastNames).toLowerCase
        val domain = emailDomains(stableHash(in + "_domain") % emailDomains.size)
        s"$first.$last@$domain"
      }
  }

  /** 10 digits from nibble rotations of one hash, "(XXX) XXX-XXXX" —
    * reference Anonymizer.scala:107-114 (bit-for-bit derivation).
    */
  case object PhoneNumber extends Anonymizer {
    override def apply(input: String): String =
      preserveNullOrEmpty(input) { in =>
        val hash   = stableHash(in)
        val digits = (0 until 10).map(i => ((hash >> (i % 30)) & 0xf) % 10)
        s"(${digits.take(3).mkString}) ${digits.slice(3, 6).mkString}-${digits.slice(6, 10).mkString}"
      }
  }

  /** "(hash%9999)+1 lastName-as-street streetSuffix" — reference Anonymizer.scala:117-126. */
  case object StreetAddress extends Anonymizer {
    override def apply(input: String): String =
      preserveNullOrEmpty(input) { in =>
        val hash   = stableHash(in)
        val number = (hash % 9999) + 1
        val street = selectByHash(in + "_street", DataLists.lastNames)
        val suffix = selectByHash(in + "_suffix", DataLists.streetSuffixes)
        s"$number $street $suffix"
      }
  }

  /** lastName + citySuffix, no separator — reference Anonymizer.scala:129-136. */
  case object City extends Anonymizer {
    override def apply(input: String): String =
      preserveNullOrEmpty(input) { in =>
        val name   = selectByHash(in, DataLists.lastNames)
        val suffix = selectByHash(in + "_suffix", DataLists.citySuffixes)
        s"$name$suffix"
      }
  }

  /** 5-digit zip in [10000, 99999] — reference Anonymizer.scala:139-145. */
  case object ZipCode extends Anonymizer {
    override def apply(input: String): String =
      preserveNullOrEmpty(input) { in =>
        val hash = stableHash(in)
        f"${(hash % 90000) + 10000}%05d"
      }
  }

  /** Full redaction preserving length — reference Anonymizer.scala:148-151. */
  case object Redact extends Anonymizer {
    override def apply(input: String): String =
      preserveNullOrEmpty(input)(in => "*" * in.length)
  }

  /** Keep first/last chars, star the middle; too-short → full redact —
    * reference Anonymizer.scala:154-165.
    */
  case class PartialRedact(showFirst: Int = 2, showLast: Int = 2) extends Anonymizer {
    override def apply(input: String): String =
      preserveNullOrEmpty(input) { in =>
        if (in.length <= showFirst + showLast) "*" * in.length
        else {
          val first  = in.take(showFirst)
          val last   = in.takeRight(showLast)
          val middle = "*" * (in.length - showFirst - showLast)
          s"$first$middle$last"
        }
      }
  }

  /** Lorem words cycled from a hash offset, space-joined, truncated to the
    * input's length — reference Anonymizer.scala:168-207. Equivalent closed
    * form (used by the SQL oracle): join the first `len` words
    * `lorem[(hash+j) % 19]` with spaces and take the first `len` chars —
    * appending extra words past the target then truncating yields the same
    * prefix as the reference's stop-when-long-enough loop.
    */
  case object LoremText extends Anonymizer {
    override def apply(input: String): String =
      preserveNullOrEmpty(input) { in =>
        val targetLength = in.length
        val hash         = stableHash(in)
        val result       = new StringBuilder()
        var wordIndex    = hash
        while (result.length < targetLength) {
          if (result.nonEmpty) result.append(" ")
          result.append(DataLists.loremWords(wordIndex % DataLists.loremWords.size))
          wordIndex += 1
        }
        result.toString.take(targetLength)
      }
  }
}
