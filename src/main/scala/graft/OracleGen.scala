package graft

import graft.functions.{Anonymizer, DataLists}

/** Generates DuckDB SQL text replicating the anonymizer semantics, for the
  * correctness oracle (`SparkEntry.oracleSql`).
  *
  * The reference's determinism contract is `stableHash` = first 4 bytes of
  * the MD5 digest, big-endian, masked positive (reference Anonymizer.scala:
  * 27-36; our [[Anonymizer.stableHash]]). DuckDB's `md5_number_upper` returns
  * the first 8 digest bytes as a LITTLE-endian UBIGINT, so the oracle
  * byte-swaps the low 4 bytes to recover the big-endian value. Formula
  * validated cell-by-cell against the JVM implementation.
  */
object OracleGen {

  /** stableHash(e) as a DuckDB expression. `e` must be a VARCHAR expression. */
  def hashSql(e: String): String = {
    val h = s"(md5_number_upper($e) % 4294967296)"
    s"(CASE WHEN $e IS NULL OR $e = '' THEN 0 ELSE " +
      s"((($h%256)*16777216 + (($h//256)%256)*65536 + (($h//65536)%256)*256 + ($h//16777216)%256) % 2147483648) END)"
  }

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** A DuckDB list literal for a frozen word list. */
  def listSql(list: Seq[String]): String = list.map(sqlStr).mkString("[", ",", "]")

  /** selectByHash(e, list) as a DuckDB expression. */
  def selectSql(e: String, list: Seq[String]): String =
    s"(${listSql(list)})[(1 + ${hashSql(e)} % ${list.size})::BIGINT]"

  private def salted(e: String, suffix: String): String = s"($e || '$suffix')"

  /** Wrap `body(e)` with the null/empty passthrough every anonymizer has. */
  private def preserve(e: String)(body: String): String =
    s"(CASE WHEN $e IS NULL OR $e = '' THEN $e ELSE $body END)"

  def firstName(e: String): String       = preserve(e)(selectSql(e, DataLists.firstNames))
  def maleFirstName(e: String): String   = preserve(e)(selectSql(e, DataLists.maleFirstNames))
  def femaleFirstName(e: String): String = preserve(e)(selectSql(e, DataLists.femaleFirstNames))
  def lastName(e: String): String        = preserve(e)(selectSql(e, DataLists.lastNames))
  def state(e: String): String           = preserve(e)(selectSql(e, DataLists.states))
  def stateAbbr(e: String): String       = preserve(e)(selectSql(e, DataLists.stateAbbrs))
  def country(e: String): String         = preserve(e)(selectSql(e, DataLists.countries))

  def fullName(e: String): String =
    preserve(e)(s"(${selectSql(e, DataLists.firstNames)} || ' ' || ${selectSql(salted(e, "_last"), DataLists.lastNames)})")

  def email(e: String): String =
    preserve(e)(
      s"(lower(${selectSql(e, DataLists.firstNames)}) || '.' || " +
        s"lower(${selectSql(salted(e, "_last"), DataLists.lastNames)}) || '@' || " +
        s"(${listSql(Anonymizer.emailDomains)})[(1 + ${hashSql(salted(e, "_domain"))} % ${Anonymizer.emailDomains.size})::BIGINT])"
    )

  def phoneNumber(e: String): String = {
    val h = hashSql(e)
    def digit(i: Int) = s"((($h // ${1L << i}) % 16) % 10)"
    preserve(e)(
      "('(' || " + (0 to 2).map(digit).mkString(" || ") +
        " || ') ' || " + (3 to 5).map(digit).mkString(" || ") +
        " || '-' || " + (6 to 9).map(digit).mkString(" || ") + ")"
    )
  }

  def streetAddress(e: String): String = {
    val h = hashSql(e)
    preserve(e)(
      s"((($h % 9999) + 1) || ' ' || ${selectSql(salted(e, "_street"), DataLists.lastNames)} || ' ' || " +
        s"${selectSql(salted(e, "_suffix"), DataLists.streetSuffixes)})"
    )
  }

  def city(e: String): String =
    preserve(e)(s"(${selectSql(e, DataLists.lastNames)} || ${selectSql(salted(e, "_suffix"), DataLists.citySuffixes)})")

  def zipCode(e: String): String =
    preserve(e)(s"((${hashSql(e)} % 90000) + 10000)::VARCHAR")

  def redact(e: String): String = preserve(e)(s"repeat('*', length($e))")

  def partialRedact(e: String, showFirst: Int = 2, showLast: Int = 2): String =
    preserve(e)(
      s"(CASE WHEN length($e) <= ${showFirst + showLast} THEN repeat('*', length($e)) " +
        s"ELSE substr($e, 1, $showFirst) || repeat('*', length($e) - ${showFirst + showLast}) || " +
        s"substr($e, length($e) - ${showLast - 1}, $showLast) END)"
    )

  /** LoremText closed form: join `length(e)` words `lorem[(hash+j) % 19]`
    * with spaces, truncate to `length(e)` — equivalent to the reference's
    * stop-when-long-enough loop (see Anonymizer.LoremText scaladoc).
    */
  def loremText(e: String): String = {
    val h = hashSql(e)
    preserve(e)(
      s"substr(array_to_string(list_transform(range(0, length($e)::BIGINT), j -> " +
        s"(${listSql(DataLists.loremWords)})[(1 + ($h + j) % ${DataLists.loremWords.size})::BIGINT]), ' '), 1, length($e))"
    )
  }

  // -------------------------------------------------------------------
  // Pipeline-operator building blocks (dedup / similarity / text).
  // -------------------------------------------------------------------

  /** Whitespace tokens, empties dropped — mirror of operators.Dedup.tokens. */
  def tokensSql(e: String): String =
    s"list_filter(regexp_split_to_array($e, '\\s+'), x -> x <> '')"

  /** Distinct char n-gram list — mirror of operators.Dedup.shingles
    * (including the whole-text fallback for short strings).
    */
  def shinglesSql(e: String, n: Int): String =
    s"list_distinct([substr($e, i, $n) for i in range(1, greatest(length($e) - ${n - 1}, 1) + 1)])"

  /** Sequential-fold dot product of two DOUBLE[] expressions — mirrors the
    * index-order `aggregate` fold in operators.Similarity.cosine (DuckDB
    * list_reduce is a left fold, and `0.0 + x == x` makes the init
    * difference vanish).
    */
  private def dotSql(a: String, b: String): String =
    s"list_reduce([$a[i] * $b[i] for i in range(1, len($a) + 1)], (x, y) -> x + y)"

  /** Cosine similarity of two DOUBLE[] expressions. */
  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / sqrt(${dotSql(a, a)} * ${dotSql(b, b)}))"

  /** Stopword-profile language-ID — mirror of operators.TextAnalysis
    * .languageId (same profiles, same argmax precedence).
    */
  def langIdSql(e: String): String = {
    val profiles = graft.operators.TextAnalysis.langProfiles
    val padded   = s"(' ' || $e || ' ')"
    def cnt(w: String) = s"((length($padded) - length(replace($padded, '$w', ''))) / ${w.length})"
    val scores = profiles.map { case (lang, words) => lang -> words.map(cnt).mkString("(", " + ", ")") }
    val cases = scores.init.map { case (lang, sc) =>
      val beats = scores.filter(_._1 != lang).map(_._2).map(o => s"$sc >= $o").mkString(" AND ")
      s"WHEN $beats THEN '$lang'"
    }
    s"(CASE ${cases.mkString(" ")} ELSE '${scores.last._1}' END)"
  }
}
