package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Spark-facing UDF surface for the anonymizer + lens libraries.
  *
  * All UDFs are deterministic (the whole point of the MD5 contract —
  * reference Anonymizer.scala:12-19), so Catalyst is free to collapse
  * duplicate applications. Null inputs reach the function (String is a
  * reference type) and flow through unchanged, matching the reference's
  * `preserveNullOrEmpty`.
  */
object GraftFunctions {

  val firstName: UserDefinedFunction       = udf(Anonymizer.FirstName(_: String))
  val maleFirstName: UserDefinedFunction   = udf(Anonymizer.MaleFirstName(_: String))
  val femaleFirstName: UserDefinedFunction = udf(Anonymizer.FemaleFirstName(_: String))
  val lastName: UserDefinedFunction        = udf(Anonymizer.LastName(_: String))
  val fullName: UserDefinedFunction        = udf(Anonymizer.FullName(_: String))
  val state: UserDefinedFunction           = udf(Anonymizer.State(_: String))
  val stateAbbr: UserDefinedFunction       = udf(Anonymizer.StateAbbr(_: String))
  val country: UserDefinedFunction         = udf(Anonymizer.Country(_: String))
  val email: UserDefinedFunction           = udf(Anonymizer.Email(_: String))
  val phoneNumber: UserDefinedFunction     = udf(Anonymizer.PhoneNumber(_: String))
  val streetAddress: UserDefinedFunction   = udf(Anonymizer.StreetAddress(_: String))
  val city: UserDefinedFunction            = udf(Anonymizer.City(_: String))
  val zipCode: UserDefinedFunction         = udf(Anonymizer.ZipCode(_: String))
  val redact: UserDefinedFunction          = udf(Anonymizer.Redact(_: String))
  val loremText: UserDefinedFunction       = udf(Anonymizer.LoremText(_: String))

  def partialRedact(showFirst: Int = 2, showLast: Int = 2): UserDefinedFunction =
    udf(Anonymizer.PartialRedact(showFirst, showLast)(_: String))

  /** Lift any lens-focused string transform into a UDF. */
  def lensUdf(lens: Lens, f: String => String): UserDefinedFunction =
    udf(lens.modify(f)(_: String))

  /** Register the library under `anon_*` SQL names on a session. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("anon_first_name", firstName)
    spark.udf.register("anon_male_first_name", maleFirstName)
    spark.udf.register("anon_female_first_name", femaleFirstName)
    spark.udf.register("anon_last_name", lastName)
    spark.udf.register("anon_full_name", fullName)
    spark.udf.register("anon_state", state)
    spark.udf.register("anon_state_abbr", stateAbbr)
    spark.udf.register("anon_country", country)
    spark.udf.register("anon_email", email)
    spark.udf.register("anon_phone", phoneNumber)
    spark.udf.register("anon_street_address", streetAddress)
    spark.udf.register("anon_city", city)
    spark.udf.register("anon_zip", zipCode)
    spark.udf.register("anon_redact", redact)
    spark.udf.register("anon_lorem", loremText)
  }
}
