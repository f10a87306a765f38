package graft.functions

/** Vendored deterministic word lists.
  *
  * The reference engine (simple-anonymizer/src/scala/simpleanonymizer/Anonymizer.scala:45-63)
  * pulls its lists from DataFaker YAML at runtime. DataFaker is not on this build's
  * classpath, so the lists are vendored here with a FIXED, DOCUMENTED ORDER — the
  * determinism contract is the MD5 selection scheme (`stableHash % size`), and that
  * contract requires list order to never change. Do not sort, dedupe, or append
  * anywhere but the END of a list (appending changes `size` and therefore results;
  * treat every list as frozen once released).
  */
object DataLists {

  /** Order: alphabetical, frozen. */
  val maleFirstNames: IndexedSeq[String] = Vector(
    "Aaron", "Adam", "Alan", "Albert", "Alexander",
    "Andrew", "Anthony", "Arthur", "Benjamin", "Brian",
    "Carl", "Charles", "Christopher", "Daniel", "David",
    "Dennis", "Donald", "Douglas", "Edward", "Eric",
    "Eugene", "Frank", "Gary", "George", "Gerald"
  )

  /** Order: alphabetical, frozen. */
  val femaleFirstNames: IndexedSeq[String] = Vector(
    "Alice", "Amanda", "Amy", "Andrea", "Angela",
    "Ann", "Anna", "Barbara", "Betty", "Beverly",
    "Brenda", "Carol", "Carolyn", "Catherine", "Christine",
    "Cynthia", "Deborah", "Debra", "Denise", "Diana",
    "Diane", "Donna", "Dorothy", "Elizabeth", "Emily"
  )

  /** Male list concatenated first, mirroring reference Anonymizer.scala:52-57. */
  val firstNames: IndexedSeq[String] = maleFirstNames ++ femaleFirstNames

  /** Order: alphabetical, frozen. */
  val lastNames: IndexedSeq[String] = Vector(
    "Adams", "Alexander", "Allen", "Anderson", "Bailey",
    "Baker", "Barnes", "Bell", "Bennett", "Brooks",
    "Brown", "Bryant", "Butler", "Campbell", "Carter",
    "Clark", "Coleman", "Collins", "Cook", "Cooper",
    "Cox", "Davis", "Diaz", "Edwards", "Evans",
    "Flores", "Foster", "Garcia", "Gonzalez", "Gray",
    "Green", "Griffin", "Hall", "Harris", "Hayes",
    "Henderson", "Hernandez", "Hill", "Howard", "Hughes",
    "Jackson", "James", "Jenkins", "Johnson", "Jones",
    "Kelly", "King", "Lee", "Lewis", "Long"
  )

  /** Order: frozen (common-usage order, not alphabetical). */
  val streetSuffixes: IndexedSeq[String] = Vector(
    "Street", "Avenue", "Boulevard", "Drive", "Lane",
    "Road", "Court", "Place", "Terrace", "Way"
  )

  /** Order: frozen. */
  val citySuffixes: IndexedSeq[String] = Vector(
    "ville", "berg", "ton", "town", "burgh",
    "borough", "ford", "haven", "side", "port"
  )

  /** Order: US states alphabetical, frozen. */
  val states: IndexedSeq[String] = Vector(
    "Alabama", "Alaska", "Arizona", "Arkansas", "California",
    "Colorado", "Connecticut", "Delaware", "Florida", "Georgia",
    "Hawaii", "Idaho", "Illinois", "Indiana", "Iowa",
    "Kansas", "Kentucky", "Louisiana", "Maine", "Maryland",
    "Massachusetts", "Michigan", "Minnesota", "Mississippi", "Missouri",
    "Montana", "Nebraska", "Nevada", "New Hampshire", "New Jersey",
    "New Mexico", "New York", "North Carolina", "North Dakota", "Ohio",
    "Oklahoma", "Oregon", "Pennsylvania", "Rhode Island", "South Carolina",
    "South Dakota", "Tennessee", "Texas", "Utah", "Vermont",
    "Virginia", "Washington", "West Virginia", "Wisconsin", "Wyoming"
  )

  /** Order: matches [[states]] index-for-index, frozen. */
  val stateAbbrs: IndexedSeq[String] = Vector(
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "FL", "GA",
    "HI", "ID", "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MD",
    "MA", "MI", "MN", "MS", "MO", "MT", "NE", "NV", "NH", "NJ",
    "NM", "NY", "NC", "ND", "OH", "OK", "OR", "PA", "RI", "SC",
    "SD", "TN", "TX", "UT", "VT", "VA", "WA", "WV", "WI", "WY"
  )

  /** Order: frozen. */
  val countries: IndexedSeq[String] = Vector(
    "Argentina", "Australia", "Austria", "Belgium", "Brazil",
    "Canada", "Chile", "China", "Colombia", "Denmark",
    "Egypt", "Finland", "France", "Germany", "Greece",
    "India", "Indonesia", "Ireland", "Israel", "Italy",
    "Japan", "Kenya", "Mexico", "Netherlands", "New Zealand",
    "Nigeria", "Norway", "Peru", "Philippines", "Poland",
    "Portugal", "Singapore", "South Africa", "South Korea", "Spain",
    "Sweden", "Switzerland", "Thailand", "Turkey", "Vietnam"
  )

  /** Order: frozen, mirrors reference Anonymizer.scala:169-189 exactly. */
  val loremWords: IndexedSeq[String] = Vector(
    "lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing",
    "elit", "sed", "do", "eiusmod", "tempor", "incididunt", "ut", "labore",
    "et", "dolore", "magna", "aliqua"
  )
}
