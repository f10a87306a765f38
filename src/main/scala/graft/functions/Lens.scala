package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import org.slf4j.LoggerFactory

/** A lens focusing a String => String transformation on part of a column
  * value, possibly inside a JSON structure.
  *
  * Semantics contract mirrored from the reference
  * (simple-anonymizer/src/scala/simpleanonymizer/Lens.scala:16-120), most
  * importantly the ERROR-TOLERANCE rules: malformed JSON, wrong JSON kind,
  * or a missing field log a warning and return the input UNCHANGED — a lens
  * must never fail a pipeline run. (Note `from_json` returns null on
  * malformed input, which is why this is a UDF-side JSON round-trip rather
  * than Spark's built-in JSON reader.)
  *
  * Serialization is compact (no spaces) with object field order preserved,
  * matching the reference's circe `.noSpaces` behavior (Lens.scala:64).
  */
sealed trait Lens extends Serializable {

  /** Transform the whole column value by applying `f` at the focused location. */
  def modify(f: String => String): String => String

  /** Like modify but with explicit null (None) handling. */
  def modifyOpt(f: Option[String] => Option[String]): Option[String] => Option[String]

  private[functions] def modifyJson(f: String => String): JsonNode => JsonNode
}

object Lens {
  private val logger = LoggerFactory.getLogger(getClass)

  // Error tolerance means these paths can fire once per ROW on malformed
  // data — log each distinct message once per JVM instead of flooding the
  // executor logs (and paying a slf4j call per row).
  private val warned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def warnOnce(msg: String, detail: Any): Unit =
    if (warned.add(msg + detail)) logger.warn(s"$msg {} (further occurrences suppressed)", detail)

  // Jackson (already on Spark's classpath) preserves object insertion order
  // in ObjectNode, which the structure-preservation contract requires.
  // FAIL_ON_TRAILING_TOKENS makes `{"a":1} junk` a parse failure (and thus a
  // passthrough), matching strict-parser behavior in the reference.
  private[functions] val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.enable(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
    m
  }

  /** Identity focus: the transform applies to the whole string, no JSON
    * parsing — reference Lens.scala:42-58.
    */
  case object Direct extends Lens {
    override def modify(f: String => String): String => String = f

    override def modifyOpt(f: Option[String] => Option[String]): Option[String] => Option[String] = f

    private[functions] def modifyJson(f: String => String): JsonNode => JsonNode = { json =>
      if (!json.isTextual) {
        warnOnce("Expected string but got", json.getNodeType)
        json
      } else TextNode.valueOf(f(json.asText))
    }
  }

  /** Lenses that parse the column as JSON and navigate inside it. */
  sealed trait JsonLens extends Lens {
    override def modify(f: String => String): String => String = { jsonStr =>
      val parsed =
        try Some(mapper.readTree(jsonStr))
        catch { case e: Exception => warnOnce("Failed to parse JSON:", e.getMessage); None }
      parsed match {
        // readTree("") yields a MissingNode rather than throwing — treat it
        // as a parse failure (passthrough) like any other malformed input.
        case Some(json) if json != null && !json.isMissingNode =>
          mapper.writeValueAsString(modifyJson(f)(json))
        case _ => jsonStr
      }
    }

    override def modifyOpt(f: Option[String] => Option[String]): Option[String] => Option[String] = {
      val stringF: String => String = s => f(Some(s)).getOrElse(s)
      opt => opt.map(modify(stringF))
    }
  }

  /** Focus a named field of a JSON object, optionally composing with an
    * inner lens for nesting — reference Lens.scala:84-101.
    */
  case class Field(fieldName: String, inner: Lens = Direct) extends JsonLens {
    private[functions] def modifyJson(f: String => String): JsonNode => JsonNode = { json =>
      json match {
        case obj: ObjectNode if obj.has(fieldName) =>
          val copy = obj.deepCopy[ObjectNode]()
          copy.set[ObjectNode](fieldName, inner.modifyJson(f)(obj.get(fieldName)))
          copy
        case obj: ObjectNode =>
          warnOnce("Field not found in JSON object:", fieldName)
          obj
        case other =>
          warnOnce("Expected object but got", other.getNodeType)
          other
      }
    }
  }

  /** Map an element lens over every element of a JSON array —
    * reference Lens.scala:108-119.
    */
  case class ArrayElements(elementLens: Lens) extends JsonLens {
    private[functions] def modifyJson(f: String => String): JsonNode => JsonNode = { json =>
      json match {
        case arr: ArrayNode =>
          val out = mapper.createArrayNode()
          arr.forEach(el => out.add(elementLens.modifyJson(f)(el)))
          out
        case other =>
          warnOnce("Expected array but got", other.getNodeType)
          other
      }
    }
  }
}
