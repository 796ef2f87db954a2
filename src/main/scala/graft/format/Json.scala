package graft.format

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper, SerializationFeature}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Minimal JSON (de)serialization for table metadata, on Spark's bundled
  * Jackson. Pure bytes<->object — durability and atomicity belong to
  * [[CommitIO]] (publish-by-rename locally, conditional PUT on object
  * stores; the upgrade of the reference's single-blob-PUT atomicity,
  * SURVEY §4.2).
  */
object Json {
  val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m.configure(SerializationFeature.INDENT_OUTPUT, true)
    m
  }

  def toBytes[T](value: T): Array[Byte] = mapper.writeValueAsBytes(value)

  def fromBytes[T](bytes: Array[Byte], clazz: Class[T]): T =
    mapper.readValue(bytes, clazz)
}
