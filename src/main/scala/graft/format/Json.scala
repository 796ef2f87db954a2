package graft.format

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper, SerializationFeature}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

/** Minimal JSON (de)serialization for table metadata, on Spark's bundled
  * Jackson. All writes are atomic: temp file + ATOMIC_MOVE rename, the
  * same publish-by-rename idea as Spark's task-commit protocol (and the
  * upgrade of the reference's single-blob-PUT atomicity, SURVEY §4.2).
  */
object Json {
  val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m.configure(SerializationFeature.INDENT_OUTPUT, true)
    m
  }

  def write[T](path: Path, value: T): Unit = {
    val bytes = mapper.writeValueAsBytes(value)
    atomicWrite(path, bytes)
  }

  /** Create-new write: fails if the target already exists (optimistic
    * concurrency claim for version files). */
  def writeNew[T](path: Path, value: T): Boolean = {
    val bytes = mapper.writeValueAsBytes(value)
    try {
      Files.write(path, bytes, StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }
  }

  def read[T](path: Path, clazz: Class[T]): T =
    mapper.readValue(Files.readAllBytes(path), clazz)

  def atomicWrite(path: Path, bytes: Array[Byte]): Unit = {
    Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp-" +
      java.util.UUID.randomUUID().toString)
    Files.write(tmp, bytes)
    try Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  def atomicWriteString(path: Path, s: String): Unit =
    atomicWrite(path, s.getBytes(StandardCharsets.UTF_8))
}
