package graft.meta

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** "One rulebook, two doors" — property check for foreign schema
  * evolution: a random sequence of renames / adds / widenings / drops is
  * applied to TWIN tables, one through the native [[SchemaEvolution]]
  * calls (the SQL surface's engine) and one through the REST commit
  * endpoint's `add-schema` (the foreign engine's door). After every
  * step the twins must agree exactly — schema (ids, names, types,
  * defaults), lastColumnId, retired stats names — and at the end both
  * must read the SAME rows through the evolved schema. */
class ForeignSchemaFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val http = HttpClient.newHttpClient()

  for (seed <- Seq(13, 91)) test(s"native vs REST schema evolution agree (seed $seed)") {
    val rnd = new scala.util.Random(seed)
    val cat = LocalCatalog(Files.createTempDirectory("fsf-wh").toString)
    val rows = (1L to 15L).map(i => (i, i.toInt, s"n$i")).toDF("id", "cnt", "name")
    IceWrite.create(spark, cat, "nat", rows)
    IceWrite.create(spark, cat, "rest", rows)
    val srv = new IcebergRestServe(cat, namespace = "wh", prefix = "p")
    try {
      def restSchema(fields: Seq[SchemaField], lastId: Int): HttpResponse[String] = {
        val fj = fields.map { f =>
          val t = f.dataType.toUpperCase match {
            case "BIGINT" => "long"; case "INT" => "int"; case "STRING" => "string"
            case "DOUBLE" => "double"; case "FLOAT" => "float"
            case o => o.toLowerCase
          }
          s"""{"id": ${f.id}, "name": "${f.name}", "required": ${!f.nullable}, "type": "$t"}"""
        }.mkString(",")
        http.send(HttpRequest.newBuilder(
          URI.create(s"${srv.uri}/v1/p/namespaces/wh/tables/rest"))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            s"""{"requirements": [], "updates": [
               |{"action": "add-schema", "last-column-id": $lastId, "schema":
               |  {"type": "struct", "fields": [$fj]}},
               |{"action": "set-current-schema-id", "schema-id": -1}]}"""
              .stripMargin)).build(),
          HttpResponse.BodyHandlers.ofString())
      }

      var applied = 0
      for (step <- 1 to 12) {
        val m = cat.loadTable("nat")
        val cols = m.schema
        val op = rnd.nextInt(4)
        // build the op against the NATIVE table's state, attempt BOTH
        // doors, and require they agree on accept/refuse
        val nativeAttempt: Either[String, Seq[SchemaField]] = op match {
          case 0 => // rename a random column
            val f = cols(rnd.nextInt(cols.size))
            val to = s"c${step}_r"
            try { SchemaEvolution.renameColumn(cat, "nat", f.name, to)
              Right(cat.loadTable("nat").schema) }
            catch { case e: Exception => Left(e.getMessage) }
          case 1 => // add a column
            val n = s"x$step"
            try { SchemaEvolution.addColumn(cat, "nat", n, "DOUBLE")
              Right(cat.loadTable("nat").schema) }
            catch { case e: Exception => Left(e.getMessage) }
          case 2 => // widen a random column (may refuse: not widenable)
            val f = cols(rnd.nextInt(cols.size))
            try { SchemaEvolution.widenColumnType(cat, "nat", f.name, "BIGINT")
              Right(cat.loadTable("nat").schema) }
            catch { case e: Exception => Left(e.getMessage) }
          case 3 => // drop a random column (may refuse: last col etc.)
            val f = cols(rnd.nextInt(cols.size))
            try { SchemaEvolution.dropColumn(cat, "nat", f.name)
              Right(cat.loadTable("nat").schema) }
            catch { case e: Exception => Left(e.getMessage) }
        }
        nativeAttempt match {
          case Right(newSchema) =>
            applied += 1
            val resp = restSchema(newSchema, cat.loadTable("nat").lastColumnId)
            assert(resp.statusCode() == 200,
              s"seed $seed step $step: native accepted but REST refused: ${resp.body()}")
            val a = cat.loadTable("nat"); val b = cat.loadTable("rest")
            assert(a.schema == b.schema, s"seed $seed step $step schema diverged:\n" +
              s"  nat : ${a.schema}\n  rest: ${b.schema}")
            assert(a.lastColumnId == b.lastColumnId)
            assert(a.statsRetiredNames == b.statsRetiredNames,
              s"seed $seed step $step retired diverged: " +
                s"${a.statsRetiredNames} vs ${b.statsRetiredNames}")
          case Left(_) => () // native refused; nothing proposed over REST
        }
      }
      assert(applied >= 4, s"seed $seed: too few applied ops to be meaningful")
      // both doors lead to the same READ of the original rows
      val a = IceRead.table(spark, cat, "nat").collect().map(_.toString).sorted
      val b = IceRead.table(spark, cat, "rest").collect().map(_.toString).sorted
      assert(a.sameElements(b), s"seed $seed: evolved reads diverge")
    } finally srv.stop()
  }
}
