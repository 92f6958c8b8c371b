package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.meta.{IceRead, LocalCatalog}

/** Persisted IVF+PQ index: build / append / serve from integer codes. */
class AnnIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def freshCatalog() =
    LocalCatalog(java.nio.file.Files.createTempDirectory("ann-idx").toString)

  test("build persists centroids + codes; append grows; search serves the planted dup") {
    val catalog = freshCatalog()
    AnnIndex.build(spark, catalog, "ann", embs, "vec_id", "embedding",
      nCells = 8, m = 4, trainIters = 2)

    val cents = IceRead.table(spark, catalog, "ann__centroids")
    val nCells = cents.count()
    assert(nCells >= 1 && nCells <= 8)
    assert(cents.filter(size($"vec") =!= 64).count() == 0)

    val codes = IceRead.table(spark, catalog, "ann__codes")
    assert(codes.count() == embs.count())
    assert(codes.filter($"code_0".isNull || $"code_3".isNull).count() == 0)
    // geometry is pinned on the table, not remembered by the caller
    assert(catalog.loadTable("ann__codes").properties("ann.m") == "4")

    // plant an exact duplicate of vector 7 via append
    val v7 = embs.filter($"vec_id" === 7)
      .select(lit(9999L).as("vec_id"), $"embedding")
    AnnIndex.append(spark, catalog, "ann", v7, "vec_id", "embedding")
    val codes2 = IceRead.table(spark, catalog, "ann__codes")
    assert(codes2.count() == embs.count() + 1)

    // ADC to a vector's OWN codes is the per-subspace argmin sum — the
    // global minimum — so the planted dup (identical codes) sits in the
    // tied-minimal group; size k past that group and assert membership
    val c7 = codes2.filter($"vec_id" === 7)
      .select($"code_0", $"code_1", $"code_2", $"code_3").head()
    val tied = codes2.filter($"code_0" === c7.getLong(0) && $"code_1" === c7.getLong(1) &&
      $"code_2" === c7.getLong(2) && $"code_3" === c7.getLong(3)).count()
    val res = AnnIndex.search(spark, catalog, "ann",
      embs.filter($"vec_id" === 7), "vec_id", "embedding",
      k = tied.toInt + 5, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(res.nonEmpty)
    assert(res.forall(_._1 == 7L))
    assert(!res.exists(_._2 == 7L), "a query never returns itself")
    assert(res.map(_._3).sorted.toSeq == (1L to res.length).toSeq, "dense ranks")
    val minAdc = res.map(_._4).min
    val dup = res.find(_._2 == 9999L)
    assert(dup.isDefined, s"planted dup missing from ${res.length} results")
    assert(dup.get._4 == minAdc, "identical codes must sit at the minimal ADC")
  }

  test("replayed append commits identical rows; rebuild into an existing name refuses") {
    val catalog = freshCatalog()
    val small = embs.limit(50)
    AnnIndex.build(spark, catalog, "ann2", small, "vec_id", "embedding",
      nCells = 4, m = 4, trainIters = 1)
    val extra = embs.filter($"vec_id" >= 50 && $"vec_id" < 60)
    AnnIndex.append(spark, catalog, "ann2", extra, "vec_id", "embedding")
    val before = IceRead.table(spark, catalog, "ann2__codes")
      .orderBy($"vec_id").collect().toSeq
    AnnIndex.append(spark, catalog, "ann2", extra, "vec_id", "embedding")
    val after = IceRead.table(spark, catalog, "ann2__codes")
      .orderBy($"vec_id").collect().toSeq
    assert(after == before, "replayed append must be a no-op on content")
    val e = intercept[IllegalArgumentException] {
      AnnIndex.build(spark, catalog, "ann2", small, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("a dimension mismatch fails loudly instead of returning zero neighbors") {
    val catalog = freshCatalog()
    AnnIndex.build(spark, catalog, "ann4", embs.limit(50), "vec_id", "embedding",
      nCells = 4, m = 4, trainIters = 0)
    val short = Seq((1L, Array.fill(32)(0.5f))).toDF("vec_id", "embedding")
    val eS = intercept[IllegalArgumentException] {
      AnnIndex.search(spark, catalog, "ann4", short, "vec_id", "embedding", k = 3)
    }
    assert(eS.getMessage.contains("64-dimensional"))
    val eA = intercept[IllegalArgumentException] {
      AnnIndex.append(spark, catalog, "ann4", short, "vec_id", "embedding")
    }
    assert(eA.getMessage.contains("64-dimensional"))
  }

  test("multi-probe search widens the candidate pool, never narrows it") {
    val catalog = freshCatalog()
    AnnIndex.build(spark, catalog, "ann3", embs, "vec_id", "embedding",
      nCells = 8, m = 4, trainIters = 1)
    val qs = embs.filter($"vec_id" < 5)
    def neighbors(nprobe: Int) =
      AnnIndex.search(spark, catalog, "ann3", qs, "vec_id", "embedding",
        k = 1000000, nprobe = nprobe)
        .select($"query_id", $"neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n1 = neighbors(1)
    val n2 = neighbors(2)
    assert(n1.subsetOf(n2), "nprobe=2 must cover every nprobe=1 candidate")
    assert(n2.size > n1.size, "a second probed cell must add candidates")
  }
}
