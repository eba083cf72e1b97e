package graft.sds

import org.apache.spark.sql.functions._

import graft.SparkSpec
import Fixtures._

/** Reporting query surface (Q1-Q7) over an ingested store. */
class QueriesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val store: Scd2Store = {
    val st = new Scd2Store(spark, tempDir("sds-queries"))
    val b1 = batch(1, "b1", Seq(
      Change(orgAddress(CertOrgId), "SET", container(certifyingBodyJson())),
      Change(orgAddress(FactoryId), "SET", container(factoryJson())),
      Change(standardAddress(StandardId), "SET", container(standardJson())),
      Change(certAddress(CertId), "SET", container(certificateJson())),
      Change(requestAddress(RequestId), "SET", container(requestJson()))))
    val b3 = batch(3, "b3", Seq(
      Change(requestAddress("req2"), "SET",
        container(requestJson(id = "req2", status = "IN_PROGRESS"))),
      // factory renamed at block 3
      Change(orgAddress(FactoryId), "SET",
        container(factoryJson().replace("\"name\":\"test\"", "\"name\":\"renamed\"")))))
    Pipeline.applyBatch(st, spark.createDataset(Seq(b1, b3)).toDF("value"))
    st
  }

  private lazy val q = new Queries(store)

  test("Q1/Q4: organization profile joins children (live view)") {
    val row = q.organizationProfile(CertOrgId).collect().head
    assert(row.getAs[String]("name") === "test")
    assert(row.getAs[Seq[Any]]("contacts").size === 1)
    assert(row.getAs[Seq[Any]]("authorizations").size === 1)
    assert(row.getAs[Seq[Any]]("accreditations").size === 1)
    assert(row.getAs[Seq[Any]]("addresses") === null) // cert body has no address
  }

  test("Q1 point read: byKey serves one live entity through the zone map") {
    val rows = q.byKey("organizations", FactoryId).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("name") === "renamed")
    assert(q.byKey("organizations", "no-such-org").isEmpty)
  }

  test("Q1/Q2: organizationProfile point reads resolve live and as-of") {
    val live = q.organizationProfile(FactoryId).collect().head
    assert(live.getAs[String]("name") === "renamed")
    val asOf1 = q.organizationProfile(FactoryId, at = Some(1)).collect().head
    assert(asOf1.getAs[String]("name") === "test")
  }

  test("Q2: as-of view sees the pre-rename factory") {
    val asOf1 = q.searchFactories("test", at = Some(1))
    assert(asOf1.select("name").as[String].collect().toSeq === Seq("test"))
    val live = q.searchFactories("renamed")
    assert(live.select("name").as[String].collect().toSeq === Seq("renamed"))
    assert(q.searchFactories("test").isEmpty) // old name gone from live
  }

  test("Q3: history is version-numbered") {
    val h = q.history("organizations", "organization_id", FactoryId)
      .select("version_no", "name", "start_block_num").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(h === Seq((1, "test", 1L), (2, "renamed", 3L)))
  }

  test("Q4: certificates resolve factory, body, and standard names") {
    val row = q.certificatesResolved().collect().head
    assert(row.getAs[String]("factory_name") === "renamed")
    assert(row.getAs[String]("certifying_body_name") === "test")
    assert(row.getAs[String]("standard_name") === "test")
  }

  test("Q6: validity window filters certificates") {
    assert(q.certificatesValidAt(1).count() === 1)  // valid [1, 2)
    assert(q.certificatesValidAt(5).isEmpty)
  }

  test("Q7: request counts by status") {
    val counts = q.requestCountsByStatus().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(counts === Seq(("InProgress", 1L), ("Open", 1L)))
  }
}
