package graft.sds

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reporting-store query surface (SURVEY.md §2.5): what the
  * ConsenSource REST API asks of the reporting DB, expressed over the
  * SCD2 store. Each helper takes the store so it can serve live (Q1),
  * as-of (Q2), or history (Q3) views with the same join logic (Q4),
  * plus text search (Q5), validity predicates (Q6), and enum counts (Q7).
  *
  * Join posture: every dimension here (organizations, standards) is
  * small relative to fact history — they broadcast. At 100 TB of
  * history, the `at` filters land on the live partition or prune by
  * `start_block_num` before any join.
  */
final class Queries(store: Scd2Store) {

  private def view(name: String, at: Option[Long]): DataFrame =
    at.fold(store.live(name))(b => store.asOf(name, b))

  /** PK-equality view: live reads go through the store's zone-mapped
    * `pointLookup` (1-of-N live files); as-of reads filter the pruned
    * temporal view. All SDS tables are scoped by a single key column,
    * so the lookup key IS the scope key. */
  private def pointView(name: String, keyValue: String, at: Option[Long]): DataFrame =
    at.fold(store.pointLookup(name, keyValue))(b =>
      store.asOf(name, b)
        .filter(col(Schemas.tables(name)._2.head) === keyValue))

  /** Q1/Q2/Q4: an organization with its child records joined in. */
  def organizationProfile(orgId: String, at: Option[Long] = None): DataFrame = {
    val orgs = pointView("organizations", orgId, at)
    def child(name: String, cols: Seq[String]): DataFrame =
      pointView(name, orgId, at)
        .groupBy("organization_id")
        .agg(collect_list(struct(cols.map(col): _*)).as(name))
    orgs
      .join(child("contacts", Seq("name", "phone_number", "language_code")), Seq("organization_id"), "left")
      .join(child("authorizations", Seq("public_key", "role")), Seq("organization_id"), "left")
      .join(child("accreditations", Seq("standard_id", "standard_version", "valid_from", "valid_to")), Seq("organization_id"), "left")
      .join(child("addresses", Seq("street_line_1", "city", "country")), Seq("organization_id"), "left")
  }

  /** Q4: certificates with factory, certifying body, and standard names
    * resolved (the REST API's certificate listing). */
  def certificatesResolved(at: Option[Long] = None): DataFrame = {
    val orgs = view("organizations", at)
      .select(col("organization_id"), col("name"))
    view("certificates", at)
      .join(broadcast(orgs.withColumnRenamed("name", "factory_name")),
        col("factory_id") === col("organization_id")).drop("organization_id")
      .join(broadcast(orgs.withColumnRenamed("name", "certifying_body_name")),
        col("certifying_body_id") === col("organization_id")).drop("organization_id")
      .join(broadcast(view("standards", at)
          .select(col("standard_id"), col("name").as("standard_name"))),
        Seq("standard_id"), "left")
  }

  /** Q6: certificates valid at an epoch-seconds instant. */
  def certificatesValidAt(epochSec: Long, at: Option[Long] = None): DataFrame =
    view("certificates", at)
      .filter(col("valid_from") <= epochSec && col("valid_to") > epochSec)

  /** Q5: factory search by name substring (the diesel_full_text_search
    * capability, honest mapping per SURVEY §2.5). */
  def searchFactories(query: String, at: Option[Long] = None): DataFrame =
    view("organizations", at)
      .filter(col("organization_type") === "Factory" &&
        lower(col("name")).contains(query.toLowerCase))

  /** Q7: requests counted by status. */
  def requestCountsByStatus(at: Option[Long] = None): DataFrame =
    view("requests", at).groupBy("status").count().orderBy("status")

  /** Q1 point read: one entity's live row(s) by scope key — the
    * REST API's single-entity GET, served 1-of-N-files by the store's
    * manifest zone map. */
  def byKey(table: String, keyValue: String): DataFrame =
    store.pointLookup(table, keyValue)

  /** Q3: full version history of one entity, version-numbered. */
  def history(table: String, pkCol: String, pkValue: String): DataFrame = {
    val w = Window.partitionBy(col(pkCol)).orderBy(col("start_block_num"))
    store.table(table)
      .filter(col(pkCol) === pkValue)
      .withColumn("version_no", row_number().over(w))
      .orderBy("start_block_num")
  }
}
