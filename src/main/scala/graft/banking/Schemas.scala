package graft.banking

import org.apache.spark.sql.types._

/** Bronze schemas for the reference's five banking entities — all-string,
  * explicit, never inferred (reference: bronze_to_silver.py:28-55).
  */
object Schemas {
  private def s(names: String*): StructType =
    StructType(names.map(n => StructField(n, StringType, nullable = true)))

  val accounts: StructType = s("Acc no", "Date", "Status")
  val accountDetails: StructType = s("Acc no", "Date", "type")
  val person: StructType = s("Acc no", "Person")
  val personProfile: StructType = s("Person", "Name", "Date")
  val personIden: StructType = s("Person", "Id", "Date")
}

/** Gold-layer row types (SURVEY.md §1.4). */
final case class DimAccount(
    account_sk: Long,
    acc_no: String,
    status: String,
    `type`: String,
    effective_start_date: java.sql.Date,
    effective_end_date: java.sql.Date,
    is_current: Boolean)

final case class DimPerson(
    person_sk: Long,
    person: String,
    name: String,
    id: String,
    effective_start_date: java.sql.Date,
    effective_end_date: java.sql.Date,
    is_current: Boolean)
