package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** FillVisitorProject (etl.py:448-561) — the 48-column assembly. */
class VisitorProjectSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("joins, filters, casts and translations assemble correctly") {
    // round 1: two calls; project submitted against call ordinal 2
    val calls = Steps.unionRounds(Seq(
      Seq((1, 1, ts("2004-01-01 00:00:00"), ts("2004-04-01 00:00:00")),
          (2, 2, ts("2004-06-01 00:00:00"), ts("2004-09-01 00:00:00")))
        .toDF("callID", "call", "dateOpen", "dateClosed")))
    val (callTable, _) = Steps.fillCall(calls)

    val projects = Steps.unionRounds(Seq(Seq(
      // kept: full row
      (10, 100, "Proj A", 5, Some(1), "submitted", "2", Some(7), "Mon Jan 02 15:04:05 GMT 2006", "NHM LONDON"),
      // dropped: edit state
      (11, 100, "Proj B", 3, Some(0), "edit", "1", Some(7), null, null),
      // dropped: user 999 has no GUID
      (12, 999, "Proj C", 2, None, "submitted", "1", None, null, null))
      .toDF("UserProject_ID", "User_ID", "UserProject_Title", "length_of_visit",
        "Home_Facilities", "Application_State", "Call_Submitted",
        "Project_Specific_Discipline", "Submission_Date", "Supporter_Institution")))
      .withColumn("New_User", lit(null).cast("int")) // bool(None) → false
      .withColumn("Support_Final", lit(1))
      .withColumn("Previous_Application", lit(0))
      .withColumn("Group_leader", lit(null).cast("int"))
      .withColumn("start_date", lit(null).cast("timestamp"))
      .withColumn("finish_date", lit(null).cast("timestamp"))
      .withColumn("TAF_ID", lit(null).cast("int"))
      .withColumn("Acceptance", lit("yes"))
      .withColumn("UserProject_Objectives", lit(null).cast("string"))
      .withColumn("UserProject_Achievements", lit(null).cast("string"))
      .withColumn("UserProject_Summary", lit(null).cast("string"))
      .withColumn("UserProject_Facility_Reasons", lit(null).cast("string"))
      .withColumn("Project_Discipline", lit(3))
      .withColumn("Training_Requirement", lit(null).cast("string"))
      .withColumn("Administration_State", lit(null).cast("string"))
      .withColumn("Group_Members", lit(null).cast("string"))
      .withColumn("UserProject_Background", lit(null).cast("string"))
      .withColumn("UserProject_Reasons", lit(null).cast("string"))
      .withColumn("UserProject_Expectations", lit(null).cast("string"))
      .withColumn("UserProject_Outputs", lit(null).cast("string"))
      .withColumn("Group_Leader_Institution", lit("OLD NAME"))
      .withColumn("Visit_Funded_Previously", lit(null).cast("int"))

    val users = Steps.unionRounds(Seq(Seq(
      (100, "F", "GB", "PhD", "NHM LONDON", "London", "GB"))
      .toDF("User_ID", "Gender", "Nationality_Country_code", "Researcher_status",
        "Home_Institution_Name", "Home_Institution_Town", "Home_Institution_Country_code")))
      .withColumn("Discipline1", lit(1)).withColumn("Discipline2", lit(null).cast("int"))
      .withColumn("Discipline3", lit(null).cast("int"))
      .withColumn("Home_Institution_Type", lit(null).cast("string"))
      .withColumn("Home_Institution_Dept", lit(null).cast("string"))
      .withColumn("Home_Institution_Postcode", lit(null).cast("string"))
      .withColumn("Number_of_visits", lit(2))
      .withColumn("Duration_of_stays", lit(14))
      .withColumn("Nationality_OtherText", lit(null).cast("string"))
      .withColumn("Remote_user", lit(null).cast("string"))
      .withColumn("Travel_and_Subsistence_reimbursed", lit(null).cast("string"))
      .withColumn("jobTitle", lit("Researcher"))

    val guids = Seq((1, 100, 5551L, "25-34")).toDF("round", "user_id", "guid", "age_range")
    val specMapping = Seq((1, 7, 42)).toDF("round", "original_id", "new_id")
    val countryMapping = Seq(("GB", 77), ("FR", 78)).toDF("original_id", "new_id")
    val aliases = Map("NHM LONDON" -> "Natural History Museum", "OLD NAME" -> "nil")

    val (table, mapping) = Steps.fillVisitorProject(
      projects, users, guids, callTable, specMapping, countryMapping, aliases)
    val rows = table.collect()

    assert(rows.length === 1) // edit-state and GUID-less projects dropped
    val r = rows.head
    assert(r.getAs[Int]("id") === 1)
    assert(r.getAs[Int]("original_project_id") === 10)
    assert(r.getAs[Long]("user_guid") === 5551L)
    assert(r.getAs[String]("user_age_range") === "25-34")
    assert(r.getAs[Int]("call_submitted") === 2)  // ordinal 2 → call id 2 (J8)
    assert(r.getAs[Int]("project_specific_discipline") === 42) // J11
    assert(r.getAs[Int]("nationality") === 77)    // J7
    assert(r.getAs[Int]("home_institution_country") === 77)
    assert(r.getAs[Boolean]("home_facilities") === true)  // F6
    assert(r.getAs[Boolean]("new_user") === false)        // bool(None) → false
    assert(r.getAs[Boolean]("support_final") === true)
    assert(r.getAs[Timestamp]("submission_date") === ts("2006-01-02 15:04:05")) // F3
    assert(r.getAs[String]("supporter_institution") === "Natural History Museum") // J6 alias
    assert(r.getAs[String]("group_leader_institution") === null) // 'nil' sentinel
    assert(r.getAs[String]("home_institution_name") === "Natural History Museum")
    assert(r.getAs[String]("gender") === "F")

    val m = mapping.head()
    assert((m.getAs[Int]("round"), m.getAs[Int]("original_id"), m.getAs[Int]("new_id")) === (1, 10, 1))
  }
}
