package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the synth source/target tables (SURVEY §1.3).
  *
  * Source: /root/reference/synth/model/rco_synthsys_live.py (only the tables
  * the pipeline reads); target: /root/reference/synth/model/analysis.py.
  * Declared `StructType`s — no inference — so scans prune columns and the
  * writers emit stable parquet schemas.
  */
object Schemas {

  // ---- source (per-round ×4; rco_synthsys_live.py) ----

  /** NHM_Call (:25-31) */
  val nhmCall: StructType = StructType(Seq(
    StructField("callID", IntegerType),
    StructField("call", IntegerType),
    StructField("dateOpen", TimestampType),
    StructField("dateClosed", TimestampType)))

  /** NHM_Disciplines (:34-38) */
  val nhmDisciplines: StructType = StructType(Seq(
    StructField("DisciplineID", IntegerType),
    StructField("DisciplineName", StringType)))

  /** NHM_Specific_Disciplines (:200-207) */
  val nhmSpecificDisciplines: StructType = StructType(Seq(
    StructField("SpecificDisciplineID", IntegerType),
    StructField("SpecificDisciplineName", StringType),
    StructField("DisciplineID", IntegerType)))

  /** NHM_OutputTypes (:80-85) / NHM_PublicationStatus (:117-121) */
  val nhmOutputTypes: StructType = StructType(Seq(
    StructField("OutputType_ID", IntegerType),
    StructField("OutputType", StringType)))
  val nhmPublicationStatus: StructType = StructType(Seq(
    StructField("PublicationStatus_ID", IntegerType),
    StructField("PublicationStatus", StringType)))

  /** NHM_Outputs (:96-114) */
  val nhmOutputs: StructType = StructType(Seq(
    StructField("Output_ID", IntegerType),
    StructField("User_ID", IntegerType),
    StructField("OutputType_ID", IntegerType),
    StructField("Authors", StringType),
    StructField("Year", StringType), // dirty; cast to int downstream (etl.py:364)
    StructField("Title", StringType),
    StructField("Publisher", StringType),
    StructField("URL", StringType),
    StructField("Volume", StringType),
    StructField("Pages", StringType),
    StructField("Conference", StringType),
    StructField("Degree", StringType),
    StructField("PublicationStatus_ID", IntegerType)))

  /** Country_Iso_Codes (:18-22) */
  val countryIsoCodes: StructType = StructType(Seq(
    StructField("Country_Code", StringType),
    StructField("Country_Name", StringType)))

  /** T_List_of_Users (:210-243), pipeline-read columns */
  val tListOfUsers: StructType = StructType(Seq(
    StructField("User_ID", IntegerType),
    StructField("Gender", StringType),
    StructField("Nationality_Country_code", StringType),
    StructField("Researcher_status", StringType),
    StructField("Discipline1", IntegerType),
    StructField("Discipline2", IntegerType),
    StructField("Discipline3", IntegerType),
    StructField("Home_Institution_Type", StringType),
    StructField("Home_Institution_Dept", StringType),
    StructField("Home_Institution_Name", StringType),
    StructField("Home_Institution_Town", StringType),
    StructField("Home_Institution_Country_code", StringType),
    StructField("Home_Institution_Postcode", StringType),
    StructField("Number_of_visits", IntegerType),
    StructField("Duration_of_stays", IntegerType),
    StructField("Nationality_OtherText", StringType),
    StructField("Remote_user", StringType),
    StructField("Travel_and_Subsistence_reimbursed", StringType),
    StructField("jobTitle", StringType)))

  /** T_List_of_UserProjects (:294-344), pipeline-read columns */
  val tListOfUserProjects: StructType = StructType(Seq(
    StructField("UserProject_ID", IntegerType),
    StructField("User_ID", IntegerType),
    StructField("UserProject_Title", StringType),
    StructField("UserProject_Objectives", StringType),
    StructField("UserProject_Achievements", StringType),
    StructField("length_of_visit", IntegerType),
    StructField("start_date", TimestampType),
    StructField("finish_date", TimestampType),
    StructField("TAF_ID", IntegerType),
    StructField("Home_Facilities", IntegerType), // TINYINT
    StructField("Application_State", StringType),
    StructField("Acceptance", StringType),
    StructField("UserProject_Summary", StringType),
    StructField("New_User", IntegerType),
    StructField("UserProject_Facility_Reasons", StringType),
    StructField("Submission_Date", StringType), // 'Mon Jan 02 …' form (utils.py:90)
    StructField("Support_Final", IntegerType),
    StructField("Project_Discipline", IntegerType),
    StructField("Project_Specific_Discipline", IntegerType),
    StructField("Call_Submitted", StringType), // 1-based ordinal as text (etl.py:486)
    StructField("Previous_Application", IntegerType),
    StructField("Training_Requirement", StringType),
    StructField("Supporter_Institution", StringType),
    StructField("Administration_State", StringType),
    StructField("Group_leader", IntegerType),
    StructField("Group_Members", StringType),
    StructField("UserProject_Background", StringType),
    StructField("UserProject_Reasons", StringType),
    StructField("UserProject_Expectations", StringType),
    StructField("UserProject_Outputs", StringType),
    StructField("Group_Leader_Institution", StringType),
    StructField("Visit_Funded_Previously", IntegerType)))

  /** NHM_Application_Scores (:347-364) */
  val nhmApplicationScores: StructType = StructType(Seq(
    StructField("Application_Score_ID", IntegerType),
    StructField("UserProject_ID", IntegerType),
    StructField("Methodology_Score", DoubleType),
    StructField("Research_Excellence_Score", DoubleType),
    StructField("Support_Stmt_Score", DoubleType),
    StructField("Justification_Score", DoubleType),
    StructField("Expected_Gains_Score", DoubleType),
    StructField("Scientific_Merit_Score", DoubleType),
    StructField("Societal_Challenge_Score", DoubleType)))

  // ---- resources (SURVEY §2.1 S3–S5) ----

  /** users.csv (resources.py:415-438): per-round comma-packed ID cells. */
  val usersCsv: StructType = StructType(Seq(
    StructField("GUID", LongType),
    StructField("SYNTH_1_ID", StringType),
    StructField("SYNTH_2_ID", StringType),
    StructField("SYNTH_3_ID", StringType),
    StructField("SYNTH_4_ID", StringType),
    StructField("SYNTH_1_AGE", StringType),
    StructField("SYNTH_2_AGE", StringType),
    StructField("SYNTH_3_AGE", StringType),
    StructField("SYNTH_4_AGE", StringType)))

  /** geonamescache city rows (etl.py:677-683). */
  val geoCities: StructType = StructType(Seq(
    StructField("geonameid", IntegerType),
    StructField("name", StringType),
    StructField("alternatenames", ArrayType(StringType)),
    StructField("countrycode", StringType),
    StructField("population", LongType)))

  /** access_request_rebuild.xlsx sheets (resources.py:134-148). */
  val xlsxCategory: StructType = StructType(Seq(
    StructField("Category_ID", IntegerType),
    StructField("CategoryName", StringType),
    StructField("HigherCategoryName", StringType)))
  val xlsxInstitution: StructType = StructType(Seq(
    StructField("Institution_ID", IntegerType),
    StructField("InstitutionAcronym", StringType),
    StructField("InstitutionName", StringType),
    StructField("CountryCode", StringType)))
  val xlsxInstallationFacility: StructType = StructType(Seq(
    StructField("InstallationFacility_ID", IntegerType),
    StructField("InstallationCode", StringType),
    StructField("InstallationFacilityDescription", StringType),
    StructField("Category_ID", IntegerType),
    StructField("Institution_ID", IntegerType)))
  val xlsxAccessRequest: StructType = StructType(Seq(
    StructField("AccessRequest_ID", IntegerType),
    StructField("UserProject_ID", IntegerType),
    StructField("SynthRound", IntegerType),
    StructField("InstallationFacility_ID", IntegerType),
    StructField("DaysRequested", IntegerType),
    StructField("RequestDetail", StringType)))
}
