package graft.sinks

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** SQL-dump sink (S12/F25; /root/reference/synth/etl.py:80-146): emit
  * `CREATE TABLE` DDL plus one `INSERT INTO t VALUES (...)` per row, with
  * the reference's literal serialisation rules (etl.py:98-128):
  *  - booleans → TRUE / FALSE keywords
  *  - NULL → `null`
  *  - strings & datetimes → `'...'` with embedded `'` escaped as `\'`
  *  - numbers → bare
  *  - any other type → job failure (explicit, to avoid silent drift)
  *
  * Spark shape: the statement text is built columnarly (concat of per-column
  * literal expressions, whole-stage codegen) and written as a distributed
  * text dataset — no driver-side row loop. `dumpSql` collects only for the
  * convenience single-file form used in tests.
  */
object SqlDump {

  /** Literal serialiser for one column (F25). */
  def serialise(c: Column, dt: DataType): Column = {
    val quoted: Column => Column = v =>
      concat(lit("'"), regexp_replace(v, "'", java.util.regex.Matcher.quoteReplacement("\\'")), lit("'"))
    val body = dt match {
      case BooleanType => when(c, "TRUE").otherwise("FALSE")
      case StringType  => quoted(c)
      case TimestampType | DateType =>
        // str(datetime) in Python: 'YYYY-MM-DD HH:MM:SS'
        quoted(date_format(c, "yyyy-MM-dd HH:mm:ss"))
      case _: NumericType => c.cast("string")
      case other =>
        throw new IllegalArgumentException(
          s"No serialisation mapping exists for type $other (etl.py:125-128 contract)")
    }
    coalesce(body, lit("null"))
  }

  /** `CREATE TABLE` DDL from the DataFrame schema. */
  def createTableDdl(df: DataFrame, table: String): String = {
    val cols = df.schema.fields.map { f =>
      val sqlType = f.dataType match {
        case StringType    => "TEXT"
        case IntegerType   => "INTEGER"
        case LongType      => "BIGINT"
        case DoubleType    => "DOUBLE"
        case BooleanType   => "BOOLEAN"
        case TimestampType => "DATETIME"
        case DateType      => "DATE"
        case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
        case other => other.sql
      }
      s"\t`${f.name}` $sqlType"
    }
    s"CREATE TABLE `$table` (\n${cols.mkString(",\n")}\n);"
  }

  /** One INSERT statement per row, as a distributed single-column frame. */
  def insertStatements(df: DataFrame, table: String): DataFrame = {
    val parts = df.schema.fields.map(f => serialise(col(f.name), f.dataType))
    val values = parts.reduceOption((a, b) => concat(a, lit(", "), b)).getOrElse(lit(""))
    df.select(concat(lit(s"INSERT INTO $table VALUES ("), values, lit(");")).as("stmt"))
  }

  /** Distributed dump: DDL header + statements written as text files. */
  def write(df: DataFrame, table: String, outDir: String): Unit = {
    insertStatements(df, table).write.mode("overwrite").text(outDir)
  }

  /** Single-string dump for tests / small tables (driver-side collect). */
  def dumpSql(df: DataFrame, table: String): String = {
    val rows = insertStatements(df, table).collect().map(_.getString(0))
    (s"# create for $table" +: createTableDdl(df, table) +: s"# data for $table" +: rows)
      .mkString("\n")
  }
}
