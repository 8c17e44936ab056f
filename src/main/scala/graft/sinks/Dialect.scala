package graft.sinks

import java.sql.{Connection, PreparedStatement}

import org.apache.spark.sql.types._

/**
 * SQL dialect abstraction — the Scala port of the reference's
 * `Dialect` interface (Dialect.java:14-68): upsert/delete SQL, DDL
 * type mapping, and identifier normalization, selected by JDBC product
 * name (DialectFactory.java:18-35).
 */
trait Dialect {

  def name: String

  /** Quote an identifier for this dialect. Embedded quote characters
    * are doubled: inferred-schema column names come verbatim from
    * payload JSON keys, so an unescaped quote would let a payload
    * break out of the identifier and into the DDL statement. */
  def quote(ident: String): String =
    "\"" + ident.replace("\"", "\"\"") + "\""

  /** Normalize an identifier the way the target stores unquoted names
    * (PG lowercases, Derby/Oracle uppercase — PostgreSqlDialect.java:95-98). */
  def normalizeIdent(ident: String): String = ident

  /** DDL type for a PRIMARY KEY column — dialects whose default string
    * type cannot be indexed (MySQL TEXT) override this. */
  def pkTypeFor(dt: DataType): String = typeFor(dt)

  /** DDL column type for a Spark type (GenericDialect.java:199-221).
    * The base mapping declares the ANSI INTERVAL forms; every shipped
    * dialect overrides intervals to VARCHAR(64), because the bind
    * layer sends the ANSI literal string ([[JdbcApply.jdbcValue]]) and
    * drivers type a bare setObject(String) as varchar — only a target
    * with an implicit varchar→interval cast could accept the native
    * DDL. The base case remains for custom dialects that add a typed
    * bind. */
  def typeFor(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType => "INTEGER"
    case LongType                  => "BIGINT"
    case FloatType                 => "FLOAT"
    case DoubleType                => "DOUBLE"
    case BooleanType               => "BOOLEAN"
    case d: DecimalType            => s"DECIMAL(${d.precision},${d.scale})"
    case TimestampType             => "TIMESTAMP"
    case DateType                  => "DATE"
    case BinaryType                => "BLOB"
    case _: YearMonthIntervalType  => "INTERVAL YEAR TO MONTH"
    case _: DayTimeIntervalType    => "INTERVAL DAY TO SECOND"
    case _                         => "VARCHAR(4000)"
  }

  def createTableSql(table: String, schema: StructType, pkCols: Seq[String]): String = {
    val cols = schema.fields.map { f =>
      val isPk = pkCols.contains(f.name)
      val notNull = if (isPk) " NOT NULL" else ""
      val tpe = if (isPk) pkTypeFor(f.dataType) else typeFor(f.dataType)
      s"${quote(f.name)} $tpe$notNull"
    }
    val pk = if (pkCols.nonEmpty)
      s", PRIMARY KEY (${pkCols.map(quote).mkString(", ")})" else ""
    s"CREATE TABLE ${quote(table)} (${cols.mkString(", ")}$pk)"
  }

  def addColumnSql(table: String, field: StructField): String =
    s"ALTER TABLE ${quote(table)} ADD COLUMN ${quote(field.name)} ${typeFor(field.dataType)}"

  def deleteSql(table: String, pkCols: Seq[String]): String =
    s"DELETE FROM ${quote(table)} WHERE " +
      pkCols.map(c => s"${quote(c)} = ?").mkString(" AND ")

  /**
   * Apply one upsert row. Single-statement dialects (MySQL/PG) prepare
   * their native upsert; the generic path is update-then-insert.
   * Returns the statement(s) text for preparation by the writer.
   */
  def upsertSql(table: String, cols: Seq[String], pkCols: Seq[String]): UpsertPlan
}

/** Either one native upsert statement (param order = cols ++ extra) or
  * an update+insert fallback pair. */
sealed trait UpsertPlan
/** `sql` binds all column values once in `cols` order (+ repeats per
  * `paramPattern`). */
final case class NativeUpsert(sql: String, bind: (PreparedStatement, Seq[Any]) => Unit)
    extends UpsertPlan
final case class UpdateInsert(updateSql: String, insertSql: String,
    updateBind: (PreparedStatement, Seq[Any], Seq[Any]) => Unit) extends UpsertPlan

/** MySQL / MariaDB: INSERT ... ON DUPLICATE KEY UPDATE (MySqlDialect.java:16-31). */
object MySqlDialect extends Dialect {
  val name = "mysql"
  override def quote(ident: String): String =
    "`" + ident.replace("`", "``") + "`"
  override def typeFor(dt: DataType): String = dt match {
    case StringType => "TEXT"
    case BinaryType => "VARBINARY(4000)"
    case _: YearMonthIntervalType | _: DayTimeIntervalType => "VARCHAR(64)"
    case other      => super.typeFor(other)
  }
  // TEXT cannot carry a key (MySQL 1170 wants a prefix length); string
  // PKs get an indexable VARCHAR instead.
  override def pkTypeFor(dt: DataType): String = dt match {
    case StringType => "VARCHAR(255)"
    case BinaryType => "VARBINARY(255)"
    case other      => typeFor(other)
  }
  def upsertSql(table: String, cols: Seq[String], pkCols: Seq[String]): UpsertPlan = {
    val collist = cols.map(quote).mkString(", ")
    val params = cols.map(_ => "?").mkString(", ")
    val updates = cols.filterNot(pkCols.contains)
      .map(c => s"${quote(c)} = VALUES(${quote(c)})").mkString(", ")
    val sql =
      if (updates.isEmpty)
        s"INSERT IGNORE INTO ${quote(table)} ($collist) VALUES ($params)"
      else
        s"INSERT INTO ${quote(table)} ($collist) VALUES ($params) ON DUPLICATE KEY UPDATE $updates"
    NativeUpsert(sql, (ps, vals) => vals.zipWithIndex.foreach { case (v, i) =>
      ps.setObject(i + 1, v)
    })
  }
}

/** PostgreSQL: INSERT ... ON CONFLICT DO UPDATE (PostgreSqlDialect.java:17-39). */
object PostgreSqlDialect extends Dialect {
  val name = "postgresql"
  // Locale.ROOT: identifier folding must not vary with the JVM locale
  // (Turkish-I would corrupt "ID")
  override def normalizeIdent(ident: String): String =
    ident.toLowerCase(java.util.Locale.ROOT)
  override def typeFor(dt: DataType): String = dt match {
    case StringType => "TEXT"
    case BinaryType => "BYTEA"
    case DoubleType => "DOUBLE PRECISION"
    // VARCHAR, not native INTERVAL: the bind layer sends the ANSI
    // literal as a String, and the PG wire protocol types a bare
    // setObject(String) as varchar — the server rejects varchar →
    // interval without stringtype=unspecified or a ?::interval cast
    // (42804). Lossless VARCHAR beats a DDL type every INSERT fails on.
    case _: YearMonthIntervalType | _: DayTimeIntervalType => "VARCHAR(64)"
    case other      => super.typeFor(other)
  }
  def upsertSql(table: String, cols: Seq[String], pkCols: Seq[String]): UpsertPlan = {
    val collist = cols.map(quote).mkString(", ")
    val params = cols.map(_ => "?").mkString(", ")
    val conflict = pkCols.map(quote).mkString(", ")
    val updates = cols.filterNot(pkCols.contains)
      .map(c => s"${quote(c)} = EXCLUDED.${quote(c)}").mkString(", ")
    val action = if (updates.isEmpty) "DO NOTHING" else s"DO UPDATE SET $updates"
    NativeUpsert(
      s"INSERT INTO ${quote(table)} ($collist) VALUES ($params) ON CONFLICT ($conflict) $action",
      (ps, vals) => vals.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) })
  }
}

/**
 * Generic ANSI dialect (covers Derby and anything unknown): the
 * reference degrades generic upsert to plain INSERT with a warning
 * (GenericDialect.java:55-62); we instead do the standard
 * UPDATE-then-INSERT two-step, which preserves upsert semantics on any
 * ANSI target — a deliberate improvement over the reference.
 */
object GenericDialect extends Dialect {
  val name = "generic"
  override def normalizeIdent(ident: String): String =
    ident.toUpperCase(java.util.Locale.ROOT)
  override def typeFor(dt: DataType): String = dt match {
    case StringType => "VARCHAR(4000)"
    // Derby (the tested generic target) has no INTERVAL type: store
    // the ANSI literal form losslessly
    case _: YearMonthIntervalType | _: DayTimeIntervalType => "VARCHAR(64)"
    case other      => super.typeFor(other)
  }
  def upsertSql(table: String, cols: Seq[String], pkCols: Seq[String]): UpsertPlan = {
    val nonPk = cols.filterNot(pkCols.contains)
    val insertSql = s"INSERT INTO ${quote(table)} (${cols.map(quote).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val updateSql =
      if (nonPk.isEmpty) "" // all-PK table: INSERT-if-absent only
      else s"UPDATE ${quote(table)} SET ${nonPk.map(c => s"${quote(c)} = ?").mkString(", ")} " +
        s"WHERE ${pkCols.map(c => s"${quote(c)} = ?").mkString(" AND ")}"
    UpdateInsert(updateSql, insertSql, (ps, nonPkVals, pkVals) => {
      var i = 1
      nonPkVals.foreach { v => ps.setObject(i, v); i += 1 }
      pkVals.foreach { v => ps.setObject(i, v); i += 1 }
    })
  }
}

/** Dialect by JDBC product name (DialectFactory.java:18-35). */
object Dialects {
  def forConnection(conn: Connection): Dialect =
    forProductName(conn.getMetaData.getDatabaseProductName)

  def forProductName(product: String): Dialect = {
    val p = Option(product).getOrElse("").toLowerCase(java.util.Locale.ROOT)
    if (p.contains("mysql") || p.contains("mariadb")) MySqlDialect
    else if (p.contains("postgresql")) PostgreSqlDialect
    else GenericDialect
  }
}
