package graft

import graft.ddl.OracleDdlConverter
import org.scalatest.funsuite.AnyFunSuite

/** Goldens mirror the reference's parseDDLSQL tests byte for byte
  * (`driver/oracle/extractor/log_miner_test.go:295-720` —
  * TestParseDDLSQL, TestParseDDLSQLDROP, TestParseAlterTable,
  * TestParseDropTable, TestParseConstraintSQL).
  */
class OracleDdlConverterSpec extends AnyFunSuite {

  private def conv(sql: String): OracleDdlConverter.Converted =
    OracleDdlConverter.convert(sql, "").fold(
      e => fail(s"convert failed: $e\n  on: $sql"), identity)

  // --- TestParseDDLSQL: the full type matrix, one golden per Oracle type
  private val typeMatrix: Seq[(String, String)] = Seq(
    "CREATE TABLE TEST.NUMBER_WILDCARD_COLUMNS(ID INT, C_NUMBER NUMBER(*));" ->
      "CREATE TABLE `TEST`.`NUMBER_WILDCARD_COLUMNS` (`ID` INT,`C_NUMBER` DOUBLE) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.BFILE_COLUMNS(ID INT, C_BFILE BFILE);" ->
      "CREATE TABLE `TEST`.`BFILE_COLUMNS` (`ID` INT,`C_BFILE` VARCHAR(255)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.BINARY_FLOAT_COLUMNS(ID INT, C_BINARY_FLOAT BINARY_FLOAT);" ->
      "CREATE TABLE `TEST`.`BINARY_FLOAT_COLUMNS` (`ID` INT,`C_BINARY_FLOAT` FLOAT) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.BINARY_DOUBLE_COLUMNS(ID INT, C_BINARY_DOUBLE BINARY_DOUBLE);" ->
      "CREATE TABLE `TEST`.`BINARY_DOUBLE_COLUMNS` (`ID` INT,`C_BINARY_DOUBLE` DOUBLE) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.BLOB_COLUMNS(ID INT, C_BLOB BLOB);" ->
      "CREATE TABLE `TEST`.`BLOB_COLUMNS` (`ID` INT,`C_BLOB` LONGBLOB) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.CHAR_255_COLUMNS(ID INT, C_CHAR CHAR(255));" ->
      "CREATE TABLE `TEST`.`CHAR_255_COLUMNS` (`ID` INT,`C_CHAR` CHAR(255)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.CHARACTER_255_COLUMNS(ID INT, C_CHARACTER CHARACTER(255));" ->
      "CREATE TABLE `TEST`.`CHARACTER_255_COLUMNS` (`ID` INT,`C_CHARACTER` CHAR(255)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.CHARACTER_256_COLUMNS(ID INT, C_CHARACTER CHARACTER(256));" ->
      "CREATE TABLE `TEST`.`CHARACTER_256_COLUMNS` (`ID` INT,`C_CHARACTER` VARCHAR(256)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.CLOB_COLUMNS(ID INT, C_CLOB CLOB);" ->
      "CREATE TABLE `TEST`.`CLOB_COLUMNS` (`ID` INT,`C_CLOB` LONGTEXT) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.DATE_COLUMNS(ID INT, C_DATE DATE);" ->
      "CREATE TABLE `TEST`.`DATE_COLUMNS` (`ID` INT,`C_DATE` DATETIME) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.DECIMAL_COLUMNS(ID INT, C_DECIMAL DECIMAL(11, 3));" ->
      "CREATE TABLE `TEST`.`DECIMAL_COLUMNS` (`ID` INT,`C_DECIMAL` DECIMAL(11,3)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.DEC_COLUMNS(ID INT, C_DEC DEC(11, 3));" ->
      "CREATE TABLE `TEST`.`DEC_COLUMNS` (`ID` INT,`C_DEC` DECIMAL(11,3)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.DOUBLE_PRECISION_COLUMNS(ID INT, C_DOUBLE_PRECISION DOUBLE PRECISION);" ->
      "CREATE TABLE `TEST`.`DOUBLE_PRECISION_COLUMNS` (`ID` INT,`C_DOUBLE_PRECISION` DOUBLE) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.FLOAT_COLUMNS(ID INT, C_FLOAT FLOAT(11));" ->
      "CREATE TABLE `TEST`.`FLOAT_COLUMNS` (`ID` INT,`C_FLOAT` DOUBLE) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.INTEGER_COLUMNS(ID INT, C_INTEGER INTEGER);" ->
      "CREATE TABLE `TEST`.`INTEGER_COLUMNS` (`ID` INT,`C_INTEGER` INT) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.INT_COLUMNS(ID INT, C_INT INT);" ->
      "CREATE TABLE `TEST`.`INT_COLUMNS` (`ID` INT,`C_INT` INT) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.INTERVAL_YEAR_COLUMNS(ID INT, C_INTERVAL_YEAR INTERVAL YEAR(3) TO MONTH);" ->
      "CREATE TABLE `TEST`.`INTERVAL_YEAR_COLUMNS` (`ID` INT,`C_INTERVAL_YEAR` VARCHAR(30)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.INTERVAL_DAY_COLUMNS(ID INT, C_INTERVAL_DAY INTERVAL DAY(3) TO SECOND(5));" ->
      "CREATE TABLE `TEST`.`INTERVAL_DAY_COLUMNS` (`ID` INT,`C_INTERVAL_DAY` VARCHAR(30)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.LONG_COLUMNS(ID INT, C_LONG LONG);" ->
      "CREATE TABLE `TEST`.`LONG_COLUMNS` (`ID` INT,`C_LONG` LONGTEXT) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.LONG_RAW_COLUMNS(ID INT, C_LONG_RAW LONG RAW);" ->
      "CREATE TABLE `TEST`.`LONG_RAW_COLUMNS` (`ID` INT,`C_LONG_RAW` LONGBLOB) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.NCHAR_255_COLUMNS(ID INT, C_NCHAR NCHAR(255));" ->
      "CREATE TABLE `TEST`.`NCHAR_255_COLUMNS` (`ID` INT,`C_NCHAR` CHAR(255)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.NCHAR_256_COLUMNS(ID INT, C_NCHAR NCHAR(256));" ->
      "CREATE TABLE `TEST`.`NCHAR_256_COLUMNS` (`ID` INT,`C_NCHAR` VARCHAR(256)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.NCHAR_VARYING_COLUMNS(ID INT, C_NCHAR_VARYING NCHAR VARYING(2000));" ->
      "CREATE TABLE `TEST`.`NCHAR_VARYING_COLUMNS` (`ID` INT,`C_NCHAR_VARYING` VARCHAR(2000)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.NCLOB_COLUMNS(ID INT, C_NCLOB NCLOB);" ->
      "CREATE TABLE `TEST`.`NCLOB_COLUMNS` (`ID` INT,`C_NCLOB` TEXT) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.NUMBER_2_COLUMNS(ID INT, C_NUMBER NUMBER(2));" ->
      "CREATE TABLE `TEST`.`NUMBER_2_COLUMNS` (`ID` INT,`C_NUMBER` TINYINT) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.NUMBER_4_COLUMNS(ID INT, C_NUMBER NUMBER(4, 0));" ->
      "CREATE TABLE `TEST`.`NUMBER_4_COLUMNS` (`ID` INT,`C_NUMBER` SMALLINT) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.NUMBER_8_COLUMNS(ID INT, C_NUMBER NUMBER(8));" ->
      "CREATE TABLE `TEST`.`NUMBER_8_COLUMNS` (`ID` INT,`C_NUMBER` INT) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.NUMBER_18_COLUMNS(ID INT, C_NUMBER NUMBER(18, 0));" ->
      "CREATE TABLE `TEST`.`NUMBER_18_COLUMNS` (`ID` INT,`C_NUMBER` BIGINT) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.NUMBER_38_COLUMNS(ID INT, C_NUMBER NUMBER(38));" ->
      "CREATE TABLE `TEST`.`NUMBER_38_COLUMNS` (`ID` INT,`C_NUMBER` DECIMAL(38)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.NUMBER_38_COLUMNS(ID INT, C_NUMBER NUMBER(38,31));" ->
      "CREATE TABLE `TEST`.`NUMBER_38_COLUMNS` (`ID` INT,`C_NUMBER` DECIMAL(38,30)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.NUMBER_8_2_COLUMNS(ID INT, C_NUMBER NUMBER(8, 2));" ->
      "CREATE TABLE `TEST`.`NUMBER_8_2_COLUMNS` (`ID` INT,`C_NUMBER` DECIMAL(8,2)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.NUMBER_COLUMNS(ID INT, C_NUMBER NUMBER);" ->
      "CREATE TABLE `TEST`.`NUMBER_COLUMNS` (`ID` INT,`C_NUMBER` DOUBLE) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.NUMERIC_COLUMNS(ID INT, C_NUMERIC NUMERIC(8, 2));" ->
      "CREATE TABLE `TEST`.`NUMERIC_COLUMNS` (`ID` INT,`C_NUMERIC` DECIMAL(8,2)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.NVARCHAR2_COLUMNS(ID INT, C_NVARCHAR2 NVARCHAR2(256));" ->
      "CREATE TABLE `TEST`.`NVARCHAR2_COLUMNS` (`ID` INT,`C_NVARCHAR2` VARCHAR(256)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.RAW_COLUMNS(ID INT, C_RAW RAW(256));" ->
      "CREATE TABLE `TEST`.`RAW_COLUMNS` (`ID` INT,`C_RAW` VARBINARY(256)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.REAL_COLUMNS(ID INT, C_REAL REAL);" ->
      "CREATE TABLE `TEST`.`REAL_COLUMNS` (`ID` INT,`C_REAL` DOUBLE) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.ROWID_COLUMNS(ID INT, C_ROWID ROWID);" ->
      "CREATE TABLE `TEST`.`ROWID_COLUMNS` (`ID` INT,`C_ROWID` CHAR(100)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.SMALLINT_COLUMNS(ID INT, C_SMALLINT SMALLINT);" ->
      "CREATE TABLE `TEST`.`SMALLINT_COLUMNS` (`ID` INT,`C_SMALLINT` DECIMAL(38)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.TIMESTAMP_COLUMNS(ID INT, C_TIMESTAMP TIMESTAMP(9));" ->
      "CREATE TABLE `TEST`.`TIMESTAMP_COLUMNS` (`ID` INT,`C_TIMESTAMP` DATETIME(6)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.TIMESTAMP_ZONE_COLUMNS(ID INT, C_TIMESTAMP_ZONE TIMESTAMP(9) WITH TIME ZONE);" ->
      "CREATE TABLE `TEST`.`TIMESTAMP_ZONE_COLUMNS` (`ID` INT,`C_TIMESTAMP_ZONE` DATETIME(6)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.UROWID_COLUMNS(ID INT, C_UROWID UROWID(256));" ->
      "CREATE TABLE `TEST`.`UROWID_COLUMNS` (`ID` INT,`C_UROWID` VARCHAR(256)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.VARCHAR_COLUMNS(ID INT, C_VARCHAR VARCHAR(256));" ->
      "CREATE TABLE `TEST`.`VARCHAR_COLUMNS` (`ID` INT,`C_VARCHAR` VARCHAR(256)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.VARCHAR2_COLUMNS(ID INT, C_VARCHAR2 VARCHAR2(256));" ->
      "CREATE TABLE `TEST`.`VARCHAR2_COLUMNS` (`ID` INT,`C_VARCHAR2` VARCHAR(256)) DEFAULT CHARACTER SET = UTF8MB4",
    "CREATE TABLE TEST.XMLTYPE_COLUMNS(ID INT, C_XMLTYPE XMLTYPE);" ->
      "CREATE TABLE `TEST`.`XMLTYPE_COLUMNS` (`ID` INT,`C_XMLTYPE` LONGTEXT) DEFAULT CHARACTER SET = UTF8MB4")

  test("type matrix — every TestParseDDLSQL golden") {
    typeMatrix.foreach { case (sql, want) =>
      assert(conv(sql).sql == want, s"\n  on: $sql")
    }
  }

  test("create fields: schema/table/kind/flag/ordinals") {
    val c = conv("CREATE TABLE TEST.CHAR_255_COLUMNS(ID INT, C_CHAR CHAR(255));")
    assert(c.schema == "TEST" && c.table == "CHAR_255_COLUMNS")
    assert(c.kind == "create_table" && c.createSchemaIfNotExists)
    assert(c.columns == Seq("ID", "C_CHAR"))
  }

  test("drop table — quoted table keeps case (TestParseDDLSQLDROP)") {
    val c = conv("""DROP TABLE test."persons";""")
    assert(c.sql == "DROP TABLE `TEST`.`persons`")
    assert(c.schema == "TEST" && c.table == "persons" && c.kind == "drop_table")
    assert(!c.createSchemaIfNotExists)
  }

  test("drop table — unquoted (TestParseDropTable)") {
    assert(conv("DROP TABLE TEST.DROPTABLE").sql == "DROP TABLE `TEST`.`DROPTABLE`")
  }

  test("alter add column (TestParseAlterTable ADDCOLUMN)") {
    val c = conv("alter table TEST.ADDCOLUMN add (author_last_published date);")
    assert(c.sql == "ALTER TABLE `TEST`.`ADDCOLUMN` ADD COLUMN (`AUTHOR_LAST_PUBLISHED` DATETIME)")
    assert(c.kind == "alter_table" && c.columns == Seq("AUTHOR_LAST_PUBLISHED"))
  }

  test("alter modify columns — quoted table, spaced sizes (MODIFYCOLUMN)") {
    val c = conv("""ALTER TABLE test."MODIFYCOLUMN" MODIFY ( alter_new_name1 CHAR ( 13 )) MODIFY ( alter_name2 VARCHAR ( 66 ))""")
    assert(c.sql == "ALTER TABLE `TEST`.`MODIFYCOLUMN` MODIFY COLUMN `ALTER_NEW_NAME1` CHAR(13), MODIFY COLUMN `ALTER_NAME2` VARCHAR(66)")
  }

  test("alter drop columns — list form (DROPCOLUMN)") {
    val c = conv("alter table TEST.DROPCOLUMN drop (COL1, COL2);")
    assert(c.sql == "ALTER TABLE `TEST`.`DROPCOLUMN` DROP COLUMN `TEST`.`DROPCOLUMN`.`COL1`, DROP COLUMN `TEST`.`DROPCOLUMN`.`COL2`")
  }

  test("alter drop column — single form (DROPCOLUMN1)") {
    val c = conv("alter table TEST.DROPCOLUMN1 drop column COL1")
    assert(c.sql == "ALTER TABLE `TEST`.`DROPCOLUMN1` DROP COLUMN `TEST`.`DROPCOLUMN1`.`COL1`")
  }

  test("alter rename column (RENAMECOLUMN)") {
    val c = conv("alter table TEST.RENAMECOLUMN RENAME  COLUMN COL1 TO COLNEW1")
    assert(c.sql == "ALTER TABLE `TEST`.`RENAMECOLUMN` RENAME COLUMN `TEST`.`RENAMECOLUMN`.`COL1` TO `TEST`.`RENAMECOLUMN`.`COLNEW1`")
  }

  test("inline constraints + defaults + comments (TestParseConstraintSQL userInfo)") {
    val sql =
      """create table TEST.userInfo (
        |				id number(6) primary key,--主键
        |				name varchar2(20) not null,--非空
        |				sex number(1),
        |				age number(3) default 18,
        |				birthday date,
        |				address varchar2(50),
        |				email varchar2(25) unique,--唯一
        |				tel number(11)
        |				-- deptno number(2) references dept(deptno) -- 外键
        |				)""".stripMargin
    assert(conv(sql).sql ==
      "CREATE TABLE `TEST`.`USERINFO` (`ID` INT PRIMARY KEY,`NAME` VARCHAR(20) NOT NULL,`SEX` TINYINT,`AGE` SMALLINT,`BIRTHDAY` DATETIME,`ADDRESS` VARCHAR(50),`EMAIL` VARCHAR(25) UNIQUE KEY,`TEL` BIGINT) DEFAULT CHARACTER SET = UTF8MB4")
  }

  test("named inline + out-of-line constraints (createOutOfLineConstraint)") {
    val sql =
      """CREATE TABLE TEST.employees_demo
        |				( employee_id    NUMBER(6)
        |				, first_name     VARCHAR2(20)
        |				, last_name      VARCHAR2(25)
        |					 CONSTRAINT emp_last_name_nn_demo NOT NULL
        |				, email          VARCHAR2(25)
        |					 CONSTRAINT emp_email_nn_demo     NOT NULL
        |				, phone_number   VARCHAR2(20)
        |				, hire_date      DATE
        |					 CONSTRAINT emp_hire_date_nn_demo  NOT NULL
        |				, job_id         VARCHAR2(10)
        |				   CONSTRAINT     emp_job_nn_demo  NOT NULL
        |				, salary         NUMBER(8,2)
        |				   CONSTRAINT     emp_salary_nn_demo  NOT NULL
        |				, commission_pct NUMBER(2,2)
        |				, manager_id     NUMBER(6)
        |				, department_id  NUMBER(4)
        |				, dn             VARCHAR2(300)
        |				, CONSTRAINT     emp_email_uk_demo
        |								 UNIQUE (email)
        |				)""".stripMargin
    assert(conv(sql).sql ==
      "CREATE TABLE `TEST`.`EMPLOYEES_DEMO` (`EMPLOYEE_ID` INT,`FIRST_NAME` VARCHAR(20),`LAST_NAME` VARCHAR(25) NOT NULL,`EMAIL` VARCHAR(25) NOT NULL,`PHONE_NUMBER` VARCHAR(20),`HIRE_DATE` DATETIME NOT NULL,`JOB_ID` VARCHAR(10) NOT NULL,`SALARY` DECIMAL(8,2) NOT NULL,`COMMISSION_PCT` DECIMAL(2,2),`MANAGER_ID` INT,`DEPARTMENT_ID` SMALLINT,`DN` VARCHAR(300),UNIQUE `EMP_EMAIL_UK_DEMO`(`email`)) DEFAULT CHARACTER SET = UTF8MB4")
  }

  test("alter constraint clauses are no-ops; sibling clauses still convert") {
    // the reference's Add/Modify/Rename/DropConstraintClause branches
    // are `// todo` no-ops (log_miner.go:1230-1237): the clause
    // vanishes, the statement's other clauses survive
    val c = conv("ALTER TABLE TEST.T ADD CONSTRAINT pk_t PRIMARY KEY (ID) ADD (C2 DATE)")
    assert(c.sql == "ALTER TABLE `TEST`.`T` ADD COLUMN (`C2` DATETIME)")
    assert(conv("ALTER TABLE TEST.T DROP CONSTRAINT uk_t MODIFY (C1 CHAR(10))").sql ==
      "ALTER TABLE `TEST`.`T` MODIFY COLUMN `C1` CHAR(10)")
    // an ALTER whose every clause is a constraint no-op fails loudly
    // (nothing to forward), not silently as an empty ALTER
    assert(OracleDdlConverter.convert(
      "ALTER TABLE TEST.T ADD CONSTRAINT pk_t PRIMARY KEY (ID)", "X").isLeft)
  }

  test("segOwner resolves a missing schema qualifier") {
    val c = OracleDdlConverter.convert("CREATE TABLE T1(ID INT)", "OWNER1").toOption.get
    assert(c.schema == "OWNER1")
    assert(c.sql == "CREATE TABLE `OWNER1`.`T1` (`ID` INT) DEFAULT CHARACTER SET = UTF8MB4")
  }

  test("scale cap (LimitSize): NUMBER/NUMERIC scale clamps at 30") {
    assert(conv("CREATE TABLE TEST.T(C NUMERIC(38, 35))").sql.contains("DECIMAL(38,30)"))
  }

  test("unsupported statements surface an error, not garbage") {
    assert(OracleDdlConverter.convert("CREATE INDEX I1 ON T1(C1)", "X").isLeft)
    assert(OracleDdlConverter.convert("GRANT SELECT ON T1 TO U1", "X").isLeft)
  }

  test("byte/char length qualifiers parse and drop") {
    assert(conv("CREATE TABLE TEST.T(C VARCHAR2(20 BYTE), D CHAR(3 CHAR))").sql ==
      "CREATE TABLE `TEST`.`T` (`C` VARCHAR(20),`D` CHAR(3)) DEFAULT CHARACTER SET = UTF8MB4")
  }

  test("timestamp default fsp is oracle's 6") {
    assert(conv("CREATE TABLE TEST.T(C TIMESTAMP)").sql.contains("DATETIME(6)"))
  }

  test("CHAR beyond Oracle's 2000 cap maps to VARCHAR (deliberate extension)") {
    // the reference's table (sql_parse.go DataDefChar) covers 1..2000
    // only — larger sizes are invalid Oracle DDL it never sees. We
    // extend rather than drop: parse, emit VARCHAR(n).
    assert(conv("CREATE TABLE TEST.T(C CHAR(2001))").sql.contains("VARCHAR(2001)"))
    assert(conv("CREATE TABLE TEST.T(C CHAR(4000))").sql.contains("VARCHAR(4000)"))
    // the in-range boundaries stay the reference's
    assert(conv("CREATE TABLE TEST.T(C CHAR(2000))").sql.contains("VARCHAR(2000)"))
    assert(conv("CREATE TABLE TEST.T(C CHAR(255))").sql.contains("CHAR(255)"))
  }
}
