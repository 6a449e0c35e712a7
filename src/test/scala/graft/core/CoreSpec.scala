package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's variable tests (test/test_variables.rb:
  * precedence at :21-37,73+; resolution/cycle behavior).
  */
class VariablesSpec extends AnyFunSuite {

  test("expand $name and ${name}") {
    val v = Variables("table" -> "users", "schema" -> "app")
    assert(v.expand("select * from $schema.${table}") == "select * from app.users")
  }

  test("recursive resolution") {
    val v = Variables("a" -> "x", "b" -> "$a/y", "c" -> "$b/z")
    assert(v.expand("$c") == "x/y/z")
    assert(v.resolve().apply("c") == "x/y/z")
  }

  test("undefined variable raises ParameterError") {
    intercept[ParameterError] { Variables.empty.expand("$nope") }
  }

  test("cycle detection") {
    val v = Variables("a" -> "$b", "b" -> "$a")
    intercept[ParameterError] { v.expand("$a") }
  }

  test("self-reference cycle in resolve") {
    val v = Variables("a" -> "pre $a post")
    intercept[ParameterError] { v.resolve() }
  }

  test("union precedence: later layer wins") {
    val globals = Variables("x" -> "global", "y" -> "global")
    val job = Variables("y" -> "job", "z" -> "job")
    val cli = Variables("z" -> "cli")
    val merged = globals.union(job).union(cli)
    assert(merged("x") == "global")
    assert(merged("y") == "job")
    assert(merged("z") == "cli")
  }

  test("listVariables") {
    assert(Variables.listVariables("a $x b ${y} c $x") == Seq("x", "y", "x"))
  }
}

/** Port of test/test_parameters.rb cases: each param type × (job-file,
  * CLI, default, missing).
  */
class ParametersSpec extends AnyFunSuite {

  private val vars = Variables("env" -> "prod")

  test("StringParam expands variables") {
    assert(StringParam("name").parseValue("x-$env", vars) == "x-prod")
  }

  test("BoolParam strictness") {
    assert(BoolParam("f").parseValue(true, vars) == true)
    assert(BoolParam("f").parseValue("false", vars) == false)
    intercept[ParameterError] { BoolParam("f").parseValue("yes", vars) }
  }

  test("DateParam parses ISO date, rejects junk") {
    assert(DateParam("d").parseValue("2024-08-07", vars) ==
      java.time.LocalDate.of(2024, 8, 7))
    intercept[ParameterError] { DateParam("d").parseValue("08/07/2024", vars) }
  }

  test("EnumParam accepts only declared values; default applies") {
    val e = EnumParam("mode", Seq("a", "b"), Some("a"))
    assert(e.parseValue("b", vars) == "b")
    intercept[ParameterError] { e.parseValue("c", vars) }
    assert(e.defaultValue.contains("a"))
  }

  test("DestTableParam publishes dest_table variable") {
    val p = DestTableParam()
    val v = p.parseValue("app.users", vars)
    assert(v == TableSpec(Some("app"), "users"))
    assert(p.toVariables(v) == Map("dest_table" -> "app.users"))
  }

  test("SrcTableParam maps var name -> TableSpec and publishes each") {
    val p = SrcTableParam()
    val v = p.parseValue(Map("src" -> "app.items", "dim" -> "d"), vars)
    assert(p.toVariables(v) == Map("src" -> "app.items", "dim" -> "d"))
  }

  test("SrcTableParam CLI option var=table") {
    val p = SrcTableParam()
    assert(p.parseOption("src=app.items", vars)
      .asInstanceOf[Map[String, TableSpec]]("src") == TableSpec(Some("app"), "items"))
  }

  test("StringListParam: YAML list and comma string") {
    val p = StringListParam("xs")
    assert(p.parseValue(Seq("a", "b"), vars) == Seq("a", "b"))
    assert(p.parseValue("a, b", vars) == Seq("a", "b"))
  }

  test("KeyValuePairsParam: map and legacy comma string") {
    val p = KeyValuePairsParam("options")
    assert(p.parseValue(Map("maxerror" -> 10), vars) == Map("maxerror" -> 10))
    assert(p.parseValue("gzip, maxerror 10", vars) ==
      Map("gzip" -> true, "maxerror" -> "10"))
  }

  test("materialize: CLI > job file > default; missing required raises") {
    val decls = new ParamDecls(Seq(
      StringParam("a"), EnumParam("m", Seq("x", "y"), Some("x")),
      OptionalBoolParam("flag")))
    val p = decls.materialize(Map("a" -> "fromjob", "m" -> "y"), Map("a" -> "fromcli"), vars)
    assert(p.string("a") == "fromcli")
    assert(p.string("m") == "y")
    assert(!p.bool("flag"))
    intercept[ParameterError] { decls.materialize(Map(), Map(), vars) }
  }

  test("undeclared job-file parameter raises") {
    val decls = new ParamDecls(Seq(StringParam("a")))
    intercept[ParameterError] {
      decls.materialize(Map("a" -> "1", "typo" -> "2"), Map(), vars)
    }
  }
}

class SqlStatementSpec extends AnyFunSuite {

  test("metadata header comments") {
    val sql = "--dest-table: app.users\n--src-tables: a, b.c\nselect 1"
    val s = new SqlStatement(sql)
    assert(s.destTable.contains(TableSpec(Some("app"), "users")))
    assert(s.srcTables == Seq(TableSpec(None, "a"), TableSpec(Some("b"), "c")))
  }

  test("bind expands variables; kind sniffs first keyword") {
    val s = new SqlStatement("--dest-table: $t\nINSERT into $t select 1").bind(
      Variables("t" -> "users"))
    assert(s.stripped == "INSERT into users select 1")
    assert(s.kind == "insert")
  }

  test("splitStatements respects quotes and comments") {
    val sql = "select 'a;b'; -- trailing; comment\nselect \";\"; /* c;d */ select 2"
    val stmts = SqlStatement.splitStatements(sql)
    assert(stmts.length == 3)
    assert(stmts(0) == "select 'a;b'")
    assert(stmts(2).endsWith("select 2"))
  }

  test("escaped single quote inside literal") {
    val stmts = SqlStatement.splitStatements("select 'it''s; fine'; select 2")
    assert(stmts.length == 2)
  }

  test("referencedVariables powers auto-declaration") {
    assert(new SqlStatement("select * from $t where d='$dt'").referencedVariables
      == Seq("t", "dt"))
  }

  test("embedded date helper replaces ERB") {
    val out = EmbeddedFunctions.preprocess("where dt = '<%= today - 1 %>'")
    assert(out == s"where dt = '${java.time.LocalDate.now().minusDays(1)}'")
    intercept[JobError] { EmbeddedFunctions.eval("system('rm -rf /')") }
  }
}

class JobFileSpec extends AnyFunSuite {

  test(".job YAML with class key") {
    val jf = JobFile.loadYamlJob("class: noop\nfailure: true\n")
    assert(jf.jobClass == "noop")
    assert(jf.values("failure") == true)
  }

  test(".sql.job embedded header + body") {
    val jf = JobFile.loadSqlJob("/* class: adhoc\ndata-source: sql */\nselect 1;")
    assert(jf.jobClass == "adhoc")
    assert(jf.values("data-source") == "sql")
    assert(jf.inlineScript.contains("select 1;"))
  }

  test(".sql.job without header defaults to sql class") {
    val jf = JobFile.loadSqlJob("select 42")
    assert(jf.jobClass == "sql")
  }

  test("script job with # header") {
    val jf = JobFile.loadScriptJob("# class: exec\n# args: echo hi\necho body\n")
    assert(jf.jobClass == "exec")
  }
}
