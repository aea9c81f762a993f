package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** S7 session layer: filter-shape goldens against the reference's
  * buildFilterSchemaTable demo, the window state machine's
  * rotation/idle/mine transitions, and window-plan coverage.
  */
class LogMinerSessionSpec extends AnyFunSuite {
  import LogMinerSession._

  test("schemaFilter reproduces the reference's AND(OR...)/AND shape") {
    val f = schemaFilter(
      Seq("TEST1" -> Seq("t1", "t2"), "TEST2" -> Seq("t3", "t4"), "test" -> Nil),
      Seq("TEST3" -> Nil, "TEST4" -> Seq("t3", "t4")))
    assert(f ==
      " AND( ( seg_owner = 'TEST1' AND table_name in ('t1','t2'))" +
        " OR ( seg_owner = 'TEST2' AND table_name in ('t3','t4'))" +
        " OR ( seg_owner = 'test') )" +
        " AND ( seg_owner <> 'TEST3')" +
        " AND ( seg_owner = 'TEST4' AND table_name not in ('t3','t4'))")
    assert(schemaFilter(Nil, Nil) == "")
    // literal quoting
    assert(schemaFilter(Seq("O'BRIEN" -> Nil), Nil).contains("'O''BRIEN'"))
  }

  test("contentsQuery passes tx-control ops unconditionally, routes DML/DDL") {
    val q = contentsQuery(100, 200, schemaFilter(Seq("SHOP" -> Nil), Nil))
    assert(q.contains("SCN > 100 AND SCN <= 200"))
    assert(q.contains(s"operation_code IN ($OpStart,$OpCommit,$OpMissScn,$OpRollback)"))
    assert(q.contains(s"operation_code IN ($OpInsert,$OpDelete,$OpUpdate,$OpDdl)"))
    systemSchemas.foreach(s => assert(q.contains(s"'$s'")))
    assert(q.contains("( seg_owner = 'SHOP')"))
  }

  test("session statements carry the options the reference sets") {
    val start = startWindowStatement(5, 10)
    for (opt <- Seq("skip_corruption", "no_sql_delimiter", "NO_ROWID_IN_STMT",
        "DICT_FROM_REDO_LOGS", "DDL_DICT_TRACKING", "startSCN => 5", "endScn => 10"))
      assert(start.contains(opt), s"missing $opt")
    assert(buildDictionaryStatement.contains("STORE_IN_REDO_LOGS"))
    assert(addLogfileStatement("/u01/redo01.log").contains("'/u01/redo01.log'"))
    assert(addLogfileStatement("it's.log").contains("'it''s.log'"))
    assert(logFilesQuery(42).contains("first_change# >= 42"))
    assert(endSessionStatement.contains("end_logmnr"))
  }

  test("advance: rotation forces re-init before mining; idle on no growth") {
    val s0 = WindowState(100L, "group:1,seq:7")
    // rotation detected: re-init from the current low edge, fp updates
    val (a1, s1) = advance(s0, 500L, "group:1,seq:8")
    assert(a1 == Reinit(100L) && s1 == WindowState(100L, "group:1,seq:8"))
    // no growth: idle, state unchanged
    val (a2, s2) = advance(s1, 100L, "group:1,seq:8")
    assert(a2 == Idle && s2 == s1)
    // SCN probe BEHIND the low edge (lagging standby after failover):
    // idle, never an inverted mine window
    val (aBehind, sBehind) = advance(s1, 50L, "group:1,seq:8")
    assert(aBehind == Idle && sBehind == s1)
    // growth: mine the bounded window, low edge advances
    val (a3, s3) = advance(s2, 500L, "group:1,seq:8")
    assert(a3 == Mine(100L, 500L) && s3.startScn == 500L)
  }

  test("windowPlan partitions the SCN range exactly: no gap, no overlap, clipped tail") {
    val plan = windowPlan(0L, 9_999L, 2000L, "")
    assert(plan.map(_._1) == (0L until 5L))
    assert(plan.head._2 == 0L && plan.last._3 == 9999L)
    plan.sliding(2).foreach { case Seq(a, b) => assert(a._3 == b._2); case _ => }
    plan.foreach { case (_, lo, hi, sql) =>
      assert(sql.contains(s"SCN > $lo AND SCN <= $hi"))
    }
    assert(windowPlan(5L, 5L, 2000L, "").isEmpty)
  }
}
