#!/usr/bin/env python3
"""Dev tool (like check.py — NOT an engine dependency): open the SQLite
files written by graft.sink.SqliteWriter with the REAL sqlite3 library
and verify integrity + contents. Generate the files first:

    sbt "testOnly graft.SqliteSinkSpec"   # writes /tmp/graft_sqlite_check/*.db
    python3 tools/check_sqlite.py

Recorded output (2026-08-12, sqlite3 bundled with CPython 3.11):

    /tmp/graft_sqlite_check/jobs.db integrity: [('ok',)]
     schema: [('CREATE TABLE "jobs"("job_name" TEXT, "company" TEXT, "applicants" INTEGER)',)]
     rows: [('區塊鏈工程師', 'Acme 科技', 5), ('資料工程師', 'Beta 資訊', 12), (None, '空值公司', 0)]
    /tmp/graft_sqlite_check/big.db integrity: [('ok',)]
     schema: [('CREATE TABLE "jobs"("job_name" TEXT, "description" TEXT, "rank" INTEGER)',)]
     rows: [(500, 0, 3493, 873250)]
"""
import sqlite3
import sys

CHECKS = [
    ("/tmp/graft_sqlite_check/jobs.db", "SELECT * FROM jobs",
     [("區塊鏈工程師", "Acme 科技", 5), ("資料工程師", "Beta 資訊", 12),
      (None, "空值公司", 0)]),
    ("/tmp/graft_sqlite_check/big.db",
     "SELECT count(*), min(rank), max(rank), sum(rank) FROM jobs",
     [(500, 0, 499 * 7, sum(i * 7 for i in range(500)))]),
    ("/tmp/graft_sqlite_check/deep.db",  # 60k rows, two interior levels
     "SELECT count(*), max(k), sum(k) FROM jobs",
     [(60000, 59999 * 3, sum(i * 3 for i in range(60000)))]),
    ("/tmp/graft_sqlite_check/streamed.db",  # ~300 MB, iterator-streamed
     "SELECT count(*), min(k), max(k), sum(k) FROM jobs",
     [(300000, 0, 299999, sum(range(300000)))]),
]

ok = True
for db, q, expect in CHECKS:
    con = sqlite3.connect(db)
    integ = con.execute("PRAGMA integrity_check").fetchall()
    rows = con.execute(q).fetchall()
    status = "PASS" if (integ == [("ok",)] and rows == expect) else "FAIL"
    ok &= status == "PASS"
    print(f"{status} {db}: integrity={integ[0][0]}, rows={'match' if rows == expect else rows}")
sys.exit(0 if ok else 1)
