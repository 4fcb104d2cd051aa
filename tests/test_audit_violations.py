"""The full-program per-operator invariant audits (rlerrorgenerator_spark/
audit.py) must report zero violations — these run the complete fixed-seed
injection programs (pages + persons domains) and check every §2.A
operator's defining contract over the resulting lineage.

(The driver-visible er_op_* queries are now the cross-engine md5 oracles
from oracle_er.py; the audits stay pytest-enforced here plus the
aggregated ``er_audit_violations`` driver query.)
"""

from __future__ import annotations

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def test_all_audit_violations_zero(spark):
    df = entry_mod.queries()["er_audit_violations"](spark, SF_DIR)
    rows = {r["op"]: r["violations"] for r in df.collect()}
    assert len(rows) >= 25, f"expected >=25 audited ops, got {sorted(rows)}"
    bad = {k: v for k, v in rows.items() if v != 0}
    assert not bad, f"non-zero audit violations: {bad}"


def test_calibration_audit(spark):
    df = entry_mod.queries()["er_op_calibration"](spark, SF_DIR)
    rows = df.collect()
    assert rows, "calibration audit returned no rows"
    assert all(r["reached"] == 1 for r in rows)
