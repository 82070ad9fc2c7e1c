"""Fleet-wide physical-plan audit (SURVEY.md §4): no query may regress into
an accidental cartesian product or row-at-a-time Python evaluation. These
are the two silent 100 TB killers — results stay correct while cost
explodes, so only a plan assertion catches them.

The whitelists/exclusions are single-sourced in pycaim_spark/planaudit.py,
shared with tools/gen_plans_md.py — whose committed PLANS_BASELINE.json is
the registry-wide shuffle-count regression gate (`python
tools/gen_plans_md.py --check`); here we additionally assert the baseline
COVERS the registry, so a new query cannot ship un-audited."""

from __future__ import annotations

import json
import os

import pytest

from pycaim_spark.planaudit import (
    CARTESIAN_OK,
    EXECUTES_AT_BUILD,
    ROW_PYTHON_OK,
    is_effectful,
    plan_string,
)
from pycaim_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

_AUDITABLE = sorted(
    n for n in REGISTRY if not is_effectful(n, REGISTRY[n].tags)
)


@pytest.mark.parametrize("name", _AUDITABLE)
def test_plan_has_no_silent_scale_killers(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    plan = plan_string(df)
    if name not in CARTESIAN_OK:
        assert "CartesianProduct" not in plan, f"{name}: unplanned cartesian"
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unplanned nested-loop join"
        )
    if name not in ROW_PYTHON_OK:
        assert "BatchEvalPython" not in plan, (
            f"{name}: row-at-a-time Python in the plan"
        )


def test_shuffle_baseline_covers_registry():
    """Every statically-auditable query must appear in the committed
    shuffle-count baseline — a new operator cannot ship without a recorded
    plan budget (regenerate with `python tools/gen_plans_md.py`; gate
    count regressions with `--check`)."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS_BASELINE.json",
    )
    with open(path) as f:
        baseline = json.load(f)["queries"]
    # EXECUTES_AT_BUILD queries run jobs at fn() time, so the sf0.1
    # baseline generator skips them; this sf0.001 forbidden-node audit is
    # their only (cheap) plan gate.
    missing = [
        n for n in _AUDITABLE
        if n not in baseline and n not in EXECUTES_AT_BUILD
    ]
    assert not missing, (
        f"queries missing from PLANS_BASELINE.json: {missing} — run "
        "python tools/gen_plans_md.py and commit the refreshed baseline"
    )
