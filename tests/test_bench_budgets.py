"""Budget-flag path of bench.py (r11 verdict ask #6): the sf1 budget
sheet exists, bench selects it by SF, and the over-budget computation
flags a synthetic regression and clears after the 'fix'."""

import json
import os

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_budget_sheet_selection_by_sf():
    assert bench.budgets_path(1.0).endswith("BENCH_BUDGETS_SF1.json")
    assert bench.budgets_path(0.1).endswith("BENCH_BUDGETS.json")
    assert bench.budgets_path(0.01).endswith("BENCH_BUDGETS.json")
    assert bench.budgets_path(-1.0).endswith("BENCH_BUDGETS.json")


def test_sf1_budget_sheet_covers_headline_set():
    with open(os.path.join(REPO, "BENCH_BUDGETS_SF1.json")) as f:
        ref = json.load(f)["ref_sec"]
    missing = [n for n in bench.HEADLINE if n not in ref]
    assert not missing, f"sf1 budgets missing headline queries: {missing}"
    assert all(v > 0 for v in ref.values())


def test_budget_flags_regression_then_fixed():
    ref = {"q01": 1.0, "x02": 2.0}
    # regression: x02 at 2x its reference is flagged, q01 in-budget is not
    over = bench.budget_flags({"q01": 1.2, "x02": 4.0}, ref)
    assert set(over) == {"x02"}
    assert over["x02"] == {"sec": 4.0, "ref": 2.0}
    # 'fixed': back under 1.5x clears the flag
    assert bench.budget_flags({"q01": 1.2, "x02": 2.9}, ref) == {}
    # unknown queries and zero refs never flag (new headline entries
    # before their budget lands, malformed sheets)
    assert bench.budget_flags({"new_q": 99.0}, ref) == {}
    assert bench.budget_flags({"q01": 99.0}, {"q01": 0}) == {}
