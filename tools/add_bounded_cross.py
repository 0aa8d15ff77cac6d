"""One-off migration: move the cartesian-lint allowlist from the
hand-list in tests/test_plans.py to ``bounded_cross=`` annotations at
each @query registration site. Safe to re-run (idempotent)."""

from __future__ import annotations

import pathlib
import re
import sys

REASONS = {
    # declared pairwise / cross semantics
    "join_cross_dims": "declared cross-dims semantics over two tiny dims",
    "join_theta_self": "declared theta self-join over a bounded slice",
    "div_eval_edge": "declared pairwise diversity over the k-bounded solution set",
    "div_eval_clique": "declared pairwise diversity over the k-bounded solution set",
    "div_eval_star": "declared pairwise diversity over the k-bounded solution set",
    "div_random_baseline": "pairwise eval over the k-bounded random solution",
    "sim_search_topk": "theta tier of the size-dispatched distance join (<=128 rows)",
    "dedup_embedding": "pairwise tier over the bounded candidate set",
    # scalar-subquery broadcast joins (one-row side)
    "tpch_q11": "1-row scalar-subquery broadcast (group-value threshold)",
    "tpch_q22": "1-row scalar-subquery broadcast (avg balance)",
    "agg_having": "1-row scalar-subquery broadcast (global avg)",
    # constant grids
    "ts_gapfill_locf": "tiny cross: 5 event types x generated hour grid",
    "ts_resample_interp": "tiny cross: 5 event types x generated hour grid",
    "ts_acf": "tiny cross: 7-row lag grid + 1-row moment scalar",
    "ts_mann_kendall": "bounded O(days^2) pair join + 1-row scalar totals",
    # broadcast-scalar crosses (1-row / grid-sized side)
    "agg_ttest_welch": "1-row broadcast scalar (two-arm stats row)",
    "agg_chi2_cells": "bounded margins x 1-row grand total",
    "agg_mutual_info": "bounded margins x 1-row grand total",
    "ts_stl_decompose": "1-row broadcast scalar onto the O(days) rollup",
    "agg_lorenz_curve": "1-row broadcast scalar (decile total)",
    "ts_pre_post_impact": "1-row broadcast scalar (pre-period sums pivot)",
    "agg_kendall_tau": "bounded O(days^2) pair join",
    "agg_cramers_v": "1-row grand-total scalar onto the bounded cell table",
    "agg_theil_index": "1-row broadcast scalar (grand total / user count)",
    "agg_eb_shrinkage": "1-row broadcast scalar (prior moment row)",
    "agg_decile_lift": "1-row broadcast scalar (decile totals)",
    "agg_overdispersion": "1-row broadcast scalar (moment row)",
    "ts_ljungbox": "1-row broadcast scalar (moment row) x bounded lag grid",
    "ts_croston": "1-row broadcast scalar onto the O(days) rollup",
    "ts_holt_winters": "1-row day-bounds row crossed into the dense day grid",
    "agg_simpsons_paradox": "1-row pooled-direction scalar",
    "agg_growth_accounting": "1-row max-month bound x per-entity month table",
    "agg_revenue_retention": "1-row max-month bound x per-entity month table",
    # round-5 additions (the three keys the r4 verdict flagged)
    "agg_anova_twoway": "1-row broadcast scalar (ssq grand-total row)",
    "agg_mde_curve": "5-row planning grid crossed with the 1-row variance scalar",
    "ts_best_split": "1-row broadcast scalar (grand-total row)",
}

PKG = pathlib.Path("diversity_maximization_spark")


def main() -> int:
    found: set[str] = set()
    for py in sorted(PKG.rglob("*.py")):
        text = py.read_text()
        orig = text
        for key, reason in REASONS.items():
            if key in found:
                continue
            # multi-line form: @query(\n    "key",
            pat_multi = re.compile(
                r'(@query\(\n(\s*)"' + re.escape(key) + r'",\n)'
            )
            # single-line form: @query("key", ...)
            pat_single = re.compile(
                r'(@query\("' + re.escape(key) + r'",\s*)'
            )
            if f'"{key}"' not in text:
                continue
            if f'bounded_cross=' in text and re.search(
                r'"' + re.escape(key) + r'",\n\s*bounded_cross=', text
            ):
                found.add(key)
                continue
            m = pat_multi.search(text)
            if m:
                indent = m.group(2)
                ins = f'{indent}bounded_cross="{reason}",\n'
                text = text[: m.end(1)] + ins + text[m.end(1) :]
                found.add(key)
                continue
            m = pat_single.search(text)
            if m:
                ins = f'bounded_cross="{reason}", '
                text = text[: m.end(1)] + ins + text[m.end(1) :]
                found.add(key)
        if text != orig:
            py.write_text(text)
            print(f"updated {py}")
    missing = set(REASONS) - found
    if missing:
        print(f"NOT FOUND: {sorted(missing)}")
        return 1
    print(f"annotated {len(found)} keys")
    return 0


if __name__ == "__main__":
    sys.exit(main())
