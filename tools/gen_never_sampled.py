"""Regenerate NEVER_SAMPLED.md's with-oracle backlog section.

Convention (pinned by tests/test_registry.py::
test_never_sampled_is_registry_lockstep): the with-oracle bullet list
is exactly ``ORACLES − (∪ CORRECTNESS_r*.json keys) − CHECK_WINDOW``
— the keys that will STILL lack driver signal after the current
window lands — preserving the existing file order for keys already
listed (rotation takes "the next 50 in file order", so order is part
of the contract) and appending any brand-new keys at the end. The
rows-only justification section is preserved verbatim.

Usage: python tools/gen_never_sampled.py   (writes NEVER_SAMPLED.md)
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from diversity_maximization_spark import registry  # noqa: E402

registry.load_all()

ROOT = Path(__file__).resolve().parent.parent


def committed_sampled() -> set[str]:
    sampled: set[str] = set()
    for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        sampled.update(json.loads(p.read_text()).keys())
    return sampled


def current_order() -> list[str]:
    """With-oracle bullet order currently in the file."""
    order, in_section = [], False
    for line in (ROOT / "NEVER_SAMPLED.md").read_text().splitlines():
        if line.startswith("## "):
            in_section = "With DuckDB oracle" in line
            continue
        m = re.match(r"^- ([a-z0-9_]+)\s*$", line)
        if m and in_section:
            order.append(m.group(1))
    return order


def main() -> None:
    sampled = committed_sampled()
    window = set(registry.CHECK_WINDOW)
    backlog = set(registry.ORACLES) - sampled - window
    old = current_order()
    ordered = [k for k in old if k in backlog]
    ordered += sorted(backlog - set(ordered))

    text = (ROOT / "NEVER_SAMPLED.md").read_text()
    rows_only_at = text.index("## Rows-only")
    tail = text[rows_only_at:]

    n_q, n_o = len(registry.QUERIES), len(registry.ORACLES)
    head = f"""# NEVER_SAMPLED — driver-verification backlog

Keys never sampled by the driver correctness harness AFTER the
current CHECK_WINDOW lands (registry: {n_q} keys, {n_o} with oracle;
driver-sampled so far per committed CORRECTNESS_r*.json: {len(sampled)};
current window rotates {len(window)} more). Every key below is green
on the strict local gate at sf0.01 AND sf0.1 (CHECK_sf*_strict.json);
rotate into CHECK_WINDOW in future rounds, in THIS file order, to
exhaust the set. Regenerate with tools/gen_never_sampled.py; the
lockstep test in tests/test_registry.py fails if this file drifts
from registry ∪ CORRECTNESS_r*.json ∪ CHECK_WINDOW.

## With DuckDB oracle ({len(ordered)}) — window-eligible

"""
    body = "\n".join(f"- {k}" for k in ordered)
    (ROOT / "NEVER_SAMPLED.md").write_text(head + body + "\n\n" + tail)
    print(f"wrote {len(ordered)} with-oracle backlog keys")


if __name__ == "__main__":
    main()
