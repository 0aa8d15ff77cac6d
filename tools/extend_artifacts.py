"""Extend the per-key artifacts after a new wave of strict-green keys.

Usage: python tools/extend_artifacts.py key1 [key2 ...]

- appends {"status": "pass"} rows to CHECK_sf001_strict.json and
  CHECK_sf01_strict.json (the keys MUST already be strict-green at
  both SFs — this script records, it does not verify);
- adds the keys to NEVER_SAMPLED.md's window-eligible list and bumps
  its count;
- regenerates OPERATORS.md;
- rewrites the README and SURVEY count lines from the live registry.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys

sys.path.insert(0, ".")

from diversity_maximization_spark import registry

registry.load_all()


def main() -> int:
    keys = sys.argv[1:]
    unknown = [k for k in keys if k not in registry.QUERIES]
    if unknown:
        print(f"not registered: {unknown}")
        return 1
    no_oracle = [k for k in keys if k not in registry.ORACLES]

    for p in ["CHECK_sf001_strict.json", "CHECK_sf01_strict.json"]:
        d = json.load(open(p))
        for k in keys:
            d[k] = (
                {"status": "pass"}
                if k in registry.ORACLES
                else {"status": "rows_only"}
            )
        json.dump(d, open(p, "w"), indent=1)

    s = open("NEVER_SAMPLED.md").read()
    m = re.search(r"## With DuckDB oracle \((\d+)\) — window-eligible", s)
    oracled = [k for k in keys if k in registry.ORACLES]
    new_count = int(m.group(1)) + len(oracled)
    s = s.replace(
        m.group(0),
        f"## With DuckDB oracle ({new_count}) — window-eligible\n\n"
        + "\n".join(f"- {k}" for k in oracled),
    )
    open("NEVER_SAMPLED.md", "w").write(s)

    subprocess.run([sys.executable, "tools/gen_operator_index.py"], check=True)

    nq, no = len(registry.QUERIES), len(registry.ORACLES)
    r = open("README.md").read()
    r = re.sub(
        r"\d+ keys, \d+ with a paired DuckDB",
        f"{nq} keys, {no} with a paired DuckDB",
        r,
    )
    open("README.md", "w").write(r)
    sv = open("SURVEY.md").read()
    sv = re.sub(
        r"\*\*Count: \d+ registered keys; \d+ carry a full DuckDB",
        f"**Count: {nq} registered keys; {no} carry a full DuckDB",
        sv,
    )
    open("SURVEY.md", "w").write(sv)
    print(
        f"artifacts extended: +{len(keys)} keys ({len(no_oracle)} rows-only) "
        f"-> {nq} keys / {no} oracles"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
