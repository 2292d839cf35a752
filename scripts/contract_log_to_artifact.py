#!/usr/bin/env python
"""Convert a ``check_contract.py`` log into a committed correctness
artifact (VERDICT r04 #1 — the full-surface sf0.1 run must live in the
repo as data, not as prose).

Usage:
    python scripts/contract_log_to_artifact.py LOG OUT_BASENAME SF_DIR

Writes OUT_BASENAME.json (machine-readable per-entry status + seconds)
and OUT_BASENAME.md (the human summary table).
"""

from __future__ import annotations

import json
import re
import sys
from datetime import date

LINE = re.compile(
    r"^(ok|FAIL|WARN)\s+(\w+):\s*(.*?)(?:\((\d+(?:\.\d+)?)s\))?\s*$"
)


def parse(log_path: str) -> dict:
    entries: dict[str, dict] = {}
    for raw in open(log_path):
        m = LINE.match(raw.strip())
        if not m:
            continue
        status, name, detail, secs = m.groups()
        if status == "WARN":
            entries.setdefault(name, {})["warn"] = detail
            continue
        rows = None
        rm = re.search(r"(\d+) rows", detail)
        if rm:
            rows = int(rm.group(1))
        # merge into any WARN-started entry instead of replacing it
        # (ADVICE r05: an ok/FAIL after a WARN dropped the warn), and
        # give WARN-only entries an explicit status below so they never
        # render as 'None' or count as a silent non-pass
        entry = entries.setdefault(name, {})
        entry.update(
            {
                "status": "pass" if status == "ok" else "fail",
                "rows": rows,
                "secs": float(secs) if secs else None,
                "detail": None if status == "ok" else detail,
            }
        )
    for entry in entries.values():
        entry.setdefault("status", "warn-only")
    return entries


def main() -> None:
    log_path, out_base, sf_dir = sys.argv[1:4]
    entries = parse(log_path)
    n_pass = sum(1 for e in entries.values() if e.get("status") == "pass")
    result = {
        "sf_dir": sf_dir,
        "date": date.today().isoformat(),
        "n_entries": len(entries),
        "n_pass": n_pass,
        "entries": entries,
    }
    with open(f"{out_base}.json", "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    lines = [
        f"# Contract correctness at {sf_dir}",
        "",
        f"Recorded {result['date']}: **{n_pass}/{len(entries)} entries "
        "green** (rows + columns + order-insensitive canonical values vs "
        "the DuckDB oracles, `scripts/check_contract.py` with "
        f"`CONTRACT_SF_DIR={sf_dir}`).",
        "",
        "| entry | status | rows | secs |",
        "|---|---|---|---|",
    ]
    for name, e in entries.items():
        lines.append(
            f"| {name} | {e.get('status')} | {e.get('rows')} | "
            f"{e.get('secs')} |"
        )
    fails = {k: e for k, e in entries.items() if e.get("status") != "pass"}
    if fails:
        lines += ["", "## Failures", ""]
        for k, e in fails.items():
            # warn-only entries carry their message under 'warn', not
            # 'detail' (r06 review: they rendered as 'None')
            lines.append(f"- **{k}**: {e.get('detail') or e.get('warn')}")
    with open(f"{out_base}.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"{n_pass}/{len(entries)} -> {out_base}.json/.md")


if __name__ == "__main__":
    main()
