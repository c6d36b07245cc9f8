#!/usr/bin/env python3
"""SURVEY <-> gate alignment check (r8 verdict hygiene item: the §2
header count drifted twice when hand-written — derive it instead).

Extracts every checklist id from SURVEY.md §2 (lines like
"- [x] `<id>`"), every gated id from a Verify output's
oracle_sql.json, and diffs the two sets; prints the derived count to
paste into the §2 header.

Usage: python3 tools/check_survey_ids.py [oracle_sql.json]
       (default: /tmp/verify_out_latest/oracle_sql.json)
"""
import json
import re
import sys


def main(oracle_path):
    survey = open("SURVEY.md").read()
    sec2 = survey.split("## 2.")[1].split("\n## ")[0]
    survey_ids = set(re.findall(r"- \[x\] `([a-z]+\d+[a-z0-9_]*)`", sec2))
    gated = set(json.load(open(oracle_path)).keys())
    missing = sorted(gated - survey_ids)
    extra = sorted(survey_ids - gated)
    print(f"survey §2 ids: {len(survey_ids)}  gated ids: {len(gated)}")
    if missing:
        print(f"IN GATE, NOT IN SURVEY: {missing}")
    if extra:
        print(f"IN SURVEY, NOT GATED: {extra}")
    if not missing and not extra:
        print(f"OK — §2 header count should read: {len(gated)}")
    return 1 if (missing or extra) else 0


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/verify_out_latest/oracle_sql.json"
    sys.exit(main(path))
