"""Per-round TESTS artifact (VERDICT r03 item 4).

Runs the full pytest suite and the all-query DuckDB oracle gate at
sf0.01 (the driver's correctness scale), then writes
``TESTS_r{N}.json`` at the repo root with pass/fail counts, oracle
green counts, and wall times — durable, machine-readable evidence of
the in-round "pytest green AND all-514 oracle green" claims.

Usage: python tools/tests_artifact.py <round> [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_pytest() -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=no"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    tail = (proc.stdout or "").strip().split("\n")[-1]
    counts = {k: int(v) for v, k in re.findall(r"(\d+) (\w+)", tail)}
    return {
        "summary_line": tail,
        "passed": counts.get("passed", 0),
        "failed": counts.get("failed", 0),
        "skipped": counts.get("skipped", 0),
        "errors": counts.get("error", 0) + counts.get("errors", 0),
        "exit_code": proc.returncode,
        "wall_sec": round(time.time() - t0, 1),
    }


def run_oracle(sf_dir: str, json_path: str) -> dict:
    t0 = time.time()
    proc = subprocess.run(
        [
            sys.executable,
            "tools/check_oracle.py",
            "--json",
            json_path,
            sf_dir,
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    with open(json_path) as fh:
        data = json.load(fh)
    data["exit_code"] = proc.returncode
    data["wall_sec"] = round(time.time() - t0, 1)
    return data


def main() -> int:
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out = os.path.join(REPO, f"TESTS_r{rnd:02d}.json")
    oracle_tmp = os.path.join(REPO, "_scratch", f"oracle_r{rnd:02d}.json")
    os.makedirs(os.path.dirname(oracle_tmp), exist_ok=True)

    pytest_res = run_pytest()
    print("pytest:", pytest_res["summary_line"])
    oracle_res = run_oracle(sf_dir, oracle_tmp)
    print(
        f"oracle: {oracle_res['n_hash_match']} hash-match, "
        f"{oracle_res['n_rows_only']} rows-only, "
        f"{oracle_res['n_failed']} failed"
    )

    with open(out, "w") as fh:
        json.dump(
            {
                "round": rnd,
                "pytest": pytest_res,
                "oracle": {
                    k: oracle_res[k]
                    for k in (
                        "sf_dir",
                        "n_checked",
                        "n_hash_match",
                        "n_rows_only",
                        "n_failed",
                        "failed",
                        "wall_sec",
                        "exit_code",
                    )
                },
                "green": pytest_res["failed"] == 0
                and pytest_res["errors"] == 0
                and oracle_res["n_failed"] == 0,
                "wall_clock_unix": round(time.time(), 1),
            },
            fh,
            indent=1,
            sort_keys=True,
        )
        fh.write("\n")
    print(f"wrote {out}")
    return 0 if pytest_res["failed"] == 0 and oracle_res["n_failed"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
