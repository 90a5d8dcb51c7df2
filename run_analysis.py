"""Analysis orchestrator: run the analysis CLIs in sequence.

Counterpart of reference ``run_analysis.py:20-55`` (same --skip /
--teacher_model flags and subprocess dispatch).  The reference advertised
five analysis scripts but shipped only one of them (run_analysis.py:31-37 vs
scripts/analysis contents, SURVEY.md §2 item 27); here all advertised
scripts exist and run.
"""

import argparse
import os
import subprocess
import sys

SCRIPTS = [
    "analyze_trajectory_metrics.py",
    "analyze_trajectories.py",
    "analyze_effectiveness.py",
    "analyze_dimensionality.py",
    "analyze_noise_prediction.py",
    "analyze_time_dependent.py",
    "analyze_fid.py",
]


def main():
    parser = argparse.ArgumentParser(
        description="Run the full analysis pipeline",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument(
        "--skip", type=str, default="",
        help="Comma-separated script names (without .py) to skip",
    )
    parser.add_argument(
        "--teacher_model", type=str, default=None,
        help="Teacher checkpoint name passed through to each script",
    )
    args = parser.parse_args()

    skip = {s.strip() for s in args.skip.split(",") if s.strip()}
    analysis_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts", "analysis"
    )

    for script in SCRIPTS:
        name = script[:-3]
        if name in skip:
            print(f"Skipping {name}")
            continue
        path = os.path.join(analysis_dir, script)
        if not os.path.exists(path):
            print(f"Warning: {script} not found; skipping")
            continue
        cmd = [sys.executable, path]
        if args.teacher_model:
            cmd += ["--teacher_model", args.teacher_model]
        print(f"\n{'=' * 70}\nRunning {script}\n{'=' * 70}")
        result = subprocess.run(cmd)
        if result.returncode != 0:
            print(f"Warning: {script} exited with code {result.returncode}")

    print("\nAnalysis pipeline complete")


if __name__ == "__main__":
    main()
