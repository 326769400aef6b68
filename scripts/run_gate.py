"""Crash-proof test gate: one pytest process per test module.

`python -m pytest tests/` runs every module in ONE process; XLA:CPU
executables accumulate across modules and the big Groth16/MSM programs
can segfault the interpreter mid-suite — which pytest reports as a
truncated dot-line and (under some pipes) exit 0 (VERDICT r3 weak #6).
This driver runs each test module in a fresh process, forwards output,
and exits non-zero unless EVERY module both exits 0 AND prints a
pytest summary tail — a silent death can't masquerade as a pass.

Usage: python scripts/run_gate.py [-k EXPR] [extra pytest args...]
"""
from __future__ import annotations

import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    modules = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    extra = sys.argv[1:]
    failures: list[str] = []
    t_all = time.time()
    for mod in modules:
        name = os.path.basename(mod)
        t0 = time.time()
        # NOTE: no -q here — pyproject addopts already passes -q, and a
        # doubled -q suppresses the summary line this parser needs
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", mod, *extra],
            cwd=REPO,
            capture_output=True,
            text=True,
        )
        out = proc.stdout
        tail = out.strip().splitlines()[-1] if out.strip() else ""
        # a healthy run exits 0/5 AND ends with a complete pytest line;
        # a segfault gives a negative returncode and/or a truncated tail
        summary_ok = any(
            k in tail
            for k in ("passed", "skipped", "no tests ran", "xfailed", "[100%]")
        ) and "failed" not in tail and " error" not in tail
        ok = proc.returncode in (0, 5) and summary_ok
        status = "OK " if ok else "FAIL"
        print(
            f"[{status}] {name:34s} {time.time()-t0:7.1f}s  {tail[:80]}",
            flush=True,
        )
        if not ok:
            failures.append(name)
            sys.stdout.write(out[-3000:])
            sys.stdout.write((proc.stderr or "")[-2000:] + "\n")
    summary = (
        f"gate: {len(modules) - len(failures)}/{len(modules)} modules ok "
        f"in {time.time()-t_all:.0f}s"
        + (f"; FAILED: {failures}" if failures else "")
    )
    print(summary, flush=True)
    # the final line has been swallowed by pipes twice (VERDICT r4 weak
    # #6) — persist the verdict where no pipe can lose it
    import json

    with open(os.path.join(REPO, "gate_summary.json"), "w") as f:
        json.dump(
            {
                "ok": not failures,
                "modules_ok": len(modules) - len(failures),
                "modules_total": len(modules),
                "failed": failures,
                "wall_s": round(time.time() - t_all, 1),
            },
            f,
        )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
