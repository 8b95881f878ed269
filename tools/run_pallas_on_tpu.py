"""Run the Pallas parity suite COMPILED on the real TPU chip (VERDICT
round-1 item 8: kernel numerics must not be covered only by interpret-mode
CPU runs and bench side-effects).

DSR_TPU_TESTS=1 makes tests/conftest.py keep the axon backend, so
`use_interpret()` is False and every kernel case in tests/test_pallas.py
lowers through Mosaic and executes on the chip.  Results are recorded in
PALLAS_TPU.json for the round log.

Run: /opt/venv/bin/python tools/run_pallas_on_tpu.py
(first run remote-compiles each kernel shape, ~10-60 s per case; the
persistent compile cache makes reruns fast)
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    env = dict(os.environ, DSR_TPU_TESTS="1")
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_pallas.py",
         "tests/test_pallas_select.py", "-v", "--tb=line"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=3600,
    )
    out = proc.stdout
    cases = {}
    for line in out.splitlines():
        if "::" in line and ("PASSED" in line or "FAILED" in line or "ERROR" in line):
            name = line.split("::")[1].split()[0]
            cases[name] = "PASSED" if "PASSED" in line else "FAILED"
    summary = {
        "suite": "tests/test_pallas.py compiled on TPU (DSR_TPU_TESTS=1)",
        "returncode": proc.returncode,
        "elapsed_s": round(time.time() - t0, 1),
        "cases": cases,
        "n_passed": sum(1 for v in cases.values() if v == "PASSED"),
        "n_failed": sum(1 for v in cases.values() if v != "PASSED"),
    }
    with open(os.path.join(ROOT, "PALLAS_TPU.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(out.splitlines()[-1] if out else proc.stderr[-2000:])
    print(json.dumps({k: v for k, v in summary.items() if k != "cases"}))
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
